package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The Spark half of the reference's Excel pre-ETL
  * (`/root/reference/scripts/parse_excel_files.py`): three workbook grids
  * → one `(country, year, num_arrivals, num_accepted_affirmitavely,
  * num_accepted_defensively)` table, the `asylum_cleaned.csv` shape that
  * `Pipelines.parseAsylum` ingests.
  *
  * Decoding `.xlsx` cells is a binary codec (xlrd in the reference) — the
  * same seam as the multimodal decoders. [[Xlsx]] closes it in-stack
  * (zip + StAX over the public OOXML format, decoded on executors); the
  * input here is the cell grid ANY decoder emits:
  * `(sheet, row, col, str, num)` rows. Everything the reference
  * did after xlrd is relational and runs distributed:
  *   - years from header row 3, cols 1-10 (`parse_excel_files.py:22`);
  *   - country names from col 0, rows 15..height-1 per sheet (`:18-20`);
  *   - numeric cells → int, anything lettered → null (`:26-27`);
  *   - one metric column per source sheet, joined by (country, year)
  *     (`:13,30-35`) — a grouped pivot, not a driver-side dict.
  * Output is totally ordered by (country, year); the reference sorted by
  * country only and relied on Python's stable sort for year order.
  */
object AsylumGrids {

  /** Metric column per sheet index, in the reference's file order
    * (fy2018_table14d / 17d / 19d — `parse_excel_files.py:12,39`).
    */
  val metricCols: Seq[String] =
    Seq("num_arrivals", "num_accepted_affirmitavely", "num_accepted_defensively")

  /** Reference per-sheet data heights (`parse_excel_files.py:14`). */
  val referenceHeights: Seq[Int] = Seq(76, 118, 109)

  /** Reference workbook basenames in metric-column order
    * (`parse_excel_files.py:12`) — the [[Xlsx.cellGrid]] sheet mapping.
    */
  val referenceFiles: Seq[String] =
    Seq("fy2018_table14d", "fy2018_table17d", "fy2018_table19d")

  /** cells: (sheet int, row int, col int, str string, num double|null) —
    * `num` set iff the decoder saw a numeric cell.
    */
  def asylumFromCells(cells: DataFrame, heights: Seq[Int] = referenceHeights): DataFrame = {
    import cells.sparkSession.implicits._
    require(heights.length == metricCols.length,
      s"need ${metricCols.length} sheet heights, got ${heights.length}")
    val bounds = heights.zipWithIndex.map { case (h, i) => (i, h) }.toDF("b_sheet", "height")

    val years = cells.filter(col("row") === 3 && col("col").between(1, 10))
      .select(col("sheet").as("y_sheet"), col("col").as("y_col"),
        col("num").cast("int").as("year"))
    val countries = cells.filter(col("col") === 0)
      .join(broadcast(bounds), col("sheet") === col("b_sheet"))
      .filter(col("row") >= 15 && col("row") < col("height"))
      .select(col("sheet").as("c_sheet"), col("row").as("c_row"), col("str").as("country"))

    cells.filter(col("col").between(1, 10))
      .join(countries, col("sheet") === col("c_sheet") && col("row") === col("c_row"))
      .join(broadcast(years), col("sheet") === col("y_sheet") && col("col") === col("y_col"))
      .select(col("country"), col("year"), col("sheet"), col("num").cast("int").as("value"))
      .groupBy("country", "year")
      .pivot("sheet", heights.indices)
      .agg(first(col("value")))
      .select(col("country") +: col("year") +:
        metricCols.zipWithIndex.map { case (m, i) => col(i.toString).as(m) }: _*)
      .orderBy("country", "year")
  }
}
