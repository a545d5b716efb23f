package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed order statistics built from window primitives; property-
  * proven against their defining inequalities in `PropertiesSpec`.
  */
object StatsOps {

  /** Weighted median per group: the smallest value whose cumulative weight
    * reaches half the group total (2·cumw ≥ total — the standard lower
    * weighted median). Input must be PRE-AGGREGATED to one row per
    * (group, value) with summed weights, which bounds the window input at
    * the value-domain size rather than the raw row count. Output:
    * (group, wmedian, total_weight).
    */
  def weightedMedian(byValue: DataFrame, group: String, value: String,
                     weight: String): DataFrame = {
    val cum = Window.partitionBy(group).orderBy(value)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(group)
    byValue
      .withColumn("cw", sum(weight).over(cum))
      .withColumn("tw", sum(weight).over(tot))
      .filter(col("cw") * 2 >= col("tw"))
      .groupBy(group)
      .agg(min(value).as("wmedian"), max("tw").as("total_weight"))
  }

  /** Per-group `row_number` WITHOUT a per-group window: range-partition on
    * (group, order...), sort within partitions, count rows per
    * (partition, group) in one cheap pass (a partitions×groups-sized table
    * collected to the driver), then assign rank = cross-partition offset +
    * in-partition position. Identical output contract to
    * `row_number().over(Window.partitionBy(group).orderBy(order...))`, but
    * parallelism equals the range-partition count (cluster-sized), never
    * the group cardinality — the window form runs as at most |groups|
    * tasks with a full per-group sort, a hard ceiling when the group key
    * has constant cardinality (VERDICT r9: stats_spearman's 3-value key).
    *
    * `order` must be a total order within each group (no ties) or the
    * assignment is partition-layout-dependent. The driver-side offset
    * table is bounded by partitions × |groups| — only safe for
    * constant-cardinality groups, which is exactly the case where the
    * window form breaks.
    */
  def groupedRowNumber(df: DataFrame, group: String, order: Seq[String],
                       out: String, numPartitions: Int = 32): DataFrame =
    groupedScan(df, group, order, None, out, numPartitions)

  /** Per-group running SUM (inclusive of the current row) along `order` —
    * the scalable form of `sum(value).over(Window.partitionBy(group)
    * .orderBy(order...).rowsBetween(unboundedPreceding, currentRow))` for
    * constant-cardinality groups. Same engine and contracts as
    * [[groupedRowNumber]]; `valueCol` must be LongType and non-null.
    */
  def groupedRunningSum(df: DataFrame, group: String, order: Seq[String],
                        valueCol: String, out: String,
                        numPartitions: Int = 32): DataFrame =
    groupedScan(df, group, order, Some(valueCol), out, numPartitions)

  /** Shared engine: range-partition + in-partition sort, per-(partition,
    * group) weight totals to the driver (partitions × |groups| entries),
    * then a second pass assigns offset + in-partition prefix. `weightCol`
    * None → weight 1 per row (row_number); Some(c) → running sum of c.
    * Note the range shuffle's map output is written once and REUSED by
    * both passes (Spark skips the finished shuffle stage), so the input
    * lineage is not recomputed — only the in-partition sort runs twice.
    */
  private def groupedScan(df: DataFrame, group: String, order: Seq[String],
                          weightCol: Option[String], out: String,
                          numPartitions: Int): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val keys = (group +: order).map(col)
    val sorted = df.repartitionByRange(numPartitions, keys: _*)
      .sortWithinPartitions(keys: _*)
    val gi = sorted.schema.fieldIndex(group)
    val wi = weightCol.map(sorted.schema.fieldIndex)
    def weightOf(r: org.apache.spark.sql.Row): Long =
      wi.map(r.getLong).getOrElse(1L)
    // pass 1: per-(partition, group) totals — tiny by construction
    val counts: Array[(Int, Map[Any, Long])] = sorted.rdd
      .mapPartitionsWithIndex { (p, it) =>
        val m = scala.collection.mutable.Map.empty[Any, Long]
        it.foreach(r => m(r.get(gi)) = m.getOrElse(r.get(gi), 0L) + weightOf(r))
        Iterator((p, m.toMap))
      }.collect()
    // cumulative offsets: weight of group g in partitions before p
    val byPart = counts.toMap
    val nPart = counts.map(_._1).foldLeft(-1)(math.max) + 1
    val offsets: Array[Map[Any, Long]] = {
      val run = scala.collection.mutable.Map.empty[Any, Long]
      (0 until nPart).map { p =>
        val snap = run.toMap
        byPart.getOrElse(p, Map.empty).foreach { case (g, c) =>
          run(g) = run.getOrElse(g, 0L) + c
        }
        snap
      }.toArray
    }
    val schema = StructType(
      sorted.schema.fields :+ StructField(out, LongType, nullable = false))
    val bc = sorted.sparkSession.sparkContext.broadcast(offsets)
    val rows = sorted.rdd.mapPartitionsWithIndex { (p, it) =>
      val local = scala.collection.mutable.Map.empty[Any, Long]
      val base = bc.value(p)
      it.map { r =>
        val g = r.get(gi)
        val pos = local.getOrElse(g, 0L) + weightOf(r)
        local(g) = pos
        org.apache.spark.sql.Row.fromSeq(
          r.toSeq :+ (base.getOrElse(g, 0L) + pos))
      }
    }
    sorted.sparkSession.createDataFrame(rows, schema)
  }
}
