package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** Engine-side pre-ETL sources: the SAS-label text parse (fully native —
  * the fixture reproduces the documented line shapes of
  * `I94_SAS_Labels_Descriptions.SAS` incl. every quirk branch the
  * reference's character-walk handles) and the Excel grid reshape (cell
  * grid in, reference CSV shape out).
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sasFile: String = {
    val f = Files.createTempFile("graft-labels-", ".SAS")
    Files.writeString(f,
      """libname library 'path';
        |value i94cntyl
        |   236 =  'AFGHANISTAN'
        |   687  =  'INVALID: AMERICAN SAMOA'
        |   916 =  'No Country Code (916)'
        |;
        |value $prtcdl
        |   'ALC'	=	'ALCAN, AK             '
        |   'WAS'	=	'WASHINGTON DC, WARD 8, DC'
        |   'X96'	=	'ABU DHABI, UNITED ARAB EMIR'
        |   'MAR'	=	'MARIPOSA AZ'
        |   'ZZZ'	=	'No PORT Code (ZZZ)'
        |;""".stripMargin)
    f.toString
  }

  test("cityAndResidentCodes: plain, INVALID-prefixed, and No-Country-Code lines") {
    val rows = SasLabels.cityAndResidentCodes(spark, sasFile, 2, 4)
      .orderBy("code").as[(Int, Option[String], Boolean)].collect().toSeq
    assert(rows == Seq(
      (236, Some("Afghanistan"), true),
      (687, Some("American Samoa"), true), // INVALID: prefix stripped, still valid
      (916, None, false)))                 // listed but flagged invalid
  }

  test("portCodes: state upper-case, long-region title-case, multi-comma, no-region, no-port") {
    val rows = SasLabels.portCodes(spark, sasFile, 7, 11)
      .orderBy("code").as[(String, Option[String], Option[String])].collect().toSeq
    assert(rows == Seq(
      ("ALC", Some("Alcan"), Some("AK")),              // padded value rtrimmed; 2-letter state upper
      ("MAR", Some("Mariposa Az"), None),              // no comma → no region
      ("WAS", Some("Washington Dc"), Some("DC")),      // multi-comma: first + last
      ("X96", Some("Abu Dhabi"), Some("United Arab Emir")),
      ("ZZZ", None, None)))                            // No PORT Code → both null
  }

  test("writeCodeTables emits the multiLine JSON arrays parseVisitor joins against") {
    val out = Files.createTempDirectory("graft-codes-").toString
    SasLabels.writeCodeTables(spark, sasFile, out, citRange = (2, 4), portRange = (7, 11))
    def readBack(name: String) =
      spark.read.option("multiLine", true).json(s"$out/$name.json")
    val cit = readBack("i94cit_and_i94res")
    assert(cit.count() == 3 && cit.columns.toSet == Set("code", "region", "valid"))
    val port = readBack("i94port")
    assert(port.count() == 5 &&
      port.columns.toSet == Set("code", "municipality", "region"))
    val visa = readBack("i94visa")
    assert(visa.select("type").as[String].collect().toSet ==
      Set("Business", "Pleasure", "Student"))
    // the exact selectExpr surface Pipelines.parseVisitor applies
    assert(cit.selectExpr("code", "region as country").columns.toSeq ==
      Seq("code", "country"))
  }

  test("asylumFromCells: years from header row, height slicing, lettered cells → null") {
    // (sheet, row, col, str, num): the grid any xlsx decoder emits
    val cells = Seq(
      // sheet 0 = num_arrivals: header years + two country rows + a row
      // beyond the height bound that must be sliced away
      (0, 3, 1, "", Some(2017.0)), (0, 3, 2, "", Some(2018.0)),
      (0, 15, 0, "China", None), (0, 16, 0, "El Salvador", None),
      (0, 17, 0, "Total", None),
      (0, 15, 1, "", Some(1200.0)), (0, 15, 2, "D", None), // "D" = suppressed → null
      (0, 16, 1, "", Some(900.0)), (0, 16, 2, "", Some(800.0)),
      (0, 17, 1, "", Some(99999.0)),
      // sheet 1 = num_accepted_affirmitavely
      (1, 3, 1, "", Some(2017.0)), (1, 3, 2, "", Some(2018.0)),
      (1, 15, 0, "China", None), (1, 16, 0, "El Salvador", None),
      (1, 15, 1, "", Some(300.0)), (1, 16, 2, "", Some(250.0)),
      // sheet 2 = num_accepted_defensively (height 16 → row 15 only)
      (2, 3, 1, "", Some(2017.0)),
      (2, 15, 0, "China", None), (2, 15, 1, "", Some(150.5)))
      .toDF("sheet", "row", "col", "str", "num")
    val out = AsylumGrids.asylumFromCells(cells, Seq(17, 17, 16))
    assert(out.columns.toSeq == Seq("country", "year") ++ AsylumGrids.metricCols)
    val rows = out
      .as[(String, Int, Option[Int], Option[Int], Option[Int])].collect().toSeq
    assert(rows == Seq(
      ("China", 2017, Some(1200), Some(300), Some(150)), // 150.5 → int truncation
      ("China", 2018, None, None, None),
      ("El Salvador", 2017, Some(900), None, None),
      ("El Salvador", 2018, Some(800), Some(250), None)))
    assert(!rows.exists(_._1 == "Total"), "height bound must slice trailing rows")
  }
}
