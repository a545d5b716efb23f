package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

class CleaningSpec extends SparkSpec {
  import spark.implicits._

  test("cleanString lowercases and replaces all spaces with underscores") {
    val out = Seq("United States", "EL Salvador X").toDF("c")
      .select(Cleaning.cleanString(col("c"))).as[String].collect()
    assert(out.sameElements(Array("united_states", "el_salvador_x")))
  }

  test("lowerCaseHeaders lowercases and applies renames (pyspark.py:416-429)") {
    val df = Seq((1, "x")).toDF("YEAR", "Country")
    val out = Cleaning.lowerCaseHeaders(df, Map("year" -> "arrival_year"))
    assert(out.columns.toSeq == Seq("arrival_year", "country"))
  }

  test("castAll converts only the matching source type (pyspark.py:228-230)") {
    val df = Seq((1.9, 2L, "s")).toDF("d", "l", "s")
    val out = Cleaning.castAll(df, DoubleType, IntegerType)
    assert(out.schema("d").dataType == IntegerType)
    assert(out.schema("l").dataType.typeName == "long")
    assert(out.select("d").as[Int].head() == 1) // truncation toward zero
  }

  test("sasEpochDate: null and 0 both map to 1960-01-01 (pyspark.py:384-385)") {
    val out = Seq[(java.lang.Integer, String)]((null, "null"), (0, "zero"), (20546, "real"))
      .toDF("days", "tag")
      .select(col("tag"), date_format(Cleaning.sasEpochDate(col("days")), "yyyy-MM-dd").as("d"))
      .as[(String, String)].collect().toMap
    assert(out("null") == "1960-01-01")
    assert(out("zero") == "1960-01-01")
    assert(out("real") == "2016-04-02")
  }

  test("abbreviateState: match, leading-space strip, pass-through on miss, null-safe") {
    val out = Seq(" California", "texas", "Ontario", null)
      .toDF("s")
      .select(Cleaning.abbreviateState(col("s"))).as[String].collect()
    assert(out(0) == "CA")
    assert(out(1) == "TX")
    assert(out(2) == "Ontario") // unknown passes through (pyspark.py:344-346)
    assert(out(3) == null)
  }

  test("mapLookup does not throw under ANSI mode on a missing key") {
    // element_at would raise MAP_KEY_DOES_NOT_EXIST here (Spark 4 ANSI default)
    val out = Seq("missing").toDF("s")
      .select(Cleaning.mapLookup(col("s"), Map("hit" -> "H"))).as[String].head()
    assert(out == "missing")
  }

  test("datePartsExpand adds prefixed year/month/day/weekday columns") {
    val out = Seq("2016-04-02").toDF("d")
      .select(to_date(col("d")).as("dt"))
      .transform(df => Cleaning.datePartsExpand(df, "dt", "arr"))
    assert(out.columns.toSeq == Seq("dt", "arr_year", "arr_month", "arr_day", "arr_weekday"))
    val r = out.select("arr_year", "arr_month", "arr_day", "arr_weekday").as[(Int, Int, Int, Int)].head()
    assert(r == ((2016, 4, 2, 7))) // 2016-04-02 is a Saturday, dayofweek=7
  }

  test("weekdayAbbrev yields the reference's lowercase form") {
    val out = Seq("2016-04-02").toDF("d")
      .select(Cleaning.weekdayAbbrev(to_date(col("d")))).as[String].head()
    assert(out == "sat")
  }

  test("cents is exact for representable money values") {
    val out = Seq(901.04, 0.01, 12345.67).toDF("m")
      .select(Cleaning.cents(col("m"))).as[Long].collect()
    assert(out.sameElements(Array(90104L, 1L, 1234567L)))
  }
}
