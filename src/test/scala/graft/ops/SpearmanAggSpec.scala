package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the r17 spearmanAgg fusion (StatsOps.spearmanAgg) BIT-IDENTICAL to
  * the retired two-engine + row-aggregate spelling it replaced: same rows,
  * same n/sd2 integers, and the rho doubles equal to the last bit (the
  * driver-side closed form replicates the SQL double expression
  * operation-for-operation). Runs on sf0.001 with the production session.
  */
class SpearmanAggSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def retired(d: String) = {
    val base = graft.Tables.lineitem(spark, d)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("q"),
        Cleaning.cents(col("l_extendedprice")).as("c"))
    val rq = StatsOps.groupedRowNumber(base, "l_returnflag",
      Seq("q", "l_orderkey", "l_linenumber", "c"), "rq")
    val rc = StatsOps.groupedRowNumber(rq, "l_returnflag",
      Seq("c", "l_orderkey", "l_linenumber", "q"), "rc")
    rc.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(rq - rc AS DECIMAL(38,0)) * CAST(rq - rc AS DECIMAL(38,0))"))
          .as("sd2d"))
      .select(col("l_returnflag"), col("n"),
        col("sd2d").cast("long").as("sd2"),
        expr("1.0 - 6.0 * CAST(sd2d AS DOUBLE) / (CAST(n AS DOUBLE) * " +
          "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0))").as("spearman_rho"))
      .orderBy("l_returnflag")
  }

  test("spearmanAgg fusion is bit-identical to the two-engine spelling") {
    val old = retired(sf).collect()
    val neu = graft.SparkEntry.queries("stats_spearman")(spark, sf).collect()
    assert(old.length == neu.length && old.nonEmpty)
    old.zip(neu).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getLong(1) == b.getLong(1), s"n differs for ${a.getString(0)}")
      assert(a.getLong(2) == b.getLong(2), s"sd2 differs for ${a.getString(0)}")
      assert(java.lang.Double.doubleToRawLongBits(a.getDouble(3)) ==
        java.lang.Double.doubleToRawLongBits(b.getDouble(3)),
        s"rho bits differ for ${a.getString(0)}: ${a.getDouble(3)} vs ${b.getDouble(3)}")
    }
  }

  test("spearmanAgg handles a group confined to one partition and singletons") {
    import spark.implicits._
    // 3 groups: one spread, one single-row, one two-row reversed order —
    // offsets, local positions and the BigInt combine all exercised
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 30L), ("a", 3L, 20L), ("a", 4L, 40L),
      ("b", 1L, 5L),
      ("c", 1L, 9L), ("c", 2L, 3L)
    ).toDF("g", "x", "y")
    val rq = StatsOps.groupedRowNumber(df, "g", Seq("x", "y"), "rq", numPartitions = 3)
    val out = StatsOps.spearmanAgg(rq, "g", Seq("y", "x"), "rq",
      ("n", "sd2", "rho"), numPartitions = 3).orderBy("g").collect()
    // closed-form by hand: a: x-order 1..4, y-order pairs (10,30,20,40) →
    // rc of x-ranks (1,2,3,4) under y = (1,3,2,4) → sd2 = 0+1+1+0 = 2
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("a", 4L, 2L), ("b", 1L, 0L), ("c", 2L, 2L)))
  }
}
