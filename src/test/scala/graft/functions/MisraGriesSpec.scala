package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** The Misra-Gries invariants the gate's always-true booleans rest on,
  * exercised directly: never overcounts, undercounts by at most n/(k+1)
  * under ANY partitioning, tracks every guaranteed-heavy key, exact when
  * k ≥ cardinality, and survives the serde the shuffle path uses.
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def summarize(df: org.apache.spark.sql.DataFrame, col0: String,
                        k: Int): Map[String, Long] = {
    val mg = toColumn(MisraGries(toExpression(col(col0)), k).toAggregateExpression())
    df.agg(mg.as("mg")).select(explode($"mg").as("e"))
      .select($"e.key", $"e.est").as[(String, Long)].collect().toMap
  }

  // deterministic skewed stream: key i appears i+1 times, i = 0..39
  private lazy val skewed: Seq[String] =
    (0 until 40).flatMap(i => Seq.fill(i + 1)(s"k$i"))

  test("exact when k >= distinct-key count") {
    val df = skewed.toDF("key").repartition(7)
    val est = summarize(df, "key", 64)
    val exact = skewed.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    assert(est == exact)
  }

  test("bounds hold for every key under different partitionings") {
    val n = skewed.size
    val k = 8
    val exact = skewed.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    for (parts <- Seq(1, 3, 16)) {
      val est = summarize(skewed.toDF("key").repartition(parts), "key", k)
      assert(est.size <= k, s"summary exceeded $k counters")
      exact.foreach { case (key, ex) =>
        val e = est.getOrElse(key, 0L)
        assert(e <= ex, s"overcount for $key at parts=$parts: est $e > exact $ex")
        assert(e >= ex - n / (k + 1),
          s"undercount beyond n/(k+1) for $key at parts=$parts")
        if (ex > n / (k + 1))
          assert(est.contains(key), s"guaranteed-heavy $key missing at parts=$parts")
      }
    }
  }

  test("compress genuinely fires: more distinct keys than counters") {
    val est = summarize(skewed.toDF("key").repartition(5), "key", 8)
    assert(est.size <= 8 && est.nonEmpty)
    // the heaviest key (40 occurrences > 820/9) must survive compression
    assert(est.contains("k39"))
  }

  test("serde round-trips the buffer bit-exactly") {
    val agg = MisraGries(toExpression(lit("x")), 4)
    val buf = mutable.HashMap("a" -> 3L, "b" -> 1L, "ü" -> 7L)
    assert(agg.deserialize(agg.serialize(buf)) == buf)
  }

  test("nulls are ignored, not counted") {
    val df = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("key").repartition(2)
    val est = summarize(df, "key", 8)
    assert(est == Map("a" -> 2L, "b" -> 1L))
  }

  test("gate query shape: both booleans are true for every user") {
    val rows = graft.SparkEntry.queries("agg_misra_gries")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case Row(_, _, wb: Boolean, th: Boolean) => wb && th })
  }
}
