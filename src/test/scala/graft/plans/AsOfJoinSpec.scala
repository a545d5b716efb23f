package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The custom as-of join operator: semantics vs the window composition,
  * edge cases (no match, ties, empty right), and plan shape.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def asof(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)]) = {
    // (key, ts, id) triples; right payload is its id
    val l = left.toDF("user_id", "ts_us", "click_id")
      .select(col("user_id"), col("ts_us"), col("click_id"))
    val r = right.toDF("err_user", "err_ts", "err_id")
    AsOfJoinOps.joinBackward(l, r,
        leftKey = "user_id", leftTs = "ts_us", leftTie = "click_id",
        rightKey = "err_user", rightTs = "err_ts", rightTie = "err_id")
      .select(col("click_id"), col("err_id"))
      .as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
  }

  test("backward as-of picks the latest at-or-before right row per key") {
    val got = asof(
      left = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 150L, 12L)),
      right = Seq((1L, 90L, 20L), (1L, 150L, 21L), (2L, 160L, 22L)))
    // click 10 (t=100): err 20 (t=90); click 11 (t=200): err 21 (t=150);
    // click 12 (t=150, user 2): err 22 is at t=160 AFTER → no match
    assert(got == Seq((10L, Some(20L)), (11L, Some(21L)), (12L, None)))
  }

  test("timestamp ties resolve by the tie column, matching the window formulation") {
    // error id 20 shares ts=100 with click 10: tie 20 > 10 → NOT matched
    // by click 10; error id 5 < 12 at same ts IS matched by click 12
    val got = asof(
      left = Seq((1L, 100L, 10L), (1L, 100L, 12L)),
      right = Seq((1L, 100L, 20L), (1L, 100L, 5L)))
    assert(got == Seq((10L, Some(5L)), (12L, Some(5L))))
  }

  test("tolerance nulls matches older than the staleness bound") {
    val l = Seq((1L, 100L, 10L), (1L, 200L, 11L)).toDF("user_id", "ts_us", "click_id")
    val r = Seq((1L, 95L, 20L)).toDF("err_user", "err_ts", "err_id")
    def run(tol: Option[Long]) =
      AsOfJoinOps.joinBackward(l, r, "user_id", "ts_us", "click_id",
          "err_user", "err_ts", "err_id", tol)
        .select(col("click_id"), col("err_id"))
        .as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
    // unbounded: both clicks see err 20; tol=10: only the click 5 ticks
    // after it does (200 - 95 = 105 > 10 → null)
    assert(run(None) == Seq((10L, Some(20L)), (11L, Some(20L))))
    assert(run(Some(10L)) == Seq((10L, Some(20L)), (11L, None)))
  }

  test("empty right side yields all-null matches; empty left yields nothing") {
    assert(asof(Seq((1L, 10L, 1L)), Seq.empty) == Seq((1L, None)))
    assert(asof(Seq.empty, Seq((1L, 10L, 1L))) == Seq.empty)
  }

  private def asofNearest(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)],
                          tol: Option[Long] = None) = {
    val l = left.toDF("user_id", "ts_us", "click_id")
    val r = right.toDF("err_user", "err_ts", "err_id")
    AsOfJoinOps.joinNearest(l, r,
        leftKey = "user_id", leftTs = "ts_us", leftTie = "click_id",
        rightKey = "err_user", rightTs = "err_ts", rightTie = "err_id", tol)
      .select(col("click_id"), col("err_id"))
      .as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
  }

  test("nearest as-of picks the closer side in either direction") {
    val got = asofNearest(
      left = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 150L, 12L)),
      right = Seq((1L, 90L, 20L), (1L, 205L, 21L), (2L, 160L, 22L)))
    // click 10: back dist 10 < fwd dist 105 → 20; click 11: fwd dist 5 →
    // 21; click 12 (user 2): only a FORWARD row exists (backward-only
    // mode returned null here) → 22
    assert(got == Seq((10L, Some(20L)), (11L, Some(21L)), (12L, Some(22L))))
  }

  test("nearest: equidistant candidates resolve backward") {
    val got = asofNearest(
      left = Seq((1L, 100L, 10L)),
      right = Seq((1L, 90L, 20L), (1L, 110L, 21L)))
    assert(got == Seq((10L, Some(20L))))
  }

  test("nearest: tolerance bounds the absolute distance") {
    val got = asofNearest(
      left = Seq((1L, 100L, 10L), (1L, 300L, 11L)),
      right = Seq((1L, 90L, 20L)),
      tol = Some(50L))
    // click 10: dist 10 ≤ 50 → 20; click 11: dist 210 > 50 → null
    assert(got == Seq((10L, Some(20L)), (11L, None)))
  }

  test("nearest: successive left rows can share one forward candidate") {
    val got = asofNearest(
      left = Seq((1L, 100L, 10L), (1L, 101L, 11L), (1L, 102L, 12L)),
      right = Seq((1L, 103L, 20L)))
    assert(got == Seq((10L, Some(20L)), (11L, Some(20L)), (12L, Some(20L))))
  }

  test("operator matches the window composition on the real events table") {
    val sf = "/root/testdata/sf0.001"
    val viaExec = graft.SparkEntry.queries("join_asof_exec")(spark, sf)
      .collect().map(r => (r.getLong(0), Option(r.get(2)))).toSeq
    val viaWindow = graft.SparkEntry.queries("join_asof")(spark, sf)
      .collect().map(r => (r.getLong(0), Option(r.get(2)))).toSeq
    assert(viaExec.nonEmpty && viaExec == viaWindow)
  }

  private def asofFwd(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)]) = {
    val l = left.toDF("user_id", "ts_us", "click_id")
    val r = right.toDF("err_user", "err_ts", "err_id")
    AsOfJoinOps.joinForward(l, r,
        leftKey = "user_id", leftTs = "ts_us", leftTie = "click_id",
        rightKey = "err_user", rightTs = "err_ts", rightTie = "err_id")
      .select(col("click_id"), col("err_id"))
      .as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
  }

  test("forward as-of picks the earliest at-or-after right row per key") {
    val got = asofFwd(
      left = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 150L, 12L)),
      right = Seq((1L, 150L, 20L), (1L, 150L, 21L), (2L, 140L, 22L)))
    // click 10 (t=100): first error after is id 20 (t=150, lower tie);
    // click 11 (t=200): both errors are before -> no match;
    // click 12 (user 2, t=150): err 22 at t=140 is BEFORE -> no match
    assert(got == Seq((10L, Some(20L)), (11L, None), (12L, None)))
  }

  test("forward: successive left rows can share one right match") {
    val got = asofFwd(
      left = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L)),
      right = Seq((1L, 50L, 9L)))
    // the single error at t=50 is the next one for ALL three clicks --
    // the merge must not consume it after the first match
    assert(got == Seq((1L, Some(9L)), (2L, Some(9L)), (3L, Some(9L))))
  }

  test("plan contains AsOfJoinExec fed by co-partitioned sorted children") {
    val sf = "/root/testdata/sf0.001"
    val p = graft.SparkEntry.queries("join_asof_exec")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"custom operator missing:\n${p.take(600)}")
    assert(p.contains("Sort") && p.contains("Exchange hashpartitioning"),
      s"expected sort + hash exchange requirements:\n${p.take(800)}")
  }
}
