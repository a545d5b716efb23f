package graft.ops

import graft.SparkSpec

/** The write-once/read-back contract of the scratch-parquet materializer
  * that replaced round 6's leaked persists (see Scratch's scaladoc).
  */
class ScratchSpec extends SparkSpec {
  import spark.implicits._

  test("materialize builds once per (session, dir, kind) and reads back the same rows") {
    var builds = 0
    def build = { builds += 1; Seq((1L, "a"), (2L, "b")).toDF("k", "v") }
    val first = Scratch.materialize("scratch_spec_once", spark, "dirA")(build)
    val again = Scratch.materialize("scratch_spec_once", spark, "dirA")(build)
    assert(builds == 1, "second call must reuse the artifact, not rebuild")
    assert(first.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    assert(again.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // a different sf dir is a different artifact
    Scratch.materialize("scratch_spec_once", spark, "dirB")(build)
    assert(builds == 2)
  }

  test("materialized subplans hold no block-manager storage") {
    Scratch.materialize("scratch_spec_storage", spark, "dirC") {
      Seq.tabulate(100)(i => (i.toLong, s"row$i")).toDF("k", "v")
    }.count()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "scratch materialization must not persist anything")
  }

  test("consumers see a plain parquet scan (column-prunable)") {
    val df = Scratch.materialize("scratch_spec_plan", spark, "dirD") {
      Seq((1L, "a", 2.0)).toDF("k", "v", "w")
    }.select("k")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet"), s"expected a parquet scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<k:bigint>"),
      s"projection must prune to the selected column:\n$plan")
  }
}
