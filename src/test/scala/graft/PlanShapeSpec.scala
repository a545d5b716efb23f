package graft

/** Physical-plan regression guards: the scale-critical plan properties the
  * bench relies on, pinned as assertions so a refactor that silently
  * reintroduces a shuffle / drops a pushdown / breaks codegen fails CI,
  * not the next 100× run.
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("flagship broadcasts the bounded dim and keeps shuffle joins on fact keys") {
    val p = plan("flagship")
    assert(p.contains("BroadcastHashJoin"), "nation must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("scan_parquet pushes the filter into the scan") {
    val p = plan("scan_parquet")
    assert(p.contains("PushedFilters: [") && p.contains("GreaterThanOrEqual(l_quantity"),
      s"filter not pushed:\n${p.take(600)}")
  }

  test("rank-limited windows get map-side WindowGroupLimit pruning") {
    assert(plan("win_row_number").contains("WindowGroupLimit"))
    assert(plan("win_rank_dense").contains("WindowGroupLimit"))
    assert(plan("ann_cosine_topk").contains("WindowGroupLimit"))
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    assert(plan("topk_orderby_limit").contains("TakeOrderedAndProject"))
  }

  test("bucketed join has no exchange between the bucketed scans and the join") {
    val p = plan("join_bucketed")
    val joinIdx = p.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, "bucketed join must be a SortMergeJoin")
    // every Exchange in the plan sits ABOVE the join (aggregation/output
    // sort), never between the join and its bucketed scans
    val below = p.substring(joinIdx)
    assert(!below.contains("Exchange"), s"exchange below the bucketed join:\n$below")
  }

  test("minhash candidate generation is an equi-join, never a cartesian product") {
    val p = plan("dedup_minhash_pairs")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Join") && p.contains("band"))
  }

  test("native cosine expression fuses into whole-stage codegen over a scan") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("v"))
    val q = e.select(graft.ops.VectorOps.cosine(col("v"), col("v")).as("c"))
      .filter(col("c") > 0.5)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("cosinesimilarity"), "native expression not in plan")
    // scan → filter → project carries a codegen stage id '*(n)'
    assert(p.linesIterator.exists(l => l.contains("cosinesimilarity") && l.contains("*(")),
      s"cosine projection fell out of codegen:\n${p.take(800)}")
  }

  test("partitioned-sink read-back prunes partitions via PartitionFilters") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft-prune-").toString
    ops.Sinks.writePartitionedParquet(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity", "l_returnflag"),
      out, Seq("l_returnflag"))
    val q = spark.read.parquet(out).filter(col("l_returnflag") === "A")
    val p = q.queryExecution.executedPlan.toString
    // the filter must prune at the directory level (PartitionFilters on the
    // scan), not run as a post-scan data filter — the payoff the partitioned
    // layout exists for (reference README.md:52-58)
    assert(p.contains("PartitionFilters: [") && p.contains("l_returnflag"),
      s"no partition filter on the scan:\n${p.take(800)}")
    assert(p.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("= A")),
      s"partition filter does not pin the value:\n${p.take(800)}")
    // and every file actually read comes from the single pruned directory
    val files = q.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("l_returnflag=A")),
      s"read files outside the pruned partition: ${files.mkString(", ")}")
  }

  test("salted join spreads the hot key: equi-join on (key, salt), no broadcast") {
    val p = plan("join_salted")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // the whole point is surviving a dim too big to broadcast: the join
    // must be a shuffled equi-join whose keys include the salt column
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"),
      s"salted join must shuffle, not broadcast:\n${p.take(600)}")
    assert(p.contains("salt"), "salt column missing from the executed plan")
  }

  test("aggregations are two-phase (map-side partial combine)") {
    val p = plan("agg_group_sum")
    assert(p.contains("partial_sum") || p.contains("partial_"),
      "no partial aggregation before the shuffle")
  }
}
