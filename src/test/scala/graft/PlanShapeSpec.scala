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

  test("line-segment dedup: frequency side joins back as an equi-join, no cartesian") {
    val p = plan("dedup_line_segments")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"segment-frequency join degenerated:\n$p")
    assert(p.contains("Join"), "missing the segments-to-frequency join")
  }

  test("KS drift screen: every window is partitioned by source") {
    val p = plan("stats_ks_test")
    // per-source CDFs partition their running sums; the corpus CDF comes
    // from re-aggregating them — no unpartitioned (all-to-one) window
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty)
    assert(windows.forall(_.contains("source#")),
      s"unpartitioned window in KS plan:\n${windows.mkString("\n")}")
  }

  test("negative sampling: rank join broadcasts, edge rejection is an anti join") {
    val p = plan("graph_negative_samples")
    assert(!p.contains("CartesianProduct"), s"cartesian in negative sampling:\n$p")
    assert(p.contains("LeftAnti"), "edge rejection must be an anti join")
    assert(p.contains("BroadcastHashJoin"), "rank lookup must broadcast the node table")
  }

  test("common-neighbor scoring: wedge join is equi, edge removal is anti, top-k never global-sorts") {
    val p = plan("graph_common_neighbors")
    assert(!p.contains("CartesianProduct"), s"cartesian in common-neighbor scoring:\n$p")
    assert(p.contains("LeftAnti"), "known-edge removal must be an anti join")
    assert(p.contains("TakeOrderedAndProject"), "top-20 must be TakeOrdered, not a global sort")
  }

  test("semantic-cluster dedup: broadcast centroid assignment, bucket equi-join pairs") {
    val p = plan("dedup_semantic_cluster")
    // the only cartesian is the broadcast against the constant-size centroid
    // set (BroadcastNestedLoopJoin); the PAIR join must be a hash/merge
    // equi-join keyed on the cluster bucket
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "centroid assignment must broadcast")
    assert(!p.contains("CartesianProduct"), s"all-pairs cartesian in semantic dedup:\n$p")
    assert(p.linesIterator.exists(l =>
        (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")) && l.contains("bucket")),
      s"pair generation is not a bucket equi-join:\n$p")
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

  test("correlated EXISTS decorrelates to a semi join, never a cartesian") {
    val p = plan("subquery_exists")
    assert(p.contains("LeftSemi"), s"expected semi join:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("merge upsert keeps the base side via a single anti join") {
    val p = plan("merge_upsert")
    assert(p.contains("LeftAnti"), s"expected anti join:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("null-safe equality plans as a hash-keyed join, not a nested loop") {
    val p = plan("join_null_safe")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), s"<=> fell off the equi-join path:\n${p.take(600)}")
    assert(!p.contains("BroadcastNestedLoopJoin") || p.contains("Cross"),
      "null-safe join must not be a nested loop")
  }

  test("shuffle_hash hint yields a ShuffledHashJoin with no sort below it") {
    val p = plan("join_shuffle_hash")
    assert(p.contains("ShuffledHashJoin"), s"hint ignored:\n${p.take(600)}")
    val joinIdx = p.indexOf("ShuffledHashJoin")
    // SMJ would sort both sides; SHJ's children must be sort-free scans
    assert(!p.substring(joinIdx).contains("Sort "),
      s"unexpected sort under the hash join:\n${p.substring(joinIdx).take(400)}")
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // isolated session: AQE + aggressive skew thresholds, broadcast off so
    // the join stays SMJ (the plan shape where skew hurts at scale)
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    // many small partitions so the hot key's partition dwarfs the median
    s.conf.set("spark.sql.shuffle.partitions", "64")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s.implicits._
    // 20% of the fact lands on key 7, so one shuffle partition dwarfs the
    // median. Three things keep the skew VISIBLE to AQE's byte-based
    // stats, each learned the hard way: (1) the fact must come from
    // multiple map tasks (a single-mapper skewed partition has one block
    // and cannot be split by mapper ranges); (2) an incompressible
    // payload column must FLOW THROUGH the join shuffle — column pruning
    // plus LZ4 otherwise shrinks the constant-key hot partition to ~2×
    // the median; (3) the aggregate must consume that payload or pruning
    // drops it.
    val fact = s.sparkContext.parallelize(
      (1 to 1000000).map(i =>
        (if (i % 5 == 0) 7L else i.toLong, i * 2654435761L ^ (i.toLong << 32))), 8)
      .toDF("k", "v")
    val dim = ((7 to 100000 by 97).map(_.toLong) :+ 7L).distinct.map(k => (k, s"d$k"))
      .toDF("k2", "name")
    val j = fact.join(dim, $"k" === $"k2").groupBy($"name")
      .agg(org.apache.spark.sql.functions.max($"v").as("mv"))
    val qe = j.queryExecution
    qe.toRdd.count() // run it: AQE decides skew splits from runtime stats
    val p = qe.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"join not SMJ:\n${p.take(800)}")
    assert(p.contains("skew=true"),
      s"AQE did not mark the skewed join split:\n${p.take(1200)}")
  }

  test("join_dpp plants a dynamic pruning filter on the partitioned fact scan") {
    val p = plan("join_dpp")
    // the scan must carry dynamicpruningexpression(...) in PartitionFilters —
    // only the dim's surviving priorities' directories get listed/read
    assert(p.contains("dynamicpruning"),
      s"no dynamic partition pruning on the fact scan:\n${p.take(1200)}")
    assert(p.contains("PartitionFilters"), "fact scan lost its partition filters")
  }

  test("triangle counting stays on equi-joins — no cartesian anywhere") {
    val p = plan("graph_triangles")
    assert(!p.contains("CartesianProduct"),
      s"triangle join degenerated to a cartesian product:\n${p.take(800)}")
    // the only nested-loop allowed is the final 1-row×1-row count stitch
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "wedge-close must be a hash/merge equi-join")
  }

  test("tfidf top-3 window gets map-side WindowGroupLimit pruning") {
    assert(plan("text_tfidf_top").contains("WindowGroupLimit"))
  }

  test("q21's quantifier pair folds to one per-order aggregate, no fact re-joins") {
    // r16: the EXISTS/NOT-EXISTS pair no longer runs as semi+anti joins
    // re-shuffling lineitem twice — both quantifiers fold into one
    // per-(order, supplier) hash aggregate (distinct pairs, map-side
    // combinable) whose per-order counts join back once on the orderkey.
    // Pin: no semi/anti fact passes, no Expand (the rejected filtered-
    // countDistinct form), and everything stays on equi paths.
    val p = plan("tpch_q21")
    assert(!p.contains("LeftSemi") && !p.contains("LeftAnti"),
      s"quantifiers regressed to semi/anti fact re-joins:\n${p.take(800)}")
    assert(!p.contains("Expand"),
      s"pair aggregate regressed to a multi-countDistinct Expand:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"correlated join fell off the equi path:\n${p.take(800)}")
    // the SCALE property this rebuild bought (one fewer fact pass): at
    // most 2 lineitem scans — the sf0.1 exchange count is an accident of
    // broadcast thresholds, the scan count is structural (VERDICT r16 #1)
    val lineitemScans = p.linesIterator.count(ln =>
      ln.contains("FileScan parquet") && ln.contains("lineitem"))
    assert(lineitemScans <= 2,
      s"q21 regressed to $lineitemScans lineitem scans (max 2):\n${p.take(800)}")
  }

  test("q19's OR-of-ANDs predicate keeps the partkey equi-join") {
    val p = plan("tpch_q19")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"disjunctive predicate broke the equi-join:\n${p.take(800)}")
  }

  test("domain quota cap prunes map-side before the window shuffle") {
    // the rn<=15 filter must compile to WindowGroupLimit so each task
    // ships at most 15·|sources| rows into the exchange, not the corpus
    assert(plan("sample_domain_quota").contains("WindowGroupLimit"))
  }

  test("temperature resampling joins only broadcast aggregates") {
    // both mixture inputs (per-lang counts, global isqrt sum) are
    // constant-size — a sort-merge join here would shuffle the corpus
    // twice for a 5-row dimension
    val p = plan("sample_temperature")
    assert(p.contains("BroadcastHashJoin"), s"lang stats must broadcast:\n${p.take(600)}")
    assert(!p.contains("SortMergeJoin"), s"corpus must not shuffle for tiny dims:\n${p.take(600)}")
  }

  test("q2 scans the materialized candidate relation on both consumers") {
    // the argmin join reads q2_cand twice (min-per-part and the join
    // back); both must be scans of the scratch-parquet artifact — without
    // the materialization the derived-partsupp aggregation (a full fact
    // scan) would run twice
    val p = plan("tpch_q2")
    val artifactReads = "graft-scratch[^\\]]*q2_cand".r.findAllIn(p).length
    assert(artifactReads >= 2,
      s"expected both consumers to scan the q2_cand artifact, found $artifactReads")
    assert(!p.contains("lineitem.parquet"),
      "the fact must never be re-scanned once the candidate artifact exists")
  }

  test("bm25 top-k: broadcast stats, TakeOrderedAndProject, no cartesian") {
    // the query itself reads the materialized score artifact; the
    // broadcast-stats property lives in the BUILD plan, pinned separately
    val build = queries.RetrievalQueries.bm25Build(spark, sf)
      .queryExecution.executedPlan.toString
    // df/avgdl are constant-size aggregates — they must broadcast back
    // onto the tf rows, and the top-50 must be a per-partition top-k
    assert(build.contains("BroadcastHashJoin"),
      s"term stats must broadcast:\n${build.take(600)}")
    assert(!build.contains("CartesianProduct"))
    val p = plan("text_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"), "top-50 must not be a global sort")
    assert(!p.contains("CartesianProduct"))
  }

  test("PQ ADC search joins codes to the 32-row table via broadcast hash") {
    val p = plan("ann_pq_adc")
    // the whole point of ADC: per-vector cost is a (subspace, code) hash
    // lookup, never per-pair vector math — so the join must be broadcast
    // hash on those keys and nothing may degenerate to a cartesian
    assert(p.contains("BroadcastHashJoin"), s"ADC table must broadcast:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"), "top-10 must not be a global sort")
  }

  test("IVF-PQ: bucket equi-join prunes before ADC, tables broadcast, no full-corpus scan into ADC") {
    val p = plan("ann_ivf_pq_adc")
    // the composed index's whole point: candidates come from the probed-
    // bucket equi-join, and the per-query ADC table is a broadcast hash
    // lookup. The only nested loops allowed are the constant 8-row
    // centroid/codebook broadcasts — every BNLJ must be a BuildRight
    // broadcast cross, never an unbounded pair join, and no cartesian.
    assert(!p.contains("CartesianProduct"),
      s"IVF-PQ degenerated to an all-pairs plan:\n${p.take(800)}")
    val bnl = p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnl.forall(_.contains("BuildRight")),
      s"non-broadcast pair join in IVF-PQ plan:\n${bnl.mkString("\n")}")
    assert(p.contains("BroadcastHashJoin"), s"ADC/centroid tables must broadcast:\n${p.take(600)}")
    assert(p.contains("WindowGroupLimit"), "per-query top-10 must prune map-side")
  }

  test("trained-IVF composes train/assign/probe without any cartesian") {
    val p = plan("ann_ivf_trained")
    assert(!p.contains("CartesianProduct"), s"all-pairs in trained IVF:\n${p.take(800)}")
    val bnl = p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnl.forall(_.contains("BuildRight")),
      s"non-broadcast pair join in trained-IVF plan:\n${bnl.mkString("\n")}")
    assert(p.contains("WindowGroupLimit"), "rank-1/top-5 windows must prune map-side")
  }

  test("bottom-k sample rank prunes map-side; LPA rounds stay equi-joins") {
    val ps = plan("sample_bottomk_median")
    assert(ps.contains("WindowGroupLimit"),
      "rank-64 sample must forward <= 64 rows per group per task")
    val pl = plan("graph_lpa_communities")
    assert(!pl.contains("CartesianProduct") && !pl.contains("BroadcastNestedLoopJoin"),
      s"LPA propagation degenerated to a pair join:\n${pl.take(800)}")
    assert(pl.contains("WindowGroupLimit"), "per-node rank-1 label vote must prune map-side")
  }

  test("CDC latest-wins prunes map-side before the per-key window shuffle") {
    // rn=1 over (key ORDER BY seq DESC) must compile to WindowGroupLimit:
    // each task ships at most one candidate row per key into the exchange
    assert(plan("cdc_latest_wins").contains("WindowGroupLimit"))
  }

  test("erasure cascade is anti/semi joins with a broadcast tombstone set") {
    val p = plan("gdpr_erasure_cascade")
    assert(p.contains("LeftAnti") && p.contains("LeftSemi"),
      s"cascade must be anti (erase) + semi (survivors) joins:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("no unbounded window is partitioned solely by a constant-cardinality key") {
    // VERDICT r9: a window partitioned by a constant-cardinality column
    // (3-value l_returnflag etc.) runs as at most |values| tasks with a
    // full per-group sort — a parallelism ceiling no cluster size lifts.
    // Sweep EVERY declared query's physical plan: any Window whose
    // partition spec is entirely low-cardinality plain attributes must
    // either be map-side pruned (WindowGroupLimit below it) or consume a
    // bounded input (an aggregate below it — value-domain / dimension
    // windows); otherwise the scalable forms are StatsOps.groupedRowNumber
    // / groupedRunningSum or an agg + broadcast join-back.
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    val constCard = Set("l_returnflag", "l_linestatus", "o_orderstatus",
      "o_orderpriority", "event_type", "lang", "source", "r_name", "n_name")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val p = fn(spark, sf).queryExecution.sparkPlan
      p.collect {
        case w: WindowExec if w.partitionSpec.nonEmpty &&
            w.partitionSpec.forall {
              case a: AttributeReference => constCard(a.name.toLowerCase)
              case _ => false
            } &&
            w.child.collectFirst {
              case _: WindowGroupLimitExec => ()
              case _: BaseAggregateExec => ()
            }.isEmpty =>
          s"$name: Window partitioned by [${w.partitionSpec.mkString(", ")}] over an unbounded input"
      }
    }
    assert(offenders.isEmpty,
      s"constant-cardinality window partitions over raw inputs:\n${offenders.mkString("\n")}")
  }

  test("DV snapshot reads stay on hash anti-joins; incremental ANN search stays equi") {
    // the deletion-vector subtraction must plan as a hash-keyed LeftAnti
    // on (file_path, row_index) — never a nested loop over the fact
    val pDv = plan("lake_txlog_dv")
    assert(pDv.contains("LeftAnti"), s"DV must subtract via anti-join:\n${pDv.take(600)}")
    assert(!pDv.contains("CartesianProduct") && !pDv.contains("BroadcastNestedLoopJoin"),
      s"DV anti-join degenerated:\n${pDv.take(900)}")
    // incremental ANN: probe->codes and codes->vectors are equi-joins;
    // the only crossJoin is the broadcast constant-size centroid set
    val pAnn = plan("ann_index_incremental")
    assert(!pAnn.contains("CartesianProduct"),
      s"ANN search must never cross-join the corpus:\n${pAnn.take(900)}")
    // streaming upsert read-back: cumulative-DV anti-join, no nested loop
    val pUp = plan("stream_txlog_upsert_batcheq")
    assert(pUp.contains("LeftAnti") && !pUp.contains("CartesianProduct"))
  }

  test("manifest-stats join broadcasts on metadata alone (CBO shape)") {
    // with auto-broadcast disabled, only the query's explicit
    // metadata-driven broadcast() can make this a broadcast join — the
    // decision came from TxLog.tableRowCount, not from a scan or a
    // size estimate
    val c = spark.conf
    val saved = c.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan("lake_txlog_stats_join")
      assert(p.contains("BroadcastHashJoin"),
        s"manifest row count must drive a broadcast join:\n${p.take(800)}")
      // range half of the CBO surface: the equi-depth-histogram estimate
      // (manifest-only) broadcasts the 0.1%-selectivity dim side
      val pr = plan("lake_txlog_stats_range")
      assert(pr.contains("BroadcastHashJoin"),
        s"histogram range estimate must drive a broadcast join:\n${pr.take(800)}")
    } finally saved match {
      case Some(v) => c.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => c.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("stats-ordered 3-table join: dims broadcast on metadata, order flips with the stats") {
    val c = spark.conf
    val saved = c.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("lake_txlog_stats_order3")(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
        s"both dims must broadcast from manifest row counts alone:\n${p.take(1200)}")
      assert(df.collect().head.getString(0) === "supplier",
        "the smaller dim (by manifest row count) must join first")
      // THE pin that the order is stats-DRIVEN, not hardcoded: flipping
      // the row counts flips the chosen order (same tables, same data)
      val (tO, tS) = graft.queries.StatsQueries.txDim3Tables(spark, sf)
      val flipped = graft.queries.StatsQueries.statsOrderedThreeJoin(
        spark, sf, tO, tS, rowsO = 1L, rowsS = 2L)
      assert(flipped.collect().head.getString(0) === "orders",
        "flipped stats must flip the join order")
      assert("BroadcastHashJoin".r.findAllIn(
        flipped.queryExecution.executedPlan.toString).size >= 2)
    } finally saved match {
      case Some(v) => c.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => c.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("histogram-weighted ordering: a selective filter flips the raw-count join order") {
    val c = spark.conf
    val saved = c.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // with the range filter, the orders dim's HISTOGRAM estimate is the
      // smaller side: it must join first, and both dims still broadcast
      // purely on metadata
      val df = SparkEntry.queries("lake_txlog_stats_order_hist")(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
        s"both dims must broadcast from manifest estimates alone:\n${p.take(1200)}")
      val row = df.collect().head
      assert(row.getString(0) === "orders" && row.getBoolean(1),
        "the histogram estimate must flip the order raw counts would pick")
      // raw row counts alone (no filter, no histogram) pick supplier —
      // the flip is estimate-driven, not hardcoded
      val (tO, tS) = graft.queries.StatsQueries.txDim3Tables(spark, sf)
      val raw = graft.queries.StatsQueries.histOrderedThreeJoin(spark, sf, tO, tS,
        graft.ops.TxLog.tableRowCount(tO).get.toDouble,
        graft.ops.TxLog.tableRowCount(tS).get.toDouble, None)
      assert(raw.collect().head.getString(0) === "supplier")
    } finally saved match {
      case Some(v) => c.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => c.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("partition-wise manifest aggregates plan as LocalRelation — zero file scans") {
    val t = java.nio.file.Files.createTempDirectory("planshape-mg-")
      .resolve("t").toString
    import spark.implicits._
    Seq((1L, "en"), (2L, "de"), (3L, "en")).toDF("id", "lang")
      .write.format("txlog").partitionBy("lang").option("statsCols", "id").save(t)
    graft.plans.ManifestCountRule.install(spark)
    val rel = spark.read.format("txlog").load(t)
    // count(*) GROUP BY <partition col>: the optimized plan must be a
    // bare LocalRelation — no relation, no exchange, no scan node at all
    val grouped = rel.groupBy("lang").count()
    val gp = grouped.queryExecution.optimizedPlan
    assert(gp.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      s"group-by must collapse to a LocalRelation:\n$gp")
    // count/min/max under a partition equality: same collapse
    val slice = rel.filter(org.apache.spark.sql.functions.col("lang") === "en")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.min("id"))
    val sp = slice.queryExecution.optimizedPlan
    assert(sp.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      s"partition-slice aggregate must collapse to a LocalRelation:\n$sp")
  }

  test("string min/max and multi-column partition group-by collapse to LocalRelation") {
    import org.apache.spark.sql.functions.{col, count, lit, max, min}
    val dir = java.nio.file.Files.createTempDirectory("planshape-str-")
    import spark.implicits._
    graft.plans.ManifestCountRule.install(spark)
    // string-tracked table: min/max(name) + count(*) answer from the
    // manifest's strMin/strMax — the optimized plan is a bare
    // LocalRelation, not one file opened
    val ts = dir.resolve("s").toString
    Seq(("apple", 1L), ("pear", 2L)).toDF("name", "v")
      .write.format("txlog").option("statsCols", "name").save(ts)
    val mm = spark.read.format("txlog").load(ts)
      .agg(min("name").as("mn"), max("name").as("mx"), count(lit(1)).as("n"))
    assert(mm.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      s"string min/max must collapse:\n${mm.queryExecution.optimizedPlan}")
    assert(mm.collect().head.toSeq === Seq("apple", "pear", 2L))
    // two-level partitioned table: count(*) GROUP BY (both cols) answers
    // from per-leaf row counts — same collapse
    val tp = dir.resolve("p").toString
    Seq((1L, "en", "web"), (2L, "en", "book"), (3L, "de", "web"))
      .toDF("id", "lang", "src")
      .write.format("txlog").partitionBy("lang", "src")
      .option("statsCols", "id").save(tp)
    val g2 = spark.read.format("txlog").load(tp)
      .groupBy("lang", "src").count()
    assert(g2.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      s"two-column partition group-by must collapse:\n${g2.queryExecution.optimizedPlan}")
    assert(g2.orderBy("lang", "src").collect().map(_.toSeq).toSeq ===
      Seq(Seq("de", "web", 1L), Seq("en", "book", 1L), Seq("en", "web", 1L)))
  }

  test("no plan buffers a whole group in an exact-percentile aggregate") {
    // VERDICT r10: Spark's `percentile`/`median` is a
    // TypedImperativeAggregate whose buffer holds EVERY value of the
    // group — at 100 TB a single 3-way-split group is ~600M values in
    // one executor buffer. Sweep every declared query's plan: the exact
    // path must go through StatsOps.groupedExactPercentiles (rank-based,
    // bounded memory); only the constant-size sketch
    // (ApproximatePercentile) may aggregate.
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Median, Percentile}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      fn(spark, sf).queryExecution.sparkPlan.collect {
        case a: BaseAggregateExec if a.aggregateExpressions.exists(ae =>
            ae.aggregateFunction.isInstanceOf[Percentile] ||
              ae.aggregateFunction.isInstanceOf[Median]) =>
          name
      }
    }.distinct
    assert(offenders.isEmpty,
      s"group-buffering percentile aggregates remain in: ${offenders.mkString(", ")}")
  }

  test("interval join runs as a bucket equi-join, never a nested loop") {
    val p = plan("join_interval_bucketed")
    // a raw BETWEEN join would plan as BroadcastNestedLoopJoin — the
    // bucket replication must turn it into a hash/merge join on `day`
    // with the range predicate as a residual
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval join degenerated to a nested loop:\n${p.take(800)}")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "bucket join must be an equi-join")
    // r9 weak mark: a post-join .distinct() full-shuffled the widest
    // intermediate (windows × points) before the groupBy — the only
    // aggregation allowed above the join is the final partial+final pair
    assert("HashAggregate".r.findAllIn(p).size <= 2,
      s"extra aggregate above the bucket join (post-join distinct?):\n${p.take(1200)}")
  }

  test("runtime bloom filter injects a semi-join reduction on a selective shuffle join") {
    import org.apache.spark.sql.functions.col
    val c = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> c.getOption(k)).toMap
    try {
      // force the shuffle-join shape (no broadcast) and let the filter
      // apply to any scan size — the 100 TB behavior, where the selective
      // dim side's bloom filter prunes fact rows BEFORE the exchange
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val ord = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_totalprice") > 400000)
      val p = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
        .queryExecution.executedPlan.toString
      assert(p.contains("bloom_filter_agg") || p.contains("might_contain"),
        s"runtime bloom filter not injected:\n${p.take(800)}")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => c.set(k, x); case None => c.unset(k) }
    }
  }

  test("OHLC downsampling is a pure two-phase hash aggregate, no window") {
    val p = plan("time_downsample_ohlc")
    assert(p.contains("HashAggregate"), "OHLC must be a hash aggregate")
    // a window formulation would sort every event per key; argmin/argmax
    // keep it map-side combinable
    assert(!p.contains("WindowExec") && !p.contains("Window ("),
      s"OHLC regressed to a window plan:\n${p.take(600)}")
  }

  test("MAD outlier detection joins the fact only against broadcast medians") {
    val p = plan("stats_mad_outliers")
    assert(p.contains("BroadcastHashJoin"), "median join must broadcast")
    assert(!p.contains("SortMergeJoin"),
      s"per-type medians should never shuffle the fact into a merge join:\n${p.take(600)}")
  }

  test("BPE argmax merge broadcasts a single-row aggregate, never the vocab") {
    val p = plan("bpe_merge_iter")
    // top1 is LIMIT 1 of an aggregate → TakeOrdered feeding a broadcast
    assert(p.contains("TakeOrderedAndProject"), "argmax pair must be a top-k, not a sort")
    assert(p.contains("BroadcastExchange"), "the single-row pair must broadcast")
  }

  test("lateral LIMIT top-N decorrelates to WindowGroupLimit, not a re-executed subquery") {
    val p = plan("join_lateral_topn")
    assert(p.contains("WindowGroupLimit"),
      s"lateral decorrelation lost its rank-limit pruning:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("grid spatial join is a cell equi-join, never a distance nested loop") {
    val p = plan("join_grid_spatial")
    // the raw distance predicate would plan as BroadcastNestedLoopJoin;
    // the 3×3 cell replication must turn it into a hash join on (cx, cy)
    // with the exact dist2 check as a residual
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"spatial join degenerated to a nested loop:\n${p.take(800)}")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "cell join must be an equi-join")
  }

  test("column profiler: per-column distinct-value HASH aggs, no Expand, no wide sort") {
    // r16: the one-agg spelling (3x countDistinct + min/max over strings)
    // planned a 4-way Expand into a SortAggregate — string agg buffers
    // disqualify hash agg, so 4x|orders| expanded rows went through a
    // full sort. Each column now profiles via its own distinct-value
    // hash aggregate (one column-pruned scan each; the distinct table is
    // tiny, so the per-column scans are cheaper than the expanded sort).
    // Pin: no Expand, the first aggregate of every branch is hash-based,
    // and no Sort below the final ORDER BY.
    val p = plan("profile_columns")
    assert(!p.contains("Expand"),
      s"profiler regressed to the multi-distinct Expand plan:\n${p.take(600)}")
    val sorts = "Sort ".r.findAllIn(p).length
    assert(sorts <= 1, // the final ORDER BY col_name only
      s"profiler grew a pre-aggregate sort:\n${p.take(800)}")
  }

  test("unpivot sorts BELOW the Expand and nothing reshuffles above it") {
    // unpivot_melt's deterministic ordering rests on sorting the narrow
    // pre-melt side: Expand is a per-partition 1→3 map emitting value
    // columns in declared order, so the gate's ORDER BY holds iff NO
    // exchange sits between the Expand and the collect. That is a plan
    // SHAPE property, not a Spark contract — pin it so an optimizer or
    // AQE change that reintroduces a post-expand shuffle fails loudly
    // instead of silently breaking the ordering (ADVICE r14).
    val p = plan("unpivot_melt")
    val ei = p.indexOf("Expand")
    assert(ei >= 0, s"unpivot lost its Expand plan:\n${p.take(600)}")
    assert(!p.substring(0, ei).contains("Exchange"),
      s"an exchange above the Expand breaks the pre-melt sort order:\n${p.take(800)}")
    assert(p.indexOf("Sort", ei) > ei,
      s"the pre-melt sort below the Expand is gone:\n${p.take(800)}")
  }

  test("anomaly filter joins only the broadcast per-type stats") {
    val p = plan("anomaly_3sigma")
    assert(p.contains("BroadcastHashJoin"), s"type stats must broadcast:\n${p.take(600)}")
    assert(!p.contains("SortMergeJoin"), "fact must not shuffle for a 3-row dim")
  }

  test("bloom prefilter prunes the fact BELOW the join, and the join stays equi") {
    val p = plan("join_bloom_prefilter")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    val joinIdx = p.indexOf("HashJoin")
    val mcIdx = p.indexOf("might_contain")
    assert(joinIdx >= 0 && mcIdx >= 0, s"missing join or bloom filter:\n${p.take(600)}")
    // tree printing lists children after their parent: the bloom filter
    // must sit in the probe subtree (fewer rows reach the exchange), not
    // be applied post-join where it would prune nothing
    assert(mcIdx > joinIdx,
      s"might_contain is not below the join:\n${p.take(800)}")
  }

  test("surprisal scoring: only the single-row total broadcasts as a nested loop") {
    val p = plan("text_surprisal_bucket")
    assert(!p.contains("CartesianProduct"))
    // the token→count equi-join must not degenerate; the one expected
    // BroadcastNestedLoopJoin carries exactly the 1-row corpus total
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(bnl <= 1, s"unexpected nested-loop joins ($bnl):\n${p.take(800)}")
  }

  test("k-anon and shot-boundary windows are all partitioned (no single-partition stage)") {
    assert(!plan("privacy_k_anon").contains("SinglePartition"),
      "k-anon must never collapse to one partition")
    assert(!plan("mm_shot_boundary").contains("SinglePartition"),
      "shot detection must stay partitioned by media")
  }

  test("substring-span dedup marks candidates via hash equi-join, never pairwise") {
    val p = plan("dedup_substring_span")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"gram-candidate marking degenerated:\n${p.take(800)}")
    assert(!p.contains("SinglePartition"), "island windows must stay per-doc")
  }

  test("OOV vocab join broadcasts; slope aggregates with map-side partials") {
    val oov = plan("text_oov_rate")
    assert(oov.contains("BroadcastHashJoin"),
      "the mass-thresholded vocab must broadcast onto the token stream")
    assert(!oov.contains("CartesianProduct"))
    val slope = plan("stats_regr_slope")
    assert("HashAggregate".r.findAllIn(slope).length >= 2,
      "slope sums must partial-aggregate before the event_type shuffle")
  }

  test("bag set ops plan as aggregate+generate, never a row-by-row join") {
    for (q <- Seq("setop_except_all", "setop_intersect_all")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to a pairwise plan")
      assert(p.contains("Generate"), s"$q lost the count-and-replicate shape")
    }
  }

  test("attribution and VAD stay partitioned end to end") {
    assert(!plan("events_attribution").contains("SinglePartition"),
      "attribution must shuffle once on user_id, never collapse")
    assert(!plan("mm_audio_vad").contains("SinglePartition"),
      "VAD windows must stay per-media")
  }

  test("kmv sketches are distributed partial top-k, never a rank window") {
    val p = plan("agg_kmv_intersect")
    // each side's k smallest hashes must plan as TakeOrderedAndProject
    // (map-side partial top-k, constant memory per task) — a per-side
    // row_number window would sort the full shingle universe
    assert(p.contains("TakeOrderedAndProject"),
      s"kmv sketch lost the partial top-k shape:\n${p.take(800)}")
    assert(!p.contains("window"), s"rank window crept into the kmv plan")
    assert(!p.contains("CartesianProduct"))
  }

  test("multiprobe lsh candidates come from a bucket equi-join, never all-pairs") {
    val p = plan("ann_multiprobe_lsh")
    assert(!p.contains("CartesianProduct"),
      "candidate generation degenerated to all-pairs")
    // the only nested-loop joins allowed are the 8-row hyperplane
    // broadcasts (the subtree appears once per bdata consumer): every one
    // must be a BuildRight broadcast cross, never an unbounded pair join
    val bnl = p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnl.forall(_.contains("BuildRight")),
      s"non-broadcast pair join in multiprobe plan:\n${bnl.mkString("\n")}")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), "bucket probe must be an equi-join")
  }

  test("trend day-dimension windows never touch the event-row volume") {
    // acf/cusum windows run over the daily-count artifact (one row per
    // day); the event-volume aggregation below them must be a hash
    // aggregate, and the artifact read must come from scratch parquet
    for (q <- Seq("time_acf", "events_cusum")) {
      val p = plan(q)
      assert(p.contains("graft-scratch"),
        s"$q must read the materialized daily-count artifact")
      assert(p.contains("HashAggregate"), s"$q lost partial aggregation")
    }
  }

  test("q15 scans the fact once: materialized aggregate feeds both max and filter") {
    val p = plan("tpch_q15")
    // both consumers (the equality filter and the global max) must read
    // the materialized per-supplier aggregate — ReuseExchange can't
    // dedupe the two subplans (one grows a null filter), so without the
    // artifact the 100-TB fact would be scanned twice
    val artifactReads = "graft-scratch[^\\]]*q15_rev".r.findAllIn(p).length
    assert(artifactReads >= 2,
      s"expected both subplans to read the q15_rev artifact, found $artifactReads:\n${p.take(800)}")
    assert(!p.contains("lineitem.parquet"),
      "the fact must never be re-scanned once the revenue artifact exists")
  }
}
