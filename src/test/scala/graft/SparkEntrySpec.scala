package graft

import org.apache.spark.sql.functions.col

/** Contract tests for the driver interface: every declared query must have
  * an oracle (or be explicitly rows-only), run at the smoke scale factor,
  * and be deterministic across re-execution — the property the DuckDB
  * hash-compare depends on but only observes once per round.
  */
class SparkEntrySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  // none left: since r5, agg_approx_distinct proves its HLL bound through
  // an exact + within_10pct reshape the DuckDB oracle can hash-match
  private val rowsOnly = Set.empty[String]

  test("every query has an oracle or a documented rows-only waiver") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o) == rowsOnly, s"queries without oracle: ${q -- o -- rowsOnly}")
    assert((o -- q).isEmpty, s"oracles without query: ${o -- q}")
  }

  test("flagship smoke: entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query executes at sf0.001 and returns a well-formed frame") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sf)
        assert(df.columns.nonEmpty)
        df.queryExecution.toRdd.count() // execute the full plan
        None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("approx_count_distinct stays within HLL error bounds of the exact twin") {
    import org.apache.spark.sql.functions._
    val df = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey")).as("approx"))
    df.collect().foreach { r =>
      val (exact, approx) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approx - exact).toDouble / exact < 0.1,
        s"approx $approx vs exact $exact exceeds 10%")
    }
  }

  test("order-sensitive queries are deterministic across re-execution") {
    // the queries where nondeterminism would hide: ids, sampling, window
    // ranks, hash signatures, floating aggregation
    val probes = Seq("id_row_number", "id_zip_index", "sample_hash_mod",
      "win_row_number", "dedup_minhash_pairs", "dedup_simhash",
      "ann_cosine_topk", "agg_percentile", "flagship")
    probes.foreach { name =>
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sf).collect().toSeq
      val b = fn(spark, sf).collect().toSeq
      assert(a == b, s"$name differs across runs")
    }
  }

  test("results are invariant to the shuffle partition count") {
    // the distributed-correctness property the DuckDB gate can't see: the
    // same query must produce identical rows whatever the cluster layout.
    // Probes cover each place layout could leak in: partial aggregation
    // order, window partitioning, banded self-joins, the two-level
    // skyline prune, grid-cell join, and zipWithIndex id assignment.
    val probes = Seq("agg_group_sum", "stats_weighted_median",
      "dedup_minhash_pairs", "skyline_window", "join_grid_spatial",
      "win_running_sum", "id_zip_index", "sample_class_balance")
    val orig = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val base = probes.map { n =>
        n -> SparkEntry.queries(n)(spark, sf).collect().toSeq
      }.toMap
      for (p <- Seq("3", "17")) {
        spark.conf.set("spark.sql.shuffle.partitions", p)
        probes.foreach { n =>
          assert(SparkEntry.queries(n)(spark, sf).collect().toSeq == base(n),
            s"$n differs at shuffle.partitions=$p")
        }
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", orig)
  }
}
