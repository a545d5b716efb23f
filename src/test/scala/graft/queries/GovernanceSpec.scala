package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic invariants for the wave-6 governance / scoring operators —
  * properties the DuckDB hash-match can't state directly (the oracle
  * proves value equality; these prove the CONTRACT the values must obey).
  */
class GovernanceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(q: String) = SparkEntry.queries(q)(spark, sf)

  test("k-anonymity: every released group has >= 5 rows, and no customer is lost") {
    val out = run("privacy_k_anon").cache()
    try {
      // suppression (level 2) may hold < k rows — that is what makes the
      // RELEASED quasi-identifiers safe; every generalized group must not
      val leaks = out.filter(col("level") < 2 && col("n_rows") < 5).count()
      assert(leaks == 0, s"$leaks released groups violate k=5")
      val total = out.agg(sum("n_rows")).head().getLong(0)
      val customers = spark.read.parquet(s"$sf/customer.parquet").count()
      assert(total == customers,
        s"audit covers $total of $customers customers — rows were dropped")
    } finally { out.unpersist(); () }
  }

  test("bloom prefilter result is EXACTLY the plain join (false positives eliminated)") {
    val bloom = run("join_bloom_prefilter")
    val dim = spark.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_acctbal") > 9000).select("c_custkey", "c_mktsegment")
    val plain = spark.read.parquet(s"$sf/orders.parquet")
      .join(dim, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("sum_cents"))
      .orderBy("c_mktsegment")
    assert(bloom.collect().toSeq == plain.collect().toSeq)
  }

  test("surprisal bucketing: rarer vocabulary means strictly more bits per token") {
    val out = run("text_surprisal_bucket").cache()
    try {
      // the integer surprisal is a valid score: non-negative, and the
      // bucket thresholds partition the corpus without gaps
      assert(out.filter(col("surprisal_bits") < 0).count() == 0)
      val perBucket = out.groupBy("bucket").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(perBucket.keySet == Set("head", "middle", "tail"),
        s"degenerate split: $perBucket")
      // head docs score strictly below tail docs on mean bits
      val headMax = out.filter(col("bucket") === "head")
        .agg(max("mean_bits_milli")).head().getLong(0)
      val tailMin = out.filter(col("bucket") === "tail")
        .agg(min("mean_bits_milli")).head().getLong(0)
      assert(headMax < tailMin)
    } finally { out.unpersist(); () }
  }

  test("feature hashing conserves token mass and stays inside 64 dims") {
    val out = run("feature_hash_vector").cache()
    try {
      val nTerms = out.agg(sum("n_terms")).head().getLong(0)
      val nToks = spark.read.parquet(s"$sf/documents.parquet")
        .select(explode(split(col("text"), " "))).count()
      assert(nTerms == nToks, s"hashed $nTerms of $nToks tokens")
      assert(out.filter(col("dim") < 0 || col("dim") > 63).count() == 0)
      // signed trick: |value| can never exceed the colliding token count
      assert(out.filter(abs(col("value")) > col("n_terms")).count() == 0)
    } finally { out.unpersist(); () }
  }

  test("substring spans: disjoint per doc, stride-consistent, >= one gram wide") {
    val out = run("dedup_substring_span").cache()
    try {
      // span_end - span_start must equal stride*(n_grams-1) + gram_len
      val inconsistent = out.filter(
        col("span_end") - col("span_start") =!= (col("n_grams") - 1) * 16 + 32).count()
      assert(inconsistent == 0, s"$inconsistent spans break the stride arithmetic")
      val overlaps = out.as("a").join(out.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("a.span_start") < col("b.span_start") &&
          col("b.span_start") < col("a.span_end")).count()
      assert(overlaps == 0, s"$overlaps overlapping span pairs — islands merge failed")
    } finally { out.unpersist(); () }
  }

  test("mix schedule: weights are true integer square roots and shares sum to ~1") {
    val out = run("sample_mix_schedule").cache()
    try {
      val badRoot = out.filter(
        col("wgt") * col("wgt") > col("n_toks") ||
          (col("wgt") + 1) * (col("wgt") + 1) <= col("n_toks")).count()
      assert(badRoot == 0, "floor(sqrt) is not the integer square root")
      val Array(total, n) = out.agg(sum("share_ppm"), count(lit(1)))
        .head().toSeq.map(_.asInstanceOf[Long]).toArray
      // each source floors away < 1 ppm
      assert(total <= 1000000L && total > 1000000L - n,
        s"shares sum to $total ppm across $n sources")
    } finally { out.unpersist(); () }
  }

  test("attribution: every purchase appears once; credit never postdates the purchase") {
    val out = run("events_attribution").cache()
    try {
      val purchases = graft.Tables.events(spark, sf)
        .filter(col("event_type") === "purchase").count()
      assert(out.count() == purchases, "purchases dropped or duplicated")
      val timeTravel = out.filter(col("view_us") > col("purchase_us")).count()
      assert(timeTravel == 0, s"$timeTravel purchases credited to a LATER view")
      val staleCredit = out.filter(col("attributed") &&
        col("purchase_us") - col("view_us") > 604800L * 1000000L).count()
      assert(staleCredit == 0, s"$staleCredit credits escaped the 7-day lookback")
    } finally { out.unpersist(); () }
  }

  test("VAD segments: window counts close and segments never touch or overlap") {
    val out = run("mm_audio_vad").cache()
    try {
      val badWidth = out.filter(
        col("n_windows") =!= col("end_win") - col("start_win") + 1).count()
      assert(badWidth == 0, "a segment's window count disagrees with its bounds")
      // consecutive segments per media must be separated by an INACTIVE gap
      val touching = out.as("a").join(out.as("b"),
        col("a.media_id") === col("b.media_id") &&
          col("b.start_win") > col("a.start_win") &&
          col("b.start_win") <= col("a.end_win") + 1).count()
      assert(touching == 0, s"$touching segment pairs touch — merge missed them")
    } finally { out.unpersist(); () }
  }

  test("shot ids are monotone per media and advance exactly on boundaries") {
    val out = run("mm_shot_boundary")
    val bad = out
      .withColumn("prev_shot", lag("shot_id", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("media_id").orderBy("frame")))
      .filter(col("prev_shot").isNotNull &&
        col("shot_id") =!= col("prev_shot") + when(col("is_boundary"), 1L).otherwise(0L))
      .count()
    assert(bad == 0, s"$bad frames break the shot-id recurrence")
  }

  test("bag set ops: EXCEPT ALL and INTERSECT ALL partition a sub-bag exactly") {
    // both right sides are FILTERS of the left, i.e. true sub-bags, so
    // |A exceptAll B| must equal |A| - |B| and |A intersectAll B| = |B|
    val li = graft.Tables.lineitem(spark, sf)
    val nAll = li.count()
    val nDisc = li.filter(col("l_discount") > 0.05).count()
    val nRet = li.filter(col("l_returnflag") === "R").count()
    assert(run("setop_except_all").count() == nAll - nDisc,
      "EXCEPT ALL multiplicity arithmetic broken")
    assert(run("setop_intersect_all").count() == nRet,
      "INTERSECT ALL of a sub-bag must return the sub-bag's cardinality")
  }

  test("OOV rate: rates bounded, rare tokens detected, per-doc counts close") {
    val out = run("text_oov_rate").cache()
    try {
      val oob = out.filter(col("oov_milli") < 0 || col("oov_milli") > 1000 ||
        col("n_oov") > col("n_tok")).count()
      assert(oob == 0, s"$oob docs report impossible OOV rates")
      assert(out.agg(sum("n_oov")).head().getLong(0) > 0,
        "no OOV tokens found — the mass threshold excluded nothing, test is vacuous")
      val totTok = out.agg(sum("n_tok")).head().getLong(0)
      val corpusTok = graft.Tables.documents(spark, sf)
        .select(explode(split(col("text"), " "))).count()
      assert(totTok == corpusTok, "per-doc token counts do not cover the corpus")
    } finally { out.unpersist(); () }
  }

  test("l-diversity: release flag is exactly the conjunction of its two conditions") {
    val out = run("privacy_l_diversity").cache()
    try {
      val wrong = out.filter(col("release_ok") =!=
        (col("l_distinct") >= 3 && col("top_sens") * 2 <= col("n_rows"))).count()
      assert(wrong == 0, s"$wrong groups have an inconsistent release flag")
      // both outcomes must be populated or the gate proves nothing
      val ok = out.filter(col("release_ok")).count()
      assert(ok > 0 && ok < out.count(), "release flag is degenerate on this corpus")
      val total = out.agg(sum("n_rows")).head().getLong(0)
      assert(total == graft.Tables.customer(spark, sf).count(),
        "audit lost customers")
    } finally { out.unpersist(); () }
  }

  test("regression slope matches Spark's native regr_slope within 1 ppm") {
    val native = graft.Tables.events(spark, sf)
      .select(col("event_type"),
        expr("datediff(CAST(ts AS DATE), DATE '2024-01-01')").cast("double").as("x"),
        expr("round(value * 100)").as("y"))
      .groupBy("event_type").agg(expr("regr_slope(y, x)").as("slope"))
    val got = run("stats_regr_slope")
      .join(native, "event_type")
      .select(col("event_type"), col("slope_cpd_ppm"),
        (col("slope") * 1e6).as("native_ppm"))
    val off = got.filter(abs(col("slope_cpd_ppm") - col("native_ppm")) > 1.0).count()
    assert(off == 0, "integer-exact slope disagrees with native regr_slope")
  }
}
