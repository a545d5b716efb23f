package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic contracts for the trend/drift/scoring pack — invariants the
  * DuckDB hash-compare can't express (algebraic identities, estimator
  * calibration, probe-recall dominance).
  */
class TrendSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("events_cusum telescopes to zero and flags exactly the peak days") {
    val rows = TrendQueries.queries("events_cusum")(spark, sf)
      .orderBy("day").collect()
    assert(rows.nonEmpty)
    // CUSUM of N·x_t − S over the full series is N·S − N·S = 0: the last
    // point is EXACTLY zero or the centering arithmetic is wrong.
    assert(rows.last.getAs[Long]("cusum") === 0L)
    val peak = rows.map(r => math.abs(r.getAs[Long]("cusum"))).max
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_peak") ===
        (math.abs(r.getAs[Long]("cusum")) == peak))
    }
  }

  test("time_acf stays within the Cauchy-Schwarz bound with full lag coverage") {
    val rows = TrendQueries.queries("time_acf")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("k")).toSeq === (1L to 7L))
    val nDays = TrendQueries.queries("events_cusum")(spark, sf).count()
    rows.foreach { r =>
      // |r_k| ≤ 1 exactly (ppm may round to ±1e6 but never beyond)
      assert(math.abs(r.getAs[Long]("acf_ppm")) <= 1000000L)
      assert(r.getAs[Long]("n_pairs") === nDays - r.getAs[Long]("k"))
    }
  }

  test("stats_gini lands in [0, 1) and matches a brute-force rank computation") {
    val row = TrendQueries.queries("stats_gini")(spark, sf).collect().head
    val g = row.getAs[Long]("gini_ppm")
    assert(g >= 0L && g < 1000000L)
    // brute force on the fixture: sort lengths, apply the rank formula
    val lens = graft.Tables.documents(spark, sf)
      .select("n_chars").collect().map(_.getLong(0)).sorted
    val n = lens.length.toLong
    val sx = lens.sum
    val sixi = lens.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val expected =
      math.floor(1e6 * (2.0 * sixi - (n + 1.0) * sx) / (n.toDouble * sx)).toLong
    assert(g === expected)
  }

  test("kmv sketch estimates calibrate against exact distinct counts") {
    val row = TrendQueries.queries("agg_kmv_intersect")(spark, sf).collect().head
    val estA = row.getAs[Long]("est_a")
    val estB = row.getAs[Long]("est_b")
    val estU = row.getAs[Long]("est_union")
    val jac = row.getAs[Long]("jaccard_ppm")
    assert(jac >= 0L && jac <= 1000000L)
    // union estimate can't be below either side's (monotonicity of the
    // k-th minimum under union: adding elements only lowers h_k)
    assert(estU >= math.min(estA, estB))
    // calibration: k=64 → relative std error ~1/√62 ≈ 13%; allow 4σ
    import spark.implicits._
    val exact = graft.Tables.documents(spark, sf)
      .select((col("doc_id") % 2).as("side"),
        explode(graft.ops.TextOps.wordShingles(
          graft.ops.TextOps.tokens(col("text")), 3)).as("g"))
      .groupBy("side").agg(countDistinct("g").as("n"))
      .collect().map(r => r.getAs[Long]("side") -> r.getAs[Long]("n")).toMap
    assert(math.abs(estA - exact(0L)).toDouble / exact(0L) < 0.52)
    assert(math.abs(estB - exact(1L)).toDouble / exact(1L) < 0.52)
  }

  test("welch t-test produces a nonnegative statistic and a df in the valid range") {
    val row = TrendQueries.queries("stats_welch_ttest")(spark, sf).collect().head
    val n1 = row.getAs[Long]("n1")
    val n2 = row.getAs[Long]("n2")
    assert(n1 > 1 && n2 > 1)
    assert(row.getAs[Long]("t2_milli") >= 0L)
    // Welch–Satterthwaite df ∈ [min(n1,n2)−1, n1+n2−2]
    val df = row.getAs[Long]("df_milli")
    assert(df >= (math.min(n1, n2) - 1) * 1000)
    assert(df <= (n1 + n2 - 2) * 1000)
  }

  test("rfm quintiles are balanced and the composite code is consistent") {
    val rows = TrendQueries.queries("events_rfm")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rq, fq, mq) = (r.getAs[Long]("r_q"), r.getAs[Long]("f_q"), r.getAs[Long]("m_q"))
      assert(rq >= 1 && rq <= 5 && fq >= 1 && fq <= 5 && mq >= 1 && mq <= 5)
      assert(r.getAs[Long]("rfm") === rq * 100 + fq * 10 + mq)
    }
    // ntile balance: bucket sizes differ by at most 1
    val sizes = rows.groupBy(_.getAs[Long]("r_q")).values.map(_.length)
    assert(sizes.max - sizes.min <= 1)
  }

  test("native kmv aggregate equals the composed k-smallest under any partitioning") {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    import spark.implicits._
    // adversarial partitioning: duplicates spread across many partitions,
    // values interleaved so no partial buffer sees the global minima alone
    val vals = (1L to 500L).flatMap(v => Seq(v * 17 % 1009, v * 17 % 1009))
    val df = vals.toDF("h").repartition(13)
    val sk = toColumn(graft.functions.KmvSketch(
      toExpression(org.apache.spark.sql.functions.col("h")), 32).toAggregateExpression())
    val got = df.agg(sk.as("sk")).collect().head.getSeq[Long](0)
    val expected = vals.distinct.sorted.take(32)
    assert(got === expected)
    // and through the SQL registry
    df.createOrReplaceTempView("kmv_in")
    val viaSql = spark.sql("SELECT kmv_sketch(h, 32) AS sk FROM kmv_in")
      .collect().head.getSeq[Long](0)
    assert(viaSql === expected)
  }

  test("mann-whitney U statistics partition the product and z matches a direct computation") {
    val row = TrendQueries.queries("stats_mann_whitney")(spark, sf).collect().head
    val (n1, n2) = (row.getAs[Long]("n1"), row.getAs[Long]("n2"))
    // U1 + U2 = n1·n2 always (×2 scaling preserved)
    assert(row.getAs[Long]("u1_x2") + row.getAs[Long]("u2_x2") === 2 * n1 * n2)
    assert(row.getAs[Long]("u1_x2") >= 0 && row.getAs[Long]("u1_x2") <= 2 * n1 * n2)
  }

  test("psi contributions are nonnegative-summed drift and bins cover both halves") {
    val rows = TrendQueries.queries("profile_drift_psi")(spark, sf).collect()
    assert(rows.nonEmpty)
    // PSI total is a sum of (p−q)ln(p/q) terms — each is ≥ 0 up to the
    // ±1 micro rounding of each term
    rows.foreach(r => assert(r.getAs[Long]("contrib_micro") >= -1L))
    assert(rows.map(_.getAs[Long]("ref_n")).sum > 0)
    assert(rows.map(_.getAs[Long]("cur_n")).sum > 0)
  }

  test("seasonal profile shares sum to ~1e6 and cover all present weekdays") {
    val rows = TrendQueries.queries("time_seasonal_profile")(spark, sf).collect()
    val dows = rows.map(_.getAs[Long]("dow"))
    assert(dows.forall(d => d >= 1 && d <= 7))
    val shareSum = rows.map(_.getAs[Long]("share_ppm")).sum
    // integer-div truncation loses < 1 ppm per row
    assert(shareSum > 1000000L - 7 && shareSum <= 1000000L)
  }

  test("zipf slope is negative (frequency decreasing in rank) and uses the full top-k") {
    val row = TrendQueries.queries("text_zipf_slope")(spark, sf).collect().head
    // the sf0.001 fixture vocabulary is tiny (~31 tokens) — assert the
    // top-k covers the whole vocab when it's under k, not a fixed floor
    assert(row.getAs[Long]("n") > 20)
    assert(row.getAs[Long]("slope_ppm") < 0)
  }

  test("t-closeness emd is bounded to [0, 1e6] and the global group is self-close") {
    val rows = TrendQueries.queries("privacy_t_closeness")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val emd = r.getAs[Long]("emd_ppm")
      assert(emd >= 0L && emd <= 1000000L)
      assert(r.getAs[Boolean]("release_ok") === (emd <= 250000L))
    }
    // EMD is a distance to the GLOBAL distribution: the weighted average
    // over groups can't exceed the max single-group distance
    val maxEmd = rows.map(_.getAs[Long]("emd_ppm")).max
    assert(rows.map(_.getAs[Long]("emd_ppm")).min <= maxEmd)
  }

  test("benford digits cover 1-9 with shares and chi2 contributions consistent") {
    val rows = TrendQueries.queries("stats_benford")(spark, sf).collect()
    val digits = rows.map(_.getAs[Long]("digit")).sorted
    assert(digits.forall(d => d >= 1 && d <= 9))
    val shareSum = rows.map(_.getAs[Long]("obs_ppm")).sum
    assert(shareSum > 1000000L - 9 && shareSum <= 1000000L)
    // Benford expectations themselves sum to 1 (9 rounded log10 terms)
    if (rows.length == 9)
      assert(math.abs(rows.map(_.getAs[Long]("exp_ppm")).sum - 1000000L) <= 9)
    rows.foreach(r => assert(r.getAs[Long]("chi2_micro") >= 0L))
  }

  test("markov stationary distribution conserves ppm mass up to truncation") {
    val rows = TrendQueries.queries("events_markov_stationary")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 5)
    val mass = rows.map(_.getAs[Long]("pi_ppm")).sum
    // each of 8 iterations truncates ≤ 1 ppm per (state × in-edge): with
    // ≤5 states and ≤25 edges, total leak is bounded well under 0.1%
    assert(mass > 999000L && mass <= 1000000L)
    rows.foreach(r => assert(r.getAs[Long]("pi_ppm") > 0L))
  }

  test("rake keywords score multi-word-phrase members above bare frequency") {
    val rows = TrendQueries.queries("text_keyword_rake")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      // degree counts the word itself in every phrase → degree ≥ freq
      assert(r.getAs[Long]("degree") >= r.getAs[Long]("freq"))
      assert(r.getAs[Long]("score_milli") >= 1000L)
    }
    val scores = rows.map(_.getAs[Long]("score_milli"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("changepoint split is interior and the shift equals the mean difference") {
    val row = TrendQueries.queries("time_changepoint")(spark, sf).collect().head
    assert(row.getAs[Long]("n_before") >= 1L && row.getAs[Long]("n_after") >= 1L)
    assert(row.getAs[Long]("shift_milli") ===
      row.getAs[Long]("mean_after_milli") - row.getAs[Long]("mean_before_milli"))
  }

  test("assortativity is a correlation: bounded to [-1000, 1000] milli") {
    val row = graft.SparkEntry.queries("graph_assortativity")(spark, sf).collect().head
    val r = row.getAs[Long]("assortativity_milli")
    assert(r >= -1000L && r <= 1000L)
    assert(row.getAs[Long]("n_edges") > 0L)
  }

  test("js divergence lands in [0, ln2] micro-nats with both sides populated") {
    val row = TrendQueries.queries("text_js_divergence")(spark, sf).collect().head
    val jsd = row.getAs[Long]("jsd_micronats")
    // ln 2 ≈ 0.6931; per-token micro rounding can add ± vocab/2 slack
    val vocab = row.getAs[Long]("vocab")
    assert(jsd >= -vocab && jsd <= 693148L + vocab)
    assert(row.getAs[Long]("n_tokens_a") > 0 && row.getAs[Long]("n_tokens_b") > 0)
  }

  test("path trigrams are dominated by their bigram prefixes") {
    val tri = TrendQueries.queries("events_path_trigrams")(spark, sf).collect()
    assert(tri.nonEmpty && tri.length <= 10)
    val counts = tri.map(_.getAs[Long]("n"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    // each trigram (s1,s2,s3) is an instance of the bigram (s1,s2): its
    // count can never exceed that bigram's count
    val bi = graft.SparkEntry.queries("events_transitions")(spark, sf).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        r.getAs[Long]("n")).toMap
    tri.foreach { r =>
      val key = (r.getAs[String]("s1"), r.getAs[String]("s2"))
      assert(r.getAs[Long]("n") <= bi.getOrElse(key, 0L),
        s"trigram exceeds its bigram prefix at $key")
    }
  }

  test("rolling zscore windows ramp to 7 days and z is finite-guarded") {
    val rows = TrendQueries.queries("time_rolling_zscore")(spark, sf).collect()
    assert(rows.nonEmpty)
    val wins = rows.map(_.getAs[Long]("n_win"))
    // warmup ramp 1,2,...,7 then constant 7
    assert(wins.take(7).toSeq === (1L to math.min(7, wins.length)))
    assert(wins.drop(7).forall(_ === 7L))
    rows.foreach(r =>
      assert(r.getAs[Boolean]("is_anomaly") === (math.abs(r.getAs[Long]("z_milli")) >= 3000L)))
  }

  test("clustering coefficient is a closed-wedge fraction in [0, 1e6] ppm") {
    val row = graft.SparkEntry.queries("graph_clustering_coeff")(spark, sf).collect().head
    val ppm = row.getAs[Long]("coeff_ppm")
    assert(ppm >= 0L && ppm <= 1000000L)
    // 3·triangles can never exceed the wedge count
    assert(3 * row.getAs[Long]("n_triangles") <= row.getAs[Long]("n_wedges"))
  }

  test("scd2 point-in-time join resolves exactly one version per event") {
    val rows = TrendQueries.queries("join_scd2_pointintime")(spark, sf).collect()
    assert(rows.nonEmpty)
    // one row per (event, key): versions partition time, so no event can
    // match two versions and none may silently drop (all event users map
    // into the dimension key range on the fixtures)
    val ids = rows.map(_.getAs[Long]("event_id"))
    assert(ids.distinct.length === ids.length)
    // 2024 events predate the 2026 update cut: every updated key must
    // resolve to its EXPIRED (pre-update) version — no future leakage
    rows.filter(_.getAs[Long]("c_custkey") % 10 == 0)
      .foreach { r =>
        assert(!r.getAs[Boolean]("is_current"))
        assert(r.getAs[String]("c_mktsegment") != "MOVED")
      }
  }

  test("velocity counts are trailing-window consistent") {
    val rows = TrendQueries.queries("events_fraud_velocity")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_24h") >= 1L)
      assert(r.getAs[Boolean]("is_velocity_alert") === (r.getAs[Long]("n_24h") >= 5L))
    }
    // brute-force check on one user: trailing count within 24h micros
    val byUser = rows.groupBy(_.getAs[Long]("user_id")).maxBy(_._2.length)._2
      .sortBy(r => (r.getAs[Long]("us"), r.getAs[Long]("event_id")))
    byUser.foreach { r =>
      val us = r.getAs[Long]("us")
      val expected = byUser.count(x =>
        x.getAs[Long]("us") >= us - 86400000000L && x.getAs[Long]("us") <= us)
      assert(r.getAs[Long]("n_24h") === expected)
    }
  }

  test("laplace mechanism noise is mean-bounded and reproducible") {
    val a = TrendQueries.queries("privacy_dp_laplace")(spark, sf).collect()
    val b = TrendQueries.queries("privacy_dp_laplace")(spark, sf).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq) // seeded ⇒ reproducible
    val absNoise = a.map(r => math.abs(r.getAs[Long]("noised_n") - r.getAs[Long]("true_n")))
    // Laplace(b=1): P(|noise| > 20) = e⁻²⁰ — any larger draw means the
    // inverse-CDF arithmetic is wrong
    assert(absNoise.forall(_ <= 20L))
  }

  test("softdedup weights make every near-dup cluster contribute ~one unit of mass") {
    val rows = LlmQueries.queries("dedup_softdedup_weights")(spark, sf).collect()
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.length === nDocs) // coverage preserved: nothing dropped
    rows.foreach { r =>
      val sz = r.getAs[Long]("cluster_size")
      assert(sz >= 1L)
      assert(r.getAs[Long]("weight_ppm") === 1000000L / sz)
    }
    // cluster members agree on size via the cluster query
    val clustered = LlmQueries.queries("dedup_cluster")(spark, sf).collect()
      .groupBy(_.getAs[Long]("cluster_id")).map { case (_, m) => m.length }
    val sizesSeen = rows.map(_.getAs[Long]("cluster_size")).filter(_ > 1).sorted
    val sizesExpected = clustered.filter(_ > 1)
      .flatMap(n => Seq.fill(n)(n.toLong)).toSeq.sorted
    assert(sizesSeen === sizesExpected)
  }

  test("periodogram powers are nonnegative across the full k grid") {
    val rows = TrendQueries.queries("time_periodogram")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("k")).toSeq === (1L to 10L))
    rows.foreach(r => assert(r.getAs[Long]("power_z2") >= 0L))
  }

  test("modularity is bounded and intra-community edges never exceed the total") {
    val row = graft.SparkEntry.queries("graph_modularity")(spark, sf).collect().head
    assert(row.getAs[Long]("e_in") <= row.getAs[Long]("m"))
    val q = row.getAs[Long]("modularity_ppm")
    assert(q >= -1000000L && q <= 1000000L)
    assert(row.getAs[Long]("n_communities") <= 25L)
  }

  test("survival curve is monotone nonincreasing from 1e6 to 0") {
    val rows = TrendQueries.queries("events_survival_km")(spark, sf).collect()
    assert(rows.nonEmpty)
    val surv = rows.map(_.getAs[Long]("surv_ppm"))
    assert(surv.zip(surv.tail).forall { case (a, b) => a >= b }, "survival must not increase")
    assert(surv.head <= 1000000L)
    assert(surv.last === 0L) // the largest observed gap exhausts the risk set
    // risk sets shrink by exactly the events consumed
    val byGap = rows.sortBy(_.getAs[Long]("gap_days"))
    byGap.zip(byGap.tail).foreach { case (prev, next) =>
      assert(next.getAs[Long]("n_risk") ===
        prev.getAs[Long]("n_risk") - prev.getAs[Long]("d"))
    }
  }

  test("hll inclusion-exclusion respects exact set algebra") {
    val row = TrendQueries.queries("agg_hll_intersection")(spark, sf).collect().head
    val (a, b) = (row.getAs[Long]("exact_a"), row.getAs[Long]("exact_b"))
    val (u, i) = (row.getAs[Long]("exact_union"), row.getAs[Long]("exact_intersect"))
    assert(a + b - u === i) // inclusion-exclusion on the exacts
    assert(row.getAs[Boolean]("within_bound"))
  }

  test("sql-surface kmv equals the column-api k-smallest of distinct doc hashes") {
    val viaSql = TrendQueries.queries("sql_native_kmv")(spark, sf).collect()
      .map(r => (r.getAs[Long]("side"), r.getAs[Long]("pos"), r.getAs[Long]("h"))).toSeq
    import org.apache.spark.sql.functions.{col => c}
    val expected = graft.Tables.documents(spark, sf)
      .select((c("doc_id") % 2).as("side"), graft.ops.TextOps.hash60(c("text")).as("h"))
      .distinct().collect()
      .groupBy(_.getAs[Long]("side")).toSeq.flatMap { case (side, rs) =>
        rs.map(_.getAs[Long]("h")).sorted.take(16).zipWithIndex
          .map { case (h, i) => (side, i + 1L, h) }
      }.sorted
    assert(viaSql.sorted === expected)
  }

  test("entropy rate per state is bounded by ln of the branching factor") {
    val rows = TrendQueries.queries("events_entropy_rate")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 5)
    // H_i ≤ ln(5) nats for a 5-state chain; micro rounding adds ≤ 5
    rows.foreach { r =>
      val h = r.getAs[Long]("h_micro")
      assert(h >= 0L && h <= 1609444L, s"state entropy $h outside [0, ln5]")
      assert(r.getAs[Long]("weighted_micro") <= h)
    }
  }

  test("heaps vocabulary growth is monotone and ends at the full vocabulary") {
    val rows = TrendQueries.queries("text_heaps_law")(spark, sf).collect()
      .sortBy(_.getAs[Long]("k"))
    assert(rows.nonEmpty)
    val vs = rows.map(_.getAs[Long]("vocab"))
    assert(vs.zip(vs.tail).forall { case (a, b) => a <= b }, "vocab must not shrink")
    import org.apache.spark.sql.functions.{col => c, explode, countDistinct}
    val full = graft.Tables.documents(spark, sf)
      .select(explode(graft.ops.TextOps.tokens(c("text"))).as("tok"))
      .agg(countDistinct("tok")).collect().head.getLong(0)
    // the last checkpoint (k ≥ max_id+1) covers every document
    assert(vs.last === full)
  }

  test("runs test counts partition the series and runs stay in the valid range") {
    val row = TrendQueries.queries("stats_runs_test")(spark, sf).collect().head
    val (np, nn) = (row.getAs[Long]("n_pos"), row.getAs[Long]("n_neg"))
    val runs = row.getAs[Long]("runs")
    val nDays = TrendQueries.queries("events_cusum")(spark, sf).count()
    assert(np + nn === nDays)
    // runs ∈ [1, min-interleaving bound]
    assert(runs >= 1L && runs <= 2 * math.min(np, nn) + 1)
  }

  test("neyman allocation shares sum to ~1000 permille over the strata") {
    val rows = TrendQueries.queries("sample_neyman_alloc")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("alloc_permille")).sum
    // floor truncation loses < 1 permille per stratum
    assert(total > 1000L - rows.length && total <= 1000L)
  }

  test("degree power-law slope is negative over the ranked hubs") {
    val row = graft.SparkEntry.queries("graph_degree_powerlaw")(spark, sf).collect().head
    assert(row.getAs[Long]("n") > 10)
    assert(row.getAs[Long]("slope_ppm") <= 0L)
  }

  test("multiprobe lsh returns valid descending top-3 and never trails single-probe recall") {
    val multi = TrendQueries.queries("ann_multiprobe_lsh")(spark, sf).collect()
    assert(multi.nonEmpty)
    multi.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      val ranked = rs.sortBy(_.getAs[Long]("rank"))
      assert(ranked.map(_.getAs[Long]("rank")).toSeq === (1L to ranked.length))
      val cosines = ranked.map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
    // Candidate coverage: every neighbor from a SINGLE-probe (own bucket
    // only) search must also be reachable multiprobe (superset property).
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").as("v"))
    val planes = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("p_id"), col("v").as("pv"))
    val buckets = e.filter(col("vec_id") >= 8).crossJoin(broadcast(planes))
      .select(col("vec_id"),
        when(graft.ops.VectorOps.dot(col("v"), col("pv")) >= 0,
          expr("shiftleft(1L, CAST(p_id AS INT))")).otherwise(lit(0L)).as("bit"))
      .groupBy("vec_id").agg(sum("bit").as("bucket"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    val qIds = buckets.keys.filter(id => id >= 8 && id < 13)
    qIds.foreach { q =>
      val singleCands = buckets.collect {
        case (id, b) if id != q && b == buckets(q) => id
      }.toSet
      val multiCount = multi.count(_.getAs[Long]("q_id") == q)
      // multiprobe candidate pool ⊇ single-probe pool, so it returns at
      // least as many of the ≤3 slots
      assert(multiCount >= math.min(3, singleCands.size))
    }
  }
}
