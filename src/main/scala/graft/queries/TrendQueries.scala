package graft.queries

import graft.Tables
import graft.ops.{Cleaning, Scratch, TextOps, VectorOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Trend / drift / scoring pack (round 8): the monitoring layer a
  * production corpus pipeline runs BESIDE the ingest queries — two-sample
  * significance testing, user-value segmentation, autocorrelation and
  * CUSUM change detection over the event stream, corpus concentration,
  * a mergeable KMV distinct sketch with set-intersection estimation, and
  * multiprobe sign-LSH retrieval.
  *
  * Determinism discipline (QueryPack scaladoc): integer units everywhere
  * an aggregate feeds a comparison; the float outputs (t², cosine) are
  * computed from exact integer sums / sequential folds by expressions
  * written identically on the Spark and DuckDB sides, so both engines
  * round the same way. Day-grained outputs are ISO strings (DATE-typed
  * parquet columns hash-mismatch against the oracle's datetime64).
  */
object TrendQueries extends QueryPack {

  /** Daily event counts (day ISO string, x = count) — shared by the
    * autocorrelation and CUSUM queries; materialized once per
    * (session, dir) via [[Scratch]] so consumers re-scan an artifact
    * instead of re-aggregating the event stream.
    */
  private def dailyCounts(s: SparkSession, d: String): DataFrame =
    Scratch.materialize("trend_daily", s, d) {
      Tables.events(s, d)
        .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("x"))
    }

  /** (side, h) = distinct 60-bit hashes of 3-word shingles, corpus split
    * into two halves by doc parity — the input universe for the KMV
    * sketch comparison. Shingle+hash is one map-side pass; DISTINCT is
    * one hash aggregate. Materialized: the sketch query walks it from
    * four consumers (two sketches + two membership probes).
    */
  private def sideHashes(s: SparkSession, d: String): DataFrame =
    Scratch.materialize("trend_kmv_sides", s, d) {
      Tables.documents(s, d)
        .select((col("doc_id") % 2).as("side"),
          explode(TextOps.wordShingles(TextOps.tokens(col("text")), 3)).as("g"))
        .select(col("side"), TextOps.hash60(col("g")).as("h"))
        .distinct()
    }

  val queries: Map[String, Q] = Map(
    // Welch's unequal-variance two-sample t-test: does `value` differ
    // between purchases and clicks? ONE conditional-aggregation pass
    // (partial-agg friendly, no join) collects both groups' n/Σx/Σx² in
    // exact integer cents; t² and the Welch–Satterthwaite df come out of
    // those sums by a double formula written identically in the oracle,
    // then floor-scaled to milli so the comparison is on integers.
    "stats_welch_ttest" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("event_type"), Cleaning.cents(col("value")).as("c"))
        .agg(
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n1"),
          sum(when(col("event_type") === "purchase", col("c")).otherwise(0L)).as("s1"),
          sum(when(col("event_type") === "purchase",
            expr("CAST(c AS DECIMAL(38,0)) * c")).otherwise(lit(0).cast("decimal(38,0)"))).as("q1"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n2"),
          sum(when(col("event_type") === "click", col("c")).otherwise(0L)).as("s2"),
          sum(when(col("event_type") === "click",
            expr("CAST(c AS DECIMAL(38,0)) * c")).otherwise(lit(0).cast("decimal(38,0)"))).as("q2"))
        .selectExpr(
          "n1", "n2",
          "s1 div n1 AS mean1_cents",
          "s2 div n2 AS mean2_cents",
          // doubles from exact integers; identical expression in DuckDB
          """CAST(floor(1000.0 *
            |  (CAST(s1 AS DOUBLE)/n1 - CAST(s2 AS DOUBLE)/n2)
            |  * (CAST(s1 AS DOUBLE)/n1 - CAST(s2 AS DOUBLE)/n2)
            |  / ((n1*CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1)/(CAST(n1 AS DOUBLE)*n1*(n1-1))
            |   + (n2*CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)*s2)/(CAST(n2 AS DOUBLE)*n2*(n2-1)))
            |) AS BIGINT) AS t2_milli""".stripMargin.replaceAll("\n", " "),
          """CAST(floor(1000.0 *
            |  ((n1*CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1)/(CAST(n1 AS DOUBLE)*n1*(n1-1))
            |   + (n2*CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)*s2)/(CAST(n2 AS DOUBLE)*n2*(n2-1)))
            |  * ((n1*CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1)/(CAST(n1 AS DOUBLE)*n1*(n1-1))
            |   + (n2*CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)*s2)/(CAST(n2 AS DOUBLE)*n2*(n2-1)))
            |  / ( ((n1*CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1)/(CAST(n1 AS DOUBLE)*n1*(n1-1)))
            |      * ((n1*CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1)/(CAST(n1 AS DOUBLE)*n1*(n1-1))) / (n1-1)
            |    + ((n2*CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)*s2)/(CAST(n2 AS DOUBLE)*n2*(n2-1)))
            |      * ((n2*CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)*s2)/(CAST(n2 AS DOUBLE)*n2*(n2-1))) / (n2-1))
            |) AS BIGINT) AS df_milli""".stripMargin.replaceAll("\n", " "))
    }),

    // RFM (recency / frequency / monetary) segmentation: per user, days
    // since last event, event count, and lifetime value in cents, each
    // scored into quintiles, composed into the classic 3-digit RFM code.
    // One shuffle on user_id for the profile; the quintile windows run on
    // the (bounded-per-SF) user dimension under the non-foldable
    // single-partition key. At 100 TB the ntile windows become
    // approx-quantile cutpoints broadcast back — the profile aggregation,
    // which carries all the data volume, is unchanged.
    "events_rfm" -> ((s, d) => {
      val e = Tables.events(s, d)
      val per = e.groupBy("user_id").agg(
        max(col("ts")).as("last_ts"),
        count(lit(1)).as("f"),
        sum(Cleaning.cents(col("value"))).as("m_cents"))
      val mx = e.agg(max(to_date(col("ts"))).as("mxd"))
      val k = Cleaning.singlePartitionKey(col("user_id"))
      per.crossJoin(broadcast(mx))
        .withColumn("r_days", datediff(col("mxd"), to_date(col("last_ts"))).cast("long"))
        .withColumn("r_q", ntile(5).over(
          Window.partitionBy(k).orderBy(col("r_days").asc, col("user_id").asc)).cast("long"))
        .withColumn("f_q", ntile(5).over(
          Window.partitionBy(k).orderBy(col("f").desc, col("user_id").asc)).cast("long"))
        .withColumn("m_q", ntile(5).over(
          Window.partitionBy(k).orderBy(col("m_cents").desc, col("user_id").asc)).cast("long"))
        .select(col("user_id"), col("r_days"), col("f"), col("m_cents"),
          col("r_q"), col("f_q"), col("m_q"),
          (col("r_q") * 100 + col("f_q") * 10 + col("m_q")).as("rfm"))
        .orderBy("user_id")
    }),

    // Sample autocorrelation of the daily event-count series at lags
    // 1..7 — the weekly-seasonality screen. Centering is exact: with
    // z_t = N·x_t − S (integers), r_k = Σ z_t·z_{t−k} / Σ z_t², so no
    // float mean enters the sums; only the final ratio is a double,
    // floor-scaled to ppm. The lag alignment is an equi-join on the day
    // index against a 7-row broadcast of lags — never a global
    // self-cross — and the t-index window runs over the DAY dimension
    // (bounded: one row per day regardless of event volume).
    "time_acf" -> ((s, d) => {
      val daily = dailyCounts(s, d)
      val tot = daily.agg(count(lit(1)).as("nn"), sum("x").as("sx"))
      val w = Window.partitionBy(Cleaning.singlePartitionKey(col("day"))).orderBy("day")
      val idx = daily.crossJoin(broadcast(tot))
        .withColumn("t", row_number().over(w).cast("long"))
        .withColumn("z", col("nn") * col("x") - col("sx"))
        .select("t", "z")
      // z ~ N·x can make z² overflow Long at scale — DECIMAL(38,0) like
      // the welch/tiesum sums (oracle mirrors with HUGEINT)
      val den = idx.agg(sum(col("z").cast("decimal(38,0)") * col("z")).as("den"))
      val ks = s.range(1, 8).select(col("id").as("k"))
      broadcast(ks)
        .crossJoin(idx.select(col("t").as("tb"), col("z").as("zb")))
        .withColumn("ta", col("tb") + col("k"))
        .join(idx.select(col("t").as("ta"), col("z").as("za")), "ta")
        .groupBy("k")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("za").cast("decimal(38,0)") * col("zb")).as("num"))
        .crossJoin(broadcast(den))
        .selectExpr("k", "n_pairs",
          "CAST(floor(1000000.0 * CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) AS BIGINT) AS acf_ppm")
        .orderBy("k")
    }),

    // STL-style additive decomposition of the daily series, integer-exact:
    // trend = centered 7-day moving average (milli, only where the full
    // window exists — edge days are EXCLUDED rather than emitted null so
    // both engines' dtypes and values stay exact), seasonal = per-ISO-dow
    // FLOOR-mean of the detrended series (the explicit CASE keeps Spark's
    // truncating div on floor semantics for negatives), residual = the
    // rest. x ≡ trend + seasonal + residual (milli) by construction —
    // the anomaly screen that survives weekly cycles, beside
    // time_rolling_zscore's cycle-blind one. Windows run over the DAY
    // dimension (one row per day at any event volume).
    "time_stl_decompose" -> ((s, d) => {
      val w7 = Window.partitionBy(Cleaning.singlePartitionKey(col("day")))
        .orderBy("day").rowsBetween(-3, 3)
      val interior = dailyCounts(s, d)
        .withColumn("wn", count(lit(1)).over(w7))
        .withColumn("tsum", sum(col("x") * 1000).over(w7))
        .filter(col("wn") === 7)
        .withColumn("trend_milli", expr("tsum div 7"))
        .withColumn("det_milli", col("x") * 1000 - col("trend_milli"))
        .withColumn("dow", expr("weekday(to_date(day)) + 1"))
      val seas = interior.groupBy("dow")
        .agg(sum("det_milli").as("sm"), count(lit(1)).as("n"))
        .select(col("dow"),
          expr("CASE WHEN sm % n = 0 OR sm >= 0 THEN sm div n ELSE sm div n - 1 END")
            .as("seas_milli"))
      interior.join(broadcast(seas), "dow")
        .select(col("day"), col("x"), col("trend_milli"), col("seas_milli"),
          (col("x") * 1000 - col("trend_milli") - col("seas_milli")).as("resid_milli"))
        .orderBy("day")
    }),

    // Periodogram of the daily series (DFT power at periods N/k, k=1..10)
    // — the spectral "is there a weekly cycle" check beside time_acf's
    // lag view. Each (k, t) term z·cos / z·sin is rounded to MILLI-scaled
    // integers BEFORE summing, so the Fourier sums are exact integer
    // aggregations (order-independent, engine-portable — trig agreement
    // at 1 ulp is 8 orders below the rounding grain); only the final
    // |X_k|² combines them, in a double expression mirrored in the
    // oracle. Day-dimension work throughout; the k-grid is a 10-row
    // broadcast.
    "time_periodogram" -> ((s, d) => {
      val daily = dailyCounts(s, d)
      val tot = daily.agg(count(lit(1)).as("nn"), sum("x").as("sx"))
      val w = Window.partitionBy(Cleaning.singlePartitionKey(col("day"))).orderBy("day")
      val idx = daily.crossJoin(broadcast(tot))
        .withColumn("t", row_number().over(w).cast("long"))
        .withColumn("z", col("nn") * col("x") - col("sx"))
        .select("t", "z", "nn")
      val ks = s.range(1, 11).select(col("id").as("k"))
      broadcast(ks).crossJoin(idx)
        .selectExpr("k",
          "CAST(round(z * cos(2 * pi() * k * t / nn) * 1000) AS BIGINT) AS c_term",
          "CAST(round(z * sin(2 * pi() * k * t / nn) * 1000) AS BIGINT) AS s_term")
        .groupBy("k")
        .agg(sum("c_term").as("ck"), sum("s_term").as("sk"))
        .selectExpr("k",
          "CAST(floor((CAST(ck AS DOUBLE)*ck + CAST(sk AS DOUBLE)*sk) / 1e6) AS BIGINT) AS power_z2")
        .orderBy("k")
    }),

    // Wald–Wolfowitz runs test on the daily series: are above-mean and
    // below-mean days RANDOMLY interleaved, or do they clump (trend/
    // regime) or alternate (oscillation)? Signs come from the exact
    // integer centering N·x − S (ties-to-negative deterministically);
    // runs, n₊, n₋ are integer window counts over the day dimension; the
    // one double is the final z against E[R] = 1 + 2n₊n₋/n.
    "stats_runs_test" -> ((s, d) => {
      val daily = dailyCounts(s, d)
      val tot = daily.agg(count(lit(1)).as("nn"), sum("x").as("sx"))
      val w = Window.partitionBy(Cleaning.singlePartitionKey(col("day"))).orderBy("day")
      val signed = daily.crossJoin(broadcast(tot))
        .withColumn("pos", (col("nn") * col("x") - col("sx")) > 0)
        .withColumn("chg",
          when(lag("pos", 1).over(w).isNull || lag("pos", 1).over(w) =!= col("pos"), 1L)
            .otherwise(0L))
      signed.agg(
        sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("n_neg"),
        sum("chg").as("runs"))
        .selectExpr("n_pos", "n_neg", "runs",
          """CAST(floor(1000.0 *
            |  (runs - (1.0 + 2.0 * n_pos * n_neg / (n_pos + n_neg)))
            |  / sqrt(2.0 * n_pos * n_neg * (2.0 * n_pos * n_neg - n_pos - n_neg)
            |     / ((CAST(n_pos + n_neg AS DOUBLE)) * (n_pos + n_neg)
            |        * (n_pos + n_neg - 1.0)))) AS BIGINT) AS z_milli"""
            .stripMargin.replaceAll("\n", " "))
    }),

    // CUSUM change-point screen over daily event volume: cumulative sum
    // of the exactly-centered deviations N·x_t − S (integers — no float
    // mean), peak day flagged where |CUSUM| is maximal. The running sum
    // is a window over the day dimension (one row per day); the "did the
    // rate shift, and when" primitive behind ingest-volume alerting.
    "events_cusum" -> ((s, d) => {
      val daily = dailyCounts(s, d)
      val tot = daily.agg(count(lit(1)).as("nn"), sum("x").as("sx"))
      val w = Window.partitionBy(Cleaning.singlePartitionKey(col("day")))
        .orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cs = daily.crossJoin(broadcast(tot))
        .withColumn("cusum", sum(col("nn") * col("x") - col("sx")).over(w))
        .select("day", "x", "cusum")
      val peak = cs.agg(max(abs(col("cusum"))).as("peak"))
      cs.crossJoin(broadcast(peak))
        .select(col("day"), col("x"), col("cusum"),
          (abs(col("cusum")) === col("peak")).as("is_peak"))
        .orderBy("day")
    }),

    // Gini coefficient of the document-length distribution — the
    // corpus-concentration audit ("is the token mass in a few giant
    // docs?"). Computed from the GROUPED length histogram, not a global
    // row sort: per distinct length, the tied ranks contribute
    // len · (cum_before·cnt + cnt(cnt+1)/2) to Σ i·x_i, so the only
    // window runs over distinct lengths (bounded far below row count)
    // and every term stays integer until the final ppm ratio.
    "stats_gini" -> ((s, d) => {
      val byLen = Tables.documents(s, d)
        .groupBy(col("n_chars").as("len"))
        .agg(count(lit(1)).as("cnt"), sum("n_chars").as("mass"))
      val w = Window.partitionBy(Cleaning.singlePartitionKey(col("len"))).orderBy("len")
      byLen.withColumn("cum", sum("cnt").over(w))
        // len·cum·cnt overflows Long at scale — DECIMAL(38,0) headroom,
        // mirrored by the oracle's HUGEINT
        .withColumn("ixi",
          col("len").cast("decimal(38,0)") * ((col("cum") - col("cnt")) * col("cnt")
            + expr("(cnt * (cnt + 1)) div 2")))
        .agg(sum("cnt").as("n"), sum("mass").as("total_chars"), sum("ixi").as("sixi"))
        .selectExpr("n", "total_chars",
          """CAST(floor(1000000.0 *
            | (2.0 * sixi - (n + 1.0) * total_chars)
            | / (CAST(n AS DOUBLE) * total_chars)) AS BIGINT) AS gini_ppm"""
            .stripMargin.replaceAll("\n", " "))
    }),

    // KMV (k-minimum-values) distinct sketch + set-intersection estimate
    // between the two corpus halves (doc parity) over 3-gram shingles:
    // per side keep the k=64 smallest 60-bit hashes (TakeOrderedAndProject
    // — fully distributed partial top-k, no per-side rank window), union
    // the sketches into a k-sized union sketch, count its members present
    // in BOTH sides (semi-joins on 64-row inputs). D̂ = (k−1)·2⁶⁰/h_k,
    // Ĵ = m/k, D̂∩ = Ĵ·D̂∪ — the mergeable-sketch answer to "how much do
    // these two corpora overlap" without ever computing exact distincts.
    // Fourth sketch family beside HLL, count-min, and Misra–Gries.
    "agg_kmv_intersect" -> ((s, d) => {
      val sh = sideHashes(s, d)
      def sketch(side: Int): DataFrame =
        sh.filter(col("side") === side).select("h").orderBy("h").limit(64)
      val a = sketch(0)
      val b = sketch(1)
      val u = a.union(b).distinct().orderBy("h").limit(64)
      val estA = a.agg(max("h").as("hka"))
      val estB = b.agg(max("h").as("hkb"))
      val estU = u.agg(max("h").as("hku"))
      val m = u.join(a, Seq("h"), "left_semi").join(b, Seq("h"), "left_semi")
        .agg(count(lit(1)).as("m"))
      m.crossJoin(estA).crossJoin(estB).crossJoin(estU)
        .selectExpr(
          "CAST(64 AS BIGINT) AS k",
          "CAST(floor(63 * 1152921504606846976.0 / hka) AS BIGINT) AS est_a",
          "CAST(floor(63 * 1152921504606846976.0 / hkb) AS BIGINT) AS est_b",
          "CAST(floor(63 * 1152921504606846976.0 / hku) AS BIGINT) AS est_union",
          "m",
          "(1000000 * m) div 64 AS jaccard_ppm",
          "(m * CAST(floor(63 * 1152921504606846976.0 / hku) AS BIGINT)) div 64 AS est_intersect")
    }),

    // Top-10 3-step user-journey paths (the trigram extension of the
    // bigram events_transitions): two leads over the per-user ordered
    // stream, one hash aggregate on the path, TakeOrderedAndProject for
    // the top-k. Path mining at its simplest — and the shape stays one
    // shuffle on user_id plus a types³-bounded aggregate at any volume.
    "events_path_trigrams" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("s2", lead("event_type", 1).over(w))
        .withColumn("s3", lead("event_type", 2).over(w))
        .filter(col("s2").isNotNull && col("s3").isNotNull)
        .groupBy(col("event_type").as("s1"), col("s2"), col("s3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
        .limit(10)
    }),

    // Jensen–Shannon divergence between the two corpus halves' token
    // distributions — the symmetric, bounded [0, ln 2] drift measure for
    // text (PSI's sibling for vocabularies). Joins are vocabulary-sized;
    // each token's contribution ½p·ln(p/m) + ½q·ln(q/m) is micro-rounded
    // BEFORE summing (order-independent; zero-side terms vanish by the
    // 0·ln0 = 0 limit, expressed as CASE in both engines).
    "text_js_divergence" -> ((s, d) => {
      val counts = Tables.documents(s, d)
        .select((col("doc_id") % 2).as("side"),
          explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy("side", "tok").agg(count(lit(1)).as("c"))
      val a = counts.filter(col("side") === 0).select(col("tok"), col("c").as("ca"))
      val b = counts.filter(col("side") === 1).select(col("tok"), col("c").as("cb"))
      val tot = counts.agg(
        sum(when(col("side") === 0, col("c")).otherwise(0L)).as("na"),
        sum(when(col("side") === 1, col("c")).otherwise(0L)).as("nb"))
      a.join(b, Seq("tok"), "full_outer")
        .na.fill(0L, Seq("ca", "cb"))
        .crossJoin(broadcast(tot))
        .selectExpr("tok", "ca", "cb", "na", "nb",
          """CAST(round((
            |  CASE WHEN ca > 0 THEN 0.5 * (CAST(ca AS DOUBLE)/na)
            |    * ln((CAST(ca AS DOUBLE)/na)
            |         / (0.5*(CAST(ca AS DOUBLE)/na) + 0.5*(CAST(cb AS DOUBLE)/nb))) ELSE 0.0 END
            |+ CASE WHEN cb > 0 THEN 0.5 * (CAST(cb AS DOUBLE)/nb)
            |    * ln((CAST(cb AS DOUBLE)/nb)
            |         / (0.5*(CAST(ca AS DOUBLE)/na) + 0.5*(CAST(cb AS DOUBLE)/nb))) ELSE 0.0 END
            |) * 1e6) AS BIGINT) AS contrib_micro""".stripMargin.replaceAll("\n", " "))
        .agg(count(lit(1)).cast("long").as("vocab"),
          max("na").as("n_tokens_a"), max("nb").as("n_tokens_b"),
          sum("contrib_micro").as("jsd_micronats"))
    }),

    // Trailing-7-day rolling z-score per day — the windowed sibling of
    // anomaly_3sigma: each day scored against ITS OWN recent history, so
    // a level shift stops polluting the baseline after a week. Mean and
    // sample variance come from integer window sums (n, Σx, Σx²); the
    // one double is the final z, identical formula in the oracle; zero
    // variance guards to z = 0.
    "time_rolling_zscore" -> ((s, d) => {
      val daily = dailyCounts(s, d)
      val w = Window.partitionBy(Cleaning.singlePartitionKey(col("day")))
        .orderBy("day").rowsBetween(-6, Window.currentRow)
      daily
        .withColumn("n_win", count(lit(1)).over(w).cast("long"))
        .withColumn("s_win", sum("x").over(w))
        .withColumn("q_win", sum(col("x") * col("x")).over(w))
        .selectExpr("day", "x", "n_win",
          """CAST(CASE WHEN n_win > 1
            |   AND n_win * q_win - s_win * s_win > 0
            |  THEN floor(1000.0 * (x - CAST(s_win AS DOUBLE)/n_win)
            |    / sqrt((n_win*CAST(q_win AS DOUBLE) - CAST(s_win AS DOUBLE)*s_win)
            |           / (CAST(n_win AS DOUBLE)*(n_win - 1))))
            |  ELSE 0 END AS BIGINT) AS z_milli""".stripMargin.replaceAll("\n", " "))
        .withColumn("is_anomaly", abs(col("z_milli")) >= 3000L)
        .orderBy("day")
    }),

    // Entropy rate of the user-journey chain: per source state, the
    // Shannon entropy of its transition distribution (micro-nats,
    // per-term rounded — the text_entropy discipline), weighted into the
    // single behavioral-predictability number Σ π̂_i H_i with the
    // empirical state frequencies as weights. Low rate = deterministic
    // journeys; ln(|types|) = fully random. Transition table is
    // types²-bounded.
    "events_entropy_rate" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("nxt", lead("event_type", 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("cur"), col("nxt"))
        .agg(count(lit(1)).as("c"))
      val rows = trans.groupBy("cur").agg(sum("c").as("r"))
      val tot = rows.agg(sum("r").as("n_total"))
      val perState = trans.join(rows, "cur")
        .withColumn("h_term_micro",
          expr("CAST(round((CAST(c AS DOUBLE) / r) * ln(CAST(r AS DOUBLE) / c) * 1e6) AS BIGINT)"))
        .groupBy("cur").agg(max("r").as("r"), sum("h_term_micro").as("h_micro"))
      perState.crossJoin(broadcast(tot))
        .select(col("cur"), col("r").as("n_transitions"), col("h_micro"),
          expr("(r * h_micro) div n_total").as("weighted_micro"))
        .orderBy("cur")
    }),

    // Heaps' law vocabulary-growth profile: distinct vocabulary after the
    // first k documents, at doubling checkpoints — the corpus-diversity
    // curve (sub-linear growth = healthy natural text; linear = id-like
    // junk tokens). Each token contributes at its FIRST document (one
    // min-aggregate over the token stream); checkpoint counts are a
    // broadcast join against the log₂-bounded checkpoint list.
    "text_heaps_law" -> ((s, d) => {
      val firstSeen = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(min("doc_id").as("first_doc"))
      val nDocs = Tables.documents(s, d).agg(max("doc_id").as("max_id"))
      val cps = s.range(0, 20).select(expr("shiftleft(1L, CAST(id AS INT))").as("k"))
        .crossJoin(broadcast(nDocs)).filter(col("k") <= col("max_id") * 2).select("k")
      firstSeen.crossJoin(broadcast(cps))
        .filter(col("first_doc") < col("k"))
        .groupBy("k").agg(count(lit(1)).as("vocab"))
        .orderBy("k")
    }),

    // Stationary distribution of the user-journey Markov chain (power
    // iteration, 8 unrolled rounds): where does a user's session
    // ultimately settle? The transition matrix is state-dimension-sized
    // (event types²), so each iteration is a broadcast join + 5-row
    // aggregate regardless of event volume; all mass stays integer ppm
    // (per-edge flows are (π·c) div r — deterministic truncation, same
    // in the oracle's unrolled CTE chain).
    "events_markov_stationary" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("nxt", lead("event_type", 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("cur"), col("nxt"))
        .agg(count(lit(1)).as("c"))
      val t = trans.join(trans.groupBy("cur").agg(sum("c").as("r")), "cur")
        .select("cur", "nxt", "c", "r").collect()
      // The matrix is STATE-dimension-sized (event types², ≤ a few dozen
      // entries at ANY data scale) — the one distributed pass above
      // aggregates the volume; iterating a config-sized matrix in the
      // driver is the same bounded-collect contract agg_count_min uses.
      // A DAG-loop variant (8 chained joins) spent 2.3 s at sf0.1 purely
      // on stage launches for 5-row shuffles.
      require(t.length <= 64, s"state space unexpectedly large: ${t.length}")
      val states = t.map(_.getString(0)).distinct.sorted
      var pi: Map[String, Long] = states.map(_ -> 1000000L / states.length).toMap
      for (_ <- 1 to 8)
        pi = t.groupBy(_.getString(1)).flatMap { case (nxt, edges) =>
          // inner-join semantics, same as the oracle's p JOIN t: an edge
          // whose cur state carries no mass this round contributes nothing
          val m = edges.flatMap(e =>
            pi.get(e.getString(0)).map(_ * e.getLong(2) / e.getLong(3)))
          if (m.isEmpty) None else Some(nxt -> m.sum)
        }
      import s.implicits._
      pi.toSeq.sortBy(_._1).toDF("state", "pi_ppm").orderBy("state")
    }),

    // RAKE keyword extraction (Rose et al., 2010): phrases are maximal
    // stopword-free token runs (gaps-and-islands over token positions,
    // window partitioned per doc), a word's degree is the total length of
    // phrases containing it, score = degree/freq — words that live in
    // long multi-word phrases outrank bare frequent words. Top-20 by
    // integer milli-score; every shuffle is a hash aggregate on doc or
    // token keys.
    "text_keyword_rake" -> ((s, d) => {
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val phr = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "tok")))
        .withColumn("is_stop", col("tok").isin("the", "a", "of"))
        .withColumn("phrase_id", sum(when(col("is_stop"), 1L).otherwise(0L)).over(w))
        .filter(!col("is_stop"))
      val phrLen = phr.groupBy("doc_id", "phrase_id").agg(count(lit(1)).as("plen"))
      phr.join(phrLen, Seq("doc_id", "phrase_id"))
        .groupBy("tok")
        .agg(count(lit(1)).as("freq"), sum("plen").as("degree"))
        .withColumn("score_milli", expr("(1000 * degree) div freq"))
        .orderBy(col("score_milli").desc, col("tok").asc).limit(20)
    }),

    // Binary change-point segmentation on daily volume: the split day
    // maximizing |CUSUM| (ties to the earliest day), with integer milli
    // mean levels either side and the implied shift — the "WHEN did the
    // rate change, and by how much" step after events_cusum's "did it".
    // Day-dimension windows only; the split is a 1-row broadcast.
    "time_changepoint" -> ((s, d) => {
      val daily = dailyCounts(s, d)
      val tot = daily.agg(count(lit(1)).as("nn"), sum("x").as("sx"))
      val wday = Window.partitionBy(Cleaning.singlePartitionKey(col("day")))
        .orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cs = daily.crossJoin(broadcast(tot))
        .withColumn("cusum", sum(col("nn") * col("x") - col("sx")).over(wday))
      val split = cs.orderBy(abs(col("cusum")).desc, col("day").asc).limit(1)
        .select(col("day").as("split_day"))
      cs.crossJoin(broadcast(split))
        .agg(
          max("split_day").as("split_day"),
          sum(when(col("day") <= col("split_day"), 1L).otherwise(0L)).as("n_before"),
          sum(when(col("day") <= col("split_day"), col("x")).otherwise(0L)).as("x_before"),
          sum(when(col("day") > col("split_day"), 1L).otherwise(0L)).as("n_after"),
          sum(when(col("day") > col("split_day"), col("x")).otherwise(0L)).as("x_after"))
        .selectExpr("split_day", "n_before", "n_after",
          "(1000 * x_before) div n_before AS mean_before_milli",
          "(1000 * x_after) div n_after AS mean_after_milli",
          "(1000 * x_after) div n_after - (1000 * x_before) div n_before AS shift_milli")
    }),

    // POINT-IN-TIME join against the SCD2 dimension (the lake-query
    // answer to "what was this customer's segment WHEN the event
    // happened"): equi-join on the key with the validity range as a
    // residual predicate — each event matches exactly one version
    // because versions partition time. This is the feature-store
    // correctness primitive (no leakage from future dimension states),
    // and the plan is the scale shape: one shuffle on the key, range
    // check riding the join.
    "join_scd2_pointintime" -> ((s, d) => {
      val dim = StatsQueries.queries("scd2_update")(s, d)
      val ev = Tables.events(s, d).select(col("event_id"),
        (col("user_id") + 1).as("c_custkey"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("ev_date"))
      ev.join(dim, Seq("c_custkey"))
        .filter(col("ev_date") >= col("valid_from") && col("ev_date") < col("valid_to"))
        .select(col("event_id"), col("c_custkey"), col("c_mktsegment"),
          col("bal_cents"), col("is_current"))
        .orderBy("event_id")
    }),

    // Velocity rule — the fraud/abuse screen "too many events from one
    // account in a trailing day": a RANGE frame over event-time micros
    // partitioned per user (never global), alert at ≥ 5. The time-based
    // frame is what makes it a velocity check rather than a row count —
    // bursts score high regardless of how the rows interleave.
    "events_fraud_velocity" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("us")
        .rangeBetween(-86400000000L, 0)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("n_24h", count(lit(1)).over(w).cast("long"))
        .withColumn("is_velocity_alert", col("n_24h") >= 5L)
        .orderBy("user_id", "us", "event_id")
    }),

    // Laplace mechanism with a SEEDED noise source (per-key hash60 →
    // uniform → inverse-CDF Laplace, b = sensitivity/ε = 1): the
    // differential-privacy release shape with reproducible draws, so the
    // oracle can verify the mechanism arithmetic exactly. A production
    // release would draw fresh randomness (and would NOT publish true_n
    // beside it — both appear here because the gate needs ground truth);
    // what this pins is the exact noise math and the ε accounting column.
    "privacy_dp_laplace" -> ((s, d) => {
      Tables.customer(s, d)
        .groupBy("c_nationkey").agg(count(lit(1)).as("true_n"))
        .withColumn("u",
          TextOps.hash60(col("c_nationkey").cast("string")) / lit(1152921504606846976.0) - 0.5)
        .selectExpr("c_nationkey", "true_n",
          // greatest() floors the log argument: a hash of exactly 0 (p ≈
          // 2⁻⁶⁰) would otherwise take ln(0) → ±inf → ANSI cast error
          """CAST(true_n + round(CASE WHEN u >= 0 THEN -ln(greatest(1e-18, 1.0 - 2.0*u))
            | ELSE ln(greatest(1e-18, 1.0 + 2.0*u)) END) AS BIGINT) AS noised_n"""
            .stripMargin.replaceAll("\n", " "),
          "CAST(1000 AS BIGINT) AS epsilon_milli")
        .orderBy("c_nationkey")
    }),

    // DP COMPOSITION LEDGER — the epsilon accounting that sits above any
    // set of DP releases: three seeded-Laplace releases over the customer
    // table (per-nation counts at ε=1.0, per-segment counts at ε=0.5, a
    // global count at ε=0.25; scale = 1/ε, same deterministic draw recipe
    // as privacy_dp_laplace so the mechanism stays oracle-exact), each
    // ledgered with its query count and release-level ε. Within a release
    // the partitions are DISJOINT (each customer is in exactly one nation
    // / one segment), so PARALLEL composition applies: release ε = the
    // per-query ε, NOT the sum. Across releases the same individuals are
    // re-queried, so BASIC (sequential) composition adds the release
    // epsilons into the 1750-milli total budget row. released_checksum
    // ties every ledger row to the actual noised outputs it accounts for.
    "privacy_dp_ledger" -> ((s, d) => {
      def noised(g: DataFrame, key: Column, epsMilli: Long): DataFrame =
        g.withColumn("u",
            TextOps.hash60(key) / lit(1152921504606846976.0) - 0.5)
          .withColumn("noised_n", expr(
            s"""CAST(true_n + round((1000.0 / $epsMilli) *
               | (CASE WHEN u >= 0 THEN -ln(greatest(1e-18, 1.0 - 2.0*u))
               |  ELSE ln(greatest(1e-18, 1.0 + 2.0*u)) END)) AS BIGINT)"""
              .stripMargin.replaceAll("\n", " ")))
      val c = Tables.customer(s, d)
      val r1 = noised(c.groupBy(col("c_nationkey").as("k")).agg(count(lit(1)).as("true_n")),
        concat(lit("r1:"), col("k").cast("string")), 1000L)
      val r2 = noised(c.groupBy(col("c_mktsegment").as("k")).agg(count(lit(1)).as("true_n")),
        concat(lit("r2:"), col("k")), 500L)
      val r3 = noised(c.agg(count(lit(1)).as("true_n")), lit("r3:all"), 250L)
      def row(df: DataFrame, name: String, epsMilli: Long, comp: String) =
        df.agg(count(lit(1)).as("n_queries"), sum("noised_n").as("released_checksum"))
          .select(lit(name).as("release"), lit(comp).as("composition"),
            col("n_queries"), lit(epsMilli).as("eps_query_milli"),
            lit(epsMilli).as("eps_release_milli"), col("released_checksum"))
      val releases = row(r1, "r1_nation_counts", 1000L, "parallel")
        .unionByName(row(r2, "r2_segment_counts", 500L, "parallel"))
        .unionByName(row(r3, "r3_global_count", 250L, "single"))
      val total = releases
        .agg(sum("n_queries").as("n_queries"),
          sum("eps_release_milli").as("eps_release_milli"),
          sum("released_checksum").as("released_checksum"))
        .select(lit("total").as("release"), lit("sequential").as("composition"),
          col("n_queries"), lit(0L).as("eps_query_milli"),
          col("eps_release_milli"), col("released_checksum"))
      releases.unionByName(total).orderBy("release")
    }),

    // t-closeness release audit — the third rung of the privacy ladder
    // beside privacy_k_anon and privacy_l_diversity: a QI group passes
    // only if its SENSITIVE-VALUE DISTRIBUTION stays close to the global
    // one (Li et al., ICDE'07), with distance = Earth Mover's Distance
    // over the ordered balance buckets. For ordered 1-D histograms EMD is
    // the mean |cumulative difference|, which stays INTEGER after
    // cross-multiplying the two denominators: |N·cumg − n_g·cumG| summed,
    // then one floor-scaled ppm division. The group×bucket grid comes
    // from a broadcast cross of two dimension-sized distincts; the cum
    // windows partition per QI group.
    "privacy_t_closeness" -> ((s, d) => {
      val base = Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_mktsegment"),
          expr("(CAST(round(c_acctbal * 100) AS BIGINT) + 100000) div 200000").as("bk"))
      val perCell = base.groupBy("c_nationkey", "c_mktsegment", "bk")
        .agg(count(lit(1)).as("nb"))
      val groups = perCell.groupBy("c_nationkey", "c_mktsegment")
        .agg(sum("nb").as("n_g"))
      val global = base.groupBy("bk").agg(count(lit(1)).as("gb"))
      val buckets = global.select("bk")
      val nTot = base.agg(count(lit(1)).as("n_tot"), countDistinct("bk").as("n_bk"))
      val wcum = Window.partitionBy("c_nationkey", "c_mktsegment").orderBy("bk")
      groups.crossJoin(broadcast(buckets))
        .join(perCell, Seq("c_nationkey", "c_mktsegment", "bk"), "left")
        .na.fill(0L, Seq("nb"))
        .join(broadcast(global), "bk")
        .crossJoin(broadcast(nTot))
        .withColumn("cum_g", sum("nb").over(wcum))
        .withColumn("cum_x", sum("gb").over(wcum))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(max("n_g").as("n_rows"), max("n_tot").as("n_tot"),
          max("n_bk").as("n_bk"),
          sum(abs(expr("CAST(n_tot AS DECIMAL(38,0)) * cum_g - CAST(n_g AS DECIMAL(38,0)) * cum_x")))
            .as("emd_num"))
        .selectExpr("c_nationkey", "c_mktsegment", "n_rows",
          """CAST((1000000 * CAST(emd_num AS DECIMAL(38,0)))
            | div (CAST(n_rows AS DECIMAL(38,0)) * n_tot * (n_bk - 1)) AS BIGINT)
            | AS emd_ppm""".stripMargin.replaceAll("\n", " "))
        .withColumn("release_ok", col("emd_ppm") <= 250000L)
        .orderBy("c_nationkey", "c_mktsegment")
    }),

    // Benford first-digit audit on transaction values — the classic
    // fabricated-data screen. Observed digit shares (exact ppm) against
    // Benford's log10(1+1/d) expectation; per-digit chi-square
    // contribution rounded to micro BEFORE any summing (text_entropy
    // discipline). First digit via string head — no float log anywhere
    // near the bucketing.
    "stats_benford" -> ((s, d) => {
      val e = Tables.events(s, d)
        // abs before the string head: a negative value would put '-' in
        // position 1 and throw under ANSI cast (Benford is sign-blind anyway)
        .select(substring(abs(Cleaning.cents(col("value"))).cast("string"), 1, 1)
          .cast("long").as("digit"))
        .filter(col("digit") >= 1)
      val per = e.groupBy("digit").agg(count(lit(1)).as("n"))
      val tot = per.agg(sum("n").as("total_n"))
      per.crossJoin(broadcast(tot))
        .selectExpr("digit", "n",
          "(1000000 * n) div total_n AS obs_ppm",
          "CAST(round(log10(1.0 + 1.0 / digit) * 1e6) AS BIGINT) AS exp_ppm",
          """CAST(round(
            |  (CAST(n AS DOUBLE) / total_n - log10(1.0 + 1.0 / digit))
            |  * (CAST(n AS DOUBLE) / total_n - log10(1.0 + 1.0 / digit))
            |  / log10(1.0 + 1.0 / digit) * total_n * 1e6) AS BIGINT) AS chi2_micro"""
            .stripMargin.replaceAll("\n", " "))
        .orderBy("digit")
    }),

    // The KMV sketch as a NATIVE mergeable aggregate (fourth sketch
    // family beside count-min / HLL / Misra–Gries): one hash aggregate,
    // O(k) longs per partial buffer up the merge tree, no top-k operator
    // in the plan at all. KMV is the one sketch whose output is fully
    // DETERMINISTIC (the k smallest of a set are merge-order-independent),
    // so the gate hash-compares the sketch contents themselves — exploded
    // to (side, pos, h) rows — against the oracle's ranked k-smallest.
    "agg_kmv_native" -> ((s, d) => {
      import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
      val sk = toColumn(graft.functions.KmvSketch(
        toExpression(col("h")), 64).toAggregateExpression())
      sideHashes(s, d)
        .groupBy("side")
        .agg(sk.as("sk"))
        .select(col("side"), posexplode(col("sk")).as(Seq("pos", "h")))
        .select(col("side"), (col("pos") + 1).cast("long").as("pos"), col("h"))
        .orderBy("side", "pos")
    }),

    // Mann–Whitney rank-sum test (the nonparametric sibling of the Welch
    // query): do purchase and click values come from the same
    // distribution? Ranks come from the GROUPED value histogram —
    // midranks of a tie block are closed-form from the running count, so
    // the only window runs over distinct cent values, never rows, and
    // everything through U stays integer (×2 scaling absorbs the .5
    // midranks). Tie-corrected normal approximation z is the one double,
    // formula identical in the oracle.
    "stats_mann_whitney" -> ((s, d) => {
      val byVal = Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("event_type"), Cleaning.cents(col("value")).as("c"))
        .groupBy("c")
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n1v"),
          count(lit(1)).as("nv"))
      val w = Window.partitionBy(Cleaning.singlePartitionKey(col("c"))).orderBy("c")
      byVal
        .withColumn("cum", sum("nv").over(w))
        // 2×midrank of the tie block ending at cum: 2·cum_before + nv + 1
        .withColumn("ranks2", lit(2) * (col("cum") - col("nv")) + col("nv") + 1)
        .agg(
          sum("n1v").as("n1"),
          sum("nv").as("n"),
          sum(col("n1v") * col("ranks2")).as("r1x2"),
          sum(expr("CAST(nv AS DECIMAL(38,0)) * nv * nv - nv")).as("tiesum"))
        .selectExpr(
          "n1",
          "n - n1 AS n2",
          "r1x2 - n1 * (n1 + 1) AS u1_x2",
          "2 * n1 * (n - n1) - (r1x2 - n1 * (n1 + 1)) AS u2_x2",
          """CAST(floor(1000.0 *
            |  ((r1x2 - n1 * (n1 + 1)) / 2.0 - CAST(n1 AS DOUBLE) * (n - n1) / 2.0)
            |  / sqrt(CAST(n1 AS DOUBLE) * (n - n1) / 12.0
            |      * ((n + 1.0) - CAST(tiesum AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1.0))))
            |) AS BIGINT) AS z_milli""".stripMargin.replaceAll("\n", " "))
    }),

    // Population-stability-index drift screen between the first and
    // second half of the event window, over log2-spaced value bins (fixed
    // boundaries — no quantile pass, so the binning is one map-side
    // expression at any scale). Laplace-smoothed shares keep ln finite on
    // empty bins; each bin's contribution is rounded to integer micro
    // BEFORE summing (order-independent, engine-portable — the
    // text_entropy discipline). The full-outer bin join is over ≤ ~20
    // bins — broadcast-trivial.
    "profile_drift_psi" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(Cleaning.cents(col("value")).as("c"),
          (to_date(col("ts")) < lit("2024-01-16").cast("date")).as("is_ref"))
        .withColumn("bin", (length(bin(col("c"))) - 1).cast("long"))
      val binned = e.groupBy("bin").agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("ref_n"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("cur_n"))
      val tot = binned.agg(sum("ref_n").as("ref_tot"), sum("cur_n").as("cur_tot"),
        count(lit(1)).as("n_bins"))
      binned.crossJoin(broadcast(tot))
        .selectExpr("bin", "ref_n", "cur_n",
          """CAST(round((
            |   (ref_n + 1.0) / (ref_tot + n_bins) - (cur_n + 1.0) / (cur_tot + n_bins)
            | ) * ln(((ref_n + 1.0) / (ref_tot + n_bins)) / ((cur_n + 1.0) / (cur_tot + n_bins)))
            | * 1e6) AS BIGINT) AS contrib_micro""".stripMargin.replaceAll("\n", " "))
        .orderBy("bin")
    }),

    // Day-of-week seasonality profile: event volume and value share per
    // weekday with a uniform-baseline index (1e6 = exactly 1/7 of
    // traffic). One hash aggregate over the stream; the totals arrive as
    // a broadcast 1-row aggregate. Spark's dayofweek is 1=Sunday..7 —
    // the oracle shifts DuckDB's 0-based convention to match.
    "time_seasonal_profile" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(dayofweek(col("ts")).cast("long").as("dow"),
          Cleaning.cents(col("value")).as("c"))
      val per = e.groupBy("dow").agg(count(lit(1)).as("n"), sum("c").as("value_cents"))
      val tot = per.agg(sum("n").as("total_n"))
      per.crossJoin(broadcast(tot))
        .selectExpr("dow", "n", "value_cents",
          "(1000000 * n) div total_n AS share_ppm",
          "(7000000 * n) div total_n AS index_ppm")
        .orderBy("dow")
    }),

    // Neyman optimal allocation: how a 1000-doc audit sample should split
    // across language strata — n_h ∝ N_h·S_h (size × within-stratum
    // stddev of doc length), the design that minimizes estimator variance
    // at fixed budget. Stratum moments come from exact integer sums; the
    // allocation shares are per-mille integers from a double formula
    // mirrored in the oracle.
    "sample_neyman_alloc" -> ((s, d) => {
      val st = Tables.documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_h"), sum("n_chars").as("s_h"),
          sum(expr("CAST(n_chars AS DECIMAL(38,0)) * n_chars")).as("q_h"))
      // weights rounded to integer MILLI before the cross-stratum sum —
      // a double sum over strata would be partition-order-dependent
      val tot = st
        .selectExpr("lang", "n_h",
          """CAST(round(1000.0 * n_h
            | * sqrt((n_h*CAST(q_h AS DOUBLE) - CAST(s_h AS DOUBLE)*s_h)
            |   / (CAST(n_h AS DOUBLE)*n_h*(n_h-1)))) AS BIGINT) AS w_milli"""
            .stripMargin.replaceAll("\n", " "))
      val sum_w = tot.agg(sum("w_milli").as("sum_w"))
      tot.crossJoin(broadcast(sum_w))
        .selectExpr("lang", "n_h",
          "CAST(floor(1000.0 * w_milli / sum_w) AS BIGINT) AS alloc_permille")
        .orderBy("lang")
    }),

    // Zipf exponent of the token-frequency distribution (corpus
    // naturalness screen: real text fits slope ≈ −1; generated or
    // boilerplate-heavy corpora drift). OLS over integer floor-log2
    // coordinates (binary-string length — no float log anywhere near the
    // sums) of the top-1000 tokens; the top-k is TakeOrderedAndProject
    // and the rank window runs post-limit on 1000 rows. Slope leaves the
    // integer sufficient sums as one double ratio, formula mirrored in
    // the oracle.
    "text_zipf_slope" -> ((s, d) => {
      val freq = Tables.documents(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("f"))
        .orderBy(col("f").desc, col("tok").asc).limit(1000)
      val w = Window.partitionBy(Cleaning.singlePartitionKey(col("tok")))
        .orderBy(col("f").desc, col("tok").asc)
      freq.withColumn("r", row_number().over(w).cast("long"))
        .select((length(bin(col("r"))) - 1).cast("long").as("x"),
          (length(bin(col("f"))) - 1).cast("long").as("y"))
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
        .selectExpr("n",
          """CAST(floor(1000000.0 * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
            | / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)) AS BIGINT)
            | AS slope_ppm""".stripMargin.replaceAll("\n", " "))
    }),

    // SQL-surface parity for the native KMV aggregate: a pure-SQL user
    // reaches the same TypedImperativeAggregate through the
    // FunctionRegistry (`kmv_sketch(hash, k)`), composed with
    // portable_hash60 and LATERAL VIEW posexplode — the whole sketch
    // pipeline with zero Column-API code.
    "sql_native_kmv" -> ((s, d) => {
      graft.plans.GraftFunctions.register(s)
      s.sql(
        s"""WITH g AS (
           |  SELECT doc_id % 2 AS side,
           |    kmv_sketch(portable_hash60(text), 16) AS sk
           |  FROM parquet.`$d/documents.parquet`
           |  GROUP BY 1)
           |SELECT side, CAST(pos + 1 AS BIGINT) AS pos, h
           |FROM g LATERAL VIEW posexplode(sk) t AS pos, h
           |ORDER BY side, pos""".stripMargin)
    }),

    // HLL set algebra by inclusion–exclusion: |A∩B| estimated as
    // Â + B̂ − Â∪B from three approx_count_distinct sketches (A = heavy
    // lineitems, B = returned ones), checked against the exact
    // intersection — the "overlap of two segments without a join" trick,
    // with the compounded-error bound enforced per run (the
    // agg_approx_distinct oracle-reshape: exacts hash-compare, the
    // estimate is asserted within 10% of the exact union).
    "agg_hll_intersection" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_partkey").as("pk"),
          (col("l_quantity") >= 25).as("a"), (col("l_returnflag") === "R").as("b"))
      val exact = li.agg(
        countDistinct(when(col("a"), col("pk"))).as("exact_a"),
        countDistinct(when(col("b"), col("pk"))).as("exact_b"),
        countDistinct(when(col("a") || col("b"), col("pk"))).as("exact_union"),
        countDistinct(when(col("a") && col("b"), col("pk"))).as("exact_intersect"))
      val approx = li.agg(
        approx_count_distinct(when(col("a"), col("pk"))).as("ha"),
        approx_count_distinct(when(col("b"), col("pk"))).as("hb"),
        approx_count_distinct(when(col("a") || col("b"), col("pk"))).as("hu"))
      exact.crossJoin(broadcast(approx))
        .select(col("exact_a"), col("exact_b"), col("exact_union"), col("exact_intersect"),
          (abs(col("ha") + col("hb") - col("hu") - col("exact_intersect")) <=
            col("exact_union") * 0.1).as("within_bound"))
    }),

    // Kaplan–Meier survival of inter-purchase gaps: S(t) = Π (1 − dᵢ/nᵢ)
    // over the ordered distinct gap values — "what fraction of purchase
    // intervals exceed t days". The product is computed as exp of the
    // window-sum of MICRO-ROUNDED ln(1 − d/n) terms, so the running
    // product is order-independent and engine-portable; the final step
    // (d = n, survival exactly 0) is a CASE in both engines. Windows run
    // over distinct gap values only.
    "events_survival_km" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gaps = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev", lag("ts", 1).over(w))
        .filter(col("prev").isNotNull)
        .select(datediff(to_date(col("ts")), to_date(col("prev"))).cast("long").as("gap_days"))
      val byGap = gaps.groupBy("gap_days").agg(count(lit(1)).as("d"))
      val tot = byGap.agg(sum("d").as("n_total"))
      val wg = Window.partitionBy(Cleaning.singlePartitionKey(col("gap_days")))
        .orderBy("gap_days").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byGap.crossJoin(broadcast(tot))
        .withColumn("cum_d", sum("d").over(wg))
        .withColumn("n_risk", col("n_total") - col("cum_d") + col("d"))
        .withColumn("lnterm_micro",
          expr("CAST(round(CASE WHEN d = n_risk THEN 0.0 " +
            "ELSE ln(1.0 - CAST(d AS DOUBLE) / n_risk) END * 1e6) AS BIGINT)"))
        .withColumn("cum_ln", sum("lnterm_micro").over(wg))
        .selectExpr("gap_days", "n_risk", "d",
          """CAST(CASE WHEN d = n_risk THEN 0
            | ELSE floor(exp(CAST(cum_ln AS DOUBLE) / 1e6) * 1e6) END AS BIGINT)
            | AS surv_ppm""".stripMargin.replaceAll("\n", " "))
        .orderBy("gap_days")
    }),

    // Multiprobe sign-LSH ANN: 8 hyperplanes give a 256-bucket code; each
    // query probes its OWN bucket plus the bucket with its least-confident
    // bit flipped (smallest |dot| margin — the Lv et al. multi-probe idea),
    // roughly doubling recall for 2× probe cost with NO extra tables.
    // Candidate generation stays an equi-join on bucket; exact cosine
    // re-ranks top-3. The two probed buckets always differ, so no
    // candidate dedup pass is needed.
    "ann_multiprobe_lsh" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding").as("v"))
      val planes = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("p_id"), col("v").as("pv"))
      val data = e.filter(col("vec_id") >= 8)
      val dots = data.crossJoin(broadcast(planes))
        .select(col("vec_id"), col("p_id"),
          VectorOps.dot(col("v"), col("pv")).as("dp"))
      val buckets = dots.groupBy("vec_id").agg(
        sum(when(col("dp") >= 0, expr("shiftleft(1L, CAST(p_id AS INT))"))
          .otherwise(0L)).as("bucket"),
        min(struct(abs(col("dp")).as("m"), col("p_id").as("p"))).as("weak"))
        .select(col("vec_id"), col("bucket"), col("weak.p").as("weak_p"))
      val bdata = buckets.join(data, "vec_id")
      val probes = bdata
        .filter(col("vec_id") >= 8 && col("vec_id") < 13)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          explode(array(col("bucket"),
            expr("bucket ^ shiftleft(1L, CAST(weak_p AS INT))"))).as("pb"))
      val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id").asc)
      probes.join(bdata.select(col("vec_id"), col("bucket"), col("v")),
          col("pb") === col("bucket"))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cosine", VectorOps.cosine(col("qv"), col("v")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("vec_id").as("neighbor"), col("cosine"), col("rank"))
        .orderBy("q_id", "rank")
    }),
  )

  // DuckDB-side helpers ----------------------------------------------------
  /** Welch building blocks as SQL text shared by t² and df (kept textually
    * identical to the Spark selectExpr so both engines round identically).
    */
  private val se2Sql1 =
    "(n1*CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1)/(CAST(n1 AS DOUBLE)*n1*(n1-1))"
  private val se2Sql2 =
    "(n2*CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)*s2)/(CAST(n2 AS DOUBLE)*n2*(n2-1))"

  /** (side, h) shingle-hash universe in DuckDB — mirrors [[sideHashes]]. */
  private val sideHashSql =
    """sh AS (SELECT DISTINCT doc_id % 2 AS side,
      |    ('0x'||substr(md5(gram),1,15))::BIGINT AS h
      |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(t)-1),
      |        i -> array_to_string(list_slice(t, i, i+2), ' '))) AS gram
      |    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      |    WHERE len(t) >= 3))""".stripMargin

  val oracle: Map[String, String] = Map(
    "stats_welch_ttest" ->
      s"""WITH g AS (SELECT
         |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n1,
         |    SUM(CASE WHEN event_type = 'purchase' THEN CAST(round(value*100) AS BIGINT) ELSE 0 END) AS s1,
         |    SUM(CASE WHEN event_type = 'purchase' THEN CAST(round(value*100) AS BIGINT)::HUGEINT * CAST(round(value*100) AS BIGINT) ELSE 0 END) AS q1,
         |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n2,
         |    SUM(CASE WHEN event_type = 'click' THEN CAST(round(value*100) AS BIGINT) ELSE 0 END) AS s2,
         |    SUM(CASE WHEN event_type = 'click' THEN CAST(round(value*100) AS BIGINT)::HUGEINT * CAST(round(value*100) AS BIGINT) ELSE 0 END) AS q2
         |  FROM events WHERE event_type IN ('purchase', 'click'))
         |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
         |  CAST(s1 // n1 AS BIGINT) AS mean1_cents,
         |  CAST(s2 // n2 AS BIGINT) AS mean2_cents,
         |  CAST(floor(1000.0 *
         |    (CAST(s1 AS DOUBLE)/n1 - CAST(s2 AS DOUBLE)/n2)
         |    * (CAST(s1 AS DOUBLE)/n1 - CAST(s2 AS DOUBLE)/n2)
         |    / ($se2Sql1 + $se2Sql2)) AS BIGINT) AS t2_milli,
         |  CAST(floor(1000.0 *
         |    ($se2Sql1 + $se2Sql2) * ($se2Sql1 + $se2Sql2)
         |    / ( $se2Sql1 * $se2Sql1 / (n1-1) + $se2Sql2 * $se2Sql2 / (n2-1))
         |  ) AS BIGINT) AS df_milli
         |FROM g""".stripMargin,

    "events_rfm" ->
      """WITH per AS (SELECT user_id, max(ts) AS last_ts, COUNT(*) AS f,
        |    CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS m_cents
        |  FROM events GROUP BY 1),
        |mx AS (SELECT max(CAST(ts AS DATE)) AS mxd FROM events),
        |scored AS (SELECT user_id,
        |    date_diff('day', CAST(last_ts AS DATE), mxd) AS r_days, f, m_cents,
        |    ntile(5) OVER (ORDER BY date_diff('day', CAST(last_ts AS DATE), mxd), user_id) AS r_q,
        |    ntile(5) OVER (ORDER BY f DESC, user_id) AS f_q,
        |    ntile(5) OVER (ORDER BY m_cents DESC, user_id) AS m_q
        |  FROM per, mx)
        |SELECT user_id, CAST(r_days AS BIGINT) AS r_days, f, m_cents,
        |  CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
        |  CAST(m_q AS BIGINT) AS m_q,
        |  CAST(r_q*100 + f_q*10 + m_q AS BIGINT) AS rfm
        |FROM scored ORDER BY user_id""".stripMargin,

    "time_acf" ->
      """WITH daily AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, COUNT(*) AS x
        |  FROM events GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS nn, SUM(x) AS sx FROM daily),
        |idx AS (SELECT row_number() OVER (ORDER BY day) AS t,
        |    CAST(nn * x - sx AS BIGINT) AS z
        |  FROM daily, tot),
        |den AS (SELECT SUM(z::HUGEINT * z) AS den FROM idx),
        |ks AS (SELECT unnest(range(1, 8)) AS k),
        |pairs AS (SELECT k, a.z AS za, b.z AS zb
        |  FROM ks CROSS JOIN idx b JOIN idx a ON a.t = b.t + k)
        |SELECT CAST(k AS BIGINT) AS k, COUNT(*) AS n_pairs,
        |  CAST(floor(1000000.0 * CAST(SUM(za::HUGEINT * zb) AS DOUBLE)
        |    / CAST((SELECT den FROM den) AS DOUBLE)) AS BIGINT) AS acf_ppm
        |FROM pairs GROUP BY k ORDER BY k""".stripMargin,

    "time_stl_decompose" ->
      """WITH daily AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, COUNT(*) AS x
        |  FROM events GROUP BY 1),
        |win AS (SELECT day, x,
        |    COUNT(*) OVER w AS wn, SUM(x * 1000) OVER w AS tsum
        |  FROM daily WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |interior AS (SELECT day, CAST(x AS BIGINT) AS x,
        |    CAST(tsum // 7 AS BIGINT) AS trend_milli,
        |    CAST(x * 1000 - tsum // 7 AS BIGINT) AS det_milli,
        |    isodow(CAST(day AS DATE)) AS dow
        |  FROM win WHERE wn = 7),
        |seas AS (SELECT dow,
        |    CAST(CASE WHEN SUM(det_milli) % COUNT(*) = 0 OR SUM(det_milli) >= 0
        |      THEN SUM(det_milli) // COUNT(*)
        |      ELSE SUM(det_milli) // COUNT(*) - 1 END AS BIGINT) AS seas_milli
        |  FROM interior GROUP BY 1)
        |SELECT day, x, trend_milli, seas_milli,
        |  CAST(x * 1000 - trend_milli - seas_milli AS BIGINT) AS resid_milli
        |FROM interior JOIN seas USING (dow) ORDER BY day""".stripMargin,
    "time_periodogram" ->
      """WITH daily AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, COUNT(*) AS x
        |  FROM events GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS nn, SUM(x) AS sx FROM daily),
        |idx AS (SELECT row_number() OVER (ORDER BY day) AS t,
        |    CAST(nn * x - sx AS BIGINT) AS z, nn
        |  FROM daily, tot),
        |ks AS (SELECT unnest(range(1, 11)) AS k),
        |terms AS (SELECT k,
        |    CAST(round(z * cos(2 * pi() * k * t / nn) * 1000) AS BIGINT) AS c_term,
        |    CAST(round(z * sin(2 * pi() * k * t / nn) * 1000) AS BIGINT) AS s_term
        |  FROM ks CROSS JOIN idx),
        |agg AS (SELECT k, SUM(c_term) AS ck, SUM(s_term) AS sk FROM terms GROUP BY 1)
        |SELECT CAST(k AS BIGINT) AS k,
        |  CAST(floor((CAST(ck AS DOUBLE)*ck + CAST(sk AS DOUBLE)*sk) / 1e6) AS BIGINT) AS power_z2
        |FROM agg ORDER BY k""".stripMargin,

    "stats_runs_test" ->
      """WITH daily AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, COUNT(*) AS x
        |  FROM events GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS nn, SUM(x) AS sx FROM daily),
        |signed AS (SELECT day, (nn * x - sx) > 0 AS pos FROM daily, tot),
        |chg AS (SELECT pos,
        |    CASE WHEN lag(pos) OVER (ORDER BY day) IS NULL
        |           OR lag(pos) OVER (ORDER BY day) <> pos THEN 1 ELSE 0 END AS chg
        |  FROM signed),
        |agg AS (SELECT
        |    SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos,
        |    SUM(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS n_neg,
        |    SUM(chg) AS runs FROM chg)
        |SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
        |  CAST(runs AS BIGINT) AS runs,
        |  CAST(floor(1000.0 *
        |    (runs - (1.0 + 2.0 * n_pos * n_neg / (n_pos + n_neg)))
        |    / sqrt(2.0 * n_pos * n_neg * (2.0 * n_pos * n_neg - n_pos - n_neg)
        |       / ((CAST(n_pos + n_neg AS DOUBLE)) * (n_pos + n_neg)
        |          * (n_pos + n_neg - 1.0)))) AS BIGINT) AS z_milli
        |FROM agg""".stripMargin,

    "sample_neyman_alloc" ->
      """WITH st AS (SELECT lang, COUNT(*) AS n_h, SUM(n_chars) AS s_h,
        |    SUM(n_chars::HUGEINT * n_chars) AS q_h
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT lang, n_h,
        |    CAST(round(1000.0 * n_h
        |      * sqrt((n_h*CAST(q_h AS DOUBLE) - CAST(s_h AS DOUBLE)*s_h)
        |        / (CAST(n_h AS DOUBLE)*n_h*(n_h-1)))) AS BIGINT) AS w_milli
        |  FROM st),
        |sw AS (SELECT SUM(w_milli) AS sum_w FROM tot)
        |SELECT lang, CAST(n_h AS BIGINT) AS n_h,
        |  CAST(floor(1000.0 * w_milli / sum_w) AS BIGINT) AS alloc_permille
        |FROM tot CROSS JOIN sw ORDER BY lang""".stripMargin,

    "events_cusum" ->
      """WITH daily AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, COUNT(*) AS x
        |  FROM events GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS nn, SUM(x) AS sx FROM daily),
        |cs AS (SELECT day, x,
        |    CAST(SUM(nn * x - sx) OVER (ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cusum
        |  FROM daily, tot),
        |peak AS (SELECT max(abs(cusum)) AS peak FROM cs)
        |SELECT day, x, cusum, abs(cusum) = peak AS is_peak
        |FROM cs, peak ORDER BY day""".stripMargin,

    "stats_gini" ->
      """WITH by_len AS (SELECT n_chars AS len, COUNT(*) AS cnt, SUM(n_chars) AS mass
        |  FROM documents GROUP BY 1),
        |cum AS (SELECT len, cnt, mass,
        |    SUM(cnt) OVER (ORDER BY len ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM by_len),
        |terms AS (SELECT cnt, mass,
        |    len::HUGEINT * ((cum - cnt) * cnt + (cnt * (cnt + 1)) // 2) AS ixi
        |  FROM cum),
        |agg AS (SELECT SUM(cnt) AS n, SUM(mass) AS total_chars, SUM(ixi) AS sixi FROM terms)
        |SELECT CAST(n AS BIGINT) AS n, CAST(total_chars AS BIGINT) AS total_chars,
        |  CAST(floor(1000000.0 * (2.0 * sixi - (n + 1.0) * total_chars)
        |    / (CAST(n AS DOUBLE) * total_chars)) AS BIGINT) AS gini_ppm
        |FROM agg""".stripMargin,

    "sql_native_kmv" ->
      """WITH h AS (SELECT DISTINCT doc_id % 2 AS side,
        |    ('0x'||substr(md5(text),1,15))::BIGINT AS h
        |  FROM documents),
        |r AS (SELECT side, h, row_number() OVER (PARTITION BY side ORDER BY h) AS pos
        |  FROM h)
        |SELECT side, CAST(pos AS BIGINT) AS pos, h
        |FROM r WHERE pos <= 16 ORDER BY side, pos""".stripMargin,

    "agg_hll_intersection" ->
      """SELECT
        |  COUNT(DISTINCT CASE WHEN l_quantity >= 25 THEN l_partkey END) AS exact_a,
        |  COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_partkey END) AS exact_b,
        |  COUNT(DISTINCT CASE WHEN l_quantity >= 25 OR l_returnflag = 'R'
        |    THEN l_partkey END) AS exact_union,
        |  COUNT(DISTINCT CASE WHEN l_quantity >= 25 AND l_returnflag = 'R'
        |    THEN l_partkey END) AS exact_intersect,
        |  true AS within_bound
        |FROM lineitem""".stripMargin,

    "events_survival_km" ->
      """WITH p AS (SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events WHERE event_type = 'purchase'),
        |gaps AS (SELECT date_diff('day', CAST(prev AS DATE), CAST(ts AS DATE)) AS gap_days
        |  FROM p WHERE prev IS NOT NULL),
        |by_gap AS (SELECT gap_days, COUNT(*) AS d FROM gaps GROUP BY 1),
        |tot AS (SELECT SUM(d) AS n_total FROM by_gap),
        |cum AS (SELECT gap_days, d,
        |    n_total - SUM(d) OVER (ORDER BY gap_days ROWS UNBOUNDED PRECEDING) + d AS n_risk
        |  FROM by_gap, tot),
        |terms AS (SELECT gap_days, d, n_risk,
        |    CAST(round(CASE WHEN d = n_risk THEN 0.0
        |      ELSE ln(1.0 - CAST(d AS DOUBLE) / n_risk) END * 1e6) AS BIGINT) AS lnterm_micro
        |  FROM cum),
        |acc AS (SELECT gap_days, CAST(n_risk AS BIGINT) AS n_risk, d,
        |    SUM(lnterm_micro) OVER (ORDER BY gap_days ROWS UNBOUNDED PRECEDING) AS cum_ln
        |  FROM terms)
        |SELECT gap_days, n_risk, d,
        |  CAST(CASE WHEN d = n_risk THEN 0
        |    ELSE floor(exp(CAST(cum_ln AS DOUBLE) / 1e6) * 1e6) END AS BIGINT) AS surv_ppm
        |FROM acc ORDER BY gap_days""".stripMargin,

    "join_scd2_pointintime" ->
      """WITH base AS (SELECT c_custkey, c_mktsegment,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents FROM customer),
        |upd AS (SELECT c_custkey, 'MOVED' AS c_mktsegment, bal_cents + 50000 AS bal_cents
        |  FROM base WHERE c_custkey % 10 = 0),
        |dim AS (
        |  SELECT c_custkey, c_mktsegment, bal_cents,
        |      '1900-01-01' AS valid_from, '2026-08-01' AS valid_to, false AS is_current
        |    FROM base WHERE c_custkey IN (SELECT c_custkey FROM upd)
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment, bal_cents,
        |      '1900-01-01', '9999-12-31', true
        |    FROM base WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment, bal_cents,
        |      '2026-08-01', '9999-12-31', true FROM upd),
        |ev AS (SELECT event_id, user_id + 1 AS c_custkey,
        |    strftime(CAST(ts AS DATE), '%Y-%m-%d') AS ev_date FROM events)
        |SELECT event_id, ev.c_custkey, c_mktsegment, bal_cents, is_current
        |FROM ev JOIN dim ON ev.c_custkey = dim.c_custkey
        |WHERE ev_date >= valid_from AND ev_date < valid_to
        |ORDER BY event_id""".stripMargin,

    "events_fraud_velocity" ->
      """SELECT user_id, event_id, epoch_us(ts) AS us,
        |  CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_24h,
        |  COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) >= 5 AS is_velocity_alert
        |FROM events ORDER BY user_id, us, event_id""".stripMargin,

    "privacy_dp_laplace" ->
      """WITH g AS (SELECT c_nationkey, COUNT(*) AS true_n FROM customer GROUP BY 1),
        |u AS (SELECT c_nationkey, true_n,
        |    ('0x'||substr(md5(CAST(c_nationkey AS VARCHAR)),1,15))::BIGINT
        |      / 1152921504606846976.0 - 0.5 AS u
        |  FROM g)
        |SELECT c_nationkey, true_n,
        |  CAST(true_n + round(CASE WHEN u >= 0 THEN -ln(greatest(1e-18, 1.0 - 2.0*u))
        |    ELSE ln(greatest(1e-18, 1.0 + 2.0*u)) END) AS BIGINT) AS noised_n,
        |  CAST(1000 AS BIGINT) AS epsilon_milli
        |FROM u ORDER BY c_nationkey""".stripMargin,

    "privacy_dp_ledger" -> {
      def rel(groupSql: String, keySql: String, epsMilli: Long): String =
        s"""SELECT COUNT(*) AS n_queries, CAST(SUM(
           |    true_n + round((1000.0 / $epsMilli) *
           |      (CASE WHEN u >= 0 THEN -ln(greatest(1e-18, 1.0 - 2.0*u))
           |       ELSE ln(greatest(1e-18, 1.0 + 2.0*u)) END))
           |  ) AS BIGINT) AS released_checksum FROM (
           |  SELECT true_n,
           |    ('0x'||substr(md5($keySql),1,15))::BIGINT
           |      / 1152921504606846976.0 - 0.5 AS u
           |  FROM ($groupSql) g) t""".stripMargin
      val r1 = rel("SELECT c_nationkey AS k, COUNT(*) AS true_n FROM customer GROUP BY 1",
        "'r1:' || CAST(k AS VARCHAR)", 1000L)
      val r2 = rel("SELECT c_mktsegment AS k, COUNT(*) AS true_n FROM customer GROUP BY 1",
        "'r2:' || k", 500L)
      val r3 = rel("SELECT COUNT(*) AS true_n FROM customer", "'r3:all'", 250L)
      s"""WITH rel1 AS ($r1), rel2 AS ($r2), rel3 AS ($r3),
         |rows_ AS (
         |  SELECT 'r1_nation_counts' AS release, 'parallel' AS composition,
         |    n_queries, CAST(1000 AS BIGINT) AS eps_query_milli,
         |    CAST(1000 AS BIGINT) AS eps_release_milli, released_checksum FROM rel1
         |  UNION ALL SELECT 'r2_segment_counts', 'parallel', n_queries,
         |    500, 500, released_checksum FROM rel2
         |  UNION ALL SELECT 'r3_global_count', 'single', n_queries,
         |    250, 250, released_checksum FROM rel3),
         |tot AS (SELECT 'total' AS release, 'sequential' AS composition,
         |    CAST(SUM(n_queries) AS BIGINT) AS n_queries,
         |    CAST(0 AS BIGINT) AS eps_query_milli,
         |    CAST(SUM(eps_release_milli) AS BIGINT) AS eps_release_milli,
         |    CAST(SUM(released_checksum) AS BIGINT) AS released_checksum
         |  FROM rows_)
         |SELECT * FROM rows_ UNION ALL SELECT * FROM tot ORDER BY release""".stripMargin
    },

    "events_path_trigrams" ->
      """WITH o AS (SELECT user_id, event_type AS s1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s3
        |  FROM events)
        |SELECT s1, s2, s3, COUNT(*) AS n
        |FROM o WHERE s2 IS NOT NULL AND s3 IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY n DESC, s1, s2, s3 LIMIT 10""".stripMargin,

    "text_js_divergence" ->
      """WITH counts AS (SELECT doc_id % 2 AS side, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |g AS (SELECT side, tok, COUNT(*) AS c FROM counts GROUP BY 1, 2),
        |a AS (SELECT tok, c AS ca FROM g WHERE side = 0),
        |b AS (SELECT tok, c AS cb FROM g WHERE side = 1),
        |tot AS (SELECT
        |    SUM(CASE WHEN side = 0 THEN c ELSE 0 END) AS na,
        |    SUM(CASE WHEN side = 1 THEN c ELSE 0 END) AS nb FROM g),
        |j AS (SELECT COALESCE(a.tok, b.tok) AS tok,
        |    COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb, na, nb
        |  FROM a FULL OUTER JOIN b ON a.tok = b.tok CROSS JOIN tot),
        |terms AS (SELECT na, nb,
        |    CAST(round((
        |      CASE WHEN ca > 0 THEN 0.5 * (CAST(ca AS DOUBLE)/na)
        |        * ln((CAST(ca AS DOUBLE)/na)
        |             / (0.5*(CAST(ca AS DOUBLE)/na) + 0.5*(CAST(cb AS DOUBLE)/nb))) ELSE 0.0 END
        |    + CASE WHEN cb > 0 THEN 0.5 * (CAST(cb AS DOUBLE)/nb)
        |        * ln((CAST(cb AS DOUBLE)/nb)
        |             / (0.5*(CAST(ca AS DOUBLE)/na) + 0.5*(CAST(cb AS DOUBLE)/nb))) ELSE 0.0 END
        |    ) * 1e6) AS BIGINT) AS contrib_micro
        |  FROM j)
        |SELECT COUNT(*) AS vocab, CAST(max(na) AS BIGINT) AS n_tokens_a,
        |  CAST(max(nb) AS BIGINT) AS n_tokens_b,
        |  CAST(SUM(contrib_micro) AS BIGINT) AS jsd_micronats
        |FROM terms""".stripMargin,

    "time_rolling_zscore" ->
      """WITH daily AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, COUNT(*) AS x
        |  FROM events GROUP BY 1),
        |win AS (SELECT day, x,
        |    COUNT(*) OVER w AS n_win,
        |    SUM(x) OVER w AS s_win,
        |    SUM(x * x) OVER w AS q_win
        |  FROM daily WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
        |z AS (SELECT day, x, CAST(n_win AS BIGINT) AS n_win,
        |    CAST(CASE WHEN n_win > 1 AND n_win * q_win - s_win * s_win > 0
        |      THEN floor(1000.0 * (x - CAST(s_win AS DOUBLE)/n_win)
        |        / sqrt((n_win*CAST(q_win AS DOUBLE) - CAST(s_win AS DOUBLE)*s_win)
        |               / (CAST(n_win AS DOUBLE)*(n_win - 1))))
        |      ELSE 0 END AS BIGINT) AS z_milli
        |  FROM win)
        |SELECT day, x, n_win, z_milli, abs(z_milli) >= 3000 AS is_anomaly
        |FROM z ORDER BY day""".stripMargin,

    "events_entropy_rate" ->
      """WITH ordered AS (SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |tr AS (SELECT event_type AS cur, nxt, COUNT(*) AS c
        |  FROM ordered WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT cur, SUM(c) AS r FROM tr GROUP BY 1),
        |tot AS (SELECT SUM(r) AS n_total FROM r),
        |terms AS (SELECT tr.cur, tr.c, r.r,
        |    CAST(round((CAST(c AS DOUBLE) / r) * ln(CAST(r AS DOUBLE) / c) * 1e6) AS BIGINT)
        |      AS h_term_micro
        |  FROM tr JOIN r ON tr.cur = r.cur),
        |per_state AS (SELECT cur, max(r) AS r, SUM(h_term_micro) AS h_micro
        |  FROM terms GROUP BY 1)
        |SELECT cur, CAST(r AS BIGINT) AS n_transitions,
        |  CAST(h_micro AS BIGINT) AS h_micro,
        |  CAST((r * h_micro) // n_total AS BIGINT) AS weighted_micro
        |FROM per_state CROSS JOIN tot ORDER BY cur""".stripMargin,

    "text_heaps_law" ->
      """WITH first_seen AS (SELECT tok, MIN(doc_id) AS first_doc FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
        |  GROUP BY 1),
        |nd AS (SELECT MAX(doc_id) AS max_id FROM documents),
        |cps AS (SELECT (1::BIGINT << CAST(k AS INT)) AS k
        |  FROM (SELECT unnest(range(0, 20)) AS k) s, nd
        |  WHERE (1::BIGINT << CAST(k AS INT)) <= max_id * 2)
        |SELECT k, COUNT(*) AS vocab
        |FROM first_seen CROSS JOIN cps
        |WHERE first_doc < k
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_markov_stationary" -> {
      // 8 unrolled power-iteration CTEs, each the exact integer update
      // π'_j = Σ_i (π_i·c_ij) div r_i — identical truncation to the Spark loop
      val steps = (1 to 8).map { i =>
        s"""p$i AS (SELECT t.nxt AS state, CAST(SUM((p.pi * t.c) // t.r) AS BIGINT) AS pi
           |  FROM p${i - 1} p JOIN t ON p.state = t.cur GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH ordered AS (SELECT user_id, event_type,
         |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
         |  FROM events),
         |tr AS (SELECT event_type AS cur, nxt, COUNT(*) AS c
         |  FROM ordered WHERE nxt IS NOT NULL GROUP BY 1, 2),
         |r AS (SELECT cur, SUM(c) AS r FROM tr GROUP BY 1),
         |t AS (SELECT tr.cur, tr.nxt, tr.c, r.r FROM tr JOIN r ON tr.cur = r.cur),
         |p0 AS (SELECT cur AS state,
         |    CAST(1000000 // (SELECT COUNT(*) FROM r) AS BIGINT) AS pi FROM r),
         |$steps
         |SELECT state, pi AS pi_ppm FROM p8 ORDER BY state""".stripMargin
    },

    "text_keyword_rake" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(generate_series(1, len(string_split(text, ' ')))) AS pos,
        |    unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |phx AS (SELECT doc_id, pos, tok,
        |    SUM(CASE WHEN tok IN ('the', 'a', 'of') THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS phrase_id
        |  FROM toks),
        |phr AS (SELECT doc_id, pos, tok, phrase_id FROM phx
        |  WHERE tok NOT IN ('the', 'a', 'of')),
        |plen AS (SELECT doc_id, phrase_id, COUNT(*) AS plen FROM phr GROUP BY 1, 2),
        |st AS (SELECT tok, COUNT(*) AS freq, CAST(SUM(plen) AS BIGINT) AS degree
        |  FROM phr JOIN plen USING (doc_id, phrase_id) GROUP BY 1)
        |SELECT tok, freq, degree,
        |  CAST((1000 * degree) // freq AS BIGINT) AS score_milli
        |FROM st ORDER BY score_milli DESC, tok LIMIT 20""".stripMargin,

    "time_changepoint" ->
      """WITH daily AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, COUNT(*) AS x
        |  FROM events GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS nn, SUM(x) AS sx FROM daily),
        |cs AS (SELECT day, x,
        |    CAST(SUM(nn * x - sx) OVER (ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cusum
        |  FROM daily, tot),
        |sp AS (SELECT day AS split_day FROM cs
        |  ORDER BY abs(cusum) DESC, day LIMIT 1),
        |agg AS (SELECT max(split_day) AS split_day,
        |    SUM(CASE WHEN day <= split_day THEN 1 ELSE 0 END) AS n_before,
        |    SUM(CASE WHEN day <= split_day THEN x ELSE 0 END) AS x_before,
        |    SUM(CASE WHEN day > split_day THEN 1 ELSE 0 END) AS n_after,
        |    SUM(CASE WHEN day > split_day THEN x ELSE 0 END) AS x_after
        |  FROM cs CROSS JOIN sp)
        |SELECT split_day, CAST(n_before AS BIGINT) AS n_before,
        |  CAST(n_after AS BIGINT) AS n_after,
        |  CAST((1000 * x_before) // n_before AS BIGINT) AS mean_before_milli,
        |  CAST((1000 * x_after) // n_after AS BIGINT) AS mean_after_milli,
        |  CAST((1000 * x_after) // n_after - (1000 * x_before) // n_before AS BIGINT)
        |    AS shift_milli
        |FROM agg""".stripMargin,

    "privacy_t_closeness" ->
      """WITH base AS (SELECT c_nationkey, c_mktsegment,
        |    (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 200000 AS bk
        |  FROM customer),
        |per_cell AS (SELECT c_nationkey, c_mktsegment, bk, COUNT(*) AS nb
        |  FROM base GROUP BY 1, 2, 3),
        |groups AS (SELECT c_nationkey, c_mktsegment, SUM(nb) AS n_g
        |  FROM per_cell GROUP BY 1, 2),
        |gdist AS (SELECT bk, COUNT(*) AS gb FROM base GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS n_tot, COUNT(DISTINCT bk) AS n_bk FROM base),
        |grid AS (SELECT g.c_nationkey, g.c_mktsegment, g.n_g, b.bk,
        |    COALESCE(p.nb, 0) AS nb, b.gb
        |  FROM groups g CROSS JOIN gdist b
        |  LEFT JOIN per_cell p ON p.c_nationkey = g.c_nationkey
        |    AND p.c_mktsegment = g.c_mktsegment AND p.bk = b.bk),
        |cum AS (SELECT c_nationkey, c_mktsegment, n_g,
        |    SUM(nb) OVER (PARTITION BY c_nationkey, c_mktsegment
        |      ORDER BY bk ROWS UNBOUNDED PRECEDING) AS cumg,
        |    SUM(gb) OVER (PARTITION BY c_nationkey, c_mktsegment
        |      ORDER BY bk ROWS UNBOUNDED PRECEDING) AS cumx
        |  FROM grid),
        |agg AS (SELECT c_nationkey, c_mktsegment,
        |    max(n_g) AS n_rows, max(n_tot) AS n_tot, max(n_bk) AS n_bk,
        |    SUM(abs(n_tot::HUGEINT * cumg - n_g::HUGEINT * cumx)) AS emd_num
        |  FROM cum CROSS JOIN tot GROUP BY 1, 2)
        |SELECT c_nationkey, c_mktsegment, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST((1000000 * emd_num::HUGEINT)
        |    // (n_rows::HUGEINT * n_tot * (n_bk - 1)) AS BIGINT) AS emd_ppm,
        |  CAST((1000000 * emd_num::HUGEINT)
        |    // (n_rows::HUGEINT * n_tot * (n_bk - 1)) AS BIGINT) <= 250000 AS release_ok
        |FROM agg ORDER BY 1, 2""".stripMargin,

    "stats_benford" ->
      """WITH e AS (SELECT CAST(substr(CAST(abs(CAST(round(value*100) AS BIGINT)) AS VARCHAR), 1, 1)
        |    AS BIGINT) AS digit FROM events),
        |per AS (SELECT digit, COUNT(*) AS n FROM e WHERE digit >= 1 GROUP BY 1),
        |tot AS (SELECT SUM(n) AS total_n FROM per)
        |SELECT digit, n,
        |  CAST((1000000 * n) // total_n AS BIGINT) AS obs_ppm,
        |  CAST(round(log10(1.0 + 1.0 / digit) * 1e6) AS BIGINT) AS exp_ppm,
        |  CAST(round(
        |    (CAST(n AS DOUBLE) / total_n - log10(1.0 + 1.0 / digit))
        |    * (CAST(n AS DOUBLE) / total_n - log10(1.0 + 1.0 / digit))
        |    / log10(1.0 + 1.0 / digit) * total_n * 1e6) AS BIGINT) AS chi2_micro
        |FROM per CROSS JOIN tot ORDER BY digit""".stripMargin,

    "agg_kmv_native" ->
      s"""WITH $sideHashSql,
         |ranked AS (SELECT side, h,
         |    row_number() OVER (PARTITION BY side ORDER BY h) AS pos
         |  FROM sh)
         |SELECT side, CAST(pos AS BIGINT) AS pos, h
         |FROM ranked WHERE pos <= 64 ORDER BY side, pos""".stripMargin,

    "stats_mann_whitney" ->
      """WITH by_val AS (SELECT CAST(round(value*100) AS BIGINT) AS c,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n1v,
        |    COUNT(*) AS nv
        |  FROM events WHERE event_type IN ('purchase', 'click') GROUP BY 1),
        |ranked AS (SELECT n1v, nv,
        |    SUM(nv) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM by_val),
        |terms AS (SELECT n1v, nv,
        |    2 * (cum - nv) + nv + 1 AS ranks2 FROM ranked),
        |agg AS (SELECT SUM(n1v) AS n1, SUM(nv) AS n,
        |    SUM(n1v * ranks2) AS r1x2,
        |    SUM(nv::HUGEINT * nv * nv - nv) AS tiesum
        |  FROM terms)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n - n1 AS BIGINT) AS n2,
        |  CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
        |  CAST(2 * n1 * (n - n1) - (r1x2 - n1 * (n1 + 1)) AS BIGINT) AS u2_x2,
        |  CAST(floor(1000.0 *
        |    ((r1x2 - n1 * (n1 + 1)) / 2.0 - CAST(n1 AS DOUBLE) * (n - n1) / 2.0)
        |    / sqrt(CAST(n1 AS DOUBLE) * (n - n1) / 12.0
        |        * ((n + 1.0) - CAST(tiesum AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1.0))))
        |  ) AS BIGINT) AS z_milli
        |FROM agg""".stripMargin,

    "profile_drift_psi" ->
      """WITH e AS (SELECT CAST(round(value*100) AS BIGINT) AS c,
        |    CAST(ts AS DATE) < DATE '2024-01-16' AS is_ref
        |  FROM events),
        |binned AS (SELECT CAST(length(bin(c)) - 1 AS BIGINT) AS bin,
        |    SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS ref_n,
        |    SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS cur_n
        |  FROM e GROUP BY 1),
        |tot AS (SELECT SUM(ref_n) AS ref_tot, SUM(cur_n) AS cur_tot,
        |    COUNT(*) AS n_bins FROM binned)
        |SELECT bin, CAST(ref_n AS BIGINT) AS ref_n, CAST(cur_n AS BIGINT) AS cur_n,
        |  CAST(round((
        |     (ref_n + 1.0) / (ref_tot + n_bins) - (cur_n + 1.0) / (cur_tot + n_bins)
        |   ) * ln(((ref_n + 1.0) / (ref_tot + n_bins)) / ((cur_n + 1.0) / (cur_tot + n_bins)))
        |   * 1e6) AS BIGINT) AS contrib_micro
        |FROM binned, tot ORDER BY bin""".stripMargin,

    "time_seasonal_profile" ->
      """WITH per AS (SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
        |    COUNT(*) AS n,
        |    CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |  FROM events GROUP BY 1),
        |tot AS (SELECT SUM(n) AS total_n FROM per)
        |SELECT dow, n, value_cents,
        |  CAST((1000000 * n) // total_n AS BIGINT) AS share_ppm,
        |  CAST((7000000 * n) // total_n AS BIGINT) AS index_ppm
        |FROM per, tot ORDER BY dow""".stripMargin,

    "text_zipf_slope" ->
      """WITH freq AS (SELECT tok, COUNT(*) AS f
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY 1 ORDER BY f DESC, tok LIMIT 1000),
        |ranked AS (SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r FROM freq),
        |xy AS (SELECT CAST(length(bin(r)) - 1 AS BIGINT) AS x,
        |    CAST(length(bin(f)) - 1 AS BIGINT) AS y FROM ranked),
        |agg AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx FROM xy)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CAST(floor(1000000.0 * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
        |    / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)) AS BIGINT)
        |    AS slope_ppm
        |FROM agg""".stripMargin,

    "agg_kmv_intersect" ->
      s"""WITH $sideHashSql,
         |a AS (SELECT h FROM sh WHERE side = 0 ORDER BY h LIMIT 64),
         |b AS (SELECT h FROM sh WHERE side = 1 ORDER BY h LIMIT 64),
         |u AS (SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b) t ORDER BY h LIMIT 64),
         |stats AS (SELECT
         |    (SELECT max(h) FROM a) AS hka,
         |    (SELECT max(h) FROM b) AS hkb,
         |    (SELECT max(h) FROM u) AS hku,
         |    (SELECT COUNT(*) FROM u
         |      WHERE h IN (SELECT h FROM a) AND h IN (SELECT h FROM b)) AS m)
         |SELECT CAST(64 AS BIGINT) AS k,
         |  CAST(floor(63 * 1152921504606846976.0 / hka) AS BIGINT) AS est_a,
         |  CAST(floor(63 * 1152921504606846976.0 / hkb) AS BIGINT) AS est_b,
         |  CAST(floor(63 * 1152921504606846976.0 / hku) AS BIGINT) AS est_union,
         |  CAST(m AS BIGINT) AS m,
         |  CAST((1000000 * m) // 64 AS BIGINT) AS jaccard_ppm,
         |  CAST((m * CAST(floor(63 * 1152921504606846976.0 / hku) AS BIGINT)) // 64 AS BIGINT) AS est_intersect
         |FROM stats""".stripMargin,

    "ann_multiprobe_lsh" -> {
      val cos = LlmQueries.cosSql("qv", "dv")
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         |planes AS (SELECT vec_id AS p_id, v AS pv FROM e WHERE vec_id < 8),
         |data AS (SELECT vec_id, v FROM e WHERE vec_id >= 8),
         |dots AS (SELECT d.vec_id, p_id,
         |    list_reduce(list_transform(list_zip(d.v, pv), z -> z[1]*z[2]), (x, y) -> x+y) AS dp
         |  FROM data d, planes),
         |buckets AS (SELECT vec_id,
         |    CAST(SUM(CASE WHEN dp >= 0 THEN (1::BIGINT << p_id) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM dots GROUP BY 1),
         |weak AS (SELECT vec_id, p_id AS weak_p FROM (
         |    SELECT vec_id, p_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY abs(dp), p_id) AS rn
         |    FROM dots) WHERE rn = 1),
         |bdata AS (SELECT b.vec_id, bucket, weak_p, v
         |  FROM buckets b JOIN weak w ON b.vec_id = w.vec_id JOIN data d ON b.vec_id = d.vec_id),
         |probes AS (SELECT vec_id AS q_id, v AS qv,
         |    unnest([bucket, xor(bucket, 1::BIGINT << weak_p)]) AS pb
         |  FROM bdata WHERE vec_id >= 8 AND vec_id < 13),
         |cands AS (SELECT q_id, c.vec_id AS neighbor, c.v AS dv, qv
         |  FROM probes p JOIN bdata c ON p.pb = c.bucket
         |  WHERE c.vec_id <> p.q_id),
         |ranked AS (SELECT q_id, neighbor, $cos AS cosine,
         |    row_number() OVER (PARTITION BY q_id ORDER BY $cos DESC, neighbor) AS rank
         |  FROM cands)
         |SELECT q_id, neighbor, cosine, CAST(rank AS BIGINT) AS rank
         |FROM ranked WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin
    },
  )
}
