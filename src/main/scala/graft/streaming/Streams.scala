package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.{DataFrame, Row}

/** Structured-Streaming operators over the `events` stream shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference is batch-only (SURVEY.md §2.9); these are the windowed
  * aggregations a streaming extension of the same pipeline needs. Each
  * transformation is written against plain DataFrames so the IDENTICAL
  * code runs in both batch mode (verified against the DuckDB oracle via
  * `stream_*_batcheq` queries) and streaming mode (micro-batch, with
  * watermarks) — the unification Structured Streaming exists for.
  *
  * Scale notes: tumbling/session windows shuffle once on (window, key);
  * state size is bounded by the watermark horizon; money aggregates go
  * through exact integer cents so results are merge-order independent.
  */
object Streams {

  /** Exact cents for the money column (partition/merge-order independent). */
  private def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")

  /** Tumbling-window counts + value totals per event type. */
  def tumblingAgg(events: DataFrame, width: String = "10 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(cents(col("value"))).as("value_cents"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n_events"), col("value_cents"))

  /** Per-tumbling-window distinct-user estimate via the native mergeable
    * KMV sketch ([[graft.functions.KmvSketch]]) — the custom
    * TypedImperativeAggregate running INSIDE streaming aggregation state:
    * each micro-batch updates the O(k) buffer through the same
    * update/merge/serialize path the state store uses, and merge-order
    * independence makes the streamed result row-identical to the batch
    * run. When a window saw fewer than k distinct users the sketch IS the
    * exact set (est = its size); past k the standard (k−1)·2⁶⁰/h_k
    * estimator applies.
    */
  def kmvWindowDistinct(events: DataFrame, width: String = "60 minutes",
                        k: Int = 32): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    val h = graft.ops.TextOps.hash60(col("user_id").cast("string"))
    val sk = toColumn(
      graft.functions.KmvSketch(toExpression(h), k).toAggregateExpression())
    events
      .groupBy(window(col("ts"), width))
      .agg(count(lit(1)).as("n_events"), sk.as("sketch"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("n_events"),
        when(size(col("sketch")) < k, size(col("sketch")).cast("long"))
          .otherwise(expr(s"CAST(floor((${k - 1} * 1152921504606846976.0)" +
            " / element_at(sketch, -1)) AS BIGINT)")).as("est_users"))
  }

  /** Sliding windows: width 10 min, slide 5 min — every event lands in
    * exactly two windows; same shuffle shape as tumbling with a 2×
    * row expansion before the partial aggregation.
    */
  def slidingAgg(events: DataFrame, width: String = "10 minutes",
                 slide: String = "5 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(cents(col("value"))).as("value_cents"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n_events"), col("value_cents"))

  /** Session windows per user: events within `gap` of each other merge;
    * window.end is last-event + gap (Spark session semantics).
    */
  def sessionAgg(events: DataFrame, gap: String = "5 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(cents(col("value"))).as("value_cents"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n_events"), col("value_cents"))

  /** Streaming wiring for the tumbling aggregation: watermark bounds the
    * state store (late data beyond 10 minutes is dropped, windows older
    * than the watermark are evicted), update mode emits per-micro-batch
    * revisions. Used by the streaming smoke test (memory source → memory
    * sink); in production the sink would be a partitioned parquet/Delta
    * table via `toTable`.
    */
  def tumblingStream(events: DataFrame, width: String = "10 minutes"): DataStreamWriter[Row] =
    tumblingAgg(events.withWatermark("ts", "10 minutes"), width)
      .writeStream
      .outputMode("update")
      .format("memory")
      .trigger(Trigger.AvailableNow())

  /** Append-mode tumbling aggregate: each window row emits EXACTLY ONCE,
    * when the watermark passes the window end — and an event arriving
    * more than `lateness` behind the max seen event time is dropped
    * before the aggregation, never silently revising an already-emitted
    * row. This is the at-most-how-late contract an event-time pipeline
    * feeding a downstream table must pin; the update-mode twin above
    * instead revises rows in place. State stays bounded because closed
    * windows are evicted once emitted.
    */
  def tumblingAppendStream(events: DataFrame, width: String = "10 minutes",
      lateness: String = "10 minutes"): DataStreamWriter[Row] =
    tumblingAgg(events.withWatermark("ts", lateness), width)
      .writeStream
      .outputMode("append")
      .format("memory")

  /** File-source → checkpointed parquet-sink relay, the production wiring
    * for a streaming lake ingest: the checkpoint's offset log records
    * which input files each micro-batch consumed and the file sink commits
    * each batch's files atomically through its own metadata log, so a
    * RESTART (new query, same checkpoint) resumes after the last committed
    * batch and reprocesses nothing — exactly-once output end to end.
    * AvailableNow drains everything present, then terminates.
    */
  def fileRelay(spark: org.apache.spark.sql.SparkSession, srcDir: String,
                schema: org.apache.spark.sql.types.StructType,
                outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(schema).json(srcDir)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

  /** Stateful streaming dedup: exactly-once per event_id within the
    * watermark horizon — the streaming twin of the batch dropDuplicates
    * dedup pass. State is evicted once the watermark passes, so memory is
    * bounded by (arrival-rate × horizon), not stream length.
    */
  def dedupStream(events: DataFrame, horizon: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("event_id")

  /** Sessionization via flatMapGroupsWithState: per-user custom state
    * that EMITS a row only when a session closes (gap exceeded within the
    * batch) — the 0..n-rows-per-key output shape mapGroupsWithState can't
    * express. State carries the open session (start, last, count); events
    * must arrive time-ordered per key within a batch (the test sorts;
    * production pre-shuffles by key and sorts within partitions).
    */
  def closedSessions(spark: org.apache.spark.sql.SparkSession, events: DataFrame,
                     gapSec: Long = 300L): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val byUser = events.selectExpr("user_id", "CAST(ts AS LONG) AS ts_sec")
      .as[(Long, Long)]
      .groupByKey(_._1)
    byUser.flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (user: Long, rows: Iterator[(Long, Long)], state: GroupState[(Long, Long, Long)]) =>
        val sorted = rows.map(_._2).toSeq.sorted
        var open = state.getOption
        val closed = Seq.newBuilder[(Long, Long, Long, Long)]
        sorted.foreach { t =>
          open match {
            case Some((start, last, n)) if t - last <= gapSec =>
              open = Some((start, t, n + 1))
            case Some((start, last, n)) =>
              closed += ((user, start, last, n))
              open = Some((t, t, 1L))
            case None =>
              open = Some((t, t, 1L))
          }
        }
        open.foreach(state.update)
        closed.result().iterator
    }.toDF("user_id", "session_start_sec", "session_last_sec", "n_events")
  }

  /** Stream–static enrichment: the event stream joined against a static
    * dimension (the lake's customer table) — the canonical streaming
    * lookup. The dimension is explicitly broadcast: a static side never
    * makes the stream stateful, and broadcasting keeps every micro-batch
    * shuffle-free on the stream side; the one shuffle is the keyed
    * aggregation after the join. Identical code runs in batch (oracled by
    * `stream_static_join_batcheq`) and as a stream (StreamingSpec).
    */
  def staticEnrichAgg(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), events("user_id") === dim("c_custkey"))
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("n_events"), sum(cents(col("value"))).as("value_cents"))

  /** foreachBatch MERGE sink: each micro-batch of keyed updates is merged
    * into a parquet target (latest row per key wins; unmatched target
    * rows survive) — the CDC ingest wiring. Merge-by-key makes batch
    * REPLAY idempotent, which is exactly the contract foreachBatch needs:
    * it is at-least-once, so a retried batch must not corrupt the target.
    * The read→cache→overwrite cycle stands in for a transactional table
    * format (Delta/Iceberg MERGE) at lake scale; partition-scoped
    * backfills would use [[graft.ops.Sinks.overwritePartitionsDynamic]].
    */
  def mergeIntoParquet(spark: org.apache.spark.sql.SparkSession, target: String)
                      (batch: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    // latest update per key within the batch (ties: larger ts wins,
    // then larger event_id — deterministic)
    val w = Window.partitionBy("event_id")
      .orderBy(col("ts").desc, col("value").desc)
    val updates = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val merged =
      if (new java.io.File(target).exists()) {
        val base = spark.read.parquet(target)
        updates.unionByName(
          base.join(updates.select("event_id"), Seq("event_id"), "left_anti"))
      } else updates
    // materialize before overwriting the directory we just read
    val rows = merged.cache()
    rows.count()
    rows.write.mode("overwrite").parquet(target)
    rows.unpersist()
  }

  /** Streaming wiring for the merge sink. */
  def mergeRelay(spark: org.apache.spark.sql.SparkSession, updates: DataFrame,
                 target: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .foreachBatch(mergeIntoParquet(spark, target) _)
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming at-ingest dedup: the cross-run incremental MinHash dedup
    * (the artifact contract of `dedup_incremental_persisted`) composed
    * with Structured Streaming. Per micro-batch of documents:
    *   1. band the batch — the map-only MinHash chain
    *      ([[graft.ops.TextOps.minhashBandTable]]), no shuffle;
    *   2. equi-join batch bands against the standing parquet artifact —
    *      the (new × old) candidate set ONLY, so per-batch cost scales
    *      with the batch and its collision rate, never |corpus|²;
    *   3. append the candidate pairs to `outDir` (the dedup decision log);
    *   4. append the batch bands to the artifact — the corpus rolls
    *      forward and the NEXT batch sees this one as standing.
    * New-vs-new pairs inside one batch are deliberately not emitted (the
    * same convention as the batch query: they are the next pass's corpus
    * problem). foreachBatch is at-least-once, so both writes are keyed by
    * batch id and OVERWRITE their own `batch_id=N` subdir — a replayed
    * batch replaces its previous partial output instead of appending a
    * duplicate, and the standing join explicitly excludes the current
    * batch's own rows (present only during a replay) so neither
    * self-pairs nor intra-batch pairs can leak out. Net effect:
    * exactly-once artifact roll-forward on an at-least-once trigger.
    */
  def incrementalDedupStream(spark: org.apache.spark.sql.SparkSession,
                             docs: DataFrame, artifact: String, outDir: String,
                             checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch(dedupBatch(spark, artifact, outDir) _)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()

  private def dedupBatch(spark: org.apache.spark.sql.SparkSession,
                         artifact: String, outDir: String)
                        (batch: DataFrame, batchId: Long): Unit = {
    val bands = graft.ops.TextOps.minhashBandTable(batch).cache()
    // filesystem resolved through the Hadoop conf, not java.io.File — the
    // artifact lives wherever the pipeline points it (file://, hdfs://,
    // s3a://); a local-only existence check would silently disable the
    // standing join everywhere else
    val fs = new org.apache.hadoop.fs.Path(artifact)
      .getFileSystem(spark.sessionState.newHadoopConf())
    try {
      if (fs.exists(new org.apache.hadoop.fs.Path(artifact))) {
        // batch_id is a partition column of the artifact; dropping the
        // CURRENT id excludes this batch's own bands, which are standing
        // only if a previous attempt of this same batch crashed mid-write
        val standing = spark.read.parquet(artifact)
          .filter(col("batch_id") =!= batchId)
        bands.as("x").join(standing.as("y"),
            col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key"))
          .select(col("x.doc_id").as("new_id"), col("y.doc_id").as("old_id"))
          .distinct()
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      bands.write.mode("overwrite").parquet(s"$artifact/batch_id=$batchId")
    } finally bands.unpersist()
  }

  /** Stream–stream INNER join with event-time bounds: each click joins
    * purchases by the same user within [click_ts, click_ts + 30 min].
    * Both sides carry watermarks and the join condition bounds event time
    * in both directions, so each side's buffered state is evicted once
    * the other side's watermark passes the bound — the state-cleanup
    * contract stream–stream joins require. Batch twin oracled by
    * `stream_stream_join_batcheq`; micro-batch run in StreamingSpec.
    */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val p = purchases
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    c.join(p,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        col("c_ts"), col("p_ts"))
  }

  /** Stream–stream LEFT OUTER join with watermark-evicted unmatched
    * emission: same user/time-bound pairing as [[clickPurchaseJoin]], but
    * a click with NO purchase inside its 30-minute window still emits —
    * with null purchase columns — once BOTH watermarks pass the click's
    * eviction bound (c_ts + 30 min), i.e. once a match is provably
    * impossible. That late, exactly-once null emission is the semantics
    * that make outer stream joins hard; Spark's state store provides it
    * when the join carries watermarks + a two-sided event-time bound.
    * Batch twin: an ordinary left join (oracled by
    * `stream_stream_left_join_batcheq`); micro-batch eviction timeline
    * pinned in StreamingSpec.
    */
  def clickPurchaseLeftJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val p = purchases
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    c.join(p,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"),
        "leftOuter")
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        col("c_ts"), col("p_ts"), col("purchase_id").isNotNull.as("matched"))
  }

  /** FULL OUTER completion of the stream–stream join family: unmatched
    * rows from EITHER side emit with nulls once both watermarks pass
    * their eviction bound — clicks that converted, clicks that didn't,
    * and purchases with no attributable click, in one stream. Same
    * state-eviction contract as [[clickPurchaseLeftJoin]], applied
    * symmetrically.
    */
  def clickPurchaseFullJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val p = purchases
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    c.join(p,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"),
        "fullOuter")
      .select(coalesce(col("c_user"), col("p_user")).as("user_id"),
        col("click_id"), col("purchase_id"), col("c_ts"), col("p_ts"),
        (col("click_id").isNotNull && col("purchase_id").isNotNull).as("matched"))
  }

  /** Streaming CDC materialization, latest-wins: per-key state keeps the
    * (seq, value, op) of the highest sequence number seen so far; each
    * micro-batch re-emits the refreshed current row for keys it touched
    * (update mode), with tombstone ops carried so the sink can drop
    * deleted keys. The streaming twin of the batch `cdc_latest_wins`
    * compaction — state is exactly one row per live key, so memory scales
    * with keyspace, not change volume.
    */
  def cdcLatestStream(spark: org.apache.spark.sql.SparkSession,
                      changes: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val byKey = changes.selectExpr("k", "seq", "cents", "op")
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
    byKey.mapGroupsWithState(GroupStateTimeout.NoTimeout) {
      (k: Long, rows: Iterator[(Long, Long, Long, String)],
       state: GroupState[(Long, Long, String)]) =>
        var cur = state.getOption.getOrElse((-1L, 0L, ""))
        rows.foreach { case (_, seq, cents, op) =>
          if (seq > cur._1) cur = (seq, cents, op)
        }
        state.update(cur)
        (k, cur._1, cur._2, cur._3)
    }.toDF("k", "seq", "cur_cents", "last_op")
  }

  /** Custom per-key streaming state via mapGroupsWithState: a running
    * per-user event count + last-seen timestamp (the arbitrary-state API
    * the built-in windows can't express).
    */
  /** Spark 4 `transformWithState` (the arbitrary-stateful successor to
    * mapGroupsWithState): per-key running totals held in a typed
    * `ValueState` through the new StatefulProcessor lifecycle (init /
    * handleInputRows, with timers and per-state TTL available). Requires
    * the RocksDB state store provider (set in the session conf) — which
    * is also the scale story: state lives off-heap in RocksDB with
    * changelog checkpointing instead of filling executor heaps.
    */
  def runningTotalsStream(spark: org.apache.spark.sql.SparkSession,
                          events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import spark.implicits._
    events.select(col("user_id"), cents(col("value")).as("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_events", "cents_total")
  }

  /** Idle-session closing on transformWithState EVENT-TIME TIMERS: every
    * batch refreshes the user's (count, last-seen) state and re-arms a
    * timer at last-seen + gap; when the WATERMARK passes the armed time
    * the framework calls handleExpiredTimer, the session row is emitted
    * exactly once, and the state clears. The timer-driven shape gives
    * explicit control of emission and state lifetime that window-based
    * sessionization hides — and state never outlives idle keys, which is
    * what bounds it at 100 TB/day ingest.
    */
  def idleSessionsStream(spark: org.apache.spark.sql.SparkSession,
                         events: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import spark.implicits._
    events.withWatermark("ts", "1 minute")
      .select(col("user_id"), (unix_micros(col("ts")) / 1000L).cast("long").as("ms"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new IdleSessionCloser(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF("user_id", "n_events", "last_ms")
  }

  /** Per-user event-type histogram on transformWithState MAP STATE: the
    * map is the "GROUP BY inside the state" shape — one entry updated
    * per row — where a ValueState would re-serialize the whole histogram
    * on every event. Emits (user, n_distinct_types, n_events) updates.
    */
  def typeHistogramStream(spark: org.apache.spark.sql.SparkSession,
                          events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import spark.implicits._
    events.select(col("user_id"), col("event_type"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .transformWithState(new TypeHistogramProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_types", "n_events")
  }

  /** Bounded recent-events buffer on transformWithState LIST STATE: the
    * top-3 event ids per user survive across batches (merge old state
    * with the incoming batch, re-sort, trim by rewriting the list),
    * emitted as a CSV audit row per batch. The list is the "ring buffer
    * in state" shape — fraud trails, recent-activity panels — that
    * MapState/ValueState don't express naturally; the global-top-k-by-id
    * contract makes the retained set independent of batch arrival order
    * (see [[RecentEventsProcessor]]).
    */
  def recentEventsStream(spark: org.apache.spark.sql.SparkSession,
                         events: DataFrame, keep: Int = 3): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import spark.implicits._
    events.select(col("user_id"), col("event_id"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new RecentEventsProcessor(keep),
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_recent", "recent_ids")
  }

  def runningUserCounts(spark: org.apache.spark.sql.SparkSession,
                        events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val byUser = events.selectExpr("user_id", "CAST(ts AS LONG) AS ts_sec")
      .as[(Long, Long)]
      .groupByKey(_._1)
    byUser.mapGroupsWithState(GroupStateTimeout.NoTimeout) {
      (user: Long, rows: Iterator[(Long, Long)], state: GroupState[(Long, Long)]) =>
        val (prevN, prevLast) = state.getOption.getOrElse((0L, 0L))
        var n = prevN; var last = prevLast
        rows.foreach { case (_, t) => n += 1; if (t > last) last = t }
        state.update((n, last))
        (user, n, last)
    }.toDF("user_id", "n_events", "last_seen_sec")
  }
}

/** Event-time-timer session closer for [[Streams.idleSessionsStream]]:
  * state is (n_events, last_ms, armed_timer_ms); rows re-arm, the
  * watermark fires, expiry emits and clears.
  */
class IdleSessionCloser(gapMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long), (Long, Long, Long)] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
    TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var st: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long)]("session",
      org.apache.spark.sql.Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                               timerValues: TimerValues):
      Iterator[(Long, Long, Long)] = {
    val (n0, last0, armed0) = if (st.exists()) st.get() else (0L, 0L, 0L)
    var n = n0
    var last = last0
    rows.foreach { case (_, ms) => n += 1; if (ms > last) last = ms }
    if (armed0 > 0L) getHandle.deleteTimer(armed0)
    val t = last + gapMs
    getHandle.registerTimer(t)
    st.update((n, last, t))
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo):
      Iterator[(Long, Long, Long)] = {
    val (n, last, _) = st.get()
    st.clear()
    Iterator.single((key, n, last))
  }
}

/** Top-`keep` event ids per key in ListState for
  * [[Streams.recentEventsStream]]. Contract: the buffer holds the `keep`
  * LARGEST ids seen so far (global top-k by id), so the retained set is
  * identical whatever order micro-batches or shuffled rows arrive in —
  * old state and incoming ids are merged and re-sorted before the cut
  * (appending sorted batches would keep a batch-arrival-dependent set;
  * ADVICE r6).
  */
class RecentEventsProcessor(keep: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long), (Long, Long, String)] {
  import org.apache.spark.sql.streaming.{ListState, OutputMode, TimeMode,
    TimerValues, TTLConfig}

  @transient private var recent: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    recent = getHandle.getListState[Long]("recent",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                               timerValues: TimerValues):
      Iterator[(Long, Long, String)] = {
    val incoming = rows.map(_._2).toArray
    val merged = ((if (recent.exists()) recent.get().toArray else Array.empty[Long])
      ++ incoming).sorted.takeRight(keep)
    recent.put(merged)
    Iterator.single((key, merged.length.toLong, merged.mkString(",")))
  }
}

/** ListState + ValueState COMPOSED for the txlog oracle gate
  * (`stream_tws_recent_batcheq`): per bucket, the top-`keep` order keys
  * survive across micro-batches in ListState (merge → sort desc → trim
  * → rewrite, the bounded ring-buffer shape) while a ValueState counter
  * tracks total rows ever seen. The counter is what makes the gate's
  * update-mode emissions reducible: it strictly increases on every
  * batch that touches the bucket, so `max_by(top_ids, n_seen)` picks
  * each bucket's FINAL emission deterministically — a CSV list has no
  * monotone order of its own to reduce on. Top-k-by-VALUE keeps the
  * retained set independent of batch arrival order.
  */
class RecentOrdersGateProcessor(keep: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long), (Long, Long, String)] {
  import org.apache.spark.sql.streaming.{ListState, OutputMode, TimeMode,
    TimerValues, TTLConfig, ValueState}

  @transient private var recent: ListState[Long] = _
  @transient private var seen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    recent = getHandle.getListState[Long]("recent",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    seen = getHandle.getValueState[Long]("seen",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                               timerValues: TimerValues):
      Iterator[(Long, Long, String)] = {
    val incoming = rows.map(_._2).toArray
    val merged = ((if (recent.exists()) recent.get().toArray else Array.empty[Long])
      ++ incoming).sorted(Ordering[Long].reverse).take(keep)
    recent.put(merged)
    val n = (if (seen.exists()) seen.get() else 0L) + incoming.length
    seen.update(n)
    Iterator.single((key, n, merged.mkString(",")))
  }
}

/** Event-type → count MapState histogram for
  * [[Streams.typeHistogramStream]]: one map entry touched per input row.
  */
class TypeHistogramProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, String), (Long, Long, Long)] {
  import org.apache.spark.sql.streaming.{MapState, OutputMode, TimeMode,
    TimerValues, TTLConfig}

  @transient private var hist: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    hist = getHandle.getMapState[String, Long]("hist",
      org.apache.spark.sql.Encoders.STRING,
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
                               timerValues: TimerValues):
      Iterator[(Long, Long, Long)] = {
    rows.foreach { case (_, t) =>
      val c = if (hist.containsKey(t)) hist.getValue(t) else 0L
      hist.updateValue(t, c + 1L)
    }
    var nTypes = 0L
    var nEvents = 0L
    hist.values().foreach { c => nTypes += 1; nEvents += c }
    Iterator.single((key, nTypes, nEvents))
  }
}

/** Per-key (count, cents-total) accumulator for
  * [[Streams.runningTotalsStream]]. Top-level class (not an anonymous
  * closure) so the processor serializes cleanly to executors.
  */
class RunningTotalsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long), (Long, Long, Long)] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues,
    TTLConfig, ValueState}

  @transient private var totals: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long)]("totals",
      org.apache.spark.sql.Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                               timerValues: TimerValues):
      Iterator[(Long, Long, Long)] = {
    val (n0, c0) = if (totals.exists()) totals.get() else (0L, 0L)
    var n = n0
    var c = c0
    rows.foreach { case (_, cents) => n += 1; c += cents }
    totals.update((n, c))
    Iterator.single((key, n, c))
  }
}

/** ALL THREE Spark-4 stateful primitives composed in ONE processor for
  * the consolidated txlog oracle gate (VERDICT r12 item 8 — the triad
  * used to spin three sessions/checkpoints for 6.5 s of sf0.1 bench;
  * one stream now feeds all three oracles): per bucket, a ValueState
  * (n_orders, total_cents) accumulator, a MapState type histogram, and
  * a ListState top-`keep` ring buffer advance together across RocksDB
  * micro-batches. `n_orders` strictly increases on every batch that
  * touches the bucket, making the update-mode emissions reducible
  * (`max` / `max_by(_, n_orders)` pick each bucket's final row).
  */
class TriadGateProcessor(keep: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long, String, Long), (Long, Long, Long, Long, String)] {
  import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode,
    TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var totals: ValueState[(Long, Long)] = _
  @transient private var hist: MapState[String, Long] = _
  @transient private var recent: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    totals = getHandle.getValueState[(Long, Long)]("totals",
      org.apache.spark.sql.Encoders.product[(Long, Long)], TTLConfig.NONE)
    hist = getHandle.getMapState[String, Long]("hist",
      org.apache.spark.sql.Encoders.STRING,
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    recent = getHandle.getListState[Long]("recent",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, String, Long)],
                               timerValues: TimerValues):
      Iterator[(Long, Long, Long, Long, String)] = {
    val (n0, c0) = if (totals.exists()) totals.get() else (0L, 0L)
    var n = n0
    var c = c0
    val ids = Seq.newBuilder[Long]
    rows.foreach { case (_, cents, typ, id) =>
      n += 1; c += cents
      val tc = if (hist.containsKey(typ)) hist.getValue(typ) else 0L
      hist.updateValue(typ, tc + 1L)
      ids += id
    }
    // top-k by VALUE (merge old state + batch, sort desc, trim): the
    // retained set is independent of batch arrival order
    val merged = ((if (recent.exists()) recent.get().toArray else Array.empty[Long])
      ++ ids.result()).sorted(Ordering[Long].reverse).take(keep)
    recent.put(merged)
    totals.update((n, c))
    var nTypes = 0L
    hist.keys().foreach(_ => nTypes += 1)
    Iterator.single((key, n, c, nTypes, merged.mkString(",")))
  }
}

/** STATE TTL through the real multi-batch path (VERDICT r12 item 6 —
  * the knob that bounds 100-TB state without explicit timers): the
  * per-key `live` counter is created with a processing-time
  * [[org.apache.spark.sql.streaming.TTLConfig]], so a key idle past the
  * TTL re-initializes from zero on its next batch instead of
  * accumulating; the `ever` counter on the same key has NO ttl and
  * proves the state store itself carried across the gap. Requires
  * `TimeMode.ProcessingTime()` (the Spark contract for TTL state).
  */
class TtlCounterProcessor(ttlMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long), (Long, Long, Long)] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues,
    TTLConfig, ValueState}

  @transient private var live: ValueState[Long] = _
  @transient private var ever: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    live = getHandle.getValueState[Long]("live",
      org.apache.spark.sql.Encoders.scalaLong,
      TTLConfig(java.time.Duration.ofMillis(ttlMs)))
    ever = getHandle.getValueState[Long]("ever",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                               timerValues: TimerValues):
      Iterator[(Long, Long, Long)] = {
    var batch = 0L
    rows.foreach(_ => batch += 1)
    // an expired value reads as absent — exactly the re-initialize path
    val n = (if (live.exists()) live.get() else 0L) + batch
    val e = (if (ever.exists()) ever.get() else 0L) + batch
    live.update(n)
    ever.update(e)
    Iterator.single((key, n, e))
  }
}
