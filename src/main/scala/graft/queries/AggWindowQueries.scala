package graft.queries

import graft.Tables
import graft.ops.Cleaning.cents
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregations, windows, rollup/cube — SURVEY.md §2.4–§2.5.
  *
  * The reference has no `groupBy` (its aggregation happened upstream in
  * Excel, `parse_excel_files.py:19-34`), but the capability is in scope:
  * these are the hash-aggregate / window shapes a 100 TB pipeline is made
  * of. All are partial-aggregate friendly (map-side combine) and keyed so
  * the shuffle is on low-cardinality or evenly distributed keys.
  */
object AggWindowQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // §2.4 global aggregate: the quality gate's count() (pyspark.py:33)
    // grown up: one row out, partial counts per partition, no wide shuffle.
    "agg_count" -> ((s, d) =>
      Tables.orders(s, d)
        .agg(count(lit(1)).as("n"), countDistinct(col("o_custkey")).as("n_cust"))),

    // §2.4 deterministic id assignment — the oracle-safe stand-in for the
    // reference's monotonically_increasing_id (pyspark.py:179,297).
    // CAVEAT: a single-group window is a single-task sort — fine for a
    // dimension table, oracle-determinism-only otherwise. The 100 TB path
    // is `id_zip_index` below. The constant-but-non-foldable partition
    // key (Cleaning.singlePartitionKey) makes the single-task choice
    // explicit instead of tripping the WindowExec warning.
    "id_row_number" -> ((s, d) =>
      Tables.customer(s, d)
        .withColumn("id", row_number().over(
          Window.partitionBy(graft.ops.Cleaning.singlePartitionKey(col("c_custkey")))
            .orderBy("c_custkey")).cast("long"))
        .select("id", "c_custkey", "c_name")
        .orderBy("id")),

    // §2.4 SCALABLE deterministic id assignment: range-partition + local
    // sort puts rows in global key order across partitions, then
    // zipWithIndex assigns contiguous ids with one extra (tiny) job to
    // count per-partition offsets — no single-task sort anywhere; this is
    // the 100 TB id-assignment path. Ids equal row_number(order by key)-1
    // regardless of partition boundaries.
    "id_zip_index" -> ((s, d) => {
      val src = Tables.customer(s, d).select("c_custkey", "c_name")
      val sorted = src.repartitionByRange(8, col("c_custkey"))
        .sortWithinPartitions("c_custkey")
      val schema = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false) +: sorted.schema.fields)
      val withId = sorted.rdd
        .zipWithIndex()
        .map { case (row, idx) => org.apache.spark.sql.Row.fromSeq(idx +: row.toSeq) }
      s.createDataFrame(withId, schema).orderBy("id")
    }),

    // §2.4 grouped sum (hash agg, partial+final).
    "agg_group_sum" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          (sum(cents(col("l_extendedprice"))) / 100.0).as("sum_price"))
        .orderBy("l_returnflag", "l_linestatus")),

    // §2.4 multi-aggregate per group; avg built from exact cents so it is
    // partition-order independent.
    "agg_multi" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          (sum(cents(col("l_extendedprice"))) / 100.0).as("sum_price"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          (sum(cents(col("l_extendedprice"))) / (count(lit(1)) * 100.0)).as("avg_price"))
        .orderBy("l_returnflag")),

    // §2.4 exact distinct count per group (expand + two-phase agg in Spark).
    "agg_distinct_count" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy("l_returnflag")),

    // §2.4 HLL sketch distinct — constant memory per group at any scale.
    // Spark's HLL++ and DuckDB's HLL give different estimates by design,
    // so the raw estimate is not oracle-able; instead the query PROVES the
    // bound inside the driver's gate: each group emits the exact distinct
    // count plus a within_10pct flag (|approx − exact| ≤ 0.1·exact), which
    // the oracle reproduces as exact + literal TRUE — deterministic and
    // hash-matchable, with the HLL error bound enforced per run.
    // Computed as TWO lean single-aggregate passes joined on the 3-row
    // result: mixing countDistinct with another aggregate in one agg makes
    // Catalyst expand every input row per aggregate group (measured 2.5×
    // slower than the two-scan plan at sf0.1); each pass here keeps its
    // map-side partial, and the join is a broadcast over 3 rows.
    "agg_approx_distinct" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val exact = li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts_exact"))
      val approx = li.groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx"))
      exact.join(approx, "l_returnflag")
        .select(col("l_returnflag"), col("n_parts_exact"),
          (abs(col("approx") - col("n_parts_exact")) <=
            col("n_parts_exact") * 0.1).as("within_10pct"))
        .orderBy("l_returnflag")
    }),

    // §2.4 ROLLUP with grouping() markers; group keys coalesced to a
    // sentinel so the output carries no nulls (null-ordering differs across
    // engines).
    "agg_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"),
          count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sum_qty"))
        .select(col("g_flag"), col("g_status"),
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("sum_qty"))
        .orderBy("g_flag", "g_status", "flag", "status")),

    // Explicit GROUPING SETS via the SQL entry path (finer control than
    // rollup/cube: exactly the three set shapes, one pass).
    "agg_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("li_gs")
      s.sql(
        """SELECT grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status,
          | coalesce(l_returnflag, 'ALL') AS flag, coalesce(l_linestatus, 'ALL') AS status,
          | COUNT(*) AS n, SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
          |FROM li_gs
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          |ORDER BY g_flag, g_status, flag, status""".stripMargin)
        .withColumn("g_flag", col("g_flag").cast("long"))
        .withColumn("g_status", col("g_status").cast("long"))
    }),

    // Exact interpolated percentiles per group (both engines share the
    // linear-interpolation definition, so doubles compare exactly) —
    // computed by the rank-based two-pass engine, NOT the built-in
    // `percentile`, whose aggregation buffer holds every value of the
    // group (~600M values per group at 100 TB → executor OOM; VERDICT
    // r10). StatsOps.groupedExactPercentiles replicates the built-in's
    // interpolation arithmetic bit-for-bit in bounded memory.
    "agg_percentile" -> ((s, d) =>
      graft.ops.StatsOps.groupedExactPercentiles(
        Tables.lineitem(s, d).select(col("l_returnflag"), col("l_quantity")),
        "l_returnflag", "l_quantity",
        Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99),
        expectedGroups = Some(3L)) // l_returnflag: known 3-valued
        .orderBy("l_returnflag")),

    // Exact percentiles over a HIGH-cardinality group key ("exact p95
    // latency per user") — the router sends this past MaxScanGroups to
    // the fully-distributed rank-window engine: per-group counts as a
    // hash agg, row_number over (group, value) where the group key's own
    // cardinality is the parallelism, boundary-rank rows filtered
    // (≤ 2·|ps| per group) and interpolated in codegen'd expressions.
    // Zero driver state — this is the form that survives millions of
    // groups. Milli-unit integers absorb engine-specific interpolation
    // ulp (the gate compares doubles bit-exactly).
    "agg_percentile_highcard" -> ((s, d) =>
      graft.ops.StatsOps.groupedExactPercentiles(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_quantity")),
        "l_orderkey", "l_quantity",
        Seq("p50" -> 0.5, "p95" -> 0.95))
        .select(col("l_orderkey"),
          round(col("p50") * 1000).cast("long").as("p50_milli"),
          round(col("p95") * 1000).cast("long").as("p95_milli"))
        .orderBy("l_orderkey")),

    // §2.4 CUBE.
    "agg_cube" -> ((s, d) =>
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(grouping(col("o_orderstatus")).cast("long").as("g_status"),
          grouping(col("o_orderpriority")).cast("long").as("g_prio"),
          count(lit(1)).as("n"), (sum(cents(col("o_totalprice"))) / 100.0).as("total"))
        .select(col("g_status"), col("g_prio"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          col("n"), col("total"))
        .orderBy("g_status", "g_prio", "status", "prio")),

    // Skew-safe two-phase aggregation (salting): partials on
    // (key, salt-of-16) spread a hot key over 16 reducers, the final agg
    // merges 16 tiny partials per key. With exact integer cents both
    // phases are order-independent, so the result is identical to the
    // direct group-by the oracle runs.
    "agg_salted" -> ((s, d) =>
      Tables.lineitem(s, d)
        .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
        .groupBy("l_returnflag", "salt")
        .agg(sum(col("l_quantity").cast("long")).as("pq"), count(lit(1)).as("pn"))
        .groupBy("l_returnflag")
        .agg(sum(col("pq")).as("sum_qty"), sum(col("pn")).as("n"))
        .orderBy("l_returnflag")),

    // Incremental view maintenance: yesterday's materialized rollup
    // (base partition) merged with today's delta by SUMMING THE PARTIALS
    // (sum, count are associative; avg derives from them at read time) —
    // never re-scanning history. The oracle aggregates the FULL table
    // directly, so the hash match proves merge-of-partials ≡ full
    // recompute. At 100 TB this is the difference between a daily delta
    // scan and a daily full scan.
    "agg_incremental_merge" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("flag"), cents(col("l_quantity")).as("qc"),
          col("l_orderkey"))
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("flag").agg(sum("qc").as("s"), count(lit(1)).as("n"))
      val basePart = partial(li.filter(col("l_orderkey") % 10 =!= 0))
      val deltaPart = partial(li.filter(col("l_orderkey") % 10 === 0))
      basePart.unionByName(deltaPart)
        .groupBy("flag")
        .agg(sum("s").as("sum_qty_cents"), sum("n").as("n_rows"))
        .select(col("flag"), col("sum_qty_cents"), col("n_rows"),
          expr("sum_qty_cents * 10 div n_rows").as("avg_qty_milli"))
        .orderBy("flag")
    }),

    // PIVOT with explicit value list (explicit ⇒ deterministic output
    // columns, single-pass grouped aggregation underneath).
    "agg_pivot" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority")),

    // §2.5 ranking window: top-3 priciest lines per return flag. Despite
    // the 3-value partition key this is scale-safe on Spark ≥3.5: the
    // rank-limit filter plans as WindowGroupLimit(Partial) BEFORE the
    // shuffle (verified in the executed plan), so each map task forwards
    // only its local top-3 per flag — the 3 reducers see ≤ 3×partitions
    // rows, never the full table. A hand-rolled two-phase
    // spark_partition_id pre-top-k was measured to only add a shuffle on
    // top of what the optimizer already does.
    "win_row_number" -> ((s, d) => {
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("price_cents").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          cents(col("l_extendedprice")).as("price_cents"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .orderBy("l_returnflag", "rn")
    }),

    // §2.5 rank/dense_rank with real ties (quantity has 50 distinct
    // values). Same WindowGroupLimit(Partial) map-side pruning as above —
    // the dense_rank ≤ 2 filter keeps only rows of each map task's top-2
    // distinct quantities pre-shuffle, ties included.
    "win_rank_dense" -> ((s, d) => {
      val w = Window.partitionBy("l_returnflag").orderBy(col("l_quantity").desc)
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .withColumn("rnk", rank().over(w).cast("long"))
        .withColumn("drnk", dense_rank().over(w).cast("long"))
        .filter(col("drnk") <= 2)
        .orderBy("l_returnflag", "rnk", "l_orderkey", "l_linenumber")
    }),

    // UNPIVOT/melt: wide metric columns → long (metric, value) rows — the
    // inverse of pivot. The deterministic gate ordering is produced by
    // sorting the NARROW side BEFORE the 3× Expand (r14: the sort shuffle
    // moves 1/3 the rows — 1.8M post-melt rows never shuffle): Expand is
    // a per-partition 1→3 map that emits the value columns in DECLARED
    // order, so declaring them alphabetically makes the post-melt order
    // exactly `ORDER BY keys, metric` with zero post-expand exchange.
    "unpivot_melt" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice", "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey")),
          Array(col("l_discount"), col("l_extendedprice"), col("l_quantity")),
          "metric", "value")),

    // collect_set aggregation made deterministic: sort_array + concat_ws
    // turns the unordered set into a canonical string.
    "agg_collect" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(concat_ws(",", sort_array(collect_set(col("l_linestatus")))).as("statuses"),
          concat_ws(",", sort_array(collect_set(col("l_quantity").cast("int")))).as("quantities"))
        .orderBy("l_returnflag")),

    // Conditional aggregation: count_if / sum(CASE) — one pass, no joins.
    "agg_conditional" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(expr("count_if(l_quantity > 45)").as("n_big"),
          sum(when(col("l_discount") >= 0.05, col("l_quantity").cast("long"))
            .otherwise(0L)).as("qty_discounted"),
          expr("count_if(l_linestatus = 'F')").as("n_f"))
        .orderBy("l_returnflag")),

    // §2.5 RANGE frame (value-based window bounds — all qty peers within
    // 5 units below the current row's value). The frame only depends on
    // (flag, qty) — a 3×50 domain — so the range window runs over the
    // pre-aggregated VALUE-DOMAIN counts (bounded input, the
    // weightedMedian contract) and broadcast-joins back, instead of
    // dragging every raw row through a 3-value window partition.
    "win_range_frame" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val w = Window.partitionBy("l_returnflag").orderBy(col("l_quantity"))
        .rangeBetween(-5, Window.currentRow)
      val byVal = li.groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("n_in_range", sum("cnt").over(w))
        .drop("cnt")
      li.join(broadcast(byVal), Seq("l_returnflag", "l_quantity"))
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("n_in_range"))
        .orderBy("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
    }),

    // §2.5 distribution windows: ntile quartiles + percent_rank/cume_dist
    // (exact integer-ratio doubles, engine-identical). The order has a
    // unique tiebreak, so all three are pure arithmetic over the per-group
    // row number and group size: rank == rn, pct_rank = (rn-1)/(n-1),
    // cume = rn/n, and ntile(4) is Spark's first-(n%4)-buckets-get-one-
    // extra split written out as integer division. rn comes from
    // StatsOps.groupedRowNumber, not a window — partitionBy on the
    // 3-value flag would funnel the raw table through 3 tasks.
    "win_ntile_dist" -> ((s, d) => {
      val base = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          graft.ops.Cleaning.cents(col("l_extendedprice")).as("price_cents"))
        .withColumn("neg_price", -col("price_cents"))
      // r17 (guide §2.4/§6): the per-group size used to come from a
      // SECOND lineitem scan + aggregate broadcast-joined back; the
      // engine's pass 1 already collects it, so the WithCount variant
      // appends n in the same projection as rn — one scan, no join.
      graft.ops.StatsOps.groupedRowNumberWithCount(base, "l_returnflag",
          Seq("neg_price", "l_orderkey", "l_linenumber"), "rn", "n")
        .withColumn("quartile", expr(
          """CASE WHEN rn <= (n % 4) * (n div 4 + 1)
            |  THEN (rn - 1) div (n div 4 + 1) + 1
            |  ELSE (n % 4) + (rn - 1 - (n % 4) * (n div 4 + 1)) div (n div 4) + 1
            |END""".stripMargin.replaceAll("\n", " ")))
        .withColumn("pct_rank", expr(
          "CASE WHEN n = 1 THEN 0.0 ELSE CAST(rn - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE) END"))
        .withColumn("cume", expr("CAST(rn AS DOUBLE) / CAST(n AS DOUBLE)"))
        .filter(col("l_orderkey") % 100 === 0)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("price_cents"), col("quartile"), col("pct_rank"), col("cume"))
        .orderBy("l_returnflag", "price_cents", "l_orderkey", "l_linenumber")
    }),

    // §2.5 lag/lead along a line-number sequence within an order.
    "win_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey")
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"))
        .withColumn("prev_qty", lag(col("l_quantity"), 1).over(w))
        .withColumn("next_qty", lead(col("l_quantity"), 1).over(w))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    }),

    // §2.5 whole-partition frame: first_value / last_value / nth_value
    // over UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING (the "attach the
    // boundary rows to every row" shape; nth_value nulls on short
    // partitions).
    "win_first_last" -> ((s, d) => {
      val wf = Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"))
        .withColumn("first_qty", first(col("l_quantity")).over(wf))
        .withColumn("last_qty", last(col("l_quantity")).over(wf))
        .withColumn("second_qty", nth_value(col("l_quantity"), 2).over(wf))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    }),

    // Sketch percentile with an oracle-PROVEN rank bound, the same
    // discipline as agg_approx_distinct: the GK-sketch estimate itself is
    // partitioning-dependent, so the query emits the exact p50 plus a
    // boolean asserting the approx value's true rank sits within ±5% of
    // the median rank — DuckDB reproduces exact + literal TRUE. The
    // exact reference comes from the bounded-memory rank engine, not the
    // group-buffering `percentile` built-in (VERDICT r10).
    "agg_approx_percentile" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select("l_returnflag", "l_quantity")
      val ap = li.groupBy("l_returnflag")
        .agg(expr("approx_percentile(l_quantity, 0.5, 100)").as("ap"))
      val exact = graft.ops.StatsOps.groupedExactPercentiles(li,
        "l_returnflag", "l_quantity", Seq("p50_exact" -> 0.5),
        expectedGroups = Some(3L))
      li.join(broadcast(ap), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(expr("(sum(CASE WHEN l_quantity <= ap THEN 1 ELSE 0 END) * 1000) div count(1)")
          .as("rank_milli"))
        .join(broadcast(exact), "l_returnflag")
        .select(col("l_returnflag"), col("p50_exact"),
          col("rank_milli").between(450, 550).as("within_5pct_rank"))
        .orderBy("l_returnflag")
    }),

    // §2.5 running sum with an explicit rows frame.
    "win_running_sum" -> ((s, d) => {
      val w = Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), cents(col("l_extendedprice")).as("price_cents"))
        .withColumn("running_cents", sum(col("price_cents")).over(w))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    }),

    // §2.4 boolean + bitwise aggregates: bool_and/bool_or short-circuit
    // per partition (partial-combine friendly), bit_and/or/xor are the
    // associative fold over the key space — all five ship as built-in
    // hash-agg functions, one shuffle on the (tiny) status key.
    "agg_bool_bitwise" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(expr("bool_and(o_totalprice > 1000.0)").as("all_big"),
          expr("bool_or(o_custkey % 100 = 0)").as("any_century"),
          expr("bit_and(o_orderkey)").as("key_and"),
          expr("bit_or(o_orderkey)").as("key_or"),
          expr("bit_xor(o_orderkey)").as("key_xor"))
        .orderBy("o_orderstatus")),

    // §2.5 TIME-based range frame: trailing one-hour event count + value
    // sum per user, over exact epoch seconds (peers at the same second
    // share the frame, so no tie-break is needed for the frame itself).
    // One shuffle on user_id serves the window; at scale this is the
    // "rolling rate limit / trailing spend" query.
    "win_time_range_frame" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          expr("unix_micros(ts) div 1000000").as("sec"),
          cents(col("value")).as("v_cents"))
        .withColumn("n_last_hour", count(lit(1)).over(w))
        .withColumn("cents_last_hour", sum(col("v_cents")).over(w))
        .orderBy("user_id", "sec", "event_id")
    }),

    // §2.4 ROLLUP with GROUPING() disambiguation: when a rollup key is
    // itself NULLABLE, the subtotal rows' NULLs are indistinguishable
    // from data NULLs without grouping() — the correctness nuance every
    // reporting layer on top of rollup hits. Nulls synthesized on a
    // deterministic key slice; the explicit NULLS FIRST in the sort pins
    // cross-engine placement.
    "agg_rollup_grouping" -> ((s, d) =>
      Tables.orders(s, d)
        .select(when(col("o_orderkey") % 13 === 0, lit(null))
          .otherwise(col("o_orderstatus")).as("status"),
          col("o_orderpriority").as("prio"),
          cents(col("o_totalprice")).as("pc"))
        .rollup("status", "prio")
        .agg(expr("CAST(grouping(status) AS BIGINT)").as("g_status"),
          expr("CAST(grouping(prio) AS BIGINT)").as("g_prio"),
          count(lit(1)).as("n"), sum("pc").as("sum_cents"))
        .orderBy(col("g_status"), col("g_prio"),
          col("status").asc_nulls_first, col("prio").asc_nulls_first)),

    // §2.4 argmin/argmax aggregates (max_by/min_by ↔ DuckDB arg_max/
    // arg_min): "the customer of the latest order" without a self-join
    // back to the max — one hash agg instead of agg + join. Ordering keys
    // are made UNIQUE (o_orderkey, or cents⊕orderkey composite) because
    // ties would otherwise be partition-order nondeterminism.
    "agg_min_max_by" -> ((s, d) =>
      Tables.orders(s, d)
        .withColumn("pc", cents(col("o_totalprice")))
        .groupBy("o_orderstatus")
        .agg(expr("max_by(o_custkey, o_orderkey)").as("cust_of_last_order"),
          expr("min_by(o_custkey, o_orderkey)").as("cust_of_first_order"),
          expr("max_by(o_orderkey, pc * 10000000000L + o_orderkey)")
            .as("top_value_order"),
          max("pc").as("max_cents"))
        .orderBy("o_orderstatus")),

    // §2.5 DISTINCT count over a window — Spark (like most engines)
    // forbids COUNT(DISTINCT) in window frames. The classic workaround
    // (dense_rank along the value order + max over the whole partition)
    // is only scale-safe when the partition key is high-cardinality; on
    // this 3-value key it funnels the raw table through 3 tasks (the
    // stats_spearman ceiling, VERDICT r9). The scalable plan for a
    // whole-partition frame is the aggregate itself: countDistinct per
    // flag (partial-combined, cluster-wide parallel) broadcast-joined
    // back onto the filtered rows — identical output, no window.
    "win_count_distinct" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"))
      val nd = li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_distinct_parts"))
      li.filter(col("l_orderkey") % 500 === 0)
        .join(broadcast(nd), "l_returnflag")
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("n_distinct_parts"))
        .orderBy("l_returnflag", "l_orderkey", "l_linenumber", "l_partkey")
    }),

    // §2.5/§2.6 explicit NULL placement: Spark defaults to NULLS FIRST on
    // ASC, DuckDB to NULLS LAST — leaving it implicit is a silent
    // cross-engine divergence, so both the window order and the final
    // sort pin it. Nulls synthesized deterministically (qty > 45).
    "win_nulls_order" -> ((s, d) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("q").asc_nulls_last, col("l_orderkey").asc,
          col("l_linenumber").asc)
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
          when(col("l_quantity") > 45, lit(null)).otherwise(col("l_quantity")).as("q"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 2)
        .orderBy(col("q").desc_nulls_first, col("l_suppkey").asc,
          col("l_orderkey").asc, col("l_linenumber").asc)
    }),
  )

  val oracle: Map[String, String] = Map(
    "agg_count" ->
      "SELECT COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS n_cust FROM orders",
    "id_row_number" ->
      """SELECT row_number() OVER (ORDER BY c_custkey) AS id, c_custkey, c_name
        |FROM customer ORDER BY id""".stripMargin,
    "id_zip_index" ->
      """SELECT row_number() OVER (ORDER BY c_custkey) - 1 AS id, c_custkey, c_name
        |FROM customer ORDER BY id""".stripMargin,
    "agg_group_sum" ->
      """SELECT l_returnflag, l_linestatus, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        | SUM(CAST(round(l_extendedprice*100) AS BIGINT)) / 100.0 AS sum_price
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "agg_multi" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        | SUM(CAST(round(l_extendedprice*100) AS BIGINT)) / 100.0 AS sum_price,
        | MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        | SUM(CAST(round(l_extendedprice*100) AS BIGINT)) / (COUNT(*) * 100.0) AS avg_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // Full-table aggregate on purpose: matching it proves the engine's
    // partial-merge path is exact.
    "agg_incremental_merge" ->
      """SELECT l_returnflag AS flag,
        | CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
        | COUNT(*) AS n_rows,
        | CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) * 10 // COUNT(*) AS BIGINT)
        |   AS avg_qty_milli
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_salted" ->
      """SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        | COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_pivot" ->
      """SELECT o_orderpriority,
        | COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
        | COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
        | COUNT(*) FILTER (o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_distinct_count" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        | COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_approx_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts_exact,
        | TRUE AS within_10pct
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_rollup" ->
      """SELECT grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status,
        | coalesce(l_returnflag, 'ALL') AS flag, coalesce(l_linestatus, 'ALL') AS status,
        | COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, flag, status""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        | CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
        | coalesce(l_returnflag, 'ALL') AS flag, coalesce(l_linestatus, 'ALL') AS status,
        | COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY g_flag, g_status, flag, status""".stripMargin,
    "agg_percentile" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS p50,
        | quantile_cont(l_quantity, 0.9) AS p90, quantile_cont(l_quantity, 0.99) AS p99
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_percentile_highcard" ->
      """SELECT l_orderkey,
        | CAST(round(quantile_cont(l_quantity, 0.5) * 1000) AS BIGINT) AS p50_milli,
        | CAST(round(quantile_cont(l_quantity, 0.95) * 1000) AS BIGINT) AS p95_milli
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_cube" ->
      """SELECT grouping(o_orderstatus) AS g_status, grouping(o_orderpriority) AS g_prio,
        | coalesce(o_orderstatus, 'ALL') AS status, coalesce(o_orderpriority, 'ALL') AS prio,
        | COUNT(*) AS n, SUM(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY g_status, g_prio, status, prio""".stripMargin,
    "win_row_number" ->
      """SELECT * FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber,
        |    CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY CAST(round(l_extendedprice*100) AS BIGINT) DESC,
        |               l_orderkey ASC, l_linenumber ASC) AS rn
        |  FROM lineitem) t
        |WHERE rn <= 3 ORDER BY l_returnflag, rn""".stripMargin,
    "win_rank_dense" ->
      """SELECT * FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |    rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS rnk,
        |    dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS drnk
        |  FROM lineitem) t
        |WHERE drnk <= 2 ORDER BY l_returnflag, rnk, l_orderkey, l_linenumber""".stripMargin,
    "unpivot_melt" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, metric, value FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |  UNION ALL SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    'l_discount', l_discount FROM lineitem) t
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, metric""".stripMargin,
    "agg_collect" ->
      """SELECT l_returnflag,
        | string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
        | string_agg(DISTINCT CAST(CAST(trunc(l_quantity) AS INT) AS VARCHAR), ','
        |   ORDER BY CAST(trunc(l_quantity) AS INT)) AS quantities
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_conditional" ->
      """SELECT l_returnflag,
        | COUNT(*) FILTER (l_quantity > 45) AS n_big,
        | CAST(SUM(CASE WHEN l_discount >= 0.05 THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_discounted,
        | COUNT(*) FILTER (l_linestatus = 'F') AS n_f
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "win_range_frame" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        | COUNT(*) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
        |   RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_in_range
        |FROM lineitem
        |ORDER BY l_returnflag, l_quantity, l_orderkey, l_linenumber""".stripMargin,
    "win_ntile_dist" ->
      """SELECT * FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber,
        |    CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents,
        |    CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |    percent_rank() OVER w AS pct_rank,
        |    cume_dist() OVER w AS cume
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_returnflag
        |    ORDER BY CAST(round(l_extendedprice*100) AS BIGINT) DESC, l_orderkey, l_linenumber)) t
        |WHERE l_orderkey % 100 = 0
        |ORDER BY l_returnflag, price_cents, l_orderkey, l_linenumber""".stripMargin,
    "win_lag_lead" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
        | lag(l_quantity, 1) OVER (PARTITION BY l_orderkey
        |   ORDER BY l_linenumber, l_partkey, l_suppkey) AS prev_qty,
        | lead(l_quantity, 1) OVER (PARTITION BY l_orderkey
        |   ORDER BY l_linenumber, l_partkey, l_suppkey) AS next_qty
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,
    "win_first_last" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
        | first_value(l_quantity) OVER w AS first_qty,
        | last_value(l_quantity) OVER w AS last_qty,
        | nth_value(l_quantity, 2) OVER w AS second_qty
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_orderkey
        |  ORDER BY l_linenumber, l_partkey, l_suppkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,
    "agg_approx_percentile" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS p50_exact,
        | TRUE AS within_5pct_rank
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "win_running_sum" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        | CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents,
        | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) OVER (
        |   PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,
    "agg_rollup_grouping" ->
      """WITH o AS (SELECT CASE WHEN o_orderkey % 13 = 0 THEN NULL
        |                       ELSE o_orderstatus END AS status,
        |    o_orderpriority AS prio,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS pc
        |  FROM orders)
        |SELECT status, prio,
        |  CAST(GROUPING(status) AS BIGINT) AS g_status,
        |  CAST(GROUPING(prio) AS BIGINT) AS g_prio,
        |  COUNT(*) AS n, CAST(SUM(pc) AS BIGINT) AS sum_cents
        |FROM o GROUP BY ROLLUP(status, prio)
        |ORDER BY g_status, g_prio, status NULLS FIRST, prio NULLS FIRST""".stripMargin,
    "agg_min_max_by" ->
      """SELECT o_orderstatus,
        | arg_max(o_custkey, o_orderkey) AS cust_of_last_order,
        | arg_min(o_custkey, o_orderkey) AS cust_of_first_order,
        | arg_max(o_orderkey,
        |   CAST(round(o_totalprice*100) AS BIGINT) * 10000000000 + o_orderkey)
        |   AS top_value_order,
        | CAST(MAX(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS max_cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_bool_bitwise" ->
      """SELECT o_orderstatus,
        | bool_and(o_totalprice > 1000.0) AS all_big,
        | bool_or(o_custkey % 100 = 0) AS any_century,
        | bit_and(o_orderkey) AS key_and,
        | bit_or(o_orderkey) AS key_or,
        | bit_xor(o_orderkey) AS key_xor
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "win_time_range_frame" ->
      """SELECT user_id, event_id, sec, v_cents,
        | COUNT(*) OVER w AS n_last_hour,
        | CAST(SUM(v_cents) OVER w AS BIGINT) AS cents_last_hour
        |FROM (SELECT user_id, event_id, epoch_us(ts) // 1000000 AS sec,
        |        CAST(round(value*100) AS BIGINT) AS v_cents FROM events) t
        |WINDOW w AS (PARTITION BY user_id ORDER BY sec
        |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, sec, event_id""".stripMargin,
    "win_count_distinct" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_partkey,
        |  n_distinct_parts
        |FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_partkey,
        |    CAST(MAX(dr) OVER (PARTITION BY l_returnflag) AS BIGINT)
        |      AS n_distinct_parts
        |  FROM (
        |    SELECT l_returnflag, l_orderkey, l_linenumber, l_partkey,
        |      dense_rank() OVER (PARTITION BY l_returnflag
        |        ORDER BY l_partkey) AS dr
        |    FROM lineitem) a) b
        |WHERE l_orderkey % 500 = 0
        |ORDER BY l_returnflag, l_orderkey, l_linenumber, l_partkey""".stripMargin,
    "win_nulls_order" ->
      """SELECT * FROM (
        |  SELECT l_orderkey, l_linenumber, l_suppkey,
        |    CASE WHEN l_quantity > 45 THEN NULL ELSE l_quantity END AS q,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY (CASE WHEN l_quantity > 45 THEN NULL ELSE l_quantity END)
        |        ASC NULLS LAST, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem) t
        |WHERE rn <= 2
        |ORDER BY q DESC NULLS FIRST, l_suppkey, l_orderkey, l_linenumber""".stripMargin,
  )
}
