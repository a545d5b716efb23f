package graft.queries

import graft.Tables
import graft.ops.{Cleaning, Conform, Sinks}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructType}

/** Scans, projections, filters, joins, set ops, dedup, sorts — SURVEY.md
  * §2.1–§2.3, §2.6–§2.7 (reference cites in each query).
  */
object RelationalQueries extends QueryPack {

  // Per-JVM nonce so concurrent Verify + Bench runs don't overwrite each
  // other's scratch dirs (both write mode=Overwrite to fixed names).
  private val runNonce: String = java.util.UUID.randomUUID.toString.take(8)

  private def scratch(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-scratch-$runNonce/$name"

  // bucketed tables written once per (session, dir) — see join_bucketed
  private val bucketedTables = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String), (String, String)]

  val queries: Map[String, Q] = Map(
    // §7.1 flagship: the reference's code-lookup join heart
    // (pyspark.py:359-373) widened to a 4-table star join + agg. nation is
    // broadcast (25 rows); orders⋈customer and lineitem⋈orders are shuffle
    // hash joins on their keys — the layout a 1000-executor plan wants.
    "flagship" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .filter(col("l_returnflag").isin("A", "R") &&
          col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")))
        .groupBy(Cleaning.cleanString(col("n_name")).as("nation"),
          year(col("l_shipdate")).cast("long").as("ship_year"))
        .agg(
          (sum(Cleaning.cents(col("l_extendedprice")) *
            (lit(100L) - Cleaning.cents(col("l_discount")))) / 10000.0).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("nation", "ship_year")
    }),

    // §2.1 parquet scan with pruned projection + pushed filter.
    "scan_parquet" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") >= 48)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")),

    // §2.1 CSV scan (header, inferred schema) via round-trip of a driver
    // table (pyspark.py:177,195,265,277), conformed back to the declared
    // schema (inference gives int/string back for nation).
    "scan_csv" -> ((s, d) => {
      val n = Tables.nation(s, d)
      Conform.conformTo(Sinks.csvRoundTrip(s, n, scratch("nation_csv")), n.schema)
        .orderBy("n_nationkey")
    }),

    // §2.1 multiLine JSON scan (pyspark.py:217-219). JSON inference widens
    // ints to long — conformTo casts back, as the reference's schema-union
    // idiom does.
    "scan_json" -> ((s, d) => {
      val n = Tables.nation(s, d)
      Conform.conformTo(Sinks.jsonRoundTrip(s, n, scratch("nation_json")), n.schema)
        .orderBy("n_nationkey")
    }),

    // §2.1 ORC scan via round-trip (Spark's other native columnar format;
    // same vectorized reader + pushdown machinery as parquet).
    "scan_orc" -> ((s, d) => {
      val n = Tables.nation(s, d)
      Conform.conformTo(Sinks.orcRoundTrip(s, n, scratch("nation_orc")), n.schema)
        .orderBy("n_nationkey")
    }),

    // §2.1 JSON Lines scan via round-trip — the write-side JSON shape
    // (one doc per line, splittable), vs scan_json's multiLine array.
    "scan_jsonl" -> ((s, d) => {
      val n = Tables.nation(s, d)
      Conform.conformTo(Sinks.jsonlRoundTrip(s, n, scratch("nation_jsonl")), n.schema)
        .orderBy("n_nationkey")
    }),

    // §2.1 XML scan via round-trip — Spark 4's built-in XML source (the
    // merged spark-xml): one <row> element per record; conformTo recovers
    // the typed schema XML doesn't carry.
    "scan_xml" -> ((s, d) => {
      val n = Tables.nation(s, d)
      Conform.conformTo(Sinks.xmlRoundTrip(s, n, scratch("nation_xml")), n.schema)
        .orderBy("n_nationkey")
    }),

    // §2.1 line-oriented text scan: delimited lines out, text source back
    // (one `value` column per line), split + cast to reparse — the
    // raw-log ingest path.
    "scan_text" -> ((s, d) => {
      val n = Tables.nation(s, d)
      val lines = n.select(concat_ws("|",
        col("n_nationkey"), col("n_name"), col("n_regionkey")).as("value"))
      Sinks.textRoundTrip(s, lines, scratch("nation_text"))
        .select(split(col("value"), "\\|").as("p"))
        .select(col("p").getItem(0).cast("int").as("n_nationkey"),
          col("p").getItem(1).as("n_name"),
          col("p").getItem(2).cast("int").as("n_regionkey"))
        .orderBy("n_nationkey")
    }),

    // §2.1 empty-relation source + positional union-with-empty as a
    // cast-and-order operator (pyspark.py:159-167).
    "empty_relation_union" -> ((s, d) => {
      val n = Tables.nation(s, d)
      Conform.schemaCastUnion(s, n.select("n_regionkey", "n_name", "n_nationkey"),
        n.schema).orderBy("n_nationkey")
    }),

    // §2.1 partitioned parquet sink (pyspark.py:306-322) verified by
    // read-back: the partition column survives as directory layout and the
    // per-partition contents aggregate identically.
    "sink_partitioned_parquet" -> ((s, d) => {
      val out = scratch("lineitem_by_flag")
      Sinks.writePartitionedParquet(
        Tables.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"),
        out, Seq("l_returnflag"))
      s.read.parquet(out)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // §2.1 OBJECT-STORE round-trip: the reference's actual deployment
    // writes to S3 via the s3:// → s3a:// rewrite (pyspark.py:482-485,
    // README.md:6). The sandbox has no egress, so `fs.s3a.impl` points at
    // ObjectStoreFs — local bytes under object-store URIs with S3's
    // copy+delete rename semantics — and THIS write runs the real
    // DataFrameWriter commit protocol (staged task dirs renamed into
    // place = full data copies here, as on S3), then partition discovery
    // + read-back through s3a:// URIs end-to-end.
    "sink_object_store" -> ((s, d) => {
      graft.sources.ObjectStoreFs.install(s)
      val out = graft.sources.ObjectStoreFs.uri(scratch("orders_s3"))
      Sinks.writePartitionedParquet(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
          Cleaning.cents(col("o_totalprice")).as("cents")),
        out, Seq("o_orderstatus"))
      s.read.parquet(Sinks.readScheme(out.replaceFirst("s3a://", "s3://")))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
        .orderBy("o_orderstatus")
    }),

    // ZERO-RENAME object-store write (the S3A magic-committer shape,
    // VERDICT r10 item 7): the v1 committer above copies every data byte
    // TWICE on a copy-rename store (task + job rename — measured 2.00x in
    // ObjectStoreSpec); DirectObjectStoreCommitter writes part files at
    // their FINAL keys and job commit publishes only _SUCCESS, so the
    // same partitioned write copies ZERO bytes (also spec-asserted).
    // Read-back through s3a:// proves layout + content identical.
    "sink_object_store_direct" -> ((s, d) => {
      graft.sources.ObjectStoreFs.install(s)
      val out = graft.sources.ObjectStoreFs.uri(scratch("orders_s3_direct"))
      Sinks.writeDirectObjectStore(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
          Cleaning.cents(col("o_totalprice")).as("cents")),
        out, Seq("o_orderstatus"))
      s.read.parquet(out)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
        .orderBy("o_orderstatus")
    }),

    // §2.2 plain projection to schema order (pyspark.py:67,71,182,…).
    "project_select" -> ((s, d) =>
      Tables.customer(s, d).select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")),

    // §2.2 expression projection + rename (selectExpr, pyspark.py:64-72,193-196).
    "project_selectexpr" -> ((s, d) =>
      Tables.orders(s, d)
        .selectExpr("o_orderkey as okey", "upper(o_orderstatus) as status",
          "o_totalprice * 0.1 as tithe")
        .orderBy("okey")),

    // §2.2 withColumn / withColumnRenamed / drop / lit+cast
    // (pyspark.py:62,70,179,198-202,298) + header lowercasing (416-429).
    "project_mutate" -> ((s, d) => {
      val sup = Cleaning.lowerCaseHeaders(Tables.supplier(s, d))
      sup.withColumn("acct_cents", Cleaning.cents(col("s_acctbal")))
        .withColumn("source", lit("supplier").cast("string"))
        .withColumnRenamed("s_name", "supplier_name")
        .drop("s_nationkey", "s_acctbal")
        .orderBy("s_suppkey")
    }),

    // §2.2 double→int cast sweep (pyspark.py:228-230). Spark casts
    // double→int by truncation toward zero.
    "cast_double_to_int" -> ((s, d) =>
      Cleaning.castAll(
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice", "l_discount"),
        DoubleType, IntegerType)
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")),

    // §2.2 conjunctive predicate: length()==k && isin(set) — the reference's
    // row-alignment guard (pyspark.py:280-286).
    "filter_predicate" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(length(col("l_returnflag")) === 1 &&
          col("l_returnflag").isin("A", "R") && col("l_quantity") > 25)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_returnflag", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")),

    // §2.2/§2.6 deterministic limit: orderBy+limit plans as
    // TakeOrderedAndProject — no global sort materialization.
    "limit_n" -> ((s, d) =>
      Tables.orders(s, d).select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey").limit(100)),

    // §2.3 the code-table lookup join, exactly `_code_lookup`
    // (pyspark.py:359-373): inner equi-join against a broadcast dim,
    // dropping both key columns — a lookup-filter.
    "join_lookup_inner" -> ((s, d) =>
      Cleaning.codeLookup(
        Tables.customer(s, d),
        Tables.nation(s, d).selectExpr("n_nationkey", "n_name as nation_name"),
        "c_nationkey", "n_nationkey")
        .select("c_custkey", "c_name", "nation_name")
        .orderBy("c_custkey")),

    // §2.3 dim join sized by the optimizer: `part` grows linearly with scale
    // factor, so a hard broadcast() hint here would be a scale-killer (it is
    // multi-GB at sf100). No hint — AQE broadcasts while the dim is small and
    // falls back to a shuffled join when it isn't. The explicit-hint demo
    // lives on the genuinely bounded dims (nation, in `flagship`).
    "join_broadcast" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      l.join(p, l("l_partkey") === p("p_partkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("p_brand"),
          Cleaning.cents(col("p_retailprice")).as("retail_cents"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey")
    }),

    // §2.3 left-semi: orders that have at least one max-quantity line.
    "join_semi" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val big = Tables.lineitem(s, d).filter(col("l_quantity") >= 49)
      o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
    }),

    // §2.3 left-anti: customers with no orders (the quality-check shape the
    // reference's composite-key design implies, SURVEY §2.3).
    "join_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // §2.7 positional union (pyspark.py:75,297): PySpark 2.4 union-by-
    // position semantics.
    "setop_union" -> ((s, d) => {
      val c = Tables.customer(s, d).selectExpr("c_custkey as id", "'customer' as kind")
      val sup = Tables.supplier(s, d).selectExpr("s_suppkey as id", "'supplier' as kind")
      c.union(sup).orderBy("kind", "id")
    }),

    // §2.7 fill-missing-columns + unionByName (pyspark.py:388-413, with the
    // null-fill type bug fixed — fills are typed to the target column).
    "setop_union_by_name" -> ((s, d) => {
      val target = StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("acct_cents", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("kind", org.apache.spark.sql.types.StringType)))
      val c = Tables.customer(s, d).select(col("c_custkey").as("id"),
        Cleaning.cents(col("c_acctbal")).as("acct_cents"), lit("customer").as("kind"))
      val sup = Tables.supplier(s, d).select(col("s_suppkey").as("id"),
        col("s_name").as("name"), lit("supplier").as("kind"))
      Conform.conformTo(Conform.fillMissingColumns(c, target), target)
        .unionByName(Conform.conformTo(Conform.fillMissingColumns(sup, target), target))
        .orderBy("kind", "id")
    }),

    // §2.7 INTERSECT (distinct semantics on both engines).
    "setop_intersect" -> ((s, d) =>
      Tables.customer(s, d).selectExpr("c_nationkey as nationkey")
        .intersect(Tables.supplier(s, d).selectExpr("s_nationkey as nationkey"))
        .orderBy("nationkey")),

    // §2.7 EXCEPT (distinct): quantities never shipped at ≤10 units.
    "setop_except" -> ((s, d) =>
      Tables.lineitem(s, d).selectExpr("l_quantity as qty")
        .except(Tables.lineitem(s, d).filter(col("l_quantity") <= 10)
          .selectExpr("l_quantity as qty"))
        .orderBy("qty")),

    // §2.7 EXCEPT ALL — bag semantics: each quantity survives with
    // multiplicity max(0, count_left − count_right), so the deep-discount
    // lines subtract one occurrence each instead of erasing the value.
    // Spark plans this as a count-aggregate + generate (one shuffle on the
    // value), never a sort-merge of raw rows — the shape that scales.
    "setop_except_all" -> ((s, d) =>
      Tables.lineitem(s, d).selectExpr("l_quantity as qty")
        .exceptAll(Tables.lineitem(s, d).filter(col("l_discount") > 0.05)
          .selectExpr("l_quantity as qty"))
        .orderBy("qty")),

    // §2.7 INTERSECT ALL — bag semantics: multiplicity is
    // min(count_left, count_right) per value; same count-and-replicate
    // plan as EXCEPT ALL.
    "setop_intersect_all" -> ((s, d) =>
      Tables.lineitem(s, d).selectExpr("l_quantity as qty")
        .intersectAll(Tables.lineitem(s, d)
          .filter(col("l_returnflag") === "R")
          .selectExpr("l_quantity as qty"))
        .orderBy("qty")),

    // §2.4 whole-row dedup — the reference's post-scan `dropDuplicates()`
    // (pyspark.py:178,197,222,267,279,297): a hash aggregate on all columns.
    "dedup_distinct" -> ((s, d) =>
      Tables.lineitem(s, d).select("l_returnflag", "l_linestatus", "l_quantity")
        .dropDuplicates()
        .orderBy("l_returnflag", "l_linestatus", "l_quantity")),

    // §2.6 multi-key sort with mixed direction; orderkey makes it total.
    "sort_orderby" -> ((s, d) =>
      Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(col("o_orderstatus").asc, col("o_totalprice").desc, col("o_orderkey").asc)),

    // §2.6 top-k: planned as TakeOrderedAndProject (per-partition heaps, no
    // global sort) — the shape that survives 100× scale.
    "topk_orderby_limit" -> ((s, d) =>
      Tables.orders(s, d).select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(50)),

    // §2.11 the data-quality gate as a declared operator (pyspark.py:22-39,
    // run at 470-472): conform → gate (non-empty + exact column order) →
    // pass through. The gate's probe is limit(1).count() — O(first
    // non-empty partition), not a full scan.
    "quality_gate" -> ((s, d) => {
      val n = Tables.nation(s, d)
      Conform.qualityGate(Conform.conformTo(n, n.schema), n.schema, "nation")
        .orderBy("n_nationkey")
    }),

    // TPC-H Q1 (pricing summary): THE scan-heavy aggregation benchmark —
    // one filtered scan, one low-cardinality hash agg with map-side
    // partials, money in exact cents (avg as integer-div cents so the
    // result is partition-order-independent).
    "tpch_q1" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= "1998-09-02")
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("long").as("qty"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("price_c"),
          expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)").as("disc_c"),
          expr("CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)")
            .as("charge_c"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("qty").as("sum_qty"),
          sum("price_c").as("sum_base_cents"),
          sum("disc_c").as("sum_disc_cents"),
          sum("charge_c").as("sum_charge_cents"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty_milli", expr("sum_qty * 1000 div count_order"))
        .withColumn("avg_price_cents", expr("sum_base_cents div count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q18 (large-volume customers): aggregate-then-filter (HAVING)
    // feeding a join back to the dimension — the "find the whales" shape.
    // The HAVING runs BEFORE the customer join, so only qualifying orders
    // join; top-k by TakeOrderedAndProject.
    "tpch_q18" -> ((s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
        .filter(col("total_qty") > 250)
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      val c = Tables.customer(s, d).select("c_custkey", "c_name")
      big.join(o, big("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("total_cents"),
          col("total_qty"))
        .orderBy(col("total_cents").desc, col("o_orderkey").asc)
        .limit(20)
    }),

    // The third join strategy, explicitly: SHUFFLED HASH join — both
    // sides shuffle on the key, the smaller builds a hash map per
    // partition, NO sort of either side (the win over SMJ when the build
    // side fits in executor memory but is too big to broadcast). The hint
    // pins the strategy; PlanShapeSpec pins the plan.
    "join_shuffle_hash" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_quantity") > 10)
        .select("l_orderkey", "l_quantity")
      val o = Tables.orders(s, d).select("o_orderkey", "o_orderstatus")
        .hint("shuffle_hash")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
        .orderBy("o_orderstatus")
    }),

    // BLOOM-FILTER SEMI-JOIN REDUCTION — the runtime-filter pattern that
    // makes selective dim⋈fact joins cheap at 100 TB: build a bloom filter
    // over the (filtered) dim keys, prune the fact side with
    // `might_contain` BEFORE its shuffle, then run the exact join. The
    // bloom's false positives survive the prefilter but are eliminated by
    // the equi-join, so the result is EXACTLY the plain join (the oracle
    // is the plain SQL join) while the fact exchange carries ~sel× fewer
    // rows. The collected artifact is O(bloom bits) — a few KB, same
    // driver-side cost Spark's own InjectRuntimeFilter pays — never
    // O(data). PlanShapeSpec pins might_contain below the join.
    "join_bloom_prefilter" -> ((s, d) => {
      import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
      val dim = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .select("c_custkey", "c_mktsegment")
      val bf = dim.agg(toColumn(new BloomFilterAggregate(
          toExpression(col("c_custkey")), Literal(20000L), Literal(200000L))
          .toAggregateExpression()).as("bf"))
        .head().getAs[Array[Byte]]("bf")
      val pruned = Tables.orders(s, d)
        .filter(toColumn(BloomFilterMightContain(
          toExpression(lit(bf)), toExpression(col("o_custkey")))))
        .select("o_custkey", "o_totalprice")
      pruned.join(dim, pruned("o_custkey") === dim("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("sum_cents"))
        .orderBy("c_mktsegment")
    }),

    // TPC-H Q3 (shipping priority), adapted to this schema: segment-
    // filtered customers ⋈ date-bounded orders ⋈ lineitem, revenue in
    // exact cents, top 10 by revenue. Two fact shuffles on the join keys;
    // the final top-k is TakeOrderedAndProject, not a global sort.
    "tpch_q3" -> ((s, d) => {
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val o = Tables.orders(s, d).filter(col("o_orderdate") < "1998-01-01")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val l = Tables.lineitem(s, d).filter(col("l_shipdate") > "1996-06-30")
        .select(col("l_orderkey"),
          expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
            .as("rev_cents"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"))
        .agg(sum("rev_cents").as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // TPC-H Q5 (local supplier volume), adapted: six-way join where the
    // customer and the supplier must share a nation, revenue per nation in
    // one region. Nation/region are broadcast dims; the two fact tables
    // shuffle once each on their join keys.
    "tpch_q5" -> ((s, d) => {
      val asia = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val n = Tables.nation(s, d).join(broadcast(asia),
        col("n_regionkey") === col("r_regionkey"))
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1998-01-01")
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
            .as("rev_cents"))
      val sup = Tables.supplier(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum("rev_cents").as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("n_name").asc)
    }),

    // AS-OF join, the scale-safe formulation: instead of a per-row
    // backwards range probe (quadratic, or an interval index Spark lacks),
    // sort each user's events once and carry the most recent error forward
    // with last(..., ignoreNulls) over an unbounded-preceding frame — one
    // shuffle + one sort per user partition, any history length. Each
    // click row reads off the error it would asof-match.
    "join_asof" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, d).select("event_id", "ts", "user_id", "event_type")
      // event_id tie-breaker: with a ROWS frame, two events sharing
      // (user_id, ts) would otherwise order nondeterministically and flake
      // the oracle hash-compare
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("asof_error_id",
          last(when(col("event_type") === "error", col("event_id")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("asof_error_id"))
        .orderBy("click_id")
    }),

    // The SAME as-of semantics through the custom physical operator
    // (graft.plans.AsOfJoinExec): one co-partitioned sort-merge pass,
    // no union, no window state. The oracle is identical to join_asof —
    // the operator must be indistinguishable from the composed form.
    "join_asof_exec" -> ((s, d) => {
      val e = Tables.events(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      val errors = e.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
          col("ts").as("err_ts"))
      graft.plans.AsOfJoinOps.joinBackward(clicks, errors,
          leftKey = "user_id", leftTs = "ts", leftTie = "click_id",
          rightKey = "err_user", rightTs = "err_ts", rightTie = "err_id")
        .select(col("click_id"), col("user_id"), col("err_id").as("asof_error_id"))
        .orderBy("click_id")
    }),

    // Corrupt-record-tolerant ingest: PERMISSIVE JSON parsing routes
    // malformed lines into _corrupt_record instead of failing the scan —
    // at 100 TB a feed WILL contain broken lines and the job must count
    // them, not die. The fixture is written literally inside the query
    // (2 good lines, 2 broken ones) so the oracle is a constant; the
    // capability under test is the engine's quarantine column.
    "scan_json_corrupt" -> ((s, d) => {
      val dir = scratch("corrupt_jsonl")
      val f = new java.io.File(dir); f.mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/data.jsonl"),
        """{"id": 1, "v": "ok"}
          |{"id": 2 BROKEN
          |{"id": 3, "v": "ok"}
          |not json at all
          |""".stripMargin)
      val schema = "id BIGINT, v STRING, _corrupt_record STRING"
      s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(dir)
        .select(
          count(when(col("_corrupt_record").isNull, 1)).as("n_good"),
          count(col("_corrupt_record")).as("n_corrupt"),
          sum(when(col("_corrupt_record").isNull, col("id"))).as("sum_good_ids"))
    }),

    // TOLERANCE-bounded as-of through the same custom operator: the last
    // error before each click, but only if it happened within the last
    // hour — the "last reading, if fresh" contract every sensor/session
    // attribution uses. Staleness is checked inside the merge (no
    // post-join filter recomputation); the oracle carries the matched
    // error's timestamp through the window form and nulls stale matches.
    "join_asof_tol_exec" -> ((s, d) => {
      val e = Tables.events(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      val errors = e.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
          col("ts").as("err_ts"))
      graft.plans.AsOfJoinOps.joinBackward(clicks, errors,
          leftKey = "user_id", leftTs = "ts", leftTie = "click_id",
          rightKey = "err_user", rightTs = "err_ts", rightTie = "err_id",
          tolerance = Some(3600000000L)) // 1 hour in micros
        .select(col("click_id"), col("user_id"),
          col("err_id").as("recent_error_id"))
        .orderBy("click_id")
    }),

    // §2.1 malformed-CSV tolerance, the CSV twin of scan_json_corrupt:
    // PERMISSIVE mode parks unparseable lines in the corrupt-record
    // column instead of failing the 100 TB job (Spark 4 ANSI mode would
    // otherwise throw on the bad cast). Counts + a clean-rows checksum.
    "scan_csv_corrupt" -> ((s, d) => {
      val dir = scratch("corrupt_csv")
      val f = new java.io.File(dir); f.mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/data.csv"),
        """id,v
          |1,ok
          |oops,this id is not a number
          |3,ok
          |4,ok
          |""".stripMargin)
      val schema = "id BIGINT, v STRING, _corrupt_record STRING"
      s.read.schema(schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(dir)
        .select(
          count(when(col("_corrupt_record").isNull, 1)).as("n_good"),
          count(col("_corrupt_record")).as("n_corrupt"),
          sum(when(col("_corrupt_record").isNull, col("id"))).as("sum_good_ids"))
    }),

    // FORWARD direction through the same custom operator: for each click,
    // the FIRST error at-or-after it — the "next failure after this
    // action" attribution query. Same one-pass co-partitioned merge; the
    // oracle is the window composition scanned DESCENDING.
    "join_asof_fwd_exec" -> ((s, d) => {
      val e = Tables.events(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      val errors = e.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
          col("ts").as("err_ts"))
      graft.plans.AsOfJoinOps.joinForward(clicks, errors,
          leftKey = "user_id", leftTs = "ts", leftTie = "click_id",
          rightKey = "err_user", rightTs = "err_ts", rightTie = "err_id")
        .select(col("click_id"), col("user_id"), col("err_id").as("next_error_id"))
        .orderBy("click_id")
    }),

    // The custom operator's THIRD direction: nearest-in-either-direction
    // as-of (the "closest sensor reading" contract). Still one merge pass
    // with O(1) state — per left row the only candidates that can win are
    // the backward best and the single buffered forward row; equidistant
    // pairs resolve backward. The oracle ranks ALL candidate pairs per
    // click by (distance, backward-first, direction-correct tie) and
    // keeps rank 1, independently reproducing the operator's choice.
    "join_asof_nearest_exec" -> ((s, d) => {
      val e = Tables.events(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      val errors = e.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
          col("ts").as("err_ts"))
      graft.plans.AsOfJoinOps.joinNearest(clicks, errors,
          leftKey = "user_id", leftTs = "ts", leftTie = "click_id",
          rightKey = "err_user", rightTs = "err_ts", rightTie = "err_id")
        .select(col("click_id"), col("user_id"),
          col("err_id").as("nearest_error_id"))
        .orderBy("click_id")
    }),

    // Bucketed co-located join: both sides written bucketed by the join
    // key (bucketBy + saveAsTable), then joined WITHOUT a shuffle — the
    // executed plan has no Exchange above either scan. This is the
    // pre-partitioning answer for fact tables joined on the same key
    // every day: pay the shuffle once at write time, never at read time.
    "join_bucketed" -> ((s, d) => {
      // Table names carry the run nonce (a concurrent Verify + Bench pair
      // otherwise races on DROP TABLE + dir delete while the other JVM
      // reads — same fix as the scratch dirs above) plus a dir
      // discriminator, and the WRITE runs once per (session, dir): the
      // whole point of bucketing is paying the shuffle at write time once,
      // so re-running the query (bench reps) must not re-pay it.
      val (liT, ordT) = bucketedTables.getOrElseUpdate((s, d), {
        val tag = s"${runNonce}_${(d.hashCode & 0xffffff).toHexString}"
        val (liT, ordT) = (s"graft_li_bkt_$tag", s"graft_ord_bkt_$tag")
        Sinks.writeBucketed(Tables.lineitem(s, d)
          .select("l_orderkey", "l_quantity", "l_returnflag"),
          liT, "l_orderkey", 8)
        Sinks.writeBucketed(Tables.orders(s, d)
          .select("o_orderkey", "o_orderstatus"),
          ordT, "o_orderkey", 8)
        (liT, ordT)
      })
      // merge hint: at test scale AQE would broadcast the small side and
      // bypass the bucket demo; at fact-table scale SMJ is the plan
      // anyway — and with matching buckets it needs NO exchange.
      val li = s.table(liT).hint("merge")
      val o = s.table(ordT)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
        .orderBy("o_orderstatus")
    }),

    // Sorted data layout for scan pruning: range-partition + in-partition
    // sort on the filter column before writing, so every parquet row
    // group covers a narrow value band and a point/range filter skips
    // most of the file via min/max stats. The partitioned sink prunes by
    // directory; this prunes WITHIN files — the two compose at 100 TB.
    "sink_sorted_layout" -> ((s, d) => {
      val out = scratch("lineitem_sorted")
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .repartitionByRange(8, col("l_quantity"))
        .sortWithinPartitions("l_quantity")
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .filter(col("l_quantity") >= 45)
        .agg(count(lit(1)).as("n"),
          sum(Cleaning.cents(col("l_extendedprice"))).as("price_cents"))
    }),

    // Range-predicate join done the scale-safe way: the equi key
    // (orderkey) carries the join — SortMergeJoin on the key — and the
    // date-range condition is a residual filter on matched pairs, never a
    // nested-loop over unmatched rows. (A pure range join with no equi
    // component gets bucketized first; pairing range with a key is the
    // pattern.)
    "join_range_pred" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey") &&
          l("l_shipdate") >= o("o_orderdate") &&
          l("l_shipdate") <= date_add(o("o_orderdate"), 90))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_within_90d"))
        .orderBy("l_returnflag")
    }),

    // Skew-safe join (salting): ~25% of fact rows are remapped onto ONE
    // hot key, the 100-TB incident shape — a plain shuffle join would send
    // every hot row to a single reducer. The fix replicates each dim row
    // across 16 salt values and spreads the fact side by pmod(orderkey,16),
    // so the hot key's rows land on 16 reducers; the join stays a pure
    // equi-join on (key, salt) and the result is identical to the unsalted
    // join the oracle runs. shuffle_hash hint: at test scale AQE would
    // broadcast the 16×dim and moot the demo — salting exists precisely
    // for dims too big to broadcast.
    "join_salted" -> ((s, d) => {
      val f = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity"),
          when(pmod(col("l_suppkey"), lit(4)) === 0, lit(1))
            .otherwise(col("l_suppkey")).as("jk"),
          pmod(col("l_orderkey"), lit(16)).as("fsalt"))
      val dim = Tables.supplier(s, d)
        .select(col("s_suppkey"), Cleaning.cents(col("s_acctbal")).as("acct_cents"))
        .withColumn("dsalt", explode(sequence(lit(0), lit(15))))
        .hint("shuffle_hash")
      f.join(dim, f("jk") === dim("s_suppkey") && f("fsalt") === dim("dsalt"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(col("acct_cents")).as("sum_acct_cents"))
        .orderBy("l_returnflag")
    }),
  )

  val oracle: Map[String, String] = Map(
    "flagship" ->
      """SELECT lower(replace(n_name, ' ', '_')) AS nation, year(l_shipdate) AS ship_year,
        | SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0 AS revenue,
        | COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag IN ('A','R') AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "scan_parquet" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_returnflag
        |FROM lineitem WHERE l_quantity >= 48
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,
    "scan_csv" -> "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "scan_orc" -> "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "scan_xml" -> "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "scan_text" -> "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "scan_jsonl" -> "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "scan_json" -> "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "empty_relation_union" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "sink_partitioned_parquet" ->
      """SELECT l_returnflag, COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "sink_object_store" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "sink_object_store_direct" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "project_select" ->
      "SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey",
    "project_selectexpr" ->
      """SELECT o_orderkey AS okey, upper(o_orderstatus) AS status,
        | o_totalprice * 0.1 AS tithe FROM orders ORDER BY okey""".stripMargin,
    "project_mutate" ->
      """SELECT s_suppkey, s_name AS supplier_name,
        | CAST(round(s_acctbal*100) AS BIGINT) AS acct_cents, 'supplier' AS source
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "cast_double_to_int" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        | CAST(trunc(l_quantity) AS INT) AS l_quantity,
        | CAST(trunc(l_extendedprice) AS INT) AS l_extendedprice,
        | CAST(trunc(l_discount) AS INT) AS l_discount
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,
    "filter_predicate" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_returnflag, l_quantity
        |FROM lineitem
        |WHERE length(l_returnflag) = 1 AND l_returnflag IN ('A','R') AND l_quantity > 25
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,
    "limit_n" ->
      "SELECT o_orderkey, o_orderstatus FROM orders ORDER BY o_orderkey LIMIT 100",
    "join_lookup_inner" ->
      """SELECT c_custkey, c_name, n_name AS nation_name FROM customer
        |JOIN nation ON c_nationkey = n_nationkey ORDER BY c_custkey""".stripMargin,
    "join_broadcast" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, p_brand,
        | CAST(round(p_retailprice*100) AS BIGINT) AS retail_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin,
    "join_semi" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "setop_union" ->
      """SELECT c_custkey AS id, 'customer' AS kind FROM customer
        |UNION ALL SELECT s_suppkey AS id, 'supplier' AS kind FROM supplier
        |ORDER BY kind, id""".stripMargin,
    "setop_union_by_name" ->
      """SELECT c_custkey AS id, CAST(NULL AS VARCHAR) AS name,
        |  CAST(round(c_acctbal*100) AS BIGINT) AS acct_cents, 'customer' AS kind FROM customer
        |UNION ALL
        |SELECT s_suppkey AS id, s_name AS name, CAST(NULL AS BIGINT) AS acct_cents,
        |  'supplier' AS kind FROM supplier
        |ORDER BY kind, id""".stripMargin,
    "setop_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "setop_except" ->
      """SELECT l_quantity AS qty FROM lineitem
        |EXCEPT SELECT l_quantity AS qty FROM lineitem WHERE l_quantity <= 10
        |ORDER BY qty""".stripMargin,
    "setop_except_all" ->
      """SELECT l_quantity AS qty FROM lineitem
        |EXCEPT ALL SELECT l_quantity AS qty FROM lineitem WHERE l_discount > 0.05
        |ORDER BY qty""".stripMargin,
    "setop_intersect_all" ->
      """SELECT l_quantity AS qty FROM lineitem
        |INTERSECT ALL SELECT l_quantity AS qty FROM lineitem WHERE l_returnflag = 'R'
        |ORDER BY qty""".stripMargin,
    "dedup_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus, l_quantity FROM lineitem
        |ORDER BY l_returnflag, l_linestatus, l_quantity""".stripMargin,
    "sort_orderby" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC""".stripMargin,
    "topk_orderby_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50""".stripMargin,
    "quality_gate" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "join_bucketed" ->
      """SELECT o_orderstatus, COUNT(*) AS n_lines,
        | CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_disc_cents,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_charge_cents,
        |  COUNT(*) AS count_order,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) * 1000 // COUNT(*) AS BIGINT) AS avg_qty_milli,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) // COUNT(*) AS BIGINT)
        |    AS avg_price_cents
        |FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "tpch_q18" ->
      """WITH big AS (SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS BIGINT)) > 250)
        |SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents, total_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_cents DESC, o_orderkey ASC LIMIT 20""".stripMargin,
    "join_shuffle_hash" ->
      """SELECT o_orderstatus, COUNT(*) AS n_lines,
        | CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_quantity > 10
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "join_bloom_prefilter" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_acctbal > 9000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "tpch_q3" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_orderpriority,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < DATE '1998-01-01'
        |  AND l_shipdate > DATE '1996-06-30'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_cents DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "tpch_q5" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
        |GROUP BY 1 ORDER BY revenue_cents DESC, n_name ASC""".stripMargin,
    // identical oracle to join_asof: the custom operator must be
    // indistinguishable from the window composition
    "join_asof_exec" ->
      """SELECT event_id AS click_id, user_id, asof_error_id FROM (
        |  SELECT event_id, user_id, event_type,
        |    last_value(CASE WHEN event_type = 'error' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS asof_error_id
        |  FROM events) t
        |WHERE event_type = 'click' ORDER BY click_id""".stripMargin,
    // same union-window trick, with the matched error's timestamp carried
    // alongside its id so staleness can null the pair
    "join_asof_tol_exec" ->
      """SELECT click_id, user_id,
        |  CASE WHEN asof_err_us IS NOT NULL
        |         AND click_us - asof_err_us <= 3600000000
        |       THEN asof_error_id END AS recent_error_id
        |FROM (
        |  SELECT event_id AS click_id, user_id, event_type,
        |    epoch_us(ts) AS click_us,
        |    last_value(CASE WHEN event_type = 'error' THEN event_id END
        |      IGNORE NULLS) OVER w AS asof_error_id,
        |    last_value(CASE WHEN event_type = 'error' THEN epoch_us(ts) END
        |      IGNORE NULLS) OVER w AS asof_err_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING)) t
        |WHERE event_type = 'click' ORDER BY click_id""".stripMargin,
    // the fixture is literal inside the query, so the oracle is the
    // expected quarantine accounting as constants
    "scan_json_corrupt" ->
      """SELECT CAST(2 AS BIGINT) AS n_good, CAST(2 AS BIGINT) AS n_corrupt,
        |  CAST(4 AS BIGINT) AS sum_good_ids""".stripMargin,
    "scan_csv_corrupt" ->
      """SELECT CAST(3 AS BIGINT) AS n_good, CAST(1 AS BIGINT) AS n_corrupt,
        |  CAST(8 AS BIGINT) AS sum_good_ids""".stripMargin,
    // nearest = rank every same-user (click, error) pair by absolute
    // distance, backward side preferred on ties, and the direction's own
    // tie-column order within a side (max id backward, min id forward)
    "join_asof_nearest_exec" ->
      """WITH clicks AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS c_us
        |  FROM events WHERE event_type = 'click'),
        |errs AS (SELECT event_id AS err_id, user_id, epoch_us(ts) AS e_us
        |  FROM events WHERE event_type = 'error'),
        |cand AS (
        |  SELECT c.click_id, e.err_id,
        |    row_number() OVER (PARTITION BY c.click_id ORDER BY
        |      abs(c.c_us - e.e_us) ASC,
        |      (e.e_us < c.c_us OR (e.e_us = c.c_us AND e.err_id <= c.click_id)) DESC,
        |      CASE WHEN e.e_us < c.c_us OR (e.e_us = c.c_us AND e.err_id <= c.click_id)
        |           THEN -e.err_id ELSE e.err_id END ASC) AS rn
        |  FROM clicks c JOIN errs e USING (user_id))
        |SELECT c.click_id, c.user_id, cand.err_id AS nearest_error_id
        |FROM clicks c LEFT JOIN (SELECT click_id, err_id FROM cand WHERE rn = 1) cand
        |  USING (click_id)
        |ORDER BY c.click_id""".stripMargin,
    // forward = the same union-window trick scanned descending: at a
    // click row, the errors already seen in (ts DESC, id DESC) order are
    // exactly those at-or-after it, and last_value picks the nearest
    "join_asof_fwd_exec" ->
      """SELECT event_id AS click_id, user_id, next_error_id FROM (
        |  SELECT event_id, user_id, event_type,
        |    last_value(CASE WHEN event_type = 'error' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        |        ROWS UNBOUNDED PRECEDING) AS next_error_id
        |  FROM events) t
        |WHERE event_type = 'click' ORDER BY click_id""".stripMargin,
    "join_asof" ->
      """SELECT event_id AS click_id, user_id, asof_error_id FROM (
        |  SELECT event_id, user_id, event_type,
        |    last_value(CASE WHEN event_type = 'error' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS asof_error_id
        |  FROM events) t
        |WHERE event_type = 'click' ORDER BY click_id""".stripMargin,
    "sink_sorted_layout" ->
      """SELECT COUNT(*) AS n,
        | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_cents
        |FROM lineitem WHERE l_quantity >= 45""".stripMargin,
    "join_range_pred" ->
      """SELECT l_returnflag, COUNT(*) AS n_within_90d
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the ORACLE is the plain unsalted join — salting must be invisible
    // in the result
    "join_salted" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        | CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        | CAST(SUM(acct_cents) AS BIGINT) AS sum_acct_cents
        |FROM (SELECT l_returnflag, l_quantity,
        |        CASE WHEN l_suppkey % 4 = 0 THEN 1 ELSE l_suppkey END AS jk
        |      FROM lineitem) f
        |JOIN (SELECT s_suppkey, CAST(round(s_acctbal*100) AS BIGINT) AS acct_cents
        |      FROM supplier) s
        |  ON jk = s_suppkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
