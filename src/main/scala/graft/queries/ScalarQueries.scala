package graft.queries

import graft.Tables
import graft.ops.Cleaning
import org.apache.spark.sql.functions._

/** Scalar-function queries — SURVEY.md §2.8/§2.10: the reference's string /
  * date / array / map / JSON vocabulary, each wired to a DuckDB oracle.
  *
  * Everything here is a plain Catalyst expression inside whole-stage codegen;
  * the two reference Python UDFs (`_abbreviate_state` pyspark.py:325-346,
  * `_convert_to_date` pyspark.py:376-385) appear as their UDF-free rewrites
  * (`map_literal_lookup`, `date_sas_epoch`) — per-row expressions with no
  * shuffle, no broadcast, no Python worker: the shape that scales to 100 TB
  * by doing nothing but map work.
  */
object ScalarQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // §2.8 `_clean_string_column` (pyspark.py:349-356): lower + spaces→'_'.
    "str_clean" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          Cleaning.cleanString(col("p_name")).as("name_clean"),
          Cleaning.cleanString(col("p_brand")).as("brand_clean"))
        .orderBy("p_partkey")),

    // §2.8 the reference's split-and-index idiom (pyspark.py:269-272):
    // split once, project elements, drop the array.
    "str_split_extract" -> ((s, d) =>
      Tables.part(s, d)
        .withColumn("parts", split(col("p_name"), " "))
        .select(col("p_partkey"),
          col("parts").getItem(0).as("word0"),
          col("parts").getItem(1).as("word1"))
        .orderBy("p_partkey")),

    // §2.8 array ops on a split result: getItem + size + array_contains.
    "arr_split_getitem" -> ((s, d) =>
      Tables.orders(s, d)
        .withColumn("parts", split(col("o_orderpriority"), "-"))
        .select(col("o_orderkey"),
          col("parts").getItem(0).cast("int").as("prio_num"),
          col("parts").getItem(1).as("prio_label"),
          size(col("parts")).cast("long").as("n_parts"),
          array_contains(col("parts"), "URGENT").as("is_urgent"))
        .orderBy("o_orderkey")),

    // §2.8 date-part expansion (pyspark.py:198-202,245-248,290-294):
    // numeric day-of-week (1=Sunday, Spark) + the reference's lowercase
    // "mon".."sun" abbreviation (date_format 'E' + clean_string).
    "date_parts_expand" -> ((s, d) =>
      Cleaning.datePartsExpand(
        Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
        "o_orderdate", "order")
        .withColumn("order_weekday_abbrev", Cleaning.weekdayAbbrev(col("o_orderdate")))
        .drop("o_orderdate")
        .orderBy("o_orderkey")),

    // §2.8/§2.10 SAS epoch date (`_convert_to_date`, pyspark.py:376-385):
    // days since 1960-01-01 where BOTH null and 0 land on 1960-01-01
    // (README.md:102-103). Days synthesized deterministically from o_orderkey
    // so the null and zero quirk paths are exercised.
    "date_sas_epoch" -> ((s, d) =>
      Tables.orders(s, d)
        .withColumn("sas_days",
          when(col("o_orderkey") % 97 === 0, lit(null).cast("int"))
            .when(col("o_orderkey") % 89 === 0, lit(0))
            .otherwise((col("o_orderkey") % 20000).cast("int")))
        // Emitted as an ISO string: a DATE column round-trips to a Python
        // `object` dtype on the compare side, where the oracle's DATE is
        // datetime64 — stringly output keeps the hash comparable.
        .select(col("o_orderkey"), col("sas_days"),
          date_format(Cleaning.sasEpochDate(col("sas_days")), "yyyy-MM-dd").as("sas_date"))
        .orderBy("o_orderkey")),

    // §2.8 arithmetic + round + abs + floor/ceil + mod; money through exact
    // cents so the bigint sum/compare is partition-order independent.
    "math_arith" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax")) * 100).cast("long").as("charge_cents"),
          abs(col("l_quantity") - 25).as("qty_dev"),
          floor(col("l_discount") * 100).cast("long").as("disc_floor"),
          ceil(col("l_tax") * 100).cast("long").as("tax_ceil"),
          (col("l_orderkey") % 7).as("okey_mod7"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")),

    // §2.8/§2.10 the `_abbreviate_state` UDF rewrite: 51-entry map literal,
    // leading-space strip, lowercase, pass-through-on-miss, null→null — all
    // quirk paths synthesized deterministically from s_suppkey.
    "map_literal_lookup" -> ((s, d) =>
      Tables.supplier(s, d)
        .withColumn("state_raw",
          when(col("s_suppkey") % 11 === 0, lit(null).cast("string"))
            .when(col("s_suppkey") % 3 === 0, lit(" California"))
            .when(col("s_suppkey") % 3 === 1, lit("texas"))
            .otherwise(col("s_name")))
        .select(col("s_suppkey"), col("state_raw"),
          Cleaning.abbreviateState(col("state_raw")).as("state_abbrev"))
        .orderBy("s_suppkey")),

    // §2.8 JSON scalar extraction on the events props column.
    "json_get_field" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("int").as("k_int"))
        .orderBy("event_id")),

    // §2.8 schema-full JSON parsing (from_json with a declared struct —
    // parses once per row instead of once per extracted path).
    "json_from_schema" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("parsed", from_json(col("props"), lit("k INT")))
        .select(col("event_id"), col("parsed.k").as("k"))
        .orderBy("event_id")),

    // ANSI-safe dirty-data handling: Spark 4 runs ANSI mode, where a
    // single malformed row would kill a 100 TB job mid-flight — the try_*
    // family converts those errors to nulls row-locally. Three shapes:
    // try_divide (zero divisor → null, never Inf/error), try_cast over a
    // deliberately sometimes-numeric slice of the JSON payload (parse
    // failure → null), and try_element_at past the end of a split array
    // (out-of-bounds → null). Cost note (r16): Spark's TRY eval mode
    // codegens the ANSI kernel inside try/catch, so every FAILING row
    // paid a thrown exception with query-context capture (~10 µs/row —
    // 3.14 s vs the guarded twin's 0.44 s at sf0.1 when the miss rate is
    // ~100%). graft.plans.TryExprRewrite now rewrites the provably-
    // equivalent TRY forms to Spark's non-throwing LEGACY kernels at
    // optimization time (fuzz-pinned in TryRewriteSpec), so this query
    // runs exception-free at any failure rate; the twin pair pins the
    // residual difference (~1.1× — the rewrite beats even the RLIKE
    // guard, whose regex costs more than contains + legacy parse).
    "clean_try_ops" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          graft.ops.Cleaning.cents(col("value")).as("cents"),
          (col("event_id") % 5).as("k"),
          col("props"), col("event_type"))
        .select(col("event_id"),
          expr("CAST(round(try_divide(cents * 1000, k)) AS BIGINT)").as("div_milli"),
          expr("try_cast(substring(props, 8, 2) AS INT)").as("parsed_k"),
          expr("try_element_at(split(event_type, 'i'), 3)").as("third_piece"))
        .orderBy("event_id")),

    // The hand-guarded twin of clean_try_ops: identical output, but
    // every try_* wrapper replaced by an explicit guard (CASE on the
    // divisor, RLIKE before the cast, size() before the subscript).
    // Historically this pinned the try_* exception tax (r7: 2.82 s vs
    // 1.03 s); since r16's TryExprRewrite the try_* forms execute as
    // non-throwing LEGACY kernels and the pair instead pins that the
    // rewrite stays at parity or better (the RLIKE guard now costs MORE
    // than the rewritten cast). Outputs verified identical row-for-row
    // on this data.
    "clean_guarded_fast" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          graft.ops.Cleaning.cents(col("value")).as("cents"),
          (col("event_id") % 5).as("k"),
          col("props"), col("event_type"))
        .select(col("event_id"),
          expr("""CASE WHEN k = 0 THEN NULL
                 |ELSE CAST(round(cents * 1000 / k) AS BIGINT) END""".stripMargin)
            .as("div_milli"),
          expr("""CASE WHEN substring(props, 8, 2) RLIKE '^[0-9]+$'
                 |THEN CAST(substring(props, 8, 2) AS INT) END""".stripMargin)
            .as("parsed_k"),
          expr("""CASE WHEN size(split(event_type, 'i')) >= 3
                 |THEN split(event_type, 'i')[2] END""".stripMargin)
            .as("third_piece"))
        .orderBy("event_id")),

    // Spark 4 VARIANT path: parse once into the binary semi-structured
    // type, then typed path extraction — the modern engine shape for
    // schema-on-read JSON (no per-path re-parse, no full struct schema).
    "json_variant_get" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("v", parse_json(col("props")))
        .select(col("event_id"),
          expr("variant_get(v, '$.k', 'bigint')").as("k_big"),
          expr("CAST(variant_get(v, '$.k', 'int') IS NOT NULL AS BOOLEAN)").as("has_k"))
        .orderBy("event_id")),

    // §2.8 calendar interval arithmetic: day/month shifts with month-end
    // clamping (add_months), last_day, day-count to a fixed cutoff, and
    // quarter extraction — the due-date/SLA vocabulary. All map work;
    // dates emitted as ISO strings (the gate compares strings, not
    // engine-specific date dtypes).
    "time_interval_math" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd")
            .as("due_date"),
          date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd")
            .as("q_review"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd")
            .as("month_end"),
          datediff(lit(java.sql.Date.valueOf("1998-12-31")), col("o_orderdate"))
            .cast("int").as("days_to_cutoff"),
          quarter(col("o_orderdate")).as("q"))
        .orderBy("o_orderkey")),

    // Spark 4 COLLATIONS: grouping under UTF8_LCASE merges case variants
    // at the comparison layer — no lower() normalization column, and the
    // hash aggregate/shuffle key is collation-aware end to end. Case
    // variants are synthesized by key parity; the output re-lowercases
    // the representative (which variant survives per group is
    // layout-dependent, the collated GROUPING is not). The oracle is the
    // classic lower()-normalized GROUP BY — identical groups for ASCII.
    "str_collation_group" -> ((s, d) =>
      Tables.part(s, d)
        .select(when(col("p_partkey") % 2 === 0, upper(col("p_brand")))
          .otherwise(lower(col("p_brand"))).as("name_cased"), col("p_partkey"))
        .groupBy(expr("collate(name_cased, 'UTF8_LCASE')").as("k"))
        .agg(count(lit(1)).as("n"), min("p_partkey").as("first_key"))
        .select(lower(col("k")).as("brand"), col("n"), col("first_key"))
        .orderBy("brand")),

    // §2.8 generator with ordinal: posexplode keeps the token's position —
    // the lateral-view shape every tokenize/flatten step uses. Pure map
    // work (a generate node inside the scan stage, no shuffle); output
    // size is bounded by the filter before the explode, never after.
    "explode_posexplode" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") % 25 === 0)
        .select(col("doc_id"), posexplode(graft.ops.TextOps.tokens(col("text"))))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("tok"))
        .orderBy("doc_id", "pos")),
  )

  val oracle: Map[String, String] = Map(
    "str_clean" ->
      """SELECT p_partkey, lower(replace(p_name, ' ', '_')) AS name_clean,
        | lower(replace(p_brand, ' ', '_')) AS brand_clean
        |FROM part ORDER BY p_partkey""".stripMargin,
    "str_split_extract" ->
      """SELECT p_partkey, string_split(p_name, ' ')[1] AS word0,
        | string_split(p_name, ' ')[2] AS word1
        |FROM part ORDER BY p_partkey""".stripMargin,
    "arr_split_getitem" ->
      """SELECT o_orderkey,
        | CAST(string_split(o_orderpriority, '-')[1] AS INT) AS prio_num,
        | string_split(o_orderpriority, '-')[2] AS prio_label,
        | CAST(len(string_split(o_orderpriority, '-')) AS BIGINT) AS n_parts,
        | list_contains(string_split(o_orderpriority, '-'), 'URGENT') AS is_urgent
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "date_parts_expand" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INT) AS order_year,
        | CAST(month(o_orderdate) AS INT) AS order_month,
        | CAST(dayofmonth(o_orderdate) AS INT) AS order_day,
        | CAST(dayofweek(o_orderdate) + 1 AS INT) AS order_weekday,
        | lower(strftime(o_orderdate, '%a')) AS order_weekday_abbrev
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "date_sas_epoch" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderkey % 97 = 0 THEN NULL
        |      WHEN o_orderkey % 89 = 0 THEN 0
        |      ELSE CAST(o_orderkey % 20000 AS INT) END AS sas_days,
        | strftime(DATE '1960-01-01' + CAST(coalesce(
        |   CASE WHEN o_orderkey % 97 = 0 THEN NULL
        |        WHEN o_orderkey % 89 = 0 THEN 0
        |        ELSE CAST(o_orderkey % 20000 AS INT) END, 0) AS INT), '%Y-%m-%d') AS sas_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "math_arith" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        | CAST(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 100) AS BIGINT) AS charge_cents,
        | abs(l_quantity - 25) AS qty_dev,
        | CAST(floor(l_discount * 100) AS BIGINT) AS disc_floor,
        | CAST(ceil(l_tax * 100) AS BIGINT) AS tax_ceil,
        | l_orderkey % 7 AS okey_mod7
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,
    "map_literal_lookup" ->
      """WITH raw AS (
        |  SELECT s_suppkey,
        |    CASE WHEN s_suppkey % 11 = 0 THEN NULL
        |         WHEN s_suppkey % 3 = 0 THEN ' California'
        |         WHEN s_suppkey % 3 = 1 THEN 'texas'
        |         ELSE s_name END AS state_raw
        |  FROM supplier)
        |SELECT s_suppkey, state_raw,
        |  coalesce(CASE lower(ltrim(state_raw))
        |             WHEN 'california' THEN 'CA'
        |             WHEN 'texas' THEN 'TX' END, state_raw) AS state_abbrev
        |FROM raw ORDER BY s_suppkey""".stripMargin,
    "json_get_field" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
        | CAST(json_extract_string(props, '$.k') AS INT) AS k_int
        |FROM events ORDER BY event_id""".stripMargin,
    "clean_try_ops" ->
      """SELECT event_id,
        |  CAST(round(CAST(CAST(round(value*100) AS BIGINT) * 1000 AS DOUBLE)
        |    / NULLIF(event_id % 5, 0)) AS BIGINT) AS div_milli,
        |  TRY_CAST(substr(props, 8, 2) AS INTEGER) AS parsed_k,
        |  string_split(event_type, 'i')[3] AS third_piece
        |FROM events ORDER BY event_id""".stripMargin,
    "clean_guarded_fast" ->
      """SELECT event_id,
        |  CASE WHEN event_id % 5 = 0 THEN NULL
        |    ELSE CAST(round(CAST(CAST(round(value*100) AS BIGINT) * 1000 AS DOUBLE)
        |      / (event_id % 5)) AS BIGINT) END AS div_milli,
        |  CASE WHEN regexp_matches(substr(props, 8, 2), '^[0-9]+$')
        |    THEN CAST(substr(props, 8, 2) AS INTEGER) END AS parsed_k,
        |  CASE WHEN len(string_split(event_type, 'i')) >= 3
        |    THEN string_split(event_type, 'i')[3] END AS third_piece
        |FROM events ORDER BY event_id""".stripMargin,
    "json_from_schema" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "json_variant_get" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_big,
        | json_extract_string(props, '$.k') IS NOT NULL AS has_k
        |FROM events ORDER BY event_id""".stripMargin,
    "time_interval_math" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
        |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS q_review,
        |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
        |  CAST(datediff('day', o_orderdate, DATE '1998-12-31') AS INT)
        |    AS days_to_cutoff,
        |  CAST(date_part('quarter', o_orderdate) AS INT) AS q
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "str_collation_group" ->
      """SELECT lower(CASE WHEN p_partkey % 2 = 0 THEN upper(p_brand)
        |             ELSE lower(p_brand) END) AS brand,
        |  COUNT(*) AS n, MIN(p_partkey) AS first_key
        |FROM part GROUP BY 1 ORDER BY 1""".stripMargin,
    "explode_posexplode" ->
      """SELECT doc_id, unnest(generate_series(1, len(string_split(text, ' ')))) - 1 AS pos,
        | unnest(string_split(text, ' ')) AS tok
        |FROM documents WHERE doc_id % 25 = 0
        |ORDER BY doc_id, pos""".stripMargin,
  )
}
