package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType}

/** The reference's row-level transformation vocabulary, rebuilt as pure
  * Catalyst expressions — zero UDFs, so every one of these stays inside
  * whole-stage codegen (the reference's two Python UDFs at
  * `/root/reference/scripts/pyspark.py:325,376` each break the stage into a
  * row-at-a-time `BatchEvalPython` hop; these rewrites are the single biggest
  * structural win over the reference at scale).
  */
object Cleaning {

  /** lower + spaces→underscores (`_clean_string_column`, pyspark.py:349-356). */
  def cleanString(c: Column): Column = regexp_replace(lower(c), " ", "_")

  /** Rewrite headers to lowercase, with explicit renames applied afterwards
    * (`_lower_case_headers`, pyspark.py:416-429).
    */
  def lowerCaseHeaders(df: DataFrame, renames: Map[String, String] = Map.empty): DataFrame = {
    val lowered = df.select(df.columns.map(c => col(c).as(c.toLowerCase)).toIndexedSeq: _*)
    renames.foldLeft(lowered) { case (acc, (from, to)) => acc.withColumnRenamed(from, to) }
  }

  /** Cast every column of the given source type to `to` — the reference's
    * double→int sweep (pyspark.py:228-230).
    */
  def castAll(df: DataFrame, from: DataType, to: DataType): DataFrame =
    df.select(df.schema.fields.map { f =>
      if (f.dataType == from) col(f.name).cast(to).as(f.name) else col(f.name)
    }.toIndexedSeq: _*)

  /** SAS epoch date: days since 1960-01-01, with BOTH null and 0 mapping to
    * 1960-01-01 (`_convert_to_date` UDF, pyspark.py:376-385; README.md:102).
    * UDF-free: `date_add(lit(1960-01-01), coalesce(cast int, 0))`.
    */
  def sasEpochDate(days: Column): Column =
    date_add(lit(java.sql.Date.valueOf("1960-01-01")), coalesce(days.cast(IntegerType), lit(0)))

  /** Expand a date column into (year, month, day, weekday) columns with a
    * shared prefix (pyspark.py:198-202, 245-248, 290-294). Weekday is kept
    * NUMERIC (1=Sunday..7=Saturday, Spark's `dayofweek`) for oracle parity;
    * [[weekdayAbbrev]] gives the reference's lowercase "mon".."sun" form.
    */
  def datePartsExpand(df: DataFrame, dateCol: String, prefix: String): DataFrame =
    df.withColumn(s"${prefix}_year", year(col(dateCol)))
      .withColumn(s"${prefix}_month", month(col(dateCol)))
      .withColumn(s"${prefix}_day", dayofmonth(col(dateCol)))
      .withColumn(s"${prefix}_weekday", dayofweek(col(dateCol)))

  /** Reference-style weekday: `date_format(d,'E')` lowercased → "mon".."sun"
    * (pyspark.py:202 composed with `_clean_string_column`).
    */
  def weekdayAbbrev(c: Column): Column = lower(date_format(c, "E"))

  /** Full US state-name → 2-letter code map (pyspark.py:332-343; 51 entries
    * including DC).
    */
  val stateAbbrev: Map[String, String] = Map(
    "alabama" -> "AL", "alaska" -> "AK", "arizona" -> "AZ", "arkansas" -> "AR",
    "california" -> "CA", "colorado" -> "CO", "connecticut" -> "CT",
    "delaware" -> "DE", "district of columbia" -> "DC", "florida" -> "FL",
    "georgia" -> "GA", "hawaii" -> "HI", "idaho" -> "ID", "illinois" -> "IL",
    "indiana" -> "IN", "iowa" -> "IA", "kansas" -> "KS", "kentucky" -> "KY",
    "louisiana" -> "LA", "maine" -> "ME", "maryland" -> "MD",
    "massachusetts" -> "MA", "michigan" -> "MI", "minnesota" -> "MN",
    "mississippi" -> "MS", "missouri" -> "MO", "montana" -> "MT",
    "nebraska" -> "NE", "nevada" -> "NV", "new hampshire" -> "NH",
    "new jersey" -> "NJ", "new mexico" -> "NM", "new york" -> "NY",
    "north carolina" -> "NC", "north dakota" -> "ND", "ohio" -> "OH",
    "oklahoma" -> "OK", "oregon" -> "OR", "pennsylvania" -> "PA",
    "rhode island" -> "RI", "south carolina" -> "SC", "south dakota" -> "SD",
    "tennessee" -> "TN", "texas" -> "TX", "utah" -> "UT", "vermont" -> "VT",
    "virginia" -> "VA", "washington" -> "WA", "west virginia" -> "WV",
    "wisconsin" -> "WI", "wyoming" -> "WY")

  /** UDF-free rewrite of the `_abbreviate_state` Python UDF
    * (pyspark.py:325-346): strip leading space (split-artifact), lowercase,
    * map-literal lookup, PASS THROUGH unmatched values unchanged, null→null.
    * A 51-entry map literal is evaluated executor-side with no shuffle and no
    * broadcast — cheaper than a join at any scale. `try_element_at` (not
    * `element_at`) because Spark 4 defaults to ANSI mode, where `element_at`
    * throws MAP_KEY_DOES_NOT_EXIST on a miss — the opposite of the
    * reference's pass-through semantics (pyspark.py:344-346).
    */
  def abbreviateState(c: Column): Column =
    coalesce(try_element_at(typedLit(stateAbbrev), lower(ltrim(c))), c)

  /** Generic map-literal lookup with pass-through-on-miss (ANSI-safe). */
  def mapLookup(c: Column, m: Map[String, String]): Column =
    coalesce(try_element_at(typedLit(m), c), c)

  /** Code-table lookup join (`_code_lookup`, pyspark.py:359-373): inner
    * equi-join of the main frame against a small code table, dropping both
    * key columns after the join. Inner join semantics are deliberate — it is
    * a lookup-FILTER: fact rows with no matching code are dropped, exactly as
    * the reference does. The lookup side is explicitly `broadcast()` (the
    * reference's tables are ≤660 rows; at 100 TB fact scale the dimension is
    * still tiny, and broadcasting avoids shuffling the fact table entirely).
    */
  def codeLookup(main: DataFrame, lookup: DataFrame, mainKey: String,
                 lookupKey: String): DataFrame =
    main.join(broadcast(lookup), main(mainKey) === lookup(lookupKey), "inner")
      .drop(mainKey).drop(lookupKey)

  /** Money columns as exact integer cents. Sums of BIGINT cents are
    * order-independent — unlike double sums, whose value depends on
    * partition-merge order — so aggregates built on this are deterministic
    * at any parallelism (SURVEY.md §7.4 risk 5).
    */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Constant-valued but NON-FOLDABLE partition key for windows whose
    * input is provably bounded (post-`limit` rank assignment, oracle-only
    * id stand-ins). A bare `Window.orderBy` logs WindowExec's
    * "No Partition Defined" warning, which drowned the bench logs
    * (VERDICT r6) and hides any *real* unpartitioned window; a literal
    * `partitionBy(lit(0))` doesn't help because Catalyst's
    * EliminateWindowPartitions strips foldable keys and the warning
    * returns (and `hash(c) * 0` gets arithmetic-simplified to the same
    * fate). `pmod(hash(c), 1)` evaluates to 0 on every row (hash is
    * null-safe, never null) but survives optimization as a live-column
    * expression — same single-partition execution, chosen explicitly and
    * silently.
    */
  def singlePartitionKey(c: Column): Column = pmod(hash(c), lit(1))
}
