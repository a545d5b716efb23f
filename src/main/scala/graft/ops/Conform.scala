package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Schema-conformance operators.
  *
  * The reference's signature idiom is "union with an empty DataFrame of the
  * declared schema" as a cast-and-reorder operator
  * (`/root/reference/scripts/pyspark.py:159-167`, applied at 182,206,253,302).
  * We keep that as a compat mode ([[schemaCastUnion]]) and provide the
  * explicit, Catalyst-friendly equivalent ([[conformTo]]): a single `select`
  * of per-column casts. `conformTo` produces no union node at all — just a
  * Project that whole-stage-codegen fuses with its neighbours — so it is the
  * default for pipeline code.
  */
object Conform {

  /** Empty relation with an explicit schema (pyspark.py:159-167). */
  def makeEmptyDf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  /** Reference-shaped conformance: select columns in schema order, then
    * positional union into the empty schema frame (coerces types like
    * PySpark 2.4's `union`). Kept for behavioural parity tests.
    */
  def schemaCastUnion(spark: SparkSession, df: DataFrame, schema: StructType): DataFrame =
    makeEmptyDf(spark, schema).union(df.select(schema.fieldNames.map(col).toIndexedSeq: _*))

  /** Idiomatic conformance: one projection with explicit casts. Requires all
    * schema columns present in `df` (use [[fillMissingColumns]] first when
    * they may be absent).
    */
  def conformTo(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)

  /** Legacy-cast conformance for pipeline inputs: `try_cast` yields null on
    * unparseable values — the PySpark 2.4 (pre-ANSI) cast semantics the
    * reference's schema-union relied on (blank CSV metrics → typed nulls).
    * Under Spark 4's ANSI default a plain cast would throw instead.
    */
  def conformToLenient(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.map(f =>
      expr(s"try_cast(`${f.name}` AS ${f.dataType.sql})").as(f.name)).toIndexedSeq: _*)

  /** Add any columns of `schema` missing from `df` as typed nulls so a
    * union can line up (pyspark.py:388-413). Unlike the reference — which
    * casts every null fill to StringType regardless of target
    * (pyspark.py:407, a documented bug) — fills are cast to the target
    * column's type.
    */
  def fillMissingColumns(df: DataFrame, schema: StructType): DataFrame =
    schema.fields.foldLeft(df) { (acc, f) =>
      if (acc.columns.contains(f.name)) acc
      else acc.withColumn(f.name, lit(null).cast(f.dataType))
    }

  /** Reference-exact variant of the fill (StringType nulls, pyspark.py:407)
    * for parity tests.
    */
  def fillMissingColumnsLegacy(df: DataFrame, schema: StructType): DataFrame =
    schema.fields.foldLeft(df) { (acc, f) =>
      if (acc.columns.contains(f.name)) acc
      else acc.withColumn(f.name, lit(null).cast(StringType))
    }

  /** Data-quality gate (pyspark.py:22-39): non-empty + exact column-name
    * order vs the registry schema. Throws on failure; returns the input for
    * chaining. The non-emptiness probe is `limit(1).count()` — O(first
    * partition with a row), not a full scan, exactly as the reference does.
    */
  def qualityGate(df: DataFrame, schema: StructType, table: String): DataFrame = {
    val expected = schema.fieldNames.toSeq
    val actual = df.columns.toSeq
    require(actual == expected,
      s"quality gate [$table]: column order mismatch; expected=$expected actual=$actual")
    require(df.select(col(expected.head)).limit(1).count() > 0,
      s"quality gate [$table]: table is empty")
    df
  }

  /** SINGLE-PASS metric gate: row/null-key counts are collected as
    * `Observation` metrics DURING the caller's write action — no second
    * scan, no persist-to-avoid-recompute (the two costs `Lake.build`
    * pays to gate before writing). The trade: metrics arrive after the
    * bytes are written, so at scale the write targets a staging location
    * and the caller promotes it only when this returns (atomic-rename
    * promote — the standard audit-publish pattern). Throws on an empty
    * frame or null keys; returns the metrics for lineage logging.
    */
  def observedWrite(df: DataFrame, schema: StructType, table: String)
                   (write: DataFrame => Unit): Map[String, Long] = {
    val expected = schema.fieldNames.toSeq
    require(df.columns.toSeq == expected,
      s"observed gate [$table]: column order mismatch; expected=$expected actual=${df.columns.toSeq}")
    val keyCol = expected.head
    val obs = org.apache.spark.sql.Observation(s"gate_$table")
    val observed = df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col(keyCol).isNull, 1L).otherwise(0L)).as("n_null_keys"))
    write(observed)
    val m = obs.get
    val nRows = m("n_rows").asInstanceOf[Long]
    val nNullKeys = Option(m("n_null_keys")).fold(0L)(_.asInstanceOf[Long])
    require(nRows > 0, s"observed gate [$table]: table is empty")
    require(nNullKeys == 0,
      s"observed gate [$table]: $nNullKeys null keys in $keyCol")
    Map("n_rows" -> nRows, "n_null_keys" -> nNullKeys)
  }
}
