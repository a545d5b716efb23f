package graft.ops

import org.apache.spark.sql.types._

/** Central schema registry for the star-schema lake the reference builds.
  *
  * Mirrors the `get_schema` registry of the reference
  * (`/root/reference/scripts/pyspark.py:78-156`): six output tables, each an
  * ordered list of (name, type, nullable). Two documented reference bugs are
  * fixed rather than replicated (SURVEY.md §2.11):
  *   - `time.arrival_weekday` is StringType here (reference declares
  *     IntegerType at pyspark.py:114 but stores string day abbreviations).
  *   - null fills cast to the *target* column type (reference casts all null
  *     fills to StringType at pyspark.py:407).
  */
object Schemas {

  private def st(fields: (String, DataType, Boolean)*): StructType =
    StructType(fields.map { case (n, t, nl) => StructField(n, t, nl) })

  /** `temperatures` output (schema key "country"), pyspark.py:93-101. */
  val country: StructType = st(
    ("avg_temperature", IntegerType, true),
    ("avg_temperature_uncertainty", IntegerType, true),
    ("country", StringType, false),
    ("year", IntegerType, false),
    ("month", IntegerType, false),
    ("day", IntegerType, false),
    ("weekday", StringType, false),
  )

  /** `asylum` dimension, pyspark.py:85-92. */
  val asylum: StructType = st(
    ("id", LongType, false),
    ("country", StringType, false),
    ("year", LongType, false),
    ("num_arrivals", IntegerType, true),
    ("num_accepted_affirmitavely", IntegerType, true),
    ("num_accepted_defensively", IntegerType, true),
  )

  /** `visitor` dimension, pyspark.py:120-136. */
  val visitor: StructType = st(
    ("id", IntegerType, false),
    ("visa_category", StringType, false),
    ("visa_type", StringType, false),
    ("port_of_entry_municipality", StringType, true),
    ("port_of_entry_region", StringType, true),
    ("country", StringType, false),
    ("visiting_state", StringType, false),
    ("arrival_year", IntegerType, false),
    ("arrival_month", IntegerType, true),
    ("arrival_day", IntegerType, true),
    ("arrival_weekday", StringType, true),
    ("expiry_year", IntegerType, true),
    ("expiry_month", IntegerType, true),
    ("expiry_day", IntegerType, true),
    ("expiry_weekday", StringType, true),
  )

  /** `worker` dimension, pyspark.py:137-154. */
  val worker: StructType = st(
    ("id", IntegerType, false),
    ("case_status", StringType, false),
    ("visa_type", StringType, true),
    ("employer_name", StringType, false),
    ("employer_city", StringType, false),
    ("employer_state", StringType, false),
    ("worksite_city", StringType, false),
    ("worksite_state", StringType, false),
    ("arrival_year", IntegerType, false),
    ("arrival_month", IntegerType, true),
    ("arrival_day", IntegerType, true),
    ("arrival_weekday", StringType, true),
    ("expiry_year", IntegerType, true),
    ("expiry_month", IntegerType, true),
    ("expiry_day", IntegerType, true),
    ("expiry_weekday", StringType, true),
  )

  /** `time` dimension, pyspark.py:108-119 (weekday type bug fixed). */
  val time: StructType = st(
    ("id", LongType, false),
    ("immigration_type", StringType, false),
    ("arrival_year", IntegerType, false),
    ("arrival_month", IntegerType, true),
    ("arrival_day", IntegerType, true),
    ("arrival_weekday", StringType, true),
    ("expiry_year", IntegerType, true),
    ("expiry_month", IntegerType, true),
    ("expiry_day", IntegerType, true),
    ("expiry_weekday", StringType, true),
  )

  /** `immigration_facts`, pyspark.py:102-107. */
  val fact: StructType = st(
    ("id", LongType, false),
    ("country", StringType, true),
    ("immigration_type", StringType, false),
    ("time_id", LongType, false),
  )

  val all: Map[String, StructType] = Map(
    "country" -> country, "asylum" -> asylum, "visitor" -> visitor,
    "worker" -> worker, "time" -> time, "fact" -> fact)

  /** Partition columns per output table (pyspark.py:463-468, README.md:55-58). */
  val partitioning: Map[String, Seq[String]] = Map(
    "country" -> Seq("country"),
    "asylum" -> Seq("country"),
    "visitor" -> Seq("country", "visa_category"),
    "worker" -> Seq("visa_type"),
    "time" -> Seq("immigration_type", "arrival_year"),
    "fact" -> Seq("immigration_type"))
}
