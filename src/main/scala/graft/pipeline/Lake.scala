package graft.pipeline

import graft.ops.{Conform, Schemas, Sinks}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** End-to-end lake build (`/root/reference/scripts/pyspark.py:432-475`):
  * parse the four sources, derive time + fact, quality-gate each of the six
  * outputs, drop staging columns, and write partitioned parquet.
  *
  * Two engine-level fixes over the reference:
  *   - every output is persisted (MEMORY_AND_DISK) before its gate+write
  *     pair — the reference recomputed the whole lineage twice per table
  *     (its gate `count()` and `save()` were separate jobs over an
  *     uncached plan, ~12 full recomputes per run);
  *   - the gate runs BEFORE the staging-column drop, like the reference,
  *     but against the registry schema so a positionally-corrupted union
  *     cannot reach storage.
  */
object Lake {

  /** Staging columns dropped after gating, per output (pyspark.py:450-474). */
  private val stagingDrops: Map[String, Seq[String]] = {
    val dateParts = Seq("arrival_year", "arrival_month", "arrival_day", "arrival_weekday",
      "expiry_year", "expiry_month", "expiry_day", "expiry_weekday")
    Map(
      "country" -> Seq.empty,
      "asylum" -> Seq("year"),
      "visitor" -> dateParts,
      "worker" -> dateParts,
      "time" -> Seq.empty,
      "fact" -> Seq.empty)
  }

  /** Output directory name per schema key (pyspark.py:462-468). */
  val outputDirs: Map[String, String] = Map(
    "country" -> "temperatures", "asylum" -> "asylum", "visitor" -> "visitors",
    "worker" -> "workers", "time" -> "time", "fact" -> "immigration_facts")

  /** Build the full lake; returns per-table row counts (post-gate). */
  def build(spark: SparkSession, inputPath: String, outputPath: String): Map[String, Long] = {
    val country = Pipelines.parseClimate(spark, inputPath)
    val asylum = Pipelines.parseAsylum(spark, inputPath)
    val visitor = Pipelines.parseVisitor(spark, inputPath)
    val worker = Pipelines.parseWorker(spark, inputPath)
    val (time, fact) = Pipelines.extractTimeAndFact(asylum, visitor, worker)

    val outputs: Seq[(String, DataFrame)] = Seq(
      "country" -> country, "asylum" -> asylum, "visitor" -> visitor,
      "worker" -> worker, "time" -> time, "fact" -> fact)

    outputs.map { case (key, df) =>
      val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
      try {
        Conform.qualityGate(cached, Schemas.all(key), key)
        val finalDf = cached.drop(stagingDrops(key): _*)
        Sinks.writePartitionedParquet(finalDf,
          s"$outputPath/${outputDirs(key)}", Schemas.partitioning(key))
        key -> cached.count()
      } finally cached.unpersist()
    }.toMap
  }
}
