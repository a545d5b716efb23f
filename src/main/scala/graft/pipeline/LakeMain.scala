package graft.pipeline

import graft.ops.Sinks
import org.apache.spark.sql.SparkSession

/** CLI entry point — parity with the reference's
  * `spark-submit scripts/pyspark.py --path s3://…`
  * (`/root/reference/scripts/pyspark.py:478-486`, with its argparse
  * store-true bug fixed as SURVEY §3.1 documents: `--path` takes a
  * VALUE). The s3→s3a scheme rewrite applies to both ends, so the same
  * invocation runs against a bucket or a local directory. The reference
  * wrote its lake back under the input bucket; `--output` makes that
  * explicit and defaults to `<input>/lake`.
  */
object LakeMain {

  /** The testable core: scheme-rewrite both paths, build the lake,
    * return per-table row counts.
    */
  def run(spark: SparkSession, inputPath: String, outputPath: String): Map[String, Long] =
    Lake.build(spark, Sinks.readScheme(inputPath), Sinks.readScheme(outputPath))

  private[pipeline] def parseArgs(args: Array[String]): (String, String) = {
    val kv = args.grouped(2).collect { case Array(k, v) => k -> v }.toMap
    val input = kv.getOrElse("--path",
      sys.error("usage: LakeMain --path <input> [--output <dir>]"))
    (input, kv.getOrElse("--output", s"${input.stripSuffix("/")}/lake"))
  }

  def main(args: Array[String]): Unit = {
    val (input, output) = parseArgs(args)
    // master comes from spark-submit / SPARK_MASTER; local[*] only as a
    // bare-JVM fallback
    val spark = SparkSession.builder()
      .appName("graft-lake")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try run(spark, input, output).toSeq.sortBy(_._1)
      .foreach { case (k, n) => println(s"$k: $n rows") }
    finally spark.stop()
  }
}
