package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway decomposition probe for the lake_txlog_cdf_batch
  * adjudication (round 16) — times each layer of the batch CDF read at
  * sf0.1 so the regression is attributed, not guessed.
  */
object CdfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val t = java.nio.file.Files.createTempDirectory("cdfprobe-").resolve("t").toString
    val base = spark.read.parquet(s"$d/orders.parquet")
      .select(col("o_orderkey"), (round(col("o_totalprice") * 100)).cast("long").as("cents"))
    graft.ops.TxLog.append(base, t)
    graft.ops.TxLog.mergeDv(spark,
      base.filter(col("o_orderkey") % 5 === 0).withColumn("cents", col("cents") + 500L),
      t, "o_orderkey")
    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      println(f"[probe] $name%-34s min=${ts.map(_._1).min}%.3f s  rows=${ts.head._2}")
    }
    val feedDf = graft.sources.TxLogCdf.changeFrame(spark, t, 0L, 2L, Some("o_orderkey"))
    time("changeFrame.count")(feedDf.count())
    time("changeFrame+agg") {
      feedDf.groupBy(col("_commit_version"), col("_change_type"))
        .agg(count(lit(1)), sum("cents")).queryExecution.toRdd.count()
    }
    time("relation+agg") {
      spark.read.format("txlog").option("readChangeFeed", true)
        .option("cdcKey", "o_orderkey").load(t)
        .groupBy(col("_commit_version"), col("_change_type"))
        .agg(count(lit(1)), sum("cents")).queryExecution.toRdd.count()
    }
    val v1seg = graft.ops.TxLog.readManifest(t, 1L).adds
    time("raw v1 scan")(spark.read.parquet(v1seg: _*).count())
    time("v1 scan + uuid regex") {
      spark.read.parquet(v1seg: _*)
        .select(col("*"), regexp_extract(col("_metadata.file_path"),
          "data/([0-9a-fA-F\\-]{36})", 1).as("u")).queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
