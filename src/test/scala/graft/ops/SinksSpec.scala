package graft.ops

import graft.SparkSpec

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("readScheme rewrites s3:// to s3a:// and leaves other schemes alone") {
    assert(Sinks.readScheme("s3://bucket/data/") == "s3a://bucket/data/")
    assert(Sinks.readScheme("s3a://bucket/x") == "s3a://bucket/x")
    assert(Sinks.readScheme("/local/path") == "/local/path")
    assert(Sinks.readScheme("hdfs://nn/x") == "hdfs://nn/x")
  }

  test("jsonRoundTrip refuses frames above the code-table size guard") {
    val big = spark.range(10001).toDF("id")
    val e = intercept[IllegalArgumentException] {
      Sinks.jsonRoundTrip(spark, big, "/tmp/graft-sinks-spec-reject")
    }
    assert(e.getMessage.contains("small code tables"))
  }
  test("dynamic partition overwrite replaces only the partitions in the frame") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft-dyn-").toString
    val base = Seq((1L, "A", 10L), (2L, "N", 20L), (3L, "R", 30L), (4L, "A", 40L))
      .toDF("id", "flag", "v")
    Sinks.writePartitionedParquet(base, out, Seq("flag"))
    // re-deliver ONLY the A partition with corrected values
    val fixedA = Seq((1L, "A", 11L), (4L, "A", 44L)).toDF("id", "flag", "v")
    Sinks.overwritePartitionsDynamic(fixedA, out, Seq("flag"))
    val got = spark.read.parquet(out).select("id", "flag", "v")
      .as[(Long, String, Long)].collect().sorted.toSeq
    // A rows replaced; N and R untouched (static overwrite would drop them)
    assert(got == Seq((1L, "A", 11L), (2L, "N", 20L), (3L, "R", 30L), (4L, "A", 44L)))
  }
}
