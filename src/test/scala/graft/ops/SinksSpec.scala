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
}
