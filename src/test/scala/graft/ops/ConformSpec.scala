package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ConformSpec extends SparkSpec {
  import spark.implicits._

  private val target = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", IntegerType)))

  test("conformTo reorders and casts to the declared schema") {
    val df = Seq(("a", 1, 2.9)).toDF("name", "id", "score")
    val out = Conform.conformTo(df, target)
    assert(out.columns.toSeq == Seq("id", "name", "score"))
    assert(out.schema.map(_.dataType) == Seq(LongType, StringType, IntegerType))
    assert(out.as[(Long, String, Int)].head() == ((1L, "a", 2)))
  }

  test("schemaCastUnion reorders and coerces via positional union-with-empty (pyspark.py:159-167)") {
    // Matching-width input conforms exactly (int id widens to declared long).
    val df = Seq(("x", 5, 7)).toDF("name", "id", "score")
    val out = Conform.schemaCastUnion(spark, df, target)
    assert(out.columns.toSeq == Seq("id", "name", "score"))
    assert(out.schema.map(_.dataType) == Seq(LongType, StringType, IntegerType))
    assert(out.as[(Long, String, Int)].head() == ((5L, "x", 7)))
  }

  test("schemaCastUnion widens to the COMMON type, not the declared one — why conformTo exists") {
    // A string score unioned against the declared int widens to the
    // union's common type (long under Spark's coercion rules), silently
    // departing from the registry schema. The reference's idiom has the
    // same hole (its string `year` at pyspark.py:75 never truly became
    // LongType); conformTo's explicit casts are the strict operator.
    val df = Seq((5L, "x", "7")).toDF("id", "name", "score")
    val out = Conform.schemaCastUnion(spark, df, target)
    assert(out.schema("score").dataType != IntegerType)
    assert(Conform.conformTo(out, target).schema("score").dataType == IntegerType)
  }

  test("fillMissingColumns adds typed nulls (reference bug fixed)") {
    val df = Seq((1L, "a")).toDF("id", "name")
    val out = Conform.fillMissingColumns(df, target)
    assert(out.schema("score").dataType == IntegerType)
    assert(out.select("score").head().isNullAt(0))
  }

  test("fillMissingColumnsLegacy reproduces the reference's StringType nulls (pyspark.py:407)") {
    val df = Seq((1L, "a")).toDF("id", "name")
    val out = Conform.fillMissingColumnsLegacy(df, target)
    assert(out.schema("score").dataType == StringType)
  }

  test("qualityGate rejects column-order mismatch") {
    val df = Seq((1L, "a", 2)).toDF("name", "id", "score")
    val e = intercept[IllegalArgumentException] {
      Conform.qualityGate(df, target, "t")
    }
    assert(e.getMessage.contains("column order mismatch"))
  }

  test("qualityGate rejects an empty table") {
    val df = Conform.makeEmptyDf(spark, target)
    val e = intercept[IllegalArgumentException] {
      Conform.qualityGate(df, target, "t")
    }
    assert(e.getMessage.contains("empty"))
  }

  test("qualityGate passes a conforming non-empty table through unchanged") {
    val df = Seq((1L, "a", 2)).toDF("id", "name", "score")
    assert(Conform.qualityGate(df, target, "t").collect().length == 1)
  }
  test("observedWrite gates metrics in the same pass as the write") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val out = java.nio.file.Files.createTempDirectory("graft-obs-").toString
    val metrics = Conform.observedWrite(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), schema, "t") {
      _.write.mode("overwrite").parquet(s"$out/ok")
    }
    assert(metrics == Map("n_rows" -> 2L, "n_null_keys" -> 0L))
    assert(spark.read.parquet(s"$out/ok").count() == 2)

    // null keys surface AFTER the staging write — the promote step never runs
    val bad = Seq((Some(1L), "a"), (None, "b"))
      .toDF("id", "v").select(col("id"), col("v"))
    val e = intercept[IllegalArgumentException] {
      Conform.observedWrite(bad, schema, "t") {
        _.write.mode("overwrite").parquet(s"$out/staged")
      }
    }
    assert(e.getMessage.contains("null keys"))

    // empty frame: gate throws even though the (empty) write succeeded
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val e2 = intercept[IllegalArgumentException] {
      Conform.observedWrite(empty, schema, "t") {
        _.write.mode("overwrite").parquet(s"$out/empty")
      }
    }
    assert(e2.getMessage.contains("empty"))
  }
}
