package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks (SURVEY.md §5): algebraic laws of the conformance
  * and dedup operators, and the SAS-epoch round trip. Uses scalacheck
  * generators sampled with fixed seeds (the scalatest↔scalacheck bridge
  * artifact is not in the offline cache); each law is checked over several
  * generated corpora covering duplicates, empties, and boundary days.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val rowsGen: Gen[List[(Int, String)]] =
    Gen.listOfN(25, Gen.zip(Gen.choose(0, 5), Gen.oneOf("a", "b", "c")))

  test("property: dropDuplicates is idempotent") {
    for (rows <- samples(rowsGen, 4) if rows.nonEmpty) {
      val once = rows.toDF("k", "v").dropDuplicates()
      assert(once.dropDuplicates().count() == once.count())
    }
  }

  test("property: union preserves total row count") {
    for (Seq(a, b) <- samples(rowsGen, 6).grouped(2).toSeq if a != null && b != null) {
      assert(a.toDF("k", "v").union(b.toDF("k", "v")).count() == a.length + b.length)
    }
  }

  test("property: conformTo is schema-idempotent and row-preserving") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    for (rows <- samples(rowsGen, 4) if rows.nonEmpty) {
      val out = Conform.conformTo(rows.toDF("k", "v"), schema)
      assert(out.schema == Conform.conformTo(out, schema).schema)
      assert(out.count() == rows.length)
    }
  }

  test("property: SAS epoch date round-trips for non-null days") {
    val days = samples(Gen.choose(0, 40000), 40).toList
    val back = days.toDF("days")
      .select(datediff(Cleaning.sasEpochDate(col("days")),
        lit(java.sql.Date.valueOf("1960-01-01"))).as("d"))
      .as[Int].collect().toList
    assert(back == days)
  }

  test("property: minhash signature is a pure function of the text") {
    for (n <- samples(Gen.chooseNum(3, 12), 5)) {
      val text = (1 to n).map(i => s"w$i").mkString(" ")
      val sigs = Seq(text, text).toDF("t")
        .select(TextOps.minHashSignature(TextOps.shingleHashes(col("t"), 3)).as("s"))
        .as[Seq[Long]].collect()
      assert(sigs(0) == sigs(1))
    }
  }
  test("property: levenshtein threshold rewrite matches the unrewritten predicate") {
    // the optimizer rule fires on the filter form; the projection form is
    // untouched and serves as the ground truth (ExtensionsSpec pins that
    // the rule actually fired on this session)
    val strGen = Gen.listOfN(12, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString)
    val pairs = samples(Gen.zip(strGen, strGen), 40)
    for (k <- Seq(0, 1, 3, 8)) {
      val df = pairs.toDF("t1", "t2")
      val viaFilter = df.filter(levenshtein(col("t1"), col("t2")) <= k).count()
      val truth = df.select(levenshtein(col("t1"), col("t2")).as("ed"))
        .collect().count(_.getInt(0) <= k)
      assert(viaFilter == truth, s"k=$k: filter=$viaFilter truth=$truth")
    }
  }

  test("property: z-order key is a bijection that preserves per-dimension order") {
    val dimGen = Gen.choose(0L, 65535L)
    val pts = samples(Gen.zip(dimGen, dimGen), 60).distinct
    val keys = pts.toDF("x", "y").select(ZOrder.zkey(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    // bijective on distinct inputs
    assert(keys.distinct.size == pts.size)
    // fixing one dimension, the key is monotone in the other
    val x0 = pts.head._1
    val fixed = samples(dimGen, 20).distinct.sorted
    val zs = fixed.map(y => (y, x0)).toDF("y", "x")
      .select(ZOrder.zkey(col("x"), col("y")).as("z")).as[Long].collect().toSeq
    assert(zs == zs.sorted, "zkey not monotone in y with x fixed")
  }
}
