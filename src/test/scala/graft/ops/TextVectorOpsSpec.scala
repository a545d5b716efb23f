package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextVectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hash60 is the md5-prefix value any engine reproduces") {
    // int('5eb63bbbe01eeed', 16) — first 15 hex chars of md5('hello world')
    val out = Seq("hello world").toDF("t").select(TextOps.hash60(col("t"))).as[Long].head()
    assert(out == 426544247714475757L)
  }

  test("native hash60 is bit-identical to the conv/substr/md5 spec form") {
    val samples = Seq("", "a", "hello world", "héllo wörld ünïcode",
      "0", "-1", "a b c d e f g", "x" * 500) ++ (0 until 50).map(i => s"doc_$i")
    val df = samples.toDF("t")
      .select(TextOps.hash60(col("t")).as("native"), TextOps.hash60Spec(col("t")).as("spec"))
    val rows = df.as[(Long, Long)].collect()
    rows.foreach { case (n, s) => assert(n == s, s"native $n != spec $s") }
    // 60-bit: always non-negative
    rows.foreach { case (n, _) => assert(n >= 0L) }
  }

  test("wordShingles: counts, content, and the short-doc guard") {
    val df = Seq("a b c d e", "a b").toDF("t")
      .select(TextOps.wordShingles(TextOps.tokens(col("t")), 3).as("sh"))
    val rows = df.as[Seq[String]].collect()
    assert(rows(0) == Seq("a b c", "b c d", "c d e"))
    assert(rows(1).isEmpty) // < n tokens ⇒ empty, not a descending-sequence blowup
  }

  test("native wordShingles is bit-identical to the HOF spec form") {
    val samples = Seq("", "a", "a b", "a b c", "a b c d e f g",
      "héllo wörld ünïcode tokens here", "x " * 200 + "y",
      "  leading and  double  spaces") ++
      (0 until 50).map(i => s"doc $i body word$i tail")
    for (n <- Seq(2, 3, 5)) {
      val df = samples.toDF("t")
        .select(TextOps.wordShingles(TextOps.tokens(col("t")), n).as("native"),
          TextOps.wordShinglesSpec(TextOps.tokens(col("t")), n).as("spec"))
      df.as[(Seq[String], Seq[String])].collect().foreach { case (nat, spec) =>
        assert(nat == spec, s"n=$n: native $nat != spec $spec")
      }
    }
  }

  test("levenshteinBP equals Spark's 3-arg levenshtein across randomized inputs") {
    val rnd = new scala.util.Random(42)
    def randStr(maxLen: Int, alphabet: String): String =
      (0 until rnd.nextInt(maxLen + 1)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    // mutate a base string so many pairs land NEAR the threshold boundary
    def mutate(s: String, edits: Int): String = {
      var cur = s
      (0 until edits).foreach { _ =>
        if (cur.isEmpty) cur = "x"
        else rnd.nextInt(3) match {
          case 0 => val i = rnd.nextInt(cur.length) // substitute
            cur = cur.updated(i, ('a' + rnd.nextInt(26)).toChar)
          case 1 => val i = rnd.nextInt(cur.length) // delete
            cur = cur.take(i) + cur.drop(i + 1)
          case _ => val i = rnd.nextInt(cur.length + 1) // insert
            cur = cur.take(i) + ('a' + rnd.nextInt(26)).toChar + cur.drop(i)
        }
      }
      cur
    }
    val ascii = "abcdef "
    val uni = "aé界🌍b "
    val cases = Seq(("", "", 0), ("", "abc", 2), ("", "abc", 3),
        ("same", "same", 0), ("a" * 200, "a" * 130 + "b" * 70, 50)) ++
      (0 until 200).map { _ =>
        val a = randStr(60, ascii)
        (a, mutate(a, rnd.nextInt(12)), rnd.nextInt(15))
      } ++
      (0 until 100).map { _ => // >64 chars exercises the multi-block path
        val a = randStr(400, ascii)
        (a, mutate(a, rnd.nextInt(60)), rnd.nextInt(90))
      } ++
      (0 until 100).map { _ => // non-ASCII exercises the code-point path
        val a = randStr(80, uni)
        (a, randStr(80, uni), rnd.nextInt(40))
      }
    val df = cases.toDF("a", "b", "thr").select(
      TextOps.levenshteinBP(col("a"), col("b"), col("thr")).as("bp"),
      expr("levenshtein(a, b, thr)").as("builtin"),
      col("a"), col("b"), col("thr"))
    df.as[(Int, Int, String, String, Int)].collect().foreach {
      case (bp, builtin, a, b, thr) =>
        assert(bp == builtin,
          s"levenshteinBP=$bp builtin=$builtin for ('$a', '$b', thr=$thr)")
    }
  }

  test("minHashSignature: deterministic, k=8, identical docs get identical signatures") {
    val df = Seq("w1 w2 w3 w4 w5", "w1 w2 w3 w4 w5", "z1 z2 z3 z4 z5").toDF("t")
      .select(TextOps.minHashSignature(TextOps.shingleHashes(col("t"), 3)).as("sig"))
    val sigs = df.as[Seq[Long]].collect()
    assert(sigs(0).length == 8)
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
    assert(sigs.flatten.forall(h => h >= 0 && h < TextOps.HashPrime))
  }

  test("bandKeys: identical signatures share all four band keys") {
    val df = Seq("w1 w2 w3 w4 w5").toDF("t")
      .select(TextOps.bandKeys(
        TextOps.minHashSignature(TextOps.shingleHashes(col("t"), 3))).as("b"))
    val keys = df.as[Seq[String]].head()
    assert(keys.length == 4)
    assert(keys.forall(_.contains("_")))
  }

  test("simHash60: identical texts have hamming 0; near-identical stay close") {
    val df = Seq("the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat")
      .toDF("t")
      .withColumn("hashes", transform(TextOps.tokens(col("t")), h => TextOps.hash60(h)))
      .select(TextOps.simHash60("hashes").as("s"))
    val s = df.as[Long].collect()
    assert(s(0) == s(1))
    assert(java.lang.Long.bitCount(s(0) ^ s(2)) < 20) // one-word edit stays close
    assert(s(0) >= 0 && s(0) < (1L << 60))
  }

  test("aggregate signature forms equal the Column forms") {
    val docs = Seq((1L, "w1 w2 w3 w4 w5 w1 w2"),
      (2L, "the quick brown fox jumps over it")).toDF("doc_id", "text")
    val colMin = docs.select(col("doc_id"),
      TextOps.minHashSignature(TextOps.shingleHashes(col("text"), 3)).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val aggMin = TextOps.minHashAgg(
      docs.select(col("doc_id"),
        explode(TextOps.wordShingles(TextOps.tokens(col("text")), 3)).as("sh"))
        .select(col("doc_id"), TextOps.hash60(col("sh")).as("h")), "doc_id", "h")
      .select(col("doc_id"), array((0 until 8).map(j => col(s"m$j")): _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(colMin == aggMin)

    // the native one-pass expression (MD5 + affine mins in compiled code)
    // must produce the identical signature — it replaces both forms above
    // on the query path
    val nativeMin = docs.select(col("doc_id"),
      TextOps.minHashSigNative(
        TextOps.wordShingles(TextOps.tokens(col("text")), 3)).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(nativeMin == colMin)

    // shingle-free doc (< 3 tokens): both forms yield 8 nulls, not fake 0s
    val shortDoc = Seq((9L, "w1 w2")).toDF("doc_id", "text")
    def nullSig(df: org.apache.spark.sql.DataFrame) =
      df.select(col("sig")).as[Seq[Option[Long]]].head()
    assert(nullSig(shortDoc.select(col("doc_id"), TextOps.minHashSigNative(
        TextOps.wordShingles(TextOps.tokens(col("text")), 3)).as("sig")))
      == Seq.fill(8)(None))
    assert(nullSig(shortDoc.select(col("doc_id"), TextOps.minHashSignature(
        TextOps.shingleHashes(col("text"), 3)).as("sig")))
      == Seq.fill(8)(None))

    val colSim = docs
      .withColumn("hashes", transform(TextOps.tokens(col("text")), t => TextOps.hash60(t)))
      .select(col("doc_id"), TextOps.simHash60("hashes").as("s"))
      .as[(Long, Long)].collect().toMap
    val aggSim = TextOps.simHashAgg(
      docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("t"))
        .select(col("doc_id"), TextOps.hash60(col("t")).as("h")), "doc_id", "h")
      .as[(Long, Long)].collect().toMap
    assert(colSim == aggSim)

    // the native one-pass SimHash (MD5 + 60 ±1 counters in compiled code)
    // must produce the identical bits — it replaces both forms above on
    // the dedup_simhash query path; empty token array → null, never a
    // fabricated signature
    val nativeSim = docs.select(col("doc_id"),
      TextOps.simHash60Native(TextOps.tokens(col("text"))).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(nativeSim == colSim)
    val emptySim = Seq(Tuple1(Seq.empty[String])).toDF("toks")
      .select(TextOps.simHash60Native(col("toks")).as("s"))
      .as[Option[Long]].head()
    assert(emptySim.isEmpty)
  }

  test("TopKAggregator: bounded, deterministic ties, partition-layout invariant") {
    import graft.functions.TopKAggregator
    val topk = udaf(new TopKAggregator(3))
    val rows = Seq((1L, 0.9, 10L), (1L, 0.9, 7L), (1L, 0.5, 3L), (1L, 0.7, 4L),
      (1L, 0.9, 12L), (2L, 0.1, 1L))
    def run(parts: Int) = rows.toDF("g", "score", "id").repartition(parts)
      .groupBy("g").agg(topk(col("score"), col("id")).as("top"))
      .select(col("g"), col("top").cast("string"))
      .as[(Long, String)].collect().toMap
    val one = run(1)
    assert(one == run(7)) // merge order must not matter
    // ties on 0.9 break by ascending id: 7 then 10, 12 excluded by k=3? no —
    // top-3 of group 1 = (0.9,7),(0.9,10),(0.9,12)
    assert(one(1L).contains("{0.9, 7}") && one(1L).contains("{0.9, 12}") &&
      !one(1L).contains("0.7"))
    assert(one(2L).contains("{0.1, 1}"))
  }

  test("cosine: orthogonal = 0, identical = 1, known value") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(3.0f, 4.0f), Seq(3.0f, 4.0f)),
      (Seq(1.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
      .select(VectorOps.cosine(
        VectorOps.toDoubleVec(col("a")), VectorOps.toDoubleVec(col("b"))).as("c"))
    val c = df.as[Double].collect()
    assert(c(0) == 0.0)
    assert(math.abs(c(1) - 1.0) < 1e-12)
    assert(math.abs(c(2) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("native codegen cosine/dot are bit-identical to the HOF reference forms") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 50).map(_ =>
      (Seq.fill(64)(rnd.nextFloat() - 0.5f), Seq.fill(64)(rnd.nextFloat() - 0.5f)))
    val df = rows.toDF("a", "b")
      .select(VectorOps.toDoubleVec(col("a")).as("a"), VectorOps.toDoubleVec(col("b")).as("b"))
    val pairs = df.select(
      VectorOps.cosine(col("a"), col("b")).as("fast"),
      VectorOps.cosineHof(col("a"), col("b")).as("ref"),
      VectorOps.dot(col("a"), col("b")).as("dfast"),
      VectorOps.dotHof(col("a"), col("b")).as("dref"))
      .as[(Double, Double, Double, Double)].collect()
    // bit-identical, not approximately equal: same sequential fold order
    assert(pairs.forall { case (f, r, df_, dr) =>
      java.lang.Double.doubleToLongBits(f) == java.lang.Double.doubleToLongBits(r) &&
        java.lang.Double.doubleToLongBits(df_) == java.lang.Double.doubleToLongBits(dr)
    })
  }

  test("mismatched dimensions yield null, matching the HOF reference") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
      .select(VectorOps.toDoubleVec(col("a")).as("a"), VectorOps.toDoubleVec(col("b")).as("b"))
    val row = df.select(
      VectorOps.cosine(col("a"), col("b")).as("c"),
      VectorOps.dot(col("a"), col("b")).as("d"),
      VectorOps.cosineHof(col("a"), col("b")).as("ch"),
      VectorOps.dotHof(col("a"), col("b")).as("dh")).head()
    assert(row.isNullAt(0) && row.isNullAt(1), "native must null on mismatch")
    assert(row.isNullAt(2) && row.isNullAt(3), "HOF reference nulls on mismatch")
  }

  test("dot folds sequentially in double precision") {
    val df = Seq((Seq(1.5f, 2.5f, 3.5f), Seq(2.0f, 2.0f, 2.0f))).toDF("a", "b")
      .select(VectorOps.dot(
        VectorOps.toDoubleVec(col("a")), VectorOps.toDoubleVec(col("b"))).as("d"))
    assert(df.as[Double].head() == 15.0)
  }
}
