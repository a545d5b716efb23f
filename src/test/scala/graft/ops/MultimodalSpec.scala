package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a" * 600, "en", "src0", 600L),
    (2L, "short doc", "en", "src1", 9L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("asMediaTable produces binary payloads with typed metadata") {
    val m = Multimodal.asMediaTable(docs)
    assert(m.schema("payload").dataType.typeName == "binary")
    val meta = m.select("meta.n_bytes", "meta.mime").as[(Long, String)].collect().toSet
    assert(meta == Set((600L, "text/plain"), (9L, "text/plain")))
  }

  test("framesExpr slices payloads into fixed frames with a ragged tail") {
    val f = Multimodal.asMediaTable(docs)
      .select(col("media_id"), posexplode(Multimodal.framesExpr("payload", 256)))
      .select(col("media_id"), col("pos"), expr("octet_length(col)").as("len"))
      .as[(Long, Int, Int)].collect().toSet
    // 600 bytes → frames of 256, 256, 88; 9 bytes → one 9-byte frame
    assert(f == Set((1L, 0, 256), (1L, 1, 256), (1L, 2, 88), (2L, 0, 9)))
  }

  test("decodeStub batches rows per partition and is deterministic") {
    val out1 = Multimodal.decodeStub(spark, Multimodal.asMediaTable(docs))
      .orderBy("media_id").as[(Long, Int, Int, Long)].collect().toSeq
    val out2 = Multimodal.decodeStub(spark,
      Multimodal.asMediaTable(docs).repartition(7)) // layout must not matter
      .orderBy("media_id").as[(Long, Int, Int, Long)].collect().toSeq
    assert(out1 == out2)
    assert(out1.map(_._1) == Seq(1L, 2L))
    assert(out1.forall { case (_, w, h, n) => w >= 64 && h >= 64 && n > 0 })
  }

  test("PNG codec round-trips 8-bit grayscale rasters bit-exactly") {
    // all 256 byte values present — any color-space transform would show
    val luma = Array.tabulate(256)(i => i.toByte)
    val png = Multimodal.encodePngGray(luma, 16, 16)
    // a real PNG container, not a passthrough
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val (w, h, dec) = Multimodal.decodePngGray(png)
    assert((w, h) == (16, 16))
    assert(dec.toSeq == luma.toSeq, "lossless round-trip of every sample value")
    // non-square dims carried by the container, not assumed
    val wide = Array.tabulate(96)(i => (i * 7 % 256).toByte)
    val (w2, h2, dec2) = Multimodal.decodePngGray(Multimodal.encodePngGray(wide, 32, 3))
    assert((w2, h2) == (32, 3) && dec2.toSeq == wide.toSeq)
  }

  test("decodeImages runs the real codec through the partition seam") {
    val imgs = Seq(
      (1L, Multimodal.encodePngGray(Array.fill(256)(7.toByte), 16, 16)),
      (2L, Multimodal.encodePngGray(Array.tabulate(64)(_.toByte), 8, 8)))
      .toDF("media_id", "payload")
    val out = Multimodal.decodeImages(spark, imgs.repartition(3))
      .orderBy("media_id")
      .as[(Long, Int, Int, Array[Byte])].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3)) == Seq((1L, 16, 16), (2L, 8, 8)))
    assert(out(0)._4.forall(_ == 7.toByte) && out(0)._4.length == 256)
    assert(out(1)._4.toSeq == Array.tabulate(64)(_.toByte).toSeq)
  }

  test("batchInferStub groups rows into fixed batches with a ragged tail") {
    val many = (1L to 10L).map(i => (i, s"payload number $i body"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out = Multimodal.batchInferStub(spark,
        Multimodal.asMediaTable(many).repartition(1), batchSize = 4)
      .select("media_id", "feat", "batch_rows")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // 10 rows in one partition at batch size 4 → batches of 4, 4, 2
    assert(out.map(_._3).sorted == Seq(2L, 2L, 4L, 4L, 4L, 4L, 4L, 4L, 4L, 4L))
    // feat is a pure function of the payload: byte sum mod 997
    val expected = many.select("doc_id", "text").as[(Long, String)].collect()
      .toMap.view.mapValues(t => t.getBytes("UTF-8").map(_ & 0xff).map(_.toLong).sum % 997)
    assert(out.forall { case (id, f, _) => f == expected(id) })
  }

  // r16: CodePointGroupSums replaced the explode(sequence) →
  // ascii(substring) → hash-agg shape in mm_perceptual_hash /
  // mm_shot_boundary / mm_audio_vad. Pin bit-equality against that
  // retired spelling on ASCII, non-ASCII (multi-byte UTF-8 — exercises
  // the slow path), and strings shorter than nChars (positions past the
  // end must contribute 0, as ascii('') did).
  test("CodePointGroupSums matches the explode+ascii(substring) aggregate form") {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    val texts = Seq(
      (1L, scala.util.Random.javaRandomToRandom(new java.util.Random(7))
        .alphanumeric.take(300).mkString),
      (2L, ("héllo wörld ✓ " * 30).take(280)),
      (3L, "short"),
      (4L, "x" * 256))
      .toDF("doc_id", "text")
    for ((groupLen, squared) <- Seq((16, false), (32, true))) {
      val native = texts.select(col("doc_id"),
          posexplode(toColumn(graft.functions.CodePointGroupSums(
            toExpression(col("text")), groupLen, 256, squared))))
        .select(col("doc_id"), col("pos").cast("long").as("g"), col("col").as("v"))
        .as[(Long, Long, Long)].collect().toSet
      val b = if (squared) "b * b" else "b"
      val spec = texts
        .select(col("doc_id"), col("text"), explode(expr("sequence(0, 255)")).as("pos"))
        .select(col("doc_id"), expr(s"pos div $groupLen").as("g"),
          expr("CAST(ascii(substring(text, pos + 1, 1)) AS BIGINT)").as("b"))
        .groupBy("doc_id", "g").agg(sum(expr(b)).as("v"))
        .as[(Long, Long, Long)].collect().toSet
      assert(native == spec, s"groupLen=$groupLen squared=$squared")
    }
  }
}
