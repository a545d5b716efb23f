package graft.queries

import graft.SparkSpec

/** Independent cross-check of the PQ quantizer: the `ann_pq_codes` query's
  * codes and quantization error recomputed by BRUTE FORCE in plain Scala
  * (BigDecimal HALF_UP milli rounding — the same rule as Spark's `round`)
  * over the sf0.001 embeddings. The DuckDB oracle already pins engine
  * parity; this pins both engines against a third, loop-level
  * implementation of the algorithm itself.
  */
class RetrievalSpec extends SparkSpec {

  private def milli(x: Float): Long =
    new java.math.BigDecimal(x.toDouble)
      .multiply(new java.math.BigDecimal(1000))
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  test("PQ codes and quantization error match a brute-force re-computation") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("ann_pq_codes")(spark, sf)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)), r.getLong(5)))
      .toMap

    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val codebook = (0L until 8L).map(i => i -> emb(i)).toMap
    val data = emb.filter(_._1 >= 8)

    assert(got.keySet == data.keySet, "query must emit one row per data vector")
    data.foreach { case (id, v) =>
      val perSub = (0 until 4).map { s =>
        // nearest codeword by integer milli-L2², ties to the lower cw_id
        val (bestCw, bestD) = (0L until 8L).map { cw =>
          val cv = codebook(cw)
          val d = (s * 16 until s * 16 + 16).map { i =>
            val diff = milli(v(i)) - milli(cv(i)); diff * diff
          }.sum
          (cw, d)
        }.minBy { case (cw, d) => (d, cw) }
        (bestCw, bestD)
      }
      val expCodes = (perSub(0)._1, perSub(1)._1, perSub(2)._1, perSub(3)._1)
      val expErr = perSub.map(_._2).sum
      assert(got(id) == ((expCodes, expErr)),
        s"vec $id: query=${got(id)} bruteforce=${(expCodes, expErr)}")
    }
  }

  test("incremental ANN code appends: pinned reads are byte-stable, log is append-only") {
    // the ann_index_incremental maintenance contract in isolation, on a
    // fresh codes-shaped TxLog table: a reader pinned at codes v1 must
    // read identical bytes while the micro-batch append lands, the
    // append must touch zero existing segments, and the head must be
    // exactly v1 ∪ batch
    import graft.ops.TxLog
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("ann-codes-").resolve("codes").toString
    val v1 = Seq((8L, 0L), (9L, 1L), (10L, 0L)).toDF("vec_id", "bucket")
    TxLog.append(v1, t)
    val pinnedVersion = TxLog.currentVersion(t)
    val segsBefore = TxLog.liveFiles(t).toSet
    val before = TxLog.snapshot(spark, t, Some(pinnedVersion))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    // concurrent micro-batch append (codes for new vectors only)
    val batch = Seq((300L, 1L), (301L, 0L)).toDF("vec_id", "bucket")
    TxLog.append(batch, t)
    // pinned read: identical bytes after the append
    val after = TxLog.snapshot(spark, t, Some(pinnedVersion))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(after === before, "a pinned codes read must not see the append")
    // append-only geometry: one new segment, nothing removed or rewritten
    val m = TxLog.readManifest(t, pinnedVersion + 1)
    assert(m.adds.size === 1 && m.removes.isEmpty)
    assert(segsBefore.subsetOf(TxLog.liveFiles(t).toSet),
      "existing code segments must survive the incremental append untouched")
    // head = union of code appends
    assert(TxLog.snapshot(spark, t).as[(Long, Long)].collect().sorted.toSeq
      === (Seq((8L, 0L), (9L, 1L), (10L, 0L), (300L, 1L), (301L, 0L)).sorted))
  }
}
