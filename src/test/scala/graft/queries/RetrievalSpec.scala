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
}
