package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional file clustering.
  *
  * Sorting a table by ONE column gives tight parquet row-group min/max
  * bounds on that column only; range-partitioning + sorting by the
  * INTERLEAVED bits of two columns gives useful bounds on BOTH, so scans
  * filtered on either dimension skip most files — the layout trick behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`. Composed entirely from built-in
  * bit expressions (shiftleft / & / |), so the key computation is plain
  * codegen'd map work — no custom expression, no UDF, no shuffle beyond
  * the final range partitioning.
  *
  * Bit-spreading uses the standard mask sequence (public-domain
  * bit-twiddling identity): each step doubles the gap between the
  * payload bits, giving x15..x0 → x15 0 x14 0 … x0.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to the even bit positions of a 32-bit
    * value: 0xABCD → 0x0A0B0C0D-style interleave spacing.
    */
  def spread16(c: Column): Column = {
    val s0 = (c.bitwiseAND(lit(0xFFFFL)))
    val s1 = (s0.bitwiseOR(shiftleft(s0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key of two 16-bit dimensions: bits of `x` at even
    * positions, bits of `y` at odd positions.
    */
  def zkey(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** The DuckDB-side SQL for the same spread, for oracle parity. */
  def spread16Sql(e: String): String = {
    val s0 = s"(($e) & 65535)"
    val s1 = s"(($s0 | ($s0 << 8)) & 16711935)"
    val s2 = s"(($s1 | ($s1 << 4)) & 252645135)"
    val s3 = s"(($s2 | ($s2 << 2)) & 858993459)"
    s"(($s3 | ($s3 << 1)) & 1431655765)"
  }

  def zkeySql(x: String, y: String): String =
    s"(${spread16Sql(x)} | (${spread16Sql(y)} << 1))"

  /** Driver-side scalar twin of [[zkey]] (same mask sequence) — used by
    * the TxLog z-order box read to turn an aligned (x, y) box into its
    * contiguous Morton range without a Spark job.
    */
  def zkeyScalar(x: Long, y: Long): Long = {
    def spread(v: Long): Long = {
      var s = v & 0xFFFFL
      s = (s | (s << 8)) & 0x00FF00FFL
      s = (s | (s << 4)) & 0x0F0F0F0FL
      s = (s | (s << 2)) & 0x33333333L
      (s | (s << 1)) & 0x55555555L
    }
    spread(x) | (spread(y) << 1)
  }

  /** Cluster a frame for two-dimensional file skipping: range-partition
    * by the Morton key (so each output file owns a contiguous z-curve
    * segment = a small rectangle in (x, y) space) and sort within
    * partitions so row-group min/max bounds are tight on both columns.
    */
  def cluster(df: DataFrame, x: Column, y: Column, numFiles: Int): DataFrame =
    df.withColumn("__z", zkey(x, y))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  // ---- N-dimensional generalization (VERDICT r15 item 5) ---------------
  // Delta's OPTIMIZE ZORDER BY accepts N columns; the 2-D fast path above
  // keeps its magic-mask spread, while N >= 3 interleaves with a generic
  // stride-N spread composed from the same shift/mask/OR built-ins —
  // still plain codegen'd map work, evaluated once per row at rewrite
  // time.

  /** Bits kept per dimension for an N-dim key: 16 (the 2-D contract) while
    * N*16 fits a positive long, shrinking beyond — 4 dims → 15 bits each.
    */
  def bitsFor(n: Int): Int = math.min(16, 62 / n)

  /** Spread the low `bits` bits of `c` to stride-`n` positions (payload
    * bit i lands at position i*n) — the generic interleave spacing.
    */
  def spreadN(c: Column, n: Int, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n)
    }.reduce(_.bitwiseOR(_))

  /** N-dimensional Morton key: dim j's payload bit i lands at position
    * j + i*N. N=2 delegates to the mask-sequence [[zkey]] (identical
    * output — ZOrderSpec pins the equivalence).
    */
  def zkeyN(dims: Seq[Column]): Column = {
    require(dims.size >= 2, s"zkeyN needs >= 2 dimensions, got ${dims.size}")
    if (dims.size == 2) zkey(dims.head, dims(1))
    else {
      val b = bitsFor(dims.size)
      val mask = (1L << b) - 1
      dims.zipWithIndex.map { case (c, j) =>
        shiftleft(spreadN(c.bitwiseAND(lit(mask)), dims.size, b), j)
      }.reduce(_.bitwiseOR(_))
    }
  }

  /** Driver-side scalar twin of [[zkeyN]] — box-read range computation. */
  def zkeyScalarN(xs: Seq[Long]): Long = {
    require(xs.size >= 2, s"zkeyScalarN needs >= 2 dimensions, got ${xs.size}")
    if (xs.size == 2) zkeyScalar(xs.head, xs(1))
    else {
      val n = xs.size
      val b = bitsFor(n)
      xs.zipWithIndex.map { case (x, j) =>
        var acc = 0L
        var i = 0
        while (i < b) { acc |= ((x >> i) & 1L) << (i * n); i += 1 }
        acc << j
      }.reduce(_ | _)
    }
  }
}
