package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Bit-parallel Levenshtein distance with threshold semantics — a drop-in
  * for Spark's 3-arg `levenshtein(l, r, threshold)` (distance when it is
  * ≤ threshold, −1 otherwise) built on Myers' 1999 bit-vector algorithm
  * in its blocked form (Hyyrö's generalization to patterns longer than
  * one machine word).
  *
  * Why: the fuzzy-verify family runs an exact edit-distance kernel over
  * its surviving candidate pairs, and with a band of len/5 the cell DP
  * costs O(len²/5) character comparisons per pair — the measured floor of
  * `dedup_fuzzy_verify` at sf1. Myers packs 64 DP-matrix cells into each
  * machine word: the same exact distance falls out of O(len · ⌈len/64⌉)
  * word operations, ~12× fewer operations at the corpus' document
  * lengths. The early-abandon check (the running score can decrease by at
  * most 1 per remaining text symbol) restores the banded kernel's fast
  * bail-out for over-threshold pairs.
  *
  * Exactness: the distance is the true unbanded Levenshtein distance over
  * UNICODE CODE POINTS (matching `UTF8String.levenshteinDistance` and the
  * DuckDB oracle); ASCII inputs take a byte-array fast path, anything
  * else widens to code points. Pinned against Spark's own `levenshtein`
  * on randomized inputs in `TextVectorOpsSpec`.
  */
case class LevenshteinBPExpr(first: Expression, second: Expression,
                             third: Expression) extends TernaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable

  protected override def nullSafeEval(l: Any, r: Any, thr: Any): Any =
    LevenshteinBPExpr.distance(l.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String], thr.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r, t) =>
      s"${ev.value} = graft.functions.LevenshteinBPExpr.distance($l, $r, $t);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object LevenshteinBPExpr {

  /** `levenshtein(a, b, threshold)` semantics: the exact distance when it
    * is ≤ `threshold`, −1 otherwise. Static so generated code stays
    * inside whole-stage codegen.
    */
  def distance(a: UTF8String, b: UTF8String, threshold: Int): Int = {
    if (threshold < 0) return -1
    if (a.equals(b)) return 0
    val ab = a.getBytes
    val bb = b.getBytes
    val (p, t) = // symbols as ints: bytes when pure ASCII, else code points
      if (isAscii(ab) && isAscii(bb)) (widen(ab), widen(bb))
      else (a.toString.codePoints().toArray, b.toString.codePoints().toArray)
    // pattern = the SHORTER string (fewer blocks); distance is symmetric
    val (pat, txt) = if (p.length <= t.length) (p, t) else (t, p)
    val m = pat.length
    val n = txt.length
    if (n - m > threshold) return -1
    if (m == 0) return n // n <= threshold by the gate above
    val d =
      if (m <= 64) myers1(pat, txt, threshold)
      else myers(pat, txt, threshold)
    if (d > threshold) -1 else d
  }

  /** Single-block specialization (m ≤ 64): no block arrays, no carry
    * chain, and a flat 256-entry mask table when every symbol is a byte —
    * short keys (phones, codes) are allocation-bound, not compute-bound.
    */
  private def myers1(pat: Array[Int], txt: Array[Int], threshold: Int): Int = {
    val m = pat.length
    val n = txt.length
    var maxSym = 0
    var i = 0
    while (i < m) { if (pat(i) > maxSym) maxSym = pat(i); i += 1 }
    val flat = if (maxSym < 256) new Array[Long](256) else null
    val peq = if (flat == null) new java.util.HashMap[Integer, java.lang.Long]() else null
    i = 0
    while (i < m) {
      if (flat != null) flat(pat(i)) |= 1L << i
      else {
        val prev = peq.get(pat(i))
        peq.put(pat(i), java.lang.Long.valueOf(
          (if (prev == null) 0L else prev.longValue()) | (1L << i)))
      }
      i += 1
    }
    var pv = -1L
    var mv = 0L
    var score = m
    val topBit = 1L << (m - 1)
    var j = 0
    while (j < n) {
      val c = txt(j)
      val eq =
        if (flat != null) { if (c < 256) flat(c) else 0L }
        else { val e = peq.get(c); if (e == null) 0L else e.longValue() }
      val xv = eq | mv
      val xh = (((eq & pv) + pv) ^ pv) | eq
      var ph = mv | ~(xh | pv)
      var mh = pv & xh
      if ((ph & topBit) != 0L) score += 1
      else if ((mh & topBit) != 0L) score -= 1
      ph = (ph << 1) | 1L
      mh = mh << 1
      pv = mh | ~(xv | ph)
      mv = ph & xv
      j += 1
      if (score - (n - j) > threshold) return threshold + 1
    }
    score
  }

  private def isAscii(bytes: Array[Byte]): Boolean = {
    var i = 0
    while (i < bytes.length) { if (bytes(i) < 0) return false; i += 1 }
    true
  }

  private def widen(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i) & 0xff; i += 1 }
    out
  }

  /** Blocked Myers: pattern bits packed 64 per word, carries chained
    * through the blocks; the score is tracked at the pattern's top bit
    * ((m−1) mod 64 of the last block — bits above it are never read, and
    * word carries only flow upward, so they stay inert). Early abandon:
    * after consuming text symbol j+1 the final distance is at least
    * `score − (n − j − 1)`; once that exceeds `threshold` no suffix can
    * recover, exactly the banded DP's bail-out. Returns the exact
    * distance when ≤ threshold; any value > threshold means "over".
    */
  private def myers(pat: Array[Int], txt: Array[Int], threshold: Int): Int = {
    val m = pat.length
    val n = txt.length
    val blocks = (m + 63) >>> 6
    // symbol -> per-block pattern-position bitmask
    val peq = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    while (i < m) {
      var masks = peq.get(pat(i))
      if (masks == null) { masks = new Array[Long](blocks); peq.put(pat(i), masks) }
      masks(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    val pv = Array.fill(blocks)(-1L)
    val mv = new Array[Long](blocks)
    val zeros = new Array[Long](blocks)
    val topBit = 1L << ((m - 1) & 63)
    val last = blocks - 1
    var score = m
    var j = 0
    while (j < n) {
      val eqBlocks = {
        val e = peq.get(txt(j))
        if (e == null) zeros else e
      }
      var phIn = 1L // boundary column D[0][j] = j: Ph carry-in is 1
      var mhIn = 0L
      var bi = 0
      while (bi < blocks) {
        val pvB = pv(bi)
        val mvB = mv(bi)
        var eq = eqBlocks(bi) | mhIn
        val xh = (((eq & pvB) + pvB) ^ pvB) | eq
        var ph = mvB | ~(xh | pvB)
        var mh = pvB & xh
        if (bi == last) {
          if ((ph & topBit) != 0L) score += 1
          else if ((mh & topBit) != 0L) score -= 1
        }
        val phOut = ph >>> 63
        val mhOut = mh >>> 63
        ph = (ph << 1) | phIn
        mh = (mh << 1) | mhIn
        pv(bi) = mh | ~((eqBlocks(bi) | mvB) | ph)
        mv(bi) = ph & (eqBlocks(bi) | mvB)
        phIn = phOut
        mhIn = mhOut
        bi += 1
      }
      j += 1
      if (score - (n - j) > threshold) return threshold + 1 // early abandon
    }
    score
  }
}
