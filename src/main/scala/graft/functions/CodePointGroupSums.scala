package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass grouped code-point sums over a string's first
  * `nChars` characters: group g (of length `groupLen`) holds
  * Σ cp(p) — or Σ cp(p)² when `squared` — for positions
  * p ∈ [g·groupLen, (g+1)·groupLen). Returns `array<bigint>` of
  * `nChars / groupLen` entries.
  *
  * This replaces the `explode(sequence(0, 255))` →
  * `ascii(substring(text, pos+1, 1))` → hash-aggregate shape of the
  * multimodal tile/frame/window queries (r16, guide §1.2/§2.3/§2.4):
  * that form fans every row out ×256, pays an O(pos) UTF-8 seek per
  * exploded position (O(nChars²) character scans per row), and shuffles
  * the fan-out through a per-(media, group) aggregate. Here the sums
  * come from a single forward traversal of the string inside
  * whole-stage codegen — no explode, no per-position substring, no
  * aggregation exchange. Values are code points, identical to Spark's
  * `ascii(substring(s, p+1, 1))` and DuckDB's `ascii(substring(...))`
  * on every string either engine accepts; positions past the end of the
  * string contribute 0, exactly as `ascii('') = 0` did. Pinned
  * equivalent to the explode+agg form in `MultimodalSpec`.
  */
case class CodePointGroupSums(child: Expression, groupLen: Int, nChars: Int,
                              squared: Boolean) extends UnaryExpression {
  require(groupLen > 0 && nChars > 0 && nChars % groupLen == 0,
    s"nChars ($nChars) must be a positive multiple of groupLen ($groupLen)")

  // fail at ANALYSIS on a non-string child, not with a runtime
  // ClassCastException inside eval/codegen (ADVICE r16)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"CodePointGroupSums requires a STRING child, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  protected override def nullSafeEval(input: Any): Any =
    CodePointGroupSums.compute(
      input.asInstanceOf[UTF8String], groupLen, nChars, squared)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CodePointGroupSums.compute(" +
        s"$c, $groupLen, $nChars, $squared);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CodePointGroupSums {

  /** Single forward pass; static so generated code stays inside
    * whole-stage codegen. ASCII strings (numBytes == numChars) sum raw
    * bytes directly; otherwise one String materialization and a
    * code-point walk.
    */
  def compute(s: UTF8String, groupLen: Int, nChars: Int,
              squared: Boolean): GenericArrayData = {
    val nGroups = nChars / groupLen
    val sums = new Array[Long](nGroups)
    if (s.numBytes == s.numChars) { // pure-ASCII fast path: byte == code point
      val b = s.getBytes
      val n = math.min(b.length, nChars)
      var p = 0
      while (p < n) {
        val v = (b(p) & 0xff).toLong
        sums(p / groupLen) += (if (squared) v * v else v)
        p += 1
      }
    } else {
      val str = s.toString
      var i = 0
      var p = 0
      while (i < str.length && p < nChars) {
        val cp = str.codePointAt(i)
        val v = cp.toLong
        sums(p / groupLen) += (if (squared) v * v else v)
        i += Character.charCount(cp)
        p += 1
      }
    }
    new GenericArrayData(sums)
  }
}
