package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingling over an `array<string>` token column:
  * `["a","b","c","d"]`, n=3 → `["a b c", "b c d"]`.
  *
  * Bit-identical to the HOF spec it replaces
  * (`transform(sequence(1, size-n+1), i -> concat_ws(" ", slice(toks, i, n)))`
  * with short inputs mapped to an explicit empty array — pinned by
  * `TextVectorOpsSpec`), but Catalyst higher-order functions are
  * CodegenFallback: every row of every shingle consumer (LSH banding,
  * 5-gram fingerprints, contamination shingles, n-gram tops) dropped out
  * of whole-stage codegen to interpret the lambda. This expression is one
  * compiled loop — a static call from generated code, so the projection
  * stays inside the stage — and shingling is pure map work again at any
  * corpus scale.
  */
case class WordShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = child.nullable

  protected override def nullSafeEval(input: Any): Any =
    WordShinglesExpr.compute(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShinglesExpr.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShinglesExpr {

  private val Space = UTF8String.fromString(" ")

  /** Called from both interpreted eval and generated code. `concat_ws`
    * semantics on each window: null tokens are skipped, not rendered —
    * tokens from `split()` are never null, but the contract matches the
    * spec form exactly for any input.
    */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val sz = toks.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](sz - n + 1)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= sz - n) {
      var j = 0
      while (j < n) {
        // concatWs skips nulls, mirroring concat_ws
        window(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
