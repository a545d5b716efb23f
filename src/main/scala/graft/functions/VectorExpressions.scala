package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the dense-vector hot path.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * semantically right but runs INTERPRETED, and a `transform(...)`
  * float→double cast upstream knocks the whole stage out of codegen.
  * Similarity search evaluates the dot product once per (query, candidate)
  * pair, so at embedding-corpus scale this is the hottest expression in
  * the engine. These `BinaryExpression`s compile to a tight primitive loop
  * inside whole-stage codegen AND read `array<float>` inputs directly
  * (exact widening per element), so the scan→similarity pipeline needs no
  * array conversion at all.
  *
  * Accumulation is strictly sequential (index 0..n-1) per accumulator, so
  * results are BIT-IDENTICAL to the interpreted fold over the
  * double-widened array and to the DuckDB oracle's `list_reduce` —
  * swapping implementations cannot change any query result (pinned by a
  * unit test and the oracle hashes). Mismatched dimensions yield NULL,
  * exactly like the HOF reference (`zip_with` pads the short side with
  * nulls, which nullify the fold) — never a silent truncated prefix.
  */
abstract class VectorFoldExpression extends BinaryExpression {
  // callers (VectorOps) guarantee array<float|double> inputs; the
  // ExpectsInputTypes trait is private[sql], so validation stays at the
  // API layer
  override def dataType: DataType = DoubleType

  // null out on dimension mismatch even when both inputs are non-null
  override def nullable: Boolean = true

  protected def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected def get(arr: ArrayData, i: Int, float: Boolean): Double =
    if (float) arr.getFloat(i).toDouble else arr.getDouble(i)

  /** Java source for reading element `$i` of `$arr` as a double. */
  protected def getter(arr: String, i: String, float: Boolean): String =
    if (float) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
}

/** Sequential-fold cosine similarity of two float/double arrays. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorFoldExpression {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (fa, fb) = (isFloat(left), isFloat(right))
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = get(a, i, fa); val y = get(b, i, fb)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, dot, na, nb, i) = (ctx.freshName("n"), ctx.freshName("dot"),
        ctx.freshName("na"), ctx.freshName("nb"), ctx.freshName("i"))
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double x = ${getter(a, i, isFloat(left))};
         |    double y = ${getter(b, i, isFloat(right))};
         |    $dot += x * y; $na += x * x; $nb += y * y;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Sequential-fold dot product of two float/double arrays. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorFoldExpression {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (fa, fb) = (isFloat(left), isFloat(right))
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var i = 0
    while (i < n) { dot += get(a, i, fa) * get(b, i, fb); i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, dot, i) = (ctx.freshName("n"), ctx.freshName("dot"), ctx.freshName("i"))
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ${getter(a, i, isFloat(left))} * ${getter(b, i, isFloat(right))};
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
