package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native one-pass MinHash signature over an `array<string>` shingle
  * column: per shingle one MD5 (the engine-portable 60-bit hash,
  * bit-identical to `TextOps.hash60` = `conv(substr(md5(s),1,15),16,10)`),
  * then all k=8 affine transforms `(a·(h mod P) + b) mod P` folded into
  * running minima — signature complete in a single traversal of the row.
  *
  * This replaces the explode → hash-aggregate signature shape
  * (`TextOps.minHashAgg`): same result (pinned by `TextOpsSpec` against
  * both the HOF spec and the agg form, and by the unchanged DuckDB oracle
  * hashes), but as pure codegen'd MAP work — no explode fan-out, no
  * map-side partial-min machinery, no shuffle at all. At corpus scale the
  * signature stage becomes embarrassingly parallel and the only shuffle
  * left in LSH dedup is the band-key self-join itself.
  *
  * Cost note: MD5 dominates either way; what this removes is the per-
  * shingle row materialization (explode multiplies the row count by ~doc
  * length) and the aggregate's hash-map probes per shingle.
  */
case class MinHashSignature(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  // empty input yields an array of nulls (min over nothing), matching the
  // HOF spec's array_min(transform([])) semantics — never a fake 0
  override def nullable: Boolean = child.nullable

  protected override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSignature.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  import graft.ops.TextOps.{HashPrime, MinHashA, MinHashB}

  private val K = MinHashA.length
  private val A = MinHashA.toArray
  private val B = MinHashB.toArray

  // MessageDigest is stateful; one instance per task thread
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Single-pass signature; called from both interpreted eval and the
    * generated code (a static call keeps the stage inside whole-stage
    * codegen — the loop itself is compiled Scala).
    */
  def compute(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val mins = Array.fill(K)(Long.MaxValue)
    val md = mdLocal.get()
    var seen = false
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        seen = true
        md.reset()
        val digest = md.digest(shingles.getUTF8String(i).getBytes)
        // first 15 hex chars = bytes 0..6 + the high nibble of byte 7,
        // exactly conv(substr(md5_hex, 1, 15), 16, 10)
        var h = 0L
        var b = 0
        while (b < 7) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
        h = (h << 4) | ((digest(7) & 0xf0L) >>> 4)
        val hp = h % HashPrime
        var j = 0
        while (j < K) {
          val g = (A(j) * hp + B(j)) % HashPrime
          if (g < mins(j)) mins(j) = g
          j += 1
        }
      }
      i += 1
    }
    if (!seen) new GenericArrayData(Array.fill[Any](K)(null))
    else new GenericArrayData(mins)
  }
}
