package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native one-pass 60-bit SimHash over an `array<string>` token column:
  * per token one MD5 (the engine-portable 60-bit hash, bit-identical to
  * `TextOps.hash60`), its 60 bits folded as ±1 into per-bit counters,
  * then bit i of the result is set iff counter i ≥ 0 — the whole
  * signature from a single traversal of the row.
  *
  * This replaces the explode → 60-bit-sum hash-aggregate shape
  * (`TextOps.simHashAgg`): same result for every non-empty token array
  * (pinned by `TextVectorOpsSpec` against both the HOF spec and the agg
  * form, and by the unchanged DuckDB oracle hashes), but as pure
  * codegen'd MAP work — no explode fan-out (×tokens-per-doc rows), no
  * shuffle of (doc_id, hash) pairs, no 60-column aggregate state. The
  * one semantic edge the agg form cannot even express — a doc with ZERO
  * tokens simply vanishes from a groupBy over its exploded tokens — is
  * null here, never a fabricated signature.
  */
case class SimHash60Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    SimHash60Expr.compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sig = ctx.freshName("sig")
      // compute() returns null for an empty/all-null array — box, test,
      // then unbox, so the null never hits a primitive assignment
      s"""
         |java.lang.Long $sig = graft.functions.SimHash60Expr.compute($c);
         |if ($sig == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $sig.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60Expr {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Single-pass signature; static so the generated code stays inside
    * whole-stage codegen. Returns a boxed Long or null (no tokens).
    */
  def compute(tokens: ArrayData): java.lang.Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](60)
    val md = mdLocal.get()
    var seen = false
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        seen = true
        md.reset()
        val digest = md.digest(tokens.getUTF8String(i).getBytes)
        // first 15 hex chars = bytes 0..6 + the high nibble of byte 7,
        // exactly conv(substr(md5_hex, 1, 15), 16, 10)
        var h = 0L
        var b = 0
        while (b < 7) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
        h = (h << 4) | ((digest(7) & 0xf0L) >>> 4)
        var bit = 0
        while (bit < 60) {
          counts(bit) += (((h >>> bit) & 1L).toInt * 2 - 1)
          bit += 1
        }
      }
      i += 1
    }
    if (!seen) null
    else {
      var sig = 0L
      var bit = 0
      while (bit < 60) {
        if (counts(bit) >= 0) sig |= (1L << bit)
        bit += 1
      }
      java.lang.Long.valueOf(sig)
    }
  }
}
