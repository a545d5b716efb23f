package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native engine-portable 60-bit hash: the value of
  * `conv(substring(md5(s), 1, 15), 16, 10)` — the cross-engine hash every
  * sampling/splitting/fingerprinting query keys on — computed straight
  * from the MD5 digest bytes. The built-in chain materializes a 32-char
  * hex string, substrings it, and re-parses base-16; this expression
  * takes bytes 0..6 plus the high nibble of byte 7 with shifts, so the
  * hot hashing paths (per-token, per-shingle, per-frame) do one digest
  * and zero string round-trips per value. Bit-identical to the spec form
  * (pinned in `TextVectorOpsSpec`), so every DuckDB oracle using
  * `('0x'||substr(md5(x),1,15))::BIGINT` is unchanged.
  *
  * Same codegen discipline as [[MinHashSignature]]: a static `compute`
  * call keeps the stage inside whole-stage codegen.
  */
case class PortableHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"portable_hash60 needs a string argument, got ${child.dataType}")
  }

  protected override def nullSafeEval(input: Any): Any =
    PortableHash60.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PortableHash60 {

  // MessageDigest is stateful; one instance per task thread
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(s: UTF8String): Long = {
    val md = mdLocal.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    // first 15 hex chars = bytes 0..6 + the high nibble of byte 7,
    // exactly conv(substr(md5_hex, 1, 15), 16, 10); 60 bits, never negative
    var h = 0L
    var b = 0
    while (b < 7) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
    (h << 4) | ((digest(7) & 0xf0L) >>> 4)
  }
}
