package graft.ops

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns.
  *
  * All arithmetic is double-precision and STRICTLY SEQUENTIAL
  * (`aggregate` folds left-to-right), so a given pair of vectors produces
  * a bit-identical cosine on every engine that folds the same way — the
  * property the DuckDB oracle comparison relies on (`list_reduce` is the
  * sequential fold on that side). Per-row map work only: similarity
  * search built on these shuffles for the top-k/bucket join, never for
  * the arithmetic.
  */
object VectorOps {

  /** float[] -> double[] (exact widening). */
  def toDoubleVec(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential dot product — codegen'd native expression. */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(
      graft.functions.DotProduct(GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))

  /** Euclidean norm. */
  def norm(c: Column): Column = sqrt(dot(c, c))

  /** Cosine similarity — codegen'd native expression (bit-identical to
    * [[cosineHof]], pinned by test + oracle).
    */
  def cosine(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(
      graft.functions.CosineSimilarity(GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))

  /** Interpreted higher-order-function reference implementations, kept as
    * the executable spec the native expressions are pinned against.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(dotHof(a, a)) * sqrt(dotHof(b, b)))
}
