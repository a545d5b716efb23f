package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Misra–Gries heavy-hitter summary as a native
  * [[TypedImperativeAggregate]]: at most `k` (key, count) counters per
  * partial buffer, merged associatively across partitions — the third
  * mergeable sketch in the engine beside count-min (`agg_count_min`) and
  * HLL (`agg_hll_union`), and the one with DETERMINISTIC guarantees:
  * for a stream of n rows, every key satisfies
  *
  *   exact − n/(k+1)  ≤  est  ≤  exact
  *
  * and any key with exact > n/(k+1) is guaranteed present — regardless
  * of partitioning or merge order (the mergeable-summaries result of
  * Agarwal et al., PODS'12). That order-independence is what lets the
  * correctness gate pin the bound as an always-true boolean while the
  * underlying counter values legitimately vary run-to-run.
  *
  * Scale: the buffer is O(k) per partial — a 1000-executor scan of
  * 100 TB ships k counters per task up the merge tree, never the keys'
  * cardinality. Update is O(1) amortized (the compress step charges one
  * decrement per surviving counter).
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"Misra-Gries needs at least one counter, got $k")

  // analysis-time type check (the ExpectsInputTypes trait is private[sql],
  // same note as VectorExpressions): a bigint child fails the analyzer
  // with a clear message instead of a task-side ClassCastException
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries key must be STRING (cast first), got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buffer: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy out of Spark's reused row buffer before using as a map key
      val key = v.asInstanceOf[UTF8String].toString
      buffer.updateWith(key) {
        case Some(c) => Some(c + 1L)
        case None => Some(1L)
      }
      if (buffer.size > k) compress(buffer)
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (key, c) =>
      buffer.updateWith(key) {
        case Some(c0) => Some(c0 + c)
        case None => Some(c)
      }
    }
    while (buffer.size > k) compress(buffer)
    buffer
  }

  /** Subtract the (k+1)-th largest count from every counter and drop the
    * non-positive ones. Each compress removes ≥ (k+1)·c total weight while
    * reducing any single key's counter by exactly c — the charging argument
    * behind the n/(k+1) bound.
    *
    * The update path always compresses at size k+1, where the (k+1)-th
    * largest IS the minimum — an O(k) scan, keeping update O(k) worst-case
    * with no allocation-and-sort per new key on a high-cardinality stream.
    * Only the merge path (size up to 2k, once per shuffled partial) pays
    * the sort.
    */
  private def compress(buffer: mutable.HashMap[String, Long]): Unit = {
    val c =
      if (buffer.size == k + 1) buffer.values.min
      else {
        val counts = buffer.values.toArray
        java.util.Arrays.sort(counts)
        counts(counts.length - 1 - k) // (k+1)-th largest
      }
    buffer.filterInPlace((_, v) => v > c)
    if (c > 0) buffer.mapValuesInPlace((_, v) => v - c)
  }

  /** Sorted-by-key array of (key, est) structs — a canonical rendering of
    * the summary (the VALUES are merge-order-dependent; consumers assert
    * the bounds, not the values).
    */
  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    val rows = buffer.toArray.sortBy(_._1).map { case (key, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(key), c))
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (key, c) =>
      val b = key.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val n = in.readInt()
    val buffer = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buffer.put(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buffer
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}
