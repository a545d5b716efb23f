package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import scala.collection.mutable

/** KMV (k-minimum-values) distinct sketch as a native
  * [[TypedImperativeAggregate]]: the k smallest DISTINCT hash values seen,
  * merged associatively — the fourth mergeable sketch in the engine beside
  * count-min (`agg_count_min`), HLL (`agg_hll_union`), and Misra–Gries
  * (`misra_gries`), and the one that composes into SET ALGEBRA: the k-min
  * union of two sketches is the sketch of the union, and membership
  * overlap inside the union sketch estimates Jaccard / intersection
  * (Beyer et al., "On synopses for distinct-value estimation under
  * multiset operations", SIGMOD'07). D̂ = (k−1)·2⁶⁰/h_k for 60-bit
  * uniform hashes.
  *
  * Unlike the counter sketches, KMV output is fully DETERMINISTIC — the
  * k smallest elements of a set do not depend on partitioning or merge
  * order — so the correctness gate hash-compares the sketch itself
  * against the oracle's `ORDER BY h LIMIT k`, not just a bound.
  *
  * Scale: O(k) longs per partial buffer regardless of input cardinality;
  * update is O(log k) (sorted-set insert + max eviction); a
  * 1000-executor scan ships k longs per task up the merge tree.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"kmv_sketch needs k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch input must be BIGINT (hash first), got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  override def update(buffer: mutable.TreeSet[Long],
                      input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: mutable.TreeSet[Long],
                     other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(add(buffer, _))
    buffer
  }

  /** Insert keeping only the k smallest distinct values: a duplicate is a
    * no-op (TreeSet), a value above the current k-th minimum is rejected
    * without growing the buffer.
    */
  private def add(buffer: mutable.TreeSet[Long], v: Long): Unit =
    if (buffer.size < k) buffer += v
    else if (v < buffer.last && !buffer.contains(v)) {
      buffer += v
      buffer -= buffer.last
    }

  /** Ascending array of the k (or fewer) minima — canonical and
    * merge-order-independent.
    */
  override def eval(buffer: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buffer.toArray)

  override def serialize(buffer: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val n = in.readInt()
    val buffer = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buffer += in.readLong(); i += 1 }
    buffer
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}
