package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Scored candidate (similarity search: cosine + vector id). */
case class Scored(score: Double, id: Long)

/** Bounded top-k buffer; kept as a sorted Seq because k is small (the
  * board is the state, not the stream).
  */
case class TopKBuf(items: Seq[Scored])

/** Typed top-k aggregator: keeps the k highest-scored items per group with
  * deterministic tie-breaking (score desc, then id asc).
  *
  * This is the aggregation-shaped alternative to a rank-filtered window
  * for top-k-per-group: state is O(k) per group, partials merge
  * associatively on the map side, and NO sort of the full group ever
  * happens — the shape that wins when groups are huge and k is small
  * (top-k candidates per query over a 100 TB embedding corpus). Usable
  * untyped via `functions.udaf(new TopKAggregator(k))`.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, TopKBuf, Seq[Scored]] {

  private def trim(items: Seq[Scored]): Seq[Scored] =
    items.sortBy(s => (-s.score, s.id)).take(k)

  override def zero: TopKBuf = TopKBuf(Seq.empty)

  override def reduce(b: TopKBuf, a: Scored): TopKBuf = {
    // fast reject without sorting when the buffer is full and `a` is
    // clearly below the current floor
    if (b.items.length >= k) {
      val floor = b.items.last
      if (a.score < floor.score || (a.score == floor.score && a.id > floor.id)) return b
    }
    TopKBuf(trim(b.items :+ a))
  }

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = TopKBuf(trim(x.items ++ y.items))

  override def finish(r: TopKBuf): Seq[Scored] = r.items

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
