package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** A whole-operator custom plan: single-pass sort-merge AS-OF join.
  *
  * Spark has no native as-of join; the composable workaround
  * (union both sides + `last(..., ignoreNulls)` window — `join_asof` in
  * RelationalQueries) pays a union, a full-width window and a filter.
  * This operator is the direct physical form: both sides hash-partitioned
  * on the key and sorted by (key, ts, tie), then merged in ONE streaming
  * pass per partition — no window state, no union, right side buffered
  * one row at a time. This is preference order (c) from the build brief:
  * LogicalPlan + SparkStrategy + SparkPlan, registered through
  * `SparkSessionExtensions` (and `spark.experimental.extraStrategies`
  * for driver-owned sessions).
  *
  * Semantics (backward as-of, LEFT OUTER): for each left row, the LAST
  * right row with the same key and (ts, tie) <= (left.ts, left.tie),
  * lexicographically; no match → right columns null. The tie column makes
  * results total-ordered and engine-reproducible when timestamps collide
  * (same contract as the window formulation's ORDER BY ts, event_id).
  *
  * Scale: identical shuffle shape to a sort-merge join on the key —
  * EnsureRequirements co-partitions the children — and the merge is O(n)
  * per partition with O(1) state, any history length.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKey: Expression, rightKey: Expression,
                    leftTs: Expression, rightTs: Expression,
                    leftTie: Expression, rightTie: Expression,
                    forward: Boolean = false,
                    tolerance: Option[Long] = None,
                    nearest: Boolean = false)
    extends BinaryNode {
  require(!(forward && nearest), "as-of direction is backward, forward, OR nearest")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoin =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts, ltie, rtie, fwd, tol, near) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, ltie, rtie,
        fwd, tol, near) :: Nil
    case _ => Nil
  }
}

/** Merge pass, both directions. Backward (default): for each left row the
  * LAST same-key right row with (ts, tie) <= the left's — needs a
  * one-row best-match buffer. Forward: the FIRST same-key right row with
  * (ts, tie) >= the left's — no buffer at all: advance past everything
  * strictly earlier and the currently-buffered right row either matches
  * or nothing does. A right row is never consumed until some left row
  * passes it, so successive left rows can share the same forward match.
  */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression,
                        leftTie: Expression, rightTie: Expression,
                        forward: Boolean = false,
                        tolerance: Option[Long] = None,
                        nearest: Boolean = false)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // same co-partitioning contract as SortMergeJoin: EnsureRequirements
  // hash-exchanges both children on the key, compatibly
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending),
      SortOrder(leftTie, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  // proper SQL metrics: the operator reports itself in the Spark UI /
  // QueryExecution like any built-in join
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of left rows with a match"))

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)

  protected override def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lts = BindReferences.bindReference(leftTs, left.output)
    val ltie = BindReferences.bindReference(leftTie, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rts = BindReferences.bindReference(rightTs, right.output)
    val rtie = BindReferences.bindReference(rightTie, right.output)
    val outAttrs = output
    val rightWidth = right.output.size
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    // max staleness in the ts column's units (micros for timestamps);
    // Long.MaxValue = unbounded, so the hot loop stays branch-free
    val tol = tolerance.getOrElse(Long.MaxValue)

    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val project = UnsafeProjection.create(outAttrs, outAttrs)

      new Iterator[InternalRow] {
        // the single buffered right row (copied: scan rows are reused)
        private var rRow: InternalRow = _
        private var rKeyV, rTsV, rTieV = 0L
        private var rHave = false
        // the current best match, its key, and its ts (for tolerance)
        private var mRow: InternalRow = _
        private var mKey, mTsV = 0L
        pullRight()

        private def pullRight(): Unit = {
          rHave = false
          while (!rHave && ri.hasNext) {
            val r = ri.next()
            val k = rk.eval(r); val t = rts.eval(r); val e = rtie.eval(r)
            if (k != null && t != null && e != null) { // null keys match nothing
              rKeyV = k.asInstanceOf[Long]
              rTsV = t.asInstanceOf[Long]
              rTieV = e.asInstanceOf[Long]
              rRow = r.copy()
              rHave = true
            }
          }
        }

        override def hasNext: Boolean = li.hasNext

        override def next(): InternalRow = {
          val l = li.next()
          numOutputRows += 1
          val k = lk.eval(l); val t = lts.eval(l); val e = ltie.eval(l)
          if (k == null || t == null || e == null) return project(joined(l, nullRight))
          val lKeyV = k.asInstanceOf[Long]
          val lTsV = t.asInstanceOf[Long]
          val lTieV = e.asInstanceOf[Long]
          if (forward) {
            // advance past every right row STRICTLY before this left row;
            // the buffered row is then the first at-or-after (if same key)
            while (rHave && (rKeyV < lKeyV || (rKeyV == lKeyV &&
                (rTsV < lTsV || (rTsV == lTsV && rTieV < lTieV))))) {
              pullRight()
            }
            val r = if (rHave && rKeyV == lKeyV && rTsV - lTsV <= tol) {
              numMatched += 1; rRow
            } else nullRight
            project(joined(l, r))
          } else {
            // advance the right side through every row at-or-before this
            // left row in (key, ts, tie) order, keeping the last same-key row
            while (rHave && (rKeyV < lKeyV || (rKeyV == lKeyV &&
                (rTsV < lTsV || (rTsV == lTsV && rTieV <= lTieV))))) {
              if (rKeyV == lKeyV) { mRow = rRow; mKey = rKeyV; mTsV = rTsV }
              pullRight()
            }
            if (nearest) {
              // nearest = the closer of the backward best (mRow) and the
              // first not-yet-consumed forward row (rRow); ties prefer
              // backward. The forward row is NOT consumed, so later left
              // rows can still match it — same invariant as forward mode.
              val hasBack = mRow != null && mKey == lKeyV
              val hasFwd = rHave && rKeyV == lKeyV
              val r =
                if (hasBack && (!hasFwd || lTsV - mTsV <= rTsV - lTsV)) {
                  if (lTsV - mTsV <= tol) { numMatched += 1; mRow } else nullRight
                } else if (hasFwd && rTsV - lTsV <= tol) {
                  numMatched += 1; rRow
                } else nullRight
              project(joined(l, r))
            } else {
              val r = if (mRow != null && mKey == lKeyV && lTsV - mTsV <= tol) {
                numMatched += 1; mRow
              } else nullRight
              project(joined(l, r))
            }
          }
        }
      }
    }
  }
}

/** Public API for the operator. */
object AsOfJoinOps {

  private def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** Backward as-of left join. Column names must be unique across the two
    * sides (rename the right side first); key/ts/tie must be long-valued
    * (bigint or timestamp). `tolerance` (same units as ts — micros for
    * timestamps) bounds the match's staleness: a right row more than
    * `tolerance` older than the left row yields null instead — the
    * "last reading, but only if fresh" contract.
    */
  def joinBackward(left: DataFrame, right: DataFrame,
                   leftKey: String, leftTs: String, leftTie: String,
                   rightKey: String, rightTs: String, rightTie: String,
                   tolerance: Option[Long] = None): DataFrame =
    join(left, right, leftKey, leftTs, leftTie, rightKey, rightTs, rightTie,
      forward = false, tolerance)

  /** Forward as-of left join: for each left row the FIRST right row with
    * the same key and (ts, tie) >= the left's — the "next maintenance
    * window / next error after this click" direction. `tolerance` bounds
    * how far AHEAD the match may be.
    */
  def joinForward(left: DataFrame, right: DataFrame,
                  leftKey: String, leftTs: String, leftTie: String,
                  rightKey: String, rightTs: String, rightTie: String,
                  tolerance: Option[Long] = None): DataFrame =
    join(left, right, leftKey, leftTs, leftTie, rightKey, rightTs, rightTie,
      forward = true, tolerance)

  /** Nearest as-of left join: the same-key right row minimizing the
    * absolute time distance, in EITHER direction; equidistant candidates
    * resolve backward (then by the tie column, matching each direction's
    * own contract). `tolerance` bounds the distance. Still one merge pass
    * with O(1) state: the backward best plus the single buffered
    * forward row are the only two candidates that can win.
    */
  def joinNearest(left: DataFrame, right: DataFrame,
                  leftKey: String, leftTs: String, leftTie: String,
                  rightKey: String, rightTs: String, rightTie: String,
                  tolerance: Option[Long] = None): DataFrame =
    join(left, right, leftKey, leftTs, leftTie, rightKey, rightTs, rightTie,
      forward = false, tolerance, nearest = true)

  private def join(left: DataFrame, right: DataFrame,
                   leftKey: String, leftTs: String, leftTie: String,
                   rightKey: String, rightTs: String, rightTie: String,
                   forward: Boolean, tolerance: Option[Long] = None,
                   nearest: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    def checkType(a: Attribute): Attribute = {
      require(a.dataType == LongType || a.dataType == TimestampType,
        s"as-of column ${a.name} must be bigint/timestamp, got ${a.dataType}")
      a
    }
    val dup = (lp.output.map(_.name) ++ rp.output.map(_.name))
      .groupBy(identity).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"ambiguous output columns: ${dup.mkString(", ")}")
    GraftSqlBridge.ofRows(spark, AsOfJoin(lp, rp,
      checkType(attr(lp, leftKey)), checkType(attr(rp, rightKey)),
      checkType(attr(lp, leftTs)), checkType(attr(rp, rightTs)),
      checkType(attr(lp, leftTie)), checkType(attr(rp, rightTie)), forward,
      tolerance, nearest))
  }
}
