package graft.plans

import graft.ops.TxLog
import graft.sources.TxLogRelation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.LongType

/** AGGREGATE PUSHDOWN to the manifest: a global `count(*)` / `min(col)` /
  * `max(col)` over an unfiltered `format("txlog")` scan is answered from
  * the commit log's per-segment stats alone — the Aggregate collapses to
  * a one-row [[LocalRelation]] and NOT ONE FILE IS OPENED (Iceberg and
  * Delta both answer these from snapshot metadata; DSv2 spells it
  * `SupportsPushDownAggregates`, and this optimizer rule is the same
  * contract for the V1 relation).
  *
  * Fires only when the answer is provably exact:
  *   - grouping is global (no GROUP BY keys);
  *   - every aggregate expression is a bare non-distinct unfiltered
  *     `count(1)`/`count(*)`, or `min`/`max` of a LONG column the
  *     manifest tracks (stats are recorded cast-to-long, so only LONG
  *     columns read back exactly; manifest min/max exclude nulls exactly
  *     like SQL MIN/MAX);
  *   - the child is the relation under column-pruning Projects (bare
  *     attributes only) or subquery aliases — any Filter/Join keeps the
  *     scan;
  *   - the manifest answers: every live segment carries the needed stats
  *     and no deletion vector is in force (an honest planner must not
  *     guess — the [[TxLog.tableRowCount]]/[[TxLog.tableMinMax]] refusal
  *     contract).
  *
  * Registered via [[GraftExtensions]] (cluster config) or
  * [[ManifestCountRule.install]] (runtime, idempotent) — the same two
  * deployment paths as the native functions.
  */
object ManifestCountRule extends Rule[LogicalPlan] {

  /** Last (table, value) this rule answered from the manifest — spec and
    * query observability for I/O that provably did NOT happen (the value
    * is the row count, min, or max of the FIRST aggregate answered).
    * Test-only; racy under concurrent queries by design.
    */
  @volatile var lastAnswered: Option[(String, Long)] = None

  /** Idempotent runtime registration on an already-built session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  private def txlogScan(plan: LogicalPlan): Option[TxLogRelation] = plan match {
    case l: LogicalRelation => l.relation match {
      case r: TxLogRelation => Some(r)
      case _ => None
    }
    // a bare-attribute Project cannot change the row count or any
    // column's values; column pruning routinely inserts one under a
    // global aggregate. Renaming/computing Projects are excluded so the
    // aggregated attribute's name still names the table column.
    case Project(projectList, child)
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      txlogScan(child)
    case SubqueryAlias(_, child) => txlogScan(child)
    case _ => None
  }

  /** The manifest answer for one aggregate expression, if exact. */
  private def answer(ae: Expression, rel: TxLogRelation): Option[Long] = ae match {
    case AggregateExpression(Count(Seq(Literal(_, _))), _, false, None, _) =>
      TxLog.tableRowCount(rel.table, rel.asOf)
    case AggregateExpression(Min(a: AttributeReference), _, false, None, _)
        if a.dataType == LongType =>
      TxLog.tableMinMax(rel.table, a.name, rel.asOf).map(_._1)
    case AggregateExpression(Max(a: AttributeReference), _, false, None, _)
        if a.dataType == LongType =>
      TxLog.tableMinMax(rel.table, a.name, rel.asOf).map(_._2)
    case _ => None
  }

  private def unalias(e: NamedExpression): Expression = e match {
    case Alias(child, _) => child
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case a: Aggregate
        if a.groupingExpressions.isEmpty && a.aggregateExpressions.nonEmpty =>
      txlogScan(a.child).flatMap { rel =>
        val answers = a.aggregateExpressions.map(e => answer(unalias(e), rel))
        if (answers.exists(_.isEmpty)) None
        else {
          lastAnswered = Some((rel.table, answers.head.get))
          Some(LocalRelation(a.output,
            Seq(InternalRow.fromSeq(answers.map(_.get)))))
        }
      }.getOrElse(a)
  }
}
