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
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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

  /** The manifest answer for one aggregate expression, if exact — a
    * boxed Long for counts and long min/max, a UTF8String for STRING
    * min/max (per-segment `strMin`/`strMax` fold to exact SQL MIN/MAX
    * under binary collation; [[TxLog.tableMinMaxString]] refuses unless
    * every live segment tracks the column as string).
    */
  private def answer(ae: Expression, rel: TxLogRelation): Option[Any] = ae match {
    case AggregateExpression(Count(Seq(Literal(_, _))), _, false, None, _) =>
      TxLog.tableRowCount(rel.table, rel.asOf).map(java.lang.Long.valueOf)
    case AggregateExpression(Min(a: AttributeReference), _, false, None, _)
        if a.dataType == LongType =>
      TxLog.tableMinMax(rel.table, a.name, rel.asOf)
        .map(mm => java.lang.Long.valueOf(mm._1))
    case AggregateExpression(Max(a: AttributeReference), _, false, None, _)
        if a.dataType == LongType =>
      TxLog.tableMinMax(rel.table, a.name, rel.asOf)
        .map(mm => java.lang.Long.valueOf(mm._2))
    case AggregateExpression(Min(a: AttributeReference), _, false, None, _)
        if a.dataType == StringType =>
      TxLog.tableMinMaxString(rel.table, a.name, rel.asOf)
        .map(mm => UTF8String.fromString(mm._1))
    case AggregateExpression(Max(a: AttributeReference), _, false, None, _)
        if a.dataType == StringType =>
      TxLog.tableMinMaxString(rel.table, a.name, rel.asOf)
        .map(mm => UTF8String.fromString(mm._2))
    case _ => None
  }

  private def unalias(e: NamedExpression): Expression = e match {
    case Alias(child, _) => child
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case a: Aggregate if a.aggregateExpressions.nonEmpty =>
      (if (a.groupingExpressions.isEmpty)
        globalOverScan(a).orElse(globalOverPartitionSlice(a))
      else groupByPartition(a)).getOrElse(a)
  }

  /** The original global case: unfiltered scan, whole-table stats. */
  private def globalOverScan(a: Aggregate): Option[LogicalPlan] =
    txlogScan(a.child).flatMap { rel =>
      val answers = a.aggregateExpressions.map(e => answer(unalias(e), rel))
      if (answers.exists(_.isEmpty)) None
      else {
        lastAnswered = Some((rel.table, answers.head.get match {
          case n: java.lang.Long => n.longValue()
          case _ => -1L
        }))
        Some(LocalRelation(a.output,
          Seq(InternalRow.fromSeq(answers.map(_.get)))))
      }
    }

  /** `count(*) GROUP BY <partition cols>` answered from manifest paths +
    * per-segment row counts (VERDICT r13 item 5; r15 extends to ANY
    * subset of the partition layout): the Aggregate collapses to one
    * local row per partition value TUPLE — partition counts are
    * metadata-scale, never data-scale. Fires only when every grouping
    * expression is a bare partition-column attribute and every output is
    * one of those attributes or an exact manifest count.
    */
  private def groupByPartition(a: Aggregate): Option[LogicalPlan] =
    for {
      attrs <- {
        val as = a.groupingExpressions.map {
          case ar: AttributeReference => Some(ar)
          case _ => None
        }
        if (as.isEmpty || as.exists(_.isEmpty)) None else Some(as.map(_.get))
      }
      rel <- txlogScan(a.child)
      if attrs.forall(ar => rel.partitionCols.contains(ar.name)) &&
        attrs.map(_.name).distinct.size == attrs.size
      counts <- TxLog.partitionRowCountsMulti(
        rel.table, attrs.map(_.name), rel.asOf)
      builders <- {
        val bs = a.aggregateExpressions.map(unalias).map {
          // a null partition (Hive default dir) groups as SQL NULL —
          // UTF8String.fromString(null) is null, the right InternalRow value
          case ar: AttributeReference
              if attrs.exists(_.semanticEquals(ar)) =>
            val i = attrs.indexWhere(_.semanticEquals(ar))
            Some((vs: Seq[String], _: Long) =>
              org.apache.spark.unsafe.types.UTF8String.fromString(vs(i)): Any)
          case AggregateExpression(Count(Seq(Literal(_, _))), _, false, None, _) =>
            Some((_: Seq[String], n: Long) => n: Any)
          case _ => None
        }
        if (bs.exists(_.isEmpty)) None else Some(bs.map(_.get))
      }
    } yield {
      lastAnswered = Some((rel.table, counts.map(_._2).sum))
      LocalRelation(a.output,
        counts.map { case (vs, n) => InternalRow.fromSeq(builders.map(_(vs, n))) })
    }

  /** Global count/min/max under a conjunction of PARTITION-KEY equality
    * predicates: the slice's segments are picked by path, their stats
    * folded — no file opened. Empty slices answer count 0 and NULL
    * min/max, exactly the SQL semantics.
    */
  private def globalOverPartitionSlice(a: Aggregate): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    def stripped(p: LogicalPlan): LogicalPlan = p match {
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        stripped(child)
      case SubqueryAlias(_, child) => stripped(child)
      case other => other
    }
    stripped(a.child) match {
      case Filter(cond, grandchild) =>
        for {
          rel <- txlogScan(grandchild)
          eqs <- partitionEqualities(cond, rel)
          slice <- TxLog.partitionSliceStats(rel.table, eqs, rel.asOf)
          answers <- {
            val as = a.aggregateExpressions.map(e => sliceAnswer(unalias(e), slice))
            if (as.exists(_.isEmpty)) None else Some(as.map(_.get))
          }
        } yield {
          lastAnswered = Some((rel.table, answers.head match {
            case n: java.lang.Long => n.longValue()
            case _ => -1L
          }))
          LocalRelation(a.output, Seq(InternalRow.fromSeq(answers)))
        }
      case _ => None
    }
  }

  /** Decompose `cond` into partition-column string equalities; None if
    * any conjunct is anything else (the scan must then run).
    */
  private def partitionEqualities(cond: Expression,
                                  rel: TxLogRelation): Option[Seq[(String, String)]] = {
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo}
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val eqs = conjuncts(cond).map {
      case EqualTo(ar: AttributeReference, Literal(v, org.apache.spark.sql.types.StringType))
          if rel.partitionCols.contains(ar.name) && v != null =>
        Some(ar.name -> v.toString)
      case EqualTo(Literal(v, org.apache.spark.sql.types.StringType), ar: AttributeReference)
          if rel.partitionCols.contains(ar.name) && v != null =>
        Some(ar.name -> v.toString)
      case _ => None
    }
    if (eqs.exists(_.isEmpty)) None else Some(eqs.map(_.get))
  }

  /** One aggregate's answer from a partition slice's stats records —
    * boxed (min/max of an empty slice is SQL NULL).
    */
  private def sliceAnswer(ae: Expression,
                          slice: Seq[TxLog.SegStats]): Option[Any] = ae match {
    case AggregateExpression(Count(Seq(Literal(_, _))), _, false, None, _) =>
      val rows = slice.map(_.rows)
      if (rows.exists(_.isEmpty)) None
      else Some(java.lang.Long.valueOf(rows.flatten.sum))
    case AggregateExpression(Min(attr: AttributeReference), _, false, None, _)
        if attr.dataType == LongType =>
      if (slice.isEmpty) Some(null)
      else {
        val per = slice.map(_.statsFor(attr.name))
        if (per.exists(_.isEmpty) || per.flatten.exists(_.isString)) None
        else Some(java.lang.Long.valueOf(per.flatten.map(_.min).min))
      }
    case AggregateExpression(Max(attr: AttributeReference), _, false, None, _)
        if attr.dataType == LongType =>
      if (slice.isEmpty) Some(null)
      else {
        val per = slice.map(_.statsFor(attr.name))
        if (per.exists(_.isEmpty) || per.flatten.exists(_.isString)) None
        else Some(java.lang.Long.valueOf(per.flatten.map(_.max).max))
      }
    case AggregateExpression(Min(attr: AttributeReference), _, false, None, _)
        if attr.dataType == StringType =>
      if (slice.isEmpty) Some(null)
      else {
        // UTF8-binary fold (ADVICE r15): the per-segment bounds were
        // recorded under Spark's binary collation, and this answer is
        // substituted for a real MIN — a Java-ordered fold would return
        // the wrong bound for supplementary-plane strings
        val per = slice.map(_.statsFor(attr.name).flatMap(_.strMin))
        if (per.exists(_.isEmpty)) None
        else Some(UTF8String.fromString(per.flatten.min(TxLog.Utf8Ordering)))
      }
    case AggregateExpression(Max(attr: AttributeReference), _, false, None, _)
        if attr.dataType == StringType =>
      if (slice.isEmpty) Some(null)
      else {
        val per = slice.map(_.statsFor(attr.name).flatMap(_.strMax))
        if (per.exists(_.isEmpty)) None
        else Some(UTF8String.fromString(per.flatten.max(TxLog.Utf8Ordering)))
      }
    case _ => None
  }
}
