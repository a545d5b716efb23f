package graft.sources

import graft.ops.TxLog
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Row, SQLContext, SparkSession}

/** `spark.read.format("txlog")` — the standard Spark spelling for the
  * transactional lake ([[graft.ops.TxLog]]), so a reader needs no
  * library API at all:
  *
  * {{{
  *   spark.read.format("txlog").load(tablePath)                  // head
  *   spark.read.format("txlog")
  *     .option("versionAsOf", 3).load(tablePath)                 // time travel
  * }}}
  *
  * Implemented as a V1 `PrunedFilteredScan`: Spark hands the relation
  * the query's pushable predicates and required columns, and
  * `buildScan` turns range/point predicates on the table's tracked
  * stats column into MANIFEST SEGMENT PRUNING (min/max skipping via
  * [[TxLog.snapshotPruned]]) before any file is opened — the same
  * planning-time skipping `snapshot()` callers get explicitly, now
  * driven by the optimizer's pushdown. Column pruning applies to the
  * inner parquet scan (projection before `.rdd`). Every filter is
  * reported unhandled, so Spark re-applies predicates row-level —
  * segment skipping is a superset guarantee, exactly like parquet
  * row-group skipping.
  *
  * Reference parity note: the reference reads everything through
  * `spark.read.<format>` (`/root/reference/scripts/pyspark.py:49-84`);
  * this gives its lake tables the same entry point.
  */
final class TxLogBatchSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "txlog"

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val table = parameters.getOrElse("path", throw new IllegalArgumentException(
      "txlog batch source requires .load(tablePath)"))
    val asOf = parameters.get("versionAsOf").map(_.toLong)
    new TxLogRelation(sqlContext, table, asOf)
  }
}

object TxLogBatchSource {
  /** Last (scanned, total) segment counts of a pruned buildScan — spec
    * observability for skipping that is otherwise invisible through the
    * RDD seam. Test-only; racy under concurrent scans by design.
    */
  @volatile var lastPrune: Option[(Int, Int)] = None
}

final class TxLogRelation(ctx: SQLContext, table: String, asOf: Option[Long])
    extends BaseRelation with PrunedFilteredScan {

  private def spark: SparkSession = ctx.sparkSession

  override def sqlContext: SQLContext = ctx

  override lazy val schema: StructType =
    TxLog.snapshot(spark, table, asOf).schema

  // every filter re-applies row-level: segment pruning only skips
  // segments that provably contain NO matching row
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val statsCol = TxLog.liveFilesWithStats(table, asOf)
      .flatMap(_._2.map(_.col)).headOption
    val bounds = statsCol.flatMap(c => filterBounds(c, filters))
    val df = (statsCol, bounds) match {
      // stats-pruned head read: min/max skipping decided from the
      // manifest (snapshotPruned resolves head state; time travel takes
      // the unpruned path — correctness before skipping)
      case (Some(c), Some((lo, hi))) if asOf.isEmpty =>
        val (rel, scanned, total) = TxLog.snapshotPruned(spark, table, c, lo, hi)
        TxLogBatchSource.lastPrune = Some((scanned, total))
        rel
      case _ =>
        TxLogBatchSource.lastPrune = None
        TxLog.snapshot(spark, table, asOf)
    }
    val projected =
      if (requiredColumns.isEmpty) df
      else df.select(requiredColumns.map(org.apache.spark.sql.functions.col)
        .toIndexedSeq: _*)
    projected.rdd
  }

  /** Conjunctive [lo, hi] bound on `statsCol` from the pushed filters;
    * None when no filter constrains it (scan everything).
    */
  private def filterBounds(statsCol: String,
                           filters: Array[Filter]): Option[(Long, Long)] = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    var any = false
    def longOf(v: Any): Option[Long] = v match {
      case n: java.lang.Number => Some(n.longValue())
      case _ => None
    }
    filters.foreach {
      case EqualTo(`statsCol`, v) => longOf(v).foreach { x =>
        lo = math.max(lo, x); hi = math.min(hi, x); any = true
      }
      case GreaterThan(`statsCol`, v) => longOf(v).foreach { x =>
        lo = math.max(lo, x + 1); any = true
      }
      case GreaterThanOrEqual(`statsCol`, v) => longOf(v).foreach { x =>
        lo = math.max(lo, x); any = true
      }
      case LessThan(`statsCol`, v) => longOf(v).foreach { x =>
        hi = math.min(hi, x - 1); any = true
      }
      case LessThanOrEqual(`statsCol`, v) => longOf(v).foreach { x =>
        hi = math.min(hi, x); any = true
      }
      case In(`statsCol`, vs) if vs.nonEmpty =>
        val xs = vs.flatMap(longOf)
        if (xs.length == vs.length) {
          lo = math.max(lo, xs.min); hi = math.min(hi, xs.max); any = true
        }
      case _ => ()
    }
    if (any) Some((lo, hi)) else None
  }
}
