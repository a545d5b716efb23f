package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column↔Expression conversions —
  * the standard pattern for libraries that ship custom Catalyst
  * expressions without forking Spark (Spark 4 moved these behind
  * `org.apache.spark.sql.classic.ExpressionUtils`). Also registers the
  * graft SQL function names on a session so `spark.sql("... graft_cosine
  * (a, b) ...")` works.
  */
object GraftSqlBridge {

  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** DataFrame over an RDD of InternalRows — the `private[sql]`
    * `internalCreateDataFrame` seam. RDD-level engines (StatsOps'
    * two-pass rank scan) produce UnsafeRow-backed rows directly; routing
    * them through the public `createDataFrame(Row, schema)` would pay a
    * per-row external-Row conversion in BOTH directions (r16: ~2× on the
    * rank-engine queries). Rows follow the standard InternalRow iterator
    * contract (consumers copy when they buffer).
    */
  def internalDf(spark: SparkSession,
                 rdd: org.apache.spark.rdd.RDD[catalyst.InternalRow],
                 schema: types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)

  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame from a (custom) logical plan — the bridge a library-level
    * operator (graft.plans.AsOfJoin) needs to hand its node back to the
    * session.
    */
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The persisted RDD behind a `localCheckpoint`ed Dataset (None when
    * the plan carries no LogicalRDD). Iterative operators (GraphOps)
    * track these so they can unpersist THEIR OWN checkpoints
    * deterministically once the result is materialized — leaving them to
    * the ContextCleaner makes block-manager hygiene a GC race, and
    * force-unpersisting by diffing `getPersistentRDDs` could hit a
    * concurrent caller's live checkpoint.
    */
  def checkpointRdd(ds: Dataset[_]): Option[org.apache.spark.rdd.RDD[_]] =
    ds.queryExecution.analyzed.collectFirst {
      case lr: execution.LogicalRDD => lr.rdd
    }

  /** Register graft_cosine / graft_dot as temp SQL functions. */
  def registerFunctions(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("graft_cosine",
      exprs => _root_.graft.functions.CosineSimilarity(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("graft_dot",
      exprs => _root_.graft.functions.DotProduct(exprs(0), exprs(1)), "built-in")
  }
}
