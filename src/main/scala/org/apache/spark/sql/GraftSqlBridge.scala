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

  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame from a (custom) logical plan — the bridge a library-level
    * operator (graft.plans.AsOfJoin) needs to hand its node back to the
    * session.
    */
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Register graft_cosine / graft_dot as temp SQL functions. */
  def registerFunctions(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("graft_cosine",
      exprs => graft.functions.CosineSimilarity(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("graft_dot",
      exprs => graft.functions.DotProduct(exprs(0), exprs(1)), "built-in")
  }
}
