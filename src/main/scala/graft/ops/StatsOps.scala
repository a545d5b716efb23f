package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed order statistics built from window primitives; property-
  * proven against their defining inequalities in `PropertiesSpec`.
  */
object StatsOps {

  /** Weighted median per group: the smallest value whose cumulative weight
    * reaches half the group total (2·cumw ≥ total — the standard lower
    * weighted median). Input must be PRE-AGGREGATED to one row per
    * (group, value) with summed weights, which bounds the window input at
    * the value-domain size rather than the raw row count. Output:
    * (group, wmedian, total_weight).
    */
  def weightedMedian(byValue: DataFrame, group: String, value: String,
                     weight: String): DataFrame = {
    val cum = Window.partitionBy(group).orderBy(value)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(group)
    byValue
      .withColumn("cw", sum(weight).over(cum))
      .withColumn("tw", sum(weight).over(tot))
      .filter(col("cw") * 2 >= col("tw"))
      .groupBy(group)
      .agg(min(value).as("wmedian"), max("tw").as("total_weight"))
  }
}
