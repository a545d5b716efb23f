package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-verifiable queries.
  *
  * Contract (driver, see SparkEntry): each query id maps to a function
  * `(spark, sfDir) => DataFrame`; `oracle` holds the DuckDB-runnable ANSI SQL
  * that must produce the identical result on the same parquet tables. Ids
  * with no oracle entry get a weaker rows-only check.
  *
  * Determinism rules every query here follows (SURVEY.md §7.4):
  *   - ends in an explicit ORDER BY over a unique key set, mirrored in SQL;
  *   - no `monotonically_increasing_id` (row_number over explicit order);
  *   - money/float aggregates go through exact integer cents
  *     ([[graft.ops.Cleaning.cents]]) so sums are partition-order-independent;
  *   - weekday/date parts compared as numbers, timestamps as epoch numbers.
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracle: Map[String, String]
}
