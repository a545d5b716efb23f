package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from per-category packs; each pack pairs every
  * query with its DuckDB oracle SQL (or deliberately omits the oracle for
  * non-SQL-expressible ops, which the driver then checks rows-only).
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    AggWindowQueries,
    ScalarQueries,
    StatsQueries,
    LlmQueries,
    CorpusQueries,
    RetrievalQueries,
    StreamQueries,
    MultimodalQueries,
    ScaleQueries,
    TrendQueries,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The SURVEY §7.1 slice: lineitem ⋈ orders ⋈ customer ⋈ broadcast(nation)
    * with cleaning, date logic, filter, agg and a total order.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("flagship")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    uniq(packs.flatMap(_.queries))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    uniq(packs.flatMap(_.oracle))

  // toMap would silently keep only the LAST entry for a colliding query
  // id, making a whole operator vanish green from the correctness gate
  private def uniq[V](entries: Seq[(String, V)]): Map[String, V] = {
    val dups = entries.groupBy(_._1).filter(_._2.length > 1).keys
    require(dups.isEmpty, s"duplicate query ids across packs: ${dups.mkString(", ")}")
    entries.toMap
  }
}
