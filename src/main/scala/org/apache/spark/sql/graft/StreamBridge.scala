package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.{DataSource, LogicalRelation}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one internal seam a DSv1 streaming `Source` needs: `getBatch` must
  * return a DataFrame whose logical plan is flagged `isStreaming = true`
  * (MicroBatchExecution asserts it), and the constructors that set the
  * flag — `LogicalRelation(_, isStreaming)` / `Dataset.ofRows` — are
  * `private[sql]`. Every file-backed OSS streaming source (Spark's own
  * FileStreamSource, Delta's DeltaSource) builds its batches exactly this
  * way; third-party connectors reach the API from a bridge package under
  * `org.apache.spark.sql`, which is what this object is. Nothing else in
  * the repo lives outside the `graft` namespace, and nothing here does
  * any work beyond plan construction.
  */
object StreamBridge {

  /** A streaming-flagged batch over concrete parquet `files`, read under
    * the pinned `schema` (the source's declared schema must not drift
    * between micro-batches even if table files evolve mid-stream).
    */
  def streamingParquetBatch(spark: SparkSession, schema: StructType,
                            files: Seq[String]): DataFrame = {
    val cs = spark.asInstanceOf[ClassicSession]
    val relation = DataSource(
      sparkSession = cs,
      className = "parquet",
      paths = files,
      userSpecifiedSchema = Some(schema)
    ).resolveRelation(checkFilesExist = false)
    Dataset.ofRows(cs, LogicalRelation(relation, isStreaming = true))
  }

  /** An empty streaming-flagged batch of `schema` — what a source returns
    * for a version range that contains no data-changing commits.
    */
  def emptyStreamingBatch(spark: SparkSession, schema: StructType): DataFrame = {
    val cs = spark.asInstanceOf[ClassicSession]
    Dataset.ofRows(cs,
      LocalRelation(DataTypeUtils.toAttributes(schema), Nil, isStreaming = true))
  }

  /** A COMPUTED batch frame re-flagged as streaming: the change-feed
    * source's micro-batches are snapshot DIFFS (exceptAll/joins over two
    * table versions), not raw file scans, so the plan is built with the
    * ordinary batch API and its row RDD is wrapped under the streaming
    * flag — execution stays lazy (the RDD evaluates when the micro-batch
    * runs), which is the same `internalCreateDataFrame` shape Spark's own
    * sources use for computed batches.
    */
  def streamingFromBatch(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[ClassicSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The micro-batch a V1 `Sink.addBatch` receives, re-wrapped as an
    * ordinary batch DataFrame: the engine's Dataset still carries the
    * streaming source in its LOGICAL plan, so any fresh action on it
    * (`df.rdd`, `df.write`) re-analyzes and refuses ("queries with
    * streaming sources must be executed with writeStream.start()").
    * FileStreamSink writes `data.queryExecution.executedPlan` directly
    * for exactly this reason; this is the equivalent for a sink that
    * wants a DataFrame — the ALREADY-PLANNED incremental execution's
    * row RDD under the batch's schema (`internalCreateDataFrame` is
    * `private[sql]`, hence the bridge).
    */
  def sinkBatch(data: DataFrame): DataFrame = {
    val cs = data.sparkSession.asInstanceOf[ClassicSession]
    cs.internalCreateDataFrame(
      data.queryExecution.toRdd, data.schema, isStreaming = false)
  }
}
