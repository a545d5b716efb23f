package graft.sources

import graft.ops.TxLog
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** BATCH change-data-feed over a TxLog table — the read-side twin of the
  * stream source's `readChangeFeed` (Delta's
  * `spark.read.format("delta").option("readChangeFeed", true)`):
  *
  * {{{
  *   spark.read.format("txlog")
  *     .option("readChangeFeed", true)
  *     .option("startingVersion", 0)        // exclusive lower bound
  *     .option("endingVersion", 7)          // inclusive; default head
  *     .option("cdcKey", "k")               // optional update pairing
  *     .load(tablePath)
  * }}}
  *
  * Rows carry `_change_type` ∈ insert / delete / update_preimage /
  * update_postimage and `_commit_version`. Semantics per commit are
  * identical to the stream's CDC mode: append-shaped commits read ONLY
  * their added segments (pinned-name rename walk — O(new data));
  * rewrite-shaped commits bag-diff the adjacent snapshots, with `cdcKey`
  * pairing removed/added rows into update pre/post images; maintenance
  * and metadata commits contribute nothing. Names are pinned at
  * `endingVersion`: earlier snapshots walk forward through later renames
  * so the feed's schema is uniform across the whole range.
  */
object TxLogCdf {
  val ChangeTypeCol: String = TxLogStreamSource.ChangeTypeCol
  val CommitVersionCol: String = TxLogStreamSource.CommitVersionCol

  /** The feed's data schema at `toV` (recorded schema when the log
    * carries one, else the live segments' footers at that version).
    */
  def dataSchemaAt(spark: SparkSession, table: String, toV: Long): StructType =
    TxLog.recordedSchema(table, Some(toV)).getOrElse {
      val files = TxLog.liveFiles(table, Some(toV))
      require(files.nonEmpty,
        s"txlog CDF: no live segments in $table@$toV to infer a schema")
      spark.read.parquet(files: _*).schema
    }

  def fullSchema(spark: SparkSession, table: String, toV: Long): StructType = {
    val base = dataSchemaAt(spark, table, toV)
    StructType(base.fields :+
      StructField(ChangeTypeCol, StringType, nullable = false) :+
      StructField(CommitVersionCol, LongType, nullable = false))
  }

  /** Change rows for the commit range (fromV, toV]. */
  def changeFrame(spark: SparkSession, table: String, fromV: Long, toV: Long,
                  cdcKey: Option[String]): DataFrame = {
    require(toV >= fromV, s"txlog CDF: endingVersion $toV < startingVersion $fromV")
    val dataSchema = dataSchemaAt(spark, table, toV)
    val renames = (1L to toV).flatMap(v => TxLog.readManifest(table, v).renames)
    val frames = ((fromV + 1) to toV).flatMap { v =>
      val m = TxLog.readManifest(table, v)
      val changed: Option[DataFrame] = m.op match {
        case "append" => Some(insertFrame(spark, dataSchema, m.adds, renames))
        case op if op.startsWith("stream_append_b") =>
          Some(insertFrame(spark, dataSchema, m.adds, renames))
        case op if op.startsWith("txn:") =>
          Some(insertFrame(spark, dataSchema, m.adds, renames))
        case "compact" | "optimize" | "optimize_zorder" | "compact_dv"
             | "evolve" | "constraint" | "dropcolumn" | "analyze"
             | "rename" => None
        case _ => Some(diffFrame(spark, table, dataSchema, v, toV, cdcKey))
      }
      changed.map(_.withColumn(CommitVersionCol, lit(v)))
    }
    if (frames.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        fullSchema(spark, table, toV))
    else frames.reduce(_.unionByName(_))
  }

  /** An append commit's added segments as `insert` rows under the pinned
    * names — the same physical-name rename walk as the batch reader.
    */
  private def insertFrame(spark: SparkSession, dataSchema: StructType,
                          files: Seq[String],
                          renames: Seq[TxLog.Rename]): DataFrame = {
    val base =
      if (renames.isEmpty)
        spark.read.schema(dataSchema).parquet(files: _*)
      else {
        val names = dataSchema.fieldNames.toSeq
        files.groupBy(f => TxLog.physicalNames(f, names, renames))
          .toSeq.sortBy(_._2.head)
          .map { case (phys, fs) =>
            val physSchema = StructType(
              dataSchema.fields.zip(phys).map { case (f, pn) => f.copy(name = pn) })
            val aliases = dataSchema.fieldNames.zip(phys).map {
              case (ln, pn) => col(pn).as(ln)
            }.toIndexedSeq
            spark.read.schema(physSchema).parquet(fs: _*).select(aliases: _*)
          }.reduce(_.union(_))
    }
    base.withColumn(ChangeTypeCol, lit("insert"))
  }

  /** Bag diff of versions v−1 → v under the names pinned at `toV`. */
  private def diffFrame(spark: SparkSession, table: String,
                        dataSchema: StructType, v: Long, toV: Long,
                        cdcKey: Option[String]): DataFrame = {
    def aligned(atV: Long): DataFrame = {
      val snap = TxLog.snapshot(spark, table, Some(atV))
      // renames committed after atV but at/before the pin walk FORWARD
      val fwd = ((atV + 1) to toV).flatMap(x => TxLog.readManifest(table, x).renames)
      val walked = fwd.foldLeft(snap)((d, r) =>
        if (d.columns.contains(r.oldName)) d.withColumnRenamed(r.oldName, r.newName)
        else d)
      walked.select(dataSchema.fields.map { f =>
        if (walked.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toIndexedSeq: _*)
    }
    val before = aligned(v - 1)
    val after = aligned(v)
    val del = before.exceptAll(after)
    val ins = after.exceptAll(before)
    cdcKey match {
      case None =>
        del.withColumn(ChangeTypeCol, lit("delete"))
          .unionByName(ins.withColumn(ChangeTypeCol, lit("insert")))
      case Some(k) =>
        val updKeys = del.select(k).intersect(ins.select(k))
        del.join(updKeys, Seq(k), "left_semi")
          .withColumn(ChangeTypeCol, lit("update_preimage"))
          .unionByName(del.join(updKeys, Seq(k), "left_anti")
            .withColumn(ChangeTypeCol, lit("delete")))
          .unionByName(ins.join(updKeys, Seq(k), "left_semi")
            .withColumn(ChangeTypeCol, lit("update_postimage")))
          .unionByName(ins.join(updKeys, Seq(k), "left_anti")
            .withColumn(ChangeTypeCol, lit("insert")))
    }
  }
}

/** V1 relation wrapping [[TxLogCdf.changeFrame]]; see the object doc. */
final class TxLogCdfRelation(ctx: org.apache.spark.sql.SQLContext,
                             table: String, fromV: Long, toV: Long,
                             cdcKey: Option[String])
    extends org.apache.spark.sql.sources.BaseRelation
    with org.apache.spark.sql.sources.TableScan {
  override def sqlContext: org.apache.spark.sql.SQLContext = ctx
  override lazy val schema: StructType =
    TxLogCdf.fullSchema(ctx.sparkSession, table, toV)
  override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
    TxLogCdf.changeFrame(ctx.sparkSession, table, fromV, toV, cdcKey).rdd
}
