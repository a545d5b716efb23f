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

  /** Bag diff of versions v−1 → v under the names pinned at `pinV` —
    * shared by the BATCH relation (pinV = endingVersion ≥ v) and the
    * STREAM source (pinV = the stream's schema-pin epoch, which a
    * mid-stream rewrite can postdate): renames between v and the pin
    * walk forward or backward as needed.
    *
    * ONE PASS over the two snapshots: each row is tagged ±1 and a hash
    * aggregate keeps rows whose signed count is nonzero — exactly
    * `exceptAll` in both directions at once (delta < 0 ⇒ |delta| delete
    * rows, delta > 0 ⇒ delta insert rows). The surviving CHANGED set is
    * change-sized, and it MATERIALIZES to scratch parquet (versions are
    * immutable, so the artifact is write-once per (table, v, pin)) so
    * the pre/post-image split's joins re-read a tiny scan instead of
    * re-running the two-snapshot aggregate per branch — the naive
    * exceptAll/intersect shape re-diffed the table ~5× (measured 5.5 s
    * at sf1 on a 1.5M-row table; this shape is one diff pass).
    */
  private[sources] def diffFrame(spark: SparkSession, table: String,
                                 dataSchema: StructType, v: Long, pinV: Long,
                                 cdcKey: Option[String]): DataFrame = {
    import org.apache.spark.sql.functions.{abs => fabs, expr, max => fmax,
      sum => fsum, when, explode}
    def aligned(atV: Long): DataFrame = {
      val snap = TxLog.snapshot(spark, table, Some(atV))
      // renames committed after atV but at/before the pin walk FORWARD
      val fwd = ((atV + 1) to pinV).flatMap(x => TxLog.readManifest(table, x).renames)
      val f = fwd.foldLeft(snap)((d, r) =>
        if (d.columns.contains(r.oldName)) d.withColumnRenamed(r.oldName, r.newName)
        else d)
      // renames committed after the pin but at/before atV walk BACKWARD
      val bwd = ((pinV + 1) to atV).flatMap(x => TxLog.readManifest(table, x).renames)
        .reverse
      val walked = bwd.foldLeft(f)((d, r) =>
        if (d.columns.contains(r.newName)) d.withColumnRenamed(r.newName, r.oldName)
        else d)
      walked.select(dataSchema.fields.map { f =>
        if (walked.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toIndexedSeq: _*)
    }
    val cols = dataSchema.fieldNames.toIndexedSeq
    // helper columns must not collide with user columns (same discipline
    // as TxLog's DV helpers)
    val taken = cols.toSet
    def fresh(base: String): String = {
      var n = base; var i = 0
      while (taken.contains(n)) { n = base + i; i += 1 }
      n
    }
    val dc = fresh("__cdf_delta")
    val ic = fresh("__cdf_i")
    val changed = graft.ops.Scratch.materialize(
      s"txcdf_v${v}_p$pinV", spark, table) {
      aligned(v - 1).withColumn(dc, lit(-1L))
        .unionByName(aligned(v).withColumn(dc, lit(1L)))
        .groupBy(cols.map(col): _*).agg(fsum(dc).as(dc))
        .filter(col(dc) =!= 0L)
    }
    // fan each changed row back out to |delta| rows (duplicate-row bags)
    val rows = changed.select(cols.map(col) :+ col(dc) :+
      explode(expr(s"sequence(1, abs($dc))")).as(ic): _*)
    val del = rows.filter(col(dc) < 0L).select(cols.map(col): _*)
    val ins = rows.filter(col(dc) > 0L).select(cols.map(col): _*)
    cdcKey match {
      case None =>
        del.withColumn(ChangeTypeCol, lit("delete"))
          .unionByName(ins.withColumn(ChangeTypeCol, lit("insert")))
      case Some(k) =>
        // keys carrying BOTH a removed and an added row are updates
        val hd = fresh("__cdf_has_del")
        val hi = fresh("__cdf_has_ins")
        val updKeys = changed
          .groupBy(col(k))
          .agg(fmax(when(col(dc) < 0L, 1).otherwise(0)).as(hd),
            fmax(when(col(dc) > 0L, 1).otherwise(0)).as(hi))
          .filter(col(hd) === 1 && col(hi) === 1)
          .select(col(k))
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
