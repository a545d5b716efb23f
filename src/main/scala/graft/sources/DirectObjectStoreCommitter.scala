package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobContext, TaskAttemptContext}
import org.apache.parquet.hadoop.ParquetOutputCommitter

/** Zero-rename job committer for object stores — the S3A "magic
  * committer" shape (task writes go STRAIGHT to final keys; job commit
  * only publishes a marker), expressed through the standard
  * `spark.sql.parquet.output.committer.class` seam.
  *
  * Why: on a copy+delete-rename store (see [[ObjectStoreFs]]), the
  * default FileOutputCommitter v1 pays TWO full data copies per write —
  * task commit renames the attempt dir under `_temporary/`, job commit
  * renames every committed task dir into place (measured in
  * `ObjectStoreSpec`: copied bytes ≈ 2× data bytes). This committer:
  *
  *  - `getWorkPath` IS the destination — tasks create part files at
  *    their final keys (Spark's part-file names carry the write-job
  *    UUID, so concurrent jobs never collide);
  *  - task commit/abort are no-ops (nothing staged anywhere else; a
  *    retried task attempt rewrites the SAME final key, and create
  *    overwrites, so retries self-heal);
  *  - job commit writes only the `_SUCCESS` marker.
  *
  * Contract: task-attempt output is visible before job commit (exactly
  * the magic-committer trade — readers must gate on `_SUCCESS` or, for
  * lake tables, on the TxLog manifest, whose no-overwrite publish is the
  * transactional version of this same idea). Do not combine with
  * speculative execution (two live attempts would race one key) or with
  * dynamic partition overwrite (which stages by design).
  */
class DirectObjectStoreCommitter(out: Path, ctx: TaskAttemptContext)
    extends ParquetOutputCommitter(out, ctx) {

  override def getWorkPath: Path = out

  override def setupJob(context: JobContext): Unit = () // no _temporary

  override def needsTaskCommit(context: TaskAttemptContext): Boolean = false

  override def commitTask(context: TaskAttemptContext): Unit = ()

  override def abortTask(context: TaskAttemptContext): Unit = ()

  override def isRecoverySupported: Boolean = false

  override def commitJob(context: JobContext): Unit = {
    // publish the success marker only — no renames, no directory moves
    val fs = out.getFileSystem(context.getConfiguration)
    fs.create(new Path(out, "_SUCCESS"), /*overwrite=*/ true).close()
  }

  override def abortJob(context: JobContext,
                        state: org.apache.hadoop.mapreduce.JobStatus.State): Unit = ()
}
