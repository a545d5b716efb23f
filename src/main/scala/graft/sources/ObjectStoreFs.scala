package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileUtil, Path, RawLocalFileSystem}

import java.io.FileNotFoundException
import java.net.URI
import java.util.concurrent.atomic.AtomicLong

/** An `s3a://` object store inside the sandbox: a Hadoop FileSystem
  * registered as `fs.s3a.impl` that keeps bytes on local disk but exposes
  * them under object-store URIs with object-store RENAME SEMANTICS —
  * rename is a full COPY of every byte followed by a delete, never an
  * atomic metadata move, exactly the property that makes commit protocols
  * on S3 interesting (a parquet job "rename task dir into place" pays a
  * data copy, and a torn rename leaves both halves visible; S3A's
  * committers and the TxLog's no-overwrite manifest publish both exist
  * because of it).
  *
  * The reference deploys on EMR + S3 (`/root/reference/README.md:6`,
  * `pyspark.py:482-485` rewrites s3:// to s3a://); the sandbox has no
  * egress, so this is how the s3a path is exercised END-TO-END — the real
  * `DataFrameWriter` commit protocol, the real parquet footer reads, the
  * real partition discovery, all through `s3a://bucket/...` URIs resolved
  * by the Hadoop FileSystem contract rather than a path-string rewrite
  * that never leaves `file://`. Paths map identically (`s3a://bucket/p`
  * holds its bytes at local `p`), so FileStatus qualification under the
  * bucket URI round-trips without a translation table.
  *
  * Wire-up (per session, idempotent):
  * {{{
  *   ObjectStoreFs.install(spark)   // sets fs.s3a.impl
  *   df.write.parquet("s3a://graft-bucket/tmp/...")
  * }}}
  */
final class ObjectStoreFs extends RawLocalFileSystem {
  private var fsUri: URI = _

  override def getScheme: String = "s3a"

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    fsUri = URI.create(s"${name.getScheme}://${name.getAuthority}")
  }

  // the RawLocalFileSystem CONSTRUCTOR qualifies the working directory,
  // which reads getUri before initialize() has run — fall back to a
  // bucketless scheme URI there (relative paths are never used)
  override def getUri: URI =
    if (fsUri != null) fsUri else URI.create("s3a:///")

  /** Statuses are built eagerly with bucket-space paths: the inherited
    * `DeprecatedRawLocalFileStatus` loads permissions LAZILY by turning
    * its own path back into a `java.io.File(URI)` — which rejects any
    * non-`file:` scheme. An object store has no POSIX permissions anyway,
    * so a plain FileStatus (default perms, no lazy IO) is the honest
    * shape.
    */
  override def getFileStatus(f: Path): FileStatus = {
    val local = pathToFile(f)
    if (!local.exists()) throw new FileNotFoundException(s"$f not found")
    new FileStatus(local.length(), local.isDirectory, 1,
      getDefaultBlockSize(f), local.lastModified(), makeQualified(f))
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val local = pathToFile(f)
    if (!local.exists()) throw new FileNotFoundException(s"$f not found")
    if (local.isFile) Array(getFileStatus(f))
    else local.list().sorted.map(n => getFileStatus(new Path(f, n)))
  }

  /** Object-store rename: copy every byte, then delete the source. The
    * copy runs through this filesystem's own open/create (recursive for
    * directories), so a "rename" of a staged task directory costs a full
    * data pass — the semantics S3A actually has, and the reason
    * rename-based commit protocols are scrutinized there.
    */
  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) false
    else if (exists(dst)) false // S3A MoveToTrash-free no-clobber contract
    else {
      ObjectStoreFs.renames.incrementAndGet()
      ObjectStoreFs.copiedBytes.addAndGet(
        if (getFileStatus(src).isFile) getFileStatus(src).getLen
        else getContentSummary(src).getLength)
      FileUtil.copy(this, src, this, dst, /*deleteSource=*/ true, getConf)
    }
  }
}

object ObjectStoreFs {
  val Bucket = "graft-bucket"

  /** Diagnostics the spec asserts on: proof the commit protocol really
    * went through object-store renames (and what they cost in bytes).
    */
  val renames = new AtomicLong
  val copiedBytes = new AtomicLong

  /** Point `fs.s3a.impl` at the sandbox store for this session. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.s3a.impl", classOf[ObjectStoreFs].getName)
  }

  /** `s3a://graft-bucket<localPath>` — the bucket URI whose bytes live at
    * `localPath`.
    */
  def uri(localPath: String): String = s"s3a://$Bucket$localPath"
}
