package graft.sources

import graft.SparkSpec
import graft.ops.Sinks

import org.apache.hadoop.fs.Path

import java.nio.file.Files

/** The sandbox object store: `s3a://` URIs resolved by the Hadoop
  * FileSystem contract (not a path-string rewrite), with S3's
  * copy+delete rename semantics. Pins that the REAL DataFrameWriter
  * commit protocol runs through object-store renames end-to-end and that
  * partition discovery + pruning work over the bucket URI.
  */
class ObjectStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshPrefix(name: String): String =
    ObjectStoreFs.uri(Files.createTempDirectory("objstore-").resolve(name).toString)

  test("partitioned parquet round-trips through s3a:// and the commit protocol pays copies") {
    ObjectStoreFs.install(spark)
    val out = freshPrefix("t1")
    val df = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L))
      .toDF("k", "part", "v")
    val (r0, b0) = (ObjectStoreFs.renames.get, ObjectStoreFs.copiedBytes.get)
    Sinks.writePartitionedParquet(df, out, Seq("part"))
    // the job/task commit really went through object-store renames, and
    // each one cost a byte copy (S3's rename reality)
    assert(ObjectStoreFs.renames.get > r0, "commit protocol must rename through the FS")
    assert(ObjectStoreFs.copiedBytes.get > b0, "object-store rename must copy bytes")
    val back = spark.read.parquet(out)
      .select("k", "part", "v").as[(Long, String, Long)].collect()
    assert(back.sorted.toSeq === Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L)))
    // partition pruning holds over the bucket URI: only the a-partition
    // directory is listed into the scan
    val pruned = spark.read.parquet(out).filter($"part" === "a")
    val scanned = pruned.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
          .flatMap(_.files).map(_.getPath.toString)
    }.get
    assert(scanned.nonEmpty && scanned.forall(_.contains("part=a")),
      s"scan must list only part=a files, got $scanned")
    assert(pruned.count() === 2)
  }

  test("rename amplification measured: v1 committer copies ~2x data bytes, direct commit copies zero") {
    // the reference's own bottleneck note (README.md:6-8, notebook S3
    // writes) finally measured: on a copy-rename store the default
    // FileOutputCommitter v1 pays task-commit + job-commit renames —
    // every data byte copied TWICE — while the magic-committer-shape
    // direct path renames nothing
    ObjectStoreFs.install(spark)
    val df = spark.range(20000).selectExpr("id AS k", "CAST(id % 3 AS STRING) AS part",
      "id * 7 AS v")

    val outV1 = freshPrefix("amp_v1")
    val (r0, b0) = (ObjectStoreFs.renames.get, ObjectStoreFs.copiedBytes.get)
    Sinks.writePartitionedParquet(df, outV1, Seq("part"))
    val v1Renames = ObjectStoreFs.renames.get - r0
    val v1Copied = ObjectStoreFs.copiedBytes.get - b0
    val fs = new Path(outV1).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataBytes = fs.getContentSummary(new Path(outV1)).getLength
    assert(v1Copied >= 2 * dataBytes - 1024,
      s"v1 committer must copy each data byte ~twice: copied=$v1Copied data=$dataBytes")
    info(s"v1 committer: $v1Renames renames, $v1Copied bytes copied for $dataBytes data bytes " +
      f"(amplification ${v1Copied.toDouble / dataBytes}%.2fx)")

    val outDirect = freshPrefix("amp_direct")
    val (r1, b1) = (ObjectStoreFs.renames.get, ObjectStoreFs.copiedBytes.get)
    Sinks.writeDirectObjectStore(df, outDirect, Seq("part"))
    val dRenames = ObjectStoreFs.renames.get - r1
    val dCopied = ObjectStoreFs.copiedBytes.get - b1
    assert(dCopied === 0L && dRenames === 0L,
      s"direct commit must rename nothing: renames=$dRenames copied=$dCopied")
    // same rows, same partition layout, _SUCCESS published
    assert(fs.exists(new Path(outDirect, "_SUCCESS")))
    val a = spark.read.parquet(outV1).select("k", "part", "v")
      .as[(Long, String, Long)].collect().sorted.toSeq
    val b = spark.read.parquet(outDirect).select("k", "part", "v")
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(a === b, "direct-commit output must equal the v1-committed output")
    val pruned = spark.read.parquet(outDirect).filter($"part" === "1")
    assert(pruned.count() === df.filter($"part" === "1").count())

    // the committer is scoped PER WRITE (DataFrameWriter option merged
    // into this relation's hadoopConf), never installed session-wide: a
    // subsequent plain parquet write on the same session must pay the
    // default committer's renames again (ADVICE r11: the old session-conf
    // swap leaked the zero-rename committer to concurrent writes)
    assert(!spark.conf.getOption("spark.sql.parquet.output.committer.class")
      .exists(_.contains("DirectObjectStoreCommitter")),
      "session conf must not carry the direct committer")
    val outAfter = freshPrefix("amp_after")
    val r2 = ObjectStoreFs.renames.get
    Sinks.writePartitionedParquet(df, outAfter, Seq("part"))
    assert(ObjectStoreFs.renames.get - r2 > 0,
      "a plain write after writeDirectObjectStore must use the default committer")
  }

  test("rename refuses to clobber and moves directories by copy+delete") {
    ObjectStoreFs.install(spark)
    val base = new Path(freshPrefix("t2"))
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.isInstanceOf[ObjectStoreFs], s"fs.s3a.impl must resolve here, got ${fs.getClass}")
    fs.mkdirs(new Path(base, "src/sub"))
    val f = fs.create(new Path(base, "src/sub/x.bin"))
    f.write(Array.fill[Byte](1024)(7)); f.close()
    assert(fs.rename(new Path(base, "src"), new Path(base, "dst")))
    assert(!fs.exists(new Path(base, "src")) &&
      fs.getFileStatus(new Path(base, "dst/sub/x.bin")).getLen === 1024L)
    // no-clobber: renaming onto an existing path reports failure
    fs.mkdirs(new Path(base, "src2"))
    assert(!fs.rename(new Path(base, "src2"), new Path(base, "dst")))
    // scheme rewrite composes: the reference's s3:// spelling reaches the
    // same objects through readScheme
    assert(Sinks.readScheme(base.toString.replaceFirst("s3a://", "s3://"))
      === base.toString)
  }
}
