package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave, bit by bit. */
  private def morton(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zkey matches the bit-by-bit Morton reference on the 16-bit corners and randoms") {
    val rng = new scala.util.Random(7)
    val pts = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L),
      (1L, 2L), (43690L, 21845L)) ++
      Seq.fill(50)((rng.nextInt(65536).toLong, rng.nextInt(65536).toLong))
    val got = pts.toDF("x", "y")
      .select(ZOrder.zkey(col("x"), col("y")).as("z")).as[Long].collect().toSeq
    assert(got == pts.map { case (x, y) => morton(x, y) })
  }

  /** Reference N-dim Morton interleave, bit by bit. */
  private def mortonN(xs: Seq[Long], bits: Int): Long =
    xs.zipWithIndex.foldLeft(0L) { case (acc, (x, j)) =>
      (0 until bits).foldLeft(acc) { (a, i) =>
        a | (((x >> i) & 1L) << (i * xs.size + j))
      }
    }

  test("zkeyN: 2-D delegates to zkey; 3-D matches the reference and its scalar twin") {
    val rng = new scala.util.Random(11)
    // 2-D: column path == mask-sequence zkey == scalar
    val pts2 = Seq.fill(20)((rng.nextInt(65536).toLong, rng.nextInt(65536).toLong))
    val got2 = pts2.toDF("x", "y")
      .select(ZOrder.zkeyN(Seq(col("x"), col("y"))).as("z")).as[Long].collect().toSeq
    assert(got2 == pts2.map { case (x, y) => ZOrder.zkeyScalar(x, y) })
    // 3-D: 16 bits per dim (48-bit key); corners + randoms
    val b3 = ZOrder.bitsFor(3)
    assert(b3 === 16)
    val m3 = (1L << b3) - 1
    val pts3 = Seq(Seq(0L, 0L, 0L), Seq(m3, m3, m3), Seq(1L, 2L, 4L)) ++
      Seq.fill(30)(Seq.fill(3)(rng.nextInt(1 << b3).toLong))
    val got3 = pts3.map(p => (p(0), p(1), p(2))).toDF("x", "y", "w")
      .select(ZOrder.zkeyN(Seq(col("x"), col("y"), col("w"))).as("z"))
      .as[Long].collect().toSeq
    assert(got3 == pts3.map(mortonN(_, b3)))
    assert(got3 == pts3.map(ZOrder.zkeyScalarN))
    // an aligned power-of-two cube is one contiguous z-range: every point
    // inside [0,4)^3 keys within [z(0,0,0), z(3,3,3)]
    val zhi = ZOrder.zkeyScalarN(Seq(3L, 3L, 3L))
    val inside = for { x <- 0L until 4L; y <- 0L until 4L; w <- 0L until 4L }
      yield ZOrder.zkeyScalarN(Seq(x, y, w))
    assert(inside.min === 0L && inside.max === zhi &&
      inside.toSet.size === 64 && zhi === 63L)
  }

  test("cluster() gives every output file locality in BOTH dimensions") {
    val grid = for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong)
    val out = java.nio.file.Files.createTempDirectory("graft-zorder-").toString
    ZOrder.cluster(grid.toDF("x", "y"), col("x"), col("y"), 8)
      .write.mode("overwrite").parquet(out)
    val ext = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("xe"), (max("y") - min("y")).as("ye"))
      .select("xe", "ye").as[(Long, Long)].collect().toSeq
    assert(ext.size >= 6, s"expected ~8 files, got ${ext.size}")
    // a single-column sort bounds ONE dimension and leaves the other at
    // full range in EVERY file (avg extent 63); z-order keeps the AVERAGE
    // bbox small in both dimensions. Individual files may straddle a
    // quadrant boundary (repartitionByRange samples split points), so the
    // guarantee is aggregate, not per-file — which is exactly how file
    // skipping pays off: expected files read per point filter.
    val (axe, aye) = (ext.map(_._1).sum.toDouble / ext.size,
      ext.map(_._2).sum.toDouble / ext.size)
    assert(axe <= 45 && aye <= 45,
      s"no 2-D locality: avg xe=$axe avg ye=$aye over ${ext.size} files")
  }
}
