package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components — the step between near-dup candidate
  * PAIRS and keep-one-per-cluster dedup: transitive matches (A~B, B~C)
  * must collapse into one cluster or the pipeline keeps both A and C.
  *
  * Algorithm per iteration: min-label propagation (each vertex adopts the
  * smallest label among itself and its neighbors) followed by one
  * pointer-jumping step (`comp := comp(comp)` — valid because comp is
  * always a vertex of the same component, and monotonically
  * non-increasing), which doubles the distance a label covers per round:
  * convergence in O(log diameter) iterations, not O(diameter). Each
  * round is two equi-joins + one min-aggregate, all plain shuffles on
  * vertex id; the driver runs only the convergence loop (an existence
  * probe per round), never touches vertex data. `localCheckpoint`
  * truncates the logical plan each round — without it the lineage of an
  * iterative DataFrame grows per iteration until planning itself OOMs.
  */
object GraphOps {

  /** edges: (src, dst) undirected pairs. Returns (id, comp) for every
    * vertex appearing in any edge, comp = min vertex id in its component.
    *
    * The edge frame is spilled to scratch parquet FIRST — the candidate-
    * pair plan above it (blocked self-join + edit-distance kernel) is
    * usually the expensive part, and it must run once, not once per
    * label-prop round. Then a SINGLE-EDGE FAST PATH (VERDICT r14 item 3):
    * if no vertex appears in more than one edge, every component IS its
    * edge — comp = min(src, dst), zero propagation rounds, one cheap
    * degree check. Entity-resolution blocks of ≤ 2 records always hit
    * this; chained blocks (A~B, B~C) fall through to the generic
    * label-prop + pointer-jumping loop below.
    */
  def connectedComponents(edges: DataFrame, maxIters: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    val eout = s"${Scratch.base}/cc_e_${java.util.UUID.randomUUID.toString.take(8)}"
    edges.select(col("src"), col("dst")).write.parquet(eout)
    val e = spark.read.parquet(eout)
    val chained = e.select(explode(array(col("src"), col("dst"))).as("id"))
      .groupBy("id").count().filter(col("count") > 1)
      .limit(1).count() > 0
    if (!chained) {
      return e.select(least(col("src"), col("dst")).as("comp"), col("src").as("id"))
        .union(e.select(least(col("src"), col("dst")).as("comp"),
          col("dst").as("id")))
        .distinct() // a self-loop edge would list its vertex twice
        .select(col("id"), col("comp"))
    }
    // both directions, so a label can flow either way across an edge
    val both = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // every round's localCheckpoint persists an RDD; they are OURS to
    // release. Left to the ContextCleaner they linger until a GC cycle —
    // block-manager hygiene (cached_rdds == 0 after every query) must
    // not be a GC race.
    val ckpts = scala.collection.mutable.ListBuffer.empty[org.apache.spark.rdd.RDD[_]]
    def track(ds: DataFrame): DataFrame = {
      org.apache.spark.sql.GraftSqlBridge.checkpointRdd(ds).foreach(ckpts += _)
      ds
    }
    var labels = track(both.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint())
    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      val prop = both.select(col("src").as("id"), col("dst"))
        .join(labels, "id")
        .select(col("dst").as("id"), col("comp"))
      // min over self ∪ neighbors, carrying the previous label along so
      // the convergence probe below is a scan of the checkpointed rows,
      // not another shuffle join
      val propagated = labels.select(col("id"), col("comp"), col("comp").as("prev"))
        .union(prop.select(col("id"), col("comp"),
          lit(null).cast("long").as("prev"))) // min ignores nulls ⇒ prev = own old label
        .groupBy("id").agg(min("comp").as("comp"), min("prev").as("prev"))
      val next = track(propagated.select(col("id"), col("comp").as("mid"), col("prev"))
        .join(propagated.select(col("id").as("mid"), col("comp")), "mid")
        .select(col("id"), col("comp"), col("prev"))
        .localCheckpoint()) // eager: executes the round AND truncates lineage
      val changed = next.filter(col("comp") =!= col("prev"))
        .limit(1).count() // existence probe on materialized rows, no shuffle
      labels = next.select("id", "comp")
      converged = changed == 0
      iters += 1
    }
    both.unpersist()
    require(converged, s"connectedComponents did not converge in $maxIters iterations")
    // the result must outlive the checkpoints we are about to release:
    // spill the (small) label table to scratch parquet and hand back the
    // file-backed frame, then unpersist every round's checkpoint RDD —
    // deterministically, not whenever the next GC lets the cleaner run
    val out = s"${Scratch.base}/cc_${java.util.UUID.randomUUID.toString.take(8)}"
    labels.write.mode("overwrite").parquet(out)
    ckpts.foreach(_.unpersist(blocking = false))
    spark.read.parquet(out)
  }
}
