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
    val e = spill(edges)
    if (!chained(e)) singleEdgeComponents(e) else probedLoop(e, maxIters)
  }

  /** Per-BLOCK connected components for blocked match graphs (the
    * entity-resolution shape: candidate edges NEVER cross the blocking
    * key, and blocks are small by construction). Input rows are
    * `(block, src, dst)`; output is `(id, comp)` with comp = min vertex
    * id in the component, exactly [[connectedComponents]]'s contract.
    *
    * Where the generic algorithm iterates cluster-wide join rounds with
    * a driver probe per round — fixed cost that dominates on
    * small-diameter graphs — this is ONE `groupBy(block)` shuffle: each
    * block's edge list folds through a native higher-order `aggregate`
    * expression that unions by relabel-to-min over a vertex→label map
    * (the naive union algorithm, correct under any edge order; per-block
    * cost is edges × vertices, both block-bounded). No iteration, no
    * checkpoint, no probe, nothing driver-side; 1000 executors each fold
    * their own blocks. Zero UDFs — `aggregate`/`transform_values` are
    * Catalyst expressions.
    */
  def blockedComponents(edges: DataFrame): DataFrame = {
    val byBlock = edges
      .groupBy(col("block"))
      .agg(collect_list(struct(col("src"), col("dst"))).as("es"))
      .withColumn("ids", array_distinct(concat(
        expr("transform(es, e -> e.src)"), expr("transform(es, e -> e.dst)"))))
    byBlock.select(explode(expr(
      """aggregate(
        |  es,
        |  map_from_arrays(ids, ids),
        |  (m, e) -> transform_values(m, (k, v) ->
        |    IF(v = greatest(element_at(m, e.src), element_at(m, e.dst)),
        |       least(element_at(m, e.src), element_at(m, e.dst)), v)),
        |  m -> map_entries(m))""".stripMargin)).as("kv"))
      .select(col("kv.key").as("id"), col("kv.value").as("comp"))
  }

  /** Edge frame spilled once to scratch parquet (see the scaladoc above). */
  private def spill(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val eout = s"${Scratch.base}/cc_e_${java.util.UUID.randomUUID.toString.take(8)}"
    edges.select(col("src"), col("dst")).write.parquet(eout)
    spark.read.parquet(eout)
  }

  /** Does any vertex appear in more than one edge? One aggregate. */
  private def chained(e: DataFrame): Boolean =
    e.select(explode(array(col("src"), col("dst"))).as("id"))
      .groupBy("id").count().filter(col("count") > 1)
      .limit(1).count() > 0

  /** Every component is a single edge: comp = min(src, dst). */
  private def singleEdgeComponents(e: DataFrame): DataFrame =
    e.select(least(col("src"), col("dst")).as("comp"), col("src").as("id"))
      .union(e.select(least(col("src"), col("dst")).as("comp"),
        col("dst").as("id")))
      .distinct() // a self-loop edge would list its vertex twice
      .select(col("id"), col("comp"))

  /** The generic probing loop over a spilled edge frame: checkpointed
    * rounds until a fixpoint, convergence asserted.
    */
  private def probedLoop(e: DataFrame, maxIters: Int): DataFrame = {
    val spark = e.sparkSession
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
