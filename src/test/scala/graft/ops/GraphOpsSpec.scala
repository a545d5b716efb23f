package graft.ops

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: chains collapse transitively, components stay separate") {
    // component {1,2,3,4} as a chain (diameter 3 — needs real iteration),
    // component {10,11}, and a self-contained pair {20,21}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (21L, 20L))
      .toDF("src", "dst")
    val cc = GraphOps.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents: label flows against edge direction too") {
    // min id sits at the DST end — propagation must be undirected
    val cc = GraphOps.connectedComponents(Seq((5L, 1L), (6L, 5L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 5L -> 1L, 6L -> 1L))
  }

  test("connectedComponents: partition-layout invariant") {
    val edges = (1L to 40L).map(i => (i, i + 1)).toDF("src", "dst") // one long chain
    val a = GraphOps.connectedComponents(edges.repartition(1))
      .as[(Long, Long)].collect().toSet
    val b = GraphOps.connectedComponents(edges.repartition(13))
      .as[(Long, Long)].collect().toSet
    assert(a == b)
    assert(a.forall(_._2 == 1L)) // the whole chain is one component
  }

  test("blockedComponents equals the generic algorithm on randomized blocked graphs") {
    // deterministic pseudo-random blocked graphs: vertices are unique
    // across blocks (the ER invariant), edge sets include chains, stars,
    // singles, self-loops, duplicate edges, and reversed-order pairs
    val rnd = new scala.util.Random(42)
    val rows = (0 until 60).flatMap { b =>
      val n = 2 + rnd.nextInt(9) // block size 2..10
      val ids = (0 until n).map(i => b * 100L + i)
      val nEdges = 1 + rnd.nextInt(n * 2)
      (0 until nEdges).map { _ =>
        val s = ids(rnd.nextInt(n)); val d = ids(rnd.nextInt(n))
        (s"blk$b", s, d)
      }
    }
    val edges = rows.toDF("block", "src", "dst")
    val blocked = GraphOps.blockedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val generic = GraphOps.connectedComponents(
      edges.select("src", "dst")).as[(Long, Long)].collect().toMap
    assert(blocked == generic)
    // and on the trivial no-chain shape (the single-edge fast path's turf)
    val single = Seq(("a", 1L, 2L), ("b", 7L, 5L)).toDF("block", "src", "dst")
    assert(GraphOps.blockedComponents(single).as[(Long, Long)].collect().toMap ===
      Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 7L -> 5L))
  }
}
