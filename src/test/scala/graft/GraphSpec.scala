package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Joins

/** Planted-structure laws for the graph kernels behind q28/q29.
  *
  * The DuckDB oracle already proves both queries against independent
  * spellings on the co-purchase graph; these tests pin the kernels on
  * graphs whose answers are THEOREMS (clique counts, triangle-free
  * families, regular-graph fixpoints), so a future refactor that breaks
  * orientation or the iterate-join shows up as a law violation with an
  * obvious counterexample, not a hash mismatch on 20k nodes.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: Seq[(Long, Long)]): DataFrame =
    pairs.toDF("u", "v")

  private def triRow(e: DataFrame): (Long, Long, Long, Long, Double) = {
    val r = Joins.triangleStats(e).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
  }

  test("K5 clique: C(5,3) triangles, transitivity exactly 1") {
    val k5 = for {
      i <- 0L until 5L; j <- (i + 1) until 5L
    } yield (i, j)
    val (nodes, es, wedges, tris, trans) = triRow(edges(k5))
    assert(nodes == 5 && es == 10)
    assert(tris == 10)          // C(5,3)
    assert(wedges == 5 * 6)     // 5 nodes × C(4,2)
    assert(trans == 1.0)        // every wedge closes in a clique
  }

  test("path and star are triangle-free (star = max-skew hub)") {
    val path = edges(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(triRow(path)._4 == 0)
    // a 1000-leaf star is the degenerate hub case: orientation must
    // point every edge INTO the hub so no wedge is ever enumerated
    val star = edges((1L to 1000L).map(i => (0L, i)))
    val (nodes, es, wedges, tris, trans) = triRow(star)
    assert(nodes == 1001 && es == 1000 && tris == 0)
    assert(wedges == 1000L * 999L / 2)  // wedge COUNT still sees the hub
    assert(trans == 0.0)
  }

  test("two triangles sharing an edge: 2 triangles, once each") {
    // bowtie-on-an-edge: {1,2,3} and {1,2,4} share edge (1,2); a
    // miscounting kernel (double-count or /3 fixup) cannot return 2
    val e = edges(Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)))
    assert(triRow(e)._4 == 2)
  }

  test("pagerank on a regular graph is the exact integer fixpoint") {
    // cycle C8: deg = 2 everywhere, so every iteration maps
    // r = 1e6 -> 150000 + (85 * (2 * (1e6 div 2))) div 100 = 1e6;
    // the lattice never moves — any drift means the contribution
    // join or the damping arithmetic is broken
    val cycle = edges((0L until 8L).map(i => (i, (i + 1) % 8))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) })
    val r = Joins.pageRankRanks(cycle, 5)
      .select(col("r")).as[Long].collect()
    assert(r.length == 8 && r.forall(_ == 1000000L))
  }

  test("pagerank mass flows toward the hub, ranks are deterministic") {
    val star = edges((1L to 6L).map(i => (0L, i)))
    val r = Joins.pageRankRanks(star, 3)
      .select(col("n"), col("r")).as[(Long, Long)].collect().toMap
    // hub absorbs each leaf's full contribution, leaves split the
    // hub's — hub must strictly dominate every leaf
    assert((1L to 6L).forall(i => r(0L) > r(i)))
    // leaves are symmetric: identical integer ranks, no tie noise
    assert((1L to 6L).map(r).toSet.size == 1)
  }

  test("q30 BFS: hop counts on a path are one node per level") {
    val path = edges(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    val src = Seq(1L).toDF("node")
    val d = Joins.bfsDistances(path, src, 3)
      .orderBy("d").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(d.toSeq == Seq((1L, 0), (2L, 1), (3L, 2), (4L, 3)))
  }

  test("q30 BFS: star reaches every leaf in one hop from the hub, " +
      "two from a leaf") {
    val star = edges((1L to 50L).map(i => (0L, i)))
    val fromHub = Joins.bfsDistances(star, Seq(0L).toDF("node"), 3)
      .groupBy("d").count().orderBy("d").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(fromHub.toSeq == Seq((0, 1L), (1, 50L)))
    val fromLeaf = Joins.bfsDistances(star, Seq(7L).toDF("node"), 3)
      .groupBy("d").count().orderBy("d").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    // hop 0: the leaf; hop 1: the hub; hop 2: the other 49 leaves
    assert(fromLeaf.toSeq == Seq((0, 1L), (1, 1L), (2, 49L)))
  }

  test("q30 BFS: depth bound truncates, min-hop wins on multi-path") {
    // diamond + tail: 1-2, 1-3, 2-4, 3-4, 4-5, 5-6; from 1, node 4 is
    // reachable via two length-2 paths (min wins, counted once), node
    // 6 is at hop 4 — beyond depth 3, absent.
    val g = edges(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)))
    val d = Joins.bfsDistances(g, Seq(1L).toDF("node"), 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(d.toSeq == Seq((1L, 0), (2L, 1), (3L, 1), (4L, 2), (5L, 3)))
  }

  test("q41 components: planted multi-component graphs resolve to " +
      "exact size distribution, labels are component minima") {
    // K3 + path of 4 + isolated edge: sizes 2, 3, 4 with min labels
    val g = edges(Seq(
      (10L, 11L), (11L, 12L), (10L, 12L),         // triangle {10,11,12}
      (20L, 21L), (21L, 22L), (22L, 23L),         // path {20..23}
      (30L, 31L)))                                // edge {30,31}
    val out = Joins.componentSizes(g).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((2L, 1L, 30L), (3L, 1L, 10L), (4L, 1L, 20L)))
    // a long path forces many propagation rounds (diameter = rounds):
    // 30-node path converges to ONE component labeled by its head
    val path = edges((0L until 29L).map(i => (i, i + 1)))
    val pout = Joins.componentSizes(path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pout.toSeq == Seq((30L, 1L, 0L)))
  }

  test("q41 star contraction: diameter-100 path converges in O(log n) " +
      "rounds where min-label would need 100") {
    // The registered q41 engine. A 101-node path (diameter 100) is the
    // adversarial shape for label propagation; star contraction must
    // still resolve it exactly — one component, labeled by its head.
    val path = edges((0L until 100L).map(i => (i, i + 1)))
    val out = Joins.componentSizesStar(path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((101L, 1L, 0L)))
  }

  test("q41 star contraction agrees with fixpoint propagation on " +
      "planted multi-component graphs") {
    val g = edges(Seq(
      (10L, 11L), (11L, 12L), (10L, 12L),         // triangle {10,11,12}
      (20L, 21L), (21L, 22L), (22L, 23L),         // path {20..23}
      (30L, 31L)))                                // edge {30,31}
    val star = Joins.componentSizesStar(g).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val fix = Joins.componentSizes(g).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(star.toSeq == fix.toSeq)
    assert(star.toSeq == Seq((2L, 1L, 30L), (3L, 1L, 10L), (4L, 1L, 20L)))
    // empty edge list: both engines return an empty distribution
    val none = edges(Seq.empty)
    assert(Joins.componentSizesStar(none).isEmpty)
    assert(Joins.componentSizes(none).isEmpty)
  }

  test("q41 fixpoint: exceeding the round cap throws loud, never " +
      "returns a partial labeling") {
    // diameter 200 > the 64-round cap: min-label propagation cannot
    // converge, and the contract is an exception — a silent partial
    // labeling would report a WRONG component count.
    val longPath = edges((0L until 200L).map(i => (i, i + 1)))
    val ex = intercept[IllegalArgumentException] {
      Joins.componentSizes(longPath).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
    // the same graph resolves fine through the registered star engine
    val out = Joins.componentSizesStar(longPath).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((201L, 1L, 0L)))
  }
}
