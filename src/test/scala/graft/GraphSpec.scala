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
}
