package graft

import org.apache.spark.sql.functions._
import graft.operators.LlmOps

/** Semantic contracts for the near-dup cluster builder (l21) that the
  * aggregate-level DuckDB oracle can't isolate: transitive merging
  * across a chain, hub-shingle exclusion, and singleton handling. */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  // 9+ tokens so each doc yields 8-shingles; chain A~B~C shares runs of
  // 8 tokens pairwise but A and C share none.
  private val run1 = "a1 a2 a3 a4 a5 a6 a7 a8"     // A ∩ B
  private val run2 = "b1 b2 b3 b4 b5 b6 b7 b8"     // B ∩ C
  private val docA = s"$run1 tailA1 tailA2 tailA3"
  private val docB = s"$run1 $run2"
  private val docC = s"$run2 tailC1 tailC2 tailC3"
  private val solo = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"

  test("chain A~B~C collapses transitively into one cluster") {
    val d = Seq((1L, docA), (2L, docB), (3L, docC), (4L, solo))
      .toDF("doc_id", "text")
    val r = LlmOps.dedupClusters(d).head()
    assert(r.getAs[Long]("n_docs") == 4)
    // {A,B,C} is one cluster (A and C share no shingle — only the
    // propagation through B can merge them) + the singleton.
    assert(r.getAs[Long]("n_clusters") == 2,
      s"expected chain collapsed to one cluster: $r")
    assert(r.getAs[Long]("max_cluster") == 3)
    assert(r.getAs[Long]("n_merged_docs") == 2)
  }

  test("hub shingles above the df cap create no edges") {
    // One 8-token run shared by 7 docs: df=7 > maxDf=5, so the hub is
    // dropped and every doc stays a singleton.
    val hub = "h1 h2 h3 h4 h5 h6 h7 h8"
    val d = (1L to 7L).map(i => (i, s"$hub uniq${i}a uniq${i}b uniq${i}c"))
      .toDF("doc_id", "text")
    val r = LlmOps.dedupClusters(d).head()
    assert(r.getAs[Long]("n_edges") == 0, s"hub must be excluded: $r")
    assert(r.getAs[Long]("n_clusters") == 7)
    assert(r.getAs[Long]("max_cluster") == 1)
  }

  test("edge-free corpus degenerates to all-singleton clusters") {
    val d = Seq((10L, solo), (11L, docA)).toDF("doc_id", "text")
    val r = LlmOps.dedupClusters(d).head()
    assert(r.getAs[Long]("n_clusters") == 2)
    assert(r.getAs[Long]("n_merged_docs") == 0)
    assert(r.getAs[Long]("max_cluster") == 1)
  }
}
