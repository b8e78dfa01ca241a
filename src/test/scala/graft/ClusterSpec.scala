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

  test("minhash candidates feed cluster construction transitively") {
    // The integration the two operators exist for: l07's confirmed
    // candidate pairs ARE a clusterEdges edge set. A near-dup chain
    // A~B~C (each link one token edit apart, A and C two apart) must
    // come out as ONE cluster even if the A-C pair itself was never a
    // candidate.
    val base = "the quick brown fox jumps over the lazy dog near the river bank today again"
    val d = Seq(
      (1L, base),
      (2L, base.replace("today", "tonight")),
      (3L, base.replace("today", "tonight").replace("quick", "swift")),
      (4L, "completely different content about spark shuffles and partition planning strategies here")
    ).toDF("doc_id", "text")
    val edges = LlmOps.minhashCandidates(d, jaccardThreshold = 0.5)
      .filter(col("confirmed"))
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val labels = LlmOps.clusterEdges(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.get(1L).contains(1L) && labels.get(2L).contains(1L)
      && labels.get(3L).contains(1L),
      s"chain must collapse to the min-id label: $labels")
    assert(!labels.contains(4L), "unrelated doc must stay a singleton")
  }

  test("incremental dedup collapses within-batch dups and drops index hits") {
    // The parquet fixture has no duplicate fingerprints, so the oracle
    // gate can't tell l26's dedup machinery from the identity function
    // there. This corpus plants both failure modes: an incoming doc
    // that already exists in the historical index (doc 400 = doc 1),
    // and a within-batch duplicate pair (401/402).
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val c = "one two three four five six seven eight nine"
    val d = Seq(
      (1L, a), (2L, "historical only doc with its own words"),
      (400L, a),                    // index hit: dup of doc 1
      (401L, c), (402L, c),         // within-batch duplicate pair
      (403L, "fresh incoming document nothing matches")
    ).toDF("doc_id", "text")
    val dir = graft.core.Scratch.dir("l26fix")
    d.withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.SparkEntry.queries("l26_incremental_dedup")(spark, dir).head()
    assert(r.getAs[Long]("n_incoming") == 4)
    assert(r.getAs[Long]("n_batch_unique") == 3,
      s"401/402 must collapse within the batch: $r")
    assert(r.getAs[Long]("n_new") == 2,
      s"doc 400 must be dropped as an index hit: $r")
  }

  test("curation funnel: every stage bites on a corpus built to trip it") {
    // The parquet fixture's word-salad text passes quality and has no
    // exact dups at small SFs, so the oracle gate only exercises the
    // sampling stage there. This corpus trips all four: src0 (200‰
    // tier) holds a good doc, an exact dup of it, and a repetitive doc
    // that fails the 2-gram rule; src2 (900‰ tier) holds two good docs.
    val good = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val repetitive = ("spam ham " * 20).trim             // dup_frac >> 0.2
    val short = "tiny doc"                               // < 10 tokens
    val d = Seq(
      (0L, good, "src0"), (20L, good, "src0"),           // exact dup pair
      (40L, repetitive, "src0"), (60L, short, "src0"),
      (2L, s"$good unique tail one", "src2"),
      (22L, s"$good unique tail two", "src2")
    ).toDF("doc_id", "text", "source")
    val byCuration = graft.SparkEntry.queries("l25_curation_pipeline")
    // run the pipeline body over the crafted frame via the same code
    // path: swap the loader by writing the frame as a scratch table
    // (Scratch.dir registers the tree for JVM-exit cleanup)
    val dir = graft.core.Scratch.dir("l25fix")
    d.withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = byCuration(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap

    val s0 = out("src0")
    assert(s0.getAs[Long]("n_input") == 4)
    assert(s0.getAs[Long]("n_quality") == 2,
      s"repetitive + short must fail quality: $s0") // good + its dup
    assert(s0.getAs[Long]("n_unique") == 1, s"exact dup must collapse: $s0")
    assert(s0.getAs[Long]("n_sampled") <= 1)
    val s2 = out("src2")
    assert(s2.getAs[Long]("n_quality") == 2 && s2.getAs[Long]("n_unique") == 2)
    assert(s2.getAs[Long]("n_sequences") ==
      (s2.getAs[Long]("sampled_tokens") + 511) / 512)
  }

  test("l34: the higher-quality near-dup survives, not the lower id") {
    // two near-dups sharing an 8-token run; doc 1 (lower id) is noisier
    // (digits cut its alpha ratio), doc 2 is clean — quality-aware
    // survivorship must pick doc 2 where min-id would keep doc 1
    val run = "w1 w2 w3 w4 w5 w6 w7 w8"
    val d = Seq(
      (1L, s"$run 000 111 222 333", "s"),
      (2L, s"$run clean extra words here", "s"),
      (9L, "lone doc with its own text entirely", "s"))
      .toDF("doc_id", "text", "source")
    val r = LlmOps.qualitySurvivors(d).collect()(0)
    assert(r.getAs[Long]("n_docs") == 3)
    assert(r.getAs[Long]("n_kept") == 2, s"cluster + singleton: $r")
    assert(r.getAs[Long]("n_dropped") == 1)
    assert(r.getAs[Long]("n_upgrades") == 1,
      s"quality must beat min-id survivorship: $r")
  }
}
