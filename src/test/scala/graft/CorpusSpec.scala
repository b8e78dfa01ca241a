package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusOps

/** Semantics of the corpus-selection pack (l85-l89): each test verifies
  * the operator against an INDEPENDENT recomputation written directly
  * in the test (driver-side Scala over collected rows), not against the
  * operator's own ingredients — the same discipline as KMeansSpec. */
class CorpusSpec extends SparkSpec {

  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  // ---- l85 MMR ---------------------------------------------------------

  test("l95: shared prefixes save (n-1)·|prefix| tokens; short docs " +
      "group by their own full prefix") {
    val d = Seq(
      "a b c d e", "a b c x y", "a b c",  // 3-way share of "a b c"
      "q r s t",                          // unshared
      "m n", "m n")                       // 2-token docs, full-prefix share
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val r = CorpusOps.prefixCacheStats(d).collect()(0)
    assert(r.getAs[Long]("n_docs") === 6L)
    assert(r.getAs[Long]("n_prefix_groups") === 3L)
    assert(r.getAs[Long]("n_docs_sharing") === 5L)
    // (3-1)·3 for the "a b c" group + (2-1)·2 for the "m n" group
    assert(r.getAs[Long]("saved_tokens") === 8L)
    assert(r.getAs[Long]("total_tokens") === 21L)
    assert(r.getAs[Long]("cache_hit_permille") === 8000L / 21L)
  }

  test("l95: a prefix-free corpus saves nothing") {
    val d = Seq("a b c", "d e f", "g h i")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val r = CorpusOps.prefixCacheStats(d).collect()(0)
    assert(r.getAs[Long]("saved_tokens") === 0L)
    assert(r.getAs[Long]("cache_hit_permille") === 0L)
  }

  test("l85: greedy MMR selection matches a brute-force reimplementation") {
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val nrm = rows.map { case (id, v) => id -> math.sqrt(dot(v, v)) }
    val (av, an) = (rows(0L), nrm(0L))
    val rel = rows.collect { case (id, v) if id != 0L =>
      id -> dot(v, av) / (nrm(id) * an)
    }
    val pool = rel.toSeq.sortBy { case (id, r) => (-r, id) }
      .take(24).map(_._1)
    var sel = Vector.empty[(Long, Long, Double, Double)]
    for (step <- 1 to 6) {
      val picked = pool.filterNot(id => sel.exists(_._2 == id))
        .map { id =>
          val mx =
            if (sel.isEmpty) 0.0
            else sel.map { case (_, sid, _, _) =>
              dot(rows(id), rows(sid)) / (nrm(id) * nrm(sid))
            }.max
          (id, rel(id), 0.7 * rel(id) - 0.3 * mx)
        }
        .minBy { case (id, _, m) => (-m, id) }
      sel :+= ((step.toLong, picked._1, picked._2, picked._3))
    }
    val got = q("l85_mmr_diversify").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toVector
    assert(got === sel)
    // the selection actually diversified: some step picked a candidate
    // that was NOT the highest-rel among those remaining at that step
    val relRank = pool.sortBy(id => (-rel(id), id))
    val greedyByRel = relRank.take(6).map(_.toLong).toSet
    assert(got.map(_._2).toSet !== greedyByRel,
      "MMR output equals the pure-relevance top-k — no diversification")
  }

  // ---- l86 winnowing ---------------------------------------------------

  test("l86: per-doc fingerprints match an independent winnowing pass " +
      "and satisfy the every-window coverage guarantee") {
    val doc = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") === 0).select(col("text")).head.getString(0)
    val nt = doc.toLowerCase.replaceAll("\\s+", " ").trim
    val k = 8; val w = 4
    val grams = (0 to nt.length - k).map { i =>
      val h = nt.substring(i, i + k).foldLeft(0L) { (acc, ch) =>
        (acc * 131 + ch.toLong) % 1000000007L
      }
      (i, h)
    }
    val expected = (w - 1 until grams.length).map { p =>
      // min hash in window [p-w+1, p], rightmost on ties
      grams.slice(p - w + 1, p + 1).minBy { case (pos, h) => (h, -pos) }
    }.distinct.toSet
    val got = CorpusOps.winnowedFingerprints(spark, sfDir)
      .filter(col("doc_id") === 0)
      .select(col("fp_pos"), col("fp_h")).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1))).toSet
    assert(got === expected)
    // coverage guarantee: every window of w consecutive grams contains
    // at least one selected position
    val positions = got.map(_._1)
    (w - 1 until grams.length).foreach { p =>
      assert((p - w + 1 to p).exists(positions.contains),
        s"window ending at $p has no fingerprint")
    }
  }

  test("l86: native kgram_hashes is bit-equal to its HOF specification " +
      "over the whole corpus") {
    val t = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        graft.functions.Text.norm(col("text")).as("nt"))
    val both = t.select(col("doc_id"),
        graft.functions.Text.kgramHashes(col("nt"), 8).as("native"),
        graft.functions.Text.kgramHashesHof("nt", 8).as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2),
        s"kgram hash mismatch for doc ${r.getLong(0)}")
    }
  }

  test("l86: pair output is symmetric-free and df-capped") {
    val out = q("l86_winnowing").collect()
    assert(out.length <= 10)
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
    assert(out.forall(r => r.getLong(2) > 0))
  }

  // ---- l87 binary rerank ----------------------------------------------

  test("l87: packed signatures encode the sign pattern of the raw dims") {
    val r = CorpusOps.binarySignatures(spark, sfDir)
      .filter(col("vec_id") === 7)
      .select(col("vec"), col("lo"), col("hi")).head
    val vec = r.getSeq[Double](0)
    val (lo, hi) = (r.getLong(1), r.getLong(2))
    (0 until 32).foreach { j =>
      assert(((lo >> j) & 1L) === (if (vec(j) > 0) 1L else 0L))
      assert(((hi >> j) & 1L) === (if (vec(j + 32) > 0) 1L else 0L))
    }
    assert(lo >= 0 && hi >= 0, "packed halves must stay non-negative")
  }

  test("l87: reranked hits are the exact-cosine best of the Hamming " +
      "candidate set") {
    val sig = CorpusOps.binarySignatures(spark, sfDir)
      .select(col("vec_id"), col("vec"), col("nrm"),
        col("lo"), col("hi")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray,
        r.getDouble(2), r.getLong(3), r.getLong(4)))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val byId = sig.map(t => t._1 -> t).toMap
    val out = q("l87_binary_rerank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length === 16) // 4 probes x top 4
    Seq(0L, 1L, 2L, 3L).foreach { p =>
      val (_, pv, pn, plo, phi) = byId(p)
      val cands = sig.filter(_._1 != p)
        .map { case (id, v, n, lo, hi) =>
          val ham = java.lang.Long.bitCount(lo ^ plo) +
            java.lang.Long.bitCount(hi ^ phi)
          (id, ham, dot(v, pv) / (n * pn))
        }
        .sortBy { case (id, ham, _) => (ham, id) }.take(16)
      val expect = cands.sortBy { case (id, _, c) => (-c, id) }.take(4)
        .map { case (id, ham, c) => (p, id, ham.toLong, c) }.toSeq
      val got = out.filter(_._1 == p).toSeq
      assert(got === expect, s"probe $p rerank mismatch")
    }
  }

  // ---- l88 k-fold ------------------------------------------------------

  test("l88: fold sizes partition the corpus; grouped leakage never " +
      "exceeds naive leakage in total") {
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val out = q("l88_kfold_leakage").collect()
    assert(out.map(_.getLong(1)).sum === total)
    assert(out.map(_.getLong(3)).sum === total)
    val leakN = out.map(_.getLong(2)).sum
    val leakG = out.map(_.getLong(4)).sum
    // same-source docs co-fold under grouped assignment, so only
    // cross-source dup fingerprints can leak — never more than naive
    assert(leakG <= leakN, s"grouped leak $leakG > naive leak $leakN")
  }

  test("l88: naive leak total equals the count of docs whose fingerprint " +
      "spans >1 naive fold (independent SQL recomputation)") {
    spark.read.parquet(s"$sfDir/documents.parquet")
      .createOrReplaceTempView("cv_docs")
    val mix = graft.functions.Text.portableMixWideSql("doc_id")
    val expected = spark.sql(
      s"""WITH b AS (SELECT doc_id,
         |  md5(lower(trim(regexp_replace(text, '\\\\s+', ' ')))) AS fp,
         |  pmod($mix, 5) AS f FROM cv_docs)
         |SELECT COUNT(*) FROM b
         |WHERE fp IN (SELECT fp FROM b GROUP BY fp
         |             HAVING COUNT(DISTINCT f) > 1)""".stripMargin)
      .head.getLong(0)
    val got = q("l88_kfold_leakage").collect().map(_.getLong(2)).sum
    assert(got === expected)
  }

  // ---- l89 collocations ------------------------------------------------

  test("l89: top collocation's lift recomputes from brute-force counts") {
    val out = q("l89_collocation_lift").collect()
    assert(out.nonEmpty && out.length <= 20)
    val top = out.head
    val (w1, w2) = (top.getString(0), top.getString(1))
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("text")).collect()
      .map(_.getString(0).toLowerCase.replaceAll("\\s+", " ").trim
        .split(" ").toSeq)
    val bigrams = toks.flatMap(t => t.zip(t.drop(1)))
    val n = bigrams.length.toLong
    val cab = bigrams.count(b => b._1 == w1 && b._2 == w2).toLong
    val ca = bigrams.count(_._1 == w1).toLong
    val cb = bigrams.count(_._2 == w2).toLong
    assert(top.getLong(2) === cab)
    assert(top.getLong(3) === ((1000000L * cab) / ca) * n / cb)
    assert(cab >= 5)
    // ranking sanity: lift is non-increasing down the output
    val lifts = out.map(_.getLong(3)).toSeq
    assert(lifts === lifts.sorted.reverse)
  }
}
