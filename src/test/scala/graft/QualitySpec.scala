package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityOps

/** Semantic contracts for the QualityOps pack (l62-l64) on crafted
  * fixtures where each rule provably bites — the synthetic corpus only
  * exercises them at its natural rates. */
class QualitySpec extends SparkSpec {

  import spark.implicits._

  // A document that passes all five l62 rules: 25 distinct 4-char-ish
  // tokens including two stopwords, no token repeated.
  private val cleanDoc =
    "the data lake runs fast scan with wide rows over cold disk and " +
      "warm heap plus tidy sort keys that pack neat byte maps well"

  test("l62: the clean document passes all five rules") {
    val out = QualityOps.ruleColumns(Seq(("a", cleanDoc)).toDF("source", "text"))
      .select("r1", "r2", "r3", "r4", "r5").collect()(0)
    assert((0 to 4).forall(i => out.getBoolean(i)), out.toString)
  }

  test("l62: each planted violation flips exactly its own rule") {
    // r1: too short (5 tokens). Keep words 4-char avg, two stopwords.
    val shortDoc = "the lake runs and byte"
    // r2: mean word length out of [3.5, 4.5] — all 2-char tokens.
    val tinyWords = "the a it is we do my up on at " +
      "ab cd ef gh ij kl mn op qr st uv wx yz aa bb"
    // r3: low diversity — half the doc is one alternating pair, spelled
    // so every token appears >= 2 times (distinct < half) but no token
    // exceeds 20% (r5 still passes): 5 tokens × 4 repeats, shuffled.
    // 20 tokens, top token 4 => 5*4=20 <= 20 passes r5; distinct 5,
    // 2*5=10 < 20 fails r3. Add stopwords among the 5 so r4 passes;
    // 4-char mass keeps r2.
    val lowDiversity = Array.fill(4)("the lake runs and byte").mkString(" ")
    // r4: no stopwords — clean doc with stop tokens swapped out.
    val noStops = cleanDoc.replaceAll("\\bthe\\b", "big")
      .replaceAll("\\band\\b", "hot")
    // r5: dominance — one token is 8 of 25.
    val dominated = ("lake " * 8) + cleanDoc.split(" ").take(15)
      .mkString(" ") + " the and"
    val d = Seq(
      ("r1", shortDoc), ("r2", tinyWords), ("r3", lowDiversity),
      ("r4", noStops), ("r5", dominated)).toDF("source", "text")
    val rows = QualityOps.ruleColumns(d)
      .select(col("source"), col("r1"), col("r2"), col("r3"), col("r4"),
        col("r5"))
      .collect().map(r => r.getString(0) ->
        Seq(r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
          r.getBoolean(4), r.getBoolean(5))).toMap
    for ((planted, flags) <- rows; (f, i) <- flags.zipWithIndex) {
      val rule = s"r${i + 1}"
      if (rule == planted) assert(!f, s"$planted should fail $rule")
      else assert(f, s"$planted should still pass $rule (${flags})")
    }
  }

  test("l63: band function is the floor-log2 of the score") {
    val bands = spark.sql(
      "SELECT " + Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L,
        (1L << 20) + 5L)
        .map(v => QualityOps.bandSql(v.toString)).mkString(", "))
      .collect()(0)
    val expected = Seq(0, 0, 1, 1, 2, 2, 3, 9, 10, 20)
    expected.zipWithIndex.foreach { case (e, i) =>
      assert(bands.getInt(i) == e, s"band(${i}) = ${bands.getInt(i)} != $e")
    }
  }

  test("l64: shared-prefix near-edit pair is a fuzzy dup; disjoint " +
      "prefix is never a candidate") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val nearEdit = base.replace("theta", "thetaa") // distance 1
    val farText = "omega psi chi phi upsilon tau sigma rho pi omicron"
    val d = Seq(
      (1L, "a", base), (2L, "a", nearEdit), (3L, "a", farText))
      .toDF("doc_id", "source", "text")
    val pairs = QualityOps.fuzzyPairs(d).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getAs[Long]("id_a") == 1L)
    assert(pairs(0).getAs[Long]("id_b") == 2L)
    assert(pairs(0).getAs[Long]("dist") == 1L)
  }

  test("l67: planted exact dups are all banding candidates, all " +
      "confirmed, none missed") {
    // 3 exact copies of one doc (3 pairs) + 2 of another (1 pair) + a
    // unique doc; every doc long enough to shingle.
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "one two three four five six seven eight nine"
    val u = "lone wolf document with no duplicate anywhere here"
    val d = Seq((1L, a), (2L, a), (3L, a), (4L, b), (5L, b), (6L, u))
      .map { case (id, t) => (id, "s", t) }
      .toDF("doc_id", "source", "text")
    val r = QualityOps.dedupConsistencyStats(d).collect()(0)
    assert(r.getAs[Long]("n_exact_pairs") == 4L)
    assert(r.getAs[Long]("n_missed_by_banding") == 0L)
    assert(r.getAs[Long]("n_confirmed") == 4L)
  }

  test("l64: identical docs land at distance zero") {
    val d = Seq((1L, "a", cleanDoc), (2L, "b", cleanDoc))
      .toDF("doc_id", "source", "text")
    val pairs = QualityOps.fuzzyPairs(d).collect()
    assert(pairs.length == 1 && pairs(0).getAs[Long]("dist") == 0L)
  }

  test("l66 law: vocabulary coverage is monotone in k and bounded by " +
      "the token mass") {
    val rows = graft.SparkEntry.queries("l66_vocab_sweep")(spark, sfDir)
      .orderBy("k").collect()
    assert(rows.length == 4)
    val covered = rows.map(_.getAs[Long]("covered_tokens"))
    assert(covered.zip(covered.tail).forall { case (a, b) => a <= b },
      s"coverage must be monotone in k: ${covered.toSeq}")
    val total = rows.head.getAs[Long]("n_tokens")
    assert(covered.forall(_ <= total))
    val perm = rows.map(_.getAs[Long]("coverage_permille"))
    assert(perm.forall(p => p >= 0 && p <= 1000))
  }

  test("l65 law: hapax and top-10 masses stay within their frames") {
    graft.SparkEntry.queries("l65_zipf_audit")(spark, sfDir)
      .collect().foreach { r =>
        val vocab = r.getAs[Long]("vocab_size")
        val toks = r.getAs[Long]("n_tokens")
        assert(r.getAs[Long]("n_hapax") <= vocab)
        assert(r.getAs[Long]("top10_mass") <= toks)
        assert(vocab <= toks)
      }
  }

  // ---- l101: distributed skyline laws ---------------------------------

  /** Brute-force 2-D skyline by the strict-domination definition — the
    * quadratic spec the bucketed plan must equal. */
  private def bruteSkyline(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filter { case (_, n, q) =>
      !pts.exists { case (_, bn, bq) =>
        bn <= n && bq >= q && (bn < n || bq > q)
      }
    }.toSet

  private def frontierPoints(dir: String): Seq[(Long, Long, Long)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        graft.functions.Text.tokens(col("text")).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("n"),
        size(array_distinct(col("tk"))).cast("long").as("d"))
      .withColumn("q", expr("(1000 * d) div n"))
      .select("doc_id", "n", "q")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("l101 law: the two-phase bucketed skyline equals the brute-force " +
      "domination definition over the whole corpus") {
    val got = graft.SparkEntry.queries("l101_pareto_frontier")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = bruteSkyline(frontierPoints(sfDir))
    assert(got == want,
      s"two-phase skyline diverged: extra=${got -- want} missing=${want -- got}")
  }

  test("l101 law: 2-D skylines merge — skyline(A ∪ B) = " +
      "skyline(skyline(A) ∪ skyline(B))") {
    // The algebraic property the bucket decomposition relies on
    // (Börzsönyi et al. ICDE'01): local frontiers lose no global
    // frontier point. Split the corpus by doc_id parity.
    val pts = frontierPoints(sfDir)
    val (a, b) = pts.partition(_._1 % 2 == 0)
    val merged = bruteSkyline((bruteSkyline(a) ++ bruteSkyline(b)).toSeq)
    assert(merged == bruteSkyline(pts))
  }

  // ---- l102: clipped-overlap laws --------------------------------------

  private def docsFixture(rows: Seq[(Long, String)]): String = {
    val dir = graft.core.Scratch.dir("l102fix")
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("l102: a full quotation flags the quoted direction only") {
    // doc 2 = doc 1 said twice: every bigram of 1 appears in 2 (clipped
    // precision 1→2 is exactly 1), while 2's doubled+bridge bigrams
    // cannot all fit inside 1 (precision 2→1 < 1/2). 30 distinct tokens
    // keep the pair inside the LSH candidate set (signature overlap
    // stays high when only 2 of 30 shingles are new).
    val s0 = (1 to 30).map(i => s"tok$i").mkString(" ")
    val dir = docsFixture(Seq(
      (1L, s0), (2L, s0 + " " + s0),
      (3L, "entirely different words about other things here now")))
    val r = graft.SparkEntry.queries("l102_clipped_overlap")(spark, dir)
      .head()
    assert(r.getAs[Long]("n_candidates") >= 1L,
      s"the quotation pair must surface as an LSH candidate: $r")
    assert(r.getAs[Long]("n_quote_a_in_b") == 1L,
      s"doc 1 is wholly quoted inside doc 2: $r")
    assert(r.getAs[Long]("n_quote_b_in_a") == 0L,
      s"doc 2 is NOT mostly contained in doc 1: $r")
    // clip law: the clipped numerator can exceed neither denominator
    assert(r.getAs[Long]("micro_clip") <= r.getAs[Long]("micro_den_a"))
    assert(r.getAs[Long]("micro_clip") <= r.getAs[Long]("micro_den_b"))
  }

  test("l102 law: corpus rollup keeps clip ≤ each denominator and " +
      "quote counts within scored pairs") {
    val r = graft.SparkEntry.queries("l102_clipped_overlap")(
      spark, sfDir).head()
    val scored = r.getAs[Long]("n_scored_pairs")
    assert(scored <= r.getAs[Long]("n_candidates"))
    assert(r.getAs[Long]("n_quote_a_in_b") <= scored)
    assert(r.getAs[Long]("n_quote_b_in_a") <= scored)
    assert(r.getAs[Long]("micro_clip") <= r.getAs[Long]("micro_den_a"))
    assert(r.getAs[Long]("micro_clip") <= r.getAs[Long]("micro_den_b"))
  }

  // ---- l103: classifier inference totality ------------------------------

  test("l103 law: every document is scored (totality) and the score " +
      "mass respects the weight-table bound") {
    val rows = graft.SparkEntry.queries("l103_quality_classifier")(
      spark, sfDir).collect()
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(rows.map(_.getAs[Long]("n_docs")).sum == raw.count(),
      "classifier must score every document exactly once")
    // |Σ score - bias·n| ≤ max|w| · Σ tokens: the dot product cannot
    // manufacture mass beyond the largest weight per token
    val totalToks = raw
      .select(size(graft.functions.Text.tokens(col("text"))).cast("long"))
      .collect().map(_.getLong(0)).sum
    val sumScore = rows.map(_.getAs[Long]("sum_score_milli")).sum
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(math.abs(sumScore - (-50L) * nDocs) <= 410L * totalToks)
    rows.foreach { r =>
      val p = r.getAs[Long]("pos_permille")
      assert(p >= 0 && p <= 1000)
      assert(r.getAs[Long]("n_pos") <= r.getAs[Long]("n_docs"))
    }
  }

  // ---- l104: nDCG laws ---------------------------------------------------

  test("l104 laws: dcg ≤ idcg, idcg matches the prefix table at " +
      "min(n_relevant, 10), and n_relevant agrees with l71") {
    // the discount table pinned independently of the implementation
    val disc = Seq(1000L, 631L, 500L, 431L, 387L, 356L, 333L, 315L, 301L, 289L)
    val cum = disc.scanLeft(0L)(_ + _).tail
    val rows = graft.SparkEntry.queries("l104_ndcg")(spark, sfDir)
      .collect()
    assert(rows.length == 4, "one row per probe query")
    val l71 = graft.SparkEntry.queries("l71_retrieval_quality")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_relevant"))
      .toMap
    rows.foreach { r =>
      val nRel = r.getAs[Long]("n_relevant")
      val dcg = r.getAs[Long]("dcg_milli")
      val idcg = r.getAs[Long]("idcg_milli")
      val perm = r.getAs[Long]("ndcg_permille")
      assert(l71(r.getString(0)) == nRel)
      assert(dcg <= idcg, s"DCG can never beat the ideal ordering: $r")
      val k = math.min(nRel, 10L).toInt
      assert(idcg == (if (k == 0) 0L else cum(k - 1)),
        s"ideal DCG must be the table prefix at $k: $r")
      assert(perm >= 0 && perm <= 1000)
    }
  }
}
