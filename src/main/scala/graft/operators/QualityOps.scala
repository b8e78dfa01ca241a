package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Barriers, Tables => T, QueryPack}
import graft.functions.Text

/** Corpus-quality gate operators in the Gopher/CCNet mold — the rule
  * batteries and model-based filters a pretraining pipeline runs
  * between raw ingestion and dedup (Rae et al. 2021 "Scaling Language
  * Models" table A1; Wenzek et al. 2020 CCNet; reference corpus ops:
  * /root/reference/README.md:236-268 quality pipeline stage).
  *
  * Everything is a pure Catalyst expression tree (no UDFs), and every
  * statistic is computed in INTEGER arithmetic (cross-multiplied
  * thresholds, floored ratios) so the DuckDB oracle replays results
  * bit-exactly — the same determinism contract as l19/l24/l57.
  *
  * 100 TB design notes:
  *  - l62 rule battery: one narrow projection per document (every rule
  *    is per-row arithmetic over the token array), then one map-side-
  *    combined rollup on source. No join, one exchange of ~|sources|
  *    partial rows per partition. Linear, codegen'd end to end.
  *  - l63 perplexity bands: the bigram model is a hash agg over the
  *    exploded token stream (map-side combine collapses Zipf-hot
  *    bigrams before the exchange); scoring re-joins the stream on the
  *    bigram key. At 100 TB the model would be pruned to top-K rows
  *    and broadcast (l24 documents the same cut); band assignment is
  *    integer CASE bucketing — no float log2 in either engine.
  *  - l64 fuzzy dedup: candidate pairs come from an equi-join on a
  *    prefix fingerprint, so pair work is Σ bucket² (l55's bound),
  *    never corpus². The Levenshtein confirm runs only on candidates.
  */
object QualityOps extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    T.load(s, dir, "documents")

  // ---- l62: Gopher-style quality rule battery -------------------------

  /** Stopword list for the R4 rule — tokens that actually occur in the
    * synthetic corpus so the rule discriminates (a list the corpus
    * never hits would pass/fail uniformly and test nothing). */
  private val ruleStops = Seq("the", "a", "of", "to", "and", "in")

  /** l62: per-document quality rule battery, rolled up per source.
    *
    * Five Gopher-table-A1-shaped rules, each an integer comparison:
    *   R1 length:     20 <= n_tok <= 60
    *   R2 word size:  mean token length in [3.5, 4.5] chars, spelled
    *                  35*n_tok <= 10*n_chars <= 45*n_tok (no division)
    *   R3 diversity:  distinct tokens >= half the tokens
    *   R4 stopwords:  >= 2 hits from [[ruleStops]]
    *   R5 dominance:  no single token exceeds 20% of the document,
    *                  spelled 5*top_tok <= n_tok
    *
    * Token char mass is length(norm) - (n_tok - 1): the normalized text
    * IS the tokens joined by single spaces, so no per-token fold is
    * needed. The dominance count nests higher-order lambdas (count of
    * each distinct token via filter) — O(distinct × n_tok) per row,
    * bounded by the document, independent of corpus size. */
  /** The per-document rule columns over any docs-shaped frame (source,
    * text), exposed so QualitySpec can drive planted single-rule
    * violations through the exact production expressions. */
  def ruleColumns(d: DataFrame): DataFrame =
    ruleColumnsWithKeys(d, Seq("source"))

  /** The same battery with caller-chosen key columns carried through
    * (l80's pair audit needs doc_id beside source). */
  def ruleColumnsWithKeys(d: DataFrame, keys: Seq[String]): DataFrame =
    d.select(keys.map(col) :+
        Text.norm(col("text")).as("nrm") :+ Text.tokens(col("text")).as("tk"): _*)
      .withColumn("n_tok", size(col("tk")).cast("long"))
      .withColumn("n_chars",
        (length(col("nrm")) - (col("n_tok") - 1)).cast("long"))
      .withColumn("n_dist", size(array_distinct(col("tk"))).cast("long"))
      .withColumn("n_stop",
        Text.stopwordHits(col("tk"), ruleStops).cast("long"))
      .withColumn("top_tok", expr(
        "cast(array_max(transform(array_distinct(tk)," +
          " u -> size(filter(tk, t -> t = u)))) as bigint)"))
      .withColumn("r1", col("n_tok").between(20L, 60L))
      .withColumn("r2",
        lit(35L) * col("n_tok") <= lit(10L) * col("n_chars") &&
          lit(10L) * col("n_chars") <= lit(45L) * col("n_tok"))
      .withColumn("r3", col("n_dist") * 2 >= col("n_tok"))
      .withColumn("r4", col("n_stop") >= 2L)
      .withColumn("r5", col("top_tok") * 5 <= col("n_tok"))

  private val gopherRules: Q = (s, dir) => {
    def cnt(c: String) = sum(when(col(c), 1L).otherwise(0L)).as(s"pass_$c")
    ruleColumns(docs(s, dir))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        cnt("r1"), cnt("r2"), cnt("r3"), cnt("r4"), cnt("r5"),
        sum(when(col("r1") && col("r2") && col("r3") && col("r4")
          && col("r5"), 1L).otherwise(0L)).as("pass_all"))
      .orderBy(col("source"))
  }

  // ---- l63: bigram-LM perplexity bands --------------------------------

  /** Power-of-2 band of a non-negative integer commonness score —
    * integer CASE chain (l57's histogram trick), identical SQL in both
    * engines, so no float log2 enters the comparison. */
  def bandSql(c: String): String = {
    val arms = (0 to 19)
      .map(b => s"WHEN $c < ${1L << (b + 1)} THEN $b")
      .mkString(" ")
    s"CASE $arms ELSE 20 END"
  }

  /** l63: CCNet-style model-based banding — fit the corpus bigram count
    * model (l24's fit), score each DOCUMENT by its mean bigram
    * commonness (total corpus hits of its bigrams, floor-divided by its
    * bigram count — the rational stand-in for negative log-perplexity,
    * kept integer so membership is bit-reproducible), then band
    * documents by power-of-2 score and report the per-(source, band)
    * population. CCNet keeps the middle bands; the band populations
    * here are exactly that decision's input.
    *
    * Documents with fewer than 2 tokens have no bigrams and drop out of
    * the banding (both engines agree; documented contract). */
  private val perplexityBands: Q = (s, dir) => {
    val par = s.sparkContext.defaultParallelism
    val bg = Barriers.materialize(
      docs(s, dir)
        .select(col("source"), col("doc_id"),
          Text.tokens(col("text")).as("tk"))
        .repartition(par)
        .select(col("source"), col("doc_id"),
          explode(Text.shinglesFromTokens("tk", 2)).as("bg")))
    val model = bg.groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
    bg.join(model, Seq("bg"))
      .groupBy(col("source"), col("doc_id"))
      .agg(count(lit(1)).as("n_bg"), sum(col("cnt")).as("hits"))
      .withColumn("score", expr("hits div n_bg"))
      .withColumn("band", expr(bandSql("score")))
      .groupBy(col("source"), col("band"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("score")).as("min_score"),
        max(col("score")).as("max_score"))
      .orderBy(col("source"), col("band"))
  }

  // ---- l64: bucketed edit-distance fuzzy dedup ------------------------

  /** Tokens in the prefix fingerprint that buckets candidate pairs. */
  private val fuzzyPrefixTokens = 5
  /** Max Levenshtein distance for two documents to count as fuzzy
    * duplicates (full normalized text). */
  private val fuzzyMaxDist = 20

  /** l64: fuzzy (edit-distance) near-duplicate detection — the catch-net
    * for duplicates that token-set methods (l07/l08) and exact
    * fingerprints (l05) miss: small in-place edits. Candidates are
    * pairs sharing the md5 of their first [[fuzzyPrefixTokens]] tokens;
    * the Levenshtein confirm (classic unit-cost edit distance — Spark
    * and DuckDB implement the same definition) runs only on candidate
    * pairs, and the pair is ordered (id_a < id_b) so each is counted
    * once.
    *
    * 100 TB shape: the self-join is an equi-join on the 128-bit prefix
    * key — candidate work is Σ bucket² like l55, never corpus². Edit
    * distance is O(len_a × len_b) per pair; at web scale you'd carry
    * only (key, id, text-length) through the join and fetch text for
    * the surviving id pairs, and band the key with a length bucket so
    * wildly different sizes never pair. */
  /** Candidate pairs + edit distance over any docs-shaped frame
    * (source, doc_id, text) — exposed for QualitySpec's planted
    * near-dup / disjoint-prefix contracts. */
  def fuzzyPairs(docsDf: DataFrame): DataFrame = {
    val d = docsDf
      .select(col("source"), col("doc_id"), Text.norm(col("text")).as("nrm"),
        Text.tokens(col("text")).as("tk"))
      .withColumn("pfx",
        md5(array_join(slice(col("tk"), 1, fuzzyPrefixTokens), " ")))
      .select(col("source"), col("doc_id"), col("nrm"), col("pfx"))
    d.as("a")
      .join(d.as("b"),
        col("a.pfx") === col("b.pfx") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.source").as("source"),
        col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        levenshtein(col("a.nrm"), col("b.nrm")).cast("long").as("dist"))
  }

  private val fuzzyDedup: Q = (s, dir) => {
    fuzzyPairs(docs(s, dir))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_candidates"),
        sum(when(col("dist") <= fuzzyMaxDist, 1L).otherwise(0L))
          .as("n_fuzzy_dups"),
        sum(when(col("dist") === 0, 1L).otherwise(0L)).as("n_exact_dups"),
        min(col("dist")).as("min_dist"),
        max(col("dist")).as("max_dist"))
      .orderBy(col("source"))
  }

  // ---- l65: Zipf / hapax corpus audit ---------------------------------

  /** l65: token rank-frequency audit per source — the Zipf-shape
    * datasheet row: vocabulary size, token mass, hapax-legomenon count
    * (types seen once; the classic OCR-garbage / boilerplate signal at
    * the two ends), and the corpus share of the top-10 types. Shares
    * are integer permille with a deterministic (count DESC, token)
    * tie-break, so both engines rank and sum identically.
    *
    * 100 TB shape: explode → map-side-combined (source, token) hash agg
    * (Zipf skew works FOR the combine, l29's note); everything after is
    * vocabulary-sized. The rank window partitions by source — no global
    * single-partition sort. */
  private val zipfAudit: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val counts = docs(s, dir)
      .select(col("source"), explode(Text.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("c").desc, col("tok"))
    counts
      .withColumn("r", row_number().over(w))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("vocab_size"),
        sum(col("c")).as("n_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(when(col("r") <= 10, col("c")).otherwise(0L)).as("top10_mass"))
      .withColumn("top10_permille",
        expr("(1000 * top10_mass) div n_tokens"))
      .withColumn("hapax_permille",
        expr("(1000 * n_hapax) div vocab_size"))
      .orderBy("source")
  }

  // ---- l66: vocabulary-size coverage sweep ----------------------------

  /** Candidate vocabulary sizes for the coverage curve. */
  private val vocabSizes = Seq(256, 1024, 4096, 16384)

  /** l66: tokenizer-budget sweep — for each candidate vocabulary size
    * k, the corpus share covered by the top-k types (rank by count,
    * deterministic tie-break). l49 audits ONE fixed vocabulary's OOV;
    * this is the curve that picks the budget in the first place. The
    * k-membership join is a broadcast of a 4-row literal frame against
    * the vocabulary-ranked counts; coverage is integer permille.
    *
    * 100 TB shape: corpus pass = one exploded hash agg; the ranked
    * frame is vocabulary-sized. The rank window is global but runs
    * over the vocabulary, not the corpus — and at a real multi-billion-
    * type web vocabulary the same sweep would rank within hash shards
    * and merge shard-local prefixes (l59's two-phase prefix pattern). */
  private val vocabSweep: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val counts = docs(s, dir)
      .select(explode(Text.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val ranked = counts
      .withColumn("r", row_number().over(
        Window.orderBy(col("c").desc, col("tok"))))
    val totals = counts.agg(
      count(lit(1)).as("vocab_size"), sum(col("c")).as("n_tokens"))
    val ks = { import s.implicits._; vocabSizes.toDF("k") }
    ranked.join(broadcast(ks), col("r") <= col("k"))
      .groupBy(col("k"))
      .agg(sum(col("c")).as("covered_tokens"))
      .crossJoin(broadcast(totals))
      .withColumn("coverage_permille",
        expr("(1000 * covered_tokens) div n_tokens"))
      .select(col("k").cast("long").as("k"), col("covered_tokens"),
        col("n_tokens"), col("vocab_size"), col("coverage_permille"))
      .orderBy("k")
  }

  // ---- l67: cross-operator dedup consistency audit --------------------

  /** l67: dedup-stack consistency audit — the honesty-of-signal check a
    * layered dedup pipeline owes its operators: every EXACT duplicate
    * pair (same normalized text, both docs long enough to shingle) must
    * surface as a MinHash banding candidate (identical shingle sets ⇒
    * identical signatures ⇒ identical band keys) and must confirm at
    * Jaccard 1. `n_missed_by_banding` is structurally zero; a nonzero
    * value means the banding or signature code broke, and this query —
    * not a planted-fixture spec — is where it would surface on real
    * data. Both sides are DuckDB-replayable (md5 exact pairs; the l07
    * portable-signature candidate replay), so the audit itself is
    * oracle-checked end to end.
    *
    * 100 TB shape: the exact-pair side shuffles only (fp, id); the
    * candidate side is l07's banded equi-join; the final anti-join is
    * pair-keyed. Nothing exceeds the standalone operators' cost. */
  /** The audit over any docs-shaped frame — public so QualitySpec can
    * drive the NONZERO path on planted duplicates (the synthetic corpus
    * has exact-dup docs only from sf0.1 up, so the sf0.01 gate row
    * exercises only the zero; the bench corpus exercises both). */
  def dedupConsistencyStats(d: DataFrame): DataFrame =
    dedupConsistencyStats(d, LlmOps.minhashCandidates(d))

  /** Variant taking a pre-built candidate frame: the registered l67
    * passes [[LlmOps.sharedMinhashCandidates]] so the banding pass is
    * computed once per process and shared with l07/l68 instead of
    * being rebuilt here (it was the round-8 bench's hottest line). */
  def dedupConsistencyStats(d: DataFrame, candidates: DataFrame): DataFrame = {
    val eligible = d
      .select(col("doc_id"), Text.norm(col("text")).as("nrm"),
        Text.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), md5(col("nrm")).as("fp"))
    val exactPairs = eligible.as("a")
      .join(eligible.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val cand = candidates
      .select(col("doc_a"), col("doc_b"), col("confirmed"))
    exactPairs.join(cand, Seq("doc_a", "doc_b"), "left")
      .agg(
        count(lit(1)).as("n_exact_pairs"),
        coalesce(sum(when(col("confirmed").isNull, 1L).otherwise(0L)),
          lit(0L)).as("n_missed_by_banding"),
        coalesce(sum(when(col("confirmed") === true, 1L).otherwise(0L)),
          lit(0L)).as("n_confirmed"))
  }

  private val dedupConsistency: Q = (s, dir) =>
    dedupConsistencyStats(docs(s, dir),
      LlmOps.sharedMinhashCandidates(s, dir))

  // ---- l68: near-dup threshold sweep ----------------------------------

  /** l68: Jaccard threshold sweep — cumulative candidate-pair counts at
    * the thresholds a dedup rollout actually argues about (0.5 … 1.0),
    * from ONE banding pass. l07 reports the single production threshold;
    * this is the curve that justified it — too aggressive (0.5) merges
    * near-topics, too lax (0.95) only catches near-exact copies, and
    * the knee lives in this table. Cost: near-zero beyond l07 — the
    * candidate frame comes from the process-shared cache
    * ([[LlmOps.sharedMinhashCandidates]]) and the sweep adds only
    * conditional sums on the already-computed confirm score; both
    * engines compute jaccard as the same int/int IEEE division, so
    * threshold comparisons are bit-safe. */
  private val jaccardSweep: Q = (s, dir) => {
    val cand = LlmOps.sharedMinhashCandidates(s, dir)
    def ge(t: Double, n: String) =
      coalesce(sum(when(col("jaccard") >= t, 1L).otherwise(0L)), lit(0L))
        .as(n)
    cand.agg(
      count(lit(1)).as("n_candidates"),
      ge(0.5, "n_ge_50"), ge(0.7, "n_ge_70"), ge(0.8, "n_ge_80"),
      ge(0.9, "n_ge_90"), ge(1.0, "n_exact"))
  }

  // ---- l71: retrieval-quality audit (MRR / recall over planted qrels) --

  /** The fixed probe-query panel: (query id, two conjunctive terms).
    * Terms are drawn from the corpus vocabulary so hit rates are
    * measurable (the l43/l45 tuning note). A literal 4-row frame —
    * broadcast, never a shuffle side. */
  private val rqPanel = Seq(
    ("q0", "spark", "window"), ("q1", "hash", "join"),
    ("q2", "scan", "filter"), ("q3", "merge", "sort"))

  /** l71: end-to-end retrieval QUALITY audit — the eval loop every RAG
    * or retrieval deployment runs next to its index build (l43/l50
    * build the ranking; this measures whether ranking finds truth).
    * Relevance is PLANTED, not judged: a doc is relevant to a query
    * iff it contains BOTH terms (conjunctive membership — derivable by
    * either engine, no human labels), while the ranking sees the usual
    * disjunctive BM25 score, so the metrics are not circular: BM25 can
    * and does rank single-term docs above two-term docs. Per query:
    * corpus relevant count, relevant found in the top-10, and the rank
    * of the first relevant hit — the integer ingredients of
    * recall@10 / precision@10 / MRR, kept as exact counts so the
    * oracle compares integers, not float metric values.
    *
    * Determinism: the score is l43's rational-idf Okapi form (no log —
    * monotone, so ranking is unchanged; every op correctly rounded,
    * one fixed spelling both engines share) and ties break on doc_id,
    * so the top-10 set is total. Scale shape: docs × 4 probe rows is a
    * broadcast nested-loop over a literal frame (narrow: doc_id, dl,
    * two tf counts); corpus stats are one 4-row rollup broadcast back;
    * rank ≤ 10 plans as WindowGroupLimit per qid — top-k state, never
    * a full sort; the metric rollup is 4 rows. */
  /** The per-(query, doc) scored frame behind l71/l104: every doc
    * crossed with the 4-row probe panel, carrying doc length and both
    * term frequencies. Broadcast nested-loop over a literal frame —
    * the corpus is scanned once, rows stay narrow. */
  private def rqScoredRaw(s: SparkSession, dir: String): DataFrame = {
    val panel = s.createDataFrame(rqPanel).toDF("qid", "t1", "t2")
    docs(s, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
      .withColumn("dl", size(col("tk")).cast("double"))
      .crossJoin(broadcast(panel))
      // outer-reference lambdas: t1/t2 are correlated columns, so one
      // codegen'd projection computes both term frequencies per row
      .withColumn("tf1",
        expr("CAST(size(filter(tk, x -> x = t1)) AS DOUBLE)"))
      .withColumn("tf2",
        expr("CAST(size(filter(tk, x -> x = t2)) AS DOUBLE)"))
      .drop("tk")
  }

  /** Process-level cache of the MATERIALIZED scored frame per
    * (session, dir) — the candCache discipline: l71 and l104 EACH
    * consume it through three sub-frames (ranked, corpus-relevant,
    * metric rollup), so one invocation used to tokenize + term-scan
    * the corpus several times over. The cached value is |corpus|×4
    * NARROW rows (five numerics + two literal terms). */
  private val rqScoredCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  private def rqScored(s: SparkSession, dir: String): DataFrame = {
    graft.core.SessionCaches.prune(rqScoredCache)
    rqScoredCache.computeIfAbsent((s, dir),
      _ => Barriers.materialize(rqScoredRaw(s, dir)))
  }

  /** The scored frame ranked per query by the rational-idf Okapi form
    * (l43's spelling — no log, monotone, shared verbatim with the
    * oracle) with doc_id tie-breaks, so rank is a total order. Rank ≤ k
    * consumers plan as WindowGroupLimit — top-k state, no full sort. */
  private def rqRanked(scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stats = scored.groupBy(col("qid").as("s_qid"))
      .agg(
        count(lit(1)).cast("double").as("n_docs"),
        sum(col("dl")).as("sum_dl"),
        sum(when(col("tf1") > 0, 1.0).otherwise(0.0)).as("df1"),
        sum(when(col("tf2") > 0, 1.0).otherwise(0.0)).as("df2"))
    def term(i: Int): String =
      s"(((n_docs - df$i + 0.5) / (df$i + 0.5)) * " +
        s"((tf$i * 2.2) / (tf$i + 1.2 * (0.25 + 0.75 * dl / avgdl))))"
    scored
      .join(broadcast(stats), col("qid") === col("s_qid"))
      .withColumn("avgdl", expr("sum_dl / n_docs"))
      .withColumn("score", expr(s"${term(1)} + ${term(2)}"))
      .withColumn("relevant", col("tf1") > 0 && col("tf2") > 0)
      .filter(col("tf1") + col("tf2") > 0)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("score").desc, col("doc_id"))))
  }

  /** Planted ground truth per query: corpus-wide conjunctive-relevant
    * count (the recall denominator / ideal-gain source). */
  private def rqCorpusRel(scored: DataFrame): DataFrame =
    scored.groupBy(col("qid"))
      .agg(coalesce(sum(when(col("tf1") > 0 && col("tf2") > 0, 1L)
        .otherwise(0L)), lit(0L)).as("n_relevant"))

  private val retrievalQuality: Q = (s, dir) => {
    val scored = rqScored(s, dir)
    val ranked = rqRanked(scored)
    val corpusRel = rqCorpusRel(scored)
    ranked.filter(col("rank") <= 10)
      .groupBy(col("qid"))
      .agg(
        coalesce(sum(when(col("relevant"), 1L).otherwise(0L)), lit(0L))
          .as("n_retrieved_relevant"),
        coalesce(min(when(col("relevant"), col("rank"))), lit(0L))
          .cast("long").as("first_rel_rank"))
      .join(corpusRel, Seq("qid"))
      .select(col("qid"), col("n_relevant"),
        col("n_retrieved_relevant"), col("first_rel_rank"))
      .orderBy("qid")
  }

  /** l90: Good-Turing unseen-mass estimate — the corpus-sizing
    * statistic (Good 1953): per source, the frequency-of-frequencies
    * spectrum N1/N2/N3 (types seen once/twice/thrice) and the
    * Good-Turing estimators built from it: p0 = N1/N (the probability
    * the NEXT token is a never-seen type — how much vocabulary this
    * domain still hides) and the smoothed singleton count
    * c*(1) = 2·N2/N1 (how much a hapax's raw count overstates its true
    * frequency). A source with high unseen mass needs more crawling
    * before its vocabulary estimates stabilize; one with near-zero
    * unseen mass is exhausted — the "is more data from this domain
    * worth it" number a corpus-acquisition loop gates on. l65 reports
    * the Zipf head/hapax shape; this is the tail's predictive reading.
    * Both estimators ship as integer ratios (permille / milli-counts,
    * floor division) — no doubles to drift.
    *
    * 100 TB shape: one (source, token) hash aggregation (map-side
    * combined), then a |vocab|-row rollup to the 3 spectrum counters —
    * the same two-pass profile as l65, nothing corpus-sized survives
    * the first shuffle. */
  private val goodTuring: Q = (s, dir) => {
    val counts = docs(s, dir)
      .select(col("source"), explode(Text.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    counts
      .groupBy(col("source"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab_size"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("n2"),
        sum(when(col("c") === 3, 1L).otherwise(0L)).as("n3"))
      .withColumn("unseen_permille",
        expr("(1000 * n1) div n_tokens"))
      .withColumn("gt_singleton_cmilli",
        expr("CASE WHEN n1 = 0 THEN 0 ELSE (2000 * n2) div n1 END"))
      .orderBy("source")
  }

  /** One shared spelling of the Wilson score lower bound (Wilson 1927,
    * z = 1.96) over integer (passes, trials) column expressions — the
    * small-sample-corrected pass-rate floor. Both engines evaluate the
    * IDENTICAL expression tree over identical integers (div, mul, sqrt
    * are all correctly-rounded IEEE), so the reported doubles are
    * bit-identical — the RRF/cosine shared-spelling discipline. */
  private def wilsonLbSql(k: String, n: String): String = {
    val p = s"(CAST($k AS DOUBLE) / CAST($n AS DOUBLE))"
    val nD = s"CAST($n AS DOUBLE)"
    val z2 = "CAST(3.8416 AS DOUBLE)" // 1.96^2, exact decimal
    s"(($p + $z2 / (2.0 * $nD)" +
      s" - CAST(1.96 AS DOUBLE) * sqrt(($p * (1.0 - $p)" +
      s" + $z2 / (4.0 * $nD)) / $nD))" +
      s" / (1.0 + $z2 / $nD))"
  }

  /** Minimum token count for the l91 gate predicate. */
  private val wilsonMinTokens = 60
  /** Pass-rate target the lower bound is tested against. */
  private val wilsonTarget = 0.5

  /** l91: Wilson-score gate confidence — the statistically honest way
    * to compare per-source quality-gate pass rates: a source with 3/4
    * passing and one with 3000/4000 passing have the same point
    * estimate but utterly different evidence, and a curation decision
    * ("drop this source", "crawl more of that one") made on the raw
    * ratio overreacts to small sources. The Wilson lower bound at 95%
    * shrinks toward 1/2 exactly as fast as the sample justifies;
    * `below_target` fires only when the EVIDENCE says the rate is
    * under [[wilsonTarget]], not merely the point estimate. Gate
    * predicate: ≥ [[wilsonMinTokens]] whitespace tokens (an
    * integer-exact l62-style rule, so k and n are oracle-exact and the
    * only doubles are the one shared closed form).
    *
    * 100 TB shape: one map-side-combinable (source → n, k) rollup;
    * the formula runs on |sources| rows. */
  private val wilsonGates: Q = (s, dir) => {
    docs(s, dir)
      .select(col("source"),
        (size(Text.tokens(col("text"))) >= wilsonMinTokens)
          .cast("long").as("pass"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("pass")).as("n_pass"))
      .withColumn("wilson_lb", expr(wilsonLbSql("n_pass", "n_docs")))
      .withColumn("below_target", col("wilson_lb") < wilsonTarget)
      .orderBy("source")
  }

  // ---- l92: containment (near-subset) audit ---------------------------

  /** l92: asymmetric containment over the MinHash candidate pairs —
    * the near-SUBSET detector symmetric Jaccard structurally misses: a
    * short document wholly embedded in a long one scores
    * |A|/|B| ≈ 0 Jaccard but containment(A→B) = 1 (Broder'97
    * distinguishes resemblance from containment for exactly this
    * case; quote-heavy and template-expanded corpora are full of it).
    * Per candidate pair: c(A→B) = |A∩B| / |A| over DISTINCT shingle
    * sets, thresholded at 90% via cross-multiplication
    * (10·|A∩B| ≥ 9·|A|) — integer-exact in both engines. Reported:
    * candidate count, subset counts per direction, and pairs where
    * either direction clears the bar.
    *
    * Scope note (honest): candidates come from the SHARED Jaccard
    * banding pass ([[LlmOps.sharedMinhashCandidates]] — computed once
    * per process for l07/l67/l68/l92), so extreme-ratio containments
    * that banding never surfaces are out of frame; a dedicated
    * containment recall path would band the SMALLER side's signature
    * (Broder's modification). The audit measures subset structure
    * among pairs the dedup stack already inspects — the rollout
    * question it answers is "are our near-dups copies or quotes".
    *
    * 100 TB shape: shingle arrays are rebuilt ONLY for docs that
    * appear in some candidate pair (left-semi on the pair ids), so
    * the wide arrays are O(candidate docs), not corpus-sized; the
    * pair join and intersection work is O(candidates). */
  private val containmentAudit: Q = (s, dir) => {
    val cand = LlmOps.sharedMinhashCandidates(s, dir)
      .select(col("doc_a"), col("doc_b"))
    val ids = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    // the distinct-shingle-set frame comes from the PROCESS-SHARED
    // cache (LlmOps.sharedShingleSets, also l98's input — the
    // candCache discipline); the semi-join narrows it to candidate
    // docs, so the wide arrays fetched stay O(candidate docs)
    val sh = LlmOps.sharedShingleSets(s, dir)
      .join(ids, Seq("doc_id"), "left_semi")
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
        "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
        "doc_b")
      .select(
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter"),
        size(col("sh_a")).as("na"), size(col("sh_b")).as("nb"))
      .agg(
        count(lit(1)).as("n_candidates"),
        coalesce(sum(when(col("inter") * 10 >= col("na") * 9, 1L)
          .otherwise(0L)), lit(0L)).as("n_subset_a_in_b"),
        coalesce(sum(when(col("inter") * 10 >= col("nb") * 9, 1L)
          .otherwise(0L)), lit(0L)).as("n_subset_b_in_a"),
        coalesce(sum(when(col("inter") * 10 >= col("na") * 9 ||
          col("inter") * 10 >= col("nb") * 9, 1L)
          .otherwise(0L)), lit(0L)).as("n_near_subset"))
  }

  // ---- l101: quality-vs-length Pareto frontier (distributed skyline) --

  /** l101: the data-selection Pareto frontier — which documents are
    * UNDOMINATED on (training cost, lexical quality)? Cost is token
    * count (minimize), quality is lexical diversity in integer millis
    * (1000·distinct_tokens div n_tok, maximize — l62's R3 numerator as
    * a graded score). A doc is dominated iff some other doc is
    * shorter-or-equal AND at-least-as-diverse with one strict — the
    * frontier is what a threshold sweep (l68-style) walks when picking
    * a selection cutoff, and the skyline operator family the reference
    * class of engines ships as SKYLINE OF.
    *
    * Scale shape — the naive definition is an all-pairs NOT EXISTS
    * (the DuckDB oracle runs exactly that as proof); the Spark plan is
    * the two-phase distributed 2-D skyline:
    *   1. bucket docs by length range (n_tok div 64): every doc in a
    *      lower bucket is STRICTLY shorter than every doc in a higher
    *      one, so cross-bucket domination needs only the per-bucket
    *      max diversity — a |buckets|-row frame, prefix-maxed with a
    *      tiny window and broadcast back (l59's sharded prefix-sum
    *      pattern, applied to max).
    *   2. within each bucket, two RANGE-frame windows ordered by
    *      n_tok give max diversity over strictly-shorter and over
    *      shorter-or-equal rows — partitioned sorts, no global sort.
    * A doc survives iff no cheaper-bucket max ≥ its diversity, no
    * strictly-shorter in-bucket doc has diversity ≥ it, and no
    * shorter-or-equal in-bucket doc has diversity > it. O(n log n/p)
    * per partition; the only global object is the bucket-max frame.
    * 2-D skylines merge (skyline(A∪B) = skyline(skyline A ∪ skyline B),
    * Börzsönyi et al. ICDE'01), which is exactly why the bucket
    * decomposition is lossless — QualitySpec proves both laws. */
  private val paretoFrontier: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    // barrier: the points frame feeds BOTH the in-bucket windows and
    // the bucket-max rollup; without it each branch re-scans and
    // re-tokenizes the corpus (l59 tolerates its double lineage
    // because its second branch reads bare columns — here the branch
    // cost is the tokenizer, the dominant cost at corpus scale, and
    // the materialized rows are four longs per doc, ~1000× narrower
    // than the text they summarize)
    val pts = Barriers.materialize(docs(s, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("n_tok"),
        size(array_distinct(col("tk"))).cast("long").as("n_distinct"))
      .withColumn("div_milli", expr("(1000 * n_distinct) div n_tok"))
      .withColumn("bucket", expr("n_tok div 64")))
    val wLt = Window.partitionBy("bucket").orderBy(col("n_tok"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wLe = Window.partitionBy("bucket").orderBy(col("n_tok"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val local = pts
      .withColumn("m_lt", max(col("div_milli")).over(wLt))
      .withColumn("m_le", max(col("div_milli")).over(wLe))
    // cheaper-bucket prefix max: |buckets| rows, single tiny window
    val wB = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pm = pts.groupBy("bucket").agg(max("div_milli").as("bmax"))
      .withColumn("pm", max(col("bmax")).over(wB))
      .select("bucket", "pm")
    local.join(broadcast(pm), "bucket")
      .filter(
        coalesce(col("pm") < col("div_milli"), lit(true)) &&
          coalesce(col("m_lt") < col("div_milli"), lit(true)) &&
          col("m_le") <= col("div_milli"))
      .select(col("doc_id"), col("n_tok"), col("div_milli"))
      .orderBy("n_tok", "doc_id")
  }

  // ---- l102: clipped bigram overlap (BLEU-style quotation audit) ------

  /** Process-level cache of the bigram COUNT frame (doc_id, gh, cnt)
    * over candidate-pair docs per (session, dir) — the candCache
    * discipline from [[LlmOps.sharedMinhashCandidates]]: the
    * tokenize → shingle-2 → explode → hash → count chain is the
    * dominant cost of the l102 family and is a pure function of the
    * corpus + the shared candidate frame, so later invocations replay
    * materialized blocks, not lineage. The frame is candidate-bounded
    * (left-semi on pair members) and holds only (long, long, long)
    * rows — O(candidate-doc gram types), tiny next to the corpus. */
  private val bigramCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  private def sharedBigramCounts(s: SparkSession, dir: String): DataFrame = {
    graft.core.SessionCaches.prune(bigramCache)
    bigramCache.computeIfAbsent((s, dir), _ => {
      val cand = LlmOps.sharedMinhashCandidates(s, dir)
      val ids = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
      Barriers.materialize(docs(s, dir)
        .join(ids, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
        .select(col("doc_id"), Text.shinglesFromTokens("tk", 2).as("g2"))
        .select(col("doc_id"), explode(col("g2")).as("g"))
        .select(col("doc_id"),
          Text.portableHash(col("g")).as("gh"))
        .groupBy("doc_id", "gh").agg(count(lit(1)).as("cnt")))
    })
  }

  /** l102: clipped bigram precision over the shared near-dup candidate
    * pairs — the MULTISET overlap that distinguishes quotation from
    * paraphrase. l13's Jaccard and l92's containment both work on
    * shingle SETS, so a doc that repeats one borrowed sentence ten
    * times scores the same as one that borrows it once; BLEU's clip
    * rule (Papineni et al. ACL'02: each candidate n-gram counts at most
    * its reference multiplicity) is the standard fix, and clipped
    * precision ≥ 1/2 in either direction is the "mostly quoted" gate.
    * Per pair over bigram COUNT maps: clip = Σ_g min(cnt_a, cnt_b),
    * precision_a = clip/Σcnt_a (symmetric clip numerator, per-side
    * denominators) — all integers, thresholds cross-multiplied.
    *
    * 100 TB shape: bigram counts are built ONLY for docs in some
    * candidate pair (left-semi, the l92 discipline), keyed and
    * shuffled as (doc_id, gram HASH, count) longs — strings never
    * move. The per-pair merge is a full-outer equi-join on
    * (pair, gram-hash) — O(Σ pair gram mass), never corpus². */
  private val clippedOverlap: Q = (s, dir) => {
    val cand = LlmOps.sharedMinhashCandidates(s, dir)
      .select(col("doc_a"), col("doc_b"))
    val grams = sharedBigramCounts(s, dir)
    val pa = cand
      .join(grams.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
      .select(col("doc_a"), col("doc_b"), col("gh"),
        col("cnt").as("cnt_a"))
    val pb = cand
      .join(grams.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("gh"),
        col("cnt").as("cnt_b"))
    val per = pa.join(pb, Seq("doc_a", "doc_b", "gh"), "full_outer")
      .groupBy("doc_a", "doc_b")
      .agg(
        sum(least(coalesce(col("cnt_a"), lit(0L)),
          coalesce(col("cnt_b"), lit(0L)))).as("clip"),
        sum(coalesce(col("cnt_a"), lit(0L))).as("den_a"),
        sum(coalesce(col("cnt_b"), lit(0L))).as("den_b"))
    val rollup = per.agg(
      count(lit(1)).as("n_scored_pairs"),
      coalesce(sum(when(col("den_a") > 0 &&
        col("clip") * 2 >= col("den_a"), 1L).otherwise(0L)), lit(0L))
        .as("n_quote_a_in_b"),
      coalesce(sum(when(col("den_b") > 0 &&
        col("clip") * 2 >= col("den_b"), 1L).otherwise(0L)), lit(0L))
        .as("n_quote_b_in_a"),
      coalesce(sum(col("clip")), lit(0L)).as("micro_clip"),
      coalesce(sum(col("den_a")), lit(0L)).as("micro_den_a"),
      coalesce(sum(col("den_b")), lit(0L)).as("micro_den_b"))
    // candidate total rides beside the scored rollup (a pair where
    // NEITHER side has a bigram contributes no gram rows and drops
    // from `per`; the delta is the honest "unscorable" count)
    cand.agg(count(lit(1)).as("n_candidates")).crossJoin(rollup)
  }

  // ---- l103: hashed-feature linear quality classifier -----------------

  /** Fixed hashed-bucket weights (millis) for [[qualityClassifier]] —
    * stands in for an offline-trained fastText/logistic model; the
    * OPERATOR under test is the inference plan, not the fit. */
  private val clfWeightsMilli: Seq[Long] = Seq(
    120L, -340L, 75L, 210L, -95L, 330L, -150L, 45L,
    260L, -410L, 180L, -60L, 305L, -225L, 90L, -135L)
  private val clfBiasMilli = -50L

  /** l103: model-based quality filtering at scale — the CCNet/GPT-3
    * pipeline stage where a LINEAR classifier over hashed token
    * features scores every document (Joulin et al. 2017 fastText: a
    * bag-of-hashed-ngrams dot product; Brown et al. 2020 §A.2 uses the
    * same shape for quality). score = bias + Σ_t w[h(t) mod 16], all
    * integer millis with the l06 portable hash, so both engines agree
    * bit-for-bit. Reported per source: docs, positives, positive rate
    * (permille) and total score mass — the keep/drop ledger.
    *
    * 100 TB shape: inference is ONE codegen'd fold per row (weights
    * are an inline 16-element literal array — the broadcast-free
    * degenerate case of a broadcast model join); rollup is map-side
    * combined on |sources| keys. No shuffle of anything row-sized. */
  private val qualityClassifier: Q = (s, dir) => {
    val wArr = clfWeightsMilli.mkString("array(", "L, ", "L)")
    docs(s, dir)
      .select(col("source"), Text.tokens(col("text")).as("tk"))
      .withColumn("score_milli", expr(
        s"""aggregate(token_hashes(tk), CAST($clfBiasMilli AS BIGINT),
           |  (acc, h) -> acc + element_at($wArr,
           |    CAST(pmod(h, 16) + 1 AS INT)))""".stripMargin))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("score_milli") > 0, 1L).otherwise(0L)).as("n_pos"),
        sum(col("score_milli")).as("sum_score_milli"))
      .withColumn("pos_permille", expr("(1000 * n_pos) div n_docs"))
      .orderBy("source")
  }

  // ---- l104: nDCG@10 over the planted qrels ----------------------------

  /** Integer rank-discount table: disc(r) = round(1000/log2(r+1)) for
    * r = 1..10, shipped as LITERALS shared verbatim with the oracle —
    * the one place log2 would enter the lattice, frozen out of it. */
  private val ndcgDiscMilli: Seq[Long] =
    Seq(1000L, 631L, 500L, 431L, 387L, 356L, 333L, 315L, 301L, 289L)

  /** l104: nDCG@10 on l71's planted conjunctive qrels — the
    * position-weighted retrieval metric (Järvelin & Kekäläinen TOIS'02)
    * that l71's recall/MRR ingredients can't express: a relevant hit
    * at rank 1 must count more than one at rank 10. Binary gains ×
    * [[ndcgDiscMilli]] give integer DCG; the ideal DCG is the prefix
    * sum of the table at min(n_relevant, 10) (all-relevant-first);
    * ndcg_permille = 1000·dcg div idcg. Every number an integer on
    * the shared lattice — the oracle compares counts, not floats.
    *
    * 100 TB shape: identical to l71 (one corpus scan × 4-row panel,
    * WindowGroupLimit top-10 per query); the discount and ideal
    * tables are 10-row broadcast literals. */
  private val ndcgAudit: Q = (s, dir) => {
    val scored = rqScored(s, dir)
    val ranked = rqRanked(scored)
    val corpusRel = rqCorpusRel(scored)
    val disc = s.createDataFrame(
      ndcgDiscMilli.zipWithIndex.map { case (d, i) => (i + 1L, d) })
      .toDF("rank_pos", "disc_milli")
    val ideal = s.createDataFrame(
      ndcgDiscMilli.scanLeft(0L)(_ + _).tail.zipWithIndex
        .map { case (c, i) => (i + 1L, c) })
      .toDF("k_ideal", "idcg_milli")
    val dcg = ranked.filter(col("rank") <= 10)
      .join(broadcast(disc), col("rank") === col("rank_pos"))
      .groupBy("qid")
      .agg(coalesce(sum(when(col("relevant"), col("disc_milli"))
        .otherwise(0L)), lit(0L)).as("dcg_milli"))
    // drive from corpusRel (always all 4 qids): a probe whose terms
    // match ZERO documents must report n_relevant=0 / ndcg=0, not
    // silently drop — a consumer averaging nDCG over the rows would
    // otherwise divide by fewer queries than the panel ran
    corpusRel
      .join(dcg, Seq("qid"), "left")
      .withColumn("dcg_milli", coalesce(col("dcg_milli"), lit(0L)))
      .withColumn("k_ideal", least(col("n_relevant"), lit(10L)))
      .join(broadcast(ideal), Seq("k_ideal"), "left")
      .withColumn("idcg_milli", coalesce(col("idcg_milli"), lit(0L)))
      .withColumn("ndcg_permille", expr(
        """CASE WHEN idcg_milli = 0 THEN CAST(0 AS BIGINT)
          |ELSE (1000 * dcg_milli) div idcg_milli END""".stripMargin))
      .select(col("qid"), col("n_relevant"), col("dcg_milli"),
        col("idcg_milli"), col("ndcg_permille"))
      .orderBy("qid")
  }

  def queries: Map[String, Q] = Map(
    "l101_pareto_frontier" -> paretoFrontier,
    "l102_clipped_overlap" -> clippedOverlap,
    "l103_quality_classifier" -> qualityClassifier,
    "l104_ndcg" -> ndcgAudit,
    "l92_containment_audit" -> containmentAudit,
    "l91_wilson_gates" -> wilsonGates,
    "l90_good_turing" -> goodTuring,
    "l71_retrieval_quality" -> retrievalQuality,
    "l68_jaccard_sweep" -> jaccardSweep,
    "l67_dedup_consistency" -> dedupConsistency,
    "l62_gopher_rules" -> gopherRules,
    "l63_perplexity_bands" -> perplexityBands,
    "l64_fuzzy_dedup" -> fuzzyDedup,
    "l65_zipf_audit" -> zipfAudit,
    "l66_vocab_sweep" -> vocabSweep)

  private val oNorm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
  private val oToks = s"string_split($oNorm, ' ')"

  /** Shared oracle CTE chain for the probe-panel retrieval replay
    * (l71/l104): panel → per-(query,doc) scoring → Okapi ranking →
    * qrels. One spelling, two oracles — the oBandingCtes anti-drift
    * discipline. Exposes CTEs `scored`, `rk` (with rnk), `rel`. */
  private def oRqCtes: String =
    s"""panel(qid, t1, t2) AS (VALUES
       |  ('q0', 'spark', 'window'), ('q1', 'hash', 'join'),
       |  ('q2', 'scan', 'filter'), ('q3', 'merge', 'sort')),
       |d AS (
       |  SELECT doc_id, $oToks AS tk FROM documents),
       |scored AS (
       |  SELECT p.qid, d.doc_id,
       |    CAST(len(tk) AS DOUBLE) AS dl,
       |    CAST(len(list_filter(tk, x -> x = p.t1)) AS DOUBLE) AS tf1,
       |    CAST(len(list_filter(tk, x -> x = p.t2)) AS DOUBLE) AS tf2
       |  FROM d CROSS JOIN panel p),
       |stats AS (
       |  SELECT qid, CAST(COUNT(*) AS DOUBLE) AS n_docs,
       |    SUM(dl) AS sum_dl,
       |    SUM(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
       |    SUM(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2
       |  FROM scored GROUP BY 1),
       |ranked AS (
       |  SELECT s.qid, s.doc_id, s.tf1, s.tf2,
       |    (((n_docs - df1 + 0.5) / (df1 + 0.5)) *
       |      ((tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / (sum_dl / n_docs))))) +
       |    (((n_docs - df2 + 0.5) / (df2 + 0.5)) *
       |      ((tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / (sum_dl / n_docs)))))
       |      AS score,
       |    (s.tf1 > 0 AND s.tf2 > 0) AS relevant
       |  FROM scored s JOIN stats USING (qid)
       |  WHERE s.tf1 + s.tf2 > 0),
       |rk AS (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY qid ORDER BY score DESC, doc_id) AS rnk
       |  FROM ranked),
       |rel AS (
       |  SELECT qid,
       |    CAST(SUM(CASE WHEN tf1 > 0 AND tf2 > 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_relevant
       |  FROM scored GROUP BY 1)""".stripMargin

  /** Shared oracle CTE chain for the MinHash banding replay (l67/l68):
    * tokenize → shingle → portable hashes → signatures → band keys →
    * DISTINCT candidate pairs. One spelling, two oracles — the same
    * anti-drift discipline as CurationOps.oSpanCtes. Callers append
    * their own CTEs after the trailing `pairs` entry. */
  private[operators] def oBandingCtes: String = {
    val sh = Text.oMinhashShinglesSql("toks", 3)
    val sig = Text.oMinhashSigSql("hh", 16)
    val key = Text.oLshBandKeySql("sig", "b", 4)
    s"""t AS (SELECT doc_id, $oNorm AS nrm, $oToks AS toks
       |  FROM documents),
       |shf AS (
       |  SELECT doc_id, sh FROM (SELECT doc_id, $sh AS sh FROM t)
       |  WHERE len(sh) > 0),
       |hs AS (
       |  SELECT doc_id, sh,
       |    list_transform(sh, s -> ${Text.oPortableStrHashSql("s")}) AS hh
       |  FROM shf),
       |sigs AS (SELECT doc_id, $sig AS sig FROM hs),
       |keyed AS (
       |  SELECT doc_id, b AS band_idx, $key AS band_key
       |  FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS b)),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM keyed a JOIN keyed b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |    AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** The nDCG discount / ideal-prefix tables as VALUES rows, derived
    * from the ONE [[ndcgDiscMilli]] literal so query and oracle cannot
    * drift. */
  private def oNdcgDiscValues: String =
    ndcgDiscMilli.zipWithIndex
      .map { case (d, i) => s"(${i + 1}, $d)" }.mkString(", ")
  private def oNdcgCumValues: String =
    ndcgDiscMilli.scanLeft(0L)(_ + _).tail.zipWithIndex
      .map { case (c, i) => s"(${i + 1}, $c)" }.mkString(", ")

  def oracle: Map[String, String] = Map(
    // the PROOF side of l101's two-phase skyline: the literal
    // all-pairs NOT EXISTS domination definition (quadratic — lives
    // here, never in the Spark plan; the l98 naive-oracle discipline)
    "l101_pareto_frontier" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tok,
         |    CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct
         |  FROM (SELECT doc_id, $oToks AS tk FROM documents)),
         |p AS (
         |  SELECT doc_id, n_tok,
         |    (1000 * n_distinct) // n_tok AS div_milli
         |  FROM d)
         |SELECT a.doc_id, a.n_tok, a.div_milli
         |FROM p a
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM p b
         |  WHERE b.n_tok <= a.n_tok AND b.div_milli >= a.div_milli
         |    AND (b.n_tok < a.n_tok OR b.div_milli > a.div_milli))
         |ORDER BY a.n_tok, a.doc_id""".stripMargin,
    // banding replay + per-pair clipped bigram-multiset merge; the
    // full-outer USING join mirrors the Spark merge exactly
    "l102_clipped_overlap" ->
      s"""WITH ${oBandingCtes},
         |g2 AS (
         |  SELECT doc_id, ${Text.oMinhashShinglesSql("toks", 2)} AS g2
         |  FROM t),
         |gr AS (
         |  SELECT doc_id,
         |    unnest(list_transform(g2,
         |      s -> ${Text.oPortableStrHashSql("s")})) AS gh
         |  FROM g2),
         |grams AS (
         |  SELECT doc_id, gh, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM gr GROUP BY 1, 2),
         |pa AS (
         |  SELECT p.doc_a, p.doc_b, g.gh, g.cnt AS cnt_a
         |  FROM pairs p JOIN grams g ON g.doc_id = p.doc_a),
         |pb AS (
         |  SELECT p.doc_a, p.doc_b, g.gh, g.cnt AS cnt_b
         |  FROM pairs p JOIN grams g ON g.doc_id = p.doc_b),
         |m AS (
         |  SELECT doc_a, doc_b, COALESCE(cnt_a, 0) AS ca,
         |    COALESCE(cnt_b, 0) AS cb
         |  FROM pa FULL JOIN pb USING (doc_a, doc_b, gh)),
         |per AS (
         |  SELECT doc_a, doc_b, SUM(LEAST(ca, cb)) AS clip,
         |    SUM(ca) AS den_a, SUM(cb) AS den_b
         |  FROM m GROUP BY 1, 2)
         |SELECT (SELECT COUNT(*) FROM pairs) AS n_candidates,
         |  COUNT(*) AS n_scored_pairs,
         |  CAST(COALESCE(SUM(CASE WHEN den_a > 0 AND clip * 2 >= den_a
         |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_quote_a_in_b,
         |  CAST(COALESCE(SUM(CASE WHEN den_b > 0 AND clip * 2 >= den_b
         |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_quote_b_in_a,
         |  CAST(COALESCE(SUM(clip), 0) AS BIGINT) AS micro_clip,
         |  CAST(COALESCE(SUM(den_a), 0) AS BIGINT) AS micro_den_a,
         |  CAST(COALESCE(SUM(den_b), 0) AS BIGINT) AS micro_den_b
         |FROM per""".stripMargin,
    // same 16-bucket hashed dot product, weights interpolated from
    // the ONE Scala literal; integer millis end to end
    "l103_quality_classifier" ->
      s"""WITH t AS (SELECT source, $oToks AS tk FROM documents),
         |sc AS (
         |  SELECT source,
         |    CAST($clfBiasMilli + COALESCE(list_sum(list_transform(tk,
         |      tok -> (${clfWeightsMilli.mkString("[", ", ", "]")})[
         |        CAST((${Text.oPortableStrHashSql("tok")}) % 16 AS INT)
         |          + 1])), 0) AS BIGINT) AS score_milli
         |  FROM t)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN score_milli > 0 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_pos,
         |  CAST(SUM(score_milli) AS BIGINT) AS sum_score_milli,
         |  CAST((1000 * SUM(CASE WHEN score_milli > 0 THEN 1 ELSE 0 END))
         |    // COUNT(*) AS BIGINT) AS pos_permille
         |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,
    // the l71 ranking replay + integer discount/ideal lookup tables
    "l104_ndcg" ->
      s"""WITH $oRqCtes,
         |disc(rank_pos, disc_milli) AS (VALUES $oNdcgDiscValues),
         |ideal(k_ideal, idcg_vals) AS (VALUES $oNdcgCumValues),
         |dcg AS (
         |  SELECT r.qid,
         |    CAST(COALESCE(SUM(CASE WHEN r.relevant
         |      THEN dm.disc_milli ELSE 0 END), 0) AS BIGINT) AS dcg_milli
         |  FROM rk r JOIN disc dm ON r.rnk = dm.rank_pos
         |  WHERE r.rnk <= 10 GROUP BY 1)
         |SELECT rel.qid, rel.n_relevant,
         |  CAST(COALESCE(g.dcg_milli, 0) AS BIGINT) AS dcg_milli,
         |  CAST(COALESCE(i.idcg_vals, 0) AS BIGINT) AS idcg_milli,
         |  CAST(CASE WHEN COALESCE(i.idcg_vals, 0) = 0 THEN 0
         |    ELSE (1000 * COALESCE(g.dcg_milli, 0)) // i.idcg_vals
         |    END AS BIGINT) AS ndcg_permille
         |FROM rel
         |LEFT JOIN dcg g USING (qid)
         |LEFT JOIN ideal i ON i.k_ideal = LEAST(rel.n_relevant, 10)
         |ORDER BY 1""".stripMargin,
    // the l07 banding replay plus distinct-shingle containment per
    // candidate pair; thresholds cross-multiplied (integer-exact)
    "l92_containment_audit" ->
      s"""WITH ${oBandingCtes},
         |shd AS (SELECT doc_id, list_distinct(sh) AS shd FROM shf),
         |co AS (
         |  SELECT len(list_intersect(x.shd, y.shd)) AS inter,
         |    len(x.shd) AS na, len(y.shd) AS nb
         |  FROM pairs p
         |  JOIN shd x ON x.doc_id = p.doc_a
         |  JOIN shd y ON y.doc_id = p.doc_b)
         |SELECT COUNT(*) AS n_candidates,
         |  CAST(COALESCE(SUM(CASE WHEN inter * 10 >= na * 9
         |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_subset_a_in_b,
         |  CAST(COALESCE(SUM(CASE WHEN inter * 10 >= nb * 9
         |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_subset_b_in_a,
         |  CAST(COALESCE(SUM(CASE WHEN inter * 10 >= na * 9
         |    OR inter * 10 >= nb * 9 THEN 1 ELSE 0 END), 0) AS BIGINT)
         |    AS n_near_subset
         |FROM co""".stripMargin,
    // the same rational-idf Okapi spelling, rank window, and
    // conjunctive qrels replayed relationally; integer metric
    // ingredients so the compare is exact counts, not float metrics
    "l71_retrieval_quality" ->
      s"""WITH $oRqCtes
         |SELECT r.qid, rel.n_relevant,
         |  CAST(SUM(CASE WHEN r.relevant THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_retrieved_relevant,
         |  CAST(COALESCE(MIN(CASE WHEN r.relevant THEN r.rnk END), 0)
         |    AS BIGINT) AS first_rel_rank
         |FROM rk r JOIN rel USING (qid)
         |WHERE r.rnk <= 10
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "l62_gopher_rules" ->
      // Dominance (top_tok) via unnest + per-(doc, token) counts: the
      // relational spelling of the Spark side's nested lambda — same
      // values, shuffle-friendly shape. LEFT join back to t: an inner
      // join would DROP a document whose token list unnests to zero
      // rows while the Spark side still counts it in n_docs. Unreachable
      // today (string_split('') yields [''] in both engines) but the
      // oracle should stay row-complete if tokenization ever changes;
      // NULL top_tok makes r5 NULL → counted false, same as Spark.
      s"""WITH t AS (
         |  SELECT source, doc_id, $oNorm AS nrm, $oToks AS tk
         |  FROM documents),
         |g AS (
         |  SELECT source, doc_id, tok, COUNT(*) AS c
         |  FROM (SELECT source, doc_id, unnest(tk) AS tok FROM t)
         |  GROUP BY 1, 2, 3),
         |topt AS (
         |  SELECT source, doc_id, MAX(c) AS top_tok FROM g GROUP BY 1, 2),
         |m AS (
         |  SELECT t.source,
         |    CAST(len(tk) AS BIGINT) AS n_tok,
         |    CAST(length(nrm) - (len(tk) - 1) AS BIGINT) AS n_chars,
         |    CAST(len(list_distinct(tk)) AS BIGINT) AS n_dist,
         |    CAST(len(list_filter(tk,
         |      x -> x IN ('the','a','of','to','and','in'))) AS BIGINT)
         |      AS n_stop,
         |    topt.top_tok AS top_tok
         |  FROM t LEFT JOIN topt ON t.source = topt.source
         |    AND t.doc_id = topt.doc_id),
         |r AS (
         |  SELECT source,
         |    (n_tok BETWEEN 20 AND 60) AS r1,
         |    (35 * n_tok <= 10 * n_chars AND 10 * n_chars <= 45 * n_tok)
         |      AS r2,
         |    (n_dist * 2 >= n_tok) AS r3,
         |    (n_stop >= 2) AS r4,
         |    (top_tok * 5 <= n_tok) AS r5
         |  FROM m)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT) AS pass_r1,
         |  CAST(SUM(CASE WHEN r2 THEN 1 ELSE 0 END) AS BIGINT) AS pass_r2,
         |  CAST(SUM(CASE WHEN r3 THEN 1 ELSE 0 END) AS BIGINT) AS pass_r3,
         |  CAST(SUM(CASE WHEN r4 THEN 1 ELSE 0 END) AS BIGINT) AS pass_r4,
         |  CAST(SUM(CASE WHEN r5 THEN 1 ELSE 0 END) AS BIGINT) AS pass_r5,
         |  CAST(SUM(CASE WHEN r1 AND r2 AND r3 AND r4 AND r5
         |    THEN 1 ELSE 0 END) AS BIGINT) AS pass_all
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "l63_perplexity_bands" ->
      s"""WITH t AS (
         |  SELECT source, doc_id, $oToks AS tk FROM documents),
         |g AS (
         |  SELECT source, doc_id,
         |    unnest(list_transform(range(0, greatest(len(tk) - 1, 0)),
         |      i -> array_to_string(tk[i + 1 : i + 2], ' '))) AS bg
         |  FROM t),
         |c AS (SELECT bg, COUNT(*) AS cnt FROM g GROUP BY 1),
         |d AS (
         |  SELECT source, doc_id, COUNT(*) AS n_bg,
         |    CAST(SUM(cnt) AS BIGINT) AS hits
         |  FROM g JOIN c USING (bg) GROUP BY 1, 2),
         |b AS (
         |  SELECT source, hits // n_bg AS score,
         |    ${bandSql("(hits // n_bg)")} AS band
         |  FROM d)
         |SELECT source, band, COUNT(*) AS n_docs,
         |  MIN(score) AS min_score, MAX(score) AS max_score
         |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "l68_jaccard_sweep" -> {
      s"""WITH $oBandingCtes,
         |conf AS (
         |  SELECT CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         |      / CAST(len(list_distinct(list_concat(x.sh, y.sh))) AS DOUBLE)
         |      AS j
         |  FROM pairs p
         |  JOIN shf x ON x.doc_id = p.doc_a
         |  JOIN shf y ON y.doc_id = p.doc_b)
         |SELECT COUNT(*) AS n_candidates,
         |  CAST(COALESCE(SUM(CASE WHEN j >= 0.5 THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS n_ge_50,
         |  CAST(COALESCE(SUM(CASE WHEN j >= 0.7 THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS n_ge_70,
         |  CAST(COALESCE(SUM(CASE WHEN j >= 0.8 THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS n_ge_80,
         |  CAST(COALESCE(SUM(CASE WHEN j >= 0.9 THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS n_ge_90,
         |  CAST(COALESCE(SUM(CASE WHEN j >= 1.0 THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS n_exact
         |FROM conf""".stripMargin
    },
    "l67_dedup_consistency" -> {
      s"""WITH $oBandingCtes,
         |elig AS (
         |  SELECT doc_id, md5(nrm) AS fp FROM t WHERE len(toks) >= 3),
         |ex AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM elig a JOIN elig b
         |    ON a.fp = b.fp AND a.doc_id < b.doc_id)
         |SELECT COUNT(*) AS n_exact_pairs,
         |  CAST(COALESCE(SUM(CASE WHEN p.doc_a IS NULL THEN 1 ELSE 0 END),
         |    0) AS BIGINT) AS n_missed_by_banding,
         |  CAST(COALESCE(SUM(CASE WHEN p.doc_a IS NOT NULL THEN 1 ELSE 0
         |    END), 0) AS BIGINT) AS n_confirmed
         |FROM ex LEFT JOIN pairs p
         |  ON ex.doc_a = p.doc_a AND ex.doc_b = p.doc_b""".stripMargin
    },
    "l91_wilson_gates" ->
      s"""WITH g AS (SELECT source,
         |  CASE WHEN len($oToks) >= $wilsonMinTokens THEN 1 ELSE 0 END
         |    AS pass
         |  FROM documents),
         |a AS (SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(pass) AS BIGINT) AS n_pass FROM g GROUP BY 1)
         |SELECT source, n_docs, n_pass,
         |  ${wilsonLbSql("n_pass", "n_docs")} AS wilson_lb,
         |  ${wilsonLbSql("n_pass", "n_docs")} < $wilsonTarget
         |    AS below_target
         |FROM a ORDER BY source""".stripMargin,
    "l90_good_turing" ->
      s"""WITH t AS (
         |  SELECT source, unnest($oToks) AS tok FROM documents),
         |c AS (SELECT source, tok, COUNT(*) AS c FROM t GROUP BY 1, 2)
         |SELECT source,
         |  CAST(SUM(c) AS BIGINT) AS n_tokens,
         |  COUNT(*) AS vocab_size,
         |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |  CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |  CAST(SUM(CASE WHEN c = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
         |  (1000 * CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT))
         |    // CAST(SUM(c) AS BIGINT) AS unseen_permille,
         |  CASE WHEN SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) = 0 THEN 0
         |    ELSE (2000 * CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END)
         |      AS BIGINT))
         |      // CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |  END AS gt_singleton_cmilli
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "l65_zipf_audit" ->
      s"""WITH t AS (
         |  SELECT source, unnest($oToks) AS tok FROM documents),
         |c AS (SELECT source, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
         |r AS (
         |  SELECT source, c,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY c DESC, tok) AS r
         |  FROM c)
         |SELECT source, COUNT(*) AS vocab_size,
         |  CAST(SUM(c) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_hapax,
         |  CAST(SUM(CASE WHEN r <= 10 THEN c ELSE 0 END) AS BIGINT)
         |    AS top10_mass,
         |  (1000 * CAST(SUM(CASE WHEN r <= 10 THEN c ELSE 0 END)
         |    AS BIGINT)) // CAST(SUM(c) AS BIGINT) AS top10_permille,
         |  (1000 * CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
         |    AS BIGINT)) // COUNT(*) AS hapax_permille
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "l66_vocab_sweep" ->
      s"""WITH t AS (
         |  SELECT unnest($oToks) AS tok FROM documents),
         |c AS (SELECT tok, COUNT(*) AS c FROM t GROUP BY 1),
         |r AS (
         |  SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS r
         |  FROM c),
         |tot AS (SELECT COUNT(*) AS vocab_size,
         |  CAST(SUM(c) AS BIGINT) AS n_tokens FROM c),
         |ks AS (SELECT unnest([256, 1024, 4096, 16384]) AS k)
         |SELECT CAST(k AS BIGINT) AS k,
         |  CAST(SUM(c) AS BIGINT) AS covered_tokens,
         |  n_tokens, vocab_size,
         |  (1000 * CAST(SUM(c) AS BIGINT)) // n_tokens
         |    AS coverage_permille
         |FROM r JOIN ks ON r.r <= ks.k CROSS JOIN tot
         |GROUP BY 1, n_tokens, vocab_size ORDER BY 1""".stripMargin,
    "l64_fuzzy_dedup" ->
      s"""WITH t AS (
         |  SELECT source, doc_id, $oNorm AS nrm,
         |    md5(array_to_string(($oToks)[1 : $fuzzyPrefixTokens], ' '))
         |      AS pfx
         |  FROM documents),
         |p AS (
         |  SELECT a.source AS source, levenshtein(a.nrm, b.nrm) AS dist
         |  FROM t a JOIN t b
         |    ON a.pfx = b.pfx AND a.doc_id < b.doc_id)
         |SELECT source, COUNT(*) AS n_candidates,
         |  CAST(SUM(CASE WHEN dist <= $fuzzyMaxDist THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_fuzzy_dups,
         |  CAST(SUM(CASE WHEN dist = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_exact_dups,
         |  MIN(dist) AS min_dist, MAX(dist) AS max_dist
         |FROM p GROUP BY 1 ORDER BY 1""".stripMargin)
}
