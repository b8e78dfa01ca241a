package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Barriers, Tables => T, QueryPack}
import graft.functions.Text

/** Web-corpus curation operators in the C4/RefinedWeb mold, rounding out
  * the LlmOps training-data set: span-level (not document-level) dedup,
  * boilerplate line removal, corpus heavy hitters, and tf-idf keyword
  * extraction. All pure expression trees — no UDFs — same as LlmOps.
  *
  * 100 TB design notes:
  *  - l27 paragraph dedup: the only shuffle is on the paragraph's
  *    128-bit md5 (never the text); survivor choice is a window over
  *    that fingerprint. At web scale this is exactly C4's "repeated
  *    three-sentence span" pass, and the span fingerprint (16 bytes +
  *    position ints) is what flows, not the span.
  *  - l28 boilerplate filter: per-row higher-order filter, no shuffle
  *    until the final per-source rollup. Linear.
  *  - l29 heavy hitters: explode → hash aggregate. Token frequency is
  *    Zipf-skewed, which works FOR the plan: map-side partial
  *    aggregation collapses the hot tokens before the exchange, so the
  *    shuffle carries ~vocabulary rows per partition, not ~token
  *    occurrences. The top-k is TakeOrdered, never a global sort.
  *  - l30 tf-idf: document frequency is a rollup of the tf aggregate
  *    (already distinct per (doc, token)), joined back broadcast — the
  *    big tf side never reshuffles for the join, and a vocabulary fits
  *    executor memory at any corpus size that fits a language. Spark
  *    plans the df branch as its own column-pruned scan (no exchange
  *    reuse across the branches) — an extra linear pass, not an extra
  *    shuffle of the wide side; the rank filter plans as
  *    WindowGroupLimit, so each partition forwards one row per doc to
  *    the window exchange.
  */
object CurationOps extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    T.load(s, dir, "documents")

  // ---- l27: paragraph-level dedup (C4-style span removal) ------------

  /** Paragraph size in tokens. The corpus is single-line word salad, so
    * "paragraphs" are fixed 5-token chunks of the token stream — the
    * span granularity is a parameter of the technique, not its point.
    * At sf0.01 this yields a natural ~5.7% cross-document duplicate
    * rate to bite on. */
  private val paraTokens = 5

  /** Explode documents into (doc_id, source, pos, para, n_tok) chunks. */
  def paragraphs(d: DataFrame, k: Int = paraTokens): DataFrame = {
    val chunks =
      s"""CASE WHEN size(tk) = 0
         |  THEN cast(array() AS array<struct<para:string, n_tok:bigint>>)
         |  ELSE transform(sequence(0, ((size(tk) + ${k - 1}) div $k) - 1),
         |    i -> named_struct(
         |      'para', array_join(slice(tk, i * $k + 1, $k), ' '),
         |      'n_tok', least(cast($k AS bigint),
         |        cast(size(tk) AS bigint) - i * $k)))
         |END""".stripMargin
    d.select(col("doc_id"), col("source"), Text.tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("source"),
        posexplode(expr(chunks)).as(Seq("pos", "u")))
      .select(col("doc_id"), col("source"), col("pos"),
        col("u.para").as("para"), col("u.n_tok").as("n_tok"))
  }

  /** C4-style global span dedup: any paragraph seen before (in
    * (doc_id, pos) order) is removed; the first occurrence survives.
    * One shuffle, keyed on the paragraph fingerprint. Takes any
    * documents-shaped frame so CurationSpec can drive it on planted
    * duplicates. */
  def paragraphDedupStats(d: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"), col("pos"))
    paragraphs(d)
      .select(col("doc_id"), col("source"), col("pos"), col("n_tok"),
        md5(col("para")).as("fp")) // text itself never shuffles
      .withColumn("rn", row_number().over(w))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_paras"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dup_removed"),
        sum(col("n_tok")).as("tokens_total"),
        sum(when(col("rn") === 1, col("n_tok")).otherwise(0L))
          .as("tokens_kept"))
      .orderBy("source")
  }

  private val paragraphDedup: Q = (s, dir) => paragraphDedupStats(docs(s, dir))

  // ---- l28: boilerplate line filter ----------------------------------

  /** The C4 line rules this corpus can express: minimum word count and
    * a boilerplate pattern list. (C4's terminal-punctuation rule would
    * delete every line of this punctuation-free synthetic corpus —
    * deliberately not enforced here.) */
  private val boilerRe = "(javascript|cookie|copyright|all rights reserved)"

  /** Deterministically seed multi-line structure: the corpus has no
    * newlines, so boilerplate lines (and one clean line that must
    * SURVIVE the filter) are appended by doc_id residue — same
    * fixture-seeding pattern as l20's PII. */
  private def seededLines(d: DataFrame): DataFrame =
    d.select(col("doc_id"), col("source"), concat(
      col("text"),
      when(col("doc_id") % 3 === 0,
        lit("\nplease enable javascript and cookies to continue"))
        .otherwise(lit("")),
      when(col("doc_id") % 4 === 0,
        lit("\nthe quick brown fox jumps again")).otherwise(lit("")),
      when(col("doc_id") % 5 === 0, lit("\nok")).otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        lit("\ncopyright 2024 example corp all rights reserved"))
        .otherwise(lit(""))).as("text"))

  /** The line filter itself, as a Column: lines surviving the minimum
    * word count and the boilerplate pattern list. */
  def keptLines(text: Column): Column =
    filter(split(text, "\n"), l =>
      size(split(l, " ")) >= 3 && !l.rlike(boilerRe))

  private val boilerplateLines: Q = (s, dir) => {
    val ls = split(col("text"), "\n")
    val kept = keptLines(col("text"))
    seededLines(docs(s, dir))
      .select(col("source"), size(ls).cast("long").as("n_lines"),
        kept.as("kept"))
      .select(col("source"), col("n_lines"),
        size(col("kept")).cast("long").as("n_kept"),
        length(array_join(col("kept"), "\n")).cast("long").as("chars_kept"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_lines")).as("n_lines_total"),
        sum(col("n_kept")).as("n_lines_kept"),
        sum(col("chars_kept")).as("n_chars_kept"),
        sum(when(col("n_kept") < col("n_lines"), 1L).otherwise(0L))
          .as("n_docs_modified"))
      .orderBy("source")
  }

  // ---- l29: corpus heavy hitters -------------------------------------

  /** Exact global top-k terms, deterministic ties (count desc, token
    * asc). The approximate path (count-min sketch over the same stream)
    * is contract-tested in CurationSpec — its binary sketch is
    * engine-specific, the exact top-k is the oracle-checkable face. */
  private val heavyHitters: Q = (s, dir) =>
    docs(s, dir)
      .select(explode(Text.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(20)

  // ---- l30: tf-idf keyword extraction --------------------------------

  /** Per-document top keyword ranked by tf/df — tf-idf with the
    * monotone idf spelled as a ratio so the comparison is an exact
    * IEEE division of two integer counts (identical bits in Spark and
    * DuckDB), not a libm log whose last ulp may differ between
    * engines. Ties break on token order. */
  def tfidfTop(d: DataFrame): DataFrame = {
    val w = d
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
    val tf = w.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    // tf is already distinct per (doc, token): df is a rollup of it —
    // no second pass over the exploded stream.
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val rank = Window.partitionBy(col("doc_id"))
      .orderBy((col("tf").cast("double") / col("df").cast("double")).desc,
        col("token"))
    tf.join(broadcast(df), Seq("token"))
      .withColumn("rn", row_number().over(rank))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("token").as("keyword"), col("tf"), col("df"))
      .orderBy("doc_id")
  }

  private val tfidfKeywords: Q = (s, dir) => tfidfTop(docs(s, dir))

  // ---- l31: fixed-window token chunking (pretraining splitter) -------

  /** Window/stride of the chunker — the l22 sequence-packer's
    * complement: packing concatenates short docs up to a budget,
    * chunking splits long docs into overlapping windows (stride <
    * window ⇒ 16-token overlap carries context across cuts, the
    * standard pretraining setup). */
  private val chunkW = 64
  private val chunkS = 48

  /** Explode each document into its token windows: chunk i covers
    * tokens [i·S, i·S+W); the last window may run short. Chunk count
    * is 1 for docs that fit one window, else ceil((n-W)/S)+1 in exact
    * integer arithmetic (the oracle replays the same closed form).
    *
    * 100 TB shape: one narrow pass — tokenize, per-row transform,
    * explode, hash-agg rollup. The token arrays materialize below a
    * repartition exchange so the chunk lambdas slice a computed
    * array instead of re-running the tokenizer per window (the same
    * inlining hazard the minhash shingles hit); the explode's output
    * is consumed by a map-side partial agg, so the only shuffle is
    * ~|langs| rollup rows. */
  /** Per-chunk token counts of every document: one (lang, chunk_tokens)
    * row per window. Exposed for the coverage-property spec. */
  def chunkSizes(d: DataFrame, w: Int, stride: Int): DataFrame = {
    // the coverage law (every token lands in >= 1 chunk) only holds for
    // overlapping-or-adjacent windows; stride > w would silently skip
    // tokens between i*s+w and (i+1)*s — make it a checked precondition
    // rather than a property the tests happen not to generate
    require(stride >= 1 && stride <= w,
      s"stride ($stride) must be in [1, window ($w)] or chunking skips tokens")
    d.select(col("lang"), Text.tokens(col("text")).as("tk"))
      .repartition(d.sparkSession.sparkContext.defaultParallelism)
      .withColumn("n_tok", size(col("tk")).cast("long"))
      .withColumn("n_chunks", when(col("n_tok") <= w, 1L)
        .otherwise(expr(
          s"(n_tok - $w + ${stride - 1}) div $stride + 1")))
      .select(col("lang"), explode(expr(
        s"""transform(sequence(0, n_chunks - 1),
           |  i -> size(slice(tk, CAST(i * $stride + 1 AS INT), $w)))"""
          .stripMargin)).as("chunk_tokens"))
  }

  private val tokenChunks: Q = (s, dir) =>
    chunkSizes(docs(s, dir), chunkW, chunkS)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("chunk_tokens")).cast("long").as("sum_chunk_tokens"),
        max(col("chunk_tokens")).cast("long").as("max_chunk_tokens"),
        min(col("chunk_tokens")).cast("long").as("min_chunk_tokens"))
      .orderBy("lang")

  // ---- l33: temperature-resampled language mix -----------------------

  /** l33: temperature resampling (T=2): language weight
    * w = sqrt(n_min / n_lang) keeps the scarcest language whole and
    * downsamples the rest toward the square root of their share — the
    * standard multilingual rebalance between native proportions (T=1)
    * and uniform (T=∞). Selection thresholds the deterministic
    * portable mix hash of doc_id at w (the l17 split's hash family),
    * so the kept set is reproducible across runs AND engines: the
    * count inputs are exact integers, IEEE division and sqrt are
    * correctly rounded, so both engines derive bit-identical weights
    * and the oracle replays the exact sample membership.
    *
    * 100 TB shape: the per-language count table is a tiny rollup,
    * broadcast back onto the corpus; sampling is then one narrow
    * stateless pass (no shuffle of documents at all) — rerunnable
    * incrementally on new partitions because membership depends only
    * on (doc_id, weight). */
  private val temperatureSample: Q = (s, dir) => {
    val counts = docs(s, dir).groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
    val weights = counts
      .crossJoin(broadcast(counts.agg(min(col("n_docs")).as("min_n"))))
      .withColumn("w",
        sqrt(col("min_n").cast("double") / col("n_docs").cast("double")))
      .select(col("lang"), col("n_docs"), col("w"))
    docs(s, dir).select(col("lang"), col("doc_id"))
      .join(broadcast(weights), Seq("lang"))
      .withColumn("u", expr(
        s"(${Text.portableMixWideSql("doc_id + 1")} % 10000) / 10000.0D"))
      .groupBy(col("lang"))
      .agg(
        max(col("n_docs")).as("n_docs"),
        sum(when(col("u") < col("w"), 1L).otherwise(0L)).as("n_sampled"),
        max(col("w")).as("weight"))
      .orderBy("lang")
  }

  // ---- l40: DSIR-style importance resampling --------------------------

  /** Hashed-feature space of the importance model (Xie et al., NeurIPS'23
    * "Data Selection for Language Models via Importance Resampling").
    * 2^12 buckets keeps the model a broadcastable 4096-row frame at ANY
    * corpus size — the model never grows with the data. */
  private val dsirBuckets = 4096

  /** l40: domain-targeted importance resampling — fit hashed-unigram
    * count models of a TARGET domain (here: the English slice stands in
    * for "wiki-quality") and the BACKGROUND corpus, weight every doc by
    * how target-like its tokens are, and keep docs with probability
    * proportional to that weight. The real DSIR uses log-ratios of
    * n-gram probabilities; this keeps the ratio RATIONAL (integer hit
    * sums, integer permille threshold) so sample membership is
    * bit-reproducible across engines — same determinism contract as
    * l17/l23/l33.
    *
    * 100 TB shape: two passes over the exploded token stream, both
    * ending in map-side-combined hash aggs; the model is a fixed
    * 4096-row frame broadcast back (the scoring join never shuffles the
    * corpus); keep/drop is a pure hash of doc_id — no sampling state,
    * a doc's fate never changes as the corpus grows. */
  private val dsirResample: Q = (s, dir) => {
    val toks = docs(s, dir)
      .select(col("doc_id"), col("source"), col("lang"),
        explode(Text.tokenHashesNative(expr(Text.toksSql("text"))))
          .as("th"))
      .select(col("doc_id"), col("source"), col("lang"),
        expr(s"pmod(th, $dsirBuckets)").as("bucket"))
    val model = toks.groupBy(col("bucket"))
      .agg(
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("cnt_target"),
        count(lit(1)).as("cnt_all"))
    toks.join(broadcast(model), Seq("bucket"))
      .groupBy(col("doc_id"), col("source"))
      .agg(
        sum(col("cnt_target")).as("hits_target"),
        sum(col("cnt_all")).as("hits_all"))
      .withColumn("keep_permille",
        least(lit(999L), expr("(1000 * hits_target) div hits_all")))
      .withColumn("keep",
        expr(s"${Text.portableMixWideSql("doc_id * 31 + 11")} % 1000") <
          col("keep_permille"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("keep_permille")).cast("long").as("sum_permille"))
      .orderBy("source")
  }

  // ---- l41: duplicated-span detection (substring-level dedup) ---------

  /** Span width in tokens — the unit of the rolling window. Real
    * substring dedup (Lee et al., ACL'22 "Deduplicating Training Data
    * Makes Language Models Better") uses 50-token spans over a suffix
    * array; the distributed re-expression hashes every w-token window
    * (stride 1) and equi-joins on the span hash, which preserves the
    * property that matters — any shared substring of ≥ w tokens is
    * caught — without any all-pairs or suffix-array machinery. */
  private val spanW = 8

  /** l41: per-document duplicated-span fraction + flags. A span is
    * "duplicated" iff its hash occurs in ≥ 2 DISTINCT documents; a doc
    * is flagged when ≥ 20% of its spans are duplicated (the
    * cross-multiplied integer test `5·dup ≥ spans`, no float
    * threshold). Span hashes fold portable per-token hashes at base
    * 131 mod 1e9+7 — order-sensitive like l06's rolling fingerprint,
    * windowed like l27's paragraphs, and DuckDB-replayable end to end.
    *
    * 100 TB shape: only (span_hash, doc_id) longs ever shuffle — 16
    * bytes per span, never text. The dup-set agg and the flag join key
    * on the same span_hash, so the exchange is computed once and
    * reused. The token-hash array materializes below a repartition
    * exchange so the per-window lambda slices a computed array instead
    * of re-hashing the document once per window (the l07/l31
    * inlining hazard). */
  /** The rolling span-hash array over a pre-hashed token column: one
    * base-131 mod 1e9+7 fold per w-token window (stride 1). Exposed so
    * the PropertySpec can pin the fold against a Scala reference. */
  def spanHashesExpr(thCol: String, w: Int): Column =
    expr(
      s"""CASE WHEN size($thCol) < $w THEN cast(array() AS array<bigint>)
         |ELSE transform(sequence(0, size($thCol) - $w),
         |  i -> aggregate(slice($thCol, i + 1, $w), cast(0 AS bigint),
         |         (h, x) -> pmod(h * 131L + x, 1000000007L)))
         |END""".stripMargin)

  /** The l41 computation over any documents-shaped frame, so
    * CurationSpec can drive it on planted duplicate spans. */
  def spanDupStats(d: DataFrame): DataFrame = {
    val hashed = d
      .select(col("doc_id"), col("source"),
        Text.tokenHashesNative(expr(Text.toksSql("text"))).as("th"))
      .repartition(d.sparkSession.sparkContext.defaultParallelism)
    val spans = hashed.select(col("doc_id"), col("source"),
      explode(Text.spanHashes(col("th"), spanW)).as("span_h"))
    val dup = spans.groupBy(col("span_h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("span_h"), lit(1L).as("dup"))
    spans.join(dup, Seq("span_h"), "left")
      .groupBy(col("doc_id"), col("source"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(coalesce(col("dup"), lit(0L))).as("n_dup"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs_spanned"),
        sum(when(col("n_dup") * 5 >= col("n_spans"), 1L).otherwise(0L))
          .as("n_flagged"),
        sum(col("n_spans")).cast("long").as("total_spans"),
        sum(col("n_dup")).cast("long").as("total_dup_spans"))
      .withColumn("dup_frac",
        col("total_dup_spans").cast("double") /
          col("total_spans").cast("double"))
      .orderBy("source")
  }

  private val spanDedup: Q = (s, dir) => spanDupStats(docs(s, dir))

  /** The distinct (doc_id, source, span_h) stream shared by l60/l61:
    * the l41 span-hash spelling, deduplicated within each document so
    * "this doc contains this span" is a set-membership fact. */
  private def docSpans(d: DataFrame): DataFrame = {
    val hashed = d
      .select(col("doc_id"), col("source"),
        Text.tokenHashesNative(expr(Text.toksSql("text"))).as("th"))
      .repartition(d.sparkSession.sparkContext.defaultParallelism)
    hashed.select(col("doc_id"), col("source"),
        explode(Text.spanHashes(col("th"), spanW)).as("span_h"))
      .distinct()
  }

  /** Process-level cache of the MATERIALIZED distinct span frame per
    * (session, dir) — the candCache discipline: l60 (novelty audit)
    * and l61 (leakage matrix) consume the IDENTICAL frame, and before
    * this cache each invocation re-ran the tokenize→hash→span→distinct
    * chain. The cached value is (long, string, long) rows — narrow —
    * and materialized so later consumers replay blocks, not lineage. */
  private val docSpanCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  private def sharedDocSpans(s: SparkSession, dir: String): DataFrame = {
    graft.core.SessionCaches.prune(docSpanCache)
    docSpanCache.computeIfAbsent((s, dir),
      _ => Barriers.materialize(docSpans(docs(s, dir))))
  }

  /** l60: corpus novelty audit — what fraction of each document's
    * spans is FIRST seen in that document, under the doc_id ingestion
    * order? A span's owner is the minimum doc_id containing it; spans
    * whose owner is an earlier document are memorized repeats. Per
    * source this yields the novelty ratio a curation pipeline watches
    * to decide when additional data stops adding information (the
    * declining-marginal-novelty curve). All counts are exact longs
    * over the portable span hashes, so the ratio divides identically
    * in both engines.
    *
    * 100 TB shape: identical to l41 — only (span_h, doc_id) longs
    * shuffle, both rollups (per-doc span totals; owner rollup then
    * per-owner novel totals) are map-side-combined, and the only join
    * moves |docs|-sized frames (count-gated broadcast). min(doc_id) as
    * the owner makes the audit incremental: new documents can only
    * lose novelty, never steal ownership from earlier ones. */
  private val noveltyAudit: Q = (s, dir) => {
    val spans = sharedDocSpans(s, dir)
    // A doc's novel-span count is the number of spans it OWNS (owner =
    // min doc_id, and the owner doc always contains its span), so the
    // former span-level ownership join — which re-shuffled every span
    // row a second time just to compare owner == doc_id — collapses to
    // two map-side-combined aggregations meeting at DOC granularity:
    // per-doc span totals and per-owner-doc novel totals, joined over
    // |docs| rows (count-gated broadcast; docs with no owned span take
    // the left-join zero). Identical output, one spans-sized shuffle
    // fewer, and the join moves |docs| rows instead of |spans|.
    val perDoc = Barriers.materializeLazy(
      spans.groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_spans")))
    val nDocs = perDoc.count()
    val novel = spans.groupBy(col("span_h"))
      .agg(min(col("doc_id")).as("owner"))
      .groupBy(col("owner").as("doc_id"))
      .agg(count(lit(1)).as("n_novel"))
    perDoc
      .join(Barriers.broadcastIfSmall(novel, nDocs), Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs_spanned"),
        sum(col("n_spans")).cast("long").as("total_spans"),
        sum(coalesce(col("n_novel"), lit(0L))).cast("long")
          .as("total_novel"))
      .withColumn("novelty_frac",
        col("total_novel").cast("double") /
          col("total_spans").cast("double"))
      .orderBy("source")
  }

  /** l61: cross-source leakage matrix — for every span present in
    * more than one SOURCE, count one incident per unordered source
    * pair. Off-diagonal mass is content leaking between supposedly
    * independent corpus slices (the thing that silently turns a
    * held-out source into training data); the matrix is the artifact
    * a datasheet publishes. Pairs come from exploding each span's
    * distinct-source set — bounded by C(|sources|, 2) per span, and
    * |sources| is a catalog-sized constant, so the explosion cannot
    * amplify.
    *
    * 100 TB shape: one shuffle on span_h to build per-span source
    * sets (collect_set over a catalog-bounded domain), then a
    * flat-map to at most C(k,2) pairs and a map-side-combined count;
    * the output is |sources|² rows regardless of corpus size. */
  private val leakageMatrix: Q = (s, dir) => {
    val spanSources = sharedDocSpans(s, dir)
      .select(col("span_h"), col("source")).distinct()
      .groupBy(col("span_h"))
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .filter(size(col("srcs")) >= 2)
    spanSources
      .select(explode(expr(
        """flatten(transform(srcs, (a, i) ->
          |  transform(slice(srcs, i + 2, size(srcs)),
          |    b -> struct(a AS sa, b AS sb))))""".stripMargin))
        .as("p"))
      .groupBy(col("p.sa").as("source_a"), col("p.sb").as("source_b"))
      .agg(count(lit(1)).as("n_shared_spans"))
      .orderBy("source_a", "source_b")
  }

  // ---- l42: token-budget domain mixing --------------------------------

  /** Token budget as a multiple of the corpus size — the "train for
    * 3 epochs' worth of tokens" setting that forces some domains to
    * repeat (epochs > 1) while others downsample. */
  private val mixBudgetMult = 3L

  /** l42: the domain-mixing ledger — given per-source token
    * availability, a target weight per source, and a total token
    * budget, compute each source's desired token share, the number of
    * passes (epochs) over that source it implies, and the sampling
    * rate of the final partial pass. This is the planning table behind
    * every published data-mixture (weights → epochs per domain); all
    * arithmetic is integer (floor div + ceil div), so the ledger is
    * exact in both engines.
    *
    * 100 TB shape: one hash agg to per-source rows (thousands at
    * most), then a broadcast singleton for the totals — the plan costs
    * one scan regardless of corpus size. */
  private val domainMixing: Q = (s, dir) => {
    val perSource = docs(s, dir)
      .select(col("source"),
        size(Text.tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy(col("source"))
      .agg(sum(col("n_tok")).as("avail_tokens"))
      .withColumn("weight", expr(
        """CASE CAST(substring(source, 4, 8) AS INT) % 3
          |  WHEN 0 THEN 1L WHEN 1 THEN 2L ELSE 4L END""".stripMargin))
    val totals = perSource.agg(
      sum(col("avail_tokens")).as("total_avail"),
      sum(col("weight")).as("weight_sum"))
    perSource.crossJoin(broadcast(totals))
      .withColumn("desired_tokens",
        expr(s"(($mixBudgetMult * total_avail) * weight) div weight_sum"))
      .withColumn("epochs",
        expr("(desired_tokens + avail_tokens - 1) div avail_tokens"))
      .withColumn("last_epoch_permille",
        expr("""(1000 * (desired_tokens - (epochs - 1) * avail_tokens))
                | div avail_tokens""".stripMargin))
      .select(col("source"), col("avail_tokens"), col("weight"),
        col("desired_tokens"), col("epochs"), col("last_epoch_permille"))
      .orderBy("source")
  }

  // ---- l43: BM25 ranked retrieval -------------------------------------

  /** The fixed query terms (all present in the synthetic vocabulary). */
  private val bm25Terms = Seq("spark", "hash", "window")

  // ONE spelling of the BM25 machinery, shared by the document-level
  // (l43) and chunk-level (l50) retrievers AND their DuckDB oracles —
  // four independent copies of a float formula is exactly how silent
  // last-ulp drift starts (same hazard class as the r7 Bloom-predicate
  // advice). The score fragment is plain arithmetic both engines parse
  // identically, so Spark and the oracle literally share the string.

  /** tf0..tfN per-term frequency columns over a token-array column. */
  private def bm25WithTf(d: DataFrame, tokCol: String): DataFrame =
    bm25Terms.zipWithIndex.foldLeft(d) { case (acc, (t, i)) =>
      acc.withColumn(s"tf$i",
        size(filter(col(tokCol), x => x === lit(t))).cast("double"))
    }

  /** The singleton corpus-stats frame: n_docs, sum_dl, df0..dfN. */
  private def bm25Stats(withTf: DataFrame): DataFrame =
    withTf.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum(col("dl")).as("sum_dl") +:
        bm25Terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).cast("double")
            .as(s"df$i")): _*)

  /** The engine-shared score fragment over columns tf0../df0../dl and
    * the average document length spelled as `avgdlSql`. */
  private def bm25ScoreSql(avgdlSql: String): String =
    bm25Terms.indices.map(i =>
      s"""(((n_docs - df$i) + 0.5) / (df$i + 0.5)) *
         |  ((tf$i * 2.2) / (tf$i + 1.2 * (0.25 + 0.75 *
         |    (dl / $avgdlSql))))""".stripMargin)
      .mkString("(", " + ", ")")

  /** The engine-shared ≥1-term-matched predicate. */
  private val bm25MatchSql: String =
    bm25Terms.indices.map(i => s"tf$i").mkString(" + ")

  /** Score every row of a (tokCol, dl) frame: tf columns, broadcast
    * stats, one fixed-spelling score column, matched-rows filter. */
  private def bm25Scored(d: DataFrame, tokCol: String): DataFrame = {
    val withTf = bm25WithTf(d, tokCol)
    withTf.crossJoin(broadcast(bm25Stats(withTf)))
      .withColumn("avgdl", expr("sum_dl / n_docs"))
      .withColumn("score", expr(bm25ScoreSql("avgdl")))
      .filter(expr(bm25MatchSql) > 0)
  }

  /** Oracle spellings of the tf / df column lists. */
  private def oBm25TfCols(tokSql: String): String =
    bm25Terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter($tokSql, x -> x = '$t')) AS DOUBLE) AS tf$i"
    }.mkString(",\n    ")
  private val oBm25DfCols: String =
    bm25Terms.indices.map(i =>
      s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df$i")
      .mkString(",\n    ")

  /** l43: BM25 top-k retrieval over the corpus. Classic Okapi BM25
    * with k1=1.2, b=0.75, except the idf is the RATIONAL form
    * (N − df + 0.5)/(df + 0.5) rather than its log: log is the one
    * piece of BM25 that is not IEEE-exact across engines (libm last-ulp
    * divergence), and it is monotone, so dropping it reorders nothing
    * — same trick as l30's ratio idf. Every remaining operation
    * (+, −, ×, ÷) is correctly rounded, and the three per-term scores
    * are added in one fixed spelling, so the final double is
    * bit-identical in Spark and DuckDB and the oracle checks the exact
    * scores, not just the ranking.
    *
    * 100 TB shape: term frequencies come from per-row higher-order
    * filters over the token array (no explode, no join — the query is
    * a literal list); the corpus-level df/avgdl stats are one singleton
    * aggregate broadcast back; the top-k plans as
    * TakeOrderedAndProject. One scan, no wide shuffle. */
  private val bm25TopK: Q = (s, dir) =>
    bm25Scored(
      docs(s, dir)
        .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
        .withColumn("dl", size(col("tk")).cast("double")),
      "tk")
      .orderBy(col("score").desc, col("doc_id"))
      .select(col("doc_id"), col("score"))
      .limit(10)

  // ---- l44: curriculum difficulty bands -------------------------------

  /** l44: curriculum schedule table — band every document into one of
    * 10 difficulty levels by lexical diversity (distinct-token
    * fraction: repetitive docs are "easy", diverse docs "hard"), then
    * emit the banded token ledger with a cumulative schedule column —
    * the table a curriculum loader walks from easy to hard. Fixed
    * threshold banding (not ntile): equal-width bands are a narrow
    * stateless projection at any scale, where an equal-count ntile
    * would demand a global sort through one window partition — the
    * classic 100 TB non-starter. The running total is a window over
    * the 10 POST-AGGREGATION rows, not the corpus.
    *
    * Exactness: the fraction is one IEEE division of two exact
    * integers; ×10, floor, and the least() clamp are all exact, so
    * band membership replays bit-identically in DuckDB. */
  private val curriculumBands: Q = (s, dir) => {
    val banded = docs(s, dir)
      .select(Text.tokens(col("text")).as("tk"))
      .select(
        size(col("tk")).cast("long").as("n_tok"),
        size(array_distinct(col("tk"))).cast("long").as("n_dist"))
      .withColumn("band",
        least(lit(9L), floor(
          (col("n_dist").cast("double") / col("n_tok").cast("double"))
            * 10.0).cast("long")))
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("band_tokens"))
    banded
      .withColumn("cum_tokens",
        sum(col("band_tokens")).over(
          Window.orderBy(col("band"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("band")
  }

  // ---- l45: contamination overlap fraction ----------------------------

  /** Shingle width of the overlap score. Narrower than l18's 8-token
    * membership test by design: the score measures PARTIAL overlap, so
    * it wants a gram size with measurable hit rates, the way the GPT-3
    * 13-gram spec was tuned to real prose (this corpus is a ~40-word
    * vocabulary). */
  private val overlapN = 3

  /** l45: per-document benchmark-overlap scoring — not the l18 boolean
    * "touches the benchmark anywhere" but the graded fraction of a
    * doc's distinct n-gram shingles that appear in the benchmark set,
    * with a ≥10% flag threshold (cross-multiplied integers, no float
    * cutoff). This is the measurement arm of decontamination: l18
    * excises, l45 quantifies what remains.
    *
    * 100 TB shape: benchmark shingles broadcast (a benchmark is small
    * by definition); the corpus side is one shingle explosion with a
    * pushed-down doc_id filter, one distinct per (doc, shingle), and
    * one left join against the broadcast set — the corpus never
    * shuffles on anything wider than (doc_id, shingle-hash): shingles
    * are folded to portable 64-bit hashes BEFORE the distinct, so the
    * wide movement is longs, not n-gram strings (the l41/l60 span
    * discipline; the DuckDB oracle replays the identical fold, so any
    * hash collision is shared and the counts still agree exactly). */
  private val contaminationScore: Q = (s, dir) => {
    val d = docs(s, dir)
    def shingled(src: DataFrame): DataFrame = src
      .select(col("doc_id"), col("source"), Text.tokens(col("text")).as("toks"))
      .repartition(src.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("source"),
        Text.shinglesFromTokens("toks", overlapN).as("shs"))
      .select(col("doc_id"), col("source"),
        explode(Text.tokenHashesNative(col("shs"))).as("shingle"))
    val probe = shingled(d.filter(col("doc_id") < 5))
      .select(col("shingle")).distinct()
      .withColumn("hit", lit(1L))
    shingled(d.filter(col("doc_id") >= 5))
      .select(col("doc_id"), col("source"), col("shingle")).distinct()
      .join(broadcast(probe), Seq("shingle"), "left")
      .groupBy(col("doc_id"), col("source"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_shingles")).cast("long").as("total_shingles"),
        sum(col("n_overlap")).cast("long").as("total_overlap"),
        sum(when(col("n_overlap") * 10 >= col("n_shingles"), 1L)
          .otherwise(0L)).as("n_flagged"))
      .withColumn("overlap_frac",
        col("total_overlap").cast("double") /
          col("total_shingles").cast("double"))
      .orderBy("source")
  }

  // ---- l46: source drift score (chi-square on the language mix) ------

  /** The closed language set of the corpus — fixed, like l43's query
    * terms, so the χ² sum is a FIXED SPELLING of five terms instead of
    * an order-nondeterministic float aggregation. */
  private val driftLangs = Seq("de", "en", "es", "fr", "zh")

  /** l46: per-source distribution-drift score — the χ² distance
    * between each source's language mix and the corpus-wide mix,
    * Σ_l (p_sl − p_l)² / p_l. The standard data-quality audit that
    * catches a crawl slice whose composition silently shifted. All
    * inputs are exact integer counts; every float op (÷, −, ×) is
    * correctly rounded and spelled identically in both engines, and
    * the five per-language terms are added in one fixed order — so
    * the scores replay bit-exactly, same discipline as l43.
    *
    * 100 TB shape: one conditional-aggregate pass to a per-source
    * frame (|sources| rows), a singleton totals broadcast, and a
    * 5-term projection. One scan, no wide shuffle. */
  private val sourceDrift: Q = (s, dir) => {
    val perSource = docs(s, dir).groupBy(col("source"))
      .agg(
        count(lit(1)).cast("double").as("n_s"),
        driftLangs.map(l =>
          sum(when(col("lang") === l, 1L).otherwise(0L)).cast("double")
            .as(s"c_$l")): _*)
    val totals = docs(s, dir).agg(
      count(lit(1)).cast("double").as("n_tot"),
      driftLangs.map(l =>
        sum(when(col("lang") === l, 1L).otherwise(0L)).cast("double")
          .as(s"t_$l")): _*)
    val chi2Terms = driftLangs.map(l =>
      s"""(((c_$l / n_s) - (t_$l / n_tot)) * ((c_$l / n_s) - (t_$l / n_tot))
         |  / (t_$l / n_tot))""".stripMargin)
    perSource.crossJoin(broadcast(totals))
      .withColumn("chi2", expr(chi2Terms.mkString("(", " + ", ")")))
      .select(col("source"), col("n_s").cast("long").as("n_docs"),
        col("chi2"))
      .orderBy("source")
  }

  // ---- l97: two-sample KS drift on a numeric feature ------------------

  /** l97: Kolmogorov-Smirnov drift audit — the NUMERIC-feature sibling
    * of l46's categorical χ²: per source, the exact two-sample KS
    * statistic D = max_v |CDF_src(v) − CDF_rest(v)| over document
    * length (n_chars), source vs rest-of-corpus. The standard test for
    * "this crawl slice's length distribution silently shifted" — χ²
    * can't see it because length isn't categorical, and mean/stddev
    * gates miss shape changes that preserve moments. D is computed on
    * the integer lattice: the CDF difference at v is the
    * cross-multiplied |cum_s·n_rest − cum_rest·n_s|, the max is over
    * the finite value grid, and the report is the exact permille
    * (1000·max_diff) div (n_s·n_rest) plus the argmax value (lowest v
    * on ties). n_s·n_rest overflows 64-bit past ~3e9 docs — at that
    * scale the same two windows feed the one-shared-spelling double
    * division instead (the l46 trade); the lattice version is the
    * exact contract this entry pins.
    *
    * 100 TB shape: one map-side-combined pass to the (source, v) count
    * frame; the evaluation grid is |sources| × |distinct v| — bounded
    * by the max document length, NOT the corpus (lengths are a
    * saturating set); cumulative sums are windows over that small
    * frame. The corpus is scanned once. */
  /** The l97 statistic over any (source, n_chars) frame — public so
    * CurationSpec can pin the KS laws (identical ⇒ 0, disjoint ⇒ 1000)
    * on planted distributions. */
  def ksDriftStats(docsDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docsDf
      .groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val grid = counts.select(col("source")).distinct()
      .crossJoin(broadcast(counts.select(col("v")).distinct()))
    val filled = grid.join(counts, Seq("source", "v"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val cumS = filled.withColumn("cum_s",
      sum(col("cnt")).over(
        Window.partitionBy(col("source")).orderBy(col("v"))))
    val nS = counts.groupBy(col("source")).agg(sum(col("cnt")).as("n_s"))
    val cumAll = counts.groupBy(col("v")).agg(sum(col("cnt")).as("cv"))
      .withColumn("cum_all",
        sum(col("cv")).over(Window.orderBy(col("v"))))
      .select(col("v"), col("cum_all"))
    val nTot = counts.agg(sum(col("cnt")).as("n_tot"))
    val d = cumS
      .join(broadcast(cumAll), "v")
      .join(broadcast(nS), "source")
      .crossJoin(broadcast(nTot))
      .withColumn("n_rest", col("n_tot") - col("n_s"))
      .withColumn("diff",
        abs(col("cum_s") * col("n_rest") -
          (col("cum_all") - col("cum_s")) * col("n_s")))
    val mx = d.groupBy(col("source")).agg(max(col("diff")).as("max_diff"))
    d.join(broadcast(mx), "source")
      .filter(col("diff") === col("max_diff"))
      .groupBy(col("source"), col("n_s"), col("n_rest"), col("max_diff"))
      .agg(min(col("v")).as("argmax_v"))
      // greatest(..., 1): a single-source frame has n_rest = 0 — there
      // max_diff is identically 0 (cum_all == cum_s for every v), so
      // the guard turns the degenerate 0 div 0 (NULL in Spark, a
      // division error in DuckDB's spelling) into the sensible
      // "no drift vs nothing" 0 for helper callers outside the
      // registered multi-source instance.
      .withColumn("ks_permille",
        expr("(1000 * max_diff) div greatest(n_s * n_rest, 1)"))
      .select(col("source"), col("n_s").as("n_docs"), col("ks_permille"),
        col("argmax_v"))
      .orderBy("source")
  }

  private val ksDrift: Q = (s, dir) => ksDriftStats(docs(s, dir))

  // ---- l49: vocabulary coverage / OOV audit ---------------------------

  /** Vocabulary size of the coverage audit (top-k corpus tokens). */
  private val vocabK = 50

  /** l49: tokenizer-vocabulary coverage — fit a top-k vocabulary from
    * corpus frequencies (deterministic ties: count desc, token asc) and
    * measure, per source, the out-of-vocabulary rate by token
    * OCCURRENCE and by distinct TYPE. The audit that decides whether a
    * tokenizer's vocab (or a frozen embedding table) actually covers a
    * new data source before training on it.
    *
    * 100 TB shape: the vocab fit is l29's explode → map-side-combined
    * hash agg with a TakeOrdered top-k (never a global sort); the
    * vocab is broadcast back, so the scoring pass adds no corpus
    * shuffle beyond the per-source rollup. */
  private val vocabCoverage: Q = (s, dir) => {
    val toks = docs(s, dir)
      .select(col("source"), explode(Text.tokens(col("text"))).as("token"))
    val vocab = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(vocabK)
      .select(col("token"), lit(1L).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"),
        countDistinct(col("token")).as("n_types"),
        countDistinct(when(col("in_vocab").isNull, col("token")))
          .as("n_oov_types"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
      .orderBy("source")
  }

  // ---- l50: chunk-level BM25 retrieval (the RAG indexing path) -------

  /** l50: retrieval over CHUNKS instead of documents — the RAG shape:
    * split every document into overlapping token windows (l31's
    * chunker, here with the chunk TEXT kept), score each chunk with
    * the same rational-idf BM25 as l43 (df/avgdl computed over the
    * chunk corpus), and return the top-5 chunks with their provenance
    * (doc_id, chunk position). Retrieval granularity is the point:
    * a long document with one relevant window outranks at chunk level
    * but drowns at document level.
    *
    * 100 TB shape: chunking is l31's narrow explode (token arrays
    * materialized below a repartition so window lambdas slice, not
    * re-tokenize); corpus stats are one singleton broadcast; the
    * top-k plans as TakeOrderedAndProject. No shuffle wider than the
    * final 5 rows. */
  private val chunkRetrieval: Q = (s, dir) => {
    val w = 64
    val stride = 48
    val chunks = docs(s, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
      .repartition(s.sparkContext.defaultParallelism)
      .withColumn("n_tok", size(col("tk")).cast("long"))
      .withColumn("n_chunks", when(col("n_tok") <= w, 1L)
        .otherwise(expr(s"(n_tok - $w + ${stride - 1}) div $stride + 1")))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, n_chunks - 1),
           |  i -> slice(tk, CAST(i * $stride + 1 AS INT), $w))"""
          .stripMargin)).as(Seq("pos", "ck")))
      .withColumn("dl", size(col("ck")).cast("double"))
    bm25Scored(chunks, "ck")
      .orderBy(col("score").desc, col("doc_id"), col("pos"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("score"))
      .limit(5)
  }

  // ---- l51: per-source corpus datasheet -------------------------------

  /** l51: the datasheet — one wide row per source bundling the audit
    * numbers a dataset release ships ("Datasheets for Datasets",
    * Gebru et al.): volume (docs, tokens, mean length), language
    * spread, exact-duplicate exposure (fraction of docs whose
    * normalized fingerprint appears ≥2 times ANYWHERE in the corpus —
    * cross-source dups count), and mean lexical diversity. Diversity
    * is carried as per-doc integer micro-units so the per-source mean
    * divides two exact integers — the same order-independence
    * discipline as the PQ/ADC sums (a naive AVG over doubles would
    * depend on aggregation order and break the oracle).
    *
    * 100 TB shape: one narrow scoring pass; the only shuffle beyond
    * the per-source rollup is the 128-bit fingerprint agg (l05's
    * shape — the text never moves). */
  private val corpusDatasheet: Q = (s, dir) => {
    val base = docs(s, dir)
      .select(col("source"), col("lang"),
        Text.fingerprint(col("text")).as("fp"),
        size(Text.tokens(col("text"))).cast("long").as("n_tok"),
        size(array_distinct(Text.tokens(col("text")))).cast("long")
          .as("n_dist"))
      .withColumn("lexdiv_micro",
        floor((col("n_dist").cast("double") / col("n_tok").cast("double"))
          * 1000000.0).cast("long"))
    val dupFps = base.groupBy(col("fp"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select(col("fp"), lit(1L).as("dup"))
    base.join(dupFps, Seq("fp"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        sum(coalesce(col("dup"), lit(0L))).as("n_dup_docs"),
        sum(col("lexdiv_micro")).as("sum_lexdiv_micro"))
      .withColumn("avg_tokens",
        col("total_tokens").cast("double") / col("n_docs").cast("double"))
      .withColumn("dup_rate",
        col("n_dup_docs").cast("double") / col("n_docs").cast("double"))
      .withColumn("mean_lexdiv",
        (col("sum_lexdiv_micro").cast("double") /
          col("n_docs").cast("double")) / 1000000.0)
      .orderBy("source")
  }

  // ---- l59: systematic weighted sampling ------------------------------

  /** Sample target size and shard width for [[systematicSample]]. */
  private val sysTarget = 200L
  private val sysShard = 4096L

  /** l59: systematic (stride) weighted sampling — lay every document's
    * integer weight (n_chars) end to end along the doc_id order, then
    * select the document under each multiple of stride = total/target.
    * Unlike Bernoulli sampling the output size is fixed (±1) and
    * selection probability is exactly proportional to weight with NO
    * randomness: everything is integer arithmetic, so membership is
    * bit-reproducible across runs and engines. Documents heavier than
    * the stride are hit multiple times (`hits` > 1) — that multiplicity
    * IS the correct with-replacement count, not a bug.
    *
    * The interesting part at scale is the prefix sum. The oracle spells
    * it as one global `SUM(w) OVER (ORDER BY doc_id)` — a single-
    * partition sort at 100 TB. The Spark side instead runs the
    * two-phase decomposition: per-shard totals (map-side-combined agg
    * over a tiny #shards frame), a cumulative offset per shard computed
    * by a window over that TINY frame, offsets broadcast back, then a
    * partition-local cumsum per shard (each shard sorts its own ~4096
    * ids independently). The DuckDB equality proves the decomposition
    * exact — same technique that makes w09's sessionization and l22's
    * packing shardable. */
  private val systematicSample: Q = (s, dir) => {
    val d = docs(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars").as("w"))
      .withColumn("shard", expr(s"doc_id div $sysShard"))
    val shardTot = d.groupBy(col("shard")).agg(sum(col("w")).as("shard_w"))
    val offsets = shardTot
      .withColumn("off", coalesce(
        sum(col("shard_w")).over(Window.orderBy(col("shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("shard"), col("off"))
    val total = shardTot.agg(sum(col("shard_w")).as("tot"))
    d.join(broadcast(offsets), Seq("shard"))
      .crossJoin(broadcast(total))
      .withColumn("cum", col("off") + sum(col("w")).over(
        Window.partitionBy(col("shard")).orderBy(col("doc_id"))))
      .withColumn("stride", greatest(expr(s"tot div $sysTarget"), lit(1L)))
      .withColumn("hit_k", expr("cum div stride"))
      .withColumn("hits", expr("cum div stride - (cum - w) div stride"))
      .filter(col("hits") > 0)
      .select(col("doc_id"), col("source"), col("w"), col("hit_k"),
        col("hits"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "l60_novelty_audit" -> noveltyAudit,
    "l61_leakage_matrix" -> leakageMatrix,
    "l59_systematic_sample" -> systematicSample,
    "l51_corpus_datasheet" -> corpusDatasheet,
    "l50_chunk_retrieval" -> chunkRetrieval,
    "l49_vocab_coverage" -> vocabCoverage,
    "l44_curriculum_bands" -> curriculumBands,
    "l45_contamination_score" -> contaminationScore,
    "l46_source_drift" -> sourceDrift,
    "l97_ks_drift" -> ksDrift,
    "l40_dsir_resample" -> dsirResample,
    "l41_span_dedup" -> spanDedup,
    "l42_domain_mixing" -> domainMixing,
    "l43_bm25_topk" -> bm25TopK,
    "l27_paragraph_dedup" -> paragraphDedup,
    "l28_boilerplate_lines" -> boilerplateLines,
    "l29_heavy_hitters" -> heavyHitters,
    "l30_tfidf_keywords" -> tfidfKeywords,
    "l31_token_chunks" -> tokenChunks,
    "l33_temperature_sample" -> temperatureSample)

  private val oNorm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
  private val oToks = s"string_split($oNorm, ' ')"

  /** Shared oracle CTEs for the span family (l41/l60/l61): per-token
    * portable hashes, the base-131 rolling span fold, and the
    * per-document DISTINCT span set. One spelling, three oracles. */
  private def oSpanCtes: String =
    s"""hs AS (
       |  SELECT doc_id, source,
       |    list_transform($oToks, t -> ${Text.oPortableStrHashSql("t")})
       |      AS th
       |  FROM documents),
       |sp AS (
       |  SELECT doc_id, source,
       |    unnest(CASE WHEN len(th) < $spanW THEN CAST([] AS BIGINT[])
       |      ELSE list_transform(range(0, len(th) - ${spanW - 1}),
       |        i -> list_reduce(
       |               list_prepend(CAST(0 AS BIGINT),
       |                 th[i + 1 : i + $spanW]),
       |               (h2, x) -> (h2 * 131 + x) % 1000000007))
       |      END) AS span_h
       |  FROM hs),
       |dspans AS (SELECT DISTINCT doc_id, source, span_h FROM sp)"""
      .stripMargin

  val oracle: Map[String, String] = Map(
    "l60_novelty_audit" ->
      s"""WITH $oSpanCtes,
         |own AS (
         |  SELECT span_h, MIN(doc_id) AS owner FROM dspans GROUP BY 1),
         |pd AS (
         |  SELECT ds.doc_id, ds.source, COUNT(*) AS n_spans,
         |    SUM(CASE WHEN own.owner = ds.doc_id THEN 1 ELSE 0 END)
         |      AS n_novel
         |  FROM dspans ds JOIN own USING (span_h) GROUP BY 1, 2)
         |SELECT source, COUNT(*) AS n_docs_spanned,
         |  CAST(SUM(n_spans) AS BIGINT) AS total_spans,
         |  CAST(SUM(n_novel) AS BIGINT) AS total_novel,
         |  CAST(SUM(n_novel) AS DOUBLE) / CAST(SUM(n_spans) AS DOUBLE)
         |    AS novelty_frac
         |FROM pd GROUP BY 1 ORDER BY 1""".stripMargin,
    // unordered source pairs via self-join on the distinct
    // (source, span_h) set — same pair set the Spark side explodes
    "l61_leakage_matrix" ->
      s"""WITH $oSpanCtes,
         |ss AS (SELECT DISTINCT source, span_h FROM dspans)
         |SELECT a.source AS source_a, b.source AS source_b,
         |  COUNT(*) AS n_shared_spans
         |FROM ss a JOIN ss b
         |  ON a.span_h = b.span_h AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the oracle's single global window is the SPEC; the Spark side
    // runs the sharded two-phase prefix sum this equality proves exact
    "l59_systematic_sample" ->
      s"""WITH c AS (
         |  SELECT doc_id, source, n_chars AS w,
         |    CAST(SUM(n_chars) OVER (ORDER BY doc_id) AS BIGINT) AS cum,
         |    CAST(SUM(n_chars) OVER () AS BIGINT) AS tot
         |  FROM documents),
         |k AS (
         |  SELECT doc_id, source, w, cum,
         |    GREATEST(tot // $sysTarget, 1) AS stride
         |  FROM c)
         |SELECT doc_id, source, w,
         |  CAST(cum // stride AS BIGINT) AS hit_k,
         |  CAST(cum // stride - (cum - w) // stride AS BIGINT) AS hits
         |FROM k
         |WHERE cum // stride - (cum - w) // stride > 0
         |ORDER BY doc_id""".stripMargin,
    "l51_corpus_datasheet" ->
      s"""WITH b AS (
         |  SELECT source, lang, md5($oNorm) AS fp,
         |    CAST(len($oToks) AS BIGINT) AS n_tok,
         |    CAST(len(list_distinct($oToks)) AS BIGINT) AS n_dist
         |  FROM documents),
         |b2 AS (
         |  SELECT source, lang, fp, n_tok,
         |    CAST(floor((CAST(n_dist AS DOUBLE) / CAST(n_tok AS DOUBLE))
         |      * 1000000.0) AS BIGINT) AS lexdiv_micro
         |  FROM b),
         |d AS (
         |  SELECT fp, 1 AS dup FROM b GROUP BY 1 HAVING COUNT(*) >= 2),
         |g AS (
         |  SELECT b2.source, COUNT(*) AS n_docs,
         |    CAST(SUM(b2.n_tok) AS BIGINT) AS total_tokens,
         |    COUNT(DISTINCT b2.lang) AS n_langs,
         |    CAST(SUM(COALESCE(d.dup, 0)) AS BIGINT) AS n_dup_docs,
         |    CAST(SUM(b2.lexdiv_micro) AS BIGINT) AS sum_lexdiv_micro
         |  FROM b2 LEFT JOIN d USING (fp) GROUP BY 1)
         |SELECT source, n_docs, total_tokens, n_langs, n_dup_docs,
         |  sum_lexdiv_micro,
         |  CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)
         |    AS avg_tokens,
         |  CAST(n_dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_rate,
         |  (CAST(sum_lexdiv_micro AS DOUBLE) / CAST(n_docs AS DOUBLE))
         |    / 1000000.0 AS mean_lexdiv
         |FROM g ORDER BY 1""".stripMargin,
    // l43's replay over the chunk corpus: same closed-form chunk count,
    // same slices, same ENGINE-SHARED score fragment
    "l50_chunk_retrieval" ->
      s"""WITH t AS (
         |  SELECT doc_id, $oToks AS tk FROM documents),
         |c AS (
         |  SELECT doc_id, tk,
         |    CASE WHEN len(tk) <= 64 THEN 1
         |      ELSE (len(tk) - 64 + 47) // 48 + 1 END AS n_chunks
         |  FROM t),
         |ch AS (
         |  SELECT doc_id, u.pos AS pos, u.ck AS ck FROM (
         |    SELECT doc_id, unnest(list_transform(range(0, n_chunks),
         |      i -> struct_pack(pos := i,
         |             ck := tk[i * 48 + 1 : i * 48 + 64]))) AS u
         |    FROM c)),
         |wtf AS (
         |  SELECT doc_id, pos, CAST(len(ck) AS DOUBLE) AS dl,
         |    ${oBm25TfCols("ck")}
         |  FROM ch),
         |st AS (
         |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         |    SUM(dl) AS sum_dl,
         |    $oBm25DfCols
         |  FROM wtf)
         |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |  ${bm25ScoreSql("(sum_dl / n_docs)")} AS score
         |FROM wtf CROSS JOIN st
         |WHERE $bm25MatchSql > 0
         |ORDER BY score DESC, doc_id, pos LIMIT 5""".stripMargin,
    "l49_vocab_coverage" ->
      s"""WITH w AS (
         |  SELECT source, unnest($oToks) AS token FROM documents),
         |v AS (
         |  SELECT token FROM (
         |    SELECT token, COUNT(*) AS c FROM w GROUP BY 1
         |    ORDER BY c DESC, token LIMIT $vocabK)),
         |j AS (
         |  SELECT w.source, w.token,
         |    CASE WHEN v.token IS NOT NULL THEN 1 ELSE 0 END AS iv
         |  FROM w LEFT JOIN v USING (token))
         |SELECT source, COUNT(*) AS n_tokens,
         |  CAST(SUM(1 - iv) AS BIGINT) AS n_oov,
         |  COUNT(DISTINCT token) AS n_types,
         |  COUNT(DISTINCT CASE WHEN iv = 0 THEN token END) AS n_oov_types,
         |  CAST(SUM(1 - iv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    AS oov_rate
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "l44_curriculum_bands" ->
      s"""WITH t AS (
         |  SELECT len($oToks) AS n_tok, len(list_distinct($oToks)) AS n_dist
         |  FROM documents),
         |b AS (
         |  SELECT least(9, CAST(floor(
         |      (CAST(n_dist AS DOUBLE) / CAST(n_tok AS DOUBLE)) * 10.0)
         |    AS BIGINT)) AS band,
         |    n_tok
         |  FROM t),
         |g AS (
         |  SELECT band, COUNT(*) AS n_docs,
         |    CAST(SUM(n_tok) AS BIGINT) AS band_tokens
         |  FROM b GROUP BY 1)
         |SELECT band, n_docs, band_tokens,
         |  CAST(SUM(band_tokens) OVER (ORDER BY band
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_tokens
         |FROM g ORDER BY band""".stripMargin,
    "l45_contamination_score" -> {
      // same portable per-shingle hash fold as the Spark side: the
      // distinct/join key is the 64-bit hash, never the n-gram string
      val sh = s"list_transform(${Text.oMinhashShinglesSql("toks", overlapN)}, " +
        s"g -> ${Text.oPortableStrHashSql("g")})"
      s"""WITH pr AS (
         |  SELECT DISTINCT shingle FROM (
         |    SELECT unnest($sh) AS shingle FROM (
         |      SELECT $oToks AS toks FROM documents WHERE doc_id < 5))),
         |cs AS (
         |  SELECT DISTINCT doc_id, source, shingle FROM (
         |    SELECT doc_id, source, unnest($sh) AS shingle FROM (
         |      SELECT doc_id, source, $oToks AS toks FROM documents
         |      WHERE doc_id >= 5))),
         |pd AS (
         |  SELECT cs.doc_id, cs.source, COUNT(*) AS n_shingles,
         |    SUM(CASE WHEN pr.shingle IS NOT NULL THEN 1 ELSE 0 END)
         |      AS n_overlap
         |  FROM cs LEFT JOIN pr USING (shingle) GROUP BY 1, 2)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(n_shingles) AS BIGINT) AS total_shingles,
         |  CAST(SUM(n_overlap) AS BIGINT) AS total_overlap,
         |  CAST(SUM(CASE WHEN n_overlap * 10 >= n_shingles THEN 1 ELSE 0
         |    END) AS BIGINT) AS n_flagged,
         |  CAST(SUM(n_overlap) AS DOUBLE) / CAST(SUM(n_shingles) AS DOUBLE)
         |    AS overlap_frac
         |FROM pd GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // the same lattice: per-(source, v) counts, a dense source×value
    // grid, two cumulative windows, the cross-multiplied CDF gap
    "l97_ks_drift" ->
      """WITH c AS (
        |  SELECT source, n_chars AS v, COUNT(*) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |grid AS (
        |  SELECT s.source, vv.v
        |  FROM (SELECT DISTINCT source FROM c) s
        |  CROSS JOIN (SELECT DISTINCT v FROM c) vv),
        |f AS (
        |  SELECT grid.source, grid.v, COALESCE(c.cnt, 0) AS cnt
        |  FROM grid LEFT JOIN c USING (source, v)),
        |cs AS (
        |  SELECT source, v,
        |    SUM(cnt) OVER (PARTITION BY source ORDER BY v) AS cum_s
        |  FROM f),
        |ns AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_s
        |  FROM c GROUP BY 1),
        |ca AS (
        |  SELECT v, SUM(cv) OVER (ORDER BY v) AS cum_all FROM (
        |    SELECT v, SUM(cnt) AS cv FROM c GROUP BY 1)),
        |nt AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_tot FROM c),
        |d AS (
        |  SELECT cs.source, cs.v, ns.n_s, nt.n_tot - ns.n_s AS n_rest,
        |    abs(cs.cum_s * (nt.n_tot - ns.n_s)
        |      - (ca.cum_all - cs.cum_s) * ns.n_s) AS diff
        |  FROM cs JOIN ca USING (v) JOIN ns USING (source)
        |  CROSS JOIN nt),
        |mx AS (SELECT source, MAX(diff) AS max_diff FROM d GROUP BY 1)
        |SELECT d.source, d.n_s AS n_docs,
        |  CAST((1000 * mx.max_diff) // (d.n_s * d.n_rest) AS BIGINT)
        |    AS ks_permille,
        |  MIN(d.v) AS argmax_v
        |FROM d JOIN mx ON d.source = mx.source AND d.diff = mx.max_diff
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    "l46_source_drift" -> {
      val cCols = driftLangs.map(l =>
        s"CAST(SUM(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS DOUBLE) AS c_$l")
      val tCols = driftLangs.map(l =>
        s"CAST(SUM(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS DOUBLE) AS t_$l")
      val terms = driftLangs.map(l =>
        s"""(((c_$l / n_s) - (t_$l / n_tot)) * ((c_$l / n_s) - (t_$l / n_tot))
           |  / (t_$l / n_tot))""".stripMargin)
      s"""WITH ps AS (
         |  SELECT source, CAST(COUNT(*) AS DOUBLE) AS n_s,
         |    ${cCols.mkString(",\n    ")}
         |  FROM documents GROUP BY 1),
         |tt AS (
         |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_tot,
         |    ${tCols.mkString(",\n    ")}
         |  FROM documents)
         |SELECT source, CAST(n_s AS BIGINT) AS n_docs,
         |  ${terms.mkString("(", " + ", ")")} AS chi2
         |FROM ps CROSS JOIN tt ORDER BY source""".stripMargin
    },
    // full replay of the hashed-feature importance model: same portable
    // char-fold bucket hash, same integer hit sums, same permille
    // threshold and keep hash — the kept SET is checked, not a count
    "l40_dsir_resample" ->
      s"""WITH w AS (
         |  SELECT doc_id, source, lang,
         |    unnest(list_transform($oToks,
         |      t -> (${Text.oPortableStrHashSql("t")}) % $dsirBuckets))
         |      AS bucket
         |  FROM documents),
         |m AS (
         |  SELECT bucket,
         |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS cnt_target,
         |    COUNT(*) AS cnt_all
         |  FROM w GROUP BY 1),
         |sc AS (
         |  SELECT w.doc_id, w.source,
         |    CAST(SUM(m.cnt_target) AS BIGINT) AS hits_target,
         |    CAST(SUM(m.cnt_all) AS BIGINT) AS hits_all
         |  FROM w JOIN m USING (bucket) GROUP BY 1, 2),
         |k AS (
         |  SELECT doc_id, source,
         |    least(999, (1000 * hits_target) // hits_all) AS keep_permille
         |  FROM sc)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN
         |      (${Text.oPortableMixWideSql("doc_id * 31 + 11")} % 1000)
         |        < keep_permille THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(SUM(keep_permille) AS BIGINT) AS sum_permille
         |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,
    // span hashes re-derived from the same portable token hashes and
    // the same base-131 window fold, so the duplicated-span SET (and
    // every per-doc fraction) replays exactly
    "l41_span_dedup" ->
      s"""WITH $oSpanCtes,
         |d AS (
         |  SELECT span_h, 1 AS dup FROM sp GROUP BY 1
         |  HAVING COUNT(DISTINCT doc_id) >= 2),
         |pd AS (
         |  SELECT sp.doc_id, sp.source, COUNT(*) AS n_spans,
         |    SUM(COALESCE(d.dup, 0)) AS n_dup
         |  FROM sp LEFT JOIN d USING (span_h) GROUP BY 1, 2)
         |SELECT source, COUNT(*) AS n_docs_spanned,
         |  CAST(SUM(CASE WHEN n_dup * 5 >= n_spans THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_flagged,
         |  CAST(SUM(n_spans) AS BIGINT) AS total_spans,
         |  CAST(SUM(n_dup) AS BIGINT) AS total_dup_spans,
         |  CAST(SUM(n_dup) AS DOUBLE) / CAST(SUM(n_spans) AS DOUBLE)
         |    AS dup_frac
         |FROM pd GROUP BY 1 ORDER BY 1""".stripMargin,
    "l42_domain_mixing" ->
      s"""WITH ps AS (
         |  SELECT source, CAST(SUM(len($oToks)) AS BIGINT) AS avail_tokens
         |  FROM documents GROUP BY 1),
         |pw AS (
         |  SELECT source, avail_tokens,
         |    CAST(CASE CAST(substr(source, 4, 8) AS INT) % 3
         |      WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END AS BIGINT) AS weight
         |  FROM ps),
         |t AS (
         |  SELECT source, avail_tokens, weight,
         |    CAST(SUM(avail_tokens) OVER () AS BIGINT) AS total_avail,
         |    CAST(SUM(weight) OVER () AS BIGINT) AS weight_sum
         |  FROM pw),
         |d AS (
         |  SELECT source, avail_tokens, weight,
         |    (($mixBudgetMult * total_avail) * weight) // weight_sum
         |      AS desired_tokens
         |  FROM t),
         |e AS (
         |  SELECT source, avail_tokens, weight, desired_tokens,
         |    (desired_tokens + avail_tokens - 1) // avail_tokens AS epochs
         |  FROM d)
         |SELECT source, avail_tokens, weight,
         |  CAST(desired_tokens AS BIGINT) AS desired_tokens,
         |  CAST(epochs AS BIGINT) AS epochs,
         |  CAST((1000 * (desired_tokens - (epochs - 1) * avail_tokens))
         |    // avail_tokens AS BIGINT) AS last_epoch_permille
         |FROM e ORDER BY 1""".stripMargin,
    // the ENGINE-SHARED score fragment (bm25ScoreSql) with avgdl
    // inlined — the exact double scores replay, not just the order
    "l43_bm25_topk" ->
      s"""WITH base AS (
         |  SELECT doc_id, $oToks AS tk FROM documents),
         |wtf AS (
         |  SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl,
         |    ${oBm25TfCols("tk")}
         |  FROM base),
         |st AS (
         |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         |    SUM(dl) AS sum_dl,
         |    $oBm25DfCols
         |  FROM wtf)
         |SELECT doc_id,
         |  ${bm25ScoreSql("(sum_dl / n_docs)")} AS score
         |FROM wtf CROSS JOIN st
         |WHERE $bm25MatchSql > 0
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    "l27_paragraph_dedup" ->
      s"""WITH t AS (SELECT doc_id, source, $oToks AS tk FROM documents),
         |p0 AS (SELECT doc_id, source,
         |  unnest(list_transform(
         |    range(0, CAST((len(tk) + ${paraTokens - 1}) // $paraTokens
         |      AS BIGINT)),
         |    i -> struct_pack(
         |      pos := i,
         |      para := array_to_string(
         |        tk[i * $paraTokens + 1 : i * $paraTokens + $paraTokens],
         |        ' '),
         |      n_tok := least($paraTokens,
         |        CAST(len(tk) AS BIGINT) - i * $paraTokens)))) AS u
         |  FROM t),
         |p AS (SELECT doc_id, source, u.pos AS pos, u.para AS para,
         |  u.n_tok AS n_tok FROM p0),
         |k AS (SELECT source, n_tok,
         |  ROW_NUMBER() OVER (PARTITION BY md5(para)
         |    ORDER BY doc_id, pos) AS rn
         |  FROM p)
         |SELECT source, COUNT(*) AS n_paras,
         |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_removed,
         |  CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
         |  CAST(SUM(CASE WHEN rn = 1 THEN n_tok ELSE 0 END) AS BIGINT)
         |    AS tokens_kept
         |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,
    "l28_boilerplate_lines" ->
      s"""WITH seeded AS (
         |  SELECT doc_id, source,
         |    text ||
         |    CASE WHEN doc_id % 3 = 0 THEN chr(10) ||
         |      'please enable javascript and cookies to continue'
         |      ELSE '' END ||
         |    CASE WHEN doc_id % 4 = 0 THEN chr(10) ||
         |      'the quick brown fox jumps again' ELSE '' END ||
         |    CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'ok' ELSE '' END ||
         |    CASE WHEN doc_id % 7 = 0 THEN chr(10) ||
         |      'copyright 2024 example corp all rights reserved'
         |      ELSE '' END AS text
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
         |    list_filter(string_split(text, chr(10)),
         |      l -> len(string_split(l, ' ')) >= 3
         |        AND NOT regexp_matches(l, '$boilerRe')) AS kept
         |  FROM seeded)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(n_lines) AS BIGINT) AS n_lines_total,
         |  CAST(SUM(len(kept)) AS BIGINT) AS n_lines_kept,
         |  CAST(SUM(length(array_to_string(kept, chr(10)))) AS BIGINT)
         |    AS n_chars_kept,
         |  CAST(SUM(CASE WHEN len(kept) < n_lines THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_docs_modified
         |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "l29_heavy_hitters" ->
      s"""WITH w AS (
         |  SELECT unnest($oToks) AS token FROM documents)
         |SELECT token, COUNT(*) AS cnt FROM w GROUP BY 1
         |ORDER BY cnt DESC, token LIMIT 20""".stripMargin,
    "l30_tfidf_keywords" ->
      s"""WITH w AS (
         |  SELECT doc_id, unnest($oToks) AS token FROM documents),
         |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM w GROUP BY 1, 2),
         |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
         |r AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
         |  ROW_NUMBER() OVER (PARTITION BY tf.doc_id
         |    ORDER BY CAST(tf.tf AS DOUBLE) / CAST(df.df AS DOUBLE) DESC,
         |      tf.token) AS rn
         |  FROM tf JOIN df USING (token))
         |SELECT doc_id, token AS keyword, tf, df FROM r WHERE rn = 1
         |ORDER BY doc_id""".stripMargin,
    // closed-form replay of the chunker: c = ceil((n-W)/S)+1 windows,
    // every non-last window holds exactly W tokens, the last holds
    // n-(c-1)·S — so the per-doc chunk-size multiset is fully
    // determined by n and the constants, no list manipulation needed
    "l31_token_chunks" ->
      s"""WITH t AS (
         |  SELECT lang, len($oToks) AS n FROM documents),
         |c AS (
         |  SELECT lang, n,
         |    CASE WHEN n <= $chunkW THEN 1
         |      ELSE (n - $chunkW + ${chunkS - 1}) // $chunkS + 1 END AS c
         |  FROM t),
         |d AS (
         |  SELECT lang, c,
         |    n - (c - 1) * $chunkS AS last_sz,
         |    CASE WHEN c = 1 THEN n
         |      ELSE (c - 1) * $chunkW + n - (c - 1) * $chunkS END AS sum_sz,
         |    CASE WHEN c = 1 THEN n ELSE $chunkW END AS max_sz
         |  FROM c)
         |SELECT lang, CAST(SUM(c) AS BIGINT) AS n_chunks,
         |  CAST(SUM(sum_sz) AS BIGINT) AS sum_chunk_tokens,
         |  CAST(MAX(max_sz) AS BIGINT) AS max_chunk_tokens,
         |  CAST(MIN(last_sz) AS BIGINT) AS min_chunk_tokens
         |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    // weights from exact integer counts through IEEE div + sqrt (both
    // correctly rounded) → bit-identical doubles in both engines; the
    // sample membership compare then replays exactly
    "l33_temperature_sample" ->
      s"""WITH c AS (
         |  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
         |w AS (
         |  SELECT lang, n_docs,
         |    sqrt(CAST(MIN(n_docs) OVER () AS DOUBLE) /
         |         CAST(n_docs AS DOUBLE)) AS w
         |  FROM c)
         |SELECT d.lang, CAST(MAX(w.n_docs) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN
         |      (${Text.oPortableMixWideSql("d.doc_id + 1")} % 10000) / 10000.0
         |        < w.w THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
         |  MAX(w.w) AS weight
         |FROM documents d JOIN w ON d.lang = w.lang
         |GROUP BY 1 ORDER BY 1""".stripMargin)
}
