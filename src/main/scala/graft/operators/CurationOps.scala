package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Tables => T, QueryPack}
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

  val queries: Map[String, Q] = Map(
    "l27_paragraph_dedup" -> paragraphDedup,
    "l28_boilerplate_lines" -> boilerplateLines,
    "l29_heavy_hitters" -> heavyHitters,
    "l30_tfidf_keywords" -> tfidfKeywords,
    "l31_token_chunks" -> tokenChunks,
    "l33_temperature_sample" -> temperatureSample)

  private val oNorm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
  private val oToks = s"string_split($oNorm, ' ')"

  val oracle: Map[String, String] = Map(
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
