package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text/embedding column builders for the LLM-data-pipeline operators
  * (SURVEY.md §7.1 step 10 north-star set). Everything here is a pure
  * Catalyst expression tree — higher-order array functions, portable
  * integer hashes (md5 where both engines share it), no UDFs — so the
  * hot path stays inside whole-stage codegen and scales by partition.
  * Hash choices favor PORTABILITY: every signature (rolling, minhash,
  * simhash, hyperplane) is built from arithmetic DuckDB evaluates
  * identically, so the correctness oracle replays candidate sets
  * end to end instead of trusting engine-specific hashes.
  */
object Text {

  /** Canonical text normalization: lowercase, collapse whitespace, trim.
    * The shared first step of fingerprinting and dedup. Keep `norm`,
    * `tokens`, and `toksSql` in lockstep — every fingerprint family
    * (md5/minhash/simhash/rolling) and their DuckDB oracles derive from
    * this one definition. */
  def norm(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(norm(c), " ")

  /** The SAME tokenizer as a SQL string, for expr-based builders that
    * need it spliced into a lambda-bearing expression. */
  def toksSql(textCol: String): String =
    s"split(lower(trim(regexp_replace($textCol, '\\\\s+', ' '))), ' ')"

  /** Exact-dedup fingerprint: md5 of normalized text (md5 is identical
    * in Spark and DuckDB, so the oracle can recompute it). */
  def fingerprint(c: Column): Column = md5(norm(c))

  /** BPE-ish token count: word pieces OR single non-space punctuation —
    * the classic pre-tokenizer regex. */
  val bpeTokenPattern = "[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(bpeTokenPattern), lit(0)))

  /** Stopword hit count via a higher-order filter (no UDF). */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deliberately small: the heuristic (not its lexicon) is
    * the operator under test. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "que", "y", "un"),
    "fr" -> Seq("le", "la", "les", "des", "et", "une"),
    "zh" -> Seq("de", "shi", "le", "zai", "he"))

  /** Word n-gram shingles over a PRE-TOKENIZED array column (empty
    * array for texts shorter than n tokens). Takes a column NAME that
    * must hold the token array.
    *
    * The token array is RE-BOUND as a lambda variable
    * (`transform(array(col), tks -> …)[0]`) before any per-shingle
    * work. This is load-bearing: the body references the token array
    * once per shingle, and Spark 4's CollapseProject collapses
    * projections even across Repartition, splicing a `tokens(text)`
    * defined in the previous select straight into the per-shingle
    * lambda — re-running the regex tokenizer once per shingle
    * (measured: 7.6 s → 0.6 s on l102's candidate-doc bigram build at
    * sf0.1; the pre-r11 defense of materializing tokens in a separate
    * select no longer survives the optimizer). A lambda variable is
    * not an attribute, so the collapse rewrites only the single
    * `array($toksCol)` occurrence and the tokenizer runs once per
    * row no matter what the caller's projection chain looks like. */
  def shinglesFromTokens(toksCol: String, n: Int): Column =
    expr(
      s"""transform(array($toksCol), tks ->
         |  CASE WHEN size(tks) < $n THEN cast(array() AS array<string>)
         |  ELSE transform(sequence(0, size(tks) - $n),
         |         i -> array_join(slice(tks, i + 1, $n), ' '))
         |  END)[0]""".stripMargin)

  /** Portable per-character string hash as a SQL fragment over a
    * string expression: (h*131 + ascii) mod 1e9+7 — the same char-fold
    * SHAPE (and prime) as the inner token step of
    * [[rollingFingerprint]], whose DuckDB parity the l06 oracle proves,
    * but with base 131 so printable-ASCII diff patterns cannot
    * telescope to a collision (see [[PortableHash.strHash]] for the
    * argument; base 31 measured 75× the birthday collision rate). The
    * basis of every minhash/simhash signature, so the l07/l08
    * candidate sets are oracle-replayable. */
  def portableStrHashSql(sVar: String): String =
    s"aggregate(split($sVar, ''), 0L, (h, ch) -> pmod(h * 131L + ascii(ch), 1000000007L))"

  /** DuckDB spelling of [[portableStrHashSql]] (list_reduce folds with
    * the first element as init, so a 0 seed is prepended; string_split
    * on '' yields the same per-character pieces as Spark's split). */
  def oPortableStrHashSql(sVar: String): String =
    s"""list_reduce(
       |  list_prepend(CAST(0 AS BIGINT),
       |    list_transform(string_split($sVar, ''),
       |      ch -> CAST(ascii(ch) AS BIGINT))),
       |  (h, c) -> (h * 131 + c) % 1000000007)""".stripMargin

  /** One portable hash per shingle ([[portableStrHashSql]] character
    * fold) — compute (and materialize) this ONCE; the per-permutation
    * work then mixes longs instead of re-hashing strings. */
  def shingleHashes(shingleCol: String): Column =
    expr(s"transform($shingleCol, sh -> ${portableStrHashSql("sh")})")

  /** MinHash signature over pre-hashed shingles: `perms` hash functions
    * simulated by re-mixing the shingle hash with a stride-8192
    * permutation offset through the portable two-round mixer (pure long
    * arithmetic — no string building, and DuckDB replays it exactly).
    * O(perms × shingles) per row, no shuffle. */
  def minhashSignature(hashesCol: String, perms: Int): Column =
    expr(
      s"""transform(sequence(0, ${perms - 1}),
         |  p -> array_min(transform($hashesCol,
         |    h -> ${portableMixSql("h + p * 8192 + 1")})))""".stripMargin)

  /** LSH band keys: fold `rows`-sized slices of the signature as
    * (acc*31 + m) mod 1e9+7, seeded with the band index. Two docs are
    * candidates iff they share a (band index, band key) pair — the
    * banded bucket-join that replaces the O(n²) all-pairs compare. */
  def lshBands(sigCol: String, bands: Int, rows: Int): Column =
    expr(
      s"""transform(sequence(0, ${bands - 1}),
         |  b -> aggregate(slice($sigCol, b * $rows + 1, $rows),
         |         cast(b AS bigint),
         |         (acc, m) -> pmod(acc * 31L + m, 1000000007L)))"""
        .stripMargin)

  /** DuckDB replay of the full shingle → signature → band-key pipeline
    * over a token-list SQL expression; mirrors [[shinglesFromTokens]] +
    * [[shingleHashes]] + [[minhashSignature]] + [[lshBands]] (and the
    * native [[MinhashBandsExpr]] that actually runs). Returns the
    * (shingles, band-keys) column pair for a SELECT. */
  def oMinhashShinglesSql(toksSql: String, n: Int): String =
    s"""CASE WHEN len($toksSql) < $n
       |  THEN CAST([] AS VARCHAR[])
       |  ELSE list_transform(range(0, len($toksSql) - ${n - 1}),
       |         i -> array_to_string(($toksSql)[i + 1 : i + $n], ' '))
       |END""".stripMargin

  def oMinhashSigSql(hashesSql: String, perms: Int): String =
    s"""list_transform(range(0, $perms),
       |  p -> list_min(list_transform($hashesSql,
       |    h -> ${oPortableMixSql("h + p * 8192 + 1")})))""".stripMargin

  def oLshBandKeySql(sigSql: String, bVar: String, rows: Int): String =
    s"""list_reduce(
       |  list_prepend(CAST($bVar AS BIGINT),
       |    ($sigSql)[$bVar * $rows + 1 : $bVar * $rows + $rows]),
       |  (acc, m) -> (acc * 31 + m) % 1000000007)""".stripMargin

  /** The full shingle → MinHash signature → LSH band keys pipeline as
    * a NATIVE codegen'd expression (see [[MinhashBandsExpr]] — the
    * three HOF stages are CodegenFallback and ran interpreted).
    * Bit-equal to [[shingleHashes]]+[[minhashSignature]]+[[lshBands]],
    * pinned by MinhashBandsSpec; this is what
    * [[graft.operators.LlmOps.minhashCandidates]] runs. */
  def minhashBands(shingles: Column, perms: Int, bands: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(MinhashBandsExpr(
      org.apache.spark.sql.graft.ColumnBridge.expression(shingles),
      perms, bands))

  /** The portable per-code-point string hash as a NATIVE codegen'd
    * scalar — see [[PortableStrHashExpr]]. Bit-equal to
    * [[portableStrHashSql]] (the DuckDB-replayed HOF spelling). */
  def portableHash(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(PortableStrHashExpr(
      org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** [[portableHash]] mapped over a token array in one native pass —
    * see [[TokenHashesExpr]]. Bit-equal to
    * `transform(toks, t -> portableStrHashSql(t))`. */
  def tokenHashesNative(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(TokenHashesExpr(
      org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Rolling w-token span hashes (base-131 mod 1e9+7 fold per stride-1
    * window) as a NATIVE codegen'd expression — see [[SpanHashesExpr]]
    * for why the HOF transform∘aggregate spelling must not run on the
    * l41/l60/l61 hot paths. Bit-equal to
    * [[graft.operators.CurationOps.spanHashesExpr]] (CurationSpec pins
    * it; the DuckDB oracles replay the HOF spelling). */
  def spanHashes(th: Column, w: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(SpanHashesExpr(
      org.apache.spark.sql.graft.ColumnBridge.expression(th), w))

  /** Product-quantization encode (per-subspace nearest-codeword argmin
    * over the broadcast codebook struct array) as a NATIVE codegen'd
    * expression — see [[PqEncodeExpr]] for why the HOF
    * transform∘aggregate argmin must not run on the hot path.
    * Bit-equal to the HOF form (PqEncodeSpec pins it; the DuckDB
    * oracle replays the HOF spelling). */
  def pqEncode(vec: Column, cents: Column, m: Int, sub: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(PqEncodeExpr(
      org.apache.spark.sql.graft.ColumnBridge.expression(vec),
      org.apache.spark.sql.graft.ColumnBridge.expression(cents), m, sub))

  /** Per-position character k-gram hashes ([[portableStrHashSql]] fold
    * of every k-char window) as a NATIVE codegen'd expression — see
    * [[KgramHashesExpr]] for why the HOF transform+substring spelling
    * must not run on the hot path. Bit-equal to the HOF form
    * (CorpusSpec pins it); the l86 winnowing front end. */
  def kgramHashes(c: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(KgramHashesExpr(
      org.apache.spark.sql.graft.ColumnBridge.expression(c), k))

  /** The HOF specification of [[kgramHashes]] over a string column
    * NAME — kept as the readable spec the native expression is pinned
    * against (and the shape the DuckDB oracle replays). */
  def kgramHashesHof(colName: String, k: Int): Column =
    expr(
      s"""CASE WHEN length($colName) < $k
         |  THEN cast(array() AS array<bigint>)
         |ELSE transform(sequence(0, length($colName) - $k),
         |  i -> ${portableStrHashSql(s"substring($colName, i + 1, $k)")})
         |END""".stripMargin)

  /** The full per-document winnowing selection (hashes → sliding min →
    * dedupe) as packed h·2^20+(2^20−1−pos) keys — see [[WinnowKeysExpr]]
    * for why the selection belongs in the map phase. */
  def winnowKeys(c: Column, k: Int, w: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(WinnowKeysExpr(
      org.apache.spark.sql.graft.ColumnBridge.expression(c), k, w))

  /** Exact Jaccard similarity of two shingle arrays (used to confirm
    * LSH candidates — never run all-pairs). */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(0.0))
      .otherwise(size(array_intersect(a, b)).cast("double") /
        size(array_union(a, b)).cast("double"))

  /** One 62-bit portable hash per token (same materialize-once
    * discipline as [[shingleHashes]]): higher-order lambdas evaluate
    * interpreted, so a hash left inside a per-bit lambda re-hashes the
    * token STRING once per bit — 62× the work (observed: 13 s vs 0.5 s
    * on the l08 bench). Hash once here; everything downstream mixes
    * longs. The hash is two side-by-side 31-bit portable mixes over the
    * [[portableStrHashSql]] character fold ([[PortableHash.tokenHash62]]
    * is the native spelling) — DuckDB replays it exactly, which is what
    * makes l08 oracle-checkable. */
  def tokenHashes(toksCol: String): Column = {
    val h0 = portableStrHashSql("t")
    expr(
      s"""transform($toksCol, t ->
         |  ${portableMixSql(s"($h0) + 1")} |
         |  shiftleft(${portableMixSql(s"($h0) + 1073741824")}, 31))"""
        .stripMargin)
  }

  /** Signature width: 62 bits = two 31-bit portable mixes packed side
    * by side. Two bits narrower than the Manku et al. (WWW'07) 64-bit
    * standard, traded for exact DuckDB replayability: 62 bits keeps the
    * packed value and every sliced band key non-negative in both
    * engines (no sign-bit special cases), while 5-band keys stay
    * 13/12 bits wide — ~8k-value selective — and the pigeonhole recall
    * guarantee is width-independent. */
  val simhashWidth = 62

  /** SimHash, phase 1: per-bit sign sums over PRE-HASHED token longs
    * ([[tokenHashes]]) in ONE fold. The input column appears ONLY
    * in aggregate's input position — evaluated once per row no matter
    * what CollapseProject inlines into it. (The transposed variant —
    * 62 scalar aggregates, `$hashesCol` inside the per-bit lambda —
    * re-evaluates the inlined hash+tokenize chain once per BIT:
    * observed 272 s vs <1 s for the l08 bench at sf0.1. A derived array
    * must never be referenced from inside a lambda body that executes
    * k times.) */
  def simhashBitCounts(hashesCol: String): Column =
    expr(
      s"""aggregate($hashesCol,
         |  array_repeat(0L, $simhashWidth),
         |  (acc, h) -> zip_with(acc,
         |    transform(sequence(0, ${simhashWidth - 1}),
         |      j -> IF(((h >> j) & 1) = 1, 1L, -1L)),
         |    (x, y) -> x + y))""".stripMargin)

  /** SimHash, phase 2: pack the sign of each bit-count into a
    * long (bitwise OR of disjoint bits).
    * Folded with an index-carrying accumulator so `$countsCol` sits in
    * aggregate's input position (one evaluation per row) instead of
    * being element_at'd 64 times — the 64-reference form only survived
    * because CollapseProject's many-reference guard happened to keep
    * `counts` un-inlined; this shape doesn't depend on that. */
  def packSimhash(countsCol: String): Column =
    expr(
      s"""aggregate($countsCol, named_struct('i', 0, 'p', 0L),
         |  (acc, c) -> named_struct('i', acc.i + 1,
         |    'p', acc.p | IF(c > 0, shiftleft(1L, acc.i), 0L)),
         |  acc -> acc.p)""".stripMargin)

  /** The same 62-bit SimHash as a NATIVE codegen'd expression over the
    * TOKEN array (hashing included — see [[SimhashPackExpr]] for why
    * the HOF form can never be whole-stage-codegen'd). Semantics
    * pinned bit-equal to [[tokenHashes]]+[[simhashBitCounts]]+
    * [[packSimhash]] by SimhashPackSpec; this is what
    * [[graft.operators.LlmOps.simhashSignatures]] runs. */
  def simhashPack(tokens: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(SimhashPackExpr(
      org.apache.spark.sql.graft.ColumnBridge.expression(tokens)))

  /** The (offset, mask) block layout that splits the [[simhashWidth]]-bit
    * signature into `bands` disjoint blocks whose widths differ by at
    * most one bit — shared by the Spark band extraction and the DuckDB
    * oracle replay so both engines slice identical keys. */
  def simhashBandLayout(bands: Int): Seq[(Int, Long)] = {
    require(bands >= 1 && bands <= simhashWidth, s"bands out of range: $bands")
    val base = simhashWidth / bands
    val extra = simhashWidth % bands // first `extra` bands get one more bit
    (0 until bands).map { b =>
      val width = if (b < extra) base + 1 else base
      val off = b * base + math.min(b, extra)
      (off, (1L << width) - 1)
    }
  }

  /** SimHash band keys: the 62-bit signature split into `bands`
    * disjoint blocks (widths differ by at most one bit). Two signatures
    * within hamming distance `bands - 1` differ in at most that many
    * blocks, so they MUST agree on at least one — an equi-join on
    * (band index, block value) therefore has guaranteed recall for any
    * hamming threshold < bands (the Manku et al., WWW'07 block scheme,
    * shaped like [[lshBands]]). Use the FEWEST bands the threshold
    * allows: for hamming ≤ 4, 5 bands of 13/12 bits give ~2^13-value
    * keys — ~32× more selective per band than an 8-bit split, and
    * bucket size (hence candidate-pair count, which grows with the
    * SQUARE of it) is what decides whether the join survives 10^9
    * docs. The signature is non-negative (62-bit), so plain shifts
    * would do, but shiftrightunsigned keeps the intent explicit. */
  def simhashBands(simhashCol: String, bands: Int = 5): Column = {
    val pieces = simhashBandLayout(bands).map { case (off, mask) =>
      s"shiftrightunsigned($simhashCol, $off) & ${mask}L"
    }
    expr(s"array(${pieces.mkString(", ")})")
  }

  /** Hamming distance between two packed simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Rolling polynomial fingerprint (Karp-Rabin) of the token stream:
    * each token folds its character codes as h = (h*31 + code) mod M,
    * then the document folds the token hashes the same way (M = 1e9+7).
    * Order-sensitive, unlike the set-based shingle fingerprints;
    * overflow-free under ANSI arithmetic (h*31 + x < 3.3e10 << Long.Max);
    * and built from char codes rather than engine hashes so the DuckDB
    * oracle can recompute it exactly. */
  def rollingFingerprint(toksCol: String): Column =
    expr(
      s"""aggregate(
         |  transform($toksCol,
         |    t -> aggregate(split(t, ''), 0L,
         |           (h, ch) -> pmod(h * 31L + ascii(ch), 1000000007L))),
         |  0L, (h, x) -> pmod(h * 31L + x, 1000000007L))""".stripMargin)

  /** The DuckDB spelling of the same fingerprint (list_reduce folds with
    * the first element as init, so a 0 seed is prepended). */
  def oRollingFingerprint(toksSqlStr: String): String =
    s"""list_reduce(
       |  list_prepend(CAST(0 AS BIGINT),
       |    list_transform($toksSqlStr,
       |      t -> list_reduce(
       |             list_prepend(CAST(0 AS BIGINT),
       |               list_transform(string_split(t, ''),
       |                 ch -> CAST(ascii(ch) AS BIGINT))),
       |             (h, c) -> (h * 31 + c) % 1000000007))),
       |  (h, x) -> (h * 31 + x) % 1000000007)""".stripMargin

  // ---- embeddings ----------------------------------------------------

  /** Sequential dot product of two double arrays — matches DuckDB's
    * list_dot_product fold order, so cosine scores are bit-comparable. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with a fixed evaluation shape:
    * dot / (norm(a) * norm(b)). For pairwise workloads, hoist the norms
    * into per-row columns first (cosineWithNorms) — recomputing them per
    * PAIR triples the dominant cost. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Cosine from precomputed norms — same arithmetic shape (and bits)
    * as `cosine`, with the two l2norm folds hoisted out of the pair
    * loop. */
  def cosineWithNorms(a: Column, b: Column,
      normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Portable pseudo-random ±1 hyperplane component for (plane, dim):
    * two multiply-mod-Mersenne-prime rounds with an xor-shift between
    * them. Pure integer arithmetic with every intermediate < 2^62 (no
    * ANSI overflow) that Spark AND DuckDB evaluate identically — unlike
    * xxhash64, which only Spark has — so the bucket assignment itself
    * is oracle-checkable (l11/l16), not rows-only. A single-round LCG
    * is NOT usable here: the plane-to-plane seed stride (8192) lands on
    * the LCG lattice and produced sign rows correlated up to 50/64
    * (measured); the xor-shift round breaks the lattice (max 18/64,
    * ~2σ for 64 fair coins). */
  /** The shared two-round mixer as a SQL fragment over a non-negative
    * integer seed expression: multiply mod 2^31-1, xor-shift, multiply
    * mod 2^31-1 again. Result in [0, 2^31-1). Also the basis of
    * deterministic train/val/test splitting (`% n` buckets). */
  def portableMixSql(seed: String): String = {
    val h1 = s"((($seed) * 2654435761) % 2147483647)"
    s"((($h1 ^ shiftright($h1, 15)) * 1597334677) % 2147483647)"
  }

  /** DuckDB spelling of [[portableMixSql]] (xor() function instead of
    * the ^ operator; >> and % are shared syntax). */
  def oPortableMixSql(seed: String): String = {
    val h1 = s"((($seed) * 2654435761) % 2147483647)"
    s"(((xor($h1, $h1 >> 15)) * 1597334677) % 2147483647)"
  }

  /** [[portableMixSql]] over an UNBOUNDED non-negative seed (doc ids):
    * the raw mixer's first multiply needs seed ≲ 3.4e9 to stay below
    * 2^63 — a doc_id past that would overflow, THROWING under Spark's
    * ANSI default while DuckDB wraps, i.e. the engines would diverge
    * exactly where the "reproducible at any scale" claim matters.
    * Pre-reducing mod 2^31-1 caps the seed; identity for every id
    * below 2^31, so existing sample membership is unchanged. */
  def portableMixWideSql(seed: String): String =
    portableMixSql(s"pmod($seed, 2147483647L)")

  /** DuckDB spelling of [[portableMixWideSql]] (seeds here are
    * non-negative, so plain % matches pmod). */
  def oPortableMixWideSql(seed: String): String =
    oPortableMixSql(s"(($seed) % 2147483647)")

  private def hyperplaneComp(p: String, i: String): String =
    s"IF(((shiftright(${portableMixSql(s"$p * 8192 + $i + 1")}, 7)) & 1) = 1," +
      s" 1.0D, -1.0D)"

  private def oHyperplaneComp(p: String, i: String): String =
    s"CASE WHEN (${oPortableMixSql(s"$p * 8192 + $i + 1")} >> 7) & 1 = 1" +
      s" THEN 1.0 ELSE -1.0 END"

  /** Random-hyperplane LSH bucket: `planes` sign bits packed into an
    * int. Components come from [[hyperplaneComp]] — deterministic, no
    * stored model, recomputable by the oracle. At scale: bucket once
    * (one narrow projection), then group/join by bucket — candidate
    * sets shrink ~2^planes-fold. */
  def hyperplaneBucket(vecCol: String, planes: Int): Column =
    expr(
      s"""aggregate(
         |  transform(sequence(0, ${planes - 1}),
         |    p -> IF(aggregate(
         |           zip_with($vecCol,
         |             transform(sequence(0, size($vecCol) - 1),
         |               i -> ${hyperplaneComp("p", "i")}),
         |             (x, h) -> x * h),
         |           0.0D, (acc, v) -> acc + v) > 0,
         |         shiftleft(1, p), 0)),
         |  0, (a, x) -> a + x)""".stripMargin)

  /** DuckDB spelling of [[hyperplaneBucket]] over a DOUBLE[] SQL
    * expression: identical component signs, identical sequential dot
    * fold (list_dot_product), identical bit packing — the oracle
    * recomputes the same bucket for every vector. */
  def oHyperplaneBucket(vecSql: String, planes: Int): String =
    s"""CAST(list_sum(list_transform(range(0, $planes), p ->
       |  CASE WHEN list_dot_product($vecSql,
       |      list_transform(range(0, len($vecSql)),
       |        i -> ${oHyperplaneComp("p", "i")})) > 0
       |    THEN (1 << p) ELSE 0 END)) AS BIGINT)""".stripMargin
}
