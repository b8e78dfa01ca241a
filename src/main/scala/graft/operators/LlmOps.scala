package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Barriers, Tables => T, QueryPack}
import graft.functions.Text

/** LLM-training-data pipeline operators over `documents` / `embeddings`
  * (the north-star extension set — SURVEY.md §7.1 step 10).
  *
  * Operators: text stats + quality scoring, stopword language-ID,
  * BPE-ish token counting, md5 exact-dedup fingerprinting, rolling-hash
  * document fingerprints, MinHash+LSH banded near-dedup, SimHash
  * near-dedup, exact n-gram Jaccard confirmation, brute-force cosine
  * top-k, all-pairs embedding near-dup, hyperplane-LSH ANN buckets +
  * multi-probe search, IVF index + nprobe search, deterministic
  * train/val/test splitting, benchmark decontamination, repetition
  * quality filtering, PII scrubbing, near-dup cluster construction
  * (connected components), sequence packing, stratified sampling to a
  * target mix, and bigram-LM commonness scoring.
  *
  * 100 TB design notes, per operator class:
  *  - Per-doc scoring/fingerprints: narrow codegen'd projections — scale
  *    linearly, no shuffle.
  *  - Exact dedup: ONE shuffle on the 128-bit fingerprint (not the
  *    text!), min-doc-id survivor per group.
  *  - MinHash/LSH near-dedup: banded bucket-join — candidates share a
  *    band key, so the join is equi-join shaped and the all-pairs O(n²)
  *    compare never materializes. Band count/rows tune recall vs cost.
  *  - SimHash: 64-bit packed signature banded into maxHamming+1 blocks
  *    (5×13/12-bit for the default threshold 4) — candidates come from
  *    a band equi-join with pigeonhole-guaranteed recall,
  *    hamming-confirmed on candidates only; the O(n²) all-pairs
  *    compare survives only as the LlmSpec ground truth.
  *  - ANN: hyperplane sign buckets shrink candidate sets ~2^planes-fold;
  *    brute-force cosine stays as the per-bucket (and ground-truth)
  *    kernel. The all-pairs variants below are correctness baselines
  *    over the fixed 500-row embedding table, NOT the scale path.
  */
object LlmOps extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    T.load(s, dir, "documents")
  private def embs(s: SparkSession, dir: String): DataFrame =
    T.load(s, dir, "embeddings")
      .withColumn("vec", col("embedding").cast("array<double>"))

  // ---- text analysis -------------------------------------------------

  /** Per-language corpus stats: doc counts, char/token volumes. Averages
    * divide exact integer sums in double (portable IEEE). */
  private val textStats: Q = (s, dir) => {
    val toks = Text.tokens(col("text"))
    docs(s, dir)
      .select(col("lang"), length(col("text")).as("chars"),
        size(toks).cast("long").as("toks"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("chars")).as("total_chars"),
        sum(col("toks")).as("total_tokens"),
        (sum(col("chars")).cast("double") / count(lit(1)).cast("double"))
          .as("avg_chars"),
        (sum(col("toks")).cast("double") / count(lit(1)).cast("double"))
          .as("avg_tokens"))
      .orderBy("lang")
  }

  /** Per-doc quality scoring (length / punctuation / stopword ratios —
    * the standard pre-training quality filters), aggregated per source. */
  private val qualityScore: Q = (s, dir) => {
    val toks = Text.tokens(col("text"))
    val nChars = length(col("text")).cast("double")
    val alpha = length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
      .cast("double")
    val stop = Text.stopwordHits(toks, Text.langStopwords.head._2)
      .cast("double")
    val alphaRatio = alpha / nChars
    val stopRatio = stop / size(toks).cast("double")
    val lengthOk = (length(col("text")) >= 100 && length(col("text")) <= 400)
      .cast("int")
    docs(s, dir)
      .select(col("source"), alphaRatio.as("alpha_ratio"),
        stopRatio.as("stop_ratio"), lengthOk.as("length_ok"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        (sum(col("alpha_ratio")) / count(lit(1)).cast("double"))
          .as("avg_alpha_ratio"),
        (sum(col("stop_ratio")) / count(lit(1)).cast("double"))
          .as("avg_stop_ratio"),
        sum(col("length_ok")).cast("long").as("n_length_ok"))
      .orderBy("source")
  }

  /** Stopword language-ID heuristic vs the labeled lang: confusion
    * counts. Highest hit count wins; ties resolve in lexicon order.
    * Tokens materialize below an exchange so the five per-language
    * filter lambdas read an attribute, not five re-tokenizations
    * (see [[graft.functions.Text]] inlining note). */
  private def langConfusion(s: SparkSession, dir: String): DataFrame = {
    val toks = col("toks")
    val scores = Text.langStopwords.map { case (lang, words) =>
      lang -> Text.stopwordHits(toks, words)
    }
    val best = scores.tail.foldLeft(
      struct(scores.head._2.as("score"), lit(scores.head._1).as("lang"))) {
      case (acc, (lang, score)) =>
        when(score > acc.getField("score"),
          struct(score.as("score"), lit(lang).as("lang"))).otherwise(acc)
    }
    docs(s, dir)
      .select(col("lang"), Text.tokens(col("text")).as("toks"))
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("lang"), best.getField("lang").as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
  }

  private val langId: Q = (s, dir) =>
    langConfusion(s, dir).orderBy("lang", "predicted")

  /** l93: inter-labeler agreement (Cohen's kappa) between the stopword
    * language-ID heuristic and the corpus's labeled `lang` — the
    * labeling-quality audit run whenever a cheap classifier gates
    * expensive curation (is the heuristic better than marginal
    * chance, and by how much). Kappa = (p_o − p_e)/(1 − p_e) computed
    * from the l03 confusion frame entirely in integers:
    * kappa = (n·Σn_ii − Σr_i·c_i) / (n² − Σr_i·c_i), surfaced as a
    * floored permille via one double division (both engines divide
    * the same exact integers < 2⁵³, then floor — no engine-specific
    * rounding). Chance-corrected agreement can be NEGATIVE (worse
    * than marginal chance) — floor division handles that case
    * identically in both engines, which `div`-style truncation would
    * not.
    *
    * 100 TB shape: everything after the l03 confusion rollup is
    * |langs|²-row algebra (marginal frames joined on label, two
    * singleton aggregates crossed) — driver-free and constant-sized.
    * The integer form is exact while n·Σr·c < 2⁶³, i.e. corpora up to
    * ~3×10⁹ docs; past that the marginals would be pre-scaled (the
    * permille needs only 3 significant digits). */
  private val labelAgreement: Q = (s, dir) => {
    val conf = langConfusion(s, dir)
    val tot = conf.agg(
      sum(col("n_docs")).as("n_total"),
      coalesce(sum(when(col("lang") === col("predicted"), col("n_docs"))
        .otherwise(0L)), lit(0L)).as("n_agree"))
    val rows = conf.groupBy(col("lang").as("rl"))
      .agg(sum(col("n_docs")).as("row_n"))
    val cols = conf.groupBy(col("predicted").as("cl"))
      .agg(sum(col("n_docs")).as("col_n"))
    val pe = rows.join(cols, col("rl") === col("cl"))
      .agg(coalesce(sum(col("row_n") * col("col_n")), lit(0L))
        .as("pe_num"))
    tot.crossJoin(broadcast(pe))
      .withColumn("kappa_permille",
        when(col("n_total") * col("n_total") === col("pe_num"), lit(1000L))
          .otherwise(floor(
            (lit(1000.0) * (col("n_total") * col("n_agree") -
              col("pe_num")).cast("double")) /
              (col("n_total") * col("n_total") - col("pe_num"))
                .cast("double")).cast("long")))
  }

  /** BPE-ish token counting (word pieces + punctuation) per language. */
  private val tokenCount: Q = (s, dir) =>
    docs(s, dir)
      .select(col("lang"),
        Text.bpeTokenCount(col("text")).cast("long").as("n_bpe"))
      .groupBy(col("lang"))
      .agg(sum(col("n_bpe")).as("total_bpe_tokens"),
        min(col("n_bpe")).as("min_bpe"), max(col("n_bpe")).as("max_bpe"))
      .orderBy("lang")

  // ---- dedup ---------------------------------------------------------

  /** Exact dedup via md5 fingerprint of normalized text: survivors =
    * min doc_id per fingerprint; one shuffle on the hash, never on the
    * text. Output: per-source survivor/duplicate accounting. */
  private val exactDedup: Q = (s, dir) => {
    val fp = docs(s, dir)
      .select(col("doc_id"), col("source"), Text.fingerprint(col("text")).as("fp"))
    val survivors = fp.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("survivor_id"), count(lit(1)).as("n_copies"))
    fp.join(survivors, "fp")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_unique"),
        sum(when(col("doc_id") === col("survivor_id"), 0L).otherwise(1L))
          .as("n_dropped"))
      .orderBy("source")
  }

  /** Rolling-hash (Karp-Rabin fold) document fingerprints —
    * order-sensitive, unlike set-based shingles: distinct-count summary
    * plus md5 cross-check. */
  private val fingerprints: Q = (s, dir) =>
    docs(s, dir)
      .select(col("doc_id"),
        Text.rollingFingerprint(Text.toksSql("text"))
          .as("roll_fp"),
        Text.fingerprint(col("text")).as("md5_fp"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("roll_fp")).as("n_rolling"),
        countDistinct(col("md5_fp")).as("n_md5"))

  /** MinHash + banded LSH near-dedup (the scale path): shingle → 16-perm
    * signature → 4 bands × 4 rows → bucket-join on band keys → exact
    * Jaccard confirm on candidates only. The band join is NARROW
    * (doc ids + band key only); shingle arrays are fetched per-side
    * AFTER the candidate pairs are deduped, so wide array rows never
    * shuffle through the O(pairs) join. */
  def minhashCandidates(d: DataFrame, perms: Int = 16, bands: Int = 4,
      jaccardThreshold: Double = 0.8): DataFrame = {
    // Tokenize BELOW an exchange and shingle above it: the repartition is
    // an optimizer barrier that stops CollapseProject from splicing the
    // regex tokenizer into the per-shingle lambda (which would re-run the
    // regex once per shingle — observed as a 200s single-core stall).
    // The shingle frame is reused three times (signatures + two jaccard
    // fetches); the barrier materializes it once (localCheckpoint here;
    // reliable checkpoint when a cluster sets a checkpoint dir — see
    // core/Barriers, incl. the checkpoint-data lifecycle caveat) and,
    // on the local path, blocks are released by the ContextCleaner
    // when the frame goes out of scope — repeated invocations don't
    // accumulate pinned storage memory.
    val sh = Barriers.materialize(d
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .repartition(d.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), Text.shinglesFromTokens("toks", 3).as("sh"))
      .filter(size(col("sh")) > 0))
    // Materialize the banded keys too: the self-join below consumes this
    // frame on BOTH sides, and without a barrier each side would
    // recompute the signature. The shingle→signature→band-key chain is
    // the native codegen'd minhash_bands expression (the HOF chain it
    // replaces ran interpreted — CodegenFallback; MinhashBandsSpec
    // pins bit-equality). Folding this barrier INTO the shingle
    // checkpoint (bands as a column there, explode per consumer)
    // measured ~25% slower at sf0.1: all four consumers then re-read
    // the wide shingle blocks, while this narrow (id, band) frame is
    // read twice nearly for free.
    val keyed = Barriers.materialize(sh
      .select(col("doc_id"),
        posexplode(Text.minhashBands(col("sh"), perms, bands))
          .as(Seq("band_idx", "band_key"))))
    val pairs = keyed.as("a")
      .join(keyed.as("b"), Seq("band_idx", "band_key"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        Text.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .withColumn("confirmed", col("jaccard") >= jaccardThreshold)
  }

  /** Process-level cache of the default-parameter banding/candidate
    * frame per (session, data dir). Three registered queries consume
    * the IDENTICAL frame — l07 (confirm counts), l67 (consistency
    * audit), l68 (threshold sweep) — and before this cache each rebuilt
    * the full shingle → signature → band-join pass, tripling the
    * family's absolute cost per bench run. The cached value is the
    * FINAL candidate frame only (doc pairs + jaccard — O(candidates),
    * tiny next to the shingle intermediates, which go out of scope
    * after the first build and are reclaimed by the ContextCleaner);
    * it is materialized so later consumers replay blocks, not lineage.
    * Keyed by session so a stopped test session's frame is never
    * resurrected into a new one. Custom-parameter callers (specs,
    * planted fixtures) use [[minhashCandidates]] directly and bypass
    * the cache. */
  private val candCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def sharedMinhashCandidates(s: SparkSession, dir: String): DataFrame = {
    graft.core.SessionCaches.prune(candCache)
    candCache.computeIfAbsent((s, dir),
      _ => Barriers.materialize(minhashCandidates(docs(s, dir))))
  }

  private val minhashNearDedup: Q = (s, dir) => {
    val cand = sharedMinhashCandidates(s, dir)
    // coalesce: SUM over zero rows is NULL — keep the summary row
    // NULL-free even when banding prunes every candidate.
    cand.agg(
      count(lit(1)).as("n_candidate_pairs"),
      coalesce(sum(when(col("confirmed"), 1L).otherwise(0L)), lit(0L))
        .as("n_confirmed_pairs"))
  }

  /** l99: dedup-aware loss weighting — the alternative to REMOVING
    * duplicates that several training recipes prefer: keep every copy
    * but down-weight each to 1/n_copies so a document's total gradient
    * contribution is copy-count invariant. The ledger reports, per
    * source, the exact integer permille of token mass that SURVIVES
    * the weighting (Σ tokens_d·1000/n_copies over Σ tokens_d) — the
    * number a data-mixing plan needs before deciding dedup-by-removal
    * vs dedup-by-weighting. All floor-division lattice arithmetic
    * (weight_permille = 1000 div n_copies per doc), so both engines
    * agree bit-for-bit; on a dup-free slice every weight is 1000 and
    * the ledger degenerates to the identity — the planted multi-copy
    * law lives in LlmSpec.
    *
    * 100 TB shape: one shuffle of (fp, ntok) pairs to cluster sizes,
    * one fp-keyed join back (both sides 16-byte keys + a long), one
    * per-source rollup. The document text never moves. */
  def dedupWeighting(d: DataFrame): DataFrame = {
    val fp = d.select(col("source"),
      md5(Text.norm(col("text"))).as("fp"),
      size(Text.tokens(col("text"))).cast("long").as("ntok"))
    val cl = fp.groupBy(col("fp")).agg(count(lit(1)).as("n_copies"))
    fp.join(cl, "fp")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("n_tokens"),
        sum(expr("(1000 * ntok) div n_copies")).as("weighted_tokens_e3"))
      .withColumn("surviving_token_permille",
        expr("weighted_tokens_e3 div n_tokens"))
      .orderBy("source")
  }

  private val dedupWeightingQ: Q = (s, dir) => dedupWeighting(docs(s, dir))

  /** l98's similarity threshold as an exact ratio: Jaccard ≥ 6/10. */
  private val ssNum = 6
  private val ssDen = 10

  /** The per-doc DISTINCT 3-gram shingle SET frame (doc_id, sh),
    * materialized — the input both l98 (set-similarity join) and l92
    * (containment audit) fetch wide arrays from. */
  def buildShingleSets(d: DataFrame): DataFrame =
    Barriers.materialize(d
      .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
      .repartition(d.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        array_distinct(Text.shinglesFromTokens("tk", 3)).as("sh"))
      .filter(size(col("sh")) > 0))

  /** Process-level cache of [[buildShingleSets]] over the documents
    * table per (session, dir) — the candCache discipline: l98 and l92
    * consume the IDENTICAL frame, and before this cache each rebuilt
    * the tokenize→shingle→distinct→checkpoint chain per invocation. */
  private val shingleSetCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def sharedShingleSets(s: SparkSession, dir: String): DataFrame = {
    graft.core.SessionCaches.prune(shingleSetCache)
    shingleSetCache.computeIfAbsent((s, dir),
      _ => buildShingleSets(docs(s, dir)))
  }

  def setSimPairs(d: DataFrame): DataFrame =
    setSimPairsFrom(buildShingleSets(d))

  /** l98: EXACT set-similarity self-join via prefix filtering (the
    * AllPairs/PPJoin family — Bayardo et al. WWW'07, Xiao et al.
    * WWW'08): all document pairs whose 3-gram shingle SETS have
    * Jaccard ≥ [[ssNum]]/[[ssDen]], with no false negatives — the
    * deterministic sibling of l07's probabilistic MinHash banding.
    * Each doc's shingles sort RAREST-FIRST (by document frequency —
    * a sortable key per shingle, never a global dense rank); a pair
    * at threshold θ must share a shingle within each side's first
    * m − ⌈θ·m⌉ + 1 shingles (pigeonhole on the common total order),
    * so the equi-join on prefix shingles is a LOSSLESS candidate
    * generator. A length filter (θ·max ≤ min, cross-multiplied)
    * prunes impossible pairs before the confirm. The confirm is
    * all-integer: |∩|·den ≥ |∪|·num — no float Jaccard anywhere.
    *
    * The DuckDB oracle is the NAIVE QUADRATIC join — equality proves
    * the prefix filter changes the plan, not the answer (the q28
    * oracle discipline).
    *
    * 100 TB shape: the df frame is shingle-TYPE-sized (map-side
    * combined, Zipf-small next to the corpus); per-doc prefix
    * selection is a window PARTITIONED BY doc (never global); the
    * candidate join shuffles only (shingle, doc, m) prefix rows —
    * ~(1−θ) of the shingle mass — and wide shingle arrays are fetched
    * per side only for deduped candidates (the l07 narrow-join
    * discipline). Hot shingles fan out C(df,2) candidates at worst;
    * rarest-first ordering makes prefixes rare by construction. */
  def setSimPairsFrom(sets: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ex = sets.select(col("doc_id"), size(col("sh")).as("m"),
      explode(col("sh")).as("g"))
    val dfreq = ex.groupBy(col("g")).agg(count(lit(1)).as("df"))
    // NOT materialized: the self-join's two sides plan as a
    // ReusedExchange of one shuffle (verified in the executed plan),
    // so a checkpoint here only adds write cost (measured +3.5 s).
    val pos = ex.join(dfreq, "g")
      .withColumn("p", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))))
      .filter(col("p") <=
        col("m") - expr(s"(($ssNum * m) + ${ssDen - 1}) div $ssDen") + 1)
      .select(col("doc_id"), col("m"), col("g"))
    val cand = pos.as("a").join(pos.as("b"),
        col("a.g") === col("b.g") &&
          col("a.doc_id") < col("b.doc_id") &&
          greatest(col("a.m"), col("b.m")) * ssNum <=
            least(col("a.m"), col("b.m")) * ssDen)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // Attach strategy for the wide shingle arrays, gated on their
    // MEASURED element mass (one tiny agg over the pinned sets frame —
    // a row count cannot bound array bytes): when the whole array
    // frame is small in absolute terms, broadcast it into both attach
    // joins so the candidate frame never shuffles by doc key; past the
    // cap (measured at sf1: ~2.6M elements ≈ tens of MB made the two
    // broadcast builds cost more than the shuffles they replaced) the
    // doc-keyed shuffle joins run unchanged — the 100 TB path.
    // Candidate-doc pruning was measured useless here: the prefix
    // filter's candidate DOCS cover ~97% of the corpus at every test
    // scale (193k candidate pairs over 5k docs at sf0.1), so a semi
    // prune pays a corpus pass to keep ~everything.
    val elemsAll = sets.agg(
      coalesce(sum(size(col("sh"))), lit(0)).cast("long")).head().getLong(0)
    val attach = (side: String, arr: String) =>
      Barriers.broadcastIfSmall(
        sets.select(col("doc_id").as(side), col("sh").as(arr)),
        elemsAll, Barriers.broadcastArrayElemCap(sets))
    cand
      .join(attach("doc_a", "sa"), "doc_a")
      .join(attach("doc_b", "sb"), "doc_b")
      .withColumn("n_inter",
        size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("n_union",
        size(col("sa")) + size(col("sb")) - col("n_inter"))
      .filter(col("n_inter") * ssDen >= col("n_union") * ssNum)
      .select(col("doc_a"), col("doc_b"), col("n_inter"),
        col("n_union").cast("long").as("n_union"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val setSimJoin: Q = (s, dir) =>
    setSimPairsFrom(sharedShingleSets(s, dir))

  /** 62-bit portable SimHash signatures (three-phase: hash tokens once,
    * sign-sum fold, pack — see Text.simhashWidth for the 62-vs-64
    * tradeoff) for a document frame with (doc_id, text). */
  def simhashSignatures(d: DataFrame): DataFrame =
    d.withColumn("toks", expr(Text.toksSql("text")))
      // Degenerate docs (empty/whitespace-only → zero tokens) all pack
      // to simhash 0 and would share every band key downstream, forming
      // an O(k²) hot-bucket clique in the band equi-join — drop them
      // here, exactly as minhashCandidates drops empty shingle sets.
      .filter(size(col("toks")) > 0)
      // the native packer hashes each token once and folds the bits in
      // generated code — one whole-stage-codegen projection from doc
      // to signature (the HOF hash/bit-count/pack chain remains as the
      // specification — SimhashPackSpec pins bit-equality)
      .select(col("doc_id"), Text.simhashPack(col("toks")).as("simhash"))

  /** SimHash near-dup candidates by signature-band equi-join — the
    * scale path, mirroring [[minhashCandidates]]: the 62-bit signature
    * splits into `maxHamming + 1` bands (the FEWEST the pigeonhole
    * guarantee allows — for the default threshold 4 that is 5 bands of
    * 13/12 bits, ~8k-value keys); docs sharing any (band index, band
    * value) key become candidates; hamming distance is confirmed on
    * candidates only. Recall is GUARANTEED: a pair within distance
    * `maxHamming` differs in at most that many bands, so at least one
    * band matches (Manku et al., WWW'07) — no all-pairs O(n²) join ever
    * runs. The banded frame stays narrow (id + 8-byte signature +
    * band key); localCheckpoint keeps both self-join sides from
    * recomputing the per-token signature fold. */
  def simhashCandidates(d: DataFrame, maxHamming: Int = 4): DataFrame = {
    val sh = Barriers.materialize(simhashSignatures(d))
    val keyed = sh.select(col("doc_id"), col("simhash"),
      posexplode(Text.simhashBands("simhash", maxHamming + 1))
        .as(Seq("band_idx", "band_key")))
    keyed.as("a")
      .join(keyed.as("b"), Seq("band_idx", "band_key"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        Text.hamming(col("a.simhash"), col("b.simhash")).as("dist"))
      .distinct()
      .withColumn("near_dup", col("dist") <= maxHamming)
  }

  /** SimHash near-dedup accounting: banded candidate counts + the
    * collision / hamming≤4 splits. (All-pairs ground truth lives in
    * LlmSpec, which asserts the banded path's recall against it.) */
  private val simhashNearDedup: Q = (s, dir) => {
    val cand = simhashCandidates(docs(s, dir))
    // coalesce: SUM over zero rows is NULL — keep the summary row
    // NULL-free even when banding prunes every candidate.
    cand.agg(
      count(lit(1)).as("n_candidate_pairs"),
      coalesce(sum(when(col("dist") === 0, 1L).otherwise(0L)), lit(0L))
        .as("n_identical"),
      coalesce(sum(when(col("near_dup"), 1L).otherwise(0L)), lit(0L))
        .as("n_hamming_le4"))
  }

  // ---- similarity search ---------------------------------------------

  /** Brute-force cosine top-k for one query vector (the correctness
    * baseline every ANN variant is judged against). Broadcast the single
    * query row; the scan stays embarrassingly parallel. */
  private val cosineTopK: Q = (s, dir) => {
    val e = embs(s, dir).withColumn("nrm", Text.l2norm(col("vec")))
    val q = e.filter(col("vec_id") === 0)
      .select(col("vec").as("qvec"), col("nrm").as("qnrm"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("label"),
        round(Text.cosineWithNorms(col("vec"), col("qvec"),
          col("nrm"), col("qnrm")), 6).as("cosine"))
      .orderBy(desc("cosine"), col("vec_id"))
      .limit(10)
  }

  /** Fixed panel size of the all-pairs baseline below: the quadratic
    * join runs over AT MOST this many vectors no matter how large the
    * corpus grows (vec_id is unique, so the pushed `vec_id < panel`
    * filter is a hard row bound). 2000 covers every test SF exactly
    * while capping the pair count at ~2M forever. */
  val allPairsPanel = 2000

  /** Embedding-cosine near-dup accounting over all pairs of a FIXED
    * [[allPairsPanel]]-vector panel — correctness baseline for the LSH
    * bucket variant below (which is the scale path). The panel bound is
    * what keeps this registered entry safe to run at any corpus scale:
    * the O(n²) shape never sees more than the panel (PlanAuditSpec
    * allowlists its BroadcastNestedLoopJoin on that basis; unbounded
    * all-pairs truth lives only in LlmSpec fixtures). Norms are hoisted
    * to one fold per VECTOR, so each pair costs a single dot product;
    * the arithmetic shape dot/(na*nb) stays identical to the oracle. */
  private val embeddingNearDup: Q = (s, dir) => {
    val e = embs(s, dir).filter(col("vec_id") < allPairsPanel)
      .select(col("vec_id"), col("vec"))
      .withColumn("nrm", Text.l2norm(col("vec")))
      .repartition(s.sparkContext.defaultParallelism)
    val pairs = e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(Text.cosineWithNorms(col("x.vec"), col("y.vec"),
        col("x.nrm"), col("y.nrm")).as("cos"))
    pairs.agg(
      count(lit(1)).as("n_pairs"),
      sum(when(col("cos") > 0.2, 1L).otherwise(0L)).as("n_above_02"),
      sum(when(col("cos") > 0.5, 1L).otherwise(0L)).as("n_above_05"),
      sum(when(col("cos") > 0.9, 1L).otherwise(0L)).as("n_above_09"))
  }

  /** Hyperplane-LSH ANN bucketing: 8 sign bits → ≤256 buckets; bucket
    * histogram summary. Oracle-checked since round 5 (the portable
    * hyperplane hash lets DuckDB recompute every bucket); planted
    * recall vs brute force is asserted in LlmSpec. */
  private val annBuckets: Q = (s, dir) => {
    val e = embs(s, dir)
      .withColumn("bucket", Text.hyperplaneBucket("vec", 8))
    e.groupBy(col("bucket")).agg(count(lit(1)).as("n_vecs"))
      .agg(
        count(lit(1)).as("n_buckets"),
        max(col("n_vecs")).as("max_bucket"),
        min(col("n_vecs")).as("min_bucket"),
        sum(col("n_vecs")).as("n_total"))
  }

  /** IVF (inverted-file) assignment: every vector goes to its
    * highest-dot "centroid" — here the first `nCells` vectors serve as
    * deterministic seed centroids (k-means init without the iterations;
    * the index structure, not the clustering quality, is the operator).
    * The centroid table is a bounded model broadcast — at scale the
    * assignment stays one narrow pass and searches probe only the
    * closest cells' posting lists instead of the full corpus. */
  def ivfAssign(e: DataFrame, nCells: Int): DataFrame = {
    val cents = e.filter(col("vec_id") < nCells)
      .select(collect_list(struct(col("vec_id").cast("int").as("cid"),
        col("vec").as("cvec"))).as("cents"))
    // Tie-break on equal dots: LOWER cid wins. collect_list order is
    // not deterministic across partitions, so "first max wins" alone
    // would make a tied assignment depend on array order; the explicit
    // cid test makes the argmax order-independent (and exactly matches
    // the oracle's ORDER BY dot DESC, cid). The (dot, cid) structs
    // materialize in transform FIRST so each centroid's O(dim) dot
    // fold runs exactly once — referencing the dot from inside the
    // argmax lambda would re-evaluate the interpreted fold per
    // reference (the same once-per-row discipline as tokenHashes).
    e.crossJoin(broadcast(cents))
      .withColumn("cid", expr(
        """aggregate(
          |  transform(cents, c -> named_struct(
          |    'd', aggregate(zip_with(vec, c.cvec, (x, y) -> x * y),
          |           0.0D, (a, v) -> a + v),
          |    'cid', c.cid)),
          |  named_struct('best', CAST(-1e308 AS DOUBLE), 'cid', -1),
          |  (acc, s) -> IF(
          |    s.d > acc.best OR (s.d = acc.best AND s.cid < acc.cid),
          |    named_struct('best', s.d, 'cid', s.cid),
          |    acc)).cid""".stripMargin))
      .drop("cents")
  }

  /** IVF index profile: posting-list histogram — oracle-checked since
    * round 5 (the assignment argmax is portable dot-product
    * arithmetic); recall on planted neighbors is asserted in
    * LlmSpec. */
  private val ivfIndex: Q = (s, dir) => {
    ivfAssign(embs(s, dir), 16)
      .groupBy(col("cid")).agg(count(lit(1)).as("n_vecs"))
      .agg(
        count(lit(1)).as("n_cells"),
        max(col("n_vecs")).as("max_cell"),
        min(col("n_vecs")).as("min_cell"),
        sum(col("n_vecs")).as("n_total"))
  }

  /** IVF probe-side top-k search — the half of the index [[ivfAssign]]
    * builds that answers queries: rank cells per query by centroid dot
    * product, probe the top `nprobe` cells' posting lists, return the
    * per-query cosine top-k among probed candidates (the query vector
    * itself excluded).
    *
    * Scale shape: the centroid model and the (|Q| × nprobe) probe list
    * are BROADCAST, so the corpus-side posting lists never shuffle —
    * the probe is a broadcast hash join on cid over the assignment's
    * existing partitioning. The only wide movement is the candidate
    * set (|Q| · N · nprobe/nCells rows of (qid, id, cosine)) shuffling
    * by qid for the top-k rank — and the executed plan pre-reduces it:
    * Spark rewrites the rank<=k filter into WindowGroupLimit
    * Partial/Final, so each map partition forwards only its own top k
    * per query into the exchange. */
  def ivfSearch(e: DataFrame, nCells: Int, nprobe: Int, k: Int,
      isQuery: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assigned = ivfAssign(e, nCells)
      .select(col("vec_id"), col("vec"), col("cid"))
      .withColumn("nrm", Text.l2norm(col("vec")))
    val cents = e.filter(col("vec_id") < nCells)
      .select(col("vec_id").cast("int").as("cid"), col("vec").as("cvec"))
    val queries = e.filter(isQuery)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"))
      .withColumn("qnrm", Text.l2norm(col("qvec")))
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("cdot", Text.dot(col("qvec"), col("cvec")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("cdot"), col("cid"))))
      .filter(col("crank") <= nprobe)
      .select(col("qid"), col("qvec"), col("qnrm"), col("cid"))
    val cand = assigned.join(broadcast(probes), "cid")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        Text.cosineWithNorms(col("vec"), col("qvec"),
          col("nrm"), col("qnrm")).as("cosine"))
    cand.withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("cosine"), col("vec_id"))))
      .filter(col("rank") <= k)
  }

  /** l15: IVF search over the embeddings table — queries are vec_ids
    * 0-3, 16 cells, nprobe 4, top-10. Fully oracle-checked: cell
    * assignment, probe ranking, and cosine ordering are all portable
    * arithmetic DuckDB replays exactly (recall quality vs brute force
    * is asserted on planted neighbors in LlmSpec). */
  private val ivfSearchQ: Q = (s, dir) =>
    ivfSearch(embs(s, dir), 16, 4, 10, col("vec_id") < 4)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id"), round(col("cosine"), 6).as("cosine"))
      .orderBy("qid", "rank")

  /** l52: ANN recall audit — measure the IVF index's recall@10 against
    * exact brute-force truth, per query and as integer hit counts, so
    * index-quality regressions (bad centroids, too-low nprobe) surface
    * as data instead of anecdotes. This is the quality gate every
    * production ANN deployment runs before swapping an index in.
    *
    * Scale shape: the exact side is |Q| × N dot products with the
    * 4-row query panel BROADCAST (one narrow corpus pass, no shuffle
    * until the per-query top-k WindowGroupLimit); the approx side is
    * [[ivfSearch]]'s broadcast-probe shape. Both sides break cosine
    * ties by vec_id, so the top-k SETS are deterministic and the whole
    * audit — including the recall ratio, an IEEE division of small
    * integers — replays bit-identically in DuckDB. */
  private val annRecallAudit: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val k = 10
    val e = embs(s, dir)
    val queries = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"))
      .withColumn("qnrm", Text.l2norm(col("qvec")))
    val exact = e.withColumn("nrm", Text.l2norm(col("vec")))
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        Text.cosineWithNorms(col("vec"), col("qvec"),
          col("nrm"), col("qnrm")).as("cosine"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(desc("cosine"), col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"))
    val approx = ivfSearch(e, 16, 4, k, col("vec_id") < 4)
      .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
    exact.join(approx, Seq("qid", "vec_id"), "left")
      .groupBy(col("qid"))
      .agg(
        count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall_at_10",
        col("n_hit").cast("double") / col("n_exact").cast("double"))
      .orderBy("qid")
  }

  /** Matryoshka truncation dims swept by l72 — full dim first (its
    * top-10 IS the truth set, so its recall row is the 100% sanity
    * anchor), then successive halvings. */
  private val mrlDims = Seq(64, 32, 16, 8)

  /** l72: matryoshka/truncation audit — how much retrieval quality
    * survives cutting an embedding to its prefix dims (Kusupati et al.
    * 2022 "Matryoshka Representation Learning": MRL-trained models
    * front-load information so serving can truncate for memory; this
    * audit measures what truncation costs on THIS corpus). For a
    * 10-probe panel: exact cosine top-10 at each prefix dim vs the
    * full-dim top-10 truth, reported as integer hit counts (Σ over
    * probes of |top10_d ∩ top10_full|) — recall@10 = hits / 100, but
    * the oracle compares the exact integers, not the float.
    *
    * Determinism: Text.dot's fold order matches DuckDB's
    * list_dot_product, norms/division share one spelling, ties break
    * on vec_id — the l09 contract, per dim. Scale shape: probe panel
    * (10 rows) × dim panel (4 rows) broadcast against one corpus scan
    * — 40 narrow rows per vector before rank ≤ 10 collapses each
    * (probe, dim) group via WindowGroupLimit; the final rollup is 4
    * rows. The corpus is never self-joined. */
  private val matryoshkaAudit: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val e = embs(s, dir)
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("vec").as("qv"))
    val dims = mrlDims.toDF("dim")
    val top = e.select(col("vec_id"), col("vec"))
      .crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("qid"))
      .crossJoin(broadcast(dims))
      .withColumn("va", expr("slice(vec, 1, dim)"))
      .withColumn("qa", expr("slice(qv, 1, dim)"))
      .withColumn("cos", Text.cosine(col("va"), col("qa")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"), col("dim"))
          .orderBy(desc("cos"), col("vec_id"))))
      .filter(col("rank") <= 10)
      .select(col("qid"), col("dim"), col("vec_id"))
    val truth = top.filter(col("dim") === mrlDims.head)
      .select(col("qid").as("t_qid"), col("vec_id").as("t_vid"))
    top.join(truth,
        col("qid") === col("t_qid") && col("vec_id") === col("t_vid"),
        "left")
      .groupBy(col("dim"))
      .agg(
        countDistinct(col("qid")).as("n_probes"),
        coalesce(sum(when(col("t_vid").isNotNull, 1L).otherwise(0L)),
          lit(0L)).as("recall_hits"))
      .orderBy(desc("dim"))
  }

  /** l55: semantic dedup — the SemDeDup recipe (Abbas et al. 2023,
    * arXiv:2303.09540) re-expressed: bucket embeddings (they k-means;
    * we reuse the portable hyperplane-LSH cells so the oracle can
    * replay bucket membership), compare pairs ONLY within a bucket,
    * and drop every vector with a ≥ τ cosine neighbor of lower vec_id
    * — keeping one representative per near-dup group. The corpus is
    * replayed with a scaled copy of every 10th vector (scaling
    * preserves cosine and the hyperplane signs, so each copy lands in
    * its original's bucket at cosine ≈ 1.0 — planted truth the
    * fixture's random vectors, all pairs < 0.8, cannot supply).
    *
    * Scale shape: the pair join is an equi-join on bucket — candidate
    * count is Σ bucket² not corpus², the same bound the paper gets
    * from clustering; the barrier materializes the bucketed corpus
    * once so the self-join's two sides share one scan/computation.
    * Survivor checksum XOR-folds a portable mix (commutative,
    * overflow-free at any count — the l54 argument). */
  private val semanticDedup: Q = (s, dir) => {
    val tau = 0.95
    val e = embs(s, dir).select(col("vec_id"), col("vec"))
    val planted = e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"),
        expr("transform(vec, x -> x * 1.01D)").as("vec"))
    val corpus = Barriers.materialize(e.unionByName(planted)
      .withColumn("bucket", Text.hyperplaneBucket("vec", 8))
      .withColumn("nrm", Text.l2norm(col("vec"))))
    val dups = corpus.as("a").join(corpus.as("b"),
        col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .filter(Text.cosineWithNorms(col("a.vec"), col("b.vec"),
        col("a.nrm"), col("b.nrm")) >= tau)
      .select(col("b.vec_id").as("vec_id")).distinct()
      .withColumn("dup", lit(1L))
    corpus.join(dups, Seq("vec_id"), "left")
      .agg(
        count(lit(1)).as("n_input"),
        sum(coalesce(col("dup"), lit(0L))).as("n_removed"),
        sum(when(col("dup").isNull, 1L).otherwise(0L)).as("n_kept"),
        expr(s"bit_xor(IF(dup IS NULL, " +
          s"${Text.portableMixWideSql("vec_id")}, 0L))").as("kept_xor"))
  }

  /** XOR masks for multi-probe LSH: every bucket within hamming
    * `radius` of the query's own (mask 0 = the bucket itself). Radius
    * 2 on 8 planes probes 37 of 256 buckets — a near-neighbor whose
    * perturbation flips up to two marginal hyperplane signs is still
    * found (radius 1 measurably misses: planted 0.02-perturbations
    * land at bucket-hamming 2 on the sf0.001 corpus). */
  def probeMasks(planes: Int, radius: Int): Seq[Int] =
    (0 until (1 << planes)).filter(m => Integer.bitCount(m) <= radius)

  /** Hyperplane-bucket probe search — the query side of the l11
    * buckets: probe every bucket within hamming `probeRadius` of the
    * query's bucket (multi-probe LSH), cosine top-k on the candidates.
    * Same broadcast/shuffle shape as [[ivfSearch]]: bucketing is one
    * narrow pass over the corpus, probes broadcast, candidates shuffle
    * by qid only for the final rank. */
  def bucketSearch(e: DataFrame, planes: Int, k: Int,
      isQuery: Column, probeRadius: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = Barriers.materialize(e.select(col("vec_id"), col("vec"))
      .withColumn("bucket", Text.hyperplaneBucket("vec", planes))
      .withColumn("nrm", Text.l2norm(col("vec"))))
      // ^ consumed by both sides of the probe join
    val masks = probeMasks(planes, probeRadius)
    val probes = b.filter(isQuery)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"),
        col("nrm").as("qnrm"),
        explode(array(masks.map(m =>
          col("bucket").bitwiseXOR(lit(m))): _*)).as("pbucket"))
    // a vector lives in exactly one bucket and the probe buckets are
    // distinct (distinct XOR masks), so (qid, vec_id) pairs are
    // already unique — no candidate dedup needed
    val cand = b.join(broadcast(probes),
        col("bucket") === col("pbucket") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        Text.cosineWithNorms(col("vec"), col("qvec"),
          col("nrm"), col("qnrm")).as("cosine"))
    cand.withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("cosine"), col("vec_id"))))
      .filter(col("rank") <= k)
  }

  /** l16: multi-probe hyperplane-LSH search, queries vec_id 0-3, 8
    * planes, top-10 — oracle-checked end to end (the portable
    * hyperplane hash lets DuckDB recompute every bucket). */
  private val bucketSearchQ: Q = (s, dir) =>
    bucketSearch(embs(s, dir), 8, 10, col("vec_id") < 4)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id"), round(col("cosine"), 6).as("cosine"))
      .orderBy("qid", "rank")

  /** Hard-negative mining — the contrastive-training data op: for each
    * query (anchor), the nearest probed candidates whose LABEL differs
    * (near the anchor in embedding space but semantically distinct =
    * the gradient-rich negatives). Same broadcast/probe/WindowGroupLimit
    * shape as [[ivfSearch]]; the label-mismatch filter runs BEFORE the
    * top-k rank, so negatives aren't crowded out of a fixed-k window by
    * same-label neighbors. */
  def hardNegatives(e: DataFrame, nCells: Int, nprobe: Int, k: Int,
      isQuery: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assigned = ivfAssign(e, nCells)
      .select(col("vec_id"), col("vec"), col("label"), col("cid"))
      .withColumn("nrm", Text.l2norm(col("vec")))
    val cents = e.filter(col("vec_id") < nCells)
      .select(col("vec_id").cast("int").as("cid"), col("vec").as("cvec"))
    val queries = e.filter(isQuery)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"),
        col("label").as("qlabel"))
      .withColumn("qnrm", Text.l2norm(col("qvec")))
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("cdot", Text.dot(col("qvec"), col("cvec")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("cdot"), col("cid"))))
      .filter(col("crank") <= nprobe)
      .select(col("qid"), col("qvec"), col("qnrm"), col("qlabel"), col("cid"))
    val cand = assigned.join(broadcast(probes), "cid")
      .filter(col("vec_id") =!= col("qid") &&
        col("label") =!= col("qlabel"))
      .select(col("qid"), col("vec_id"), col("label"),
        Text.cosineWithNorms(col("vec"), col("qvec"),
          col("nrm"), col("qnrm")).as("cosine"))
    cand.withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("cosine"), col("vec_id"))))
      .filter(col("rank") <= k)
  }

  /** l39: hard negatives for queries vec_id 0-3 (16 cells, nprobe 4,
    * top-10) — fully oracle-checked like l15, plus the mined rows carry
    * their label so the "different label" contract is visible in the
    * output itself. */
  private val hardNegativesQ: Q = (s, dir) =>
    hardNegatives(embs(s, dir), 16, 4, 10, col("vec_id") < 4)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("label").cast("long").as("neg_label"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy("qid", "rank")

  // ---- product quantization (PQ) --------------------------------------

  /** PQ geometry: 64-dim vectors split into 8 subspaces of 8 dims, 16
    * codewords per subspace (seeded from the first 16 vectors, the same
    * deterministic convention as [[ivfAssign]]). A vector's code is 8
    * small ints — at K ≤ 256 that is 8 BYTES against 256 raw float
    * bytes, the 32× memory compression that lets a billion-vector index
    * live in RAM (Jégou et al., TPAMI'11 product quantization). */
  val pqM = 8       // subspaces
  val pqSub = 8     // dims per subspace
  val pqK = 16      // codewords per subspace
  /** ADC distances are quantized to integer MICRO-units before any
    * cross-subspace summation: integer sums are exact and
    * order-independent, so Spark's sequential lambda fold and DuckDB's
    * unordered SUM cannot diverge by a float-reassociation ulp (the
    * per-subspace distances themselves are single sequential folds,
    * bit-identical in both engines — the l09/l15 precedent). */
  val pqMicro = 1000000.0

  /** Squared-L2 between aligned `sub`-dim slices of two vector columns
    * — the single sequential fold both engines replay bit-identically
    * (DuckDB spells it list_dot_product(diff, diff)). `m` is a SQL
    * variable in scope (the subspace index). */
  private def pqSubDistSql(vecA: String, vecB: String): String =
    s"""aggregate(zip_with(slice($vecA, m * $pqSub + 1, $pqSub),
       |  slice($vecB, m * $pqSub + 1, $pqSub),
       |  (x, y) -> (x - y) * (x - y)), 0.0D, (a, v) -> a + v)""".stripMargin

  /** PQ encoding: one narrow pass — the 16×64-double codebook rides a
    * singleton broadcast row, each vector's 8-int code is an argmin per
    * subspace (ties to lowest cid, the ivfAssign convention). At scale
    * the corpus never shuffles; the output is the 8-byte-per-vector
    * frame every downstream ADC search scans instead of raw floats. */
  def pqEncode(e: DataFrame): DataFrame = {
    val cents = e.filter(col("vec_id") < pqK)
      .select(collect_list(struct(col("vec_id").cast("int").as("cid"),
        col("vec").cast("array<double>").as("cvec"))).as("cents"))
    e.crossJoin(broadcast(cents))
      .withColumn("code",
        Text.pqEncode(col("vec").cast("array<double>"), col("cents"),
          pqM, pqSub))
      .drop("cents")
  }

  /** The HOF specification of [[pqEncode]] — the readable argmin the
    * native codegen'd `pq_encode` expression is pinned against
    * (PqEncodeSpec asserts bit-equality) and the exact spelling the
    * DuckDB oracles replay. Not on any hot path: the nested
    * transform∘aggregate∘named_struct fold is CodegenFallback and ran
    * interpreted at ~pqM·pqK lambda-tree evaluations per vector. */
  def pqEncodeHof(e: DataFrame): DataFrame = {
    val cents = e.filter(col("vec_id") < pqK)
      .select(collect_list(struct(col("vec_id").cast("int").as("cid"),
        col("vec").as("cvec"))).as("cents"))
    e.crossJoin(broadcast(cents))
      .withColumn("code", expr(
        s"""transform(sequence(0, ${pqM - 1}), m ->
           |  aggregate(
           |    transform(cents, c -> named_struct(
           |      'd', ${pqSubDistSql("vec", "c.cvec")},
           |      'cid', c.cid)),
           |    named_struct('best', CAST(1e308 AS DOUBLE), 'cid', -1),
           |    (acc, s) -> IF(
           |      s.d < acc.best OR (s.d = acc.best AND s.cid < acc.cid),
           |      named_struct('best', s.d, 'cid', s.cid),
           |      acc)).cid)""".stripMargin))
      .drop("cents")
  }

  /** Process-level cache of the PQ-INDEXED embeddings frame per
    * (session, dir) — the candCache discipline, seventh consumer
    * family: `(vec_id, cid, code)` where `cid` is the 16-cell IVF
    * assignment and `code` the 8-byte PQ code, built in ONE narrow
    * pass (two singleton model broadcasts over one scan). Three
    * registered queries consume it — l36 (codebook profile: code
    * only), l37 (ADC search: vec_id+code), l38 (IVFPQ: all three) —
    * and before this cache each re-ran the interpreted encode per
    * invocation, tripling the family's cost per bench run. The cached
    * value is O(corpus) but NARROW (two longs + 8 ints per vector —
    * the 32× compression is the point); materialized so later
    * consumers replay blocks, not lineage. Custom-parameter callers
    * (specs, planted fixtures) use [[pqEncode]]/[[ivfAssign]] directly
    * and bypass the cache. */
  private val pqIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def sharedPqIndex(s: SparkSession, dir: String): DataFrame = {
    graft.core.SessionCaches.prune(pqIndexCache)
    pqIndexCache.computeIfAbsent((s, dir),
      _ => Barriers.materialize(ivfAssign(pqEncode(embs(s, dir)), pqK)
        .select(col("vec_id"), col("cid"), col("code"))))
  }

  /** PQ asymmetric-distance (ADC) top-k search: per query, an 8×16
    * lookup table of micro-unit subspace distances to every codeword;
    * each corpus CODE (8 bytes, never the raw vector) scores as the sum
    * of 8 table lookups. Scale shape: LUTs broadcast (|Q| rows), the
    * code scan is one narrow pass, and the per-query top-k rank plans
    * as WindowGroupLimit — the same pre-reduced shuffle as ivfSearch.
    * Lossy by construction: ranks use quantized distances (LlmSpec
    * pins recall on planted near-duplicates; the exact re-rank of the
    * returned candidates is l09's brute-force path). */
  def pqSearch(e: DataFrame, topK: Int, isQuery: Column): DataFrame =
    pqSearchFrom(e, pqEncode(e).select(col("vec_id"), col("code")),
      topK, isQuery)

  /** [[pqSearch]] over a PRE-BUILT `(vec_id, code)` frame — the entry
    * the registered l37 takes with [[sharedPqIndex]] so the encode is
    * computed once per (session, dir), not once per consumer. */
  def pqSearchFrom(e: DataFrame, codes: DataFrame, topK: Int,
      isQuery: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = e.filter(col("vec_id") < pqK)
      .select(collect_list(struct(col("vec_id").cast("int").as("cid"),
        col("vec").as("cvec"))).as("cents"))
    val luts = e.filter(isQuery)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"))
      .crossJoin(broadcast(cents))
      .withColumn("lut", expr(
        s"""transform(sequence(0, ${pqM - 1}), m ->
           |  transform(sequence(0, ${pqK - 1}), k ->
           |    CAST(ROUND(${pqSubDistSql("qvec",
                  s"element_at(filter(cents, c -> c.cid = k), 1).cvec")}
           |      * ${pqMicro}D) AS BIGINT)))""".stripMargin))
      .select(col("qid"), col("lut"))
    codes.crossJoin(broadcast(luts))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("adc_micro", expr(
        s"""aggregate(sequence(0, ${pqM - 1}), 0L, (a, m) ->
           |  a + element_at(element_at(lut, m + 1),
           |        element_at(code, m + 1) + 1))""".stripMargin))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("adc_micro"), col("vec_id"))))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("adc_micro"))
  }

  /** IVF+PQ composed search — the billion-scale ANN architecture
    * (FAISS IVFPQ): the corpus is indexed ONCE into (cell, 8-byte
    * code) — a single narrow pass attaching both the IVF cell
    * ([[ivfAssign]]) and the PQ code ([[pqEncode]]), two singleton
    * model broadcasts over one scan — then a query probes its top
    * `nprobe` cells and ranks ONLY those posting lists by table-lookup
    * ADC, never touching a raw vector. Scale shape: probes and LUTs
    * broadcast; the candidate set is |Q|·N·nprobe/nCells CODE rows
    * (8 bytes each); top-k plans as WindowGroupLimit. This composes
    * the IVF pruning (which cells to read) with the PQ compression
    * (what a posting-list entry costs) — each covered alone by
    * l15/l37. */
  def ivfPqSearch(e: DataFrame, nCells: Int, nprobe: Int, topK: Int,
      isQuery: Column): DataFrame =
    ivfPqSearchFrom(e,
      ivfAssign(pqEncode(e), nCells)
        .select(col("vec_id"), col("cid"), col("code")),
      nCells, nprobe, topK, isQuery)

  /** [[ivfPqSearch]] over a PRE-BUILT `(vec_id, cid, code)` index
    * frame — the entry the registered l38 takes with [[sharedPqIndex]]
    * (whose cell count is [[pqK]] = 16; pass the matching `nCells` so
    * the probe ranking reads the same centroid set the index was
    * assigned against). */
  def ivfPqSearchFrom(e: DataFrame, indexed: DataFrame, nCells: Int,
      nprobe: Int, topK: Int, isQuery: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = e.filter(col("vec_id") < nCells)
      .select(col("vec_id").cast("int").as("cid"), col("vec").as("cvec"))
    val queries = e.filter(isQuery)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"))
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("cdot", Text.dot(col("qvec"), col("cvec")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("cdot"), col("cid"))))
      .filter(col("crank") <= nprobe)
      .select(col("qid"), col("cid"))
    val centsList = e.filter(col("vec_id") < pqK)
      .select(collect_list(struct(col("vec_id").cast("int").as("cid"),
        col("vec").as("cvec"))).as("cents"))
    val luts = queries.crossJoin(broadcast(centsList))
      .withColumn("lut", expr(
        s"""transform(sequence(0, ${pqM - 1}), m ->
           |  transform(sequence(0, ${pqK - 1}), k ->
           |    CAST(ROUND(${pqSubDistSql("qvec",
                  s"element_at(filter(cents, c -> c.cid = k), 1).cvec")}
           |      * ${pqMicro}D) AS BIGINT)))""".stripMargin))
      .select(col("qid"), col("lut"))
    indexed.join(broadcast(probes), "cid")
      .filter(col("vec_id") =!= col("qid"))
      .join(broadcast(luts), "qid")
      .withColumn("adc_micro", expr(
        s"""aggregate(sequence(0, ${pqM - 1}), 0L, (a, m) ->
           |  a + element_at(element_at(lut, m + 1),
           |        element_at(code, m + 1) + 1))""".stripMargin))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("adc_micro"), col("vec_id"))))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("adc_micro"))
  }

  /** l38: IVF+PQ search over the embeddings table — queries vec_id
    * 0-3, 16 cells, nprobe 4, top-10 by quantized distance within the
    * probed cells; fully oracle-checked. */
  private val ivfPqSearchQ: Q = (s, dir) =>
    ivfPqSearchFrom(embs(s, dir), sharedPqIndex(s, dir), 16, 4, 10,
      col("vec_id") < 4)
      .orderBy("qid", "rank")

  /** l36: PQ codebook/compression profile — code-space usage plus the
    * bytes-per-vector accounting that IS the operator's reason to
    * exist. */
  private val pqIndexQ: Q = (s, dir) =>
    sharedPqIndex(s, dir)
      .select(expr("array_join(transform(code, c -> cast(c AS string)), ',')")
        .as("code_str"))
      .agg(
        count(lit(1)).as("n_vectors"),
        countDistinct(col("code_str")).as("n_distinct_codes"))
      .select(col("n_vectors"), col("n_distinct_codes"),
        lit(pqM.toLong).as("m_subspaces"),
        lit(pqK.toLong).as("k_codewords"),
        lit(pqM.toLong).as("code_bytes"),      // one byte per subspace at K<=256
        lit(4L * pqM * pqSub).as("raw_bytes")) // float32 per dim

  /** l37: ADC search over the embeddings table — queries vec_id 0-3,
    * top-10 by quantized distance, fully oracle-checked (codes, LUTs,
    * and integer ADC sums replay exactly in DuckDB). */
  private val pqSearchQ: Q = (s, dir) =>
    pqSearchFrom(embs(s, dir), sharedPqIndex(s, dir), 10,
      col("vec_id") < 4)
      .orderBy("qid", "rank")

  /** Scalar-quantized (int8) search + exact re-rank — the middle point
    * of the compression spectrum between raw floats (l09, 8 bytes/dim)
    * and PQ codes (l37, 1 byte per 8 dims): one byte PER DIM, no
    * codebook to train. Pass 1 scans only int8 vectors — symmetric
    * integer dot products, exact and order-independent, so candidate
    * ranks replay bit-identically in any engine — and keeps `candC`
    * per query; pass 2 re-ranks ONLY those candidates with exact float
    * cosine. At scale pass 1 reads a 4-8× smaller corpus and the raw
    * floats are fetched (equi-join by id) for |Q|·candC rows, never
    * scanned — the standard SQ8+refine recipe (FAISS
    * `IndexScalarQuantizer` + refine; Milvus SQ8R).
    *
    * Quantization is symmetric max-abs: one corpus-wide scale (a
    * singleton broadcast, the k06 literal discipline would be overkill
    * for one double), `q = round(x / amax * 127)` ∈ [-127, 127]. The
    * scale rides a max-aggregate — order-independent, so the quantized
    * corpus is deterministic. With candC ≥ |corpus|-1 the operator IS
    * brute force (quantization only prunes candidates, the re-rank is
    * exact) — LlmSpec pins that equivalence law plus the recall floor
    * at the working candC. */
  def sqSearch(e: DataFrame, candC: Int, topK: Int,
      isQuery: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val amax = e.agg(max(expr(
      "aggregate(vec, 0.0D, (a, x) -> greatest(a, abs(x)))")).as("amax"))
    // materialize once: the quantized corpus feeds the query panel, the
    // pass-1 scan, and the pass-2 fetch — three consumers, one scan
    val qz = Barriers.materialize(e.crossJoin(broadcast(amax))
      .withColumn("qv", expr(
        "transform(vec, x -> CAST(ROUND(x / amax * 127.0D) AS INT))"))
      .select(col("vec_id"), col("vec"), col("qv")))
    val queries = qz.filter(isQuery)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"),
        col("qv").as("qqv"))
      .withColumn("qnrm", Text.l2norm(col("qvec")))
    // pass 1: int8-only scan; per-query top-candC plans as
    // WindowGroupLimit (each map partition forwards its own top candC)
    val cand = qz.select(col("vec_id"), col("qv"))
      .crossJoin(broadcast(queries.select(col("qid"), col("qqv"))))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("iscore", expr(
        """aggregate(zip_with(qv, qqv, (x, y) -> CAST(x AS BIGINT) * y),
          |  0L, (a, v) -> a + v)""".stripMargin))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(desc("iscore"), col("vec_id"))))
      .filter(col("crank") <= candC)
      .select(col("qid"), col("vec_id"))
    // pass 2: fetch raw vectors by id for the survivors only, exact
    // cosine, final top-k
    cand.join(qz.select(col("vec_id"), col("vec")), "vec_id")
      .join(broadcast(queries.select(col("qid"), col("qvec"),
        col("qnrm"))), "qid")
      .withColumn("cosine", Text.cosineWithNorms(col("vec"), col("qvec"),
        Text.l2norm(col("vec")), col("qnrm")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(desc("cosine"), col("vec_id"))))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id"), round(col("cosine"), 6).as("cosine"))
  }

  /** l58: SQ8 + re-rank over the embeddings table — queries vec_id 0-3,
    * 32 candidates, top-10; fully oracle-checked (integer candidate
    * ranks and IEEE cosine re-ranks both replay exactly in DuckDB). */
  private val sqSearchQ: Q = (s, dir) =>
    sqSearch(embs(s, dir), 32, 10, col("vec_id") < 4)
      .orderBy("qid", "rank")

  /** Exact token-set (1-gram) Jaccard between consecutive doc pairs —
    * the deterministic n-gram-Jaccard baseline the oracle can recompute
    * (the 3-gram variant runs inside the LSH confirm step). Pairing by
    * doc_id keeps the op linear; all-pairs Jaccard is exactly what the
    * banded LSH exists to avoid. */
  private val tokenJaccard: Q = (s, dir) => {
    // materialize once — both join sides consume this frame
    val t = Barriers.materialize(docs(s, dir)
      .select(col("doc_id"), array_distinct(Text.tokens(col("text"))).as("ts")))
    val a = t.select(col("doc_id"), col("ts").as("ts_a"))
    val b = t.select((col("doc_id") - 1).as("doc_id"), col("ts").as("ts_b"))
    a.join(b, "doc_id")
      .select(col("doc_id"),
        (size(array_intersect(col("ts_a"), col("ts_b"))).cast("double") /
          size(array_union(col("ts_a"), col("ts_b"))).cast("double"))
          .as("jaccard_next"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("jaccard_next") >= 0.5, 1L).otherwise(0L))
          .as("n_similar"),
        max(col("jaccard_next")).as("max_jaccard"),
        min(col("jaccard_next")).as("min_jaccard"))
  }

  /** l19: intra-document repetition filter (the Gopher/RefinedWeb
    * quality-filter family): per-doc duplicate-token and duplicate-
    * 2-gram fractions, rolled up per source as exact integer sums (a
    * micro-averaged rate = ratio of two long sums stays bit-portable
    * where a sum of per-doc double ratios would not) plus a count of
    * docs over the 0.2 duplicate-2-gram threshold. Linear, one narrow
    * pass; tokens materialize below the exchange (shingle-lambda
    * inlining guard, as everywhere). */
  private val repetitionFilter: Q = (s, dir) =>
    docs(s, dir)
      .select(col("source"), Text.tokens(col("text")).as("toks"))
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("source"),
        size(col("toks")).cast("long").as("n_tok"),
        size(array_distinct(col("toks"))).cast("long").as("n_tok_d"),
        Text.shinglesFromTokens("toks", 2).as("gs"))
      .select(col("source"), col("n_tok"), col("n_tok_d"),
        size(col("gs")).cast("long").as("n_2g"),
        size(array_distinct(col("gs"))).cast("long").as("n_2g_d"))
      .withColumn("flagged",
        col("n_2g") > 0 &&
          (lit(1.0) - col("n_2g_d").cast("double") / col("n_2g").cast("double"))
            > 0.2)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("flagged"), 1L).otherwise(0L)).as("n_flagged"),
        sum(col("n_tok") - col("n_tok_d")).as("dup_tokens"),
        sum(col("n_tok")).as("total_tokens"),
        (sum(col("n_2g") - col("n_2g_d")).cast("double") /
          sum(col("n_2g")).cast("double")).as("micro_dup_2gram"))
      .orderBy("source")

  /** l20: PII scrubbing — regex redaction of emails and phone-shaped
    * strings, the anonymization pass every training corpus gets.
    * Deterministic PII is INJECTED first (the synthetic corpus has
    * none), then scrubbed; the output proves totality: occurrences
    * found, redactions applied, zero residual matches. Pure codegen'd
    * regexp projections, linear. */
  // Shared PII regexes, spelled with [.] instead of \. — a backslash
  // inside a Spark SQL string literal is an ESCAPE (so '\.' parses to
  // '.', any-char) while DuckDB keeps it verbatim; the character-class
  // form needs no escaping and parses identically everywhere.
  private val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}"
  private val phoneRe = "555-[0-9]{4}"

  private val piiScrub: Q = (s, dir) => {
    val seeded = docs(s, dir).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" call 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit(""))).as("text"))
    val scrubbed = seeded
      .withColumn("n_emails",
        size(expr(s"regexp_extract_all(text, '$emailRe', 0)")).cast("long"))
      .withColumn("n_phones",
        size(expr(s"regexp_extract_all(text, '$phoneRe', 0)")).cast("long"))
      // expr() like the extract_all counts above — functions.regexp_
      // replace takes the pattern as a RAW literal while expr() routes
      // it through SQL string parsing; mixing the two is safe only
      // while the patterns stay backslash-free, so route everything
      // through one parser.
      .withColumn("clean", expr(
        s"regexp_replace(regexp_replace(text, '$emailRe', '<EMAIL>')," +
          s" '$phoneRe', '<PHONE>')"))
    scrubbed.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("n_emails") > 0, 1L).otherwise(0L)).as("n_docs_email"),
      sum(when(col("n_phones") > 0, 1L).otherwise(0L)).as("n_docs_phone"),
      sum(col("n_emails") + col("n_phones")).as("n_redactions"),
      sum(size(expr(s"regexp_extract_all(clean, '$emailRe', 0)")) +
        size(expr(s"regexp_extract_all(clean, '$phoneRe', 0)")))
        .cast("long").as("n_residual"))
  }

  /** l17: deterministic train/validation/test split — hash-bucket
    * assignment (80/10/10) from the portable mixer over doc_id, the
    * standard reproducible-split pattern (no sampling state, no
    * ordering dependence; a doc's split never changes as the corpus
    * grows). One narrow projection + one small aggregation; the split
    * column itself would normally feed partitionBy on write. */
  private val trainSplit: Q = (s, dir) =>
    docs(s, dir)
      .withColumn("bucket", expr(s"${Text.portableMixWideSql("doc_id + 1")} % 100"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "validation")
          .otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_chars")).cast("long").as("total_chars"))
      .orderBy("split")

  /** l18: benchmark decontamination — the count of corpus documents
    * sharing at least one 8-token shingle with a probe ("benchmark")
    * set, the standard contamination check before training. Probe
    * shingles BROADCAST (a benchmark is small by definition), so the
    * corpus-side shingle stream joins without shuffling; left_semi
    * keeps candidate docs without multiplying rows per matching
    * shingle; the only wide movement is the distinct on contaminated
    * doc_ids. Shingles fold to portable 64-bit hashes at the explode,
    * so both the probe distinct and the semi-join key are longs, never
    * 8-token strings — the oracle replays the identical fold, making
    * any collision shared (counts still agree exactly). */
  def contamination(d: DataFrame, isProbe: Column, n: Int = 8): DataFrame = {
    // Shingle each side from its own FILTERED scan: the probe filter
    // pushes down to the source, so only benchmark docs are tokenized
    // on that side, and the corpus-side shingle explosion runs exactly
    // once (a shared unfiltered shingle frame would re-shingle the
    // full corpus for both join sides — or need a barrier for what a
    // pushed-down filter gives for free).
    def shingles(docs: DataFrame): DataFrame = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), Text.shinglesFromTokens("toks", n).as("shs"))
      .select(col("doc_id"),
        explode(Text.tokenHashesNative(col("shs"))).as("shingle"))
    val probe = shingles(d.filter(isProbe)).select(col("shingle")).distinct()
    shingles(d.filter(!isProbe))
      .join(broadcast(probe), Seq("shingle"), "left_semi")
      .select(col("doc_id")).distinct()
  }

  private val decontamination: Q = (s, dir) => {
    val d = docs(s, dir)
    val contaminated = contamination(d, col("doc_id") < 5)
      .agg(count(lit(1)).as("n_contaminated"))
    val corpus = d.filter(col("doc_id") >= 5)
      .agg(count(lit(1)).as("n_docs"))
    corpus.crossJoin(contaminated)
      .withColumn("contamination_rate",
        col("n_contaminated").cast("double") / col("n_docs").cast("double"))
  }

  // ---- cluster / packing / sampling / LM scoring ---------------------

  /** Shared-shingle candidate edges (a < b) between documents whose
    * common n-shingle is discriminative (df in [minDf, maxDf] — the
    * hub-buster cap). Extracted from [[dedupClusters]] so survivor
    * selection (l34) builds on the identical graph. */
  def shingleEdges(d: DataFrame, n: Int = 8, minDf: Int = 2,
      maxDf: Int = 5): DataFrame = {
    val par = d.sparkSession.sparkContext.defaultParallelism
    val shd = d
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .repartition(par)
      .select(col("doc_id"),
        explode(Text.shinglesFromTokens("toks", n)).as("shingle"))
      .distinct()
    val discriminative = shd.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df").between(minDf, maxDf))
      .select(col("shingle"))
    val shdD = Barriers.materialize(
      shd.join(discriminative, Seq("shingle"), "left_semi"))
    Barriers.materialize(
      shdD.as("x").join(shdD.as("y"), Seq("shingle"))
        .where(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct())
  }

  /** Process-level cache of the default-parameter shingle-edge graph
    * per (session, dir) — l21 and l34 consume the IDENTICAL graph
    * (same dedup-clusters family, same waste shape the
    * [[sharedMinhashCandidates]] cache removed for l07/l67/l68).
    * shingleEdges already materializes, so the cached value replays
    * blocks, not lineage. */
  private val edgeCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def sharedShingleEdges(s: SparkSession, dir: String): DataFrame = {
    graft.core.SessionCaches.prune(edgeCache)
    edgeCache.computeIfAbsent((s, dir), _ => shingleEdges(docs(s, dir)))
  }

  /** l21: near-dup cluster construction — connected components over the
    * shared-shingle candidate graph, the step that turns pairwise
    * near-dup CANDIDATES (l07/l08's output shape) into dedup GROUPS
    * with one survivor each. Transitivity matters: A~B and B~C must
    * collapse to ONE cluster even when A and C share nothing, which no
    * pairwise filter gets right.
    *
    * Edges: [[shingleEdges]] — two docs sharing any discriminative
    * n-shingle (document frequency in [minDf, maxDf]). The df cap is
    * the hub-buster — a boilerplate shingle appearing in thousands of
    * docs would emit C(df,2) edges and weld the corpus into one giant
    * component, so frequent shingles are dropped exactly like stopwords
    * in LSH practice; the cap also bounds the self-join fan-out per
    * shingle at C(maxDf,2), making worst-case edge volume linear in
    * shingles.
    *
    * Components: [[clusterEdges]] — iterative min-label propagation;
    * label(v) starts as doc_id, each round takes the min over v and its
    * neighbors, converging to the component-min in diameter rounds.
    * Each round is one shuffle-join + one partial-agg'd groupBy (both
    * on the narrow (doc_id, label) pairs), barriered so lineage doesn't
    * stack; the convergence probe rides the monotone label-sum (one
    * tiny action per round, no second join). Near-dup components have
    * tiny diameters (dup chains), so rounds stay single-digit at any
    * scale; the driver-side loop is orchestration only — no row data
    * ever reaches the driver. */
  def dedupClusters(d: DataFrame, n: Int = 8, minDf: Int = 2,
      maxDf: Int = 5, maxRounds: Int = 25): DataFrame =
    dedupClustersFrom(d, shingleEdges(d, n, minDf, maxDf), maxRounds)

  /** Variant over a pre-built (possibly process-cached) edge frame. */
  def dedupClustersFrom(d: DataFrame, edges: DataFrame,
      maxRounds: Int = 25): DataFrame = {
    val labels = clusterEdges(edges, maxRounds)

    val comp = labels.groupBy(col("label"))
      .agg(count(lit(1)).as("csize"))
    val compStats = comp.agg(
      coalesce(sum(col("csize")), lit(0L)).cast("long").as("n_edge_docs"),
      count(lit(1)).as("n_edge_clusters"),
      coalesce(max(col("csize")), lit(1L)).as("max_cluster"))
    d.agg(count(lit(1)).as("n_docs"))
      .crossJoin(compStats)
      .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
      .select(
        col("n_docs"),
        (col("n_edge_clusters") + col("n_docs") - col("n_edge_docs"))
          .as("n_clusters"),
        col("max_cluster"),
        (col("n_edge_docs") - col("n_edge_clusters")).as("n_merged_docs"),
        col("n_edges"))
  }

  /** Connected components over an ARBITRARY candidate-pair edge set
    * `(a, b)` — the shared core under [[dedupClusters]], public so any
    * near-dup detector's pairs feed cluster construction: l07's
    * confirmed MinHash candidates, l08's SimHash pairs, or an
    * embedding-similarity join all produce exactly this shape, and
    * turning pairwise candidates into transitive dedup groups is the
    * step every one of them needs next. Returns `(doc_id, label)` for
    * edge nodes only (label = component-min doc_id); callers add
    * singletons back arithmetically. */
  def clusterEdges(edges: DataFrame, maxRounds: Int = 25): DataFrame = {
    val sym = Barriers.materialize(
      edges.union(edges.select(col("b").as("a"), col("a").as("b"))))

    // Only docs that appear in an edge enter the loop — everything else
    // is a singleton cluster by definition and is added back
    // arithmetically at the end. At near-dup rates (a few % of the
    // corpus) this shrinks the iterated frame by orders of magnitude;
    // dragging 100 TB of singletons through every round would dominate
    // the whole job.
    val nodes = sym.select(col("a").as("doc_id")).distinct()
    var labels = Barriers.materialize(
      nodes.select(col("doc_id"), col("doc_id").as("label")))
    var prevSum = Option(labels.agg(sum(col("label"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val nbrMin = sym
        .join(labels.withColumnRenamed("doc_id", "b"), Seq("b"))
        .groupBy(col("a"))
        .agg(min(col("label")).as("nbr_min"))
        .withColumnRenamed("a", "doc_id")
      val relaxed = Barriers.materialize(
        labels.join(nbrMin, Seq("doc_id"), "left")
          .select(col("doc_id"),
            least(col("label"), coalesce(col("nbr_min"), col("label")))
              .as("label")))
      // Pointer jump: label(v) <- label(label(v)). Neighbor relaxation
      // alone converges in O(diameter) rounds; composing a jump
      // squares the propagated distance, making convergence
      // logarithmic — the 25-round cap then covers any component a
      // real corpus can produce instead of only diameter-25 chains.
      // Near-dup graphs almost always converge within two pure-relax
      // rounds, so the jump (an extra self-join) only engages from
      // round 2 — pathological chains pay for it, clean corpora don't.
      // Labels are always ids of edge-nodes (they start as them and
      // min preserves that), so the self-lookup hits; the left join +
      // coalesce is belt-and-braces.
      val next =
        if (round < 2) relaxed
        else Barriers.materialize(
          relaxed.join(
            relaxed.select(col("doc_id").as("label"),
              col("label").as("parent_label")),
            Seq("label"), "left")
            .select(col("doc_id"),
              coalesce(col("parent_label"), col("label")).as("label")))
      val newSum = Option(next.agg(sum(col("label"))).head().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      converged = newSum == prevSum
      prevSum = newSum
      labels = next
      round += 1
    }
    require(converged, s"label propagation did not converge in $maxRounds")
    labels
  }

  private val dedupClustersQ: Q = (s, dir) =>
    dedupClustersFrom(docs(s, dir), sharedShingleEdges(s, dir))

  /** l34: quality-aware survivor selection — which copy a dedup KEEPS.
    * Min-id survivorship (l05/l21) is arbitrary; a curation pipeline
    * keeps the best copy: per near-dup cluster, the document with the
    * highest alpha-ratio quality (ties → lowest doc_id — total order,
    * so the survivor set is deterministic in both engines; the ratio
    * compare is the same IEEE division l30 ranks by). Clusters come
    * from the identical shingle graph as l21 ([[shingleEdges]] +
    * [[clusterEdges]]); singletons survive trivially via the left
    * join. `n_upgrades` counts clusters where quality actually
    * changed the pick vs min-id — the measurable value of this
    * operator over naive survivorship. Scale shape: the quality score
    * is a narrow per-row projection; survivor ranking is one window
    * over (label) — cluster-sized partitions, never corpus-sized. */
  def qualitySurvivors(d: DataFrame): DataFrame =
    qualitySurvivorsFrom(d, shingleEdges(d))

  /** Variant over a pre-built (possibly process-cached) edge frame. */
  def qualitySurvivorsFrom(d: DataFrame, edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labels = clusterEdges(edges)
    // empty text guard: 0.0/0.0 is NaN in Spark (which sorts ABOVE
    // every number — an empty doc would win its cluster) but NULL in
    // DuckDB (which sorts last) — pin both engines to the same worst
    // score explicitly
    val quality = d.select(col("doc_id"), col("source"),
      when(length(col("text")) === 0, lit(-1.0))
        .otherwise(
          length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("double") /
            length(col("text")).cast("double")).as("q"))
    val labeled = quality.join(labels, Seq("doc_id"), "left")
      .withColumn("label", coalesce(col("label"), col("doc_id")))
    val ranked = labeled
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("label"))
          .orderBy(col("q").desc, col("doc_id"))))
      .withColumn("min_id",
        min(col("doc_id")).over(Window.partitionBy(col("label"))))
    ranked.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("rn") === 1 && col("doc_id") =!= col("min_id"), 1L)
          .otherwise(0L)).as("n_upgrades"))
      .orderBy("source")
  }

  private val qualitySurvivorsQ: Q = (s, dir) =>
    qualitySurvivorsFrom(docs(s, dir), sharedShingleEdges(s, dir))

  /** l22: sequence packing — the concat-and-chunk step that turns a
    * filtered corpus into fixed-length training sequences. Documents
    * are concatenated in doc_id order WITHIN each source shard and cut
    * every seqLen tokens; the output is the per-shard packing ledger
    * (sequences produced, docs straddling a cut, tail padding).
    * Per-source windows keep every shard independent — the global
    * variant would serialize the corpus through one partition, and
    * real pipelines pack per shard precisely so this stays
    * embarrassingly parallel. One narrow projection + one windowed
    * cumsum + one agg; nothing wide ever moves. */
  private val seqPacking: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val seqLen = 512
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs(s, dir)
      .select(col("source"), col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("first_chunk", expr(s"cum_before div $seqLen"))
      .withColumn("last_chunk",
        expr(s"(cum_before + n_tok - 1) div $seqLen"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("total_tokens"),
        sum(when(col("last_chunk") > col("first_chunk"), 1L).otherwise(0L))
          .cast("long").as("n_split_docs"))
      .withColumn("n_sequences",
        expr(s"(total_tokens + ${seqLen - 1}) div $seqLen"))
      .withColumn("tail_padding",
        col("n_sequences") * seqLen - col("total_tokens"))
      .orderBy(col("source"))
  }

  /** Shared stratum spec for l23 and the l25 composition — the target
    * per-mille rate by source tier and the deterministic keep-bucket,
    * ONE spelling per engine so a rate or seed change can't silently
    * desynchronize the standalone sampler from the composed pipeline
    * (or either from its oracle). */
  private val targetPermilleSql =
    """CASE CAST(substring(source, 4, 8) AS INT) % 3
      |  WHEN 0 THEN 200 WHEN 1 THEN 500 ELSE 900 END""".stripMargin
  private val oTargetPermilleSql =
    """CASE CAST(substr(source, 4, 8) AS INT) % 3
      |      WHEN 0 THEN 200 WHEN 1 THEN 500 ELSE 900 END""".stripMargin
  private val sampleBucketSql =
    s"${Text.portableMixWideSql("doc_id * 13 + 7")} % 1000"
  private def oSampleBucketSql =
    s"${Text.oPortableMixWideSql("doc_id * 13 + 7")} % 1000"

  /** l23: stratified sampling to a target mix — the data-mixing step
    * that up/down-weights sources (web vs wiki vs code) before
    * training. Keep/drop is a pure hash of doc_id against the
    * stratum's per-mille rate: deterministic, rerunnable, no sampling
    * state, and a doc's fate never changes as the corpus grows (same
    * contract as l17's split). One narrow projection + one agg. */
  private val stratifiedSample: Q = (s, dir) =>
    docs(s, dir)
      .withColumn("target_permille", expr(targetPermilleSql))
      .withColumn("bucket", expr(sampleBucketSql))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        max(col("target_permille")).as("target_permille"),
        sum(when(col("bucket") < col("target_permille"), 1L).otherwise(0L))
          .cast("long").as("n_sampled"))
      .withColumn("achieved_rate",
        col("n_sampled").cast("double") / col("n_docs").cast("double"))
      .orderBy(col("source"))

  /** l24: bigram-LM commonness scoring — fit a corpus-wide bigram
    * count model, then score every document by how common its bigrams
    * are (total corpus occurrences of the doc's bigrams / doc bigram
    * count). The two-pass fit-then-score shape is the same data flow a
    * real KenLM-style perplexity filter runs; counts stay integers end
    * to end so the oracle is exact (a log-prob variant is one
    * non-oracle-able `ln` away). The model fit is one hash agg on the
    * bigram; scoring re-joins on the bigram — at 100 TB you'd prune
    * the model to its top-K rows and broadcast it, turning the scoring
    * join map-side. */
  private val bigramCommonness: Q = (s, dir) => {
    val par = s.sparkContext.defaultParallelism
    // Aggregate BEFORE the shuffle (guide §2.3): the former plan
    // materialized every bigram OCCURRENCE and joined all of them
    // against the model; the per-(bigram, source) count frame is the
    // narrowest state that still answers both the model fit (cnt(bg) =
    // Σ_source k) and the scoring rollup (n_bigrams = Σ k, total_hits
    // = Σ k·cnt) exactly, so the occurrence rows never enter a join —
    // only distinct-bigram-scale rows shuffle. Integer arithmetic
    // unchanged; the oracle is the same SQL.
    val bs = Barriers.materialize(
      docs(s, dir)
        .select(col("source"), col("doc_id"), Text.tokens(col("text")).as("toks"))
        .repartition(par)
        .select(col("source"),
          explode(Text.shinglesFromTokens("toks", 2)).as("bg"))
        .groupBy(col("bg"), col("source")).agg(count(lit(1)).as("k")))
    val model = bs.groupBy(col("bg")).agg(sum(col("k")).as("cnt"))
    bs.join(model, Seq("bg"))
      .groupBy(col("source"))
      .agg(
        sum(col("k")).cast("long").as("n_bigrams"),
        sum(col("k") * col("cnt")).cast("long").as("total_hits"))
      .withColumn("commonness",
        col("total_hits").cast("double") / col("n_bigrams").cast("double"))
      .orderBy(col("source"))
  }

  /** l25: the composed curation pipeline — the end-to-end recipe the
    * individual operators exist for, as ONE declarative flow:
    *
    *   raw docs → repetition/length quality filter (l19's rule)
    *            → exact-dedup survivors among the keepers (l05's rule)
    *            → stratified sample to the target mix (l23's rule)
    *            → per-source packing ledger (l22's math)
    *
    * Output: one funnel row per source with the document count after
    * every stage plus the packed-sequence yield of the survivors.
    *
    * Scale shape: the per-doc stage predicates (quality, sample) are
    * narrow codegen'd projections on ONE scan; survivorship is one
    * shuffle on the 128-bit fingerprint (the text never moves); the
    * funnel is one partial-agg'd groupBy on source. Nothing in the
    * composition costs more than its standalone operator — the point
    * of declaring the whole recipe in one plan instead of four jobs
    * with three materialized intermediates. */
  private val curationPipeline: Q = (s, dir) => {
    val seqLen = 512
    val scored = docs(s, dir)
      .select(col("source"), col("doc_id"),
        Text.tokens(col("text")).as("toks"), Text.norm(col("text")).as("norm"))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("grams", Text.shinglesFromTokens("toks", 2))
      .withColumn("n_2g", size(col("grams")).cast("long"))
      .withColumn("n_2g_d", size(array_distinct(col("grams"))).cast("long"))
      .withColumn("dup_frac",
        when(col("n_2g") === 0, lit(0.0))
          .otherwise(lit(1.0) -
            col("n_2g_d").cast("double") / col("n_2g").cast("double")))
      .withColumn("quality_ok",
        col("n_tok") >= 10 && col("dup_frac") <= 0.2)
      .withColumn("fp", md5(col("norm")))
      .withColumn("target_permille", expr(targetPermilleSql))
      .withColumn("sample_ok",
        expr(sampleBucketSql) < col("target_permille"))
      .drop("toks", "norm", "grams")
    val survivors = scored.filter(col("quality_ok"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("survivor_id"))
    scored.join(survivors, Seq("fp"), "left")
      .withColumn("is_survivor",
        col("quality_ok") && col("doc_id") === col("survivor_id"))
      .withColumn("is_sampled", col("is_survivor") && col("sample_ok"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_input"),
        sum(when(col("quality_ok"), 1L).otherwise(0L)).cast("long")
          .as("n_quality"),
        sum(when(col("is_survivor"), 1L).otherwise(0L)).cast("long")
          .as("n_unique"),
        sum(when(col("is_sampled"), 1L).otherwise(0L)).cast("long")
          .as("n_sampled"),
        sum(when(col("is_sampled"), col("n_tok")).otherwise(0L)).cast("long")
          .as("sampled_tokens"))
      .withColumn("n_sequences",
        expr(s"(sampled_tokens + ${seqLen - 1}) div $seqLen"))
      .orderBy(col("source"))
  }

  /** l26: incremental dedup — dedup an INCOMING batch against the
    * accumulated corpus, the daily-ingestion flow the batch operators
    * don't show (l05 dedups a corpus against itself; a pipeline
    * ingesting 100 TB/day dedups each day against the fingerprint
    * index of everything before it). Docs below the split stand in for
    * the historical corpus, the rest for today's batch. Two checks in
    * one plan: the within-batch distinct-fingerprint count (survivor
    * IDENTITY — min-doc-id — is l05's job; here only cardinality
    * matters) and the anti-join against the historical index. The
    * index side carries
    * ONLY the 128-bit fingerprint — at scale that's the persisted
    * index you merge daily, 16 bytes per historical doc, never the
    * text. */
  private val incrementalDedup: Q = (s, dir) => {
    val split = 400L
    val d = docs(s, dir)
      .select(col("doc_id"), md5(Text.norm(col("text"))).as("fp"))
    val index = d.filter(col("doc_id") < split).select(col("fp")).distinct()
    val incoming = d.filter(col("doc_id") >= split)
    val batchUnique = incoming.select(col("fp")).distinct()
    incoming.agg(count(lit(1)).as("n_incoming"))
      .crossJoin(batchUnique.agg(count(lit(1)).as("n_batch_unique")))
      .crossJoin(batchUnique.join(index, Seq("fp"), "left_anti")
        .agg(count(lit(1)).as("n_new")))
  }

  // ---- multimodal ----------------------------------------------------

  /** l35: frame sampling over the media payloads — the byte-level
    * slicing is [[Multimodal.frameSample]]; the oracle replays the
    * frame arithmetic in closed form over octet lengths (all frames
    * are full except a possibly-partial LAST frame, which is sampled
    * iff its index lands on the stride). */
  private val frameSampling: Q = (s, dir) =>
    Multimodal.frameSample(s,
        Multimodal.asMedia(docs(s, dir)))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_frames")).cast("long").as("total_frames"),
        sum(col("n_sampled")).cast("long").as("total_sampled"),
        sum(col("sampled_bytes")).cast("long").as("total_sampled_bytes"))

  /** l69: REAL media decode under the oracle — even doc_ids carry a
    * planted binary-PPM image (dimensions and pixel bytes closed-form
    * in doc_id), odd ids a PCM16 RIFF/WAVE payload; the per-partition
    * stage runs the actual header-walk decoders
    * ([[Multimodal.decodePpm]]/[[Multimodal.decodeWav]]) and the
    * DuckDB oracle replays the pixel/sample arithmetic without ever
    * seeing a byte — a mis-parsed width, a channel-order slip, or an
    * endianness bug in the sample walk each shifts a checksum and
    * fails the hash compare. Payload construction AND decode both
    * live in one mapPartitions pass, so nothing but the final
    * per-modality stat rows ever shuffles. */
  private val mediaDecode: Q = (s, dir) => {
    import s.implicits._
    val media = docs(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val bytes =
          if (id % 2 == 0) {
            val w = 4 + (id % 5).toInt
            val h = 3 + (id % 3).toInt
            Multimodal.encodePpm(w, h, j => ((id * 31 + j) % 256).toInt)
          } else {
            val n = 64 + (id % 33).toInt
            Multimodal.encodeWav(8000, Array.tabulate(n)(i =>
              ((id * 7 + i) % 2048 - 1024).toShort))
          }
        (id, bytes)
      }).toDF("doc_id", "media_bytes")
    Multimodal.decode(s, media)
      .select(col("modality"),
        when(col("modality") === "image",
          element_at(col("feature"), 1) * element_at(col("feature"), 2))
          .otherwise(element_at(col("feature"), 3))
          .cast("long").as("units"),
        when(col("modality") === "image",
          element_at(col("feature"), 3) + element_at(col("feature"), 4) +
            element_at(col("feature"), 5))
          .otherwise(element_at(col("feature"), 4))
          .cast("long").as("checksum"))
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("units")).cast("long").as("total_units"),
        sum(col("checksum")).cast("long").as("total_checksum"))
      .orderBy("modality")
  }

  /** l100: image resize — the preprocessing step between l69's decode
    * and any fixed-input vision encoder: every planted P6 image
    * (arbitrary 5-11 × 4-8 source sizes, NOT factor-aligned) is
    * box-filter downsampled by [[Multimodal.resizeBoxGray]] to a 4×3
    * grayscale thumbnail via the exact integer block partition (each
    * source pixel contributes to exactly one target block; block
    * average is floor division over the block area). The checked
    * output is the per-(w, h)-class count and the positionally
    * weighted thumbnail checksum Σ (t+1)·v_t — weights catch a
    * transposed or mis-partitioned kernel that an unweighted sum
    * would mask. The DuckDB oracle replays header-to-thumbnail
    * arithmetic in closed form over the planted pixel function, so a
    * mis-walked block boundary diverges instead of passing vacuously.
    *
    * 100 TB shape: resize is per-row narrow compute on the scan
    * partitioning (mapPartitions, no shuffle of image bytes); only
    * the (w, h, checksum) feature row moves, and the rollup is
    * size-class-sized. */
  private val imageResize: Q = (s, dir) => {
    import s.implicits._
    docs(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 5 + (id % 7).toInt
        val h = 4 + (id % 5).toInt
        val bytes = Multimodal.encodePpm(w, h,
          j => ((id * 31 + j) % 256).toInt)
        val thumb = Multimodal.resizeBoxGray(bytes, 4, 3).get
        val checksum = thumb.zipWithIndex
          .map { case (v, t) => (t + 1).toLong * v }.sum
        (id, w.toLong, h.toLong, checksum)
      }).toDF("doc_id", "w", "h", "thumb_checksum")
      .groupBy(col("w"), col("h"))
      .agg(count(lit(1)).as("n_images"),
        sum(col("thumb_checksum")).as("sum_checksum"))
      .orderBy("w", "h")
  }

  /** l70: frame sampling FEEDING the real decoder — each doc carries a
    * video-style payload of `2 + doc_id % 7` fixed-size frames, every
    * frame itself a complete 4×2 binary PPM (35 bytes: 11 header + 24
    * RGB). [[Multimodal.frameSampleDecode]] slices the byte stream,
    * keeps every 2nd frame, and PPM-decodes exactly the kept ones —
    * sampling before decode, the economy the stage exists for. The
    * oracle replays sampled-frame indices and their pixel sums in
    * closed form; n_decoded ≡ n_sampled here because every planted
    * frame is complete, and THAT equality is itself oracle-checked
    * (a slicing bug that hands the decoder a short or misaligned
    * frame breaks it). */
  private val videoFrameDecode: Q = (s, dir) => {
    import s.implicits._
    val media = docs(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val nf = 2 + (id % 7).toInt
        val bytes = (0 until nf).toArray.flatMap(f =>
          Multimodal.encodePpm(4, 2,
            j => ((id * 13 + f * 97 + j) % 256).toInt))
        (id, bytes)
      }).toDF("doc_id", "media_bytes")
    Multimodal.frameSampleDecode(s, media, frameBytes = 35, every = 2)
      .agg(count(lit(1)).as("n_items"),
        sum(col("n_frames")).cast("long").as("total_frames"),
        sum(col("n_sampled")).cast("long").as("total_sampled"),
        sum(col("n_decoded")).cast("long").as("total_decoded"),
        sum(col("checksum")).cast("long").as("total_checksum"))
  }

  /** l84: content-level media dedup — the multimodal analog of text
    * normalization-before-fingerprint: every planted payload is
    * byte-level UNIQUE (8 trailing id bytes the netpbm grammar
    * ignores), but only 16 distinct decoded images exist (header +
    * raster fully determined by doc_id mod 16). A byte-md5 dedup
    * finds nothing; deduping on the DECODED content signature
    * (dims + exact channel sums from the real header-walk decoder)
    * collapses the corpus 16-fold. That gap — n_distinct_bytes vs
    * n_distinct_content — is the operator's output, and is exactly
    * why image pipelines hash pixels, not files. One mapPartitions
    * pass plants, fingerprints, and decodes; only two fingerprint
    * strings per item shuffle. Oracle: construction + decode
    * arithmetic replayed in closed form over doc_id (l69's
    * discipline — DuckDB never sees a byte). */
  private val mediaContentDedup: Q = (s, dir) => {
    import s.implicits._
    val sigs = docs(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val g = (id % 16).toInt
        val w = 4 + (g % 5); val h = 3 + (g % 3)
        val img = Multimodal.encodePpm(w, h, j => g * 31 + j)
        val junk = java.nio.ByteBuffer.allocate(8).putLong(id).array()
        val bytes = img ++ junk
        val fp = java.security.MessageDigest.getInstance("MD5")
          .digest(bytes).map("%02x".format(_)).mkString
        val d = Multimodal.decodePpm(bytes).get
        (id, fp, s"${d.width},${d.height},${d.rSum},${d.gSum},${d.bSum}")
      }).toDF("doc_id", "byte_fp", "content_sig")
    sigs.agg(
        count(lit(1)).as("n_items"),
        countDistinct(col("byte_fp")).as("n_distinct_bytes"),
        countDistinct(col("content_sig")).as("n_distinct_content"))
      .withColumn("content_dup_permille",
        expr("(1000 * (n_items - n_distinct_content)) div n_items"))
  }

  /** l94: perceptual near-dup image detection — the third rung of the
    * media-dedup ladder after byte-md5 (finds nothing here) and l84's
    * decoded-content signature (collapses exact pixel copies): the
    * classic average hash (aHash). Each 9×7 planted image is one of 16
    * base patterns under a per-doc BRIGHTNESS shift — different bytes,
    * different pixels, same picture to a human. aHash thresholds each
    * gray pixel against the image's own mean (spelled as the exact
    * integer cross-multiplication `63·px > Σpx`, so a uniform shift c
    * moves both sides by 63·c and every bit is provably invariant) and
    * packs 63 bits into a long; the hash collapses the corpus to the
    * 16 base patterns that content-md5 CANNOT see — why image dedup
    * pipelines hash perceptually, not exactly. Hamming-banded
    * candidate joins for near-miss hashes are the l08 simhash
    * machinery, unchanged — this operator is the image-side signature
    * feeding it.
    *
    * One mapPartitions pass plants, fingerprints, decodes (the REAL
    * header walk — [[Multimodal.decodePpmGray]]), and hashes; only
    * (id, two fingerprint strings, one long) ever shuffles. The sigs
    * frame is rebuilt by its two consumers (totals + cluster max) —
    * cheaper than a checkpoint barrier at any scale since the
    * construction is one arithmetic pass over ids. Oracle: pixel
    * construction AND the mean-threshold bit pack replayed in closed
    * form over doc_id (l69's discipline — DuckDB never sees a byte). */
  private val perceptualImageDedup: Q = (s, dir) => {
    import s.implicits._
    val sigs = docs(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val g = (id % 16).toInt
        val c = ((id / 16) % 24).toInt
        val v = Array.tabulate(63)(p => (g * 37 + p * 53) % 180 + c)
        val img = Multimodal.encodePpm(9, 7, j => v(j / 3))
        val junk = java.nio.ByteBuffer.allocate(8).putLong(id).array()
        val bytes = img ++ junk
        val fp = java.security.MessageDigest.getInstance("MD5")
          .digest(bytes).map("%02x".format(_)).mkString
        val (w, h, px) = Multimodal.decodePpmGray(bytes).get
        val sum = px.map(_.toLong).sum
        var hash = 0L
        var p = 0
        while (p < px.length) {
          if (63L * px(p) > sum) hash |= 1L << p
          p += 1
        }
        (id, fp, s"$w,$h,$sum", hash)
      }).toDF("doc_id", "byte_fp", "content_sig", "phash")
    val totals = sigs.agg(
      count(lit(1)).as("n_items"),
      countDistinct(col("byte_fp")).as("n_distinct_bytes"),
      countDistinct(col("content_sig")).as("n_distinct_content"),
      countDistinct(col("phash")).as("n_distinct_phash"))
    val maxCluster = sigs.groupBy(col("phash"))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("max_phash_cluster"))
    totals.crossJoin(maxCluster)
      .withColumn("phash_dup_permille",
        expr("(1000 * (n_items - n_distinct_phash)) div n_items"))
  }

  /** l12: multimodal column plumbing: media as an opaque binary column
    * + typed metadata struct; byte-level stats are checked against the
    * oracle. The decode kernel the plumbing feeds is the REAL
    * header-walk decoder pair exercised by l69/l70. */
  private val multimodalStats: Q = (s, dir) =>
    Multimodal.asMedia(docs(s, dir), carry = Seq("source"))
      .select(col("source"),
        octet_length(col("media_bytes")).cast("long").as("n_bytes"),
        col("media_meta"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        max(col("n_bytes")).as("max_bytes"))
      .orderBy("source")

  /** l47: behavioral sequence-example construction — turn the event
    * stream into (context → next-event) training pairs, the dataset
    * builder for next-action prediction models: per user, each event
    * is labeled with the 3 events that preceded it, then the corpus of
    * examples is summarized as (context, label) counts with a
    * deterministic top-20. The (ts, event_id) ordering key makes the
    * sequence total (simultaneous events can't swap between runs or
    * engines).
    *
    * 100 TB shape: one shuffle on user_id; the lag window sorts WITHIN
    * each user's partition slice (bounded by per-user history, never
    * global); the example vocabulary (|event types|⁴) is tiny, so the
    * final agg is map-side collapsed. */
  private val sequenceExamples: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    T.load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("p1", lag(col("event_type"), 1).over(w))
      .withColumn("p2", lag(col("event_type"), 2).over(w))
      .withColumn("p3", lag(col("event_type"), 3).over(w))
      .filter(col("p3").isNotNull)
      .withColumn("context",
        concat_ws(">", col("p3"), col("p2"), col("p1")))
      .groupBy(col("context"), col("event_type").as("label"))
      .agg(count(lit(1)).as("n_examples"))
      .orderBy(col("n_examples").desc, col("context"), col("label"))
      .limit(20)
  }

  /** l48: deterministic class balancing of a labeled embedding set —
    * downsample every class to the scarcest class's size by ranking
    * members on the portable doc-hash and keeping the first min-count
    * of each (the label-balance step before classifier / probe
    * training). The kept MEMBERSHIP is pinned by the id-sum checksum,
    * not just the counts, and replays in DuckDB because the rank key
    * is the portable mixer.
    *
    * 100 TB shape: one shuffle on label; the rank sorts within each
    * class partition. Exact equal-count balance inherently ranks per
    * class — when a class no longer fits a partition's sort budget,
    * the rate-based keep (l23's threshold hash, no ranking) is the
    * approximate fallback; this operator is the exact contract. */
  private val classBalance: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val e = T.load(s, dir, "embeddings").select(col("vec_id"), col("label"))
    val minc = e.groupBy(col("label")).agg(count(lit(1)).as("n_class"))
      .agg(min(col("n_class")).as("min_class"))
    val ranked = e
      .withColumn("r", row_number().over(
        Window.partitionBy(col("label"))
          .orderBy(expr(Text.portableMixWideSql("vec_id * 7 + 3")),
            col("vec_id"))))
    ranked.crossJoin(broadcast(minc))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_class"),
        sum(when(col("r") <= col("min_class"), 1L).otherwise(0L))
          .as("n_kept"),
        sum(when(col("r") <= col("min_class"), col("vec_id"))
          .otherwise(0L)).cast("long").as("kept_id_sum"))
      .orderBy("label")
  }

  /** l53: BPE merge-pair counting — the first iteration of byte-pair-
    * encoding tokenizer training: count adjacent character pairs across
    * the corpus, weighted by word frequency, and rank the top merges.
    * l24 counts word bigrams (an LM statistic); this counts CHAR pairs
    * inside words (a vocabulary-induction statistic) — the two are
    * different operators.
    *
    * Scale shape: the only corpus-sized pass is tokenize → explode →
    * word count (map-side partial aggregation). The pair explosion
    * runs over the DISTINCT vocabulary — sublinear in corpus size
    * (Heaps' law), which is exactly how production BPE trainers stay
    * tractable at 100 TB: they count words once, then iterate merges
    * over the weighted vocabulary. Top-k plans as
    * TakeOrderedAndProject. */
  private val bpePairCounts: Q = (s, dir) => {
    val words = docs(s, dir)
      .select(explode(expr(
        "regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n_word"))
      .filter(length(col("word")) >= 2)
    words
      .select(col("n_word"), explode(expr(
        """transform(sequence(0, length(word) - 2),
          |  i -> substring(word, i + 1, 2))""".stripMargin)).as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("n_word")).as("n_pair"))
      .orderBy(desc("n_pair"), col("pair"))
      .limit(20)
  }

  /** l73: BPE merge APPLICATION — the iteration l53 only counts.
    * Two tokenizer-training steps run end to end: count weighted
    * adjacent symbol pairs over the distinct vocabulary, pick the top
    * merge (count desc, then lexicographic — and only pairs with
    * left ≠ right: equal-symbol occurrences can overlap, making
    * "replace all" ambiguous, while for left ≠ right two matches can
    * never share a position, so the closed-form rewrite below is
    * exact), apply it everywhere, and repeat on the merged vocabulary.
    * Output: one audit row per step — the merge chosen, its weighted
    * count, and the corpus symbol total before/after (all integers).
    *
    * The merge rewrite is pure index arithmetic (no sequential scan):
    * drop every position whose PREDECESSOR starts a match, then map
    * surviving match-starts to the fused symbol. Both engines run the
    * same two lambdas, so merged vocabularies are identical.
    *
    * Scale shape: the corpus-sized pass is word counting, done ONCE
    * and materialized ([[graft.core.Barriers]]); both merge steps then
    * iterate over the weighted DISTINCT vocabulary (Heaps-law
    * sublinear — the reason production BPE trainers scale). The top
    * pair returns to the driver as ONE row per step (the k-means
    * model-traffic argument) and re-enters the plan as literals. */
  /** The closed-form BPE merge rewrite for pair (x, y), x ≠ y: drop
    * every position whose predecessor starts a match, fuse surviving
    * match-starts. Exact for x ≠ y because matches cannot overlap
    * (two adjacent match-starts would force y = x). Public for the
    * LlmSpec overlap-pattern tests. */
  def bpeMergeSql(symsCol: String, x: String, y: String): String =
    s"""transform(
       |  filter(sequence(0, size($symsCol) - 1),
       |    i -> NOT (i > 0 AND $symsCol[i] = '$y'
       |              AND $symsCol[i - 1] = '$x')),
       |  i -> IF($symsCol[i] = '$x' AND i < size($symsCol) - 1
       |          AND $symsCol[i + 1] = '$y', '$x$y', $symsCol[i]))"""
      .stripMargin

  private val bpeMergeApply: Q = (s, dir) => {
    import s.implicits._
    val vocab0 = Barriers.materialize(docs(s, dir)
      .select(explode(expr(
        "regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n_word"))
      .filter(length(col("word")) >= 2)
      .select(col("n_word"), expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))")
        .as("syms")))

    def step(vocab: DataFrame): (String, String, Long, DataFrame) = {
      val top = vocab
        .select(col("n_word"), explode(expr(
          """transform(sequence(0, size(syms) - 2),
            |  i -> struct(syms[i] AS l, syms[i + 1] AS r))""".stripMargin))
          .as("p"))
        .filter(col("p.l") =!= col("p.r"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n_word")).as("n_pair"))
        .orderBy(desc("n_pair"), col("l"), col("r"))
        .limit(1).collect()(0)
      val (x, y, n) = (top.getString(0), top.getString(1), top.getLong(2))
      val merged = vocab.select(col("n_word"),
        expr(bpeMergeSql("syms", x, y)).as("syms"))
      (x, y, n, merged)
    }

    def symTotal(v: DataFrame): Long =
      v.agg(sum(col("n_word") * size(col("syms")))).head().getLong(0)

    val t0 = symTotal(vocab0)
    val (x1, y1, n1, vocab1m) = step(vocab0)
    val vocab1 = Barriers.materialize(vocab1m)
    val t1 = symTotal(vocab1)
    val (x2, y2, n2, vocab2) = step(vocab1)
    val t2 = symTotal(vocab2)
    Seq(
      (1L, x1, y1, n1, t0, t1),
      (2L, x2, y2, n2, t1, t2))
      .toDF("step", "pair_l", "pair_r", "n_pair",
        "syms_before", "syms_after")
      .orderBy("step")
  }

  /** l54: order-independent dataset checksum — a content fingerprint
    * for reproducibility audits ("is the corpus you trained on
    * bit-identical to mine?"). Each doc hashes to one 62-bit portable
    * value over (doc_id, normalized text); per-source XOR-folds of two
    * independent mixes plus the count form the checksum.
    *
    * XOR is the aggregation for this job at 100 TB: commutative and
    * associative (no global sort, any partitioning, map-side partial),
    * CANNOT overflow no matter the row count (a modular SUM would need
    * mid-aggregate reduction Spark can't express declaratively), and
    * any single-row change flips the fold. Two independent mixes guard
    * the classic XOR blind spot (a pair of identical rows cancelling):
    * doc_id participates in the hash, so true duplicate ROWS differ.
    * Portable arithmetic end to end — DuckDB recomputes the identical
    * checksums, which is the point: the fingerprint must be
    * engine-independent to certify a corpus across stacks. */
  private val datasetChecksum: Q = (s, dir) => {
    val d = docs(s, dir)
      .withColumn("h", Text.portableHash(Text.norm(col("text"))))
      .withColumn("fp1",
        expr(Text.portableMixWideSql("h * 31 + pmod(doc_id, 2147483647)")))
      .withColumn("fp2",
        expr(Text.portableMixWideSql("h * 37 + pmod(doc_id, 2147483647) + 17")))
    d.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        expr("bit_xor(fp1)").as("xor_fp1"),
        expr("bit_xor(fp2)").as("xor_fp2"))
      .orderBy("source")
  }

  /** l56: sharded-export manifest — the LAST step of a curation
    * pipeline: assign every document to one of 16 output shards by a
    * portable hash (so any engine reproduces the same shard
    * membership), and emit the manifest a training job consumes:
    * per-shard doc count, token count, and content checksum (the l54
    * XOR fold scoped per shard). Hash sharding is what balances
    * shards WITHOUT a global sort or size accounting pass — the
    * manifest's count spread is the check that it worked.
    *
    * 100 TB shape: one narrow projection (hash, token count, doc
    * fingerprint) then one 16-group aggregate with map-side partials;
    * the actual sharded WRITE is `partitionBy("shard")` on exactly
    * this column — d14/d18 prove that path; this query is its
    * manifest. */
  private val shardManifest: Q = (s, dir) => {
    val nShards = 16
    docs(s, dir)
      .withColumn("shard",
        expr(s"pmod(${Text.portableMixWideSql(s"doc_id * 11 + 5")}, $nShards)"))
      .withColumn("n_bpe", Text.bpeTokenCount(col("text")).cast("long"))
      .withColumn("h", Text.portableHash(Text.norm(col("text"))))
      .withColumn("fp",
        expr(Text.portableMixWideSql("h * 31 + pmod(doc_id, 2147483647)")))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bpe")).as("n_tokens"),
        expr("bit_xor(fp)").as("shard_checksum"))
      .orderBy("shard")
  }

  /** Power-of-2 length buckets, descending (2^20 … 1) — one list
    * generates both the Spark CASE chain and the oracle's. */
  private val lengthBuckets: Seq[Long] = (0 to 20).map(1L << _).reverse

  /** l57: sequence-length histogram — the batch-shape audit run before
    * every training job: per source, doc counts and token mass in
    * power-of-2 length buckets, plus exact p50/p95/max token counts.
    * This is what picks max_seq_len and predicts packing efficiency
    * (l22): the p95-vs-bucket-mass tradeoff says how much of the
    * corpus a given context length truncates and how much padding a
    * given bucket mix costs. Percentiles use the value-domain
    * construction (x15): cumulative counts over DISTINCT lengths with
    * a pure-integer rank, never a corpus sort. Bucketing is an exact
    * integer CASE chain — no float log2, whose last-bit disagreement
    * at exact powers of two would flip a bucket.
    *
    * 100 TB shape: one tokenize pass feeds two map-side-combined
    * aggregates over (source × value-domain) rows; the join back is
    * |sources|-sized. */
  private val lengthHistogram: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val base = docs(s, dir)
      .select(col("source"),
        Text.bpeTokenCount(col("text")).cast("long").as("n_tok"))
    val bucket = lengthBuckets.tail
      .foldLeft(when(col("n_tok") >= lengthBuckets.head,
        lit(lengthBuckets.head))) { (w, p) =>
        w.when(col("n_tok") >= p, lit(p))
      }.otherwise(lit(0L))
    val wSrc = Window.partitionBy("source")
    val perSource = base.groupBy(col("source"), col("n_tok"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wSrc.orderBy("n_tok")))
      .withColumn("n", sum(col("c")).over(wSrc))
      .groupBy(col("source"))
      .agg(
        min(when(col("cum") >= expr("(n + 1) div 2"), col("n_tok")))
          .as("p50_tok"),
        min(when(col("cum") >= expr("(19*n + 19) div 20"), col("n_tok")))
          .as("p95_tok"),
        max(col("n_tok")).as("max_tok"))
    base.groupBy(col("source"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"))
      .join(perSource, Seq("source"))
      .orderBy("source", "bucket")
  }

  val queries: Map[String, Q] = Map(
    "l57_length_histogram" -> lengthHistogram,
    "l53_bpe_pairs" -> bpePairCounts,
    "l73_bpe_merge_apply" -> bpeMergeApply,
    "l54_dataset_checksum" -> datasetChecksum,
    "l56_shard_manifest" -> shardManifest,
    "l47_sequence_examples" -> sequenceExamples,
    "l48_class_balance" -> classBalance,
    "l01_text_stats" -> textStats,
    "l02_quality_score" -> qualityScore,
    "l03_langid" -> langId,
    "l93_label_agreement" -> labelAgreement,
    "l04_token_count" -> tokenCount,
    "l05_exact_dedup" -> exactDedup,
    "l06_fingerprints" -> fingerprints,
    "l07_minhash_neardup" -> minhashNearDedup,
    "l08_simhash_neardup" -> simhashNearDedup,
    "l09_cosine_topk" -> cosineTopK,
    "l10_embedding_neardup" -> embeddingNearDup,
    "l11_ann_buckets" -> annBuckets,
    "l12_multimodal_stats" -> multimodalStats,
    "l35_frame_sampling" -> frameSampling,
    "l69_media_decode" -> mediaDecode,
    "l100_image_resize" -> imageResize,
    "l84_media_content_dedup" -> mediaContentDedup,
    "l94_perceptual_dedup" -> perceptualImageDedup,
    "l98_setsim_join" -> setSimJoin,
    "l99_dedup_weighting" -> dedupWeightingQ,
    "l70_video_frame_decode" -> videoFrameDecode,
    "l13_token_jaccard" -> tokenJaccard,
    "l14_ivf_index" -> ivfIndex,
    "l15_ivf_search" -> ivfSearchQ,
    "l52_ann_recall" -> annRecallAudit,
    "l72_matryoshka_audit" -> matryoshkaAudit,
    "l55_semantic_dedup" -> semanticDedup,
    "l16_bucket_search" -> bucketSearchQ,
    "l36_pq_index" -> pqIndexQ,
    "l37_pq_search" -> pqSearchQ,
    "l38_ivfpq_search" -> ivfPqSearchQ,
    "l58_sq_rerank" -> sqSearchQ,
    "l39_hard_negatives" -> hardNegativesQ,
    "l17_train_split" -> trainSplit,
    "l18_decontamination" -> decontamination,
    "l19_repetition_filter" -> repetitionFilter,
    "l20_pii_scrub" -> piiScrub,
    "l21_dedup_clusters" -> dedupClustersQ,
    "l34_quality_survivors" -> qualitySurvivorsQ,
    "l22_sequence_packing" -> seqPacking,
    "l23_stratified_sample" -> stratifiedSample,
    "l24_bigram_commonness" -> bigramCommonness,
    "l25_curation_pipeline" -> curationPipeline,
    "l26_incremental_dedup" -> incrementalDedup)

  /** Shared oracle CTEs for the embedding operators: vectors as
    * DOUBLE[], seed centroids, and the argmax-dot cell assignment
    * (ties to lowest cid — same order as the ivfAssign fold). */
  private val oAssignCtes =
    """e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec
      |  FROM embeddings),
      |cents AS (SELECT vec_id AS cid, vec AS cvec FROM e WHERE vec_id < 16),
      |assign AS (
      |  SELECT vec_id, vec, cid FROM (
      |    SELECT e.vec_id, e.vec, c.cid,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_dot_product(e.vec, c.cvec) DESC, c.cid) AS rn
      |    FROM e CROSS JOIN cents c) WHERE rn = 1)""".stripMargin

  /** Shared oracle CTEs for the PQ operators: per-(vector, subspace)
    * squared-L2 to every codeword (the same single sequential fold the
    * Spark side runs, spelled list_dot_product(diff, diff)), the
    * argmin assignment (ties to lowest cid), and the per-vector code
    * string. */
  private val oPqCtes: String = {
    val dsq =
      s"""list_dot_product(
         |  list_transform(range(1, ${pqSub + 1}),
         |    i -> e.vec[ms.m * $pqSub + i] - c.cvec[ms.m * $pqSub + i]),
         |  list_transform(range(1, ${pqSub + 1}),
         |    i -> e.vec[ms.m * $pqSub + i] - c.cvec[ms.m * $pqSub + i]))"""
        .stripMargin
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec
       |  FROM embeddings),
       |cents AS (SELECT vec_id AS cid, vec AS cvec FROM e
       |  WHERE vec_id < $pqK),
       |ms AS (SELECT unnest(range(0, $pqM)) AS m),
       |dsub AS (
       |  SELECT e.vec_id, ms.m, c.cid, $dsq AS d
       |  FROM e CROSS JOIN ms CROSS JOIN cents c),
       |best AS (
       |  SELECT vec_id, m, cid FROM (
       |    SELECT vec_id, m, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, m
       |        ORDER BY d, cid) AS rn
       |    FROM dsub) WHERE rn = 1),
       |codes AS (
       |  SELECT vec_id,
       |    string_agg(CAST(cid AS VARCHAR), ',' ORDER BY m) AS code_str
       |  FROM best GROUP BY 1)""".stripMargin
  }

  private val oNorm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
  private val oToks = s"string_split($oNorm, ' ')"

  /** Shared DuckDB spelling of the l03 stopword-score columns and the
    * strictly-greater-wins predictor fold (one definition, two oracles:
    * l03 confusion, l93 kappa — the l67/l68 anti-drift discipline). */
  private lazy val oLangHits: String = Text.langStopwords.map {
    case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString(", ")
      s"len(list_filter($oToks, t -> t IN ($list))) AS s_$lang"
  }.mkString(",\n    ")

  private lazy val oLangPred: String = {
    val langs = Text.langStopwords.map(_._1)
    // Same fold as the Spark side: later lexicon wins only on strictly
    // greater score.
    langs.tail.foldLeft(s"'${langs.head}'" -> s"s_${langs.head}") {
      case ((predExpr, scoreExpr), lang) =>
        (s"CASE WHEN s_$lang > ($scoreExpr) THEN '$lang' ELSE ($predExpr) END",
          s"CASE WHEN s_$lang > ($scoreExpr) THEN s_$lang ELSE ($scoreExpr) END")
    }._1
  }

  val oracle: Map[String, String] = Map(
    // bucket CASE chain generated from the same lengthBuckets list the
    // Spark side folds over; percentile ranks in pure integers
    "l57_length_histogram" -> {
      val bucketCase = lengthBuckets
        .map(p => s"WHEN n_tok >= $p THEN $p").mkString(
          "CASE ", " ", " ELSE 0 END")
      s"""WITH base AS (
         |  SELECT source,
         |    CAST(len(regexp_extract_all(text, '${Text.bpeTokenPattern}'))
         |      AS BIGINT) AS n_tok
         |  FROM documents),
         |ranked AS (
         |  SELECT source, n_tok, c,
         |    SUM(c) OVER (PARTITION BY source ORDER BY n_tok) AS cum,
         |    SUM(c) OVER (PARTITION BY source) AS n
         |  FROM (SELECT source, n_tok, COUNT(*) AS c FROM base
         |        GROUP BY 1, 2)),
         |per_source AS (
         |  SELECT source,
         |    MIN(CASE WHEN cum >= (n + 1) // 2 THEN n_tok END) AS p50_tok,
         |    MIN(CASE WHEN cum >= (19*n + 19) // 20 THEN n_tok END)
         |      AS p95_tok,
         |    MAX(n_tok) AS max_tok
         |  FROM ranked GROUP BY 1),
         |hist AS (
         |  SELECT source, CAST($bucketCase AS BIGINT) AS bucket,
         |    COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
         |  FROM base GROUP BY 1, 2)
         |SELECT h.source, h.bucket, h.n_docs, h.sum_tokens,
         |  p.p50_tok, p.p95_tok, p.max_tok
         |FROM hist h JOIN per_source p USING (source)
         |ORDER BY 1, 2""".stripMargin
    },
    "l53_bpe_pairs" ->
      """WITH w AS (
        |  SELECT word, COUNT(*) AS n_word FROM (
        |    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |      AS word
        |    FROM documents) GROUP BY 1),
        |v AS (SELECT word, n_word FROM w WHERE length(word) >= 2),
        |p AS (
        |  SELECT n_word,
        |    unnest(list_transform(range(0, length(word) - 1),
        |      i -> substring(word, CAST(i + 1 AS INT), 2))) AS pair
        |  FROM v)
        |SELECT pair, CAST(SUM(n_word) AS BIGINT) AS n_pair
        |FROM p GROUP BY 1
        |ORDER BY n_pair DESC, pair LIMIT 20""".stripMargin,
    // the two merge steps unrolled as CTE stages: pair rollup → top-1
    // (count desc, lexicographic) → closed-form rewrite via the same
    // two lambdas (0-based index values over 1-based lists); totals
    // recomputed per stage. The chosen pair is correlated into the
    // rewrite lambdas from the 1-row top frame — no literals.
    "l73_bpe_merge_apply" -> {
      def pairs(v: String): String =
        s"""SELECT pr[1] AS l, pr[2] AS r,
           |    CAST(SUM(n_word) AS BIGINT) AS n_pair
           |  FROM (
           |    SELECT n_word,
           |      unnest(list_transform(range(0, len(syms) - 1),
           |        i -> [syms[i + 1], syms[i + 2]])) AS pr
           |    FROM $v)
           |  WHERE pr[1] <> pr[2] GROUP BY 1, 2""".stripMargin
      def merge(v: String, t: String): String =
        s"""SELECT n_word, list_transform(
           |    list_filter(range(0, len(syms)),
           |      i -> NOT (i > 0 AND syms[i + 1] = $t.r
           |                AND syms[i] = $t.l)),
           |    i -> CASE WHEN syms[i + 1] = $t.l AND i + 2 <= len(syms)
           |              AND syms[i + 2] = $t.r
           |         THEN $t.l || $t.r ELSE syms[i + 1] END) AS syms
           |  FROM $v CROSS JOIN $t""".stripMargin
      def tot(v: String): String =
        s"SELECT CAST(SUM(n_word * len(syms)) AS BIGINT) AS t FROM $v"
      s"""WITH w AS (
         |  SELECT word, COUNT(*) AS n_word FROM (
         |    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
         |      AS word
         |    FROM documents) GROUP BY 1),
         |v0 AS (
         |  SELECT n_word,
         |    list_transform(range(1, length(word) + 1),
         |      i -> substring(word, CAST(i AS INT), 1)) AS syms
         |  FROM w WHERE length(word) >= 2),
         |p1 AS (${pairs("v0")}),
         |t1 AS (SELECT * FROM p1 ORDER BY n_pair DESC, l, r LIMIT 1),
         |v1 AS (${merge("v0", "t1")}),
         |p2 AS (${pairs("v1")}),
         |t2 AS (SELECT * FROM p2 ORDER BY n_pair DESC, l, r LIMIT 1),
         |v2 AS (${merge("v1", "t2")}),
         |s0 AS (${tot("v0")}), s1 AS (${tot("v1")}), s2 AS (${tot("v2")})
         |SELECT CAST(1 AS BIGINT) AS step, t1.l AS pair_l,
         |  t1.r AS pair_r, t1.n_pair,
         |  s0.t AS syms_before, s1.t AS syms_after
         |FROM t1, s0, s1
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), t2.l, t2.r, t2.n_pair, s1.t, s2.t
         |FROM t2, s1, s2
         |ORDER BY step""".stripMargin
    },
    "l54_dataset_checksum" -> {
      val h = Text.oPortableStrHashSql(
        "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))")
      s"""WITH d AS (
         |  SELECT source,
         |    ${Text.oPortableMixWideSql(
               "h * 31 + (doc_id % 2147483647)")} AS fp1,
         |    ${Text.oPortableMixWideSql(
               "h * 37 + (doc_id % 2147483647) + 17")} AS fp2
         |  FROM (SELECT source, doc_id, $h AS h FROM documents))
         |SELECT source, COUNT(*) AS n_docs,
         |  bit_xor(fp1) AS xor_fp1, bit_xor(fp2) AS xor_fp2
         |FROM d GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "l56_shard_manifest" -> {
      val h = Text.oPortableStrHashSql(
        "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))")
      s"""WITH d AS (
         |  SELECT (${Text.oPortableMixWideSql("doc_id * 11 + 5")}) % 16
         |      AS shard,
         |    len(regexp_extract_all(text, '${Text.bpeTokenPattern}'))
         |      AS n_bpe,
         |    ${Text.oPortableMixWideSql(
               "h * 31 + (doc_id % 2147483647)")} AS fp
         |  FROM (SELECT doc_id, text, $h AS h FROM documents))
         |SELECT shard, COUNT(*) AS n_docs,
         |  CAST(SUM(n_bpe) AS BIGINT) AS n_tokens,
         |  bit_xor(fp) AS shard_checksum
         |FROM d GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "l47_sequence_examples" ->
      """WITH e AS (
        |  SELECT event_type,
        |    lag(event_type, 1) OVER w AS p1,
        |    lag(event_type, 2) OVER w AS p2,
        |    lag(event_type, 3) OVER w AS p3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT p3 || '>' || p2 || '>' || p1 AS context,
        |  event_type AS label, COUNT(*) AS n_examples
        |FROM e WHERE p3 IS NOT NULL
        |GROUP BY 1, 2
        |ORDER BY n_examples DESC, context, label LIMIT 20""".stripMargin,
    "l48_class_balance" ->
      s"""WITH r AS (
         |  SELECT vec_id, label,
         |    ROW_NUMBER() OVER (PARTITION BY label
         |      ORDER BY ${Text.oPortableMixWideSql("vec_id * 7 + 3")},
         |        vec_id) AS r
         |  FROM embeddings),
         |m AS (
         |  SELECT MIN(cnt) AS min_class FROM (
         |    SELECT COUNT(*) AS cnt FROM embeddings GROUP BY label))
         |SELECT label, COUNT(*) AS n_class,
         |  CAST(SUM(CASE WHEN r <= min_class THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  CAST(SUM(CASE WHEN r <= min_class THEN vec_id ELSE 0 END)
         |    AS BIGINT) AS kept_id_sum
         |FROM r CROSS JOIN m GROUP BY 1 ORDER BY 1""".stripMargin,
    // Full DuckDB replay of the banded MinHash pipeline: shingle →
    // portable char-fold hash → 16-perm signature → 4 band keys →
    // candidate equi-join → exact-Jaccard confirm. Every hash is the
    // portable mixer family (Text.portableStrHashSql/portableMixSql),
    // so the candidate SET — not just the row count — is checked.
    "l07_minhash_neardup" -> {
      val sh = Text.oMinhashShinglesSql("toks", 3)
      val sig = Text.oMinhashSigSql("hh", 16)
      val key = Text.oLshBandKeySql("sig", "b", 4)
      s"""WITH t AS (SELECT doc_id, $oToks AS toks FROM documents),
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
         |    AND a.doc_id < b.doc_id),
         |conf AS (
         |  SELECT CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         |      / CAST(len(list_distinct(list_concat(x.sh, y.sh))) AS DOUBLE)
         |      AS j
         |  FROM pairs p
         |  JOIN shf x ON x.doc_id = p.doc_a
         |  JOIN shf y ON y.doc_id = p.doc_b)
         |SELECT COUNT(*) AS n_candidate_pairs,
         |  CAST(COALESCE(SUM(CASE WHEN j >= 0.8 THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS n_confirmed_pairs
         |FROM conf""".stripMargin
    },
    // Full DuckDB replay of the banded SimHash pipeline: portable
    // 62-bit signature (two 31-bit mixes per token) → Manku block
    // band keys (same layout as Text.simhashBandLayout) → candidate
    // equi-join → hamming splits.
    "l08_simhash_neardup" -> {
      val w = Text.simhashWidth
      val bandRows = Text.simhashBandLayout(5).zipWithIndex
        .map { case ((off, mask), b) => s"($b, $off, ${mask})" }
        .mkString(", ")
      s"""WITH t AS (SELECT doc_id, $oToks AS toks FROM documents),
         |tf AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0),
         |hs AS (
         |  SELECT doc_id,
         |    list_transform(toks, tk -> ${Text.oPortableStrHashSql("tk")})
         |      AS h0s
         |  FROM tf),
         |h62 AS (
         |  SELECT doc_id,
         |    list_transform(h0s, h ->
         |      ${Text.oPortableMixSql("h + 1")} |
         |      (${Text.oPortableMixSql("h + 1073741824")} << 31)) AS hh
         |  FROM hs),
         |cnt AS (
         |  SELECT doc_id,
         |    list_transform(range(0, $w), j ->
         |      list_sum(list_transform(hh,
         |        h -> CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END)))
         |      AS cts
         |  FROM h62),
         |sigs AS (
         |  SELECT doc_id,
         |    list_reduce(
         |      list_prepend(CAST(0 AS BIGINT),
         |        list_transform(range(0, $w), j ->
         |          CASE WHEN cts[j + 1] > 0
         |            THEN (CAST(1 AS BIGINT) << j)
         |            ELSE CAST(0 AS BIGINT) END)),
         |      (a, x) -> a | x) AS simhash
         |  FROM cnt),
         |keyed AS (
         |  SELECT doc_id, simhash, band_idx,
         |    (simhash >> band_off) & band_mask AS band_key
         |  FROM sigs
         |  CROSS JOIN (VALUES $bandRows) AS bl(band_idx, band_off, band_mask)),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    bit_count(xor(a.simhash, b.simhash)) AS dist
         |  FROM keyed a JOIN keyed b
         |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |    AND a.doc_id < b.doc_id)
         |SELECT COUNT(*) AS n_candidate_pairs,
         |  CAST(COALESCE(SUM(CASE WHEN dist = 0 THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS n_identical,
         |  CAST(COALESCE(SUM(CASE WHEN dist <= 4 THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS n_hamming_le4
         |FROM pairs""".stripMargin
    },
    "l01_text_stats" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(length(text)) AS BIGINT) AS total_chars,
         |  CAST(SUM(len($oToks)) AS BIGINT) AS total_tokens,
         |  CAST(SUM(length(text)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    AS avg_chars,
         |  CAST(SUM(len($oToks)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    AS avg_tokens
         |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "l02_quality_score" ->
      s"""WITH scored AS (
         |  SELECT source,
         |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
         |      / CAST(length(text) AS DOUBLE) AS alpha_ratio,
         |    CAST(len(list_filter($oToks,
         |        t -> t IN ('the','and','of','to','in','is','a'))) AS DOUBLE)
         |      / CAST(len($oToks) AS DOUBLE) AS stop_ratio,
         |    CASE WHEN length(text) BETWEEN 100 AND 400 THEN 1 ELSE 0 END
         |      AS length_ok
         |  FROM documents)
         |SELECT source, COUNT(*) AS n_docs,
         |  SUM(alpha_ratio) / CAST(COUNT(*) AS DOUBLE) AS avg_alpha_ratio,
         |  SUM(stop_ratio) / CAST(COUNT(*) AS DOUBLE) AS avg_stop_ratio,
         |  CAST(SUM(length_ok) AS BIGINT) AS n_length_ok
         |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin,
    "l03_langid" ->
      s"""WITH scores AS (SELECT lang, $oLangHits FROM documents)
         |SELECT lang, $oLangPred AS predicted, COUNT(*) AS n_docs
         |FROM scores GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the l03 confusion frame folded to Cohen's kappa in integers;
    // the one double division floors the same exact operands on both
    // engines (see labelAgreement scaladoc)
    "l93_label_agreement" ->
      s"""WITH scores AS (SELECT lang, $oLangHits FROM documents),
         |conf AS (
         |  SELECT lang, $oLangPred AS predicted, COUNT(*) AS n_docs
         |  FROM scores GROUP BY 1, 2),
         |tot AS (
         |  SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total,
         |    CAST(COALESCE(SUM(CASE WHEN lang = predicted
         |      THEN n_docs ELSE 0 END), 0) AS BIGINT) AS n_agree
         |  FROM conf),
         |r AS (SELECT lang AS rl, CAST(SUM(n_docs) AS BIGINT) AS row_n
         |  FROM conf GROUP BY 1),
         |c AS (SELECT predicted AS cl, CAST(SUM(n_docs) AS BIGINT) AS col_n
         |  FROM conf GROUP BY 1),
         |pe AS (
         |  SELECT CAST(COALESCE(SUM(row_n * col_n), 0) AS BIGINT) AS pe_num
         |  FROM r JOIN c ON rl = cl)
         |SELECT n_total, n_agree, pe_num,
         |  CASE WHEN n_total * n_total = pe_num THEN 1000
         |    ELSE CAST(FLOOR(
         |      (1000.0 * CAST(n_total * n_agree - pe_num AS DOUBLE)) /
         |      CAST(n_total * n_total - pe_num AS DOUBLE)) AS BIGINT)
         |  END AS kappa_permille
         |FROM tot CROSS JOIN pe""".stripMargin,
    "l04_token_count" ->
      s"""SELECT lang,
         |  CAST(SUM(len(regexp_extract_all(text, '${Text.bpeTokenPattern}')))
         |    AS BIGINT) AS total_bpe_tokens,
         |  MIN(len(regexp_extract_all(text, '${Text.bpeTokenPattern}')))
         |    AS min_bpe,
         |  MAX(len(regexp_extract_all(text, '${Text.bpeTokenPattern}')))
         |    AS max_bpe
         |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "l05_exact_dedup" ->
      s"""WITH fp AS (
         |  SELECT doc_id, source, md5($oNorm) AS fp FROM documents),
         |surv AS (
         |  SELECT fp, MIN(doc_id) AS survivor_id FROM fp GROUP BY 1)
         |SELECT source, COUNT(*) AS n_docs,
         |  COUNT(DISTINCT fp.fp) AS n_unique,
         |  CAST(SUM(CASE WHEN doc_id = survivor_id THEN 0 ELSE 1 END)
         |    AS BIGINT) AS n_dropped
         |FROM fp JOIN surv USING (fp)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // per-dim prefix-truncated cosine top-10 vs the full-dim truth
    // set, replayed with the same fold order (list_dot_product) and
    // tie-break; the compare is exact integer hit counts
    "l72_matryoshka_audit" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
        |dims(dim) AS (VALUES (64), (32), (16), (8)),
        |c AS (
        |  SELECT q.qid, dims.dim, e.vec_id,
        |    list_dot_product(e.v[1:dims.dim], q.qv[1:dims.dim]) /
        |      (sqrt(list_dot_product(e.v[1:dims.dim], e.v[1:dims.dim])) *
        |       sqrt(list_dot_product(q.qv[1:dims.dim], q.qv[1:dims.dim])))
        |      AS cos
        |  FROM e CROSS JOIN q CROSS JOIN dims
        |  WHERE e.vec_id <> q.qid),
        |rk AS (
        |  SELECT qid, dim, vec_id, ROW_NUMBER() OVER (
        |    PARTITION BY qid, dim ORDER BY cos DESC, vec_id) AS rnk
        |  FROM c),
        |top AS (SELECT qid, dim, vec_id FROM rk WHERE rnk <= 10),
        |tr AS (SELECT qid, vec_id FROM top WHERE dim = 64)
        |SELECT t.dim, COUNT(DISTINCT t.qid) AS n_probes,
        |  CAST(SUM(CASE WHEN tr.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS recall_hits
        |FROM top t LEFT JOIN tr
        |  ON t.qid = tr.qid AND t.vec_id = tr.vec_id
        |GROUP BY 1 ORDER BY 1 DESC""".stripMargin,
    "l09_cosine_topk" -> {
      val dot = "list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[]))"
      val na = "sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))"
      val nb = "sqrt(list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(q.qv AS DOUBLE[])))"
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, e.label, ROUND($dot / ($na * $nb), 6) AS cosine
         |FROM embeddings e, q
         |WHERE e.vec_id <> 0
         |ORDER BY cosine DESC, e.vec_id LIMIT 10""".stripMargin
    },
    "l10_embedding_neardup" -> {
      val dot = "list_dot_product(CAST(x.embedding AS DOUBLE[]), CAST(y.embedding AS DOUBLE[]))"
      val nx = "sqrt(list_dot_product(CAST(x.embedding AS DOUBLE[]), CAST(x.embedding AS DOUBLE[])))"
      val ny = "sqrt(list_dot_product(CAST(y.embedding AS DOUBLE[]), CAST(y.embedding AS DOUBLE[])))"
      s"""WITH pairs AS (
         |  SELECT $dot / ($nx * $ny) AS cos
         |  FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
         |  WHERE x.vec_id < $allPairsPanel AND y.vec_id < $allPairsPanel)
         |SELECT COUNT(*) AS n_pairs,
         |  CAST(SUM(CASE WHEN cos > 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_above_02,
         |  CAST(SUM(CASE WHEN cos > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_above_05,
         |  CAST(SUM(CASE WHEN cos > 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_above_09
         |FROM pairs""".stripMargin
    },
    "l06_fingerprints" ->
      s"""WITH fp AS (
         |  SELECT ${Text.oRollingFingerprint(oToks)} AS roll_fp,
         |    md5($oNorm) AS md5_fp
         |  FROM documents)
         |SELECT COUNT(*) AS n_docs,
         |  COUNT(DISTINCT roll_fp) AS n_rolling,
         |  COUNT(DISTINCT md5_fp) AS n_md5
         |FROM fp""".stripMargin,
    "l13_token_jaccard" ->
      s"""WITH t AS (
         |  SELECT doc_id, list_distinct($oToks) AS ts FROM documents),
         |pairs AS (
         |  SELECT CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
         |      / CAST(len(list_distinct(list_concat(a.ts, b.ts))) AS DOUBLE)
         |      AS jaccard_next
         |  FROM t a JOIN t b ON a.doc_id = b.doc_id - 1)
         |SELECT COUNT(*) AS n_pairs,
         |  CAST(SUM(CASE WHEN jaccard_next >= 0.5 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_similar,
         |  MAX(jaccard_next) AS max_jaccard,
         |  MIN(jaccard_next) AS min_jaccard
         |FROM pairs""".stripMargin,
    // the decode arithmetic replayed in closed form over doc_id — the
    // construction + decode arithmetic replayed in closed form over
    // doc_id: w/h/raster fully determined by g = id%16; the junk tail
    // is injective in id, so byte-distinct = COUNT(DISTINCT doc_id)
    "l84_media_content_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(doc_id % 16 AS BIGINT) AS g FROM documents),
        |m AS (
        |  SELECT doc_id, g,
        |    4 + (g % 5) AS w, 3 + (g % 3) AS h
        |  FROM d),
        |sig AS (
        |  SELECT doc_id, w, h,
        |    CAST(list_sum(list_transform(range(0, w * h),
        |      p -> (g * 31 + 3 * p) % 256)) AS BIGINT) AS rs,
        |    CAST(list_sum(list_transform(range(0, w * h),
        |      p -> (g * 31 + 3 * p + 1) % 256)) AS BIGINT) AS gs,
        |    CAST(list_sum(list_transform(range(0, w * h),
        |      p -> (g * 31 + 3 * p + 2) % 256)) AS BIGINT) AS bs
        |  FROM m),
        |agg AS (
        |  SELECT COUNT(*) AS n_items,
        |    COUNT(DISTINCT doc_id) AS n_distinct_bytes
        |  FROM sig),
        |c AS (
        |  SELECT COUNT(*) AS n_distinct_content
        |  FROM (SELECT DISTINCT w, h, rs, gs, bs FROM sig))
        |SELECT n_items, n_distinct_bytes, n_distinct_content,
        |  (1000 * (n_items - n_distinct_content)) // n_items
        |    AS content_dup_permille
        |FROM agg CROSS JOIN c""".stripMargin,
    "l99_dedup_weighting" ->
      s"""WITH fp AS (
         |  SELECT source, md5($oNorm) AS fp,
         |    CAST(len($oToks) AS BIGINT) AS ntok
         |  FROM documents),
         |cl AS (SELECT fp, COUNT(*) AS n_copies FROM fp GROUP BY 1)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(ntok) AS BIGINT) AS n_tokens,
         |  CAST(SUM((1000 * ntok) // n_copies) AS BIGINT)
         |    AS weighted_tokens_e3,
         |  CAST(SUM((1000 * ntok) // n_copies) AS BIGINT)
         |    // CAST(SUM(ntok) AS BIGINT) AS surviving_token_permille
         |FROM fp JOIN cl USING (fp)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the naive quadratic replay of the prefix-filtered join: equality
    // proves the candidate generator is lossless at the threshold
    "l98_setsim_join" -> {
      val sh = Text.oMinhashShinglesSql("toks", 3)
      // t/s MATERIALIZED: DuckDB inlines plain CTEs, and the all-pairs
      // self-join references s twice — the whole tokenize+shingle
      // build ran once per side (measured 5.8 s -> 3.0 s at sf0.01,
      // identical rows). The naive quadratic pair loop itself is the
      // oracle's deliberate spec form and stays as-is.
      s"""WITH t AS MATERIALIZED (SELECT doc_id, $oToks AS toks
         |  FROM documents),
         |s AS MATERIALIZED (
         |  SELECT doc_id, list_distinct(sh) AS sh
         |  FROM (SELECT doc_id, $sh AS sh FROM t)
         |  WHERE len(sh) > 0),
         |p AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_inter,
         |    CAST(len(a.sh) + len(b.sh)
         |      - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_union
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, n_inter, n_union FROM p
         |WHERE n_inter * $ssDen >= n_union * $ssNum
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    // the aHash bit pack replayed per doc: pixel p's gray value is
    // (g·37 + p·53) % 180 + c, the bit is the integer cross-multiplied
    // mean threshold 63·v > Σv, the hash is the Σ bit·2^p pack. The
    // brightness shift c must cancel out of every bit (the aHash
    // invariance the operator exists for) — a Spark-side decode or
    // threshold slip shifts hashes and breaks every distinct count.
    "l94_perceptual_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(doc_id % 16 AS BIGINT) AS g,
        |    CAST((doc_id // 16) % 24 AS BIGINT) AS c
        |  FROM documents),
        |px AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 63),
        |      p -> (g * 37 + p * 53) % 180 + c) AS v
        |  FROM d),
        |hs AS (
        |  SELECT doc_id, CAST(list_sum(v) AS BIGINT) AS s, v
        |  FROM px),
        |sig AS (
        |  SELECT doc_id, s,
        |    CAST(list_sum(list_transform(range(0, 63),
        |      p -> CASE WHEN 63 * v[p + 1] > s
        |        THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)) AS BIGINT)
        |      AS phash
        |  FROM hs),
        |t AS (
        |  SELECT COUNT(*) AS n_items,
        |    COUNT(DISTINCT doc_id) AS n_distinct_bytes,
        |    COUNT(DISTINCT s) AS n_distinct_content,
        |    COUNT(DISTINCT phash) AS n_distinct_phash
        |  FROM sig),
        |cl AS (
        |  SELECT MAX(n) AS max_phash_cluster FROM (
        |    SELECT phash, COUNT(*) AS n FROM sig GROUP BY 1))
        |SELECT n_items, n_distinct_bytes, n_distinct_content,
        |  n_distinct_phash, max_phash_cluster,
        |  (1000 * (n_items - n_distinct_phash)) // n_items
        |    AS phash_dup_permille
        |FROM t CROSS JOIN cl""".stripMargin,
    // closed-form replay of the whole header → gray → block-partition
    // → floor-average → weighted-checksum chain; a mis-walked block
    // boundary or transposed kernel diverges here
    "l100_image_resize" ->
      """WITH d AS (
        |  SELECT doc_id AS id, 5 + (doc_id % 7) AS w, 4 + (doc_id % 5) AS h
        |  FROM documents),
        |t AS (
        |  SELECT w, h,
        |    CAST(list_sum(list_transform(range(0, 12), t -> (t + 1) *
        |      (CAST(list_sum(flatten(list_transform(
        |         range((t // 4) * h // 3, ((t // 4) + 1) * h // 3), y ->
        |           list_transform(
        |             range((t % 4) * w // 4, ((t % 4) + 1) * w // 4), x ->
        |               (((id * 31 + 3 * (y * w + x)) % 256)
        |                 + ((id * 31 + 3 * (y * w + x) + 1) % 256)
        |                 + ((id * 31 + 3 * (y * w + x) + 2) % 256)) // 3))))
        |         AS BIGINT)
        |       // ((((t % 4) + 1) * w // 4 - (t % 4) * w // 4)
        |          * (((t // 4) + 1) * h // 3 - (t // 4) * h // 3)))))
        |      AS BIGINT) AS thumb_checksum
        |  FROM d)
        |SELECT w, h, COUNT(*) AS n_images,
        |  CAST(SUM(thumb_checksum) AS BIGINT) AS sum_checksum
        |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // oracle never sees a payload byte, so it can only agree with the
    // Spark side if the header walks recover the exact dimensions,
    // channel order, and sample values that were encoded
    "l69_media_decode" ->
      """WITH im AS (
        |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 3 AS h
        |  FROM documents WHERE doc_id % 2 = 0),
        |imr AS (
        |  SELECT 'image' AS modality, w * h AS units,
        |    list_sum(list_transform(range(0, 3 * w * h),
        |      j -> (doc_id * 31 + j) % 256)) AS checksum
        |  FROM im),
        |au AS (
        |  SELECT doc_id, 64 + doc_id % 33 AS n
        |  FROM documents WHERE doc_id % 2 = 1),
        |aur AS (
        |  SELECT 'audio' AS modality, n AS units,
        |    list_sum(list_transform(range(0, n),
        |      i -> (doc_id * 7 + i) % 2048 - 1024)) AS checksum
        |  FROM au),
        |u AS (SELECT * FROM imr UNION ALL SELECT * FROM aur)
        |SELECT modality, COUNT(*) AS n_items,
        |  CAST(SUM(units) AS BIGINT) AS total_units,
        |  CAST(SUM(checksum) AS BIGINT) AS total_checksum
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    // sampled-frame indices (every 2nd of nf) and their 24 pixel bytes
    // replayed per doc; total_decoded = total_sampled is the planted
    // invariant (all frames complete) the Spark side must re-derive by
    // actually decoding
    "l70_video_frame_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 2 + doc_id % 7 AS nf FROM documents),
        |p AS (
        |  SELECT doc_id, nf, (nf + 1) // 2 AS n_sampled,
        |    list_sum(list_transform(
        |      list_filter(range(0, nf), f -> f % 2 = 0),
        |      f -> list_sum(list_transform(range(0, 24),
        |        j -> (doc_id * 13 + f * 97 + j) % 256)))) AS checksum
        |  FROM d)
        |SELECT COUNT(*) AS n_items,
        |  CAST(SUM(nf) AS BIGINT) AS total_frames,
        |  CAST(SUM(n_sampled) AS BIGINT) AS total_sampled,
        |  CAST(SUM(n_sampled) AS BIGINT) AS total_decoded,
        |  CAST(SUM(checksum) AS BIGINT) AS total_checksum
        |FROM p""".stripMargin,
    "l12_multimodal_stats" ->
      """SELECT source, COUNT(*) AS n_items,
        |  CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
        |  MAX(octet_length(CAST(text AS BLOB))) AS max_bytes
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // frames of 32 bytes, stride 4: every frame is full except the
    // last, whose deficit (32·n_frames − n) subtracts only when its
    // index (n_frames − 1) is on the stride
    "l35_frame_sampling" ->
      """WITH b AS (
        |  SELECT octet_length(CAST(text AS BLOB)) AS n FROM documents),
        |f AS (
        |  SELECT n, (n + 31) // 32 AS n_frames,
        |    ((n + 31) // 32 + 3) // 4 AS n_sampled
        |  FROM b)
        |SELECT COUNT(*) AS n_items,
        |  CAST(SUM(n_frames) AS BIGINT) AS total_frames,
        |  CAST(SUM(n_sampled) AS BIGINT) AS total_sampled,
        |  CAST(SUM(32 * n_sampled -
        |    CASE WHEN n_frames > 0 AND (n_frames - 1) % 4 = 0
        |      THEN 32 * n_frames - n ELSE 0 END) AS BIGINT)
        |    AS total_sampled_bytes
        |FROM f""".stripMargin,
    "l19_repetition_filter" ->
      s"""WITH t AS (
         |  SELECT source, $oToks AS tk FROM documents),
         |g AS (
         |  SELECT source,
         |    CAST(len(tk) AS BIGINT) AS n_tok,
         |    CAST(len(list_distinct(tk)) AS BIGINT) AS n_tok_d,
         |    list_transform(range(0, greatest(len(tk) - 1, 0)),
         |      i -> array_to_string(tk[i + 1 : i + 2], ' ')) AS gs
         |  FROM t),
         |m AS (
         |  SELECT source, n_tok, n_tok_d,
         |    CAST(len(gs) AS BIGINT) AS n_2g,
         |    CAST(len(list_distinct(gs)) AS BIGINT) AS n_2g_d
         |  FROM g)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN n_2g > 0 AND
         |      (1.0 - CAST(n_2g_d AS DOUBLE) / CAST(n_2g AS DOUBLE)) > 0.2
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         |  CAST(SUM(n_tok - n_tok_d) AS BIGINT) AS dup_tokens,
         |  CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         |  CAST(SUM(n_2g - n_2g_d) AS DOUBLE) / CAST(SUM(n_2g) AS DOUBLE)
         |    AS micro_dup_2gram
         |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "l20_pii_scrub" -> {
      s"""WITH seeded AS (
         |  SELECT doc_id,
         |    text ||
         |    CASE WHEN doc_id % 7 = 0
         |      THEN ' contact user' || doc_id || '@example.com'
         |      ELSE '' END ||
         |    CASE WHEN doc_id % 11 = 0
         |      THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR),
         |        4, '0')
         |      ELSE '' END AS text
         |  FROM documents),
         |counted AS (
         |  SELECT
         |    CAST(len(regexp_extract_all(text, '$emailRe')) AS BIGINT)
         |      AS n_emails,
         |    CAST(len(regexp_extract_all(text, '$phoneRe')) AS BIGINT)
         |      AS n_phones,
         |    regexp_replace(regexp_replace(text, '$emailRe', '<EMAIL>', 'g'),
         |      '$phoneRe', '<PHONE>', 'g') AS clean
         |  FROM seeded)
         |SELECT COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN n_emails > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_docs_email,
         |  CAST(SUM(CASE WHEN n_phones > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_docs_phone,
         |  CAST(SUM(n_emails + n_phones) AS BIGINT) AS n_redactions,
         |  CAST(SUM(len(regexp_extract_all(clean, '$emailRe'))
         |    + len(regexp_extract_all(clean, '$phoneRe'))) AS BIGINT)
         |    AS n_residual
         |FROM counted""".stripMargin
    },
    "l17_train_split" ->
      s"""WITH b AS (
         |  SELECT source, n_chars,
         |    ${Text.oPortableMixWideSql("doc_id + 1")} % 100 AS bucket
         |  FROM documents)
         |SELECT CASE WHEN bucket < 80 THEN 'train'
         |            WHEN bucket < 90 THEN 'validation'
         |            ELSE 'test' END AS split,
         |  COUNT(*) AS n_docs,
         |  COUNT(DISTINCT source) AS n_sources,
         |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "l18_decontamination" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $oToks AS t FROM documents),
         |sh AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(0, greatest(len(t) - 7, 0)),
         |      i -> ${Text.oPortableStrHashSql(
                  "array_to_string(t[i + 1 : i + 8], ' ')")})) AS shingle
         |  FROM toks),
         |probe AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 5),
         |cont AS (
         |  SELECT DISTINCT s.doc_id
         |  FROM sh s JOIN probe p USING (shingle)
         |  WHERE s.doc_id >= 5)
         |SELECT
         |  (SELECT COUNT(*) FROM documents WHERE doc_id >= 5) AS n_docs,
         |  (SELECT COUNT(*) FROM cont) AS n_contaminated,
         |  CAST((SELECT COUNT(*) FROM cont) AS DOUBLE)
         |    / CAST((SELECT COUNT(*) FROM documents WHERE doc_id >= 5)
         |        AS DOUBLE) AS contamination_rate""".stripMargin,
    "l21_dedup_clusters" ->
      s"""WITH RECURSIVE toks AS (
         |  SELECT doc_id, $oToks AS t FROM documents),
         |sh AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(0, greatest(len(t) - 7, 0)),
         |      i -> array_to_string(t[i + 1 : i + 8], ' '))) AS shingle
         |  FROM toks),
         |shd AS (SELECT DISTINCT doc_id, shingle FROM sh),
         |df AS (SELECT shingle, COUNT(*) AS df FROM shd GROUP BY 1),
         |edges AS (
         |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
         |  FROM shd a JOIN shd b USING (shingle) JOIN df USING (shingle)
         |  WHERE a.doc_id < b.doc_id AND df.df BETWEEN 2 AND 5),
         |sym AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
         |cc AS (
         |  SELECT doc_id, doc_id AS label FROM documents
         |  UNION
         |  SELECT s.b AS doc_id, cc.label FROM cc JOIN sym s ON s.a = cc.doc_id),
         |lbl AS (SELECT doc_id, MIN(label) AS label FROM cc GROUP BY 1),
         |comp AS (SELECT label, COUNT(*) AS csize FROM lbl GROUP BY 1)
         |SELECT CAST(SUM(csize) AS BIGINT) AS n_docs,
         |  COUNT(*) AS n_clusters,
         |  MAX(csize) AS max_cluster,
         |  CAST(SUM(csize) - COUNT(*) AS BIGINT) AS n_merged_docs,
         |  (SELECT COUNT(*) FROM edges) AS n_edges
         |FROM comp""".stripMargin,
    // l21's component labels + per-cluster argmax(quality, min doc_id)
    "l34_quality_survivors" ->
      s"""WITH RECURSIVE toks AS (
         |  SELECT doc_id, $oToks AS t FROM documents),
         |sh AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(0, greatest(len(t) - 7, 0)),
         |      i -> array_to_string(t[i + 1 : i + 8], ' '))) AS shingle
         |  FROM toks),
         |shd AS (SELECT DISTINCT doc_id, shingle FROM sh),
         |df AS (SELECT shingle, COUNT(*) AS df FROM shd GROUP BY 1),
         |edges AS (
         |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
         |  FROM shd a JOIN shd b USING (shingle) JOIN df USING (shingle)
         |  WHERE a.doc_id < b.doc_id AND df.df BETWEEN 2 AND 5),
         |sym AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
         |cc AS (
         |  SELECT doc_id, doc_id AS label FROM documents
         |  UNION
         |  SELECT s.b AS doc_id, cc.label FROM cc JOIN sym s ON s.a = cc.doc_id),
         |lbl AS (SELECT doc_id, MIN(label) AS label FROM cc GROUP BY 1),
         |q AS (
         |  SELECT doc_id, source,
         |    CASE WHEN length(text) = 0 THEN -1.0
         |      ELSE CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
         |        AS DOUBLE) / CAST(length(text) AS DOUBLE) END AS q
         |  FROM documents),
         |r AS (
         |  SELECT q.source, q.doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY lbl.label
         |      ORDER BY q.q DESC, q.doc_id) AS rn,
         |    MIN(q.doc_id) OVER (PARTITION BY lbl.label) AS min_id
         |  FROM q JOIN lbl ON q.doc_id = lbl.doc_id)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dropped,
         |  CAST(SUM(CASE WHEN rn = 1 AND doc_id <> min_id
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_upgrades
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "l22_sequence_packing" ->
      s"""WITH t AS (
         |  SELECT source, doc_id, CAST(len($oToks) AS BIGINT) AS n_tok
         |  FROM documents),
         |c AS (
         |  SELECT source, n_tok,
         |    CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source
         |      ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cum_before
         |  FROM t),
         |m AS (
         |  SELECT source, n_tok,
         |    cum_before // 512 AS first_chunk,
         |    (cum_before + n_tok - 1) // 512 AS last_chunk
         |  FROM c)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         |  CAST((SUM(n_tok) + 511) // 512 AS BIGINT) AS n_sequences,
         |  CAST(SUM(CASE WHEN last_chunk > first_chunk THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_split_docs,
         |  CAST(((SUM(n_tok) + 511) // 512) * 512 - SUM(n_tok) AS BIGINT)
         |    AS tail_padding
         |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "l23_stratified_sample" ->
      s"""WITH b AS (
         |  SELECT source,
         |    $oTargetPermilleSql
         |      AS target_permille,
         |    $oSampleBucketSql AS bucket
         |  FROM documents)
         |SELECT source, COUNT(*) AS n_docs,
         |  MAX(target_permille) AS target_permille,
         |  CAST(SUM(CASE WHEN bucket < target_permille THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_sampled,
         |  CAST(SUM(CASE WHEN bucket < target_permille THEN 1 ELSE 0 END)
         |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS achieved_rate
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "l24_bigram_commonness" ->
      s"""WITH t AS (
         |  SELECT source, doc_id, $oToks AS tk FROM documents),
         |g AS (
         |  SELECT source,
         |    unnest(list_transform(range(0, greatest(len(tk) - 1, 0)),
         |      i -> array_to_string(tk[i + 1 : i + 2], ' '))) AS bg
         |  FROM t),
         |c AS (SELECT bg, COUNT(*) AS cnt FROM g GROUP BY 1)
         |SELECT source, COUNT(*) AS n_bigrams,
         |  CAST(SUM(cnt) AS BIGINT) AS total_hits,
         |  CAST(SUM(cnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    AS commonness
         |FROM g JOIN c USING (bg) GROUP BY 1 ORDER BY 1""".stripMargin,
    "l25_curation_pipeline" ->
      s"""WITH t AS (
         |  SELECT source, doc_id, $oToks AS tk, md5($oNorm) AS fp,
         |    $oTargetPermilleSql
         |      AS target_permille,
         |    $oSampleBucketSql AS bucket
         |  FROM documents),
         |m AS (
         |  SELECT source, doc_id, fp, target_permille, bucket,
         |    CAST(len(tk) AS BIGINT) AS n_tok,
         |    CAST(len(list_transform(range(0, greatest(len(tk) - 1, 0)),
         |      i -> array_to_string(tk[i + 1 : i + 2], ' '))) AS BIGINT)
         |      AS n_2g,
         |    CAST(len(list_distinct(
         |      list_transform(range(0, greatest(len(tk) - 1, 0)),
         |        i -> array_to_string(tk[i + 1 : i + 2], ' '))))
         |      AS BIGINT) AS n_2g_d
         |  FROM t),
         |q AS (
         |  SELECT *,
         |    (n_tok >= 10 AND (CASE WHEN n_2g = 0 THEN 0.0
         |      ELSE 1.0 - CAST(n_2g_d AS DOUBLE) / CAST(n_2g AS DOUBLE)
         |      END) <= 0.2) AS quality_ok,
         |    bucket < target_permille AS sample_ok
         |  FROM m),
         |surv AS (
         |  SELECT fp, MIN(doc_id) AS survivor_id
         |  FROM q WHERE quality_ok GROUP BY 1),
         |j AS (
         |  SELECT q.*,
         |    (quality_ok AND doc_id = survivor_id) AS is_survivor,
         |    (quality_ok AND doc_id = survivor_id AND sample_ok)
         |      AS is_sampled
         |  FROM q LEFT JOIN surv USING (fp))
         |SELECT source, COUNT(*) AS n_input,
         |  CAST(SUM(CASE WHEN quality_ok THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_quality,
         |  CAST(SUM(CASE WHEN is_survivor THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_unique,
         |  CAST(SUM(CASE WHEN is_sampled THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_sampled,
         |  CAST(SUM(CASE WHEN is_sampled THEN n_tok ELSE 0 END) AS BIGINT)
         |    AS sampled_tokens,
         |  CAST((SUM(CASE WHEN is_sampled THEN n_tok ELSE 0 END) + 511)
         |    // 512 AS BIGINT) AS n_sequences
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "l26_incremental_dedup" ->
      s"""WITH f AS (
         |  SELECT doc_id, md5($oNorm) AS fp FROM documents),
         |inc AS (SELECT DISTINCT fp FROM f WHERE doc_id >= 400)
         |SELECT
         |  (SELECT COUNT(*) FROM f WHERE doc_id >= 400) AS n_incoming,
         |  (SELECT COUNT(*) FROM inc) AS n_batch_unique,
         |  (SELECT COUNT(*) FROM inc i
         |   WHERE NOT EXISTS (SELECT 1 FROM f
         |     WHERE doc_id < 400 AND f.fp = i.fp))
         |    AS n_new""".stripMargin,
    "l11_ann_buckets" -> {
      val bucket = Text.oHyperplaneBucket("vec", 8)
      s"""WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS vec
         |  FROM embeddings),
         |hist AS (
         |  SELECT $bucket AS bucket, COUNT(*) AS n_vecs
         |  FROM e GROUP BY 1)
         |SELECT COUNT(*) AS n_buckets, MAX(n_vecs) AS max_bucket,
         |  MIN(n_vecs) AS min_bucket,
         |  CAST(SUM(n_vecs) AS BIGINT) AS n_total
         |FROM hist""".stripMargin
    },
    "l36_pq_index" -> {
      s"""WITH $oPqCtes
         |SELECT
         |  (SELECT COUNT(*) FROM codes) AS n_vectors,
         |  (SELECT COUNT(DISTINCT code_str) FROM codes)
         |    AS n_distinct_codes,
         |  CAST($pqM AS BIGINT) AS m_subspaces,
         |  CAST($pqK AS BIGINT) AS k_codewords,
         |  CAST($pqM AS BIGINT) AS code_bytes,
         |  CAST(${4 * pqM * pqSub} AS BIGINT) AS raw_bytes""".stripMargin
    },
    "l37_pq_search" -> {
      val qdist = // same single-fold shape as the Spark side
        s"""list_dot_product(
           |  list_transform(range(1, ${pqSub + 1}),
           |    i -> q.vec[ms.m * $pqSub + i] - c.cvec[ms.m * $pqSub + i]),
           |  list_transform(range(1, ${pqSub + 1}),
           |    i -> q.vec[ms.m * $pqSub + i] - c.cvec[ms.m * $pqSub + i]))"""
          .stripMargin
      s"""WITH $oPqCtes,
         |lut AS (
         |  SELECT q.vec_id AS qid, ms.m, c.cid,
         |    CAST(ROUND(($qdist) * ${pqMicro}) AS BIGINT) AS dm
         |  FROM e q CROSS JOIN ms CROSS JOIN cents c
         |  WHERE q.vec_id < 4),
         |adc AS (
         |  SELECT l.qid, b.vec_id, CAST(SUM(l.dm) AS BIGINT) AS adc_micro
         |  FROM best b JOIN lut l ON l.m = b.m AND l.cid = b.cid
         |  WHERE b.vec_id <> l.qid
         |  GROUP BY 1, 2)
         |SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, adc_micro
         |FROM (SELECT qid, vec_id, adc_micro,
         |    ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY adc_micro, vec_id) AS rank
         |  FROM adc)
         |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin
    },
    // symmetric max-abs int8 quantization, integer candidate dots,
    // exact cosine re-rank — every stage portable arithmetic (the
    // quantized values are integers; products stay < 2^53 so DuckDB's
    // double list_dot_product is exact)
    "l58_sq_rerank" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec
        |  FROM embeddings),
        |amax AS (SELECT MAX(list_aggregate(
        |    list_transform(vec, x -> abs(x)), 'max')) AS a FROM e),
        |qz AS (SELECT e.vec_id, e.vec,
        |    list_transform(e.vec, x -> ROUND(x / am.a * 127.0)) AS qv
        |  FROM e CROSS JOIN amax am),
        |q AS (SELECT vec_id AS qid, vec AS qvec, qv AS qqv
        |  FROM qz WHERE vec_id < 4),
        |cand AS (
        |  SELECT qid, vec_id FROM (
        |    SELECT q.qid, z.vec_id,
        |      ROW_NUMBER() OVER (PARTITION BY q.qid
        |        ORDER BY list_dot_product(z.qv, q.qqv) DESC, z.vec_id)
        |        AS crank
        |    FROM qz z CROSS JOIN q WHERE z.vec_id <> q.qid)
        |  WHERE crank <= 32)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, cosine
        |FROM (
        |  SELECT c.qid, c.vec_id,
        |    ROUND(list_dot_product(z.vec, q.qvec)
        |      / (sqrt(list_dot_product(z.vec, z.vec))
        |         * sqrt(list_dot_product(q.qvec, q.qvec))), 6) AS cosine,
        |    ROW_NUMBER() OVER (PARTITION BY c.qid
        |      ORDER BY list_dot_product(z.vec, q.qvec)
        |        / (sqrt(list_dot_product(z.vec, z.vec))
        |           * sqrt(list_dot_product(q.qvec, q.qvec))) DESC,
        |        c.vec_id) AS rank
        |  FROM cand c
        |  JOIN qz z ON z.vec_id = c.vec_id
        |  JOIN q ON q.qid = c.qid)
        |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,
    // IVF cell probe (the l15 CTEs) composed with PQ code ranking (the
    // l36/l37 CTEs): candidates come from the probed cells' posting
    // lists, scores from the integer ADC lookup
    "l38_ivfpq_search" -> {
      val qdist =
        s"""list_dot_product(
           |  list_transform(range(1, ${pqSub + 1}),
           |    i -> q.qvec[ms.m * $pqSub + i] - c.cvec[ms.m * $pqSub + i]),
           |  list_transform(range(1, ${pqSub + 1}),
           |    i -> q.qvec[ms.m * $pqSub + i] - c.cvec[ms.m * $pqSub + i]))"""
          .stripMargin
      s"""WITH $oPqCtes,
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_dot_product(e.vec, c.cvec) DESC, c.cid)
         |        AS rn
         |    FROM e CROSS JOIN cents c) WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, vec AS qvec FROM e WHERE vec_id < 4),
         |probe AS (
         |  SELECT qid, cid FROM (
         |    SELECT q.qid, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY q.qid
         |        ORDER BY list_dot_product(q.qvec, c.cvec) DESC, c.cid)
         |        AS crank
         |    FROM q CROSS JOIN cents c) WHERE crank <= 4),
         |lut AS (
         |  SELECT q.qid, ms.m, c.cid,
         |    CAST(ROUND(($qdist) * ${pqMicro}) AS BIGINT) AS dm
         |  FROM q CROSS JOIN ms CROSS JOIN cents c),
         |cand AS (
         |  SELECT p.qid, a.vec_id
         |  FROM probe p JOIN assign a USING (cid)
         |  WHERE a.vec_id <> p.qid),
         |adc AS (
         |  SELECT cd.qid, cd.vec_id, CAST(SUM(l.dm) AS BIGINT) AS adc_micro
         |  FROM cand cd
         |  JOIN best b ON b.vec_id = cd.vec_id
         |  JOIN lut l ON l.qid = cd.qid AND l.m = b.m AND l.cid = b.cid
         |  GROUP BY 1, 2)
         |SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, adc_micro
         |FROM (SELECT qid, vec_id, adc_micro,
         |    ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY adc_micro, vec_id) AS rank
         |  FROM adc)
         |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin
    },
    "l14_ivf_index" ->
      s"""WITH $oAssignCtes,
         |cells AS (SELECT cid, COUNT(*) AS n_vecs FROM assign GROUP BY 1)
         |SELECT COUNT(*) AS n_cells, MAX(n_vecs) AS max_cell,
         |  MIN(n_vecs) AS min_cell,
         |  CAST(SUM(n_vecs) AS BIGINT) AS n_total
         |FROM cells""".stripMargin,
    // the l15 probe replay with labels carried and the same-label
    // candidates removed BEFORE the per-query rank
    "l39_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
         |    label FROM embeddings),
         |cents AS (SELECT vec_id AS cid, vec AS cvec FROM e
         |  WHERE vec_id < 16),
         |assign AS (
         |  SELECT vec_id, vec, label, cid FROM (
         |    SELECT e.vec_id, e.vec, e.label, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_dot_product(e.vec, c.cvec) DESC, c.cid) AS rn
         |    FROM e CROSS JOIN cents c) WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, vec AS qvec, label AS qlabel
         |  FROM e WHERE vec_id < 4),
         |probe AS (
         |  SELECT qid, qvec, qlabel, cid FROM (
         |    SELECT q.qid, q.qvec, q.qlabel, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY q.qid
         |        ORDER BY list_dot_product(q.qvec, c.cvec) DESC, c.cid)
         |        AS crank
         |    FROM q CROSS JOIN cents c) WHERE crank <= 4),
         |cand AS (
         |  SELECT p.qid, a.vec_id, a.label,
         |    list_dot_product(a.vec, p.qvec)
         |      / (sqrt(list_dot_product(a.vec, a.vec))
         |         * sqrt(list_dot_product(p.qvec, p.qvec))) AS cos
         |  FROM probe p JOIN assign a USING (cid)
         |  WHERE a.vec_id <> p.qid AND a.label <> p.qlabel)
         |SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id,
         |  CAST(label AS BIGINT) AS neg_label, ROUND(cos, 6) AS cosine
         |FROM (SELECT qid, vec_id, label, cos,
         |    ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY cos DESC, vec_id) AS rank
         |  FROM cand)
         |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,
    "l15_ivf_search" ->
      s"""WITH $oAssignCtes,
         |q AS (SELECT vec_id AS qid, vec AS qvec FROM e WHERE vec_id < 4),
         |probe AS (
         |  SELECT qid, qvec, cid FROM (
         |    SELECT q.qid, q.qvec, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY q.qid
         |        ORDER BY list_dot_product(q.qvec, c.cvec) DESC, c.cid)
         |        AS crank
         |    FROM q CROSS JOIN cents c) WHERE crank <= 4),
         |cand AS (
         |  SELECT p.qid, a.vec_id,
         |    list_dot_product(a.vec, p.qvec)
         |      / (sqrt(list_dot_product(a.vec, a.vec))
         |         * sqrt(list_dot_product(p.qvec, p.qvec))) AS cos
         |  FROM probe p JOIN assign a USING (cid)
         |  WHERE a.vec_id <> p.qid)
         |SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id,
         |  ROUND(cos, 6) AS cosine
         |FROM (SELECT qid, vec_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY cos DESC, vec_id) AS rank
         |  FROM cand)
         |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,
    "l52_ann_recall" ->
      s"""WITH $oAssignCtes,
         |q AS (SELECT vec_id AS qid, vec AS qvec FROM e WHERE vec_id < 4),
         |exact AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT q.qid, e.vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.qid
         |        ORDER BY list_dot_product(e.vec, q.qvec)
         |          / (sqrt(list_dot_product(e.vec, e.vec))
         |             * sqrt(list_dot_product(q.qvec, q.qvec))) DESC,
         |          e.vec_id) AS rank
         |    FROM e CROSS JOIN q WHERE e.vec_id <> q.qid)
         |  WHERE rank <= 10),
         |probe AS (
         |  SELECT qid, qvec, cid FROM (
         |    SELECT q.qid, q.qvec, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY q.qid
         |        ORDER BY list_dot_product(q.qvec, c.cvec) DESC, c.cid)
         |        AS crank
         |    FROM q CROSS JOIN cents c) WHERE crank <= 4),
         |approx AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT p.qid, a.vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY p.qid
         |        ORDER BY list_dot_product(a.vec, p.qvec)
         |          / (sqrt(list_dot_product(a.vec, a.vec))
         |             * sqrt(list_dot_product(p.qvec, p.qvec))) DESC,
         |          a.vec_id) AS rank
         |    FROM probe p JOIN assign a USING (cid)
         |    WHERE a.vec_id <> p.qid)
         |  WHERE rank <= 10)
         |SELECT x.qid, COUNT(*) AS n_exact,
         |  CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_hit,
         |  CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall_at_10
         |FROM exact x LEFT JOIN approx ap
         |  ON x.qid = ap.qid AND x.vec_id = ap.vec_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "l55_semantic_dedup" -> {
      val bucket = Text.oHyperplaneBucket("vec", 8)
      val cos = "list_dot_product(a.vec, b.vec)" +
        " / (sqrt(list_dot_product(a.vec, a.vec))" +
        " * sqrt(list_dot_product(b.vec, b.vec)))"
      s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec
         |  FROM embeddings),
         |c0 AS (
         |  SELECT vec_id, vec FROM base
         |  UNION ALL
         |  SELECT vec_id + 100000 AS vec_id,
         |    list_transform(vec, x -> x * 1.01) AS vec
         |  FROM base WHERE vec_id % 10 = 0),
         |c AS (SELECT vec_id, vec, $bucket AS bucket FROM c0),
         |dups AS (
         |  SELECT DISTINCT b.vec_id FROM c a JOIN c b
         |  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  WHERE $cos >= 0.95)
         |SELECT COUNT(*) AS n_input,
         |  CAST(SUM(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_removed,
         |  CAST(SUM(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_kept,
         |  bit_xor(CASE WHEN d.vec_id IS NULL
         |    THEN ${Text.oPortableMixWideSql("c.vec_id")} ELSE 0 END)
         |    AS kept_xor
         |FROM c LEFT JOIN dups d ON c.vec_id = d.vec_id""".stripMargin
    },
    "l16_bucket_search" -> {
      val bucket = Text.oHyperplaneBucket("vec", 8)
      val masks = probeMasks(8, 2).mkString(", ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec
         |  FROM embeddings),
         |b AS (SELECT vec_id, vec, $bucket AS bucket FROM e),
         |q AS (SELECT vec_id AS qid, vec AS qvec, bucket AS qbucket
         |  FROM b WHERE vec_id < 4),
         |flips AS (SELECT unnest([$masks]) AS f),
         |probe AS (
         |  SELECT qid, qvec, xor(qbucket, f) AS pbucket
         |  FROM q CROSS JOIN flips),
         |cand AS (
         |  SELECT p.qid, b.vec_id,
         |    list_dot_product(b.vec, p.qvec)
         |      / (sqrt(list_dot_product(b.vec, b.vec))
         |         * sqrt(list_dot_product(p.qvec, p.qvec))) AS cos
         |  FROM probe p JOIN b ON b.bucket = p.pbucket
         |    AND b.vec_id <> p.qid)
         |SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id,
         |  ROUND(cos, 6) AS cosine
         |FROM (SELECT qid, vec_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY cos DESC, vec_id) AS rank
         |  FROM cand)
         |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin
    })
}
