package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `kgram_hashes(string, k) -> array<bigint>`: the portable character
  * fold ([[PortableHash.strHash]], base 131 mod 1e9+7) of every k-char
  * gram of the input, one hash per start position — the l86 winnowing
  * front end as ONE native codegen'd expression (pattern:
  * [[SimhashPackExpr]], [[MinhashBandsExpr]]).
  *
  * Why native: the HOF spelling (`transform(sequence(...), i ->
  * aggregate(split(substring(nt, i+1, k), ''), ...))`) is an
  * `ArrayTransform` with a nested `ArrayAggregate` — CodegenFallback,
  * so the whole stage runs interpreted and every gram pays a lambda
  * eval, a substring allocation, a split into k one-char strings, and
  * k boxed fold steps (measured: l86 ≈ 5 s at sf0.1, the slowest query
  * in the suite). Here each gram folds in place over the string's
  * bytes — no allocation per gram beyond the output array. The fold
  * walks non-continuation UTF-8 bytes exactly as strHash does, which
  * is bit-equal to the split('')+ascii HOF semantics; CorpusSpec pins
  * the equality over the corpus. The HOF builder remains in
  * [[graft.operators.CorpusOps]]'s oracle as the readable spec DuckDB
  * replays. */
case class KgramHashesExpr(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kgram_hashes expects STRING, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kgram_hashes"

  override protected def nullSafeEval(s: Any): Any =
    KgramHashesExpr.compute(s.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.KgramHashesExpr.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): KgramHashesExpr =
    copy(child = newChild)
}

/** `winnow_keys(string, k, w) -> array<bigint>`: the FULL winnowing
  * selection (Schleimer et al. SIGMOD'03) per document as one native
  * expression — k-gram hashes, sliding-window-of-w minimum with
  * rightmost tie-break, consecutive dedupe — returning each selected
  * fingerprint as the packed key h·2^20 + (2^20−1−pos) (min over the
  * packed key IS min-hash-then-rightmost-pos; the l86 encoding).
  *
  * Why a whole-selection expression and not just the hash front end:
  * winnowing is per-document LOCAL, so pushing the selection into the
  * map phase removes the (doc, pos, key)-per-GRAM explode + window
  * sort + shuffle entirely — only the ~2/(w+1)-density selected
  * fingerprints ever become rows. At corpus scale that is the
  * difference between shuffling every character window and shuffling
  * the fingerprint index a MOSS deployment actually stores. Selected
  * positions are non-decreasing as the window slides (a dropped
  * minimum can never return), so dedupe-against-last yields exactly
  * the distinct (pos, h) selection set — CorpusSpec pins equality with
  * an independent reimplementation. */
case class WinnowKeysExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_keys expects STRING, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_keys"

  override protected def nullSafeEval(s: Any): Any =
    WinnowKeysExpr.compute(s.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowKeysExpr.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowKeysExpr =
    copy(child = newChild)
}

object WinnowKeysExpr {
  /** Pos-field width: docs ≤ 2^20 chars (CorpusOps.winPosMask). */
  val PosMask = 1048575L

  /** Called from generated code. Selection only over FULL windows
    * (window ends at gram positions w-1 .. g-1), matching the
    * `pos >= w-1` filter of the window-function formulation. */
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val hashes = KgramHashesExpr.compute(s, k)
    val g = hashes.numElements()
    if (g < w) return new GenericArrayData(Array.empty[Long])
    val keys = new Array[Long](g)
    var i = 0
    while (i < g) {
      keys(i) = hashes.getLong(i) * (PosMask + 1) + (PosMask - i)
      i += 1
    }
    val out = new Array[Long](g - w + 1)
    var n = 0
    var p = w - 1
    while (p < g) {
      var mk = keys(p)
      var j = p - w + 1
      while (j < p) {
        if (keys(j) < mk) mk = keys(j)
        j += 1
      }
      if (n == 0 || out(n - 1) != mk) { out(n) = mk; n += 1 }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, n))
  }
}

object KgramHashesExpr {
  /** Called from generated code — must stay a static-reachable public
    * method. Returns one hash per k-char-gram start position (empty
    * array when the string is shorter than k chars, mirroring the HOF
    * spec's CASE guard). Grams are CHARACTER windows (code points, the
    * `substring` semantics); the fold is [[PortableHash.strHash]]'s
    * code-point fold on each gram — `split('')+ascii` returns full
    * code points (233 for 'é'), so the decode here keeps native ==
    * HOF == oracle on non-ASCII input too (PropertySpec edge sweep).
    *
    * Two passes over the bytes: decode every code point once into a
    * flat array (values + char-start index), then fold each window
    * over decoded ints — O(n·k) integer ops, no per-gram decode. */
  def compute(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    // decode once: code point per character
    val cps = new Array[Int](nBytes) // upper bound; ASCII hits it
    var nChars = 0
    var i = 0
    while (i < nBytes) {
      val b0 = bytes(i) & 0xFF
      var cp = b0
      var len = 1
      if (b0 >= 0x80) {
        if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; len = 2 }
        else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; len = 3 }
        else { cp = b0 & 0x07; len = 4 }
        var j = 1
        while (j < len && i + j < nBytes) {
          cp = (cp << 6) | (bytes(i + j) & 0x3F)
          j += 1
        }
      }
      cps(nChars) = cp
      nChars += 1
      i += len
    }
    val n = nChars - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n)
    var p = 0
    while (p < n) {
      var h = 0L
      var c = p
      val end = p + k
      while (c < end) {
        h = (h * 131L + cps(c)) % PortableHash.StrMod
        c += 1
      }
      out(p) = h
      p += 1
    }
    new GenericArrayData(out)
  }
}
