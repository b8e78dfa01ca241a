package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `minhash_bands(array<string>) -> array<bigint>`: the complete
  * shingle → `perms`-permutation MinHash signature → `bands` LSH band
  * keys pipeline as ONE native codegen'd expression.
  *
  * Bit-identical to the HOF chain ([[Text.shingleHashes]] →
  * [[Text.minhashSignature]] → [[Text.lshBands]], pinned by
  * MinhashBandsSpec) AND to the DuckDB oracle replay (l07 is
  * oracle-checked end to end): per shingle the portable character fold
  * [[PortableHash.strHash]] seeds the per-permutation rehash
  * [[PortableHash.minhashPerm]] (two-round multiply/xor-shift mixer —
  * pure integer arithmetic both engines evaluate identically, unlike
  * the xxhash64 this expression originally used), minima form the
  * signature, and each band key folds the band's signature slice as
  * (acc*31 + m) mod 1e9+7 seeded with the band index. Why native: all
  * three HOF stages are CodegenFallback, so the l07 signature
  * projection ran interpreted at O(perms) lambda trees per shingle;
  * here it is a generated-code loop over the array with primitive
  * minima. Empty shingle arrays never reach this expression
  * (minhashCandidates filters them); for completeness n == 0 folds no
  * elements (key = band index), where the HOF spec yields NULL keys. */
case class MinhashBandsExpr(child: Expression, perms: Int, bands: Int)
    extends UnaryExpression {
  require(perms > 0 && bands > 0 && perms % bands == 0,
    s"perms ($perms) must be a positive multiple of bands ($bands)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands expects ARRAY<STRING>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(shingles: Any): Any =
    MinhashBandsExpr.compute(shingles.asInstanceOf[ArrayData], perms, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinhashBandsExpr.compute($c, $perms, $bands)")

  override protected def withNewChildInternal(newChild: Expression): MinhashBandsExpr =
    copy(child = newChild)
}

object MinhashBandsExpr {
  /** Called from generated code — must stay a static-reachable public
    * method. */
  def compute(shingles: ArrayData, perms: Int, bands: Int): ArrayData = {
    val n = shingles.numElements()
    val mins = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      // null shingle → the HOF fold over split(null) is NULL and
      // array_min skips it (unreachable in practice: shinglesFromTokens
      // never emits nulls) — skip it here too
      if (!shingles.isNullAt(i)) {
        val h0 = PortableHash.strHash(shingles.getUTF8String(i))
        var p = 0
        while (p < perms) {
          val hp = PortableHash.minhashPerm(h0, p)
          if (hp < mins(p)) mins(p) = hp
          p += 1
        }
      }
      i += 1
    }
    val rows = perms / bands
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = b.toLong
      if (n > 0) {
        var r = 0
        while (r < rows) {
          acc = (acc * 31L + mins(b * rows + r)) % PortableHash.StrMod
          r += 1
        }
      }
      keys(b) = acc
      b += 1
    }
    new GenericArrayData(keys)
  }
}
