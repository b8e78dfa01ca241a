package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_bands(array<string>) -> array<bigint>`: the complete
  * shingle → `perms`-permutation MinHash signature → `bands` LSH band
  * keys pipeline as ONE native codegen'd expression.
  *
  * Bit-identical to the HOF chain ([[Text.shingleHashes]] →
  * [[Text.minhashSignature]] → [[Text.lshBands]], pinned by
  * MinhashBandsSpec): per shingle `xxhash64(shingle)` seeds the
  * per-permutation rehash `xxhash64(h, p)` (= hash(p, hash(h, 42)) —
  * Spark folds multi-arg xxhash64 left to right), minima form the
  * signature, and each band key is `xxhash64('<b>:<m0>,<m1>,...')`
  * over the band's signature slice, exactly the string the HOF form
  * concatenates. Why native: all three HOF stages are CodegenFallback,
  * so the l07 signature projection ran interpreted at O(perms) lambda
  * trees per shingle; here it is a generated-code loop over the array
  * with primitive minima. */
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
      // null shingle → xxhash64(null) leaves the seed unchanged (42),
      // mirroring the HOF transform exactly (unreachable in practice:
      // shinglesFromTokens never emits nulls)
      val h0 =
        if (shingles.isNullAt(i)) 42L
        else XxHash64Function.hash(shingles.getUTF8String(i), StringType, 42L)
      // xxhash64(h, p) = hash(p, hash(h, 42)); the inner term is
      // permutation-independent — hoist it per shingle
      val g = XxHash64Function.hash(h0, LongType, 42L)
      var p = 0
      while (p < perms) {
        val hp = XxHash64Function.hash(p, IntegerType, g)
        if (hp < mins(p)) mins(p) = hp
        p += 1
      }
      i += 1
    }
    val rows = perms / bands
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder
      sb.append(b).append(':')
      var r = 0
      while (r < rows) {
        // empty input → the HOF's array_min over no elements is NULL,
        // and array_join drops nulls: the joined slice is empty
        if (n > 0) {
          if (r > 0) sb.append(',')
          sb.append(mins(b * rows + r))
        }
        r += 1
      }
      keys(b) = XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)
      b += 1
    }
    new GenericArrayData(keys)
  }
}
