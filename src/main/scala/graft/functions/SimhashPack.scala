package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `simhash_pack(array<string>) -> bigint`: the 62-bit SimHash of a
  * token array as ONE native codegen'd expression (pattern:
  * [[GeohashExpr]], [[ZOrderInterleave]]).
  *
  * Token hashing runs INSIDE the expression via the portable primitives
  * ([[PortableHash.strHash]] character fold → [[PortableHash.tokenHash62]]
  * two-mix pack) — pure integer arithmetic that DuckDB replays exactly,
  * which is what upgraded l08 from rows-only to oracle-checked. The
  * signature is 62 bits (two side-by-side 31-bit mixes), not the
  * original xxhash64-based 64: the two-bit narrowing keeps the packed
  * value and every sliced band key non-negative in both engines (no
  * sign-bit special cases in the SQL replay) while leaving 5-band keys
  * at 13/12 bits — still ~8k-value selective, and the Manku pigeonhole
  * recall guarantee (hamming ≤ bands-1 ⇒ one band matches) is
  * width-independent.
  *
  * Why native: the higher-order-function form ([[Text.tokenHashes]]
  * transform + [[Text.simhashBitCounts]] fold + [[Text.packSimhash]])
  * contains `ArrayTransform`/`ArrayAggregate` nodes, which are
  * CodegenFallback — ONE of them in a projection drops the entire stage
  * to interpreted mode, costing ~62 interpreted lambda evaluations per
  * token plus a 62-long intermediate array per row. Here the signature
  * is a tight generated-code loop (static JVM call, primitive arrays,
  * no boxing) — the l08 hot path at corpus scale. The HOF builders
  * remain as the readable specification; SimhashPackSpec pins
  * bit-equality between the two. */
case class SimhashPackExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_pack expects ARRAY<STRING>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_pack"

  override protected def nullSafeEval(tokens: Any): Any =
    SimhashPackExpr.compute(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimhashPackExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashPackExpr =
    copy(child = newChild)
}

object SimhashPackExpr {
  /** Signature width in bits — see the class scaladoc for why 62. */
  val Width = 62

  /** Called from generated code — must stay a static-reachable public
    * method. A null token (unreachable: split never emits nulls) is
    * skipped, mirroring the HOF fold where a NULL hash contributes
    * nothing decidable and the pre-filter guarantees none exist. */
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](Width)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = PortableHash.tokenHash62(
          PortableHash.strHash(tokens.getUTF8String(i)))
        var j = 0
        while (j < Width) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var packed = 0L
    var j = 0
    while (j < Width) {
      if (counts(j) > 0) packed |= (1L << j)
      j += 1
    }
    packed
  }
}
