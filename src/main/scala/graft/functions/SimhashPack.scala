package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `simhash_pack(array<string>) -> bigint`: the 64-bit SimHash of a
  * token array as ONE native codegen'd expression (pattern:
  * [[GeohashExpr]], [[ZOrderInterleave]]).
  *
  * Token hashing runs INSIDE the expression via Spark's own
  * [[XxHash64Function]] (seed 42 — bit-identical to `xxhash64(tok)`),
  * which is what makes the whole doc→signature projection eligible for
  * whole-stage codegen: the higher-order-function form
  * (`Text.tokenHashes` transform + `Text.simhashBitCounts` fold +
  * `Text.packSimhash`) contains `ArrayTransform`/`ArrayAggregate`
  * nodes, which are CodegenFallback — ONE of them in a projection
  * drops the entire stage to interpreted mode, costing ~64 interpreted
  * lambda evaluations per token plus a 64-long intermediate array per
  * row. Here the signature is a tight generated-code loop (static JVM
  * call, primitive arrays, no boxing) — the l08 hot path at corpus
  * scale. The HOF builders remain as the readable specification;
  * SimhashPackSpec pins bit-equality between the two. */
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
  /** Called from generated code — must stay a static-reachable public
    * method. A null token hashes to the seed (42), exactly what
    * Spark's `xxhash64` expression returns for a null input. */
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h =
        if (tokens.isNullAt(i)) 42L
        else XxHash64Function.hash(tokens.getUTF8String(i), StringType, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var packed = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) packed |= (1L << j)
      j += 1
    }
    packed
  }
}
