package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `span_hashes(token_hashes, w) -> array<bigint>`: the rolling w-token
  * span-hash array — per stride-1 window of `w` consecutive token
  * hashes, the base-131 mod 1e9+7 fold — as ONE native codegen'd
  * expression.
  *
  * Bit-identical to the HOF spelling
  * ([[graft.operators.CurationOps.spanHashesExpr]], the readable spec
  * the DuckDB oracles replay and PropertySpec pins against a Scala
  * reference): pure integer mod arithmetic, so a flat native loop and
  * the interpreted lambda fold cannot diverge. Why native: the HOF form
  * (transform ∘ aggregate over a slice per window) is CodegenFallback —
  * the fifth instance of the interpreted-lambda-in-projection lesson
  * (minhash_bands, simhash_pack, kgram_hashes, pq_encode) — and costs
  * O(windows · w) lambda-tree evaluations per document on the l41/l60/
  * l61 hot paths. A null element (unreachable from the tokenizer)
  * nulls every window containing it, exactly as the HOF fold would. */
case class SpanHashesExpr(child: Expression, w: Int)
    extends UnaryExpression {
  require(w > 0, s"span_hashes needs a positive window, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"span_hashes expects ARRAY<BIGINT>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "span_hashes"

  override protected def nullSafeEval(th: Any): Any =
    SpanHashesExpr.compute(th.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SpanHashesExpr.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): SpanHashesExpr =
    copy(child = newChild)
}

object SpanHashesExpr {
  private val Mod = 1000000007L

  /** Called from generated code — must stay a static-reachable public
    * method. */
  def compute(th: ArrayData, w: Int): ArrayData = {
    val n = th.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - w + 1)
    var i = 0
    while (i <= n - w) {
      var h = 0L
      var nul = false
      var j = 0
      while (j < w && !nul) {
        if (th.isNullAt(i + j)) nul = true
        else h = (h * 131L + th.getLong(i + j)) % Mod
        j += 1
      }
      out(i) = if (nul) null else java.lang.Long.valueOf(h)
      i += 1
    }
    new GenericArrayData(out)
  }
}
