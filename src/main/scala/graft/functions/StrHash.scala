package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `portable_str_hash(str) -> bigint`: the portable per-code-point
  * polynomial fold ([[PortableHash.strHash]] — (h·131 + cp) mod 1e9+7)
  * as a NATIVE codegen'd scalar.
  *
  * Bit-equal to the HOF spelling `aggregate(split(s,''), 0L, (h,ch) ->
  * pmod(h*131 + ascii(ch), M))` ([[Text.portableStrHashSql]], the form
  * every DuckDB oracle replays) — the fold itself was already native
  * inside minhash_bands/kgram_hashes/simhash_pack; this exposes it for
  * the DIRECT projection sites (per-shingle, per-gram, whole-document
  * hashes), where the HOF form runs as an interpreted lambda per
  * CHARACTER (CodegenFallback — the sixth instance of the lesson). */
case class PortableStrHashExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"portable_str_hash expects STRING, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "portable_str_hash"

  override protected def nullSafeEval(s: Any): Any =
    PortableHash.strHash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableHash.strHash($c)")

  override protected def withNewChildInternal(newChild: Expression): PortableStrHashExpr =
    copy(child = newChild)
}

/** `token_hashes(array<string>) -> array<bigint>`: [[PortableHash.strHash]]
  * mapped over a token array in one native pass — replaces the
  * interpreted `transform(toks, t -> <char fold>)` front end of the
  * span/bucket families (a lambda per token TIMES a lambda per
  * character). A null element hashes to null, exactly as the HOF fold
  * over a null token would. */
case class TokenHashesExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_hashes expects ARRAY<STRING>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "token_hashes"

  override protected def nullSafeEval(toks: Any): Any =
    TokenHashesExpr.compute(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenHashesExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenHashesExpr =
    copy(child = newChild)
}

object TokenHashesExpr {
  /** Called from generated code — must stay a static-reachable public
    * method. */
  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (toks.isNullAt(i)) null
        else java.lang.Long.valueOf(
          PortableHash.strHash(toks.getUTF8String(i)))
      i += 1
    }
    new GenericArrayData(out)
  }
}
