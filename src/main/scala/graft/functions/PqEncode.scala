package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructType}

/** `pq_encode(vec, cents) -> array<int>`: product-quantization encoding
  * — the per-subspace nearest-codeword argmin — as ONE native codegen'd
  * expression.
  *
  * `vec` is the `m*sub`-dim ARRAY<DOUBLE> vector; `cents` the broadcast
  * codebook, ARRAY<STRUCT<cid INT, cvec ARRAY<DOUBLE>>> (the
  * collect_list struct the PQ family builds — see
  * [[graft.operators.LlmOps.pqEncode]]). The output code is `m` small
  * ints, subspace `i`'s entry the cid minimizing squared-L2 between the
  * aligned `sub`-dim slices, ties to the LOWEST cid — exactly the fold
  * the SQL HOF chain evaluates, so results are bit-identical to the
  * DuckDB oracle replay (the per-subspace distance is the same
  * sequential IEEE sum `(a,v) -> a + v` both engines run in array
  * order, and the tie rule makes the argmin independent of codebook
  * array order).
  *
  * Why native: the HOF form (transform ∘ aggregate ∘ named_struct
  * argmin over 16 codewords × 8 subspaces) is CodegenFallback — every
  * encoded vector paid ~128 interpreted lambda-tree evaluations plus
  * struct allocations. This is the fourth instance of the
  * CodegenFallback-in-projection lesson (minhash_bands, simhash_pack,
  * kgram_hashes): the generated code is a flat primitive loop. */
case class PqEncodeExpr(left: Expression, right: Expression, m: Int, sub: Int)
    extends BinaryExpression {
  require(m > 0 && sub > 0, s"pq_encode needs positive geometry, got m=$m sub=$sub")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(st: StructType, _))
        if st.size == 2 && st(0).dataType == IntegerType &&
          st(1).dataType.isInstanceOf[ArrayType] &&
          st(1).dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects (ARRAY<DOUBLE>, ARRAY<STRUCT<cid INT, cvec ARRAY<DOUBLE>>>), " +
        s"got (${l.sql}, ${r.sql})")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(vec: Any, cents: Any): Any =
    PqEncodeExpr.compute(vec.asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData], m, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.PqEncodeExpr.compute($v, $c, $m, $sub)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqEncodeExpr =
    copy(left = newLeft, right = newRight)
}

object PqEncodeExpr {
  /** Called from generated code — must stay a static-reachable public
    * method. Semantics pinned to the HOF chain it replaced: argmin
    * seeds at (1e308, -1) with strict `d < best OR (d == best AND
    * cid < bestCid)`, and each subspace distance is the sequential
    * in-order sum of squared deltas (bit-identical IEEE fold). */
  def compute(vec: ArrayData, cents: ArrayData, m: Int, sub: Int): ArrayData = {
    val k = cents.numElements()
    val code = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val off = mi * sub
      var best = 1e308
      var bestCid = -1
      var ki = 0
      while (ki < k) {
        val st = cents.getStruct(ki, 2)
        val cid = st.getInt(0)
        val cvec = st.getArray(1)
        var d = 0.0
        var j = 0
        while (j < sub) {
          val x = vec.getDouble(off + j) - cvec.getDouble(off + j)
          d += x * x
          j += 1
        }
        if (d < best || (d == best && cid < bestCid)) { best = d; bestCid = cid }
        ki += 1
      }
      code(mi) = bestCid
      mi += 1
    }
    new GenericArrayData(code)
  }
}
