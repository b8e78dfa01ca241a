package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 2-way Morton (Z-order) bit interleave.
  *
  * The storage-layout upgrade for the reference's 'sort' rewrite
  * strategy (/root/reference/src/maintenance/iceberg_maintenance.py:95-127):
  * sorting by `zorder_interleave(a, b)` clusters BOTH dimensions into
  * parquet row groups, so min/max stats prune scans filtered on either
  * column — lexicographic sort only prunes the leading key.
  *
  * Implemented as a codegen'd `BinaryExpression` (not a UDF): the hot
  * path stays inside whole-stage codegen with no boxing or closure
  * dispatch. Inputs are treated as unsigned 32-bit values (callers pass
  * dictionary-encoded/bucketed keys); bits of `left` occupy even
  * positions, `right` odd.
  */
case class ZOrderInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder_interleave expects (BIGINT, BIGINT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_interleave"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    ZOrderInterleave.interleave(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.ZOrderInterleave.interleave($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderInterleave =
    copy(left = newLeft, right = newRight)
}

object ZOrderInterleave {
  /** Spread the lower 32 bits of `v` to even bit positions. */
  private def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code: left bits even, right bits odd. Called from generated
    * code — must stay a static-reachable public method. */
  def interleave(l: Long, r: Long): Long = spread(l) | (spread(r) << 1)
}
