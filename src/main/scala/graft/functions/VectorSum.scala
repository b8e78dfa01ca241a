package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, NumericType}

/** `vector_sum(array<double>) -> array<double>`: element-wise sum of
  * vector columns as a native imperative aggregate — the aggregate leg
  * of the extension surface (scalar legs: [[GeohashExpr]] and friends;
  * optimizer leg: IdempotentStringOps), and the workhorse of centroid
  * recomputation.
  *
  * Why native: the declarative alternative is posexplode → hash agg on
  * (key, pos), which multiplies the aggregated row count by the vector
  * dimensionality (64× here) before map-side partial aggregation can
  * absorb it, and turns one result vector into d rows the driver must
  * reassemble. This aggregate keeps one primitive double[] buffer per
  * group, adds d lanes per input ROW (no lambda, no boxing beyond the
  * buffer), and ships k buffers — not k·d rows — through the
  * partial/final exchange. TypedImperativeAggregate is the same
  * machinery Spark's own sketches (HLL++, percentile_approx) run on;
  * it plans as ObjectHashAggregate with full map-side partial merge.
  *
  * Float caveat (by design): element sums are IEEE adds in partition
  * order, exactly like the SUM(x) it replaces — deterministic given a
  * partitioning, not bit-stable across different partitionings. Exact
  * for integer-valued doubles (VectorSumSpec pins that law), which is
  * also why no oracle query exposes raw corpus-order float sums.
  *
  * Semantics: null rows are skipped; null ELEMENTS contribute 0 while
  * the other lanes still accumulate; an all-null/empty group yields
  * NULL; mismatched vector lengths fail fast (silently zip-truncating
  * would corrupt every centroid downstream). */
case class VectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_sum expects ARRAY<DOUBLE> (use VectorSumAgg.withCasts " +
        s"to lift numeric arrays), got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vector_sum"

  /** Empty array = "no input seen yet" (the vector length is unknown
    * until the first row arrives). */
  override def createAggregationBuffer(): Array[Double] =
    Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val b = if (buf.isEmpty) new Array[Double](n) else buf
      require(b.length == n,
        s"vector_sum: mismatched vector lengths ${b.length} vs $n")
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) b(i) += arr.getDouble(i)
        i += 1
      }
      b
    }
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else {
      require(b1.length == b2.length,
        s"vector_sum: mismatched vector lengths ${b1.length} vs ${b2.length}")
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumAgg =
    copy(child = newChild)
}

object VectorSumAgg {
  /** Coerce any numeric-element array to ARRAY<DOUBLE> before the
    * aggregate sees it (the GeohashExpr.withCasts pattern — the
    * implicit-cast trait's input-type vocabulary is private[sql]). */
  def withCasts(child: Expression): VectorSumAgg = child.dataType match {
    case ArrayType(DoubleType, _) => VectorSumAgg(child)
    case ArrayType(FloatType | _: NumericType, _) =>
      VectorSumAgg(Cast(child, ArrayType(DoubleType)))
    case _ => VectorSumAgg(child) // let checkInputDataTypes report it
  }
}

object VectorSum {
  /** Column-API entry: `df.groupBy(k).agg(VectorSum.vectorSum($"vec"))`. */
  def vectorSum(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      VectorSumAgg.withCasts(
        org.apache.spark.sql.graft.ColumnBridge.expression(c))
        .toAggregateExpression())
}
