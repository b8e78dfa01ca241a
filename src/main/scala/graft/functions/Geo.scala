package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, NullType, NumericType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Geohash encoding (the ST_GEOHASH analog the reference uses as a
  * generated column, /root/reference/PRD.md:1074-1079). Implemented as
  * a codegen'd Catalyst [[GeohashExpr]] (pattern: [[ZOrderInterleave]])
  * rather than a UDF, so a scan-wide generated-column projection stays
  * inside whole-stage codegen with no boxing or closure dispatch. */
object Geo {
  private val base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Reference geohash bisection. Called from generated code — must
    * stay a static-reachable public method. */
  def encode(lat: Double, lon: Double, precision: Int): String = {
    require(precision > 0 && precision <= 12)
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    val sb = new StringBuilder
    var isLon = true
    var bit = 0
    var ch = 0
    while (sb.length < precision) {
      if (isLon) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      isLon = !isLon
      bit += 1
      if (bit == 5) { sb.append(base32(ch)); bit = 0; ch = 0 }
    }
    sb.toString()
  }

  def geohashCol(lat: Column, lon: Column, precision: Int): Column =
    ColumnBridge.column(GeohashExpr.withCasts(
      ColumnBridge.expression(lat),
      ColumnBridge.expression(lon),
      ColumnBridge.expression(lit(precision))))
}

/** `geohash(lat DOUBLE, lon DOUBLE, precision INT) -> STRING` as a
  * native ternary expression: null-safe, constant-foldable, and
  * whole-stage-codegen'd (the generated code calls the static
  * [[Geo.encode]] directly). Registered as the SQL function `geohash`
  * by `graft.core.GraftExtensions`. */
case class GeohashExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == DoubleType && second.dataType == DoubleType &&
      third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"geohash expects (DOUBLE, DOUBLE, INT), got " +
        s"(${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql})")
  override def dataType: DataType = StringType
  override def prettyName: String = "geohash"

  override protected def nullSafeEval(lat: Any, lon: Any, p: Any): Any =
    UTF8String.fromString(Geo.encode(lat.asInstanceOf[Double],
      lon.asInstanceOf[Double], p.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (la, lo, p) =>
      s"UTF8String.fromString(graft.functions.Geo.encode($la, $lo, $p))")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): GeohashExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object GeohashExpr {
  /** Argument coercion the old ScalaUDF path got from the analyzer
    * for free: numeric args (`geohash(57, 10, 7)`, FLOAT/DECIMAL
    * coordinate columns), string args (ANSI cast — throws on malformed
    * input at runtime, exactly as the UDF-era implicit cast did), and
    * bare NULL literals all insert an explicit Cast; other types pass
    * through unchanged so `checkInputDataTypes` still rejects them
    * with the precise message. (Spark 4 hides `AbstractDataType` from
    * external expressions, so the `ImplicitCastInputTypes` trait
    * itself is not implementable here — the builder inserts the casts
    * instead.) */
  private def coerce(e: Expression, t: DataType): Expression =
    if (e.dataType == t) e
    else e.dataType match {
      case _: NumericType | StringType | NullType => Cast(e, t)
      case _ => e
    }

  def withCasts(lat: Expression, lon: Expression,
      precision: Expression): GeohashExpr =
    GeohashExpr(coerce(lat, DoubleType), coerce(lon, DoubleType),
      coerce(precision, IntegerType))
}
