package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Geohash encoding (the ST_GEOHASH analog the reference uses as a
  * generated column, /root/reference/PRD.md:1074-1079). Pure Scala,
  * registered as a UDF — geo functions sit on the schema-evolution
  * surface, never in an aggregation hot path (SURVEY.md §2.12), so a
  * UDF is acceptable; a codegen Expression would be the upgrade if it
  * ever moved into a scan-wide projection. */
object Geo {
  private val base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

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

  val geohash = udf((lat: Double, lon: Double, p: Int) => encode(lat, lon, p))

  def geohashCol(lat: Column, lon: Column, precision: Int): Column =
    geohash(lat, lon, org.apache.spark.sql.functions.lit(precision))
}
