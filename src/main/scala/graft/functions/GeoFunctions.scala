package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Geohash cell encoding — the reference engine family's
  * `geohashEncode(lon, lat, precision)`: 5·precision bisection bits,
  * longitude first, base-32 alphabet. The kernel bisects with the
  * SAME double midpoint arithmetic ((lo+hi)/2, bit = v ≥ mid) that a
  * SQL recursive-CTE replay performs, so cell assignments replay
  * bit-identically across engines — cells are join keys (spatial
  * bucketing, neighbor lookups), where an off-by-one-ulp cell split
  * would silently desync two engines' buckets. */
object GeoOps {

  private val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  def geohash(lat: Double, lon: Double, precision: Int): UTF8String = {
    var loLon = -180.0; var hiLon = 180.0
    var loLat = -90.0; var hiLat = 90.0
    val nBits = 5 * precision
    var acc = 0L
    var i = 0
    while (i < nBits) {
      if ((i & 1) == 0) { // even bit: longitude
        val mid = (loLon + hiLon) / 2
        if (lon >= mid) { acc = (acc << 1) | 1L; loLon = mid }
        else { acc = acc << 1; hiLon = mid }
      } else {
        val mid = (loLat + hiLat) / 2
        if (lat >= mid) { acc = (acc << 1) | 1L; loLat = mid }
        else { acc = acc << 1; hiLat = mid }
      }
      i += 1
    }
    val out = new Array[Byte](precision)
    i = 0
    while (i < precision) {
      val shift = 5 * (precision - 1 - i)
      out(i) = Alphabet.charAt(((acc >> shift) & 31L).toInt).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** `geohash_encode(lat, lon)` at a literal precision (1..12). */
case class GeohashEncode(left: Expression, right: Expression, precision: Int)
    extends BinaryExpression {

  require(precision >= 1 && precision <= 12,
    s"geohash_encode: precision must be in [1,12], got $precision")

  override def prettyName: String = "geohash_encode"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double lat, double lon), got $l / $r")
    }

  override protected def nullSafeEval(lat: Any, lon: Any): Any =
    GeoOps.geohash(lat.asInstanceOf[Double], lon.asInstanceOf[Double],
      precision)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lat, lon) =>
      s"${ev.value} = graft.functions.GeoOps.geohash($lat, $lon, $precision);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GeohashEncode =
    copy(left = newLeft, right = newRight)
}
