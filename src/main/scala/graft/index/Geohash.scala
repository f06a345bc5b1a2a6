package graft.index

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Geohash (Niemeyer 2008) — the third public cell index next to the
 * Morton quad cells ([[Cells]]) and the hex lattice ([[HexCells]]):
 * base-32 strings whose PREFIXES nest, so "partition by cell prefix"
 * (the north rule) is a `substr`, and a prefix range scan is a string
 * range — the property that makes geohash the standard key for
 * lexicographically-sorted stores.
 *
 * Encoding: 5 bits per character, bits alternate longitude-first
 * (MSB = lon) between the binary-search refinements of lon in
 * [-180, 180) and lat in [-90, 90). Exact integer form: for 5p bits,
 * lonIdx = floor((lon+180)/360 · 2^ceil(5p/2)) and latIdx likewise at
 * floor(5p/2) bits, interleaved MSB-first. One IEEE multiply + floor
 * per axis (identical across engines), then pure bit arithmetic.
 */
object Geohash {

  final val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"
  final val MaxPrecision = 12 // 60 bits

  private def idx(v: Double, half: Double, span: Double, bits: Int): Long = {
    val n = 1L << bits
    val i = math.floor((v + half) / span * n.toDouble).toLong
    if (i < 0L) 0L else if (i >= n) n - 1L else i
  }

  /** The packed 5p-bit geohash value (lon-first MSB interleave). */
  def value(lon: Double, lat: Double, p: Int): Long = {
    val total = 5 * p
    val nlon = (total + 1) / 2
    val nlat = total / 2
    val li = idx(lon, 180.0, 360.0, nlon)
    val la = idx(lat, 90.0, 180.0, nlat)
    var v = 0L
    var i = 0
    while (i < total) {
      val b =
        if ((i & 1) == 0) (li >>> (nlon - 1 - (i >> 1))) & 1L
        else (la >>> (nlat - 1 - (i >> 1))) & 1L
      v = (v << 1) | b
      i += 1
    }
    v
  }

  def encode(lon: Double, lat: Double, p: Int): String = {
    require(p >= 1 && p <= MaxPrecision, s"precision $p out of [1,$MaxPrecision]")
    val v = value(lon, lat, p)
    val sb = new java.lang.StringBuilder(p)
    var k = 0
    while (k < p) {
      sb.append(Base32.charAt(((v >>> (5 * (p - 1 - k))) & 31L).toInt))
      k += 1
    }
    sb.toString
  }

  /** Called from generated code. */
  def encodeUtf8(lon: Double, lat: Double, p: Int): UTF8String =
    UTF8String.fromString(encode(lon, lat, p))

  /** Cell center of a geohash string — the decode side of the index. */
  def center(gh: String): (Double, Double) = {
    var lonLo = -180.0; var lonHi = 180.0
    var latLo = -90.0; var latHi = 90.0
    var i = 0
    var lonTurn = true
    while (i < gh.length) {
      val d = Base32.indexOf(gh.charAt(i))
      require(d >= 0, s"bad geohash char '${gh.charAt(i)}'")
      var b = 4
      while (b >= 0) {
        val bit = (d >> b) & 1
        if (lonTurn) {
          val mid = (lonLo + lonHi) / 2
          if (bit == 1) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (bit == 1) latLo = mid else latHi = mid
        }
        lonTurn = !lonTurn
        b -= 1
      }
      i += 1
    }
    ((lonLo + lonHi) / 2, (latLo + latHi) / 2)
  }
}

/** Codegen'd geohash-encode: a single static call inside whole-stage
  * codegen, same contract as [[CellIdExpr]]. */
case class GeohashExpr(lonExpr: Expression, latExpr: Expression, p: Int)
    extends BinaryExpression {

  require(p >= 1 && p <= Geohash.MaxPrecision,
    s"precision $p out of [1,${Geohash.MaxPrecision}]")

  override def left: Expression = lonExpr
  override def right: Expression = latExpr
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_geohash expects (double, double), got (${left.dataType}, ${right.dataType})")
  override def prettyName: String = "graft_geohash"

  override def nullSafeEval(lon: Any, lat: Any): Any =
    Geohash.encodeUtf8(lon.asInstanceOf[Double], lat.asInstanceOf[Double], p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, a) => s"graft.index.Geohash.encodeUtf8($l, $a, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(lonExpr = newLeft, latExpr = newRight)
}

object GeohashFunctions {
  def geohash(lon: Column, lat: Column, p: Int): Column =
    Bridge.column(GeohashExpr(Bridge.expression(lon), Bridge.expression(lat), p))
}
