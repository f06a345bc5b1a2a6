package graft.index

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/**
 * H3-facade hexagonal index: pointy-top axial hex binning on the
 * lon/lat plane with cube rounding — the hexagonal-cell semantics of H3
 * (every point maps to exactly one hex, neighbors are 6-regular)
 * implemented from scratch on a flat projection (no icosahedron; this
 * environment has no H3 jar, and the engine's index contract only needs
 * deterministic hierarchical binning — see SURVEY.md §2.11).
 *
 * Resolution r: hex circumradius = 360 / (4 * 2^r) degrees. Cell id
 * packs (res << 56) | (q + OFF) << 28 | (rr + OFF) in axial coords.
 */
object HexCells {
  final val MaxRes = 15
  private final val Off = 1L << 27

  def size(res: Int): Double = 360.0 / (4.0 * (1L << res).toDouble)

  /** lon/lat -> axial (q, r) with cube rounding. */
  def axial(lon: Double, lat: Double, res: Int): (Long, Long) = {
    val s = size(res)
    val qf = (math.sqrt(3.0) / 3.0 * lon - 1.0 / 3.0 * lat) / s
    val rf = (2.0 / 3.0 * lat) / s
    // cube round
    val xf = qf; val zf = rf; val yf = -xf - zf
    var rx = math.round(xf).toDouble
    var ry = math.round(yf).toDouble
    var rz = math.round(zf).toDouble
    val dx = math.abs(rx - xf); val dy = math.abs(ry - yf); val dz = math.abs(rz - zf)
    if (dx > dy && dx > dz) rx = -ry - rz
    else if (dy > dz) ry = -rx - rz
    else rz = -rx - ry
    (rx.toLong, rz.toLong)
  }

  def encode(lon: Double, lat: Double, res: Int): Long = {
    val (q, r) = axial(lon, lat, res)
    (res.toLong << 56) | ((q + Off) << 28) | (r + Off)
  }

  def res(cell: Long): Int = (cell >>> 56).toInt
  def q(cell: Long): Long = ((cell >> 28) & 0xFFFFFFFL) - Off
  def r(cell: Long): Long = (cell & 0xFFFFFFFL) - Off

  /** Hex center in lon/lat (inverse of the axial transform). */
  def center(cell: Long): (Double, Double) = {
    val s = size(res(cell))
    val qq = q(cell).toDouble; val rr = r(cell).toDouble
    val lat = 1.5 * rr * s
    val lon = (qq * s + lat / 3.0) * 3.0 / math.sqrt(3.0)
    (lon, lat)
  }

  /** The 6 axial neighbors. */
  def neighbors(cell: Long): Array[Long] = {
    val rs = res(cell); val qq = q(cell); val rr = r(cell)
    Array((1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)).map { case (dq, dr) =>
      (rs.toLong << 56) | ((qq + dq + Off) << 28) | (rr + dr + Off)
    }
  }
}

/** Codegen'd hex cell id expression (same shape as CellIdExpr). */
case class HexCellIdExpr(lonExpr: Expression, latExpr: Expression, res: Int)
    extends BinaryExpression {
  require(res >= 0 && res <= HexCells.MaxRes)
  override def left: Expression = lonExpr
  override def right: Expression = latExpr
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hex_cell"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_hex_cell expects (double, double)")

  override def nullSafeEval(lon: Any, lat: Any): Any =
    HexCells.encode(lon.asInstanceOf[Double], lat.asInstanceOf[Double], res)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, a) => s"graft.index.HexCells.encode($l, $a, $res)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(lonExpr = newLeft, latExpr = newRight)
}

object HexCellFunctions {
  def hexCellId(lon: Column, lat: Column, res: Int): Column =
    Bridge.column(HexCellIdExpr(Bridge.expression(lon), Bridge.expression(lat), res))
}
