package graft.index

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, DataTypes, LongType}

/**
 * Hilbert curve index — the locality-optimal space-filling curve next
 * to the Morton Z-order ([[Cells]] packs Morton; data-layout systems
 * offer both because Hilbert's successive indices are always
 * 4-adjacent cells, so a 1-D range scan touches a compact 2-D blob
 * with no Z-shaped jumps — the property the HilbertSpec pins and
 * Morton provably lacks).
 *
 * Algorithm: the standard quadrant-rotation walk (Hilbert 1891; the
 * rx/ry/rotate formulation is the textbook public-domain one): per
 * level s = 2^k, quadrant digit `(3·rx) xor ry` scales by s², then the
 * sub-square reflects/transposes. Pure integer; the identical
 * iteration unrolls into the DuckDB dual's chained CTE levels, so the
 * oracle pins every bit.
 */
object Hilbert {

  final val MaxRes = 30

  /** (cx, cy) -> distance along the order-`res` Hilbert curve.
    * Coordinates must sit in [0, 2^res). Called from generated code. */
  def xy2d(res: Int, cx: Long, cy: Long): Long = {
    var x = cx
    var y = cy
    var d = 0L
    var s = 1L << (res - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate the sub-square so the next level sees canonical frame
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse: curve distance -> (cx, cy). */
  def d2xy(res: Int, d: Long): (Long, Long) = {
    var x = 0L
    var y = 0L
    var t = d
    var s = 1L
    while (s < (1L << res)) {
      val rx = (t / 2) & 1L
      val ry = (t ^ rx) & 1L
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}

/** Codegen'd Hilbert index of integer cell coordinates. */
case class HilbertExpr(cxExpr: Expression, cyExpr: Expression, res: Int)
    extends BinaryExpression {

  require(res >= 1 && res <= Hilbert.MaxRes,
    s"res $res out of [1,${Hilbert.MaxRes}]")

  override def left: Expression = cxExpr
  override def right: Expression = cyExpr
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert expects (bigint, bigint), got " +
        s"(${left.dataType}, ${right.dataType})")
  override def prettyName: String = "graft_hilbert"

  override def nullSafeEval(cx: Any, cy: Any): Any =
    Hilbert.xy2d(res, cx.asInstanceOf[Long], cy.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.index.Hilbert.xy2d($res, $x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(cxExpr = newLeft, cyExpr = newRight)
}

object HilbertFunctions {
  def hilbert(cx: Column, cy: Column, res: Int): Column =
    Bridge.column(HilbertExpr(Bridge.expression(cx), Bridge.expression(cy), res))

  /** The xy2d iteration unrolled as chained SQL CTEs for the DuckDB
    * dual: `srcCte(x, y, ...carry)` -> final CTE named `out` exposing
    * `h` plus the carried columns. */
  def xy2dSqlCtes(srcCte: String, res: Int, carry: Seq[String]): String = {
    // p.-qualify every reference: DuckDB lateral column aliases would
    // otherwise let the freshly-aliased x shadow the source x inside
    // the y expression
    val cols = carry.map(c => s"p.$c").mkString(", ")
    val levels = (0 until res).map { i =>
      val s = 1L << (res - 1 - i)
      val prev = if (i == 0) srcCte else s"h$i"
      val last = i == res - 1
      val name = if (last) "out" else s"h${i + 1}"
      // rx/ry from the incoming (x, y); d accrues; frame rotates
      s"""$name AS (SELECT $cols,
         |  p.d + $s * $s *
         |    xor(3 * (CASE WHEN (p.x & $s) > 0 THEN 1 ELSE 0 END),
         |        (CASE WHEN (p.y & $s) > 0 THEN 1 ELSE 0 END))
         |    AS ${if (last) "h" else "d"},
         |  CASE WHEN (p.y & $s) = 0 THEN
         |    (CASE WHEN (p.x & $s) > 0 THEN ${s - 1} - p.y ELSE p.y END)
         |  ELSE p.x END AS x,
         |  CASE WHEN (p.y & $s) = 0 THEN
         |    (CASE WHEN (p.x & $s) > 0 THEN ${s - 1} - p.x ELSE p.x END)
         |  ELSE p.y END AS y
         |  FROM $prev p)""".stripMargin
    }
    levels.mkString(",\n")
  }
}
