package graft.index

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/**
 * Native Catalyst expression for the cell index (SURVEY.md §2.11:
 * "cell encode ... promote to a codegen'd Expression"). Stays inside
 * whole-stage codegen — the generated code is a single static call, no
 * boxing, no UDF serialization.
 */
case class CellIdExpr(lonExpr: Expression, latExpr: Expression, res: Int)
    extends BinaryExpression {

  require(res >= 0 && res <= Cells.MaxRes, s"resolution $res out of [0,${Cells.MaxRes}]")

  override def left: Expression = lonExpr
  override def right: Expression = latExpr
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cell expects (double, double), got (${left.dataType}, ${right.dataType})")
  override def prettyName: String = "graft_cell"

  override def nullSafeEval(lon: Any, lat: Any): Any =
    Cells.encode(lon.asInstanceOf[Double], lat.asInstanceOf[Double], res)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, a) => s"graft.index.Cells.encode($l, $a, $res)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(lonExpr = newLeft, latExpr = newRight)
}

/** Column-API surface for the index expressions. */
object CellFunctions {
  /** Cell id of (lon, lat) at resolution res. */
  def cellId(lon: Column, lat: Column, res: Int): Column =
    Bridge.column(CellIdExpr(Bridge.expression(lon), Bridge.expression(lat), res))

  /** Coarser prefix of an existing cell column (pure arithmetic). */
  def cellParent(cell: Column, dr: Int): Column = {
    import org.apache.spark.sql.functions._
    val r = shiftrightunsigned(cell, 56)
    val morton = cell.bitwiseAND(0x00FFFFFFFFFFFFFFL)
    shiftleft(r - dr, 56).bitwiseOR(shiftrightunsigned(morton, 2 * dr))
  }
}
