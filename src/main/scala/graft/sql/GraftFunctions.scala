package graft.sql

import graft.index.{CellIdExpr, HexCellIdExpr}
import graft.similarity.DotProductExpr
import graft.sketch.{FreqItemsAgg, KllQuantilesAgg, Sketches, ThetaEstimateExpr, ThetaSketchAgg, ThetaUnionAgg, TopKAgg}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData

/**
 * SQL surface for the engine's custom Catalyst expressions, so
 * `spark.sql("SELECT graft_cell(lon, lat, 10) ...")` works the same as
 * the Column API. Two entry points, one builder list:
 *
 *  - `GraftFunctions.register(spark)` — add to an existing session
 *    (what the engine mains and tests use);
 *  - `spark.sql.extensions=graft.sql.GraftExtensions` — spark-submit
 *    config injection for clusters, same builders via
 *    `SparkSessionExtensions.injectFunction`.
 *
 * Sizing arguments (resolution, lgK, k, quantile probs) must be
 * foldable — they parameterize the expression instance itself.
 */
object GraftFunctions {

  private def constInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"$what: got $other")
    }
  }

  private def constLong(e: Expression, what: String): Long = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(s"$what: got $other")
    }
  }

  private def constDoubles(e: Expression, what: String): Seq[Double] = {
    require(e.foldable, s"$what must be a literal array")
    (e.eval(), e.dataType) match {
      case (a: ArrayData, org.apache.spark.sql.types.ArrayType(et, _)) =>
        // SQL fractional literals parse as decimals — coerce per element
        a.toObjectArray(et).toSeq.map {
          case d: org.apache.spark.sql.types.Decimal => d.toDouble
          case n: java.lang.Number => n.doubleValue()
          case other => throw new IllegalArgumentException(s"$what: got $other")
        }
      case other => throw new IllegalArgumentException(s"$what: got $other")
    }
  }

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft", name)

  /** (identifier, info, builder) triples — the single source of truth. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_cell"), info("graft_cell"),
      { args: Seq[Expression] =>
        require(args.length == 3, "graft_cell(lon, lat, res)")
        CellIdExpr(args(0), args(1), constInt(args(2), "res")) }),
    (FunctionIdentifier("graft_hex_cell"), info("graft_hex_cell"),
      { args: Seq[Expression] =>
        require(args.length == 3, "graft_hex_cell(lon, lat, res)")
        HexCellIdExpr(args(0), args(1), constInt(args(2), "res")) }),
    (FunctionIdentifier("graft_dot"), info("graft_dot"),
      { args: Seq[Expression] =>
        require(args.length == 2, "graft_dot(a, b)")
        DotProductExpr(args(0), args(1)) }),
    (FunctionIdentifier("graft_theta_estimate"), info("graft_theta_estimate"),
      { args: Seq[Expression] =>
        require(args.length == 1, "graft_theta_estimate(sketch)")
        ThetaEstimateExpr(args(0)) }),
    (FunctionIdentifier("graft_theta_distinct"), info("graft_theta_distinct"),
      { args: Seq[Expression] =>
        require(args.length == 1 || args.length == 2, "graft_theta_distinct(x[, lgK])")
        val lgK = if (args.length == 2) constInt(args(1), "lgK") else Sketches.DefaultLgK
        ThetaSketchAgg(args(0), lgK, emitSketch = false) }),
    (FunctionIdentifier("graft_theta_sketch"), info("graft_theta_sketch"),
      { args: Seq[Expression] =>
        require(args.length == 1 || args.length == 2, "graft_theta_sketch(x[, lgK])")
        val lgK = if (args.length == 2) constInt(args(1), "lgK") else Sketches.DefaultLgK
        ThetaSketchAgg(args(0), lgK, emitSketch = true) }),
    (FunctionIdentifier("graft_theta_union"), info("graft_theta_union"),
      { args: Seq[Expression] =>
        require(args.length == 1 || args.length == 2, "graft_theta_union(sk[, lgK])")
        val lgK = if (args.length == 2) constInt(args(1), "lgK") else Sketches.DefaultLgK
        ThetaUnionAgg(args(0), lgK, emitSketch = false) }),
    (FunctionIdentifier("graft_theta_union_sketch"), info("graft_theta_union_sketch"),
      { args: Seq[Expression] =>
        require(args.length == 1 || args.length == 2, "graft_theta_union_sketch(sk[, lgK])")
        val lgK = if (args.length == 2) constInt(args(1), "lgK") else Sketches.DefaultLgK
        ThetaUnionAgg(args(0), lgK, emitSketch = true) }),
    (FunctionIdentifier("graft_freq_items"), info("graft_freq_items"),
      { args: Seq[Expression] =>
        require(args.length == 2 || args.length == 3,
          "graft_freq_items(x, minCount[, maxMapSize])")
        val mm = if (args.length == 3) constInt(args(2), "maxMapSize") else 2048
        FreqItemsAgg(args(0), mm, constLong(args(1), "minCount")) }),
    (FunctionIdentifier("graft_kll_quantiles"), info("graft_kll_quantiles"),
      { args: Seq[Expression] =>
        require(args.length == 2 || args.length == 3, "graft_kll_quantiles(x, probs[, k])")
        val k = if (args.length == 3) constInt(args(2), "k") else 200
        KllQuantilesAgg(args(0), k, constDoubles(args(1), "probs")) }),
    (FunctionIdentifier("graft_topk"), info("graft_topk"),
      { args: Seq[Expression] =>
        require(args.length == 3, "graft_topk(item, score, k)")
        TopKAgg(args(0), args(1), constInt(args(2), "k")) }))

  /** Register every graft function on an existing session, plus the
    * [[DotProductRewrite]] optimizer rule (idempotent). */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(DotProductRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ DotProductRewrite
  }
}

/** `--conf spark.sql.extensions=graft.sql.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => DotProductRewrite)
  }
}
