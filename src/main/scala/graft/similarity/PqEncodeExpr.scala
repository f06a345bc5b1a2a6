package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/**
 * Native codegen'd PQ encode: `array<double>` vector -> `array<int>` of
 * `m` codebook codes, one per subspace.
 *
 * The composed form (per subspace x per code, an
 * `aggregate(zip_with(slice(...)))` distance fold, argmin via `least`
 * over structs) is semantically identical but builds a
 * m x ncode-subexpression tree — 512 higher-order folds at
 * m=16/ncode=32 — whose analysis/optimization cost dominates the whole
 * query (measured 40 s at sf0.1) and whose evaluation never enters
 * whole-stage codegen. This expression carries the flattened codebook
 * as one reference object and runs the identical arithmetic as a tight
 * primitive loop inside codegen.
 *
 * Exact parity contract (q_pq_topk's DuckDB dual replays encode from
 * the staged codebook table): per subspace the squared distance is the
 * ascending-index fold of `(x - c)^2` starting at 0.0, and the argmin
 * keeps the FIRST minimum — ties prefer the smaller code, matching both
 * `least(struct(d, code))` and SQL `row_number() OVER (ORDER BY d,
 * code)`. A vector of the wrong length or with a null element yields
 * NULL.
 *
 * `cents` is the flattened codebook: entry `((s * ncode) + c) * w + i`
 * = component i of centroid c of subspace s (kept as a Seq so the case
 * class keeps value equality for plan canonicalization; evaluation uses
 * the cached primitive array).
 */
case class PqEncodeExpr(child: Expression, cents: Seq[Double],
                        m: Int, ncode: Int, w: Int)
    extends UnaryExpression {

  require(cents.length == m * ncode * w,
    s"codebook length ${cents.length} != $m*$ncode*$w")

  @transient private lazy val arr: Array[Double] = cents.toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"graft_pq_encode expects array<double>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = m * w
    if (v.numElements() != dim) return null
    var i = 0
    while (i < dim) { if (v.isNullAt(i)) return null; i += 1 }
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = 0.0
      var c = 0
      while (c < ncode) {
        val off = (s * ncode + c) * w
        var d = 0.0
        var j = 0
        while (j < w) {
          val t = v.getDouble(s * w + j) - arr(off + j)
          d += t * t
          j += 1
        }
        if (c == 0 || d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCents", arr, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val off = ctx.freshName("off")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val codes = ctx.freshName("codes")
      val bad = ctx.freshName("bad")
      s"""
         |if ($v.numElements() != ${m * w}) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $bad = false;
         |  for (int $i = 0; $i < ${m * w}; $i++) {
         |    if ($v.isNullAt($i)) { $bad = true; break; }
         |  }
         |  if ($bad) {
         |    ${ev.isNull} = true;
         |  } else {
         |    int[] $codes = new int[$m];
         |    for (int $s = 0; $s < $m; $s++) {
         |      int $best = 0;
         |      double $bestD = 0.0;
         |      for (int $c = 0; $c < $ncode; $c++) {
         |        int $off = ($s * $ncode + $c) * $w;
         |        double $d = 0.0;
         |        for (int $j = 0; $j < $w; $j++) {
         |          double $t = $v.getDouble($s * $w + $j) - $cb[$off + $j];
         |          $d += $t * $t;
         |        }
         |        if ($c == 0 || $d < $bestD) { $bestD = $d; $best = $c; }
         |      }
         |      $codes[$s] = $best;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  def apply(v: Column, cb: Pq.Codebooks): Column = {
    val flat = for {
      s <- 0 until cb.m
      c <- 0 until cb.ncode
      i <- 0 until cb.w
    } yield cb.cents(s)(c)(i)
    Bridge.column(PqEncodeExpr(Bridge.expression(v), flat, cb.m, cb.ncode, cb.w))
  }
}
