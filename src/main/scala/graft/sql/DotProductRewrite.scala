package graft.sql

import graft.similarity.DotProductExpr
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/**
 * Optimizer rule: rewrite the portable higher-order-function dot-product
 * fold
 *
 *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, t) -> acc + t)
 *
 * (and the self-dot variant `aggregate(transform(v, x -> x * x), ...)`)
 * into the codegen'd [[DotProductExpr]]. Higher-order functions never
 * enter whole-stage codegen — each element pays an interpreted closure
 * call with a boxed accumulator — so a user writing the portable SQL
 * form silently loses an order of magnitude on the similarity hot path;
 * this rule gives them the native expression automatically.
 *
 * Strictly semantics-preserving, which is why the match is narrow:
 *  - both inputs must already be `array<double>` (no implicit casts);
 *  - the zip lambda must be exactly `x * y` over the two lambda
 *    variables in argument order, the merge exactly `acc + t`, the
 *    finish the identity;
 *  - the zero must be literal 0.0 double.
 * Null/shape parity holds by construction: zip_with pads a shorter
 * array with nulls, making the fold NULL — DotProductExpr returns NULL
 * on length mismatch or a null element; and both compute the identical
 * IEEE sequence `((0.0 + t0) + t1) + ...` (the expression also starts
 * its accumulator at 0.0 and adds in ascending index order).
 *
 * Injected via `spark.experimental.extraOptimizations` in
 * [[GraftFunctions.register]] and `injectOptimizerRule` in
 * [[GraftExtensions]] — both run after the main optimizer batches, so
 * constant folding has already normalized the zero literal.
 */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** `(p, q) -> p * q` with p, q being THE two lambda variables in
    * order (any eval mode — doubles behave identically in ANSI). */
  private def isPairProduct(f: Expression): Option[Unit] = f match {
    case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _)
        if x.exprId == a.exprId && y.exprId == b.exprId => Some(())
    case _ => None
  }

  /** `x -> x * x` over the single lambda variable. */
  private def isSelfProduct(f: Expression): Option[Unit] = f match {
    case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable), _)
        if x.exprId == a.exprId && y.exprId == a.exprId => Some(())
    case _ => None
  }

  /** `(acc, t) -> acc + t` in argument order. */
  private def isSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      x.exprId == a.exprId && y.exprId == b.exprId
    case _ => false
  }

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  private def isZero(e: Expression): Boolean = e match {
    case Literal(0.0d, DoubleType) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(a, b, zf), zero, merge, finish)
          if isDoubleArray(a) && isDoubleArray(b) &&
            isPairProduct(zf).isDefined && isZero(zero) &&
            isSumMerge(merge) && isIdentityFinish(finish) =>
        DotProductExpr(a, b)
      // self-dot duplicates `v` into both children, so `v` must be
      // deterministic — rewriting sum-of-squares over e.g. shuffle(arr)
      // would evaluate two DIFFERENT permutations and pair mismatched
      // elements (silently wrong); the original evaluates `v` once
      case ArrayAggregate(ArrayTransform(v, tf), zero, merge, finish)
          if isDoubleArray(v) && v.deterministic &&
            isSelfProduct(tf).isDefined && isZero(zero) &&
            isSumMerge(merge) && isIdentityFinish(finish) =>
        DotProductExpr(v, v)
    }
}
