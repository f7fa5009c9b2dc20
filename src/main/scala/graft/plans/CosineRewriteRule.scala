package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/**
 * Optimizer rule (injected by [[GraftExtensions]] via `injectOptimizerRule`):
 * rewrites the higher-order-function cosine pattern that
 * [[graft.functions.VectorFunctions.cosine]] builds —
 *
 * {{{ CASE WHEN sqrt(Σa²)*sqrt(Σb²) = 0 THEN 0.0 ELSE Σ(a·b) / (sqrt(Σa²)*sqrt(Σb²)) END }}}
 *
 * (each Σ an `aggregate(..., 0.0D, +)` left fold) — into the codegen'd
 * [[CosineSimilarityExpr]], which computes the identical IEEE-754 double
 * sequence in one fused kernel pass (~5x faster than interpreted HOF
 * evaluation). A user writing the portable built-in formulation gets the
 * native kernel automatically when the extension is installed.
 *
 * Matching is deliberately narrow: every sub-shape (the zip-multiply dot, the
 * square-norm folds, the zero guard) must match exactly, on the same two
 * array<double> children, or the rule leaves the plan untouched.
 */
object CosineRewriteRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosinePattern(a, b) => CosineSimilarityExpr(a, b)
    }

  private object CosinePattern {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      // CaseWhen(Seq((nn == 0, 0.0)), Some(dot / nn))
      case CaseWhen(
            Seq((EqualTo(nn1, DoubleLit(0.0)), DoubleLit(0.0))),
            Some(Divide(Dot(a1, b1), nn2, _)))
          if nn1.semanticEquals(nn2) =>
        nn1 match {
          case Multiply(SqrtNorm(a2), SqrtNorm(b2), _)
              if a1.semanticEquals(a2) && b1.semanticEquals(b2) &&
                isDoubleArray(a1) && isDoubleArray(b1) =>
            Some((a1, b1))
          case _ => None
        }
      case _ => None
    }
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private object DoubleLit {
    def unapply(e: Expression): Option[Double] = e match {
      case Literal(v: Double, DoubleType) => Some(v)
      case Cast(Literal(v: Double, DoubleType), DoubleType, _, _) => Some(v)
      case _ => None
    }
  }

  /** True iff `v` IS the lambda's own `idx`-th argument (not an outer capture
   * or a repeated variable) — guards against shapes like `(x,y) -> x*x` or
   * `(acc,x) -> acc+acc` matching as a dot/sum. */
  private def binds(v: NamedLambdaVariable, args: Seq[Any], idx: Int): Boolean =
    idx < args.length && (args(idx) match {
      case a: NamedLambdaVariable => v.exprId == a.exprId
      case _ => false
    })

  /** aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,x) -> acc+x) */
  private object Dot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case SumFold(ZipWith(a, b,
            LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), args, _)))
          if args.length == 2 &&
            binds(x, args, 0) &&
            binds(y, args, 1) =>
        Some((a, b))
      case _ => None
    }
  }

  /** sqrt(aggregate(transform(v, x -> x*x), 0.0, +)) */
  private object SqrtNorm {
    def unapply(e: Expression): Option[Expression] = e match {
      case Sqrt(SumFold(ArrayTransform(v,
            LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), args, _))))
          if x.exprId == y.exprId && args.length >= 1 &&
            binds(x, args, 0) =>
        Some(v)
      case _ => None
    }
  }

  /** aggregate(arr, 0.0, (acc, x) -> acc + x) with identity finish */
  private object SumFold {
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayAggregate(
            arr,
            DoubleLit(0.0),
            LambdaFunction(Add(acc: NamedLambdaVariable, x: NamedLambdaVariable, _), args, _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(finArg: NamedLambdaVariable), _))
          if fin.exprId == finArg.exprId && args.length == 2 &&
            binds(acc, args, 0) &&
            binds(x, args, 1) =>
        Some(arr)
      case _ => None
    }
  }
}
