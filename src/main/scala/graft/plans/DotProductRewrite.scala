package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.DotProduct

/**
 * Optimizer rule: rewrite the interpreted higher-order-function dot-product
 * pattern
 *
 *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
 *
 * into the native codegen'd [[DotProduct]] expression. User code written
 * against plain `functions._` (or ported from PySpark one-liners) gets the
 * fused primitive loop without knowing the native expression exists — the
 * Catalyst way of optimizing a recognized semantic pattern (SURVEY.md §4.3's
 * optional custom-Rule showpiece).
 *
 * Semantics are identical: empty arrays → 0.0; null array, length mismatch
 * or null element → null (HOF null-propagation does the same through the
 * null products).
 *
 * Conservative match: the zip lambda must be a bare multiply of the two
 * lambda variables (optionally cast to double), the fold a bare add.
 */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isLambdaVar(e: Expression): Boolean = e match {
    case _: NamedLambdaVariable => true
    case Cast(_: NamedLambdaVariable, DoubleType, _, _) => true
    case _ => false
  }

  private object MulOfVars {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Multiply(l, r, _), _, _) =>
        isLambdaVar(l) && isLambdaVar(r)
      case _ => false
    }
  }

  private object AddOfVars {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Add(l, r, _), _, _) =>
        isLambdaVar(l) && isLambdaVar(r)
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b, zipF),
          Literal(0.0, DoubleType),
          mergeF,
          LambdaFunction(finish: NamedLambdaVariable, _, _))
        if MulOfVars.unapply(zipF) && AddOfVars.unapply(mergeF) =>
        DotProduct(a, b)
    }
}
