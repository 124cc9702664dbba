package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
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
 * Conservative match, each condition load-bearing:
 *  - the zip lambda must multiply ITS OWN two parameters, one each, matched
 *    by `exprId` — `x * x`, a captured outer lambda variable, or a merge
 *    variable must NOT match (they are different computations);
 *  - the merge lambda must add ITS OWN two parameters, one each;
 *  - the finish lambda must be the identity of its own parameter;
 *  - both inputs must be `array<double>` — DotProduct accumulates in double,
 *    so rewriting a float-array fold would change last-ulp results.
 */
object DotProductRewrite extends Rule[LogicalPlan] {

  /** `e` is exactly the lambda variable `v` (an implicit widening cast to
    * double is tolerated — a no-op once the DoubleType guard holds). */
  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case Cast(nv: NamedLambdaVariable, DoubleType, _, _) => nv.exprId == v.exprId
    case _ => false
  }

  /** Commutative "operands are exactly {x, y}, one each". */
  private def usesBoth(l: Expression, r: Expression,
                       x: NamedLambdaVariable, y: NamedLambdaVariable): Boolean =
    (isVar(l, x) && isVar(r, y)) || (isVar(l, y) && isVar(r, x))

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(ml, mr, _),
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(al, ar, _),
            Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable,
            Seq(finArg: NamedLambdaVariable), _))
        if usesBoth(ml, mr, x, y) && usesBoth(al, ar, acc, v) &&
          fin.exprId == finArg.exprId &&
          a.resolved && b.resolved && isDoubleArray(a) && isDoubleArray(b) =>
        DotProduct(a, b)
    }
}
