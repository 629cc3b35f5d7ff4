package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Literal, Multiply, Pow}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.{FloatVecDot, FloatVecNorm}

/** Optimizer rule: algebraic strength reduction for vector norms.
  *
  * `pow(vec_norm(x), 2)` and `vec_norm(x) * vec_norm(x)` both compute
  * sqrt(dot(x,x))^2 — one pass over the array plus a sqrt that immediately
  * cancels. Rewriting to `vec_dot(x, x)` halves the array traversals and
  * drops the sqrt. Injected via GraftExtensions.injectOptimizerRule; the
  * pattern appears whenever distance math squares a norm.
  */
object NormSquaredToSelfDot extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Pow(FloatVecNorm(x), Literal(2.0, DoubleType)) =>
        FloatVecDot(x, x)
      case Multiply(FloatVecNorm(a), FloatVecNorm(b), _)
          if a.semanticEquals(b) =>
        FloatVecDot(a, a)
    }
}
