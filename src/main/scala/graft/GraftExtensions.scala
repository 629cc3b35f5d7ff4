package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{FloatVecDot, FloatVecNorm, KwSplitGenerator}

/** Builder-time extension point:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.GraftExtensions`) registers the engine's
  * native SQL functions on every session derived from the builder.
  * Runtime alternative for an existing session:
  * `graft.functions.GraftFunctions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.NormSquaredToSelfDot)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectFunction((
      FunctionIdentifier("kwsplit"),
      new ExpressionInfo(classOf[KwSplitGenerator].getName, "kwsplit"),
      exprs => KwSplitGenerator(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      exprs => FloatVecDot(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[FloatVecNorm].getName, "vec_norm"),
      exprs => FloatVecNorm(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("zvalue"),
      new ExpressionInfo(graft.functions.ZValueExpr.getClass.getName,
        "zvalue"),
      exprs => graft.functions.ZValueExpr(exprs.head, exprs(1))))
  }
}
