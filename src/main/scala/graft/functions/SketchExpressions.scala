package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Native Catalyst probes for the driver-built sketches (Bloom, CMS).
  *
  * A Scala UDF probe pays the codegen boundary on EVERY ROW of the big
  * side — exactly where the sketch was supposed to make the scan cheap.
  * These expressions attach the broadcast sketch as a codegen reference
  * object and emit a direct method call inside whole-stage codegen: no
  * boxing, no serializer hop, the scan stays one fused loop (the
  * VecExpressions discipline applied to the sketch family; PlanSpec
  * asserts the probe paths carry no ScalaUDF).
  */
case class BloomMightContain(child: Expression,
    bloomBc: Broadcast[BloomFilter]) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def nullSafeEval(a: Any): Any =
    bloomBc.value.mightContainLong(a.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBc", bloomBc,
      classOf[Broadcast[BloomFilter]].getName)
    nullSafeCodeGen(ctx, ev, x =>
      s"""${ev.value} = ((org.apache.spark.util.sketch.BloomFilter)
         |  $ref.value()).mightContainLong($x);""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Count-min estimate of a string key against a broadcast CMS — same
  * string representation the sketch was built over
  * (`stat.countMinSketch` on the string-cast column), so probe and
  * build hash identical bytes. */
case class CmsEstimateCount(child: Expression,
    cmsBc: Broadcast[CountMinSketch]) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    cmsBc.value.estimateCount(a.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsBc", cmsBc,
      classOf[Broadcast[CountMinSketch]].getName)
    nullSafeCodeGen(ctx, ev, x =>
      s"""${ev.value} = ((org.apache.spark.util.sketch.CountMinSketch)
         |  $ref.value()).estimateCount($x.toString());""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object SketchExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def bloomMightContain(bloomBc: Broadcast[BloomFilter],
      key: Column): Column =
    column(BloomMightContain(expression(key), bloomBc))

  def cmsEstimate(cmsBc: Broadcast[CountMinSketch], key: Column): Column =
    column(CmsEstimateCount(expression(key), cmsBc))
}
