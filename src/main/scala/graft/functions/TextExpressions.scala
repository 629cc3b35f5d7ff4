package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the first
  * stage of a text-curation pipeline (composed equivalents: é as e+U+0301
  * vs precomposed U+00E9) must hash, shingle, and dedup identically, so
  * normalization has to run BEFORE any fingerprinting.
  *
  * Same preference-order-(b) rationale as VecExpressions: a Scala UDF
  * would serialize every row across the UDF boundary; this expression
  * stays inside whole-stage codegen and short-circuits the dominant case —
  * a pure-ASCII string (numBytes == numChars) is always NFC and returns
  * the input UTF8String untouched, no java.lang.String materialized.
  * Non-ASCII strings pay one toString + `Normalizer.isNormalized` probe
  * (already-NFC text allocates nothing) and only truly denormalized text
  * pays the full normalize. Behavior matches `java.text.Normalizer`
  * (UAX#15), which agrees with DuckDB's `nfc_normalize` — oracle-gated
  * end-to-end in t17. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(a: Any): Any = {
    val u = a.asInstanceOf[UTF8String]
    if (u.numBytes == u.numChars) u // pure ASCII is always NFC
    else {
      val s = u.toString
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
      else UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val s = ctx.freshName("s")
      s"""
         |if ($x.numBytes() == $x.numChars()) {
         |  ${ev.value} = $x;
         |} else {
         |  java.lang.String $s = $x.toString();
         |  if (java.text.Normalizer.isNormalized(
         |      $s, java.text.Normalizer.Form.NFC)) {
         |    ${ev.value} = $x;
         |  } else {
         |    ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize(
         |        $s, java.text.Normalizer.Form.NFC));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def nfc(c: Column): Column = column(NfcNormalize(expression(c)))
}
