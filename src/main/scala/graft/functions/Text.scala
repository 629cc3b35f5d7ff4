package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** U1 — keyword tokenizer (SURVEY.md §2i).
  *
  * The reference wraps the IK Chinese segmenter in a Flink UDTF
  * (dws .../function/KwSplit.java:11-21, util/IkUtil.java:14-35). We provide
  * a deterministic tokenizer (lowercase, split on non-alphanumeric runs)
  * with the same shape: text -> rows of (keyword, length) via explode —
  * capability parity, not dictionary parity (SURVEY §7 risk list).
  */
object Text {

  val tokenizeUdf: UserDefinedFunction = udf { (s: String) =>
    if (s == null) Array.empty[String]
    else s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
  }

  /** KwSplit-equivalent lateral: one row per keyword with its length. */
  def kwSplit(text: Column): Column = explode(tokenizeUdf(text))
}
