package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** A6 — exact distinct count via a merged set, as a typed `Aggregator`.
  *
  * The reference unions `Set<String>` inside a window reduce to count
  * distinct order ids exactly (TradeProvinceOrderBean.java:38,
  * DwsTradeProvinceOrderWindow.java:94-138). Spark's built-in
  * `countDistinct` is the planner-native way (expand + two-phase agg) and
  * what high-cardinality keys should use; this Aggregator demonstrates the
  * custom-UDAF surface with identical semantics — partial sets merge
  * map-side, so shuffle volume is O(distinct) per group, safe only for
  * bounded-cardinality keys (as in the reference, order ids per window).
  */
class DistinctSetCount extends Aggregator[Long, Set[Long], Long] {
  override def zero: Set[Long] = Set.empty
  override def reduce(b: Set[Long], a: Long): Set[Long] = b + a
  override def merge(b1: Set[Long], b2: Set[Long]): Set[Long] = b1 ++ b2
  override def finish(r: Set[Long]): Long = r.size.toLong
  override def bufferEncoder: Encoder[Set[Long]] = Encoders.kryo[Set[Long]]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object DistinctSetAgg {
  /** Column form: exact distinct count of a long column. */
  def distinctSetCount(c: Column): Column =
    udaf(new DistinctSetCount, Encoders.scalaLong).apply(c)
}
