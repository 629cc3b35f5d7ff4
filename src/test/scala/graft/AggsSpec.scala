package graft

import org.apache.spark.sql.functions._

class AggsSpec extends GraftSuite {

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("a8 dedup-first daily uu equals countDistinct") {
    val events = Tables.load(spark, sf, "events")
    val got = ops.Aggs.dailyUniqueUsers(events)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    val exp = events
      .groupBy(to_date(col("ts")).as("d"))
      .agg(countDistinct(col("user_id")).as("uu"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    assert(got == exp)
  }

  test("a1 hourly counts sum to total rows") {
    val events = Tables.load(spark, sf, "events")
    val total = ops.Aggs.hourlyCountByType(events)
      .agg(sum(col("cnt"))).collect()(0).getLong(0)
    assert(total == events.count())
  }

  test("every query has either an oracle or is explicitly rows-only") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("a15 merged daily HLL sketches estimate within 5% of exact distinct") {
    val ev = Tables.load(spark, sf, "events")
    val merged = ev
      .groupBy(to_date(col("ts")).as("d"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val est = merged(k)
      assert(math.abs(est - n) <= math.max(1, n * 0.05),
        s"$k: est $est vs exact $n")
    }
  }
}
