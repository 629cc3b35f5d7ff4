package graft

/** Physical-plan audit (the "would this survive 100x scale-up" gate):
  * asserts broadcasts ARE broadcast, filters reach the scan, partial
  * aggregation happens map-side, and single-pass ops scan once. */
class PlanSpec extends GraftSuite {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("j7 star join: dims broadcast (by hint), fact join shuffled") {
    // disable auto-broadcast so only the explicit broadcast() hints apply —
    // this is the plan shape a 100 TB run gets, where nothing auto-fits
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p = plan("j7_star_revenue_by_region")
      assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
        s"customer/nation/region must stay broadcast via hints:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"lineitem x orders must be a shuffled join:\n$p")
    } finally spark.conf.set(key, old)
  }

  test("j4 dictionary lookup is a broadcast join") {
    assert(plan("j4_lookup_region").contains("BroadcastHashJoin"))
  }

  test("s1 scan pushes filters into parquet") {
    val p = plan("s1_scan_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(event_type)") ||
      p.contains("EqualTo(event_type,purchase)"))
    // column pruning: only 4 columns read (2 output + 2 filter)
    assert(!p.contains("props"))
  }

  test("a5 pricing summary does partial (map-side) aggregation") {
    val p = plan("a5_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expect partial + final HashAggregate")
  }

  test("x1 single-pass split scans events exactly once") {
    val p = plan("x1_split_counts")
    assert("Scan parquet".r.findAllIn(p).size == 1)
  }

  test("f1 top-k avoids a global sort") {
    assert(plan("f1_top_purchases").contains("TakeOrderedAndProject"))
  }

  test("j1 equi-join aggregates after a single shuffle of each side") {
    val p = plan("j1_order_revenue_by_priority")
    assert("Exchange".r.findAllIn(p).size <= 4,
      s"too many exchanges:\n$p")
  }

  test("s2 salted join matches unsalted route counts") {
    val salted = SparkEntry.queries("s2_salted_join")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = SparkEntry.queries("x3_route_counts")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("vector kernels run as native expressions inside codegen") {
    val df = ops.Similarity.bruteForceTopK(
      Tables.load(spark, sf, "embeddings"), 10, 1)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BatchEvalPython"))
    assert(p.contains("floatvecdot") || p.contains("FloatVecDot") ||
      !p.contains("ScalaUDF"), s"vector path should not fall back to UDF")
  }
}
