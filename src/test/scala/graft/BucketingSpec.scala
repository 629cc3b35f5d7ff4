package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: both fact tables written bucketed by the
  * join key join WITHOUT an Exchange — the pre-shuffle layout a recurring
  * 100 TB join wants (pay the shuffle once at write time, never at read). */
class BucketingSpec extends GraftSuite {

  test("bucketed fact tables join with no shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val orders = Tables.load(spark, sf, "orders")
    val lineitem = Tables.load(spark, sf, "lineitem")
    orders.write.mode("overwrite")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    lineitem.write.mode("overwrite")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")
    try {
      val key = "spark.sql.autoBroadcastJoinThreshold"
      val old = spark.conf.get(key)
      try {
        spark.conf.set(key, "-1") // force the shuffle-or-bucket decision
        val j = spark.table("orders_b")
          .join(spark.table("lineitem_b"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
        val p = j.queryExecution.executedPlan.toString
        assert(p.contains("SortMergeJoin"))
        assert(!p.contains("Exchange hashpartitioning(o_orderkey"),
          s"bucketed join must not re-shuffle orders:\n$p")
        assert(!p.contains("Exchange hashpartitioning(l_orderkey"),
          s"bucketed join must not re-shuffle lineitem:\n$p")
        // and it computes the same result as the plain join
        val plain = ops.Joins.orderRevenueByPriority(orders, lineitem)
          .select("o_orderpriority", "n_items").collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val bucketed = j.collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(bucketed == plain)
      } finally spark.conf.set(key, old)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
