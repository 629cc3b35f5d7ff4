package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** E2 — the SQL entry path (SURVEY.md §3): the reference's Flink SQL jobs
  * become `spark.sql` over registered temp views; Catalyst runs the whole
  * parse/analyze/optimize/physical pipeline. Engine functions (kwsplit,
  * vec_dot, vec_norm) are registered so SQL text can use them.
  */
object SqlJobs {

  def registerViews(spark: SparkSession, dir: String): Unit = {
    Tables.names.foreach { n =>
      Tables.load(spark, dir, n).createOrReplaceTempView(n)
    }
    graft.functions.GraftFunctions.register(spark)
  }

  /** Shared ANSI SQL (runs verbatim on Spark AND DuckDB): yearly revenue
    * rollup over the order-detail join. */
  val revenueByYearSql: String =
    """SELECT CAST(year(o_orderdate) AS INT) AS order_year,
      |       COUNT(*) AS n_items,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |                (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
      |            AS DOUBLE) AS revenue
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  def revenueByYear(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(revenueByYearSql)
  }

  /** Shared ANSI SQL: correlated scalar subquery (Catalyst decorrelates
    * it into an aggregate + left join — no per-row subquery execution). */
  val maxSpendPerCustomerSql: String =
    """SELECT c_custkey,
      |       COALESCE((SELECT CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2)))
      |                             AS DOUBLE)
      |                 FROM orders WHERE o_custkey = c_custkey),
      |                0.0) AS max_spend
      |FROM customer WHERE c_custkey <= 500""".stripMargin

  def maxSpendPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(maxSpendPerCustomerSql)
  }

  /** SQL text using the native kwsplit Generator via LATERAL VIEW —
    * the DwsTrafficSourceKeywordPageViewWindow shape
    * (DwsTrafficSourceKeywordPageViewWindow.java:44-62). */
  def keywordCounts(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT kw.keyword, COUNT(*) AS cnt
        |FROM documents LATERAL VIEW kwsplit(text) kw AS keyword, kw_len
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** SQL text using the registered native `zvalue` function — z1's
    * Morton bucket counts through the SQL entry path. `floor(value)`
    * (not a bare CAST, which truncates toward zero in Spark but the
    * DuckDB oracle floors) so negative non-integer values cannot split
    * the twins. */
  def zorderBucketCounts(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT shiftright(zvalue(user_id & 255,
        |         floor(value) & 255), 8) AS bucket,
        |       COUNT(*) AS n
        |FROM events
        |WHERE user_id IS NOT NULL AND value IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }
}
