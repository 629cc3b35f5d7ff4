package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a named entry in
  * `queries`; each SQL-expressible one has a DuckDB oracle in `oracleSql`
  * (same column names — the driver sorts columns by name before hashing).
  *
  * Numeric convention for oracle parity: double aggregations go through
  * exact DECIMAL(18,2) accumulation then CAST to DOUBLE, making the result
  * independent of summation order (both Spark and DuckDB produce the
  * identical IEEE double from the same exact decimal).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggs.dailyUniqueUsers(t(spark, "/root/testdata/sf0.001", "events"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a8_daily_unique_users" -> ((s, dir) =>
      Aggs.dailyUniqueUsers(t(s, dir, "events"))),
    "a1_hourly_count_by_type" -> ((s, dir) =>
      Aggs.hourlyCountByType(t(s, dir, "events"))),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "a8_daily_unique_users" ->
      """SELECT CAST(ts AS DATE) AS event_date,
        |       COUNT(DISTINCT user_id) AS uu
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "a1_hourly_count_by_type" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS wstart,
        |       event_type, COUNT(*) AS cnt
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
