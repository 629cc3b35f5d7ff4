package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY.md §2e A1–A9), batch twins.
  *
  * Streaming-capable variants live in `graft.streaming`. Everything here is
  * declarative DataFrame API so Catalyst performs partial (map-side)
  * aggregation + final aggregation automatically — the reference's manual
  * incremental ReduceFunctions (e.g. reference
  * realtime-dws .../DwsTrafficVcChArIsNewPageViewWindow.java:121-148) are
  * subsumed by Spark's hash aggregate.
  *
  * Scale notes: every groupBy here shuffles once on its grouping keys with
  * map-side combine, so reduce-side input is proportional to group count,
  * not row count. No driver-side collection anywhere.
  */
object Aggs {

  /** A8 batch twin — keep only each user's first event per day.
    * Reference: keyed ValueState last-seen-date dedup
    * (DwsTrafficVcChArIsNewPageViewWindow.java:61-105 and 5 sibling apps).
    * Batch expression: row_number over (user, day) ordered by time.
    */
  def firstEventOfDay(events: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"), to_date(col("ts")))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("event_date", to_date(col("ts")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn")
  }

  /** A8+A3 flagship: daily unique users (uu) — dedup-first then count.
    * Equivalent to COUNT(DISTINCT user_id) per day; expressed via the
    * dedup-first pattern to mirror the reference's state logic.
    */
  def dailyUniqueUsers(events: DataFrame): DataFrame =
    firstEventOfDay(events)
      .groupBy(col("event_date"))
      .agg(count(lit(1)).as("uu"))
      .orderBy(col("event_date"))

  /** A1 — tumbling 1-hour window count per key.
    * Reference: TUMBLE(row_time, 1 HOUR) GROUP BY keyword
    * (DwsTrafficSourceKeywordPageViewWindow.java:54-62).
    */
  def hourlyCountByType(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("window.start").as("wstart"),
        col("event_type"),
        col("cnt"))
      .orderBy(col("wstart"), col("event_type"))
}
