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

  /** A2 — keyed tumbling window with multiple incremental sums plus the
    * window-metadata finisher stamping stt/edt/cur_date
    * (DwsTrafficVcChArIsNewPageViewWindow.java:121-148,
    * TrafficPageViewBean.java:15-20). Window bounds emitted as formatted
    * strings exactly like the reference's Doris rows.
    */
  def keyedWindowStats(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_v"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        date_format(col("window.start"), "yyyy-MM-dd").as("cur_date"),
        col("event_type"), col("cnt"), col("sum_v"),
        col("min_v"), col("max_v"))
      .orderBy(col("stt"), col("event_type"))

  /** A3 — global (non-keyed) window reduce: one group per window
    * (DwsTrafficHomeDetailPageViewWindow.java:122-143 and 5 siblings).
    * Output is tiny (one row per window), so the single-group-per-window
    * hot spot is irrelevant after map-side partial aggregation.
    */
  def globalDailyStats(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_v"))
      .select(to_date(col("window.start")).as("d"), col("cnt"), col("sum_v"))
      .orderBy(col("d"))

  /** A5 — keyed windowed BigDecimal multi-amount sums
    * (DwsTradeSkuOrderWindow.java:120-149) — the TPC-H Q1 shape over
    * lineitem with exact DECIMAL accumulation. */
  def pricingSummary(lineitem: DataFrame): DataFrame = {
    val price = col("l_extendedprice").cast("decimal(18,2)")
    val disc = col("l_discount").cast("decimal(3,2)")
    val tax = col("l_tax").cast("decimal(3,2)")
    val one = lit(1).cast("decimal(3,2)")
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum(price * (one - disc)).cast("double").as("sum_disc_price"),
        sum(price * (one - disc) * (one + tax)).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** A6 — exact distinct count per key via the custom set-merge Aggregator
    * (TradeProvinceOrderBean.java:38 Set<String> union). */
  def distinctUsersByType(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        graft.functions.DistinctSetAgg.distinctSetCount(col("user_id")).as("uu"),
        count(lit(1)).as("cnt"))
      .orderBy(col("event_type"))

  /** A7 — keep-last compaction per key: the batch twin of the reference's
    * subtract-last-value retraction fix (DwsTradeSkuOrderWindow.java:77-118)
    * and of the upsert-kafka last-write-wins sink (S6). */
  def keepLastPerUser(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"),
        col("value").as("last_value"))
  }

  /** A9 — is_new correction (DwdBaseLog.java:72-108): first-seen date per
    * visitor decides whether a claimed new visit is really new. Batch:
    * min(date) over the full history + activity span. */
  def userFirstSeen(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(
        min(to_date(col("ts"))).as("first_date"),
        countDistinct(to_date(col("ts"))).as("n_active_days"))

  /** A9 companion — cohort retention: users grouped by first-seen date
    * (the cohort), counted on each later active day as a day-N offset.
    * The classic product-analytics retention triangle, and the aggregate
    * the reference's new-visitor correction (A9) feeds at report time.
    *
    * Scale shape: one distinct over (user, day) — map-side partial —
    * then a groupBy(user) for the cohort and ONE join keyed on user_id
    * that reuses the distinct frame; the final groupBy is
    * (cohort, day_n), a bounded days x days result. No window, no
    * driver state. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val d = events
      .where(col("user_id").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val first = d.groupBy("user_id").agg(min(col("day")).as("cohort"))
    d.join(first, "user_id")
      .groupBy(col("cohort"),
        datediff(col("day"), col("cohort")).as("day_n"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** T3 extension — session windows: per-user sessions with a 30-minute
    * inactivity gap (Spark `session_window`; the reference uses tumbling
    * only — sessionization comes free with the engine). */
  def userSessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        col("user_id"), col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  /** T3 extension — sliding windows: 2-hour windows sliding by 1 hour;
    * every event lands in exactly two windows. */
  def slidingHourlyCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("cnt"))
      .orderBy(col("wstart"))

  /** §2e extension — ROLLUP subtotals over the pricing keys (absent from
    * the reference; free from Catalyst). NULL grouping slots coalesced to
    * 'ALL' for a stable comparable output. */
  def pricingRollup(lineitem: DataFrame): DataFrame =
    lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("n"))
      .orderBy(col("rf"), col("ls"))

  /** A9/A20 companion — ordered conversion funnel over the event stream:
    * how many users produce a `view`, then a `click` strictly AFTER their
    * first view, then a `purchase` strictly after that click. This is the
    * product-analytics query the reference's page→cart→order DWS layer
    * exists to feed (reference realtime-dws trade apps join the same
    * event chain pairwise; the funnel is the 3-stage closure).
    *
    * Scale shape: three keyed aggregations chained by user_id joins — every
    * shuffle is on user_id, so AQE/exchange-reuse keeps one partitioning
    * throughout; each stage's frame only SHRINKS (stage k+1 users ⊆ stage
    * k users). No window over all events, no per-user event-list
    * collection — at 100 TB the stage frames are |users|-sized, not
    * |events|-sized. */
  def funnelStages(events: DataFrame,
      stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val base = events
      .where(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts"))
    // reached(k): per-user earliest ts of stage k that follows the user's
    // stage-(k-1) time; head stage is an unconditional min
    val head = base.where(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    val reached = stages.tail.scanLeft(head) { (prev, stage) =>
      base.where(col("event_type") === stage)
        .join(prev.select(col("user_id"), col("t").as("t_prev")), "user_id")
        .where(col("ts") > col("t_prev"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    }
    reached.zip(stages).map { case (df, stage) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(stage).as("stage"), col("n_users"))
    }.reduce(_.unionAll(_))
  }

  /** Behavior-sequence transition matrix: for every consecutive event
    * pair within a user's timeline (ordered by ts, event_id), the
    * (from_type, to_type) count and the row-normalized transition
    * probability — the first-order Markov summary a next-event-prediction
    * training set (and the a21 funnel's stage ordering) is built from.
    * `p` is the one float op (two exact int64 counts divided, rounded
    * 6dp), so the frame is engine-portable.
    *
    * Scale: the lead() window is partitioned by user_id — per-user
    * timelines sort independently, no global order anywhere; the pair
    * counts collapse map-side to ≤|types|² rows, and the normalizing
    * sum window runs on THAT bounded frame, never on events. */
  def transitionCounts(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val counts = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    counts.withColumn("p",
      round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("from_type")))
          .cast("double"), 6))
  }

  /** A4/U1 — keyword extraction + windowed count: tokenize, explode, then
    * tumbling daily window per keyword
    * (DwsTrafficSourceKeywordPageViewWindowStream.java:86-116 — the manual
    * HashMap-in-window is exactly groupBy(window, keyword) here). */
  def keywordDailyCounts(documents: DataFrame): DataFrame =
    documents
      .select(graft.functions.Text.kwSplit(col("text")).as("keyword"))
      .groupBy(col("keyword"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("keyword"))
}
