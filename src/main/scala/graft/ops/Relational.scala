package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2f surface the reference lacks but the engine exposes: analytic window
  * functions, sort/limit (top-k), set operations, plus the S1 pushdown scan.
  * These are Spark built-ins — listed as first-class `queries` entries so
  * the capability is oracle-verified, not just claimed.
  */
object Relational {

  /** S1 — projection+filter scan. The plan must show PushedFilters and a
    * 2-column ReadSchema (checked in RelationalSpec via explain). */
  def scanPushdown(events: DataFrame): DataFrame =
    events
      .where(col("event_type") === "purchase" && col("value") > 100.0)
      .select(col("event_id"), col("user_id"))

  /** f1 — top-k by sort+limit. Spark plans TakeOrderedAndProject: no global
    * sort, each partition keeps k rows, driver merges — scale-safe. */
  def topPurchases(events: DataFrame, k: Int): DataFrame =
    events
      .where(col("event_type") === "purchase")
      .orderBy(col("value").desc, col("event_id"))
      .select(col("event_id"), col("user_id"), col("value"))
      .limit(k)

  /** f2 — set ops on (user, day): days a user both clicked and purchased
    * with no error that day. INTERSECT/EXCEPT are distinct-set semantics in
    * both Spark and the oracle. */
  def engagedUserDays(events: DataFrame): DataFrame = {
    def userDays(tpe: String) =
      events.where(col("event_type") === tpe)
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    userDays("click").intersect(userDays("purchase")).except(userDays("error"))
  }

  /** f5 — RANGE frame: per-user sum of values in the trailing hour (range
    * on epoch seconds, not row count — the frame the reference's windowed
    * state would need for "last hour" semantics). */
  def trailingHourSums(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("epoch_s"))
      .rangeBetween(-3599, Window.currentRow)
    events
      .withColumn("epoch_s", floor(unix_millis(col("ts")) / 1000).cast("long"))
      .select(col("event_id"), col("user_id"),
        sum(col("value").cast("decimal(18,2)")).over(w)
          .cast("double").as("hr_sum"))
  }

  /** f6 — unpivot (melt): the inverse of pivot, wide per-type count columns
    * back to (d, event_type, cnt) rows, zeros preserved. */
  def unpivotDailyTypes(pivoted: DataFrame): DataFrame =
    pivoted.unpivot(
      Array(col("d")),
      Array(col("click"), col("error"), col("purchase"), col("signup"),
        col("view")),
      "event_type", "cnt")

  /** f7 — ntile quartiles by value within each event type (deterministic
    * total order via (value, event_id) tie-break). */
  def valueQuartiles(events: DataFrame): DataFrame =
    events.select(col("event_id"),
      ntile(4).over(Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))).as("quartile"))

  /** f3 — analytic window frame: per-user running event count and running
    * decimal-exact value sum in time order (the batch form of the
    * reference's keyed ValueState accumulators). */
  def runningTotals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select(
      col("event_id"), col("user_id"),
      count(lit(1)).over(w).as("run_n"),
      sum(col("value").cast("decimal(18,2)")).over(w)
        .cast("double").as("run_sum"))
  }
}
