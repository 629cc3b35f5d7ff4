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
