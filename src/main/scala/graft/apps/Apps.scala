package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops._

/** The 15 reference jobs re-assembled from `graft.ops` (SURVEY.md §7 step 7).
  *
  * Each app is a composition of already-verified operators — ~10-30 lines,
  * mirroring the reference job of the same name (reference classes under
  * realtime-dim/realtime-dwd/realtime-dws). Batch shape shown here runs on
  * the driver test data; the streaming shell is the same composition over a
  * `readStream` frame + `graft.streaming.Streams` sinks (the ops are
  * source-agnostic).
  *
  * Input mapping (SURVEY §5): events ≈ page-log/CDC stream, orders+lineitem
  * ≈ order_info/order_detail, customer→nation→region ≈ the dim snowflake,
  * documents ≈ comment/keyword text.
  */
object Apps {

  private def events(s: SparkSession, d: String) = Tables.load(s, d, "events")
  private def env(s: SparkSession, d: String) =
    Etl.toCdcEnvelope(events(s, d))

  /** DimApp: CDC stream routed by config to dim tables, columns pruned per
    * config, ready for keyed upsert (streaming: Streams.upsertSink). */
  def dimApp(s: SparkSession, d: String): DataFrame =
    Etl.pruneColumns(env(s, d), Map(
      "user_info" -> Seq("id", "user_id"),
      "order_info" -> Seq("id", "amount")))

  /** DwdBaseLog: parse/validate, 5-way split, is_new fix; page leg shown. */
  def dwdBaseLog(s: SparkSession, d: String): DataFrame = {
    val firstSeen = Aggs.userFirstSeen(events(s, d))
      .select(col("user_id"), col("first_date"))
    Splits.splitLog(events(s, d))("page")
      .join(firstSeen, "user_id")
      .withColumn("is_new",
        when(to_date(col("ts")) === col("first_date"), 1).otherwise(0))
      .drop("first_date")
  }

  /** DwdBaseDb: config-driven fact router (dynamic topic per row). */
  def dwdBaseDb(s: SparkSession, d: String): DataFrame =
    Splits.routeByConfig(events(s, d), Splits.defaultRouteConfig(s))

  /** DwdTradeCartAdd: cart CDC filter + insert/update delta of sku_num. */
  def dwdTradeCartAdd(s: SparkSession, d: String): DataFrame =
    Etl.deltaVsPrevious(
      Etl.cdcFilter(env(s, d), "gmall", "cart_info", Seq("insert", "update"))
        .select("event_id", "user_id")
        .join(events(s, d).select("event_id", "ts", "value"), Seq("event_id")))

  /** DwdTradeOrderDetail: order_detail ⋈ order_info + left joins to the
    * activity/coupon sides. */
  def dwdTradeOrderDetail(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.load(s, d, "orders")
    val lineitem = Tables.load(s, d, "lineitem")
    val part = Tables.load(s, d, "part")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"), "left")
      .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"),
        col("o_orderdate"), col("l_extendedprice"), col("l_discount"),
        col("p_brand"))
  }

  /** DwdTradeOrderCancelDetail: status transition to cancelled. */
  def dwdTradeOrderCancel(s: SparkSession, d: String): DataFrame =
    Etl.statusTransition(events(s, d), "purchase", "error")

  /** DwdTradeOrderPaySucDetail: interval join pay↔order within range. */
  def dwdTradeOrderPaySuc(s: SparkSession, d: String): DataFrame =
    Joins.purchasesWithRecentSignup(events(s, d))

  /** DwdTradeOrderRefund: refund transition + dictionary lookup. */
  def dwdTradeOrderRefund(s: SparkSession, d: String): DataFrame =
    Etl.statusTransition(events(s, d), "error", "purchase")
      .join(events(s, d).select("event_id", "user_id", "ts"),
        Seq("event_id", "user_id"))
      .transform(df => Joins.lookupRegionName(df, Tables.load(s, d, "region")))

  /** DwdInteractionCommentInfo: comment stream + dic temporal lookup. */
  def dwdInteractionComment(s: SparkSession, d: String): DataFrame =
    Joins.lookupRegionName(events(s, d), Tables.load(s, d, "region"))

  /** DwsTrafficSourceKeywordPageViewWindow: tokenize + windowed counts. */
  def dwsTrafficKeyword(s: SparkSession, d: String): DataFrame =
    Aggs.keywordDailyCounts(Tables.load(s, d, "documents"))

  /** DwsTrafficVcChArIsNewPageViewWindow: keyed window multi-sums. */
  def dwsTrafficVcChAr(s: SparkSession, d: String): DataFrame =
    Aggs.keyedWindowStats(events(s, d))

  /** DwsTrafficHomeDetailPageViewWindow: per-page daily uv. */
  def dwsTrafficHomeDetail(s: SparkSession, d: String): DataFrame =
    Aggs.firstEventOfDay(
        events(s, d).where(col("event_type").isin("view", "click")))
      .groupBy(col("event_date"), col("event_type"))
      .agg(count(lit(1)).as("uv"))

  /** DwsUserUserLoginWindow: daily uu + 7-day-returning users. */
  def dwsUserLogin(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_date"))
    Aggs.firstEventOfDay(events(s, d))
      .withColumn("prev_date", lag(col("event_date"), 1).over(w))
      .groupBy(col("event_date"))
      .agg(count(lit(1)).as("uu"),
        sum(when(datediff(col("event_date"), col("prev_date")) >= 8, 1)
          .otherwise(0)).as("back_ct"))
  }

  /** DwsUserUserRegisterWindow: global window register counts. */
  def dwsUserRegister(s: SparkSession, d: String): DataFrame =
    Aggs.globalDailyStats(events(s, d).where(col("event_type") === "signup"))

  /** DwsTradeCartAddUuWindow: daily cart-add unique users. */
  def dwsTradeCartAddUu(s: SparkSession, d: String): DataFrame =
    Aggs.dailyUniqueUsers(events(s, d).where(col("event_type") === "click"))

  /** DwsTradeSkuOrderWindow: keep-last netting then per-sku amount sums with
    * the full snowflake dim enrichment. */
  def dwsTradeSkuOrder(s: SparkSession, d: String): DataFrame =
    Joins.revenueByRegion(
      Tables.load(s, d, "lineitem"), Tables.load(s, d, "orders"),
      Tables.load(s, d, "customer"), Tables.load(s, d, "nation"),
      Tables.load(s, d, "region"))

  /** DwsTradeProvinceOrderWindow: per-province (nation) order agg with
    * exact distinct order count. */
  def dwsTradeProvinceOrder(s: SparkSession, d: String): DataFrame =
    Joins.snowflakeEnrich(
      Tables.load(s, d, "orders"), Tables.load(s, d, "customer"),
      Tables.load(s, d, "nation"), Tables.load(s, d, "region"))

  /** All 15 job entry points, named after the reference classes. */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "DimApp" -> dimApp _,
    "DwdBaseLog" -> dwdBaseLog _,
    "DwdBaseDb" -> dwdBaseDb _,
    "DwdTradeCartAdd" -> dwdTradeCartAdd _,
    "DwdTradeOrderDetail" -> dwdTradeOrderDetail _,
    "DwdTradeOrderCancelDetail" -> dwdTradeOrderCancel _,
    "DwdTradeOrderPaySucDetail" -> dwdTradeOrderPaySuc _,
    "DwdTradeOrderRefund" -> dwdTradeOrderRefund _,
    "DwdInteractionCommentInfo" -> dwdInteractionComment _,
    "DwsTrafficSourceKeywordPageViewWindow" -> dwsTrafficKeyword _,
    "DwsTrafficVcChArIsNewPageViewWindow" -> dwsTrafficVcChAr _,
    "DwsTrafficHomeDetailPageViewWindow" -> dwsTrafficHomeDetail _,
    "DwsUserUserLoginWindow" -> dwsUserLogin _,
    "DwsUserUserRegisterWindow" -> dwsUserRegister _,
    "DwsTradeCartAddUuWindow" -> dwsTradeCartAddUu _,
    "DwsTradeSkuOrderWindow" -> dwsTradeSkuOrder _,
    "DwsTradeProvinceOrderWindow" -> dwsTradeProvinceOrder _,
  )
}
