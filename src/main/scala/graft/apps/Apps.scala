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

  /** Shared uu/new-user day counters (the reference's keyed last-date
    * ValueState + window sum): per day, users active for the first time
    * that day (uu) and users active for the first time EVER (new). */
  private def uuAndNewByDay(stream: DataFrame): DataFrame = {
    val first = Aggs.firstEventOfDay(stream)
    val firstSeen = Aggs.userFirstSeen(stream)
      .select(col("user_id"), col("first_date"))
    first.join(firstSeen, "user_id")
      .groupBy(col("event_date"))
      .agg(count(lit(1)).as("uu"),
        sum(when(col("event_date") === col("first_date"), 1).otherwise(0))
          .as("new_user_ct"))
      .orderBy(col("event_date"))
  }

  /** DwsTradeOrderWindow (DwsTradeOrderWindow.java:75-133): order stream →
    * per-day unique ordering users + first-ever buyers. The reference's
    * last_pay_date ValueState is the A8 first-event-of-day dedup; the
    * windowAll sum is the day groupBy. */
  def dwsTradeOrder(s: SparkSession, d: String): DataFrame =
    uuAndNewByDay(events(s, d).where(col("event_type") === "purchase"))
      .withColumnRenamed("uu", "order_uu")
      .withColumnRenamed("new_user_ct", "order_new_user_ct")

  /** DwsTradePaymentSucWindow (DwsTradePaymentSucWindow.java:72-119): the
    * pay-success stream (purchases with a signup within 15 min — the
    * DwdTradeOrderPaySucDetail feed) → per-day pay uu + first-ever payers. */
  def dwsTradePaymentSuc(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val sgn = ev.where(col("event_type") === "signup")
      .select(col("user_id").as("s_user_id"), col("ts").as("s_ts"))
    val paySuc = p.join(sgn,
        col("user_id") === col("s_user_id") &&
        col("s_ts") >= col("ts") - expr("INTERVAL 15 MINUTES") &&
        col("s_ts") <= col("ts"))
      .select(col("event_id"), col("user_id"), col("ts")).distinct()
    uuAndNewByDay(paySuc)
      .withColumnRenamed("uu", "pay_suc_uu")
      .withColumnRenamed("new_user_ct", "pay_suc_new_user_ct")
  }

  /** DwsTradeTrademarkCategoryUserRefundWindow
    * (DwsTradeTrademarkCategoryUserRefundWindow.java:65-189): refund stream
    * enriched through the multi-level dim chain, keyed by (user × dim
    * hierarchy), refund order count = EXACT distinct (the reference's
    * orderIdSet). Here: returned line items (l_returnflag = 'R') through
    * customer→nation→region broadcasts, distinct order count via the
    * set-merge Aggregator (A6). */
  def dwsTradeUserRefund(s: SparkSession, d: String): DataFrame = {
    val li = Tables.load(s, d, "lineitem")
    val orders = Tables.load(s, d, "orders")
    val customer = Tables.load(s, d, "customer")
    val nation = Tables.load(s, d, "nation")
    val region = Tables.load(s, d, "region")
    li.where(col("l_returnflag") === "R")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("c_custkey"), col("n_name"), col("r_name"))
      .agg(
        graft.functions.DistinctSetAgg
          .distinctSetCount(col("l_orderkey")).as("refund_order_ct"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("refund_amount"))
  }

  /** All 20 job entry points, named after the reference classes. */
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
    "DwsTradeOrderWindow" -> dwsTradeOrder _,
    "DwsTradePaymentSucWindow" -> dwsTradePaymentSuc _,
    "DwsTradeTrademarkCategoryUserRefundWindow" -> dwsTradeUserRefund _,
  )
}
