package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2d J1–J8), batch twins.
  *
  * Strategy notes for the 100 TB case:
  *  - fact-to-fact equi joins (J1/J2) shuffle both sides on the key and let
  *    AQE pick SMJ vs shuffled-hash (skew handled by AQE skew-join split);
  *  - every dimension join (J4–J7) is an explicit `broadcast()` — the
  *    reference's Redis/HBase cache hierarchy and async-I/O machinery
  *    (DimAsyncFunction.java:38-84) collapses into a broadcast hash join;
  *  - the interval join (J3) keeps its equi key so Spark plans a shuffled
  *    join with the range as a post-filter, not a nested-loop cross.
  */
object Joins {

  private def dec(c: String) = col(c).cast("decimal(18,2)")

  /** J1 — inner equi-join order_detail x order_info
    * (DwdTradeOrderDetail.java:22,73-92), here orders x lineitem, rolled up
    * to revenue per order priority. */
  def orderRevenueByPriority(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(dec("l_extendedprice") * (lit(1).cast("decimal(3,2)") -
          col("l_discount").cast("decimal(3,2)")))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))

  /** J2 — left outer join preserving unmatched left rows
    * (DwdTradeOrderDetail.java:91-92): customers with zero orders kept. */
  def customerOrderSummary(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(dec("o_totalprice")), lit(0).cast("decimal(18,2)"))
          .cast("double").as("spend"))

  /** J3 — event-time interval join (DwdTradeOrderPaySucDetail.java:66-88):
    * pay events matched to order events of the same key within
    * [ts - 15 min, ts]. Equi key keeps it a shuffled join with a range
    * post-filter; `bucketedIntervalJoin` below is the unbounded-scale
    * time-bucketed form of the same query (spec- and oracle-equal).
    */
  def purchasesWithRecentSignup(events: DataFrame): DataFrame = {
    val p = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
    val sgn = events.where(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"),
        col("user_id").as("s_user_id"), col("ts").as("s_ts"))
    p.join(sgn,
        col("user_id") === col("s_user_id") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL 15 MINUTES") &&
        col("s_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("user_id"), col("signup_id"))
  }

  /** J4 — lookup join against a small dictionary, FOR SYSTEM_TIME AS OF
    * proc-time (DwdInteractionCommentInfo.java:38-52). The dictionary is
    * fully broadcast-resident — the reference's partial 20-row lookup cache
    * (BaseSQLApp.java:78-81) is superseded. */
  def lookupRegionName(events: DataFrame, region: DataFrame): DataFrame =
    events.join(broadcast(region),
        pmod(col("user_id"), lit(5)) === col("r_regionkey"), "left")
      .select(col("event_id"), col("r_name").as("region_name"))

  /** J5 — broadcast config join for dim routing (DimApp.java:144-202):
    * inner join on table name, unmatched records dropped (:179-181). */
  def dimRoute(env: DataFrame, dimConfig: DataFrame): DataFrame =
    env.join(broadcast(dimConfig), Seq("table"))
      .groupBy(col("table"), col("sink_family"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("table"))

  /** J6/J7 — chained dim enrichment, the snowflake chain sku->spu->c3->c2->
    * c1->tm (DwsTradeSkuOrderWindow.java:151-192) re-expressed as successive
    * broadcast joins: orders -> customer -> nation -> region. Only the
    * FIXED-cardinality dims (nation 25, region 5 — constant with SF,
    * TPC-H-style) carry an explicit broadcast hint; customer GROWS with
    * scale factor, so its join is left to AQE: at sf0.1 AQE still picks
    * broadcast (PlanSpec pins it), at 100x a forced hint would OOM the
    * driver where AQE correctly falls back to shuffle. */
  def snowflakeEnrich(orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame =
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec("o_totalprice")).cast("double").as("total_spend"))
      .orderBy(col("r_name"), col("n_name"))

  /** J4 full fidelity — SCD2/versioned dim lookup (FOR SYSTEM_TIME AS OF,
    * DwdInteractionCommentInfo.java:38-52): each fact row joins the dim
    * VERSION whose validity interval contains the fact timestamp. The dim
    * is broadcast; the interval predicate is evaluated on the build side,
    * so the fact table streams through once. */
  def scd2Lookup(events: DataFrame, versionedDim: DataFrame): DataFrame =
    events.join(broadcast(versionedDim),
        pmod(col("user_id"), lit(5)) === col("dim_key") &&
        col("ts") >= col("valid_from") && col("ts") < col("valid_to"))
      .select(col("event_id"), col("attr"))

  /** Deterministic versioned dim for tests/queries: each region key gets
    * one version per half-month window, attr = name + version tag. */
  def makeVersionedDim(region: DataFrame): DataFrame = {
    val bounds = Seq(
      ("2024-01-01 00:00:00", "2024-01-15 00:00:00", "v1"),
      ("2024-01-15 00:00:00", "2024-02-01 00:00:00", "v2"))
    val versions = bounds.map { case (f, t, v) =>
      struct(lit(f).cast("timestamp").as("valid_from"),
        lit(t).cast("timestamp").as("valid_to"), lit(v).as("ver"))
    }
    region.select(col("r_regionkey").as("dim_key"), col("r_name"),
        explode(array(versions: _*)).as("w"))
      .select(col("dim_key"), col("w.valid_from").as("valid_from"),
        col("w.valid_to").as("valid_to"),
        concat_ws("_", col("r_name"), col("w.ver")).as("attr"))
  }

  /** Semi/anti joins (EXISTS / NOT EXISTS) — absent from the reference,
    * exposed by the engine (§2d note). Semi: customers having at least one
    * order over `minTotal`. */
  def customersWithBigOrders(customer: DataFrame, orders: DataFrame,
      minTotal: Double): DataFrame =
    customer.join(
        orders.where(col("o_totalprice") > minTotal),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))

  /** Anti: customers with no order above `minTotal` (NOT EXISTS). */
  def customersWithoutBigOrders(customer: DataFrame, orders: DataFrame,
      minTotal: Double): DataFrame =
    customer.join(
        orders.where(col("o_totalprice") > minTotal),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))

  /** Full outer: event users vs a customer-key slice — unmatched rows
    * survive on BOTH sides, null slots folded into flag/coalesce columns so
    * the output is null-free. */
  def fullOuterUserCustomer(events: DataFrame, customer: DataFrame,
      maxKey: Long): DataFrame = {
    val u = events.select(col("user_id")).distinct()
    val c = customer.where(col("c_custkey") < maxKey)
      .select(col("c_custkey"))
    u.join(c, col("user_id") === col("c_custkey"), "full_outer")
      .select(
        coalesce(col("user_id"), col("c_custkey")).as("id"),
        when(col("user_id").isNull, 0).otherwise(1).as("has_events"),
        when(col("c_custkey").isNull, 0).otherwise(1).as("is_customer"))
  }

  /** As-of join — for each left row, the single most recent right row with
    * rightTs <= leftTs on the same key. Spark has no native operator;
    * instead of a range join (quadratic per key) this uses the union+window
    * form: tag both sides, sort within key by (ts, side) with right rows
    * first on ties, and propagate the last non-null right value forward.
    * ONE shuffle on the key, linear state — the plan scales like a groupBy,
    * not like an interval join. Left rows with no prior right row are
    * dropped (inner as-of). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, leftId: String,
      rightId: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = left.select(col(key), col(leftTs).as("_ts"),
      lit(1).as("_side"), col(leftId).as("_lid"),
      lit(null).cast("long").as("_rid"))
    val r = right.select(col(key), col(rightTs).as("_ts"),
      lit(0).as("_side"), lit(null).cast("long").as("_lid"),
      col(rightId).as("_rid"))
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_asof", last(col("_rid"), ignoreNulls = true).over(w))
      .where(col("_side") === 1 && col("_asof").isNotNull)
      .select(col("_lid").as(leftId), col(key), col("_asof").as(rightId))
  }

  /** J17 — FORWARD as-of (time-to-convert): for each signup, the user's
    * first purchase at-or-after it, with the delay in milliseconds. The
    * forward direction comes free from the native BACKWARD as-of plan
    * (plans/AsOfJoin.scala) by negating the event time on both sides:
    * "last right with -p_ts <= -s_ts" is exactly "first right with
    * p_ts >= s_ts". Same one-shuffle sort-merge scale shape as j13.
    * Ties (two purchases at the identical instant for one user) resolve
    * to the SMALLEST purchase event_id via the negated-id tie column —
    * the same total order as the oracle's `ORDER BY p.ts, p.event_id`. */
  def timeToConvert(events: DataFrame): DataFrame = {
    val sg = events.where(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"),
        unix_millis(col("ts")).as("s_ms"),
        (-unix_micros(col("ts"))).as("neg_ts"))
    val pu = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_millis(col("ts")).as("p_ms"),
        (-unix_micros(col("ts"))).as("neg_ts"),
        (-col("event_id")).as("neg_id"))
    graft.plans.AsOf.join(sg, pu, "user_id", "neg_ts", "neg_ts",
        rightTie = Some("neg_id"))
      .select(col("signup_id"), col("user_id"),
        col("purchase_id__r").as("purchase_id"),
        (col("p_ms__r") - col("s_ms")).as("delay_ms"))
  }

  /** The unbounded-scale path for the J3 interval join: time-bucket BOTH
    * sides so the range predicate becomes an equi-join. Each right row
    * lands in its own bucket; each left row probes its bucket and the
    * `lookback` buckets before it (bucket width == the interval span, so
    * exactly 2 buckets per left row at lookback=1). The join key is
    * (user, bucket) — a plain shuffled equi-join whose per-task input is
    * bounded by bucket population, not by key history length; the exact
    * range check runs as a post-filter. Result set identical to the direct
    * range-condition join (spec-enforced). */
  def bucketedIntervalJoin(purchases: DataFrame, signups: DataFrame,
      intervalSec: Long = 900L): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"),
        floor(unix_timestamp(col("ts")) / intervalSec).as("_pb"))
      .withColumn("_lbkt", explode(array(col("_pb"), col("_pb") - 1)))
    val s = signups
      .select(col("event_id").as("signup_id"),
        col("user_id").as("s_user_id"), col("ts").as("s_ts"),
        floor(unix_timestamp(col("ts")) / intervalSec).as("_sbkt"))
    p.join(s,
        col("user_id") === col("s_user_id") && col("_lbkt") === col("_sbkt"))
      .where(col("s_ts") >= col("p_ts") - expr(s"INTERVAL $intervalSec SECONDS") &&
        col("s_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("user_id"), col("signup_id"))
  }

  /** Skew-safe equi-join by key salting: the big (skewed) side gets a
    * deterministic salt in [0, buckets), the small side is exploded x
    * buckets, and the join key becomes (key, salt) — one hot key spreads
    * over `buckets` reducers. Result set is identical to the unsalted
    * join. AQE's skew-join split does this adaptively for sort-merge
    * joins; explicit salting covers aggregations-after-join and engines
    * where AQE can't see the skew. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int, saltSrc: String): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(col(saltSrc)), lit(buckets)).cast("int"))
    val exploded = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }

  /** Star join at fact scale: lineitem x orders (shuffle) then broadcast
    * dims — revenue per region (J1+J6 composed, the DWS rollup shape).
    * Hints only on the fixed-cardinality dims (nation/region); customer
    * scales with SF and is left to AQE's size probe — same rationale as
    * [[snowflakeEnrich]]. */
  def revenueByRegion(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        sum(dec("l_extendedprice") * (lit(1).cast("decimal(3,2)") -
          col("l_discount").cast("decimal(3,2)")))
          .cast("double").as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("r_name"))
}
