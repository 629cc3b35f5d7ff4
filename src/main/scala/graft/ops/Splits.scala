package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-way stream splitting (SURVEY.md §2c X1–X3).
  *
  * Spark has no side outputs: parse ONCE, persist, then take N filtered
  * projections. In streaming the same functions run inside one foreachBatch
  * writing N sinks, so the upstream parse still executes once per batch.
  */
object Splits {

  /** X1 — 5-way log split (DwdBaseLog.java:110-173). Legs keyed like the
    * reference's side-output tags: page / start / err / display / action.
    * `display` vs `action` discriminates on the parsed props payload, like
    * the reference discriminates on nested arrays.
    */
  def splitLog(events: DataFrame): Map[String, DataFrame] = {
    val parsed = events.withColumn("k", from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))("k"))
    Map(
      "page" -> parsed.where(col("event_type").isin("view", "click")),
      "start" -> parsed.where(col("event_type") === "signup"),
      "err" -> parsed.where(col("event_type") === "error"),
      "display" -> parsed.where(col("event_type") === "purchase" && col("k") >= 50),
      // k < 50 OR unparsable props: mirrors splitLogCounts' `.otherwise`
      // branch so each leg frame's count equals the reported leg count
      "action" -> parsed.where(col("event_type") === "purchase" &&
        (col("k") < 50 || col("k").isNull)))
  }

  /** Leg-tagged row counts of the X1 split — the oracle-checkable summary.
    * Computed in ONE pass (leg as a CASE expression, then groupBy) — the
    * plan a 100 TB run wants: one scan, one parse, one tiny shuffle,
    * instead of 5 scans for 5 filtered legs.
    */
  def splitLogCounts(events: DataFrame): DataFrame = {
    // parse props ONCE into a materialized column — referencing the
    // from_json expression from several CASE branches would re-run the
    // (non-codegen) JSON parse per reference
    val parsed = events.withColumn("k",
      from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))("k"))
    // explicit purchase branch for 'action' + a 'dropped' bucket for any
    // unknown/NULL event_type, so every leg count equals the matching
    // splitLog frame's count (a bare .otherwise would claim rows no leg
    // frame contains)
    val leg = when(col("event_type").isin("view", "click"), "page")
      .when(col("event_type") === "signup", "start")
      .when(col("event_type") === "error", "err")
      .when(col("event_type") === "purchase" && col("k") >= 50, "display")
      .when(col("event_type") === "purchase" &&
        (col("k") < 50 || col("k").isNull), "action")
      .otherwise("dropped")
    parsed.groupBy(leg.as("leg")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("leg"))
  }

  /** X2 — array explode enriched with parent columns
    * (DwdBaseLog.java:130-152: explode `displays` keeping common/ts/page).
    * Here: documents exploded to words, keeping parent doc_id/lang.
    */
  def explodeWords(documents: DataFrame, maxDocId: Long): DataFrame =
    documents
      .where(col("doc_id") < maxDocId)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("word"))

  /** X3 — config-driven N-way fact router (DwdBaseDb.java:96-135): join
    * records to a (source, sink_topic) config, unmatched records dropped.
    * The config join is a broadcast: Catalyst auto-broadcasts the tiny
    * config frame, so routing adds no shuffle.
    */
  def routeByConfig(events: DataFrame, config: DataFrame): DataFrame =
    events.join(broadcast(config), Seq("event_type"))

  /** S2/X3 — CURRENT routing table from a CDC config EVENT LOG: rows
    * (op, event_type, sink_topic, ts) with op in c/u/d, the Debezium-ish
    * shape of the reference's `table_process_dwd` MySQL-CDC stream.
    * Keep-last per key ((ts, op, sink_topic) total order, so equal
    * timestamps cannot flip the result across engines), and a key whose
    * LAST event is a delete disappears from the table entirely — the
    * reference's config-delete path, where removing a route also retires
    * the downstream dim table (DimApp.java:85-140 drops the HBase table;
    * the parquet analogue is deleting/ignoring the topic's output dir —
    * a side effect the OWNER of the sink runs on the routes that left
    * the table, not something the router does implicitly, so a replayed
    * batch can never destroy data). Feed the result to [[routeByConfig]]
    * or `Streams.routedSink`'s per-batch config thunk: a delete lands at
    * batch granularity like every other config change (SURVEY §7). */
  def routeConfigFromCdc(cdcLog: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts").desc, col("op").desc, col("sink_topic").desc)
    cdcLog
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1 && col("op") =!= "d")
      .select(col("event_type"), col("sink_topic"))
  }

  /** The default routing config used by queries (driver-side literal —
    * the batch stand-in for the MySQL `table_process_dwd` CDC table). */
  def defaultRouteConfig(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("signup", "dwd_user_register"),
      ("purchase", "dwd_trade_order"),
      ("click", "dwd_traffic_click"),
      ("view", "dwd_traffic_page"))
      .toDF("event_type", "sink_topic")
  }

  /** X3 summary — routed record count per sink topic. */
  def routeCounts(events: DataFrame, config: DataFrame): DataFrame =
    routeByConfig(events, config)
      .groupBy(col("sink_topic")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("sink_topic"))
}
