package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a named entry in
  * `queries`; each SQL-expressible one has a DuckDB oracle in `oracleSql`
  * (same column names — the driver sorts columns by name before hashing).
  * Entries without an oracle are rows-only checked and covered by ScalaTest.
  *
  * Numeric conventions for oracle parity (see .claude/skills/verify):
  * money/double aggregations go through exact DECIMAL(18,2) accumulation
  * then CAST to DOUBLE; integer sums in oracle SQL are CAST to BIGINT;
  * raw nanosecond timestamps never reach output.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def events(s: SparkSession, dir: String) = t(s, dir, "events")
  private def env(s: SparkSession, dir: String) =
    Etl.toCdcEnvelope(events(s, dir))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggs.dailyUniqueUsers(t(spark, "/root/testdata/sf0.001", "events"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(
    // ---- §2b projections / filters / per-record transforms ----
    "p1_parse_validate" -> ((s, d) =>
      Etl.parseValidate(events(s, d), Seq("click", "view", "purchase"))),
    "p2_cdc_filter" -> ((s, d) =>
      Etl.cdcFilter(env(s, d), "gmall", "cart_info", Seq("update"))
        .select("event_id", "table", "type", "ts_ms")),
    "p3_map_project" -> ((s, d) =>
      Etl.mapProject(
        Etl.cdcFilter(env(s, d), "gmall", "order_info", Seq("insert")),
        Seq("id", "user_id", "amount"))),
    "p4_conditional_delta" -> ((s, d) =>
      Etl.deltaVsPrevious(events(s, d))),
    "p5_status_transition" -> ((s, d) =>
      Etl.statusTransition(events(s, d), "signup", "purchase")),
    "p6_config_prune" -> ((s, d) =>
      Etl.pruneColumns(env(s, d), Map(
        "cart_info" -> Seq("id", "user_id"),
        "order_info" -> Seq("id", "amount"),
        "user_info" -> Seq("id"),
        "page_log" -> Seq("id")))),
    "p7_snake_json" -> ((s, d) => Etl.toSnakeJson(events(s, d))),
    "p8_ts_units" -> ((s, d) => Etl.tsUnits(events(s, d))),
    "p9_date_formats" -> ((s, d) => Etl.dateFormats(events(s, d))),
    "g1_string_funcs" -> ((s, d) => Etl.stringFuncs(t(s, d, "documents"))),
    // ---- §2c splits ----
    "x1_split_counts" -> ((s, d) => Splits.splitLogCounts(events(s, d))),
    "x2_explode_words" -> ((s, d) =>
      Splits.explodeWords(t(s, d, "documents"), 200L)),
    "x3_route_counts" -> ((s, d) =>
      Splits.routeCounts(events(s, d), Splits.defaultRouteConfig(s))),
    // ---- §2e aggregations ----
    "a1_hourly_count_by_type" -> ((s, d) =>
      Aggs.hourlyCountByType(events(s, d))),
    "a8_daily_unique_users" -> ((s, d) =>
      Aggs.dailyUniqueUsers(events(s, d))),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = ListMap(
    "p1_parse_validate" ->
      """SELECT event_id, user_id, event_type,
        |       CAST(props->>'$.k' AS INTEGER) AS k
        |FROM events
        |WHERE props->>'$.k' IS NOT NULL AND user_id IS NOT NULL
        |  AND event_type IN ('click','view','purchase')""".stripMargin,
    "p2_cdc_filter" ->
      """SELECT event_id, 'cart_info' AS "table", 'update' AS type,
        |       epoch_ms(ts) AS ts_ms
        |FROM events WHERE event_type = 'click'""".stripMargin,
    "p3_map_project" ->
      """SELECT event_id,
        |       CAST(event_id AS VARCHAR) AS id,
        |       CAST(user_id AS VARCHAR) AS user_id,
        |       CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS amount
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    "p4_conditional_delta" ->
      """SELECT event_id, user_id,
        |       CAST(CASE WHEN prev IS NULL THEN cur ELSE cur - prev END
        |            AS DOUBLE) AS delta
        |FROM (SELECT event_id, user_id, CAST(value AS DECIMAL(18,2)) AS cur,
        |             lag(CAST(value AS DECIMAL(18,2))) OVER
        |               (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |      FROM events)""".stripMargin,
    "p5_status_transition" ->
      """SELECT event_id, user_id
        |FROM (SELECT event_id, user_id, event_type,
        |             lag(event_type) OVER
        |               (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |      FROM events)
        |WHERE prev = 'signup' AND event_type = 'purchase'""".stripMargin,
    "p6_config_prune" ->
      """SELECT event_id,
        |       CASE event_type WHEN 'click' THEN 'cart_info'
        |            WHEN 'purchase' THEN 'order_info'
        |            WHEN 'signup' THEN 'user_info'
        |            WHEN 'view' THEN 'page_log' END AS "table",
        |       CASE event_type WHEN 'click' THEN 'id,user_id'
        |            WHEN 'purchase' THEN 'amount,id'
        |            WHEN 'signup' THEN 'id'
        |            WHEN 'view' THEN 'id' END AS kept_keys
        |FROM events WHERE event_type <> 'error'""".stripMargin,
    "p7_snake_json" ->
      """SELECT event_id,
        |       '{"event_id":' || event_id || ',"event_type":"' || event_type
        |       || '","amount":"'
        |       || CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR)
        |       || '"}' AS payload
        |FROM events""".stripMargin,
    "p8_ts_units" ->
      """SELECT event_id, epoch_ms(ts) AS ts_ms,
        |       CAST(floor(epoch_ms(ts) / 1000.0) AS BIGINT) AS ts_s
        |FROM events""".stripMargin,
    "p9_date_formats" ->
      """SELECT event_id,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS dt,
        |       strftime(ts, '%Y%m%d') AS d8,
        |       CAST(ts AS DATE) AS date_id
        |FROM events""".stripMargin,
    "g1_string_funcs" ->
      """SELECT doc_id,
        |       lang || '_' || source AS lang_src,
        |       length(text) AS text_len,
        |       upper(lang) AS lang_uc,
        |       substring(text, 1, 10) AS prefix10,
        |       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words
        |FROM documents""".stripMargin,
    "x1_split_counts" ->
      """SELECT CASE WHEN event_type IN ('view','click') THEN 'page'
        |            WHEN event_type = 'signup' THEN 'start'
        |            WHEN event_type = 'error' THEN 'err'
        |            WHEN event_type = 'purchase'
        |                 AND CAST(props->>'$.k' AS INTEGER) >= 50
        |                 THEN 'display'
        |            ELSE 'action' END AS leg,
        |       COUNT(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "x2_explode_words" ->
      """SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
        |FROM documents WHERE doc_id < 200""".stripMargin,
    "x3_route_counts" ->
      """SELECT CASE event_type WHEN 'signup' THEN 'dwd_user_register'
        |            WHEN 'purchase' THEN 'dwd_trade_order'
        |            WHEN 'click' THEN 'dwd_traffic_click'
        |            WHEN 'view' THEN 'dwd_traffic_page' END AS sink_topic,
        |       COUNT(*) AS cnt
        |FROM events WHERE event_type <> 'error'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "a1_hourly_count_by_type" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS wstart,
        |       event_type, COUNT(*) AS cnt
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "a8_daily_unique_users" ->
      """SELECT CAST(ts AS DATE) AS event_date,
        |       COUNT(DISTINCT user_id) AS uu
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
