package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-record transforms (SURVEY.md §2b P1–P10, §2g scalar functions).
  *
  * All ops are narrow (no shuffle) except the lag-based ones, which shuffle
  * once on their partition key. Everything stays inside whole-stage codegen
  * except `from_json` (CodegenFallback, used only where JSON parsing is the
  * operator itself).
  */
object Etl {

  /** P1 — parse-and-validate: parse `props` JSON, drop records missing
    * required keys. Reference: flatMap JSON.parseObject + key checks
    * (realtime-dwd .../DwdBaseLog.java:39-58, same pattern x12 apps).
    * Malformed JSON => from_json yields null => filtered, no exceptions.
    */
  def parseValidate(events: DataFrame, requiredTypes: Seq[String]): DataFrame =
    events
      .withColumn("j", parsedPropsOnce)
      .where(col("j.k").isNotNull && col("user_id").isNotNull &&
        col("event_type").isin(requiredTypes: _*))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("j.k").as("k"))

  /** `from_json(props)` evaluated ONCE per record (optimization-round
    * fix, guide §4.4 shape): a plain `withColumn` + filter on the parsed
    * struct lets predicate pushdown substitute the alias, leaving TWO
    * from_json evaluations in the physical plan — one in the pushed
    * Filter, one in the Project (both interpreted: from_json is
    * CodegenFallback), so every surviving record paid the Jackson parse
    * twice. Wrapping the parse in explode(array(...)) puts it in a
    * Generate operator (exactly one output row per input row — array(x)
    * is never null); a filter on generator output cannot be pushed below
    * the Generate, so the parse runs once and the cheap column
    * predicates still push to the scan. Results are bit-identical: the
    * struct, the null semantics, and the surviving rows are unchanged
    * (oracle-gated). */
  private def parsedPropsOnce: Column =
    explode(array(from_json(col("props"),
      org.apache.spark.sql.types.StructType.fromDDL("k INT"))))

  /** P1 dirty channel — the records `parseValidate` rejects, tagged with
    * the first failed check (the reference logs these from its catch block,
    * DwdBaseLog.java:54-56; at scale you route them to a quarantine sink
    * instead of dropping). Same single parse as the accept path — in a
    * streaming foreachBatch both legs share one scan. */
  def parseRejects(events: DataFrame, requiredTypes: Seq[String]): DataFrame =
    events
      .withColumn("j", parsedPropsOnce)
      .withColumn("reject_reason",
        when(col("j.k").isNull, "unparsable_props")
          .when(col("user_id").isNull, "missing_user")
          // null-safe: a NULL event_type is rejected by the accept path's
          // isin, so it must land here too (a bare NOT isin is NULL for
          // NULL input and would silently drop the record from BOTH legs)
          .when(col("event_type").isNull ||
            !col("event_type").isin(requiredTypes: _*), "unknown_type"))
      .where(col("reject_reason").isNotNull)
      .select(col("event_id"), col("reject_reason"))

  /** Synthesized Maxwell-style CDC envelope over `events` — the deterministic
    * stand-in for the reference's `topic_db` stream
    * (realtime-common .../util/SQLUtil.java:31-41: {database, table, type,
    * ts, data MAP, old MAP}). Amounts go through DECIMAL(18,2) so their
    * string forms agree exactly with the DuckDB oracle.
    */
  def toCdcEnvelope(events: DataFrame): DataFrame = {
    val amount = col("value").cast("decimal(18,2)")
    val typ = when(col("event_type") === "signup", "insert")
      .when(col("event_type") === "purchase", "insert")
      .when(col("event_type") === "click", "update")
      .when(col("event_type") === "view", "bootstrap-insert")
      .otherwise("delete")
    events.select(
      col("event_id"), col("user_id"), col("ts"),
      lit("gmall").as("database"),
      when(col("event_type") === "signup", "user_info")
        .when(col("event_type") === "purchase", "order_info")
        .when(col("event_type") === "click", "cart_info")
        .when(col("event_type") === "view", "page_log")
        .otherwise("err_log").as("table"),
      typ.as("type"),
      unix_millis(col("ts")).as("ts_ms"),
      map(
        lit("id"), col("event_id").cast("string"),
        lit("user_id"), col("user_id").cast("string"),
        lit("amount"), amount.cast("string")).as("data"),
      when(typ === "update",
        map(lit("amount"), (amount - lit(1.00).cast("decimal(18,2)"))
          .cast("decimal(18,2)").cast("string"))).as("old"))
  }

  /** Debezium-style CDC envelope {op, before, after} — the reference's
    * SECOND CDC format, used for config tables (DimApp.java:103-115,
    * DwdBaseDb.java:63-70): op c/u/d/r with typed before/after structs. */
  def toDebeziumEnvelope(events: DataFrame): DataFrame = {
    val amount = col("value").cast("decimal(18,2)")
    val op = when(col("event_type") === "signup", "c")
      .when(col("event_type") === "click", "u")
      .when(col("event_type") === "error", "d")
      .otherwise("r")
    events.select(
      col("event_id"), col("ts"), op.as("op"),
      when(op.isin("u", "d"), struct(
        col("event_id").as("id"),
        (amount - lit(2.50).cast("decimal(18,2)")).cast("decimal(18,2)")
          .as("amount"))).as("before"),
      when(op.isin("c", "u", "r"), struct(
        col("event_id").as("id"), amount.as("amount"))).as("after"))
  }

  /** P2 — CDC envelope filter on (database, table, type).
    * Reference: DwdTradeCartAdd.java:37-40, DimApp.java:64-75. */
  def cdcFilter(env: DataFrame, database: String, table: String,
      types: Seq[String]): DataFrame =
    env.where(col("database") === database && col("table") === table &&
      col("type").isin(types: _*))

  /** P3 — map-key projection: `data['id'] as id, ...`.
    * Reference: DwdTradeCartAdd.java:22-36 (every SQL app). */
  def mapProject(env: DataFrame, keys: Seq[String]): DataFrame =
    env.select(col("event_id") +: keys.map(k =>
      element_at(col("data"), k).as(k)): _*)

  /** P4 — conditional delta vs previous value per key (the batch analogue of
    * `if(type='insert', sku_num, new-old)`, DwdTradeCartAdd.java:27).
    * DECIMAL arithmetic for exactness, CAST to DOUBLE for output.
    */
  def deltaVsPrevious(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val cur = col("value").cast("decimal(18,2)")
    events
      .withColumn("prev", lag(col("value"), 1).over(w).cast("decimal(18,2)"))
      .select(col("event_id"), col("user_id"),
        when(col("prev").isNull, cur).otherwise(cur - col("prev"))
          .cast("double").as("delta"))
  }

  /** P5 — status-transition filter: previous state -> current state, the
    * batch twin of the CDC `old`-map predicates
    * (DwdTradeOrderCancelDetail.java:47-56, DwdTradeOrderPaySucDetail.java:21-37).
    */
  def statusTransition(events: DataFrame, from: String, to: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type") === from && col("event_type") === to)
      .select(col("event_id"), col("user_id"))
  }

  /** P6 — config-driven column pruning of the CDC `data` map: keep only the
    * sink columns configured for the record's table.
    * Reference: DimApp.java:206-217, DwdBaseDb.java:124-135.
    * Config is a tiny driver-side map => becomes a literal in the plan
    * (no shuffle, no lookup at runtime).
    */
  def pruneColumns(env: DataFrame, config: Map[String, Seq[String]]): DataFrame = {
    val keep = config.foldLeft(lit(null).cast("array<string>")) {
      case (acc, (tbl, cols)) =>
        when(col("table") === tbl, array(cols.map(lit): _*)).otherwise(acc)
    }
    env
      .withColumn("kept", map_filter(col("data"),
        (k, _) => array_contains(keep, k)))
      .where(col("kept").isNotNull && size(col("kept")) > 0)
      .select(col("event_id"), col("table"),
        array_join(array_sort(map_keys(col("kept"))), ",").as("kept_keys"))
  }

  /** P6/E3 — config-as-DATA variant: the keep-list arrives as a DataFrame
    * (the batch image of the reference's MySQL `table_process_dim` CDC
    * stream, TableProcessDim.java:10-27). The tiny config is collected on
    * the driver and becomes plan literals — in streaming this runs inside
    * foreachBatch, so config changes re-shape the plan at batch
    * granularity (SURVEY §7 accepted difference). */
  def pruneColumnsFromConfig(env: DataFrame, config: DataFrame): DataFrame = {
    val cfg = config.select("table", "sink_columns").collect()
      .map(r => r.getString(0) -> r.getString(1).split(",").toSeq).toMap
    pruneColumns(env, cfg)
  }

  /** P7 — snake_case JSON serialization for the sink
    * (DorisMapFunction.java:10-17): bean -> compact JSON string. */
  def toSnakeJson(events: DataFrame): DataFrame =
    events.select(col("event_id"),
      to_json(struct(col("event_id"), col("event_type"),
        col("value").cast("decimal(18,2)").cast("string").as("amount")))
        .as("payload"))

  /** P8 — timestamp unit normalization s<->ms (DwsTradeSkuOrderWindow.java:54). */
  def tsUnits(events: DataFrame): DataFrame =
    events.select(col("event_id"),
      unix_millis(col("ts")).as("ts_ms"),
      floor(unix_millis(col("ts")) / 1000).cast("long").as("ts_s")) // floor, not truncation: pre-1970 ts round toward -inf like the oracle

  /** P9/P10 — date/time formatting (DateFormatUtil.java:21-64; UTC here,
    * unlike the reference's hardcoded UTC+8). */
  def dateFormats(events: DataFrame): DataFrame =
    events.select(col("event_id"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("dt"),
      date_format(col("ts"), "yyyyMMdd").as("d8"),
      to_date(col("ts")).as("date_id"))

  /** 2g — string scalar suite: split/concat_ws/length/upper/substring. */
  def stringFuncs(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      concat_ws("_", col("lang"), col("source")).as("lang_src"),
      length(col("text")).as("text_len"),
      upper(col("lang")).as("lang_uc"),
      substring(col("text"), 1, 10).as("prefix10"),
      size(split(col("text"), " ")).as("n_words"))
}
