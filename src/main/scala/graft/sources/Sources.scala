package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source builders (SURVEY.md §2a S1–S3, S10).
  *
  * The engine is source-agnostic — every op takes a DataFrame. These
  * builders produce the canonical frames. The Kafka builders mirror the
  * reference's source utils (FlinkSourceUtil.java:21-48, SQLUtil.java:9-42);
  * they require spark-sql-kafka on the runtime classpath (not present in
  * this test container, so they are compile-checked here and exercised via
  * the parquet/MemoryStream twins everywhere else).
  */
object Sources {

  /** S1 — Kafka value-only string stream (latest offsets, groupId). */
  def kafkaStream(spark: SparkSession, bootstrap: String, topic: String,
      groupId: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("kafka.group.id", groupId)
      .option("startingOffsets", "latest")
      .load()
      .selectExpr("CAST(value AS STRING) AS value")

  /** S3's decode stage, factored out so it is EXECUTABLE without a
    * broker: takes any Kafka WIRE-shaped frame (at minimum a `value`
    * column, binary or string, carrying the record payload — exactly
    * what `format("kafka").load()` emits) and applies the `topic_db`
    * table declaration: CAST(value AS STRING) → from_json(schema) →
    * proctime ≈ current_timestamp, rowtime from ts millis, bounded
    * out-of-orderness (SQLUtil.java:9-42). [[kafkaJsonTable]] is this
    * function over the Kafka source; the StreamingSpec wire-twin drives
    * THE SAME function object through a MemoryStream shaped like the
    * Kafka wire schema and a real `writeStream` — so the one pipeline a
    * broker would execute is the one the suite executes. */
  def decodeKafkaWire(wire: DataFrame, schema: StructType,
      watermark: String = "15 seconds"): DataFrame =
    wire.selectExpr("CAST(value AS STRING) AS value")
      .select(from_json(col("value"), schema).as("j"))
      .select(col("j.*"))
      .withColumn("proc_time", current_timestamp())
      .withColumn("row_time", timestamp_millis(col("ts")))
      .withWatermark("row_time", watermark)

  /** S3 — Kafka JSON table with event-time + watermark: the `topic_db`
    * declaration (proctime ≈ current_timestamp, rowtime from ts millis,
    * 15s bounded out-of-orderness as in SQLUtil.java:40). */
  def kafkaJsonTable(spark: SparkSession, bootstrap: String, topic: String,
      groupId: String, schema: StructType,
      watermark: String = "15 seconds"): DataFrame =
    decodeKafkaWire(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("kafka.group.id", groupId)
        .option("startingOffsets", "latest")
        .load(),
      schema, watermark)

  /** S2 — slowly-changing config source: re-read per micro-batch inside
    * foreachBatch (the Spark stand-in for a MySQL-CDC config stream —
    * changes apply at batch granularity, SURVEY §7). */
  def configSnapshot(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S10 — JDBC snapshot -> typed config rows (JdbcUtil.java:31-68);
    * in-container twin reads parquet with the same projection. */
  def jdbcSnapshot(spark: SparkSession, url: String, table: String,
      props: java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, props)
}
