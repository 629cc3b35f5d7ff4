package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sink builders (SURVEY.md §2a S4–S8).
  *
  * Streaming sinks (router, upsert) live in graft.streaming.Streams; these
  * are the batch/OLAP shapes.
  */
object Sinks {

  /** S7 — OLAP table sink: date-partitioned parquet (the Doris stand-in).
    * Partitioning by cur_date matches the reference's per-day OLAP layout
    * and gives partition pruning to every downstream date-ranged query. */
  def writeDatePartitioned(df: DataFrame, dateCol: String, path: String): Unit =
    df.withColumn("_date", col(dateCol).cast("string"))
      .write.mode("overwrite")
      .partitionBy("_date")
      .parquet(path)

  /** S7 incremental — dynamic partition overwrite: rewrite ONLY the date
    * partitions present in `df`, leaving the rest of the table untouched —
    * the idempotent backfill/late-restatement pattern for the OLAP sink
    * (re-running a day's DWS job replaces exactly that day). */
  def overwriteDatePartitions(df: DataFrame, dateCol: String,
      path: String): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.withColumn("_date", col(dateCol).cast("string"))
      .write.mode("overwrite").partitionBy("_date").parquet(path)
    finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** S4/S5 — Kafka record shape: per-row topic routing column + JSON value
    * (FlinkSinkUtil.java:38-52). Feed to `.writeStream.format("kafka")`
    * when the connector is on the classpath; the routing semantics are
    * exercised by Streams.routedSink's parquet twin. */
  def toKafkaRecords(df: DataFrame, topicCol: String): DataFrame =
    df.select(col(topicCol).as("topic"),
      to_json(struct(df.columns.filterNot(_ == topicCol).map(col): _*))
        .as("value"))
}
