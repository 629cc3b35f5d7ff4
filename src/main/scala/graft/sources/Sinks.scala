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

  /** Small-file compaction — the maintenance pass every long-running
    * micro-batch sink needs: a streaming job appending every trigger (or
    * a dynamic-partition backfill) leaves hundreds of KB-sized parquet
    * files whose per-file open/footer overhead eventually dominates scan
    * cost at 100 TB. Rewrites the directory into ceil(bytes/targetBytes)
    * files via `coalesce` — narrow, no shuffle: compaction only ever
    * REDUCES file count, so partitions merge in place (a `repartition`
    * would pay a full shuffle for identical output).
    *
    * Crash-safe like the streaming state sinks: the compacted copy is
    * fully written to a `_tmp` dir first, then swapped in with the same
    * two-rename discipline (`_old` backup, loud failure if a rename
    * reports false, backup deleted only after the swap lands). Readers
    * see the old or the new directory, never a half-written one.
    *
    * CONCURRENT WRITERS ARE NOT SUPPORTED: stop the appending query
    * before compacting. A file appended after the initial listing would
    * be silently dropped by the directory swap, so the listing is
    * re-taken just before the swap and the whole pass ABORTS (throws,
    * directory untouched) if it changed — the maintenance job retries
    * after quiescing the writer rather than losing committed data.
    * Returns (filesBefore, filesAfter). */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(dir)
    val dataFiles = fs.listStatus(target)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes)
      .toInt
    // compaction only MERGES (coalesce cannot split): already at or
    // below the target count -> leave the directory untouched
    if (dataFiles.length <= nOut) return (dataFiles.length, dataFiles.length)
    val df = spark.read.parquet(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir + "_tmp")
    val bak = new org.apache.hadoop.fs.Path(dir + "_old")
    df.coalesce(nOut).write.mode("overwrite").parquet(tmp.toString)
    // abort-if-changed guard: the compacted copy was built from the
    // initial listing; any file that appeared (or was rewritten) since
    // would be lost by the swap — fail loudly with the target untouched
    val nowFiles = fs.listStatus(target)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.getName, s.getLen)).sortBy(_._1).toSeq
    val thenFiles = dataFiles.map(s => (s.getPath.getName, s.getLen))
      .sortBy(_._1).toSeq
    if (nowFiles != thenFiles) {
      fs.delete(tmp, true)
      throw new IllegalStateException(
        s"compactParquet: $dir changed during compaction (a writer is " +
          "live?) — aborting without touching the directory; stop the " +
          "appending query and retry")
    }
    if (fs.exists(bak)) fs.delete(bak, true)
    require(fs.rename(target, bak), s"rename $target -> $bak failed")
    require(fs.rename(tmp, target),
      s"rename $tmp -> $target failed; previous data preserved at $bak")
    fs.delete(bak, true)
    val after = fs.listStatus(target)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    (dataFiles.length, after)
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
