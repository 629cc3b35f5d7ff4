package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet test tables (TESTDATA.md).
  *
  * All operators in `graft.ops` are pure `DataFrame => DataFrame` functions;
  * this is the only place that touches storage paths. At cluster scale the
  * same functions run over whatever `spark.read` (or `readStream`) produces —
  * the parquet scan benefits from Catalyst column pruning and predicate
  * pushdown because every op keeps the plan fully declarative.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts has drifted across data generations: TIMESTAMP(NANOS)
    // (surfaced as long via nanosAsLong, Spark 4 rejects it natively) and
    // plain timestamp[us]. Branch on the ACTUAL schema instead of assuming
    // one generation, so a regenerated dataset can't poison every
    // events-reading query. Long nanos are floor-divided to microseconds
    // (same floor semantics as DuckDB's ns->us cast); native timestamps —
    // LTZ or NTZ — pass through as `timestamp` (the UTC session timezone
    // makes NTZ/LTZ the same instant). No query may emit raw ts — only
    // derived date/hour/second values — keeping sub-microsecond precision
    // out of oracle hash compares either way.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema.fieldNames.contains("ts")) {
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampType => df
        case TimestampNTZType =>
          df.withColumn("ts", col("ts").cast(TimestampType))
        case other => sys.error(
          s"events.ts has unsupported type $other; expected long nanos or timestamp")
      }
    } else df
  }
}
