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
    // events.ts is TIMESTAMP(NANOS) which Spark 4 rejects; read nanos as
    // long and truncate to microsecond timestamps (same floor semantics as
    // DuckDB's ns->us cast, so oracle comparisons at >=second granularity
    // agree). No query may emit raw ts — only derived date/hour/second
    // values — to keep sub-microsecond precision out of hash compares.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
    else df
  }
}
