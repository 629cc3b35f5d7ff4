package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source-format breadth: the same frame round-trips through parquet, ORC,
  * JSON, and CSV with values preserved (timestamps compared at millisecond
  * precision — the common denominator of the text formats). */
class FormatsSpec extends GraftSuite {

  test("events round-trip through orc/json/csv") {
    val dir = Files.createTempDirectory("graft_fmt").toString
    val src = Tables.load(spark, sf, "events")
      .withColumn("ts_ms", unix_millis(col("ts")))
      .select("event_id", "user_id", "event_type", "value", "ts_ms")
    val want = src.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        math.round(r.getDouble(3) * 100), r.getLong(4))).toSet

    src.write.mode("overwrite").orc(s"$dir/orc")
    src.write.mode("overwrite").json(s"$dir/json")
    src.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")

    def got(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id").cast("long"), col("user_id").cast("long"),
        col("event_type"), col("value").cast("double"),
        col("ts_ms").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        math.round(r.getDouble(3) * 100), r.getLong(4))).toSet

    assert(got(spark.read.orc(s"$dir/orc")) == want)
    assert(got(spark.read.json(s"$dir/json")) == want)
    assert(got(spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$dir/csv")) == want)
  }
}
