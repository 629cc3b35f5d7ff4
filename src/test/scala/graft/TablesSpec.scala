package graft

import org.apache.spark.sql.functions._

/** Loader robustness against data-generation drift (round-6 postmortem).
  *
  * The driver has regenerated `events.parquet` across rounds with `ts` as
  * int64 nanoseconds (TIMESTAMP(NANOS) read via nanosAsLong) and as native
  * timestamp[us]. A loader hardcoded to one generation poisoned every
  * events query for a whole round; this spec writes tiny fixtures in each
  * physical encoding and asserts `Tables.load` yields the identical rows
  * from all of them, so schema drift degrades to nothing instead of
  * zeroing a round.
  */
class TablesSpec extends GraftSuite {

  private val instants =
    Seq("2024-01-01 10:00:00.123456", "2024-06-15 23:59:59.999999")

  private def writeFixture(dir: java.nio.file.Path, mode: String): Unit = {
    import spark.implicits._
    val base = instants.toDF("s")
      .select(to_timestamp(col("s")).as("tsv"), lit("click").as("event_type"))
    val df = mode match {
      case "long_nanos" =>
        // micros * 1000 stays well inside Long for modern dates
        base.select((unix_micros(col("tsv")) * 1000L).as("ts"), col("event_type"))
      case "timestamp_us" =>
        base.select(col("tsv").as("ts"), col("event_type"))
      case "timestamp_ntz" =>
        base.select(col("tsv").cast("timestamp_ntz").as("ts"), col("event_type"))
    }
    df.coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("events.parquet").toString)
  }

  test("Tables.load yields identical events rows for every ts encoding") {
    val root = java.nio.file.Files.createTempDirectory("graft-tables-spec")
    val got = Seq("long_nanos", "timestamp_us", "timestamp_ntz").map { mode =>
      val dir = root.resolve(mode)
      java.nio.file.Files.createDirectories(dir)
      writeFixture(dir, mode)
      val df = Tables.load(spark, dir.toString, "events")
      assert(df.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType, s"mode=$mode")
      mode -> df.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        .as[String](org.apache.spark.sql.Encoders.STRING)
        .collect().sorted.toSeq
    }.toMap
    assert(got("long_nanos") == got("timestamp_us"))
    assert(got("timestamp_us") == got("timestamp_ntz"))
    assert(got("timestamp_us") == instants.map(s =>
      // normalize to the emitted format
      s).sorted, s"unexpected values: ${got("timestamp_us")}")
  }

  test("Tables.load on driver data exposes ts as timestamp") {
    val events = Tables.load(spark, sf, "events")
    assert(events.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(events.limit(5).count() > 0)
  }
}
