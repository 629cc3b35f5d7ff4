package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

/** ScalaCheck-generated property tests (SURVEY.md §5): date utils, netting
  * law, dedup idempotence — deterministic seed, run through the real
  * engine. (Plain ScalaCheck Gens sampled manually — scalatestplus bridge
  * is not on the offline classpath.) */
class PropertySpec extends GraftSuite {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen(Gen.Parameters.default, Seed(42L + i)))

  test("P9 date formatting matches java.time for arbitrary instants") {
    import spark.implicits._
    val gen = Gen.chooseNum(0L, 4102444800000L) // 1970..2100 in ms
    val ms = samples(gen, 50)
    val df = ms.map(m => (1L, m)).toDF("event_id", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    val got = ops.Etl.dateFormats(df).collect()
      .map(r => (r.getString(1), r.getString(2)))
    ms.zip(got).foreach { case (m, (dt, d8)) =>
      val e = java.time.Instant.ofEpochMilli(m)
        .atZone(java.time.ZoneOffset.UTC)
      assert(dt == e.format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss")), s"ms=$m")
      assert(d8 == e.format(java.time.format.DateTimeFormatter
        .ofPattern("yyyyMMdd")), s"ms=$m")
    }
  }

  test("A8 law: dedup-first daily-uu == COUNT(DISTINCT) on generated logs") {
    import spark.implicits._
    val rowGen = for {
      user <- Gen.chooseNum(1L, 5L)
      dayOff <- Gen.chooseNum(0, 3)
      sec <- Gen.chooseNum(0, 86399)
      v <- Gen.chooseNum(1, 9999)
    } yield (user, dayOff, sec, v / 100.0)
    (0 until 5).foreach { round =>
      val rows = samples(Gen.listOfN(60, rowGen), 1).head
      val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
      val df = rows.zipWithIndex.map { case ((u, d, s, v), i) =>
        (i.toLong, new java.sql.Timestamp(base + d * 86400000L + s * 1000L),
          u, "e", v)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      val uu = ops.Aggs.dailyUniqueUsers(df).collect()
        .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      val cd = df.groupBy(to_date(col("ts")).as("d"))
        .agg(countDistinct(col("user_id"))).collect()
        .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      assert(uu == cd)
      // A7: keep-last yields exactly one row per user, idempotently
      val once = ops.Aggs.keepLastPerUser(df)
      assert(once.count() == df.select("user_id").distinct().count())
    }
  }

  test("tokenizer is idempotent on its own output (generated strings)") {
    samples(Gen.asciiPrintableStr, 200).foreach { s =>
      val toks = s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val retok = toks.mkString(" ").toLowerCase
        .split("[^a-z0-9]+").filter(_.nonEmpty)
      assert(toks.toSeq == retok.toSeq, s"input=$s")
    }
  }
}
