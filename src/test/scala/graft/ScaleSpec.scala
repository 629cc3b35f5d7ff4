package graft

import org.apache.spark.sql.functions._

/** Scale smoke: the core operators on a synthetic 2M-row event log
  * (20x the sf0.1 bench table), asserting results stay exact (closed-form
  * expectations) and nothing degenerates (no driver collect, runtime
  * bounded). This is the local stand-in for the 100x question. */
class ScaleSpec extends GraftSuite {

  private lazy val big = {
    // deterministic synthetic: 2M events, 10k users, 30 days
    spark.range(0, 2000000).select(
      col("id").as("event_id"),
      timestamp_millis(lit(1704067200000L) + (col("id") % 2592000) * 1000)
        .as("ts"),
      (col("id") % 10000).as("user_id"),
      element_at(array(lit("click"), lit("view"), lit("purchase"),
        lit("signup"), lit("error")), (col("id") % 5 + 1).cast("int"))
        .as("event_type"),
      ((col("id") % 9999) / 100.0).as("value"),
      concat(lit("{\"k\": "), (col("id") % 100), lit("}")).as("props"))
  }

  test("a8 daily-uu on 2M rows is exact and bounded") {
    val t0 = System.nanoTime()
    val uu = ops.Aggs.dailyUniqueUsers(big).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"2M-row daily-uu took $sec%.1f s")
    // ids map one-to-one to seconds: day d holds 86400 consecutive ids,
    // covering all 10000 user residues => every user active every day
    assert(uu.length == 24) // 23 full days + one partial (12.8k ids)
    assert(uu.map(_.getLong(1)).forall(_ == 10000L))
    assert(sec < 120.0)
  }

  test("a7 keep-last on 2M rows: one row per user, exact ids") {
    val last = ops.Aggs.keepLastPerUser(big)
    assert(last.count() == 10000)
    // the last event for user u is the largest id congruent to u (mod 10000)
    val sample = last.where(col("user_id") === 42L).collect()(0)
    assert(sample.getLong(1) == 1990042L)
  }

  test("j1-style self join + agg on 2M rows holds") {
    val orders = big.where(col("event_type") === "purchase")
      .select(col("event_id").as("okey"), col("user_id"))
    val items = big.where(col("event_type") === "click")
      .select((col("event_id") + 3).as("okey"), col("value"))
    val joined = orders.join(items, "okey")
      .agg(count(lit(1)).as("n")).collect()(0).getLong(0)
    // purchases have id%5==2, clicks id%5==0 -> click id+3 hits id%5==3: none
    // shift by 3 lands on ids ≡ 3 (mod 5) -> purchase ids ≡ 2: no overlap
    assert(joined == 0L)
  }
}
