package graft

import org.apache.spark.sql.functions._

/** Native AsOfJoinExec (custom LogicalPlan + Strategy + SparkPlan) vs the
  * union+window composition — identical results, one merge pass. */
class AsOfJoinSpec extends GraftSuite {

  private def sides = {
    val ev = Tables.load(spark, sf, "events")
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val s = ev.where(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"),
        col("ts").as("s_ts"))
    (p, s)
  }

  test("AsOfJoinExec appears in the physical plan") {
    val (p, s) = sides
    val df = plans.AsOf.join(p, s, "user_id", "ts", "s_ts")
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
  }

  test("native as-of join equals the union+window composition") {
    val (p, s) = sides
    val native = plans.AsOf.join(p, s, "user_id", "ts", "s_ts")
      .toDF("purchase_id", "user_id", "ts", "signup_id", "u2", "s_ts")
      .select("purchase_id", "signup_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val composed = ops.Joins.asofJoin(
        p, s.withColumnRenamed("s_ts", "ts2"),
        "user_id", "ts", "ts2", "purchase_id", "signup_id")
      .select("purchase_id", "signup_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native.nonEmpty)
    assert(native == composed)
  }

  test("native as-of join matches brute force on randomized inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def ts(sec: Int) = new java.sql.Timestamp(1704067200000L + sec * 1000L)
    (0 until 3).foreach { round =>
      val left = (0 until 300).map(i =>
        (i.toLong, rnd.nextInt(20).toLong, ts(rnd.nextInt(10000))))
      // unique (k, ts) on the right: equal-timestamp ties within a key are
      // resolved arbitrarily by the sort, so they'd make the test flaky
      val right = (0 until 200).map(i =>
        (1000L + i, rnd.nextInt(20).toLong, ts(rnd.nextInt(10000))))
        .groupBy(c => (c._2, c._3)).map(_._2.head).toSeq
      val lDf = left.toDF("lid", "k", "ts")
      val rDf = right.toDF("rid", "k", "rts")
      val got = plans.AsOf.join(lDf, rDf, "k", "ts", "rts")
        .toDF("lid", "k", "ts", "rid", "k2", "rts")
        .select("lid", "rid")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exp = left.flatMap { case (lid, k, lts) =>
        val cands = right.filter { case (_, rk, rts) =>
          rk == k && !rts.after(lts)
        }
        if (cands.isEmpty) None
        else Some(lid -> cands.maxBy(c => (c._3.getTime, -c._1))._1)
      }.toMap
      assert(got == exp, s"round $round mismatch")
    }
  }

  test("native as-of join: null keys and timestamps never match (SQL semantics)") {
    import spark.implicits._
    def ts(sec: Int) = new java.sql.Timestamp(1704067200000L + sec * 1000L)
    val left = Seq(
      (100L, Some(1L), Some(ts(10))),  // normal match
      (101L, None, Some(ts(5))),       // null key -> dropped
      (102L, Some(1L), None),          // null ts -> dropped
      (103L, Some(9L), Some(ts(9))))   // no right rows for key 9 -> dropped
      .toDF("lid", "k", "ts")
    val right = Seq(
      (200L, Some(1L), Some(ts(4))),
      (201L, Option.empty[Long], Some(ts(1))),  // null key: never a candidate
      (202L, Some(1L), Option.empty[java.sql.Timestamp]), // null ts: never a candidate
      (203L, Some(9L), Option.empty[java.sql.Timestamp]))
      .toDF("rid", "k", "rts")
    val got = plans.AsOf.join(left, right, "k", "ts", "rts")
      .toDF("lid", "k", "ts", "rid", "k2", "rts")
      .select("lid", "rid")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(100L -> 200L))
  }

  test("native as-of join: unmatched left rows dropped, ties match") {
    import spark.implicits._
    def ts(sec: Int) = new java.sql.Timestamp(1704067200000L + sec * 1000L)
    val left = Seq((100L, 1L, ts(10)), (101L, 1L, ts(5)), (102L, 2L, ts(3)))
      .toDF("lid", "k", "ts")
    val right = Seq((200L, 1L, ts(4)), (201L, 1L, ts(8)), (202L, 1L, ts(10)),
      (203L, 3L, ts(1))).toDF("rid", "k", "rts")
    val got = plans.AsOf.join(left, right, "k", "ts", "rts")
      .toDF("lid", "k", "ts", "rid", "k2", "rts")
      .select("lid", "rid")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(100L -> 202L, 101L -> 200L))
  }

  test("j17 forward as-of: first purchase at-or-after each signup") {
    import spark.implicits._
    // u1: purchase before signup ignored, first of the two later ones
    // wins; u2: purchase exactly AT signup counts (>= inclusive, delay
    // 0); u3: only earlier purchases -> dropped (inner forward as-of)
    val ev = Seq(
      (1L, "signup", "2024-01-01 10:00:00", 1L),
      (2L, "purchase", "2024-01-01 09:00:00", 1L),
      (3L, "purchase", "2024-01-01 10:30:00", 1L),
      (4L, "purchase", "2024-01-01 11:00:00", 1L),
      (5L, "signup", "2024-01-02 08:00:00", 2L),
      (6L, "purchase", "2024-01-02 08:00:00", 2L),
      (7L, "signup", "2024-01-03 12:00:00", 3L),
      (8L, "purchase", "2024-01-03 11:59:59", 3L))
      .toDF("event_id", "event_type", "s", "user_id")
      .select(col("event_id"), col("event_type"),
        to_timestamp(col("s")).as("ts"), col("user_id"))
    val got = ops.Joins.timeToConvert(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      1L -> ((3L, 1800000L)),
      5L -> ((6L, 0L))), s"unexpected: $got")
  }

  test("j17 tie-break: two purchases at the identical instant -> smallest event_id") {
    import spark.implicits._
    // the rightTie column (negated event_id) totalizes the right sort, so
    // the tie resolves like the oracle's ORDER BY p.ts, p.event_id —
    // independent of merge order. Shuffled input exercises the sort.
    val ev = Seq(
      (10L, "signup", "2024-01-01 10:00:00", 1L),
      (22L, "purchase", "2024-01-01 10:30:00", 1L),
      (21L, "purchase", "2024-01-01 10:30:00", 1L),
      (23L, "purchase", "2024-01-01 10:30:00", 1L))
      .toDF("event_id", "event_type", "s", "user_id")
      .select(col("event_id"), col("event_type"),
        to_timestamp(col("s")).as("ts"), col("user_id"))
      .repartition(4)
    val got = ops.Joins.timeToConvert(ev).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(10L -> 21L), s"tie must pick min event_id: $got")
  }
}
