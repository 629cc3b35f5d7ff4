package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{DataQuality, Pipeline}
import graft.ops.DataQuality.Check

/** Hand-computed fixtures for the data-quality gate and the behavioral
  * sequence builder. */
class DataQualitySpec extends GraftSuite {

  private def fixture = {
    import spark.implicits._
    Seq(
      (Option(1L), Option("a"), Option(5.0), "x@y.com"),
      (Option(2L), Option("b"), Option(50.0), "nope"),
      (Option(2L), Option.empty[String], Option(-1.0), "z@w.org"),
      (Option.empty[Long], Option("zz"), Option.empty[Double], "bad too"))
      .toDF("id", "cat", "v", "email")
  }

  test("expectations: every check kind, hand-computed violation counts") {
    val out = DataQuality.expectations(fixture, Seq(
      Check("k1", "id", "not_null"),
      Check("k2", "v", "between", lo = 0.0, hi = 10.0),
      Check("k3", "cat", "in_set", allowed = Seq("a", "b")),
      Check("k4", "email", "matches", regex = "^[^@ ]+@[^@ ]+$"),
      Check("k5", "id", "unique")))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out("k1") == (("id", "not_null", 1L, 4L)))
    // 50.0 and -1.0 breach [0, 10]; the NULL is not a range violation
    assert(out("k2") == (("v", "between", 2L, 4L)))
    // "zz" is out of set; NULL passes
    assert(out("k3") == (("cat", "in_set", 1L, 4L)))
    assert(out("k4") == (("email", "matches", 2L, 4L)))
    // 4 rows - 2 distinct non-null ids = 2 (the dup 2L AND the null row)
    assert(out("k5") == (("id", "unique", 2L, 4L)))
  }

  test("expectations: empty input reports zero violations, zero total") {
    val out = DataQuality.expectations(fixture.where(lit(false)), Seq(
      Check("k1", "id", "not_null"), Check("k5", "id", "unique")))
      .collect().map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    assert(out == Map("k1" -> ((0L, 0L)), "k5" -> ((0L, 0L))))
  }

  test("expectations rejects unknown kinds and duplicate ids") {
    intercept[IllegalArgumentException] {
      DataQuality.expectations(fixture, Seq(Check("k", "id", "nope")))
        .collect()
    }
    intercept[IllegalArgumentException] {
      DataQuality.expectations(fixture,
        Seq(Check("k", "id", "not_null"), Check("k", "v", "not_null")))
    }
  }

  test("expectations rejects silently-vacuous configs (NaN bounds, " +
    "empty regex, empty set)") {
    // each of these would report zero violations forever if accepted
    intercept[IllegalArgumentException] {
      DataQuality.expectations(fixture, Seq(Check("k", "v", "between")))
    }
    intercept[IllegalArgumentException] {
      DataQuality.expectations(fixture, Seq(Check("k", "email", "matches")))
    }
    intercept[IllegalArgumentException] {
      DataQuality.expectations(fixture, Seq(Check("k", "cat", "in_set")))
    }
  }

  test("columnProfile: null/distinct/min/max per column, strings unprofiled") {
    val out = DataQuality.columnProfile(fixture, Seq("id", "cat", "v"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(out("id") == ((1L, 2L, Some(1.0), Some(2.0))))
    assert(out("cat") == ((1L, 3L, None, None)))
    assert(out("v") == ((1L, 3L, Some(-1.0), Some(50.0))))
  }

  test("psi: hand-computed two-bin drift, nulls excluded, symmetric terms") {
    import spark.implicits._
    // ref: 1, 2, 6 -> bins 0,0,1 ; cur: 1, 7, 8 (+null dropped) -> 0,1,1
    val rows = Seq(
      (true, Option(1.0)), (true, Option(2.0)), (true, Option(6.0)),
      (false, Option(1.0)), (false, Option(7.0)), (false, Option(8.0)),
      (false, Option.empty[Double]))
      .toDF("is_ref", "v")
    val out = DataQuality.psi(rows, "v", col("is_ref"), 2, 0.0, 10.0)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // p_ref(b0) = (2+1)/(3+2) = 0.6, p_cur(b0) = (1+1)/(3+2) = 0.4
    // term = 0.2 * ln(1.5) = 0.081093; bin 1 is the mirror image
    assert(out(0L) == ((2L, 1L, 0.081093)))
    assert(out(1L) == ((1L, 2L, 0.081093)))
  }

  test("psi: identical slices give all-zero terms over the full bin spine") {
    import spark.implicits._
    val rows = Seq((true, 1.0), (false, 1.0)).toDF("is_ref", "v")
    val out = DataQuality.psi(rows, "v", col("is_ref"), 3, 0.0, 9.0)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    // empty bins 1 and 2 still appear (spine), every term exactly 0
    assert(out.map(_._1).toSet == Set(0L, 1L, 2L))
    assert(out.forall(_._2 == 0.0))
  }

  test("psi: out-of-range values clamp into the edge bins") {
    import spark.implicits._
    val rows = Seq((true, -5.0), (true, 100.0), (false, 3.0))
      .toDF("is_ref", "v")
    val out = DataQuality.psi(rows, "v", col("is_ref"), 2, 0.0, 10.0)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(0L) == ((1L, 1L))) // -5 clamps up to bin 0
    assert(out(1L) == ((1L, 0L))) // 100 clamps down to bin 1
    intercept[IllegalArgumentException] {
      DataQuality.psi(rows, "v", col("is_ref"), 1, 0.0, 10.0)
    }
    intercept[IllegalArgumentException] {
      DataQuality.psi(rows, "v", col("is_ref"), 2, 10.0, 10.0)
    }
  }

  test("userEventSequences: order, ts-tie by event_id, cap, span") {
    import spark.implicits._
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 10L, "view"),
      (1L, Timestamp.valueOf("2024-01-01 00:00:05"), 11L, "click"),
      // same ts as event 11 but smaller id -> sorts first
      (1L, Timestamp.valueOf("2024-01-01 00:00:05"), 9L, "signup"),
      // 4th event: beyond the maxLen=3 cap, must not appear
      (1L, Timestamp.valueOf("2024-01-01 00:01:00"), 12L, "purchase"),
      (2L, Timestamp.valueOf("2024-01-01 08:00:00"), 20L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Pipeline.userEventSequences(ev, maxLen = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == (("view,signup,click", 3L, 5L)))
    assert(out(2L) == (("view", 1L, 0L)))
  }

  test("nextEventPairs: causal prefixes, cap excludes tail, singletons skip") {
    import spark.implicits._
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 10L, "view"),
      (1L, Timestamp.valueOf("2024-01-01 00:00:05"), 11L, "click"),
      (1L, Timestamp.valueOf("2024-01-01 00:00:05"), 9L, "signup"),
      (1L, Timestamp.valueOf("2024-01-01 00:01:00"), 12L, "purchase"),
      (2L, Timestamp.valueOf("2024-01-01 08:00:00"), 20L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Pipeline.nextEventPairs(ev, maxLen = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getString(2), r.getString(3))))
      .toMap
    // ordered user-1 window: view, signup, click (purchase capped away)
    assert(out == Map(
      (1L, 2) -> (("view", "signup")),
      (1L, 3) -> (("view,signup", "click"))))
  }

  test("jsDivergence: hand-computed terms, symmetric, zero on identity") {
    import spark.implicits._
    // disjoint supports: a is ref-only, b is cur-only; K=2, totals 2/2
    val rows = Seq((true, "a"), (true, "a"), (false, "b"), (false, "b"))
      .toDF("is_ref", "cat")
    val out = DataQuality.jsDivergence(rows, "cat", col("is_ref"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // p=0.75, q=0.25, m=0.5: 0.375*ln(1.5) + 0.125*ln(0.5) = 0.065406
    assert(out("a") == ((2L, 0L, 0.065406)))
    assert(out("b") == ((0L, 2L, 0.065406)))
    // JSD is symmetric in the slices: swapping ref/cur preserves terms
    val swapped = DataQuality.jsDivergence(rows, "cat", !col("is_ref"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(swapped == Map("a" -> 0.065406, "b" -> 0.065406))
    // identical distributions: every term exactly zero
    val same = Seq((true, "a"), (false, "a"), (true, "b"), (false, "b"))
      .toDF("is_ref", "cat")
    assert(DataQuality.jsDivergence(same, "cat", col("is_ref"))
      .collect().forall(_.getDouble(3) == 0.0))
  }

  test("embeddingW1: zero on identical slices, exactly |δ| under a " +
      "constant shift, empty-slice dims dropped") {
    import spark.implicits._
    def w1Of(df: org.apache.spark.sql.DataFrame) =
      DataQuality.embeddingW1(df, col("vec_id") % 2 === 0)
        .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    // identical multisets in both slices -> W1 == 0 on every dim
    val base = Seq(0.11f, -0.52f, 0.9f, 0.301f, -0.017f)
    val same = base.zipWithIndex.flatMap { case (v, i) =>
      Seq((2L * i, Array(v, v / 2)), (2L * i + 1, Array(v, v / 2)))
    }.toDF("vec_id", "embedding")
    assert(w1Of(same) == Map(1 -> 0.0, 2 -> 0.0))
    // constant shift δ on dim 1 only: W1(X, X+δ) == δ exactly (the
    // unit-carrying property KL-family scores lack); dim 2 untouched
    val delta = 0.25f
    val shifted = base.zipWithIndex.flatMap { case (v, i) =>
      Seq((2L * i, Array(v, v / 2)), (2L * i + 1, Array(v + delta, v / 2)))
    }.toDF("vec_id", "embedding")
    assert(w1Of(shifted) == Map(1 -> 0.25, 2 -> 0.0))
    // a dim is REPORTED only when both slices are non-empty: an
    // all-even-id corpus has no current slice at all -> no rows
    val oneSided = base.zipWithIndex
      .map { case (v, i) => (2L * i, Array(v)) }
      .toDF("vec_id", "embedding")
    assert(w1Of(oneSided).isEmpty)
    // non-negativity on an arbitrary asymmetric fixture
    val ragged = Seq((0L, Array(0.9f, -0.3f)), (1L, Array(-0.4f, 0.8f)),
      (2L, Array(0.05f, 0.05f)), (3L, Array(1.0f, -1.0f)),
      (5L, Array(-0.2f, 0.6f))).toDF("vec_id", "embedding")
    assert(w1Of(ragged).values.forall(_ >= 0.0))
  }

  test("refIntegrity: orphans counted, parent dup keys don't multiply") {
    import spark.implicits._
    val child = Seq(Option(1L), Option(2L), Option(2L), Option(3L),
      Option.empty[Long]).toDF("fk")
    val parent = Seq(1L, 1L, 2L).toDF("pk") // dup key 1 must not double-count
    val r = DataQuality.refIntegrity(child, "fk", parent, "pk", "c->p")
      .collect().head
    assert((r.getString(0), r.getLong(1), r.getLong(2)) == (("c->p", 4L, 1L)))
    // empty child: zero rows, zero orphans (coalesced sum)
    val e = DataQuality.refIntegrity(child.where(lit(false)), "fk",
      parent, "pk", "c->p").collect().head
    assert((e.getLong(1), e.getLong(2)) == ((0L, 0L)))
  }
}
