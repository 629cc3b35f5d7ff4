package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the stateful operators (SURVEY.md §2e A7–A9, §2h T5).
  *
  * Each is a pure function over a streaming Dataset usable identically on a
  * batch frame in tests. State is keyed and bounded: pass `ttl`
  * (e.g. Some("36 hours")) for per-key processing-time expiry, replacing
  * the reference's ValueState/MapState TTL
  * (DwsTrafficVcChArIsNewPageViewWindow.java:61-105,
  * DwsTradeSkuOrderWindow.java:77-118, DwdBaseLog.java:72-108).
  * NOTE: with ProcessingTimeTimeout Spark keeps scheduling micro-batches to
  * expire state, so Trigger.AvailableNow never terminates — set a TTL only
  * for long-running deployments, None for bounded replays/tests.
  */
object Stateful {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class UuEmit(user_id: Long, event_date: String, event_id: Long)

  /** A8 streaming — first-event-of-day per user: emits one record per
    * (user, date) transition; GroupState holds the last-seen date string.
    * Timeout clears idle users after 36h of processing time (TTL 1 day in
    * the reference, DwsTradeCartAddUuWindow.java:83). */
  def firstEventOfDay(events: Dataset[Event],
      ttl: Option[String] = None): Dataset[UuEmit] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[String, UuEmit](
        OutputMode.Append,
        if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        case (_, it, state: GroupState[String]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
              .withZone(java.time.ZoneOffset.UTC)
            val out = scala.collection.mutable.ArrayBuffer[UuEmit]()
            var last = state.getOption.getOrElse("")
            it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val d = fmt.format(e.ts.toInstant)
              if (d > last) { out += UuEmit(e.user_id, d, e.event_id); last = d }
            }
            state.update(last)
            ttl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  case class Transition(user_id: Long, from_type: String, to_type: String)

  /** seq3 streaming twin — per-user consecutive-event transitions:
    * GroupState carries the user's LAST event (full-precision ts key,
    * event_id, type) across micro-batches; each batch sorts its per-user slice by
    * (ts, event_id), chains it onto the carried event, and emits one
    * (from, to) row per adjacency — so a groupBy(from,to).count over the
    * emits reproduces `Aggs.transitionCounts`' integer matrix exactly
    * when events arrive time-ordered per user (the same in-order
    * contract as every A-family twin; the funnel's disorder counters are
    * the audit for streams that violate it). State is ONE event per
    * user — bounded, TTL-expirable. */
  def transitionEmits(events: Dataset[Event],
      ttl: Option[String] = None): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, String), Transition](
        OutputMode.Append,
        if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        case (uid, it, state: GroupState[(Long, Long, String)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = scala.collection.mutable.ArrayBuffer[Transition]()
            var prev = state.getOption
            // order by the FULL timestamp (nanos folded into a micro
            // key), not ts.getTime: millisecond truncation could chain
            // two sub-millisecond-apart events in a different order
            // than Aggs.transitionCounts' full-precision ts ordering
            def tk(e: Event): Long =
              e.ts.getTime * 1000000L + e.ts.getNanos % 1000000L
            it.toSeq.sortBy(e => (tk(e), e.event_id)).foreach { e =>
              prev.foreach { case (_, _, pt) =>
                out += Transition(uid, pt, e.event_type)
              }
              prev = Some((tk(e), e.event_id, e.event_type))
            }
            prev.foreach(state.update)
            ttl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  case class UuNew(user_id: Long, event_date: String, uu: Int, is_new: Int)

  /** DwsTradeOrderWindow / DwsTradePaymentSucWindow streaming core
    * (DwsTradeOrderWindow.java:75-133, DwsTradePaymentSucWindow.java:72-119):
    * per-user last-active-date ValueState; the first event of a new day
    * emits uu=1, plus is_new=1 iff the user had no prior state at all.
    * Same-day re-deliveries are absorbed by the state, so an upstream join
    * that fans a record out never double-counts. */
  def uuNewEmits(events: Dataset[Event],
      ttl: Option[String] = None): Dataset[UuNew] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[String, UuNew](
        OutputMode.Append,
        if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        case (_, it, state: GroupState[String]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
              .withZone(java.time.ZoneOffset.UTC)
            val out = scala.collection.mutable.ArrayBuffer[UuNew]()
            var last = state.getOption.getOrElse("")
            it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val d = fmt.format(e.ts.toInstant)
              if (d > last) {
                out += UuNew(e.user_id, d, 1, if (last.isEmpty) 1 else 0)
                last = d
              }
            }
            state.update(last)
            ttl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  /** A8 on the MODERN state API (Spark 4 `transformWithState`): identical
    * semantics to `firstEventOfDay`, with state TTL declared via
    * `TTLConfig` instead of hand-rolled timers. Requires the RocksDB state
    * store provider (`spark.sql.streaming.stateStore.providerClass`).
    * CAVEAT (measured): a TTL forces TimeMode.ProcessingTime, and under
    * that mode Spark schedules micro-batches indefinitely — the same
    * never-terminating-AvailableNow behavior as
    * flatMapGroupsWithState + ProcessingTimeTimeout. TTL stays opt-in:
    * None for bounded replays/tests, Some(d) for long-running deployments.
    */
  class FirstEventProcessor(ttl: Option[java.time.Duration])
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, UuEmit] {
    @transient private var lastDate:
      org.apache.spark.sql.streaming.ValueState[String] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      val ttlConf = ttl
        .map(org.apache.spark.sql.streaming.TTLConfig.apply)
        .getOrElse(org.apache.spark.sql.streaming.TTLConfig.NONE)
      lastDate = getHandle.getValueState[String]("lastDate",
        org.apache.spark.sql.Encoders.STRING, ttlConf)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UuEmit] = {
      val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
        .withZone(java.time.ZoneOffset.UTC)
      val out = scala.collection.mutable.ArrayBuffer[UuEmit]()
      var last = if (lastDate.exists()) lastDate.get() else ""
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val d = fmt.format(e.ts.toInstant)
        if (d > last) { out += UuEmit(e.user_id, d, e.event_id); last = d }
      }
      lastDate.update(last)
      out.iterator
    }
  }

  /** A8 streaming via transformWithState (see FirstEventProcessor). */
  def firstEventOfDayTws(events: Dataset[Event],
      ttl: Option[java.time.Duration] = None): Dataset[UuEmit] = {
    val spark = events.sparkSession
    import spark.implicits._
    // TTL'd state requires TimeMode.ProcessingTime (see class caveat)
    val timeMode =
      if (ttl.isDefined) org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
      else org.apache.spark.sql.streaming.TimeMode.None()
    events
      .groupByKey(_.user_id)
      .transformWithState(new FirstEventProcessor(ttl), timeMode,
        OutputMode.Append())
  }

  case class Upsert(id: Long, user_id: Long, amount: Double,
      ts: java.sql.Timestamp)

  case class Delta(id: Long, user_id: Long, delta: Double)

  /** A7 streaming — subtract-last-value netting: repeated upserts of the
    * same key emit (current - previous) so downstream sums stay correct
    * without retractions (DwsTradeSkuOrderWindow.java:77-118; state TTL 30s
    * there, 1h here). */
  def deltaNetting(upserts: Dataset[Upsert],
      ttl: Option[String] = None): Dataset[Delta] = {
    val spark = upserts.sparkSession
    import spark.implicits._
    upserts
      .groupByKey(_.id)
      .flatMapGroupsWithState[Double, Delta](
        OutputMode.Append,
        if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        case (_, it, state: GroupState[Double]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = scala.collection.mutable.ArrayBuffer[Delta]()
            var prev = state.getOption.getOrElse(0.0)
            it.toSeq.sortBy(e => e.ts.getTime).foreach { e =>
              out += Delta(e.id, e.user_id, e.amount - prev)
              prev = e.amount
            }
            state.update(prev)
            ttl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  case class DocIn(doc_id: Long, text: String)

  case class DedupEmit(doc_id: Long, decision: String, dup_of: Option[Long])

  /** Streaming exact dedup — the ingest-time form of the incremental-dedup
    * fingerprint stage (`ops/Dedup.incrementalDedup`): documents keyed by
    * normalized-content fingerprint; keyed state holds the first-seen
    * doc_id (the keeper), so the keeper emits `keep` and every later
    * arrival of the same content emits `exact_dup` with dup_of = keeper.
    * Within one micro-batch the lowest doc_id wins, matching the batch
    * operator's min-id keeper rule; state is one long per distinct
    * content fingerprint — the smallest possible standing dedup index.
    * `ttl` bounds state exactly like the other ops (None for replays). */
  def exactDedupStream(docs: Dataset[DocIn],
      ttl: Option[String] = None): Dataset[DedupEmit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val timeout =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    docs
      .mapPartitions { it =>
        // digest hoisted per partition; hex via lookup table — the per-row
        // cost is the hash itself, not allocation/formatting
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = "0123456789abcdef".toCharArray
        it.map { d =>
          // Locale.ROOT: executor default locale must not change the
          // fingerprint (Turkish-I etc.) — matches the batch normText
          // (Spark's lower()) byte for byte
          val norm = Option(d.text).getOrElse("")
            .toLowerCase(java.util.Locale.ROOT)
            .replaceAll("[^a-z0-9]+", " ").trim
          md.reset()
          val dig = md.digest(norm.getBytes("UTF-8"))
          val sb = new java.lang.StringBuilder(32)
          dig.foreach { b =>
            sb.append(hex((b >> 4) & 0xf)); sb.append(hex(b & 0xf))
          }
          (sb.toString, d.doc_id)
        }
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, DedupEmit](
        OutputMode.Append, timeout) {
        case (_, it, state: GroupState[Long]) =>
          if (ttl.isDefined && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val ids = it.map(_._2).toArray.sorted
            val out = scala.collection.mutable.ArrayBuffer[DedupEmit]()
            // state.exists, not a sentinel: negative doc ids are legal
            var keeper =
              if (state.exists) Some(state.get) else None
            ids.foreach { id =>
              keeper match {
                case None =>
                  keeper = Some(id)
                  out += DedupEmit(id, "keep", None)
                case Some(k) =>
                  out += DedupEmit(id, "exact_dup", Some(k))
              }
            }
            keeper.foreach(state.update)
            ttl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  case class StageEmit(user_id: Long, stage_idx: Int, stage: String,
      ts: java.sql.Timestamp)

  /** The audited funnel's row type: `kind = "stage"` rows are the
    * funnel advancement (counters all zero); a `kind = "disorder"` row
    * (stage fields empty/null) carries the trigger's disorder counters
    * for one user, so a pipeline can aggregate and ALERT on them as
    * data instead of scraping warn-logs. */
  case class FunnelEmit(user_id: Long, kind: String, stage_idx: Int,
      stage: String, ts: java.sql.Timestamp, late_dropped: Int,
      stale_ignored: Int, evicted: Int)

  /** A21 streaming twin — per-user funnel state machine: a user advances to
    * stage k+1 on the first stage-(k+1) event STRICTLY after their stage-k
    * time (same strict-order semantics as `Aggs.funnelStages`; each user
    * emits each stage at most once, so stage counts downstream equal the
    * batch funnel).
    *
    * Out-of-order arrival ACROSS micro-batches is handled by buffering:
    * events for stages the user hasn't reached yet (e.g. a `purchase`
    * arriving a batch before its `click`) are held in keyed state and
    * replayed through the greedy chain whenever an earlier stage advances,
    * so cross-batch disorder converges to the batch funnel instead of
    * silently losing the later stage. The buffer is bounded: per pending
    * stage only the `maxPendingPerStage` SMALLEST (ts, event_id) candidates
    * are kept (the greedy chain always picks the minimum valid ts, so
    * evicting the largest can only turn an exact result into an undercount,
    * never a wrong emission). Already-emitted stages are immutable (Append
    * mode): a late CURRENT-stage event older than the committed stage time
    * could have lowered that stage's time in batch — that residual
    * divergence is counted and logged, not silent; a watermark-delayed
    * emitter would be needed to close it. */
  def streamingFunnel(events: Dataset[Event],
      stages: Seq[String] = Seq("view", "click", "purchase"),
      ttl: Option[String] = None,
      maxPendingPerStage: Int = 64): Dataset[StageEmit] = {
    val spark = events.sparkSession
    import spark.implicits._
    streamingFunnelAudited(events, stages, ttl, maxPendingPerStage)
      .filter(col("kind") === "stage")
      .map(e => StageEmit(e.user_id, e.stage_idx, e.stage, e.ts))
  }

  /** [[streamingFunnel]] with the disorder counters surfaced AS DATA:
    * alongside every `"stage"` advancement row, a trigger in which a
    * user's events were late-dropped, stale-ignored, or cap-evicted
    * emits one `"disorder"` row carrying those counts — the side output
    * a pipeline aggregates into an alert (sum of `late_dropped` > 0 ⇒
    * the append-mode funnel has diverged from the batch recurrence;
    * rising `evicted` ⇒ `maxPendingPerStage` is sized too small for the
    * stream's disorder). The warn-log stays for human eyes; this row is
    * for machines. */
  def streamingFunnelAudited(events: Dataset[Event],
      stages: Seq[String] = Seq("view", "click", "purchase"),
      ttl: Option[String] = None,
      maxPendingPerStage: Int = 64): Dataset[FunnelEmit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    def toTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    events
      .groupByKey(_.user_id)
      // state: (completed stages, last stage micros, pending future-stage
      // events as (stageIdx, micros, event_id))
      .flatMapGroupsWithState[(Int, Long, Seq[(Int, Long, Long)]), FunnelEmit](
        OutputMode.Append,
        if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        case (user, it, state: GroupState[(Int, Long, Seq[(Int, Long, Long)])]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var (done, lastTs, pending) =
              state.getOption.getOrElse((0, Long.MinValue, Seq.empty))
            val pool = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
            pool ++= pending
            var lateDropped = 0
            var staleIgnored = 0
            it.foreach { e =>
              stageIdx.get(e.event_type) match {
                case Some(s) if s >= done =>
                  pool += ((s, micros(e.ts), e.event_id))
                case Some(s) if s == done - 1 && micros(e.ts) < lastTs =>
                  // late event for an ALREADY-EMITTED stage, older than the
                  // committed stage time: batch would have chosen it as the
                  // stage time (lowering the threshold for later stages);
                  // Append mode can't retract, so count-and-log
                  lateDropped += 1
                case Some(_) =>
                  // stage already two-or-more behind the frontier (or at
                  // done-1 but not older than the committed time): cannot
                  // change the emitted chain, but keep the watched-not-
                  // silent contract — count it
                  staleIgnored += 1
                case None => () // not a funnel stage at all
              }
            }
            val out = scala.collection.mutable.ArrayBuffer[FunnelEmit]()
            // greedy chain over buffered + new events, exactly the batch
            // recurrence: t_k = min ts of stage-k events with ts > t_(k-1)
            var advanced = true
            while (advanced && done < stages.length) {
              val cand = pool
                .filter(p => p._1 == done && (done == 0 || p._2 > lastTs))
              if (cand.isEmpty) advanced = false
              else {
                val chosen = cand.minBy(p => (p._2, p._3))
                out += FunnelEmit(user, "stage", done + 1, stages(done),
                  toTs(chosen._2), 0, 0, 0)
                lastTs = chosen._2
                done += 1
              }
            }
            // retain only still-reachable future-stage events, bounded to
            // the smallest candidates per stage; count what the cap evicts
            // (the cap trades completeness on disorder-heavy streams for
            // bounded state — the trade must be visible, not silent)
            val reachable = pool.filter(p => p._1 >= done &&
              (p._1 > done || done == 0 || p._2 > lastTs))
            val kept = reachable
              .groupBy(_._1).valuesIterator
              .flatMap(_.sortBy(p => (p._2, p._3)).take(maxPendingPerStage))
              .toSeq
            val evicted = reachable.size - kept.size
            if (lateDropped > 0 || staleIgnored > 0 || evicted > 0) {
              org.slf4j.LoggerFactory.getLogger("graft.streaming.Stateful")
                .warn(s"streamingFunnel user $user: $lateDropped late " +
                  "event(s) older than an already-emitted stage time (batch " +
                  s"would have used them; Append cannot retract), " +
                  s"$staleIgnored stale event(s) behind the stage frontier, " +
                  s"$evicted pending event(s) evicted by the " +
                  s"maxPendingPerStage=$maxPendingPerStage cap")
              // the same counts AS DATA: one disorder row per (user,
              // trigger) — consumers alert on it (see scaladoc)
              out += FunnelEmit(user, "disorder", done, "", null,
                lateDropped, staleIgnored, evicted)
            }
            state.update((done, lastTs, kept))
            ttl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  case class VisitFlag(event_id: Long, user_id: Long, is_new: Int)

  /** A9 streaming — is_new correction: a visit claims is_new=1 only if this
    * user was never seen on an earlier date (DwdBaseLog.java:72-108).
    * State holds first-seen date. */
  def isNewFix(events: Dataset[Event]): Dataset[VisitFlag] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[String, VisitFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, it, state: GroupState[String]) =>
          val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
            .withZone(java.time.ZoneOffset.UTC)
          val out = scala.collection.mutable.ArrayBuffer[VisitFlag]()
          var firstDate = state.getOption.getOrElse("")
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val d = fmt.format(e.ts.toInstant)
            if (firstDate.isEmpty) firstDate = d
            out += VisitFlag(e.event_id, e.user_id,
              if (d == firstDate) 1 else 0)
          }
          state.update(firstDate)
          out.iterator
      }
  }
}
