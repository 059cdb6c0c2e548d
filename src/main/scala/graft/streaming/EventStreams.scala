package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming analytics — the continuously-running form of
  * the reference's polling refresh loop. Batch twins with oracles live
  * in `graft.operators.SessionOps`; these operate on unbounded input
  * with watermarks and managed state.
  */
object EventStreams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionState(start: Long, last: Long, n: Long, total: Double)

  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long,
                        total_value: Double)

  /** Streaming CSV/parquet directory source for the events schema —
    * the `readStream` flavor of the incremental loader. */
  def readEventStream(spark: SparkSession, srcDir: String): DataFrame =
    spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
        "event_type STRING, value DOUBLE")
      .parquet(srcDir)

  /** Watermarked tumbling 1-hour counts per event type — the
    * streaming twin of q51. Late data beyond 2h is dropped (state is
    * bounded; at scale watermark delay is the knob that caps state). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("total_value"))

  /** Watermarked HOPPING windows — the streaming twin of q78: 1-hour
    * windows sliding every 15 minutes, so each event contributes to 4
    * window states. Spark expands the covering windows map-side per
    * event (never a self-join); state holds the open windows per type
    * and evicts them once the watermark passes the window end. */
  def hoppingCounts(events: DataFrame, windowLen: String = "1 hour",
      slide: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Stream-stream interval join: each event joins order-stream rows
    * of the same user whose time falls in [event−1h, event]. Both
    * sides carry watermarks, so the join state store evicts rows once
    * the watermark passes the interval bound — bounded state on
    * unbounded inputs, the streaming twin of the as-of/range join.
    * Columns are pre-renamed; Spark rejects ambiguous names in
    * stream-stream join conditions. */
  def intervalJoin(events: DataFrame, orders: DataFrame): DataFrame = {
    val ev = events
      .select(col("event_id"), col("ts").as("ev_ts"),
        col("user_id").as("ev_user"))
      .withWatermark("ev_ts", "1 hour")
    val od = orders
      .select(col("order_id"), col("ts").as("od_ts"),
        col("user_id").as("od_user"), col("amount"))
      .withWatermark("od_ts", "1 hour")
    ev.join(od,
      col("ev_user") === col("od_user") &&
        col("od_ts") >= col("ev_ts") - expr("INTERVAL 1 HOUR") &&
        col("od_ts") <= col("ev_ts"))
  }

  /** Stream-static enrichment: join the event stream against a batch
    * dimension table (user profile, source metadata). The static side
    * is planned per micro-batch — small dims broadcast, so the stream
    * never shuffles; a left join keeps events whose dim row is
    * missing (null-extended), matching warehouse enrichment
    * semantics. No watermark needed: stream-static joins are
    * stateless (each micro-batch joins independently). */
  def enrich(events: DataFrame, dim: DataFrame,
      eventKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim),
      events(eventKey) === dim(dimKey), "left")
      .drop(dim(dimKey))

  /** Streaming exact deduplication on event_id:
    * `dropDuplicatesWithinWatermark` keeps one copy of each id seen
    * within the watermark horizon and — unlike plain
    * `dropDuplicates` — EVICTS state once the watermark passes, so
    * state is O(ids per horizon), not O(ids ever). This is the
    * streaming twin of q30's exact dedup, and the correct shape for
    * at-least-once upstream feeds (file redelivery, Kafka replays). */
  def dedupWithinWatermark(events: DataFrame,
      horizon: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("event_id")

  /** Sliding-window active users — the streaming twin of q259's
    * rolling 7-day WAU. EXACT distinct over a sliding frame is
    * unsupported in streaming (the per-window distinct set would be
    * unbounded state); `approx_count_distinct`'s HLL sketch is the
    * scale-correct substitute — each event updates the KB-sized
    * sketches of the covering windows map-side, sketches MERGE in
    * window state, and the watermark evicts a window once it can no
    * longer change. State = O(open windows × sketch size) at any
    * input rate. `rsd` trades sketch size vs error (0.01 ≈ ±1 %; at
    * small cardinalities the sparse HLL is exact, which the spec pins
    * against the batch plan bit-for-bit). */
  def slidingActiveUsers(events: DataFrame, windowLen: String = "7 days",
      slide: String = "1 day", horizon: String = "1 day",
      rsd: Double = 0.01): DataFrame =
    events
      .withWatermark("ts", horizon)
      .groupBy(window(col("ts"), windowLen, slide))
      .agg(approx_count_distinct(col("user_id"), rsd).as("active_users"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("active_users"))

  case class FunnelEv(us: Long, tpe: String)
  case class FunnelBuf(evs: List[FunnelEv], lastMs: Long)
  case class FunnelOut(user_id: Long, stage: String, reached_us: Long)

  /** Stage-ordered conversion funnel — the streaming twin of q88
    * (operators/SessionOps.scala): first `stages(0)` → first
    * `stages(1)` within `windowUs` of it → … per user, one output row
    * per (user, stage reached).
    *
    * Shape: flatMapGroupsWithState buffers each user's STAGE-RELEVANT
    * events (other types are dropped on entry) and replays q88's
    * stage-wise conditional-min logic when the user FINALIZES — the
    * event-time timeout fires once the watermark passes the user's
    * last activity + `idleGapMs`. Finalize-time evaluation (rather
    * than incremental stage tracking) is what makes out-of-order
    * arrival safe: a late-but-in-watermark first view shifts every
    * stage window earlier, which incremental tracking cannot undo.
    *
    * State is bounded: only `stages` types are kept; once a
    * first-stage event exists every event past
    * `v + (stages.length−1)·windowUs` is pruned (windows chain
    * forward from v; a LATER first view only tightens the bound); and
    * while NO first-stage event exists, everything below the current
    * watermark is pruned — a future view must carry ts ≥ watermark,
    * so a sub-watermark click/purchase with no stored view above it
    * can never be reached by any stage chain.
    *
    * The idle clock runs on ALL of the user's events (not just stage
    * types): any activity defers finalization, exactly like
    * [[sessionize]]'s gap — and it keeps the re-armed timeout at or
    * above the watermark (a stage-only clock could re-arm a
    * timestamp the watermark already passed, which Spark rejects and
    * fails the query on). Equality with batch q88 holds when
    * `idleGapMs` exceeds the max intra-user event gap; otherwise each
    * idle-separated activity span funnels independently (the
    * streaming-native semantics — a user can emit a stage row per
    * span). The spec pins stage-count equality across checkpoint
    * restarts. */
  def funnel(events: Dataset[Event],
      stages: Seq[String] = Seq("view", "click", "purchase"),
      windowUs: Long = 3L * 86400L * 1000000L,
      idleGapMs: Long = 30L * 86400L * 1000L,
      watermarkDelay: String = "1 day")
      (implicit spark: SparkSession): Dataset[FunnelOut] = {
    import spark.implicits._
    val stageSet = stages.toSet
    val tailUs = (stages.length - 1).toLong * windowUs

    // q88's stage-wise conditional mins over one user's buffered
    // events: v = min first-stage; each later stage = min of its type
    // within [prev, prev + windowUs]
    def finalize(userId: Long, evs: List[FunnelEv]): Iterator[FunnelOut] = {
      val byType = evs.groupBy(_.tpe)
      var reached = List.empty[FunnelOut]
      var cur = byType.getOrElse(stages.head, Nil)
        .map(_.us).minOption
      cur.foreach(us => reached ::= FunnelOut(userId, stages.head, us))
      stages.tail.foreach { st =>
        cur = cur.flatMap { prev =>
          byType.getOrElse(st, Nil).map(_.us)
            .filter(us => us >= prev && us <= prev + windowUs).minOption
        }
        cur.foreach(us => reached ::= FunnelOut(userId, st, us))
      }
      reached.reverse.iterator
    }

    def prune(evs: List[FunnelEv], wmUs: Long): List[FunnelEv] =
      evs.filter(_.tpe == stages.head).map(_.us).minOption match {
        case Some(v) => evs.filter(_.us <= v + tailUs)
        case None => evs.filter(_.us >= wmUs)
      }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBuf, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[FunnelBuf]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(b => finalize(userId, b.evs))
              .getOrElse(Iterator.empty)
            state.remove()
            out
          } else {
            val evs = batch.toList
            // microsecond-exact epoch (batch q88 compares unix_micros)
            val fresh = evs.filter(e => stageSet(e.event_type))
              .map(e => FunnelEv(
                math.floorDiv(e.ts.getTime, 1000L) * 1000000L +
                  e.ts.getNanos / 1000L, e.event_type))
            // the idle clock runs on EVERY event of the user's
            val lastMs = (evs.map(_.ts.getTime) ++
              state.getOption.map(_.lastMs)).max
            val buf = FunnelBuf(
              prune(state.getOption.map(_.evs).getOrElse(Nil) ++ fresh,
                state.getCurrentWatermarkMs() * 1000L),
              lastMs)
            state.update(buf)
            // belt and braces: never re-arm below the watermark
            state.setTimeoutTimestamp(math.max(
              buf.lastMs + idleGapMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  case class CohortBuf(days: List[Long], lastMs: Long)
  case class CohortOut(user_id: Long, cohort_day: Long, day_offset: Long)

  /** Streaming twin of q89's cohort retention: one row per
    * (user, active day within `maxOffsetDays` of their first day),
    * emitted when the user FINALIZES (event-time timeout) — the
    * downstream `groupBy(cohort_day, day_offset).count()` is the
    * batch query's survivor matrix. Finalize-time emission for the
    * same reason as [[funnel]]: a late-but-in-watermark EARLIER first
    * day re-bases every offset, which incremental emission cannot
    * retract. State per user is the distinct day set within
    * [min, min + maxOffsetDays] — ≤ maxOffsetDays+1 longs (later days
    * are pruned on every update; a later LOWER min only tightens the
    * bound) — plus the last-activity clock. All event types count,
    * matching the batch query. */
  def cohortOffsets(events: Dataset[Event], maxOffsetDays: Int = 14,
      idleGapMs: Long = 30L * 86400L * 1000L,
      watermarkDelay: String = "1 day")
      (implicit spark: SparkSession): Dataset[CohortOut] = {
    import spark.implicits._
    val DayUs = 86400L * 1000000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CohortBuf, CohortOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[CohortBuf]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map { b =>
              val cohort = b.days.min
              b.days.filter(_ <= cohort + maxOffsetDays).distinct.sorted
                .map(d => CohortOut(userId, cohort, d - cohort))
            }.getOrElse(Nil)
            state.remove()
            out.iterator
          } else {
            val evs = batch.toList
            val freshDays = evs.map(e => math.floorDiv(
              math.floorDiv(e.ts.getTime, 1000L) * 1000000L +
                e.ts.getNanos / 1000L, DayUs))
            val lastMs = evs.map(_.ts.getTime) ++:
              state.getOption.map(_.lastMs).toList
            if (lastMs.nonEmpty) {
              val all = (state.getOption.map(_.days).getOrElse(Nil) ++
                freshDays).distinct
              val mn = all.min
              state.update(CohortBuf(
                all.filter(_ <= mn + maxOffsetDays), lastMs.max))
              // never re-arm below the watermark (Spark rejects it)
              state.setTimeoutTimestamp(math.max(lastMs.max + idleGapMs,
                state.getCurrentWatermarkMs() + 1))
            }
            Iterator.empty
          }
      }
  }

  case class StreakBuf(islands: List[(Long, Long)], lastMs: Long)
  case class StreakOut(user_id: Long, best_streak: Long,
      n_streaks: Long, active_days: Long)

  /** Insert one active day into a disjoint, gap-separated island
    * list: covered days no-op, adjacent islands extend or MERGE (a
    * day can bridge two), isolated days open a new island — so the
    * state IS the gaps-and-islands structure, maintained in O(1)
    * islands per event instead of recomputed from a day set. */
  private[graft] def insertDay(islands: List[(Long, Long)],
      d: Long): List[(Long, Long)] =
    if (islands.exists(i => d >= i._1 && d <= i._2)) islands
    else {
      val left = islands.find(_._2 == d - 1)
      val right = islands.find(_._1 == d + 1)
      (left, right) match {
        case (Some(l), Some(r)) =>
          (l._1, r._2) :: islands.filterNot(i => i == l || i == r)
        case (Some(l), None) => (l._1, d) :: islands.filterNot(_ == l)
        case (None, Some(r)) => (d, r._2) :: islands.filterNot(_ == r)
        case (None, None) => (d, d) :: islands
      }
    }

  /** Streaming twin of q95's gaps-and-islands: per-user consecutive-
    * day streak stats (best / count / active days), emitted when the
    * user finalizes (event-time timeout). Finalize-time emission like
    * [[funnel]]/[[cohortOffsets]]: best_streak is holistic — one
    * late-but-in-watermark day can MERGE two islands and change every
    * number, which incremental emission cannot retract. State per
    * user is the merged interval list — O(islands), not O(events) or
    * O(days): out-of-order arrival within the watermark only ever
    * extends/merges intervals, never splits them. The idle clock runs
    * on every event; timeouts clamp to watermark+1. */
  def dailyStreaks(events: Dataset[Event],
      idleGapMs: Long = 30L * 86400L * 1000L,
      watermarkDelay: String = "1 day")
      (implicit spark: SparkSession): Dataset[StreakOut] = {
    import spark.implicits._
    val DayUs = 86400L * 1000000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[StreakBuf, StreakOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[StreakBuf]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map { b =>
              val lens = b.islands.map { case (s, e) => e - s + 1 }
              StreakOut(userId, lens.max, lens.size.toLong, lens.sum)
            }.toSeq
            state.remove()
            out.iterator
          } else {
            val evs = batch.toList
            if (evs.nonEmpty || state.exists) {
              val freshDays = evs.map(e => math.floorDiv(
                math.floorDiv(e.ts.getTime, 1000L) * 1000000L +
                  e.ts.getNanos / 1000L, DayUs))
              val islands = freshDays.foldLeft(
                state.getOption.map(_.islands).getOrElse(Nil))(insertDay)
              val lastMs = (evs.map(_.ts.getTime) ++
                state.getOption.map(_.lastMs)).max
              state.update(StreakBuf(islands, lastMs))
              state.setTimeoutTimestamp(math.max(lastMs + idleGapMs,
                state.getCurrentWatermarkMs() + 1))
            }
            Iterator.empty
          }
      }
  }

  /** Stateful gap sessionization (30-min inactivity) — the streaming
    * twin of q50, via flatMapGroupsWithState with EVENT-time timeout
    * (wall-clock timeouts would be nondeterministic and keep the
    * micro-batch engine spinning). One state object per active user;
    * sessions emit on gap or when the watermark passes last+gap, so
    * state is O(active users), not O(events). */
  def sessionize(events: Dataset[Event], gapMs: Long = 30L * 60 * 1000)
                (implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(st =>
              SessionOut(userId, new Timestamp(st.start), new Timestamp(st.last),
                st.n, st.total)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(st) if t - st.last <= gapMs =>
                  cur = Some(st.copy(last = t, n = st.n + 1,
                    total = st.total + e.value))
                case Some(st) =>
                  closed ::= SessionOut(userId, new Timestamp(st.start),
                    new Timestamp(st.last), st.n, st.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st.last + gapMs)
            }
            closed.reverse.iterator
          }
      }
  }

  /** open day → 6-dp-scaled decimal sum; closed (day, value) NEWEST
    * first, capped at terms−1. */
  case class EwmaBuf(openDays: Map[Long, Long],
      closed: List[(Long, Double)], lastMs: Long)
  case class EwmaOut(event_type: String, day: Long,
      daily_value: Double, ewma: Double)

  /** Streaming twin of q109's truncated EWMA: per event type, each
    * calendar day's value total smooths against the previous (up to)
    * 13 OBSERVED days, emitted when the WATERMARK closes the day —
    * append-mode-final, no retraction needed, because a day's sum
    * can only change while late events can still arrive. Per-type
    * state is O(1): the open days' sums (bounded by the watermark
    * delay) plus the last 13 closed values — never the event stream.
    *
    * Bit-equality with the batch rows is engineered, not approximate:
    * per-event values accumulate as 6-dp SCALED LONGS (the integer
    * form of the decimal accumulator — order-independent, so
    * arrival order and batch boundaries cannot move the sum), and
    * the weighted chain replays q109's literal weights in the same
    * left-associated IEEE order, absent terms contributing the same
    * `+ 0.0·w` the batch coalesce does. The spec pins row equality
    * with `q109_ewma` on every watermark-closed day across an
    * AvailableNow restart. */
  def dailyEwma(events: Dataset[Event], alpha: Double = 0.3,
      terms: Int = 14, watermarkDelay: String = "1 day",
      idleGapMs: Long = 30L * 86400L * 1000L)
      (implicit spark: SparkSession): Dataset[EwmaOut] = {
    import spark.implicits._
    val DayUs = 86400L * 1000000L
    val weights = (0 until terms).map(j => alpha * math.pow(1 - alpha, j))

    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    def scaled(v: Double): Long = java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .movePointRight(6).longValueExact

    // q109's chain verbatim: num = Σ w_j·v_j left-assoc with absent
    // terms as 0.0; den = Σ (present ? w_j : 0.0)
    def ewmaOf(series: List[Double]): Double = {
      var num = 0.0; var den = 0.0
      (0 until terms).foreach { j =>
        val present = j < series.length
        num = num + weights(j) * (if (present) series(j) else 0.0)
        den = den + (if (present) weights(j) else 0.0)
      }
      r6(num / den)
    }

    def finalizeDays(tpe: String, buf: EwmaBuf,
        wmUs: Long): (EwmaBuf, List[EwmaOut]) = {
      val ready = buf.openDays.keys
        .filter(d => (d + 1) * DayUs <= wmUs).toList.sorted
      var closed = buf.closed
      val outs = ready.map { d =>
        val v = new java.math.BigDecimal(buf.openDays(d))
          .movePointLeft(6).doubleValue
        val out = EwmaOut(tpe, d, r6(v), ewmaOf(v :: closed.map(_._2)))
        closed = ((d, v) :: closed).take(terms - 1)
        out
      }
      (buf.copy(openDays = buf.openDays -- ready, closed = closed), outs)
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[EwmaBuf, EwmaOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (tpe: String, batch: Iterator[Event], state: GroupState[EwmaBuf]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          if (state.hasTimedOut) {
            val (buf2, outs) = finalizeDays(tpe, state.get, wmUs)
            if (buf2.openDays.isEmpty && buf2.closed.isEmpty) state.remove()
            else if (buf2.openDays.isEmpty) {
              // idle type: open days drained, but the ≤13-day CLOSED
              // history must survive the idle gap — q109's batch chain
              // lags across observed-day gaps, so dropping it would
              // restart the EWMA from scratch when the type resumes
              // (divergence from the batch twin). A few doubles per
              // type; no new timeout — nothing is left to finalize
              // until fresh data re-arms one.
              state.update(buf2)
            } else {
              state.update(buf2)
              state.setTimeoutTimestamp(math.max(buf2.lastMs + idleGapMs,
                state.getCurrentWatermarkMs() + 1))
            }
            outs.iterator
          } else {
            val evs = batch.toList
            var buf = state.getOption.getOrElse(EwmaBuf(Map.empty, Nil, 0L))
            evs.foreach { e =>
              val us = math.floorDiv(e.ts.getTime, 1000L) * 1000000L +
                e.ts.getNanos / 1000L
              val d = math.floorDiv(us, DayUs)
              buf = buf.copy(openDays = buf.openDays +
                (d -> (buf.openDays.getOrElse(d, 0L) + scaled(e.value))))
            }
            val lastMs = (evs.map(_.ts.getTime) :+ buf.lastMs).max
            val (buf2, outs) = finalizeDays(tpe, buf.copy(lastMs = lastMs), wmUs)
            state.update(buf2)
            state.setTimeoutTimestamp(math.max(lastMs + idleGapMs,
              state.getCurrentWatermarkMs() + 1))
            outs.iterator
          }
      }
  }

  /** One versioned dimension row arriving on the CDC side of
    * [[asOfEnrich]]: `ts` is the version's effective time, `dim_id`
    * breaks ties among same-instant versions (highest wins — the
    * batch AsOfJoin's (ts, id)-max tiebreak), `dim_value` is the
    * enrichment payload. */
  case class DimUpdate(key: Long, ts: Timestamp, dim_id: Long,
                       dim_value: Double)

  private[streaming] case class AsOfEv(us: Long, eventId: Long,
                                       value: Double)
  private[streaming] case class AsOfDim(us: Long, dimId: Long,
                                        value: Double)
  private[streaming] case class AsOfIn(key: Long, ts: Timestamp,
      us: Long, isDim: Boolean, eventId: Long, evValue: Double,
      dimId: Long, dimValue: Double)
  private[streaming] case class AsOfBuf(events: List[AsOfEv],
                                        dims: List[AsOfDim])
  case class AsOfOut(key: Long, event_id: Long, event_us: Long,
      ev_value: Double, dim_us: Option[Long], dim_id: Option[Long],
      dim_value: Option[Double])

  /** Streaming AS-OF enrichment (round 13 — r12 verdict item 7): the
    * streaming twin of the native batch [[graft.plans.AsOfJoin]]
    * (q24/q48's shape — each event LEFT-joined to the LATEST dim
    * version at or before its timestamp), against a dim that arrives
    * as a CDC stream of versioned rows (`VersionedTable.changes` /
    * `graft_changes` mirrored into [[DimUpdate]]s) instead of a
    * static table — the classic "enrich clicks against a slowly
    * changing profile" shape [[enrich]] cannot express and
    * [[intervalJoin]] only approximates within a bounded interval.
    *
    * Shape: both sides watermark, union under a side tag, group by
    * the join key, flatMapGroupsWithState. An event FINALIZES — emits
    * exactly one row — once the watermark passes its timestamp: at
    * that point no admissible dim version (dim ts ≤ event ts) can
    * still arrive, so the backward match is provably final; an event
    * whose key never saw a dim version at or below it emits
    * null-extended (LEFT semantics), never silently drops.
    * Finalize-time evaluation makes out-of-order arrival safe on BOTH
    * sides, exactly like [[funnel]]: a late-but-in-watermark dim
    * version re-decides every pending event it beats.
    *
    * State is bounded per key: pending events drain as the watermark
    * advances, and dim versions prune to the (ts, dim_id)-DOMINANT
    * one at or below the watermark (every future event matches the
    * dominant version or a newer one; versions above the watermark
    * are kept until they dominate in turn). The steady-state cost is
    * ONE dim row per key — the same O(keys) a CDC mirror table costs,
    * which is what this replaces. At 100 TB the key space shards
    * across executors by the groupByKey hash, state lives in the
    * store (RocksDB on a real cluster), and nothing driver-side ever
    * sees a row.
    *
    * The timeout clock is the WATERMARK, not an idle gap: pending
    * events must drain even if their key never speaks again, so each
    * invocation with pending events re-arms at watermark+1 (fires on
    * the next watermark advance). Keys with only dim state sit
    * passively without a timeout — a dim version is valid forever.
    * Spec pins equality with the batch native AsOfJoin over the real
    * events×orders tables across checkpoint restarts, including the
    * (ts, id) tiebreak and null-extension classes. */
  def asOfEnrich(events: Dataset[Event], dims: Dataset[DimUpdate],
      watermarkDelay: String = "1 day")
      (implicit spark: SparkSession): Dataset[AsOfOut] = {
    import spark.implicits._

    def us(ts: Timestamp): Long =
      math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

    // the watermark rides the UNION's own ts column — it must reach
    // the stateful operator, and a per-side watermark before the map
    // to AsOfIn would be lost with the mapped-away column
    val evIn = events
      .map(e => AsOfIn(e.user_id, e.ts, us(e.ts), isDim = false,
        e.event_id, e.value, 0L, 0.0))
    val dimIn = dims
      .map(d => AsOfIn(d.key, d.ts, us(d.ts), isDim = true,
        0L, 0.0, d.dim_id, d.dim_value))

    // the backward as-of match: latest (us, dimId) at or below the
    // event — the exact batch-AsOfJoin ordering, so ties at the same
    // instant resolve identically
    def matchOf(dims: List[AsOfDim], evUs: Long): Option[AsOfDim] =
      dims.filter(_.us <= evUs) match {
        case Nil => None
        case ds => Some(ds.maxBy(d => (d.us, d.dimId)))
      }

    // emit every event the watermark finalized; prune dims to the
    // dominant version at-or-below the watermark plus all newer ones
    def settle(key: Long, buf: AsOfBuf, wmUs: Long)
        : (AsOfBuf, List[AsOfOut]) = {
      val (ripe, pending) = buf.events.partition(_.us < wmUs)
      val outs = ripe.sortBy(e => (e.us, e.eventId)).map { e =>
        val m = matchOf(buf.dims, e.us)
        AsOfOut(key, e.eventId, e.us, e.value,
          m.map(_.us), m.map(_.dimId), m.map(_.value))
      }
      val (old, fresh) = buf.dims.partition(_.us <= wmUs)
      val kept = (if (old.isEmpty) fresh
        else old.maxBy(d => (d.us, d.dimId)) :: fresh)
      (AsOfBuf(pending, kept), outs)
    }

    evIn.union(dimIn)
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsOfBuf, AsOfOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, batch: Iterator[AsOfIn], state: GroupState[AsOfBuf]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val buf0 = state.getOption.getOrElse(AsOfBuf(Nil, Nil))
          val buf1 =
            if (state.hasTimedOut) buf0
            else {
              val rows = batch.toList
              AsOfBuf(
                buf0.events ++ rows.filterNot(_.isDim)
                  .map(r => AsOfEv(r.us, r.eventId, r.evValue)),
                buf0.dims ++ rows.filter(_.isDim)
                  .map(r => AsOfDim(r.us, r.dimId, r.dimValue)))
            }
          val (buf2, outs) = settle(key, buf1, wmUs)
          if (buf2.events.isEmpty && buf2.dims.isEmpty) state.remove()
          else {
            state.update(buf2)
            // pending events drain on watermark advances; dim-only
            // state sits passively (valid forever, no timeout)
            if (buf2.events.nonEmpty)
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
          }
          outs.iterator
      }
  }
}
