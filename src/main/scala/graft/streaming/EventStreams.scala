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
}
