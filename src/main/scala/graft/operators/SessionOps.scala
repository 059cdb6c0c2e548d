package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Exact._

/** Event-stream analytics in batch form. The Structured-Streaming
  * twins (watermarked windows, stateful sessionization) live in
  * `graft.streaming.EventStreams`; these batch versions define the
  * semantics and are oracle-checkable.
  */
object SessionOps {

  type QFn = (SparkSession, String) => DataFrame

  private val GapUs = 1800L * 1000000L // 30-minute session gap

  /** Gap-based sessionization: a session breaks when the user is idle
    * > 30 min. Classic two-window formulation — lag to flag session
    * starts, running sum to number them. One shuffle on user_id; both
    * windows share the same partitioning so Spark plans a single
    * exchange. Gap arithmetic in integer microseconds (exact). */
  private val q50: QFn = (s, d) => {
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val ev = Tables.events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wOrd))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > GapUs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("is_new")).over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ev.groupBy("user_id", "session_id")
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"))
  }
  private val q50Sql =
    s"""SELECT user_id, session_id,
       |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       |  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       |  COUNT(*) AS n_events,
       |  ${sqlSum("value")} AS total_value
       |FROM (
       |  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM (
       |    SELECT *, CASE WHEN prev_us IS NULL
       |        OR epoch_us(ts) - prev_us > ${GapUs} THEN 1 ELSE 0 END AS is_new
       |    FROM (SELECT *, LAG(epoch_us(ts)) OVER (PARTITION BY user_id
       |            ORDER BY ts, event_id) AS prev_us
       |          FROM events) a) b) c
       |GROUP BY user_id, session_id""".stripMargin

  /** Tumbling 1-hour windows per event type — the batch shape of the
    * watermarked streaming aggregate. Spark's `window()` on an
    * epoch-aligned hour equals date_trunc('hour'). */
  private val q51: QFn = (s, d) => {
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("hour"),
        col("event_type"), col("n"), col("total_value"))
  }
  private val q51Sql =
    s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
       |  event_type, COUNT(*) AS n, ${sqlSum("value")} AS total_value
       |FROM events GROUP BY 1, 2""".stripMargin

  /** Semi-structured extraction: pull a typed field out of the JSON
    * `props` column and aggregate on it (codegen'd path, no UDF). */
  private val q52: QFn = (s, d) => {
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
  }
  private val q52Sql =
    s"""SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k,
       |  COUNT(*) AS n, ${sqlSum("value")} AS total_value
       |FROM events GROUP BY 1""".stripMargin

  /** Hopping (sliding) windows — the overlapping twin of q51: 1-hour
    * windows advancing every 15 minutes, so each event lands in
    * window/slide = 4 windows. Spark's `window(ts, len, slide)`
    * expands each row to its covering windows BEFORE the shuffle
    * (a 4× map-side explode, never a self-join), then aggregates like
    * any tumbling window — the same plan shape the watermarked
    * streaming version uses. Windows align to the epoch 15-minute
    * grid, which DuckDB's `time_bucket` shares (its 2000-01-01 origin
    * is a whole multiple of 15 min from the epoch). */
  private val q78: QFn = (s, d) => {
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("window_start"),
        col("event_type"), col("n"), col("total_value"))
  }
  private val q78Sql =
    s"""SELECT strftime(ws, '%Y-%m-%d %H:%M') AS window_start,
       |  event_type, COUNT(*) AS n, ${sqlSum("value")} AS total_value
       |FROM (
       |  SELECT event_type, value,
       |    unnest(generate_series(
       |      time_bucket(INTERVAL '15 minutes', ts) - INTERVAL '45 minutes',
       |      time_bucket(INTERVAL '15 minutes', ts),
       |      INTERVAL '15 minutes')) AS ws
       |  FROM events) t
       |GROUP BY 1, 2""".stripMargin

  /** Attribution funnel through the banded range join: every purchase
    * within the hour AFTER any click (no user constraint — a pure
    * range join, the shape Spark would otherwise nested-loop), daily
    * totals. [[JoinOps.bandedRangeJoin]] turns it into an equi join
    * on hour-wide time buckets: ≤2× clicks + 1× purchases shuffle
    * instead of |clicks|·|purchases| comparisons. */
  private val q72: QFn = (s, d) => {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), unix_micros(col("ts")).as("c_us"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), unix_micros(col("ts")).as("b_us"),
        col("value"))
    JoinOps.bandedRangeJoin(clicks, buys, "c_us", "b_us",
        lower = 0L, upper = 3600L * 1000000L)
      .groupBy(floor(col("c_us") / (86400L * 1000000L)).cast("long")
        .as("click_day"))
      .agg(count(lit(1)).as("n_pairs"), dsum(col("value")).as("total_value"))
  }
  private val q72Sql =
    s"""SELECT CAST(FLOOR(epoch_us(c.ts) / 86400000000) AS BIGINT) AS click_day,
       |  COUNT(*) AS n_pairs, ${sqlSum("p.value")} AS total_value
       |FROM events c JOIN events p
       |  ON c.event_type = 'click' AND p.event_type = 'purchase'
       |  AND epoch_us(p.ts) >= epoch_us(c.ts)
       |  AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000
       |GROUP BY 1""".stripMargin

  private val FunnelWindowUs = 3L * 86400L * 1000000L // 3-day stage window

  /** Sequential conversion funnel: first view → first click within 3
    * days of that view → first purchase within 3 days of that click,
    * per user; output = users surviving each stage. Stage-wise
    * conditional MIN aggregates: every aggregate and join keys on
    * user_id, so after the first exchange the whole chain is
    * co-partitioned — three same-key shuffles, no windows, no sort of
    * the raw event stream (the window formulation would sort every
    * user's full history; this only aggregates). The stage tables
    * shrink monotonically, so each successive join is cheaper than
    * the last. */
  private val q88: QFn = (s, d) => {
    val ev = Tables.events(s, d)
    def stageMin(tpe: String) = ev.filter(col("event_type") === tpe)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val v = stageMin("view")
      .groupBy("user_id").agg(min(col("us")).as("v_us"))
    val c = stageMin("click").join(v, Seq("user_id"))
      .filter(col("us") >= col("v_us") &&
        col("us") <= col("v_us") + FunnelWindowUs)
      .groupBy("user_id").agg(min(col("us")).as("c_us"))
    val p = stageMin("purchase").join(c, Seq("user_id"))
      .filter(col("us") >= col("c_us") &&
        col("us") <= col("c_us") + FunnelWindowUs)
      .groupBy("user_id").agg(min(col("us")).as("p_us"))
    // ONE aggregate over the left-join chain + stack, instead of a
    // union of three aggregates: the union re-embedded the whole
    // v→c→p chain as duplicate subtrees (v planned 3×, c 2×), and the
    // resulting plan paid a ~2.7 s one-time planning/codegen bill —
    // 5× its event-query siblings' — that read as an unexplained
    // bench regression whenever the JIT was cold (r9 verdict item 4,
    // root-caused via QuietAB). Same rows, same oracle.
    val flags = v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
    flags.agg(count(lit(1)).as("n_view"),
        count(col("c_us")).as("n_click"),
        count(col("p_us")).as("n_purchase"))
      .select(expr("stack(3, 'view', n_view, 'click', n_click, " +
        "'purchase', n_purchase) as (stage, users)"))
  }
  private val q88Sql =
    s"""WITH v AS (
      |  SELECT user_id, MIN(epoch_us(ts)) AS v_us FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS c_us
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.v_us
      |    AND epoch_us(e.ts) <= v.v_us + $FunnelWindowUs
      |  GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.c_us
      |    AND epoch_us(e.ts) <= c.c_us + $FunnelWindowUs
      |  GROUP BY 1)
      |SELECT 'view' AS stage, CAST(COUNT(*) AS BIGINT) AS users FROM v
      |UNION ALL
      |SELECT 'click', CAST(COUNT(*) AS BIGINT) FROM c
      |UNION ALL
      |SELECT 'purchase', CAST(COUNT(*) AS BIGINT) FROM p""".stripMargin

  /** Cohort retention: users grouped by first-activity day; for each
    * (cohort_day, day_offset ≤ 14) the count of cohort members still
    * active that day. Three aggregates: per-user first day, distinct
    * (user, day) activity, then the (cohort, offset) rollup — the
    * first two key on user_id (co-partitioned chain, map-side
    * partials), and only the already-distinct activity pairs reach the
    * final count. Day arithmetic in integer microseconds (exact). */
  private val q89: QFn = (s, d) => {
    val DayUs = 86400L * 1000000L
    val ev = Tables.events(s, d)
      .select(col("user_id"),
        floor(unix_micros(col("ts")) / DayUs).cast("long").as("d"))
    val cohort = ev.groupBy("user_id").agg(min(col("d")).as("cohort_day"))
    ev.distinct()
      .join(cohort, Seq("user_id"))
      .withColumn("day_offset", col("d") - col("cohort_day"))
      .filter(col("day_offset") <= 14)
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
      .select("cohort_day", "day_offset", "n_users")
  }
  private val q89Sql =
    """WITH act AS (
      |  SELECT DISTINCT user_id,
      |    CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS d
      |  FROM events),
      |cohort AS (
      |  SELECT user_id, MIN(d) AS cohort_day FROM act GROUP BY 1)
      |SELECT c.cohort_day, a.d - c.cohort_day AS day_offset,
      |  CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM act a JOIN cohort c ON a.user_id = c.user_id
      |WHERE a.d - c.cohort_day <= 14
      |GROUP BY 1, 2""".stripMargin

  /** Gaps-and-islands: per-user CONSECUTIVE-DAY activity streaks via
    * the classic `day − row_number()` grouping (consecutive days share
    * the difference; any gap shifts it). Day arithmetic in integer
    * microseconds like q89 (exact, tz-free). Both the distinct and the
    * window key on user_id, and the whole chain is partition-parallel
    * — no global window, so the shape holds at any user count. */
  private val q95: QFn = (s, d) => {
    val DayUs = 86400L * 1000000L
    val days = Tables.events(s, d)
      .select(col("user_id"),
        floor(unix_micros(col("ts")) / DayUs).cast("long").as("d"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy(col("d"))
    days
      .withColumn("grp", col("d") - row_number().over(w))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(max(col("len")).as("best_streak"),
        count(lit(1)).as("n_streaks"),
        sum(col("len")).as("active_days"))
  }
  private val q95Sql =
    """WITH act AS (
      |  SELECT DISTINCT user_id,
      |    CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS d
      |  FROM events),
      |isl AS (
      |  SELECT user_id, d,
      |    d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
      |  FROM act),
      |streaks AS (
      |  SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
      |  FROM isl GROUP BY 1, 2)
      |SELECT user_id, MAX(len) AS best_streak,
      |  CAST(COUNT(*) AS BIGINT) AS n_streaks,
      |  CAST(SUM(len) AS BIGINT) AS active_days
      |FROM streaks GROUP BY 1""".stripMargin

  /** q103: event-path TRANSITION MATRIX — per-user event sequences
    * (ordered by time, event-id tiebreak) reduced to first-order
    * Markov transition counts and probabilities, the "what do users
    * do next" product-analytics primitive. One lead window keyed on
    * user_id (partition-parallel at any user count), one hash-agg
    * over (from, to) pairs, per-from totals joined back broadcast
    * (state-type cardinality is model-sized). Probability = long
    * division rounded 6 dp, identical in both engines. */
  private val q103: QFn = (s, d) => {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val steps = Tables.events(s, d)
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = steps.groupBy("from_type").agg(sum("n").as("total"))
    steps.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("total"), 6).as("p"))
  }
  private val q103Sql =
    """WITH steps AS (
      |  SELECT event_type AS from_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |pairs AS (
      |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM steps WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (
      |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS total
      |  FROM pairs GROUP BY 1)
      |SELECT from_type, to_type, n,
      |  ROUND(CAST(n AS DOUBLE) / total, 6) AS p
      |FROM pairs JOIN tot USING (from_type)""".stripMargin

  /** q109: truncated EWMA smoothing of the per-type daily value series
    * — the classic time-series denoiser (monitoring dashboards,
    * anomaly baselines; the EWMA control chart, Roberts 1959). The
    * exact recursive form s_t = α·v_t + (1−α)·s_{t−1} is a sequential
    * scan; the distributed (and oracle-checkable) form truncates the
    * exponential tail: s_t ≈ Σ_{j<14} w_j·v_{t−j} / Σ_{j<14} w_j with
    * w_j = α(1−α)^j, normalized over the weights actually present so
    * series heads are well-defined. Tail mass below the cut is
    * (1−α)^14 ≈ 0.7% at α = 0.3 — noise-floor relative error.
    *
    * Scale shape: the heavy half (daily aggregate) is ONE shuffle
    * with map-side partials; the 14 lag terms all ride ONE window
    * spec (one exchange + sort keyed on event_type — partition-
    * parallel at any type count, the q74 single-spec discipline).
    * Cross-engine exact: the weights are LITERAL doubles embedded in
    * both engines' plans (shortest-round-trip repr — no runtime pow
    * to drift), daily sums ride the decimal accumulator, and the
    * weighted chain is one fixed left-associated IEEE expression on
    * identical inputs — hash-exact at 6 dp. */
  private val alpha109 = 0.3
  private val weights109: Seq[Double] =
    (0 until 14).map(j => alpha109 * math.pow(1 - alpha109, j))
  private val q109: QFn = (s, d) => {
    val DayUs = 86400L * 1000000L
    val daily = Tables.events(s, d)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / DayUs).cast("long").as("d"),
        col("value"))
      .groupBy("event_type", "d")
      .agg(dsum(col("value")).as("v"))
    val w = Window.partitionBy("event_type").orderBy(col("d"))
    val lags = weights109.zipWithIndex.map { case (wt, j) =>
      (wt, lag(col("v"), j).over(w))
    }
    val num = lags.map { case (wt, l) =>
      coalesce(l, lit(0.0)) * lit(wt) }.reduce(_ + _)
    val den = lags.map { case (wt, l) =>
      when(l.isNull, lit(0.0)).otherwise(lit(wt)) }.reduce(_ + _)
    daily
      .withColumn("ewma", round(num / den, 6))
      .select(col("event_type"), col("d").as("day"),
        round(col("v"), 6).as("daily_value"), col("ewma"))
  }
  private val q109Sql = {
    val num = weights109.zipWithIndex.map { case (wt, j) =>
      s"COALESCE(LAG(v, $j) OVER w, 0.0) * $wt" }.mkString(" + ")
    val den = weights109.zipWithIndex.map { case (wt, j) =>
      s"CASE WHEN LAG(v, $j) OVER w IS NULL THEN 0.0 ELSE $wt END" }
      .mkString(" + ")
    s"""WITH daily AS (
       |  SELECT event_type,
       |    CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS d,
       |    CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS v
       |  FROM events GROUP BY 1, 2)
       |SELECT event_type, d AS day, ROUND(v, 6) AS daily_value,
       |  ROUND(($num) / ($den), 6) AS ewma
       |FROM daily
       |WINDOW w AS (PARTITION BY event_type ORDER BY d)""".stripMargin
  }

  /** q111: CONVERSION-LATENCY percentiles per signup-week cohort —
    * "how long from first click to first purchase", the funnel-depth
    * twin of q88's stage counts (that query counts WHO converts; this
    * one distributes WHEN). Per user: first click / first purchase
    * timestamps (one conditional-min aggregate — map-side partials,
    * user-keyed shuffle), converters = both present with purchase not
    * before click; cohort = the first click's calendar day (integer
    * micro-arithmetic like q89 — tz-free, engine-exact); per cohort
    * the exact interpolated p50/p90 of latency-in-seconds (the q16
    * small-group percentile form — days are bounded and each holds
    * ≤ users/day; q85's RankOps machinery is the declared path when
    * a group outgrows one task). Latency = integer-micros difference
    * over 1e6 — one IEEE division on identical longs. */
  private val q111: QFn = (s, d) => {
    val DayUs = 86400L * 1000000L
    val f = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "click", col("us"))).as("c"),
        min(when(col("event_type") === "purchase", col("us"))).as("p"))
      .filter(col("c").isNotNull && col("p").isNotNull && col("p") >= col("c"))
      .withColumn("cohort_day", floor(col("c") / DayUs).cast("long"))
      .withColumn("lag_s", (col("p") - col("c")) / 1000000.0)
    f.groupBy("cohort_day")
      .agg(count(lit(1)).as("n_converters"),
        round(percentile(col("lag_s"), lit(0.5)), 6).as("p50_s"),
        round(percentile(col("lag_s"), lit(0.9)), 6).as("p90_s"))
  }
  private val q111Sql =
    """WITH f AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS c,
      |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p
      |  FROM events GROUP BY 1)
      |SELECT CAST(FLOOR(c / 86400000000) AS BIGINT) AS cohort_day,
      |  CAST(COUNT(*) AS BIGINT) AS n_converters,
      |  ROUND(quantile_cont((p - c) / 1000000.0, 0.5), 6) AS p50_s,
      |  ROUND(quantile_cont((p - c) / 1000000.0, 0.9), 6) AS p90_s
      |FROM f
      |WHERE c IS NOT NULL AND p IS NOT NULL AND p >= c
      |GROUP BY 1""".stripMargin

  /** q113: per-ENTRY-TYPE session quality — the classic web-analytics
    * rollup (entries, bounce rate, depth, dwell) over q50's gap
    * sessions: a session's entry is its FIRST event's type, a bounce
    * is a single-event session. The break/id windows share the
    * user-keyed partitioning; the entry row_number keys on
    * (user, session) — both partition-parallel at any user count —
    * then two map-side-partial aggregates. Durations in integer
    * micros (exact); the three
    * ratios are single IEEE divisions on exact longs, 6 dp —
    * hash-exact. */
  private val q113: QFn = (s, d) => {
    val wOrd = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val ev = Tables.events(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(wOrd))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > GapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wSess = Window.partitionBy("user_id", "session_id")
      .orderBy(col("us").asc, col("event_id").asc)
    val sessions = ev
      .withColumn("rn", row_number().over(wSess))
      .groupBy("user_id", "session_id")
      .agg(min(when(col("rn") === 1, col("event_type"))).as("entry_type"),
        count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("dur_us"))
    sessions.groupBy("entry_type")
      .agg(count(lit(1)).as("n_sessions"),
        round(sum(when(col("n_events") === 1L, 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 6).as("bounce_rate"),
        round(sum(col("n_events")).cast("double") / count(lit(1)), 6)
          .as("avg_events"),
        round(sum(col("dur_us")).cast("double") / count(lit(1)) / 1000000.0,
          6).as("avg_duration_s"))
  }
  private val q113Sql =
    s"""WITH ev AS (
       |  SELECT *,
       |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS session_id
       |  FROM (
       |    SELECT *, CASE WHEN prev_us IS NULL
       |        OR us - prev_us > ${GapUs} THEN 1 ELSE 0 END AS is_new
       |    FROM (SELECT *, epoch_us(ts) AS us,
       |            LAG(epoch_us(ts)) OVER (PARTITION BY user_id
       |              ORDER BY ts, event_id) AS prev_us
       |          FROM events) a) b),
       |sessions AS (
       |  SELECT user_id, session_id,
       |    MIN(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
       |    COUNT(*) AS n_events,
       |    MAX(us) - MIN(us) AS dur_us
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_id
       |          ORDER BY us, event_id) AS rn FROM ev) e
       |  GROUP BY 1, 2)
       |SELECT entry_type, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       |  ROUND(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
       |    AS DOUBLE) / COUNT(*), 6) AS bounce_rate,
       |  ROUND(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6) AS avg_events,
       |  ROUND(CAST(SUM(dur_us) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
       |    AS avg_duration_s
       |FROM sessions GROUP BY 1""".stripMargin

  /** q115: WINSORIZATION — the numeric-cleaning standard for training
    * pipelines (clip a heavy-tailed feature at its [p05, p95] before
    * normalization, so one corrupt reading can't dominate a batch
    * statistic): per event type, exact interpolated p05/p95 (q16's
    * percentile form; q85's RankOps is the outgrown-group path),
    * values clipped in-row, and the before/after means reported so the
    * clipping's effect is visible. Two passes over the fact rows (the
    * bounds pass aggregates to K rows, BROADCAST back — nothing
    * data-sized moves twice through a shuffle); bounds round to 6 dp
    * BEFORE clipping so both engines clip on identical operands, means
    * through the exact decimal accumulator — hash-exact. */
  private val q115: QFn = (s, d) => {
    val base = Tables.events(s, d)
      .select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
    val bounds = base.groupBy("event_type")
      .agg(round(percentile(col("value"), lit(0.05)), 6).as("p05"),
        round(percentile(col("value"), lit(0.95)), 6).as("p95"))
    base.join(broadcast(bounds), Seq("event_type"))
      .withColumn("w", least(greatest(col("value"), col("p05")), col("p95")))
      .groupBy("event_type", "p05", "p95")
      .agg(count(lit(1)).as("n"),
        round(dsum(col("value")) / count(lit(1)), 6).as("mean_raw"),
        round(dsum(col("w")) / count(lit(1)), 6).as("mean_winsorized"))
      .select("event_type", "n", "p05", "p95", "mean_raw", "mean_winsorized")
  }
  private val q115Sql =
    s"""WITH base AS (
       |  SELECT event_type, value FROM events WHERE value IS NOT NULL),
       |bounds AS (
       |  SELECT event_type,
       |    ROUND(quantile_cont(value, 0.05), 6) AS p05,
       |    ROUND(quantile_cont(value, 0.95), 6) AS p95
       |  FROM base GROUP BY 1)
       |SELECT base.event_type, CAST(COUNT(*) AS BIGINT) AS n, p05, p95,
       |  ROUND(${graft.util.Exact.sqlSum("value")} / COUNT(*), 6)
       |    AS mean_raw,
       |  ROUND(${graft.util.Exact.sqlSum("LEAST(GREATEST(value, p05), p95)")}
       |    / COUNT(*), 6) AS mean_winsorized
       |FROM base JOIN bounds USING (event_type)
       |GROUP BY 1, 3, 4""".stripMargin

  /** q149: BURSTINESS (Fano factor / index of dispersion) of daily
    * event counts per type — the burst-detection screen: a Poisson
    * stream sits at 1, campaign spikes and bot floods push it up. The
    * fact reduces to day-grained integer counts (one map-side-partial
    * aggregate), the second pass folds exact integer/decimal moments
    * per type (counts², summed in decimal(38) — day counts reach 1e8
    * at sensor scale and their squares pass int64), and variance/mean
    * is one fixed IEEE expression at 6 dp. */
  private val q149: QFn = (s, d) => {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val DayUs = 86400L * 1000000L
    val daily = Tables.events(s, d)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / DayUs).cast("long").as("dy"))
      .groupBy("event_type", "dy")
      .agg(count(lit(1)).as("c"))
    daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(col("c")).as("sx"),
        sum((col("c").cast(dec38) * col("c").cast(dec38))).as("sxx"))
      .select(col("event_type"), col("n_days"),
        round(col("sx").cast("double") / col("n_days"), 6)
          .as("mean_daily"),
        round((col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double") /
            col("n_days")) / col("n_days") /
          (col("sx").cast("double") / col("n_days")), 6).as("fano"))
  }
  private val q149Sql =
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS dy,
      |    COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
      |    CAST(SUM(c) AS BIGINT) AS sx,
      |    SUM(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))) AS sxx
      |  FROM daily GROUP BY 1)
      |SELECT event_type, n_days,
      |  ROUND(CAST(sx AS DOUBLE) / n_days, 6) AS mean_daily,
      |  ROUND((CAST(sxx AS DOUBLE) -
      |    CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n_days) / n_days /
      |    (CAST(sx AS DOUBLE) / n_days), 6) AS fano
      |FROM m""".stripMargin

  /** q159: SHANNON ENTROPY of each event type's hour-of-day
    * distribution (+ perplexity) — the temporal-concentration
    * profile: a bot-like type hammering one hour scores near 0 bits,
    * uniform human traffic near log2(24). Timezone-free hour buckets
    * (epoch-microsecond arithmetic, no session-zone dependence); one
    * (type, hour) aggregate with map-side partials, a tiny per-type
    * total broadcast back, per-bucket −p·log2 p rounded to 6 dp and
    * folded through the exact decimal accumulator. */
  private val q159: QFn = (s, d) => {
    val HourUs = 3600L * 1000000L
    val hourly = Tables.events(s, d)
      .select(col("event_type"),
        pmod(floor(unix_micros(col("ts")) / HourUs), lit(24L)).as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("c"))
    val tot = hourly.groupBy("event_type").agg(sum(col("c")).as("n"))
    val p = col("c").cast("double") / col("n").cast("double")
    hourly.join(broadcast(tot), Seq("event_type"))
      .select(col("event_type"), col("n"),
        round(-p * log(2.0, p), 6).as("term"))
      .groupBy("event_type")
      .agg(first(col("n")).as("n_events"),
        round(sum(col("term").cast(Dec)).cast("double"), 6)
          .as("entropy_bits"))
      .select(col("event_type"), col("n_events"), col("entropy_bits"),
        round(pow(lit(2.0), col("entropy_bits")), 6).as("perplexity"))
  }
  private val q159Sql =
    """WITH hourly AS (
      |  SELECT event_type,
      |    ((CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) % 24) + 24) % 24 AS h,
      |    COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |tot AS (
      |  SELECT event_type, CAST(SUM(c) AS BIGINT) AS n
      |  FROM hourly GROUP BY 1),
      |terms AS (
      |  SELECT event_type, n,
      |    ROUND(-(CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / n), 6)
      |      AS term
      |  FROM hourly JOIN tot USING (event_type)),
      |e AS (
      |  SELECT event_type, MIN(n) AS n_events,
      |    ROUND(CAST(SUM(CAST(term AS DECIMAL(28,6))) AS DOUBLE), 6)
      |      AS entropy_bits
      |  FROM terms GROUP BY 1)
      |SELECT event_type, n_events, entropy_bits,
      |  ROUND(POW(2.0, entropy_bits), 6) AS perplexity
      |FROM e""".stripMargin

  /** q161: STATIONARY DISTRIBUTION of the user-behavior Markov chain
    * — 6 power-iteration steps over q103's transition matrix (where
    * does a long session end up spending its time). The COUNTING is
    * the distributed work (per-user ordered lead + one pair
    * aggregate, exactly q103); the matrix itself is model-sized by
    * contract (|event vocabulary|² cells), so the iteration runs
    * DRIVER-LOCAL in exact BigDecimal — the BpeTrainer discipline:
    * model-sized state never schedules per-round jobs. Each step
    * multiplies exact decimals (π at scale 12 × p at scale 6) and
    * re-rounds to 12 dp, mirrored digit-for-digit by the oracle's
    * unrolled decimal CTEs (the q98 fixed-round pattern), so the
    * result is hash-exact. */
  private val q161: QFn = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val steps = Tables.events(s, d)
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = steps.groupBy("from_type").agg(sum("n").as("total"))
    val mat = steps.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"),
        round(col("n").cast("double") / col("total"), 6).as("p"))
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        new java.math.BigDecimal(String.valueOf(r.getDouble(2)))))
    val states = (mat.map(_._1) ++ mat.map(_._2)).distinct.sorted.toSeq
    val init = java.math.BigDecimal.ONE.divide(
      new java.math.BigDecimal(states.size), 12,
      java.math.RoundingMode.HALF_UP)
    var pi: Map[String, java.math.BigDecimal] =
      states.map(_ -> init).toMap
    (1 to 6).foreach { _ =>
      val next = scala.collection.mutable.Map
        .empty[String, java.math.BigDecimal]
      mat.foreach { case (f, t, p) =>
        val add = pi(f).multiply(p) // exact: scale 12 × scale 6
        next.update(t, next.getOrElse(t, java.math.BigDecimal.ZERO).add(add))
      }
      pi = states.map(st => st -> next.getOrElse(st,
        java.math.BigDecimal.ZERO)
        .setScale(12, java.math.RoundingMode.HALF_UP)).toMap
    }
    states.map(st => (st, pi(st).doubleValue)).toDF("state", "p0")
      .select(col("state"), round(col("p0"), 6).as("stationary_p"))
  }
  private val q161Sql: String = {
    val iters = (1 to 6).map { i =>
      s"""i$i AS (
         |  SELECT t.to_type AS st,
         |    CAST(ROUND(SUM(CAST(i.pi AS DECIMAL(14,12)) * t.p), 12)
         |      AS DECIMAL(14,12)) AS pi
         |  FROM i${i - 1} i JOIN p t ON i.st = t.from_type
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH stepsrc AS (
       |  SELECT event_type AS from_type,
       |    LEAD(event_type) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS to_type
       |  FROM events),
       |pairs AS (
       |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM stepsrc WHERE to_type IS NOT NULL GROUP BY 1, 2),
       |tot AS (
       |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS total
       |  FROM pairs GROUP BY 1),
       |p AS (
       |  SELECT from_type, to_type,
       |    CAST(ROUND(CAST(n AS DOUBLE) / total, 6) AS DECIMAL(8,6)) AS p
       |  FROM pairs JOIN tot USING (from_type)),
       |states AS (
       |  SELECT DISTINCT from_type AS st FROM p
       |  UNION SELECT DISTINCT to_type FROM p),
       |i0 AS (
       |  SELECT st, CAST(ROUND(1.0 / (SELECT COUNT(*) FROM states), 12)
       |    AS DECIMAL(14,12)) AS pi FROM states),
       |$iters
       |SELECT s.st AS state,
       |  ROUND(CAST(COALESCE(i6.pi, 0) AS DOUBLE), 6) AS stationary_p
       |FROM states s LEFT JOIN i6 ON s.st = i6.st""".stripMargin
  }

  /** q162: MUTUAL INFORMATION between event type and (timezone-free)
    * day-of-week bucket — "does behavior depend on the day", in bits,
    * with the entropies and min-normalized MI alongside (the feature-
    * selection screen: NMI near 0 ⇒ the day column carries no signal
    * about the type). Same scale shape as q140/q160: one joint-cell
    * aggregate, two tiny marginals broadcast back, per-cell
    * p·log2(p·n²⁄(cx·cy)) — algebraically c·n⁄(cx·cy) in counts, one
    * division — rounded to 6 dp into the decimal fold; entropies from
    * the marginals the same way; NMI one fixed IEEE expression. */
  private val q162: QFn = (s, d) => {
    val DayUs = 86400L * 1000000L
    val base = Tables.events(s, d)
      .select(col("event_type").as("x"),
        pmod(floor(unix_micros(col("ts")) / DayUs), lit(7L)).as("y"))
    val joint = base.groupBy("x", "y").agg(count(lit(1)).as("c"))
    val mx = joint.groupBy("x").agg(sum(col("c")).as("cx"))
    val my = joint.groupBy("y").agg(sum(col("c")).as("cy"))
    val nRow = joint.agg(sum(col("c")).cast("double").as("n"))
    val cd = col("c").cast("double")
    val mi = joint.join(broadcast(mx), Seq("x"))
      .join(broadcast(my), Seq("y")).crossJoin(broadcast(nRow))
      .select(round((cd / col("n")) * log(2.0,
        cd * col("n") / (col("cx").cast("double") *
          col("cy").cast("double"))), 6).as("term"))
      .agg(round(sum(col("term").cast(Dec)).cast("double"), 6).as("mi"))
    def entropy(m: DataFrame, cnt: String) = m.crossJoin(broadcast(nRow))
      .select(round(-(col(cnt).cast("double") / col("n")) *
        log(2.0, col(cnt).cast("double") / col("n")), 6).as("term"))
      .agg(round(sum(col("term").cast(Dec)).cast("double"), 6).as("h"))
    val hx = entropy(mx, "cx").select(col("h").as("h_type"))
    val hy = entropy(my, "cy").select(col("h").as("h_day"))
    mi.crossJoin(hx).crossJoin(hy).crossJoin(nRow.select(col("n")))
      .select(col("n").cast("long").as("n_events"),
        col("h_type").as("h_type_bits"), col("h_day").as("h_day_bits"),
        col("mi").as("mi_bits"),
        round(col("mi") / least(col("h_type"), col("h_day")), 6)
          .as("nmi_min"))
  }
  private val q162Sql =
    """WITH base AS (
      |  SELECT event_type AS x,
      |    ((CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) % 7) + 7) % 7 AS y
      |  FROM events),
      |joint AS (SELECT x, y, COUNT(*) AS c FROM base GROUP BY 1, 2),
      |mx AS (SELECT x, CAST(SUM(c) AS BIGINT) AS cx FROM joint GROUP BY 1),
      |my AS (SELECT y, CAST(SUM(c) AS BIGINT) AS cy FROM joint GROUP BY 1),
      |nn AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM joint),
      |mi AS (
      |  SELECT ROUND(CAST(SUM(CAST(ROUND(
      |      (CAST(c AS DOUBLE) / (SELECT n FROM nn)) *
      |      log2(CAST(c AS DOUBLE) * (SELECT n FROM nn) /
      |        (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))), 6)
      |    AS DECIMAL(28,6))) AS DOUBLE), 6) AS mi
      |  FROM joint JOIN mx USING (x) JOIN my USING (y)),
      |hx AS (
      |  SELECT ROUND(CAST(SUM(CAST(ROUND(
      |      -(CAST(cx AS DOUBLE) / (SELECT n FROM nn)) *
      |      log2(CAST(cx AS DOUBLE) / (SELECT n FROM nn)), 6)
      |    AS DECIMAL(28,6))) AS DOUBLE), 6) AS h_type FROM mx),
      |hy AS (
      |  SELECT ROUND(CAST(SUM(CAST(ROUND(
      |      -(CAST(cy AS DOUBLE) / (SELECT n FROM nn)) *
      |      log2(CAST(cy AS DOUBLE) / (SELECT n FROM nn)), 6)
      |    AS DECIMAL(28,6))) AS DOUBLE), 6) AS h_day FROM my)
      |SELECT CAST((SELECT n FROM nn) AS BIGINT) AS n_events,
      |  h_type AS h_type_bits, h_day AS h_day_bits, mi AS mi_bits,
      |  ROUND(mi / LEAST(h_type, h_day), 6) AS nmi_min
      |FROM mi, hx, hy""".stripMargin

  /** q165: PARTICIPATION INEQUALITY — what share of all events the
    * top-10% and top-20% most active users produce (the 90-9-1 rule
    * as a measured number). Per-user counts (one map-side-partial
    * aggregate), then a GLOBAL rank over (count desc, user asc) via
    * the distributed two-pass `RankOps.withGlobalRank` — a 100-TB
    * event log's user table never serializes through one window
    * task — and integer-exact top-k cuts (⌈U/10⌉ via floor((u+9)/10),
    * identical IEEE in both engines on any realistic U). Shares are
    * exact-count ratios rounded at the end. */
  private val q165: QFn = (s, d) => {
    val perUser = Tables.events(s, d)
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
    val ranked = graft.operators.RankOps.withGlobalRank(perUser,
      Seq(col("cnt").desc, col("user_id").asc), "rnk")
    val tot = perUser.agg(count(lit(1)).as("u"),
      sum(col("cnt")).as("te"))
    ranked.crossJoin(broadcast(tot))
      .select(col("u"), col("te"), col("cnt"), col("rnk"),
        floor((col("u") + 9) / 10.0).cast("long").as("k10"),
        floor((col("u") + 4) / 5.0).cast("long").as("k20"))
      .agg(first(col("u")).as("n_users"),
        first(col("te")).as("total_events"),
        sum(when(col("rnk") <= col("k10"), col("cnt"))
          .otherwise(0L)).as("top10_events"),
        sum(when(col("rnk") <= col("k20"), col("cnt"))
          .otherwise(0L)).as("top20_events"))
      .select(col("n_users"), col("total_events"),
        round(col("top10_events").cast("double") /
          col("total_events"), 6).as("top10_share"),
        round(col("top20_events").cast("double") /
          col("total_events"), 6).as("top20_share"))
  }
  private val q165Sql =
    """WITH per_user AS (
      |  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1),
      |ranked AS (
      |  SELECT cnt,
      |    ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id ASC) AS rnk
      |  FROM per_user),
      |tot AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS u,
      |    CAST(SUM(cnt) AS BIGINT) AS te FROM per_user)
      |SELECT u AS n_users, te AS total_events,
      |  ROUND(CAST(SUM(CASE WHEN rnk <= CAST(FLOOR((u + 9) / 10.0) AS BIGINT)
      |    THEN cnt ELSE 0 END) AS DOUBLE) / te, 6) AS top10_share,
      |  ROUND(CAST(SUM(CASE WHEN rnk <= CAST(FLOOR((u + 4) / 5.0) AS BIGINT)
      |    THEN cnt ELSE 0 END) AS DOUBLE) / te, 6) AS top20_share
      |FROM ranked, tot
      |GROUP BY u, te""".stripMargin

  /** q179: DAU/WAU STICKINESS per 7-day window — the engagement
    * ratio product dashboards track (mean daily actives over weekly
    * actives; 1.0 = every weekly user shows up daily, 1/7 = each
    * appears once). Timezone-free integer day/week arithmetic
    * (epoch-microsecond floor division — the q159 discipline); two
    * distinct-count aggregates ((day, user) then (week, user) — both
    * map-side-partial distincts, never a window), a 7-row-bounded
    * per-week rollup, ratios ONE fixed IEEE expression over exact
    * counts. Exact, hash-checked. */
  private val q179: QFn = (s, d) => {
    val DayUs = 86400L * 1000000L
    val du = Tables.events(s, d)
      .select(floor(unix_micros(col("ts")) / DayUs).cast("long").as("day"),
        col("user_id"))
      .distinct()
    // floor division (`div` truncates toward zero; the oracle's `//`
    // floors — they diverge for pre-1970 days, so pin floor here)
    val daily = du.groupBy("day").agg(count(lit(1)).as("dau"))
      .withColumn("week", floor(col("day") / 7).cast("long"))
    val weekly = du.withColumn("week", floor(col("day") / 7).cast("long"))
      .groupBy("week")
      .agg(countDistinct(col("user_id")).as("wau"))
    daily.groupBy("week")
      .agg(count(lit(1)).as("active_days"), sum(col("dau")).as("sdau"))
      .join(weekly, Seq("week"))
      .select(col("week"), col("active_days"), col("wau"),
        round(col("sdau").cast("double") / col("active_days"), 6)
          .as("mean_dau"),
        round(col("sdau").cast("double") /
          (col("active_days") * col("wau")).cast("double"), 6)
          .as("stickiness"))
  }
  private val q179Sql =
    """WITH du AS (
      |  SELECT DISTINCT
      |    CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
      |    user_id
      |  FROM events),
      |daily AS (
      |  SELECT day, day // 7 AS week, CAST(COUNT(*) AS BIGINT) AS dau
      |  FROM du GROUP BY 1, 2),
      |weekly AS (
      |  SELECT day // 7 AS week,
      |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
      |  FROM du GROUP BY 1),
      |wk AS (
      |  SELECT week, CAST(COUNT(*) AS BIGINT) AS active_days,
      |    CAST(SUM(dau) AS BIGINT) AS sdau
      |  FROM daily GROUP BY 1)
      |SELECT wk.week, active_days, wau,
      |  ROUND(CAST(sdau AS DOUBLE) / active_days, 6) AS mean_dau,
      |  ROUND(CAST(sdau AS DOUBLE) / (active_days * wau), 6)
      |    AS stickiness
      |FROM wk JOIN weekly ON weekly.week = wk.week""".stripMargin

  /** q190: ENTROPY RATE of the user-behavior process — the
    * conditional entropy H(next | current) over q103's transition
    * counts, next to the joint bigram entropy H(pair) (their gap is
    * the marginal H: how much does knowing the current event compress
    * the next? ≈ log2|types| = memoryless, → 0 = scripted flows; the
    * sequence-predictability number session-model work starts from).
    * The COUNTING is the distributed work (per-user ordered lead +
    * one pair aggregate, the q103 shape); both entropies fold
    * 6-dp-rounded per-CELL terms through the exact decimal
    * accumulator over the |types|²-bounded cell table (the q159
    * discipline). Exact, hash-checked. */
  private val q190: QFn = (s, d) => {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val pairs = Tables.events(s, d)
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("a"), col("to_type").as("b"))
      .agg(count(lit(1)).as("c"))
    val rowTot = pairs.groupBy("a").agg(sum(col("c")).as("ra"))
    val tot = pairs.agg(sum(col("c")).as("n"))
    val cell = pairs.join(broadcast(rowTot), Seq("a"))
      .crossJoin(broadcast(tot))
    val pij = col("c").cast("double") / col("n").cast("double")
    val hc = round(-pij * log(2.0,
      col("c").cast("double") / col("ra").cast("double")), 6)
    val hj = round(-pij * log(2.0, pij), 6)
    cell.agg(max(col("n")).as("n_transitions"),
      round(sum(hc.cast(Dec)).cast("double"), 6).as("h_cond_bits"),
      round(sum(hj.cast(Dec)).cast("double"), 6).as("h_joint_bits"))
  }
  private val q190Sql =
    """WITH steps AS (
      |  SELECT event_type AS a,
      |    LEAD(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS b
      |  FROM events),
      |pairs AS (
      |  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM steps WHERE b IS NOT NULL GROUP BY 1, 2),
      |rt AS (SELECT a, CAST(SUM(c) AS BIGINT) AS ra
      |  FROM pairs GROUP BY 1),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM pairs),
      |cell AS (
      |  SELECT c, ra, n FROM pairs JOIN rt USING (a), tot)
      |SELECT MAX(n) AS n_transitions,
      |  ROUND(CAST(SUM(CAST(ROUND(-(CAST(c AS DOUBLE) / n)
      |    * log2(CAST(c AS DOUBLE) / ra), 6) AS DECIMAL(28,6)))
      |    AS DOUBLE), 6) AS h_cond_bits,
      |  ROUND(CAST(SUM(CAST(ROUND(-(CAST(c AS DOUBLE) / n)
      |    * log2(CAST(c AS DOUBLE) / n), 6) AS DECIMAL(28,6)))
      |    AS DOUBLE), 6) AS h_joint_bits
      |FROM cell""".stripMargin

  /** q203: BOUNCE RATE per user — sessionize exactly as q50 (30-min
    * inactivity gap), then the share of single-event sessions: the
    * engagement-quality number next to q113's session stats. Scale
    * shape: the per-user window is the q50 machinery (keyed, never
    * global), both rollups are map-side-partial counts, the rate is
    * one IEEE divide over exact longs at 6 dp; hash-exact. */
  private val q203: QFn = (s, d) => {
    val wOrd = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val ev = Tables.events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wOrd))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > GapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ev.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1L, 1L).otherwise(0L))
          .as("n_bounces"))
      .select(col("user_id"), col("n_sessions"), col("n_bounces"),
        round(col("n_bounces").cast("double") /
          col("n_sessions").cast("double"), 6).as("bounce_rate"))
  }
  private val q203Sql =
    s"""WITH sess AS (
       |  SELECT user_id, session_id, COUNT(*) AS n_events
       |  FROM (
       |    SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id
       |        ORDER BY ts, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS session_id
       |    FROM (
       |      SELECT *, CASE WHEN prev_us IS NULL
       |          OR epoch_us(ts) - prev_us > ${GapUs} THEN 1 ELSE 0 END
       |        AS is_new
       |      FROM (SELECT *, LAG(epoch_us(ts)) OVER (PARTITION BY user_id
       |              ORDER BY ts, event_id) AS prev_us
       |            FROM events) a) b) c
       |  GROUP BY 1, 2)
       |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_bounces,
       |  ROUND(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
       |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS bounce_rate
       |FROM sess GROUP BY 1""".stripMargin

  /** q225: PEAK HOUR per event type — the mode of the hour-of-day
    * distribution with its traffic share (q159's entropy says "how
    * spread"; this says "where the spike is" — the capacity-planning
    * pair). Epoch-microsecond floor + non-negative mod (the q159
    * discipline), one (type, hour) aggregate, keyed argmax row_number
    * with (count desc, hour asc) tiebreak. Hash-exact. */
  private val q225: QFn = (s, d) => {
    val HourUs = 3600L * 1000000L
    val hourly = Tables.events(s, d)
      .select(col("event_type"),
        pmod(floor(unix_micros(col("ts")) / HourUs), lit(24L)).as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("c"))
    val tot = hourly.groupBy("event_type").agg(sum(col("c")).as("n"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("c").desc, col("h").asc)
    hourly.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .join(broadcast(tot), Seq("event_type"))
      .select(col("event_type"), col("h").cast("long").as("peak_hour"),
        col("c").as("peak_count"), col("n").as("n_events"),
        round(col("c").cast("double") / col("n").cast("double"), 6)
          .as("peak_share"))
      .orderBy("event_type")
  }
  private val q225Sql =
    """WITH hourly AS (
      |  SELECT event_type,
      |    ((CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) % 24) + 24)
      |      % 24 AS h,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n
      |  FROM hourly GROUP BY 1),
      |rk AS (
      |  SELECT event_type, h, c,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY c DESC, h ASC) AS rk
      |  FROM hourly)
      |SELECT event_type, h AS peak_hour, c AS peak_count, n AS n_events,
      |  ROUND(CAST(c AS DOUBLE) / CAST(n AS DOUBLE), 6) AS peak_share
      |FROM rk JOIN tot USING (event_type)
      |WHERE rk = 1 ORDER BY event_type""".stripMargin

  /** q236: INTER-ARRIVAL TIME profile per event type — median and p90
    * of the gap (seconds) between a user's consecutive events of that
    * type, plus mean and event count: the event-granular cadence lens
    * next to q149's day-granular burstiness (a bot that fires every
    * 500 ms and a weekly digest both hide inside daily counts).
    * Scale shape: the lag runs keyed on (user, type) — partition-
    * parallel at any user count — and the grouped percentiles run
    * through `RankOps.groupedPercentiles` (prefix-sum ranks +
    * broadcast probes; no per-type value buffering). Gaps are exact
    * integer micros → seconds as one IEEE divide; the percentile
    * interpolation is the engine-identical q16 arithmetic; mean via
    * the exact integer-micro sum. Hash-exact. */
  private val q236: QFn = (s, d) => {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("us").asc, col("event_id").asc)
    val gaps = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .filter(col("prev_us").isNotNull)
      .select(col("event_id"), col("event_type"),
        ((col("us") - col("prev_us")).cast("double") / 1000000.0)
          .as("gap_s"))
    val pct = RankOps.groupedPercentiles(gaps, "event_type", "gap_s",
        Seq("event_id"), Seq(0.5, 0.9))
      .groupBy(col("g").as("event_type"))
      .agg(round(max(when(col("p") === 0.5, col("pv"))), 6).as("p50_s"),
        round(max(when(col("p") === 0.9, col("pv"))), 6).as("p90_s"))
    val mean = gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        round(davg(col("gap_s")), 6).as("mean_s"))
    pct.join(mean, Seq("event_type"))
      .select(col("event_type"), col("n_gaps"), col("mean_s"),
        col("p50_s"), col("p90_s"))
      .orderBy("event_type")
  }
  private val q236Sql =
    """WITH gaps AS (
      |  SELECT event_type,
      |    CAST(us - prev_us AS DOUBLE) / 1000000.0 AS gap_s
      |  FROM (
      |    SELECT event_type, epoch_us(ts) AS us,
      |      LAG(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
      |        ORDER BY ts, event_id) AS prev_us
      |    FROM events) t
      |  WHERE prev_us IS NOT NULL)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
      |  ROUND(CAST(SUM(CAST(gap_s AS DECIMAL(28,6))) AS DOUBLE)
      |    / COUNT(gap_s), 6) AS mean_s,
      |  ROUND(quantile_cont(gap_s, 0.5), 6) AS p50_s,
      |  ROUND(quantile_cont(gap_s, 0.9), 6) AS p90_s
      |FROM gaps GROUP BY 1 ORDER BY event_type""".stripMargin

  /** q242: AUDIENCE OVERLAP matrix — exact Jaccard between the user
    * sets of every event-type pair (do 'click' users and 'purchase'
    * users overlap, or are they disjoint populations? — the audience
    * lens next to q162's event-level mutual information). Scale
    * shape: ONE distinct (type, user) pass (map-side partial
    * distinct), per-type counts are a K-row aggregate, the
    * intersection self-join keys on user_id (co-partitioned, output
    * bounded by |types|² per user), and the pair matrix is
    * model-sized. Exact integer counts; one IEEE divide at 6 dp.
    * Hash-exact. */
  private val q242: QFn = (s, d) => {
    val tu = Tables.events(s, d)
      .select(col("event_type"), col("user_id")).distinct()
    val sizes = tu.groupBy(col("event_type").as("t"))
      .agg(count(lit(1)).as("n"))
    val inter = tu.select(col("event_type").as("type_a"), col("user_id"))
      .join(tu.select(col("event_type").as("type_b"), col("user_id")),
        Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_both"))
    inter
      .join(broadcast(sizes.select(col("t").as("type_a"),
        col("n").as("n_a"))), Seq("type_a"))
      .join(broadcast(sizes.select(col("t").as("type_b"),
        col("n").as("n_b"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_both"),
        round(col("n_both").cast("double") /
          (col("n_a") + col("n_b") - col("n_both")).cast("double"), 6)
          .as("jaccard"))
      .orderBy("type_a", "type_b")
  }
  private val q242Sql =
    """WITH tu AS (
      |  SELECT DISTINCT event_type, user_id FROM events),
      |sizes AS (
      |  SELECT event_type AS t, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM tu GROUP BY 1),
      |inter AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    CAST(COUNT(*) AS BIGINT) AS n_both
      |  FROM tu a JOIN tu b ON a.user_id = b.user_id
      |    AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_both,
      |  ROUND(CAST(n_both AS DOUBLE)
      |    / CAST(sa.n + sb.n - n_both AS DOUBLE), 6) AS jaccard
      |FROM inter
      |JOIN sizes sa ON sa.t = type_a
      |JOIN sizes sb ON sb.t = type_b
      |ORDER BY type_a, type_b""".stripMargin

  /** q246: FIRST-TOUCH CONVERSION — users grouped by the event type
    * of their FIRST EVER event, with the share that went on to place
    * an order at-or-after that moment (the acquisition-channel
    * attribution next to q72's click-level window attribution and
    * q111's lag). Scale shape: the first touch is one user-keyed
    * struct-min aggregate (never a window over raw events), orders
    * reduce to a customer-keyed max, the two key-sized tables join on
    * the user key, and the rollup is event-type-sized. Deterministic
    * first touch via the (ts, event_id) total order; exact integers;
    * one IEEE rate. Hash-exact. */
  private val q246: QFn = (s, d) => {
    val ft = Tables.events(s, d)
      .select(col("user_id"), struct(unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type")).as("st"))
      .groupBy("user_id")
      .agg(min(col("st")).as("st"))
      .select(col("user_id"), col("st.event_type").as("first_touch"),
        col("st.us").as("us"))
    val ou = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(max(unix_micros(col("o_orderdate").cast("timestamp")))
        .as("last_od"))
    ft.join(ou, col("user_id") === col("o_custkey"), "left")
      .groupBy(col("first_touch"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("last_od") >= col("us"), 1L).otherwise(0L))
          .as("n_converted"))
      .select(col("first_touch"), col("n_users"), col("n_converted"),
        round(col("n_converted").cast("double") /
          col("n_users").cast("double"), 6).as("conversion"))
      .orderBy("first_touch")
  }
  private val q246Sql =
    """WITH ft AS (
      |  SELECT user_id, event_type AS first_touch, epoch_us(ts) AS us
      |  FROM (
      |    SELECT user_id, event_type, ts, event_id,
      |      ROW_NUMBER() OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id) AS rn
      |    FROM events) t WHERE rn = 1),
      |ou AS (
      |  SELECT o_custkey,
      |    MAX(epoch_us(CAST(o_orderdate AS TIMESTAMP))) AS last_od
      |  FROM orders GROUP BY 1)
      |SELECT first_touch, CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(CASE WHEN last_od >= us THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_converted,
      |  ROUND(CAST(SUM(CASE WHEN last_od >= us THEN 1 ELSE 0 END)
      |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS conversion
      |FROM ft LEFT JOIN ou ON o_custkey = user_id
      |GROUP BY 1 ORDER BY first_touch""".stripMargin

  /** q253: CART ABANDONMENT per day — clicks with NO purchase by the
    * same user within the next 24 h (the e-commerce loss metric, the
    * complement of q72's attribution join and q88's conversion
    * funnel). Scale shape: the time-windowed NOT EXISTS runs as a
    * LEFT ANTI join with a user_id EQUI conjunct + the range filter
    * inside the join stage — co-partitioned on user after one
    * exchange each side, never a nested loop; both day rollups are
    * calendar-sized. Exact integer microsecond arithmetic;
    * zero-purchase days keep their click denominator via the left
    * join. Hash-exact. */
  private val q253: QFn = (s, d) => {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("c_us"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), unix_micros(col("ts")).as("p_us"))
    val abandoned = clicks.join(buys,
        col("user_id") === col("p_user") &&
          col("p_us") >= col("c_us") &&
          col("p_us") <= col("c_us") + 86400L * 1000000L,
        "left_anti")
    val day = floor(col("c_us") / (86400L * 1000000L)).cast("long")
    val tot = clicks.groupBy(day.as("click_day"))
      .agg(count(lit(1)).as("n_clicks"))
    val ab = abandoned.groupBy(day.as("click_day"))
      .agg(count(lit(1)).as("n_abandoned"))
    tot.join(ab, Seq("click_day"), "left")
      .select(col("click_day"), col("n_clicks"),
        coalesce(col("n_abandoned"), lit(0L)).as("n_abandoned"),
        round(coalesce(col("n_abandoned"), lit(0L)).cast("double") /
          col("n_clicks").cast("double"), 6).as("abandon_rate"))
  }
  private val q253Sql =
    """WITH c AS (
      |  SELECT user_id, epoch_us(ts) AS c_us FROM events
      |  WHERE event_type = 'click'),
      |p AS (
      |  SELECT user_id, epoch_us(ts) AS p_us FROM events
      |  WHERE event_type = 'purchase'),
      |ab AS (
      |  SELECT c.* FROM c WHERE NOT EXISTS (
      |    SELECT 1 FROM p WHERE p.user_id = c.user_id
      |      AND p.p_us >= c.c_us AND p.p_us <= c.c_us + 86400000000)),
      |tot AS (
      |  SELECT CAST(FLOOR(c_us / 86400000000) AS BIGINT) AS click_day,
      |    COUNT(*) AS n_clicks
      |  FROM c GROUP BY 1),
      |abd AS (
      |  SELECT CAST(FLOOR(c_us / 86400000000) AS BIGINT) AS click_day,
      |    COUNT(*) AS n_abandoned
      |  FROM ab GROUP BY 1)
      |SELECT tot.click_day, n_clicks,
      |  COALESCE(n_abandoned, 0) AS n_abandoned,
      |  ROUND(CAST(COALESCE(n_abandoned, 0) AS DOUBLE)
      |    / CAST(n_clicks AS DOUBLE), 6) AS abandon_rate
      |FROM tot LEFT JOIN abd ON tot.click_day = abd.click_day""".stripMargin

  /** q259: ROLLING 7-DAY ACTIVE USERS (WAU) per day — the
    * rolling-distinct metric every activity dashboard carries, which
    * plain windows can't express (no COUNT(DISTINCT) over a frame).
    * Scale shape: dedup to (day, user) pairs first (one fact-sized
    * exchange, the row count collapses to active-pairs), then emit
    * each pair's exactly-7 contributing windows MAP-SIDE via
    * `explode(sequence(day, day+6))` and broadcast-semi-join the
    * observed-day spine (drops windows anchored on days with no
    * events, matching the oracle's observed-days-only output), then
    * one distinct count per day. Replaces the round-10 BNLJ band
    * join, whose comparison cost scaled with the spine length
    * (|pairs|×|days| predicate evaluations at years of history); the
    * explode is |pairs|×7 at ANY spine length. Hash-exact. */
  private val q259: QFn = (s, d) => {
    val du = Tables.events(s, d)
      .select(floor(unix_micros(col("ts")) / (86400L * 1000000L))
        .cast("long").as("day"), col("user_id"))
      .distinct()
    val spine = du.select(col("day").as("asof_day")).distinct()
    du.select(explode(sequence(col("day"), col("day") + 6))
        .as("asof_day"), col("user_id"))
      .join(broadcast(spine), Seq("asof_day"), "left_semi")
      .groupBy("asof_day")
      .agg(countDistinct(col("user_id")).as("wau7"))
  }
  private val q259Sql =
    """WITH du AS (
      |  SELECT DISTINCT CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT)
      |    AS day, user_id
      |  FROM events),
      |spine AS (SELECT DISTINCT day AS asof_day FROM du)
      |SELECT asof_day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau7
      |FROM du JOIN spine
      |  ON day >= asof_day - 6 AND day <= asof_day
      |GROUP BY 1""".stripMargin

  /** q260: TOP EVENT-TYPE TRIGRAMS — the 10 most common consecutive
    * 3-step journeys across all users (journey mining one level above
    * q103's pair transition matrix: the paths a UX review reads).
    * Scale shape: two leads over the per-user window (bounded by
    * events-per-user), one path-sized aggregate, top-10 via
    * TakeOrderedAndProject with a deterministic (count desc, path
    * asc) tiebreak. Hash-exact. */
  private val q260: QFn = (s, d) => {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .groupBy(concat_ws(">", col("event_type"), col("t2"), col("t3"))
        .as("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(10)
  }
  private val q260Sql =
    """WITH steps AS (
      |  SELECT event_type AS t1,
      |    LEAD(event_type, 1) OVER w AS t2,
      |    LEAD(event_type, 2) OVER w AS t3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT t1 || '>' || t2 || '>' || t3 AS path,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM steps WHERE t2 IS NOT NULL AND t3 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path ASC LIMIT 10""".stripMargin

  /** q265: SESSION CONVERSION by session size — do longer sessions
    * convert? q50's gap sessionization rolled up one level: each
    * session's event count and whether it contains a purchase, then
    * conversion rate per size bucket (the engagement-depth curve next
    * to q88's user-level funnel). Scale shape: the same user-
    * partitioned session windows, one (user, session) aggregate, a
    * 4-row bucket rollup. Hash-exact via the q50 CTE extended with
    * the outcome rollup. */
  private val q265: QFn = (s, d) => {
    val wOrd = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val sess = Tables.events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wOrd))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > GapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
    sess
      .withColumn("bucket",
        when(col("n_events") === 1, "1")
          .when(col("n_events") <= 4, "2_4")
          .when(col("n_events") <= 9, "5_9")
          .otherwise("10_plus"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("converted")).as("n_converting"),
        round(sum(col("converted")).cast("double") /
          count(lit(1)).cast("double"), 6).as("conversion_rate"))
      .orderBy("bucket")
  }
  private val q265Sql =
    s"""WITH sess AS (
       |  SELECT user_id, session_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_events,
       |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS converted
       |  FROM (
       |    SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id
       |        ORDER BY ts, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |        AS BIGINT) AS session_id
       |    FROM (
       |      SELECT *, CASE WHEN prev_us IS NULL
       |          OR epoch_us(ts) - prev_us > ${GapUs} THEN 1 ELSE 0 END
       |          AS is_new
       |      FROM (SELECT *, LAG(epoch_us(ts)) OVER (PARTITION BY user_id
       |              ORDER BY ts, event_id) AS prev_us
       |            FROM events) a) b) c
       |  GROUP BY user_id, session_id),
       |bk AS (
       |  SELECT CASE WHEN n_events = 1 THEN '1'
       |       WHEN n_events <= 4 THEN '2_4'
       |       WHEN n_events <= 9 THEN '5_9'
       |       ELSE '10_plus' END AS bucket, converted
       |  FROM sess)
       |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       |  CAST(SUM(converted) AS BIGINT) AS n_converting,
       |  ROUND(CAST(SUM(converted) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE), 6) AS conversion_rate
       |FROM bk GROUP BY 1 ORDER BY bucket""".stripMargin

  val queries: Map[String, QFn] = Map(
    "q265_session_conversion" -> q265,
    "q260_journey_trigrams" -> q260,
    "q253_cart_abandonment" -> q253,
    "q259_rolling_wau" -> q259,
    "q246_first_touch" -> q246,
    "q242_audience_overlap" -> q242,
    "q236_interarrival" -> q236,
    "q225_peak_hour" -> q225,
    "q203_bounce_rate" -> q203,
    "q190_entropy_rate" -> q190,
    "q179_stickiness" -> q179,
    "q159_hour_entropy" -> q159,
    "q161_markov_stationary" -> q161,
    "q162_mutual_information" -> q162,
    "q165_pareto_share" -> q165,
    "q149_burstiness" -> q149,
    "q109_ewma" -> q109,
    "q111_conversion_lag" -> q111,
    "q113_session_stats" -> q113,
    "q115_winsorize" -> q115,
    "q103_transition_matrix" -> q103,
    "q50_sessionize" -> q50,
    "q51_tumbling_counts" -> q51,
    "q52_json_extract" -> q52,
    "q72_click_attribution" -> q72,
    "q88_funnel" -> q88,
    "q89_cohort_retention" -> q89,
    "q95_gaps_islands" -> q95,
    "q78_hopping_counts" -> q78)

  val oracleSql: Map[String, String] = Map(
    "q265_session_conversion" -> q265Sql,
    "q260_journey_trigrams" -> q260Sql,
    "q253_cart_abandonment" -> q253Sql,
    "q259_rolling_wau" -> q259Sql,
    "q203_bounce_rate" -> q203Sql,
    "q225_peak_hour" -> q225Sql,
    "q190_entropy_rate" -> q190Sql,
    "q179_stickiness" -> q179Sql,
    "q159_hour_entropy" -> q159Sql,
    "q161_markov_stationary" -> q161Sql,
    "q162_mutual_information" -> q162Sql,
    "q165_pareto_share" -> q165Sql,
    "q149_burstiness" -> q149Sql,
    "q109_ewma" -> q109Sql,
    "q111_conversion_lag" -> q111Sql,
    "q113_session_stats" -> q113Sql,
    "q115_winsorize" -> q115Sql,
    "q103_transition_matrix" -> q103Sql,
    "q50_sessionize" -> q50Sql,
    "q51_tumbling_counts" -> q51Sql,
    "q52_json_extract" -> q52Sql,
    "q72_click_attribution" -> q72Sql,
    "q78_hopping_counts" -> q78Sql,
    "q88_funnel" -> q88Sql,
    "q89_cohort_retention" -> q89Sql,
    "q95_gaps_islands" -> q95Sql,
    "q236_interarrival" -> q236Sql,
    "q242_audience_overlap" -> q242Sql,
    "q246_first_touch" -> q246Sql)
}
