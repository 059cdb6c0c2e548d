package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, SessionOut}

/** Structured-Streaming specs via MemoryStream (no filesystem source
  * needed; exercises watermarks and flatMapGroupsWithState state). */
class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stateful sessionization closes a session on gap") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Event]
    val query = EventStreams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()

    // batch 1: two events 5 min apart (one session so far — no output)
    input.addData(
      Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
      Event(2, ts("2024-01-01 10:05:00"), 7, "view", 2.0))
    query.processAllAvailable()
    // batch 2: event 2h later → previous session closes and emits
    input.addData(Event(3, ts("2024-01-01 12:30:00"), 7, "click", 4.0))
    query.processAllAvailable()

    val out = spark.table("sessions").as[SessionOut].collect()
    query.stop()
    assert(out.length == 1)
    val sess = out.head
    assert(sess.user_id == 7 && sess.n_events == 2 && sess.total_value == 3.0)
    assert(sess.session_start == ts("2024-01-01 10:00:00"))
    assert(sess.session_end == ts("2024-01-01 10:05:00"))
  }

  test("sliding active users: finalized windows equal the batch plan " +
      "bit-for-bit and the exact rolling distinct at small cardinality") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._

    // 10 days, overlapping user sets per day (users d..d+14)
    val evs = for {
      d <- 1 to 10; u <- d to (d + 14)
    } yield Event(d * 100L + u, ts(f"2024-01-$d%02d 12:00:00"),
      u.toLong, "view", 1.0)
    val input = MemoryStream[Event]
    val query = EventStreams.slidingActiveUsers(input.toDF(),
        windowLen = "3 days", slide = "1 day", horizon = "1 day")
      .writeStream.format("memory").queryName("sau")
      .outputMode(OutputMode.Append()).start()
    input.addData(evs: _*)
    query.processAllAvailable()
    // sentinel far ahead advances the watermark → all real windows close
    input.addData(Event(-1L, ts("2024-02-01 00:00:00"), -1L, "noop", 0.0))
    query.processAllAvailable()
    val got = spark.table("sau")
      .collect().map(r => r.getTimestamp(0) -> r.getLong(2)).toMap
    query.stop()

    // batch twin over the same rows: identical HLL ⇒ identical counts
    val batch = evs.toDF()
      .groupBy(window(col("ts"), "3 days", "1 day"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("n"))
      .collect().map(r => (r.getStruct(0).getTimestamp(0), r.getLong(1)))
      .toMap
    assert(got.nonEmpty && got.size >= 10)
    got.foreach { case (w, n) =>
      assert(batch(w) == n, s"window $w: stream $n vs batch ${batch(w)}")
    }
    // and at these cardinalities (≤ 45 per window) the sparse HLL is
    // exact vs the true rolling distinct
    val exact = evs.groupBy(e => e.ts).map { case (t, es) =>
      t -> es.map(_.user_id).toSet
    }
    got.foreach { case (wStart, n) =>
      val trueSet = exact.collect {
        case (t, us) if !t.before(wStart) &&
          t.before(new Timestamp(wStart.getTime + 3L * 86400000L)) => us
      }.flatten.toSet
      if (trueSet.nonEmpty)
        assert(n == trueSet.size, s"window $wStart: $n vs ${trueSet.size}")
    }
  }

  test("streaming funnel equals batch q88 stage counts across restarts") {
    implicit val s = spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val batch = graft.operators.SessionOps.queries("q88_funnel")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val src = tmpDir("funnel-src"); val chk = tmpDir("funnel-chk")
    val outDir = tmpDir("funnel-out")
    // rewrite the events through Spark (micros ts) and split by TIME:
    // a restart-boundary mid-stream, with each drop ahead of the
    // watermark the previous run checkpointed
    val evN = graft.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val bounds = evN.agg(min(col("ts")), max(col("ts"))).head
    val (lo, hi) = (bounds.getTimestamp(0), bounds.getTimestamp(1))
    val mid = new Timestamp((lo.getTime + hi.getTime) / 2)
    def sentinel(daysAfter: Long) = Seq((
      -1L, new Timestamp(hi.getTime + daysAfter * 86400000L),
      -1L, "noop", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")

    // each run is a fresh query resuming the same checkpoint
    def run(): Unit = {
      val q = EventStreams.funnel(
        EventStreams.readEventStream(spark, src).as[Event],
        idleGapMs = 365L * 86400000L)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", chk)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    evN.filter(col("ts") <= lit(mid)).repartition(2)
      .write.mode("append").parquet(src)
    run() // drop 1
    evN.filter(col("ts") > lit(mid)).repartition(2)
      .write.mode("append").parquet(src)
    run() // drop 2, after restart
    // two sentinel runs: the first advances the watermark past every
    // user's timeout; event-time timeouts FIRE in the next batch,
    // which the second sentinel triggers (both across restarts)
    sentinel(500).write.mode("append").parquet(src)
    run()
    sentinel(600).write.mode("append").parquet(src)
    run()

    val got = spark.read.parquet(outDir).groupBy("stage").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("view", "click", "purchase").foreach { st =>
      assert(got.getOrElse(st, 0L) == batch(st),
        s"stage $st: streaming=${got.get(st)} batch=${batch(st)}")
    }
  }

  test("streaming cohort retention equals batch q89 across restarts") {
    implicit val s = spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val batch = graft.operators.SessionOps.queries("q89_cohort_retention")(
      spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    val src = tmpDir("cohort-src"); val chk = tmpDir("cohort-chk")
    val outDir = tmpDir("cohort-out")
    val evN = graft.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val bounds = evN.agg(min(col("ts")), max(col("ts"))).head
    val (lo, hi) = (bounds.getTimestamp(0), bounds.getTimestamp(1))
    val mid = new Timestamp((lo.getTime + hi.getTime) / 2)
    def sentinel(daysAfter: Long) = Seq((
      -1L, new Timestamp(hi.getTime + daysAfter * 86400000L),
      -1L, "noop", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    def run(): Unit = {
      val q = EventStreams.cohortOffsets(
        EventStreams.readEventStream(spark, src).as[Event],
        idleGapMs = 365L * 86400000L)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", chk)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    evN.filter(col("ts") <= lit(mid)).repartition(2)
      .write.mode("append").parquet(src)
    run()
    evN.filter(col("ts") > lit(mid)).repartition(2)
      .write.mode("append").parquet(src)
    run()
    sentinel(500).write.mode("append").parquet(src)
    run()
    sentinel(600).write.mode("append").parquet(src)
    run()

    // the per-user rows aggregate to exactly the batch survivor
    // matrix (sentinel users excluded: they are not in the batch
    // input, only in the stream to advance the watermark)
    val got = spark.read.parquet(outDir)
      .filter(col("user_id") >= 0)
      .groupBy("cohort_day", "day_offset").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == batch, {
      val onlyGot = (got.keySet -- batch.keySet).take(5)
      val onlyBatch = (batch.keySet -- got.keySet).take(5)
      s"stream-only=$onlyGot batch-only=$onlyBatch " +
        s"diffs=${batch.keySet.intersect(got.keySet)
          .filter(k => batch(k) != got(k)).take(5).map(k =>
            s"$k: ${got(k)} vs ${batch(k)}")}"
    })
  }

  test("streaming streaks equal batch q95 across restarts") {
    implicit val s = spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val batch = graft.operators.SessionOps.queries("q95_gaps_islands")(
      spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

    val src = tmpDir("streak-src"); val chk = tmpDir("streak-chk")
    val outDir = tmpDir("streak-out")
    val evN = graft.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val bounds = evN.agg(min(col("ts")), max(col("ts"))).head
    val (lo, hi) = (bounds.getTimestamp(0), bounds.getTimestamp(1))
    val mid = new Timestamp((lo.getTime + hi.getTime) / 2)
    def sentinel(daysAfter: Long) = Seq((
      -1L, new Timestamp(hi.getTime + daysAfter * 86400000L),
      -1L, "noop", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    def run(): Unit = {
      val q = EventStreams.dailyStreaks(
        EventStreams.readEventStream(spark, src).as[Event],
        idleGapMs = 365L * 86400000L)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", chk)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // split mid-stream so island state persists across a restart and
    // second-half days extend/merge first-half islands
    evN.filter(col("ts") <= lit(mid)).repartition(2)
      .write.mode("append").parquet(src)
    run()
    evN.filter(col("ts") > lit(mid)).repartition(2)
      .write.mode("append").parquet(src)
    run()
    sentinel(500).write.mode("append").parquet(src)
    run()
    sentinel(600).write.mode("append").parquet(src)
    run()

    val got = spark.read.parquet(outDir)
      .filter(col("user_id") >= 0)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("best_streak"), r.getAs[Long]("n_streaks"),
          r.getAs[Long]("active_days")))
      .toMap
    assert(got == batch, {
      val onlyGot = (got.keySet -- batch.keySet).take(5)
      val onlyBatch = (batch.keySet -- got.keySet).take(5)
      s"stream-only=$onlyGot batch-only=$onlyBatch " +
        s"diffs=${batch.keySet.intersect(got.keySet)
          .filter(k => batch(k) != got(k)).take(5).map(k =>
            s"$k: ${got(k)} vs ${batch(k)}")}"
    })
  }

  test("streaming daily EWMA equals batch q109 bit-for-bit across restarts") {
    implicit val s = spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val batch = graft.operators.SessionOps.queries("q109_ewma")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap

    val src = tmpDir("ewma-src"); val chk = tmpDir("ewma-chk")
    val outDir = tmpDir("ewma-out")
    val evN = graft.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val bounds = evN.agg(min(col("ts")), max(col("ts"))).head
    val (lo, hi) = (bounds.getTimestamp(0), bounds.getTimestamp(1))
    val mid = new Timestamp((lo.getTime + hi.getTime) / 2)
    def sentinel(daysAfter: Long) = Seq((
      -1L, new Timestamp(hi.getTime + daysAfter * 86400000L),
      -1L, "noop", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    def run(): Unit = {
      val q = EventStreams.dailyEwma(
        EventStreams.readEventStream(spark, src).as[Event],
        idleGapMs = 365L * 86400000L)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", chk)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // restart mid-stream: open-day sums and the closed-13 ring must
    // survive the checkpoint for the weighted chain to stay exact
    evN.filter(col("ts") <= lit(mid)).repartition(2)
      .write.mode("append").parquet(src)
    run()
    evN.filter(col("ts") > lit(mid)).repartition(2)
      .write.mode("append").parquet(src)
    run()
    sentinel(500).write.mode("append").parquet(src)
    run()
    sentinel(600).write.mode("append").parquet(src)
    run()

    val got = spark.read.parquet(outDir)
      .filter(col("event_type") =!= "noop")
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day"))
        -> (r.getAs[Double]("daily_value"), r.getAs[Double]("ewma")))
      .toMap
    // the sentinel watermark closes every real day → full equality
    assert(got == batch, {
      val onlyGot = (got.keySet -- batch.keySet).take(5)
      val onlyBatch = (batch.keySet -- got.keySet).take(5)
      s"stream-only=$onlyGot batch-only=$onlyBatch " +
        s"diffs=${batch.keySet.intersect(got.keySet)
          .filter(k => batch(k) != got(k)).take(5).map(k =>
            s"$k: ${got(k)} vs ${batch(k)}")}"
    })
  }

  test("daily EWMA closed history survives an idle-gap eviction — " +
      "a resuming type lags across the gap like the batch chain") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val query = EventStreams.dailyEwma(input.toDS(), alpha = 0.3,
      terms = 14, watermarkDelay = "1 day", idleGapMs = 5L * 86400000L)
      .writeStream.format("memory").queryName("ewma_idle")
      .outputMode(OutputMode.Append()).start()
    // type A: two observed days, then silence past the 5-day idle gap
    input.addData(Event(1, ts("2024-01-01 06:00:00"), 1, "A", 10.0))
    input.addData(Event(2, ts("2024-01-02 06:00:00"), 1, "A", 20.0))
    query.processAllAvailable()
    // B pushes the watermark far past A's idle deadline; the NEXT
    // batch fires A's timeout with its open days drained — the old
    // code evicted the closed ring here and A restarted from scratch
    input.addData(Event(3, ts("2024-01-21 06:00:00"), 2, "B", 1.0))
    query.processAllAvailable()
    input.addData(Event(4, ts("2024-01-22 06:00:00"), 2, "B", 1.0))
    query.processAllAvailable()
    // A resumes after the gap; two more B days close A's new day
    input.addData(Event(5, ts("2024-01-31 06:00:00"), 1, "A", 30.0))
    query.processAllAvailable()
    input.addData(Event(6, ts("2024-02-10 06:00:00"), 2, "B", 1.0))
    query.processAllAvailable()
    input.addData(Event(7, ts("2024-02-11 06:00:00"), 2, "B", 1.0))
    query.processAllAvailable()
    query.stop()
    val aRows = spark.sql("select * from ewma_idle")
      .filter($"event_type" === "A")
      .collect().map(r => r.getAs[Long]("day") -> r.getAs[Double]("ewma"))
      .sortBy(_._1)
    assert(aRows.length == 3, aRows.mkString(","))
    // the resumed day's chain is [30, 20, 10] — the pre-gap closed
    // days STILL lag it (q109's batch semantics: observed days only,
    // gaps don't reset), reproduced in the exact left-assoc order
    val w = (0 until 14).map(j => 0.3 * math.pow(0.7, j))
    var num = 0.0; var den = 0.0
    Seq(30.0, 20.0, 10.0).zipWithIndex.foreach { case (v, j) =>
      num += w(j) * v; den += w(j)
    }
    (3 until 14).foreach { j => num += w(j) * 0.0; den += 0.0 }
    val expect = BigDecimal(num / den)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(aRows.last._2 == expect,
      s"resumed-day ewma ${aRows.last._2} != $expect — closed history " +
        "was evicted with the idle state")
  }

  test("streaming funnel survives a stage-quiet batch after a watermark jump") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Event]
    val query = EventStreams.funnel(input.toDS(),
      windowUs = 3600L * 1000000L, idleGapMs = 3600000L,
      watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("funnel_quiet")
      .outputMode(OutputMode.Append()).start()

    // user 7 views at 10:00 (idle timeout would be 11:00)
    input.addData(Event(1, ts("2024-01-01 10:00:00"), 7, "view", 1.0))
    query.processAllAvailable()
    // another user pushes the watermark to 21:00
    input.addData(Event(2, ts("2024-01-01 23:00:00"), 9, "noop", 0.0))
    query.processAllAvailable()
    // user 7 returns with ONLY a non-stage event: a stage-only idle
    // clock would re-arm the 11:00 timeout BELOW the 21:00 watermark
    // and Spark would fail the whole query — the clock must run on
    // every event
    input.addData(Event(3, ts("2024-01-01 23:30:00"), 7, "noop", 0.0))
    query.processAllAvailable()
    // advance + fire the timeout
    input.addData(Event(4, ts("2024-01-03 12:00:00"), 9, "noop", 0.0))
    query.processAllAvailable()
    input.addData(Event(5, ts("2024-01-04 12:00:00"), 9, "noop", 0.0))
    query.processAllAvailable()

    val out = spark.table("funnel_quiet")
      .as[graft.streaming.EventStreams.FunnelOut].collect()
    query.stop()
    assert(out.map(o => (o.user_id, o.stage)).toSet ==
      Set((7L, "view")))
  }

  test("streaming funnel finalize handles a late-but-in-watermark first view") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Event]
    val query = EventStreams.funnel(input.toDS(),
      windowUs = 3600L * 1000000L, idleGapMs = 3600000L,
      watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("funnel_late")
      .outputMode(OutputMode.Append()).start()

    // click arrives BEFORE the view that qualifies it (out of order);
    // the view lands one batch later, still inside the watermark
    input.addData(Event(2, ts("2024-01-01 10:30:00"), 7, "click", 1.0))
    query.processAllAvailable()
    input.addData(Event(1, ts("2024-01-01 10:00:00"), 7, "view", 1.0))
    query.processAllAvailable()
    // advance the watermark past the timeout, then trigger the
    // timeout-firing batch
    input.addData(Event(3, ts("2024-01-01 20:00:00"), 9, "noop", 0.0))
    query.processAllAvailable()
    input.addData(Event(4, ts("2024-01-01 23:00:00"), 9, "noop", 0.0))
    query.processAllAvailable()

    val out = spark.table("funnel_late")
      .as[graft.streaming.EventStreams.FunnelOut].collect()
    query.stop()
    // finalize-time replay credits BOTH stages — incremental stage
    // tracking would have dropped the out-of-order view
    assert(out.map(o => (o.stage, o.reached_us)).toSet == Set(
      ("view", ts("2024-01-01 10:00:00").getTime * 1000),
      ("click", ts("2024-01-01 10:30:00").getTime * 1000)))
    assert(out.forall(_.user_id == 7))
  }

  test("watermarked tumbling counts aggregate closed windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Event]
    val query = EventStreams.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      Event(1, ts("2024-01-01 10:10:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:40:00"), 2, "click", 2.0),
      Event(3, ts("2024-01-01 11:20:00"), 3, "view", 3.0))
    query.processAllAvailable()
    // advance watermark far enough to close the 10:00 window
    input.addData(Event(4, ts("2024-01-01 14:00:00"), 4, "view", 4.0))
    query.processAllAvailable()

    val rows = spark.table("tumbling").collect()
    query.stop()
    val clicks10 = rows.find(r =>
      r.getAs[Timestamp]("hour") == ts("2024-01-01 10:00:00") &&
        r.getAs[String]("event_type") == "click")
    assert(clicks10.isDefined)
    assert(clicks10.get.getAs[Long]("n") == 2)
    assert(clicks10.get.getAs[Double]("total_value") == 3.0)
  }

  test("watermarked hopping counts: events land in all covering windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Event]
    val query = EventStreams.hoppingCounts(input.toDF())
      .writeStream.format("memory").queryName("hopping")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      Event(1, ts("2024-01-01 10:10:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:40:00"), 2, "click", 2.0))
    query.processAllAvailable()
    input.addData(Event(3, ts("2024-01-01 14:00:00"), 3, "view", 4.0))
    query.processAllAvailable()

    val rows = spark.table("hopping").collect()
    query.stop()
    val clicks = rows.filter(_.getAs[String]("event_type") == "click")
      .map(r => (r.getAs[Timestamp]("window_start"), r.getAs[Long]("n"))).toMap
    // event 1 covers starts 09:15..10:00 (until 10:15), event 2 covers
    // 09:45..10:40 — overlap [09:45, 10:00] counts both
    assert(clicks(ts("2024-01-01 09:30:00")) == 1)
    assert(clicks(ts("2024-01-01 09:45:00")) == 2)
    assert(clicks(ts("2024-01-01 10:00:00")) == 2)
    assert(clicks(ts("2024-01-01 10:15:00")) == 1)
    // each click event appears in exactly 4 windows
    assert(clicks.values.sum == 8)
  }

  test("stream-stream interval join matches users within the hour window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    case class Order(order_id: Long, ts: Timestamp, user_id: Long, amount: Double)
    val evIn = MemoryStream[Event]
    val odIn = MemoryStream[(Long, Timestamp, Long, Double)]
    val joined = EventStreams.intervalJoin(
      evIn.toDF(),
      odIn.toDF().toDF("order_id", "ts", "user_id", "amount"))
    val query = joined.writeStream.format("memory").queryName("ivjoin")
      .outputMode(OutputMode.Append()).start()

    evIn.addData(Event(1, ts("2024-01-01 10:30:00"), 7, "click", 1.0))
    odIn.addData(
      (100L, ts("2024-01-01 10:00:00"), 7L, 50.0),  // in window
      (101L, ts("2024-01-01 09:00:00"), 7L, 60.0),  // too old
      (102L, ts("2024-01-01 10:15:00"), 8L, 70.0))  // other user
    query.processAllAvailable()
    val rows = spark.table("ivjoin").collect()
    query.stop()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("order_id") == 100L)
    assert(rows.head.getAs[Long]("event_id") == 1L)
  }

  test("stream-static enrichment joins the dim and keeps unmatched events") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val dim = Seq((7L, "gold"), (8L, "basic")).toDF("uid", "tier")
    val input = MemoryStream[Event]
    val query = EventStreams.enrich(input.toDF(), dim, "user_id", "uid")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
      Event(2, ts("2024-01-01 10:01:00"), 9, "view", 2.0)) // no dim row
    query.processAllAvailable()
    val rows = spark.table("enriched").collect()
    query.stop()
    assert(rows.length == 2)
    val byId = rows.map(r => r.getAs[Long]("event_id") -> r).toMap
    assert(byId(1L).getAs[String]("tier") == "gold")
    assert(byId(2L).isNullAt(byId(2L).fieldIndex("tier"))) // left-join null-extend
  }

  test("streaming dedup drops redelivered ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Event]
    val query = EventStreams.dedupWithinWatermark(input.toDF())
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
      Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0), // same-batch dup
      Event(2, ts("2024-01-01 10:01:00"), 8, "view", 2.0))
    query.processAllAvailable()
    // cross-batch redelivery of id 1 within the horizon → dropped
    input.addData(
      Event(1, ts("2024-01-01 10:02:00"), 7, "click", 1.0),
      Event(3, ts("2024-01-01 10:03:00"), 9, "click", 3.0))
    query.processAllAvailable()

    val ids = spark.table("deduped").collect().map(_.getAs[Long]("event_id"))
    query.stop()
    assert(ids.sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("streaming as-of enrichment equals the batch native AsOfJoin " +
      "over the real tables across restarts") {
    implicit val s = spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // batch reference: q48's native AsOfJoin (events LEFT as-of
    // orders on user at (o_orderdate, o_orderkey) desc) — compare
    // event_id → matched orderkey INCLUDING the null-extended class
    val batch = graft.SparkEntry.queries("q48_asof_native")(spark, sfDir)
      .collect().map { r =>
        r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3)))
      }.toMap
    val price = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val evSrc = tmpDir("asof-ev-src"); val dimSrc = tmpDir("asof-dim-src")
    val chk = tmpDir("asof-chk"); val outDir = tmpDir("asof-out")
    val evN = graft.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val dimN = graft.Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("key"),
        col("o_orderdate").cast("timestamp").as("ts"),
        col("o_orderkey").as("dim_id"),
        col("o_totalprice").as("dim_value"))
    val bounds = evN.agg(min(col("ts")), max(col("ts"))).head
    val (lo, hi) = (bounds.getTimestamp(0), bounds.getTimestamp(1))
    val mid = new Timestamp((lo.getTime + hi.getTime) / 2)
    // sentinels on BOTH sources: the union's watermark is the MIN of
    // the two sides', so each must advance for events to finalize
    def sentinelEv(daysAfter: Long) = Seq((
      -1L, new Timestamp(hi.getTime + daysAfter * 86400000L),
      -1L, "noop", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    def sentinelDim(daysAfter: Long) = Seq((
      -1L, new Timestamp(hi.getTime + daysAfter * 86400000L), -1L, 0.0))
      .toDF("key", "ts", "dim_id", "dim_value")
    def run(): Unit = {
      val dims = spark.readStream
        .schema("key BIGINT, ts TIMESTAMP, dim_id BIGINT, " +
          "dim_value DOUBLE")
        .parquet(dimSrc).as[EventStreams.DimUpdate]
      val q = EventStreams.asOfEnrich(
        EventStreams.readEventStream(spark, evSrc).as[Event], dims)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", chk)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // restart-boundary mid-stream on BOTH sides: dim versions loaded
    // before the restart must enrich events arriving after it (the
    // CDC-mirror state survives the checkpoint)
    // a planted NO-ORDERS user pins the null-extension (LEFT) class,
    // which the real tables don't produce at this sf — every event
    // user has an earlier order here
    val orphan = Seq((900001L, mid, 999999999L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    evN.filter(col("ts") <= lit(mid)).repartition(2)
      .write.mode("append").parquet(evSrc)
    orphan.write.mode("append").parquet(evSrc)
    dimN.filter(col("ts") <= lit(mid)).repartition(2)
      .write.mode("append").parquet(dimSrc)
    run()
    evN.filter(col("ts") > lit(mid)).repartition(2)
      .write.mode("append").parquet(evSrc)
    dimN.filter(col("ts") > lit(mid)).repartition(2)
      .write.mode("append").parquet(dimSrc)
    run()
    sentinelEv(500).write.mode("append").parquet(evSrc)
    sentinelDim(500).write.mode("append").parquet(dimSrc)
    run()
    sentinelEv(600).write.mode("append").parquet(evSrc)
    sentinelDim(600).write.mode("append").parquet(dimSrc)
    run()

    // the planted no-orders user emits exactly one NULL-extended row
    val orphanRows = spark.read.parquet(outDir)
      .filter(col("key") === 999999999L).collect()
    assert(orphanRows.length == 1 && orphanRows.head.isNullAt(
      orphanRows.head.fieldIndex("dim_id")),
      s"orphan user: ${orphanRows.mkString(";")}")
    val got = spark.read.parquet(outDir)
      .filter(col("key") >= 0 && col("key") =!= 999999999L)
      .collect().map { r =>
        r.getAs[Long]("event_id") ->
          (Option(r.getAs[java.lang.Long]("dim_id")).map(_.longValue()),
            Option(r.getAs[java.lang.Double]("dim_value"))
              .map(_.doubleValue()))
      }
    // exactly one output row per event (exactly-once finalization
    // across four runs), matches = the batch as-of pairs, AND the
    // enrichment payload rides along correctly
    assert(got.length == batch.size,
      s"rows: streaming=${got.length} batch=${batch.size}")
    val gotMap = got.toMap
    assert(gotMap.size == got.length, "duplicate event emissions")
    assert(gotMap.keySet == batch.keySet)
    val wrong = batch.collect {
      case (ev, want) if gotMap(ev)._1 != want =>
        s"$ev: got ${gotMap(ev)._1}, want $want"
    }
    assert(wrong.isEmpty, wrong.take(5).mkString("; "))
    gotMap.foreach { case (ev, (oid, oval)) =>
      oid.foreach(id => assert(oval.contains(price(id)),
        s"event $ev: dim_value ${oval} != o_totalprice ${price(id)}"))
    }
    assert(batch.values.exists(_.nonEmpty),
      "the matched class must occur for the test to mean anything")
  }
}
