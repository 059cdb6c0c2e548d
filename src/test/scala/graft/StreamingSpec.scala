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
}
