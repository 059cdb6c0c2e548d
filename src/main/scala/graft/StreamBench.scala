package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** STREAMING MICRO-BENCH (r13 verdict item 8): per-operator
  * throughput for every EventStreams operator, measured batch-driven —
  * the events table is staged once as a parquet stream source, each
  * operator drains it with `Trigger.AvailableNow()` into the noop sink
  * (guide §1.4) from a fresh checkpoint, and the row is min-of-2
  * rows/s. Prints ONE JSON line (the Bench contract's shape):
  *
  *   {"metric":"stream_rows_per_sec","value":<geomean>,
  *    "unit":"rows/sec","operators":{...},"rows":N,"sf":...}
  *
  * Reads SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like graft.Bench;
  * SPARK_GRAFT_STREAM_OUT names the jsonl artifact
  * (BENCH_FREEZE rules apply), SPARK_GRAFT_STREAM_RUNS the per-op
  * sample count (default 2).
  */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_STREAM_OUT",
      "bench_artifacts/stream_bench.jsonl")
    val runs = sys.env.getOrElse("SPARK_GRAFT_STREAM_RUNS", "2").toInt.max(1)
    Bench.assertNotFrozen(outFile)
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val work = java.nio.file.Files.createTempDirectory("streambench")
    def dir(n: String): String = work.resolve(n).toString

    // stage the stream sources ONCE (multi-file so AvailableNow drains
    // in parallel tasks): events verbatim; a synthetic order stream
    // for the stream-stream interval join (same users/time range)
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    ev.repartition(8).write.parquet(dir("events"))
    ev.select(col("event_id").as("order_id"), col("ts"),
        col("user_id"), col("value").as("amount"))
      .repartition(8).write.parquet(dir("orders"))
    val nRows = spark.read.parquet(dir("events")).count()

    def events: DataFrame = EventStreams.readEventStream(spark, dir("events"))
    def orders: DataFrame = spark.readStream
      .schema("order_id BIGINT, ts TIMESTAMP, user_id BIGINT, amount DOUBLE")
      .parquet(dir("orders"))
    val dim = spark.range(0, 1000)
      .select(col("id").as("user_id"), (col("id") % 7).as("segment"))

    // every EventStreams operator, driven identically
    val ops: Seq[(String, () => DataFrame)] = Seq(
      "tumbling_counts" -> (() => EventStreams.tumblingCounts(events)),
      "hopping_counts" -> (() => EventStreams.hoppingCounts(events)),
      "interval_join" -> (() => EventStreams.intervalJoin(events, orders)),
      "enrich_static" -> (() =>
        EventStreams.enrich(events, dim, "user_id", "user_id")),
      "dedup_watermark" -> (() => EventStreams.dedupWithinWatermark(events)),
      "sliding_active_users" -> (() =>
        EventStreams.slidingActiveUsers(events)),
      "sessionize" -> (() => EventStreams.sessionize(events.as[Event]).toDF),
      "funnel" -> (() => EventStreams.funnel(events.as[Event]).toDF),
      "cohort_offsets" -> (() =>
        EventStreams.cohortOffsets(events.as[Event]).toDF),
      "daily_streaks" -> (() => EventStreams.dailyStreaks(events.as[Event]).toDF),
      "daily_ewma" -> (() => EventStreams.dailyEwma(events.as[Event]).toDF))

    def timeOne(name: String, build: () => DataFrame, run: Int): Double = {
      val chk = dir(s"chk_${name}_$run")
      spark.sparkContext.setJobDescription(s"stream-bench: $name run $run")
      val t0 = System.nanoTime()
      val q = build().writeStream.format("noop")
        .option("checkpointLocation", chk)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }

    val results = ops.map { case (name, build) =>
      val secs = (1 to runs).map(r => timeOne(name, build, r))
      val best = secs.min
      val rps = nRows / best
      println(f"STREAMQ $name sec=$best%.3f rows_per_sec=$rps%.0f " +
        secs.map(s => f"$s%.3f").mkString("all=[", ",", "]"))
      (name, best, rps)
    }
    val geo = math.exp(results.map(r => math.log(r._3)).sum / results.size)
    val opsJson = results.sortBy(_._1)
      .map { case (n, _, r) => "\"" + n + f"""\":$r%.0f""" }
      .mkString("{", ",", "}")
    val secJson = results.sortBy(_._1)
      .map { case (n, s, _) => "\"" + n + f"""\":$s%.3f""" }
      .mkString("{", ",", "}")
    try {
      val p = java.nio.file.Paths.get(outFile)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      val lines = results.sortBy(_._1).map { case (n, s, r) =>
        f"""{"op":"$n","sec":$s%.3f,"rows_per_sec":$r%.0f}"""
      } :+ f"""{"op":"_total","geomean_rps":$geo%.0f,"rows":$nRows,"sf":"$sfDir","runs_per_op":$runs}"""
      java.nio.file.Files.write(p,
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
      println(s"STREAM_ARTIFACT $outFile")
    } catch { case e: Exception =>
      System.err.println(s"[streambench] artifact write failed: ${e.getMessage}")
    }
    println(f"""{"metric":"stream_rows_per_sec","value":$geo%.0f,"unit":"rows/sec","operators":$opsJson,"seconds":$secJson,"rows":$nRows,"sf":"$sfDir"}""")
    spark.stop()
  }
}
