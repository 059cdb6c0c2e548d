package graft

import org.apache.spark.sql.SparkSession

/** Same-session repeated-run harness for pinning ambient-load
  * verdicts on individual bench rows (the q92/q91 protocol from
  * round 9, factored out): runs each named query K times in ONE
  * session with full cache isolation between runs and prints every
  * timing, so "two same-session runs within X%" is one command
  * instead of a hand-driven bench edit.
  *
  * usage: runMain graft.QuietAB <sfDir> <k> <query>[,<query>…]
  */
object QuietAB {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: QuietAB <sfDir> <k> <q1,q2,…>")
    val sfDir = args(0); val k = args(1).toInt
    val names = args(2).split(",").toSeq
    names.foreach(n => require(SparkEntry.queries.contains(n), n))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warmup
    names.foreach { name =>
      val times = (1 to k).map { i =>
        spark.catalog.clearCache()
        graft.util.DfCache.release(spark)
        graft.util.PhaseTimer.drain()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val phases = graft.util.PhaseTimer.drain()
        val ph = if (phases.isEmpty) ""
          else phases.map { case (p, s) => f"$p=$s%.3f" }
            .mkString(" [", " ", "]")
        println(f"ABRUN $name run=$i sec=$sec%.3f$ph")
        sec
      }
      val sorted = times.sorted
      val spread =
        if (sorted.head == 0) 0.0 else sorted.last / sorted.head - 1.0
      println(f"ABSUMMARY $name k=$k min=${sorted.head}%.3f " +
        f"max=${sorted.last}%.3f spread=${spread * 100}%.1f%%")
    }
    spark.stop()
  }
}
