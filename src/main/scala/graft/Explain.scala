package graft

import org.apache.spark.sql.SparkSession

/** Plan/profiling diagnostic: `runMain graft.Explain <name> [sfDir]`
  * prints the formatted physical plan and the isolated execution time
  * of one query; `runMain graft.Explain ALL` times every query. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q01_pricing_summary")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    if (name == "LINT") {
      // lint-only: plans, never executes — cheap at any data size.
      // usage: runMain graft.Explain LINT <sfDir> <q1> [q2 …]
      args.drop(2).foreach { n =>
        val findings = graft.util.PlanLint
          .check(SparkEntry.queries(n)(spark, sfDir))
        println(s"LINT $n " +
          (if (findings.isEmpty) "clean"
           else findings.map(_.kind).sorted.mkString(",")))
      }
      spark.stop(); return
    }
    if (name == "PIECES") {
      import org.apache.spark.sql.functions._
      def t(label: String)(body: => Any): Unit = {
        val t0 = System.nanoTime()
        body
        println(f"[pieces] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      t("scan count")(docs.count())
      t("words")(docs.select(split(trim(col("text")), "\\s+").as("w")).count())
      val w = split(trim(col("text")), "\\s+")
      val tri = array_distinct(transform(
        sequence(lit(0), size(w) - 3),
        i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3))))
      t("trigrams")(docs.select(tri.as("g")).count())
      t("trigrams again")(docs.select(tri.as("g")).count())
      t("tri+hash+distinct")(docs.select(
        array_distinct(transform(tri, gr => xxhash64(gr))).as("g")).count())
      val g = docs.select(col("doc_id"),
        array_distinct(transform(tri, gr => xxhash64(gr))).as("grams")).cache()
      t("cache populate")(g.count())
      t("cached count")(g.count())
      g.unpersist()
      var g2: org.apache.spark.sql.DataFrame = null
      t("localCheckpoint") {
        g2 = docs.select(col("doc_id"),
          array_distinct(transform(tri, gr => xxhash64(gr))).as("grams"))
          .localCheckpoint(true)
      }
      t("checkpointed count")(g2.count())
      t("checkpointed count2")(g2.count())
      spark.stop(); return
    }
    if (name == "ALL") {
      SparkEntry.queries.keys.toSeq.sorted.foreach { n =>
        println(f"[explain] $n%-24s ${time(n)}%8.3f s")
      }
    } else {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir) // builds (+ eager caches)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      df.count()
      val tExec = (System.nanoTime() - t1) / 1e9
      df.explain("formatted")
      graft.util.PhaseTimer.drain() // cold-run phases: discard
      // min-of-N reruns (SPARK_GRAFT_EXPLAIN_RUNS, default 3): single
      // warm runs of job-heavy queries swing 2x with ambient load —
      // the min is the comparable steady-state number (bench protocol)
      val nRuns =
        math.max(1, sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_RUNS", "3").toInt)
      val reruns = (1 to nRuns).map { _ =>
        spark.catalog.clearCache()
        val t = time(name)
        (t, graft.util.PhaseTimer.drain())
      }
      val (tRerun, phases) = reruns.minBy(_._1)
      phases.foreach { case (p, sec) =>
        println(f"[phase] $p%-24s $sec%7.3f s")
      }
      println(f"[explain] $name: build=$tBuild%.3f s exec=$tExec%.3f s " +
        f"rerun=$tRerun%.3f s all=[${reruns.map(r => f"${r._1}%.2f").mkString(",")}]")
    }
    spark.stop()
  }
}
