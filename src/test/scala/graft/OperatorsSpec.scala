package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Invariant checks for the query surface (cross-engine value parity
  * is the driver's DuckDB gate; these specs pin semantics and the
  * relationships between exact and approximate operators). */
class OperatorsSpec extends SparkSpec {

  test("every query runs and every oracle key exists in queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty, name)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q01 aggregates reconcile with raw totals") {
    val out = Relational.queries("q01_pricing_summary")(spark, sfDir)
    val total = out.agg(sum("count_order")).head.getLong(0)
    val raw = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp")).count()
    assert(total == raw)
  }

  test("q32 minhash+LSH finds exactly the exact-Jaccard pair set") {
    val exact = TextOps.queries("q31_ngram_jaccard")(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = ScaleOps.queries("q32_minhash_pairs")(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
  }

  test("q31 count filter keeps unequal-size pairs at the size-ratio boundary") {
    import spark.implicits._
    // B's 4 shingles ⊂ A's 8 → jaccard exactly 0.5 = t with nb = t·na
    // (the size-ratio boundary). The df ranking puts A's 4 unique
    // (df=1) grams ahead of the shared (df=2) ones, so exactly ONE
    // prefix-prefix collision exists (the smallest-hash shared gram);
    // the former `c + least(suffixes)` count bound (1+1=2 < 4)
    // wrongly pruned this qualifying pair — `c + greatest` (1+3=4)
    // keeps it.
    val ws = (0 until 10).map(i => s"w$i")
    val docs = Seq(
      (1L, ws.mkString(" ")),          // 8 trigram shingles
      (2L, ws.take(6).mkString(" "))   // the first 4 of A's shingles
    ).toDF("doc_id", "text")
    val dir = tmpDir("q31-boundary")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = TextOps.queries("q31_ngram_jaccard")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pairs == Seq((1L, 2L, 0.5)))
  }

  test("ntileFromRank matches SQL NTILE across bucket-boundary cases") {
    import org.apache.spark.sql.expressions.{Window => W}
    // n<k, n=k, n=k+1, uneven remainders, k=1
    for ((n, k) <- Seq((1, 10), (9, 10), (10, 10), (11, 10),
      (95, 7), (100, 1), (37, 5))) {
      val df = spark.range(1, n + 1).toDF("rk")
      val mism = df
        .withColumn("a", RankOps.ntileFromRank(col("rk"), n, k))
        .withColumn("b", ntile(k).over(W.orderBy("rk")))
        .filter(col("a") =!= col("b")).count()
      assert(mism == 0, s"n=$n k=$k")
    }
  }

  test("q63 distributed exact ranking equals the global-window deciles") {
    val a = Relational.queries("q29_deciles")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    val b = Relational.queries("q63_deciles_scalable")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    assert(a.nonEmpty && a == b)
  }

  test("q85 distributed exact percentiles equal the percentile() aggregate") {
    val a = Relational.queries("q16_percentiles")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    val b = Relational.queries("q85_percentiles_scalable")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    assert(a.nonEmpty && a == b)
    // and the scalable plan never serializes a group into one task
    assert(graft.util.PlanLint.check(
      Relational.queries("q85_percentiles_scalable")(spark, sfDir)).isEmpty)
  }

  test("rank/prefix-sum parallelism follows spark.sql.shuffle.partitions") {
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_acctbal")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val ranked = RankOps.withGlobalRank(c,
        Seq(col("c_acctbal").asc, col("c_custkey").asc), rankCol = "rk")
      assert(ranked.rdd.getNumPartitions == 7)
      val summed = RankOps.withGroupedPrefixSum(
        c.withColumn("v", lit(1L)), Seq("c_custkey"), Seq("c_acctbal"),
        valueCol = "v", sumCol = "s")
      assert(summed.rdd.getNumPartitions == 7)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("q62 packs a single dominant stream across many partitions") {
    import org.apache.spark.sql.expressions.{Window => W}
    // one source = the old per-source-window shape's worst case: the
    // whole corpus would flow through ONE reducer. The prefix-sum
    // path must both (a) spread the rows over the requested
    // partitions and (b) reproduce the window semantics exactly.
    val one = Tables.documents(spark, sfDir)
      .select(lit("s0").as("source"), col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val packed = RankOps.withGroupedPrefixSum(one, Seq("source"),
      Seq("doc_id"), valueCol = "n_tokens", sumCol = "offset",
      partitions = 8)
    val nonEmpty = packed.rdd
      .mapPartitions(it => Iterator.single(it.size)).collect().count(_ > 0)
    assert(packed.rdd.getNumPartitions == 8 && nonEmpty > 1,
      s"single-source packing used $nonEmpty partition(s)")
    val byWindow = one.withColumn("offset",
      coalesce(sum("n_tokens").over(W.partitionBy("source").orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
    assert(packed.orderBy("doc_id").collect().map(_.toString).toSeq ==
      byWindow.orderBy("doc_id").collect().map(_.toString).toSeq)
    // and the shipped operator's physical plan carries no window at all
    val plan = TextOps.queries("q62_token_packing")(spark, sfDir)
      .queryExecution.executedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, plan.treeString)
  }

  test("q76 flags exactly the docs sharing a trigram with the benchmark set") {
    import spark.implicits._
    // doc 0 (id % 50 == 0) is the benchmark. doc 1 shares exactly ONE
    // trigram with it ("alpha beta gamma"); doc 2 shares none.
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma other words here"),
      (2L, "one two three four five")
    ).toDF("doc_id", "text")
    val dir = tmpDir("q76")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.queries("q76_decontaminate")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // doc 1 has 4 trigrams, 1 shared → frac 0.25; doc 2 absent
    assert(out == Seq((1L, 1L, 0.25)))
  }

  test("q77 repetition fractions match hand-computed docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a a"),     // 5 words, 1 distinct; 3 trigrams, 1 distinct
      (2L, "v w x y z"),     // all distinct
      (3L, "p q")            // too short for trigrams
    ).toDF("doc_id", "text")
    val dir = tmpDir("q77")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.queries("q77_repetition")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 5, 1.0 - 1.0 / 5.0, 1.0 - 1.0 / 3.0),
      (2L, 5, 0.0, 0.0),
      (3L, 2, 0.0, 0.0)))
  }

  test("q78 hopping windows cover each event 4x and embed the tumbling counts") {
    val hop = SessionOps.queries("q78_hopping_counts")(spark, sfDir)
    val nEvents = Tables.events(spark, sfDir).count()
    // 1h window / 15min hop → every event lands in exactly 4 windows
    assert(hop.agg(sum("n")).head.getLong(0) == 4 * nEvents)
    // hour-aligned hopping windows ARE the tumbling hour windows
    val onHour = hop.filter(substring(col("window_start"), 15, 2) === "00")
      .collect().map(_.toString).sorted.toSeq
    val tumbling = SessionOps.queries("q51_tumbling_counts")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    assert(onHour.nonEmpty && onHour == tumbling)
  }

  test("q75 count-min estimates are overestimate-only within the eps bound") {
    val out = TextOps.queries("q75_heavy_hitters")(spark, sfDir).collect()
    assert(out.length == 20)
    val total = Tables.documents(spark, sfDir)
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .filter(length(col("t")) > 0).count()
    out.foreach { r =>
      val exact = r.getLong(1); val est = r.getLong(2)
      assert(est >= exact, s"CMS underestimated ${r.getString(0)}")
      assert(est - exact <= (0.0005 * total).ceil.toLong * 2,
        s"${r.getString(0)}: est=$est exact=$exact total=$total")
    }
  }

  test("corpus pipeline: stages compose, counts shrink, deterministic") {
    val docs = Tables.documents(spark, sfDir)
    val cfg = CorpusPipeline.Config(
      minQuality = 0.4,
      maxRepetition = 0.95, // engages the q77-style repetition filter
      langKeepRates = Map("en" -> 0.9, "de" -> 0.5),
      defaultKeepRate = 0.25,
      binTokens = 2048L)
    val (packed, r) = CorpusPipeline.run(docs, cfg)
    assert(r.input >= r.afterQuality && r.afterQuality >= r.afterDedup &&
      r.afterDedup >= r.afterNearDup && r.afterNearDup >= r.afterDecontam &&
      r.afterDecontam >= r.afterSampling && r.afterSampling > 0)
    assert(r.bins > 0)
    // near-dup stage off by default; engaging it collapses a planted
    // near-rewrite (one appended word) onto the smaller doc_id
    assert(r.afterNearDup == r.afterDedup)
    import spark.implicits._
    val base = (1 to 40).map(i => s"token$i").mkString(" ")
    val planted = Seq(
      (100L, base, "en", "web"),
      (101L, base + " extraword", "en", "web"),
      (102L, (1 to 40).map(i => s"other$i").mkString(" "), "en", "web")
    ).toDF("doc_id", "text", "lang", "source")
    val nd = CorpusPipeline.dedupNear(planted, t = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(nd == Set(100L, 102L), s"near-dup stage kept: $nd")
    // with a benchmark: decontamination engages and only shrinks
    val (_, rb) = CorpusPipeline.run(docs, cfg,
      benchmark = Some(docs.filter(col("doc_id") === 0L)))
    assert(rb.afterDecontam <= rb.afterDedup)
    assert(rb.afterDecontam < r.afterDecontam) // doc 0's grams hit others
    // deterministic end to end
    val (packed2, r2) = CorpusPipeline.run(docs, cfg)
    assert(r2 == r)
    assert(packed.collect().map(_.toString).sorted.toSeq ==
      packed2.collect().map(_.toString).sorted.toSeq)
    // packing invariant: within a stream, each offset = previous
    // offset + previous n_tokens (exclusive prefix sum)
    val rows = packed.orderBy("source", "doc_id")
      .select("source", "n_tokens", "offset").collect()
    rows.sliding(2).foreach {
      case Array(a, b) if a.getString(0) == b.getString(0) =>
        assert(b.getLong(2) == a.getLong(2) + a.getLong(1))
      case _ => ()
    }
    // dedup stage: no two surviving docs share a fingerprint
    val deduped = CorpusPipeline.dedupExact(docs)
    val fps = deduped.select(
      CorpusPipeline.canonicalFingerprint(col("text"))).collect()
    assert(fps.length == fps.distinct.length)
  }

  test("corpus pipeline mixing stages: facade ≡ the standalone q112/q99 " +
      "operators, zero-token docs ride neutral, deterministic in run()") {
    val docs = Tables.documents(spark, sfDir)
    // the DSIR stage over the raw table keeps exactly q112's sample,
    // plus any zero-token docs (which q112 has no feature rows for
    // and the stage keeps at the neutral rate by contract)
    val emptyIds = docs
      .filter(coalesce(length(trim(col("text"))), lit(0)) === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaStage = CorpusPipeline.dsirResample(docs, "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaQuery = graft.SparkEntry.queries("q112_dsir_resample")(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaStage == viaQuery ++ emptyIds)
    // the temperature stage keeps exactly q99's sample
    val mixStage = CorpusPipeline.mixByTemperature(docs, 0.3, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val mixQuery = graft.SparkEntry.queries("q99_temperature_mix")(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(mixStage == mixQuery && mixStage.nonEmpty)
    // zero-token doc rides the DSIR stage at the neutral rate
    import spark.implicits._
    val withEmpty = Seq(
      (1L, "regular english text tokens here", "en", "web"),
      (2L, "   ", "en", "web")).toDF("doc_id", "text", "lang", "source")
    assert(CorpusPipeline.dsirResample(withEmpty, "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet.contains(2L))
    // in run(): stages engage in order, counts stay monotone,
    // end-to-end deterministic
    val cfg = CorpusPipeline.Config(minQuality = 0.4,
      dsirTargetLang = Some("en"), mixAlpha = Some(0.3))
    val (p1, r1) = CorpusPipeline.run(docs, cfg)
    assert(r1.afterDsir.exists(_ <= r1.afterDecontam))
    assert(r1.afterMixing.exists(_ <= r1.afterDsir.get))
    assert(r1.afterSampling <= r1.afterMixing.get && r1.afterSampling > 0)
    val (p2, r2) = CorpusPipeline.run(docs, cfg)
    assert(r2 == r1)
    assert(p1.collect().map(_.toString).sorted.toSeq ==
      p2.collect().map(_.toString).sorted.toSeq)
    // stages off → report fields absent and flow unchanged vs before
    val (_, rOff) = CorpusPipeline.run(docs,
      CorpusPipeline.Config(minQuality = 0.4))
    assert(rOff.afterDsir.isEmpty && rOff.afterMixing.isEmpty)
  }

  test("splitByCluster: near-dups never straddle splits, fractions " +
      "track, deterministic under repartitioning") {
    import spark.implicits._
    // 200 distinct base docs + 50 planted near-rewrites (one appended
    // word — same cluster as their base under t=0.5)
    def text(i: Int) = (1 to 30).map(j => s"w${i}x$j").mkString(" ")
    val base = (1 to 200).map(i => (i.toLong, text(i), "en", "web"))
    val twins = (1 to 50).map(i =>
      (1000L + i, text(i) + " extra", "en", "web"))
    val docs = (base ++ twins).toDF("doc_id", "text", "lang", "source")
    val out = TextOps.splitByCluster(docs, t = 0.5,
      valFrac = 0.2, testFrac = 0.2)
    val m = out.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m.size == 250)
    // the leakage guard: every planted twin lands with its base
    (1 to 50).foreach(i =>
      assert(m(i.toLong) == m(1000L + i), s"near-dup pair $i straddles"))
    // all three splits populated, train dominant, val/test in a loose
    // binomial band around 20% of the 200 clusters
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"), counts.toString)
    assert(counts("train") > counts("val") &&
      counts("train") > counts("test"), counts.toString)
    assert(counts("val") >= 15 && counts("val") <= 95, counts.toString)
    assert(counts("test") >= 15 && counts("test") <= 95, counts.toString)
    // deterministic and layout-invariant
    val m2 = TextOps.splitByCluster(docs.repartition(7), 0.5, 0.2, 0.2)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m2 == m)
    intercept[IllegalArgumentException] {
      TextOps.splitByCluster(docs, 0.5, valFrac = 0.6, testFrac = 0.5)
    }
  }

  test("corpus pipeline split stage: split-aware packing never lets a " +
      "bin straddle a split, streams restart at zero") {
    val docs = Tables.documents(spark, sfDir)
    val cfg = CorpusPipeline.Config(minQuality = 0.0,
      langKeepRates = Map.empty, defaultKeepRate = 1.0,
      splitFracs = Some((0.2, 0.2)), binTokens = 2048L)
    val (packed, r) = CorpusPipeline.run(docs, cfg)
    assert(r.splitCounts.exists(m =>
      m.values.sum == r.afterSampling &&
        m.keySet.subsetOf(Set("train", "val", "test")) &&
        m.getOrElse("train", 0L) > 0L), r.splitCounts.toString)
    // exclusive prefix sums WITHIN each (source, split) stream — a
    // bin spanning a split boundary would leak eval tokens into a
    // train pack
    val rows = packed.orderBy("source", "split", "doc_id")
      .select("source", "split", "n_tokens", "offset").collect()
    rows.sliding(2).foreach {
      case Array(a, b) if a.getString(0) == b.getString(0) &&
          a.getString(1) == b.getString(1) =>
        assert(b.getLong(3) == a.getLong(3) + a.getLong(2))
      case _ => ()
    }
    val starts = packed.groupBy("source", "split")
      .agg(min(col("offset")).as("o")).collect()
    assert(starts.nonEmpty && starts.forall(_.getAs[Long]("o") == 0L))
  }

  test("redactPii: typed tokens, exact counts, clean/null text untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact john.doe+x@example.com or 192.168.0.1 today"),
      (2L, "ssn 123-45-6789 phone (555) 123-4567 card 4111 1111 1111 1111"),
      (3L, "a clean document with no sensitive spans at all"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val r = TextOps.redactPii(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getString(1) == "contact <EMAIL> or <IP> today")
    assert(r(1L).getInt(2) == 2)
    assert(r(2L).getString(1) == "ssn <SSN> phone <PHONE> card <CC>")
    assert(r(2L).getInt(2) == 3)
    assert(r(3L).getString(1) == "a clean document with no sensitive spans at all")
    assert(r(3L).getInt(2) == 0)
    assert(r(4L).isNullAt(1) && r(4L).getInt(2) == 0)
    // pipeline wiring: redaction runs before fingerprinting, so two
    // re-crawls differing only in rotated PII dedup to one survivor
    val crawls = Seq(
      (10L, "report issues to alice@host1.example.com thanks for reading the page", "en", "web"),
      (11L, "report issues to bob.smith@other2.example.org thanks for reading the page", "en", "web")
    ).toDF("doc_id", "text", "lang", "source")
    val (_, rep) = CorpusPipeline.run(crawls,
      CorpusPipeline.Config(minQuality = 0.0, redactPii = true,
        langKeepRates = Map("en" -> 1.0), binTokens = 64L))
    assert(rep.afterDedup == 1, s"rotated-PII re-crawl must dedup: $rep")
    val (_, repOff) = CorpusPipeline.run(crawls,
      CorpusPipeline.Config(minQuality = 0.0, redactPii = false,
        langKeepRates = Map("en" -> 1.0), binTokens = 64L))
    assert(repOff.afterDedup == 2)
  }

  test("q90 KMV set sketch: estimation above k within bounds, folds order-free") {
    // the oracle pins the exact regime (every test vocabulary < k);
    // here the ESTIMATION path: two 12k-element segments overlapping
    // in 4k values, k=256 → σ ≈ 1/√(k−1) ≈ 6%, assert 4σ
    val k = 256
    val a = spark.range(0, 12000).select(lit("a").as("seg"), col("id"))
    val b = spark.range(8000, 20000).select(lit("b").as("seg"), col("id"))
    val df = a.union(b)
    def sketches(d: org.apache.spark.sql.DataFrame) = d.groupBy("seg")
      .agg(SetSketch.kmvAgg(xxhash64(col("id")), k).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    val sk = sketches(df)
    val estA = SetSketch.estimate(sk("a"), k)
    assert(math.abs(estA - 12000) / 12000 < 0.25, s"estA=$estA")
    val un = SetSketch.estimateUnion(sk("a"), sk("b"), k)
    assert(math.abs(un - 20000) / 20000 < 0.25, s"union=$un")
    // intersection/difference error scales with the union size
    val in = SetSketch.estimateIntersect(sk("a"), sk("b"), k)
    assert(math.abs(in - 4000) < 0.25 * 20000, s"intersect=$in")
    val dif = SetSketch.estimateDiff(sk("a"), sk("b"), k)
    assert(math.abs(dif - 8000) < 0.25 * 20000, s"diff=$dif")
    // k smallest of a SET: partitioning/merge order cannot change the
    // sketch — the maintained-fold contract, bit-identical
    val sk2 = sketches(df.repartition(17))
    assert(sk.map { case (s, v) => s -> v.toSeq } ==
      sk2.map { case (s, v) => s -> v.toSeq })
    // below k the sketch IS the distinct set (exact estimates)
    val tiny = sketches(
      spark.range(0, 40).select(lit("a").as("seg"), col("id")))
    assert(SetSketch.estimate(tiny("a"), k) == 40.0)

    // maintained view: three folds over slices ≡ one from-scratch
    // build, bit-identical (min-k is order-independent and a lossless
    // filter for further min-k); exactly-once by batch id
    val root = tmpDir("kmvview")
    val spec = SetSketch.ViewSpec("seg", xxhash64(col("id")), k)
    Seq(0, 1, 2).foreach { p =>
      SetSketch.update(spark, root, df.filter(col("id") % 3 === p), spec)
    }
    val maintained = SetSketch.read(spark, root)
    assert(maintained.map { case (s, v) => s -> v.toSeq } ==
      sk.map { case (s, v) => s -> v.toSeq })
    assert(SetSketch.foldBatch(spark, root,
      spark.range(20000, 20010).select(lit("b").as("seg"), col("id")),
      spec, batchId = 5L))
    // crash-redelivery of the same batch id is a no-op
    val afterFold = SetSketch.read(spark, root)
    assert(!SetSketch.foldBatch(spark, root, df, spec, batchId = 5L))
    assert(SetSketch.read(spark, root)
      .map { case (s, v) => s -> v.toSeq } ==
      afterFold.map { case (s, v) => s -> v.toSeq })

    // streaming twin: AvailableNow folds the drop exactly once; a
    // restart with a new drop folds only the new one
    val src = tmpDir("kmvsrc"); val ckpt = tmpDir("kmvckpt")
    val sroot = tmpDir("kmvsroot")
    val sspec = SetSketch.ViewSpec("customer_type", xxhash64(col("id")), k)
    graft.lakehouse.SurveyGen.writeArrival(spark, src, "d1.csv", 60, 51)
    SetSketch.runStream(spark, src, sroot, ckpt,
      graft.lakehouse.SurveyGen.schema, sspec).awaitTermination(60000)
    assert(SetSketch.read(spark, sroot).nonEmpty)
    graft.lakehouse.SurveyGen.writeArrival(spark, src, "d2.csv", 25, 52)
    SetSketch.runStream(spark, src, sroot, ckpt,
      graft.lakehouse.SurveyGen.schema, sspec).awaitTermination(60000)
    // the stream-maintained state ≡ one build over both drops (the
    // order-independence contract, checked bit for bit)
    val both = graft.lakehouse.SurveyGen.generate(spark, 60, 51)
      .unionByName(graft.lakehouse.SurveyGen.generate(spark, 25, 52))
    val scratch2 = both.groupBy(col("customer_type").cast("string").as("seg"))
      .agg(SetSketch.kmvAgg(xxhash64(col("id")), k).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(SetSketch.read(spark, sroot)
      .map { case (s, v) => s -> v.toSeq } == scratch2)
  }

  test("vec_sub: residual arithmetic, mixed element types, null edges") {
    val r = spark.sql(
      """SELECT vec_sub(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |               array(0.5D, 3.0D)) AS a,
        |       vec_sub(array(CAST(10 AS TINYINT)), array(0.25D)) AS b,
        |       vec_sub(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS c
        |""".stripMargin).head
    assert(r.getSeq[Double](0) == Seq(1.0, -1.0))
    assert(r.getSeq[Double](1) == Seq(9.75))
    assert(r.isNullAt(2))
    // Column API ≡ the zip_with formulation on real embeddings
    val emb = Tables.embeddings(spark, sfDir).limit(20)
      .select(col("vec_id"), col("embedding"))
    val pair = emb.as("x").join(emb.as("y"),
      col("x.vec_id") === col("y.vec_id") - 1)
    val viaExpr = pair.select(graft.functions.GraftFunctions.vecSub(
      col("x.embedding"), col("y.embedding")).as("d"))
    val viaHof = pair.select(zip_with(col("x.embedding"), col("y.embedding"),
      (a, b) => a.cast("double") - b.cast("double")).as("d"))
    assert(viaExpr.collect().map(_.getSeq[Double](0)).toSeq ==
      viaHof.collect().map(_.getSeq[Double](0)).toSeq)
  }

  test("deflate_len: repetition compresses, determinism, type/null edges") {
    val row = spark.sql(
      """SELECT deflate_len(repeat('spam ', 200)) AS rep,
        |  deflate_len(concat_ws(' ',
        |    transform(sequence(1, 40), i -> md5(cast(i AS string))))) AS var,
        |  deflate_len('') AS emp,
        |  deflate_len(CAST(NULL AS string)) AS nul,
        |  deflate_len(CAST('abcabc' AS binary)) AS bin,
        |  deflate_len('abcabc') AS str""".stripMargin).head()
    val repRatio = row.getInt(0) / 1000.0
    val varRatio = row.getInt(1) / (40 * 33 - 1).toDouble
    assert(repRatio < 0.1, s"repeated text must compress hard: $repRatio")
    assert(varRatio > 0.3, s"high-entropy text must not: $varRatio")
    assert(row.getInt(2) >= 0 && !row.isNullAt(2))
    assert(row.isNullAt(3))
    assert(row.getInt(4) == row.getInt(5)) // binary ≡ string bytes
    // deterministic across evaluations (codegen and interpreted paths
    // share one static kernel)
    val q = TextOps.queries("q84_compress_ratio")(spark, sfDir)
    val a = q.orderBy("doc_id").collect()
    val b = q.orderBy("doc_id").collect()
    assert(a.sameElements(b))
    assert(a.length > 0)
    a.foreach { r =>
      val ratio = r.getDouble(3)
      assert(ratio > 0.0 && ratio < 1.5, s"doc ${r.getLong(0)}: $ratio")
    }
  }

  test("q82 dup spans: shared 8-gram runs flagged, disjoint docs clean") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val dir = tmpDir("q82docs")
    Seq(
      (1L, s"one two $shared three four", "en", "a"),
      (2L, s"$shared five six seven eight nine", "en", "b"),
      (3L, "totally different words nothing in common with others here now", "en", "c"),
      (4L, "short doc", "en", "d")
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.queries("q82_dup_spans")(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // the shared 10-word run yields 3 positional 8-grams in each doc
    assert(out(1L).getLong(2) == 3 && out(2L).getLong(2) == 3)
    assert(out(3L).getLong(2) == 0)
    assert(out(4L).getLong(1) == 0 && out(4L).getLong(2) == 0 &&
      out(4L).getDouble(3) == 0.0) // <8 words: no spans, frac 0 not NaN
  }

  test("dedupAgainstHistory keeps only content-new incoming docs") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val history = docs.filter(col("doc_id") < 250)
    // incoming: genuinely new docs + re-crawled copies of history
    // content under NEW ids (content dedup must drop them)
    val recrawled = history.filter(col("doc_id") < 10)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val incoming = docs.filter(col("doc_id") >= 250).unionByName(recrawled)
    val kept = TextOps.dedupAgainstHistory(history, incoming)
    // reference: plain anti-join on the canonical fingerprint
    def fp(df: org.apache.spark.sql.DataFrame) = df.withColumn("f",
      md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ").cast("binary")))
    val expected = fp(incoming).join(fp(history).select("f"), Seq("f"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val got = kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == expected && got.nonEmpty)
    // every re-crawled copy was dropped by content, not id
    assert(!got.exists(_ >= 100000))
  }

  test("nearDupAgainstHistory drops near-rewrites, equals the unfiltered verify") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val history = docs.filter(col("doc_id") < 250)
    // incoming: the rest of the corpus (which q31 says contains
    // near-dups of history docs) + light rewrites of history content
    // under new ids — appended words keep trigram Jaccard >= 0.5 for
    // long docs, which EXACT fingerprint dedup cannot catch
    val rewritten = history.filter(col("doc_id") < 10)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text"))
    val incoming = docs.filter(col("doc_id") >= 250).unionByName(rewritten)
    val hp = TextOps.historyPostings(history)
    val kept = TextOps.nearDupAgainstHistory(hp, incoming)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // reference: exact cross-Jaccard with NO prefix filter — the
    // filtered path must drop exactly the same docs (prefix filtering
    // is lossless at t >= 0.5)
    val ip = TextOps.historyPostings(incoming).toDF("doc_id", "na", "gram")
    val matched = ip.join(hp, Seq("gram"))
      .groupBy("doc_id", "hist_id", "na", "nb")
      .agg(count(lit(1)).as("c"))
      .filter(col("c").cast("double") / (col("na") + col("nb") - col("c"))
        >= 0.5)
      .select("doc_id").distinct()
    val expected = incoming.join(matched, Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == expected && kept.nonEmpty)
    // the appended-word rewrites were caught as near-dups
    assert(!kept.exists(_ >= 100000))
    // and at least one organic incoming doc matched history too
    assert(kept.size < incoming.count())
  }

  test("q69 star-contraction clusters equal q66 label propagation") {
    val prop = TextOps.queries("q66_dedup_clusters")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    val star = TextOps.queries("q69_dedup_clusters_star")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    assert(prop.nonEmpty && star == prop)
    // and the clusters are non-trivial: at least one multi-doc cluster
    val multi = TextOps.queries("q66_dedup_clusters")(spark, sfDir)
      .groupBy("cluster_id").count().filter(col("count") > 1).count()
    assert(multi > 0)
  }

  test("q64 selective-profile LSH equals the exact pair set at t=0.5") {
    // sf0.001's max pairwise cosine is ~0.48 — empty at this
    // threshold — so this spec runs at sf0.01, which populates it
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir)
    val exact = VectorOps.cosinePairs(emb, 0.5, exactLimit = Long.MaxValue)
      .collect().map(_.toString).sorted.toSeq
    val lsh = ScaleOps.queries("q64_cosine_pairs_hi")(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(exact.nonEmpty && lsh == exact)
  }

  test("cosinePairs guard: exact at the limit, LSH above it, same pairs") {
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val viaExact = VectorOps.cosinePairs(emb, 0.4, exactLimit = n)
    val viaLsh = VectorOps.cosinePairs(emb, 0.4, exactLimit = n - 1,
      cacheKey = "spec:cosinePairs")
    // the exact baseline IS the broadcast cartesian; the dispatched
    // LSH path must not contain one anywhere in its plan
    assert(viaExact.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    assert(!viaLsh.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    assert(viaExact.collect().map(_.toString).sorted.toSeq ==
      viaLsh.collect().map(_.toString).sorted.toSeq)
  }

  test("salted join equals the plain join on skewed data") {
    import spark.implicits._
    // hot key 1 carries 90% of the left side
    val left = ((1 to 900).map(i => (1L, i)) ++
      (1 to 100).map(i => (i.toLong + 1, i))).toDF("k", "v")
    val right = (1 to 50).map(i => (i.toLong, s"r$i")).toDF("rk", "name")
    val plain = left.join(right, col("k") === col("rk"))
      .select("k", "v", "name").collect().map(_.toString).sorted.toSeq
    val salted = JoinOps.saltedJoin(left, right, "k", "rk", salts = 8)
      .select("k", "v", "name").collect().map(_.toString).sorted.toSeq
    assert(salted == plain && salted.nonEmpty)
  }

  test("bloom anti-join equals the plain anti-join, including null keys") {
    import spark.implicits._
    val plain = Relational.queries("q15_no_orders")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    val bloom = Relational.queries("q56_no_orders_bloom")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    assert(bloom.nonEmpty && bloom == plain)
    // null left keys survive (NOT EXISTS semantics)
    val l = Seq((Some(1L), "a"), (None, "b"), (Some(2L), "c"))
      .toDF("k", "v")
    val r = Seq(Tuple1(1L)).toDF("rk")
    val out = JoinOps.bloomAntiJoin(l, r, "k", "rk")
      .select("v").collect().map(_.getString(0)).sorted.toSeq
    assert(out == Seq("b", "c"))
  }

  test("q47 cosine LSH finds exactly the exact cosine-threshold pair set") {
    val exact = VectorOps.queries("q46_cosine_pairs")(spark, sfDir)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = ScaleOps.queries("q47_cosine_pairs_lsh")(spark, sfDir)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(lsh == exact)
  }

  test("q42 approx distinct within 5% of exact") {
    val exact = Tables.events(spark, sfDir).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact"))
    val approx = ScaleOps.queries("q42_approx_distinct")(spark, sfDir)
    val joined = approx.join(exact, "event_type").collect()
    joined.foreach { r =>
      val a = r.getAs[Long]("approx_users").toDouble
      val e = r.getAs[Long]("exact").toDouble
      assert(math.abs(a - e) / e < 0.05, s"${r.getString(0)}: $a vs $e")
    }
  }

  test("q44 approx quantiles within 1% of exact") {
    val approx = ScaleOps.queries("q44_approx_quantile")(spark, sfDir)
    val exact = Relational.queries("q16_percentiles")(spark, sfDir)
    val joined = approx.join(exact, "o_orderstatus").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val rel = math.abs(r.getAs[Double]("approx_p50") - r.getAs[Double]("p50")) /
        r.getAs[Double]("p50")
      assert(rel < 0.01, s"${r.getString(0)}: $rel")
    }
  }

  test("normalize_text: accents, case, whitespace — matches the DuckDB oracle form") {
    import spark.implicits._
    val df = Seq(
      (1L, "  Héllo   WÖRLD  "),
      (2L, "Çà et  LÀ\tñoño"),
      (3L, "plain ascii")
    ).toDF("id", "t")
    // expected values verified against DuckDB's
    // strip_accents(lower(trim(regexp_replace(s, '\s+', ' ', 'g'))))
    val expected = Seq("hello world", "ca et la nono", "plain ascii")
    val viaColumn = df.orderBy("id")
      .select(graft.functions.GraftFunctions.normalizeText(col("t")))
      .as[String].collect().toSeq
    assert(viaColumn == expected)
    df.createOrReplaceTempView("nrm")
    val viaSql = spark.sql(
      "SELECT normalize_text(t) FROM nrm ORDER BY id")
      .as[String].collect().toSeq
    assert(viaSql == expected)
  }

  test("simhash64 native expression registers and runs in SQL") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT simhash64(transform(array('a','b','c'), t -> xxhash64(t))) AS s")
      .head.getLong(0)
    val r2 = spark.sql(
      "SELECT simhash64(transform(array('a','b','c'), t -> xxhash64(t))) AS s")
      .head.getLong(0)
    assert(r == r2)
    // interpreted eval path agrees with codegen
    val viaEval = graft.functions.SimHash64(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1L, 2L, 3L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType))).eval(null)
    val viaSql = spark.sql("SELECT simhash64(array(1L, 2L, 3L))").head.getLong(0)
    assert(viaEval == viaSql)
  }

  test("vector expressions: dot/cosine/hyperplane parity with the HOF formulations") {
    graft.functions.GraftFunctions.register(spark)
    // real embeddings: native codegen results must be BIT-equal to the
    // interpreted aggregate/zip_with formulations they replace
    Tables.embeddings(spark, sfDir).limit(50)
      .createOrReplaceTempView("emb_parity")
    val mism = spark.sql(
      """SELECT count(*) AS bad FROM (
        |  SELECT
        |    dot_product(embedding, embedding) AS nd,
        |    aggregate(zip_with(embedding, embedding,
        |      (x, y) -> cast(x as double) * cast(y as double)),
        |      0.0D, (a, x) -> a + x) AS hd,
        |    cosine_sim(embedding, embedding) AS nc,
        |    hyperplane_bits(embedding, 0, 8) AS nb,
        |    aggregate(sequence(0, 7), 0, (acc, j) -> acc | shiftleft(
        |      if(aggregate(zip_with(embedding,
        |           transform(sequence(0, 63),
        |             k -> if((xxhash64(j, k) & 1) = 1, 1.0D, -1.0D)),
        |           (x, h) -> cast(x as double) * h),
        |         0.0D, (a, x) -> a + x) > 0, 1, 0), j)) AS hb
        |  FROM emb_parity) t
        |WHERE nd <> hd OR nb <> hb OR abs(nc - 1.0D) > 1e-12
        |""".stripMargin).head.getLong(0)
    assert(mism == 0)
    // interpreted eval path agrees with codegen for the binary exprs
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val lit3 = Literal.create(Seq(1.0f, 2.0f, 3.0f), ArrayType(FloatType))
    assert(graft.functions.DotProduct(lit3, lit3).eval(null) == 14.0)
    assert(graft.functions.CosineSim(lit3, lit3).eval(null) == 1.0)
    val viaSql = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(1.0D, 2.0D, 3.0D))")
      .head.getDouble(0)
    assert(viaSql == 14.0)
    val hpEval = graft.functions.HyperplaneBits(lit3, 0, 8).eval(null)
    val hpSql = spark.sql(
      "SELECT hyperplane_bits(array(1.0D, 2.0D, 3.0D), 0, 8)").head.getLong(0)
    // float->double is exact for these values, so eval == codegen-sql
    assert(hpEval == hpSql)
  }

  test("DfCache: memoizes per key, rebuilds after release/eviction") {
    import spark.implicits._
    var builds = 0
    def build() = graft.util.DfCache.getOrBuild(spark, "dfcache-spec") {
      builds += 1
      val df = Seq(1, 2, 3).toDF("x").cache(); df.count(); df
    }
    val a = build(); val b = build()
    assert(builds == 1 && (a eq b)) // second call hits the memo
    graft.util.DfCache.release(spark)
    assert(a.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    val c = build()
    assert(builds == 2 && c.count() == 3) // rebuilt and cached again
    assert(c.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    // eviction behind our back (clearCache) is detected via storageLevel
    spark.catalog.clearCache()
    build()
    assert(builds == 3)
    graft.util.DfCache.release(spark)
  }

  test("minhash_bands: slot-min semantics, band locality, edge cases") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val mb = (c: org.apache.spark.sql.Column) =>
      graft.functions.GraftFunctions.minhashBands(c, 64, 4)
    val a = (0L until 64L)                 // slot s has min s
    val b = a ++ a.map(_ + 64L)            // same slots, larger values
    val c = a.updated(5, 5L - 64L)         // slot 5's min drops to -59
    val sigs = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "grams")
      .select(col("id"), mb(col("grams")).as("sig"))
      .orderBy("id").collect().map(_.getSeq[Long](1))
    assert(sigs(0).size == 16)
    // extra grams that change no slot minimum -> identical signatures
    assert(sigs(0) == sigs(1))
    // a changed minimum flips exactly its band (slot 5 -> band 1)
    val diff = sigs(0).zip(sigs(2)).zipWithIndex.filter { case ((x, y), _) => x != y }
    assert(diff.map(_._2) == Seq(1))
    // all-absent bands are NULL (never a shared joinable constant)
    val empty = Seq((1L, Seq.empty[Long])).toDF("id", "grams")
      .select(mb(col("grams"))).head.getSeq[java.lang.Long](0)
    assert(empty.size == 16 && empty.forall(_ == null))
    // a single gram fills exactly one slot -> one non-null band
    val one = Seq((1L, Seq(7L))).toDF("id", "grams")
      .select(mb(col("grams"))).head.getSeq[java.lang.Long](0)
    assert(one.count(_ != null) == 1 && one(1) != null) // slot 7 -> band 1
    // interpreted eval agrees with codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val viaEval = graft.functions.MinHashBands(
      Literal.create(a, ArrayType(LongType)), 64, 4)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    assert(viaEval == sigs(0))
  }

  test("trigram_hashes native expression: xxhash64-chain parity, dedup, edge cases") {
    graft.functions.GraftFunctions.register(spark)
    // same values as the built-in xxhash64 composition it replaces
    val ok = spark.sql(
      """SELECT trigram_hashes(array('a','b','c','d')) =
        |  array(xxhash64(xxhash64('a'), xxhash64('b'), xxhash64('c')),
        |        xxhash64(xxhash64('b'), xxhash64('c'), xxhash64('d'))) AS ok
        |""".stripMargin).head.getBoolean(0)
    assert(ok)
    // repeated trigrams dedup; fewer than 3 words → empty
    val dedup = spark.sql(
      "SELECT size(trigram_hashes(array('a','b','c','a','b','c'))) AS n")
      .head.getInt(0)
    assert(dedup == 3) // abc, bca, cab — the 2nd abc dedups
    assert(spark.sql("SELECT size(trigram_hashes(array('a','b'))) AS n")
      .head.getInt(0) == 0)
    // interpreted eval agrees with codegen
    val viaEval = graft.functions.TrigramHashes(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("a", "b", "c", "d"), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    val viaSql = spark.sql("SELECT trigram_hashes(array('a','b','c','d'))")
      .head.getSeq[Long](0)
    assert(viaEval == viaSql)
  }

  test("q45 IVF ANN: deterministic, k<=3 per probe, reports recall vs exact") {
    val ivf = ScaleOps.queries("q45_ann_ivf")(spark, sfDir).collect()
    val ivf2 = ScaleOps.queries("q45_ann_ivf")(spark, sfDir).collect()
    assert(ivf.map(_.toString).sorted.toSeq == ivf2.map(_.toString).sorted.toSeq)
    val byProbe = ivf.groupBy(_.getAs[Long]("probe_id"))
    assert(byProbe.nonEmpty)
    byProbe.values.foreach(g => assert(g.length <= 3))
    val exact = VectorOps.queries("q34_ann_cosine")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = ivf.map(r =>
      (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    info(s"IVF recall@3 = ${approx.intersect(exact).size.toDouble / exact.size}")
  }

  test("q49 k-means IVF: training deterministic, recall >= label-centroid IVF floor") {
    val emb = Tables.embeddings(spark, sfDir)
    val c1 = KMeansVec.train(emb, k = 10, iters = 5)
    val c2 = KMeansVec.train(emb, k = 10, iters = 5)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    assert(c1.length == 10 && c1.forall(_.length == 64))
    val exact = VectorOps.queries("q34_ann_cosine")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = ScaleOps.queries("q49_ann_ivf_kmeans")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    info(s"k-means IVF recall@3 = $recall")
    assert(recall >= 0.2, s"recall collapsed: $recall")
  }

  test("q86 PQ ANN: codebook shape, deterministic training, recall vs exact") {
    val emb = Tables.embeddings(spark, sfDir)
    val cb = VectorPQ.train(emb, m = 16, ksub = 16, iters = 5)
    val cb2 = VectorPQ.train(emb, m = 16, ksub = 16, iters = 5)
    // bit-stable training: decimal accumulation + hash-ranked init
    assert(cb.collect().map(_.toString).sorted.toSeq ==
      cb2.collect().map(_.toString).sorted.toSeq)
    assert(cb.count() == 16 * 16)
    assert(cb.select(size(col("cvec"))).distinct().head.getInt(0) == 4)
    // every vector encodes to exactly m in-range codes — the 32×
    // compression contract (16 codes × 4 bits vs 64 float32s)
    val codes = VectorPQ.encode(emb, cb)
    assert(codes.count() == emb.count())
    assert(codes.filter(size(col("codes")) =!= 16).count() == 0)
    assert(codes.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") >= 16).count() == 0)
    // ADC candidates + exact rerank: deterministic, recall pinned.
    // The test embeddings are near-orthogonal random vectors whose
    // neighbor gaps sit BELOW PQ distortion (the hardest regime) —
    // the measured floor here is a conservative 0.5.
    val out = ScaleOps.queries("q86_ann_pq")(spark, sfDir).collect()
    val out2 = ScaleOps.queries("q86_ann_pq")(spark, sfDir).collect()
    assert(out.map(_.toString).sorted.toSeq == out2.map(_.toString).sorted.toSeq)
    val exact = VectorOps.queries("q34_ann_cosine")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val pq = out.map(r =>
      (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = pq.intersect(exact).size.toDouble / exact.size
    info(s"PQ(m=16, ksub=16, depth=30) recall@3 = $recall")
    assert(recall >= 0.5, s"recall collapsed: $recall")
  }

  test("sampled trainers: bounded run == full train on the hash-lowest subset") {
    val emb = Tables.embeddings(spark, sfDir)
    // the deterministic sample a bounded trainer sees: hash-lowest n
    def lowest(n: Int) = emb.select(col("vec_id"), col("embedding"))
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy(col("h"), col("vec_id")).limit(n).drop("h")
    // PQ codebooks: trainSample=200 over the corpus ≡ an unclipped run
    // (sample covers input) over exactly that 200-vector subset — the
    // sampled trainer is the full trainer on the deterministic sample,
    // nothing else changes
    val a = VectorPQ.train(emb, m = 16, ksub = 16, iters = 2,
      trainSample = 200).collect().map(_.toString).sorted.toSeq
    val b = VectorPQ.train(lowest(200), m = 16, ksub = 16, iters = 2,
      trainSample = 1000).collect().map(_.toString).sorted.toSeq
    assert(a == b && a.size == 16 * 16)
    // bit-stable across runs at a sub-corpus sample size
    val a2 = VectorPQ.train(emb, m = 16, ksub = 16, iters = 2,
      trainSample = 200).collect().map(_.toString).sorted.toSeq
    assert(a == a2)
    // coarse k-means: the same contract
    val c1 = KMeansVec.train(emb, k = 8, iters = 2, trainSample = 100)
    val c2 = KMeansVec.train(lowest(100), k = 8, iters = 2,
      trainSample = 1000)
    val c3 = KMeansVec.train(emb, k = 8, iters = 2, trainSample = 100)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    assert(c1.map(_.toSeq).toSeq == c3.map(_.toSeq).toSeq)
  }

  test("driver-loop trainers are BIT-IDENTICAL to the distributed Lloyd loop") {
    // r13 optimization: train() runs Lloyd's on the driver over the
    // same bounded hash-rank sample (one job instead of ~2/iteration).
    // This pins element-wise bit-identity against the original
    // cluster-side loop — q49's oracle hash rides on these doubles.
    val emb = Tables.embeddings(spark, sfDir)
    val local = KMeansVec.train(emb, k = 10, iters = 5)
    val dist = KMeansVec.trainDistributed(emb, k = 10, iters = 5,
      trainSample = 0)
    assert(local.length == dist.length)
    local.zip(dist).foreach { case (l, r) =>
      assert(java.util.Arrays.equals(l, r)) }
    // PQ codebooks: same contract, every (sub, code) row identical
    val cbL = VectorPQ.train(emb, m = 16, ksub = 16, iters = 3)
      .collect().map(_.toString).sorted.toSeq
    val cbD = VectorPQ.trainDistributed(emb, m = 16, ksub = 16, iters = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(cbL == cbD)
  }

  test("packed 4-bit PQ codes: half the bytes, identical ADC ranking") {
    val emb = Tables.embeddings(spark, sfDir)
    val cb = VectorPQ.train(emb, m = 16, ksub = 16, iters = 3)
    val plain = VectorPQ.encode(emb, cb)
    val packed = VectorPQ.encodePacked(emb, cb)
    // half-width tinyint layout
    assert(packed.schema("codes").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, containsNull = true))
    assert(packed.filter(size(col("codes")) =!= 8).count() == 0)
    // pack/unpack is lossless: the packed search ranks IDENTICALLY
    val probes = emb.filter(col("vec_id") < 5)
    val a = VectorPQ.searchADC(probes, plain, cb, k = 10)
      .collect().map(_.toString).sorted.toSeq
    val b = VectorPQ.searchADCPacked(probes, packed, cb, k = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("q87 SQ8 ANN: 4x-compressed scan reproduces exact top-3 bit for bit") {
    val emb = Tables.embeddings(spark, sfDir)
    val codes = VectorPQ.encodeSQ8(emb)
    // tinyint codes, one per component
    assert(codes.schema("codes").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, containsNull = true))
    assert(codes.filter(size(col("codes")) =!= 64).count() == 0)
    // the full query (SQ top-12 → exact-decimal top-3) equals exact
    // brute force EXACTLY — this is why q87 shares q34's oracle
    val sq = ScaleOps.queries("q87_ann_sq8")(spark, sfDir).collect()
      .map(_.toString).sorted.toSeq
    val exact = VectorOps.queries("q34_ann_cosine")(spark, sfDir).collect()
      .map(_.toString).sorted.toSeq
    assert(sq == exact)
  }

  test("persisted IVF index: pruned-partition search equals in-memory IVF") {
    val emb = Tables.embeddings(spark, sfDir)
    val path = tmpDir("graft-ivf")
    VectorIndex.build(emb, path, k = 10, iters = 5)
    val probes = emb.filter(col("vec_id") < 5)
    val viaIndex = VectorIndex.search(spark, path, probes, nprobe = 4, k = 3)
    // partition pruning engaged: fewer list files read than exist
    val lists = spark.read.parquet(s"$path/lists")
    assert(viaIndex.count() > 0)
    val inMem = ScaleOps.queries("q49_ann_ivf_kmeans")(spark, sfDir)
    val a = viaIndex.collect().map(_.toString).sorted.toSeq
    val b = inMem.collect().map(_.toString).sorted.toSeq
    assert(a == b)
    // the search only touched the routed centroid partitions
    val allParts = lists.select("cent_id").distinct().count()
    assert(allParts == 10)
  }

  test("index tombstones: logical delete, vacuum materializes, re-add revives") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val path = tmpDir("graft-ivf-ts")
    VectorIndex.build(emb, path, k = 10, iters = 5)
    val probes = emb.filter(col("vec_id") < 5)
    val before = VectorIndex.search(spark, path, probes, nprobe = 4, k = 3)
      .collect()
    // remove the top-1 neighbor of probe 0: searches must never
    // return it again, and a full k=3 result must still come back
    val victim = before.filter(r => r.getLong(0) == 0L && r.getInt(2) == 1)
      .head.getLong(1)
    VectorIndex.remove(spark, path, Seq(victim).toDF("vec_id"))
    val after = VectorIndex.search(spark, path, probes, nprobe = 4, k = 3)
    assert(after.filter(col("neighbor_id") === victim).count() == 0)
    assert(after.filter(col("probe_id") === 0L).count() == 3,
      "pre-top-k filtering must keep k live results")
    // expected = brute-force over the index WITHOUT the victim
    val expect = VectorIndex.search(spark, path, probes, nprobe = 4, k = 3,
      allowed = Some(emb.filter(col("vec_id") =!= victim)
        .select("vec_id")))
      .collect().map(_.toString).sorted.toSeq
    assert(after.collect().map(_.toString).sorted.toSeq == expect)
    // vacuum rewrites only the victim's partition; results unchanged
    val listDirs = new java.io.File(s"$path/lists").listFiles()
      .filter(_.getName.startsWith("cent_id="))
      .map(f => f.getName -> f.lastModified()).toMap
    assert(VectorIndex.vacuumTombstones(spark, path) == 1L)
    assert(spark.read.parquet(s"$path/lists")
      .filter(col("vec_id") === victim).count() == 0)
    val touched = new java.io.File(s"$path/lists").listFiles()
      .filter(_.getName.startsWith("cent_id="))
      .count(f => listDirs.get(f.getName).forall(_ != f.lastModified()))
    assert(touched == 1, s"vacuum must rewrite exactly the one affected partition, touched $touched")
    val afterVac = VectorIndex.search(spark, path, probes, nprobe = 4, k = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(afterVac == expect)
    // vacuum with no tombstones is a no-op
    assert(VectorIndex.vacuumTombstones(spark, path) == 0L)
    // re-adding a removed id revives it: remove another id, then add
    // its row back — the tombstone drops and search returns it
    VectorIndex.remove(spark, path, Seq(victim).toDF("vec_id"))
    VectorIndex.add(spark, path, emb.filter(col("vec_id") === victim))
    val revived = VectorIndex.search(spark, path, probes, nprobe = 4, k = 3)
    assert(revived.collect().map(_.toString).sorted.toSeq ==
      before.map(_.toString).sorted.toSeq,
      "re-add must revive the removed vector exactly")
    // PQ tier: tombstones filter the code stream the same way
    val pqPath = tmpDir("graft-ivfpq-ts")
    VectorIndex.buildPQ(emb, pqPath, k = 10, m = 16, ksub = 16, iters = 3)
    VectorIndex.remove(spark, pqPath, Seq(victim).toDF("vec_id"))
    val pqRes = VectorIndex.searchPQ(spark, pqPath, probes, emb,
      nprobe = 4, k = 3)
    assert(pqRes.filter(col("neighbor_id") === victim).count() == 0)
    assert(pqRes.filter(col("probe_id") === 0L).count() == 3)
    assert(VectorIndex.vacuumTombstones(spark, pqPath) == 1L)
    assert(spark.read.parquet(s"$pqPath/codes")
      .filter(col("vec_id") === victim).count() == 0)
  }

  test("self-describing index: recorded params drive retrainAuto and the SQL proc") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val path = tmpDir("graft-ivf-auto")
    VectorIndex.build(emb.filter(col("vec_id") < 60), path, k = 5, iters = 4)
    assert(VectorIndex.params(spark, path) == Map(
      "kind" -> "ivf", "k" -> "5", "iters" -> "4", "trainSample" -> "0"))
    VectorIndex.add(spark, path, emb.filter(col("vec_id") >= 60))
    // the SQL proc reads the index's OWN recorded knobs — no caller
    // restates (or mis-states) k/iters; source given as a plain
    // parquet dir; default vacuums the superseded generation
    val srcDir = tmpDir("graft-ivf-auto-src")
    emb.write.mode("overwrite").parquet(srcDir)
    val (pr, _) = graft.lakehouse.SqlRunner.callProc(spark,
      "graft_ann_retrain", Seq(path, srcDir))
    val prRow = pr.head()
    assert(prRow.getAs[Long]("generation") == 1L)
    assert(prRow.getAs[Long]("vacuumed_roots") >= 1L)
    assert(!new java.io.File(s"$path/lists").exists())
    // refit equals an explicit full-corpus build with the same knobs
    val twin = tmpDir("graft-ivf-auto-twin")
    VectorIndex.build(emb, twin, k = 5, iters = 4)
    val probes = emb.filter(col("vec_id") < 5)
    def full(p: String) = VectorIndex
      .search(spark, p, probes, nprobe = 5, k = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(full(path) == full(twin) && full(path).nonEmpty)
    // params carried into the committed generation → retrain can be
    // re-issued forever
    assert(VectorIndex.params(spark, path)("k") == "5")
    // PQ params round-trip with the full layout flags
    val pqPath = tmpDir("graft-ivfpq-auto")
    VectorIndex.buildPQ(emb, pqPath, k = 6, m = 16, ksub = 16, iters = 3,
      residual = true, packed = true)
    val ps = VectorIndex.params(spark, pqPath)
    assert(ps("kind") == "ivfpq" && ps("m") == "16" &&
      ps("residual") == "true" && ps("packed") == "true" &&
      ps("opq") == "false")
    assert(VectorIndex.retrainAuto(spark, pqPath, emb) == 1L)
    assert(VectorIndex.isPQ(spark, pqPath),
      "retrainAuto must preserve the PQ layout")
    // a pre-params index refuses loudly instead of guessing knobs
    val legacy = tmpDir("graft-ivf-legacy")
    VectorIndex.build(emb, legacy, k = 5, iters = 3)
    new java.io.File(s"$legacy/_params").delete()
    val err = intercept[IllegalArgumentException] {
      VectorIndex.retrainAuto(spark, legacy, emb)
    }
    assert(err.getMessage.contains("no recorded build params"))
  }

  test("index retrain: atomic generation flip rebuilds from live content only") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val path = tmpDir("graft-ivf-rt")
    // bootstrap geometry fitted to an early slice, then grow the index
    // through frozen centroids — the drift shape retrain answers
    VectorIndex.build(emb.filter(col("vec_id") < 50), path, k = 6, iters = 5)
    VectorIndex.add(spark, path, emb.filter(col("vec_id") >= 50))
    // one curation drop already VACUUMED (physically gone from the
    // lists) and one still pending as a tombstone
    val gone = 7L; val pending = 11L
    VectorIndex.remove(spark, path, Seq(gone).toDF("vec_id"))
    assert(VectorIndex.vacuumTombstones(spark, path) == 1L)
    VectorIndex.remove(spark, path, Seq(pending).toDF("vec_id"))
    val probes = emb.filter(col("vec_id") < 5)
    assert(VectorIndex.retrain(spark, path, emb,
      (df, p) => VectorIndex.build(df, p, k = 6, iters = 5)) == 1L)
    // the committed generation lives under g1; the flat legacy dirs
    // are superseded but still present until the vacuum
    assert(new java.io.File(s"$path/_gens/gen-1").exists())
    assert(new java.io.File(s"$path/g1/lists").exists())
    // retrain fed the build exactly the LIVE set: both drops excluded
    // (the vacuumed one must NOT resurrect from the source table),
    // geometry refit on the survivors — bit-identical to a fresh
    // build on that set (deterministic hash-rank training)
    val survivors = emb.filter(!col("vec_id").isin(gone, pending))
    val ref = tmpDir("graft-ivf-rt-ref")
    VectorIndex.build(survivors, ref, k = 6, iters = 5)
    def full(p: String) = VectorIndex
      .search(spark, p, probes, nprobe = 6, k = 3)
      .collect().map(_.toString).sorted.toSeq
    val got = full(path)
    assert(got == full(ref))
    assert(got.nonEmpty)
    // the new generation starts clean: no tombstones to vacuum
    assert(VectorIndex.vacuumTombstones(spark, path) == 0L)
    // generation vacuum drops the superseded flat data; results hold
    assert(VectorIndex.vacuumGenerations(spark, path) >= 1L)
    assert(!new java.io.File(s"$path/lists").exists())
    assert(full(path) == got)
    // crashed NEXT attempt: an unmarked stage dir stays invisible and
    // the following retrain overwrites it
    new java.io.File(s"$path/g2/junk").mkdirs()
    assert(full(path) == got)
    assert(VectorIndex.retrain(spark, path, emb,
      (df, p) => VectorIndex.build(df, p, k = 6, iters = 5)) == 2L)
    assert(full(path) == got)
    // PQ tier: retrain preserves the packed/residual layout the
    // daemon's config re-issues, and the generation search matches a
    // fresh PQ build on the same survivor set
    val pqPath = tmpDir("graft-ivfpq-rt")
    VectorIndex.buildPQ(emb, pqPath, k = 6, m = 16, ksub = 16, iters = 3,
      residual = true, packed = true)
    VectorIndex.remove(spark, pqPath, Seq(gone, pending).toDF("vec_id"))
    assert(VectorIndex.retrain(spark, pqPath, emb,
      (df, p) => VectorIndex.buildPQ(df, p, k = 6, m = 16, ksub = 16,
        iters = 3, residual = true, packed = true)) == 1L)
    val pqRef = tmpDir("graft-ivfpq-rt-ref")
    VectorIndex.buildPQ(survivors, pqRef, k = 6, m = 16, ksub = 16,
      iters = 3, residual = true, packed = true)
    def fullPQ(p: String) = VectorIndex
      .searchPQ(spark, p, probes, emb, nprobe = 6, k = 3)
      .collect().map(_.toString).sorted.toSeq
    val gotPQ = fullPQ(pqPath)
    assert(gotPQ == fullPQ(pqRef) && gotPQ.nonEmpty)
  }

  test("searchPQ DEFAULT rerank pool derives from the index (rf·k ≈ 3·n/nlist, " +
      "floor 4, 8192-candidate cap, re-derived after mutations)") {
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val nlist = 10L
    val path = tmpDir("graft-ivfpq-poolrule")
    VectorIndex.buildPQ(emb, path, k = nlist.toInt, m = 16, ksub = 16,
      iters = 3)
    val k = 3
    val rfD = VectorIndex.poolScaledRerankFactor(spark, path, k, nlist)
    val expected = math.max(4L, math.min(
      math.ceil(math.ceil(3.0 * n / nlist) / k).toLong,
      math.max(4L, 8192L / k))).toInt
    assert(rfD == expected, s"derived $rfD, rule says $expected (n=$n)")
    // the lazy count is recorded on the index for later searches
    assert(VectorIndex.params(spark, path)
      .get("n_live").map(_.toLong).contains(n))
    // default-pool search ≡ the same factor passed explicitly
    val probes = emb.filter(col("vec_id") < 5)
    def run(rf: Int) = VectorIndex
      .searchPQ(spark, path, probes, emb, nprobe = 4, k = k,
        rerankFactor = rf)
      .collect().map(_.toString).sorted.toSeq
    val viaDefault = run(0)
    assert(viaDefault == run(rfD) && viaDefault.nonEmpty)
    // latency cap: a pool request beyond 8192 candidates clamps
    assert(VectorIndex.poolScaledRerankFactor(spark, path, 8192, nlist) == 4)
    // mutations invalidate the recorded count — remove half the
    // corpus and the derived pool shrinks accordingly
    VectorIndex.remove(spark, path,
      emb.filter(col("vec_id") % 2 === 0).select("vec_id"))
    val rfAfter = VectorIndex.poolScaledRerankFactor(spark, path, k, nlist)
    assert(rfAfter < rfD,
      s"pool did not shrink after removals: $rfAfter vs $rfD")
  }

  test("IVF-PQ index: pruned compressed lists, rerank recall, incremental add") {
    val emb = Tables.embeddings(spark, sfDir)
    val path = tmpDir("graft-ivfpq")
    VectorIndex.buildPQ(emb, path, k = 10, m = 16, ksub = 16, iters = 3)
    // the lists hold m-int codes, partitioned by centroid
    val codes = spark.read.parquet(s"$path/codes")
    assert(codes.count() == emb.count())
    assert(codes.filter(size(col("codes")) =!= 16).count() == 0)
    assert(codes.select("cent_id").distinct().count() == 10)
    val probes = emb.filter(col("vec_id") < 5)
    val res = VectorIndex.searchPQ(spark, path, probes, emb,
      nprobe = 4, k = 3)
    val res2 = VectorIndex.searchPQ(spark, path, probes, emb,
      nprobe = 4, k = 3)
    assert(res.collect().map(_.toString).sorted.toSeq ==
      res2.collect().map(_.toString).sorted.toSeq)
    // recall vs exact brute force: bounded by the SAME coarse routing
    // as raw IVF — report it, assert it hasn't collapsed
    val exact = VectorOps.queries("q34_ann_cosine")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val got = res.collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    info(s"IVF-PQ recall@3 = $recall")
    assert(recall >= 0.2, s"recall collapsed: $recall")
    // incremental add with the stored models ≡ batch build: lists and
    // search results identical
    val old = emb.filter(col("vec_id") % 5 =!= 0)
    val fresh = emb.filter(col("vec_id") % 5 === 0)
    val pIncr = tmpDir("graft-ivfpq-incr")
    val cents = spark.read.parquet(s"$path/centroids")
    val cb = spark.read.parquet(s"$path/codebook")
    VectorIndex.buildPQWith(old, pIncr, cents, cb)
    VectorIndex.addPQ(spark, pIncr, fresh)
    val a = spark.read.parquet(s"$path/codes")
      .collect().map(_.toString).sorted.toSeq
    val b = spark.read.parquet(s"$pIncr/codes")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
    val viaIncr = VectorIndex.searchPQ(spark, pIncr, probes, emb,
      nprobe = 4, k = 3)
    assert(viaIncr.collect().map(_.toString).sorted.toSeq ==
      res.collect().map(_.toString).sorted.toSeq)

    // RESIDUAL layout: codebooks trained on v − centroid (vec_sub),
    // (probe, cent)-keyed LUT at search, marker-dispatched addPQ
    val pRes = tmpDir("graft-ivfpq-res")
    VectorIndex.buildPQ(emb, pRes, k = 10, m = 16, ksub = 16,
      iters = 3, residual = true)
    val resR = VectorIndex.searchPQ(spark, pRes, probes, emb,
      nprobe = 4, k = 3)
    val gotR = resR.collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recallR = gotR.intersect(exact).size.toDouble / exact.size
    info(s"IVF-PQ residual recall@3 = $recallR")
    assert(recallR >= 0.2, s"residual recall collapsed: $recallR")
    // incremental add derives residuals from the stored models too
    val pResIncr = tmpDir("graft-ivfpq-res-incr")
    VectorIndex.buildPQWith(old, pResIncr,
      spark.read.parquet(s"$pRes/centroids"),
      spark.read.parquet(s"$pRes/codebook"), residual = true)
    VectorIndex.addPQ(spark, pResIncr, fresh)
    assert(spark.read.parquet(s"$pRes/codes")
        .collect().map(_.toString).sorted.toSeq ==
      spark.read.parquet(s"$pResIncr/codes")
        .collect().map(_.toString).sorted.toSeq)
  }

  test("filtered ANN: allowed-set search equals the exact filtered baseline") {
    val emb = Tables.embeddings(spark, sfDir)
    val allowed = emb.filter(col("label") % 2 === 0).select("vec_id")
    val probes = emb.filter(col("vec_id") < 5)
    val exactDf = VectorOps.queries("q93_ann_filtered")(spark, sfDir)
    val exact = exactDf.collect().map(_.toString).sorted.toSeq
    def triples(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rnk"))).sorted.toSeq

    // raw IVF with full routing (nprobe = every cell): the filtered
    // scan covers the whole allowed set → EXACTLY the q93 baseline
    // ((probe, neighbor, rnk) — search() rounds its cosine column)
    val pIvf = tmpDir("graft-ivf-filt")
    VectorIndex.build(emb, pIvf, k = 10, iters = 5)
    val viaIvf = VectorIndex.search(spark, pIvf, probes, nprobe = 10,
      k = 3, allowed = Some(allowed))
    assert(triples(viaIvf) == triples(exactDf))

    // IVF-PQ, full production config: with full routing and a rerank
    // pool wider than the allowed set, the exact rerank reproduces the
    // baseline bit for bit
    val pPq = tmpDir("graft-ivfpq-filt")
    VectorIndex.buildPQ(emb, pPq, k = 10, m = 16, ksub = 16, iters = 3,
      residual = true, packed = true, opq = true)
    val viaPq = VectorIndex.searchPQ(spark, pPq, probes, emb,
      nprobe = 10, k = 3, rerankFactor = 200, allowed = Some(allowed))
    assert(viaPq.collect().map(_.toString).sorted.toSeq == exact)

    // the selective config never leaks a disallowed neighbor and keeps
    // useful recall (pre-filter: the top-k can't silently empty)
    val sel = VectorIndex.searchPQ(spark, pPq, probes, emb,
      nprobe = 4, k = 3, rerankFactor = 4, allowed = Some(allowed))
    val allowedIds = allowed.collect().map(_.getLong(0)).toSet
    val selRows = sel.collect()
    assert(selRows.nonEmpty)
    assert(selRows.forall(r => allowedIds(r.getAs[Long]("neighbor_id"))),
      "filtered search returned a disallowed neighbor")
    val exactPairs = VectorOps.queries("q93_ann_filtered")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val selPairs = selRows
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = selPairs.intersect(exactPairs).size.toDouble / exactPairs.size
    info(s"filtered IVF-PQ recall@3 (nprobe=4, rf=4) = $recall")
    assert(recall >= 0.2, s"filtered recall collapsed: $recall")
  }

  test("packed IVF-PQ index: smaller lists, identical search, addPQ round-trips") {
    val emb = Tables.embeddings(spark, sfDir)
    // ONE set of trained models, two storage layouts
    val cents = KMeansVec.centroidsDF(spark,
      KMeansVec.train(emb, k = 10, iters = 3))
    val cb = VectorPQ.train(emb, m = 16, ksub = 16, iters = 3)
    val pPlain = tmpDir("ivfpq-plain"); val pPacked = tmpDir("ivfpq-packed")
    VectorIndex.buildPQWith(emb, pPlain, cents, cb)
    VectorIndex.buildPQWith(emb, pPacked, cents, cb, packed = true)
    // stored rows are the half-width nibble-pair layout
    val stored = spark.read.parquet(s"$pPacked/codes")
    assert(stored.schema("codes").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, containsNull = true))
    assert(stored.filter(size(col("codes")) =!= 8).count() == 0)
    assert(stored.count() == emb.count())
    // The byte win is DECODED width (scan/cache/shuffle), not parquet
    // at rest: parquet dictionary-encodes the nibble-valued ints to
    // ~4 bits already (measured: the packed files are no smaller),
    // but every decoded row carries 16 unsafe ints (~76 B) vs 8 bytes
    // (~24 B). Measure through the columnar cache's own accounting.
    def cachedBytes(df: org.apache.spark.sql.DataFrame): Long = {
      val before = spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum
      df.cache().count()
      val after = spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum
      df.unpersist(blocking = true)
      after - before
    }
    val bp = cachedBytes(
      spark.read.parquet(s"$pPlain/codes").select("vec_id", "codes"))
    val bq = cachedBytes(
      spark.read.parquet(s"$pPacked/codes").select("vec_id", "codes"))
    info(s"decoded codes bytes: plain=$bp packed=$bq (${bq.toDouble / bp})")
    assert(bq < bp && bq > 0)
    // identical search results: unpack-on-scan is lossless
    val probes = emb.filter(col("vec_id") < 5)
    val a = VectorIndex.searchPQ(spark, pPlain, probes, emb, nprobe = 4, k = 3)
      .collect().map(_.toString).sorted.toSeq
    val b = VectorIndex.searchPQ(spark, pPacked, probes, emb, nprobe = 4, k = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
    // incremental add re-derives the packed layout from the marker:
    // build(old) + addPQ(fresh) ≡ batch build over everything
    val old = emb.filter(col("vec_id") % 5 =!= 0)
    val fresh = emb.filter(col("vec_id") % 5 === 0)
    val pIncr = tmpDir("ivfpq-packed-incr")
    VectorIndex.buildPQWith(old, pIncr, cents, cb, packed = true)
    VectorIndex.addPQ(spark, pIncr, fresh)
    assert(spark.read.parquet(s"$pIncr/codes")
        .collect().map(_.toString).sorted.toSeq ==
      stored.collect().map(_.toString).sorted.toSeq)
    assert(VectorIndex.searchPQ(spark, pIncr, probes, emb, nprobe = 4, k = 3)
      .collect().map(_.toString).sorted.toSeq == a)
    // packed composes with the residual layout (both markers)
    val pResPacked = tmpDir("ivfpq-res-packed")
    VectorIndex.buildPQ(emb, pResPacked, k = 10, m = 16, ksub = 16,
      iters = 3, residual = true, packed = true)
    val pRes = tmpDir("ivfpq-res")
    VectorIndex.buildPQ(emb, pRes, k = 10, m = 16, ksub = 16,
      iters = 3, residual = true)
    assert(VectorIndex.searchPQ(spark, pResPacked, probes, emb,
        nprobe = 4, k = 3).collect().map(_.toString).sorted.toSeq ==
      VectorIndex.searchPQ(spark, pRes, probes, emb,
        nprobe = 4, k = 3).collect().map(_.toString).sorted.toSeq)
  }

  test("probe-batch guards refuse oversized probe sets at the boundary") {
    val emb = Tables.embeddings(spark, sfDir)
    // all three probe-broadcast searches are guarded; the refusal
    // fires on the probe count BEFORE any scan work starts
    intercept[IllegalArgumentException] {
      VectorPQ.searchSQ8(emb, VectorPQ.encodeSQ8(emb), k = 3,
        probeLimit = 10)
    }
    val cb = VectorPQ.train(emb, m = 16, ksub = 16, iters = 1)
    intercept[IllegalArgumentException] {
      VectorPQ.searchADC(emb, VectorPQ.encode(emb, cb), cb, k = 3,
        probeLimit = 10)
    }
    intercept[IllegalArgumentException] {
      VectorPQ.searchADCPacked(emb, VectorPQ.encodePacked(emb, cb), cb,
        k = 3, probeLimit = 10)
    }
    // at or below the bound the same calls plan fine
    val probes = emb.filter(col("vec_id") < 5)
    assert(VectorPQ.searchSQ8(probes, VectorPQ.encodeSQ8(emb), k = 3,
      probeLimit = 10).count() > 0)
  }

  test("q91 prebuilt-index search: deterministic, k<=3 per probe") {
    val out = ScaleOps.queries("q91_ann_pq_search")(spark, sfDir).collect()
    val out2 = ScaleOps.queries("q91_ann_pq_search")(spark, sfDir).collect()
    assert(out.map(_.toString).sorted.toSeq ==
      out2.map(_.toString).sorted.toSeq)
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("probe_id")).values
      .foreach(g => assert(g.length <= 3))
  }

  test("OPQ rotation: orthogonal + deterministic, recall lift, rotated addPQ") {
    val emb = Tables.embeddings(spark, sfDir)
    val r1 = VectorOPQ.trainRotation(emb, m = 16, ksub = 16, sweeps = 4)
    val r2 = VectorOPQ.trainRotation(emb, m = 16, ksub = 16, sweeps = 4)
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq) // bit-stable
    val d = r1.length
    // exactly orthogonal: R·Rᵀ = I
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(k => r1(i)(k) * r1(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"RRt[$i][$j] = $dot")
    }
    // the in-row rotation preserves pairwise cosine (spot check)
    val cos = graft.functions.GraftFunctions.cosineSim _
    val rotdf = emb.filter(col("vec_id") < 20).select(col("vec_id"),
      col("embedding"), VectorOPQ.rotateCol(r1, col("embedding")).as("rv"))
    rotdf.as("a").join(rotdf.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(cos(col("a.embedding"), col("b.embedding")).as("c0"),
        cos(col("a.rv"), col("b.rv")).as("c1"))
      .collect()
      .foreach(r => assert(
        math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6))

    // recall on the adversarial near-orthogonal corpus: OPQ composed
    // with residual + packed vs the residual-only index
    val exact = VectorOps.queries("q34_ann_cosine")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val probes = emb.filter(col("vec_id") < 5)
    def recallOf(path: String, rf: Int): Double = {
      val got = VectorIndex.searchPQ(spark, path, probes, emb,
        nprobe = 4, k = 3, rerankFactor = rf).collect()
        .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")))
        .toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val pOpq = tmpDir("ivfpq-opq")
    VectorIndex.buildPQ(emb, pOpq, k = 10, m = 16, ksub = 16, iters = 3,
      residual = true, packed = true, opq = true)
    val pRes = tmpDir("ivfpq-res-base")
    VectorIndex.buildPQ(emb, pRes, k = 10, m = 16, ksub = 16, iters = 3,
      residual = true)
    // measured on this (deterministic) adversarial corpus:
    // rf=4 — residual 0.60, OPQ 0.667; rf=8 — residual 0.733, OPQ
    // 0.867. OPQ lifts recall at BOTH rerank depths; the floors pin
    // the rf=8 production point with one-miss margin.
    val (rOpq, rRes) = (recallOf(pOpq, 8), recallOf(pRes, 8))
    info(s"recall@3 rf=8: OPQ+residual = $rOpq, residual-only = $rRes")
    info(s"recall@3 rf=4: OPQ+residual = ${recallOf(pOpq, 4)}, " +
      s"residual-only = ${recallOf(pRes, 4)}")
    assert(rOpq >= 0.8, s"OPQ recall regressed: $rOpq")
    assert(rOpq > rRes, s"OPQ lost its lift: $rOpq vs $rRes")
    // deterministic search over the OPQ index
    val s1 = VectorIndex.searchPQ(spark, pOpq, probes, emb, nprobe = 4, k = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(s1 == VectorIndex.searchPQ(spark, pOpq, probes, emb,
      nprobe = 4, k = 3).collect().map(_.toString).sorted.toSeq && s1.nonEmpty)

    // incremental adds rotate through the STORED matrix: build(old) +
    // addPQ(fresh) under one model set ≡ batch build of everything
    val old = emb.filter(col("vec_id") % 5 =!= 0)
    val fresh = emb.filter(col("vec_id") % 5 === 0)
    val cents = spark.read.parquet(s"$pOpq/centroids")
    val cb = spark.read.parquet(s"$pOpq/codebook")
    val rStored = VectorOPQ.loadRotation(spark, s"$pOpq/rotation")
    val pBatch = tmpDir("ivfpq-opq-batch"); val pIncr = tmpDir("ivfpq-opq-incr")
    VectorIndex.buildPQWith(emb, pBatch, cents, cb, residual = true,
      packed = true, rotation = Some(rStored))
    VectorIndex.buildPQWith(old, pIncr, cents, cb, residual = true,
      packed = true, rotation = Some(rStored))
    VectorIndex.addPQ(spark, pIncr, fresh)
    assert(spark.read.parquet(s"$pIncr/codes")
        .collect().map(_.toString).sorted.toSeq ==
      spark.read.parquet(s"$pBatch/codes")
        .collect().map(_.toString).sorted.toSeq)
  }

  test("q92 semantic mix: deterministic, conserving, never widens the spread") {
    val emb = Tables.embeddings(spark, sfDir)
    val out = ScaleOps.queries("q92_semantic_mix")(spark, sfDir).collect()
    val out2 = ScaleOps.queries("q92_semantic_mix")(spark, sfDir).collect()
    assert(out.map(_.toString).toSeq == out2.map(_.toString).toSeq)
    // every vector lands in exactly one cluster; keeps never exceed
    // members; rates are genuine probabilities
    assert(out.map(_.getAs[Long]("n")).sum == emb.count())
    out.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n"))
      val kr = r.getAs[Double]("keep_rate")
      assert(kr > 0.0 && kr <= 1.0)
    }
    // the whole point: rebalancing can only TIGHTEN the cluster-size
    // spread (largest clusters are down-sampled toward the mean;
    // clusters at/below the mean keep everything)
    val before = out.map(_.getAs[Long]("n"))
    val after = out.map(_.getAs[Long]("n_kept")).filter(_ > 0)
    assert(after.nonEmpty)
    val spreadBefore = before.max.toDouble / before.min
    val spreadAfter = after.max.toDouble / after.min
    info(s"cluster-size spread: $spreadBefore -> $spreadAfter")
    assert(spreadAfter <= spreadBefore * 1.05 + 1e-9,
      s"rebalance widened the spread: $spreadBefore -> $spreadAfter")
  }

  test("IVF index incremental add equals batch assignment; search unchanged") {
    val emb = Tables.embeddings(spark, sfDir)
    val old = emb.filter(col("vec_id") % 5 =!= 0)
    val fresh = emb.filter(col("vec_id") % 5 === 0)
    // one trained model, two index builds: batch(all) vs build(old)+add(fresh)
    val cents = KMeansVec.centroidsDF(spark, KMeansVec.train(old, k = 10, iters = 3))
    val pBatch = tmpDir("ivf-batch"); val pIncr = tmpDir("ivf-incr")
    VectorIndex.buildWith(emb, pBatch, cents)
    VectorIndex.buildWith(old, pIncr, cents)
    VectorIndex.add(spark, pIncr, fresh)
    // identical inverted lists...
    val la = spark.read.parquet(s"$pBatch/lists")
      .select("vec_id", "cent_id").collect().map(_.toString).sorted.toSeq
    val lb = spark.read.parquet(s"$pIncr/lists")
      .select("vec_id", "cent_id").collect().map(_.toString).sorted.toSeq
    assert(la == lb && la.nonEmpty)
    // ...and identical search results after the append
    val probes = emb.filter(col("vec_id") < 5)
    val sa = VectorIndex.search(spark, pBatch, probes, nprobe = 4, k = 3)
      .collect().map(_.toString).sorted.toSeq
    val sb = VectorIndex.search(spark, pIncr, probes, nprobe = 4, k = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(sa == sb && sa.nonEmpty)
  }

  test("q35 LSH ANN neighbors are a subset of valid ids with sane cosine") {
    val rows = ScaleOps.queries("q35_ann_lsh")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("cosine") <= 1.000001)
      assert(r.getAs[Long]("probe_id") != r.getAs[Long]("neighbor_id"))
    }
  }

  test("q34 brute-force ANN returns k=3 per probe, self excluded") {
    val rows = VectorOps.queries("q34_ann_cosine")(spark, sfDir).collect()
    val byProbe = rows.groupBy(_.getAs[Long]("probe_id"))
    assert(byProbe.size == 5)
    byProbe.values.foreach(g => assert(g.length == 3))
  }

  test("simhash separates near-dups from the population") {
    // simhash can't guarantee hamming<=3 for trigram near-dups (a few
    // changed words flip near-zero bit votes), but planted dups must
    // sit FAR below the population's mean hamming distance
    val fp = ScaleOps.queries("q33_simhash")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(fp(a) ^ fp(b))
    val planted = TextOps.queries("q31_ngram_jaccard")(spark, sfDir)
      .filter(col("jaccard") > 0.95)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(planted.nonEmpty)
    val ids = fp.keys.toSeq.sorted
    val popMean = (for (i <- ids.indices; j <- (i + 1) until ids.size)
      yield ham(ids(i), ids(j))).sum.toDouble / (ids.size * (ids.size - 1) / 2)
    val dupMean = planted.map { case (a, b) => ham(a, b) }.sum.toDouble / planted.length
    assert(dupMean < popMean / 2, s"dupMean=$dupMean popMean=$popMean")
  }

  test("q43_simhash_pairs equals the brute-force hamming<=3 pair set " +
      "(4-band pigeonhole is exact, not just a candidate filter)") {
    // at hamming <= 3, 3 differing bits cannot touch all 4 16-bit
    // bands, so every qualifying pair shares an identical band and the
    // band join loses NOTHING; the first-collision filter then keeps
    // exactly one copy. So q43's output must EQUAL the all-pairs scan.
    val fp = ScaleOps.queries("q33_simhash")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = fp.keys.toSeq.sorted
    val brute = (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      h = java.lang.Long.bitCount(fp(ids(i)) ^ fp(ids(j))) if h <= 3
    } yield (ids(i), ids(j), h)).toSet
    val got = ScaleOps.queries("q43_simhash_pairs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute, s"q43=${got.size} brute=${brute.size}")
    got.foreach { case (a, b, h) => assert(a < b && h >= 0 && h <= 3) }
  }

  test("q116_bpe_fertility: per-source fertility >= 1, token/word sums " +
      "reconcile, deterministic, and merges only lower fertility") {
    import graft.operators.BpeTrainer
    val docs = Tables.documents(spark, sfDir)
    val out = TextOps.queries("q116_bpe_fertility")(spark, sfDir)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("fertility"))).sortBy(_._1)
    assert(out.nonEmpty)
    out.foreach { case (src, nd, nw, nt, f) =>
      assert(nd > 0 && nw > 0, src)
      // a word is at least one token and fertility is its mean ratio
      assert(nt >= nw, s"$src: n_tokens $nt < n_words $nw")
      assert(f >= 1.0, s"$src: fertility $f < 1")
      assert(math.abs(f - nt.toDouble / nw) < 1e-5, src)
    }
    assert(out.map(_._2).sum == docs.count())
    // deterministic: training + segmentation re-run bit-identically
    val again = TextOps.queries("q116_bpe_fertility")(spark, sfDir)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("fertility"))).sortBy(_._1)
    assert(again.sameElements(out))
    // monotone in vocab: q116's 40-merge fertility is <= the 0-merge
    // (pure character) fertility for every source — merges only join
    val merges = BpeTrainer.train(docs, numMerges = 40, maxWords = 2000)
    def fert(ms: Seq[(String, String)]) = BpeTrainer.segment(docs, ms)
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
      .groupBy("source")
      .agg((sum(col("n_tokens")).cast("double") / sum(col("n_words")))
        .as("f"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val f40 = fert(merges); val f0 = fert(Nil)
    f40.foreach { case (src, f) =>
      assert(f <= f0(src) + 1e-12, s"$src: 40-merge $f > 0-merge ${f0(src)}")
    }
  }

  test("BPE trainer: classic corpus learns the canonical merges, " +
      "deterministic, fertility falls with vocab") {
    import spark.implicits._
    import graft.operators.BpeTrainer
    // the Sennrich et al. example dictionary: low x5, lower x2,
    // newest x6, widest x3
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val merges = BpeTrainer.train(docs, numMerges = 6)
    // (e,s) count 9 ties (s,t</w>) 9 -> lexicographic pick; then the
    // merged es meets t</w> 9 times; then (l,o) 7
    assert(merges.take(3) == Seq(("e", "s"), ("es", "t</w>"), ("l", "o")),
      merges.toString)
    // deterministic under repartitioning
    assert(BpeTrainer.train(docs.repartition(7), numMerges = 6) == merges)
    // fertility (tokens per word) is monotone non-increasing in the
    // merge count, and the full table beats the char baseline
    val f = (0 to 6 by 2).map { k =>
      BpeTrainer.segment(docs, merges.take(k))
        .head.getAs[Double]("fertility")
    }
    assert(f.zip(f.tail).forall { case (a, b) => b <= a }, f.toString)
    assert(f.last < f.head)
    // segmenting an unseen word still terminates and counts sensibly
    val probe = Seq((2L, "lowest")).toDF("doc_id", "text")
    val seg = BpeTrainer.segment(probe, merges).head
    assert(seg.getAs[Long]("n_words") == 1L &&
      seg.getAs[Long]("n_tokens") >= 1L)
    // the sample bound keeps training runnable on a truncated dict
    assert(BpeTrainer.train(docs, numMerges = 3, maxWords = 2).nonEmpty)
    // tokenizer-scale merges with an UNBOUNDED dictionary would run
    // one distributed job per merge — refused loudly, not entered
    val e = intercept[IllegalArgumentException] {
      BpeTrainer.train(docs, numMerges = 30000)
    }
    assert(e.getMessage.contains("maxWords"), e.getMessage)
  }

  test("BPE driver-local loop: bit-identical to the distributed path, " +
      "job count independent of numMerges") {
    import spark.implicits._
    import graft.operators.BpeTrainer
    // vocabulary (10 distinct words) well under maxWords ⇒ the bounded
    // and unbounded paths see the SAME dictionary; the learned merge
    // table must be bit-identical between the distributed loop
    // (maxWords=0) and the driver-local loop (maxWords>0)
    val words = Seq("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3,
      "newer" -> 4, "lowest" -> 1, "wide" -> 2, "new" -> 7,
      "widen" -> 2, "slow" -> 3)
    val text = words.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    val docs = Seq((1L, text), (2L, text.reverse.reverse)).toDF("doc_id", "text")
    val dist = BpeTrainer.train(docs, numMerges = 12)
    val local = BpeTrainer.train(docs, numMerges = 12, maxWords = 1000)
    assert(local == dist, s"local=$local dist=$dist")
    // and under repartitioning
    assert(BpeTrainer.train(docs.repartition(5), numMerges = 12,
      maxWords = 1000) == local)
    // job-count independence: training with 3× the merges must not
    // schedule more jobs (the bounded path runs ONE dictionary
    // aggregate + collect; merges are driver-local)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    def countJobs(numMerges: Int): Int = {
      spark.sparkContext.addSparkListener(listener)
      jobs.set(0)
      try {
        BpeTrainer.train(docs, numMerges, maxWords = 1000)
        // listener events post asynchronously — poll until stable
        var last = -1
        var same = 0
        while (same < 3) {
          Thread.sleep(100)
          val now = jobs.get()
          if (now == last) same += 1 else { same = 0; last = now }
        }
        jobs.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val j4 = countJobs(4)
    val j12 = countJobs(12)
    assert(j12 <= j4 + 1, s"j4=$j4 j12=$j12: job count grew with merges")
  }

  test("unigram-LM trainer: deterministic across layouts, Viterbi picks " +
      "the highest-probability segmentation, coverage floor holds, " +
      "encode shares packSequences with BPE") {
    import spark.implicits._
    import graft.operators.{BpeTrainer, UnigramTrainer}
    val text = (Seq.fill(8)("lowest") ++ Seq.fill(6)("lower") ++
      Seq.fill(7)("newest") ++ Seq.fill(5)("widest") ++
      Seq.fill(4)("news")).mkString(" ")
    val docs = Seq((1L, text), (2L, "lowest news wide"),
      (3L, "newest lower est")).toDF("doc_id", "text")
    val model = UnigramTrainer.train(docs, vocabSize = 30, maxWords = 1000)
    // vocab-size contract: at most vocabSize pieces (the char floor
    // can exceed it only when the alphabet itself does)
    val chars = docs.collect().flatMap(_.getString(1).split("\\s+"))
      .flatMap(_.toSeq).map(_.toString).toSet
    assert(model.length <= math.max(30, chars.size))
    // coverage floor: every training character is a piece
    val pieceSet = model.map(_._1).toSet
    assert(chars.subsetOf(pieceSet), s"missing chars: ${chars -- pieceSet}")
    // multi-char pieces survive EM (the common suffix 'est' family)
    assert(model.exists(_._1.length > 1), "no multi-char pieces learned")
    // determinism: layout never changes the learned model
    val m7 = UnigramTrainer.train(docs.repartition(7), vocabSize = 30,
      maxWords = 1000)
    val m1 = UnigramTrainer.train(docs.coalesce(1), vocabSize = 30,
      maxWords = 1000)
    assert(m7.toSeq == m1.toSeq && m7.toSeq == model.toSeq)
    // Viterbi against a hand model: "abc" as one piece beats "ab"+"c"
    val hand = Map("abc" -> -1.0, "ab" -> -1.0, "c" -> -1.0,
      "a" -> -3.0, "b" -> -3.0)
    assert(UnigramTrainer.viterbi("abc", hand, 8) == Vector("abc"))
    assert(UnigramTrainer.viterbi("abca", hand, 8) ==
      Vector("abc", "a"))
    // encode: zero OOV on the training corpus; unseen char -> unk
    val vt = UnigramTrainer.vocab(model)
    assert(vt.head == ("<unk>", 0))
    assert(vt.map(_._2).toSeq == (0 until vt.length))
    val enc = UnigramTrainer.encode(docs, model, vt)
    val encRows = enc.collect().map(r =>
      (r.getLong(0), r.getSeq[Int](1), r.getLong(2), r.getLong(3)))
    encRows.foreach { case (id, ids, n, oov) =>
      assert(ids.length.toLong == n && oov == 0L, s"doc $id")
      assert(ids.forall(i => i > 0 && i < vt.length))
    }
    val probe = Seq((9L, "low élow")).toDF("doc_id", "text")
    val pe = UnigramTrainer.encode(probe, model, vt).head
    assert(pe.getAs[Long]("n_oov") >= 1L)
    assert(pe.getSeq[Int](1).contains(UnigramTrainer.UnkId))
    // fertility sanity: at most character-level, and not above BPE's
    // by more than 2x on this corpus (both learn the 'est' family)
    val seg = UnigramTrainer.segment(docs, model)
      .agg(sum("n_tokens"), sum("n_words")).head
    val fert = seg.getLong(0).toDouble / seg.getLong(1)
    val merges = BpeTrainer.train(docs, numMerges = 12, maxWords = 1000)
    val bseg = BpeTrainer.segment(docs, merges)
      .agg(sum("n_tokens"), sum("n_words")).head
    val bfert = bseg.getLong(0).toDouble / bseg.getLong(1)
    val charFert = docs.collect().flatMap(_.getString(1).split("\\s+"))
      .map(_.length).sum.toDouble /
      docs.collect().flatMap(_.getString(1).split("\\s+")).length
    assert(fert < charFert, s"unigram fertility $fert not below char level")
    assert(fert <= bfert * 2.0 + 1e-9,
      s"unigram fertility $fert way off BPE's $bfert")
    // SAME encode schema as BPE ⇒ packSequences packs it unchanged,
    // conservation holds
    val packed = BpeTrainer.packSequences(enc, 7)
    val flatIds = encRows.sortBy(_._1).flatMap(_._2).toSeq
    assert(packed.collect().sortBy(_.getLong(0))
      .flatMap(_.getSeq[Int](1)).toSeq == flatIds)
  }

  test("BPE encode + packSequences: ids match segment counts, OOV maps " +
      "to unk, packing conserves the token stream at every boundary") {
    import spark.implicits._
    import graft.operators.BpeTrainer
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text), (2L, "low lower new"), (3L, "widest low"))
      .toDF("doc_id", "text")
    val merges = BpeTrainer.train(docs, numMerges = 6, maxWords = 1000)
    val vt = BpeTrainer.vocab(docs, merges)
    // vocabulary shape: unk id 0, ids contiguous, merge products
    // present, first-occurrence dedup keeps it a bijection
    assert(vt.head == ("<unk>", 0))
    assert(vt.map(_._2).toSeq == (0 until vt.length))
    assert(vt.map(_._1).distinct.length == vt.length)
    val vm = vt.toMap
    merges.foreach { case (a, b) => assert(vm.contains(a + b), a + b) }
    // encode's token counts agree with segment's (same merge walk)
    val enc = BpeTrainer.encode(docs, merges, vt)
    val segN = BpeTrainer.segment(docs, merges)
      .select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val encRows = enc.collect().map(r => (r.getLong(0),
      r.getSeq[Int](1), r.getLong(2), r.getLong(3)))
    encRows.foreach { case (id, ids, n, oov) =>
      assert(ids.length.toLong == n && n == segN(id), s"doc $id")
      assert(oov == 0L, s"doc $id oov")
      assert(ids.forall(i => i > 0 && i < vt.length))
    }
    // an unseen character maps to unk and is counted
    val probe = Seq((9L, "low élow")).toDF("doc_id", "text")
    val pe = BpeTrainer.encode(probe, merges, vt).head
    assert(pe.getAs[Long]("n_oov") >= 1L)
    assert(pe.getSeq[Int](1).contains(BpeTrainer.UnkId))
    // packing: the concatenated stream in doc_id order, cut every L —
    // exact conservation, full sequences exactly L, one short tail
    val flat = encRows.sortBy(_._1).flatMap(_._2)
    // serial model for the doc-boundary columns: each doc's global
    // start in doc_id order; a sequence's expected (start-offset,
    // doc_id) chunks are the docs overlapping its [sL, (s+1)L) window
    val docSpans = encRows.sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, _, acc), (id, ids, _, _)) =>
        (id, acc, acc + ids.length) }.drop(1).filter(s => s._3 > s._2)
    for (l <- Seq(3, 7, 16)) {
      val packed = BpeTrainer.packSequences(enc, l)
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getLong(3),
          r.getSeq[Int](4), r.getSeq[Long](5)))
        .sortBy(_._1)
      assert(packed.flatMap(_._2).toSeq == flat.toSeq, s"L=$l stream")
      val sizes = packed.map(_._2.length)
      assert(sizes.init.forall(_ == l) &&
        sizes.last == (if (flat.length % l == 0) l else flat.length % l),
        s"L=$l sizes=${sizes.toSeq}")
      assert(packed.map(_._1).toSeq ==
        (0L until packed.length.toLong), s"L=$l seq ids")
      // doc_starts/doc_ids ≡ the serial model, per sequence
      packed.foreach { case (s, _, nDocs, starts, dids) =>
        val lo = s * l; val hi = lo + l
        val want = docSpans.filter(d => d._2 < hi && d._3 > lo)
          .map(d => ((math.max(d._2, lo) - lo).toInt, d._1))
        assert(starts.zip(dids).toSeq == want.toSeq,
          s"L=$l seq $s boundaries: got ${starts.zip(dids)} want $want")
        assert(nDocs == want.length.toLong, s"L=$l seq $s n_docs")
        assert(starts.headOption.forall(_ == 0),
          s"L=$l seq $s first chunk must start the sequence")
      }
    }
    // layout-independence: a different partitioning packs identically
    val p7 = BpeTrainer.packSequences(enc.repartition(7), 7)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1)
    val p1 = BpeTrainer.packSequences(enc.coalesce(1), 7)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1)
    assert(p7.toSeq == p1.toSeq)
    // n_docs: a sequence spanning a doc boundary credits both docs
    val packedAll = BpeTrainer.packSequences(enc, flat.length)
      .collect()
    assert(packedAll.length == 1 && packedAll.head.getLong(3) == 3L)
    // empty docs are skipped, not crashed on
    val withEmpty = BpeTrainer.encode(
      Seq((1L, "low low"), (2L, "")).toDF("doc_id", "text"), merges, vt)
    assert(BpeTrainer.packSequences(withEmpty, 4)
      .agg(sum(size(col("ids")))).head.getLong(0) ==
      withEmpty.agg(sum("n_tokens")).head.getLong(0))
    val e = intercept[IllegalArgumentException] {
      BpeTrainer.packSequences(enc, 0)
    }
    assert(e.getMessage.contains("seqLen"))
  }

  test("tokenizeAndPack: BPE trains on the train split only, packing " +
      "never straddles a split, grouped conservation holds") {
    import spark.implicits._
    import graft.operators.{BpeTrainer, CorpusPipeline}
    // 'q' appears ONLY in the val split — the tokenizer must not have
    // seen it (trained on train only), so it encodes as <unk>
    val rows = (1L to 8L).map(i =>
      (i, s"low lower newest widest tok$i", "s1", "train")) ++
      Seq((20L, "low qqq newest", "s1", "val"),
        (21L, "widest lower", "s2", "train"),
        (22L, "newest low low", "s2", "val"))
    val docs = rows.toDF("doc_id", "text", "source", "split")
    val (merges, vt, seqs) = CorpusPipeline.tokenizeAndPack(
      docs, numMerges = 6, maxWords = 1000, seqLen = 5L)
    assert(merges.nonEmpty && vt.head == ("<unk>", 0))
    assert(!vt.exists(_._1.startsWith("q")),
      "an eval-only character must not enter the vocabulary")
    val collected = seqs.collect().map(r => (r.getString(0),
      r.getString(1), r.getLong(2), r.getSeq[Int](3), r.getLong(4)))
    // per-(source, split) streams: contiguous seq ids from 0, all
    // full except each stream's tail
    collected.groupBy(t => (t._1, t._2)).foreach { case (g, ss) =>
      val sorted = ss.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (0L until ss.length.toLong), s"$g")
      assert(sorted.init.forall(_._4.length == 5), s"$g sizes")
    }
    // grouped conservation: each stream's sequence tokens equal its
    // docs' encoded tokens in doc_id order
    val enc = BpeTrainer.encode(docs, merges, vt)
      .join(docs.select("doc_id", "source", "split"), Seq("doc_id"))
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[String]("split"), r.getLong(0), r.getSeq[Int](1)))
    collected.groupBy(t => (t._1, t._2)).foreach { case (g, ss) =>
      val want = enc.filter(e => (e._1, e._2) == g)
        .sortBy(_._3).flatMap(_._4).toSeq
      val got = ss.sortBy(_._3).flatMap(_._4).toSeq
      assert(got == want, s"stream $g token stream diverged")
    }
    // the val-only 'qqq' word encoded through <unk>
    val valEnc = BpeTrainer.encode(
      docs.filter(col("doc_id") === 20L), merges, vt).head
    assert(valEnc.getAs[Long]("n_oov") >= 1L)
    // splitless frame: packs per source alone
    val noSplit = CorpusPipeline.tokenizeAndPack(
      docs.drop("split"), numMerges = 4, maxWords = 1000, seqLen = 7L)._3
    assert(noSplit.columns.toSeq ==
      Seq("source", "seq_id", "ids", "n_tokens", "n_docs",
        "doc_starts", "doc_ids"))
    assert(noSplit.count() > 0)
  }

  test("multimodal near-dup videos: perceptual frame-hash Jaccard finds the re-upload") {
    import spark.implicits._
    // A = 4 real PNG frames; B = A plus one appended frame (a
    // trailing-card re-upload: jaccard 4/5); C = unrelated frames.
    // Containers are real AVIs; the frame payloads stay PNG here so
    // the decode→re-encode identity assertion below is exact (the
    // demuxer hands payloads to the codec verbatim — ImageIO decodes
    // either; the corpus videoTable carries proper MJPEG/JPEG frames)
    def frame(seed: Long): Array[Byte] =
      operators.ImageCodec.encodePng(seed, 12, 10)
    def container(frames: Seq[Array[Byte]]): Array[Byte] =
      operators.AviCodec.encodeAvi(frames, 12, 10)
    val aF = (0 until 4).map(i => frame(1000L + i))
    val a = container(aF)
    val b = container(aF :+ frame(9900L))
    val c = container((10 until 14).map(i => frame(2000L + i)))
    val blobs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "payload")
    val pairs = operators.Multimodal
      .nearDupVideoPairs(blobs, t = 0.7, everyN = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getDouble(3)))
    assert(pairs.toSeq == Seq((1L, 2L, 4L, 0.8)),
      pairs.mkString(","))
    val kept = operators.Multimodal
      .dropNearDupVideos(blobs, t = 0.7, everyN = 1)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 3L)) // B dropped: smaller near-dup A exists
    // below the threshold nothing pairs and everything survives
    assert(operators.Multimodal
      .nearDupVideoPairs(blobs, t = 0.9, everyN = 1)
      .count() == 0)
    // perceptual, not byte-level: a RE-ENCODE of A's pixels (decode →
    // re-encode PNG) hashes identically, so the pair still surfaces
    val reenc = container(aF.map(f => operators.ImageCodec.toPng(
      operators.ImageCodec.decode(f))))
    val blobs2 = Seq((1L, a), (4L, reenc)).toDF("doc_id", "payload")
    assert(operators.Multimodal.nearDupVideoPairs(blobs2, t = 0.99, everyN = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 4L)))
    // the corpus video table: planted re-uploads (doc_id % 10 == 7)
    // pair with their predecessor at jaccard 1, deterministically
    val vids = operators.Multimodal.videoTable(spark, sfDir)
    val p1 = operators.Multimodal.nearDupVideoPairs(vids, 0.999).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = vids.select("doc_id").collect().map(_.getLong(0)).toSet
      .filter(b => b % 10 == 7).map(b => (b - 1, b)).toSeq.sorted
    assert(p1 == want, s"got $p1 want $want")
    val p2 = operators.Multimodal.nearDupVideoPairs(vids, 0.999).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(p1 == p2)
  }

  test("multimodal resize: real bilinear, decodes back to target dims, partition-invariant") {
    val blobs = operators.Multimodal.imageTable(spark, sfDir)
    val r1 = operators.Multimodal.resizeImages(blobs, 32, 24)
      .orderBy("doc_id").collect()
    val r2 = operators.Multimodal.resizeImages(blobs.repartition(5), 32, 24)
      .orderBy("doc_id").collect()
    assert(r1.length == blobs.count())
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getAs[Array[Byte]](3).toSeq)
    assert(r1.map(key).toSeq == r2.map(key).toSeq)
    r1.foreach { r =>
      // the resized payload is a REAL PNG: decode it and check dims
      val img = operators.ImageCodec.decode(r.getAs[Array[Byte]]("payload"))
      assert(img.getWidth == 32 && img.getHeight == 24)
    }
    // real demux 1->N with frame sampling: indices stride everyN
    val vids = operators.Multimodal.videoTable(spark, sfDir)
    val frames = operators.Multimodal.demuxFrames(vids, everyN = 2).collect()
    assert(frames.nonEmpty)
    val byDoc = frames.groupBy(_.getLong(0))
    assert(byDoc.values.exists(_.length > 1))
    frames.foreach { f =>
      assert(f.getInt(1) % 2 == 0)
      // every sampled frame is a decodable PNG
      operators.ImageCodec.decode(f.getAs[Array[Byte]](2))
    }
  }

  test("multimodal image embeddings feed the vector stack unchanged") {
    val blobs = Multimodal.imageTable(spark, sfDir).limit(100)
    val emb = Multimodal.embedImages(blobs)
    // deterministic + partition-invariant
    val a = emb.collect().map(_.toString).sorted.toSeq
    val b = Multimodal.embedImages(blobs.repartition(7))
      .collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
    // unit-L2-normalized
    val norms = emb.select(
      graft.functions.GraftFunctions.dotProduct(col("embedding"), col("embedding")))
      .collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-5))
    // the embeddings-table schema: VectorIndex consumes it directly
    val dir = tmpDir("mmidx") + "/idx"
    VectorIndex.buildWith(emb, dir,
      KMeansVec.centroidsDF(spark, KMeansVec.train(emb, k = 4, iters = 2)))
    val hits = VectorIndex.search(spark, dir,
      emb.filter(col("vec_id") < 3), nprobe = 2, k = 3)
    assert(hits.groupBy("probe_id").count().collect().forall(_.getLong(1) == 3))
    // planted byte-identical near-dups land at cosine 1 with their
    // original — the real content feature separates dup from non-dup
    val byId = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    byId.keys.filter(id => id % 10 == 7 && byId.contains(id - 1)).foreach { id =>
      val d = byId(id).zip(byId(id - 1)).map { case (x, y) => x * y }.sum
      assert(math.abs(d - 1.0) < 1e-6, s"planted dup $id cosine $d")
    }
  }

  test("multimodal real decode: dims/channels match the corpus contract") {
    val blobs = operators.Multimodal.imageTable(spark, sfDir)
    val f1 = operators.Multimodal.decodeImages(blobs).orderBy("doc_id").collect()
    val f2 = operators.Multimodal.decodeImages(blobs.repartition(7))
      .orderBy("doc_id").collect()
    assert(f1.length == blobs.count())
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq)
    f1.foreach { r =>
      val seed = operators.Multimodal.imageSeed(r.getLong(0))
      assert(r.getAs[Int]("width") == operators.Multimodal.imgW(seed))
      assert(r.getAs[Int]("height") == operators.Multimodal.imgH(seed))
      assert(r.getAs[Int]("channels") == 3)
    }
    // q268's pair set IS the planted set at this sf too (the oracle
    // pins sf0.01; this pins the tiny-sf shape the thresholds can miss)
    val pairs = Multimodal.queries("q268_phash_dups")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val ids = blobs.select("doc_id").collect().map(_.getLong(0)).toSet
    val want = ids.filter(b => b % 10 == 7 && ids.contains(b - 1))
      .map(b => (b - 1, b)).toSeq.sorted
    assert(pairs == want)
  }

  test("encodePngReencoded: dHash differs from the base by exactly the " +
      "requested bit count, independently recomputed") {
    for (seed <- Seq(3L, 41L, 777L); flips <- 1 to 3) {
      val w = operators.Multimodal.imgW(seed)
      val h = operators.Multimodal.imgH(seed)
      val base = operators.ImageCodec.decode(
        operators.ImageCodec.encodePng(seed, w, h))
      val re = operators.ImageCodec.decode(
        operators.ImageCodec.encodePngReencoded(seed, w, h, flips))
      val d = java.lang.Long.bitCount(
        operators.ImageCodec.dHash64(base) ^ operators.ImageCodec.dHash64(re))
      assert(d == flips, s"seed=$seed flips=$flips got hamming $d")
      assert(re.getWidth == 9 && re.getHeight == 8)
    }
  }

  test("q278: hamming-banded pair set equals brute force AND the " +
      "planted contract (both dup classes) at this sf") {
    val ph = operators.Multimodal.imageHashes(
      operators.Multimodal.imageTableR(spark, sfDir))
    val hs = ph.collect().map(r => (r.getLong(0), r.getLong(1)))
    // brute-force reference over all pairs
    val brute = (for {
      (a, fa) <- hs; (b, fb) <- hs if a < b
      d = java.lang.Long.bitCount(fa ^ fb) if d <= 3
    } yield (a, b, d)).sorted.toSeq
    val got = operators.Multimodal.hammingNearDupPairs(ph)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sorted.toSeq
    assert(got == brute, "banded join must equal brute force exactly")
    // ...and brute force IS the planted contract: ≡7 exact twins at
    // hamming 0, ≡3 perturbed re-encodes at reencodeFlips(id)
    val ids = hs.map(_._1).toSet
    val want = ids.filter(b => b % 10 == 7 && ids.contains(b - 1))
      .map(b => (b - 1, b, 0)) ++
      ids.filter(b => b % 10 == 3 && ids.contains(b - 1))
        .map(b => (b - 1, b, operators.Multimodal.reencodeFlips(b)))
    assert(got == want.toSeq.sorted, "pair set must be exactly the plant")
    assert(got.exists(_._3 == 0) && got.exists(_._3 > 0),
      "both dup classes must be present for the test to mean anything")
  }

  test("hammingHistoryMatches: flipped-bit re-uploads match history " +
      "within the band radius; 4-bit strangers do not") {
    import spark.implicits._
    val hist = Seq(0x0123456789abcdefL, 0x7777000011112222L)
      .toDF("bfp_hist")
    // flip k low bits of the first history fp: k<=3 matches, k=4 not
    // (0xf flips 4 bits of ...ef -> ...e0)
    val batch = Seq(
      (1L, 0x0123456789abcdefL ^ 1L), (2L, 0x0123456789abcdefL ^ 3L),
      (3L, 0x0123456789abcdefL ^ 7L), (4L, 0x0123456789abcdefL ^ 15L),
      (5L, 0x5555aaaa5555aaaaL)).toDF("doc_id", "bfp")
    val got = operators.Multimodal
      .hammingHistoryMatches(batch, hist)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("q99: temperature mixing is deterministic and boosts the tail sources") {
    import org.apache.spark.sql.functions._
    val a = graft.operators.TextOps.queries("q99_temperature_mix")(spark, sfDir)
    val b = graft.operators.TextOps.queries("q99_temperature_mix")(spark, sfDir)
    val ra = a.collect().map(_.getLong(0)).sorted.toSeq
    assert(ra == b.collect().map(_.getLong(0)).sorted.toSeq)
    assert(ra.nonEmpty && ra.distinct.size == ra.size)
    // alpha = 0.3 flattens: the sampled share of the LARGEST source is
    // below its corpus share (head suppressed), relative to tokens
    val toks = Tables.documents(spark, sfDir)
      .select(col("source"), size(split(trim(col("text")), "\\s+"))
        .cast("long").as("n"))
    val corpus = toks.groupBy("source").agg(sum("n").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = a.groupBy("source").agg(sum("n_tokens").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val top = corpus.maxBy(_._2)._1
    val corpusShare = corpus(top).toDouble / corpus.values.sum
    val sampleShare = sampled.getOrElse(top, 0L).toDouble / sampled.values.sum
    assert(sampleShare < corpusShare,
      s"head source $top: sample share $sampleShare !< corpus $corpusShare")
  }

  test("q108: semantic dedup keeps no within-cluster pair above tau " +
      "and every drop has a smaller kept-or-dropped witness") {
    import org.apache.spark.sql.functions._
    val tau = 0.4
    val out = graft.operators.ScaleOps.queries("q108_semantic_dedup")(spark, sfDir)
    val out2 = graft.operators.ScaleOps.queries("q108_semantic_dedup")(spark, sfDir)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.map(_._1).distinct.length == rows.length && rows.nonEmpty)
    assert(rows.sortBy(_._1).sameElements(
      out2.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .sortBy(_._1)), "training/assignment must be deterministic")
    // exact within-cluster cosines, driver-side (sf0.001 is tiny)
    val emb = Tables.embeddings(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cosine(x: Array[Double], y: Array[Double]): Double = {
      val (d, nx, ny) = x.indices.foldLeft((0.0, 0.0, 0.0)) {
        case ((d, nx, ny), i) => (d + x(i) * y(i), nx + x(i) * x(i), ny + y(i) * y(i))
      }
      d / math.sqrt(nx * ny)
    }
    val byCluster = rows.groupBy(_._2)
    byCluster.values.foreach { cl =>
      val kept = cl.filter(_._3).map(_._1).sorted
      for (i <- kept.indices; j <- (i + 1) until kept.length)
        assert(cosine(emb(kept(i)), emb(kept(j))) < tau,
          s"kept pair ${kept(i)},${kept(j)} above tau")
      // greedy policy: a dropped vector has a SMALLER in-cluster
      // neighbor at >= tau (kept or itself dropped — the batch policy)
      cl.filterNot(_._3).foreach { case (v, _, _) =>
        val ids = cl.map(_._1)
        assert(ids.exists(u => u < v && cosine(emb(u), emb(v)) >= tau),
          s"dropped $v has no smaller witness")
      }
    }
    // the screen actually fires on this data
    assert(rows.exists(!_._3), "no duplicates dropped — tau too high for the data?")
  }

  test("DsirView: batch-folded model is bit-identical to scratch; " +
      "full-fold score reproduces q106") {
    import org.apache.spark.sql.functions._
    import graft.operators.DsirView
    val root = tmpDir("dsirview") + "/m"
    val docs = Tables.documents(spark, sfDir)
    // fold in 3 uneven batches (order-independence is the contract)
    Seq(docs.filter(col("doc_id") % 3 === 2),
        docs.filter(col("doc_id") % 3 === 0),
        docs.filter(col("doc_id") % 3 === 1))
      .foreach(b => DsirView.update(spark, root, b))
    // maintained counts == one-shot counts, bit for bit
    val scratch = tmpDir("dsirscratch") + "/m"
    DsirView.update(spark, scratch, docs)
    val a = DsirView.model(spark, root).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val b = DsirView.model(spark, scratch).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(a == b && a.nonEmpty)
    // scoring the corpus against the fully-folded model == q106
    val got = DsirView.score(spark, root, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val want = graft.operators.TextOps.queries("q106_dsir_weights")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted.toSeq
    assert(got == want)
    // a doc with vocabulary the model has never seen still scores
    // (every token falls to the smoothed unseen ratio, no drop)
    import spark.implicits._
    val novel = Seq((999999L, "zzqx qxzz zzqx", "en", "srcX", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val s = DsirView.score(spark, root, novel).collect()
    assert(s.length == 1 && s.head.getLong(1) == 3L)
    // tiny model (a handful of buckets) + disjoint-vocab probe: every
    // probe token takes the UNSEEN-bucket smoothed ratio — the score
    // must exist and be finite, not empty (the inner-join trap)
    val tiny = tmpDir("dsirtiny") + "/m"
    DsirView.update(spark, tiny,
      Seq((1L, "alpha beta", "en", "s", 10L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val s2 = DsirView.score(spark, tiny, novel).collect()
    assert(s2.length == 1 && !s2.head.getDouble(2).isNaN)
  }

  test("q106: DSIR weights separate the target slice from the rest") {
    import org.apache.spark.sql.functions._
    val w = graft.operators.TextOps.queries("q106_dsir_weights")(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang")
    val byLang = w.join(docs, "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg("dsir_logw")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // the importance weight log(p_en/p_raw) must rank the target
    // slice above the non-target mean — otherwise the model learned
    // nothing and selection would be noise
    assert(byLang(true) > byLang(false),
      s"en mean ${byLang(true)} !> other mean ${byLang(false)}")
    // weights are per-doc total log-ratios: finite, one row per doc
    val n = w.count()
    assert(n == docs.count() && w.select("doc_id").distinct().count() == n)
  }

  test("q139: exactly the pairs shipping a strict majority of the " +
      "part's 1995 volume, share consistent") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.Relational
      .queries("q139_dominant_supplier")(spark, sfDir).collect()
    // brute force from the fact table
    val l = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      .select("l_partkey", "l_suppkey", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val perPair = l.groupBy(t => (t._1, t._2))
      .map { case (k, v) => k -> v.map(_._3).sum }
    val perPart = l.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val want = perPair.filter { case ((p, _), q) => q * 2 > perPart(p) }.keySet
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == want)
    got.foreach { r =>
      assert(r.getDouble(3) * 2 > r.getDouble(4), s"non-majority row $r")
      assert(math.abs(r.getDouble(5) - r.getDouble(3) / r.getDouble(4)) < 1e-5)
    }
  }

  test("q140: chi-square statistic matches a driver-side recomputation") {
    import org.apache.spark.sql.functions._
    val row = graft.operators.Relational
      .queries("q140_chi_square")(spark, sfDir).head()
    val obs = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_orderpriority").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val segs = obs.keySet.map(_._1)
    val prios = obs.keySet.map(_._2)
    val n = obs.values.sum.toDouble
    val rt = segs.map(s0 => s0 ->
      obs.collect { case ((s1, _), c) if s1 == s0 => c }.sum.toDouble).toMap
    val ct = prios.map(p0 => p0 ->
      obs.collect { case ((_, p1), c) if p1 == p0 => c }.sum.toDouble).toMap
    val chi2 = obs.map { case ((s0, p0), o) =>
      val e = rt(s0) * ct(p0) / n
      (o - e) * (o - e) / e
    }.sum
    assert(row.getLong(0) == obs.size.toLong)
    assert(row.getLong(1) == (segs.size - 1).toLong * (prios.size - 1))
    assert(math.abs(row.getDouble(2) - chi2) < 1e-3,
      s"chi2 ${row.getDouble(2)} != $chi2")
  }

  test("q141: Mann-Whitney U and tie-corrected z match a driver-side " +
      "midrank computation") {
    import org.apache.spark.sql.functions._
    val row = graft.operators.Relational
      .queries("q141_mannwhitney")(spark, sfDir).head()
    val vs = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD"))
      .select(col("o_totalprice"), col("c_mktsegment")).collect()
      .map(r => (r.getDouble(0), r.getString(1) == "AUTOMOBILE"))
    val sorted = vs.sortBy(_._1)
    // midranks: rows at equal value share the mean of their positions
    val ranks = scala.collection.mutable.Map.empty[Double, Double]
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      ranks(sorted(i)._1) = (i + 1 + j) / 2.0 // mean of ranks i+1..j
      i = j
    }
    val n1 = vs.count(_._2).toDouble
    val n2 = vs.length - n1
    val r1 = vs.filter(_._2).map(t => ranks(t._1)).sum
    val u1 = r1 - n1 * (n1 + 1) / 2
    val nn = n1 + n2
    val ties = sorted.groupBy(_._1).values
      .map(g => math.pow(g.length, 3) - g.length).sum
    val z = (u1 - n1 * n2 / 2) /
      math.sqrt(n1 * n2 / 12 * ((nn + 1) - ties / (nn * (nn - 1))))
    assert(row.getLong(0) == n1.toLong && row.getLong(1) == n2.toLong)
    assert(math.abs(row.getDouble(2) - u1) < 1e-4,
      s"u1 ${row.getDouble(2)} != $u1")
    assert(math.abs(row.getDouble(3) - z) < 1e-4,
      s"z ${row.getDouble(3)} != $z")
  }

  test("q143: RRF fuses the lexical and dense lists — scores bounded, " +
      "per-query top-10, rank order consistent") {
    val got = graft.operators.VectorOps
      .queries("q143_hybrid_rrf")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet == Set("q1", "q2", "q3"))
    byQ.values.foreach { rows =>
      assert(rows.length <= 10)
      val sorted = rows.sortBy(_._3)
      // scores non-increasing in rank; every score is a sum of at
      // most two reciprocal-rank terms, each ≤ 1/61
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a._4 >= b._4, s"rank order broke: $a then $b")
      case _ => }
      rows.foreach { r =>
        assert(r._4 > 0 && r._4 <= 2.0 / 61 + 1e-9, r.toString)
      }
    }
  }

  test("q145: A/B z-test partitions every customer once and matches a " +
      "driver-side pooled-variance recomputation") {
    import org.apache.spark.sql.functions._
    val row = graft.operators.Relational
      .queries("q145_ab_test")(spark, sfDir).head()
    val (na, xa, nb, xb) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(na + nb == Tables.customer(spark, sfDir).count(),
      "every customer lands in exactly one arm")
    assert(xa <= na && xb <= nb && xa + xb > 0)
    val p = (xa + xb).toDouble / (na + nb)
    val z = (xa.toDouble / na - xb.toDouble / nb) /
      math.sqrt(p * (1 - p) * (1.0 / na + 1.0 / nb))
    assert(math.abs(row.getDouble(4) - z) < 1e-5,
      s"z ${row.getDouble(4)} != $z")
  }

  test("q146: revenue lift deciles cover all customers, shares sum to 1, " +
      "cumulative share is monotone with top-decile dominance") {
    val rows = graft.operators.Relational
      .queries("q146_revenue_lift")(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    val nCust = Tables.orders(spark, sfDir)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nCust)
    assert(math.abs(rows.last.getDouble(4) - 1.0) < 1e-6,
      "cumulative share must end at 1")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(4) < b.getDouble(4) + 1e-9)
      assert(a.getDouble(3) >= b.getDouble(3) - 1e-6,
        "revenue share must fall with decile")
    case _ => }
    assert(rows.head.getDouble(3) > 0.1,
      "the top decile must out-earn a uniform split")
  }

  test("QualityModel: the trained classifier separates the labeled " +
      "slice, scores deterministically with zero UDFs, and gates the " +
      "pipeline") {
    import org.apache.spark.sql.functions._
    val root = tmpDir("qmodel") + "/m"
    val docs = Tables.documents(spark, sfDir)
    // the GPT-3 weak-label setup: positives = the curated corpus,
    // negatives = crawl-like junk (deterministic noise tokens)
    val noiseText = concat_ws(" ", transform(sequence(lit(1), lit(30)),
      i => concat(lit("nz"), substring(md5(concat(
        col("doc_id").cast("string"), lit("_"), i.cast("string"))), 1, 6))))
    val neg = docs.select((col("doc_id") + 1000000L).as("doc_id"),
      noiseText.as("text"), lit("xx").as("lang"), lit("noise").as("source"),
      col("n_chars"))
    val labeled = docs.withColumn("label", lit(1.0))
      .unionByName(neg.withColumn("label", lit(0.0)))
    graft.operators.QualityModel.train(labeled, root)
    val mixed = docs.unionByName(neg)
    val scored = graft.operators.QualityModel.score(spark, root, mixed)
    val joined = scored.join(mixed.select("doc_id", "source"), "doc_id")
    val m = joined.groupBy(col("source") === "noise")
      .agg(avg("quality_p")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(m(false) > m(true) + 0.5,
      s"corpus mean ${m(false)} !>> noise mean ${m(true)}")
    val acc = joined.filter(
      (col("quality_p") >= 0.5) === (col("source") =!= "noise")).count()
      .toDouble / mixed.count()
    assert(acc >= 0.9, s"train-set accuracy $acc < 0.9")
    // deterministic scoring; every doc scored exactly once
    assert(scored.count() == mixed.count())
    assert(scored.collect().map(_.toString).sorted.toSeq ==
      graft.operators.QualityModel.score(spark, root, mixed)
        .collect().map(_.toString).sorted.toSeq)
    // BIT-identical under any partition layout: the per-doc fold runs
    // through the exact decimal accumulator, so accumulation order
    // (which repartitioning scrambles) cannot flip a gate decision
    assert(graft.operators.QualityModel.score(spark, root,
        mixed.repartition(7)).collect().map(_.toString).sorted.toSeq ==
      graft.operators.QualityModel.score(spark, root,
        mixed.repartition(131)).collect().map(_.toString).sorted.toSeq,
      "quality_p must be bit-stable across partition layouts")
    // the 100-TB scoring path: broadcast join, no UDFs, no ml classes
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.toLowerCase.contains("batchevalpython") &&
      !plan.contains("ScalaUDF"), "scoring must stay UDF-free")
    // pipeline gate composes: exactly the above-threshold docs pass in
    val (_, rep) = graft.operators.CorpusPipeline.run(mixed,
      graft.operators.CorpusPipeline.Config(minQuality = 0.0,
        langKeepRates = Map("en" -> 1.0, "de" -> 1.0, "fr" -> 1.0,
          "es" -> 1.0, "zh" -> 1.0, "xx" -> 1.0), defaultKeepRate = 1.0,
        modelGate = Some((root, 0.5))))
    val wantKept = scored.filter(col("quality_p") >= 0.5).count()
    assert(rep.afterModelGate.contains(wantKept),
      s"gate kept ${rep.afterModelGate} vs scored-above $wantKept")
  }

  test("q149/q150: burstiness and lognormal length fit match " +
      "driver-side moment computations") {
    import org.apache.spark.sql.functions._
    // q149: Fano factor per event type
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / (86400L * 1000000L)).as("dy"))
      .groupBy("event_type", "dy").count().collect()
      .map(r => (r.getString(0), r.getLong(2)))
    val want149 = daily.groupBy(_._1).map { case (t, rows) =>
      val cs = rows.map(_._2.toDouble)
      val n = cs.length
      val mean = cs.sum / n
      val v = cs.map(c => (c - mean) * (c - mean)).sum / n
      t -> (n.toLong, v / mean)
    }
    val got149 = graft.operators.SessionOps
      .queries("q149_burstiness")(spark, sfDir).collect()
    assert(got149.length == want149.size)
    got149.foreach { r =>
      val (n, fano) = want149(r.getString(0))
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(3) - fano) < 1e-4,
        s"${r.getString(0)}: fano ${r.getDouble(3)} != $fano")
      assert(r.getDouble(3) > 0)
    }
    // q150: per-source lognormal (mu, sigma) of token counts
    val lens = Tables.documents(spark, sfDir)
      .select(col("source"),
        size(split(trim(col("text")), "\\s+")).as("n")).collect()
      .map(r => (r.getString(0), r.getInt(1)))
      .filter(_._2 > 0)
    val want150 = lens.groupBy(_._1).map { case (src, rows) =>
      val xs = rows.map(t => math.log(t._2.toDouble))
      val mu = xs.sum / xs.length
      val sg = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / xs.length)
      src -> (rows.length.toLong, mu, sg)
    }
    val got150 = graft.operators.TextOps
      .queries("q150_length_lognormal")(spark, sfDir).collect()
    assert(got150.length == want150.size)
    got150.foreach { r =>
      val (n, mu, sg) = want150(r.getString(0))
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - mu) < 1e-3 &&
        math.abs(r.getDouble(3) - sg) < 1e-3, r.toString)
    }
  }

  test("q147/q148: seasonality strength and CUSUM changepoint match " +
      "driver-side recomputations on the daily series") {
    import org.apache.spark.sql.functions._
    val daily = Tables.orders(spark, sfDir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice")).as("rev"), count(lit(1)).as("c"))
      .collect().map(r => (r.getDate(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1.getTime)
    // q147: variance ratio with day-of-week means removed
    val r147 = graft.operators.Relational
      .queries("q147_seasonality")(spark, sfDir).head()
    val revs = daily.map(_._2)
    val g = revs.sum / revs.length
    val dowOf = daily.map(t => (t._1.toLocalDate.getDayOfWeek, t._2))
    val dm = dowOf.groupBy(_._1).map { case (k, v) =>
      k -> v.map(_._2).sum / v.length }
    val varTot = revs.map(x => (x - g) * (x - g)).sum / revs.length
    val varRes = dowOf.map { case (k, x) =>
      (x - dm(k)) * (x - dm(k)) }.sum / revs.length
    assert(r147.getLong(0) == daily.length)
    assert(math.abs(r147.getDouble(3) - (1 - varRes / varTot)) < 1e-3,
      s"F ${r147.getDouble(3)} != ${1 - varRes / varTot}")
    assert(r147.getDouble(3) > 0 && r147.getDouble(3) < 1)
    // q148: the |CUSUM| peak day
    val r148 = graft.operators.Relational
      .queries("q148_changepoint")(spark, sfDir).head()
    val n = daily.map(_._3).sum.toDouble
    val mean = n / daily.length
    var cum = 0.0
    val s = daily.map { t => cum += t._3 - mean; math.abs(cum) }
    val best = s.max
    val bestDay = daily(s.indexOf(best))._1
    assert(r148.getDate(0).toLocalDate == bestDay.toLocalDate,
      s"day ${r148.getDate(0)} != $bestDay")
    assert(math.abs(r148.getDouble(1) - best) < 1e-4)
  }

  test("q144: Kruskal-Wallis H matches a driver-side midrank computation") {
    import org.apache.spark.sql.functions._
    val row = graft.operators.Relational
      .queries("q144_kruskal_wallis")(spark, sfDir).head()
    val vs = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_totalprice"), col("c_mktsegment")).collect()
      .map(r => (r.getDouble(0), r.getString(1)))
    val sorted = vs.map(_._1).sorted
    val ranks = scala.collection.mutable.Map.empty[Double, Double]
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j) == sorted(i)) j += 1
      ranks(sorted(i)) = (i + 1 + j) / 2.0
      i = j
    }
    val n = vs.length.toDouble
    val groups = vs.groupBy(_._2)
    val sumR2N = groups.values.map { g =>
      val r = g.map(t => ranks(t._1)).sum
      r * r / g.length
    }.sum
    val ties = sorted.toSeq.groupBy(identity).values
      .map(g => math.pow(g.length, 3) - g.length).sum
    val h = (12.0 / (n * (n + 1)) * sumR2N - 3 * (n + 1)) /
      (1.0 - ties / (n * n * n - n))
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == groups.size - 1L)
    assert(math.abs(row.getDouble(2) - h) < 1e-3,
      s"H ${row.getDouble(2)} != $h")
  }

  test("q142: per-source Zipf slope is the top-1000 log-log regression, " +
      "near -1 for natural-ish text") {
    val got = graft.operators.TextOps
      .queries("q142_zipf_slope")(spark, sfDir).collect()
    val nSources = Tables.documents(spark, sfDir)
      .select("source").distinct().count()
    assert(got.length == nSources, "one slope row per source")
    got.foreach { r =>
      val (n, slope) = (r.getLong(1), r.getDouble(2))
      assert(n > 0 && n <= 1000, s"rank cap violated: $r")
      // frequency is non-increasing in rank, so the fit cannot tilt up
      assert(slope < 0, s"non-negative Zipf slope: $r")
    }
  }
}
