package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.lakehouse.{Bucketing, VersionedTable}

/** `format("graft")`: the commit protocol as a registered Spark data
  * source — Catalyst-planned manifest file skipping (stats + blooms),
  * time travel options, MoR fallback, and the commit-protocol write
  * path. */
class GraftDataSourceSpec extends SparkSpec {

  private def scanOf(df: org.apache.spark.sql.DataFrame)
      : FileSourceScanExec = {
    def find(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        find(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        find(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(find)
    }
    val scans = find(df.queryExecution.executedPlan)
    assert(scans.size == 1, df.queryExecution.executedPlan.toString)
    scans.head
  }

  /** A 4-file range-clustered events table with stats+blooms on the
    * clustered key. */
  private def clusteredTable(prefix: String): String = {
    val root = tmpDir(prefix) + "/t"
    VersionedTable.commit(spark, root,
      statsCols = Seq("event_id", "user_id"),
      bloomCols = Seq("event_id")) { stage =>
      Bucketing.writeRangePartitioned(
        Tables.events(spark, sfDir), stage, "event_id", files = 4)
    }
    root
  }

  test("format(graft) read equals VersionedTable.read; SQL two-part name works") {
    val root = clusteredTable("dsrc-eq")
    val viaDs = spark.read.format("graft").load(root)
    val direct = VersionedTable.read(spark, root)
    assert(viaDs.schema == direct.schema)
    assert(viaDs.count() == direct.count())
    assert(viaDs.exceptAll(direct).isEmpty && direct.exceptAll(viaDs).isEmpty)
    // DataSourceRegister short name => SQL can read graft.`root` too
    val viaSql = spark.sql(s"SELECT count(*) AS n FROM graft.`$root`")
    assert(viaSql.head().getLong(0) == direct.count())
  }

  test("range filter prunes files at plan time inside FileSourceScanExec") {
    val root = clusteredTable("dsrc-prune")
    val all = spark.read.format("graft").load(root)
    val total = VersionedTable.currentFiles(spark, root).size
    assert(total == 4)
    // the clustered layout gives each file a disjoint event_id range:
    // a narrow range predicate must plan a 1-file scan
    val lo = all.agg(min("event_id")).head().getLong(0)
    val narrow = all.filter(col("event_id") === lo)
    val expected = Tables.events(spark, sfDir)
      .filter(col("event_id") === lo).count()
    assert(narrow.collect().length == expected && expected > 0)
    assert(scanOf(narrow).metrics("numFiles").value == 1L,
      scanOf(narrow).metadata.toString)
    // whole-table scan still reads all files
    val full = all.filter(col("user_id") >= 0L)
    full.collect()
    assert(scanOf(full).metrics("numFiles").value == total.toLong)
    // pruning composes through aggregates (AQE-wrapped plan); an
    // impossible range prunes EVERY file at plan time
    val agg = all.filter(col("event_id") < lo).agg(count("*").as("n"))
    assert(agg.collect().head.getLong(0) == 0L)
    assert(scanOf(agg).metrics("numFiles").value == 0L)
  }

  test("bloom skipping: equality on a scattered key prunes where ranges cannot") {
    val root = tmpDir("dsrc-bloom") + "/t"
    import spark.implicits._
    // interleaved keys: every file's [min,max] covers the full range,
    // so range stats alone keep all files — only the bloom can prune
    VersionedTable.commit(spark, root,
      statsCols = Seq("k"), bloomCols = Seq("k")) { stage =>
      (0L until 4000L).map(i => (i, s"v$i")).toDF("k", "v")
        .withColumn("part", pmod(col("k"), lit(4)))
        .repartition(4, col("part")).drop("part")
        .write.parquet(stage)
    }
    val all = spark.read.format("graft").load(root)
    val hit = all.filter(col("k") === 123L)
    assert(hit.collect().map(_.getString(1)).toSeq == Seq("v123"))
    val pruned = scanOf(hit).metrics("numFiles").value
    assert(pruned < 4, s"bloom should prune interleaved files, read $pruned")
    // absent key: bloom-negative everywhere (fpp permitting) — and
    // always correct
    val miss = all.filter(col("k") === 999999L)
    assert(miss.collect().isEmpty)
  }

  test("versionAsOf and tag time travel through the data source") {
    val root = tmpDir("dsrc-tt") + "/t"
    import spark.implicits._
    VersionedTable.init(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), keepVersions = 5)
    VersionedTable.tag(spark, root, "first")
    VersionedTable.appendDelta(spark, root, keepVersions = 5) { stage =>
      Seq((3L, "c")).toDF("id", "s").write.parquet(stage)
    }
    val head = spark.read.format("graft").load(root)
    assert(head.count() == 3)
    val v1 = spark.read.format("graft").option("versionAsOf", "1").load(root)
    assert(v1.count() == 2)
    val tagged = spark.read.format("graft").option("tag", "first").load(root)
    assert(tagged.count() == 2)
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("tag", "nope").load(root).count()
    }
  }

  test("MoR versions fall back correctly: DV + ED applied, skipping still sound") {
    val root = clusteredTable("dsrc-mor")
    val before = VersionedTable.read(spark, root).count()
    // positional delete of a sliver => version carries a DV sidecar
    VersionedTable.deleteWhere(spark, root, col("event_id") % 97 === 0)
    val direct = VersionedTable.read(spark, root)
    val viaDs = spark.read.format("graft").load(root)
    assert(viaDs.count() == direct.count() && direct.count() < before)
    assert(viaDs.exceptAll(direct).isEmpty && direct.exceptAll(viaDs).isEmpty)
    // filters + projection through the PrunedFilteredScan path
    val lo = direct.agg(min("event_id")).head().getLong(0)
    val got = viaDs.filter(col("event_id") === lo).select("event_id", "user_id")
    val want = direct.filter(col("event_id") === lo).select("event_id", "user_id")
    assert(got.collect().toSeq == want.collect().toSeq)
    // deleted keys stay invisible through the source
    assert(viaDs.filter(col("event_id") % 97 === 0).count() == 0)
  }

  test("write path: overwrite commits, append is an O(batch) delta with stats carried") {
    val root = tmpDir("dsrc-write") + "/t"
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.format("graft").option("statsCols", "id")
      .option("keepVersions", "5").mode("overwrite").save(root)
    assert(VersionedTable.currentVersion(spark, root).contains(1L))
    val v1Files = VersionedTable.currentFiles(spark, root)
    Seq((3L, "c")).toDF("id", "s")
      .write.format("graft").option("statsCols", "id")
      .option("keepVersions", "5").mode("append").save(root)
    assert(VersionedTable.currentVersion(spark, root).contains(2L))
    // append carried version 1's files by reference
    val v2Files = VersionedTable.currentFiles(spark, root)
    assert(v1Files.forall(v2Files.contains), s"$v1Files / $v2Files")
    val back = spark.read.format("graft").load(root)
    assert(back.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // stats landed in the manifest => skipping works on the new table
    assert(VersionedTable.manifestStats(spark, root, 2L).nonEmpty)
    intercept[IllegalStateException] {
      Seq((4L, "d")).toDF("id", "s")
        .write.format("graft").mode("errorifexists").save(root)
    }
  }

  test("null-aware skipping: IsNull keeps only null-bearing files, IsNotNull drops all-null files") {
    val root = tmpDir("dsrc-null") + "/t"
    import spark.implicits._
    VersionedTable.commit(spark, root, statsCols = Seq("v")) { stage =>
      // file A: all-null v; file B: no nulls — range partitioning on
      // id splits deterministically (hash repartition on a 2-value
      // key can land both groups in one reducer)
      Seq((1L, Option.empty[Long]), (2L, Option.empty[Long]),
        (3L, Option(30L)), (4L, Option(40L)))
        .toDF("id", "v").repartitionByRange(2, col("id"))
        .write.parquet(stage)
    }
    val all = spark.read.format("graft").load(root)
    val nn = all.filter(col("v").isNotNull)
    assert(nn.collect().length == 2)
    assert(scanOf(nn).metrics("numFiles").value == 1L)
    val isn = all.filter(col("v").isNull)
    assert(isn.collect().length == 2)
    assert(scanOf(isn).metrics("numFiles").value == 1L)
    // comparisons are null-rejecting: the all-null file is skippable
    val cmp = all.filter(col("v") > 0L)
    cmp.collect()
    assert(scanOf(cmp).metrics("numFiles").value == 1L)
  }

  test("SQL time travel: VERSION AS OF number and tag, TIMESTAMP AS OF commit time") {
    val root = tmpDir("dsrc-sqltt") + "/t"
    import spark.implicits._
    VersionedTable.init(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), keepVersions = 10)
    VersionedTable.tag(spark, root, "first")
    Thread.sleep(80)
    val tMid = System.currentTimeMillis()
    Thread.sleep(80)
    VersionedTable.appendDelta(spark, root, keepVersions = 10) { st =>
      Seq((3L, "c")).toDF("id", "s").write.parquet(st)
    }
    def n(sql: String): Long = spark.sql(sql).head().getLong(0)
    assert(n(s"SELECT count(*) FROM graft.`$root`") == 3)
    assert(n(s"SELECT count(*) FROM graft.`$root` VERSION AS OF 1") == 2)
    assert(n(s"SELECT count(*) FROM graft.`$root` VERSION AS OF 'first'") == 2)
    val mid = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(tMid))
    assert(n(s"SELECT count(*) FROM graft.`$root` TIMESTAMP AS OF '$mid'") == 2)
    // a timestamp before every retained commit fails loudly
    intercept[Exception] {
      spark.sql(
        s"SELECT count(*) FROM graft.`$root` TIMESTAMP AS OF '1999-01-01'")
    }
  }

  test("timestamp-typed skipping: a date-range filter prunes a time-clustered table") {
    val root = tmpDir("dsrc-ts") + "/t"
    VersionedTable.commit(spark, root, statsCols = Seq("ts")) { stage =>
      Bucketing.writeRangePartitioned(
        Tables.events(spark, sfDir), stage, "ts", files = 4)
    }
    val all = spark.read.format("graft").load(root)
    // the last file's open range: strictly above the 3rd file's max
    val cut = all.selectExpr("percentile(cast(ts as double), 0.9)")
      .head().getDouble(0)
    val cutTs = new java.sql.Timestamp((cut * 1000).toLong)
    val late = all.filter(col("ts") > lit(cutTs))
    val expected = Tables.events(spark, sfDir)
      .filter(col("ts") > lit(cutTs)).count()
    assert(late.collect().length == expected && expected > 0)
    // stat strings round-trip through the timestamp cast: only the
    // trailing file(s) can hold rows above the 90th percentile
    assert(scanOf(late).metrics("numFiles").value < 4,
      scanOf(late).metadata.toString)
    // string-literal comparison coerces and prunes the same way
    val none = all.filter(col("ts") < "1990-01-01 00:00:00")
    none.collect()
    assert(scanOf(none).metrics("numFiles").value == 0L)
  }

  test("append schema-drift guard: renamed/extra/retyped columns fail loudly") {
    val root = tmpDir("dsrc-drift") + "/t"
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "s")
      .write.format("graft").mode("overwrite").save(root)
    // extra column
    val e1 = intercept[IllegalArgumentException] {
      Seq((2L, "b", 1)).toDF("id", "s", "extra")
        .write.format("graft").mode("append").save(root)
    }
    assert(e1.getMessage.contains("schema drift"))
    // retyped column
    intercept[IllegalArgumentException] {
      Seq((2, "b")).toDF("id", "s")
        .write.format("graft").mode("append").save(root)
    }
    // same columns in another ORDER are fine (parquet resolves by name)
    Seq(("c", 3L)).toDF("s", "id")
      .write.format("graft").mode("append").save(root)
    assert(spark.read.format("graft").load(root).count() == 2)
    // nothing from the refused batches landed
    assert(VersionedTable.read(spark, root)
      .filter(col("id") === 2L).count() == 0)
  }

  test("graft_files TVF: the per-file skipping index as a relation") {
    val root = clusteredTable("dsrc-files")
    val df = spark.sql(s"SELECT * FROM graft_files('$root')")
    // 4 files x 2 stats columns
    assert(df.count() == 8)
    assert(df.select("file").distinct().count() == 4)
    val eid = df.filter(col("column") === "event_id")
    // range-clustered: min/max strings present and disjoint in order
    val ranges = eid.select("min", "max").collect()
      .map(r => (r.getString(0).toLong, r.getString(1).toLong)).sortBy(_._1)
    assert(ranges.length == 4 && ranges.forall { case (lo, hi) => lo <= hi })
    assert(ranges.sliding(2).forall {
      case Array((_, hi), (lo, _)) => hi < lo
      case _ => true
    })
    assert(df.filter(col("deleted") =!= 0L).isEmpty)
    // a MoR delete surfaces in the deleted column
    VersionedTable.deleteWhere(spark, root, col("event_id") % 101 === 0)
    val after = spark.sql(s"SELECT * FROM graft_files('$root')")
    assert(after.filter(col("deleted") > 0L).count() > 0)
    // rows stat still describes the PHYSICAL file
    assert(after.groupBy("file").agg(first("rows")).collect().nonEmpty)
  }
}
