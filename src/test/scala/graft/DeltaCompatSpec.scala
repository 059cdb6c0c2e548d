package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

import graft.sources.DeltaCompat

/** Read-only Delta Lake compatibility (r10 verdict item 6): the
  * `_delta_log` here is written BY HAND to the published protocol
  * spec (delta-io PROTOCOL.md) — not by Delta software — so these
  * tests pin OUR reading of the spec: add/remove replay, last-
  * metaData-wins schema evolution, partition-value attachment,
  * version time travel, Catalyst partition pruning of the unioned
  * scans, and loud rejection of the documented-unsupported features.
  */
class DeltaCompatSpec extends SparkSpec {

  /** Build a fixture table: real parquet data files + a hand-written
    * JSON commit log describing them. */
  private def fixtureTable(): String = {
    import spark.implicits._
    val root = tmpDir("deltafix")
    val d = s"$root/tbl"
    Files.createDirectories(Paths.get(s"$d/_delta_log"))
    // data files: two v0 files (partitions a/b), one v1 replacement
    // for partition a, one v2 file with the evolved schema
    // the protocol REQUIRES add.size to be the file's true byte size
    // (the reader plans splits from it, like Delta itself) — record it
    def writeOne(rows: Seq[(Long, Double)], rel: String): Long = {
      val tmp = s"$root/stage"
      rows.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.createDirectories(Paths.get(s"$d/$rel").getParent)
      Files.move(f.toPath, Paths.get(s"$d/$rel"))
      Files.size(Paths.get(s"$d/$rel"))
    }
    def writeOne3(rows: Seq[(Long, Double, String)], rel: String): Long = {
      val tmp = s"$root/stage"
      rows.toDF("id", "v", "tag").coalesce(1).write.mode("overwrite")
        .parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.createDirectories(Paths.get(s"$d/$rel").getParent)
      Files.move(f.toPath, Paths.get(s"$d/$rel"))
      Files.size(Paths.get(s"$d/$rel"))
    }
    val szF0a = writeOne(Seq((1L, 10.0), (2L, 20.0)), "k=a/f0a.parquet")
    val szF0b = writeOne(Seq((3L, 30.0)), "k=b/f0b.parquet")
    val szF1a = writeOne(Seq((4L, 40.0), (5L, 50.0)), "k=a/f1a.parquet")
    val szF2c = writeOne3(Seq((6L, 60.0, "x")), "k=c/f2c.parquet")

    val schemaV0 =
      """{\"type\":\"struct\",\"fields\":[""" +
        """{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},""" +
        """{\"name\":\"v\",\"type\":\"double\",\"nullable\":true,\"metadata\":{}},""" +
        """{\"name\":\"k\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""
    val schemaV2 =
      """{\"type\":\"struct\",\"fields\":[""" +
        """{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},""" +
        """{\"name\":\"v\",\"type\":\"double\",\"nullable\":true,\"metadata\":{}},""" +
        """{\"name\":\"tag\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}},""" +
        """{\"name\":\"k\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""

    def commit(v: Long, lines: Seq[String]): Unit =
      Files.writeString(Paths.get(f"$d/_delta_log/$v%020d.json"),
        lines.mkString("", "\n", "\n"))

    // v0: protocol + metaData + two adds (hand-written to PROTOCOL.md)
    commit(0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"fixture-0001","format":{"provider":"parquet","options":{}},"schemaString":"$schemaV0","partitionColumns":["k"],"configuration":{},"createdTime":1700000000000}}""",
      s"""{"add":{"path":"k=a/f0a.parquet","partitionValues":{"k":"a"},"size":$szF0a,"modificationTime":1700000000000,"dataChange":true}}""",
      s"""{"add":{"path":"k=b/f0b.parquet","partitionValues":{"k":"b"},"size":$szF0b,"modificationTime":1700000000000,"dataChange":true}}"""))
    // v1: compaction of partition a — remove f0a, add f1a
    commit(1, Seq(
      """{"commitInfo":{"operation":"WRITE"}}""",
      """{"remove":{"path":"k=a/f0a.parquet","deletionTimestamp":1700000001000,"dataChange":true}}""",
      s"""{"add":{"path":"k=a/f1a.parquet","partitionValues":{"k":"a"},"size":$szF1a,"modificationTime":1700000001000,"dataChange":true}}"""))
    // v2: metadata-only schema evolution (new column tag) + one add
    commit(2, Seq(
      s"""{"metaData":{"id":"fixture-0001","format":{"provider":"parquet","options":{}},"schemaString":"$schemaV2","partitionColumns":["k"],"configuration":{},"createdTime":1700000000000}}""",
      s"""{"add":{"path":"k=c/f2c.parquet","partitionValues":{"k":"c"},"size":$szF2c,"modificationTime":1700000002000,"dataChange":true}}"""))
    d
  }

  test("replays add/remove/schema-evolution commits to the right rows") {
    val d = fixtureTable()
    val df = DeltaCompat.read(spark, d)
    assert(df.columns.toSeq == Seq("id", "v", "tag", "k"))
    val rows = df.select("id", "v", "tag", "k").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        Option(r.getString(2)).getOrElse("-"), r.getString(3))).sorted.toSeq
    // f0a removed; f0b + f1a read with tag=null (pre-evolution files);
    // f2c carries tag
    assert(rows == Seq(
      (3L, 30.0, "-", "b"),
      (4L, 40.0, "-", "a"), (5L, 50.0, "-", "a"),
      (6L, 60.0, "x", "c")))
  }

  test("asOfVersion time travel reads historical snapshots") {
    val d = fixtureTable()
    val v0 = DeltaCompat.read(spark, d, asOfVersion = Some(0L))
    assert(v0.columns.toSeq == Seq("id", "v", "k"))
    assert(v0.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
    val v1 = DeltaCompat.read(spark, d, asOfVersion = Some(1L))
    assert(v1.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(3L, 4L, 5L))
    val s = DeltaCompat.snapshot(spark, d)
    assert(s.version == 2L && s.files.map(_.path).sorted ==
      Seq("k=a/f1a.parquet", "k=b/f0b.parquet", "k=c/f2c.parquet"))
  }

  /** Final FileSourceScanExec of an executed plan (AQE-aware). */
  private def scanOf(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.execution.FileSourceScanExec = {
    def find(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        find(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        find(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(find)
    }
    val scans = find(df.queryExecution.executedPlan)
    assert(scans.size == 1, df.queryExecution.executedPlan.toString)
    scans.head
  }

  test("ONE relation regardless of partition count; filters prune files " +
      "inside the scan") {
    val d = fixtureTable()
    val df = DeltaCompat.read(spark, d)
    // the r11 shape was one LogicalRelation PER partition tuple — an
    // O(#partitions) plan on every query; the scale-safe pin is ONE
    // relation whose FileIndex carries the partition spec
    def rels(p: LogicalPlan): Int =
      p.collect { case r: LogicalRelation => r }.size
    assert(rels(df.queryExecution.optimizedPlan) == 1,
      df.queryExecution.optimizedPlan.toString)
    val full = df.select("id")
    assert(full.collect().length == 4)
    assert(scanOf(full).metrics("numFiles").value == 3L)
    val pruned = df.filter(col("k") === "a").select("id")
    assert(rels(pruned.queryExecution.optimizedPlan) == 1)
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(4L, 5L))
    // partition pruning happened INSIDE the single scan node
    assert(scanOf(pruned).metrics("numFiles").value == 1L,
      scanOf(pruned).metadata.toString)
    // IN-set predicate prunes to two partitions
    val two = df.filter(col("k").isin("a", "c"))
    two.collect()
    assert(scanOf(two).metrics("numFiles").value == 2L)
  }

  test("delta_read TVF exposes the reader on the SQL surface") {
    val d = fixtureTable()
    val rows = spark.sql(s"SELECT id, k FROM delta_read('$d') ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((3L, "b"), (4L, "a"), (5L, "a"), (6L, "c")))
    assert(spark.sql(s"SELECT count(*) AS c FROM delta_read('$d', 0)")
      .head.getLong(0) == 3L)
  }

  test("documented-unsupported tables are rejected loudly") {
    import spark.implicits._
    val d = fixtureTable()
    // a deletion vector with an UNKNOWN storage type
    Files.writeString(Paths.get(f"$d/_delta_log/${3L}%020d.json"),
      """{"add":{"path":"k=a/f1a.parquet","partitionValues":{"k":"a"},"size":1,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"z","pathOrInlineDv":"x","offset":1,"sizeInBytes":1,"cardinality":1}}}""" + "\n")
    val e1 = intercept[IllegalArgumentException] {
      DeltaCompat.snapshot(spark, d) }
    assert(e1.getMessage.contains("storageType"))
    // reader features beyond the implemented set (deletionVectors /
    // columnMapping / timestampNtz / v2Checkpoint /
    // vacuumProtocolCheck are implemented now; anything future stays
    // loudly rejected, and the message names only the UNKNOWN one)
    Files.writeString(Paths.get(f"$d/_delta_log/${3L}%020d.json"),
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors","futureMagicFeature"],"writerFeatures":["deletionVectors","futureMagicFeature"]}}""" + "\n")
    val e2 = intercept[IllegalArgumentException] {
      DeltaCompat.snapshot(spark, d) }
    assert(e2.getMessage.contains("futureMagicFeature") &&
      !e2.getMessage.startsWith("unsupported Delta reader features: deletionVectors"))
    // an unknown column mapping mode
    Files.writeString(Paths.get(f"$d/_delta_log/${3L}%020d.json"),
      """{"metaData":{"id":"fixture-0001","format":{"provider":"parquet","options":{}},"schemaString":"{\"type\":\"struct\",\"fields\":[]}","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"weird"},"createdTime":1}}""" + "\n")
    val e3 = intercept[IllegalArgumentException] {
      DeltaCompat.snapshot(spark, d) }
    assert(e3.getMessage.contains("column mapping"))
    // checkpoint-truncated history (log starting past 0)
    val root2 = tmpDir("deltafix2")
    val d2 = s"$root2/tbl"
    Files.createDirectories(Paths.get(s"$d2/_delta_log"))
    Files.writeString(Paths.get(f"$d2/_delta_log/${4L}%020d.json"),
      """{"commitInfo":{"operation":"WRITE"}}""" + "\n")
    val e4 = intercept[IllegalArgumentException] {
      DeltaCompat.snapshot(spark, d2) }
    assert(e4.getMessage.contains("checkpoint-truncated"))
    // not a delta table at all
    val e5 = intercept[IllegalArgumentException] {
      DeltaCompat.snapshot(spark, tmpDir("notdelta")) }
    assert(e5.getMessage.contains("_delta_log"))
  }

  test("unpartitioned tables and empty snapshots read correctly") {
    import spark.implicits._
    val root = tmpDir("deltanp")
    val d = s"$root/tbl"
    Files.createDirectories(Paths.get(s"$d/_delta_log"))
    val tmp = s"$root/stage"
    Seq((1L, "p"), (2L, "q")).toDF("id", "s").coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val f = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(f.toPath, Paths.get(s"$d/part0.parquet"))
    val sz0 = Files.size(Paths.get(s"$d/part0.parquet"))
    val schema =
      """{\"type\":\"struct\",\"fields\":[""" +
        """{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},""" +
        """{\"name\":\"s\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""
    Files.writeString(Paths.get(f"$d/_delta_log/${0L}%020d.json"),
      Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":"fixture-0002","format":{"provider":"parquet","options":{}},"schemaString":"$schema","partitionColumns":[],"configuration":{},"createdTime":1}}""",
        s"""{"add":{"path":"part0.parquet","partitionValues":{},"size":$sz0,"modificationTime":1,"dataChange":true}}"""
      ).mkString("", "\n", "\n"))
    val df = DeltaCompat.read(spark, d)
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      == Seq((1L, "p"), (2L, "q")))
    // remove the only file -> empty frame, schema intact
    Files.writeString(Paths.get(f"$d/_delta_log/${1L}%020d.json"),
      """{"remove":{"path":"part0.parquet","deletionTimestamp":2,"dataChange":true}}""" + "\n")
    val empty = DeltaCompat.read(spark, d)
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("id", "s"))
  }

  test("checkpoint-truncated history reads through the checkpoint " +
      "(r11 verdict item 1 — MOST mature Delta tables look like this)") {
    val d = fixtureTable()
    // checkpoint at v1 (the post-compaction state), then delete the
    // early JSON history the way Delta's log-cleanup does
    assert(DeltaCompat.checkpoint(spark, d, Some(1L)) == 1L)
    Files.delete(Paths.get(f"$d/_delta_log/${0L}%020d.json"))
    Files.delete(Paths.get(f"$d/_delta_log/${1L}%020d.json"))
    // latest = checkpoint state + replay of the v2 JSON commit
    val df = DeltaCompat.read(spark, d)
    assert(df.columns.toSeq == Seq("id", "v", "tag", "k"))
    assert(df.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(3L, 4L, 5L, 6L))
    // asOf AT the checkpoint: pure checkpoint read, pre-evolution schema
    val v1 = DeltaCompat.read(spark, d, asOfVersion = Some(1L))
    assert(v1.columns.toSeq == Seq("id", "v", "k"))
    assert(v1.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(3L, 4L, 5L))
    // asOf BEFORE the checkpoint with the JSON gone: loud error, not
    // a silent wrong snapshot
    val e = intercept[IllegalArgumentException] {
      DeltaCompat.snapshot(spark, d, asOfVersion = Some(0L)) }
    assert(e.getMessage.contains("checkpoint-truncated"), e.getMessage)
    // partition pruning still works when the files came from the
    // checkpoint path
    val pruned = DeltaCompat.read(spark, d).filter(col("k") === "a")
    pruned.collect()
    assert(scanOf(pruned).metrics("numFiles").value == 1L)
  }

  test("multi-part checkpoints read whole; incomplete parts and stale " +
      "_last_checkpoint pointers fall back to JSON replay") {
    import spark.implicits._
    val d = fixtureTable()
    // build a 2-part classic checkpoint at v1 by splitting the rows of
    // a single-part one (both parts share one schema, as the protocol
    // requires of a fragmented checkpoint)
    DeltaCompat.checkpoint(spark, d, Some(1L))
    val single = f"$d/_delta_log/${1L}%020d.checkpoint.parquet"
    val all = spark.read.parquet(single)
    def writeOnePart(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val staging = s"$d/_delta_log/.split"
      df.coalesce(1).write.mode("overwrite").parquet(staging)
      val f = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(f.toPath, Paths.get(s"$d/_delta_log/$name"))
    }
    val withAdd = all.filter(col("add").isNotNull)
    val withoutAdd = all.filter(col("add").isNull)
    writeOnePart(withoutAdd,
      f"${1L}%020d.checkpoint.${1}%010d.${2}%010d.parquet")
    writeOnePart(withAdd,
      f"${1L}%020d.checkpoint.${2}%010d.${2}%010d.parquet")
    Files.delete(Paths.get(single))
    Files.writeString(Paths.get(s"$d/_delta_log/_last_checkpoint"),
      """{"version":1,"size":4,"parts":2}""")
    Files.delete(Paths.get(f"$d/_delta_log/${0L}%020d.json"))
    Files.delete(Paths.get(f"$d/_delta_log/${1L}%020d.json"))
    val df = DeltaCompat.read(spark, d)
    assert(df.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(3L, 4L, 5L, 6L))
    // delete part 2 of 2: the checkpoint is incomplete and unusable —
    // with the JSON also gone the table must refuse loudly
    Files.delete(Paths.get(
      s"$d/_delta_log/" +
        f"${1L}%020d.checkpoint.${2}%010d.${2}%010d.parquet"))
    val e = intercept[IllegalArgumentException] {
      DeltaCompat.snapshot(spark, d) }
    assert(e.getMessage.contains("checkpoint-truncated"), e.getMessage)
    // a STALE pointer (names a checkpoint whose files are missing)
    // must not break a table whose JSON history is intact
    val d2 = fixtureTable()
    Files.writeString(Paths.get(s"$d2/_delta_log/_last_checkpoint"),
      """{"version":99,"size":1}""")
    assert(DeltaCompat.read(spark, d2).count() == 4L)
  }

  test("add.path is URI-decoded and partition dirs Hive-unescaped: " +
      "spaces, '+', '=' and unicode round-trip exactly") {
    import spark.implicits._
    val root = tmpDir("deltaenc")
    val d = s"$root/tbl"
    // 'a b' vs 'a+b' is the URLDecoder trap: '+' must NOT decode to a
    // space (they would collide); '=' exercises Hive path escaping
    // (%3D); '100%' is the double-encoding trap (dir 'k=100%25' must
    // URI-encode to '100%2525' in add.path and decode back once each)
    val vals = Seq("a b", "a+b", "x=y", "100%")
    val src = vals.zipWithIndex.map { case (k, i) => (i.toLong, k) }
      .toDF("id", "k")
    DeltaCompat.writeTable(src, d, partitionBy = Seq("k"))
    val back = DeltaCompat.read(spark, d)
    assert(back.select("k").collect().map(_.getString(0)).sorted.toSeq ==
      vals.sorted)
    // the log carries URI-encoded paths (protocol form), not raw names
    val log = Files.readString(
      Paths.get(f"$d/_delta_log/${0L}%020d.json"))
    assert(log.contains("k=a%20b/") || log.contains("k=a+b/"), log)
    // partition filter on the awkward values prunes to one file each
    vals.foreach { v =>
      val one = back.filter(col("k") === v).select("id")
      assert(one.collect().length == 1, v)
      assert(scanOf(one).metrics("numFiles").value == 1L, v)
    }
    // and the checkpointed form of the same table reads identically
    DeltaCompat.checkpoint(spark, d)
    Files.delete(Paths.get(f"$d/_delta_log/${0L}%020d.json"))
    assert(DeltaCompat.read(spark, d).select("k").collect()
      .map(_.getString(0)).sorted.toSeq == vals.sorted)
  }

  test("a malformed multi-part checkpoint set (right count, wrong " +
      "part indices) is SKIPPED like a stale pointer, not fatal") {
    import spark.implicits._
    val d = tmpDir("deltabadcp") + "/tbl"
    DeltaCompat.writeTable(
      Seq((1L, "a"), (2L, "b")).toDF("id", "k"), d)
    // claim a 2-part checkpoint at v0 whose parts are 1 and 3 — the
    // size matches the declared total but index 2 is missing, so the
    // set is unusable per the protocol (r12 ADVICE: this used to
    // throw NoSuchElementException inside snapshot())
    val logDir = Paths.get(s"$d/_delta_log")
    for (part <- Seq(1, 3)) {
      val p = logDir.resolve(
        f"${0L}%020d.checkpoint.${part}%010d.${2}%010d.parquet")
      Files.writeString(p, "not even parquet")
    }
    // the JSON history is intact, so replay falls back to it
    assert(DeltaCompat.read(spark, d).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }
}
