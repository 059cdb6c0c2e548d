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
    def writeOne(rows: Seq[(Long, Double)], rel: String): Unit = {
      val tmp = s"$root/stage"
      rows.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.createDirectories(Paths.get(s"$d/$rel").getParent)
      Files.move(f.toPath, Paths.get(s"$d/$rel"))
    }
    def writeOne3(rows: Seq[(Long, Double, String)], rel: String): Unit = {
      val tmp = s"$root/stage"
      rows.toDF("id", "v", "tag").coalesce(1).write.mode("overwrite")
        .parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.createDirectories(Paths.get(s"$d/$rel").getParent)
      Files.move(f.toPath, Paths.get(s"$d/$rel"))
    }
    writeOne(Seq((1L, 10.0), (2L, 20.0)), "k=a/f0a.parquet")
    writeOne(Seq((3L, 30.0)), "k=b/f0b.parquet")
    writeOne(Seq((4L, 40.0), (5L, 50.0)), "k=a/f1a.parquet")
    writeOne3(Seq((6L, 60.0, "x")), "k=c/f2c.parquet")

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
      """{"add":{"path":"k=a/f0a.parquet","partitionValues":{"k":"a"},"size":100,"modificationTime":1700000000000,"dataChange":true}}""",
      """{"add":{"path":"k=b/f0b.parquet","partitionValues":{"k":"b"},"size":100,"modificationTime":1700000000000,"dataChange":true}}"""))
    // v1: compaction of partition a — remove f0a, add f1a
    commit(1, Seq(
      """{"commitInfo":{"operation":"WRITE"}}""",
      """{"remove":{"path":"k=a/f0a.parquet","deletionTimestamp":1700000001000,"dataChange":true}}""",
      """{"add":{"path":"k=a/f1a.parquet","partitionValues":{"k":"a"},"size":100,"modificationTime":1700000001000,"dataChange":true}}"""))
    // v2: metadata-only schema evolution (new column tag) + one add
    commit(2, Seq(
      s"""{"metaData":{"id":"fixture-0001","format":{"provider":"parquet","options":{}},"schemaString":"$schemaV2","partitionColumns":["k"],"configuration":{},"createdTime":1700000000000}}""",
      """{"add":{"path":"k=c/f2c.parquet","partitionValues":{"k":"c"},"size":100,"modificationTime":1700000002000,"dataChange":true}}"""))
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

  test("partition filters prune whole scans in the optimized plan") {
    val d = fixtureTable()
    val df = DeltaCompat.read(spark, d)
    def scansOf(p: LogicalPlan): Int =
      p.collect { case r: LogicalRelation => r }.size
    assert(scansOf(df.queryExecution.optimizedPlan) == 3)
    val pruned = df.filter(col("k") === "a")
    assert(scansOf(pruned.queryExecution.optimizedPlan) == 1,
      pruned.queryExecution.optimizedPlan.toString)
    assert(pruned.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(4L, 5L))
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
    // deletion vector on an add
    Files.writeString(Paths.get(f"$d/_delta_log/${3L}%020d.json"),
      """{"add":{"path":"k=a/f1a.parquet","partitionValues":{"k":"a"},"size":1,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"x","offset":1,"sizeInBytes":1,"cardinality":1}}}""" + "\n")
    val e1 = intercept[IllegalArgumentException] {
      DeltaCompat.snapshot(spark, d) }
    assert(e1.getMessage.contains("deletion vector"))
    // reader features beyond the base protocol
    Files.writeString(Paths.get(f"$d/_delta_log/${3L}%020d.json"),
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""" + "\n")
    val e2 = intercept[IllegalArgumentException] {
      DeltaCompat.snapshot(spark, d) }
    assert(e2.getMessage.contains("deletionVectors"))
    // column mapping on
    Files.writeString(Paths.get(f"$d/_delta_log/${3L}%020d.json"),
      """{"metaData":{"id":"fixture-0001","format":{"provider":"parquet","options":{}},"schemaString":"{\"type\":\"struct\",\"fields\":[]}","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"},"createdTime":1}}""" + "\n")
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
    val schema =
      """{\"type\":\"struct\",\"fields\":[""" +
        """{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},""" +
        """{\"name\":\"s\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""
    Files.writeString(Paths.get(f"$d/_delta_log/${0L}%020d.json"),
      Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":"fixture-0002","format":{"provider":"parquet","options":{}},"schemaString":"$schema","partitionColumns":[],"configuration":{},"createdTime":1}}""",
        """{"add":{"path":"part0.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""
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
}
