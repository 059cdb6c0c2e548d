package graft

import java.nio.file.{Files, Paths}

import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

import graft.sources.IcebergCompat

/** Read-only Apache Iceberg compatibility: fixtures are written to
  * the PUBLISHED table spec (metadata.json + Avro manifest list +
  * Avro manifests + parquet data) — partly by our own fixture writer,
  * partly BY HAND — so these tests pin our reading of the spec:
  * snapshot resolution, live-file reconstruction across
  * ADDED/EXISTING/DELETED manifest entries, identity partition
  * re-attachment, single-relation pruning, snapshot time travel,
  * hint-fallback, and loud rejection of the documented-unsupported
  * features. */
class IcebergCompatSpec extends SparkSpec {

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


  /** Rewrite a file the fixture writer created through the Hadoop
    * local FS: drop the stale .crc sibling or the next read fails
    * ChecksumException instead of exercising the reader. */
  private def rewrite(path: String, content: String): Unit = {
    Files.writeString(Paths.get(path), content)
    val f = new java.io.File(path)
    Files.deleteIfExists(Paths.get(f.getParent, "." + f.getName + ".crc"))
  }
  test("writeTable round-trip: partitioned table reads back exactly " +
      "through ONE pruned relation") {
    import spark.implicits._
    val d = tmpDir("icefix") + "/tbl"
    val src = Seq((1L, 10.0, "a"), (2L, 20.0, "a"), (3L, 30.0, "b"),
      (4L, 40.0, "c")).toDF("id", "v", "k").coalesce(1)
    IcebergCompat.writeTable(src, d, partitionBy = Seq("k"))
    val back = IcebergCompat.read(spark, d)
    assert(back.columns.toSeq == Seq("id", "v", "k"))
    assert(back.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getString(2))).sorted.toSeq ==
      Seq((1L, 10.0, "a"), (2L, 20.0, "a"), (3L, 30.0, "b"),
        (4L, 40.0, "c")))
    def rels(p: LogicalPlan): Int =
      p.collect { case r: LogicalRelation => r }.size
    assert(rels(back.queryExecution.optimizedPlan) == 1)
    val pruned = IcebergCompat.read(spark, d)
      .filter(col("k") === "a").select("id")
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    assert(scanOf(pruned).metrics("numFiles").value == 1L,
      scanOf(pruned).metadata.toString)
    // snapshot facts from the metadata, not the filesystem
    val snap = IcebergCompat.snapshot(spark, d)
    assert(snap.snapshotId == 1L && snap.partitionColumns == Seq("k") &&
      snap.files.size == 3)
  }

  test("unpartitioned tables and the stale version-hint fallback") {
    import spark.implicits._
    val d = tmpDir("icenp") + "/tbl"
    IcebergCompat.writeTable(
      Seq((1L, "p"), (2L, "q")).toDF("id", "s"), d)
    assert(IcebergCompat.read(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq((1L, "p"), (2L, "q")))
    // a STALE hint (names a missing metadata version) must fall back
    // to the directory scan, not fail the read
    rewrite(s"$d/metadata/version-hint.text", "99")
    assert(IcebergCompat.read(spark, d).count() == 2L)
    // no metadata dir at all: loud
    val e = intercept[IllegalArgumentException] {
      IcebergCompat.snapshot(spark, tmpDir("notice")) }
    assert(e.getMessage.contains("metadata"))
  }

  test("snapshot time travel across ADDED/EXISTING/DELETED manifest " +
      "entries (hand-written second snapshot)") {
    import spark.implicits._
    val d = tmpDir("icett") + "/tbl"
    // snapshot 1 via the fixture writer: files for partitions a, b
    IcebergCompat.writeTable(Seq((1L, "a"), (2L, "b")).toDF("id", "k"),
      d, partitionBy = Seq("k"))
    val snap1 = IcebergCompat.snapshot(spark, d)
    assert(snap1.files.size == 2)
    val fileA = snap1.files.find(_.partitionValues("k") == "a").get
    val fileB = snap1.files.find(_.partitionValues("k") == "b").get
    // a new data file for partition c, written as plain parquet WITH
    // the table's field id (the spec requires ids in data files; the
    // reader resolves columns by id)
    val staging = tmpDir("icett-stage")
    Seq(3L).toDF("id")
      .select(col("id").as("id",
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("parquet.field.id", 1L).build()))
      .coalesce(1).write.mode("overwrite").parquet(staging)
    val cSrc = new java.io.File(staging).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.createDirectories(Paths.get(s"$d/k=c"))
    Files.move(cSrc.toPath, Paths.get(s"$d/k=c/f2c.parquet"))
    // snapshot 2 BY HAND: manifest with DELETED(a) + EXISTING(b) +
    // ADDED(c), its manifest list, a v2.metadata.json with both
    // snapshots, and the advanced hint
    val entrySchema = IcebergCompat.manifestEntrySchema(
      Seq("k" -> org.apache.spark.sql.types.StringType))
    val dfSchema = entrySchema.getField("data_file").schema()
    val partSchema = dfSchema.getField("partition").schema()
    def entry(status: Int, path: String, k: String,
        size: Long): GenericRecord = {
      val pr = new GenericData.Record(partSchema)
      pr.put("k", k)
      val dfr = new GenericData.Record(dfSchema)
      dfr.put("content", Integer.valueOf(0))
      dfr.put("file_path", path)
      dfr.put("file_format", "PARQUET")
      dfr.put("partition", pr)
      dfr.put("record_count", java.lang.Long.valueOf(-1L))
      dfr.put("file_size_in_bytes", java.lang.Long.valueOf(size))
      val e = new GenericData.Record(entrySchema)
      e.put("status", Integer.valueOf(status))
      e.put("snapshot_id", java.lang.Long.valueOf(2L))
      e.put("data_file", dfr)
      e
    }
    val cLen = Files.size(Paths.get(s"$d/k=c/f2c.parquet"))
    def writeAvroFile(p: String, schema: org.apache.avro.Schema,
        recs: Seq[GenericRecord]): Long = {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      try {
        w.create(schema, new java.io.File(p))
        recs.foreach(w.append)
      } finally w.close()
      Files.size(Paths.get(p))
    }
    val m2 = s"$d/metadata/manifest-2.avro"
    val m2Len = writeAvroFile(m2, entrySchema, Seq(
      entry(2, fileA.path, "a", fileA.size),   // DELETED
      entry(0, fileB.path, "b", fileB.size),   // EXISTING
      entry(1, s"k=c/f2c.parquet", "c", cLen)))// ADDED
    val ml = new GenericData.Record(IcebergCompat.manifestListSchema)
    ml.put("manifest_path", m2)
    ml.put("manifest_length", java.lang.Long.valueOf(m2Len))
    ml.put("partition_spec_id", Integer.valueOf(0))
    ml.put("content", Integer.valueOf(0))
    ml.put("sequence_number", java.lang.Long.valueOf(2L))
    ml.put("added_snapshot_id", java.lang.Long.valueOf(2L))
    writeAvroFile(s"$d/metadata/snap-2.avro",
      IcebergCompat.manifestListSchema, Seq(ml))
    val v1 = Files.readString(Paths.get(s"$d/metadata/v1.metadata.json"))
    val snapsBlock = v1.split("\"snapshots\":\\[")(1).stripSuffix("]}")
    val v2 = v1
      .replace("\"current-snapshot-id\":1", "\"current-snapshot-id\":2")
      .replace(s""""snapshots":[$snapsBlock]}""",
        s""""snapshots":[$snapsBlock,
          |{"snapshot-id":2,"timestamp-ms":1,"sequence-number":2,
          |"summary":{"operation":"overwrite"},
          |"manifest-list":"$d/metadata/snap-2.avro","schema-id":0}]}"""
          .stripMargin)
    assert(v2 != v1, "metadata rewrite failed to apply")
    rewrite(s"$d/metadata/v2.metadata.json", v2)
    rewrite(s"$d/metadata/version-hint.text", "2")

    val cur = IcebergCompat.read(spark, d)
    assert(cur.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L, 3L)) // a deleted, b existing, c added
    assert(cur.filter(col("k") === "c").count() == 1L)
    val asOf1 = IcebergCompat.read(spark, d, asOfSnapshotId = Some(1L))
    assert(asOf1.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L))
    val e = intercept[IllegalArgumentException] {
      IcebergCompat.snapshot(spark, d, asOfSnapshotId = Some(99L)) }
    assert(e.getMessage.contains("snapshot 99"))
  }

  test("iceberg_read TVF exposes the reader on the SQL surface") {
    import spark.implicits._
    val d = tmpDir("icetvf") + "/tbl"
    IcebergCompat.writeTable(
      Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "k"), d,
      partitionBy = Seq("k"))
    val rows = spark.sql(
      s"SELECT id, k FROM iceberg_read('$d') ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "a")))
    assert(spark.sql(
      s"SELECT count(*) AS c FROM iceberg_read('$d', 1)")
      .head.getLong(0) == 3L)
  }

  test("documented-unsupported tables are rejected loudly") {
    import spark.implicits._
    val d = tmpDir("icebad") + "/tbl"
    IcebergCompat.writeTable(Seq((1L, "a")).toDF("id", "k"), d,
      partitionBy = Seq("k"))
    val metaPath = Paths.get(s"$d/metadata/v1.metadata.json")
    val good = Files.readString(metaPath)
    // an unknown nested type KIND (structs/lists/maps parse since
    // round 13 — variant and future kinds still reject loudly)
    rewrite(metaPath.toString, good.replace("\"type\":\"string\"",
      """"type":{"type":"variant"}"""))
    val e2 = intercept[IllegalArgumentException] {
      IcebergCompat.snapshot(spark, d) }
    assert(e2.getMessage.contains("nested type kind 'variant'"))
    // future format version (v3 is supported since round 13 for its
    // deletion-vector feature; v4 stays loud)
    rewrite(metaPath.toString,
      good.replace("\"format-version\":2", "\"format-version\":4"))
    val e3 = intercept[IllegalArgumentException] {
      IcebergCompat.snapshot(spark, d) }
    assert(e3.getMessage.contains("format-version 4"))
    // an EQUALITY delete file whose manifest names NO equality_ids:
    // spec-violating, rejected loudly (valid eq-deletes read — see
    // the equality-delete tests)
    rewrite(metaPath.toString, good)
    val entrySchema2 = IcebergCompat.manifestEntrySchema(Seq.empty)
    val dfSchema2 = entrySchema2.getField("data_file").schema()
    val eqDfr = new GenericData.Record(dfSchema2)
    eqDfr.put("content", Integer.valueOf(2))
    eqDfr.put("file_path", s"$d/eqdel.parquet")
    eqDfr.put("file_format", "PARQUET")
    eqDfr.put("partition", new GenericData.Record(
      dfSchema2.getField("partition").schema()))
    eqDfr.put("record_count", java.lang.Long.valueOf(-1L))
    eqDfr.put("file_size_in_bytes", java.lang.Long.valueOf(1L))
    val eqEntry = new GenericData.Record(entrySchema2)
    eqEntry.put("status", Integer.valueOf(1))
    eqEntry.put("snapshot_id", java.lang.Long.valueOf(1L))
    eqEntry.put("data_file", eqDfr)
    def writeAvroAt(path: String, schema: org.apache.avro.Schema,
        recs: Seq[GenericRecord]): Unit = {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      try { w.create(schema, new java.io.File(path)); recs.foreach(w.append) }
      finally w.close()
      val f = new java.io.File(path)
      Files.deleteIfExists(Paths.get(f.getParent, "." + f.getName + ".crc"))
    }
    writeAvroAt(s"$d/metadata/manifest-eq.avro", entrySchema2, Seq(eqEntry))
    val mlRecs = {
      val keep = new GenericData.Record(IcebergCompat.manifestListSchema)
      keep.put("manifest_path", s"$d/metadata/manifest-1.avro")
      keep.put("manifest_length", java.lang.Long.valueOf(1L))
      keep.put("partition_spec_id", Integer.valueOf(0))
      keep.put("content", Integer.valueOf(0))
      keep.put("sequence_number", java.lang.Long.valueOf(1L))
      keep.put("added_snapshot_id", java.lang.Long.valueOf(1L))
      val ml = new GenericData.Record(IcebergCompat.manifestListSchema)
      ml.put("manifest_path", s"$d/metadata/manifest-eq.avro")
      ml.put("manifest_length", java.lang.Long.valueOf(1L))
      ml.put("partition_spec_id", Integer.valueOf(0))
      ml.put("content", Integer.valueOf(1))
      ml.put("sequence_number", java.lang.Long.valueOf(1L))
      ml.put("added_snapshot_id", java.lang.Long.valueOf(1L))
      Seq(keep, ml)
    }
    writeAvroAt(s"$d/metadata/snap-1.avro",
      IcebergCompat.manifestListSchema, mlRecs)
    val e4 = intercept[IllegalArgumentException] {
      IcebergCompat.snapshot(spark, d) }
    assert(e4.getMessage.contains("equality_ids"), e4.getMessage)
  }

  test("v2 merge-on-read: positional deletes apply on the _metadata " +
      "anti-join; deletePositional writes the MoR shape") {
    import spark.implicits._
    val d = tmpDir("icemor") + "/tbl"
    val src = (1L to 40L).map(i =>
      (i, i * 1.5, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "v", "k").coalesce(1)
    IcebergCompat.writeTable(src, d, partitionBy = Seq("k"))
    // MoR DELETE of a predicate that spans both partitions
    val s2 = IcebergCompat.deletePositional(spark, d,
      col("id") % 10 === 3 || col("id") === 2L)
    assert(s2 == 2L)
    val back = IcebergCompat.read(spark, d)
    val expect = (1L to 40L).filterNot(i => i % 10 == 3 || i == 2L)
    assert(back.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      expect)
    // partition values still attach, and pruning still works under
    // the anti-join
    assert(back.filter(col("k") === "odd").count() ==
      expect.count(_ % 2 == 1))
    // time travel to the pre-delete snapshot still sees every row
    assert(IcebergCompat.read(spark, d, asOfSnapshotId = Some(1L))
      .count() == 40L)
    // a second MoR delete stacks on the first
    val s3 = IcebergCompat.deletePositional(spark, d, col("id") === 40L)
    assert(s3 == 3L)
    assert(IcebergCompat.read(spark, d).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == expect.filterNot(_ == 40L))
    // the SQL surface reads the MoR snapshot too
    assert(spark.sql(s"SELECT count(*) AS c FROM iceberg_read('$d')")
      .head.getLong(0) == expect.size - 1L)
  }

  test("non-identity transforms (bucket) read correctly: derived " +
      "tuples are metadata, the data files carry the full row") {
    import spark.implicits._
    val d = tmpDir("icebkt") + "/tbl"
    // UNPARTITIONED write = data files contain every column (exactly
    // what a bucket-partitioned Iceberg writer also produces)
    IcebergCompat.writeTable(
      (1L to 10L).map(i => (i, s"s$i")).toDF("id", "s"), d)
    // claim a bucket[4] spec over id in the metadata, the way a real
    // bucket-partitioned table's metadata reads
    val metaPath = Paths.get(s"$d/metadata/v1.metadata.json")
    val good = Files.readString(metaPath)
    rewrite(metaPath.toString, good.replace(
      """"partition-specs":[{"spec-id":0,"fields":[]}]""",
      """"partition-specs":[{"spec-id":0,"fields":[{"name":"id_bucket","transform":"bucket[4]","source-id":1,"field-id":1000}]}]"""))
    val back = IcebergCompat.read(spark, d)
    assert(back.columns.toSeq == Seq("id", "s"))
    assert(back.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 10L))
    // and the snapshot exposes NO identity partition columns for it
    assert(IcebergCompat.snapshot(spark, d).partitionColumns.isEmpty)
  }

  test("typed partition values: a DATE-partitioned table round-trips " +
      "and prunes (manifest stores int days, not a string)") {
    import spark.implicits._
    val d = tmpDir("icedate") + "/tbl"
    val src = Seq(
      (1L, java.sql.Date.valueOf("2020-01-01")),
      (2L, java.sql.Date.valueOf("2020-01-01")),
      (3L, java.sql.Date.valueOf("2021-06-15"))).toDF("id", "dt").coalesce(1)
    IcebergCompat.writeTable(src, d, partitionBy = Seq("dt"))
    // the manifest carries int days; the snapshot's string form must
    // be the ISO date Cast-to-DateType understands, not "18262"
    val snap = IcebergCompat.snapshot(spark, d)
    assert(snap.files.map(_.partitionValues("dt")).toSet ==
      Set("2020-01-01", "2021-06-15"))
    val back = IcebergCompat.read(spark, d)
    assert(back.select("id", "dt").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString)).sorted.toSeq ==
      Seq((1L, "2020-01-01"), (2L, "2020-01-01"), (3L, "2021-06-15")))
    // partition-predicate pruning on the typed date value
    val pruned = IcebergCompat.read(spark, d)
      .filter(col("dt") === lit("2021-06-15").cast("date")).select("id")
    assert(pruned.collect().map(_.getLong(0)).toSeq == Seq(3L))
    assert(scanOf(pruned).metrics("numFiles").value == 1L)
  }

  test("partValueString converts the spec's physical manifest encodings " +
      "type-aware (date/timestamp/timestamptz/decimal)") {
    import org.apache.spark.sql.types._
    import graft.sources.IcebergCompat.partValueString
    // date: int days since epoch
    assert(partValueString(Integer.valueOf(18262), DateType, "d") ==
      "2020-01-01")
    // timestamptz: long UTC micros -> an EXPLICITLY-ZONED serialization
    // (a session-timezone Cast must not shift the instant)
    val us = 1577836800000000L + 123456L // 2020-01-01T00:00:00.123456Z
    val tz = partValueString(java.lang.Long.valueOf(us), TimestampType, "t")
    assert(tz == "2020-01-01T00:00:00.123456Z", tz)
    // timestamp (NTZ): long micros as a local datetime
    assert(partValueString(java.lang.Long.valueOf(us),
      TimestampNTZType, "t") == "2020-01-01 00:00:00.123456")
    // decimal: unscaled big-endian bytes + the type's scale
    val unscaled = java.math.BigInteger.valueOf(1250)
    assert(partValueString(
      java.nio.ByteBuffer.wrap(unscaled.toByteArray),
      DecimalType(9, 2), "p") == "12.50")
    assert(partValueString(new GenericData.Fixed(
      org.apache.avro.Schema.createFixed("f", null, null, 2),
      unscaled.toByteArray), DecimalType(9, 2), "p") == "12.50")
    // nulls pass through; unsupported shapes reject loudly
    assert(partValueString(null, DateType, "d") == null)
    val e = intercept[IllegalArgumentException] {
      partValueString(java.nio.ByteBuffer.wrap(Array[Byte](1)),
        StringType, "s") }
    assert(e.getMessage.contains("fixed/bytes"))
  }

  test("file_path fields are full URIs and positional-delete paths " +
      "match data_file.file_path byte-identically") {
    import spark.implicits._
    val d = tmpDir("iceuri") + "/tbl"
    IcebergCompat.writeTable(
      (1L to 20L).map(i => (i, i % 3)).toDF("id", "m"), d,
      partitionBy = Seq("m"))
    val snap = IcebergCompat.snapshot(spark, d)
    // spec: data_file.file_path is a full URI, not root-relative
    assert(snap.files.nonEmpty &&
      snap.files.forall(_.path.startsWith("file:")),
      snap.files.map(_.path).mkString(", "))
    IcebergCompat.deletePositional(spark, d, col("id") % 4 === 1)
    val snap2 = IcebergCompat.snapshot(spark, d)
    assert(snap2.deletes.size == 1)
    val dataPaths = snap2.files.map(_.path).toSet
    val delPaths = spark.read.parquet(snap2.deletes.head.path)
      .select("file_path").distinct().collect().map(_.getString(0)).toSet
    assert(delPaths.nonEmpty && delPaths.subsetOf(dataPaths),
      s"delete paths $delPaths not byte-identical to data paths $dataPaths")
    // and the MoR read still applies them
    assert(IcebergCompat.read(spark, d).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == (1L to 20L).filterNot(_ % 4 == 1))
  }

  test("v1 metadata: legacy schema/partition-spec fields and inline " +
      "manifests read correctly") {
    import spark.implicits._
    val d = tmpDir("icev1") + "/tbl"
    // data + manifest via the fixture writer, then REWRITE the
    // metadata in the v1 legacy dialect: "schema", "partition-spec",
    // and the snapshot's inline "manifests" array
    IcebergCompat.writeTable(Seq((1L, "a"), (2L, "b")).toDF("id", "k"),
      d, partitionBy = Seq("k"))
    val fieldsJson =
      """{"id":1,"name":"id","required":false,"type":"long"},
        |{"id":2,"name":"k","required":false,"type":"string"}"""
        .stripMargin
    val v1Legacy =
      s"""{"format-version":1,
        |"table-uuid":"legacy","location":"$d",
        |"last-updated-ms":0,"last-column-id":2,
        |"schema":{"type":"struct","fields":[$fieldsJson]},
        |"partition-spec":[{"name":"k","transform":"identity",
        |"source-id":2,"field-id":1000}],
        |"current-snapshot-id":1,
        |"snapshots":[{"snapshot-id":1,"timestamp-ms":0,
        |"manifests":["$d/metadata/manifest-1.avro"]}]}""".stripMargin
    rewrite(s"$d/metadata/v1.metadata.json", v1Legacy)
    val back = IcebergCompat.read(spark, d)
    assert(back.columns.toSeq == Seq("id", "k"))
    assert(back.collect().map(r => (r.getLong(0), r.getString(1)))
      .sorted.toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("named refs: tags pin snapshots, branches read their head, " +
      "unknown refs and ref+snapshotId reject loudly") {
    import spark.implicits._
    val d = tmpDir("icerefs") + "/tbl"
    IcebergCompat.writeTable(
      Seq((1L, "a"), (2L, "b")).toDF("id", "k"), d)
    IcebergCompat.appendTable(Seq((3L, "c")).toDF("id", "k"), d)
    IcebergCompat.setRef(spark, d, "v1", 1L) // tag the initial snapshot
    IcebergCompat.setRef(spark, d, "audit", 2L, refType = "branch")
    def idsOf(ref: String) = IcebergCompat
      .read(spark, d, ref = Some(ref))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(idsOf("v1") == Seq(1L, 2L))
    assert(idsOf("audit") == Seq(1L, 2L, 3L))
    // unnamed read is unaffected by refs
    assert(IcebergCompat.read(spark, d).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    val e1 = intercept[IllegalArgumentException] {
      IcebergCompat.read(spark, d, ref = Some("nope")).count() }
    assert(e1.getMessage.contains("unknown ref 'nope'") &&
      e1.getMessage.contains("v1"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      IcebergCompat.read(spark, d, asOfSnapshotId = Some(1L),
        ref = Some("v1")).count() }
    assert(e2.getMessage.contains("not both"))
    val e3 = intercept[IllegalArgumentException] {
      IcebergCompat.setRef(spark, d, "bad", 99L) }
    assert(e3.getMessage.contains("snapshot 99"))
    // the TVF routes a STRING second argument through the refs map
    // (a numeric one stays a snapshot id)
    graft.functions.GraftFunctions.registerTableFunctions(spark)
    assert(spark.sql(s"SELECT count(*) FROM iceberg_read('$d', 'v1')")
      .head.getLong(0) == 2L)
    assert(spark.sql(s"SELECT count(*) FROM iceberg_read('$d', 2)")
      .head.getLong(0) == 3L)
  }

  test("nested types round-trip (struct/list/map) and a RENAMED " +
      "nested struct field resolves by field id") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = tmpDir("icenested") + "/tbl"
    val src = Seq((1L, 2.0, 5.0, "x", 0.1), (2L, 3.0, 7.0, "y", 0.2))
      .toDF("id", "q", "p", "s", "disc")
      .select(col("id"),
        struct(col("q").as("qty"), col("p").as("price")).as("meas"),
        array(col("id") * 10, col("id") * 100).as("keys"),
        map(col("s"), col("disc")).as("m"))
      .coalesce(1)
    IcebergCompat.writeTable(src, d)
    // the declared schema JSON allocates DFS ids: id=1, meas=2
    // (qty=3, price=4), keys=5 (element-id=6), m=7 (key-id=8,
    // value-id=9) — last-column-id must be the DFS max
    val metaTxt = Files.readString(
      Paths.get(s"$d/metadata/v1.metadata.json"))
    assert(metaTxt.contains("\"last-column-id\":9"), metaTxt)
    assert(metaTxt.contains("\"element-id\":6") &&
      metaTxt.contains("\"key-id\":8") &&
      metaTxt.contains("\"value-id\":9"), metaTxt)
    val back = IcebergCompat.read(spark, d)
    assert(back.schema("meas").dataType.isInstanceOf[
      org.apache.spark.sql.types.StructType])
    val rows = back.select(col("id"), col("meas.qty"),
      col("meas.price"), element_at(col("keys"), 2),
      element_at(map_values(col("m")), 1))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4))).sorted.toSeq
    assert(rows == Seq((1L, 2.0, 5.0, 100L, 0.1),
      (2L, 3.0, 7.0, 200L, 0.2)))
    // rename the NESTED field qty -> quantity in the schema JSON only
    // (same id 3): the parquet files still carry 'qty', so a correct
    // reader must resolve the nested column BY ID, not by name
    rewrite(s"$d/metadata/v1.metadata.json",
      metaTxt.replace("\"name\":\"qty\"", "\"name\":\"quantity\""))
    val renamed = IcebergCompat.read(spark, d)
    val meas = renamed.schema("meas").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meas.fieldNames.toSeq == Seq("quantity", "price"))
    assert(renamed.select(col("meas.quantity")).collect()
      .map(_.getDouble(0)).sorted.toSeq == Seq(2.0, 3.0),
      "renamed nested field must read the old files' values by id")
  }
}
