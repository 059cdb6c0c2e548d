package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.DeltaCompat

/** Delta reader-version-3 features (r12 verdict items 1–2): deletion
  * vectors (inline and file-backed RoaringBitmapArray bitmaps applied
  * as the `_metadata` anti-join, DV supersession, time travel around
  * the DV commit, checkpoint passthrough) and column mapping
  * (name/id physical-name projection) + timestampNtz. Fixtures come
  * from our own MoR writer plus hand-tampering, all to the published
  * PROTOCOL.md layouts. */
class DeltaDvSpec extends SparkSpec {

  private def mkTable(prefix: String): (String, Seq[Long]) = {
    import spark.implicits._
    val d = tmpDir(prefix) + "/tbl"
    // partition "big" has 120 rows (its vector encodes > the inline
    // threshold -> file-backed 'u'), "small" has 6 (inline 'i')
    val rows = (1L to 120L).map(i => (i, "big")) ++
      (200L to 205L).map(i => (i, "small"))
    DeltaCompat.writeTable(rows.toDF("id", "k").repartition(1), d,
      partitionBy = Seq("k"))
    (d, rows.map(_._1))
  }

  test("writeDeletionVectors: inline AND file-backed vectors apply; " +
      "a second delete SUPERSEDES (union), time travel sees each side") {
    val (d, all) = mkTable("dvmor")
    val v1 = DeltaCompat.writeDeletionVectors(spark, d,
      col("id") % 3 === 0) // 40 rows in big (file-backed), 2 in small
    assert(v1 == 1L)
    val snap1 = DeltaCompat.snapshot(spark, d)
    val storageTypes = snap1.files.flatMap(_.dv).map(_.storageType).toSet
    assert(storageTypes == Set("u", "i"),
      s"want both storage forms exercised, got $storageTypes")
    val after1 = all.filterNot(_ % 3 == 0)
    assert(DeltaCompat.read(spark, d).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == after1)
    // supersession: the second delete rewrites each touched file's DV
    // to the UNION under a NEW DV id (remove old + add new) — %5==2
    // strictly grows BOTH files' vectors (big gains 2,7,…; small 202)
    val v2 = DeltaCompat.writeDeletionVectors(spark, d,
      col("id") % 5 === 2)
    assert(v2 == 2L)
    val after2 = after1.filterNot(_ % 5 == 2)
    assert(DeltaCompat.read(spark, d).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == after2)
    val snap2 = DeltaCompat.snapshot(spark, d)
    // still at most one DV per live file, with new unique ids
    assert(snap2.files.size == snap1.files.size)
    val ids1 = snap1.files.flatMap(_.dv).map(_.uniqueId).toSet
    val ids2 = snap2.files.flatMap(_.dv).map(_.uniqueId).toSet
    assert(ids1.intersect(ids2).isEmpty,
      "superseded DV ids must not survive")
    // time travel: before, between, and after the DV commits
    assert(DeltaCompat.read(spark, d, asOfVersion = Some(0L))
      .count() == all.size)
    assert(DeltaCompat.read(spark, d, asOfVersion = Some(1L))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == after1)
    // partition pruning still works under the anti-join
    assert(DeltaCompat.read(spark, d).filter(col("k") === "small")
      .count() == (200L to 205L).count(i => i % 3 != 0 && i % 5 != 2))
  }

  test("checkpoint carries DVs, configuration and the FEATURE " +
      "protocol; a checkpoint-truncated DV table reads exactly") {
    val (d, all) = mkTable("dvcp")
    DeltaCompat.writeDeletionVectors(spark, d, col("id") % 4 === 2)
    val cpV = DeltaCompat.checkpoint(spark, d)
    assert(cpV == 1L)
    // log cleanup: delete every JSON the checkpoint covers
    Files.delete(Paths.get(f"$d/_delta_log/${0L}%020d.json"))
    Files.delete(Paths.get(f"$d/_delta_log/${1L}%020d.json"))
    val expect = all.filterNot(_ % 4 == 2)
    assert(DeltaCompat.read(spark, d).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == expect)
    // the replayed-from-checkpoint snapshot keeps the DV protocol
    val snap = DeltaCompat.snapshot(spark, d)
    assert(snap.protocolJson.contains("deletionVectors"), snap.protocolJson)
    assert(snap.files.exists(_.dv.isDefined))
  }

  test("a torn on-disk DV fails the CRC loudly instead of resurfacing rows") {
    val (d, _) = mkTable("dvtorn")
    DeltaCompat.writeDeletionVectors(spark, d, col("id") % 3 === 0)
    val dvFile = new java.io.File(d).listFiles()
      .find(_.getName.startsWith("deletion_vector_")).get
    val bytes = Files.readAllBytes(dvFile.toPath)
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x7f).toByte
    Files.write(dvFile.toPath, bytes)
    Files.deleteIfExists(Paths.get(dvFile.getParent,
      "." + dvFile.getName + ".crc"))
    val e = intercept[Exception] {
      DeltaCompat.read(spark, d).count() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("checksum") || m.contains("DV")),
      msgs(e).mkString(" | "))
  }

  test("column mapping: name-mode physical parquet columns project " +
      "back to logical names; id mode reads the same files") {
    import spark.implicits._
    val d = tmpDir("dvcmap") + "/tbl"
    val src = Seq((1L, 1.5, "a"), (2L, 2.5, "a"), (3L, 3.5, "b"))
      .toDF("id", "v", "k").coalesce(1)
    DeltaCompat.writeTable(src, d, partitionBy = Seq("k"),
      columnMapping = true)
    // the parquet files and partition dirs really carry PHYSICAL names
    assert(new java.io.File(d).listFiles()
      .exists(_.getName.startsWith("col-3=")),
      new java.io.File(d).listFiles().map(_.getName).mkString(","))
    val back = DeltaCompat.read(spark, d)
    assert(back.columns.toSeq == Seq("id", "v", "k"))
    assert(back.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getString(2))).sorted.toSeq ==
      Seq((1L, 1.5, "a"), (2L, 2.5, "a"), (3L, 3.5, "b")))
    // logical-name partition predicates prune (resolved via physical)
    assert(back.filter(col("k") === "b").select("id").collect()
      .map(_.getLong(0)).toSeq == Seq(3L))
    // id mode: same physical names, per the protocol — flip the mode
    val log = Paths.get(f"$d/_delta_log/${0L}%020d.json")
    val txt = Files.readString(log)
    Files.writeString(log, txt.replace(
      """"delta.columnMapping.mode":"name"""",
      """"delta.columnMapping.mode":"id""""))
    Files.deleteIfExists(Paths.get(log.getParent.toString,
      "." + log.getFileName + ".crc"))
    assert(DeltaCompat.read(spark, d).filter(col("k") === "a")
      .count() == 2L)
    // and DVs compose with mapping: delete via a LOGICAL predicate
    DeltaCompat.writeDeletionVectors(spark, d, col("id") === 2L)
    assert(DeltaCompat.read(spark, d).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("timestampNtz columns round-trip under the reader-3 feature " +
      "protocol") {
    import spark.implicits._
    val d = tmpDir("dvntz") + "/tbl"
    val src = Seq(1L, 2L).toDF("id")
      .withColumn("ts", (lit("2020-06-01 12:34:56.789").cast("string") )
        .cast(org.apache.spark.sql.types.TimestampNTZType))
    DeltaCompat.writeTable(src, d)
    val log = Files.readString(
      Paths.get(f"$d/_delta_log/${0L}%020d.json"))
    assert(log.contains("timestampNtz") && log.contains("\"minReaderVersion\":3"),
      log.linesIterator.next())
    val back = DeltaCompat.read(spark, d)
    assert(back.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    assert(back.select("ts").distinct().collect().map(_.get(0).toString)
      .toSeq == Seq("2020-06-01T12:34:56.789"))
  }
}
