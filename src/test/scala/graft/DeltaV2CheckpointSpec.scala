package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.DeltaCompat

/** Delta V2 CHECKPOINTS (round 13 — the last default-on reader-3
  * feature): UUID-named json/parquet top-level file carrying
  * protocol + metaData + checkpointMetadata, file actions inline or
  * fanned out into `_delta_log/_sidecars/` parquet files. Covers both
  * top-level formats, sidecar fan-out and inline layouts, DV
  * descriptors riding through the checkpoint, checkpoint-truncated
  * reads, write-after-v2-checkpoint, torn-checkpoint and
  * version-mismatch loud errors, and classic-over-v2 preference. */
class DeltaV2CheckpointSpec extends SparkSpec {

  private def fs(d: String) =
    new Path(d).getFileSystem(spark.sessionState.newHadoopConf())

  private def mkTable(prefix: String): (String, Seq[Long]) = {
    import spark.implicits._
    val d = tmpDir(prefix) + "/tbl"
    val rows = (1L to 120L).map(i => (i, "big")) ++
      (200L to 205L).map(i => (i, "small"))
    DeltaCompat.writeTable(rows.toDF("id", "k").repartition(1), d,
      partitionBy = Seq("k"))
    (d, rows.map(_._1))
  }

  private def deleteJson(d: String, v: Long): Unit = {
    val p = new Path(d, f"_delta_log/$v%020d.json")
    assert(fs(d).delete(p, false), s"fixture bug: $p absent")
  }

  test("v2 checkpoint (parquet top-level, 2 sidecars) reads a " +
      "checkpoint-truncated table with DV descriptors intact") {
    val (d, all) = mkTable("v2cp")
    DeltaCompat.writeDeletionVectors(spark, d, col("id") % 3 === 0)
    val cpV = DeltaCompat.checkpointV2(spark, d, numSidecars = 2)
    assert(cpV == 1L)
    // the log dir now has the UUID-named top-level + 2 sidecars
    val logLs = fs(d).listStatus(new Path(d, "_delta_log"))
      .map(_.getPath.getName)
    assert(logLs.exists(
      _.matches("""0{19}1\.checkpoint\.[0-9a-f-]{36}\.parquet""")),
      logLs.mkString(","))
    assert(fs(d).listStatus(new Path(d, "_delta_log/_sidecars"))
      .count(_.getPath.getName.endsWith(".parquet")) == 2)
    // truncate ALL JSON history: only the v2 checkpoint remains
    deleteJson(d, 0L); deleteJson(d, 1L)
    val want = all.filterNot(_ % 3 == 0)
    assert(DeltaCompat.read(spark, d).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == want,
      "v2 checkpoint replay must carry files AND their DVs")
    // the replayed protocol now declares the feature
    assert(DeltaCompat.snapshot(spark, d).protocolJson
      .contains("v2Checkpoint"))
    // write-after-v2-checkpoint: a fresh MoR delete commits as JSON
    // v2 on top of the checkpoint base and reads back
    DeltaCompat.writeDeletionVectors(spark, d, col("id") % 5 === 2)
    val want2 = want.filterNot(_ % 5 == 2)
    assert(DeltaCompat.read(spark, d).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == want2)
    // time travel pinned AT the checkpoint version still works
    assert(DeltaCompat.read(spark, d, asOfVersion = Some(1L))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == want)
  }

  test("v2 checkpoint json top-level with INLINE file actions " +
      "(numSidecars = 0) reads identically") {
    val (d, all) = mkTable("v2cpjson")
    DeltaCompat.checkpointV2(spark, d, numSidecars = 0,
      format = "json")
    val logLs = fs(d).listStatus(new Path(d, "_delta_log"))
      .map(_.getPath.getName)
    assert(logLs.exists(
      _.matches("""0{20}\.checkpoint\.[0-9a-f-]{36}\.json""")),
      logLs.mkString(","))
    assert(!fs(d).exists(new Path(d, "_delta_log/_sidecars")),
      "inline layout must not write sidecars")
    deleteJson(d, 0L)
    assert(DeltaCompat.read(spark, d).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == all.sorted)
  }

  test("a referenced-but-missing sidecar is a loud torn-checkpoint " +
      "error, not a silent partial read") {
    val (d, _) = mkTable("v2cptorn")
    DeltaCompat.checkpointV2(spark, d, numSidecars = 2)
    deleteJson(d, 0L)
    val sc = fs(d).listStatus(new Path(d, "_delta_log/_sidecars"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    assert(fs(d).delete(sc, false))
    val e = intercept[IllegalArgumentException] {
      DeltaCompat.read(spark, d).count()
    }
    assert(e.getMessage.contains("sidecar") &&
      e.getMessage.contains("torn"), e.getMessage)
  }

  test("checkpointMetadata version must match the file name") {
    val (d, _) = mkTable("v2cpver")
    DeltaCompat.checkpointV2(spark, d, numSidecars = 0)
    val logDir = new Path(d, "_delta_log")
    val cp = fs(d).listStatus(logDir).map(_.getPath)
      .find(_.getName.contains(".checkpoint.")).get
    // masquerade the v0 checkpoint as v1 (declared version inside
    // stays 0) — with a fake 1.json so version 1 is reachable
    val renamed = new Path(logDir,
      cp.getName.replaceFirst("^0{20}", "0" * 19 + "1"))
    assert(fs(d).rename(cp, renamed))
    val out = fs(d).create(new Path(logDir, f"${1L}%020d.json"), true)
    try out.write("""{"commitInfo":{"operation":"noop"}}"""
      .getBytes("UTF-8")) finally out.close()
    deleteJson(d, 0L)
    val e = intercept[IllegalArgumentException] {
      DeltaCompat.read(spark, d).count()
    }
    assert(e.getMessage.contains("declares version"), e.getMessage)
  }

  test("feature COMPOSITION: a column-mapped table with deletion " +
      "vectors reads through a v2 checkpoint after log truncation") {
    import spark.implicits._
    val d = tmpDir("v2cpcombo") + "/tbl"
    val rows = (1L to 80L).map(i => (i, if (i % 2 == 0) "e" else "o"))
    DeltaCompat.writeTable(rows.toDF("id", "k").repartition(1), d,
      partitionBy = Seq("k"), columnMapping = true)
    DeltaCompat.writeDeletionVectors(spark, d, col("id") % 5 === 0)
    DeltaCompat.checkpointV2(spark, d, numSidecars = 2)
    deleteJson(d, 0L); deleteJson(d, 1L)
    val want = (1L to 80L).filterNot(_ % 5 == 0)
    assert(DeltaCompat.read(spark, d).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == want,
      "mapped physical->logical projection + DVs must survive the " +
        "v2 checkpoint round-trip")
    // the upgraded protocol keeps BOTH prior features next to
    // v2Checkpoint (a downgrade would break other readers)
    val proto = DeltaCompat.snapshot(spark, d).protocolJson
    Seq("deletionVectors", "columnMapping", "v2Checkpoint").foreach(f =>
      assert(proto.contains(f), s"$f missing from $proto"))
  }

  test("a complete classic checkpoint at the same version is " +
      "preferred over the v2 one") {
    val (d, all) = mkTable("v2cppref")
    DeltaCompat.checkpoint(spark, d)
    DeltaCompat.checkpointV2(spark, d, numSidecars = 1)
    // corrupt every v2 SIDECAR: if the reader preferred the v2 file
    // it would die on these; the classic path must not touch them
    fs(d).listStatus(new Path(d, "_delta_log/_sidecars"))
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
      .foreach { p =>
        fs(d).delete(p, false)
        val out = fs(d).create(p, true)
        try out.write("not parquet".getBytes("UTF-8"))
        finally out.close()
      }
    deleteJson(d, 0L)
    assert(DeltaCompat.read(spark, d).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == all.sorted)
  }
}
