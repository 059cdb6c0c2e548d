package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.IcebergCompat

/** Iceberg FORMAT-VERSION 3 DELETION VECTORS (round 13): puffin-file
  * blobs ([len BE][magic D1 D3 39 64][RoaringBitmapArray portable]
  * [CRC-32 BE]) addressed from content=1 delete-manifest entries via
  * referenced_data_file + content_offset/content_size_in_bytes.
  * Covers write→read round trip, supersession-by-union (newest DV per
  * file wins, never stacks), time travel, the format-version upgrade,
  * puffin container layout, composition with equality deletes (the
  * eager read path), and the torn-vector loud rejection. */
class IcebergDvSpec extends SparkSpec {

  private def fs(d: String) =
    new Path(d).getFileSystem(spark.sessionState.newHadoopConf())

  private def mkTable(prefix: String): (String, Seq[Long]) = {
    import spark.implicits._
    val d = tmpDir(prefix) + "/tbl"
    val rows = (1L to 120L).map(i => (i, "big")) ++
      (200L to 205L).map(i => (i, "small"))
    IcebergCompat.writeTable(rows.toDF("id", "k").repartition(1), d,
      partitionBy = Seq("k"))
    (d, rows.map(_._1))
  }

  private def ids(d: String, asOf: Option[Long] = None): Seq[Long] =
    IcebergCompat.read(spark, d, asOfSnapshotId = asOf)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("v3 DVs: round trip, supersession UNION, time travel, and the " +
      "format-version upgrade") {
    val (d, all) = mkTable("icedv")
    val s2 = IcebergCompat.deleteVectors(spark, d, col("id") % 3 === 0)
    assert(s2 == 2L)
    val after1 = all.filterNot(_ % 3 == 0)
    assert(ids(d) == after1)
    // the metadata now declares format-version 3
    val metaTxt = {
      val hint = fs(d).open(new Path(d, "metadata/version-hint.text"))
      val v = try scala.io.Source.fromInputStream(hint, "UTF-8").mkString
        finally hint.close()
      val in = fs(d).open(new Path(d, s"metadata/v$v.metadata.json"))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    assert(metaTxt.contains("\"format-version\":3"), metaTxt)
    // supersession: the second DV commit carries the UNION per file
    // under a higher sequence; both snapshots' DVs stay live in the
    // manifests and the reader must pick the newest per file
    val s3 = IcebergCompat.deleteVectors(spark, d, col("id") % 5 === 2)
    assert(s3 == 3L)
    val after2 = after1.filterNot(_ % 5 == 2)
    assert(ids(d) == after2)
    val dvs = IcebergCompat.snapshot(spark, d).deletes
      .filter(_.dvRef.isDefined)
    assert(dvs.size > dvs.map(_.dvRef.get).distinct.size,
      "fixture must carry superseded DVs for the test to mean anything")
    // time travel to both sides of each DV commit
    assert(ids(d, Some(1L)) == all.sorted)
    assert(ids(d, Some(2L)) == after1)
    // puffin container layout: leading + trailing magic, LE payload
    // size, and footer blob offsets matching the manifest entries
    val puffin = new Path(d, "dv-3.puffin")
    val len = fs(d).getFileStatus(puffin).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs(d).open(puffin)
    try in.readFully(bytes) finally in.close()
    assert(new String(bytes, 0, 4, "UTF-8") == "PFA1")
    assert(new String(bytes, len - 4, 4, "UTF-8") == "PFA1")
    val payloadSize = java.nio.ByteBuffer.wrap(bytes, len - 12, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val payload = new String(bytes, len - 12 - payloadSize, payloadSize,
      "UTF-8")
    assert(payload.contains("\"deletion-vector-v1\""), payload)
    val newestOffsets = dvs.filter(_.seq == 3L).map(_.dvOffset.get).toSet
    newestOffsets.foreach(off =>
      assert(payload.contains(s""""offset":$off"""), payload))
  }

  test("v3 DVs compose with EQUALITY deletes (the eager read path) " +
      "and with sequence-ordered re-inserts") {
    import spark.implicits._
    val (d, all) = mkTable("icedveq")
    IcebergCompat.deleteVectors(spark, d, col("id") % 4 === 1)
    // equality delete of the 'small' partition values 200/201 at a
    // HIGHER sequence — forces the eager path WITH dvDels present
    IcebergCompat.deleteEquality(spark, d, Seq("id"),
      Seq(200L, 201L).toDF("id"))
    val want = all.filterNot(i => i % 4 == 1 || i == 200L || i == 201L)
    assert(ids(d) == want)
    // a re-insert ABOVE the equality delete survives it while the DV
    // keeps suppressing its file's positions
    IcebergCompat.appendTable(Seq((200L, "small")).toDF("id", "k"), d,
      partitionBy = Seq("k"))
    assert(ids(d) == (want :+ 200L).sorted)
  }

  test("a torn deletion vector rejects loudly (CRC verified on " +
      "executors)") {
    val (d, _) = mkTable("icedvtorn")
    IcebergCompat.deleteVectors(spark, d, col("id") % 3 === 0)
    val puffin = new Path(d, "dv-2.puffin")
    val len = fs(d).getFileStatus(puffin).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs(d).open(puffin)
    try in.readFully(bytes) finally in.close()
    bytes(10) = (bytes(10) ^ 0x7f).toByte // inside the first vector
    fs(d).delete(puffin, false)
    val out = fs(d).create(puffin, true)
    try out.write(bytes) finally out.close()
    val e = intercept[org.apache.spark.SparkException] {
      IcebergCompat.read(spark, d).count()
    }
    assert(e.getMessage.contains("DV") ||
      Option(e.getCause).exists(_.getMessage.contains("DV")), e.toString)
  }

  test("format-version 4 and v3 initial-default columns still reject " +
      "loudly") {
    import spark.implicits._
    val d = tmpDir("icedvbad") + "/tbl"
    IcebergCompat.writeTable(Seq((1L, "a")).toDF("id", "k"), d)
    val metaPath = new Path(d, "metadata/v1.metadata.json")
    val good = {
      val in = fs(d).open(metaPath)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    def rw(content: String): Unit = {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(d, "metadata/v1.metadata.json"), content)
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(d, "metadata/.v1.metadata.json.crc"))
    }
    rw(good.replace("\"format-version\":2", "\"format-version\":4"))
    val e1 = intercept[IllegalArgumentException] {
      IcebergCompat.read(spark, d).count() }
    assert(e1.getMessage.contains("format-version 4"))
    rw(good.replace("\"name\":\"id\",\"required\":true",
      "\"name\":\"id\",\"required\":true,\"initial-default\":7"))
    val e2 = intercept[IllegalArgumentException] {
      IcebergCompat.read(spark, d).count() }
    assert(e2.getMessage.contains("initial-default"))
  }
}
