package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.lakehouse.{ChangeFeed, VersionedTable}

/** Positioned CDC consumption (`ChangeFeed.drain`) and the MoR mirror
  * built on it: at-least-once range delivery via the existence-is-
  * commit position marker, idempotent application, O(changes)
  * maintenance. */
class ChangeFeedSpec extends SparkSpec {

  private def initSrc(prefix: String): String = {
    import spark.implicits._
    val root = tmpDir(prefix) + "/src"
    VersionedTable.init(spark,
      root, (0L until 100L).map(k => (k, k * 10L)).toDF("k", "v"),
      keepVersions = 16)
    root
  }

  test("cold start backfills the snapshot; caught-up drains are None") {
    val src = initSrc("cfcold")
    val consumer = tmpDir("cfcoldc") + "/c"
    var seen: Seq[(Long, String)] = Nil
    val r1 = ChangeFeed.drain(spark, src, consumer) { cdc =>
      seen = cdc.select("k", "_change_type").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
    }
    assert(r1.contains((0L, 1L)))
    assert(seen.size == 100 && seen.forall(_._2 == "insert"))
    assert(ChangeFeed.position(spark, consumer).contains(1L))
    assert(ChangeFeed.drain(spark, src, consumer)(_ => fail()).isEmpty)
  }

  test("drain delivers the net range; a throwing consumer re-delivers") {
    import spark.implicits._
    val src = initSrc("cfnet")
    val consumer = tmpDir("cfnetc") + "/c"
    ChangeFeed.drain(spark, src, consumer)(_.count())
    // one upsert + one delete + an insert-and-delete-inside-the-range
    VersionedTable.upsertByKey(spark, src,
      Seq((5L, 555L), (200L, 1L)).toDF("k", "v"), Seq("k"),
      keepVersions = 16)
    VersionedTable.appendDelta(spark, src, keepVersions = 16) { st =>
      Seq((300L, 3L)).toDF("k", "v").coalesce(1).write.parquet(st)
    }
    VersionedTable.deleteByKey(spark, src,
      Seq(7L, 300L).toDF("k"), Seq("k"), keepVersions = 16)
    // consumer crash: the position must NOT advance
    intercept[RuntimeException] {
      ChangeFeed.drain(spark, src, consumer, keyCols = Seq("k")) { _ =>
        throw new RuntimeException("sink down")
      }
    }
    assert(ChangeFeed.position(spark, consumer).contains(1L))
    // re-drain delivers the SAME net range: k=300 (inserted then
    // deleted inside the range) must not appear at all
    var got: Set[(Long, Long, String)] = Set.empty
    val r = ChangeFeed.drain(spark, src, consumer, keyCols = Seq("k")) { cdc =>
      got = cdc.collect().map(r => (r.getAs[Long]("k"),
        r.getAs[Long]("v"), r.getAs[String]("_change_type"))).toSet
    }
    assert(r.contains((1L, 4L)))
    assert(got == Set(
      (5L, 50L, "update_preimage"), (5L, 555L, "update_postimage"),
      (200L, 1L, "insert"), (7L, 70L, "delete")))
  }

  test("MoR mirror tracks the source at O(changes) with carried files") {
    import spark.implicits._
    val src = initSrc("cfmirror")
    val dst = tmpDir("cfmirrord") + "/dst"
    def same(): Boolean = {
      val a = VersionedTable.read(spark, src).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val b = VersionedTable.read(spark, dst).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      a == b
    }
    assert(ChangeFeed.mirror(spark, src, dst, Seq("k"),
      keepVersions = 16).nonEmpty)
    assert(same())
    // a round of source mutations, then one mirror drain
    VersionedTable.upsertByKey(spark, src,
      Seq((1L, 111L), (500L, 5L)).toDF("k", "v"), Seq("k"), keepVersions = 16)
    VersionedTable.deleteWhere(spark, src, col("k").between(90L, 95L),
      keepVersions = 16)
    val dstFilesBefore = VersionedTable.currentFiles(spark, dst).toSet
    assert(ChangeFeed.mirror(spark, src, dst, Seq("k"),
      keepVersions = 16).nonEmpty)
    assert(same())
    // the mirror commit was merge-on-read: every pre-existing dst data
    // file carried by reference, the changes landed as ED + append
    assert(dstFilesBefore.subsetOf(
      VersionedTable.currentFiles(spark, dst).toSet))
    val vd = VersionedTable.currentVersion(spark, dst).get
    assert(VersionedTable.equalityDeletes(spark, dst, vd).nonEmpty)
    // caught up: mirror again is a no-op
    assert(ChangeFeed.mirror(spark, src, dst, Seq("k")).isEmpty)
  }

  test("crash before the position PUT replays idempotently") {
    import spark.implicits._
    val src = initSrc("cfcrash")
    val dst = tmpDir("cfcrashd") + "/dst"
    ChangeFeed.mirror(spark, src, dst, Seq("k"), keepVersions = 16)
    VersionedTable.upsertByKey(spark, src,
      Seq((2L, 222L)).toDF("k", "v"), Seq("k"), keepVersions = 16)
    VersionedTable.deleteByKey(spark, src, Seq(3L).toDF("k"),
      Seq("k"), keepVersions = 16)
    ChangeFeed.mirror(spark, src, dst, Seq("k"), keepVersions = 16)
    // simulate the crash window: changes applied, position PUT lost
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dst),
      spark.sparkContext.hadoopConfiguration)
    val markers = fs.listStatus(new Path(s"$dst/_cdc/_pos"))
    fs.delete(markers.maxBy(_.getPath.getName.toLong).getPath, false)
    // the replayed range re-applies the SAME net changes — converges
    assert(ChangeFeed.mirror(spark, src, dst, Seq("k"),
      keepVersions = 16).nonEmpty)
    val a = VersionedTable.read(spark, src).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = VersionedTable.read(spark, dst).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }
}
