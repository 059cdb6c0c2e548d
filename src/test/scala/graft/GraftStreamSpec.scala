package graft

import org.apache.spark.sql.functions._

import graft.lakehouse.VersionedTable

/** Streaming halves of `format("graft")`: the version-offset CDC
  * source and the exactly-once commit-protocol sink. */
class GraftStreamSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  test("readStream format(graft): backfill + appends + keyed updates as CDC") {
    val root = tmpDir("gstream-src") + "/t"
    import spark.implicits._
    VersionedTable.init(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), keepVersions = 10)
    val q = spark.readStream.format("graft")
      .option("startingVersion", "earliest")
      .option("keyCols", "id")
      .load(root)
      .writeStream.format("memory").queryName("gsrc_cdc").start()
    try {
      q.processAllAvailable()
      val backfill = spark.table("gsrc_cdc").collect()
      assert(backfill.map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(_._1).toSeq ==
        Seq((1L, "a", "insert"), (2L, "b", "insert")))
      // append-only commit => inserts
      VersionedTable.appendDelta(spark, root, keepVersions = 10) { st =>
        Seq((3L, "c")).toDF("id", "s").write.parquet(st)
      }
      q.processAllAvailable()
      assert(spark.table("gsrc_cdc")
        .filter(col("id") === 3L && col("_change_type") === "insert")
        .count() == 1)
      // keyed upsert => update_preimage + update_postimage
      VersionedTable.upsertByKey(spark, root,
        Seq((2L, "B")).toDF("id", "s"), Seq("id"), keepVersions = 10)
      q.processAllAvailable()
      // cumulative feed for key 2: the backfill insert, then the
      // upsert's pre/post images
      val upd = spark.table("gsrc_cdc").filter(col("id") === 2L)
        .select("s", "_change_type").collect()
        .map(r => (r.getString(0), r.getString(1))).sortBy(_._2).toSeq
      assert(upd == Seq(("b", "insert"), ("B", "update_postimage"),
        ("b", "update_preimage")), upd.toString)
    } finally q.stop()
  }

  test("cdc=false drops the change column and emits only inserts") {
    val root = tmpDir("gstream-ins") + "/t"
    import spark.implicits._
    VersionedTable.init(spark, root,
      Seq((1L, "a")).toDF("id", "s"), keepVersions = 10)
    val stream = spark.readStream.format("graft")
      .option("startingVersion", "earliest").option("cdc", "false")
      .load(root)
    assert(stream.schema.fieldNames.toSeq == Seq("id", "s"))
    val q = stream.writeStream.format("memory")
      .queryName("gsrc_ins").start()
    try {
      q.processAllAvailable()
      // a delete commits a new version whose net diff is delete-only:
      // the insert view must stay unchanged
      VersionedTable.deleteWhere(spark, root, col("id") === 1L,
        keepVersions = 10)
      VersionedTable.appendDelta(spark, root, keepVersions = 10) { st =>
        Seq((5L, "e")).toDF("id", "s").write.parquet(st)
      }
      q.processAllAvailable()
      assert(spark.table("gsrc_ins").collect().map(_.getLong(0)).sorted
        .toSeq == Seq(1L, 5L))
    } finally q.stop()
  }

  test("table -> stream -> table mirror: graft source into graft sink, exactly-once across restart") {
    val base = tmpDir("gstream-mirror")
    val src = s"$base/src"
    val dst = s"$base/dst"
    val ckpt = s"$base/ckpt"
    import spark.implicits._
    VersionedTable.init(spark, src,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), keepVersions = 20)
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream.format("graft")
        .option("startingVersion", "earliest").option("cdc", "false")
        .load(src)
        .writeStream.format("graft")
        .option("statsCols", "id")
        .option("checkpointLocation", ckpt)
        .start(dst)
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()
    assert(VersionedTable.read(spark, dst).as[(Long, String)].collect()
      .sortBy(_._1).toSeq == Seq((1L, "a"), (2L, "b")))
    // sink commits carry manifest stats => skipping-ready mirror
    assert(VersionedTable.manifestStats(spark, dst,
      VersionedTable.currentVersion(spark, dst).get).nonEmpty)
    // restart with the same checkpoint: nothing re-lands
    val v1 = VersionedTable.currentVersion(spark, dst).get
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()
    assert(VersionedTable.currentVersion(spark, dst).get == v1)
    // new source commits flow through on the next incarnation
    VersionedTable.appendDelta(spark, src, keepVersions = 20) { st =>
      Seq((3L, "c")).toDF("id", "s").write.parquet(st)
    }
    val q3 = run()
    try q3.processAllAvailable() finally q3.stop()
    assert(VersionedTable.read(spark, dst).as[(Long, String)].collect()
      .sortBy(_._1).toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // each landed micro-batch stamped its id atomically with the version
    assert(VersionedTable.lastFoldedBatch(spark, dst).nonEmpty)
  }

  test("upsert sink mode: streamed change images land as O(batch) MoR upserts") {
    val base = tmpDir("gstream-upsert")
    val src = s"$base/src"
    val dst = s"$base/dst"
    import spark.implicits._
    VersionedTable.init(spark, src,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), keepVersions = 20)
    VersionedTable.init(spark, dst,
      Seq((2L, "OLD"), (9L, "z")).toDF("id", "s"), keepVersions = 20)
    val q = spark.readStream.format("graft")
      .option("startingVersion", "earliest").option("cdc", "false")
      .load(src)
      .writeStream.format("graft")
      .option("mode", "upsert").option("keyCols", "id")
      .option("checkpointLocation", s"$base/ckpt")
      .start(dst)
    try q.processAllAvailable() finally q.stop()
    // batch keys replaced their images, untouched keys survive
    assert(VersionedTable.read(spark, dst).as[(Long, String)].collect()
      .sortBy(_._1).toSeq == Seq((1L, "a"), (2L, "b"), (9L, "z")))
    // the upsert committed equality deletes, not a table rewrite
    assert(VersionedTable.equalityDeletes(spark, dst,
      VersionedTable.currentVersion(spark, dst).get).nonEmpty)
  }

  test("compaction is CDC-invisible: rewrite commits produce empty change batches") {
    val root = tmpDir("gstream-compact") + "/t"
    import spark.implicits._
    VersionedTable.init(spark, root,
      (1L to 40L).map(i => (i, s"s$i")).toDF("id", "s"), keepVersions = 10)
    val q = spark.readStream.format("graft")
      .load(root) // changes after stream start only
      .writeStream.format("memory").queryName("gsrc_compact").start()
    try {
      q.processAllAvailable()
      // an identity rewrite commits a NEW version with every row in
      // fresh files — the net diff must be empty (no spurious CDC)
      VersionedTable.rewrite(spark, root, keepVersions = 10)(df => df)
      q.processAllAvailable()
      assert(spark.table("gsrc_compact").isEmpty)
      // a real change after the rewrite still flows
      VersionedTable.appendDelta(spark, root, keepVersions = 10) { st =>
        Seq((99L, "x")).toDF("id", "s").write.parquet(st)
      }
      q.processAllAvailable()
      assert(spark.table("gsrc_compact").collect()
        .map(r => (r.getLong(0), r.getString(2))).toSeq ==
        Seq((99L, "insert")))
    } finally q.stop()
  }

  test("maxVersionsPerBatch paces a backlog across multiple micro-batches") {
    val root = tmpDir("gstream-pace") + "/t"
    import spark.implicits._
    VersionedTable.init(spark, root,
      Seq((0L, "base")).toDF("id", "s"), keepVersions = 12)
    for (i <- 1L to 5L) // backlog: versions 2..6 before the stream starts
      VersionedTable.appendDelta(spark, root, keepVersions = 12) { st =>
        Seq((i, s"v$i")).toDF("id", "s").write.parquet(st)
      }
    val q = spark.readStream.format("graft")
      .option("startingVersion", "1") // changes after v1
      .option("maxVersionsPerBatch", "2")
      .load(root)
      .writeStream.format("memory").queryName("gsrc_pace").start()
    try {
      q.processAllAvailable()
      // everything arrived...
      assert(spark.table("gsrc_pace").collect().map(_.getLong(0)).sorted
        .toSeq == (1L to 5L))
      // ...across >= ceil(5/2) = 3 paced batches, not one giant one
      val fed = q.recentProgress.count(_.numInputRows > 0)
      assert(fed >= 3, s"expected >=3 paced batches, got $fed")
    } finally q.stop()
  }

  test("a running stream survives an upstream ALTER: declared schema stays stable") {
    val root = tmpDir("gstream-alter") + "/t"
    import spark.implicits._
    VersionedTable.init(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), keepVersions = 10)
    val q = spark.readStream.format("graft")
      .option("startingVersion", "earliest")
      .option("keyCols", "id")
      .load(root)
      .writeStream.format("memory").queryName("gsrc_alter").start()
    try {
      q.processAllAvailable()
      // upstream renames s -> label and adds a column, then inserts
      VersionedTable.renameColumn(spark, root, "s", "label",
        keepVersions = 10)
      VersionedTable.addColumn(spark, root, "note",
        org.apache.spark.sql.types.StringType, keepVersions = 10)
      spark.conf.set("spark.graft.dml.keepVersions", "10")
      try spark.sql(s"INSERT INTO graft.`$root` VALUES (3, 'c', 'n3')")
      finally spark.conf.unset("spark.graft.dml.keepVersions")
      q.processAllAvailable()
      // the stream still speaks its declared (pre-ALTER) schema: the
      // renamed column's values arrive under the OLD name; the added
      // column stays invisible
      val t = spark.table("gsrc_alter")
      assert(t.columns.toSeq == Seq("id", "s", "_change_type"))
      assert(t.filter(col("id") === 3L).select("s").head.getString(0)
        == "c")
      // a RESTARTED stream (fresh declared schema) sees the new shape
      q.stop()
      val q2 = spark.readStream.format("graft")
        .option("startingVersion", "earliest").option("keyCols", "id")
        .load(root)
        .writeStream.format("memory").queryName("gsrc_alter2").start()
      try {
        q2.processAllAvailable()
        val t2 = spark.table("gsrc_alter2")
        assert(t2.columns.toSeq ==
          Seq("id", "label", "note", "_change_type"))
        assert(t2.filter(col("id") === 1L).select("label").head
          .getString(0) == "a")
      } finally q2.stop()
    } finally if (q.isActive) q.stop()
  }
}
