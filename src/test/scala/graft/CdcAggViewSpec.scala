package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.lakehouse.{CdcAggView, ChangeFeed, MaterializedAgg, VersionedTable}

/** CDC-maintained grouped aggregates with retractions: every sync
  * must leave the view equal to a from-scratch aggregation of the
  * CURRENT source — through updates, deletes, group moves, emptied
  * groups, and crash-replayed ranges. */
class CdcAggViewSpec extends SparkSpec {

  private val spec = MaterializedAgg.Spec(Seq("grp"), Seq("v"))

  private def scratch(src: String): Map[String, (Long, Double)] =
    VersionedTable.read(spark, src)
      .groupBy("grp")
      .agg(count(lit(1)).as("cnt"),
        sum(col("v").cast(graft.util.Exact.Dec)).cast("double").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

  private def view(root: String): Map[String, (Long, Double)] =
    CdcAggView.read(spark, root, spec)
      .select("grp", "cnt", "sum_v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

  test("syncs equal from-scratch aggregation through updates and deletes") {
    import spark.implicits._
    val src = tmpDir("cavsrc") + "/src"
    val v = tmpDir("cavview") + "/view"
    VersionedTable.init(spark, src,
      (0L until 100L).map(k => (k, s"g${k % 5}", k.toDouble)).toDF("k", "grp", "v"),
      keepVersions = 16)
    // bootstrap
    assert(CdcAggView.sync(spark, src, v, spec, keepVersions = 16).nonEmpty)
    assert(view(v) == scratch(src))
    // caught up
    assert(CdcAggView.sync(spark, src, v, spec).isEmpty)
    // group moves + value changes + deletes + inserts, then one sync
    VersionedTable.upsertByKey(spark, src,
      Seq((1L, "g9", 1000.0), (2L, "g0", 0.5), (200L, "g9", 7.0))
        .toDF("k", "grp", "v"),
      Seq("k"), keepVersions = 16)
    VersionedTable.deleteWhere(spark, src, col("k").between(10L, 30L),
      keepVersions = 16)
    assert(CdcAggView.sync(spark, src, v, spec, keepVersions = 16).nonEmpty)
    assert(view(v) == scratch(src))
    // empty a whole group: its row must disappear from the view
    VersionedTable.deleteWhere(spark, src, col("grp") === "g9",
      keepVersions = 16)
    assert(CdcAggView.sync(spark, src, v, spec, keepVersions = 16).nonEmpty)
    val after = view(v)
    assert(!after.contains("g9") && after == scratch(src))
  }

  test("crash-replayed range converges; HLL specs are refused") {
    import spark.implicits._
    val src = tmpDir("cavcrash") + "/src"
    val v = tmpDir("cavcrashv") + "/view"
    VersionedTable.init(spark, src,
      (0L until 50L).map(k => (k, s"g${k % 3}", 1.0)).toDF("k", "grp", "v"),
      keepVersions = 16)
    CdcAggView.sync(spark, src, v, spec, keepVersions = 16)
    VersionedTable.upsertByKey(spark, src,
      Seq((0L, "g1", 5.0)).toDF("k", "grp", "v"), Seq("k"), keepVersions = 16)
    VersionedTable.deleteByKey(spark, src, Seq(1L, 4L).toDF("k"),
      Seq("k"), keepVersions = 16)
    CdcAggView.sync(spark, src, v, spec, keepVersions = 16)
    assert(view(v) == scratch(src))
    // crash window: applied but position PUT lost → replay must skip
    // the already-stamped apply and converge
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(v),
      spark.sparkContext.hadoopConfiguration)
    val markers = fs.listStatus(new Path(s"$v/_cdc/_pos"))
    fs.delete(markers.maxBy(_.getPath.getName.toLong).getPath, false)
    assert(CdcAggView.sync(spark, src, v, spec, keepVersions = 16).nonEmpty)
    assert(view(v) == scratch(src))
    intercept[IllegalArgumentException] {
      CdcAggView.sync(spark, src, v,
        MaterializedAgg.Spec(Seq("grp"), Seq("v"), distincts = Seq("k")))
    }
    // the position restored: a normal sync is caught up again
    assert(ChangeFeed.position(spark, s"$v/_cdc").contains(
      VersionedTable.currentVersion(spark, src).get))
    // the SQL console twin drives the same sync
    VersionedTable.upsertByKey(spark, src,
      Seq((2L, "g0", 9.0)).toDF("k", "grp", "v"), Seq("k"), keepVersions = 16)
    val (res, _) = graft.lakehouse.SqlRunner.callProc(spark,
      "graft_sync_agg", Seq(src, v, "grp", "v"))
    assert(res.head.getLong(1) ==
      VersionedTable.currentVersion(spark, src).get)
    assert(view(v) == scratch(src))
  }
}
