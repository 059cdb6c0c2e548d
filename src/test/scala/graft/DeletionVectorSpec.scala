package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.lakehouse.{Maintenance, VersionedTable}

/** Merge-on-read deletion vectors: DELETE as a position-list sidecar +
  * one manifest PUT instead of file rewrites — `VersionedTable
  * .deleteWhere` / `deleteAndAppend`, the DV-applied read paths, the
  * carry/purge rules, and the SQL `mor` mode. */
class DeletionVectorSpec extends SparkSpec {

  private def fs(root: String) =
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration)

  /** 4000 rows ranged into 4 files on k, with stats + bloom payload. */
  private def initTable(prefix: String): String = {
    val root = tmpDir(prefix) + "/t"
    val df = spark.range(0, 4000).toDF("k")
      .select(col("k"), (col("k") % 97L).as("v"))
    VersionedTable.commit(spark, root, keepVersions = 8,
      statsCols = Seq("k"), bloomCols = Seq("k")) { stage =>
      df.repartitionByRange(4, col("k"))
        .sortWithinPartitions("k").write.parquet(stage)
    }
    root
  }

  test("deleteWhere hides rows behind a vector without touching data files") {
    val root = initTable("dvbase")
    val v1Files = VersionedTable.currentFiles(spark, root)
    val v1Bytes = v1Files.map(f =>
      fs(root).getFileStatus(new Path(s"$root/$f")).getLen).sum
    val deleted = VersionedTable.deleteWhere(spark, root,
      col("k") % 100L === 7L, keepVersions = 8)
    assert(deleted == 40L)
    // every data file carried by reference, byte-identical
    val v2Files = VersionedTable.filesOf(spark, root, 2L).get
    assert(v2Files.toSet == v1Files.toSet, "a data file was rewritten")
    assert(v2Files.map(f => fs(root).getFileStatus(
      new Path(s"$root/$f")).getLen).sum == v1Bytes)
    // reads hide the rows; time travel still serves the pre-delete set
    assert(VersionedTable.read(spark, root).count() == 3960)
    assert(VersionedTable.read(spark, root)
      .filter(col("k") === 107L).count() == 0)
    assert(VersionedTable.readVersion(spark, root, 1L).count() == 4000)
    // the manifest records per-file counts summing to the delete
    val dv = VersionedTable.deleteVectors(spark, root, 2L)
    assert(dv.nonEmpty && dv.values.map(_._2).sum == 40L)
    // stats/blooms carried: point lookup still prunes AND hides
    assert(VersionedTable.readPointLookup(spark, root, "k", 107L).count() == 0)
    assert(VersionedTable.readPointLookup(spark, root, "k", 108L).count() == 1)
  }

  test("second delete consolidates vectors; no-op delete commits nothing") {
    val root = initTable("dvcompose")
    VersionedTable.deleteWhere(spark, root, col("k") < 10L, keepVersions = 8)
    val d2 = VersionedTable.deleteWhere(spark, root,
      col("k") < 20L, keepVersions = 8)
    assert(d2 == 10L, "already-hidden rows were re-deleted")
    assert(VersionedTable.read(spark, root).count() == 3980)
    // all lines point at the newest consolidated vector object
    val dv = VersionedTable.deleteVectors(spark, root, 3L)
    assert(dv.values.map(_._1).toSet == Set("_v-3/dv-3.parquet"))
    assert(dv.values.map(_._2).sum == 20L)
    // deleting nothing commits no new version
    val d3 = VersionedTable.deleteWhere(spark, root, col("k") < 20L)
    assert(d3 == 0L &&
      VersionedTable.currentVersion(spark, root).contains(3L))
  }

  test("appendDelta and rollback carry vectors — deletes never resurrect") {
    import spark.implicits._
    val root = initTable("dvcarry")
    VersionedTable.deleteWhere(spark, root, col("k") < 100L, keepVersions = 8)
    VersionedTable.appendDelta(spark, root, keepVersions = 8) { stage =>
      Seq(9001L -> 1L).toDF("k", "v").coalesce(1).write.parquet(stage)
    }
    assert(VersionedTable.read(spark, root).count() == 3901)
    assert(VersionedTable.read(spark, root)
      .filter(col("k") < 100L).count() == 0)
    // rollback to the vectored version re-references its dv line too
    val rb = VersionedTable.rollback(spark, root, 2L, keepVersions = 8)
    assert(VersionedTable.readVersion(spark, root, rb).count() == 3900)
    assert(VersionedTable.deleteVectors(spark, root, rb)
      .values.map(_._2).sum == 100L)
  }

  test("compaction purges vectors for rewritten files, carries the rest") {
    import spark.implicits._
    // bigger base so the 4 ranged files clear the small-file threshold
    val root = tmpDir("dvcompact") + "/t"
    VersionedTable.commit(spark, root, keepVersions = 8,
      statsCols = Seq("k")) { stage =>
      spark.range(0, 40000).toDF("k")
        .select(col("k"), (col("k") % 97L).as("v"))
        .repartitionByRange(4, col("k"))
        .sortWithinPartitions("k").write.parquet(stage)
    }
    // two tiny appended files so compaction has something to pack
    VersionedTable.appendDelta(spark, root, keepVersions = 8) { stage =>
      Seq(90001L -> 1L).toDF("k", "v").coalesce(1).write.parquet(stage)
    }
    VersionedTable.appendDelta(spark, root, keepVersions = 8) { stage =>
      Seq(90002L -> 2L).toDF("k", "v").coalesce(1).write.parquet(stage)
    }
    // hide one appended row and a slice of the big files
    VersionedTable.deleteWhere(spark, root,
      col("k") === 90001L || col("k") < 50L, keepVersions = 8)
    val visible = VersionedTable.read(spark, root).count()
    assert(visible == 40002 - 51)
    val (packed, written) = Maintenance.compactSmallFiles(spark, root,
      smallFileBytes = 16L << 10, statsCols = Seq("k"), keepVersions = 8)
    assert(packed == 2 && written == 1)
    // same visible rows; the tiny files' vector rows purged, the big
    // carried files keep theirs
    assert(VersionedTable.read(spark, root).count() == visible)
    assert(VersionedTable.read(spark, root)
      .filter(col("k") === 90001L).count() == 0)
    val dv = VersionedTable.deleteVectors(spark, root,
      VersionedTable.currentVersion(spark, root).get)
    assert(dv.values.map(_._2).sum == 50L)
    assert(dv.keys.forall(_.startsWith("_v-1/")))
  }

  test("purgeDeletes materializes vectors; full rewrite also purges") {
    val root = initTable("dvpurge")
    VersionedTable.deleteWhere(spark, root,
      col("k") >= 1000L && col("k") < 1100L, keepVersions = 8)
    val files = VersionedTable.currentFiles(spark, root)
    val clean = files.filterNot(
      VersionedTable.deleteVectors(spark, root, 2L).contains)
    val rewritten = Maintenance.purgeDeletes(spark, root,
      keepVersions = 8, statsCols = Seq("k"))
    assert(rewritten == files.size - clean.size && rewritten > 0)
    val v3 = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.deleteVectors(spark, root, v3).isEmpty)
    assert(VersionedTable.read(spark, root).count() == 3900)
    // clean files carried by reference through the purge
    assert(clean.toSet.subsetOf(
      VersionedTable.filesOf(spark, root, v3).get.toSet))
    // a full rewrite on a fresh vectored table purges too
    val root2 = initTable("dvpurge2")
    VersionedTable.deleteWhere(spark, root2, col("k") < 5L)
    VersionedTable.rewrite(spark, root2, keepVersions = 8)(df => df)
    val v = VersionedTable.currentVersion(spark, root2).get
    assert(VersionedTable.deleteVectors(spark, root2, v).isEmpty)
    assert(VersionedTable.read(spark, root2).count() == 3995)
  }

  test("metadata counts and pruned reads subtract vectors exactly") {
    val root = initTable("dvcount")
    VersionedTable.deleteWhere(spark, root,
      col("k") >= 100L && col("k") < 150L, keepVersions = 8)
    // fully-contained range (one whole file at most): exact, and the
    // contained file answers from metadata (k is null-free)
    val truth = VersionedTable.read(spark, root)
      .filter(col("k") >= 0L && col("k") <= 999L).count()
    val (n, scanned) = VersionedTable.countWhere(spark, root, "k", 0L, 999L)
    assert(n == truth && truth == 950L)
    // boundary-crossing range: the scan half applies vectors too
    val truth2 = VersionedTable.read(spark, root)
      .filter(col("k") >= 120L && col("k") <= 2100L).count()
    val (n2, _) = VersionedTable.countWhere(spark, root, "k", 120L, 2100L)
    assert(n2 == truth2)
    val (nAll, _) = VersionedTable.countWhereAll(spark, root,
      Seq(("k", 0L, 3999L), ("v", 0L, 96L)))
    assert(nAll == 3950L)
    // readPruned plans files; the caller applies the exact row filter
    assert(VersionedTable.readPruned(spark, root, "k", 100L, 149L)
      .filter(col("k").between(100L, 149L)).count() == 0)
    assert(VersionedTable.readPruned(spark, root, "k", 100L, 159L)
      .filter(col("k").between(100L, 159L)).count() == 10)
  }

  test("changes() reports MoR deletes as CDC deletes") {
    val root = initTable("dvcdc")
    VersionedTable.deleteWhere(spark, root, col("k") === 42L, keepVersions = 8)
    val ch = VersionedTable.changes(spark, root, 1L, 2L).collect()
    assert(ch.length == 1)
    assert(ch.head.getAs[String]("_change_type") == "delete")
    assert(ch.head.getAs[Long]("k") == 42L)
  }

  test("vacuum never reclaims a dir pinned only by a vector reference") {
    val root = initTable("dvvac")
    VersionedTable.deleteWhere(spark, root, col("k") < 10L, keepVersions = 8)
    val deleted = VersionedTable.vacuum(spark, root, olderThanMs = 0L)
    assert(deleted.isEmpty)
    assert(VersionedTable.read(spark, root).count() == 3990)
  }

  test("SQL mor mode: DELETE / UPDATE / MERGE commit vectors, not rewrites") {
    import spark.implicits._
    val root = initTable("dvsql")
    val v1Files = VersionedTable.currentFiles(spark, root)
    spark.conf.set("spark.graft.dml.mode", "mor")
    spark.conf.set("spark.graft.dml.keepVersions", "8")
    try {
      val del = spark.sql(s"DELETE FROM graft.`$root` WHERE k < 40")
        .collect().head.getLong(0)
      assert(del == 40L)
      assert(VersionedTable.currentFiles(spark, root).toSet == v1Files.toSet)
      assert(VersionedTable.read(spark, root).count() == 3960)

      // UPDATE: old images vector-hide, new images append as one file
      val upd = spark.sql(
        s"UPDATE graft.`$root` SET v = v + 1000 WHERE k >= 40 AND k < 45")
        .collect().head.getLong(0)
      assert(upd == 5L)
      val after = VersionedTable.read(spark, root)
      assert(after.count() == 3960)
      assert(after.filter(col("k") === 41L).select("v")
        .head.getLong(0) == 41L % 97L + 1000L)
      assert(v1Files.toSet.subsetOf(
        VersionedTable.currentFiles(spark, root).toSet))

      // MERGE upsert: matched rows hide + re-land, unmatched insert
      Seq((50L, 5000L), (99999L, 1L)).toDF("k", "v")
        .createOrReplaceTempView("dv_merge_src")
      val m = spark.sql(
        s"""MERGE INTO graft.`$root` t USING dv_merge_src s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *""").collect().head
      assert(m.getLong(0) == 1L) // one matched target row
      val m2 = VersionedTable.read(spark, root)
      assert(m2.count() == 3961)
      assert(m2.filter(col("k") === 50L).select("v").head.getLong(0) == 5000L)

      // cow mode still the default elsewhere: bad mode fails loudly
      spark.conf.set("spark.graft.dml.mode", "nope")
      intercept[Exception] {
        spark.sql(s"DELETE FROM graft.`$root` WHERE k < 0").collect()
      }
    } finally {
      spark.conf.unset("spark.graft.dml.mode")
      spark.conf.unset("spark.graft.dml.keepVersions")
    }
  }

  test("graft_purge_deletes proc materializes vectors from a SQL console") {
    import graft.lakehouse.SqlRunner
    val root = initTable("dvproc")
    VersionedTable.deleteWhere(spark, root, col("k") < 30L, keepVersions = 8)
    val (res, _) = SqlRunner.callProc(spark, "graft_purge_deletes",
      Seq(root, "8"))
    assert(res.head.getLong(0) >= 1L)
    val v = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.deleteVectors(spark, root, v).isEmpty)
    assert(VersionedTable.read(spark, root).count() == 3970)
  }

  test("CoW DML over a vectored table purges what it rewrites") {
    val root = initTable("dvcow")
    spark.conf.set("spark.graft.dml.keepVersions", "8")
    try {
      spark.conf.set("spark.graft.dml.mode", "mor")
      spark.sql(s"DELETE FROM graft.`$root` WHERE k = 123")
      spark.conf.set("spark.graft.dml.mode", "cow")
      // CoW delete in the same k-range rewrites that file DV-applied:
      // its vector line drops, the other files' (none) stay consistent
      spark.sql(s"DELETE FROM graft.`$root` WHERE k = 124")
      val v = VersionedTable.currentVersion(spark, root).get
      assert(VersionedTable.deleteVectors(spark, root, v).isEmpty)
      val df = VersionedTable.read(spark, root)
      assert(df.count() == 3998)
      assert(df.filter(col("k").isin(123L, 124L)).count() == 0)
    } finally {
      spark.conf.unset("spark.graft.dml.mode")
      spark.conf.unset("spark.graft.dml.keepVersions")
    }
  }
}
