package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.lakehouse.{Maintenance, StreamingLoader, VersionedTable}

/** Merge-on-read EQUALITY deletes: DELETE/UPSERT as published key
  * tuples + one manifest PUT, with NO table scan at commit time —
  * `VersionedTable.deleteByKey` / `upsertByKey` /
  * `resolveEqualityDeletes`, the seq-scoped read paths, and the
  * streaming CDC upsert (`StreamingLoader.runVersionedUpsert`). */
class EqualityDeleteSpec extends SparkSpec {

  private def fs(root: String) =
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration)

  /** 4000 rows ranged into 4 files on k, with stats + bloom payload. */
  private def initTable(prefix: String): String = {
    val root = tmpDir(prefix) + "/t"
    VersionedTable.commit(spark, root, keepVersions = 8,
      statsCols = Seq("k"), bloomCols = Seq("k")) { stage =>
      spark.range(0, 4000).toDF("k")
        .select(col("k"), (col("k") % 97L).as("v"))
        .repartitionByRange(4, col("k"))
        .sortWithinPartitions("k").write.parquet(stage)
    }
    root
  }

  test("deleteByKey hides keys with zero data-file writes and no table scan") {
    import spark.implicits._
    val root = initTable("edbase")
    val v1Files = VersionedTable.currentFiles(spark, root)
    val v1Mtimes = v1Files.map(f =>
      f -> fs(root).getFileStatus(new Path(s"$root/$f")).getModificationTime)
    // null and duplicate key tuples are dropped before publishing
    val n = VersionedTable.deleteByKey(spark, root,
      (Seq(7L, 7L, 4200L) :+ -1L).toDF("k")
        .select(when(col("k") === -1L, lit(null)).otherwise(col("k")).as("k")),
      Seq("k"), keepVersions = 8)
    assert(n == 2L, "distinct non-null tuples published")
    // every data file carried by reference, bytes AND mtimes untouched
    // (an mtime change would mean the commit re-wrote or re-read-wrote
    // the file — the whole point is that it cannot afford to)
    assert(VersionedTable.filesOf(spark, root, 2L).get.toSet == v1Files.toSet)
    v1Mtimes.foreach { case (f, t) =>
      assert(fs(root).getFileStatus(
        new Path(s"$root/$f")).getModificationTime == t)
    }
    // the manifest line records ref, scope seq, key cols, tuple count
    val eds = VersionedTable.equalityDeletes(spark, root, 2L)
    assert(eds == Seq(VersionedTable.EqDelete(
      "_v-2/ed-2.parquet", 1L, Seq("k"), 2L)))
    // reads, point lookups and time travel all apply the delete
    assert(VersionedTable.read(spark, root).count() == 3999)
    assert(VersionedTable.read(spark, root).filter(col("k") === 7L).count() == 0)
    assert(VersionedTable.readPointLookup(spark, root, "k", 7L).count() == 0)
    assert(VersionedTable.readPointLookup(spark, root, "k", 8L).count() == 1)
    assert(VersionedTable.readVersion(spark, root, 1L).count() == 4000)
    // deleting an absent key publishes a tuple but hides nothing
    assert(VersionedTable.read(spark, root)
      .filter(col("k") === 4200L).count() == 0)
  }

  test("sequence scoping: a key re-inserted after the delete stays visible") {
    import spark.implicits._
    val root = initTable("edseq")
    VersionedTable.deleteByKey(spark, root, Seq(100L).toDF("k"),
      Seq("k"), keepVersions = 8)
    assert(VersionedTable.read(spark, root).filter(col("k") === 100L).count() == 0)
    // re-insert: the new row lands in a dir ABOVE the delete's scope
    VersionedTable.appendDelta(spark, root, keepVersions = 8) { stage =>
      Seq((100L, 777L)).toDF("k", "v").coalesce(1).write.parquet(stage)
    }
    val re = VersionedTable.read(spark, root).filter(col("k") === 100L)
    assert(re.count() == 1 && re.select("v").head.getLong(0) == 777L)
    // a SECOND delete (fresh scope) hides the re-inserted image too
    VersionedTable.deleteByKey(spark, root, Seq(100L).toDF("k"),
      Seq("k"), keepVersions = 8)
    assert(VersionedTable.read(spark, root).filter(col("k") === 100L).count() == 0)
    assert(VersionedTable.read(spark, root).count() == 3999)
    // key-column mismatch with the table's existing EDs refuses
    intercept[IllegalArgumentException] {
      VersionedTable.deleteByKey(spark, root, Seq(1L).toDF("v"), Seq("v"))
    }
  }

  test("upsertByKey lands a CDC batch in one commit, no scan, no rewrite") {
    import spark.implicits._
    val root = initTable("edup")
    val v1Files = VersionedTable.currentFiles(spark, root)
    // 3 updates + 2 inserts in one batch
    val batch = Seq((10L, 9010L), (20L, 9020L), (30L, 9030L),
      (5001L, 9001L), (5002L, 9002L)).toDF("k", "v")
    VersionedTable.upsertByKey(spark, root, batch, Seq("k"), keepVersions = 8)
    val now = VersionedTable.read(spark, root)
    assert(now.count() == 4002)
    assert(now.filter(col("k") === 20L).select("v").head.getLong(0) == 9020L)
    assert(now.filter(col("k") === 5002L).select("v").head.getLong(0) == 9002L)
    // all original files carried untouched; exactly the batch appended
    assert(v1Files.toSet.subsetOf(
      VersionedTable.currentFiles(spark, root).toSet))
    // ≡ a from-scratch MERGE of the same batch
    val expected = spark.range(0, 4000).toDF("k")
      .select(col("k"), (col("k") % 97L).as("v"))
      .join(batch.select(col("k")), Seq("k"), "left_anti")
      .unionByName(batch)
    assert(now.exceptAll(expected).isEmpty && expected.exceptAll(now).isEmpty)
    // a second upsert of the same keys converges (latest image wins)
    VersionedTable.upsertByKey(spark, root,
      Seq((20L, 11L)).toDF("k", "v"), Seq("k"), keepVersions = 8)
    val again = VersionedTable.read(spark, root)
    assert(again.count() == 4002)
    assert(again.filter(col("k") === 20L).select("v").head.getLong(0) == 11L)
    // duplicate-key and null-key batches refuse loudly
    intercept[IllegalArgumentException] {
      VersionedTable.upsertByKey(spark, root,
        Seq((1L, 1L), (1L, 2L)).toDF("k", "v"), Seq("k"))
    }
  }

  test("resolveEqualityDeletes converts keys to positions, reads unchanged") {
    import spark.implicits._
    val root = initTable("edresolve")
    VersionedTable.deleteByKey(spark, root,
      (0L until 50L).toDF("k"), Seq("k"), keepVersions = 8)
    VersionedTable.upsertByKey(spark, root,
      Seq((60L, 1L)).toDF("k", "v"), Seq("k"), keepVersions = 8)
    val before = VersionedTable.read(spark, root).orderBy("k").collect()
    val converted = VersionedTable.resolveEqualityDeletes(spark, root,
      keepVersions = 8)
    assert(converted == 51L, "50 deletes + 1 upsert pre-image")
    val v = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.equalityDeletes(spark, root, v).isEmpty)
    assert(VersionedTable.deleteVectors(spark, root, v)
      .values.map(_._2).sum == 51L)
    assert(VersionedTable.read(spark, root).orderBy("k").collect()
      .sameElements(before))
    // resolving again is a no-op
    assert(VersionedTable.resolveEqualityDeletes(spark, root) == 0L)
  }

  test("purgeDeletes materializes EDs end to end; metadata counts stay exact") {
    import spark.implicits._
    val root = initTable("edpurge")
    VersionedTable.deleteByKey(spark, root,
      (1000L until 1050L).toDF("k"), Seq("k"), keepVersions = 8)
    // ED-scoped files fall back to boundary scans — still exact
    val (n, scanned) = VersionedTable.countWhere(spark, root, "k", 0L, 999L)
    assert(n == 1000L && scanned > 0L,
      "ED scope must force the boundary scan")
    val (n2, _) = VersionedTable.countWhere(spark, root, "k", 900L, 1100L)
    assert(n2 == 151L)
    val (nAll, _) = VersionedTable.countWhereAll(spark, root,
      Seq(("k", 0L, 3999L), ("v", 0L, 96L)))
    assert(nAll == 3950L)
    // purge: resolve + rewrite only the vectored files
    val rewritten = Maintenance.purgeDeletes(spark, root,
      keepVersions = 8, statsCols = Seq("k"))
    assert(rewritten >= 1)
    val v = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.equalityDeletes(spark, root, v).isEmpty)
    assert(VersionedTable.deleteVectors(spark, root, v).isEmpty)
    assert(VersionedTable.read(spark, root).count() == 3950)
    // metadata-answered again after purge (zero boundary files)
    val (n3, scanned3) = VersionedTable.countWhere(spark, root, "k", 0L, 4000L)
    assert(n3 == 3950L && scanned3 == 0L)
  }

  test("full rewrite self-cleans ed lines through the scope filter") {
    import spark.implicits._
    val root = initTable("edgc")
    VersionedTable.deleteByKey(spark, root, Seq(1L, 2L).toDF("k"),
      Seq("k"), keepVersions = 8)
    VersionedTable.rewrite(spark, root, keepVersions = 8)(df => df)
    val v = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.equalityDeletes(spark, root, v).isEmpty,
      "every scoped file was rewritten — the line must drop")
    assert(VersionedTable.read(spark, root).count() == 3998)
    // compaction: rewritten small files materialize, carried files
    // keep the line in scope (bigger base so the 4 ranged files clear
    // the small-file threshold)
    val root2 = tmpDir("edgc2") + "/t"
    VersionedTable.commit(spark, root2, keepVersions = 8,
      statsCols = Seq("k")) { stage =>
      spark.range(0, 40000).toDF("k")
        .select(col("k"), (col("k") % 97L).as("v"))
        .repartitionByRange(4, col("k"))
        .sortWithinPartitions("k").write.parquet(stage)
    }
    VersionedTable.appendDelta(spark, root2, keepVersions = 8) { stage =>
      Seq((90001L, 1L)).toDF("k", "v").coalesce(1).write.parquet(stage)
    }
    VersionedTable.deleteByKey(spark, root2, Seq(90001L, 3L).toDF("k"),
      Seq("k"), keepVersions = 8)
    val (packed, _) = Maintenance.compactSmallFiles(spark, root2,
      smallFileBytes = 16L << 10, statsCols = Seq("k"), keepVersions = 8)
    assert(packed == 1, "only the tiny appended file rewrites")
    val v2 = VersionedTable.currentVersion(spark, root2).get
    val eds2 = VersionedTable.equalityDeletes(spark, root2, v2)
    assert(eds2.nonEmpty, "carried big files keep the ED line")
    val df2 = VersionedTable.read(spark, root2)
    assert(df2.count() == 39999)
    assert(df2.filter(col("k").isin(90001L, 3L)).count() == 0)
  }

  test("changes() classifies an upsert as update pre/post images") {
    import spark.implicits._
    val root = initTable("edcdc")
    val v1 = VersionedTable.currentVersion(spark, root).get
    VersionedTable.upsertByKey(spark, root,
      Seq((42L, 4242L), (8888L, 1L)).toDF("k", "v"),
      Seq("k"), keepVersions = 8)
    val v2 = VersionedTable.currentVersion(spark, root).get
    val ch = VersionedTable.changes(spark, root, v1, v2, keyCols = Seq("k"))
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("v"),
        r.getAs[String]("_change_type"))).toSet
    assert(ch == Set((42L, 42L % 97L, "update_preimage"),
      (42L, 4242L, "update_postimage"), (8888L, 1L, "insert")))
  }

  test("SQL MERGE mor mode takes the scanless equality-delete commit") {
    import spark.implicits._
    val root = initTable("edmerge")
    val v1Files = VersionedTable.currentFiles(spark, root)
    spark.conf.set("spark.graft.dml.mode", "mor")
    spark.conf.set("spark.graft.dml.keepVersions", "8")
    try {
      // pure-upsert idiom → equality delete + append, NO positional
      // vector, no file rewritten
      Seq((50L, 5000L), (99999L, 1L)).toDF("k", "v")
        .createOrReplaceTempView("ed_merge_src")
      val m = spark.sql(
        s"""MERGE INTO graft.`$root` t USING ed_merge_src s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *""").collect().head
      assert(m.getLong(0) == 1L)
      val v2 = VersionedTable.currentVersion(spark, root).get
      assert(VersionedTable.equalityDeletes(spark, root, v2).nonEmpty,
        "upsert idiom must commit an equality delete")
      assert(VersionedTable.deleteVectors(spark, root, v2).isEmpty,
        "no position scan, no positional vector")
      assert(v1Files.toSet.subsetOf(
        VersionedTable.currentFiles(spark, root).toSet))
      val now = VersionedTable.read(spark, root)
      assert(now.count() == 4001)
      assert(now.filter(col("k") === 50L).select("v").head.getLong(0) == 5000L)

      // pure-delete idiom → a second ed line, still no vector
      Seq(Tuple1(60L)).toDF("k").createOrReplaceTempView("ed_del_src")
      spark.sql(
        s"""MERGE INTO graft.`$root` t USING ed_del_src s ON t.k = s.k
            WHEN MATCHED THEN DELETE""")
      val v3 = VersionedTable.currentVersion(spark, root).get
      assert(VersionedTable.equalityDeletes(spark, root, v3).size == 2)
      assert(VersionedTable.deleteVectors(spark, root, v3).isEmpty)
      assert(VersionedTable.read(spark, root).count() == 4000)

      // update-only MERGE needs the key split → positional fallback
      Seq((70L, 7000L), (88888L, 2L)).toDF("k", "v")
        .createOrReplaceTempView("ed_upd_src")
      spark.sql(
        s"""MERGE INTO graft.`$root` t USING ed_upd_src s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET *""")
      val v4 = VersionedTable.currentVersion(spark, root).get
      assert(VersionedTable.deleteVectors(spark, root, v4).nonEmpty,
        "update-only takes the positional path")
      val after = VersionedTable.read(spark, root)
      assert(after.count() == 4000)
      assert(after.filter(col("k") === 70L).select("v").head.getLong(0) == 7000L)
      assert(after.filter(col("k") === 88888L).count() == 0)
    } finally {
      spark.conf.unset("spark.graft.dml.mode")
      spark.conf.unset("spark.graft.dml.keepVersions")
    }
  }

  test("automation tick resolves equality deletes on schedule") {
    import spark.implicits._
    import graft.lakehouse.Automation
    val root = tmpDir("edauto")
    new java.io.File(s"$root/arrivals").mkdirs()
    val cfg = Automation.Config(
      srcDir = s"$root/arrivals", tableDir = s"$root/t",
      registryDir = s"$root/reg", rowsPerDrop = 50,
      resolveDeletesEvery = 2)
    // a VERSIONED table root: equality deletes are manifest lines, so
    // (like streaming upsert) the table must be initialized first —
    // the tick's loader then appends into the current version dir
    VersionedTable.init(spark, s"$root/t",
      graft.lakehouse.SurveyGen.generate(spark, 5, seed = 7),
      keepVersions = 4)
    val auto = new Automation(spark, cfg)
    val r1 = auto.tick()
    assert(r1.resolvedDeletes.isEmpty, "tick 1 is off-schedule")
    // a CDC landing between ticks: update one row by key
    val theId = VersionedTable.read(spark, s"$root/t")
      .select("id").head.getLong(0)
    val image = VersionedTable.read(spark, s"$root/t")
      .filter(col("id") === theId).limit(1)
      .withColumn("customer_type", lit("EDITED"))
    assert(VersionedTable.upsertByKey(spark, s"$root/t", image,
      Seq("id"), keepVersions = 4) == 1L)
    val r2 = auto.tick()
    assert(r2.resolvedDeletes.exists(_ >= 1L), "pre-image(s) converted")
    val v = VersionedTable.currentVersion(spark, s"$root/t").get
    assert(VersionedTable.equalityDeletes(spark, s"$root/t", v).isEmpty)
    val row = VersionedTable.read(spark, s"$root/t")
      .filter(col("id") === theId && col("customer_type") === "EDITED")
      .collect()
    assert(row.length == 1)
    // the SQL console twin
    VersionedTable.deleteByKey(spark, s"$root/t",
      Seq(theId).toDF("id"), Seq("id"), keepVersions = 4)
    val (res, _) = graft.lakehouse.SqlRunner.callProc(spark,
      "graft_resolve_deletes", Seq(s"$root/t", "4"))
    assert(res.head.getLong(0) == 1L)
  }

  test("streaming MoR upsert: exactly-once CDC landing across restarts") {
    import spark.implicits._
    val root = tmpDir("edstream") + "/t"
    val src = tmpDir("edstreamsrc")
    val ckpt = tmpDir("edstreamckpt") + "/c"
    VersionedTable.init(spark, root,
      (0L until 100L).map(k => (k, k * 10L)).toDF("k", "v"),
      keepVersions = 8)
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", LongType)))
    def drop(name: String, rows: Seq[(Long, Long)]): Unit = {
      val f = new java.io.File(src, name)
      val w = new java.io.PrintWriter(f)
      try { w.println("k,v"); rows.foreach { case (k, v) => w.println(s"$k,$v") } }
      finally w.close()
    }
    drop("b1.csv", Seq((5L, 9005L), (200L, 9200L)))
    StreamingLoader.runVersionedUpsert(spark, src, root, ckpt,
      schema, Seq("k")).awaitTermination(60000)
    val after1 = VersionedTable.read(spark, root)
    assert(after1.count() == 101)
    assert(after1.filter(col("k") === 5L).select("v").head.getLong(0) == 9005L)

    // crash-redelivery simulation: re-landing the stream's own last
    // batch id is a no-op — the marker committed with the version
    val lastId = VersionedTable.lastFoldedBatch(spark, root).get
    assert(VersionedTable.upsertByKey(spark, root,
      Seq((5L, 1L)).toDF("k", "v"), Seq("k"), keepVersions = 8,
      batchId = Some(lastId)) == 0L)
    assert(VersionedTable.read(spark, root)
      .filter(col("k") === 5L).select("v").head.getLong(0) == 9005L)

    // restart with a new drop: checkpoint resumes, only the new batch lands
    drop("b2.csv", Seq((5L, 9905L), (300L, 9300L)))
    StreamingLoader.runVersionedUpsert(spark, src, root, ckpt,
      schema, Seq("k")).awaitTermination(60000)
    val after2 = VersionedTable.read(spark, root)
    assert(after2.count() == 102)
    assert(after2.filter(col("k") === 5L).select("v").head.getLong(0) == 9905L)
    assert(after2.filter(col("k") === 300L).count() == 1)
  }
}
