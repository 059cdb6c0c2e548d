package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import graft.lakehouse.VersionedTable

/** Metadata-only ALTER TABLE over versioned roots: the manifest
  * schema line, the physical-union + coalesce read model, and the SQL
  * surface. */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(prefix: String, kv: Int = 4): String = {
    val root = tmpDir(prefix) + "/t"
    VersionedTable.init(spark, root,
      Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "s", "v"),
      keepVersions = kv)
    root
  }

  test("ADD COLUMN is metadata-only; old rows null; INSERT fills; time travel keeps the old schema") {
    val root = fresh("sevoadd")
    val before = VersionedTable.currentFiles(spark, root).sorted
    VersionedTable.addColumn(spark, root, "lang", StringType,
      keepVersions = 4)
    // every data file carried by reference — zero rewrites
    assert(VersionedTable.currentFiles(spark, root).sorted == before)
    val t = VersionedTable.read(spark, root)
    assert(t.columns.toSeq == Seq("k", "s", "v", "lang"))
    assert(t.filter(col("lang").isNull).count() == 3)
    // the pre-ALTER version still serves its own schema
    assert(VersionedTable.readVersion(spark, root, 1L).columns.toSeq
      == Seq("k", "s", "v"))
    spark.conf.set("spark.graft.dml.keepVersions", "4")
    try spark.sql(
      s"INSERT INTO graft.`$root` VALUES (4, 'd', 40, 'en')")
    finally spark.conf.unset("spark.graft.dml.keepVersions")
    val rows = VersionedTable.read(spark, root)
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(rows(4L).contains("en") && rows(1L).isEmpty)
    // re-adding an existing name refuses
    intercept[Exception] {
      VersionedTable.addColumn(spark, root, "lang", StringType)
    }
  }

  test("RENAME COLUMN: pre-rename bytes stay readable; writes use the new name; SQL + format(graft) serve logical") {
    val root = fresh("sevoren")
    spark.sql(s"ALTER TABLE graft.`$root` RENAME COLUMN s TO label")
    val t = VersionedTable.read(spark, root)
    assert(t.columns.toSeq == Seq("k", "label", "v"))
    // values written under the OLD physical name surface via coalesce
    assert(t.filter(col("label") === "b").select("k").head.getLong(0) == 2L)
    // a mixed file set: append post-rename rows, both generations read
    spark.conf.set("spark.graft.dml.keepVersions", "4")
    try spark.sql(s"INSERT INTO graft.`$root` VALUES (9, 'z', 90)")
    finally spark.conf.unset("spark.graft.dml.keepVersions")
    val labels = spark.sql(
      s"SELECT label FROM graft.`$root` ORDER BY k").collect()
      .map(_.getString(0)).toSeq
    assert(labels == Seq("a", "b", "c", "z"))
    assert(spark.read.format("graft").load(root)
      .filter(col("label") === "z").count() == 1)
    // renaming onto a used name refuses; renaming back onto the
    // tombstoned old physical name refuses too
    intercept[Exception] {
      VersionedTable.renameColumn(spark, root, "label", "v")
    }
    intercept[Exception] {
      VersionedTable.renameColumn(spark, root, "label", "s")
    }
  }

  test("DROP COLUMN tombstones its physical names against recycling; full rewrite self-heals") {
    val root = fresh("sevodrop")
    spark.sql(s"ALTER TABLE graft.`$root` DROP COLUMN s")
    assert(VersionedTable.read(spark, root).columns.toSeq == Seq("k", "v"))
    // the dropped physical name cannot come back while files carry it
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$root` ADD COLUMN s STRING")
    }
    // DROP IF EXISTS of a missing column no-ops
    val v = VersionedTable.currentVersion(spark, root).get
    spark.sql(s"ALTER TABLE graft.`$root` DROP COLUMN IF EXISTS nope")
    assert(VersionedTable.currentVersion(spark, root).contains(v))
    // a full rewrite purges the stale bytes and drops the h-line —
    // after it, the name is free again
    VersionedTable.rewrite(spark, root, keepVersions = 4)(df => df)
    assert(VersionedTable.manifestSchema(spark, root,
      VersionedTable.currentVersion(spark, root).get).isEmpty)
    spark.sql(s"ALTER TABLE graft.`$root` ADD COLUMN s STRING")
    assert(VersionedTable.read(spark, root).columns.toSeq
      == Seq("k", "v", "s"))
  }

  test("NESTED evolution: add/rename/drop struct subfields are " +
      "metadata-only and read correctly across mixed-generation files") {
    val root = tmpDir("sevonest") + "/t"
    VersionedTable.init(spark, root,
      Seq((1L, "img", 640), (2L, "vid", 1280)).toDF("k", "kind", "width")
        .select(col("k"), struct(col("kind"), col("width")).as("meta")),
      keepVersions = 12)
    val before = VersionedTable.currentFiles(spark, root).sorted

    // ADD a subfield: zero rewrites; old rows null it
    VersionedTable.addColumn(spark, root, "meta.codec", StringType,
      keepVersions = 12)
    assert(VersionedTable.currentFiles(spark, root).sorted == before)
    val t1 = VersionedTable.read(spark, root)
    assert(t1.schema("meta").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType].fieldNames.toSeq ==
      Seq("kind", "width", "codec"))
    assert(t1.filter(col("meta.codec").isNull).count() == 2)
    // a new-generation file fills it; both generations read
    VersionedTable.appendDelta(spark, root, keepVersions = 12) { stage =>
      Seq((3L, "aud", 0, "flac")).toDF("k", "kind", "width", "codec")
        .select(col("k"), struct(col("kind"), col("width"),
          col("codec")).as("meta"))
        .write.parquet(stage)
    }
    assert(VersionedTable.read(spark, root)
      .filter(col("meta.codec") === "flac").select("k").head.getLong(0) == 3L)

    // RENAME a subfield: pre-rename bytes resolve member-wise
    VersionedTable.renameColumn(spark, root, "meta.width", "w",
      keepVersions = 12)
    val t2 = VersionedTable.read(spark, root)
    assert(t2.schema("meta").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType].fieldNames.toSeq ==
      Seq("kind", "w", "codec"))
    assert(t2.select(col("k"), col("meta.w")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap ==
      Map(1L -> 640, 2L -> 1280, 3L -> 0))
    // a post-rename generation writes the NEW name; plus a
    // whole-struct-null row, which must STAY null through the rebuild
    VersionedTable.appendDelta(spark, root, keepVersions = 12) { stage =>
      Seq((4L, Some(("img", 320, "webp"))), (5L, None))
        .toDF("k", "m")
        .select(col("k"), col("m").cast(
          "struct<kind:string,w:int,codec:string>").as("meta"))
        .write.parquet(stage)
    }
    val t3 = VersionedTable.read(spark, root)
    assert(t3.filter(col("meta").isNull).select("k").head.getLong(0) == 5L)
    assert(t3.select(col("k"), col("meta.w")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1)))
      .toMap == Map(1L -> 640, 2L -> 1280, 3L -> 0, 4L -> 320, 5L -> -1))

    // DML on the renamed nested field: predicate resolves over BOTH
    // generations (1280 was written under the old physical name)
    spark.conf.set("spark.graft.dml.keepVersions", "12")
    try {
      spark.sql(s"DELETE FROM graft.`$root` WHERE meta.w = 1280")
      assert(VersionedTable.read(spark, root).count() == 4)
      spark.sql(s"UPDATE graft.`$root` SET k = 40 WHERE meta.w = 320")
    } finally spark.conf.unset("spark.graft.dml.keepVersions")
    assert(VersionedTable.read(spark, root)
      .filter(col("k") === 40L).select(col("meta.codec"))
      .head.getString(0) == "webp")

    // DROP a subfield: disappears; its dotted name is tombstoned
    VersionedTable.dropColumn(spark, root, "meta.kind", keepVersions = 12)
    val t4 = VersionedTable.read(spark, root)
    assert(t4.schema("meta").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType].fieldNames.toSeq ==
      Seq("w", "codec"))
    intercept[Exception] {
      VersionedTable.addColumn(spark, root, "meta.kind", StringType)
    }
    // ...but the same leaf name in ANOTHER scope is fine
    VersionedTable.addColumn(spark, root, "kind", StringType,
      keepVersions = 12)

    // WIDEN a subfield: int -> long, metadata-only, in-scan over the
    // mixed generations (every live file wrote w/width as int32)
    VersionedTable.widenColumn(spark, root, "meta.w", LongType,
      keepVersions = 12)
    assert(VersionedTable.read(spark, root)
      .schema("meta").dataType.asInstanceOf[
        org.apache.spark.sql.types.StructType]("w").dataType == LongType)
    assert(VersionedTable.read(spark, root)
      .select(col("meta.w")).collect()
      .map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).sorted.toSeq ==
      Seq(-1L, 0L, 320L, 640L))
    intercept[Exception] { // non-widening refuses
      VersionedTable.widenColumn(spark, root, "meta.codec", LongType)
    }

    // full rewrite self-heals: physical = logical, h-line gone
    VersionedTable.rewrite(spark, root, keepVersions = 12)(df => df)
    assert(VersionedTable.manifestSchema(spark, root,
      VersionedTable.currentVersion(spark, root).get).isEmpty)
    assert(VersionedTable.read(spark, root)
      .select(col("meta.w")).collect()
      .map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).sorted.toSeq ==
      Seq(-1L, 0L, 320L, 640L)) // -1 = the whole-struct-null row
  }

  test("SQL ALTER TABLE evolves NESTED subfields through dotted paths") {
    val root = tmpDir("sevonestsql") + "/t"
    VersionedTable.init(spark, root,
      Seq((1L, "img", 640), (2L, "vid", 1280)).toDF("k", "kind", "width")
        .select(col("k"), struct(col("kind"), col("width")).as("meta")),
      keepVersions = 12)
    spark.conf.set("spark.graft.dml.keepVersions", "12")
    try {
      spark.sql(s"ALTER TABLE graft.`$root` ADD COLUMN meta.codec STRING")
      spark.sql(s"ALTER TABLE graft.`$root` RENAME COLUMN meta.width TO w")
      spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN meta.w TYPE BIGINT")
      spark.sql(s"ALTER TABLE graft.`$root` DROP COLUMN meta.kind")
    } finally spark.conf.unset("spark.graft.dml.keepVersions")
    val t = VersionedTable.read(spark, root)
    assert(t.schema("meta").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType].fields.toSeq
      .map(f => (f.name, f.dataType)) ==
      Seq(("w", LongType), ("codec", StringType)))
    assert(t.select(col("k"), col("meta.w")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 640L, 2L -> 1280L))
  }

  test("CDC across a NESTED rename speaks the new schema on both sides") {
    val root = tmpDir("sevonestcdc") + "/t"
    VersionedTable.init(spark, root,
      Seq((1L, "img", 640)).toDF("k", "kind", "width")
        .select(col("k"), struct(col("kind"), col("width")).as("meta")),
      keepVersions = 12)
    VersionedTable.renameColumn(spark, root, "meta.width", "w",
      keepVersions = 12)
    VersionedTable.appendDelta(spark, root, keepVersions = 12) { stage =>
      Seq((2L, "vid", 99)).toDF("k", "kind", "w")
        .select(col("k"), struct(col("kind"), col("w")).as("meta"))
        .write.parquet(stage)
    }
    // diff across the ALTER boundary: the pre-rename version aligns
    // onto the new logical schema, so the only change is the insert
    val ch = VersionedTable.changes(spark, root, 1L,
      VersionedTable.currentVersion(spark, root).get, keyCols = Seq("k"))
    val rows = ch.select(col("_change_type"), col("k"), col("meta.w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(rows.toSeq == Seq(("insert", 2L, 99)), rows.mkString(","))
  }

  test("ALTER COLUMN TYPE widens in-scan (int->long); non-widenings refuse") {
    val root = fresh("sevowide")
    spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN v TYPE BIGINT")
    val t = VersionedTable.read(spark, root)
    assert(t.schema("v").dataType == LongType)
    // the INT-typed files read at the widened type
    assert(t.agg(sum("v")).head.getLong(0) == 60L)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN s TYPE INT")
    }
  }

  test("DML predicates on a renamed column see pre-rename values; rewrites heal files to the logical names") {
    val root = fresh("sevodml")
    spark.sql(s"ALTER TABLE graft.`$root` RENAME COLUMN v TO score")
    spark.conf.set("spark.graft.dml.keepVersions", "6")
    try {
      spark.sql(s"UPDATE graft.`$root` SET score = score + 1 WHERE k = 2")
      val got = VersionedTable.read(spark, root).orderBy("k")
        .select("score").collect().map(_.getInt(0)).toSeq
      assert(got == Seq(10, 21, 30))
      spark.sql(s"DELETE FROM graft.`$root` WHERE score >= 30")
      assert(VersionedTable.read(spark, root).count() == 2)
    } finally spark.conf.unset("spark.graft.dml.keepVersions")
  }

  test("MoR equality-delete path composes with an evolved schema") {
    val root = fresh("sevomor")
    VersionedTable.renameColumn(spark, root, "s", "label", keepVersions = 6)
    // keyed MoR delete (equality-delete sidecar, zero rewrites), then
    // read through the logical projection
    VersionedTable.deleteByKey(spark, root,
      Seq(2L).toDF("k"), Seq("k"), keepVersions = 6)
    val t = VersionedTable.read(spark, root).orderBy("k")
    assert(t.select("label").collect().map(_.getString(0)).toSeq
      == Seq("a", "c"))
  }

  test("CDC across an ALTER boundary: metadata-only commit = empty batch; later changes speak the new schema") {
    val root = fresh("sevocdc", kv = 8)
    // v1 -> v2 is the ALTER itself: zero row changes
    VersionedTable.renameColumn(spark, root, "s", "label", keepVersions = 8)
    assert(VersionedTable.changes(spark, root, 1L, 2L, Seq("k")).count() == 0)
    // v2 -> v3 inserts; the change rows carry the renamed column
    spark.conf.set("spark.graft.dml.keepVersions", "8")
    try spark.sql(s"INSERT INTO graft.`$root` VALUES (5, 'e', 50)")
    finally spark.conf.unset("spark.graft.dml.keepVersions")
    val c = VersionedTable.changes(spark, root, 2L, 3L, Seq("k"))
    assert(c.columns.contains("label"))
    assert(c.collect().map(r =>
      (r.getAs[Long]("k"), r.getAs[String]("label"),
        r.getAs[String]("_change_type"))).toSeq == Seq((5L, "e", "insert")))
    // straddling diff (pre-ALTER -> post-INSERT) aligns too
    assert(VersionedTable.changes(spark, root, 1L, 3L, Seq("k"))
      .count() == 1)
    // ADD COLUMN boundary: empty batch, then an insert carries it
    VersionedTable.addColumn(spark, root, "lang", StringType,
      keepVersions = 8)
    assert(VersionedTable.changes(spark, root, 3L, 4L, Seq("k")).count() == 0)
  }

  test("appendDeltaEvolve: drifted batches evolve the schema in the same commit") {
    val root = fresh("sevoauto", kv = 8)
    // extra column + wider int type in one batch: ONE commit
    val v0 = VersionedTable.currentVersion(spark, root).get
    val batch = Seq((10L, "x", 100L, "en"))
      .toDF("k", "s", "v", "lang") // v long (table: int), lang new
    VersionedTable.appendDeltaEvolve(spark, root, batch, keepVersions = 8)
    assert(VersionedTable.currentVersion(spark, root).contains(v0 + 1))
    val t = VersionedTable.read(spark, root)
    assert(t.schema("v").dataType == LongType)
    assert(t.columns.toSeq == Seq("k", "s", "v", "lang"))
    assert(t.count() == 4)
    assert(t.filter(col("lang").isNull).count() == 3)
    // no-drift appends stay plain (no h-line)
    val root2 = fresh("sevoauto2", kv = 8)
    VersionedTable.appendDeltaEvolve(spark, root2,
      Seq((5L, "e", 50)).toDF("k", "s", "v"), keepVersions = 8)
    assert(VersionedTable.manifestSchema(spark, root2,
      VersionedTable.currentVersion(spark, root2).get).isEmpty)
    // an incompatible retype refuses loudly
    intercept[Exception] {
      VersionedTable.appendDeltaEvolve(spark, root2,
        Seq((6L, "f", "not-an-int")).toDF("k", "s", "v"))
    }
    // a batch column colliding with a tombstoned name refuses
    VersionedTable.dropColumn(spark, root2, "s", keepVersions = 8)
    intercept[Exception] {
      VersionedTable.appendDeltaEvolve(spark, root2,
        Seq((7L, 70, "boom")).toDF("k", "v", "s"))
    }
  }

  test("format(graft) append with mergeSchema evolves; without it drift still refuses") {
    val root = fresh("sevomerge", kv = 8)
    val drifted = Seq((11L, "y", 110, 0.5)).toDF("k", "s", "v", "score")
    intercept[Exception] {
      drifted.write.format("graft").mode("append").save(root)
    }
    drifted.write.format("graft").mode("append")
      .option("mergeSchema", "true").option("keepVersions", "8").save(root)
    val t = spark.read.format("graft").load(root)
    assert(t.columns.toSeq == Seq("k", "s", "v", "score"))
    assert(t.filter(col("score").isNotNull).count() == 1)
  }

  test("evolved tables keep a real sizeInBytes: small dims still broadcast in joins") {
    val root = fresh("sevobcast")
    VersionedTable.renameColumn(spark, root, "s", "label", keepVersions = 4)
    val dim = spark.read.format("graft").load(root)
    val fact = spark.range(10000L).select(col("id").as("k"),
      (col("id") % 7).as("grp"))
    val joined = fact.join(dim, "k")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small evolved dim did not broadcast:\n$plan")
  }

  test("CDC mirrors propagate upstream schema evolution by adopting the source's schema line") {
    import graft.lakehouse.ChangeFeed
    val src = fresh("sevomirsrc", kv = 10)
    val dst = tmpDir("sevomirdst") + "/m"
    // cold-start snapshot
    ChangeFeed.mirror(spark, src, dst, Seq("k"), keepVersions = 10,
      evolveSchema = true)
    assert(VersionedTable.read(spark, dst).count() == 3)
    // upstream: rename + add + new data in separate commits
    VersionedTable.renameColumn(spark, src, "s", "label", keepVersions = 10)
    VersionedTable.addColumn(spark, src, "lang", StringType,
      keepVersions = 10)
    spark.conf.set("spark.graft.dml.keepVersions", "10")
    try {
      spark.sql(s"INSERT INTO graft.`$src` VALUES (7, 'g', 70, 'en')")
      spark.sql(s"UPDATE graft.`$src` SET label = 'B' WHERE k = 2")
    } finally spark.conf.unset("spark.graft.dml.keepVersions")
    ChangeFeed.mirror(spark, src, dst, Seq("k"), keepVersions = 10,
      evolveSchema = true)
    val m = VersionedTable.read(spark, dst)
    assert(m.columns.toSeq == Seq("k", "label", "v", "lang"))
    val rows = m.orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("label"),
        Option(r.getAs[String]("lang")))).toSeq
    // pre-rename mirror files still serve their values under `label`
    assert(rows == Seq((1L, "a", None), (2L, "B", None), (3L, "c", None),
      (7L, "g", Some("en"))))
    // and the mirror equals the source exactly
    assert(m.orderBy("k").collect().toSeq ==
      VersionedTable.read(spark, src)
        .select("k", "label", "v", "lang").orderBy("k").collect().toSeq)
    // without opt-in, the drift stays a loud refusal
    val dst2 = tmpDir("sevomirdst2") + "/m"
    // position dst2 at the pre-ALTER snapshot shape by copying the flow
    VersionedTable.init(spark, dst2,
      Seq((1L, "x", 1)).toDF("k", "s", "v"), keepVersions = 10)
    // fake a consumer position so the next drain delivers post-ALTER rows
    intercept[Exception] {
      ChangeFeed.mirror(spark, src, dst2, Seq("k"), keepVersions = 10)
    }
  }

  test("streaming/CDC-free consumers: compaction of an evolved table converges physical to logical") {
    val root = fresh("sevocompact")
    VersionedTable.renameColumn(spark, root, "s", "label", keepVersions = 6)
    VersionedTable.rewrite(spark, root, keepVersions = 6)(df => df)
    // post-rewrite the files carry the logical name physically
    val files = VersionedTable.currentFiles(spark, root)
    val phys = spark.read.parquet(files.map(f => s"$root/$f"): _*).schema
    assert(phys.fieldNames.toSeq == Seq("k", "label", "v"))
    assert(VersionedTable.read(spark, root)
      .filter(col("label") === "a").count() == 1)
  }
}
