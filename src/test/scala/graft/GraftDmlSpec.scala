package graft

import org.apache.spark.sql.functions._
import graft.lakehouse.VersionedTable

/** SQL DML (DELETE / UPDATE / MERGE) over VersionedTable roots through
  * the parser extension — `graft.plans.GraftDml`. */
class GraftDmlSpec extends SparkSpec {

  private def freshTable(prefix: String): String = {
    import spark.implicits._
    val root = tmpDir(prefix) + "/t"
    VersionedTable.init(spark, root,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
        .toDF("k", "s", "v"),
      keepVersions = 4)
    root
  }

  test("DELETE FROM removes matching rows, advances the version, keeps time travel") {
    val root = freshTable("dmldel")
    spark.conf.set("spark.graft.dml.keepVersions", "4")
    try {
      val res = spark.sql(s"DELETE FROM graft.`$root` WHERE v >= 30").collect()
      assert(res.map(_.getLong(0)).toSeq == Seq(2L))
      assert(VersionedTable.read(spark, root).select("k")
        .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
      // previous version still readable within the retention window
      assert(VersionedTable.readVersion(spark, root, 1L).count() == 4)
      assert(VersionedTable.currentVersion(spark, root).contains(2L))
    } finally spark.conf.unset("spark.graft.dml.keepVersions")
  }

  test("DELETE with a NULL predicate keeps the row (SQL semantics)") {
    import spark.implicits._
    val root = tmpDir("dmlnull") + "/t"
    VersionedTable.init(spark, root,
      Seq((1L, Some(5L)), (2L, None), (3L, Some(50L)))
        .toDF("k", "v"), keepVersions = 2)
    val deleted = spark.sql(s"DELETE FROM graft.`$root` WHERE v > 10")
      .collect().head.getLong(0)
    assert(deleted == 1L)
    assert(VersionedTable.read(spark, root).select("k")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("DELETE supports a target alias with qualified predicate columns") {
    val root = freshTable("dmlalias")
    spark.sql(s"DELETE FROM graft.`$root` x WHERE x.k = 1")
    assert(VersionedTable.read(spark, root).count() == 3)
  }

  test("UPDATE SET evaluates every RHS against the OLD row (swap works)") {
    import spark.implicits._
    val root = tmpDir("dmlswap") + "/t"
    VersionedTable.init(spark, root,
      Seq((1L, 100L, 200L), (2L, 7L, 8L)).toDF("k", "a", "b"),
      keepVersions = 2)
    val updated = spark.sql(
      s"UPDATE graft.`$root` SET a = b, b = a WHERE k = 1")
      .collect().head.getLong(0)
    assert(updated == 1L)
    val rows = VersionedTable.read(spark, root).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, 200L, 100L), (2L, 7L, 8L)))
  }

  test("UPDATE without WHERE hits every row; expressions may reference columns") {
    val root = freshTable("dmlall")
    val updated = spark.sql(
      s"UPDATE graft.`$root` SET v = v + 1, s = upper(s)")
      .collect().head.getLong(0)
    assert(updated == 4L)
    val rows = VersionedTable.read(spark, root).orderBy("k")
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq(("A", 11L), ("B", 21L), ("C", 31L), ("D", 41L)))
  }

  test("UPDATE SET on a non-column fails loudly") {
    val root = freshTable("dmlbadcol")
    val e = intercept[Exception] {
      spark.sql(s"UPDATE graft.`$root` SET nope = 1 WHERE k = 1").collect()
    }
    assert(e.getMessage.contains("not a top-level column"))
  }

  test("MERGE upsert: UPDATE SET * + INSERT *") {
    import spark.implicits._
    val root = freshTable("dmlmerge")
    Seq((2L, "B!", 22L), (9L, "i", 90L)).toDF("k", "s", "v")
      .createOrReplaceTempView("dml_changes")
    val res = spark.sql(
      s"""MERGE INTO graft.`$root` t USING dml_changes s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      .collect().head
    assert((res.getLong(0), res.getLong(1), res.getLong(2)) == (1L, 4L, 5L))
    val rows = VersionedTable.read(spark, root).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "a", 10L), (2L, "B!", 22L), (3L, "c", 30L),
      (4L, "d", 40L), (9L, "i", 90L)))
  }

  test("MERGE WHEN MATCHED THEN DELETE is a keyed delete") {
    import spark.implicits._
    val root = freshTable("dmlmergedel")
    Seq(Tuple1(1L), Tuple1(3L), Tuple1(99L)).toDF("k")
      .createOrReplaceTempView("dml_kill")
    val res = spark.sql(
      s"""MERGE INTO graft.`$root` t USING dml_kill s
         |ON t.k = s.k
         |WHEN MATCHED THEN DELETE""".stripMargin).collect().head
    assert((res.getLong(0), res.getLong(1), res.getLong(2)) == (2L, 4L, 2L))
    assert(VersionedTable.read(spark, root).select("k")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 4L))
  }

  test("MERGE insert-only inserts exactly the unmatched source rows") {
    import spark.implicits._
    val root = freshTable("dmlmergeins")
    Seq((4L, "dupe", 0L), (7L, "new", 70L)).toDF("k", "s", "v")
      .createOrReplaceTempView("dml_ins")
    val res = spark.sql(
      s"""MERGE INTO graft.`$root` USING dml_ins s
         |ON graft.k = s.k
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect().head
    assert((res.getLong(1), res.getLong(2)) == (4L, 5L))
    // the matched k=4 row is untouched, only k=7 inserted
    val rows = VersionedTable.read(spark, root).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (7L, "new")))
  }

  test("MERGE refuses duplicate source keys instead of duplicating rows") {
    import spark.implicits._
    val root = freshTable("dmlmergedup")
    Seq((2L, "x", 1L), (2L, "y", 2L)).toDF("k", "s", "v")
      .createOrReplaceTempView("dml_dup")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO graft.`$root` t USING dml_dup s
           |ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin).collect()
    }
    assert(e.getMessage.contains("duplicate keys"))
    assert(VersionedTable.currentVersion(spark, root).contains(1L))
  }

  test("MERGE rejects conditional / column-list actions at parse time") {
    val root = freshTable("dmlmergebad")
    val e1 = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO graft.`$root` t USING dml_x s ON t.k = s.k
           |WHEN MATCHED AND s.v > 5 THEN UPDATE SET *""".stripMargin)
    }
    assert(e1.getMessage.contains("unconditional"))
    val e2 = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO graft.`$root` t USING dml_x s ON t.k > s.k
           |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(e2.getMessage.contains("same-named column"))
  }

  test("DML preserves the manifest's stats and bloom skipping payload") {
    import spark.implicits._
    val root = tmpDir("dmlstats") + "/t"
    val df = spark.range(0, 4000).toDF("i")
      .select(col("i").as("k"), (col("i") * 2654435761L % 99991L).as("id"))
    VersionedTable.commit(spark, root, keepVersions = 2,
      statsCols = Seq("k"), bloomCols = Seq("id")) { stage =>
        df.repartition(8).write.parquet(stage)
      }
    spark.sql(s"DELETE FROM graft.`$root` WHERE k < 1000")
    val v = VersionedTable.currentVersion(spark, root).get
    assert(v == 2L)
    val st = VersionedTable.manifestStats(spark, root, v)
    assert(st.nonEmpty && st.forall(_.min.contains("k")),
      "post-DML manifest lost its k stats")
    assert(VersionedTable.manifestBlooms(spark, root, v).nonEmpty,
      "post-DML manifest lost its id blooms")
    // and the refreshed skipping index still plans correctly
    val got = VersionedTable.readPruned(spark, root, "k", 3000L, 3999L)
      .filter(col("k").between(3000L, 3999L)).count()
    assert(got == 1000L)
  }

  test("DML is file-granular: a narrow DELETE rewrites only affected files") {
    val root = tmpDir("dmlfg") + "/t"
    val df = spark.range(0, 4000).toDF("k").withColumn("v", col("k") % 7L)
    VersionedTable.commit(spark, root, keepVersions = 4,
      statsCols = Seq("k")) { stage =>
      df.repartitionByRange(8, col("k")).sortWithinPartitions("k")
        .write.parquet(stage)
    }
    val deleted = spark.sql(s"DELETE FROM graft.`$root` WHERE k = 17")
      .collect().head.getLong(0)
    assert(deleted == 1L)
    // 7 of 8 files carried by reference; exactly one rewritten
    val refs = VersionedTable.filesOf(spark, root, 2L).get
    assert(refs.count(_.startsWith("_v-1/")) == 7, s"carried: $refs")
    assert(refs.count(_.startsWith("_v-2/")) == 1)
    assert(VersionedTable.read(spark, root).count() == 3999)
    assert(VersionedTable.read(spark, root).filter(col("k") === 17L)
      .count() == 0)
    // the skipping index still covers every file of the new version
    assert(VersionedTable.manifestStats(spark, root, 2L).size == 8)
    // a DELETE matching nothing commits NO new version
    val none = spark.sql(s"DELETE FROM graft.`$root` WHERE k = -5")
      .collect().head.getLong(0)
    assert(none == 0L)
    assert(VersionedTable.currentVersion(spark, root).contains(2L))
    // UPDATE is file-granular too
    spark.sql(s"UPDATE graft.`$root` SET v = -1 WHERE k = 3999")
    val refs3 = VersionedTable.filesOf(spark, root, 3L).get
    assert(refs3.count(_.startsWith("_v-3/")) == 1)
    assert(refs3.size == 8)
    assert(VersionedTable.read(spark, root)
      .filter(col("v") === -1L).count() == 1)
  }

  test("DML statements run through SqlRunner scripts") {
    val root = freshTable("dmlrunner")
    graft.lakehouse.SqlRunner.script(spark,
      s"DELETE FROM graft.`$root` WHERE k = 4; " +
        s"UPDATE graft.`$root` SET v = 0 WHERE k = 1;")
    val rows = VersionedTable.read(spark, root).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(rows == Seq((1L, 0L), (2L, 20L), (3L, 30L)))
  }

  test("non-graft DML still resolves through Spark's own path (and fails there)") {
    intercept[Exception] {
      spark.sql("DELETE FROM some_missing_table WHERE x = 1")
    }
  }

  test("INSERT INTO graft appends an O(batch) delta; OVERWRITE replaces") {
    val root = freshTable("dmlins")
    spark.conf.set("spark.graft.dml.keepVersions", "4")
    try {
      val v1Files = VersionedTable.currentFiles(spark, root)
      spark.sql(s"INSERT INTO graft.`$root` VALUES (5, 'e', 50)")
      assert(VersionedTable.currentVersion(spark, root).contains(2L))
      // append carried every version-1 file by reference
      val v2Files = VersionedTable.currentFiles(spark, root)
      assert(v1Files.forall(v2Files.contains))
      assert(VersionedTable.read(spark, root).count() == 5)
      // positional insert casts (ints arrive as int, table holds long)
      assert(VersionedTable.read(spark, root)
        .filter(col("k") === 5L && col("v") === 50L).count() == 1)
      spark.sql(s"INSERT OVERWRITE graft.`$root` VALUES (9, 'z', 90)")
      assert(VersionedTable.read(spark, root).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
        Seq((9L, "z", 90L)))
      // time travel across both inserts survives in the window
      assert(VersionedTable.readVersion(spark, root, 2L).count() == 5)
    } finally spark.conf.unset("spark.graft.dml.keepVersions")
  }

  test("INSERT BY NAME reorders; arity mismatch and column lists fail loudly") {
    val root = freshTable("dmlinsname")
    spark.sql(
      s"INSERT INTO graft.`$root` BY NAME SELECT 55 AS v, 'e' AS s, 5 AS k")
    assert(VersionedTable.read(spark, root)
      .filter(col("k") === 5L && col("v") === 55L && col("s") === "e")
      .count() == 1)
    intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$root` VALUES (6, 'f')").collect()
    }
    intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$root` (k, s, v) VALUES (6, 'f', 60)")
    }
    // nothing landed from the failures
    assert(VersionedTable.read(spark, root).count() == 5)
  }

  test("graft tables feed graft DML: INSERT ... SELECT and MERGE USING graft sources") {
    import spark.implicits._
    val base = tmpDir("dmlcross")
    val src = s"$base/src"
    val dst = s"$base/dst"
    VersionedTable.init(spark, src,
      Seq((2L, "B", 200L), (7L, "g", 70L)).toDF("k", "s", "v"),
      keepVersions = 4)
    val dst0 = freshTable("dmlcross-dst")
    // INSERT INTO ... SELECT FROM graft.`src` (read rewrite inside DML)
    spark.sql(
      s"INSERT INTO graft.`$dst0` SELECT * FROM graft.`$src` WHERE k = 7")
    assert(VersionedTable.read(spark, dst0)
      .filter(col("k") === 7L).count() == 1)
    // MERGE USING a graft source updates 2 and leaves the rest
    spark.sql(
      s"""MERGE INTO graft.`$dst0` t USING (SELECT * FROM graft.`$src`) s
          ON t.k = s.k
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""").collect()
    val rows = VersionedTable.read(spark, dst0).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "a", 10L), (2L, "B", 200L), (3L, "c", 30L),
      (4L, "d", 40L), (7L, "g", 70L)))
    // an uncommitted root is created by its first INSERT ... SELECT
    spark.sql(s"INSERT INTO graft.`$dst` SELECT * FROM graft.`$src`")
    assert(VersionedTable.currentVersion(spark, dst).contains(1L))
    assert(VersionedTable.read(spark, dst).count() == 2)
  }

  test("CTAS creates a committed graft table from pure SQL") {
    val root = tmpDir("ctas") + "/t"
    spark.sql(s"""CREATE TABLE graft.`$root` AS
      SELECT id AS k, id * 10 AS v FROM range(5)""")
    assert(VersionedTable.currentVersion(spark, root).contains(1L))
    assert(spark.sql(s"SELECT sum(v) FROM graft.`$root`").head.getLong(0)
      == 100L)
    // second CREATE refuses; IF NOT EXISTS no-ops without a new version
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$root` AS SELECT 1 AS x")
    }
    spark.sql(s"CREATE TABLE IF NOT EXISTS graft.`$root` AS SELECT 1 AS x")
    assert(VersionedTable.currentVersion(spark, root).contains(1L))
    assert(VersionedTable.read(spark, root).columns.toSeq == Seq("k", "v"))
  }

  test("CREATE OR REPLACE commits a new version; the old one time-travels") {
    val root = tmpDir("ctasrep") + "/t"
    spark.conf.set("spark.graft.dml.keepVersions", "3")
    try {
      spark.sql(s"CREATE TABLE graft.`$root` AS SELECT id FROM range(3)")
      // plain REPLACE of a MISSING table still fails
      intercept[Exception] {
        spark.sql(s"REPLACE TABLE graft.`${root}_nope` AS SELECT 1 AS x")
      }
      spark.sql(
        s"CREATE OR REPLACE TABLE graft.`$root` AS SELECT id FROM range(7)")
      assert(VersionedTable.read(spark, root).count() == 7)
      assert(VersionedTable.readVersion(spark, root, 1L).count() == 3)
    } finally spark.conf.unset("spark.graft.dml.keepVersions")
  }

  test("CTAS TBLPROPERTIES wire the data-skipping index; REPLACE carries it") {
    val root = tmpDir("ctasidx") + "/t"
    spark.sql(s"""CREATE TABLE graft.`$root`
      TBLPROPERTIES ('graft.statsCols' = 'k', 'graft.bloomCols' = 'k')
      AS SELECT id AS k, id * 2 AS v FROM range(10)""")
    val v1 = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.manifestStats(spark, root, v1)
      .exists(_.min.contains("k")))
    assert(VersionedTable.manifestBlooms(spark, root, v1)
      .keys.exists(_._2 == "k"))
    // REPLACE with no properties: index columns carry forward
    spark.sql(
      s"CREATE OR REPLACE TABLE graft.`$root` AS SELECT id AS k FROM range(4)")
    val v2 = VersionedTable.currentVersion(spark, root).get
    assert(v2 > v1)
    assert(VersionedTable.manifestStats(spark, root, v2)
      .exists(_.min.contains("k")))
  }

  test("plain CREATE TABLE commits an empty readable version; INSERT fills it") {
    val root = tmpDir("ctempty") + "/t"
    spark.sql(s"CREATE TABLE graft.`$root` (k BIGINT, s STRING)")
    assert(VersionedTable.currentVersion(spark, root).contains(1L))
    assert(VersionedTable.read(spark, root).count() == 0)
    assert(VersionedTable.read(spark, root).schema.map(_.name)
      == Seq("k", "s"))
    spark.sql(s"INSERT INTO graft.`$root` SELECT id, 'x' FROM range(3)")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$root`").head.getLong(0)
      == 3L)
    // IF NOT EXISTS no-ops; a second bare CREATE refuses
    spark.sql(s"CREATE TABLE IF NOT EXISTS graft.`$root` (z INT)")
    assert(VersionedTable.read(spark, root).columns.toSeq == Seq("k", "s"))
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$root` (z INT)")
    }
  }

  test("CTAS reads graft sources: table-to-table derivation in one statement") {
    val src = tmpDir("ctassrc") + "/t"
    val dst = tmpDir("ctasdst") + "/t"
    spark.sql(s"CREATE TABLE graft.`$src` AS SELECT id, id % 2 AS g FROM range(10)")
    spark.sql(s"""CREATE TABLE graft.`$dst` AS
      SELECT g, count(*) AS n FROM graft.`$src` GROUP BY g""")
    assert(spark.sql(s"SELECT sum(n) FROM graft.`$dst`").head.getLong(0)
      == 10L)
  }

  test("DDL statements run through SqlRunner scripts end to end") {
    val base = tmpDir("ddlrunner")
    graft.lakehouse.SqlRunner.script(spark,
      s"""CREATE TABLE graft.`$base/t` AS SELECT id AS k, id * 2 AS v FROM range(5);
         |ALTER TABLE graft.`$base/t` RENAME COLUMN v TO score;
         |ALTER TABLE graft.`$base/t` ADD COLUMN tag STRING;
         |INSERT INTO graft.`$base/t` VALUES (9, 18, 'x');
         |""".stripMargin)
    val t = VersionedTable.read(spark, base + "/t")
    assert(t.columns.toSeq == Seq("k", "score", "tag"))
    assert(t.count() == 6)
    assert(t.filter(col("tag") === "x").select("score").head.getLong(0) == 18L)
  }
}
