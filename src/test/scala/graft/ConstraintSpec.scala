package graft

import org.apache.spark.sql.functions._
import graft.lakehouse.VersionedTable
import graft.lakehouse.VersionedTable.ConstraintViolatedException

/** Declarative table CHECK constraints: manifest-persisted, enforced
  * on every write path, metadata-only to declare (the Delta-
  * constraints analog on the commit protocol). */
class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(prefix: String): String = {
    val root = tmpDir(prefix) + "/t"
    VersionedTable.init(spark, root,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
        .toDF("k", "s", "v"),
      keepVersions = 4)
    root
  }

  test("addConstraint is metadata-only; violating delta append refused atomically") {
    val root = freshTable("ck1")
    val v1 = VersionedTable.addConstraint(spark, root, "pos_v", "v > 0",
      keepVersions = 4)
    assert(v1 == 2L)
    assert(VersionedTable.constraintsOf(spark, root) == Seq("pos_v" -> "v > 0"))
    // the declaration carried every file by reference: zero data files
    // in the new version dir
    val vdir = new java.io.File(s"$root/_v-2")
    assert(!vdir.exists() || vdir.listFiles().forall(f =>
      f.getName.startsWith("_") || f.getName.startsWith(".")))

    val bad = Seq((4L, "x", -5L), (5L, "y", 50L)).toDF("k", "s", "v")
    val e = intercept[ConstraintViolatedException] {
      VersionedTable.appendDelta(spark, root, keepVersions = 4) { stage =>
        bad.write.parquet(stage)
      }
    }
    assert(e.getMessage.contains("pos_v") && e.getMessage.contains("1 violating"))
    // atomic refusal: version unchanged, stage discarded, reads intact
    assert(VersionedTable.currentVersion(spark, root).contains(2L))
    assert(!new java.io.File(s"$root/_v-3").exists())
    assert(VersionedTable.read(spark, root).count() == 3)

    // a clean batch lands
    VersionedTable.appendDelta(spark, root, keepVersions = 4) { stage =>
      Seq((6L, "z", 60L)).toDF("k", "s", "v").write.parquet(stage)
    }
    assert(VersionedTable.read(spark, root).count() == 4)
  }

  test("delta append lacking a constrained column: NULL-passes rule, " +
      "not an unresolved-column crash; unknown predicate column refuses clearly") {
    val root = freshTable("ckdrift")
    VersionedTable.addConstraint(spark, root, "pos_v", "v > 0",
      keepVersions = 4)
    // writer lands files WITHOUT column v (the schema-evolution append
    // shape): the predicate must evaluate with v as typed null —
    // NULL passes CHECK — instead of dying as an unresolved column
    VersionedTable.appendDelta(spark, root, keepVersions = 4) { stage =>
      Seq((7L, "q")).toDF("k", "s").write.parquet(stage)
    }
    assert(VersionedTable.read(spark, root).count() == 4)
    // ...and the gate still fires when the column IS present and bad
    intercept[ConstraintViolatedException] {
      VersionedTable.appendDelta(spark, root, keepVersions = 4) { stage =>
        Seq((8L, "r", -1L)).toDF("k", "s", "v").write.parquet(stage)
      }
    }
    // a predicate over a column the TABLE does not know at all cannot
    // even be declared — the front door refuses eagerly, so the only
    // unresolved-column path a delta append can hit is the
    // missing-in-batch one handled above
    intercept[Exception] {
      VersionedTable.addConstraint(spark, root, "ghost", "no_such_col > 0",
        keepVersions = 4)
    }
    assert(VersionedTable.read(spark, root).count() == 4)
  }

  test("constraints persist across full rewrites and gate them") {
    val root = freshTable("ck2")
    VersionedTable.addConstraint(spark, root, "pos_v", "v > 0")
    // full rewrite keeps the declaration (unlike the schema h-line:
    // constraints are intent, not data-derivable)
    VersionedTable.rewrite(spark, root) { df => df.filter(col("k") =!= 2L) }
    assert(VersionedTable.constraintsOf(spark, root)
      == Seq("pos_v" -> "v > 0"))
    // and a full rewrite that VIOLATES refuses with nothing published
    val before = VersionedTable.currentVersion(spark, root).get
    intercept[ConstraintViolatedException] {
      VersionedTable.rewrite(spark, root) { df =>
        df.withColumn("v", col("v") - lit(1000L))
      }
    }
    assert(VersionedTable.currentVersion(spark, root).contains(before))
    assert(VersionedTable.read(spark, root).agg(min("v")).head.getLong(0) > 0)
  }

  test("adding a constraint the existing data violates refuses without a commit") {
    val root = freshTable("ck3")
    intercept[ConstraintViolatedException] {
      VersionedTable.addConstraint(spark, root, "big_v", "v > 15")
    }
    assert(VersionedTable.currentVersion(spark, root).contains(1L))
    assert(VersionedTable.constraintsOf(spark, root).isEmpty)
  }

  test("NULL predicate rows pass (SQL unknown-passes rule); drop re-opens the gate") {
    val root = tmpDir("ck4") + "/t"
    VersionedTable.init(spark, root,
      Seq((1L, Some(5L)), (2L, None)).toDF("k", "v"), keepVersions = 4)
    VersionedTable.addConstraint(spark, root, "pos_v", "v > 0")
    // a NULL v passes the CHECK on append too
    VersionedTable.appendDelta(spark, root, keepVersions = 4) { stage =>
      Seq((3L, Option.empty[Long])).toDF("k", "v").write.parquet(stage)
    }
    assert(VersionedTable.read(spark, root).count() == 3)
    intercept[ConstraintViolatedException] {
      VersionedTable.appendDelta(spark, root, keepVersions = 4) { stage =>
        Seq((4L, Some(-1L))).toDF("k", "v").write.parquet(stage)
      }
    }
    VersionedTable.dropConstraint(spark, root, "pos_v")
    assert(VersionedTable.constraintsOf(spark, root).isEmpty)
    VersionedTable.appendDelta(spark, root, keepVersions = 4) { stage =>
      Seq((4L, Some(-1L))).toDF("k", "v").write.parquet(stage)
    }
    assert(VersionedTable.read(spark, root).count() == 4)
    // ifExists no-ops, plain drop of a missing name refuses
    VersionedTable.dropConstraint(spark, root, "gone", ifExists = true)
    intercept[IllegalArgumentException] {
      VersionedTable.dropConstraint(spark, root, "gone")
    }
  }

  test("SQL surface: ADD CONSTRAINT CHECK gates INSERT; DROP CONSTRAINT releases") {
    val root = freshTable("ck5")
    spark.sql(s"ALTER TABLE graft.`$root` ADD CONSTRAINT pos_v CHECK (v > 0)")
    assert(VersionedTable.constraintsOf(spark, root).map(_._1) == Seq("pos_v"))
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$root` VALUES (9, 'q', -1)")
    }
    assert(e.getMessage.contains("pos_v"))
    assert(VersionedTable.read(spark, root).count() == 3)
    spark.sql(s"INSERT INTO graft.`$root` VALUES (9, 'q', 90)")
    assert(VersionedTable.read(spark, root).count() == 4)
    // the observability TVF serves the declarations from SQL
    assert(spark.sql(s"SELECT * FROM graft_constraints('$root')")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      == Seq(("pos_v", "v > 0")))
    spark.sql(s"ALTER TABLE graft.`$root` DROP CONSTRAINT pos_v")
    assert(VersionedTable.constraintsOf(spark, root).isEmpty)
    assert(spark.sql(s"SELECT * FROM graft_constraints('$root')").count() == 0)
    spark.sql(s"INSERT INTO graft.`$root` VALUES (10, 'w', -7)")
    assert(VersionedTable.read(spark, root).count() == 5)
  }

  test("CREATE TABLE with inline CHECK declares and enforces from row one") {
    val root = tmpDir("ck9") + "/t"
    spark.sql(s"CREATE TABLE graft.`$root` (k BIGINT, v BIGINT, " +
      "CONSTRAINT pos_v CHECK (v > 0))")
    assert(VersionedTable.constraintsOf(spark, root)
      == Seq("pos_v" -> "v > 0"))
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$root` VALUES (1, -1)")
    }
    assert(e.getMessage.contains("pos_v"))
    spark.sql(s"INSERT INTO graft.`$root` VALUES (1, 10)")
    assert(VersionedTable.read(spark, root).count() == 1)
    // (CTAS constraints are a Spark grammar restriction: "Constraints
    // may not be specified in a CTAS statement" — declare post-hoc
    // with ALTER ... ADD CONSTRAINT, which validates the data.)

    // non-CHECK constraint kinds refuse at parse time
    val e2 = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`${tmpDir("ck9d")}/t` " +
        "(k BIGINT PRIMARY KEY, v BIGINT)")
    }
    assert(e2.getMessage.toLowerCase.contains("check"))
  }

  test("MoR upsert images are checked; pure key deletes commit scanlessly") {
    val root = freshTable("ck6")
    VersionedTable.addConstraint(spark, root, "pos_v", "v > 0")
    intercept[ConstraintViolatedException] {
      VersionedTable.upsertByKey(spark, root,
        Seq((2L, "b2", -20L)).toDF("k", "s", "v"), Seq("k"))
    }
    assert(VersionedTable.read(spark, root)
      .filter(col("k") === 2L).head.getString(1) == "b")
    VersionedTable.upsertByKey(spark, root,
      Seq((2L, "b2", 25L)).toDF("k", "s", "v"), Seq("k"))
    assert(VersionedTable.read(spark, root)
      .filter(col("k") === 2L).head.getLong(2) == 25L)
    // a keys-only delete writes no data files — no check, no scan
    VersionedTable.deleteByKey(spark, root, Seq(Tuple1(1L)).toDF("k"), Seq("k"))
    assert(VersionedTable.read(spark, root).count() == 2)
  }

  test("MoR deletes pass the gate (no data files); CoW rewrites re-check") {
    val root = freshTable("ck10")
    VersionedTable.addConstraint(spark, root, "pos_v", "v > 0")
    // a positional deletion vector writes only a dv- sidecar — no data
    // files, no constraint scan, and the carried files hold by
    // induction
    VersionedTable.deleteWhere(spark, root, col("k") === 1L)
    assert(VersionedTable.read(spark, root).count() == 2)
    assert(VersionedTable.constraintsOf(spark, root)
      == Seq("pos_v" -> "v > 0"))
    // purging the vectors rewrites files — the rewritten bytes go
    // through the gate and still satisfy the constraint
    graft.lakehouse.Maintenance.purgeDeletes(spark, root)
    assert(VersionedTable.read(spark, root).count() == 2)
    assert(VersionedTable.constraintsOf(spark, root)
      == Seq("pos_v" -> "v > 0"))
  }

  test("optimistic commits enforce and carry constraints") {
    val root = freshTable("ck7")
    VersionedTable.addConstraint(spark, root, "pos_v", "v > 0")
    VersionedTable.commitOptimistic(spark, root, keepVersions = 4) { cur =>
      cur.get.withColumn("v", col("v") + lit(1L))
    }
    assert(VersionedTable.constraintsOf(spark, root)
      == Seq("pos_v" -> "v > 0"))
    val before = VersionedTable.currentVersion(spark, root).get
    intercept[ConstraintViolatedException] {
      VersionedTable.commitOptimistic(spark, root, keepVersions = 4) { cur =>
        cur.get.withColumn("v", lit(-1L))
      }
    }
    assert(VersionedTable.currentVersion(spark, root).contains(before))
  }

  test("loader quarantines constraint-violating drops terminally") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import graft.lakehouse.{IncrementalLoader, LoadRegistry}
    val root = tmpDir("ckq")
    val src = s"$root/arrivals"; val table = s"$root/t"
    new java.io.File(src).mkdirs()
    VersionedTable.initDelta(spark, table, Seq((1L, 10L)).toDF("k", "v"),
      keepVersions = 4)
    VersionedTable.addConstraint(spark, table, "pos_v", "v > 0",
      keepVersions = 4)
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", LongType)))
    java.nio.file.Files.writeString(
      new java.io.File(src, "good.csv").toPath, "k,v\n2,20\n")
    java.nio.file.Files.writeString(
      new java.io.File(src, "bad.csv").toPath, "k,v\n3,-3\n")
    val r1 = IncrementalLoader.run(spark, src, table, s"$root/reg", schema,
      keepVersions = 4)
    assert(r1.loaded.size == 1 && r1.loaded.head.endsWith("good.csv"))
    assert(r1.quarantined.size == 1 &&
      r1.quarantined.head._1.endsWith("bad.csv"))
    assert(r1.quarantined.head._2.exists(_.contains("pos_v")))
    assert(VersionedTable.read(spark, table).count() == 2)
    // terminal: the rerun skips the quarantined drop (no retry loop)
    val r2 = IncrementalLoader.run(spark, src, table, s"$root/reg", schema,
      keepVersions = 4)
    assert(r2.loaded.isEmpty && r2.quarantined.isEmpty && r2.skipped.size == 2)
    assert(LoadRegistry.read(spark, s"$root/reg")
      .filter(col("status") === LoadRegistry.StatusQuarantined).count() == 1)
  }

  test("DESCRIBE graft.`root` shows schema, version, files, constraints") {
    val root = freshTable("ckdesc")
    VersionedTable.addConstraint(spark, root, "pos_v", "v > 0")
    val rows = spark.sql(s"DESCRIBE graft.`$root`").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.take(3).toSeq ==
      Seq(("k", "bigint"), ("s", "string"), ("v", "bigint")))
    assert(rows.contains(("version", "2")))
    assert(rows.exists { case (n, _) => n == "files" })
    assert(rows.contains(("constraint pos_v", "CHECK (v > 0)")))
    // renamed columns describe under their logical name
    VersionedTable.renameColumn(spark, root, "s", "label")
    val rows2 = spark.sql(s"DESCRIBE TABLE graft.`$root`").collect()
      .map(_.getString(0))
    assert(rows2.contains("label") && !rows2.contains("s"))
  }

  test("DROP/RENAME COLUMN refuse while a constraint references the column") {
    val root = freshTable("ck8")
    VersionedTable.addConstraint(spark, root, "pos_v", "v > 0")
    val e1 = intercept[IllegalArgumentException] {
      VersionedTable.dropColumn(spark, root, "v")
    }
    assert(e1.getMessage.contains("pos_v"))
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, root, "v", "val")
    }
    assert(e2.getMessage.contains("pos_v"))
    // unconstrained columns still evolve freely
    VersionedTable.renameColumn(spark, root, "s", "label")
    assert(VersionedTable.read(spark, root).columns.toSeq
      == Seq("k", "label", "v"))
    // after dropping the constraint the column frees up
    VersionedTable.dropConstraint(spark, root, "pos_v")
    VersionedTable.renameColumn(spark, root, "v", "val")
    assert(VersionedTable.read(spark, root).columns.toSeq
      == Seq("k", "label", "val"))
  }
}
