package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.lakehouse.VersionedTable

/** Named branches — the true write–audit–publish lifecycle: isolated
  * appends on a zero-copy ref, audit against the ref, one-PUT atomic
  * publish, retention-proof base pinning, and conflict refusal. */
class BranchSpec extends SparkSpec {

  private def fs(root: String) =
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration)

  private def staged(root: String, prefix: String): Seq[String] =
    fs(root).listStatus(new Path(root)).toSeq
      .map(_.getPath.getName).filter(_.startsWith(prefix))

  private def initTable(prefix: String): String = {
    import spark.implicits._
    val root = tmpDir(prefix) + "/t"
    VersionedTable.commit(spark, root, keepVersions = 8) { stage =>
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
        .coalesce(1).write.parquet(stage)
    }
    root
  }

  test("branch lifecycle: isolated appends, audit read, atomic publish") {
    import spark.implicits._
    val root = initTable("br")
    val base = VersionedTable.createBranch(spark, root, "load_jan")
    assert(base == 1L)
    assert(VersionedTable.branches(spark, root) ==
      Map("load_jan" -> (1L, 1L)))
    // two isolated appends; main sees NOTHING of them
    VersionedTable.appendToBranch(spark, root, "load_jan",
      Seq((4L, 40L)).toDF("k", "v"))
    VersionedTable.appendToBranch(spark, root, "load_jan",
      Seq((5L, 50L)).toDF("k", "v"))
    assert(VersionedTable.read(spark, root).count() == 3,
      "main must not see unpublished branch appends")
    // the audit surface: the ref reads base ∪ appends
    val audit = VersionedTable.readBranch(spark, root, "load_jan")
    assert(audit.select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
    // publish: one commit, atomically visible, zero-copy
    val v = VersionedTable.publishBranch(spark, root, "load_jan")
    assert(v == 2L)
    assert(VersionedTable.read(spark, root).select("k")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // the branch is consumed; its staged dirs survive as live data
    assert(VersionedTable.branches(spark, root).isEmpty)
    assert(staged(root, "_v-b-load_jan-2").nonEmpty)
    // time travel to the pre-publish version still works
    assert(VersionedTable.readVersion(spark, root, 1L).count() == 3)
  }

  test("branch appends enforce the base version's CHECK constraints") {
    import spark.implicits._
    val root = initTable("brck")
    VersionedTable.addConstraint(spark, root, "v_pos", "v > 0")
    VersionedTable.createBranch(spark, root, "risky")
    intercept[VersionedTable.ConstraintViolatedException] {
      VersionedTable.appendToBranch(spark, root, "risky",
        Seq((9L, -1L)).toDF("k", "v"))
    }
    // the refused stage is deleted; the branch head did not advance
    assert(staged(root, "_v-b-risky-2").isEmpty)
    assert(VersionedTable.branches(spark, root)("risky")._2 == 1L)
    // a clean batch lands, and publish carries the constraint forward
    VersionedTable.appendToBranch(spark, root, "risky",
      Seq((9L, 90L)).toDF("k", "v"))
    VersionedTable.publishBranch(spark, root, "risky")
    intercept[VersionedTable.ConstraintViolatedException] {
      VersionedTable.appendDelta(spark, root) { stage =>
        Seq((10L, -5L)).toDF("k", "v").coalesce(1).write.parquet(stage)
      }
    }
  }

  test("publish refuses when main advanced past the branch base; " +
      "force replaces; drop cleans staged dirs") {
    import spark.implicits._
    val root = initTable("brconf")
    VersionedTable.createBranch(spark, root, "stale")
    VersionedTable.appendToBranch(spark, root, "stale",
      Seq((6L, 60L)).toDF("k", "v"))
    // main advances independently
    VersionedTable.appendDelta(spark, root, keepVersions = 8) { stage =>
      Seq((7L, 70L)).toDF("k", "v").coalesce(1).write.parquet(stage)
    }
    intercept[IllegalArgumentException] {
      VersionedTable.publishBranch(spark, root, "stale")
    }
    // drop: the ref, its pin, and its staged dirs all go
    assert(VersionedTable.dropBranch(spark, root, "stale"))
    assert(!VersionedTable.dropBranch(spark, root, "stale"))
    assert(staged(root, "_v-b-stale-2").isEmpty)
    assert(VersionedTable.tags(spark, root).isEmpty)
    // force path: a re-created branch publishes over the advanced main
    VersionedTable.createBranch(spark, root, "replace")
    VersionedTable.appendToBranch(spark, root, "replace",
      Seq((8L, 80L)).toDF("k", "v"))
    VersionedTable.publishBranch(spark, root, "replace", force = true)
    val ks = VersionedTable.read(spark, root).select("k")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ks == Seq(1L, 2L, 3L, 7L, 8L),
      s"force publish must replace with the branch snapshot: $ks")
  }

  test("the pinned base survives aggressive retention for the " +
      "branch's whole life; the pin releases on publish") {
    import spark.implicits._
    val root = initTable("brpin")
    VersionedTable.createBranch(spark, root, "slow_audit")
    VersionedTable.appendToBranch(spark, root, "slow_audit",
      Seq((6L, 60L)).toDF("k", "v"))
    // keepVersions=1 sweeps: without the pin, version 1's manifest
    // (the branch's schema/constraint anchor) would be pruned here
    (1 to 3).foreach { i =>
      VersionedTable.commit(spark, root, keepVersions = 1) { stage =>
        Seq((100L + i, 1L)).toDF("k", "v").coalesce(1).write.parquet(stage)
      }
    }
    assert(VersionedTable.readBranch(spark, root, "slow_audit")
      .select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 6L),
      "the branch must read through retention sweeps on main")
    VersionedTable.publishBranch(spark, root, "slow_audit", force = true)
    assert(VersionedTable.tags(spark, root).isEmpty, "pin must release")
    // vacuum never touches the published (referenced) branch dirs
    VersionedTable.vacuum(spark, root, olderThanMs = 0L)
    assert(VersionedTable.read(spark, root).select("k")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 6L))
  }

  test("branch procs drive the whole lifecycle from the SQL console") {
    import spark.implicits._
    import graft.lakehouse.SqlRunner
    val root = initTable("brsql")
    val created = SqlRunner.callProc(spark, "graft_create_branch",
      Seq(root, "sqlbr"))._1.head()
    assert(created.getString(0) == "sqlbr" && created.getLong(1) == 1L)
    // the observability pair: graft_branches TVF lists the live ref
    val tvf = spark.sql(s"SELECT * FROM graft_branches('$root')").head()
    assert(tvf.getString(0) == "sqlbr" && tvf.getLong(1) == 1L &&
      tvf.getLong(2) == 1L)
    VersionedTable.appendToBranch(spark, root, "sqlbr",
      Seq((6L, 60L)).toDF("k", "v"))
    val pub = SqlRunner.callProc(spark, "graft_publish_branch",
      Seq(root, "sqlbr"))._1.head()
    assert(pub.getLong(1) == 2L)
    assert(VersionedTable.read(spark, root).count() == 4)
    assert(!SqlRunner.callProc(spark, "graft_drop_branch",
      Seq(root, "gone"))._1.head().getBoolean(1))
  }

  test("branch-gated loader: whole-load audit across drops — stage, " +
      "discard returns files to the pool, publish flips them loaded") {
    import spark.implicits._
    import graft.lakehouse.{IncrementalLoader, LoadRegistry}
    val root = initTable("brload")
    val dir = tmpDir("brload-src")
    val reg = tmpDir("brload-reg") + "/reg"
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, v BIGINT")
    def drop(name: String, rows: Seq[(Long, Long)]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/$name.json"),
        rows.map { case (k, v) => s"""{"k": $k, "v": $v}""" }
          .mkString("\n").getBytes("UTF-8"))
    drop("d1", Seq((10L, 100L)))
    drop("d2", Seq((11L, 110L)))
    val r1 = IncrementalLoader.runToBranch(spark, dir, root, reg,
      schema, format = "json")
    assert(r1.loaded.size == 2 && r1.failed.isEmpty)
    assert(VersionedTable.read(spark, root).count() == 3,
      "staged loads must not touch main")
    assert(VersionedTable.readBranch(spark, root, "ingest").count() == 5)
    // settled while the branch lives: a re-run stages nothing
    val r2 = IncrementalLoader.runToBranch(spark, dir, root, reg,
      schema, format = "json")
    assert(r2.loaded.isEmpty && r2.skipped.size == 2)
    // the whole-load audit fails (say, a missing control file):
    // discard returns every staged file to the fresh pool
    val released = IncrementalLoader.discardStagedBranch(spark, root, reg)
    assert(released.size == 2)
    assert(VersionedTable.branches(spark, root).isEmpty)
    // next tick: the released drops re-stage alongside the new one
    drop("d3", Seq((12L, 120L)))
    val r3 = IncrementalLoader.runToBranch(spark, dir, root, reg,
      schema, format = "json")
    assert(r3.loaded.toSet.size == 3, r3.toString)
    // audit passes now: one publish, everything visible atomically
    IncrementalLoader.publishStagedBranch(spark, root, reg)
    assert(VersionedTable.read(spark, root).select("k")
      .collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 10L, 11L, 12L))
    assert(LoadRegistry.loadedPaths(spark, reg).count() == 3)
    // published files never reload
    val r4 = IncrementalLoader.runToBranch(spark, dir, root, reg,
      schema, format = "json")
    assert(r4.loaded.isEmpty && r4.skipped.size == 3)
    // a CHECK constraint refuses a staged drop terminally
    VersionedTable.addConstraint(spark, root, "v_pos", "v > 0")
    drop("bad", Seq((13L, -1L)))
    val r5 = IncrementalLoader.runToBranch(spark, dir, root, reg,
      schema, format = "json")
    assert(r5.quarantined.size == 1 && r5.loaded.isEmpty)
    assert(IncrementalLoader.runToBranch(spark, dir, root, reg,
      schema, format = "json").skipped.size == 4,
      "a quarantined drop must never retry")
  }

  test("publish-crash orphans reconcile: a later discard flips them " +
      "ok instead of releasing them into a second load") {
    import graft.lakehouse.{IncrementalLoader, LoadRegistry}
    val root = initTable("brorphan")
    val dir = tmpDir("brorphan-src")
    val reg = tmpDir("brorphan-reg") + "/reg"
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, v BIGINT")
    def drop(name: String, rows: Seq[(Long, Long)]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/$name.json"),
        rows.map { case (k, v) => s"""{"k": $k, "v": $v}""" }
          .mkString("\n").getBytes("UTF-8"))
    drop("d1", Seq((10L, 100L)))
    assert(IncrementalLoader.runToBranch(spark, dir, root, reg,
      schema, format = "json").loaded.size == 1)
    // CRASH INJECTION: publishStagedBranch dies AFTER the branch
    // publish (d1's rows are now live on main) but BEFORE recording
    // StatusOk — reproduce by publishing the branch directly
    VersionedTable.publishBranch(spark, root, "ingest")
    assert(VersionedTable.read(spark, root).count() == 4)
    assert(LoadRegistry.loadedPaths(spark, reg).count() == 0,
      "crash window: registry still says staged")
    // next tick stages a fresh drop on a recreated branch, then its
    // audit FAILS → discard. d1 is an orphan of the crashed publish:
    // it must flip ok (its rows are on main), never release
    drop("d2", Seq((11L, 110L)))
    assert(IncrementalLoader.runToBranch(spark, dir, root, reg,
      schema, format = "json").loaded.size == 1)
    val released = IncrementalLoader.discardStagedBranch(spark, root, reg)
    assert(released.size == 1 && released.head.endsWith("d2.json"),
      s"only the unpublished drop may release, got $released")
    assert(LoadRegistry.loadedPaths(spark, reg).count() == 1,
      "the orphan reconciles to ok")
    // the released drop reloads and publishes; the orphan NEVER
    // reloads — main holds exactly one copy of d1's rows
    assert(IncrementalLoader.runToBranch(spark, dir, root, reg,
      schema, format = "json").loaded.size == 1)
    IncrementalLoader.publishStagedBranch(spark, root, reg)
    assert(VersionedTable.read(spark, root).select("k")
      .collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 10L, 11L),
      "d1 must appear exactly once after the crash-recovery cycle")
    // publish-side reconciliation too: a staged orphan present when
    // publishStagedBranch next runs flips ok without re-publishing
    assert(LoadRegistry.loadedPaths(spark, reg).count() == 2)
  }

  test("daemon branchGate: a tick-level row floor holds the whole " +
      "load back, released drops publish with the next tick's") {
    import graft.lakehouse.{Automation, DataQuality, SurveyGen}
    val root = tmpDir("brgate")
    val table = s"$root/t"
    // a VERSIONED base (the gate's precondition; flat tables load
    // plainly until migrated)
    val seedDir = s"$root/seed"
    SurveyGen.writeArrival(spark, seedDir, "seed.csv", 10, seed = 1)
    val seed = spark.read.schema(SurveyGen.schema)
      .option("header", "true").csv(s"$seedDir/seed.csv")
    VersionedTable.commit(spark, table, keepVersions = 8) { stage =>
      seed.coalesce(1).write.parquet(stage)
    }
    val auto = new Automation(spark, Automation.Config(
      srcDir = s"$root/arrivals", tableDir = table,
      registryDir = s"$root/reg", rowsPerDrop = 500L,
      loadKeepVersions = 8,
      branchGate = Some(Seq(DataQuality.MinRows(610)))))
    // tick 1: one 500-row drop stages, the whole-load floor (610 over
    // base 10 + staged 500 = 510) fails -> discarded, nothing publishes
    val r1 = auto.tick()
    assert(r1.load.loaded.isEmpty && r1.load.failed.size == 1, r1.toString)
    assert(VersionedTable.read(spark, table).count() == 10,
      "a held-back load must not touch main")
    assert(VersionedTable.branches(spark, table).isEmpty)
    // tick 2: the released drop re-stages WITH the new one — 1010
    // rows clear the floor, one publish lands both atomically
    val r2 = auto.tick()
    assert(r2.load.loaded.size == 2, r2.toString)
    assert(VersionedTable.read(spark, table).count() == 1010)
  }

  test("branching a version with merge-on-read deletes refuses; " +
      "crashed-drop orphans age out of vacuum") {
    import spark.implicits._
    val root = initTable("brmor")
    VersionedTable.deleteWhere(spark, root, col("v") === 20L)
    intercept[IllegalArgumentException] {
      VersionedTable.createBranch(spark, root, "overmor")
    }
    graft.lakehouse.Maintenance.purgeDeletes(spark, root)
    VersionedTable.createBranch(spark, root, "ok")
    VersionedTable.appendToBranch(spark, root, "ok",
      Seq((6L, 60L)).toDF("k", "v"))
    // simulate a crashed dropBranch: ref gone, staged dir left behind
    fs(root).delete(new Path(s"$root/_branches/ok"), true)
    assert(staged(root, "_v-b-ok-2").nonEmpty)
    VersionedTable.vacuum(spark, root, olderThanMs = 0L)
    assert(staged(root, "_v-b-ok-2").isEmpty,
      "an orphaned branch stage dir must age out of vacuum")
  }
}
