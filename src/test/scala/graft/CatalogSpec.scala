package graft

import org.apache.spark.sql.functions._
import graft.lakehouse.{Catalog, VersionedTable}

/** Multi-table atomic commits through the catalog: snapshot
  * isolation across tables, crash-window consistency, time travel,
  * conflict arbitration. */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private def writeVersion(root: String, ids: Seq[Int]): Long =
    VersionedTable.commit(spark, root, keepVersions = 10) { dir =>
      ids.toDF("id").write.parquet(dir)
    }

  test("commitAll flips every table with one catalog version") {
    val base = tmpDir("cat-basic")
    val cat = s"$base/cat"
    val (ta, tb) = (s"$base/a", s"$base/b")

    val s1 = Catalog.commitAll(spark, cat, Seq(
      Catalog.TableWrite("a", ta, () => writeVersion(ta, Seq(1, 2))),
      Catalog.TableWrite("b", tb, () => writeVersion(tb, Seq(10)))))
    assert(s1.version == 0)
    assert(Catalog.read(spark, cat, "a").count() == 2)
    assert(Catalog.read(spark, cat, "b").count() == 1)

    // second transaction touches only `a`; `b` carries over pinned
    val s2 = Catalog.commitAll(spark, cat, Seq(
      Catalog.TableWrite("a", ta, () => writeVersion(ta, Seq(1, 2, 3)))))
    assert(s2.version == 1)
    assert(Catalog.read(spark, cat, "a").count() == 3)
    assert(Catalog.read(spark, cat, "b").count() == 1)
    assert(s2.tables("b") == s1.tables("b"))
  }

  test("crash between table commits and catalog flip leaves the old snapshot consistent") {
    val base = tmpDir("cat-crash")
    val cat = s"$base/cat"
    val (ta, tb) = (s"$base/a", s"$base/b")
    Catalog.commitAll(spark, cat, Seq(
      Catalog.TableWrite("a", ta, () => writeVersion(ta, Seq(1))),
      Catalog.TableWrite("b", tb, () => writeVersion(tb, Seq(1)))))

    // simulate the crash window: both tables commit new versions,
    // the catalog PUT never happens
    writeVersion(ta, Seq(1, 2))
    writeVersion(tb, Seq(1, 2))

    // catalog readers still see the OLD snapshot of BOTH tables —
    // never one new + one old
    val snap = Catalog.current(spark, cat).get
    assert(snap.read(spark, "a").count() == 1)
    assert(snap.read(spark, "b").count() == 1)
    // direct table reads DO see the orphaned versions (they are
    // ordinary retained history)
    assert(VersionedTable.read(spark, ta).count() == 2)

    // the retried transaction publishes past the orphans
    val s2 = Catalog.commitAll(spark, cat, Seq(
      Catalog.TableWrite("a", ta, () => writeVersion(ta, Seq(1, 2, 3))),
      Catalog.TableWrite("b", tb, () => writeVersion(tb, Seq(1, 2, 3)))))
    assert(s2.read(spark, "a").count() == 3)
    assert(s2.read(spark, "b").count() == 3)
  }

  test("a held snapshot stays consistent while transactions land (snapshot isolation)") {
    val base = tmpDir("cat-iso")
    val cat = s"$base/cat"
    val (ta, tb) = (s"$base/a", s"$base/b")
    Catalog.commitAll(spark, cat, Seq(
      Catalog.TableWrite("a", ta, () => writeVersion(ta, Seq(1))),
      Catalog.TableWrite("b", tb, () => writeVersion(tb, Seq(1)))))
    val held = Catalog.current(spark, cat).get

    Catalog.commitAll(spark, cat, Seq(
      Catalog.TableWrite("a", ta, () => writeVersion(ta, (1 to 5))),
      Catalog.TableWrite("b", tb, () => writeVersion(tb, (1 to 5)))))

    // the held snapshot reads the transaction-0 versions of both
    assert(held.read(spark, "a").count() == 1)
    assert(held.read(spark, "b").count() == 1)
    // current reads transaction-1 versions of both
    val now = Catalog.current(spark, cat).get
    assert(now.read(spark, "a").count() == 5)
    assert(now.read(spark, "b").count() == 5)
    // time travel re-serves the old boundary
    val tt = Catalog.snapshotAsOf(spark, cat, held.version)
    assert(tt.tables == held.tables)
  }

  test("failed write publishes nothing; catalog conflict is detected") {
    val base = tmpDir("cat-fail")
    val cat = s"$base/cat"
    val ta = s"$base/a"
    Catalog.commitAll(spark, cat, Seq(
      Catalog.TableWrite("a", ta, () => writeVersion(ta, Seq(1)))))

    intercept[RuntimeException] {
      Catalog.commitAll(spark, cat, Seq(
        Catalog.TableWrite("a", ta, () => writeVersion(ta, Seq(1, 2))),
        Catalog.TableWrite("boom", s"$base/boom",
          () => throw new RuntimeException("writer died"))))
    }
    // nothing published: catalog still serves version 0 of `a`
    val snap = Catalog.current(spark, cat).get
    assert(snap.version == 0)
    assert(snap.read(spark, "a").count() == 1)

    // racing transaction: another writer publishes catalog version 1
    // INSIDE our window (after we read current=0, while our table
    // writes run) — the loser's catalog PUT must fail loudly
    intercept[Catalog.CatalogConflictException] {
      Catalog.commitAll(spark, cat, Seq(
        Catalog.TableWrite("a", ta, () => {
          val fs = org.apache.hadoop.fs.FileSystem.get(
            new java.net.URI(cat), spark.sparkContext.hadoopConfiguration)
          fs.create(new org.apache.hadoop.fs.Path(s"$cat/_catalog/1"),
            false).close()
          writeVersion(ta, Seq(1, 2))
        })))
    }
  }

  test("register pins pre-existing tables; prune drops old catalog versions only") {
    val base = tmpDir("cat-reg")
    val cat = s"$base/cat"
    val ta = s"$base/a"
    writeVersion(ta, Seq(1, 2, 3))
    val s0 = Catalog.register(spark, cat, Seq("a" -> ta))
    assert(s0.read(spark, "a").count() == 3)

    Catalog.commitAll(spark, cat, Seq(
      Catalog.TableWrite("a", ta, () => writeVersion(ta, (1 to 4)))))
    Catalog.commitAll(spark, cat, Seq(
      Catalog.TableWrite("a", ta, () => writeVersion(ta, (1 to 5)))))
    Catalog.prune(spark, cat, keep = 1)
    intercept[IllegalArgumentException] {
      Catalog.snapshotAsOf(spark, cat, 0)
    }
    // current snapshot unaffected; table data untouched
    assert(Catalog.current(spark, cat).get.read(spark, "a").count() == 5)

    // unknown table name refuses loudly
    intercept[IllegalArgumentException] {
      Catalog.current(spark, cat).get.read(spark, "nope")
    }
  }

  test("graft_catalog TVF serves the snapshot as SQL") {
    val base = tmpDir("cat-tvf")
    val cat = s"$base/cat"
    val (ta, tb) = (s"$base/a", s"$base/b")
    Catalog.commitAll(spark, cat, Seq(
      Catalog.TableWrite("a", ta, () => writeVersion(ta, Seq(1))),
      Catalog.TableWrite("b", tb, () => writeVersion(tb, Seq(1, 2)))))
    graft.functions.GraftFunctions.registerTableFunctions(spark)
    val rows = spark.sql(s"SELECT * FROM graft_catalog('$cat') ORDER BY 2")
      .collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(1)).toSeq == Seq("a", "b"))
    assert(rows.forall(_.getLong(0) == 0L))
  }
}
