package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.lakehouse.{JoinView, Maintenance, VersionedTable}

/** Incrementally-maintained fact ⋈ dim enrichment view: O(batch)
  * appends, CDC-driven file-granular dim sync, ≡ from-scratch join. */
class JoinViewSpec extends SparkSpec {

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def scratch(fact: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame = fact.join(dim, keys, "left")

  test("join view: appends fold O(batch); view ≡ from-scratch join") {
    import spark.implicits._
    val dir = tmpDir("jview")
    val dimRoot = s"$dir/dim"; val viewRoot = s"$dir/view"
    val dim = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("k", "label")
    VersionedTable.init(spark, dimRoot, dim, keepVersions = 8)
    val f0 = Seq((10L, 1L, 5.0), (11L, 2L, 6.0)).toDF("id", "k", "x")
    JoinView.init(spark, viewRoot, f0, dimRoot, Seq("k"))

    val f1 = Seq((12L, 3L, 7.0), (13L, 9L, 8.0)).toDF("id", "k", "x")
    JoinView.appendFact(spark, viewRoot, dimRoot, f1, batchId = Some(1L))
    val f2 = Seq((14L, 1L, 9.0)).toDF("id", "k", "x")
    JoinView.appendFact(spark, viewRoot, dimRoot, f2, batchId = Some(2L))

    val allFacts = f0.unionByName(f1).unionByName(f2)
    assert(sortedRows(JoinView.read(spark, viewRoot)) ==
      sortedRows(scratch(allFacts, dim, Seq("k"))))
    // k=9 has no dim row → null-extended
    assert(JoinView.read(spark, viewRoot)
      .filter(col("id") === 13L && col("label").isNull).count() == 1)
    // appends carried everything by reference: 3 version dirs hold
    // their own batch only
    val refs = VersionedTable.filesOf(spark, viewRoot,
      VersionedTable.currentVersion(spark, viewRoot).get).get
    assert(refs.exists(_.startsWith("_v-1/")) &&
      refs.exists(_.startsWith("_v-2/")) && refs.exists(_.startsWith("_v-3/")))
  }

  test("join view: redelivered batch id no-ops (exactly-once)") {
    import spark.implicits._
    val dir = tmpDir("jviewdup")
    val dimRoot = s"$dir/dim"; val viewRoot = s"$dir/view"
    VersionedTable.init(spark, dimRoot,
      Seq((1L, "a")).toDF("k", "label"), keepVersions = 8)
    JoinView.init(spark, viewRoot,
      Seq((10L, 1L)).toDF("id", "k"), dimRoot, Seq("k"))
    val b = Seq((11L, 1L)).toDF("id", "k")
    val v1 = JoinView.appendFact(spark, viewRoot, dimRoot, b, Some(7L))
    val v2 = JoinView.appendFact(spark, viewRoot, dimRoot, b, Some(7L))
    assert(v1 == v2)
    assert(JoinView.read(spark, viewRoot).count() == 2)
  }

  test("join view: dim upsert syncs file-granularly; deleted key null-extends") {
    import spark.implicits._
    val dir = tmpDir("jviewsync")
    val dimRoot = s"$dir/dim"; val viewRoot = s"$dir/view"
    val dim0 = spark.range(0, 100).toDF("k")
      .select(col("k"), concat(lit("label"), col("k")).as("label"))
    VersionedTable.init(spark, dimRoot, dim0, keepVersions = 8)
    // fact clustered on k → changed keys live in few view files
    val fact = spark.range(0, 4000).toDF("id")
      .select(col("id"), (col("id") % 100L).as("k"),
        (col("id") * 2L).cast("double").as("x"))
      .repartitionByRange(8, col("k")).sortWithinPartitions("k")
    JoinView.init(spark, viewRoot, fact, dimRoot, Seq("k"))

    // dim moves: k=5 relabeled, k=7 deleted, k=200 inserted (no facts)
    Maintenance.upsertVersioned(spark, dimRoot,
      Seq((5L, "RELABELED"), (200L, "fresh")).toDF("k", "label"), Seq("k"),
      keepVersions = 8)
    VersionedTable.rewrite(spark, dimRoot, keepVersions = 8)(
      _.filter(col("k") =!= 7L))

    JoinView.syncDim(spark, viewRoot, dimRoot)
    val dimNow = VersionedTable.read(spark, dimRoot)
    assert(sortedRows(JoinView.read(spark, viewRoot)) ==
      sortedRows(scratch(fact, dimNow, Seq("k"))))
    assert(JoinView.read(spark, viewRoot)
      .filter(col("k") === 5L && col("label") === "RELABELED")
      .count() == 40)
    assert(JoinView.read(spark, viewRoot)
      .filter(col("k") === 7L && col("label").isNull).count() == 40)
    // file-granular: some v1 files carried by reference
    val refs = VersionedTable.filesOf(spark, viewRoot,
      VersionedTable.currentVersion(spark, viewRoot).get).get
    assert(refs.exists(_.startsWith("_v-1/")),
      s"sync rewrote everything: $refs")
    // pin advanced: a second sync with no dim movement no-ops
    val v = VersionedTable.currentVersion(spark, viewRoot).get
    assert(JoinView.syncDim(spark, viewRoot, dimRoot) == v)
  }

  test("join view: appends after a sync join the NEW dim snapshot") {
    import spark.implicits._
    val dir = tmpDir("jviewpin")
    val dimRoot = s"$dir/dim"; val viewRoot = s"$dir/view"
    VersionedTable.init(spark, dimRoot,
      Seq((1L, "old")).toDF("k", "label"), keepVersions = 8)
    JoinView.init(spark, viewRoot,
      Seq((10L, 1L)).toDF("id", "k"), dimRoot, Seq("k"))
    Maintenance.upsertVersioned(spark, dimRoot,
      Seq((1L, "new")).toDF("k", "label"), Seq("k"), keepVersions = 8)
    // BEFORE sync, appends still join the pinned old snapshot —
    // the view stays a consistent cut
    JoinView.appendFact(spark, viewRoot, dimRoot,
      Seq((11L, 1L)).toDF("id", "k"), Some(1L))
    assert(JoinView.read(spark, viewRoot)
      .filter(col("label") === "old").count() == 2)
    // sync rewrites BOTH rows to the new label
    JoinView.syncDim(spark, viewRoot, dimRoot)
    assert(JoinView.read(spark, viewRoot)
      .filter(col("label") === "new").count() == 2)
    // post-sync appends join the new snapshot
    JoinView.appendFact(spark, viewRoot, dimRoot,
      Seq((12L, 1L)).toDF("id", "k"), Some(2L))
    assert(JoinView.read(spark, viewRoot)
      .filter(col("label") === "new").count() == 3)
  }

  test("join view: init refuses overlapping non-key columns") {
    import spark.implicits._
    val dir = tmpDir("jviewbad")
    val dimRoot = s"$dir/dim"
    VersionedTable.init(spark, dimRoot,
      Seq((1L, "a")).toDF("k", "x"), keepVersions = 2)
    val e = intercept[IllegalArgumentException] {
      JoinView.init(spark, s"$dir/view",
        Seq((10L, 1L, 1.0)).toDF("id", "k", "x"), dimRoot, Seq("k"))
    }
    assert(e.getMessage.contains("share non-key columns"))
  }
}
