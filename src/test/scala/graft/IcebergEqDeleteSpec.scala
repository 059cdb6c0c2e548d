package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.IcebergCompat

/** Iceberg EQUALITY deletes (content=2) with sequence-number ordering,
  * field-id column resolution across renames, and the appendTable
  * snapshot-commit writer (r12 verdict item 3 + stretch 8). */
class IcebergEqDeleteSpec extends SparkSpec {

  test("equality deletes apply null-safely, and ONLY to data files " +
      "with a strictly lower sequence number (re-inserts survive)") {
    import spark.implicits._
    val d = tmpDir("iceeq") + "/tbl"
    val src = Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, null))
      .toDF("id", "k").coalesce(1)
    IcebergCompat.writeTable(src, d) // snapshot 1, seq 1
    // eq-delete on k: values 'a' and NULL (null-safe matching)
    val s2 = IcebergCompat.deleteEquality(spark, d, Seq("k"),
      Seq(Option("a"), Option.empty[String]).toDF("k"))
    assert(s2 == 2L)
    assert(IcebergCompat.read(spark, d).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(2L))
    // re-insert k='a' rows AFTER the delete (snapshot 3, seq 3):
    // they must SURVIVE the seq-2 delete — the spec's ordering rule
    val s3 = IcebergCompat.appendTable(
      Seq((10L, "a"), (11L, null.asInstanceOf[String])).toDF("id", "k")
        .coalesce(1), d)
    assert(s3 == 3L)
    assert(IcebergCompat.read(spark, d).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(2L, 10L, 11L))
    // time travel: the pre-append snapshot still hides them
    assert(IcebergCompat.read(spark, d, asOfSnapshotId = Some(2L))
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(IcebergCompat.read(spark, d, asOfSnapshotId = Some(1L))
      .count() == 4L)
    // a SECOND eq delete (seq 4) now kills the re-inserted 'a' too
    val s4 = IcebergCompat.deleteEquality(spark, d, Seq("k"),
      Seq("a").toDF("k"))
    assert(s4 == 4L)
    assert(IcebergCompat.read(spark, d).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(2L, 11L))
  }

  test("composite equality ids: both columns must match") {
    import spark.implicits._
    val d = tmpDir("iceeq2") + "/tbl"
    IcebergCompat.writeTable(
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 10L))
        .toDF("id", "k", "v").coalesce(1), d)
    IcebergCompat.deleteEquality(spark, d, Seq("k", "v"),
      Seq(("a", 10L)).toDF("k", "v"))
    assert(IcebergCompat.read(spark, d).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("renameColumn: old data files resolve BY FIELD ID under the " +
      "new name; eq-deletes written before the rename still apply") {
    import spark.implicits._
    val d = tmpDir("iceren") + "/tbl"
    IcebergCompat.writeTable(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "k").coalesce(1), d)
    // delete k='b' BEFORE the rename (delete parquet carries 'k' + id 2)
    IcebergCompat.deleteEquality(spark, d, Seq("k"), Seq("b").toDF("k"))
    IcebergCompat.renameColumn(spark, d, "k", "category")
    val back = IcebergCompat.read(spark, d)
    assert(back.columns.toSeq == Seq("id", "category"))
    assert(back.collect().map(r => (r.getLong(0), r.getString(1)))
      .sorted.toSeq == Seq((1L, "a"), (3L, "c")))
    // a post-rename eq delete uses the NEW name
    IcebergCompat.deleteEquality(spark, d, Seq("category"),
      Seq("c").toDF("category"))
    assert(IcebergCompat.read(spark, d).select("id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    // appendTable after a rename writes under the current schema
    IcebergCompat.appendTable(Seq((9L, "z")).toDF("id", "category"), d)
    assert(IcebergCompat.read(spark, d).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 9L))
    // the renamed metadata kept both schemas; renaming a missing
    // column is loud
    val e = intercept[IllegalArgumentException] {
      IcebergCompat.renameColumn(spark, d, "nope", "x") }
    assert(e.getMessage.contains("no column"))
  }

  test("appendTable round-trips partitioned appends and stacks with " +
      "positional deletes") {
    import spark.implicits._
    val d = tmpDir("iceapp") + "/tbl"
    IcebergCompat.writeTable(
      Seq((1L, "x"), (2L, "y")).toDF("id", "k").coalesce(1), d,
      partitionBy = Seq("k"))
    IcebergCompat.appendTable(
      Seq((3L, "x"), (4L, "z")).toDF("id", "k").coalesce(1), d,
      partitionBy = Seq("k"))
    val back = IcebergCompat.read(spark, d)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1)))
      .sorted.toSeq ==
      Seq((1L, "x"), (2L, "y"), (3L, "x"), (4L, "z")))
    // partition pruning sees the appended partition values too
    assert(back.filter(col("k") === "x").count() == 2L)
    // positional delete on top of the append
    IcebergCompat.deletePositional(spark, d, col("id") === 3L)
    assert(IcebergCompat.read(spark, d).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 4L))
    // history intact through the stack
    assert(IcebergCompat.read(spark, d, asOfSnapshotId = Some(1L))
      .count() == 2L)
  }
}
