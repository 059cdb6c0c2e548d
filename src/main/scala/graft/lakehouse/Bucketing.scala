package graft.lakehouse

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table layout management — the lakehouse answer to "this
  * join shuffles 100 TB every night".
  *
  * Writing both sides of a recurring equi-join bucketed (and sorted)
  * on the join key pins an identical HashPartitioning on disk; Spark's
  * scan then reports that partitioning and EnsureRequirements plans
  * the join with ZERO exchanges — the shuffle is paid once at write
  * time, amortized over every subsequent join, which is exactly the
  * economics a 100 TB fact table wants. (The reference's lakehouse
  * reload, `check_lakehouse.py:139-160`, re-materializes tables on
  * every refresh; bucketing is what makes the re-materialized layout
  * join-efficient.)
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed + sorted on
    * `key`. Bucket count should be sized so one bucket of the LARGER
    * table fits an executor's scan partition at the target scale. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Equi-join two tables previously written by [[writeBucketed]]
    * with the same bucket count on `key`: plans with no exchange on
    * either side. */
  def coLocatedJoin(spark: SparkSession, tableA: String, tableB: String,
      key: String): DataFrame =
    spark.table(tableA).join(spark.table(tableB), Seq(key))

  /** Hive-style partitioned layout: one directory per value of
    * `partCol`. Time-filtered queries then PRUNE partitions at
    * planning time (`PartitionFilters` in the scan) — at 100 TB the
    * difference between scanning a day and scanning a decade. The
    * reference's datagen writes day-stamped files (`datagen.py:76`);
    * this is that layout made query-aware. */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** Read back a partitioned root; filters on the partition column
    * prune directories before any file is opened. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Range-clustered layout (the CLUSTER BY of a table format):
    * `repartitionByRange` + in-partition sort gives files with
    * DISJOINT `key` ranges and tight per-row-group min/max stats, so
    * a pushed range predicate skips whole row groups / files at scan
    * time — the sort-heavy twin of [[writeBucketed]]'s equi-join
    * layout. Also the right pre-layout for the as-of join's
    * (key, time) ordering requirement. Sampling inside
    * repartitionByRange is seeded by the data, so the layout is
    * reproducible for a fixed input. */
  def writeRangePartitioned(df: DataFrame, path: String, key: String,
      files: Int): Unit =
    df.repartitionByRange(files, df(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(path)

  /** Z-order (Morton) clustered layout: interleave the bits of TWO
    * normalized numeric keys and range-cluster on the interleaved
    * value, so files carry tight min/max extents on BOTH columns —
    * where [[writeRangePartitioned]] gives perfect skipping on one
    * column and none on the other, z-order gives ~√files skipping on
    * each. The normalization is min/max scaling to 16 bits (one cheap
    * aggregate, broadcast back); the interleave is four shift-mask
    * steps per key, all codegen. This is the multi-dimensional data-
    * skipping layout of the big table formats, without the format. */
  def writeZOrdered(df: DataFrame, path: String, colA: String,
      colB: String, files: Int): Unit =
    writeZOrdered(df, path, Seq(colA, colB), files)

  /** N-column form (2-4 columns; see [[zorderLayout]]). */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
      files: Int): Unit =
    zorderLayout(df, cols, files)
      .write.mode("overwrite").parquet(path)

  /** The z-ordered clustering as a TRANSFORMATION — what
    * [[writeZOrdered]] writes, and what compaction feeds into a
    * versioned commit ([[Maintenance.compactVersioned]] with
    * `zorderCols`): re-clustering maintenance is how a table whose
    * ingestion order scatters both query dimensions gets its
    * skipping index back without a layout-aware writer. */
  def zorderLayout(df: DataFrame, colA: String, colB: String,
      files: Int): DataFrame =
    zorderLayout(df, Seq(colA, colB), files)

  /** N-COLUMN z-order (2 ≤ n ≤ 4): bits-per-column shrinks so the
    * interleave stays inside a non-negative long (16 bits up to 3
    * columns — 48 interleaved bits; 15 at 4 — 60 bits; the sign bit
    * must stay clear or the curve's order breaks at the top bit).
    * The per-bit spread is a generated shift-mask OR chain (bits·n
    * terms, all codegen) — the generalization of the 2-column magic
    * ladder, identical output at n = 2. */
  def zorderLayout(df: DataFrame, cols: Seq[String],
      files: Int): DataFrame = {
    val n = cols.size
    require(n >= 2 && n <= 4,
      s"z-order interleave supports 2-4 columns, got $n")
    val bits = if (n <= 3) 16 else 15
    val maxV = (1L << bits) - 1
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c)).cast("double").as(s"_mn$i"),
        max(col(c)).cast("double").as(s"_mx$i"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*)
    def normB(c: Column, mn: Column, mx: Column): Column =
      when(mx === mn, lit(0L)).otherwise(
        floor((c.cast("double") - mn) / (mx - mn) * maxV.toDouble)
          .cast("long"))
    def spreadN(c: Column, lane: Int): Column =
      (0 until bits).map { b =>
        shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + lane)
      }.reduce(_ bitwiseOR _)
    val z = cols.zipWithIndex.map { case (c, i) =>
      spreadN(normB(col(c), col(s"_mn$i"), col(s"_mx$i")), i)
    }.reduce(_ bitwiseOR _)
    val statCols = cols.indices.flatMap(i => Seq(s"_mn$i", s"_mx$i"))
    df.crossJoin(broadcast(stats))
      .withColumn("_z", z)
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z" +: statCols: _*)
  }

}
