package graft.lakehouse

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Batch incremental ingestion — the Spark-native equivalent of the
  * reference's poll-and-refresh loop (`check_lakehouse.py:100-160`):
  * discover source files, skip the ones the registry already marks
  * loaded, append the rest to the lakehouse table, and record every
  * attempt.
  *
  * Differences from the reference, on purpose:
  *  - registry-based dedup instead of newest-mtime polling (mtime
  *    races lose files; a registry is exactly-once per path),
  *  - the load itself is a distributed CSV→parquet append, not a
  *    stored-procedure call,
  *  - per-file failure is recorded as `failed` and does not abort the
  *    batch (matches `is_apply=0` rows in the reference registry).
  *
  * Discovery lists file *names* only (metadata, small even at 100 TB
  * file counts); the data path never touches the driver.
  */
object IncrementalLoader {

  final case class LoadResult(loaded: Seq[String], skipped: Seq[String],
                              failed: Seq[String])

  /** Discover files under `srcDir` matching `suffix`. */
  def discover(spark: SparkSession, srcDir: String,
               suffix: String = ".csv"): Seq[String] = {
    val fs = FileSystem.get(new java.net.URI(srcDir),
      spark.sparkContext.hadoopConfiguration)
    val p = new Path(srcDir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(suffix))
      .map(_.getPath.toUri.getPath)
      .sorted
  }

  /** One incremental load pass: new files → append → registry. */
  def run(spark: SparkSession, srcDir: String, tableDir: String,
          registryDir: String, schema: StructType): LoadResult = {
    val all = discover(spark, srcDir)
    val loaded = LoadRegistry.loadedPaths(spark, registryDir)
      .collect().map(_.getString(0)).toSet
    val (skip, fresh) = all.partition(loaded.contains)

    val results = fresh.map { f =>
      try {
        val df = spark.read.schema(schema).option("header", "true").csv(f)
        val n = df.count()
        df.write.mode(SaveMode.Append).parquet(tableDir)
        (f, LoadRegistry.StatusOk, n)
      } catch {
        case e: Exception =>
          (f, LoadRegistry.StatusFailed, 0L)
      }
    }
    if (results.nonEmpty) LoadRegistry.record(spark, registryDir, results)
    LoadResult(
      loaded = results.collect { case (f, LoadRegistry.StatusOk, _) => f },
      skipped = skip,
      failed = results.collect { case (f, LoadRegistry.StatusFailed, _) => f })
  }
}
