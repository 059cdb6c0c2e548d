package graft.lakehouse

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Load-attempt registry — the Spark-native `check_files` table the
  * reference keeps in SQLite (`check_lakehouse.py:101-118`,
  * `lib/commondb.py:9-54`): one row per ingested file with status and
  * load timestamp, stored as a parquet table so it scales past a
  * single node and survives the driver.
  *
  * Schema: (path string, status string, loaded_at timestamp,
  * n_rows long).
  */
object LoadRegistry {

  val StatusOk = "ok"
  val StatusFailed = "failed"
  /** Data-quality audit rejected the batch: deterministic, so unlike
    * `failed` (transient errors, retried) it is never retried. */
  val StatusQuarantined = "quarantined"

  /** Read the registry; empty DataFrame (right schema) if absent. */
  def read(spark: SparkSession, registryDir: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(registryDir), spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(registryDir)))
      spark.read.parquet(registryDir)
    else {
      import spark.implicits._
      Seq.empty[(String, String, java.sql.Timestamp, Long)]
        .toDF("path", "status", "loaded_at", "n_rows")
    }
  }

  /** Append load attempts. */
  def record(spark: SparkSession, registryDir: String,
             entries: Seq[(String, String, Long)]): Unit = {
    import spark.implicits._
    entries.toDF("path", "status", "n_rows")
      .withColumn("loaded_at", current_timestamp())
      .select("path", "status", "loaded_at", "n_rows")
      .write.mode(SaveMode.Append).parquet(registryDir)
  }

  /** Paths already loaded successfully (distinct, as a DataFrame so
    * callers can anti-join instead of collecting to the driver). */
  def loadedPaths(spark: SparkSession, registryDir: String): DataFrame =
    read(spark, registryDir)
      .filter(col("status") === StatusOk)
      .select("path").distinct()

  /** Paths the loader must not attempt again: loaded OR quarantined
    * (audit rejections are deterministic — retrying re-rejects). */
  def settledPaths(spark: SparkSession, registryDir: String): DataFrame =
    read(spark, registryDir)
      .filter(col("status") === StatusOk ||
        col("status") === StatusQuarantined)
      .select("path").distinct()
}
