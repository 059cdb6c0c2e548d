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
  /** Loaded into an UNPUBLISHED branch (write–audit–publish): settled
    * while the branch lives, flipped `ok` on publish, `released` on
    * discard. */
  val StatusStaged = "staged"
  /** A staged load's branch was DISCARDED: the file returns to the
    * fresh pool and reloads next tick. The registry stays append-only
    * — precedence is by COUNT (staged > released ⇒ settled), so a
    * re-stage after a release settles again without any row updates. */
  val StatusReleased = "released"

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

  /** Append load attempts. MULTI-WRITER SAFE: a bare parquet
    * `mode(Append)` shares ONE `_temporary` committer dir across
    * concurrent writers — two racing recorders (optimistic loaders, a
    * second daemon between lease ticks) delete each other's task
    * files mid-commit. Each record therefore stages under a
    * writer-unique hidden dir and publishes as ONE object move —
    * concurrent recorders never touch shared paths, and a crash
    * leaves only an invisible underscore dir.
    *
    * `ok` rows are additionally EXACTLY-ONCE PER PATH by
    * construction (round 9): each publishes as its own object under a
    * path-DETERMINISTIC name (`rec-ok-<md5(path)>.parquet`), so two
    * actors that both legitimately processed the same file — an
    * unleased optimistic loader racing a branch publish flip, the
    * composition the registry-consistency property drives — converge
    * on ONE object and the registry can never carry two `ok` rows for
    * one path. (The racers' contents are equivalent — same file ⇒
    * same true n_rows — so which single write survives is
    * immaterial; the first existing object is kept.) Attempt-ledger
    * statuses (failed/staged/released/quarantined) stay uuid-named:
    * multiple attempts are real history. */
  def record(spark: SparkSession, registryDir: String,
             entries: Seq[(String, String, Long)]): Unit = {
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(registryDir), spark.sparkContext.hadoopConfiguration)
    def publishOne(rows: Seq[(String, String, Long)],
        objName: String, keepExisting: Boolean): Unit = {
      val dst = new org.apache.hadoop.fs.Path(registryDir, objName)
      if (keepExisting && fs.exists(dst)) return
      val tag = java.util.UUID.randomUUID().toString
      val stage = new org.apache.hadoop.fs.Path(s"$registryDir/_rec-$tag")
      rows.toDF("path", "status", "n_rows")
        .withColumn("loaded_at", current_timestamp())
        .select("path", "status", "loaded_at", "n_rows")
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(stage.toString)
      val part = fs.listStatus(stage)
        .find(_.getPath.getName.startsWith("part-"))
        .getOrElse(throw new IllegalStateException(
          s"no part file under $stage")).getPath
      val renamed = try fs.rename(part, dst)
        catch { case _: java.io.IOException => false }
      // a lost rename on a no-overwrite filesystem means the racer's
      // equivalent object landed first — success either way for the
      // deterministic names; uuid names cannot collide
      require(renamed || (keepExisting && fs.exists(dst)),
        s"registry record publish failed: $part -> $dst")
      fs.delete(stage, true)
    }
    val (oks, others) = entries.partition(_._2 == StatusOk)
    if (others.nonEmpty)
      publishOne(others, s"rec-${java.util.UUID.randomUUID()}.parquet",
        keepExisting = false)
    oks.foreach { e =>
      publishOne(Seq(e),
        s"rec-ok-${IncrementalLoader.publishedTag(e._1)}.parquet",
        keepExisting = true)
    }
  }

  /** Paths already loaded successfully (distinct, as a DataFrame so
    * callers can anti-join instead of collecting to the driver). */
  def loadedPaths(spark: SparkSession, registryDir: String): DataFrame =
    read(spark, registryDir)
      .filter(col("status") === StatusOk)
      .select("path").distinct()

  /** Paths the loader must not attempt again: loaded, quarantined
    * (audit rejections are deterministic — retrying re-rejects), or
    * staged into a still-live branch (count precedence: a path with
    * more `staged` than `released` rows is currently branch-held;
    * a discard appends `released`, unsettling it without rewriting
    * the append-only registry). One aggregate over the registry. */
  def settledPaths(spark: SparkSession, registryDir: String): DataFrame =
    read(spark, registryDir)
      .groupBy("path")
      .agg(
        count(when(col("status") === StatusOk, 1)).as("n_ok"),
        count(when(col("status") === StatusQuarantined, 1)).as("n_q"),
        count(when(col("status") === StatusStaged, 1)).as("n_s"),
        count(when(col("status") === StatusReleased, 1)).as("n_r"))
      .filter(col("n_ok") > 0 || col("n_q") > 0 || col("n_s") > col("n_r"))
      .select("path")
}
