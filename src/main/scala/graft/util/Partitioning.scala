package graft.util

import org.apache.spark.sql.DataFrame

/** Parallelism repair for row-MULTIPLYING stages. */
object Partitioning {

  /** Widen a DataFrame about to feed a row-multiplying stage (an n·k
    * centroid-scoring cross, an m-way subvector posexplode): input
    * splits are sized for SCANNING (`files.maxPartitionBytes`), which
    * is k× too coarse once every row fans out k ways — at sf10 the
    * 51 MB embeddings table arrives as ONE split, so the 89M-row
    * scored pass (n=200 k × nlist=447) ran as one task (round-11
    * find: a 14-minute single-task sort-aggregate in the index
    * build). A round-robin repartition to the session's shuffle
    * parallelism costs one n-row shuffle and parallelizes the k·n
    * work. UNCONDITIONAL by design: probing the current partition
    * count via `df.rdd` under AQE EXECUTES the upstream query stages
    * to finalize the adaptive plan — strictly worse than the one
    * narrow shuffle the probe would save (measured: the probe hung
    * the sf10 index build). All downstream consumers are
    * partition-invariant by the library's determinism discipline
    * (exact/decimal aggregates, total-order tiebreaks), so results
    * are unchanged. */
  def widenForExplosion(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt)

  /** Size-dispatched widen (r14): widen `df` ONLY when its backing
    * parquet file/dir is small enough to arrive as a single scan
    * split. A multi-split input is already parallel — there the
    * repartition is a pure extra exchange of every row (data-scaled
    * waste at 100 TB); a single-split input is the case the widen
    * exists for. The probe is filesystem METADATA only (no Spark job,
    * no AQE finalization — the reason widenForExplosion itself stays
    * probe-free): total bytes vs `spark.sql.files.maxPartitionBytes`. */
  def widenIfSingleSplit(df: DataFrame, backingPath: String): DataFrame = {
    val s = df.sparkSession
    val bytes = try {
      val p = new org.apache.hadoop.fs.Path(backingPath)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.getContentSummary(p).getLength
    } catch { case _: Exception => 0L } // unknown → treat as small
    if (bytes > s.sessionState.conf.filesMaxPartitionBytes) df
    else widenForExplosion(df)
  }
}
