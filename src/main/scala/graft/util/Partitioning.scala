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
}
