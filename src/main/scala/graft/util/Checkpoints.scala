package graft.util

import org.apache.spark.sql.Dataset

/** Lineage cuts for the ITERATIVE operators (PageRank, k-core,
  * connected components, video frame dedup, BPE word builds) with a
  * FAULT-TOLERANT path for real clusters.
  *
  * `Dataset.localCheckpoint(true)` pins the cut state in EXECUTOR
  * storage and truncates lineage — the right single-JVM fast path
  * (zero I/O), but on a multi-executor cluster one executor loss
  * mid-iteration loses blocks that no lineage can rebuild, failing an
  * hours-long iterative job unrecoverably. With
  * `spark.graft.checkpointDir` set, [[cut]] switches every such site
  * to RELIABLE `Dataset.checkpoint`: the cut state is written to the
  * shared filesystem (HDFS/object store), and a lost executor's
  * partitions are re-read instead of lost. Both paths go through the
  * same `Dataset.checkpoint(eager, reliable)` machinery, so the
  * physical partitioning is preserved in the resulting LogicalRDD
  * either way (the property the PageRank edge layout depends on) and
  * results are bit-identical (spec-pinned: CheckpointSpec).
  *
  * Deployment: set `spark.graft.checkpointDir` to a job-scoped shared
  * path; Spark only cleans these files on context stop when
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true`, so a
  * per-job directory that the orchestrator removes afterwards is the
  * robust pattern.
  */
object Checkpoints {

  /** When set (non-empty), every [[cut]] is a reliable checkpoint
    * into this directory; unset → executor-local (fast, single-node).
    *
    * MULTI-SESSION CAVEAT (r10 verdict finding 4): the underlying
    * `SparkContext.setCheckpointDir` is PROCESS-GLOBAL, and the
    * `setFor` cache below is last-writer-wins — two SparkSessions in
    * one JVM configured with DIFFERENT checkpoint dirs would thrash
    * the context-level dir (each cut re-pointing it). Results stay
    * correct (every checkpoint still lands under whichever dir was
    * set when it ran), but files interleave across the two dirs. If
    * this library is ever embedded in a multi-session server, key the
    * cache per SparkContext; every current caller is single-session. */
  val DirKey = "spark.graft.checkpointDir"

  /** Cut the lineage of `ds`, eagerly materializing it. */
  def cut[T](ds: Dataset[T]): Dataset[T] = cut(ds, eager = true)

  // setCheckpointDir mints a fresh UUID subdir per call (and
  // getCheckpointDir returns the QUALIFIED uri, so a prefix test
  // against the raw conf value misfires) — remember the conf value we
  // last set so every cut of a job lands in one directory
  @volatile private var setFor: Option[String] = None

  def cut[T](ds: Dataset[T], eager: Boolean): Dataset[T] = {
    val spark = ds.sparkSession
    spark.conf.getOption(DirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        if (!setFor.contains(dir) || sc.getCheckpointDir.isEmpty)
          synchronized {
            if (!setFor.contains(dir) || sc.getCheckpointDir.isEmpty) {
              sc.setCheckpointDir(dir)
              setFor = Some(dir)
            }
          }
        ds.checkpoint(eager)
      case None => ds.localCheckpoint(eager)
    }
  }

  /** RDD form (the BpeTrainer unbounded merge loop). `RDD.checkpoint`
    * is LAZY — it materializes at the rdd's next action, which every
    * call site follows with (`count()`). */
  def cutRdd[T](rdd: org.apache.spark.rdd.RDD[T]): org.apache.spark.rdd.RDD[T] = {
    val sc = rdd.sparkContext
    org.apache.spark.sql.SparkSession.active.conf
      .getOption(DirKey).filter(_.nonEmpty) match {
      case Some(d) =>
        if (!setFor.contains(d) || sc.getCheckpointDir.isEmpty)
          synchronized {
            if (!setFor.contains(d) || sc.getCheckpointDir.isEmpty) {
              sc.setCheckpointDir(d)
              setFor = Some(d)
            }
          }
        rdd.checkpoint()
      case None => rdd.localCheckpoint()
    }
    rdd
  }

  /** `ds.cutLineage()` syntax for the operator call sites. */
  implicit class CutOps[T](private val ds: Dataset[T]) extends AnyVal {
    def cutLineage(): Dataset[T] = Checkpoints.cut(ds)
    def cutLineage(eager: Boolean): Dataset[T] = Checkpoints.cut(ds, eager)
  }

  implicit class CutRddOps[T](private val rdd: org.apache.spark.rdd.RDD[T])
    extends AnyVal {
    def cutLineage(): org.apache.spark.rdd.RDD[T] = Checkpoints.cutRdd(rdd)
  }
}
