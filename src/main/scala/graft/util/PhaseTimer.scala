package graft.util

/** Wall-clock phase accounting for ITERATIVE operators (PageRank
  * rounds, k-means training, connected-component sweeps), whose bench
  * totals blend per-job fixed overhead with real compute — under a
  * loaded driver the fixed part inflates by multiples, and a total-only
  * number cannot distinguish that from a plan regression (the
  * BENCH_r03/r05 pattern: q98 17 s in the round artifact, 7.6 s
  * in-session, identical plans). Operators record eager milestones
  * (checkpoints, collects) here; the bench main drains the buffer
  * after each query and emits a per-query `phases` object alongside
  * the total, so a regression shows WHICH phase moved.
  *
  * Repeated labels accumulate (a per-round record sums across rounds).
  * The buffer is global and synchronized — the bench runs queries
  * sequentially, and concurrent ticks at worst interleave labels, they
  * never corrupt.
  */
object PhaseTimer {

  private val buf = scala.collection.mutable.LinkedHashMap.empty[String, Double]

  /** Time `body` and accumulate its wall seconds under `phase`. */
  def time[A](phase: String)(body: => A): A = {
    val t0 = System.nanoTime()
    try body
    finally record(phase, (System.nanoTime() - t0) / 1e9)
  }

  /** Accumulate `sec` under `phase`. */
  def record(phase: String, sec: Double): Unit = synchronized {
    buf(phase) = buf.getOrElse(phase, 0.0) + sec
  }

  /** Snapshot and clear — insertion-ordered (phase, seconds). */
  def drain(): Seq[(String, Double)] = synchronized {
    val out = buf.toSeq
    buf.clear()
    out
  }
}
