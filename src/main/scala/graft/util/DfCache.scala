package graft.util

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped memoization of expensive cached builds (shingle
  * postings, LSH band tables).
  *
  * A `.cache()` inside an operator leaks in a long-running session:
  * every invocation registers a fresh cache that nothing ever
  * unpersists. Memoizing per (session, key) bounds that to ONE cache
  * per derived dataset, reused across queries that share the build
  * (q31/q32 share the postings; repeated runs of the same query hit
  * the warm cache instead of stacking new copies).
  *
  * If the blocks are evicted (`spark.catalog.clearCache()`, memory
  * pressure, or [[release]]), the stale entry is detected via its
  * storage level and rebuilt — callers always get a genuinely cached
  * frame. Explicit release: [[release]] for one session,
  * [[releaseAll]] for everything.
  */
object DfCache {

  private val memo = new ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** `build` must return an already-cached (and ideally eagerly
    * populated) DataFrame. */
  def getOrBuild(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val k = (s, key)
    val existing = memo.get(k)
    if (existing != null && existing.storageLevel != StorageLevel.NONE) existing
    else {
      val df = build
      memo.put(k, df)
      df
    }
  }

  /** Unpersist and forget every memoized frame of one session. */
  def release(s: SparkSession): Unit = {
    val it = memo.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq s) {
        e.getValue.unpersist()
        it.remove()
      }
    }
  }

  /** Unpersist and forget everything (all sessions). */
  def releaseAll(): Unit = {
    memo.values().forEach(_.unpersist())
    memo.clear()
  }
}
