package graft.lakehouse

import org.apache.hadoop.fs.{FileSystem, Path}

/** Single-object WRITER LEASE over [[graft.util.AtomicPut]] — the
  * cooperation primitive for a second daemon. The commit protocol is
  * already SAFE under a surprise second writer (every arbitration PUT
  * is atomic, the loser fails loudly); the lease makes two daemons
  * COOPERATE instead: exactly one holds the tick at a time, the other
  * skips and retries next tick, and a crashed holder's lease expires
  * by TTL so the survivor takes over without an operator.
  *
  * One object at `leasePath`, content `owner\tepochMillis`. Acquire is
  * one atomic create-if-absent; a held lease older than `ttlMs` is
  * STALE — the challenger deletes it and re-races the create (the
  * delete+create pair is safe because every challenger races the same
  * create: at most one wins the new lease). TTL is the usual
  * time-based bargain (Delta/Iceberg vacuum make the same one): size
  * it several multiples of the longest tick so a slow-but-alive
  * holder is never usurped mid-tick. */
object Lease {

  /** Try to take the lease. True = held by `owner` (go); false = a
    * live holder exists (skip this tick). */
  def acquire(fs: FileSystem, leasePath: Path, owner: String,
      ttlMs: Long): Boolean = {
    require(ttlMs > 0, "lease ttl must be positive")
    def tryCreate(): Boolean =
      try {
        fs.mkdirs(leasePath.getParent)
        graft.util.AtomicPut.putIfAbsent(fs, leasePath,
          s"$owner\t${System.currentTimeMillis()}")
        true
      } catch { case _: java.io.IOException => false }
    if (tryCreate()) return true
    holder(fs, leasePath) match {
      case Some((_, ts))
          if System.currentTimeMillis() - ts > ttlMs =>
        // stale: break it and re-race — every challenger races the
        // SAME create, so at most one acquires
        fs.delete(leasePath, false)
        tryCreate()
      case Some(_) => false // live holder
      case None => tryCreate() // released between our create and read
    }
  }

  /** Current holder, if any: (owner, acquiredAtMillis). A torn or
    * missing object reads as no holder. */
  def holder(fs: FileSystem, leasePath: Path): Option[(String, Long)] =
    try {
      if (!fs.exists(leasePath)) None
      else {
        val in = fs.open(leasePath)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        s.split("\t") match {
          case Array(o, t) => t.toLongOption.map(o -> _)
          case _ => None
        }
      }
    } catch { case _: java.io.IOException => None }

  /** Release iff `owner` still holds it — a usurped (TTL-broken)
    * lease is NOT deleted out from under its new holder. Returns
    * whether the release happened. */
  def release(fs: FileSystem, leasePath: Path, owner: String): Boolean =
    holder(fs, leasePath) match {
      case Some((o, _)) if o == owner => fs.delete(leasePath, false); true
      case _ => false
    }
}
