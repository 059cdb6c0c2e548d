package graft.lakehouse

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Crash-safe table commits without a table format: versioned
  * directories + atomic-rename visibility.
  *
  * The reference gets transactional table swaps for free from its
  * database (check_lakehouse.py:139-160); a parquet lakehouse has to
  * build them. Delete-then-rename (the naive swap) loses the table if
  * the process dies between the two steps. This protocol never has a
  * moment where the current version is gone:
  *
  * {{{
  * root/
  *   v=1/ ... parquet + _SUCCESS      <- current = highest complete v=N
  *   _stage_v=2/ ...                  <- in-flight write (hidden: "_")
  * }}}
  *
  *  1. write the next version into `_stage_v=N` (underscore-prefixed,
  *     so parquet readers ignore it even when scanning `root` flat);
  *  2. verify the writer completed (`_SUCCESS`);
  *  3. `rename(_stage_v=N, v=N)` — one atomic metadata op makes the
  *     new version current;
  *  4. prune superseded `v=M` dirs (and pre-versioning flat files).
  *
  * A crash before (3) leaves the old version untouched and current; a
  * crash after (3) leaves BOTH versions complete and `read` resolves
  * the highest; the orphaned stage/old dirs are cleaned by the next
  * successful commit. At every step, `read` serves a complete table.
  *
  * Legacy flat directories (parquet files directly under `root`) read
  * as version 0 and are migrated by the first commit. Single-writer
  * (the automation daemon); readers in other processes are safe at
  * any crash point of a versioned table.
  */
object VersionedTable {

  private val Ver = "^v=(\\d+)$".r

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  /** Highest complete version, if the table has any. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val fs = fsOf(spark, root)
    val p = new Path(root)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq.flatMap { st =>
      st.getPath.getName match {
        case Ver(n) if st.isDirectory &&
          fs.exists(new Path(st.getPath, "_SUCCESS")) => Some(n.toLong)
        case _ => None
      }
    }.maxOption
  }

  /** Directory `read` resolves: the current version dir, or `root`
    * itself for a pre-versioning flat table. */
  def currentPath(spark: SparkSession, root: String): String =
    currentVersion(spark, root).map(n => s"$root/v=$n").getOrElse(root)

  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(currentPath(spark, root))

  /** Crash-safe commit of the next version. `writer` receives the
    * hidden staging dir and must produce a complete parquet write
    * there (Spark's committer emits `_SUCCESS` last). Returns the new
    * version number. */
  def commit(spark: SparkSession, root: String)(writer: String => Unit): Long = {
    val fs = fsOf(spark, root)
    fs.mkdirs(new Path(root))
    val next = currentVersion(spark, root).getOrElse(0L) + 1L
    val stage = new Path(s"$root/_stage_v=$next")
    val live = new Path(s"$root/v=$next")
    fs.delete(stage, true) // leftovers of a crashed attempt
    fs.delete(live, true)  // (possible only if a crash interleaved rename+prune)
    writer(stage.toString)
    require(fs.exists(new Path(stage, "_SUCCESS")),
      s"writer did not complete a parquet commit under $stage")
    // atomic visibility: one rename makes v=next the current version
    require(fs.rename(stage, live), s"rename $stage -> $live failed")
    // prune superseded versions, stale staging dirs (ours was just
    // renamed away — any left is from a crashed attempt), and
    // pre-versioning flat files
    fs.listStatus(new Path(root)).foreach { st =>
      st.getPath.getName match {
        case Ver(n) if n.toLong < next => fs.delete(st.getPath, true)
        case name if name.startsWith("_stage_v=") => fs.delete(st.getPath, true)
        case _ if st.isFile => fs.delete(st.getPath, false)
        case _ => ()
      }
    }
    next
  }

  /** Read-transform-commit: the crash-safe form of every table
    * rewrite (retention, compaction, upsert). */
  def rewrite(spark: SparkSession, root: String)(f: DataFrame => DataFrame): Long =
    commit(spark, root) { stage =>
      f(read(spark, root)).write.mode(SaveMode.Overwrite).parquet(stage)
    }

  /** Create (or replace) the table content as a new version. */
  def init(spark: SparkSession, root: String, df: DataFrame): Long =
    commit(spark, root) { stage =>
      df.write.mode(SaveMode.Overwrite).parquet(stage)
    }
}
