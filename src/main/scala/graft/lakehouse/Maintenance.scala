package graft.lakehouse

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operations: retention, compaction, schema
  * evolution, and MERGE/upsert — the jobs a lakehouse automation
  * stack schedules around its tables.
  */
object Maintenance {

  /** File-level retention: delete data files older than `days`
    * (reference: `datagen.py:92-106` `delete_data`). Metadata-only —
    * lists and deletes by mtime, never reads data. */
  def expireFiles(spark: SparkSession, dir: String, days: Int): Seq[String] = {
    val fs = FileSystem.get(new java.net.URI(dir),
      spark.sparkContext.hadoopConfiguration)
    val p = new Path(dir)
    if (!fs.exists(p)) return Seq.empty
    val cutoff = System.currentTimeMillis() - days.toLong * 24 * 3600 * 1000
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getModificationTime < cutoff)
      .map { s => fs.delete(s.getPath, false); s.getPath.getName }
  }

  /** Row-level retention: rewrite the table keeping only rows with
    * `tsCol` within the window. At scale this runs per partition on a
    * date-partitioned table, so only expired partitions rewrite. */
  def expireRows(spark: SparkSession, tableDir: String, tmpDir: String,
                 tsCol: String, cutoff: java.sql.Timestamp): Long = {
    val df = spark.read.parquet(tableDir).filter(col(tsCol) >= lit(cutoff))
    val kept = df.count()
    df.write.mode(SaveMode.Overwrite).parquet(tmpDir)
    replaceDir(spark, tmpDir, tableDir)
    kept
  }

  /** Small-file compaction: coalesce a table directory to
    * ~`targetFileBytes` per output file based on current on-disk size.
    * coalesce() (not repartition) — no shuffle, just fewer writers. */
  def compact(spark: SparkSession, tableDir: String, tmpDir: String,
              targetFileBytes: Long = 128L << 20): Int = {
    val fs = FileSystem.get(new java.net.URI(tableDir),
      spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(new Path(tableDir)).getLength
    val n = math.max(1, (bytes / targetFileBytes).toInt)
    spark.read.parquet(tableDir).coalesce(n)
      .write.mode(SaveMode.Overwrite).parquet(tmpDir)
    replaceDir(spark, tmpDir, tableDir)
    n
  }

  /** Additive schema evolution on read: union two snapshots whose
    * schemas differ by added columns (missing columns null-filled)
    * and/or WIDENED column types (int→long, long→double, … — resolved
    * by Catalyst's own tightest-common-type rule, so the promotion
    * matches what a SQL UNION would pick) — Spark-native
    * `mergeSchema`, made explicit for appends. */
  def alignAppend(base: DataFrame, incoming: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.TypeCoercion
    val baseTypes = base.schema.map(f => f.name -> f.dataType).toMap
    val incTypes = incoming.schema.map(f => f.name -> f.dataType).toMap
    val allCols = base.columns.toSeq ++
      incoming.columns.filterNot(base.columns.contains)
    val target = allCols.map { c =>
      c -> ((baseTypes.get(c), incTypes.get(c)) match {
        case (Some(a), Some(b)) if a != b =>
          TypeCoercion.findTightestCommonType(a, b).getOrElse(a)
        case (Some(a), _) => a
        case (_, Some(b)) => b
        case _ => throw new IllegalStateException(s"column $c in neither side")
      })
    }.toMap
    def aligned(df: DataFrame, have: Map[String, org.apache.spark.sql.types.DataType]) =
      df.select(allCols.map { c =>
        if (have.contains(c)) col(c).cast(target(c)).as(c)
        else lit(null).cast(target(c)).as(c)
      }: _*)
    aligned(base, baseTypes).unionByName(aligned(incoming, incTypes))
  }

  /** MERGE/upsert: apply `changes` onto the table at `tableDir` by
    * `keys` — matched rows are replaced, unmatched inserted. The
    * changes side is the small side: broadcast anti-join + union, one
    * pass over the big table, no wide shuffle of the target. */
  def upsert(spark: SparkSession, tableDir: String, tmpDir: String,
             changes: DataFrame, keys: Seq[String]): Unit = {
    val target = spark.read.parquet(tableDir)
    upsertPlan(target, changes, keys)
      .write.mode(SaveMode.Overwrite).parquet(tmpDir)
    replaceDir(spark, tmpDir, tableDir)
  }

  private def upsertPlan(target: DataFrame, changes: DataFrame,
                         keys: Seq[String]): DataFrame = {
    val keep = target.join(broadcast(changes.select(keys.map(col): _*)),
      keys, "left_anti")
    keep.unionByName(changes)
  }

  // ---- crash-safe (versioned) twins: same semantics, but the table
  // ---- stays readable through a crash at ANY step (VersionedTable).

  /** [[expireRows]] on a [[VersionedTable]] root. `statsCols` renews
    * the data-skipping file stats in the new version's manifest. */
  def expireRowsVersioned(spark: SparkSession, root: String,
                          tsCol: String, cutoff: java.sql.Timestamp,
                          statsCols: Seq[String] = Nil): Long = {
    VersionedTable.rewrite(spark, root, statsCols = statsCols)(
      _.filter(col(tsCol) >= lit(cutoff)))
    VersionedTable.read(spark, root).count()
  }

  /** [[compact]] on a [[VersionedTable]] root. `sortCol` range-clusters
    * the compacted files (disjoint per-file ranges — what makes
    * manifest stats selective) and `statsCols` records their min/max
    * in the new manifest, so scheduled compaction doubles as the
    * data-skipping index refresh. */
  def compactVersioned(spark: SparkSession, root: String,
                       targetFileBytes: Long = 128L << 20,
                       sortCol: Option[String] = None,
                       statsCols: Seq[String] = Nil,
                       bloomCols: Seq[String] = Nil,
                       zorderCols: Option[(String, String)] = None): Int = {
    val fs = FileSystem.get(new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration)
    // sum the version's actual FILE list — under a delta manifest the
    // current dir holds only the newest files, not the table; a
    // not-yet-versioned (flat/legacy) table sizes by its dir
    val bytes = VersionedTable.currentVersion(spark, root) match {
      case Some(_) => VersionedTable.currentFiles(spark, root)
        .map(f => fs.getFileStatus(new Path(s"$root/$f")).getLen).sum
      case None => fs.getContentSummary(
        new Path(VersionedTable.currentPath(spark, root))).getLength
    }
    val n = math.max(1, (bytes / targetFileBytes).toInt)
    VersionedTable.rewrite(spark, root,
      statsCols = (zorderCols.toSeq.flatMap(z => Seq(z._1, z._2)) ++
        statsCols).distinct,
      bloomCols = bloomCols)(df => layout(df, n, sortCol, zorderCols))
    n
  }

  /** The compaction output layout: z-order beats a single sort key
    * when queries box on TWO dimensions (√files skipping on each);
    * otherwise range-cluster on `sortCol`, else plain bin-packing. */
  private def layout(df: DataFrame, n: Int, sortCol: Option[String],
      zorderCols: Option[(String, String)]): DataFrame =
    zorderCols match {
      case Some((a, b)) => Bucketing.zorderLayout(df, a, b, n)
      case None => sortCol.fold(df.coalesce(n))(c =>
        df.repartitionByRange(n, col(c)).sortWithinPartitions(c))
    }

  /** FILE-GRANULAR compaction: bin-pack only the files SMALLER than
    * `smallFileBytes` into ~`targetFileBytes` outputs and carry every
    * already-right-sized file by reference ([[VersionedTable
    * .commitDelta]]) — the steady-state maintenance shape at 100 TB,
    * where a tick's ingestion adds a handful of small files to a
    * table of thousands of good ones and [[compactVersioned]]'s
    * full-table rewrite would be a table-sized IO bill for a
    * KB-sized problem. Cost follows the SMALL files only: read
    * Σsmall bytes, write Σsmall bytes, one manifest PUT; carried
    * files keep their manifest stats/blooms without a re-scan.
    *
    * `sortCol` range-clusters the packed output (its stats stay
    * selective); `statsCols`/`bloomCols` index the fresh files.
    * Returns (files packed, files written); (n, 0) with n < 2 means
    * nothing needed packing. Skips nothing silently: a table whose
    * every file is small degenerates to [[compactVersioned]]'s
    * behavior through the same code path. */
  def compactSmallFiles(spark: SparkSession, root: String,
                        smallFileBytes: Long = 32L << 20,
                        targetFileBytes: Long = 128L << 20,
                        sortCol: Option[String] = None,
                        statsCols: Seq[String] = Nil,
                        bloomCols: Seq[String] = Nil,
                        keepVersions: Int = 1,
                        zorderCols: Option[(String, String)] = None)
                       : (Int, Int) = {
    // a not-yet-versioned (flat/legacy) table has no file manifest to
    // carry references through — its first compaction is the full
    // rewrite that migrates it into versioning; every later one is
    // file-granular
    if (VersionedTable.currentVersion(spark, root).isEmpty) {
      val n = compactVersioned(spark, root, targetFileBytes, sortCol,
        (sortCol.toSeq ++ statsCols).distinct, bloomCols, zorderCols)
      return (-1, n)
    }
    val fs = FileSystem.get(new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration)
    val sized = VersionedTable.currentFiles(spark, root)
      .map(f => f -> fs.getFileStatus(new Path(s"$root/$f")).getLen)
    val (small, big) = sized.partition(_._2 < smallFileBytes)
    if (small.size < 2) return (small.size, 0) // nothing to merge
    val n = math.max(1,
      math.ceil(small.map(_._2).sum.toDouble / targetFileBytes).toInt)
    VersionedTable.commitDelta(spark, root, big.map(_._1), keepVersions,
      statsCols = (sortCol.toSeq ++
        zorderCols.toSeq.flatMap(z => Seq(z._1, z._2)) ++
        statsCols).distinct,
      bloomCols = bloomCols) { stage =>
      // DV-applied read: rewriting a small file PURGES its deletion
      // vector (the carried big files keep theirs via the manifest)
      val v = VersionedTable.currentVersion(spark, root).get
      val df = VersionedTable.readFilesWithDv(spark, root, v,
        small.map(f => s"$root/${f._1}"))
      layout(df, n, sortCol, zorderCols).write.parquet(stage)
    }
    (small.size, n)
  }

  /** Materialize merge-on-read deletes: rewrite ONLY the files that
    * carry a deletion vector (their DV-applied bytes become plain
    * files), carry every clean file by reference, and drop all `dv`
    * manifest lines — the background step that keeps the read-side
    * anti-join amortized to recently-deleted files. Returns the
    * number of files rewritten (0 = no vectors, no new version). */
  def purgeDeletes(spark: SparkSession, root: String,
                   keepVersions: Int = 1, statsCols: Seq[String] = Nil,
                   bloomCols: Seq[String] = Nil): Int = {
    // equality deletes first resolve to positions (one scan, one
    // commit) so the rewrite below touches ONLY files that actually
    // hold deleted rows — never the full ED scope
    VersionedTable.resolveEqualityDeletes(spark, root, keepVersions,
      statsCols, bloomCols)
    val v = VersionedTable.currentVersion(spark, root).getOrElse(return 0)
    val dv = VersionedTable.deleteVectors(spark, root, v)
    if (dv.isEmpty) return 0
    val files = VersionedTable.currentFiles(spark, root)
    // rewritten files get NEW refs, so their dv lines don't carry;
    // carried (vector-free) files have no lines to carry — the new
    // manifest is vector-free by construction
    val (affected, carried) = files.partition(dv.contains)
    VersionedTable.commitDelta(spark, root, carried, keepVersions,
      statsCols = statsCols, bloomCols = bloomCols) { stage =>
      VersionedTable.readFilesWithDv(spark, root, v,
        affected.map(f => s"$root/$f")).write.parquet(stage)
    }
    affected.size
  }

  /** [[upsert]] on a [[VersionedTable]] root. `keepVersions` widens
    * the retention window (CDC consumers like JoinView.syncDim need
    * the pre-upsert version to stay readable until they catch up). */
  def upsertVersioned(spark: SparkSession, root: String,
                      changes: DataFrame, keys: Seq[String],
                      statsCols: Seq[String] = Nil,
                      keepVersions: Int = 1): Unit =
    VersionedTable.rewrite(spark, root, keepVersions, statsCols)(
      upsertPlan(_, changes, keys))

  /** Directory swap used by the flat-dir rewrite operations. NOT
    * delete-then-rename (a crash between those two loses the table):
    * the live dir rotates to a `_backup` (hidden from parquet
    * readers), the tmp dir renames into place, and only then is the
    * backup dropped — so a recovery point exists through the whole
    * swap window. A crash mid-swap is healed by [[recoverDir]]; for
    * always-readable semantics use [[VersionedTable]] instead. */
  private def replaceDir(spark: SparkSession, from: String, to: String): Unit = {
    val fs = FileSystem.get(new java.net.URI(to),
      spark.sparkContext.hadoopConfiguration)
    val toPath = new Path(to)
    val backup = new Path(to + "_backup")
    fs.delete(backup, true)
    if (fs.exists(toPath)) require(fs.rename(toPath, backup),
      s"rotate $toPath -> $backup failed")
    require(fs.rename(new Path(from), toPath), s"rename $from -> $toPath failed")
    fs.delete(backup, true)
  }

  /** Heal a crash inside [[replaceDir]]'s swap window: if the live dir
    * is missing, restore the completed tmp write if present (it has
    * `_SUCCESS`), else the backup. Returns what it restored. */
  def recoverDir(spark: SparkSession, tmpDir: String,
                 tableDir: String): Option[String] = {
    val fs = FileSystem.get(new java.net.URI(tableDir),
      spark.sparkContext.hadoopConfiguration)
    val live = new Path(tableDir)
    if (fs.exists(live)) return None
    val tmp = new Path(tmpDir)
    val backup = new Path(tableDir + "_backup")
    if (fs.exists(new Path(tmp, "_SUCCESS")) && fs.rename(tmp, live)) {
      fs.delete(backup, true)
      Some("tmp")
    } else if (fs.exists(backup) && fs.rename(backup, live)) {
      Some("backup")
    } else None
  }
}
