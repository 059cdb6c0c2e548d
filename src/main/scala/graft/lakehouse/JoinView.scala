package graft.lakehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, input_file_name}

/** Incrementally-maintained JOIN view — the enrichment shape
  * `fact LEFT JOIN dim` kept materialized as both sides move, without
  * ever recomputing the join from scratch:
  *
  *  - **fact appends** ([[appendFact]]): the batch joins the dim
  *    snapshot the view is pinned to and lands as an [[VersionedTable
  *    .appendDelta]] — O(batch) work, every existing view file carried
  *    by reference, exactly-once by micro-batch id (the maintained-
  *    view family's marker protocol);
  *  - **dim changes** ([[syncDim]]): the changed keys come from
  *    [[VersionedTable.changes]] (CDC between the pinned and current
  *    dim versions), only the view FILES containing those keys are
  *    rewritten — their rows re-join the new dim snapshot, identical
  *    for unchanged keys — and the rest carry by reference, so
  *    maintenance cost follows dim-change volume × fact locality, not
  *    view size. A deleted dim key null-extends, per left-join
  *    semantics.
  *
  * The view pins its dim version in a `_dimv-N` marker (and its join
  * keys in `_joinkeys-…`) inside each version dir — stamped with the
  * commit, so state and metadata move atomically. Appends made between
  * dim changes keep joining the PINNED snapshot: the view is always
  * exactly `Σ fact batches ⋈ dim@pinned`, a consistent cut of both
  * tables (never a mix of dim versions), and [[syncDim]] advances the
  * pin. The pinned dim version must stay inside the dim table's
  * retention window until synced (widen `keepVersions` on the dim).
  *
  * Non-key column names must be disjoint between fact and dim (the
  * usual enrichment-view contract; checked at [[init]]).
  */
object JoinView {

  private val DimVMarker = "^_dimv-(\\d+)$".r
  private val KeysMarker = "^_joinkeys-(.+)$".r

  /** (pinned dim version, join keys) of the view's current version. */
  def state(spark: SparkSession, viewRoot: String): (Long, Seq[String]) = {
    val dir = new Path(VersionedTable.currentPath(spark, viewRoot))
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(viewRoot),
      spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(dir).toSeq.map(_.getPath.getName)
    val dimV = names.collectFirst { case DimVMarker(n) => n.toLong }
      .getOrElse(throw new IllegalStateException(
        s"$viewRoot carries no _dimv marker — not a JoinView?"))
    val keys = names.collectFirst { case KeysMarker(k) => k.split(',').toSeq }
      .getOrElse(throw new IllegalStateException(
        s"$viewRoot carries no _joinkeys marker — not a JoinView?"))
    (dimV, keys)
  }

  private def stamp(spark: SparkSession, stage: String, dimV: Long,
      keys: Seq[String]): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(stage),
      spark.sparkContext.hadoopConfiguration)
    fs.create(new Path(stage, s"_dimv-$dimV"), true).close()
    fs.create(new Path(stage, s"_joinkeys-${keys.mkString(",")}"), true).close()
  }

  private def dimCols(dim: DataFrame, keys: Seq[String]): Seq[String] =
    dim.columns.toSeq.filterNot(c => keys.exists(_.equalsIgnoreCase(c)))

  /** Materialize `fact LEFT JOIN dim@current` as the view's version 1,
    * pinned to the dim's current version. */
  def init(spark: SparkSession, viewRoot: String, fact: DataFrame,
      dimRoot: String, keys: Seq[String], keepVersions: Int = 3): Long = {
    require(keys.nonEmpty && keys.forall(k => !k.contains(",")),
      "join keys must be non-empty and comma-free")
    val dimV = VersionedTable.currentVersion(spark, dimRoot).getOrElse(
      throw new IllegalStateException(s"dim $dimRoot has no committed version"))
    val dim = VersionedTable.readVersion(spark, dimRoot, dimV)
    val overlap = dimCols(dim, keys)
      .filter(c => fact.columns.exists(_.equalsIgnoreCase(c)))
    require(overlap.isEmpty,
      s"fact and dim share non-key columns: ${overlap.mkString(", ")}")
    VersionedTable.commit(spark, viewRoot, keepVersions) { stage =>
      fact.join(dim, keys, "left").write.parquet(stage)
      stamp(spark, stage, dimV, keys)
    }
  }

  /** Fold a fact batch into the view: batch ⋈ dim@pinned appends as a
    * delta (existing files referenced, not copied). `batchId` gives
    * exactly-once across crash/redelivery; an already-folded id
    * no-ops. Returns the view's (possibly unchanged) version. */
  def appendFact(spark: SparkSession, viewRoot: String, dimRoot: String,
      batch: DataFrame, batchId: Option[Long] = None,
      keepVersions: Int = 3): Long = {
    val cur = VersionedTable.currentVersion(spark, viewRoot).getOrElse(
      throw new IllegalStateException(s"$viewRoot is not initialized"))
    if (batchId.nonEmpty &&
        VersionedTable.lastFoldedBatch(spark, viewRoot).exists(
          _ >= batchId.get))
      return cur // crash-redelivered batch: already folded
    val (dimV, keys) = state(spark, viewRoot)
    val dim = VersionedTable.readVersion(spark, dimRoot, dimV)
    VersionedTable.appendDelta(spark, viewRoot, keepVersions) { stage =>
      batch.join(dim, keys, "left").write.parquet(stage)
      stamp(spark, stage, dimV, keys)
      batchId.foreach(VersionedTable.stampBatch(spark, stage, _))
    }
  }

  /** Advance the view to the dim's current version: CDC between the
    * pinned and current dim versions names the changed keys; only view
    * files CONTAINING those keys rewrite (all their rows re-join the
    * new snapshot — identical output for untouched keys), the rest
    * carry by reference. No dim movement → no new version. */
  def syncDim(spark: SparkSession, viewRoot: String, dimRoot: String,
      keepVersions: Int = 3): Long = {
    val cur = VersionedTable.currentVersion(spark, viewRoot).getOrElse(
      throw new IllegalStateException(s"$viewRoot is not initialized"))
    val (oldV, keys) = state(spark, viewRoot)
    val newV = VersionedTable.currentVersion(spark, dimRoot).getOrElse(
      throw new IllegalStateException(s"dim $dimRoot has no committed version"))
    if (newV == oldV) return cur
    val changedKeys = VersionedTable
      .changes(spark, dimRoot, oldV, newV, keys)
      .select(keys.map(col): _*).distinct()
    val dimNew = VersionedTable.readVersion(spark, dimRoot, newV)
    val view = VersionedTable.read(spark, viewRoot)
    val factCols = view.columns.toSeq
      .filterNot(c => dimCols(dimNew, keys).exists(_.equalsIgnoreCase(c)))
    val files = VersionedTable.currentFiles(spark, viewRoot)
    // input_file_name must bind BEFORE the join (it refuses plans
    // with more than one file source)
    val rel = view.withColumn("_f", input_file_name())
      .join(broadcast(changedKeys), keys, "left_semi")
      .select(col("_f")).distinct()
      .collect().map { r =>
        val p = new Path(r.getString(0))
        s"${p.getParent.getName}/${p.getName}"
      }.toSet
    val affected = files.filter(rel)
    val carried = files.filterNot(rel)
    VersionedTable.commitDelta(spark, viewRoot, carried,
      keepVersions) { stage =>
      if (affected.nonEmpty)
        spark.read.parquet(affected.map(f => s"$viewRoot/$f"): _*)
          .select(factCols.map(col): _*)
          .join(dimNew, keys, "left")
          .write.parquet(stage)
      stamp(spark, stage, newV, keys)
    }
  }

  def read(spark: SparkSession, viewRoot: String): DataFrame =
    VersionedTable.read(spark, viewRoot)
}
