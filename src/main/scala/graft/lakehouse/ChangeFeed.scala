package graft.lakehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Positioned CDC consumption over a [[VersionedTable]] — the change-
  * data-feed consumer surface (the Delta-CDF / Iceberg-changelog shape
  * re-expressed on the manifest protocol).
  *
  * A consumer's POSITION (the last source version it has fully
  * processed) is a marker object named by the version under its own
  * `_pos/` dir — existence-is-commit, exactly like the source's
  * manifests, so advancing the position is ONE object PUT and a crash
  * anywhere before it re-delivers the same range (at-least-once;
  * pair with idempotent application for exactly-once end to end).
  * Each drain hands the NET changes (`VersionedTable.changes` diffs
  * snapshots, so a row inserted and deleted inside the range never
  * appears) to the consumer in one call.
  *
  * Retention contract: the source's `keepVersions` must cover the
  * consumer's maximum lag — `changes(from, to)` needs BOTH manifests
  * retained (same contract JoinView.syncDim documents).
  */
object ChangeFeed {

  private def posDir(consumerRoot: String) = new Path(s"$consumerRoot/_pos")

  private def fsOf(spark: SparkSession, p: String) =
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(p),
      spark.sparkContext.hadoopConfiguration)

  /** The last source version this consumer fully processed, if any. */
  def position(spark: SparkSession, consumerRoot: String): Option[Long] = {
    val fs = fsOf(spark, consumerRoot)
    val dir = posDir(consumerRoot)
    if (!fs.exists(dir)) return None
    fs.listStatus(dir).toSeq
      .flatMap(_.getPath.getName.toLongOption).maxOption
  }

  private def commitPosition(spark: SparkSession, consumerRoot: String,
      version: Long): Unit = {
    val fs = fsOf(spark, consumerRoot)
    val dir = posDir(consumerRoot)
    fs.mkdirs(dir)
    // existence-is-commit: content irrelevant, create+close is the PUT
    val out = fs.create(new Path(dir, version.toString), true)
    out.close()
    // older markers are superseded; keep the dir one-object small
    fs.listStatus(dir).foreach { st =>
      st.getPath.getName.toLongOption
        .filter(_ < version).foreach(_ => fs.delete(st.getPath, false))
    }
  }

  /** Drain everything committed since this consumer's position: `f`
    * receives the net CDC frame (`_change_type` ∈ insert / delete /
    * update_preimage / update_postimage when `keyCols` given, else
    * insert / delete) for `(position, current]`; when `f` returns
    * without throwing, the position advances by one marker PUT. A
    * cold-start consumer (no position) receives the CURRENT snapshot
    * as inserts — the backfill — and starts from there. Returns the
    * `(from, to)` range drained, or None when already caught up. */
  def drain(spark: SparkSession, root: String, consumerRoot: String,
      keyCols: Seq[String] = Nil)(f: DataFrame => Unit): Option[(Long, Long)] =
    drainRange(spark, root, consumerRoot, keyCols)((cdc, _, _) => f(cdc))

  /** [[drain]] with the `(from, to)` range passed to the consumer —
    * for consumers that stamp `to` into their own state to make the
    * at-least-once redelivery idempotent (see CdcAggView). */
  def drainRange(spark: SparkSession, root: String, consumerRoot: String,
      keyCols: Seq[String] = Nil)(
      f: (DataFrame, Long, Long) => Unit): Option[(Long, Long)] = {
    val cur = VersionedTable.currentVersion(spark, root).getOrElse(return None)
    position(spark, consumerRoot) match {
      case Some(from) if from >= cur => None
      case Some(from) =>
        f(VersionedTable.changes(spark, root, from, cur, keyCols), from, cur)
        commitPosition(spark, consumerRoot, cur)
        Some((from, cur))
      case None =>
        f(VersionedTable.readVersion(spark, root, cur)
          .withColumn("_change_type", lit("insert")), 0L, cur)
        commitPosition(spark, consumerRoot, cur)
        Some((0L, cur))
    }
  }

  /** Maintain `dstRoot` as a keyed MIRROR of `srcRoot` (optionally
    * through a row-wise `transform`): one positioned drain whose net
    * changes apply as MERGE-ON-READ commits — `deleteByKey` for the
    * disappeared keys, `upsertByKey` for new/updated images — so
    * mirror maintenance costs O(changes), never a rescan of either
    * table, and the applications are idempotent per range (a crash
    * before the position PUT re-applies the same net change set to
    * the same effect — at-least-once delivery, exactly-once state).
    * Cold start initializes `dstRoot` from the source snapshot. The
    * source must be key-unique per `keyCols` (the net diff then has
    * at most one image per key). Returns the drained range. */
  def mirror(spark: SparkSession, srcRoot: String, dstRoot: String,
      keyCols: Seq[String], keepVersions: Int = 1,
      transform: DataFrame => DataFrame = identity,
      evolveSchema: Boolean = false): Option[(Long, Long)] = {
    val consumerRoot = s"$dstRoot/_cdc"
    drain(spark, srcRoot, consumerRoot, keyCols) { cdc =>
      val dels = cdc.filter(col("_change_type") === "delete")
        .select(keyCols.map(col): _*)
      val ups = transform(cdc.filter(
          col("_change_type").isin("insert", "update_postimage"))
        .drop("_change_type"))
      // upstream ALTER: the CDC frame speaks the source's NEW logical
      // schema and the upsert drift guard would refuse it. Opt-in
      // propagation ADOPTS the source's schema line (rename mappings
      // included — the mirror's files carry the source's historical
      // names, so the mapping applies verbatim); only meaningful for
      // shape-preserving transforms.
      if (evolveSchema &&
          VersionedTable.currentVersion(spark, dstRoot).nonEmpty) {
        def norm(s: org.apache.spark.sql.types.StructType) =
          s.fields.map(f => f.name.toLowerCase).toSeq
        val tgt = VersionedTable.read(spark, dstRoot).schema
        if (norm(tgt) != norm(ups.schema))
          VersionedTable.adoptSchema(spark, dstRoot, srcRoot,
            VersionedTable.currentVersion(spark, srcRoot).get, keepVersions)
      }
      if (VersionedTable.currentVersion(spark, dstRoot).isEmpty)
        VersionedTable.init(spark, dstRoot, ups, keepVersions)
      else {
        // deletes first: a key can only appear as ONE of insert /
        // update / delete in a net diff, so order only matters for
        // crash-replay idempotence (re-deleting then re-upserting the
        // same images converges either way)
        if (!dels.isEmpty)
          VersionedTable.deleteByKey(spark, dstRoot, dels, keyCols,
            keepVersions)
        if (!ups.isEmpty)
          VersionedTable.upsertByKey(spark, dstRoot, ups, keyCols,
            keepVersions)
      }
    }
  }
}
