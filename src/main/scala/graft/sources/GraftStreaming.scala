package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{StringType, StructType}

import graft.lakehouse.VersionedTable

/** `spark.readStream.format("graft")`: a [[VersionedTable]] as a
  * STREAMING SOURCE with table versions as offsets — the Delta-CDF
  * consumer shape inside Structured Streaming proper (the polling
  * twin of [[graft.lakehouse.ChangeFeed]], which serves non-streaming
  * consumers).
  *
  * Offsets are commit versions: `getOffset` is one manifest-dir
  * listing (no data IO), and a micro-batch `(fromV, toV]` is
  * `VersionedTable.changes` — the NET row diff, so a row inserted and
  * deleted inside one batch range never appears, MoR sidecars apply,
  * and update pre/post images classify when `keyCols` is given.
  * Exactly-once follows from the streaming checkpoint: offsets are
  * durable, `getBatch` is deterministic for retained manifests, and a
  * restart replays the identical range. Retention contract: the
  * source table's `keepVersions` must cover the consumer's maximum
  * lag (same contract ChangeFeed documents) — a pruned manifest fails
  * the batch loudly rather than silently dropping changes.
  *
  * Options — `startingVersion`: `"earliest"` backfills the first
  * batch with the full snapshot as inserts (ChangeFeed's cold-start
  * rule); a version number streams changes after it; absent = changes
  * committed after the stream starts. `keyCols`: comma-separated key
  * for update_preimage/update_postimage classification. `cdc=false`:
  * drop the `_change_type` column and emit only inserts — the
  * append-only consumption shape. `maxVersionsPerBatch=N` paces a
  * BACKLOG: each micro-batch spans at most N versions past the last
  * produced one (the `maxFilesPerTrigger` analog — a month of
  * accumulated commits must not become one giant batch), at the
  * price of the per-batch net-diff guarantee holding per N-version
  * window rather than across the whole backlog.
  */
final class GraftStreamSource(spark: SparkSession, root: String,
    keyCols: Seq[String], cdc: Boolean, base: Long,
    maxVersionsPerBatch: Long = Long.MaxValue) extends Source {

  override val schema: StructType =
    GraftStreamSource.schemaFor(spark, root, cdc)

  /** Highest version a produced batch ends at — the cap's anchor for
    * backlog pacing. Recovery-safe: the engine replays the
    * checkpointed range through [[getBatch]] before polling
    * [[getOffset]] again, and getBatch advances this watermark, so a
    * restart never caps below what the checkpoint already covers. */
  @volatile private var produced: Long = -1L

  override def getOffset: Option[Offset] =
    VersionedTable.currentVersion(spark, root).map { cur =>
      val anchor = if (produced >= 0L) produced else base
      // backlog pacing: never promise more than N versions past the
      // last produced batch (a month of backlog must not become one
      // giant micro-batch). anchor < 0 (earliest-backfill first
      // batch) is inherently one snapshot read — leave it uncapped.
      val capped =
        if (maxVersionsPerBatch == Long.MaxValue || anchor < 0L) cur
        else math.min(cur, anchor + maxVersionsPerBatch)
      LongOffset(capped)
    }

  private def ver(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val to = ver(end)
    val from = start.map(ver).getOrElse(base)
    produced = math.max(produced, to)
    val batch =
      if (from >= to) // no new commits (or a rolled-back head): empty
        VersionedTable.readVersion(spark, root, to).limit(0)
          .withColumn("_change_type", lit("insert"))
      else if (from < 0L) // "earliest": snapshot-as-inserts backfill
        VersionedTable.readVersion(spark, root, to)
          .withColumn("_change_type", lit("insert"))
      else VersionedTable.changes(spark, root, from, to, keyCols)
    val shaped =
      if (cdc) batch
      else batch.filter(col("_change_type") === "insert")
        .drop("_change_type")
    // a mid-stream upstream ALTER makes the batch speak a NEWER
    // logical schema than this stream declared at start. Serve the
    // DECLARED schema so the long-running query keeps a stable shape:
    // renamed columns map back through the source's recorded
    // pre-names, columns added upstream stay invisible, columns
    // dropped upstream null-fill, and retyped columns cast to the
    // declared type (widens are value-preserving for in-range data).
    // A restart re-derives the source schema and picks everything up.
    val logical = VersionedTable.manifestSchema(spark, root, to)
    def srcFor(n: String): Option[String] =
      if (shaped.columns.exists(_.equalsIgnoreCase(n))) Some(n)
      else logical.flatMap(_.fields.find(f =>
        VersionedTable.prevNames(f).exists(_.equalsIgnoreCase(n)))
        .map(_.name))
        .filter(s => shaped.columns.exists(_.equalsIgnoreCase(s)))
    Bridge.internalStreaming(
      shaped.select(schema.fields.toSeq.map { f =>
        srcFor(f.name) match {
          case Some(s) => col(s"`$s`").cast(f.dataType).as(f.name)
          case None => lit(null).cast(f.dataType).as(f.name)
        }
      }: _*))
  }

  override def stop(): Unit = ()
}

object GraftStreamSource {
  /** The stream's schema: the table's current data schema, plus the
    * CDC classification column unless `cdc=false`. */
  def schemaFor(spark: SparkSession, root: String,
      cdc: Boolean): StructType = {
    val data = VersionedTable.read(spark, root).schema
    if (cdc) data.add("_change_type", StringType, nullable = false)
    else data
  }
}

/** `df.writeStream.format("graft")`: every micro-batch lands as ONE
  * commit-protocol version, exactly once. `mode=append` (default) is
  * an O(batch) [[VersionedTable.appendDelta]] — current files carried
  * by reference, the batch's files plus a `_batch-<id>` marker staged
  * into the new version dir, visibility one manifest PUT. The marker
  * commits ATOMICALLY with the version, so a crash-redelivered batch
  * finds `lastFoldedBatch >= batchId` and no-ops (batch ids are
  * monotone). `mode=upsert` routes through
  * [[VersionedTable.upsertByKey]] (`keyCols` required): equality-
  * delete the batch's keys + append the images — O(batch) CDC
  * ingestion with the same marker idempotence. `statsCols`/
  * `bloomCols`/`keepVersions` options feed the manifest exactly like
  * the batch writer. */
final class GraftStreamSink(spark: SparkSession, root: String,
    mode: String, keyCols: Seq[String], statsCols: Seq[String],
    bloomCols: Seq[String], keepVersions: Int) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the incoming Dataset is streaming-marked (batch verbs refuse
    // it): re-wrap its physical rows as a batch frame
    val batch = Bridge.internalBatch(data)
    val current = VersionedTable.currentVersion(spark, root)
    if (current.nonEmpty &&
        VersionedTable.lastFoldedBatch(spark, root).exists(_ >= batchId)) {
      () // crash-redelivered batch: its version already committed
    } else if (mode == "upsert") {
      require(keyCols.nonEmpty, "mode=upsert needs option keyCols")
      require(current.nonEmpty,
        s"mode=upsert needs an initialized table at $root " +
          "(VersionedTable.init before the stream starts)")
      VersionedTable.upsertByKey(spark, root, batch, keyCols,
        keepVersions, statsCols, bloomCols, batchId = Some(batchId))
      ()
    } else if (current.isEmpty) {
      VersionedTable.commit(spark, root, keepVersions, statsCols,
        bloomCols) { stage =>
        batch.write.mode(SaveMode.Overwrite).parquet(stage)
        VersionedTable.stampBatch(spark, stage, batchId)
      }
      ()
    } else {
      GraftDataSource.requireSameSchema(
        VersionedTable.read(spark, root).schema, batch.schema,
        s"""format("graft") streaming append to $root""")
      VersionedTable.appendDelta(spark, root, keepVersions, statsCols,
        bloomCols) { stage =>
        batch.write.mode(SaveMode.Overwrite).parquet(stage)
        VersionedTable.stampBatch(spark, stage, batchId)
      }
      ()
    }
  }
}
