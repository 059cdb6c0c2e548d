package graft.lakehouse

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming incremental ingestion — the always-on form of
  * `IncrementalLoader`. The file source's checkpoint IS the load
  * registry: each CSV drop in `srcDir` is ingested exactly once into
  * the parquet table, across restarts. `Trigger.AvailableNow` drains
  * everything pending and stops — the scheduled-batch operating mode
  * of the reference's polling loop (`check_lakehouse.py:100-125`),
  * without the mtime race.
  */
object StreamingLoader {

  /** Start one drain-everything-available ingestion run. */
  def runAvailableNow(spark: SparkSession, srcDir: String, tableDir: String,
                      checkpointDir: String, schema: StructType): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("header", "true")
      .csv(srcDir)
      .writeStream
      .format("parquet")
      .option("path", tableDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** [[runAvailableNow]] with the batch loaders' crash-safety: each
    * microbatch lands through [[commitBatch]] into the table's
    * CURRENT version dir (version-aware, like `IncrementalLoader`),
    * so streaming ingestion composes with `VersionedTable` rewrites
    * and survives a crash at any point of the batch commit. */
  def runVersionedAvailableNow(spark: SparkSession, srcDir: String,
      root: String, checkpointDir: String, schema: StructType): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("header", "true")
      .csv(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(batch, root, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming MERGE-ON-READ UPSERT: each micro-batch of change rows
    * lands through [[VersionedTable.upsertByKey]] — one commit that
    * equality-deletes the batch's keys and appends the new images,
    * O(batch) however big the table is (no scan per micro-batch: THE
    * CDC-ingestion shape at 100 TB). Exactly-once across restarts by
    * the batch-marker protocol: the marker commits atomically with
    * the version, so a crash-redelivered batch no-ops. The table must
    * be initialized ([[VersionedTable.init]]) before the stream
    * starts; batches must be unique and non-null per key. */
  def runVersionedUpsert(spark: SparkSession, srcDir: String,
      root: String, checkpointDir: String, schema: StructType,
      keyCols: Seq[String]): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("header", "true")
      .csv(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        VersionedTable.upsertByKey(spark, root, batch, keyCols,
          batchId = Some(batchId))
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming materialized view: each micro-batch folds into
    * [[MaterializedAgg]] state exactly once (idempotent by batch id —
    * the id commits atomically with the state, so crash-and-redeliver
    * folds nothing twice). The streaming dashboard: aggregate state
    * grows with the KEY space while the stream is unbounded. */
  def runAggView(spark: SparkSession, srcDir: String, viewRoot: String,
      checkpointDir: String, schema: StructType,
      spec: MaterializedAgg.Spec): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("header", "true")
      .csv(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        MaterializedAgg.foldBatch(spark, viewRoot, batch, spec, batchId)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming retrieval indexing: each document micro-batch folds
    * into the maintained BM25 index ([[RetrievalView]]) exactly once —
    * micro-batch ids are monotonic by construction, which is precisely
    * the view's idempotency contract, so crash-and-redeliver indexes
    * nothing twice. Drops are JSON-lines (doc_id, text, lang, source)
    * like the corpus-curation feeds. */
  def runRetrievalView(spark: SparkSession, srcDir: String,
      indexRoot: String, checkpointDir: String,
      schema: StructType): StreamingQuery =
    spark.readStream
      .schema(schema)
      .json(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        RetrievalView.update(spark, indexRoot, batch, batchId)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Stream embedding drops into an EXISTING [[graft.operators.VectorIndex]]
    * (built once offline; streaming never retrains centroids — the
    * routing geometry must stay fixed for adds to equal a rebuild).
    * Exactly-once across restarts by the index's own batch-marker
    * protocol ([[graft.operators.VectorIndex.addIdempotent]]): a
    * re-delivered microbatch folds nothing. JSON drops with an
    * `embedding` array column decode through the given schema. */
  def runVectorIndexAdd(spark: SparkSession, srcDir: String,
      indexPath: String, checkpointDir: String,
      schema: StructType): StreamingQuery = {
    require(graft.operators.VectorIndex.exists(spark, indexPath),
      s"no built index at $indexPath — VectorIndex.build before streaming adds")
    spark.readStream
      .schema(schema)
      .json(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.VectorIndex.addIdempotent(spark, indexPath,
          batch, batchId)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Land ONE microbatch: crash-safe, idempotent, atomically visible.
    *
    * Structured Streaming checkpoints a batch only after this returns,
    * so a crash anywhere inside re-delivers the SAME (batchId, data)
    * on restart — exactly-once therefore reduces to idempotence by
    * batchId. The batch stages under a hidden `_streaming-stage` dir
    * (invisible to readers), then publishes as ONE object named by the
    * batch id: single-object visibility is atomic on posix, hdfs, and
    * object stores, and a re-delivered batch finds its target already
    * published and does nothing. (Not a [[VersionedTable.commit]] per
    * microbatch on purpose: that would rewrite the whole table per
    * batch — versioned commits are for table REWRITES, appends are
    * per-object publishes into the current version.) */
  private[graft] def commitBatch(batch: DataFrame, root: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val fs = FileSystem.get(new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration)
    val liveDir = VersionedTable.appendablePath(spark, root)
    val target = new Path(liveDir, f"batch-$batchId%09d.snappy.parquet")
    if (fs.exists(target)) return // re-delivered after a crash: already landed
    val stage = new Path(s"$root/_streaming-stage/$batchId")
    fs.delete(stage, true) // partial write of a crashed earlier attempt
    batch.coalesce(1).write.mode(SaveMode.Overwrite).parquet(stage.toString)
    fs.listStatus(stage).find(_.getPath.getName.startsWith("part-")).foreach {
      part => require(fs.rename(part.getPath, target),
        s"publish ${part.getPath} -> $target failed")
    }
    fs.delete(stage, true)
  }
}
