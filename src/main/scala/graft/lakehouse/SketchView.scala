package graft.lakehouse

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
import org.apache.spark.util.sketch.CountMinSketch

/** Incrementally-maintained COUNT-MIN frequency sketch — the streaming
  * twin of q75's heavy-hitters pass, and the frequency member of the
  * maintained-sketch family ([[MaterializedAgg]] keeps HLL distincts
  * the same way).
  *
  * Each batch's sketch is built DISTRIBUTED (`stat.countMinSketch`
  * tree-aggregates per-partition sketches; only the width×depth
  * counter matrix — tens of KB — reaches the driver), then folds into
  * the persisted state by counter-matrix addition. CMS counters are
  * sums, so the fold is associative and order-independent: the
  * maintained sketch is BIT-IDENTICAL to one built from scratch over
  * every batch — spec-pinned, no drift. State is a single sketch
  * row committed through [[VersionedTable]], so every crash point
  * leaves a readable previous state, and the streaming fold is
  * exactly-once by micro-batch id (the `_batch-N` marker commits
  * atomically inside the version dir, exactly like
  * [[MaterializedAgg.foldBatch]]).
  *
  * What it buys at 100 TB: "how often does this term/URL/fingerprint
  * occur so far, within ε·N?" answered from KBs of state with NO
  * term-keyed shuffle per query and no unbounded keyed state — the
  * stream-safe complement to the exact q53 top-k.
  */
object SketchView {

  final case class Spec(column: String, eps: Double = 0.0005,
      confidence: Double = 0.99, seed: Int = 42)

  private val stateSchema = StructType(Seq(
    StructField("sketch", BinaryType), StructField("n_items", LongType)))

  private def toBytes(cms: CountMinSketch): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    cms.writeTo(bos)
    bos.toByteArray
  }

  private def fromBytes(b: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b))

  /** The current sketch, or None before the first fold. */
  def current(spark: SparkSession, root: String): Option[CountMinSketch] =
    VersionedTable.currentVersion(spark, root).map { _ =>
      fromBytes(VersionedTable.read(spark, root)
        .head.getAs[Array[Byte]]("sketch"))
    }

  private def commitMerged(spark: SparkSession, root: String,
      merged: CountMinSketch, batchId: Option[Long]): Long =
    VersionedTable.commit(spark, root) { stage =>
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          Seq(Row(toBytes(merged), merged.totalCount())), 1),
        stateSchema).write.mode("overwrite").parquet(stage)
      batchId.foreach(VersionedTable.stampBatch(spark, stage, _))
    }

  private def merge(spark: SparkSession, root: String, batch: DataFrame,
      spec: Spec): CountMinSketch = {
    val p = batch.stat.countMinSketch(spec.column, spec.eps,
      spec.confidence, spec.seed)
    current(spark, root).map { cur => cur.mergeInPlace(p); cur }.getOrElse(p)
  }

  /** Fold one batch into the sketch state; returns the committed
    * version. */
  def update(spark: SparkSession, root: String, batch: DataFrame,
      spec: Spec): Long =
    commitMerged(spark, root, merge(spark, root, batch, spec), None)

  /** Fold a micro-batch EXACTLY ONCE (idempotent by batchId — same
    * protocol and marker layout as [[MaterializedAgg.foldBatch]]).
    * Returns whether the batch was folded. */
  def foldBatch(spark: SparkSession, root: String, batch: DataFrame,
      spec: Spec, batchId: Long): Boolean = {
    if (VersionedTable.lastFoldedBatch(spark, root).exists(_ >= batchId))
      return false
    commitMerged(spark, root, merge(spark, root, batch, spec), Some(batchId))
    true
  }

  /** Point estimates for `terms` from the maintained sketch (each ≥
    * the true count, ≤ true + ε·N w.p. `confidence`). Driver-side on
    * purpose: the sketch is a KB-scale model, exactly like q75's. */
  def estimate(spark: SparkSession, root: String,
      terms: Seq[String]): Map[String, Long] = {
    val cms = current(spark, root).getOrElse(
      return terms.map(_ -> 0L).toMap)
    terms.map(t => t -> cms.estimateCount(t)).toMap
  }

  // One broadcast per (root, committed version), reused across calls:
  // a long-lived session (the automation daemon annotates terms every
  // tick) would otherwise create a fresh executor-resident broadcast
  // per call and never release any. When the state version advances,
  // the stale broadcast is unpersisted (not destroyed — a consumer
  // holding an unexecuted DataFrame over it can still lazily re-fetch
  // from the driver) and the cache slot is replaced.
  private val bcCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, org.apache.spark.broadcast.Broadcast[Array[Byte]])]()

  private def sketchBroadcast(spark: SparkSession, root: String)
      : Option[org.apache.spark.broadcast.Broadcast[Array[Byte]]] =
    VersionedTable.currentVersion(spark, root).map { v =>
      val hit = bcCache.get(root)
      if (hit != null && hit._1 == v) hit._2
      else {
        val bytes = VersionedTable.read(spark, root)
          .head.getAs[Array[Byte]]("sketch")
        val fresh = spark.sparkContext.broadcast(bytes)
        val prev = bcCache.put(root, (v, fresh))
        if (prev != null) prev._2.unpersist(blocking = false)
        fresh
      }
    }

  /** DataFrame-valued estimates: annotate an ARBITRARY term column
    * with its maintained-sketch count — the distributed consumer shape
    * (join a 100 TB candidate table against the frequency model)
    * where [[estimate]]'s driver-side map cannot go. The KB-scale
    * counter matrix broadcasts once PER COMMITTED VERSION (cached,
    * reused across calls); each partition deserializes it once and
    * streams rows through `estimateCount` — no shuffle, no per-row
    * deserialization, and the term table never moves. Before the
    * first fold every estimate is 0, matching [[estimate]]. */
  def estimateAll(spark: SparkSession, root: String, terms: DataFrame,
      termCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    sketchBroadcast(spark, root) match {
      case None => terms.withColumn("est_count", lit(0L))
      case Some(bc) =>
        val enc = org.apache.spark.sql.Encoders.row(terms.schema
          .add(StructField("est_count", LongType, nullable = false)))
        val idx = terms.schema.fieldIndex(termCol)
        terms.mapPartitions { rows =>
          val cms = fromBytes(bc.value)
          rows.map { r =>
            val t = r.get(idx)
            val est = if (t == null) 0L else cms.estimateCount(t)
            Row.fromSeq(r.toSeq :+ est)
          }
        }(enc).toDF(terms.columns :+ "est_count": _*)
    }
  }

  /** Streaming maintenance: every micro-batch of the file stream folds
    * into the sketch exactly once. State stays KB-scale while the
    * stream is unbounded. */
  def runStream(spark: SparkSession, srcDir: String, viewRoot: String,
      checkpointDir: String, schema: StructType, spec: Spec): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("header", "true")
      .csv(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(spark, viewRoot, batch, spec, batchId)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
