package graft.lakehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Exact

/** Incrementally-maintained GROUPED AGGREGATES over a CDC feed, WITH
  * RETRACTIONS — the view [[MaterializedAgg]] cannot be: its folds
  * are append-only, so an UPDATE or DELETE on the source silently
  * strands the old contribution. Here every drained net change
  * applies with a sign (+1 insert, −1 delete; an update is its
  * delete + insert pair), which sums and counts retract exactly —
  * the classic incremental-view-maintenance delta rule, expressible
  * precisely because the maintained functions are self-inverse
  * (HLL distincts are not, and are refused).
  *
  * Maintenance is O(changes + affected state): the per-key delta
  * aggregates only the drained rows, the merge touches only affected
  * keys, and the state commit is MERGE-ON-READ (`deleteByKey` for
  * groups whose count reaches zero, `upsertByKey` for new images) —
  * the state table's untouched files carry by reference. State reads
  * share [[MaterializedAgg.read]]'s schema, so consumers are
  * interchangeable.
  *
  * The source must mutate through VERSIONED commits (appendDelta /
  * upsertByKey / deleteWhere / DML …): snapshot-diff CDC is keyed on
  * version numbers, so in-place streaming appends into the current
  * version dir ([[StreamingLoader.commitBatch]]) are invisible to a
  * feed consumer until the next versioned commit.
  *
  * Exactly-once: the drain position advances only after apply, and
  * the apply stamps the drained `to`-version as the state's batch
  * marker — a crash-replayed range either skips (marker present) or
  * re-derives against the current state, where the merge converges
  * (a group deleted by the first attempt re-deletes; nothing
  * double-counts).
  */
object CdcAggView {

  /** One maintenance step: drain the source CDC since the last sync
    * and apply it to the view. Returns the drained range, or None
    * when caught up. First sync bootstraps from the snapshot. Group
    * keys must be non-null in the source (the keyed state cannot
    * address null groups — refused loudly, not dropped). */
  def sync(spark: SparkSession, srcRoot: String, viewRoot: String,
      spec: MaterializedAgg.Spec,
      keepVersions: Int = 4): Option[(Long, Long)] = {
    require(spec.distincts.isEmpty,
      "HLL distinct sketches cannot retract; CdcAggView maintains sums/counts only")
    ChangeFeed.drainRange(spark, srcRoot, s"$viewRoot/_cdc") { (cdc, _, to) =>
      if (!VersionedTable.lastFoldedBatch(spark, viewRoot).exists(_ >= to)) {
        val sign = when(col("_change_type") === "insert", lit(1L))
          .otherwise(lit(-1L))
        val delta = cdc.withColumn("_sign", sign)
          .groupBy(spec.keys.map(col): _*)
          .agg(sum(col("_sign")).as("dcnt"),
            spec.sums.map(c => sum(col("_sign") * col(c).cast(Exact.Dec))
              .as(s"ddec_$c")): _*)
          .persist()
        try {
          require(delta.filter(spec.keys.map(col(_).isNull)
              .reduce(_ || _)).isEmpty,
            s"null group key in CDC delta: keyed view state cannot " +
              s"address null groups (keys: ${spec.keys.mkString(",")})")
          if (VersionedTable.currentVersion(spark, viewRoot).isEmpty) {
            // bootstrap: the first drain is the snapshot as inserts,
            // so the delta IS the state; the marker commits with it
            val init = delta.select(
              spec.keys.map(col) ++ Seq(col("dcnt").as("cnt")) ++
                spec.sums.map(c => col(s"ddec_$c").as(s"dec_$c")): _*)
              .filter(col("cnt") > 0)
            VersionedTable.commit(spark, viewRoot, keepVersions) { stage =>
              init.write.mode("overwrite").parquet(stage)
              VersionedTable.stampBatch(spark, stage, to)
            }
          } else {
            val state = VersionedTable.read(spark, viewRoot)
            // only the keys the delta touches leave the carried files
            val affected = state.join(
              broadcast(delta.select(spec.keys.map(col): _*)),
              spec.keys, "left_semi")
            val merged = affected.join(delta, spec.keys, "full_outer")
              .select(spec.keys.map(col) ++ Seq(
                (coalesce(col("cnt"), lit(0L)) +
                  coalesce(col("dcnt"), lit(0L))).as("cnt")) ++
                spec.sums.map(c =>
                  (coalesce(col(s"dec_$c"), lit(0).cast(Exact.Dec)) +
                    coalesce(col(s"ddec_$c"), lit(0).cast(Exact.Dec)))
                    .cast(Exact.Dec).as(s"dec_$c")): _*)
              .persist()
            try {
              val dels = merged.filter(col("cnt") <= 0)
                .select(spec.keys.map(col): _*)
              val ups = merged.filter(col("cnt") > 0)
              if (!dels.isEmpty)
                VersionedTable.deleteByKey(spark, viewRoot, dels,
                  spec.keys, keepVersions)
              // the marker rides the upsert commit; an upsert-free
              // range (pure group deletions) stamps via an empty-
              // append path never taken — deletes alone are
              // idempotent, so replay converges without it
              if (!ups.isEmpty)
                VersionedTable.upsertByKey(spark, viewRoot, ups,
                  spec.keys, keepVersions, batchId = Some(to))
            } finally { merged.unpersist(false); () }
          }
        } finally { delta.unpersist(false); () }
      }
    }
  }

  /** The maintained view, in [[MaterializedAgg.read]]'s shape. */
  def read(spark: SparkSession, viewRoot: String,
      spec: MaterializedAgg.Spec): DataFrame =
    MaterializedAgg.read(spark, viewRoot, spec)
}
