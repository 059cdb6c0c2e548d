package graft.lakehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Exact

/** Incrementally-maintained grouped aggregate — the lakehouse answer
  * to "recompute the dashboard after every load". Counts and decimal
  * sums are ASSOCIATIVE partials, so each ingestion batch folds into
  * the materialized state with one small merge:
  *
  *  1. partial-aggregate the NEW batch (map-side combine, rows =
  *     touched keys);
  *  2. union with the current state and re-aggregate (state is keyed
  *     and compact — the merge scales with the key space, never with
  *     the fact table);
  *  3. commit the new state through [[VersionedTable]] — readable at
  *     every crash point, and a crashed update simply retries.
  *
  * Sums accumulate in DECIMAL(28,6) end-to-end (`sum_` columns expose
  * the double view), so the maintained state is bit-identical to a
  * from-scratch aggregation of every batch — spec-pinned, no drift
  * ever. Averages derive as sum/cnt at read time; min/max would fold
  * the same way (associative); non-associative measures (exact
  * distinct) need their own sketch (see q42's HLL twin).
  */
object MaterializedAgg {

  /** `keys` group the view; `sums` are double-valued columns
    * maintained as exact decimal sums (count is always kept);
    * `distincts` are columns whose APPROX distinct count is
    * maintained as a mergeable HLL sketch — the associative answer to
    * the one aggregate exact folding cannot give (register-max union
    * is order-independent, so the maintained sketch is bit-identical
    * to a from-scratch build). */
  final case class Spec(keys: Seq[String], sums: Seq[String],
      distincts: Seq[String] = Nil)

  private def partial(batch: DataFrame, spec: Spec): DataFrame =
    batch.groupBy(spec.keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        spec.sums.map(c =>
          sum(col(c).cast(Exact.Dec)).as(s"dec_$c")) ++
        spec.distincts.map(c =>
          hll_sketch_agg(col(c)).as(s"hll_$c")): _*)

  /** Fold one batch into the materialized state at `root`; returns
    * the committed version. */
  def update(spark: SparkSession, root: String, batch: DataFrame,
      spec: Spec, keepVersions: Int = 1): Long = {
    val p = partial(batch, spec)
    val cur = if (VersionedTable.currentVersion(spark, root).isDefined)
      Some(VersionedTable.read(spark, root)) else None
    val merged = cur.map(_.unionByName(p)).getOrElse(p)
      .groupBy(spec.keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        spec.sums.map(c => sum(col(s"dec_$c")).as(s"dec_$c")) ++
        spec.distincts.map(c =>
          hll_union_agg(col(s"hll_$c")).as(s"hll_$c")): _*)
    // keepVersions > 1 retains fold history for catalog-snapshot
    // readers (readVersion / versionForBatch) — the state is KB-sized,
    // so retained manifests cost nothing
    VersionedTable.commit(spark, root, keepVersions) { stage =>
      merged.write.mode("overwrite").parquet(stage)
    }
  }

  /** Read the view: keys, cnt, and for each maintained sum the exact
    * double total `sum_<col>` and the derived `avg_<col>`. */
  def read(spark: SparkSession, root: String, spec: Spec): DataFrame =
    derived(VersionedTable.read(spark, root), spec)

  /** [[read]] at a RETAINED version — the catalog-snapshot form:
    * serve the view exactly as it stood when the pinned version was
    * its current state (retention must cover the snapshot reader,
    * the usual keepVersions contract). */
  def readVersion(spark: SparkSession, root: String, spec: Spec,
      version: Long): DataFrame =
    derived(VersionedTable.readVersion(spark, root, version), spec)

  private def derived(st: DataFrame, spec: Spec): DataFrame = {
    val cols = spec.keys.map(col) ++ Seq(col("cnt")) ++
      spec.sums.flatMap(c => Seq(
        col(s"dec_$c").cast("double").as(s"sum_$c"),
        (col(s"dec_$c").cast("double") / col("cnt")).as(s"avg_$c"))) ++
      spec.distincts.map(c =>
        hll_sketch_estimate(col(s"hll_$c")).as(s"approx_distinct_$c"))
    st.select(cols: _*)
  }

  // ---- streaming form: exactly-once folds keyed by micro-batch id.

  /** Highest micro-batch id folded into the state — the protocol now
    * lives in [[VersionedTable.lastFoldedBatch]] (shared by every
    * maintained view); kept here as the historical entry point. */
  def lastFoldedBatch(spark: SparkSession, root: String): Option[Long] =
    VersionedTable.lastFoldedBatch(spark, root)

  /** Fold a micro-batch EXACTLY ONCE: Structured Streaming re-delivers
    * a batch whose foreachBatch crashed mid-commit, so the fold is
    * idempotent by batchId — the id is recorded as a marker file
    * inside the same versioned commit as the merged state (one
    * atomic unit: either the new state AND its id are current, or
    * neither). A re-delivered id folds nothing. Returns whether the
    * batch was folded. */
  /** [[foldBatch]] for a CALLER-BUILT partial — rows already in the
    * state's physical shape (`keys…, cnt, dec_<sum>…`). This is the
    * RETRACTION entry: counts and decimal sums fold NEGATIVE partials
    * exactly (the CdcAggView argument — integer/decimal arithmetic is
    * associative and invertible), so a caller that derives the exact
    * rows a batch once contributed can subtract them and the state is
    * bit-identical to a from-scratch fold of the surviving batches.
    * Groups whose merged `cnt` reaches 0 are dropped (by exactness
    * their sums are 0 too — a fully-retracted key vanishes like it
    * was never folded). HLL distincts cannot retract — refused.
    * Same exactly-once ledger as [[foldBatch]]. */
  def foldPartialBatch(spark: SparkSession, root: String,
      partialRows: DataFrame, spec: Spec, batchId: Long,
      keepVersions: Int = 1): Boolean = {
    require(spec.distincts.isEmpty,
      "HLL distinct sketches cannot retract; foldPartialBatch maintains " +
        "counts/sums only")
    if (lastFoldedBatch(spark, root).exists(_ >= batchId)) return false
    val cur = if (VersionedTable.currentVersion(spark, root).isDefined)
      Some(VersionedTable.read(spark, root)) else None
    val merged = cur.map(_.unionByName(partialRows)).getOrElse(partialRows)
      .groupBy(spec.keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        spec.sums.map(c => sum(col(s"dec_$c")).as(s"dec_$c")): _*)
      .filter(col("cnt") =!= 0L)
    VersionedTable.commit(spark, root, keepVersions) { stage =>
      merged.write.mode("overwrite").parquet(stage)
      VersionedTable.stampBatch(spark, stage, batchId)
    }
    true
  }

  def foldBatch(spark: SparkSession, root: String, batch: DataFrame,
      spec: Spec, batchId: Long, keepVersions: Int = 1): Boolean = {
    if (lastFoldedBatch(spark, root).exists(_ >= batchId)) return false
    val p = partial(batch, spec)
    val cur = if (VersionedTable.currentVersion(spark, root).isDefined)
      Some(VersionedTable.read(spark, root)) else None
    val merged = cur.map(_.unionByName(p)).getOrElse(p)
      .groupBy(spec.keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        spec.sums.map(c => sum(col(s"dec_$c")).as(s"dec_$c")) ++
        spec.distincts.map(c =>
          hll_union_agg(col(s"hll_$c")).as(s"hll_$c")): _*)
    // keepVersions > 1 retains fold history for catalog-snapshot
    // readers (readVersion / versionForBatch) — the state is KB-sized,
    // so retained manifests cost nothing
    VersionedTable.commit(spark, root, keepVersions) { stage =>
      merged.write.mode("overwrite").parquet(stage)
      VersionedTable.stampBatch(spark, stage, batchId)
    }
    true
  }
}
