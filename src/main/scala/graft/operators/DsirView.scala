package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lakehouse.MaterializedAgg

/** Incrementally-maintained DSIR importance model — the streaming-
  * crawl form of q106 (Xie et al., NeurIPS 2023): the model is just
  * per-bucket token counts (raw corpus + target slice), which are
  * ASSOCIATIVE — so the maintained state folds per batch through
  * [[MaterializedAgg]] and is BIT-IDENTICAL to a from-scratch count
  * over everything folded (the maintained-view family contract:
  * integer-count merges are order-independent). A 100 TB crawl scores
  * each incoming batch against the model-so-far WITHOUT re-scanning
  * history: the model is ≤256 rows — KBs — at ANY corpus size, the
  * log-ratio table broadcasts, and scoring is one explode + one
  * per-doc aggregate over the batch alone.
  *
  * Contract with q106: [[score]] computes the identical formula
  * (md5-bucketed unigrams, Laplace over the 256-bucket space, 6-dp
  * ln, exact decimal weighted sum), so once the whole corpus has been
  * folded, scoring the corpus reproduces `q106_dsir_weights`
  * bit-for-bit (spec-pinned).
  */
object DsirView {

  /** 256 buckets: first 2 md5 hex chars, STRING-keyed (no hex parse —
    * the q106/keepByRate convention). */
  private val Buckets = 256.0

  private def toks(docs: DataFrame, targetLang: String): DataFrame =
    docs
      .select(col("doc_id"), col("lang"),
        explode(TextOps.words(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
      .select(col("doc_id"),
        substring(md5(col("term")), 1, 2).as("b"),
        when(col("lang") === targetLang, 1L).otherwise(0L).as("tgt"))

  private val spec = MaterializedAgg.Spec(keys = Seq("b"), sums = Seq("tgt"))

  /** Fold one document batch's token counts into the model at `root`.
    * O(batch) — one explode + one ≤256-group aggregate + a KB-sized
    * state commit. Returns the committed state version. */
  def update(spark: SparkSession, root: String, docsBatch: DataFrame,
      targetLang: String = "en"): Long =
    MaterializedAgg.update(spark, root, toks(docsBatch, targetLang), spec)

  /** The maintained model: (b, cr, ct) per bucket — raw and target
    * token counts so far. */
  def model(spark: SparkSession, root: String): DataFrame =
    MaterializedAgg.read(spark, root, spec)
      .select(col("b"), col("cnt").as("cr"),
        col("sum_tgt").cast("long").as("ct"))

  /** True once at least one non-empty batch has been folded at `root`
    * — the precondition [[score]] enforces with a loud refusal.
    * Callers that can fall back to neutral weights (rate 1.0) should
    * gate on this instead of catching. */
  def hasState(spark: SparkSession, root: String): Boolean =
    graft.lakehouse.VersionedTable.currentVersion(spark, root).isDefined && {
      val t = model(spark, root).agg(sum(col("cr"))).head
      !t.isNullAt(0) && t.getLong(0) > 0L
    }

  /** Score `docs` against the model-so-far: per-doc log importance
    * weight, the exact q106 formula on the maintained counts. The
    * model side is ≤256 rows (broadcast); only the batch explodes. */
  def score(spark: SparkSession, root: String, docs: DataFrame): DataFrame = {
    val m = model(spark, root)
    val t = m.agg(sum(col("cr")), sum(col("ct"))).head
    // loud refusal over a bare NPE (the QuantileView.clip convention):
    // an unfolded model (score before any update, or every folded doc
    // tokenized empty) has null sums
    require(!t.isNullAt(0) && t.getLong(0) > 0L,
      s"no folded DSIR state at $root — fold a non-empty batch " +
        "(DsirView.update) before scoring")
    val (tr, tt) = (t.getLong(0).toDouble, t.getLong(1).toDouble)
    val lr = m.select(col("b"),
      round(log(((col("ct") + 1.0) / (tt + Buckets))
        / ((col("cr") + 1.0) / (tr + Buckets))), 6).as("lr"))
    // a bucket the model has never seen scores at the zero-count
    // smoothed ratio (Laplace keeps it finite) instead of silently
    // dropping the token -- new batches carry novel vocabulary
    val lrUnseen = BigDecimal(math.log((1.0 / (tt + Buckets))
        / (1.0 / (tr + Buckets))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    toks(docs, targetLang = "")
      .groupBy("doc_id", "b").agg(count(lit(1)).as("n"))
      .join(broadcast(lr), Seq("b"), "left")
      .withColumn("lr", coalesce(col("lr"), lit(lrUnseen)))
      .groupBy("doc_id")
      .agg(sum(col("n")).as("n_tokens"),
        round(sum((col("n") * col("lr")).cast(graft.util.Exact.Dec))
          .cast("double"), 6).as("dsir_logw"))
      .select("doc_id", "n_tokens", "dsir_logw")
  }
}
