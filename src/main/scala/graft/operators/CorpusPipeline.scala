package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus pipeline, composed from the operator
  * library at the DATAFRAME level — the facade a user points at their
  * own document table (schema: doc_id, text, lang, source), not just
  * the test tables:
  *
  * {{{
  * quality filter → exact content dedup → per-language weighted
  * sampling → per-stream token packing
  * }}}
  *
  * Each stage is also exposed on its own. Everything is one lazy
  * DataFrame flow — no stage materializes until the caller acts — and
  * every stage keeps the scale shapes of its query twin: the quality
  * filter and the sampler are map-side-only, dedup is one shuffle on
  * the 128-bit fingerprint with map-side partial min, and packing
  * runs RankOps' two-pass distributed prefix sums (never a per-source
  * single-reducer window). Determinism: every stage is hash-based and
  * append-stable — rerunning on a grown corpus keeps prior decisions.
  */
object CorpusPipeline {

  final case class Config(
      minQuality: Double = 0.5,
      langKeepRates: Map[String, Double] = Map("en" -> 1.0),
      defaultKeepRate: Double = 0.25,
      binTokens: Long = 4096L,
      partitions: Int = 0)

  /** Row counts after each stage (each is one count job over the lazy
    * prefix of the flow). */
  final case class Report(input: Long, afterQuality: Long,
      afterDedup: Long, afterSampling: Long, bins: Long)

  private def words(c: Column): Column = split(trim(c), "\\s+")

  /** q37's deterministic quality score as a column over `text`. */
  def qualityScore(text: Column): Column = {
    val w = words(text)
    val nWords = size(w).cast("double")
    val nChars = length(trim(text)).cast("double")
    val stopHits = size(array_intersect(array_distinct(w),
      array(Seq("the", "a", "of", "and", "is", "to", "in").map(lit): _*)))
      .cast("double")
    val avgWordLen = (nChars - (nWords - 1.0)) / nWords
    least(nWords / 100.0, lit(1.0)) * 0.4 +
      when(avgWordLen.between(3.0, 8.0), 0.3).otherwise(0.0) +
      least(stopHits / 5.0, lit(1.0)) * 0.3
  }

  /** q39's canonical-form content fingerprint (case-fold + whitespace
    * collapse + md5) as a column over `text`. */
  def canonicalFingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " ").cast("binary"))

  /** Exact content dedup, keep-lowest-doc_id: one shuffle on the
    * fingerprint with map-side partial min, then a co-partitioned
    * semi-join back (the second shuffle reuses the first's
    * partitioning on the fingerprint side). */
  def dedupExact(docs: DataFrame): DataFrame = {
    val keep = docs
      .withColumn("_fp", canonicalFingerprint(col("text")))
      .groupBy("_fp").agg(min(col("doc_id")).as("doc_id"))
    docs.join(keep.select("doc_id"), Seq("doc_id"), "left_semi")
  }

  /** q67's deterministic per-language weighted sampling: keep rate →
    * 16-bit md5-hex threshold, map-side filter, append-stable. */
  def weightedSample(docs: DataFrame, rates: Map[String, Double],
      default: Double): DataFrame = {
    def hexThreshold(rate: Double): String =
      f"${math.min(65535L, (rate * 65536).toLong)}%04x"
    val threshold = rates.foldRight(lit(hexThreshold(default)): Column) {
      case ((lang, rate), acc) =>
        when(col("lang") === lang, lit(hexThreshold(rate))).otherwise(acc)
    }
    docs.filter(
      substring(md5(col("doc_id").cast("string")), 1, 4) < threshold)
  }

  /** q62's per-stream token packing: exclusive prefix sums via the
    * two-pass partition-offset scheme, bin = offset / binTokens. */
  def packTokens(docs: DataFrame, binTokens: Long,
      partitions: Int = 0): DataFrame = {
    val base = docs.select(col("source"), col("doc_id"),
      size(words(col("text"))).cast("long").as("n_tokens"))
    RankOps.withGroupedPrefixSum(base, Seq("source"), Seq("doc_id"),
        valueCol = "n_tokens", sumCol = "offset", partitions = partitions)
      .withColumn("bin_id", floor(col("offset") / binTokens).cast("long"))
  }

  /** Run the full pipeline; returns the packed corpus and the
    * per-stage row counts. */
  def run(docs: DataFrame, cfg: Config = Config()): (DataFrame, Report) = {
    val scored = docs.filter(qualityScore(col("text")) >= cfg.minQuality)
    val deduped = dedupExact(scored)
    val sampled = weightedSample(deduped, cfg.langKeepRates, cfg.defaultKeepRate)
    val packed = packTokens(sampled, cfg.binTokens, cfg.partitions)
    val report = Report(
      input = docs.count(),
      afterQuality = scored.count(),
      afterDedup = deduped.count(),
      afterSampling = sampled.count(),
      bins = packed.agg(countDistinct(col("source"), col("bin_id"))).head.getLong(0))
    (packed, report)
  }
}
