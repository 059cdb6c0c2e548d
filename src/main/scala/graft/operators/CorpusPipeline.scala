package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus pipeline, composed from the operator
  * library at the DATAFRAME level — the facade a user points at their
  * own document table (schema: doc_id, text, lang, source), not just
  * the test tables:
  *
  * {{{
  * quality filter → exact content dedup → near-dup drop →
  * decontamination → DSIR importance resampling → temperature source
  * mixing → per-language weighted sampling → per-stream token packing
  * }}}
  *
  * Each stage is also exposed on its own. Everything is one lazy
  * DataFrame flow — no stage materializes until the caller acts (the
  * one exception: the DSIR stage fits its ≤256-row model eagerly,
  * like every model-fitting operator in the library) — and
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
      maxRepetition: Double = 1.0, // q77's dup_tri_frac cutoff; 1.0 = off
      nearDupThreshold: Double = 1.0, // trigram-Jaccard near-dup drop; 1.0 = off
      redactPii: Boolean = false, // TextOps.redactPii before anything else
      langKeepRates: Map[String, Double] = Map("en" -> 1.0),
      defaultKeepRate: Double = 0.25,
      binTokens: Long = 4096L,
      partitions: Int = 0,
      // Some(lang) → clipped DSIR importance resampling toward that
      // language slice, after decontamination (dsirResample)
      dsirTargetLang: Option[String] = None,
      // Some(alpha) → temperature-weighted source mixing over a
      // mixBudgetFrac token budget, after the DSIR stage
      mixAlpha: Option[Double] = None,
      mixBudgetFrac: Double = 0.5,
      // Some((valFrac, testFrac)) → leakage-guarded train/val/test
      // split (TextOps.splitByCluster) after sampling; packing then
      // runs per (source, split) so bins never straddle splits
      splitFracs: Option[(Double, Double)] = None,
      splitNearDupT: Double = 0.5,
      // Some((root, minP)) → MODEL-BASED quality gate (the GPT-3/
      // LLaMA classifier stage): drop docs the trained
      // [[QualityModel]] at `root` scores below minP; runs with the
      // heuristic quality filter, before dedup
      modelGate: Option[(String, Double)] = None,
      // true → the Gopher rule suite (q157: word count, mean word
      // length, alpha ratio, stopword floor) as a hard drop mask,
      // with the heuristic quality filter, before dedup
      gopherGate: Boolean = false)

  /** Row counts after each stage (each is one count job over the lazy
    * prefix of the flow). `afterDsir`/`afterMixing` are present only
    * when their stage is configured on. */
  final case class Report(input: Long, afterQuality: Long,
      afterDedup: Long, afterNearDup: Long, afterDecontam: Long,
      afterSampling: Long, bins: Long,
      afterDsir: Option[Long] = None, afterMixing: Option[Long] = None,
      splitCounts: Option[Map[String, Long]] = None,
      afterModelGate: Option[Long] = None,
      afterGopher: Option[Long] = None)

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

  /** Canonical-form content fingerprint over `text` — since round 4
    * through the native `normalize_text` (case-fold + whitespace
    * collapse + NFD accent strip), so "café" and "café" (and
    * " CAFÉ ") dedup to one canonical form. */
  def canonicalFingerprint(text: Column): Column =
    md5(graft.functions.GraftFunctions.normalizeText(text).cast("binary"))

  /** q157's Gopher rule suite (Rae et al. 2021, arXiv:2112.11446
    * Table A1) as ONE boolean column over `text` — map-only, the
    * pipeline's hard drop mask: word count ∈ [50, 100 000], mean word
    * length ∈ [3, 10], ≥ 80 % of words contain an alphabetic char,
    * ≥ 2 distinct stopwords. */
  def gopherPass(text: Column): Column = {
    val wf = filter(words(text), w => length(w) > 0)
    val nWords = size(wf).cast("double")
    val nws = length(regexp_replace(trim(text), "\\s+", "")).cast("double")
    val mwl = nws / nWords
    val alphaFrac =
      size(filter(wf, x => x.rlike("[A-Za-z]"))).cast("double") / nWords
    val stopHits = size(array_intersect(
      array_distinct(transform(wf, w => lower(w))),
      array(Seq("the", "a", "of", "and", "is", "to", "in").map(lit): _*)))
    nWords >= 50 && nWords <= 100000 &&
      mwl >= 3.0 && mwl <= 10.0 &&
      alphaFrac >= 0.8 && stopHits >= 2
  }

  /** q77's duplicate-trigram fraction as a column over `text` —
    * SELF-repetition (templated/boilerplate docs), which cross-doc
    * dedup never catches. Map-only. */
  def repetitionScore(text: Column): Column = {
    val w = words(text)
    val n = size(w)
    val tri = array_distinct(transform(
      sequence(lit(0), greatest(n - 3, lit(-1))),
      i => concat_ws("\u0000", element_at(w, i + 1), element_at(w, i + 2),
        element_at(w, i + 3))))
    when(n >= 3,
      lit(1.0) - size(tri).cast("double") / (n - 2).cast("double"))
      .otherwise(lit(0.0))
  }

  /** q76's benchmark decontamination as a transform: drop docs sharing
    * any word trigram with `benchmark` (a (doc_id, text) eval set —
    * small by construction, so its gram set BROADCASTS; the corpus
    * side is a map-only native shingle scan + broadcast semi-join,
    * nothing corpus-sized shuffles). */
  def decontaminate(docs: DataFrame, benchmark: DataFrame): DataFrame = {
    def grams(df: DataFrame) = df.select(
      col("doc_id"),
      explode(graft.functions.GraftFunctions.trigramHashes(
        words(col("text")))).as("gram"))
    val benchGrams = grams(benchmark).select("gram").distinct()
    val contaminated = grams(docs)
      .join(broadcast(benchGrams), Seq("gram"))
      .select("doc_id").distinct()
    docs.join(contaminated, Seq("doc_id"), "left_anti")
  }

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

  /** NEAR-dup dedup within the corpus (q31's PPJoin-filtered exact
    * trigram-Jaccard engine): drops every doc with a near-duplicate of
    * smaller doc_id — the greedy single-pass policy
    * ([[TextOps.dropNearDupsWithinBatch]]); full connected-component
    * survivor selection stays the q66/q69 batch job. Off by default
    * (`nearDupThreshold = 1.0`): near-dup mining is a real pairwise
    * pass — cheap under PPJoin pruning, but not free like the map-side
    * stages around it. */
  def dedupNear(docs: DataFrame, t: Double): DataFrame =
    TextOps.dropNearDupsWithinBatch(docs, t)

  /** q99's TEMPERATURE-weighted source mixing as a pipeline stage:
    * source i keeps share n_i^alpha / Σ n_j^alpha of a `budgetFrac`
    * token budget (α≈0.3 is the XLM-R/mT5 practice — flattens head
    * sources, boosts the tail; rates clamp at 1). Same scale shape as
    * the query twin: two K-row aggregates, broadcast rate join,
    * map-side deterministic md5-threshold keep — append-stable, so
    * re-planning on a grown corpus keeps prior decisions wherever the
    * rates do not move. */
  def mixByTemperature(docs: DataFrame, alpha: Double,
      budgetFrac: Double = 0.5): DataFrame = {
    val toks = docs.withColumn("_nt", size(words(col("text"))).cast("long"))
    val perSrc = toks.groupBy("source").agg(sum(col("_nt")).as("n"))
      .withColumn("w", round(pow(col("n").cast("double"), alpha), 6))
    val totals = perSrc.agg(sum(col("n")).as("total"),
      sum(col("w").cast(graft.util.Exact.Dec)).cast("double").as("wsum"))
    val rates = perSrc.crossJoin(broadcast(totals))
      .withColumn("_rate", least(lit(1.0),
        lit(budgetFrac) * col("total") * col("w") / col("wsum") / col("n")))
      .select(col("source"), col("_rate"))
    docs.join(broadcast(rates), Seq("source"))
      .filter(TextOps.keepByRate(col("doc_id"), col("_rate")))
      .drop("_rate")
      .select(docs.columns.map(col): _*)
  }

  /** q112's clipped DSIR importance resampling as a pipeline stage:
    * weights against the corpus's own `targetLang` slice
    * ([[TextOps.dsirLogWeights]] — the one shared definition), keep
    * w.p. min(1, exp(logw)) via the deterministic md5 threshold. A
    * doc whose text tokenizes empty has no feature row and rides
    * through at the neutral rate 1.0 — importance resampling, never a
    * hard filter (the daemon-stage rule). The model is two ≤256-row
    * aggregates; only the token explode is data-sized. */
  def dsirResample(docs: DataFrame, targetLang: String): DataFrame = {
    val rates = TextOps.dsirLogWeights(docs, targetLang)
      .select(col("doc_id"),
        least(lit(1.0), round(exp(col("dsir_logw")), 6)).as("_rate"))
    docs.join(rates, Seq("doc_id"), "left")
      .withColumn("_rate", coalesce(col("_rate"), lit(1.0)))
      .filter(TextOps.keepByRate(col("doc_id"), col("_rate")))
      .drop("_rate")
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
    * two-pass partition-offset scheme, bin = offset / binTokens.
    * `groupCols` defaults to per-source streams; the split-aware run
    * packs per (source, split) so a bin never straddles a split. */
  def packTokens(docs: DataFrame, binTokens: Long,
      partitions: Int = 0,
      groupCols: Seq[String] = Seq("source")): DataFrame = {
    val base = docs.select(groupCols.map(col) ++ Seq(col("doc_id"),
      size(words(col("text"))).cast("long").as("n_tokens")): _*)
    RankOps.withGroupedPrefixSum(base, groupCols, Seq("doc_id"),
        valueCol = "n_tokens", sumCol = "offset", partitions = partitions)
      .withColumn("bin_id", floor(col("offset") / binTokens).cast("long"))
  }

  /** TOKENIZE the curated corpus and PACK fixed-length training
    * sequences — the step after [[run]]'s selection: takes the
    * selected (doc_id, text, source[, split]) frame, trains a
    * sample-bounded BPE table ON THE TRAIN SPLIT ONLY (when a split
    * column exists — an eval split must not shape the tokenizer, the
    * same leakage hygiene splitByCluster gives documents), builds the
    * deterministic vocabulary from the same slice (unseen eval-side
    * characters map to `<unk>` and are counted, the honest OOV
    * treatment), encodes every doc map-side, and packs per
    * (source[, split]) so a sequence never straddles a split
    * ([[BpeTrainer.packSequences]] — distributed prefix sums, no
    * single-task pass). Returns (merges, vocab, sequences). */
  def tokenizeAndPack(selected: DataFrame, numMerges: Int = 200,
      maxWords: Int = 20000, seqLen: Long = 2048L):
      (Seq[(String, String)], Array[(String, Int)], DataFrame) = {
    val hasSplit = selected.columns.contains("split")
    val trainSlice =
      if (hasSplit) selected.filter(col("split") === "train")
      else selected
    val merges = BpeTrainer.train(trainSlice, numMerges,
      maxWords = maxWords)
    val vt = BpeTrainer.vocab(trainSlice, merges)
    val groupCols = if (hasSplit) Seq("source", "split") else Seq("source")
    val enc = BpeTrainer.encode(selected, merges, vt)
      .join(selected.select(Seq("doc_id").map(col) ++
        groupCols.map(col): _*), Seq("doc_id"))
    val seqs = BpeTrainer.packSequences(enc, seqLen.toInt, groupCols)
    (merges, vt, seqs)
  }

  /** Run the full pipeline; returns the packed corpus and the
    * per-stage row counts. `benchmark` (an eval set to decontaminate
    * against) is optional; the repetition filter engages when
    * `cfg.maxRepetition < 1.0`. */
  def run(docs: DataFrame, cfg: Config = Config(),
      benchmark: Option[DataFrame] = None): (DataFrame, Report) = {
    val input = if (cfg.redactPii) TextOps.redactPii(docs) else docs
    val scored = input.filter(qualityScore(col("text")) >= cfg.minQuality &&
      (if (cfg.maxRepetition < 1.0)
        repetitionScore(col("text")) <= cfg.maxRepetition
      else lit(true)))
    // Gopher rule suite: a map-only hard mask in the same stage tier
    // as the heuristic score (content-shape gates before dedup)
    val ruled =
      if (cfg.gopherGate) scored.filter(gopherPass(col("text")))
      else scored
    // model-based gate: broadcast-join scoring (QualityModel.score is
    // scan + broadcast join + one doc-keyed aggregate — linear)
    val gated = cfg.modelGate.fold(ruled) { case (root, minP) =>
      ruled.join(
        QualityModel.score(ruled.sparkSession, root, ruled)
          .filter(col("quality_p") >= minP).select("doc_id"),
        Seq("doc_id"), "left_semi")
    }
    val deduped = dedupExact(gated)
    val nearDeduped =
      if (cfg.nearDupThreshold < 1.0) dedupNear(deduped, cfg.nearDupThreshold)
      else deduped
    val clean = benchmark.fold(nearDeduped)(b => decontaminate(nearDeduped, b))
    // mixing stages: distribution-shaping AFTER content hygiene
    // (importance toward the target slice, then source temperature),
    // BEFORE the flat per-language sample and packing
    val dsired = cfg.dsirTargetLang.fold(clean)(l => dsirResample(clean, l))
    val mixed = cfg.mixAlpha.fold(dsired)(a =>
      mixByTemperature(dsired, a, cfg.mixBudgetFrac))
    val sampled = weightedSample(mixed, cfg.langKeepRates, cfg.defaultKeepRate)
    // split LAST among the selection stages: assignments key on
    // near-dup clusters so no eval doc has a train near-twin
    val divided = cfg.splitFracs.fold(sampled) { case (v, t) =>
      TextOps.splitByCluster(sampled, cfg.splitNearDupT, v, t)
        .drop("cluster_id")
    }
    val packed = packTokens(divided, cfg.binTokens, cfg.partitions,
      groupCols =
        if (cfg.splitFracs.isDefined) Seq("source", "split")
        else Seq("source"))
    val report = Report(
      input = docs.count(),
      afterQuality = scored.count(),
      afterDedup = deduped.count(),
      afterNearDup = nearDeduped.count(),
      afterDecontam = clean.count(),
      afterSampling = sampled.count(),
      bins = packed.agg(countDistinct(col("source"), col("bin_id"))).head.getLong(0),
      afterDsir = cfg.dsirTargetLang.map(_ => dsired.count()),
      afterMixing = cfg.mixAlpha.map(_ => mixed.count()),
      splitCounts = cfg.splitFracs.map(_ => divided.groupBy("split")
        .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap),
      afterModelGate = cfg.modelGate.map(_ => gated.count()),
      afterGopher = if (cfg.gopherGate) Some(ruled.count()) else None)
    (packed, report)
  }
}
