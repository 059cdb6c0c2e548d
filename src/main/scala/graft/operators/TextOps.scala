package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Checkpoints.CutOps

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: exact dedup, n-gram near-dup detection,
  * language ID, quality scoring, tokenization, fingerprinting.
  *
  * Everything is built from codegen'd `functions._` (split/transform/
  * array_* higher-order functions) — no UDFs, so the whole pipeline
  * stays inside whole-stage codegen and scales linearly.
  */
object TextOps {

  type QFn = (SparkSession, String) => DataFrame

  /** Whitespace word split shared by several operators. */
  private[operators] def words(c: Column): Column = split(trim(c), "\\s+")

  /** The deterministic rate→threshold keep rule the mixing samplers
    * share (q68, ScaleOps q92): a row survives iff the first 16 bits
    * of md5(id) sort below floor(rate·65536) — engine-identical (both
    * sides compute the same IEEE product and floor), append-stable,
    * pure map-side. One definition so a threshold-encoding fix can
    * never drift between the samplers. */
  private[graft] def keepByRate(id: Column, rate: Column): Column =
    rate >= 1.0 ||
      substring(md5(id.cast("string")), 1, 4) <
        lpad(lower(hex(floor(rate * 65536).cast("long"))), 4, "0")

  /** Distinct word-trigram shingles:
    * transform(sequence(0, n-3), i -> w[i] ⧺ w[i+1] ⧺ w[i+2]). */
  private def trigrams(c: Column): Column = {
    val w = words(c)
    array_distinct(transform(
      sequence(lit(0), size(w) - 3),
      i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3))))
  }

  /** Exploded 64-bit trigram-shingle hashes via the native
    * `trigram_hashes` codegen expression (graft.functions): per-word
    * xxhash64 + rolling 3-word combine + per-doc dedup, all in one
    * generated loop per document — a MAP-ONLY scan. The previous
    * formulation (posexplode → lead windows → distinct → count
    * window) computed the same values through three full-data
    * shuffles; gram values are bit-identical (same xxhash64 chain),
    * so downstream MinHash/LSH signatures are unchanged.
    * Gram identity is a bijection of the string trigram w.h.p., so
    * Jaccard counts are unchanged. Returns (doc_id, gram, n_grams),
    * distinct per doc, CACHED (flat longs — cheap to materialize,
    * unlike array columns) and eagerly populated. Memoized per
    * (session, dir) via [[graft.util.DfCache]] so repeated queries
    * reuse ONE cache instead of leaking a new one per invocation
    * (q31 and q32 share the postings build).
    */
  private[operators] def gramHashes(s: SparkSession, d: String): DataFrame =
    graft.util.DfCache.getOrBuild(s, s"gramHashes:$d") {
      val e = Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.GraftFunctions.trigramHashes(words(col("text"))).as("grams"))
        .select(col("doc_id"), size(col("grams")).as("n_grams"),
          explode(col("grams")).as("gram"))
        .cache()
      e.count() // eager, serial population (multiple consumers downstream)
      e
    }

  /** Exact dedup: canonical fingerprint → group → keep-lowest-id
    * decision table. At 100 TB this is one shuffle on a 128-bit hash —
    * the grouped row set is tiny regardless of input size. */
  private val q30: QFn = (s, d) => {
    Tables.documents(s, d)
      .groupBy(md5(col("text").cast("binary")).as("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc_id"))
  }
  private val q30Sql =
    """SELECT md5(text) AS fingerprint, COUNT(*) AS n_docs,
      |  MIN(doc_id) AS keep_doc_id
      |FROM documents GROUP BY 1""".stripMargin

  /** Exact n-gram-set Jaccard near-dup pairs via PREFIX FILTERING
    * (PPJoin-style, exact for j ≥ 0.5):
    *
    * A naive shared-shingle self-join degenerates when shingles are
    * frequent — every common trigram becomes a quadratic bucket.
    * Instead, rank each document's shingles by global document
    * frequency (rarest first) and index only the first
    * ⌊n/2⌋+1 of them: two sets with Jaccard ≥ t AND sizes within
    * [t·n, n/t] of each other must collide inside these prefixes
    * (pigeonhole on the required overlap ⌈t·n⌉). Candidates then get
    * one exact array_intersect/array_union verification.
    *
    * Shuffle volume: O(Σ prefix) ≈ half the shingle explosion, but the
    * join buckets are the RARE shingles, so bucket sizes — and the
    * candidate pair count — collapse. This is the 100-TB shape. */
  private val q31: QFn = (s, d) =>
    nearDupPairs(gramHashes(s, d), t = 0.5)

  /** The PPJoin near-dup core over ANY postings table
    * (doc_id, n_grams, gram — the [[gramHashes]] layout): prefix +
    * count + positional filtering, then the exact-Jaccard verify.
    * q31 runs it on the memoized corpus postings; the curation tick
    * runs it on a single batch's postings. */
  private[operators] def nearDupPairs(e: DataFrame, t: Double): DataFrame = {
    val df = e.groupBy("gram").agg(count(lit(1)).as("df"))
    // per-doc prefix = the ⌊n(1−t)⌋+1 globally-rarest shingles. The
    // rank-and-filter runs IN-ROW (collect per doc → array_sort →
    // slice): sorting ~|doc| element arrays beats a partition-wide
    // window sort of the whole postings table. (A `count OVER
    // (PARTITION BY gram)` window attaches df in one postings shuffle
    // instead of this groupBy+join's two and measured 35% faster in
    // isolation — but the gain vanishes at the full-query level
    // because the self-joined prefix reuses this exchange, and the
    // window buffers each gram's group, which a hyper-frequent gram
    // at 100 TB turns into a spill; the streamed join keeps the safer
    // shape. The prefix filter itself is sound under ANY fixed total
    // gram order — df-rarity just minimizes candidates.)
    val prefix = e.join(df, "gram")
      .groupBy("doc_id", "n_grams")
      .agg(collect_list(struct(col("df"), col("gram"))).as("ranked"))
      .select(col("doc_id"), col("n_grams"),
        posexplode(expr(s"slice(array_sort(ranked), 1, " +
          s"cast(floor(n_grams * ${1 - t}) + 1 as int))")))
      // p = the gram's 1-based rank in the doc's full rarity order
      // (the prefix IS the first entries of that order) — feeds the
      // positional filter below
      .select(col("doc_id"), col("n_grams"), (col("pos") + 1).as("p"),
        col("col.gram").as("gram"))
      // materialize ONCE (r14): the a/b branches of the self-join each
      // re-ran the whole df-rank prefix build (profiled: the prefix
      // exchange executed twice per query — ReuseExchange does not
      // collapse the two aliased branches here); the checkpoint is
      // prefix-sized (≈half the postings) and read by both sides
      .cutLineage()
    val a = prefix.select(col("doc_id").as("doc_a"), col("n_grams").as("na"),
      col("p").as("pa"), col("gram"))
    val b = prefix.select(col("doc_id").as("doc_b"), col("n_grams").as("nb"),
      col("p").as("pb"), col("gram"))
    // count filter (PPJoin-style): the same shuffle that generates
    // candidates also counts their prefix collisions c. Uncounted
    // shared grams live in suffix_a or suffix_b — and because the
    // prefix is the SMALLEST grams of each set under one global total
    // order, a (prefix_a ∩ suffix_b) gram and a (suffix_a ∩ prefix_b)
    // gram cannot coexist (each would have to be both smaller and
    // larger than the other), so ALL uncounted shared grams sit in one
    // suffix: overlap ≤ c + max(suffix sizes). (`c + least(...)` is
    // unsound for unequal sizes: na=8, nb=4, B⊂A, c=1 has overlap 4 —
    // a true j=0.5 pair that least() would prune; spec-pinned.)
    // Jaccard ≥ t needs overlap ≥ ⌈t/(1+t)·(na+nb)⌉ — pairs that
    // can't reach it never hit the exact verify.
    //
    // POSITIONAL filter (PPJoin's second bound, aggregate-safe form):
    // a collision on a gram ranked pa-th in a and pb-th in b splits
    // the overlap into grams strictly smaller (≤ min(pa−1, pb−1),
    // since smaller common grams occupy earlier ranks in BOTH lists)
    // and grams at-or-after (≤ 1 + min(na−pa, nb−pb), the remaining
    // tail sizes) — so overlap ≤ min over collisions of
    // min(pa−1,pb−1) + 1 + min(na−pa, nb−pb). Tighter than the count
    // bound whenever a pair's only collisions sit deep in one prefix.
    val required = ceil((col("na") + col("nb")) * (t / (1 + t)))
    val cand = a.join(b, Seq("gram"))
      .filter(col("doc_a") < col("doc_b") &&
        col("na") >= col("nb") * t && col("nb") >= col("na") * t)
      .groupBy("doc_a", "doc_b", "na", "nb")
      .agg(count(lit(1)).as("c"),
        min(least(col("pa") - 1, col("pb") - 1) + 1 +
          least(col("na") - col("pa"), col("nb") - col("pb"))).as("posBound"))
      .filter(col("posBound") >= required &&
        col("c") +
          greatest(col("na") - (floor(col("na") * (1 - t)) + 1),
            col("nb") - (floor(col("nb") * (1 - t)) + 1)) >= required)
      .select("doc_a", "doc_b")
    verifyJaccard(e, cand, t)
  }

  /** Exact-Jaccard verification of candidate pairs against the
    * postings table: |∩| from a codegen'd two-step join + count,
    * |∪| = na + nb − |∩|. Shared with the LSH path (q32). */
  private[operators] def verifyJaccard(e: DataFrame, cand: DataFrame,
                                       t: Double): DataFrame = {
    cand
      .join(e.select(col("doc_id").as("doc_a"), col("n_grams").as("na"),
        col("gram")), "doc_a")
      .join(e.select(col("doc_id").as("doc_b"), col("n_grams").as("nb"),
        col("gram")), Seq("doc_b", "gram"))
      .groupBy("doc_a", "doc_b", "na", "nb")
      .agg(count(lit(1)).as("shared"))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard") >= t)
      .select("doc_a", "doc_b", "jaccard")
  }
  private val q31Sql =
    """WITH g AS (
      |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |          for i in range(1, len(w)-1)]) AS grams
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      |        FROM documents) t)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
      |    (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
      |    AS jaccard
      |FROM g a JOIN g b ON a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
      |    (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
      |    >= 0.5""".stripMargin

  /** Stopword lists for the language-ID heuristic (tiny, broadcast as
    * literals into the expression — no join needed). */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  /** N-gram/stopword-heuristic language ID: count marker-word hits per
    * language, argmax with a fixed tie order ('unknown' when no
    * marker hits). Deterministic, engine-identical integer logic. */
  private val q36: QFn = (s, d) => {
    val w = array_distinct(words(lower(col("text"))))
    val hits = langMarkers.map { case (lang, ms) =>
      lang -> size(array_intersect(w, array(ms.map(lit): _*)))
    }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    // ties resolve to the first list entry (en, de, fr, es) — mirrors
    // the ordered CASE chain in the oracle SQL
    val predFixed = hits.foldRight(lit("unknown"): Column) { case ((lang, h), acc) =>
      when(h === best && best > 0, lit(lang)).otherwise(acc)
    }
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang").as("meta_lang"), predFixed.as("pred_lang"))
      .withColumn("agrees", col("pred_lang") === col("meta_lang"))
  }
  private val q36Sql = {
    val hitExprs = langMarkers.map { case (lang, ms) =>
      val list = ms.map(m => s"'$m'").mkString(", ")
      lang -> s"len(list_intersect(list_distinct(string_split_regex(trim(lower(text)), '\\s+')), [$list]))"
    }
    val best = hitExprs.map(_._2).reduceRight((a, b) => s"GREATEST($a, $b)")
    val cases = hitExprs.map { case (lang, e) =>
      s"WHEN $e = best AND best > 0 THEN '$lang'"
    }.mkString(" ")
    s"""SELECT doc_id, meta_lang, pred_lang, pred_lang = meta_lang AS agrees
       |FROM (
       |  SELECT doc_id, lang AS meta_lang,
       |    CASE $cases ELSE 'unknown' END AS pred_lang
       |  FROM (SELECT *, $best AS best FROM documents) t) u""".stripMargin
  }

  /** Text quality scoring: length / word-shape / stopword-ratio
    * features combined into one deterministic score. */
  private val q37: QFn = (s, d) => {
    val w = words(col("text"))
    val nWords = size(w).cast("double")
    val nChars = length(trim(col("text"))).cast("double")
    val stopHits = size(array_intersect(array_distinct(w),
      array(Seq("the", "a", "of", "and", "is", "to", "in").map(lit): _*))).cast("double")
    val avgWordLen = (nChars - (nWords - 1.0)) / nWords
    val score =
      least(nWords / 100.0, lit(1.0)) * 0.4 +
        when(avgWordLen.between(3.0, 8.0), 0.3).otherwise(0.0) +
        least(stopHits / 5.0, lit(1.0)) * 0.3
    Tables.documents(s, d).select(
      col("doc_id"),
      size(w).as("n_words"),
      avgWordLen.as("avg_word_len"),
      score.as("quality_score"))
  }
  private val q37Sql =
    """SELECT doc_id, n_words, avg_word_len,
      |  LEAST(n_words / 100.0, 1.0) * 0.4 +
      |  (CASE WHEN avg_word_len BETWEEN 3.0 AND 8.0 THEN 0.3 ELSE 0.0 END) +
      |  LEAST(stop_hits / 5.0, 1.0) * 0.3 AS quality_score
      |FROM (
      |  SELECT doc_id, len(w) AS n_words,
      |    (CAST(length(trim(text)) AS DOUBLE) - (len(w) - 1.0)) / len(w)
      |      AS avg_word_len,
      |    CAST(len(list_intersect(list_distinct(w),
      |      ['the','a','of','and','is','to','in'])) AS DOUBLE) AS stop_hits
      |  FROM (SELECT *, string_split_regex(trim(text), '\s+') AS w
      |        FROM documents) t) u""".stripMargin

  /** Token counting: whitespace tokens + a BPE-ish regex token count
    * (letter runs / digit runs / single other chars). */
  private val q38: QFn = (s, d) => {
    Tables.documents(s, d).select(
      col("doc_id"),
      size(words(col("text"))).as("ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))).as("re_tokens"))
  }
  private val q38Sql =
    """SELECT doc_id,
      |  len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
      |    AS re_tokens
      |FROM documents""".stripMargin

  /** Canonical-form document fingerprint (case-fold + whitespace
    * collapse + hash) — the key used for fuzzy-exact dedup. */
  private val q39: QFn = (s, d) => {
    Tables.documents(s, d).select(
      col("doc_id"),
      md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")
        .cast("binary")).as("fingerprint"))
  }
  private val q39Sql =
    """SELECT doc_id,
      |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
      |FROM documents""".stripMargin

  /** Corpus vocabulary profile: top-20 terms by total frequency with
    * document frequency — the pass that seeds stopword lists and
    * tokenizer vocabularies. One explode + one shuffle; top-k via
    * TakeOrderedAndProject. */
  private val q53: QFn = (s, d) => {
    Tables.documents(s, d)
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term")
      .agg(count(lit(1)).as("n_total"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_total").desc, col("term").asc)
      .limit(20)
  }
  private val q53Sql =
    """SELECT term, COUNT(*) AS n_total, COUNT(DISTINCT doc_id) AS n_docs
      |FROM (SELECT doc_id,
      |        unnest(string_split_regex(trim(text), '\s+')) AS term
      |      FROM documents) t
      |WHERE length(term) > 0
      |GROUP BY term
      |ORDER BY n_total DESC, term ASC
      |LIMIT 20""".stripMargin

  /** Per-(lang, source) corpus profile with a deterministic sample:
    * doc count, exact mean length, and the 3 lowest doc ids. The
    * sample is emitted as a comma-joined STRING (not an array) so the
    * result is sortable/hashable by any downstream pandas-style
    * comparator. */
  private val q54: QFn = (s, d) => {
    Tables.documents(s, d)
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        graft.util.Exact.davg(col("n_chars").cast("double")).as("avg_chars"),
        concat_ws(",",
          slice(sort_array(collect_list(col("doc_id"))), 1, 3)).as("sample_ids"))
  }
  private val q54Sql =
    s"""SELECT lang, source, COUNT(*) AS n_docs,
       |  ${graft.util.Exact.sqlAvg("CAST(n_chars AS DOUBLE)")} AS avg_chars,
       |  array_to_string((list_sort(list(doc_id)))[1:3], ',') AS sample_ids
       |FROM documents GROUP BY lang, source""".stripMargin

  /** TF-IDF term scoring: top-3 terms per document (doc_id < 50) by
    * tf·ln(N/df). Ranking runs on the ROUNDED score (6 dp) with a
    * term tiebreak so both engines rank identically — ln() is the one
    * place libm implementations may differ in the last ulp. */
  private val q59: QFn = (s, d) => {
    val docs = Tables.documents(s, d)
    val n = docs.count()
    val tf = docs
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("n_t"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dft, "term")
      .withColumn("score", round(col("n_t") * log(lit(n) / col("df")), 6))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    scored.filter(col("doc_id") < 50)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("doc_id", "rnk", "term", "score")
  }
  private val q59Sql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS n_t FROM tok GROUP BY 1, 2),
      |dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT COUNT(*) AS c FROM documents)
      |SELECT doc_id, rnk, term, score FROM (
      |  SELECT doc_id, term,
      |    ROUND(n_t * ln((SELECT c FROM n) / df), 6) AS score,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY ROUND(n_t * ln((SELECT c FROM n) / df), 6) DESC,
      |               term ASC) AS rnk
      |  FROM tf JOIN dfx USING (term)
      |  WHERE doc_id < 50) t
      |WHERE rnk <= 3""".stripMargin

  /** Deterministic stratified sampling — the data-mixing primitive of
    * a training pipeline: per (lang, source) stratum, take the 5 docs
    * with the smallest md5(doc_id) (md5 is identical in every engine,
    * so the "random" sample is reproducible anywhere, and a rerun on
    * the grown corpus keeps most of the previous sample — hash-rank
    * sampling is stable under appends, unlike RAND()). One shuffle;
    * the rank filter plans WindowGroupLimit, so each partition keeps
    * only k rows per stratum before the exchange. */
  private val q61: QFn = (s, d) => {
    val w = Window.partitionBy("lang", "source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(s, d)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("lang"), col("source"), col("doc_id"), col("rk"))
  }
  private val q61Sql =
    """SELECT lang, source, doc_id, rk FROM (
      |  SELECT lang, source, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY lang, source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents) t
      |WHERE rk <= 5""".stripMargin

  /** Token packing (sequence packing): the concat-then-chunk step of
    * a pretraining pipeline — per source stream, documents are laid
    * out in doc_id order and cut into 4096-token bins; a document's
    * bin is determined by its starting offset (exclusive prefix sum
    * of whitespace token counts). The prefix sums run through
    * [[RankOps.withGroupedPrefixSum]]'s two-pass partition-offset
    * scheme, NOT a per-source window: `PARTITION BY source` with an
    * unbounded frame serializes each stream into one reducer, and a
    * 100 TB corpus with a handful of sources would put ~10 TB through
    * a single task. Here partitions hold range-disjoint (source,
    * doc_id) slices, so one source's stream packs across many tasks
    * while streams still pack independently (the semantic layout).
    * Exact integer arithmetic end-to-end. */
  private val q62: QFn = (s, d) => {
    val base = Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        size(words(col("text"))).cast("long").as("n_tokens"))
    RankOps.withGroupedPrefixSum(base, Seq("source"), Seq("doc_id"),
        valueCol = "n_tokens", sumCol = "offset")
      .withColumn("bin_id", floor(col("offset") / lit(4096)).cast("long"))
  }
  private val q62Sql =
    """SELECT source, doc_id, n_tokens,
      |  CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source
      |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND 1 PRECEDING), 0) AS BIGINT) AS offset,
      |  CAST(FLOOR(CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source
      |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND 1 PRECEDING), 0) AS BIGINT) / 4096) AS BIGINT) AS bin_id
      |FROM (
      |  SELECT source, doc_id,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
      |      AS n_tokens
      |  FROM documents) t""".stripMargin

  /** Chunk spans (the 1→N step after [[q62]]'s packing): a document
    * whose token range [offset, offset+n) crosses bin boundaries is
    * SPLIT — one row per (doc, bin) with the within-doc token range
    * that lands in that bin. This is how documents longer than the
    * context window actually reach training: explode off the packed
    * layout, no extra shuffle (the spans derive arithmetically from
    * the offsets q62 already computed). */
  private val q65: QFn = (s, d) => {
    val B = 4096L
    q62(s, d)
      .withColumn("bin_id", explode(sequence(col("bin_id"),
        floor((col("offset") + col("n_tokens") - 1) / B).cast("long"))))
      .withColumn("tok_start",
        greatest(lit(0L), col("bin_id") * B - col("offset")))
      .withColumn("tok_len",
        least(col("n_tokens"), (col("bin_id") + 1) * B - col("offset"))
          - col("tok_start"))
      .select("source", "doc_id", "bin_id", "tok_start", "tok_len")
  }
  private val q65Sql =
    // "offset" must be quoted when REFERENCED in DuckDB (reserved
    // as the LIMIT/OFFSET keyword; the bare alias in q62Sql is fine)
    s"""WITH packed AS ($q62Sql),
      |spans AS (
      |  SELECT source, doc_id, n_tokens, "offset",
      |    unnest(generate_series(bin_id,
      |      CAST(FLOOR(CAST("offset" + n_tokens - 1 AS DOUBLE) / 4096)
      |        AS BIGINT))) AS b
      |  FROM packed)
      |SELECT source, doc_id, b AS bin_id,
      |  GREATEST(0, b * 4096 - "offset") AS tok_start,
      |  LEAST(n_tokens, (b + 1) * 4096 - "offset")
      |    - GREATEST(0, b * 4096 - "offset") AS tok_len
      |FROM spans""".stripMargin

  /** Near-dup CLUSTERS: connected components over the q31 pair graph
    * — the step that turns pairwise near-dup detection into an actual
    * dedup decision (keep one representative per cluster; the
    * cluster id IS the minimum member, so `cluster_id = doc_id`
    * selects survivors). Hash-min label propagation: every doc starts
    * as its own label, each round propagates labels across edges and
    * keeps the per-doc minimum, until a fixpoint. Rounds needed =
    * graph diameter — near-dup clusters are short chains in practice
    * (and each round is ONE shuffle join over the edge list, labels
    * cached, O(E) per round; for adversarial diameters the
    * two-phase star-contraction variant converges in O(log²) rounds,
    * same per-round shape). The DuckDB oracle is a recursive-CTE
    * transitive closure — a completely different algorithm reaching
    * the same fixpoint, so the hash-match is a strong equivalence
    * check. */
  private val q66: QFn = (s, d) =>
    clusterLabels(Tables.documents(s, d), q31(s, d))

  /** Hash-min connected-component labels over a near-dup pair set:
    * (doc_id, cluster_id = component min) for every doc in `docs` —
    * singletons label themselves. The q66 engine as a reusable
    * primitive (the leakage-guarded splitter below keys on it). */
  private[graft] def clusterLabels(docs0: DataFrame,
      pairs0: DataFrame): DataFrame = {
    val docs = docs0.select("doc_id")
    // cache the pair set BEFORE deriving both edge directions — the
    // union reads `pairs` twice, and uncached that runs the whole
    // PPJoin + verify once per branch
    val pairs = pairs0.select("doc_a", "doc_b").cache()
    // eager: both union branches must hit the cache (and the pair
    // build is phase-accounted apart from the CC rounds)
    graft.util.PhaseTimer.time("cc_pairs")(pairs.count())
    // localCheckpoint BREAKS THE LINEAGE, not just the physical plan:
    // every round's DataFrame references the previous round's LOGICAL
    // tree several times, so without truncation Catalyst re-analyzes
    // an exponentially growing plan each round (caching only reuses
    // the physical data). The checkpointed edge list is flat longs —
    // cheap to materialize.
    val edges = pairs.toDF("src", "dst")
      .union(pairs.select(col("doc_b"), col("doc_a")))
      .cutLineage()
    pairs.unpersist()
    // Only edge-touched docs can ever leave their own label — iterate
    // over the edge-INDUCED vertex set (near-dup pairs are a sliver of
    // any real corpus) and left-join the result back at the end, so
    // each round's join + min-aggregate run over |E|-sized inputs, not
    // the whole document table.
    //
    // convergence via the label-sum: labels only ever DECREASE (min
    // propagation), so the exact decimal sum is unchanged iff no
    // label moved — one aggregate per round instead of a join+count
    def lblSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("lbl").cast("decimal(38,0)"))).head.getDecimal(0)
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("lbl")).cutLineage()
    var prevSum = lblSum(labels)
    var converged = prevSum == null // no edges → nothing to propagate
    var rounds = 0
    graft.util.PhaseTimer.time("cc_rounds") {
      while (!converged && rounds < 25) {
        val prop = edges
          .join(labels.withColumnRenamed("doc_id", "src"), "src")
          .select(col("dst").as("doc_id"), col("lbl"))
        // localCheckpoint, not cache: constant-size plan every round
        val next = labels.union(prop)
          .groupBy("doc_id").agg(min("lbl").as("lbl")).cutLineage()
        val s = lblSum(next)
        converged = s.compareTo(prevSum) == 0
        prevSum = s
        labels = next
        rounds += 1
      }
    }
    docs.join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lbl"), col("doc_id")).as("cluster_id"))
  }
  private val q66Sql =
    s"""WITH RECURSIVE
      |pairs AS ($q31Sql),
      |edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL
      |  SELECT doc_b, doc_a FROM pairs),
      |reach(a, b) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
      |SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a""".stripMargin

  /** q207: LANG × SOURCE standardized residuals — the per-cell view
    * q140's chi-square collapses into one number: Pearson residual
    * (obs − exp)/√exp per contingency cell, flagging WHICH stream is
    * over/under-delivering which language (the corpus-intake QA
    * board). One joint aggregate, two broadcast margins, one
    * broadcast scalar; residual one fixed IEEE expression at 6 dp;
    * hash-exact. */
  private val q207: QFn = (s, d) => {
    val joint = Tables.documents(s, d)
      .groupBy("lang", "source").agg(count(lit(1)).as("c"))
    val ml = joint.groupBy("lang").agg(sum(col("c")).as("cl"))
    val ms = joint.groupBy("source").agg(sum(col("c")).as("cs"))
    val nRow = joint.agg(sum(col("c")).cast("double").as("n"))
    val e = col("cl").cast("double") * col("cs").cast("double") / col("n")
    joint.join(broadcast(ml), Seq("lang"))
      .join(broadcast(ms), Seq("source"))
      .crossJoin(broadcast(nRow))
      .select(col("lang"), col("source"), col("c").as("observed"),
        round(e, 6).as("expected"),
        round((col("c").cast("double") - e) / sqrt(e), 6)
          .as("residual"))
  }
  private val q207Sql =
    """WITH joint AS (
      |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM documents GROUP BY 1, 2),
      |ml AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS cl
      |  FROM joint GROUP BY 1),
      |ms AS (SELECT source, CAST(SUM(c) AS BIGINT) AS cs
      |  FROM joint GROUP BY 1),
      |nn AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM joint)
      |SELECT lang, source, c AS observed,
      |  ROUND(CAST(cl AS DOUBLE) * CAST(cs AS DOUBLE) / n, 6)
      |    AS expected,
      |  ROUND((CAST(c AS DOUBLE)
      |      - CAST(cl AS DOUBLE) * CAST(cs AS DOUBLE) / n)
      |    / SQRT(CAST(cl AS DOUBLE) * CAST(cs AS DOUBLE) / n), 6)
      |    AS residual
      |FROM joint JOIN ml USING (lang) JOIN ms USING (source)
      |CROSS JOIN nn""".stripMargin

  /** q210: NEAR-DUP CLUSTER-SIZE DISTRIBUTION — the curation health
    * histogram over q66's connected components (how much of the
    * corpus sits in 2-doc near-pairs vs 50-doc crawl storms —
    * dedup's impact report). Reuses [[clusterLabels]] (hash-min CC
    * over the PPJoin pair set, O(E)-sized rounds); the histogram is
    * two tiny aggregates over labels. Hash-exact via q66's
    * recursive-CTE oracle extended with the same rollup. */
  private val q210: QFn = (s, d) =>
    clusterLabels(Tables.documents(s, d), q31(s, d))
      .groupBy("cluster_id").agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("sz")).as("n_docs"))
      .orderBy("cluster_size")
  private val q210Sql =
    s"""WITH RECURSIVE
      |pairs AS ($q31Sql),
      |edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL
      |  SELECT doc_b, doc_a FROM pairs),
      |reach(a, b) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
      |labels AS (
      |  SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
      |sizes AS (
      |  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS sz
      |  FROM labels GROUP BY 1)
      |SELECT sz AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
      |  CAST(SUM(sz) AS BIGINT) AS n_docs
      |FROM sizes GROUP BY 1 ORDER BY cluster_size""".stripMargin

  /** q213: NEAR-DUP RATE per source — which stream is re-crawling
    * itself: docs in non-singleton q66 clusters as a share of each
    * source's docs (q210's histogram projected onto the intake
    * dimension; together they answer "how big" and "whose fault").
    * Labels + sizes reuse [[clusterLabels]]; the rollup is one
    * source-keyed aggregate after a doc-keyed join. Hash-exact via
    * the recursive-CTE oracle. */
  private val q213: QFn = (s, d) => {
    val docs = Tables.documents(s, d)
    val labels = clusterLabels(docs, q31(s, d))
    val sizes = labels.groupBy("cluster_id")
      .agg(count(lit(1)).as("sz"))
    docs.select("doc_id", "source")
      .join(labels, Seq("doc_id"))
      .join(sizes, Seq("cluster_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("sz") > 1L, 1L).otherwise(0L)).as("n_dup"))
      .select(col("source"), col("n_docs"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_docs").cast("double"),
          6).as("dup_rate"))
      .orderBy("source")
  }
  private val q213Sql =
    s"""WITH RECURSIVE
      |pairs AS ($q31Sql),
      |edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL
      |  SELECT doc_b, doc_a FROM pairs),
      |reach(a, b) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
      |labels AS (
      |  SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
      |sizes AS (
      |  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS sz
      |  FROM labels GROUP BY 1)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_dup,
      |  ROUND(CAST(SUM(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate
      |FROM documents
      |JOIN labels USING (doc_id)
      |JOIN sizes USING (cluster_id)
      |GROUP BY source ORDER BY source""".stripMargin

  /** q217: FLESCH-STYLE READABILITY per source — 206.835 −
    * 1.015·(words/sentences) − 84.6·(syllables/words), with the
    * standard proxies (sentences = terminator runs, floored at 1 per
    * doc; syllables = vowel groups): the classic text-quality lens
    * q37's heuristics and q157's Gopher rules don't carry. Pure
    * map-side integer counts per doc, per-source exact sums, one
    * fixed IEEE expression at 6 dp. Hash-exact. */
  private val q217: QFn = (s, d) => {
    val doc = Tables.documents(s, d).select(col("source"),
      size(filter(words(col("text")), w => length(w) > 0))
        .cast("long").as("n_words"),
      greatest(size(regexp_extract_all(col("text"),
        lit("[.!?]+"), lit(0))).cast("long"), lit(1L)).as("n_sents"),
      size(regexp_extract_all(lower(col("text")),
        lit("[aeiouy]+"), lit(0))).cast("long").as("n_syll"))
    doc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("words"),
        sum(col("n_sents")).as("sentences"),
        sum(col("n_syll")).as("syllables"))
      .select(col("source"), col("n_docs"), col("words"),
        col("sentences"), col("syllables"),
        round(lit(206.835) -
          lit(1.015) * (col("words").cast("double") /
            col("sentences").cast("double")) -
          lit(84.6) * (col("syllables").cast("double") /
            col("words").cast("double")), 6).as("flesch"))
      .orderBy("source")
  }
  private val q217Sql =
    """WITH doc AS (
      |  SELECT source,
      |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
      |      w -> len(w) > 0)) AS BIGINT) AS n_words,
      |    GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+'))
      |      AS BIGINT), 1) AS n_sents,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
      |      AS BIGINT) AS n_syll
      |  FROM documents)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_words) AS BIGINT) AS words,
      |  CAST(SUM(n_sents) AS BIGINT) AS sentences,
      |  CAST(SUM(n_syll) AS BIGINT) AS syllables,
      |  ROUND(206.835
      |    - 1.015 * (CAST(SUM(n_words) AS DOUBLE)
      |      / CAST(SUM(n_sents) AS DOUBLE))
      |    - 84.6 * (CAST(SUM(n_syll) AS DOUBLE)
      |      / CAST(SUM(n_words) AS DOUBLE)), 6) AS flesch
      |FROM doc GROUP BY source ORDER BY source""".stripMargin

  /** q219: VOCABULARY GROWTH CURVE — distinct terms accumulated at
    * 10%,…,100% of the corpus in doc_id order (the empirical Heaps
    * curve q152 fits a β to; the "is more crawl still buying new
    * vocabulary" planning readout). Scale shape: first occurrence =
    * one (term → min doc_id) aggregate (vocabulary-sized), the
    * checkpoint grid is 10 broadcast rows, the curve = one 10-way
    * fanout of the first-occurrence table. Hash-exact. */
  private val q219: QFn = (s, d) => {
    val docs = Tables.documents(s, d)
    val first = docs
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(min(col("doc_id")).as("first_doc"))
    val grid = docs.agg(max(col("doc_id")).as("max_id"))
      .select(explode(sequence(lit(1), lit(10))).as("decile"),
        col("max_id"))
      .select(col("decile"),
        floor(col("max_id") * col("decile") / 10).as("ceiling_doc"))
    first.crossJoin(broadcast(grid))
      .filter(col("first_doc") <= col("ceiling_doc"))
      .groupBy("decile", "ceiling_doc")
      .agg(count(lit(1)).as("vocab"))
      .orderBy("decile")
  }
  private val q219Sql =
    """WITH first AS (
      |  SELECT term, MIN(doc_id) AS first_doc
      |  FROM (SELECT doc_id,
      |          unnest(string_split_regex(trim(text), '\s+')) AS term
      |        FROM documents) t
      |  WHERE len(term) > 0 GROUP BY 1),
      |grid AS (
      |  SELECT CAST(i AS BIGINT) AS decile,
      |    CAST(FLOOR(m.max_id * i / 10) AS BIGINT) AS ceiling_doc
      |  FROM range(1, 11) r(i)
      |  CROSS JOIN (SELECT MAX(doc_id) AS max_id FROM documents) m)
      |SELECT decile, ceiling_doc, CAST(COUNT(*) AS BIGINT) AS vocab
      |FROM first CROSS JOIN grid
      |WHERE first_doc <= ceiling_doc
      |GROUP BY 1, 2 ORDER BY decile""".stripMargin

  /** Weighted deterministic sampling — the data-mixing knob: each
    * language keeps a target fraction of its documents, decided by a
    * hash threshold instead of RAND() (md5 is identical in every
    * engine, so the sample is reproducible anywhere and stable under
    * corpus appends). A doc survives iff the first 16 bits of
    * md5(doc_id), read as hex text, sort below the language's
    * threshold (hex strings compare exactly like the numbers they
    * encode): en 90% (0xe666), de/es/fr 50% (0x8000), rest 25%
    * (0x4000). Pure map-side filter — no shuffle, no state, scales
    * linearly. */
  private val q67: QFn = (s, d) => {
    val threshold = when(col("lang") === "en", "e666")
      .when(col("lang").isin("de", "es", "fr"), "8000")
      .otherwise("4000")
    Tables.documents(s, d)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 4) < threshold)
      .select("doc_id", "lang", "source")
  }
  private val q67Sql =
    """SELECT doc_id, lang, source FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
      |  CASE WHEN lang = 'en' THEN 'e666'
      |       WHEN lang IN ('de', 'es', 'fr') THEN '8000'
      |       ELSE '4000' END""".stripMargin

  /** Mixing-ratio planner + sampler: give every source an EQUAL token
    * share of the output corpus. Per-source keep rate = (T/S) / T_s
    * clamped to 1 (T = corpus tokens, S = sources, T_s = the source's
    * tokens), then the same deterministic md5-threshold keep rule as
    * q67 — the rate maps to a 16-bit hex threshold and a doc survives
    * iff its hash prefix sorts below it. The plan is two cheap
    * aggregates (token totals — map-side partial agg) + a broadcast
    * join + a map-side filter; nothing data-sized moves. Both engines
    * compute the rate with the same two IEEE double divisions and the
    * same floor, so the thresholds — and the sample — are identical. */
  private val q68: QFn = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(words(col("text"))).cast("long").as("n_tokens"))
    val perSrc = toks.groupBy("source")
      .agg(sum(col("n_tokens")).as("src_tokens"))
    val totals = perSrc.agg(sum(col("src_tokens")).as("total"),
      count(lit(1)).as("nsrc"))
    val rates = perSrc.crossJoin(broadcast(totals))
      .withColumn("rate",
        least(lit(1.0), (col("total") / col("nsrc")) / col("src_tokens")))
      .select(col("source"), col("rate"))
    toks.join(broadcast(rates), "source")
      .filter(keepByRate(col("doc_id"), col("rate")))
      .select("doc_id", "source", "n_tokens")
  }
  private val q68Sql =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
      |      AS n_tokens
      |  FROM documents),
      |ps AS (
      |  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
      |  FROM toks GROUP BY source),
      |tot AS (
      |  SELECT CAST(SUM(src_tokens) AS BIGINT) AS total,
      |         COUNT(*) AS nsrc
      |  FROM ps),
      |rates AS (
      |  SELECT source,
      |    LEAST(1.0, (total / nsrc) / src_tokens) AS rate
      |  FROM ps, tot)
      |SELECT t.doc_id, t.source, t.n_tokens
      |FROM toks t JOIN rates r USING (source)
      |WHERE r.rate >= 1.0 OR
      |  substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 4) <
      |    printf('%04x', CAST(FLOOR(r.rate * 65536) AS BIGINT))""".stripMargin

  /** q66's clusters through STAR CONTRACTION (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond") — the
    * scale-canonical alternative to hash-min propagation: alternating
    * large-star (hook every neighbor larger than the center to the
    * center's minimum) and small-star (hook the not-larger neighbors
    * and the center itself) rounds contract chains exponentially, so
    * convergence is O(log² n) rounds on ANY graph shape — where
    * hash-min needs one round per hop of the cluster diameter. Each
    * round is one groupBy over the (bidirectional) edge list. Output
    * ≡ q66 (shares its oracle): every doc labeled with its
    * component's minimum member. */
  private val q69: QFn = (s, d) => {
    val docs = Tables.documents(s, d).select("doc_id")
    val pairs = q31(s, d).select("doc_a", "doc_b")
    // invariant: edges are directed child→parent, u > v strictly.
    // Each frame is localCheckpoint'd: a round's plan references its
    // inputs many times (bidir twice via the union, large three
    // times), so without a LINEAGE break Catalyst re-analyzes an
    // exponentially growing logical tree every round — measured as
    // the dominant cost of this loop long before any executor works.
    var edges = graft.util.PhaseTimer.time("cc_pairs") {
      pairs
        .select(greatest(col("doc_a"), col("doc_b")).as("u"),
          least(col("doc_a"), col("doc_b")).as("v"))
        .distinct().cutLineage()
    }
    var converged = edges.isEmpty
    var rounds = 0
    graft.util.PhaseTimer.time("cc_rounds") { while (!converged && rounds < 15) {
      // large-star: around each center c, hook every STRICTLY larger
      // neighbor to m = min(Γ(c) ∪ {c})
      val bidir = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val minsL = bidir.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
      val large = bidir.filter(col("v") > col("u")).join(minsL, "u")
        .select(col("v").as("u"), col("m").as("v")).distinct()
        .cutLineage() // feeds minsS AND the small-star join
      // small-star: around each center c (over the child→parent
      // edges, so Γ⁻(c) = its parents, all < c), hook the parents and
      // c itself to m = min(Γ⁻(c)); u > v holds in `large`, so
      // min(v) < u and m needs no least(·, u)
      val minsS = large.groupBy("u").agg(min(col("v")).as("m"))
      val small = large.join(minsS, "u")
        .select(col("v").as("a"), col("m").as("b"))
        .union(minsS.select(col("u").as("a"), col("m").as("b")))
        .toDF("u", "v")
        .filter(col("u") =!= col("v")) // (m, m) self-hooks
        .distinct().cutLineage()
      converged = small.count() == edges.count() &&
        small.exceptAll(edges).isEmpty
      edges = small
      rounds += 1
    } }
    // fixpoint = star forest: every non-root points at its component
    // min; roots and singletons label themselves
    val labels = edges.groupBy("u").agg(min(col("v")).as("lbl"))
      .withColumnRenamed("u", "doc_id")
    docs.join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lbl"), col("doc_id")).as("cluster_id"))
  }

  /** Incremental dedup against a historical corpus — the
    * daily-crawl-vs-100TB shape: return the incoming docs whose
    * canonical fingerprint (q39's case-fold + whitespace-collapse
    * md5, hashed to 64 bits) does not already exist in `history`.
    * The history side reduces to ONE long column before anything
    * moves, and the bloom pre-filter means bloom-negative incoming
    * rows — almost all of a fresh crawl — skip the anti-join shuffle
    * entirely. (64-bit content hashing: a truly-new doc is wrongly
    * dropped only on an xxhash64 collision, ~n²/2⁶⁴ — the standard
    * dedup bargain.) Both inputs need (doc_id, text). */
  def dedupAgainstHistory(history: DataFrame, incoming: DataFrame): DataFrame = {
    def withFp(df: DataFrame, as: String) = df.withColumn(as,
      xxhash64(md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")
        .cast("binary"))))
    val hist = withFp(history, "fp_hist").select("fp_hist")
    JoinOps.bloomAntiJoin(withFp(incoming, "fp_inc"), hist,
      "fp_inc", "fp_hist")
      .drop("fp_inc")
  }

  /** NEAR-dup dedup of an incoming batch against a historical corpus —
    * the daily-crawl shape at trigram-Jaccard granularity
    * ([[dedupAgainstHistory]] catches only EXACT re-crawls; a crawler
    * re-fetching a page with a changed footer needs this one).
    *
    * `historyPostings` is a PRE-BUILT postings table
    * (`hist_id, nb, gram` — the [[gramHashes]] layout): at 100 TB the
    * corpus postings are maintained incrementally alongside the corpus
    * (append per load through the versioned table), never rebuilt per
    * batch — only the incoming batch is shingled here (map-only native
    * `trigram_hashes`).
    *
    * ONE-SIDED prefix filter (PPJoin indexes one side; soundness needs
    * no coordination with the probe side): a qualifying pair within
    * the size band nb ≥ t·na needs overlap ≥ ⌈t/(1+t)·(na+nb)⌉ ≥
    * ⌈t·na⌉, and an incoming doc's suffix beyond its ⌊(1−t)·na⌋+1
    * ranked grams holds < t·na grams — so every qualifying history
    * match collides with the PREFIX. Prefix grams are ranked by
    * HISTORY document frequency (unseen grams rank first), so probe
    * buckets are the rare grams; frequent-gram buckets never see the
    * incoming suffix. Survivor pairs get the exact-Jaccard verify
    * against the full postings. Returns the incoming docs with NO
    * history near-dup at threshold `t` (≥ 0.5 for prefix soundness). */
  def nearDupAgainstHistory(historyPostings: DataFrame, incoming: DataFrame,
      t: Double = 0.5, gramDf: Option[DataFrame] = None): DataFrame = {
    require(t >= 0.5 && t < 1.0, s"prefix bound needs t in [0.5, 1), got $t")
    val hp = historyPostings.toDF("hist_id", "nb", "gram")
    // the rarity ranking is a bucket-size HEURISTIC — the prefix
    // filter is sound under ANY fixed gram order — so the df table can
    // come from an incrementally-maintained (gram, df) view instead of
    // this O(history) aggregate: the curation tick folds each batch's
    // postings into a MaterializedAgg and passes it here, making the
    // per-tick cost follow the batch. (A slightly stale or inflated df
    // only perturbs candidate volume, never the survivor set.)
    val hdf = gramDf.map(_.toDF("gram", "df"))
      .getOrElse(hp.groupBy("gram").agg(count(lit(1)).as("df")))
    val ip = incoming
      .select(col("doc_id"),
        graft.functions.GraftFunctions.trigramHashes(words(col("text")))
          .as("grams"))
      .select(col("doc_id"), size(col("grams")).as("na"),
        explode(col("grams")).as("gram"))
    val prefix = ip.join(hdf, Seq("gram"), "left")
      .select(col("doc_id"), col("na"), col("gram"),
        coalesce(col("df"), lit(0L)).as("df"))
      .groupBy("doc_id", "na")
      .agg(collect_list(struct(col("df"), col("gram"))).as("ranked"))
      .select(col("doc_id"), col("na"), explode(expr(
        s"slice(array_sort(ranked), 1, " +
          s"cast(floor(na * ${1 - t}) + 1 as int))")).as("r"))
      .select(col("doc_id"), col("na"), col("r.gram").as("gram"))
    val cand = prefix.join(hp, Seq("gram"))
      .filter(col("nb") >= col("na") * t && col("nb") <= col("na") / t)
      .select("doc_id", "hist_id").distinct()
    val matched = cand
      .join(ip.select(col("doc_id"), col("na"), col("gram")), Seq("doc_id"))
      .join(hp, Seq("hist_id", "gram"))
      .groupBy("doc_id", "hist_id", "na", "nb")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared").cast("double") /
        (col("na") + col("nb") - col("shared")) >= t)
      .select("doc_id").distinct()
    incoming.join(matched, Seq("doc_id"), "left_anti")
  }

  /** Greedy WITHIN-batch near-dup drop: remove every doc that has a
    * near-dup (trigram Jaccard ≥ t) with a SMALLER doc_id in the same
    * set — the standard greedy batch-dedup policy (deterministic, one
    * pass over the [[nearDupPairs]] output; for full
    * connected-component survivor selection over a whole corpus see
    * q66/q69 — on a transitive chain the greedy drop can remove a doc
    * whose smaller neighbor was itself removed, which is the accepted
    * bargain for a single-pass batch step). */
  def dropNearDupsWithinBatch(docs: DataFrame, t: Double = 0.5): DataFrame = {
    val postings = docs
      .select(col("doc_id"),
        graft.functions.GraftFunctions.trigramHashes(words(col("text")))
          .as("grams"))
      .select(col("doc_id"), size(col("grams")).as("n_grams"),
        explode(col("grams")).as("gram"))
    val losers = nearDupPairs(postings, t)
      .select(col("doc_b").as("doc_id")).distinct()
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Deterministic TRAIN/VAL/TEST corpus split with a NEAR-DUP
    * LEAKAGE guard: near-duplicate documents must land in the SAME
    * split — a test doc with a train near-twin leaks evaluation
    * signal straight into training — so the split key is the doc's
    * near-dup CLUSTER id ([[clusterLabels]], the q66 hash-min CC over
    * the PPJoin pair set), never the doc id. The md5-threshold rule
    * on the cluster id makes the split append-stable like every
    * sampler here: re-splitting a grown corpus keeps prior
    * assignments wherever clusters did not merge. Adds `split`
    * (train/val/test) and keeps `cluster_id` for audit. Scale shape:
    * the pair mining is the banded PPJoin (bounded candidates), the
    * CC loop runs on the edge-induced sliver, and the split decision
    * is map-side. */
  def splitByCluster(docs: DataFrame, t: Double = 0.5,
      valFrac: Double = 0.1, testFrac: Double = 0.1): DataFrame = {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac < 1.0,
      s"bad split fractions: val=$valFrac test=$testFrac")
    val postings = docs
      .select(col("doc_id"),
        graft.functions.GraftFunctions.trigramHashes(words(col("text")))
          .as("grams"))
      .select(col("doc_id"), size(col("grams")).as("n_grams"),
        explode(col("grams")).as("gram"))
    val labels = clusterLabels(docs, nearDupPairs(postings, t))
    def hex(x: Double) =
      f"${math.min(65535L, (x * 65536).toLong)}%04x"
    val h = substring(md5(col("cluster_id").cast("string")), 1, 4)
    docs.join(labels, Seq("doc_id"))
      .withColumn("split",
        when(h < lit(hex(testFrac)), "test")
          .when(h < lit(hex(testFrac + valFrac)), "val")
          .otherwise("train"))
  }

  /** Build the [[nearDupAgainstHistory]] postings layout
    * (`hist_id, nb, gram`) from a (doc_id, text) corpus — what a
    * 100 TB deployment materializes once and appends to per load. */
  def historyPostings(history: DataFrame): DataFrame =
    history
      .select(col("doc_id").as("hist_id"),
        graft.functions.GraftFunctions.trigramHashes(words(col("text")))
          .as("grams"))
      .select(col("hist_id"), size(col("grams")).as("nb"),
        explode(col("grams")).as("gram"))

  /** Benchmark DECONTAMINATION — flag training docs that share any
    * word trigram with a held-out benchmark/eval set (every 50th doc
    * stands in for the benchmark corpus here). The shape that matters
    * at 100 TB: benchmark corpora are small by construction, so the
    * benchmark gram set BROADCASTS; the corpus side reuses the same
    * map-only native `trigram_hashes` postings the near-dup family
    * shares (memoized — q31/q32/q76 build them once), and the only
    * shuffle is the per-doc aggregate of the few colliding rows.
    * Output: contaminated docs with the count and fraction of their
    * grams that appear in the benchmark (downstream drops or audits
    * by `shared_frac`). */
  private val q76: QFn = (s, d) => {
    val e = gramHashes(s, d) // (doc_id, n_grams, gram) — distinct per doc
    val bench = e.filter(col("doc_id") % 50 === 0).select("gram").distinct()
    e.filter(col("doc_id") % 50 =!= 0)
      .join(broadcast(bench), Seq("gram"))
      .groupBy(col("doc_id"), col("n_grams"))
      .agg(count(lit(1)).as("n_shared")) // grams are distinct per doc
      .select(col("doc_id"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_grams").cast("double"))
          .as("shared_frac"))
  }
  private val q76Sql =
    """WITH gl AS (
      |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |          for i in range(1, len(w)-1)]) AS grams
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      |        FROM documents) t),
      |g AS (SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram
      |      FROM gl),
      |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
      |SELECT g.doc_id, COUNT(*) AS n_shared,
      |  CAST(COUNT(*) AS DOUBLE) / n_grams AS shared_frac
      |FROM g JOIN bench USING (gram)
      |WHERE g.doc_id % 50 <> 0
      |GROUP BY g.doc_id, n_grams""".stripMargin

  /** Within-document repetition scoring (Gopher-style boilerplate
    * signals): duplicate-word and duplicate-trigram fractions. The
    * near-dup family (q31/q32/q43) finds CROSS-doc duplication; this
    * finds SELF-repetition — templated/boilerplate text whose shingles
    * mostly repeat — which near-dup pair mining never surfaces. Pure
    * in-row array math (split / array_distinct / size), map-only: no
    * shuffle at any scale. */
  private val q77: QFn = (s, d) => {
    val w = words(col("text"))
    val n = size(w)
    val totalTri = n - 2
    Tables.documents(s, d).select(
      col("doc_id"),
      n.as("n_words"),
      (lit(1.0) - size(array_distinct(w)).cast("double") / n.cast("double"))
        .as("dup_word_frac"),
      when(n >= 3,
        lit(1.0) - size(trigrams(col("text"))).cast("double")
          / totalTri.cast("double"))
        .otherwise(lit(0.0)).as("dup_tri_frac"))
  }
  private val q77Sql =
    """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      |           FROM documents)
      |SELECT doc_id, len(w) AS n_words,
      |  1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w)
      |    AS dup_word_frac,
      |  CASE WHEN len(w) >= 3 THEN
      |    1.0 - CAST(len(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |            for i in range(1, len(w)-1)])) AS DOUBLE) / (len(w) - 2)
      |  ELSE 0.0 END AS dup_tri_frac
      |FROM t""".stripMargin

  /** Canonical text normalization through the native `normalize_text`
    * expression (trim + Unicode lower + whitespace collapse + NFD
    * accent strip — the canonical form dedup fingerprints and
    * cross-source matching key on). Map-only; the oracle is DuckDB's
    * equivalent `strip_accents(lower(trim(regexp_replace(...))))`
    * chain, so the two engines' Unicode pipelines are pinned equal on
    * the corpus (the accent path itself is spec-pinned on synthetic
    * docs — the test corpus is ASCII). */
  private val q80: QFn = (s, d) => {
    Tables.documents(s, d).select(col("doc_id"),
      graft.functions.GraftFunctions.normalizeText(col("text")).as("norm"))
  }
  private val q80Sql =
    """SELECT doc_id,
      |  strip_accents(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
      |    AS norm
      |FROM documents""".stripMargin

  /** Duplicated-SPAN detection (the ExactSubstr dedup signal of Lee et
    * al. 2022, at word-8-gram granularity): for every document, the
    * count and fraction of its POSITIONAL word 8-grams that also occur
    * in at least one other document. Cross-doc near-dup mining (q31/
    * q32) finds whole-document pairs; this finds the duplicated
    * REGIONS — boilerplate headers, license blocks, templated spans —
    * inside otherwise-distinct documents, which is what substring-level
    * dedup actually removes at training time.
    *
    * Shape at 100 TB: the span stream is a map-side explode (positional
    * grams, ~1 row per token); duplicate grams come from one gram-keyed
    * aggregate, the per-doc hit counts from a gram-keyed semi join +
    * doc-keyed aggregate. Two passes over the exploded stream — caching
    * it would pin 8× the corpus in memory (the round-4 PIECES finding:
    * array/string caches cost far more than recompute), so recomputing
    * the explode is the cheaper side of the bargain at every scale. */
  private val q82: QFn = (s, d) => {
    val w = words(col("text"))
    val docs = Tables.documents(s, d).select(col("doc_id"),
      greatest(size(w) - 7, lit(0)).cast("long").as("n_spans"), w.as("w"))
    def spans(df: DataFrame): DataFrame = df.filter(col("n_spans") > 0)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1L), col("n_spans")),
        i => concat_ws(" ", slice(col("w"), i, lit(8))))).as("gram"))
    val g = spans(docs)
    val dup = g.groupBy("gram").agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= 2).select("gram")
    val hits = spans(docs).join(dup, Seq("gram"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup_spans"))
    docs.select("doc_id", "n_spans")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        when(col("n_spans") > 0,
          coalesce(col("n_dup_spans"), lit(0L)).cast("double")
            / col("n_spans").cast("double"))
          .otherwise(lit(0.0)).as("dup_frac"))
  }
  private val q82Sql =
    """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      |           FROM documents),
      |d AS (SELECT doc_id, GREATEST(len(w)-7, 0) AS n_spans, w FROM t),
      |g AS (SELECT doc_id, array_to_string(list_slice(w, i, i+7), ' ') AS gram
      |      FROM (SELECT doc_id, w,
      |              unnest(range(1, GREATEST(len(w)-7,0)+1)) AS i FROM d)),
      |dup AS (SELECT gram FROM g GROUP BY gram
      |        HAVING COUNT(DISTINCT doc_id) >= 2),
      |hits AS (SELECT doc_id, COUNT(*) AS n_dup FROM g
      |         JOIN dup USING(gram) GROUP BY doc_id)
      |SELECT d.doc_id, d.n_spans,
      |  COALESCE(hits.n_dup, 0) AS n_dup_spans,
      |  CASE WHEN d.n_spans > 0
      |    THEN CAST(COALESCE(hits.n_dup,0) AS DOUBLE)/d.n_spans
      |    ELSE 0.0 END AS dup_frac
      |FROM d LEFT JOIN hits USING(doc_id)""".stripMargin

  /** Token-rarity profile — the unigram-LM quality signal (CCNet-style
    * perplexity filtering's shape) kept INTEGER-EXACT so any engine
    * reproduces it bit-for-bit: per document, the token count, the sum
    * of each token's corpus-wide collection frequency, and the rarest
    * token's frequency. sum_cf/n_tokens is the doc's mean token
    * commonness (a float divide left to the consumer — summing ln() or
    * 1/cf doubles is accumulation-order-dependent and can never gate on
    * a cross-engine hash). Shape: one term-keyed aggregate builds the
    * vocabulary, the token stream joins it term-keyed (AQE broadcasts
    * the vocab side when it is small; at web scale both sides shuffle
    * on term — linear), then one doc-keyed aggregate. */
  private val q83: QFn = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
    val cf = toks.groupBy("term").agg(count(lit(1)).as("cf"))
    toks.join(cf, Seq("term"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("cf")).as("sum_cf"),
        min(col("cf")).as("min_cf"))
  }
  private val q83Sql =
    """WITH t AS (SELECT doc_id,
      |    unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents),
      |t2 AS (SELECT * FROM t WHERE len(term) > 0),
      |cf AS (SELECT term, COUNT(*) AS cf FROM t2 GROUP BY term)
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |  CAST(SUM(cf) AS BIGINT) AS sum_cf, MIN(cf) AS min_cf
      |FROM t2 JOIN cf USING(term) GROUP BY doc_id""".stripMargin

  /** q94: corpus-self-trained unigram LM scoring — mean token
    * surprisal −ln P(term | corpus) per document, the classic
    * "LM quality" pipeline signal (high = rare/garbled text, low =
    * stopword-heavy boilerplate; both tails get filtered). Unlike
    * q83's raw counts this is the probability-model form: P from the
    * corpus's own term frequencies, so no external model ships.
    * Shape for 100 TB: explode → per-(doc,term) tf (one shuffle,
    * map-side combine — the join input is DISTINCT pairs, not raw
    * tokens), vocab = one more agg over tf, then a term-keyed join
    * and a per-doc weighted mean. Per-token ln is rounded to 6 dp
    * (libm last-ulp differences — q59's lesson) and the weighted sum
    * runs through the exact decimal accumulator, so the mean is
    * bit-identical cross-engine. */
  private val q94: QFn = (s, d) => {
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("doc_id", "term").agg(count(lit(1)).as("n_t"))
    val vocab = tf.groupBy("term").agg(sum(col("n_t")).as("n_corpus"))
    val total = vocab.agg(sum(col("n_corpus"))).head.getLong(0)
    tf.join(vocab, Seq("term"))
      .withColumn("surp",
        round(log(lit(total.toDouble) / col("n_corpus")), 6))
      .groupBy("doc_id")
      .agg(sum(col("n_t")).as("n_tokens"),
        round(sum((col("n_t") * col("surp")).cast(graft.util.Exact.Dec))
          .cast("double") / sum(col("n_t")), 6).as("avg_surprisal"))
      .select("doc_id", "n_tokens", "avg_surprisal")
  }
  private val q94Sql =
    """WITH t AS (SELECT doc_id,
      |    unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS n_t
      |  FROM t WHERE len(term) > 0 GROUP BY 1, 2),
      |vocab AS (SELECT term, SUM(n_t) AS n_corpus FROM tf GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_corpus) AS DOUBLE) AS c FROM vocab)
      |SELECT doc_id, CAST(SUM(n_t) AS BIGINT) AS n_tokens,
      |  ROUND(CAST(SUM(CAST(n_t * ROUND(ln((SELECT c FROM tot) / n_corpus), 6)
      |      AS DECIMAL(28,6))) AS DOUBLE) / SUM(n_t), 6) AS avg_surprisal
      |FROM tf JOIN vocab USING (term)
      |GROUP BY doc_id""".stripMargin

  /** q106: DSIR importance weights (Xie et al., NeurIPS 2023 — "Data
    * Selection for Language Models via Importance Resampling", public):
    * per-document log importance weight log(p_target(x)/p_raw(x))
    * under hashed bag-of-words models — the standard
    * select-toward-a-target-distribution signal (here: target = the
    * corpus's own `lang = 'en'` slice, the "quality reference"
    * stand-in). Features are md5-bucketed unigrams (first 2 hex chars
    * → 256 buckets, STRING-keyed so neither engine parses hex — the
    * keepByRate trick); both categorical models are Laplace-smoothed
    * over the 256-bucket space, so buckets unseen in the target still
    * get finite ratios. Scale shape: explode → (doc, bucket) counts
    * (ONE data-sized shuffle, map-side combine), the two model
    * aggregates are ≤256 rows each, the log-ratio table joins back
    * BROADCAST, and the per-doc weighted sum is the second shuffle —
    * nothing else is data-sized; the models themselves are KBs
    * regardless of corpus size. Cross-engine determinism: the
    * smoothed ratio is one fixed IEEE expression on identical
    * long-derived doubles, its ln rounds to 6 dp (q59/q94's libm
    * lesson), and the per-doc weighted sum runs through the exact
    * decimal accumulator — hash-exact. */
  private val q106: QFn = (s, d) => dsirWeights(s, d)
  private def dsirWeights(s: SparkSession, d: String): DataFrame =
    dsirLogWeights(Tables.documents(s, d), targetLang = "en")

  /** q106's DSIR weight computation over ANY (doc_id, lang, text)
    * frame — the one definition the query, the CorpusPipeline
    * `dsirResample` stage, and the specs share. Docs whose text
    * tokenizes empty get no row (no features → no weight). */
  private[graft] def dsirLogWeights(docs: DataFrame,
      targetLang: String): DataFrame = {
    val tok = docs
      .select(col("doc_id"), col("lang"),
        explode(words(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
      .select(col("doc_id"), col("lang"),
        substring(md5(col("term")), 1, 2).as("b"))
    val db = tok.groupBy("doc_id", "b").agg(count(lit(1)).as("n"))
    val models = tok.groupBy("b").agg(
      count(lit(1)).as("cr"),
      count(when(col("lang") === targetLang, 1)).as("ct"))
    val t = models.agg(sum(col("cr")), sum(col("ct"))).head
    // an all-empty corpus has no features: no rows, not an NPE
    if (t.isNullAt(0)) return db.select(col("doc_id"),
      lit(0L).as("n_tokens"), lit(0.0).as("dsir_logw"))
    val (tr, tt) = (t.getLong(0).toDouble, t.getLong(1).toDouble)
    val lr = models.select(col("b"),
      round(log(((col("ct") + 1.0) / (tt + 256.0))
        / ((col("cr") + 1.0) / (tr + 256.0))), 6).as("lr"))
    db.join(broadcast(lr), Seq("b"))
      .groupBy("doc_id")
      .agg(sum(col("n")).as("n_tokens"),
        round(sum((col("n") * col("lr")).cast(graft.util.Exact.Dec))
          .cast("double"), 6).as("dsir_logw"))
      .select("doc_id", "n_tokens", "dsir_logw")
  }
  /** Shared q106 model CTE chain (everything up to the final
    * per-doc weight), reused verbatim by q112's oracle. */
  private val dsirCte =
    """WITH t AS (SELECT doc_id, lang,
      |    unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents),
      |tok AS (SELECT doc_id, lang, substr(md5(term), 1, 2) AS b
      |  FROM t WHERE len(term) > 0),
      |db AS (SELECT doc_id, b, COUNT(*) AS n FROM tok GROUP BY 1, 2),
      |models AS (SELECT b, COUNT(*) AS cr,
      |    COUNT(CASE WHEN lang = 'en' THEN 1 END) AS ct
      |  FROM tok GROUP BY 1),
      |tots AS (SELECT CAST(SUM(cr) AS DOUBLE) AS tr,
      |    CAST(SUM(ct) AS DOUBLE) AS tt FROM models),
      |lr AS (SELECT models.b,
      |    ROUND(ln(((models.ct + 1.0) / (tots.tt + 256.0))
      |           / ((models.cr + 1.0) / (tots.tr + 256.0))), 6) AS lr
      |  FROM models CROSS JOIN tots),
      |w AS (
      |  SELECT db.doc_id, CAST(SUM(db.n) AS BIGINT) AS n_tokens,
      |    ROUND(CAST(SUM(CAST(db.n * lr.lr AS DECIMAL(28,6))) AS DOUBLE), 6)
      |      AS dsir_logw
      |  FROM db JOIN lr USING (b)
      |  GROUP BY 1)""".stripMargin
  private val q106Sql = dsirCte + "\nSELECT doc_id, n_tokens, dsir_logw FROM w"

  /** q112: DSIR importance RESAMPLING — the selection stage that
    * completes q106's pipeline (weights → resample): each document is
    * kept with probability min(1, p_target(x)/p_raw(x)) = min(1,
    * exp(dsir_logw)) — clipped importance sampling, so the kept set's
    * feature distribution moves toward the target. Deterministic and
    * append-stable via the shared md5-threshold rule (`keepByRate`,
    * one definition with q61/q67/q99): re-crawled docs keep or drop
    * identically, and the decision is MAP-SIDE once the ≤256-row
    * weight model is joined (q106's shape — nothing data-sized moves
    * beyond the two aggregates). Rate = round(exp(logw), 6) (the q59
    * libm discipline); the 16-bit threshold is then identical fixed
    * arithmetic in both engines — hash-exact sample. */
  private val q112: QFn = (s, d) => {
    dsirWeights(s, d)
      .withColumn("rate", least(lit(1.0), round(exp(col("dsir_logw")), 6)))
      .filter(keepByRate(col("doc_id"), col("rate")))
      .select("doc_id", "n_tokens", "dsir_logw")
  }
  private val q112Sql = dsirCte +
    """
      |SELECT doc_id, n_tokens, dsir_logw
      |FROM (SELECT w.*,
      |    LEAST(1.0, ROUND(EXP(dsir_logw), 6)) AS rate FROM w) r
      |WHERE r.rate >= 1.0 OR
      |  substr(md5(CAST(r.doc_id AS VARCHAR)), 1, 4) <
      |    printf('%04x', CAST(FLOOR(r.rate * 65536) AS BIGINT))""".stripMargin

  /** q99: TEMPERATURE-weighted source mixing — the α-smoothed
    * sampling standard multilingual/multi-source LLM corpora use
    * (XLM-R / mT5, α≈0.3): source i gets share p_i = n_i^α / Σ n_j^α
    * of a target budget (half the corpus here), flattening the head
    * sources and boosting the tail — q68's equal-share planner is the
    * α→0 limit, proportional sampling the α→1 limit. Rates clamp at 1
    * (a boosted tail source cannot be sampled above itself; the
    * residual shortfall is a second-pass epoch-repeat decision, not
    * this operator's). Same scale shape as q68: two map-side-partial
    * aggregates over K sources, broadcast rate join, map-side
    * deterministic md5-threshold filter — nothing data-sized moves.
    * Cross-engine determinism: n^α goes through libm pow, so it is
    * rounded to 6 dp (the q59 ln lesson) and the K-term weight sum
    * runs through the exact decimal accumulator; after that the rate
    * is one fixed IEEE expression on identical inputs in both
    * engines, so the 16-bit thresholds — and the sample — match
    * exactly. */
  private val q99: QFn = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(words(col("text"))).cast("long").as("n_tokens"))
    val perSrc = toks.groupBy("source")
      .agg(sum(col("n_tokens")).as("n"))
      .withColumn("w", round(pow(col("n").cast("double"), lit(0.3)), 6))
    val totals = perSrc.agg(sum(col("n")).as("total"),
      sum(col("w").cast(graft.util.Exact.Dec)).cast("double").as("wsum"))
    val rates = perSrc.crossJoin(broadcast(totals))
      .withColumn("rate", least(lit(1.0),
        lit(0.5) * col("total") * col("w") / col("wsum") / col("n")))
      .select(col("source"), col("rate"))
    toks.join(broadcast(rates), "source")
      .filter(keepByRate(col("doc_id"), col("rate")))
      .select("doc_id", "source", "n_tokens")
  }
  private val q99Sql =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
      |      AS n_tokens
      |  FROM documents),
      |ps AS (
      |  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS n,
      |    ROUND(POW(CAST(SUM(n_tokens) AS DOUBLE), 0.3), 6) AS w
      |  FROM toks GROUP BY source),
      |tot AS (
      |  SELECT CAST(SUM(n) AS BIGINT) AS total,
      |    CAST(SUM(CAST(w AS DECIMAL(28,6))) AS DOUBLE) AS wsum
      |  FROM ps),
      |rates AS (
      |  SELECT source,
      |    LEAST(1.0, 0.5 * total * w / wsum / n) AS rate
      |  FROM ps, tot)
      |SELECT t.doc_id, t.source, t.n_tokens
      |FROM toks t JOIN rates r USING (source)
      |WHERE r.rate >= 1.0 OR
      |  substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 4) <
      |    printf('%04x', CAST(FLOOR(r.rate * 65536) AS BIGINT))""".stripMargin

  /** q101: EDIT-DISTANCE fuzzy join — pairs of parts whose names are
    * exactly one edit apart (substitution, insertion, or deletion),
    * via the SymSpell deletion-neighborhood index (public: Garbe's
    * symmetric-delete algorithm): two strings at distance ≤1 MUST
    * share a member of their ≤1-deletion neighborhoods (substitution:
    * delete the differing position from both; indel: the deletion of
    * the inserted char IS the shorter string), so an equi-join on
    * neighborhood keys finds every candidate without the quadratic
    * all-pairs scan the oracle runs.
    *
    * Scale shape: the neighborhood explodes DISTINCT names, not rows
    * — duplicate-heavy corpora (every "red widget") would otherwise
    * square their group sizes inside each key bucket before the
    * verify could drop them. Name-level pairs verify with the codegen
    * `levenshtein`, then map back to key pairs through two joins on
    * the (broadcastable) name groups. Everything is equi-join +
    * map-side explode; candidate volume is bounded by (L+1)·distinct
    * names. */
  private val q101: QFn = (s, d) => {
    val parts = Tables.part(s, d)
      .select(col("p_partkey").as("pk"), lower(col("p_name")).as("name"))
    val names = parts.select("name").distinct()
    // i = 0 keeps the string; i = k deletes character k (1-based)
    val keys = names
      .select(col("name"), explode(sequence(lit(0), length(col("name"))))
        .as("i"))
      .select(col("name"),
        when(col("i") === 0, col("name"))
          .otherwise(concat(
            expr("substring(name, 1, i - 1)"),
            expr("substring(name, i + 1, length(name))"))).as("key"))
    val cand = keys.select(col("key"), col("name").as("na"))
      .join(keys.select(col("key"), col("name").as("nb")), Seq("key"))
      .filter(col("na") < col("nb"))
      .select("na", "nb").distinct()
      .filter(levenshtein(col("na"), col("nb")) === 1)
    val both = cand.union(cand.select(col("nb"), col("na")))
    both
      .join(parts.select(col("name").as("na"), col("pk").as("key_a")), Seq("na"))
      .join(parts.select(col("name").as("nb"), col("pk").as("key_b")), Seq("nb"))
      .filter(col("key_a") < col("key_b"))
      .select("key_a", "key_b")
  }
  private val q101Sql =
    """SELECT a.p_partkey AS key_a, b.p_partkey AS key_b
      |FROM part a JOIN part b ON a.p_partkey < b.p_partkey
      |WHERE levenshtein(lower(a.p_name), lower(b.p_name)) = 1""".stripMargin

  /** PII redaction patterns, applied in order. Order is load-bearing:
    * email first (its local part can contain digit runs), SSN before
    * phone (both are dash-separated digit shapes, and xxx-xx-xxxx
    * would otherwise be half-eaten by the phone pattern), IP before
    * the credit-card digit-run pattern. Kept to portable regex
    * constructs (classes, bounded repetition, word boundaries). */
  val piiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    // (?<!\w) not \b: a leading "(" has non-word chars on both sides,
    // so \b can never anchor the "(555) ..." form
    ("(?<!\\w)(?:\\+?1[-. ])?(?:\\(\\d{3}\\)[-. ]?|\\d{3}[-. ])\\d{3}[-. ]\\d{4}\\b",
      "<PHONE>"),
    ("\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
    ("\\b\\d(?:[ -]?\\d){12,15}\\b", "<CC>"))

  /** PII redaction over a document table: emails, SSNs, phone numbers,
    * IPv4 addresses, and credit-card digit runs replaced with typed
    * placeholder tokens, plus an `n_redactions` count column (each
    * pattern counted on the text as the PREVIOUS stages left it, so a
    * span never counts twice). Pure map-side regexp work — zero
    * shuffles at any scale — and deterministic, so redaction before
    * fingerprinting makes re-crawls that rotate dynamic PII (session
    * ids in emails, changing IPs) dedup identically. The test corpus
    * carries no PII by construction, so semantics are spec-pinned on
    * synthetic documents rather than oracle-checked. */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val (red, n) = piiPatterns.foldLeft((col(textCol), lit(0))) {
      case ((c, cnt), (p, tok)) =>
        (regexp_replace(c, p, tok), cnt + regexp_count(c, lit(p)))
    }
    docs.withColumn("n_redactions", coalesce(n, lit(0)))
      .withColumn(textCol, red)
  }

  /** Compression-ratio quality signal through the native `deflate_len`
    * expression: compressed/raw byte ratio per document — the
    * LZ77-window repetition detector (low ratio ⇒ templated/boiler-
    * plate text; ≈1 ⇒ high-entropy noise; natural prose in between)
    * that MassiveText/RefinedWeb-style pipelines gate on. Catches
    * long-range and periodic repetition that q77's fixed-width shingle
    * fractions miss. Map-only, zero shuffles at any scale. Rows-only:
    * the oracle engine has no deflate — the spec pins monotonicity
    * under repetition, determinism, and the null/empty edges. */
  private val q84: QFn = (s, d) => {
    val raw = octet_length(col("text"))
    Tables.documents(s, d).select(
      col("doc_id"), raw.as("n_bytes"),
      graft.functions.GraftFunctions.deflateLen(col("text"))
        .as("deflate_bytes"))
      .withColumn("compress_ratio",
        when(col("n_bytes") > 0,
          col("deflate_bytes").cast("double") / col("n_bytes").cast("double"))
          .otherwise(lit(1.0)))
  }

  /** Heavy hitters via count-min sketch: term frequencies estimated
    * from ONE distributed pass whose only driver artifact is the
    * sketch matrix (width×depth longs, tens of KB — `stat
    * .countMinSketch` tree-aggregates partition sketches; mergeable,
    * like the HLL/GK twins q42/q44). The q53 exact top-k needs a
    * term-keyed shuffle; the sketch answers any term's count without
    * one, at ε·N overestimate-only error. Output joins the exact
    * counts for the top terms so the error is visible (rows-only —
    * sketch internals are engine-specific; the spec pins the
    * overestimate-only bound). */
  private val q75: QFn = (s, d) => {
    val terms = Tables.documents(s, d)
      .select(explode(words(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
    val cms = terms.stat.countMinSketch("term",
      eps = 0.0005, confidence = 0.99, seed = 42)
    val top = terms.groupBy("term").agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("term").asc).limit(20).collect()
    val rows = top.map(r => org.apache.spark.sql.Row(
      r.getString(0), r.getLong(1), cms.estimateCount(r.getString(0))))
    // driver-side assembly is legal ONLY because `limit(20)` above
    // bounds `top` to a constant regardless of corpus size
    s.createDataFrame(
      s.sparkContext.parallelize(rows.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("term",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("exact_n",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cms_n",
          org.apache.spark.sql.types.LongType))))
  }

  /** q116: TOKENIZER-FERTILITY profile — train a sample-bounded BPE
    * table on the corpus itself (BpeTrainer: vocabulary-sized rounds,
    * argmax-only driver traffic) and report per-source mean fertility
    * (subword tokens per word) — the number a tokenizer/vocab sweep
    * optimizes, and a per-source data-quality signal (high fertility =
    * vocabulary the tokenizer serves poorly). Rows-only: BPE training
    * is not SQL-expressible; determinism and the canonical merge
    * sequence are spec-pinned on BpeTrainer itself. */
  private val q116: QFn = (s, d) => {
    val docs = Tables.documents(s, d)
    val merges = BpeTrainer.train(docs, numMerges = 40, maxWords = 2000)
    BpeTrainer.segment(docs, merges)
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_tokens")).as("n_tokens"),
        round(sum(col("n_tokens")).cast("double") / sum(col("n_words")), 6)
          .as("fertility"))
  }

  /** q201: q116's fertility rollup under the UNIGRAM-LM tokenizer
    * ([[UnigramTrainer]], Kudo 2018) — the SentencePiece-style twin
    * next to BPE, the vocab-sweep comparison a tokenizer choice runs.
    * Training-dependent (EM over a sampled dictionary) ⇒ rows-only;
    * the UnigramTrainer spec pins determinism, coverage, and
    * fertility sanity vs BPE. Scale shape: ONE corpus pass builds the
    * bounded dictionary, EM is driver-local over it, segmentation is
    * pure map-side with the KB-sized piece table broadcast. */
  private val q201: QFn = (s, d) => {
    val docs = Tables.documents(s, d)
    val model = UnigramTrainer.train(docs, vocabSize = 400,
      maxWords = 2000)
    UnigramTrainer.segment(docs, model)
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_tokens")).as("n_tokens"),
        round(sum(col("n_tokens")).cast("double") / sum(col("n_words")), 6)
          .as("fertility"))
  }

  /** q117: language ID by RANKED N-GRAM PROFILES (Cavnar & Trenkle
    * 1994 — the classic "out-of-place" text categorizer), self-trained
    * and self-evaluated: per-language top-30 term profiles rank by
    * (count desc, term) from the corpus's own labels, each doc's
    * top-20 profile compares against every language by the
    * out-of-place distance Σ |rank_doc − rank_lang| (absent terms pay
    * the max penalty), argmin classifies, and the output is the
    * CONFUSION MATRIX — the language-ID quality surface q36's
    * stopword heuristic cannot produce. All-integer arithmetic and
    * total-order tiebreaks ⇒ hash-exact. Scale shape: two
    * (key, term)-grouped map-side-partial aggregates; the language
    * profile table is K·|langs| rows — broadcast; per-doc distance is
    * one |langs|-way fanout of the doc's ≤20 profile rows, then two
    * small aggregates. Nothing data-sized moves except the token
    * explode. */
  private val q117: QFn = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val K = 30; val DK = 20
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(words(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
    val langProf = toks.groupBy("lang", "term")
      .agg(count(lit(1)).as("n"))
      .withColumn("lr", row_number().over(Window.partitionBy("lang")
        .orderBy(col("n").desc, col("term").asc)))
      .filter(col("lr") <= K)
      .select(col("lang").as("cand_lang"), col("term"), col("lr"))
    val docProf = toks.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("n"))
      .withColumn("dr", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("n").desc, col("term").asc)))
      .filter(col("dr") <= DK)
      .select("doc_id", "term", "dr")
    val langs = langProf.select("cand_lang").distinct()
    val dist = docProf
      .crossJoin(broadcast(langs))
      .join(broadcast(langProf), Seq("cand_lang", "term"), "left")
      .groupBy("doc_id", "cand_lang")
      .agg(sum(coalesce(abs(col("dr") - col("lr")), lit(K.toLong)))
        .as("dist"))
    val pred = dist.groupBy("doc_id")
      .agg(min_by(col("cand_lang"), struct(col("dist"), col("cand_lang")))
        .as("pred_lang"))
    pred
      .join(Tables.documents(s, d).select(col("doc_id"),
        col("lang").as("true_lang")), Seq("doc_id"))
      .groupBy("true_lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
  }
  private val q117Sql =
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |    unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents),
      |t AS (SELECT doc_id, lang, term FROM toks WHERE len(term) > 0),
      |lp AS (
      |  SELECT lang AS cand_lang, term, lr FROM (
      |    SELECT lang, term, ROW_NUMBER() OVER (PARTITION BY lang
      |        ORDER BY COUNT(*) DESC, term) AS lr
      |    FROM t GROUP BY lang, term) x WHERE lr <= 30),
      |dp AS (
      |  SELECT doc_id, term, dr FROM (
      |    SELECT doc_id, term, ROW_NUMBER() OVER (PARTITION BY doc_id
      |        ORDER BY COUNT(*) DESC, term) AS dr
      |    FROM t GROUP BY doc_id, term) x WHERE dr <= 20),
      |langs AS (SELECT DISTINCT cand_lang FROM lp),
      |dist AS (
      |  SELECT dp.doc_id, langs.cand_lang,
      |    SUM(COALESCE(ABS(dp.dr - lp.lr), 30)) AS dist
      |  FROM dp CROSS JOIN langs
      |  LEFT JOIN lp ON lp.cand_lang = langs.cand_lang
      |    AND lp.term = dp.term
      |  GROUP BY 1, 2),
      |pred AS (
      |  SELECT doc_id, cand_lang AS pred_lang FROM (
      |    SELECT doc_id, cand_lang, ROW_NUMBER() OVER (
      |      PARTITION BY doc_id ORDER BY dist, cand_lang) AS rn
      |    FROM dist) p WHERE rn = 1)
      |SELECT d.lang AS true_lang, pred.pred_lang,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM pred JOIN documents d USING (doc_id)
      |GROUP BY 1, 2""".stripMargin

  /** q123: PMI COLLOCATIONS (Church & Hanks 1990 — pointwise mutual
    * information over document co-occurrence): for term pairs sharing
    * ≥3 documents, pmi = ln(df_ab·N / (df_a·df_b)) — the classic
    * collocation/phrase-mining signal (high = terms that travel
    * together far beyond chance; the association-rule lift of q102 in
    * log form, on text). Per-doc DISTINCT terms bound the pair
    * explosion at Σ t_doc² (the q102 bounded-basket argument; a
    * min-df prefilter is the scale lever for heavy-tailed vocab);
    * doc-keyed self-join, pair-keyed aggregate, term-keyed df joins.
    * All counts exact integers < 2⁵³, so the ratio's double products
    * are exact and the single ln rounds at 6 dp — hash-exact. */
  private val q123: QFn = (s, d) => {
    val dt = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(array_distinct(words(col("text")))).as("term"))
      .filter(length(col("term")) > 0)
    val dfT = dt.groupBy("term").agg(count(lit(1)).as("dft"))
    val nDocs = Tables.documents(s, d).count().toDouble
    dt.select(col("doc_id"), col("term").as("a"))
      .join(dt.select(col("doc_id"), col("term").as("b")), Seq("doc_id"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("df_ab"))
      .filter(col("df_ab") >= 3)
      .join(dfT.select(col("term").as("a"), col("dft").as("df_a")), Seq("a"))
      .join(dfT.select(col("term").as("b"), col("dft").as("df_b")), Seq("b"))
      .withColumn("pmi",
        round(log(col("df_ab").cast("double") * lit(nDocs) /
          (col("df_a").cast("double") * col("df_b"))), 6))
      .select("a", "b", "df_ab", "pmi")
  }
  private val q123Sql =
    """WITH dt AS (
      |  SELECT DISTINCT doc_id, term FROM (
      |    SELECT doc_id,
      |      unnest(string_split_regex(trim(text), '\s+')) AS term
      |    FROM documents) t WHERE len(term) > 0),
      |dft AS (SELECT term, COUNT(*) AS dft FROM dt GROUP BY 1),
      |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM documents),
      |pairs AS (
      |  SELECT x.term AS a, y.term AS b, COUNT(*) AS df_ab
      |  FROM dt x JOIN dt y ON x.doc_id = y.doc_id AND x.term < y.term
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
      |SELECT a, b, df_ab,
      |  ROUND(LN(CAST(df_ab AS DOUBLE) * (SELECT nd FROM n) /
      |    (CAST(fa.dft AS DOUBLE) * fb.dft)), 6) AS pmi
      |FROM pairs
      |JOIN dft fa ON fa.term = pairs.a
      |JOIN dft fb ON fb.term = pairs.b""".stripMargin

  /** q132: BM25 RETRIEVAL — top-10 documents per query under the
    * classic Okapi ranking (Robertson & Walker; k1=1.2, b=0.75), the
    * retrieval primitive behind RAG corpus serving and
    * dedup-by-retrieval. Query terms are a literal 3-query set (the
    * operator's API takes any (query_id, term) frame). Scale shape:
    * tf = per-(doc, term) counts (ONE data-sized shuffle, map-side
    * combine), df/dl/avgdl ride tiny aggregates, the QUERY side
    * broadcasts onto the tf stream — at web scale this is the
    * standard impact-ordered postings traversal re-expressed as a
    * broadcast semi-join, with nothing corpus-sized moving except the
    * one tf aggregate. Cross-engine exact: idf and each term's
    * contribution round at 6 dp (the q59 libm discipline), the ≤|q|
    * per-doc sum runs through the decimal accumulator, top-10 breaks
    * ties on doc_id. */
  /** The batch index frames q132 builds in one pass — also the shape
    * [[graft.lakehouse.RetrievalView]] maintains incrementally:
    * tf = per-(doc, term) counts, dl = per-doc token counts. */
  private[graft] def bm25Index(docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      cutTf: Boolean = false): (DataFrame, DataFrame) = {
    val toks = docs
      .select(col(idCol).as("doc_id"),
        explode(words(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    // dl derives FROM tf (r14): Σ tf per doc = the doc's token count,
    // exactly — so the regex tokenize + explode (the CPU-heavy pass)
    // runs once instead of once per index frame. cutTf additionally
    // materializes tf so consumers in SEPARATE actions (q132's avgdl
    // scalar, then the scoring job) share one tokenize instead of
    // re-running the subtree per action.
    val tf0 = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val tf = if (cutTf) tf0.cutLineage() else tf0
    (tf, tf.groupBy("doc_id").agg(sum(col("tf")).as("dl")))
  }

  /** Okapi BM25 top-k over prepared index frames — the ONE scoring
    * definition q132 (batch) and the maintained RetrievalView share,
    * so the incremental index is oracle-pinned through the query.
    * Cross-engine/cross-path exact: idf and per-term contributions at
    * 6-dp ln, per-doc sums through the decimal accumulator, doc_id
    * tiebreak. */
  private[graft] def bm25TopK(tf: DataFrame, dl: DataFrame,
      df: DataFrame, nDocs: Long, avgdl: Double, qterms: DataFrame,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (k1, b) = (1.2, 0.75)
    val idf = df.join(broadcast(qterms.select("term").distinct()),
        Seq("term"))
      .select(col("term"), round(log(
        (lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5)
          + 1.0), 6).as("idf"))
    val contrib = tf
      .join(broadcast(qterms.join(idf, Seq("term"))), Seq("term"))
      .join(dl, Seq("doc_id"))
      .select(col("query_id"), col("doc_id"),
        round(col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl") / lit(avgdl))), 6)
          .as("c"))
    val scored = contrib.groupBy("query_id", "doc_id")
      .agg(sum(col("c").cast(graft.util.Exact.Dec)).cast("double")
        .as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("doc_id"), col("rnk"),
        round(col("score"), 6).as("score"))
  }

  /** The q132 literal query set (the operator API takes any
    * (query_id, term) frame). */
  private[graft] def bm25Queries(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("q1", "spark"), ("q1", "join"), ("q1", "merge"),
      ("q2", "window"), ("q2", "sort"), ("q2", "order"),
      ("q3", "data"), ("q3", "stream"), ("q3", "batch"))
      .toDF("query_id", "term")
  }

  private val q132: QFn = (s, d) => {
    val (tf, dl) = bm25Index(Tables.documents(s, d), cutTf = true)
    // one driver action for BOTH scalars (was two serial actions: a
    // documents count, then the avgdl head — each a full stage chain)
    val st = dl.agg((sum(col("dl").cast(graft.util.Exact.Dec))
        .cast("double") / count(lit(1))).as("a"))
      .crossJoin(Tables.documents(s, d).agg(count(lit(1)).as("n")))
      .head
    val (avgdl, nDocs) = (st.getDouble(0), st.getLong(1))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    bm25TopK(tf, dl, df, nDocs, avgdl, bm25Queries(s), k = 10)
  }
  private[operators] val q132Sql =
    """WITH t AS (SELECT doc_id,
      |    unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents),
      |t2 AS (SELECT * FROM t WHERE len(term) > 0),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t2 GROUP BY 1, 2),
      |dl AS (SELECT doc_id, COUNT(*) AS dl FROM t2 GROUP BY 1),
      |stats AS (SELECT (SELECT COUNT(*) FROM documents) AS n,
      |  CAST(SUM(CAST(dl AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avgdl
      |  FROM dl),
      |q(query_id, term) AS (VALUES
      |  ('q1','spark'),('q1','join'),('q1','merge'),
      |  ('q2','window'),('q2','sort'),('q2','order'),
      |  ('q3','data'),('q3','stream'),('q3','batch')),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |idf AS (SELECT df.term,
      |    ROUND(LN((CAST((SELECT n FROM stats) AS DOUBLE) - df + 0.5)
      |      / (df + 0.5) + 1.0), 6) AS idf
      |  FROM df JOIN (SELECT DISTINCT term FROM q) qt USING (term)),
      |c AS (SELECT q.query_id, tf.doc_id,
      |    ROUND(idf.idf * (tf.tf * (1.2 + 1.0)) /
      |      (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl /
      |        (SELECT avgdl FROM stats))), 6) AS c
      |  FROM tf JOIN q USING (term) JOIN idf ON idf.term = tf.term
      |  JOIN dl ON dl.doc_id = tf.doc_id),
      |scored AS (SELECT query_id, doc_id,
      |    CAST(SUM(CAST(c AS DECIMAL(28,6))) AS DOUBLE) AS score
      |  FROM c GROUP BY 1, 2)
      |SELECT query_id, doc_id,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY score DESC, doc_id) AS INTEGER) AS rnk,
      |  ROUND(score, 6) AS score
      |FROM scored
      |QUALIFY rnk <= 10""".stripMargin

  /** q133: CONTAMINATION SCORE — the continuous form of q76's binary
    * decontamination: per document, the fraction of its DISTINCT word
    * trigrams that appear anywhere in the benchmark slice (doc_id %
    * 101 == 0, a deterministic eval-set stand-in). The graded signal
    * real pipelines threshold (WMDP/GSM8K-style n-gram overlap
    * auditing) rather than hard-drop. Scale shape: the benchmark gram
    * set is eval-set-sized → BROADCAST; the corpus side is one
    * map-side distinct-gram explode + a semi-join + one doc-keyed
    * aggregate — nothing corpus-sized shuffles except the per-doc
    * count. Integer counts + one 6-dp ratio ⇒ hash-exact. */
  private val q133: QFn = (s, d) => {
    val w = words(col("text"))
    val base = Tables.documents(s, d).select(col("doc_id"),
      greatest(size(w) - 2, lit(0)).cast("long").as("np"), w.as("w"))
    def grams(df: DataFrame): DataFrame = df.filter(col("np") > 0)
      .select(col("doc_id"), explode(array_distinct(transform(
        sequence(lit(1L), col("np")),
        i => concat_ws(" ", slice(col("w"), i, lit(3)))))).as("gram"))
    val bench = grams(base.filter(col("doc_id") % 101 === 0))
      .select("gram").distinct()
    val perDoc = grams(base).groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"))
    val hits = grams(base).join(broadcast(bench), Seq("gram"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    base.select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        when(coalesce(col("n_grams"), lit(0L)) > 0,
          round(coalesce(col("n_hit"), lit(0L)).cast("double") /
            col("n_grams").cast("double"), 6))
          .otherwise(lit(0.0)).as("contamination"))
  }
  private val q133Sql =
    """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      |           FROM documents),
      |d AS (SELECT doc_id, GREATEST(len(w)-2, 0) AS np, w FROM t),
      |g AS (SELECT DISTINCT doc_id,
      |        array_to_string(list_slice(w, i, i+2), ' ') AS gram
      |      FROM (SELECT doc_id, w,
      |              unnest(range(1, GREATEST(len(w)-2,0)+1)) AS i FROM d)),
      |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 101 = 0),
      |pd AS (SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY 1),
      |hits AS (SELECT doc_id, COUNT(*) AS n_hit FROM g
      |         JOIN bench USING (gram) GROUP BY 1)
      |SELECT d.doc_id,
      |  COALESCE(pd.n_grams, 0) AS n_grams,
      |  COALESCE(hits.n_hit, 0) AS n_hit,
      |  CASE WHEN COALESCE(pd.n_grams, 0) > 0
      |    THEN ROUND(CAST(COALESCE(hits.n_hit, 0) AS DOUBLE)
      |      / pd.n_grams, 6)
      |    ELSE 0.0 END AS contamination
      |FROM d
      |LEFT JOIN pd USING (doc_id)
      |LEFT JOIN hits USING (doc_id)""".stripMargin

  /** q138: EPOCH-REPEAT planner — temperature-weighted source budgets
    * where boosted sources may exceed one pass over their data (the
    * mT5/LLaMA-style repeat-factor table): with a 2×-corpus token
    * budget and α=0.3 shares, source i's plan is `epochs` full passes
    * plus a fractional keep rate for the last partial pass. The >1
    * complement of q99 (whose per-doc rates clamp at 1 — this is the
    * second-pass decision that operator documents as out of scope).
    * Two K-row aggregates, all arithmetic fixed IEEE on decimal-exact
    * inputs (pow at 6 dp — the q59 libm lesson), floor/frac at the
    * same double in both engines; hash-exact. */
  private val q138: QFn = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("source"), size(words(col("text"))).cast("long").as("nt"))
    val perSrc = toks.groupBy("source").agg(sum(col("nt")).as("n"))
      .withColumn("w", round(pow(col("n").cast("double"), lit(0.3)), 6))
    val totals = perSrc.agg(sum(col("n")).as("total"),
      sum(col("w").cast(graft.util.Exact.Dec)).cast("double").as("wsum"))
    val ratio = lit(2.0) * col("total") * col("w") / col("wsum") / col("n")
    perSrc.crossJoin(broadcast(totals))
      .select(col("source"), col("n").as("n_tokens"),
        floor(ratio).cast("long").as("epochs"),
        round(ratio - floor(ratio), 6).as("frac"))
  }
  private val q138Sql =
    """WITH ps AS (
      |  SELECT source,
      |    CAST(SUM(CAST(len(string_split_regex(trim(text), '\s+'))
      |      AS BIGINT)) AS BIGINT) AS n,
      |    ROUND(POW(CAST(SUM(CAST(len(string_split_regex(trim(text),
      |      '\s+')) AS BIGINT)) AS DOUBLE), 0.3), 6) AS w
      |  FROM documents GROUP BY source),
      |tot AS (
      |  SELECT CAST(SUM(n) AS BIGINT) AS total,
      |    CAST(SUM(CAST(w AS DECIMAL(28,6))) AS DOUBLE) AS wsum
      |  FROM ps)
      |SELECT source, n AS n_tokens,
      |  CAST(FLOOR(2.0 * total * w / wsum / n) AS BIGINT) AS epochs,
      |  ROUND(2.0 * total * w / wsum / n
      |    - FLOOR(2.0 * total * w / wsum / n), 6) AS frac
      |FROM ps, tot""".stripMargin

  /** q142: ZIPF SLOPE per source — the log–log regression slope of
    * term frequency against frequency rank, the classic corpus-health
    * screen (natural text sits near −1; log-uniform synthetic junk,
    * boilerplate floods, and template spam bend the curve). Scale
    * shape: term frequencies are ONE map-side-partial aggregate; the
    * per-source rank keeps only the TOP-1000 terms through a
    * rank-limited window (Spark plans a WindowGroupLimit — partial
    * per-partition top-k before the shuffle, so a 10-billion-term
    * vocabulary never serializes through one task), and the
    * regression folds 4 moment sums over ≤1000 rows per source.
    * Cross-engine bit-equality: ln() rounded to 6 dp per point
    * (libm last-ulp — q59's lesson), moment products rounded then
    * accumulated as exact decimals, slope one fixed IEEE expression.
    * Ties in frequency break on the term string so both engines rank
    * identically. */
  private val q142: QFn = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(s, d)
      .select(col("source"), explode(words(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("source", "term").agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy("source")
      .orderBy(col("freq").desc, col("term").asc)
    val pts = tf.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 1000)
      .select(col("source"),
        round(log(col("rk").cast("double")), 6).as("x"),
        round(log(col("freq").cast("double")), 6).as("y"))
    val dec = graft.util.Exact.Dec
    pts.groupBy("source")
      .agg(count(lit(1)).as("n_terms"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum(round(col("x") * col("y"), 6).cast(dec)).as("sxy"),
        sum(round(col("x") * col("x"), 6).cast(dec)).as("sxx"))
      .select(col("source"), col("n_terms"),
        round((col("n_terms") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (col("n_terms") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")), 6)
          .as("zipf_slope"))
  }
  private val q142Sql =
    """WITH t AS (SELECT source,
      |    unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT source, term, COUNT(*) AS freq
      |  FROM t WHERE len(term) > 0 GROUP BY 1, 2),
      |pts AS (
      |  SELECT source,
      |    ROUND(ln(CAST(rk AS DOUBLE)), 6) AS x,
      |    ROUND(ln(CAST(freq AS DOUBLE)), 6) AS y
      |  FROM (SELECT source, freq,
      |      ROW_NUMBER() OVER (PARTITION BY source
      |        ORDER BY freq DESC, term ASC) AS rk
      |    FROM tf) r
      |  WHERE rk <= 1000),
      |m AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms,
      |    SUM(CAST(x AS DECIMAL(28,6))) AS sx,
      |    SUM(CAST(y AS DECIMAL(28,6))) AS sy,
      |    SUM(CAST(ROUND(x * y, 6) AS DECIMAL(28,6))) AS sxy,
      |    SUM(CAST(ROUND(x * x, 6) AS DECIMAL(28,6))) AS sxx
      |  FROM pts GROUP BY 1)
      |SELECT source, n_terms,
      |  ROUND((n_terms * CAST(sxy AS DOUBLE) -
      |    CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |    (n_terms * CAST(sxx AS DOUBLE) -
      |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS zipf_slope
      |FROM m""".stripMargin

  /** q150: PER-SOURCE LOG-NORMAL LENGTH FIT — document token counts
    * are canonically log-normal; the fitted (μ, σ) of ln(length) per
    * source is the standard length-distribution drift screen (a
    * source whose σ collapses went template; a μ shift means the
    * extractor changed). One map-side length projection, per-source
    * decimal moments of the 6-dp-rounded ln (the q94 discipline), μ/σ
    * fixed IEEE expressions. */
  private val q150: QFn = (s, d) => {
    val dec = graft.util.Exact.Dec
    val x = round(log(size(words(col("text"))).cast("double")), 6)
    val base = Tables.documents(s, d)
      .filter(size(words(col("text"))) > 0)
      .select(col("source"), x.as("x"))
    base.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("x").cast(dec)).as("sx"),
        sum(round(col("x") * col("x"), 6).cast(dec)).as("sxx"))
      .select(col("source"), col("n_docs"),
        round(col("sx").cast("double") / col("n_docs"), 6).as("mu"),
        round(sqrt((col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double") /
            col("n_docs")) / col("n_docs")), 6).as("sigma"))
  }
  private val q150Sql =
    """WITH t AS (
      |  SELECT source,
      |    ROUND(ln(CAST(len(string_split_regex(trim(text), '\s+'))
      |      AS DOUBLE)), 6) AS x
      |  FROM documents
      |  WHERE len(string_split_regex(trim(text), '\s+')) > 0),
      |m AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    SUM(CAST(x AS DECIMAL(28,6))) AS sx,
      |    SUM(CAST(ROUND(x * x, 6) AS DECIMAL(28,6))) AS sxx
      |  FROM t GROUP BY 1)
      |SELECT source, n_docs,
      |  ROUND(CAST(sx AS DOUBLE) / n_docs, 6) AS mu,
      |  ROUND(SQRT((CAST(sxx AS DOUBLE) -
      |    CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n_docs) / n_docs), 6)
      |    AS sigma
      |FROM m""".stripMargin

  /** q152: HEAPS'-LAW VOCABULARY GROWTH per source — the log–log
    * regression exponent β of distinct-vocabulary size against
    * cumulative token count (V ≈ k·N^β; natural text sits near
    * 0.4–0.6). The corpus-health complement of q142's Zipf slope:
    * a source whose β collapses stopped contributing new vocabulary
    * (template/boilerplate flood); β near 1 is id-like junk where
    * every token is new. Scale shape: "vocabulary so far" is NOT a
    * distinct-count per prefix — each term charges its FIRST document
    * (one min-aggregate), so cumV is a plain prefix sum of per-doc
    * new-term counts; both running sums use [[RankOps]]'
    * two-pass grouped prefix scheme (no per-source unbounded window
    * ever serializes a source through one task), and the regression
    * folds 4 decimal moment sums map-side. Cross-engine: ln rounded
    * to 6 dp per point, moment products rounded then decimal-summed,
    * β one fixed IEEE expression (the q142 discipline). */
  private val q152: QFn = (s, d) => {
    val dec = graft.util.Exact.Dec
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), words(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
    // each distinct (source, term) charges the first doc it appears in
    val firsts = docs
      .select(col("source"), col("doc_id"), explode(col("toks")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("source", "term").agg(min(col("doc_id")).as("first_doc"))
      .groupBy(col("source"), col("first_doc").as("doc_id"))
      .agg(count(lit(1)).as("n_new"))
    val perDoc = docs
      .select(col("source"), col("doc_id"),
        size(col("toks")).cast("long").as("n_tok"))
      .join(firsts, Seq("source", "doc_id"), "left")
      .na.fill(0L, Seq("n_new"))
    val cumN = RankOps.withGroupedPrefixSum(perDoc, Seq("source"),
      Seq("doc_id"), valueCol = "n_tok", sumCol = "pn")
    val cum = RankOps.withGroupedPrefixSum(cumN, Seq("source"),
      Seq("doc_id"), valueCol = "n_new", sumCol = "pv")
      .select(col("source"),
        (col("pn") + col("n_tok")).as("cum_n"),
        (col("pv") + col("n_new")).as("cum_v"))
      .filter(col("cum_v") > 0)
    val pts = cum.select(col("source"),
      round(log(col("cum_n").cast("double")), 6).as("x"),
      round(log(col("cum_v").cast("double")), 6).as("y"))
    pts.groupBy("source")
      .agg(count(lit(1)).as("n_points"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum(round(col("x") * col("y"), 6).cast(dec)).as("sxy"),
        sum(round(col("x") * col("x"), 6).cast(dec)).as("sxx"))
      .select(col("source"), col("n_points"),
        round((col("n_points") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (col("n_points") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")), 6)
          .as("heaps_beta"))
  }
  private val q152Sql =
    """WITH docs AS (
      |  SELECT doc_id, source,
      |    string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents
      |  WHERE len(string_split_regex(trim(text), '\s+')) > 0),
      |firsts AS (
      |  SELECT source, first_doc AS doc_id, COUNT(*) AS n_new
      |  FROM (SELECT source, term, MIN(doc_id) AS first_doc
      |    FROM (SELECT source, doc_id, unnest(toks) AS term FROM docs) u
      |    WHERE len(term) > 0 GROUP BY 1, 2) f
      |  GROUP BY 1, 2),
      |per_doc AS (
      |  SELECT d.source, d.doc_id,
      |    CAST(len(d.toks) AS BIGINT) AS n_tok,
      |    COALESCE(n_new, 0) AS n_new
      |  FROM docs d LEFT JOIN firsts USING (source, doc_id)),
      |cum AS (
      |  SELECT source,
      |    SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum_n,
      |    SUM(n_new) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum_v
      |  FROM per_doc),
      |pts AS (
      |  SELECT source,
      |    ROUND(ln(CAST(cum_n AS DOUBLE)), 6) AS x,
      |    ROUND(ln(CAST(cum_v AS DOUBLE)), 6) AS y
      |  FROM cum WHERE cum_v > 0),
      |m AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_points,
      |    SUM(CAST(x AS DECIMAL(28,6))) AS sx,
      |    SUM(CAST(y AS DECIMAL(28,6))) AS sy,
      |    SUM(CAST(ROUND(x * y, 6) AS DECIMAL(28,6))) AS sxy,
      |    SUM(CAST(ROUND(x * x, 6) AS DECIMAL(28,6))) AS sxx
      |  FROM pts GROUP BY 1)
      |SELECT source, n_points,
      |  ROUND((n_points * CAST(sxy AS DOUBLE) -
      |    CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |    (n_points * CAST(sxx AS DOUBLE) -
      |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS heaps_beta
      |FROM m""".stripMargin

  /** q156: PER-SOURCE JENSEN–SHANNON DIVERGENCE between the source's
    * unigram distribution and the whole-corpus distribution — the
    * bounded, symmetric distribution-drift alarm (0 = identical,
    * ln 2 = disjoint) that answers "which ingest stream stopped
    * looking like the corpus" where q142/q152's power-law exponents
    * answer "stopped looking like language". The key scale identity:
    * terms ABSENT from a source contribute exactly
    * 0.5·ln2·(1 − Σ_{t∈S} q_t) in closed form (p=0 ⇒ the term's
    * mixture is q/2), so the sum runs ONLY over (source, term) pairs
    * that exist — never |sources| × |vocabulary|. One data-sized
    * explode+aggregate, a vocabulary-sized join back on term, and
    * K-row folds; the absent-mass term needs just Σ q_t over present
    * terms, which is an exact INTEGER sum of corpus counts.
    * Cross-engine: p and q are long-derived IEEE doubles, each
    * per-term contribution rounds to 12 dp into a DECIMAL(38,12)
    * accumulator, the absent-mass expression is fixed IEEE with ln 2
    * pinned to its 6-dp literal; hash-exact. */
  private val q156: QFn = (s, d) => {
    val dec12 = org.apache.spark.sql.types.DecimalType(38, 12)
    val tf = Tables.documents(s, d)
      .select(col("source"), explode(words(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("source", "term").agg(count(lit(1)).as("cs"))
    val corpus = tf.groupBy("term").agg(sum(col("cs")).as("c"))
    val srcTot = tf.groupBy("source")
      .agg(sum(col("cs")).as("ns"), count(lit(1)).as("n_terms"))
    val tot = corpus.agg(sum(col("c")).as("n"))
    val p = col("cs").cast("double") / col("ns").cast("double")
    val q = col("c").cast("double") / col("n").cast("double")
    val contrib = lit(0.5) * p * log(lit(2.0) * p / (p + q)) +
      lit(0.5) * q * log(lit(2.0) * q / (p + q))
    val present = tf.join(corpus, Seq("term"))
      .join(broadcast(srcTot), Seq("source"))
      .crossJoin(broadcast(tot))
      .select(col("source"), col("n_terms"), col("n"),
        round(contrib, 12).cast(dec12).as("t"), col("c"))
      .groupBy("source")
      .agg(first(col("n_terms")).as("n_terms"), first(col("n")).as("n"),
        sum(col("t")).as("pres"), sum(col("c")).as("cpres"))
    present.select(col("source"), col("n_terms"),
      round(col("pres").cast("double") + lit(0.5) * lit(0.693147) *
        (lit(1.0) - col("cpres").cast("double") / col("n").cast("double")),
        6).as("jsd"))
  }
  private val q156Sql =
    """WITH t AS (SELECT source,
      |    unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT source, term, COUNT(*) AS cs
      |  FROM t WHERE len(term) > 0 GROUP BY 1, 2),
      |corpus AS (SELECT term, SUM(cs) AS c FROM tf GROUP BY 1),
      |src AS (SELECT source, SUM(cs) AS ns,
      |    CAST(COUNT(*) AS BIGINT) AS n_terms
      |  FROM tf GROUP BY 1),
      |tot AS (SELECT SUM(c) AS n FROM corpus),
      |pres AS (
      |  SELECT source, n_terms, n,
      |    SUM(CAST(ROUND(
      |      0.5 * (CAST(cs AS DOUBLE) / CAST(ns AS DOUBLE)) *
      |        ln(2.0 * (CAST(cs AS DOUBLE) / CAST(ns AS DOUBLE)) /
      |          ((CAST(cs AS DOUBLE) / CAST(ns AS DOUBLE)) +
      |           (CAST(c AS DOUBLE) / CAST(n AS DOUBLE)))) +
      |      0.5 * (CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
      |        ln(2.0 * (CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) /
      |          ((CAST(cs AS DOUBLE) / CAST(ns AS DOUBLE)) +
      |           (CAST(c AS DOUBLE) / CAST(n AS DOUBLE)))), 12)
      |      AS DECIMAL(38,12))) AS pres,
      |    SUM(c) AS cpres
      |  FROM tf JOIN corpus USING (term) JOIN src USING (source)
      |    CROSS JOIN tot
      |  GROUP BY 1, 2, 3)
      |SELECT source, n_terms,
      |  ROUND(CAST(pres AS DOUBLE) + 0.5 * 0.693147 *
      |    (1.0 - CAST(cpres AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS jsd
      |FROM pres""".stripMargin

  /** q157: GOPHER-STYLE RULE-BASED QUALITY GATE (Rae et al. 2021,
    * arXiv:2112.11446 Table A1 — the published heuristic filter suite
    * every large text pipeline runs before model-based scoring):
    * per-document pass/fail on four of the classic rules — word count
    * in [50, 100 000], mean word length in [3, 10], ≥ 80 % of words
    * containing an alphabetic character, ≥ 2 distinct stopword hits —
    * rolled up per source as failure counts and the overall pass
    * rate (the per-SOURCE health view an ingest dashboard wants; the
    * per-doc verdicts are the pipeline's drop mask). Map-only per-doc
    * feature math (no explode — word counts and alpha fractions come
    * from array HOFs on the split column), one K-row rollup;
    * mean-word-length avoids a per-word aggregate entirely:
    * non-whitespace chars / word count. Integer counts + one 6-dp
    * ratio; hash-exact. */
  private val q157: QFn = (s, d) => {
    val wf = filter(words(col("text")), w => length(w) > 0)
    val base = Tables.documents(s, d)
      .withColumn("wf", wf)
      .withColumn("n_words", size(col("wf")).cast("long"))
      .withColumn("nws_chars",
        length(regexp_replace(trim(col("text")), "\\s+", "")).cast("long"))
      .withColumn("n_alpha",
        size(expr("filter(wf, x -> x rlike '[A-Za-z]')")).cast("long"))
      .withColumn("stop_hits",
        size(array_intersect(
          array_distinct(transform(col("wf"), w => lower(w))),
          array(Seq("the", "a", "of", "and", "is", "to", "in")
            .map(lit): _*))).cast("long"))
    val f1 = col("n_words") < 50 || col("n_words") > 100000
    val mwl = col("nws_chars").cast("double") / col("n_words").cast("double")
    val f2 = col("n_words") === 0 || mwl < 3.0 || mwl > 10.0
    val af = col("n_alpha").cast("double") / col("n_words").cast("double")
    val f3 = col("n_words") === 0 || af < 0.8
    val f4 = col("stop_hits") < 2
    base.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(when(f1, 1L).otherwise(0L)).as("fail_word_count"),
      sum(when(f2, 1L).otherwise(0L)).as("fail_mean_word_len"),
      sum(when(f3, 1L).otherwise(0L)).as("fail_alpha_ratio"),
      sum(when(f4, 1L).otherwise(0L)).as("fail_stopwords"),
      sum(when(!f1 && !f2 && !f3 && !f4, 1L).otherwise(0L)).as("n_pass"))
      .withColumn("pass_rate",
        round(col("n_pass").cast("double") / col("n_docs").cast("double"), 6))
  }
  private val q157Sql =
    """WITH base AS (
      |  SELECT source,
      |    CAST(len(wf) AS BIGINT) AS n_words,
      |    CAST(length(regexp_replace(trim(text), '\s+', '', 'g'))
      |      AS BIGINT) AS nws_chars,
      |    CAST(len(list_filter(wf, x -> regexp_matches(x, '[A-Za-z]')))
      |      AS BIGINT) AS n_alpha,
      |    CAST(len(list_intersect(
      |      list_distinct(list_transform(wf, x -> lower(x))),
      |      ['the','a','of','and','is','to','in'])) AS BIGINT) AS stop_hits
      |  FROM (SELECT source, text,
      |      list_filter(string_split_regex(trim(text), '\s+'),
      |        x -> len(x) > 0) AS wf
      |    FROM documents) t),
      |flags AS (
      |  SELECT source,
      |    (n_words < 50 OR n_words > 100000) AS f1,
      |    (n_words = 0 OR CAST(nws_chars AS DOUBLE) / n_words < 3.0
      |      OR CAST(nws_chars AS DOUBLE) / n_words > 10.0) AS f2,
      |    (n_words = 0 OR CAST(n_alpha AS DOUBLE) / n_words < 0.8) AS f3,
      |    (stop_hits < 2) AS f4
      |  FROM base)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS fail_word_count,
      |  CAST(SUM(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS fail_mean_word_len,
      |  CAST(SUM(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS fail_alpha_ratio,
      |  CAST(SUM(CASE WHEN f4 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS fail_stopwords,
      |  CAST(SUM(CASE WHEN NOT f1 AND NOT f2 AND NOT f3 AND NOT f4
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
      |  ROUND(CAST(SUM(CASE WHEN NOT f1 AND NOT f2 AND NOT f3 AND NOT f4
      |    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS pass_rate
      |FROM flags GROUP BY 1""".stripMargin

  /** q158: BIGRAM LANGUAGE-MODEL SURPRISAL per document — the CCNet/
    * CC-MultiLingual move (Wenzek et al. 2020): score every document's
    * cross-entropy under an n-gram LM and gate on it (high = junk or
    * off-distribution, suspiciously low = boilerplate); here the LM is
    * add-one-smoothed bigrams trained on the corpus itself (the
    * self-perplexity screen), p(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁)+V) — the
    * bigram extension of q94's unigram surprisal. Scale shape: ONE
    * data-sized bigram explode (adjacent-pair zip of the split column
    * — no self-join), the model is the vocabulary-bounded bigram-count
    * table joined back by (w₁,w₂), context counts and V are
    * model-sized folds, per-doc scores one aggregate. Cross-engine:
    * all counts integer-exact, each bigram's −ln p rounds to 6 dp
    * (the q94 libm discipline) into the exact decimal accumulator,
    * final ratio fixed IEEE; hash-exact. */
  private val q158: QFn = (s, d) => {
    val wf = filter(words(col("text")), w => length(w) > 0)
    // widen the single-split scan before the tokenize+bigram explode
    // (heavy per-row work) and materialize bg ONCE (r14): the model
    // branch and the scoring join each re-ran the whole explode+agg —
    // profiled as concurrent 0.8-1.1 s single-task stages
    val docs = graft.util.Partitioning.widenIfSingleSplit(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        s"$d/documents.parquet")
      .select(col("doc_id"), wf.as("l"))
    val bg = docs.filter(size(col("l")) >= 2)
      .withColumn("bgs", expr(
        "zip_with(slice(l, 1, size(l) - 1), slice(l, 2, size(l) - 1), " +
          "(x, y) -> named_struct('w1', x, 'w2', y))"))
      .select(col("doc_id"), explode(col("bgs")).as("p"))
      .groupBy(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n_b"))
      .cutLineage()
    val model = bg.groupBy("w1", "w2").agg(sum(col("n_b")).as("c12"))
    val ctx = model.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val vocab = docs.select(explode(col("l")).as("term"))
      .agg(countDistinct(col("term")).as("v"))
    val nll = round(log((col("c1").cast("double") + col("v")) /
      (col("c12").cast("double") + lit(1.0))), 6)
    bg.join(model, Seq("w1", "w2")).join(ctx, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("n_b"),
        (col("n_b") * nll).cast(graft.util.Exact.Dec).as("t"))
      .groupBy("doc_id")
      .agg(sum(col("n_b")).as("n_bigrams"),
        round(sum(col("t")).cast("double") / sum(col("n_b")), 6)
          .as("avg_nll"))
  }
  private val q158Sql =
    """WITH w AS (SELECT doc_id,
      |    list_filter(string_split_regex(trim(text), '\s+'),
      |      x -> len(x) > 0) AS l
      |  FROM documents),
      |bg0 AS (SELECT doc_id, l[i] AS w1, l[i+1] AS w2
      |  FROM w, unnest(range(1, len(l))) AS t(i)
      |  WHERE len(l) >= 2),
      |bg AS (SELECT doc_id, w1, w2, COUNT(*) AS n_b
      |  FROM bg0 GROUP BY 1, 2, 3),
      |model AS (SELECT w1, w2, SUM(n_b) AS c12 FROM bg GROUP BY 1, 2),
      |ctx AS (SELECT w1, SUM(c12) AS c1 FROM model GROUP BY 1),
      |vocab AS (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v
      |  FROM (SELECT unnest(l) AS term FROM w) u)
      |SELECT doc_id, CAST(SUM(n_b) AS BIGINT) AS n_bigrams,
      |  ROUND(CAST(SUM(CAST(n_b * ROUND(ln(
      |      (CAST(c1 AS DOUBLE) + v) / (CAST(c12 AS DOUBLE) + 1.0)), 6)
      |    AS DECIMAL(28,6))) AS DOUBLE) / SUM(n_b), 6) AS avg_nll
      |FROM bg JOIN model USING (w1, w2) JOIN ctx USING (w1)
      |  CROSS JOIN vocab
      |GROUP BY doc_id""".stripMargin

  /** q166: LEXICAL DIVERSITY per source — type-token ratio and hapax
    * share (the vocabulary-health companion to q142's Zipf slope and
    * q152's Heaps exponent: template-generated or boilerplate-heavy
    * sources show low TTR and low hapax share; a healthy natural
    * corpus keeps a long tail of once-seen words). One explode +
    * (source, term) aggregate with map-side partials — term
    * frequency within source decides hapax membership — then a tiny
    * per-source rollup; ratios are exact-count divisions rounded at
    * the end. */
  private val q166: QFn = (s, d) => {
    Tables.documents(s, d)
      .select(col("source"), explode(words(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("source", "term").agg(count(lit(1)).as("tf"))
      .groupBy("source")
      .agg(sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("tf") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tokens"), 6)
          .as("ttr"),
        round(col("n_hapax").cast("double") / col("n_types"), 6)
          .as("hapax_share"))
  }
  private val q166Sql =
    """WITH tf AS (
      |  SELECT source, term, COUNT(*) AS tf
      |  FROM (SELECT source,
      |          unnest(string_split_regex(trim(text), '\s+')) AS term
      |        FROM documents) t
      |  WHERE length(term) > 0
      |  GROUP BY 1, 2),
      |agg AS (
      |  SELECT source, CAST(SUM(tf) AS BIGINT) AS n_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS n_types,
      |    CAST(SUM(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_hapax
      |  FROM tf GROUP BY 1)
      |SELECT source, n_tokens, n_types,
      |  ROUND(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
      |  ROUND(CAST(n_hapax AS DOUBLE) / n_types, 6) AS hapax_share
      |FROM agg""".stripMargin

  /** q182: SOURCE VOCABULARY-OVERLAP MATRIX — pairwise Jaccard of the
    * top-300 term sets across sources (the corpus-mixing diagnostic:
    * near-duplicate crawls show overlap ≈ 1, a code source against
    * prose ≈ 0 — which streams actually add vocabulary?). Scale
    * shape: one map-side-partial (source, term) frequency aggregate,
    * the per-source top-300 plans a WindowGroupLimit (q142's
    * partial-top-k — a 10-billion-term vocabulary never serializes
    * through one task), and the pair join runs over K·300 rows (K =
    * source count — model-sized, quadratic only in K). All-integer
    * counts, (freq desc, term) total-order tiebreak, 6-dp ratio;
    * hash-exact. */
  private val q182: QFn = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(s, d)
      .select(col("source"), explode(words(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("source", "term").agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy("source")
      .orderBy(col("freq").desc, col("term").asc)
    val top = tf.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 300).select("source", "term")
    val k = top.groupBy("source").agg(count(lit(1)).as("k"))
    val inter = top.select(col("source").as("source_a"), col("term"))
      .join(top.select(col("source").as("source_b"), col("term")),
        Seq("term"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("overlap"))
    inter
      .join(k.select(col("source").as("source_a"), col("k").as("k_a")),
        Seq("source_a"))
      .join(k.select(col("source").as("source_b"), col("k").as("k_b")),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("k_a"), col("k_b"),
        col("overlap"),
        round(col("overlap").cast("double") /
          (col("k_a") + col("k_b") - col("overlap")).cast("double"), 6)
          .as("jaccard"))
  }
  private val q182Sql =
    """WITH t AS (SELECT source,
      |    unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT source, term, COUNT(*) AS freq
      |  FROM t WHERE len(term) > 0 GROUP BY 1, 2),
      |top AS (
      |  SELECT source, term FROM (
      |    SELECT source, term,
      |      ROW_NUMBER() OVER (PARTITION BY source
      |        ORDER BY freq DESC, term ASC) AS rk
      |    FROM tf) WHERE rk <= 300),
      |k AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS k
      |  FROM top GROUP BY 1),
      |inter AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |    CAST(COUNT(*) AS BIGINT) AS overlap
      |  FROM top a JOIN top b
      |    ON a.term = b.term AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT source_a, source_b, ka.k AS k_a, kb.k AS k_b, overlap,
      |  ROUND(CAST(overlap AS DOUBLE)
      |    / (ka.k + kb.k - overlap), 6) AS jaccard
      |FROM inter
      |JOIN k ka ON ka.source = source_a
      |JOIN k kb ON kb.source = source_b""".stripMargin

  /** q192: TOKEN-SEQUENCE PACKING profile — the tokenize→pack stage
    * run end to end on the corpus (BpeTrainer.train bounded → vocab →
    * map-side encode → packSequences per source) and profiled per
    * source: sequences produced, tokens, how many are exactly full
    * (all but each stream's tail, by construction), OOV count (zero
    * when the vocabulary trained on the same corpus). Rows-only: BPE
    * is not SQL-expressible; conservation/boundary semantics are
    * spec-pinned on BpeTrainer/tokenizeAndPack. */
  private val q192: QFn = (s, d) => {
    val docs = Tables.documents(s, d)
    val merges = BpeTrainer.train(docs, numMerges = 40, maxWords = 2000)
    val vt = BpeTrainer.vocab(docs, merges)
    val L = 2048
    val enc = BpeTrainer.encode(docs, merges, vt)
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
    val oov = enc.groupBy("source").agg(sum(col("n_oov")).as("n_oov"))
    BpeTrainer.packSequences(enc, L, Seq("source"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_sequences"),
        sum(col("n_tokens")).as("n_tokens"),
        count(when(col("n_tokens") === L, 1)).as("n_full"))
      .join(oov, Seq("source"))
  }

  /** q196: CHARACTER-TRIGRAM ENTROPY per language — the
    * script-complexity profile (logographic scripts carry more bits
    * per character window than alphabetic ones; a language whose
    * entropy drifts = mislabeled or templated stream — the
    * character-level complement to q36/q117's classification and
    * q159's event entropy). Scale shape: the trigram explode is
    * map-side and linear in characters (the q152 explode class), one
    * (lang, gram) frequency aggregate with map-side partials, and the
    * per-language entropy folds 6-dp-rounded −p·log2 p terms through
    * the exact decimal accumulator over vocabulary-sized gram rows
    * (the q159 discipline). Exact, hash-checked. */
  private val q196: QFn = (s, d) => {
    // widen the single-split documents scan before the per-character
    // explode (heavy per-row work, width-bounded consumers below) and
    // materialize tf ONCE (r14): the tot broadcast branch re-ran the
    // whole explode+aggregate — profiled as two concurrent 1.7 s
    // single-task stages
    val grams = graft.util.Partitioning.widenIfSingleSplit(
        Tables.documents(s, d).select(col("lang"), col("text")),
        s"$d/documents.parquet")
      .filter(length(col("text")) >= 3)
      .select(col("lang"),
        explode(expr("transform(sequence(1, length(text) - 2), " +
          "i -> substring(text, i, 3))")).as("gram"))
    val tf = grams.groupBy("lang", "gram").agg(count(lit(1)).as("c"))
      .cutLineage()
    val tot = tf.groupBy("lang").agg(sum(col("c")).as("n"),
      count(lit(1)).as("n_grams"))
    val p = col("c").cast("double") / col("n").cast("double")
    tf.join(broadcast(tot), Seq("lang"))
      .select(col("lang"), col("n"), col("n_grams"),
        round(-p * log(2.0, p), 6).as("term"))
      .groupBy("lang")
      .agg(first(col("n")).as("n_windows"),
        first(col("n_grams")).as("n_distinct_grams"),
        round(sum(col("term").cast(graft.util.Exact.Dec)).cast("double"), 6)
          .as("entropy_bits"))
  }
  private val q196Sql =
    """WITH grams AS (
      |  SELECT lang, substr(text, CAST(i AS INT), 3) AS gram
      |  FROM (SELECT lang, text,
      |      unnest(range(1, len(text) - 1)) AS i
      |    FROM documents WHERE len(text) >= 3)),
      |tf AS (SELECT lang, gram, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM grams GROUP BY 1, 2),
      |tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n,
      |    CAST(COUNT(*) AS BIGINT) AS n_grams
      |  FROM tf GROUP BY 1)
      |SELECT tf.lang, MIN(n) AS n_windows,
      |  MIN(n_grams) AS n_distinct_grams,
      |  ROUND(CAST(SUM(CAST(ROUND(-(CAST(c AS DOUBLE) / n)
      |    * log2(CAST(c AS DOUBLE) / n), 6) AS DECIMAL(28,6)))
      |    AS DOUBLE), 6) AS entropy_bits
      |FROM tf JOIN tot ON tot.lang = tf.lang
      |GROUP BY 1""".stripMargin

  /** q200: TOKEN-FREQUENCY GINI per source — vocabulary inequality
    * (a few tokens carrying most of the mass = templated/boilerplate
    * stream; with q142's Zipf slope and q166's TTR, the third
    * vocabulary-health lens, and the q125 income-Gini machinery
    * applied to term counts): one (source, term) frequency aggregate
    * with map-side partials, frequencies rank ascending per source
    * via the DISTRIBUTED grouped prefix sum (term tiebreak — never a
    * single-task window over a 10-billion-term vocabulary), Σi·f_i
    * folds integer-exact in decimal(38), G one fixed IEEE expression.
    * Exact, hash-checked. */
  private val q200: QFn = (s, d) => {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val tf = Tables.documents(s, d)
      .select(col("source"), explode(words(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("source", "term").agg(count(lit(1)).as("f"))
      .withColumn("one", lit(1L))
    val ranked = RankOps.withGroupedPrefixSum(tf, Seq("source"),
      Seq("f", "term"), valueCol = "one", sumCol = "rank0")
      .withColumn("i", col("rank0") + 1L)
    ranked.groupBy("source")
      .agg(count(lit(1)).as("n_terms"),
        sum((col("i") * col("f")).cast(dec38)).as("sif"),
        sum(col("f").cast(dec38)).as("sf"))
      .select(col("source"), col("n_terms"),
        round((lit(2.0) * col("sif").cast("double") -
          (col("n_terms") + 1).cast("double") * col("sf").cast("double"))
          / (col("n_terms").cast("double") * col("sf").cast("double")),
          6).as("token_gini"))
  }
  private val q200Sql =
    """WITH t AS (SELECT source,
      |    unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS f
      |  FROM t WHERE len(term) > 0 GROUP BY 1, 2),
      |ranked AS (
      |  SELECT source, f, CAST(ROW_NUMBER() OVER (PARTITION BY source
      |    ORDER BY f, term) AS BIGINT) AS i
      |  FROM tf)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms,
      |  ROUND((2.0 * CAST(SUM(CAST(i * f AS DECIMAL(38,0))) AS DOUBLE)
      |    - (COUNT(*) + 1.0) * CAST(SUM(CAST(f AS DECIMAL(38,0))) AS DOUBLE))
      |    / (CAST(COUNT(*) AS DOUBLE)
      |      * CAST(SUM(CAST(f AS DECIMAL(38,0))) AS DOUBLE)), 6)
      |    AS token_gini
      |FROM ranked GROUP BY 1""".stripMargin

  /** q239: TOP PHRASE BIGRAMS — the most frequent ADJACENT word pairs
    * across the corpus with their document reach (total occurrences +
    * containing docs): the phrase-mining complement to q123's PMI
    * (which scores doc-level co-occurrence anywhere in the document;
    * this demands adjacency — "machine learning" vs "machine … and …
    * learning"). Scale shape: bigrams build MAP-SIDE from the token
    * array (`zip_with` over two slices — no positions join, no
    * shuffle before the aggregate), one (bigram) hash aggregate with
    * map-side partials, bounded top-15 via TakeOrdered. Exact
    * integers; deterministic bigram tiebreak; hash-exact. */
  private val q239: QFn = (s, d) => {
    val arr = words(col("text"))
    val bi = Tables.documents(s, d)
      .select(col("doc_id"), arr.as("a"))
      .filter(size(col("a")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("a"), lit(1), size(col("a")) - 1),
        slice(col("a"), lit(2), size(col("a")) - 1),
        (x, y) => concat_ws(" ", x, y))).as("bigram"))
    bi.groupBy("bigram")
      .agg(count(lit(1)).as("n_total"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_total").desc, col("bigram").asc)
      .limit(15)
  }
  private val q239Sql =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS a
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id,
      |    unnest(a[1:len(a)-1]) || ' ' || unnest(a[2:len(a)]) AS bigram
      |  FROM toks WHERE len(a) >= 2)
      |SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n_total,
      |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      |FROM bi GROUP BY 1
      |ORDER BY n_total DESC, bigram ASC
      |LIMIT 15""".stripMargin

  /** q241: SENTENCE-LENGTH profile per source — sentences via
    * [.!?]+ segmentation, words per sentence, then per-source
    * sentence count, mean length, and max (the readability-adjacent
    * SEGMENTATION lens: q217 scores whole documents; this exposes
    * run-on-sentence sources a char-level metric hides). Scale shape:
    * segmentation and word counting are MAP-SIDE array ops on each
    * document; one (source) aggregate with map-side partials. Counts
    * exact ints; mean via the exact integer-sum / count divide at
    * 6 dp. Hash-exact (tokenizer parity: the same split regexes on
    * both engines — the q123 convention). */
  private val q241: QFn = (s, d) => {
    val sentences = Tables.documents(s, d)
      .select(col("source"),
        explode(split(col("text"), "[.!?]+")).as("sent"))
      .select(col("source"), trim(col("sent")).as("sent"))
      .filter(length(col("sent")) > 0)
      .select(col("source"), size(words(col("sent"))).as("n_words"))
    sentences.groupBy("source")
      .agg(count(lit(1)).as("n_sentences"),
        round(sum(col("n_words").cast("long")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_words"),
        max(col("n_words")).as("max_words"))
      .orderBy("source")
  }
  private val q241Sql =
    """WITH sent AS (
      |  SELECT source, trim(s) AS sent FROM (
      |    SELECT source, unnest(string_split_regex(text, '[.!?]+')) AS s
      |    FROM documents) t
      |  WHERE len(trim(s)) > 0),
      |sw AS (
      |  SELECT source,
      |    len(string_split_regex(trim(sent), '\s+')) AS n_words
      |  FROM sent)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sentences,
      |  ROUND(CAST(SUM(CAST(n_words AS BIGINT)) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS mean_words,
      |  CAST(MAX(n_words) AS INT) AS max_words
      |FROM sw GROUP BY 1 ORDER BY source""".stripMargin

  /** q251: DEDUP SURVIVORSHIP attribution — when exact duplicates
    * collapse (q30's min-doc_id rule), which SOURCE keeps the copy and
    * which sources lose theirs: (source_kept, source_dropped, n_dropped)
    * — the provenance question a corpus audit asks after dedup ("is
    * crawl-B just a mirror of crawl-A?"), complementing q213's
    * per-source dup rate (which says HOW MUCH, not TO WHOM). Scale
    * shape: one fingerprint groupBy (map-side partial min/count), the
    * survivor table joins the duplicates CO-PARTITIONED on the
    * fingerprint, output is |sources|²-bounded. Exact integers;
    * hash-exact. */
  private val q251: QFn = (s, d) => {
    val fp = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        md5(col("text").cast("binary")).as("fp"))
    val survivor = fp.groupBy("fp")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
    val kept = fp.select(col("doc_id").as("keep_id"),
      col("source").as("source_kept"))
    fp.join(survivor, Seq("fp"))
      .filter(col("doc_id") =!= col("keep_id"))
      .join(kept, Seq("keep_id"))
      .groupBy(col("source_kept"), col("source").as("source_dropped"))
      .agg(count(lit(1)).as("n_dropped"))
      .orderBy("source_kept", "source_dropped")
  }
  private val q251Sql =
    """WITH fp AS (
      |  SELECT doc_id, source, md5(text) AS fp FROM documents),
      |survivor AS (
      |  SELECT fp, MIN(doc_id) AS keep_id, COUNT(*) AS n
      |  FROM fp GROUP BY 1 HAVING COUNT(*) > 1),
      |kept AS (
      |  SELECT doc_id AS keep_id, source AS source_kept FROM fp)
      |SELECT source_kept, d.source AS source_dropped,
      |  CAST(COUNT(*) AS BIGINT) AS n_dropped
      |FROM fp d
      |JOIN survivor USING (fp)
      |JOIN kept USING (keep_id)
      |WHERE d.doc_id <> keep_id
      |GROUP BY 1, 2 ORDER BY source_kept, source_dropped""".stripMargin

  /** q258: PREFIX-KEY DUPLICATE GROUPS per source — docs sharing
    * their first 60 characters (the cheap URL-prefix/boilerplate
    * dedup screen run BEFORE shingling: one exact groupBy on a fixed
    * 60-byte key vs q31's posting join; catches head-duplication the
    * whole-text hash of q30 misses when tails diverge). Scale shape:
    * one key-sized exchange builds the dup-key set, a semi join tags
    * members, per-source rollup is dimension-sized. Hash-exact. */
  private val q258: QFn = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        substring(col("text"), 1, 60).as("pfx"))
    val dupKeys = docs.groupBy("pfx")
      .agg(count(lit(1)).as("grp"))
      .filter(col("grp") > 1)
    val members = docs.join(dupKeys, Seq("pfx"), "left_semi")
    val perSource = members.groupBy("source")
      .agg(count(lit(1)).as("n_dup_docs"),
        countDistinct(col("pfx")).as("n_groups"))
    docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .join(perSource, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_dup_docs"), lit(0L)).as("n_dup_docs"),
        coalesce(col("n_groups"), lit(0L)).as("n_groups"),
        round(coalesce(col("n_dup_docs"), lit(0L)).cast("double") /
          col("n_docs").cast("double"), 6).as("dup_rate"))
      .orderBy("source")
  }
  private val q258Sql =
    """WITH docs AS (
      |  SELECT doc_id, source, substr(text, 1, 60) AS pfx
      |  FROM documents),
      |dup AS (
      |  SELECT pfx FROM docs GROUP BY 1 HAVING COUNT(*) > 1),
      |members AS (
      |  SELECT source, pfx FROM docs
      |  WHERE pfx IN (SELECT pfx FROM dup)),
      |per AS (
      |  SELECT source, COUNT(*) AS n_dup_docs,
      |    COUNT(DISTINCT pfx) AS n_groups
      |  FROM members GROUP BY 1)
      |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COALESCE(MAX(per.n_dup_docs), 0) AS BIGINT) AS n_dup_docs,
      |  CAST(COALESCE(MAX(per.n_groups), 0) AS BIGINT) AS n_groups,
      |  ROUND(CAST(COALESCE(MAX(per.n_dup_docs), 0) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate
      |FROM docs d LEFT JOIN per ON d.source = per.source
      |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** q263: CROSS-SOURCE NEAR-DUP MATRIX — q31's exact trigram-Jaccard
    * pair set rolled up by UNORDERED source pair (which feeds are
    * mirroring which: the contamination-flow view q213's per-source
    * rate hides — a source can have a low dup rate yet be the sink of
    * one specific mirror). Scale shape: the pair set is the PPJoin
    * output (never n²), two dimension-sized source joins, a
    * sources²-bounded rollup. Hash-exact (shares q31's oracle CTE). */
  private val q263: QFn = (s, d) => {
    val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
    q31(s, d).select("doc_a", "doc_b")
      .join(src.select(col("doc_id").as("doc_a"),
        col("source").as("src_a")), Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"),
        col("source").as("src_b")), Seq("doc_b"))
      .groupBy(least(col("src_a"), col("src_b")).as("source_lo"),
        greatest(col("src_a"), col("src_b")).as("source_hi"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("source_lo", "source_hi")
  }
  private val q263Sql =
    s"""WITH pairs AS ($q31Sql),
       |sp AS (
       |  SELECT LEAST(da.source, db.source) AS source_lo,
       |    GREATEST(da.source, db.source) AS source_hi
       |  FROM pairs p
       |  JOIN documents da ON p.doc_a = da.doc_id
       |  JOIN documents db ON p.doc_b = db.doc_id)
       |SELECT source_lo, source_hi, CAST(COUNT(*) AS BIGINT) AS n_pairs
       |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, QFn] = Map(
    "q263_cross_source_dups" -> q263,
    "q258_prefix_dup_groups" -> q258,
    "q251_dedup_survivorship" -> q251,
    "q241_sentence_length" -> q241,
    "q239_bigram_phrases" -> q239,
    "q192_token_sequences" -> q192,
    "q196_char_entropy" -> q196,
    "q200_token_gini" -> q200,
    "q166_ttr" -> q166,
    "q156_jsd_drift" -> q156,
    "q157_gopher_rules" -> q157,
    "q158_bigram_surprisal" -> q158,
    "q152_heaps_beta" -> q152,
    "q150_length_lognormal" -> q150,
    "q142_zipf_slope" -> q142,
    "q182_vocab_overlap" -> q182,
    "q138_epoch_plan" -> q138,
    "q132_bm25" -> q132,
    "q133_contamination" -> q133,
    "q116_bpe_fertility" -> q116,
    "q201_unigram_fertility" -> q201,
    "q207_lang_source_residuals" -> q207,
    "q210_cluster_sizes" -> q210,
    "q213_dup_rate_by_source" -> q213,
    "q217_readability" -> q217,
    "q219_vocab_growth" -> q219,
    "q117_langid_profiles" -> q117,
    "q123_pmi_collocations" -> q123,
    "q30_dedup_exact" -> q30,
    "q31_ngram_jaccard" -> q31,
    "q36_lang_id" -> q36,
    "q37_quality_score" -> q37,
    "q38_token_count" -> q38,
    "q39_fingerprint" -> q39,
    "q53_top_terms" -> q53,
    "q54_source_profile" -> q54,
    "q59_tfidf" -> q59,
    "q61_stratified_sample" -> q61,
    "q62_token_packing" -> q62,
    "q65_chunk_spans" -> q65,
    "q66_dedup_clusters" -> q66,
    "q67_weighted_sample" -> q67,
    "q68_mixing_planner" -> q68,
    "q69_dedup_clusters_star" -> q69,
    "q75_heavy_hitters" -> q75,
    "q76_decontaminate" -> q76,
    "q77_repetition" -> q77,
    "q80_normalize" -> q80,
    "q82_dup_spans" -> q82,
    "q83_token_rarity" -> q83,
    "q84_compress_ratio" -> q84,
    "q94_unigram_surprisal" -> q94,
    "q99_temperature_mix" -> q99,
    "q101_fuzzy_join" -> q101,
    "q106_dsir_weights" -> q106,
    "q112_dsir_resample" -> q112)

  val oracleSql: Map[String, String] = Map(
    "q263_cross_source_dups" -> q263Sql,
    "q258_prefix_dup_groups" -> q258Sql,
    "q251_dedup_survivorship" -> q251Sql,
    "q241_sentence_length" -> q241Sql,
    "q239_bigram_phrases" -> q239Sql,
    "q207_lang_source_residuals" -> q207Sql,
    "q210_cluster_sizes" -> q210Sql,
    "q213_dup_rate_by_source" -> q213Sql,
    "q217_readability" -> q217Sql,
    "q219_vocab_growth" -> q219Sql,
    "q166_ttr" -> q166Sql,
    "q156_jsd_drift" -> q156Sql,
    "q157_gopher_rules" -> q157Sql,
    "q158_bigram_surprisal" -> q158Sql,
    "q152_heaps_beta" -> q152Sql,
    "q150_length_lognormal" -> q150Sql,
    "q142_zipf_slope" -> q142Sql,
    "q182_vocab_overlap" -> q182Sql,
    "q196_char_entropy" -> q196Sql,
    "q200_token_gini" -> q200Sql,
    "q138_epoch_plan" -> q138Sql,
    "q132_bm25" -> q132Sql,
    "q133_contamination" -> q133Sql,
    "q30_dedup_exact" -> q30Sql,
    "q31_ngram_jaccard" -> q31Sql,
    "q36_lang_id" -> q36Sql,
    "q37_quality_score" -> q37Sql,
    "q38_token_count" -> q38Sql,
    "q39_fingerprint" -> q39Sql,
    "q53_top_terms" -> q53Sql,
    "q54_source_profile" -> q54Sql,
    "q59_tfidf" -> q59Sql,
    "q61_stratified_sample" -> q61Sql,
    "q62_token_packing" -> q62Sql,
    "q65_chunk_spans" -> q65Sql,
    "q66_dedup_clusters" -> q66Sql,
    "q67_weighted_sample" -> q67Sql,
    "q68_mixing_planner" -> q68Sql,
    // star contraction reaches the same fixpoint as the propagation
    // path AND the recursive-CTE closure — three algorithms, one
    // oracle
    "q69_dedup_clusters_star" -> q66Sql,
    "q76_decontaminate" -> q76Sql,
    "q77_repetition" -> q77Sql,
    "q80_normalize" -> q80Sql,
    "q82_dup_spans" -> q82Sql,
    "q83_token_rarity" -> q83Sql,
    "q94_unigram_surprisal" -> q94Sql,
    "q99_temperature_mix" -> q99Sql,
    "q101_fuzzy_join" -> q101Sql,
    "q106_dsir_weights" -> q106Sql,
    "q117_langid_profiles" -> q117Sql,
    "q123_pmi_collocations" -> q123Sql,
    "q112_dsir_resample" -> q112Sql)
}
