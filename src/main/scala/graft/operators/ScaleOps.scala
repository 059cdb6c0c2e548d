package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** The 100-TB scale paths: sketch/LSH-based near-duplicate detection
  * and approximate search. These trade the exact operators' quadratic
  * or full-shuffle behavior for banded bucket joins whose shuffle
  * volume is O(n · bands).
  *
  * All randomness is derived from xxhash64 with fixed integer seeds —
  * fully deterministic, so results are stable across runs (the driver
  * runs a rows-only check where DuckDB cannot express the hashing;
  * `q32_minhash_pairs` ends in an exact-Jaccard verification so its
  * final output IS oracle-checkable and shares q31's oracle).
  */
object ScaleOps {

  type QFn = (SparkSession, String) => DataFrame

  private val NumHashes = 64
  private val BandSize = 4 // 16 bands × 4 rows: P(candidate) @ j=0.5 ≈ 0.65, @ j=0.9 ≈ 1.0
  private val NumBands = NumHashes / BandSize

  private def words(c: Column): Column = split(trim(c), "\\s+")

  /** MinHash + LSH banded near-dup pairs, exact-Jaccard verified.
    *
    * The signature build is MAP-ONLY: `trigram_hashes` (distinct
    * shingle hashes) → `minhash_bands` (one-permutation-hashing slot
    * minima + 16 band signatures, one generated loop — see
    * functions/MinHashBands.scala) runs in-row on the document scan.
    * The previous formulation exploded the shingle postings and ran
    * two groupBy shuffles to the same signatures; at 100 TB, where no
    * postings cache exists, those were two full-data exchanges.
    *
    * Plan shape: map-only signatures → explode 16 band keys per doc →
    * shuffle on (band, band-signature) → within-bucket pair gen →
    * distinct candidate pairs → exact verify via the two shingle sets.
    * Shuffle volume is 16 rows/doc regardless of document size; the
    * quadratic step only ever runs inside a bucket. */
  private val q32: QFn = (s, d) => {
    val e = TextOps.gramHashes(s, d) // cached flat postings (exact verify)
    // cached (16 flat rows/doc): both sides of the bucket self-join
    // read the signatures; without the cache the map-only build would
    // run twice. Memoized per (session, dir), releasable.
    val bands = graft.util.DfCache.getOrBuild(s, s"bands32:$d") {
      val b = Tables.documents(s, d)
        .select(col("doc_id"), graft.functions.GraftFunctions.trigramHashes(
          words(col("text"))).as("grams"))
        // docs with no shingles can't pair (and would otherwise all
        // collide on the empty signature)
        .filter(size(col("grams")) > 0)
        .select(col("doc_id"), posexplode(
          graft.functions.GraftFunctions.minhashBands(col("grams"), NumHashes, BandSize)))
        // null = all-absent band (no distinguishing info; a shared
        // constant bucket would pair every short doc quadratically)
        .filter(col("col").isNotNull)
        .select(col("doc_id"), col("pos").as("band"), col("col").as("bucket"))
        .cache()
      b.count()
      b
    }
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    TextOps.verifyJaccard(e, cand, 0.5)
  }

  /** SimHash 64-bit fingerprints: per bit position, sign of the sum of
    * ±1 votes from each distinct word's hash. Output is the
    * fingerprint table (the building block for hamming-distance
    * dedup, see q43). */
  private val q33: QFn = (s, d) => {
    // token hashes via a (cheap, ~|words|) higher-order transform; the
    // O(|words|·64) bit-vote loop runs in the native codegen'd
    // SimHash64 expression (graft.functions) — the same logic as a
    // nested aggregate/zip_with HOF expression is ~100× slower
    val tokens = transform(
      array_distinct(split(trim(lower(col("text"))), "\\s+")),
      t => xxhash64(t))
    Tables.documents(s, d)
      .select(col("doc_id"), graft.functions.GraftFunctions.simhash64(tokens).as("simhash"))
  }

  /** SimHash near-dup pairs via 4×16-bit band join + hamming verify
    * (bit_count(a^b)) — same banded-bucket scale shape as q32. At
    * hamming ≤ 3 the 4-band split is EXACT by pigeonhole: 3 differing
    * bits cannot touch all 4 bands, so every qualifying pair shares at
    * least one identical band. */
  private val q43: QFn = (s, d) => {
    val fp = graft.util.DfCache.getOrBuild(s, s"simhash:$d") {
      val f = q33(s, d).cache(); f.count(); f
    }
    val bands = fp.select(col("doc_id"), col("simhash"),
        posexplode(expr(
          "transform(sequence(0, 3), b -> shiftright(simhash, b * 16) & 65535)")))
      .select(col("doc_id"), col("simhash"), col("pos").as("band"), col("col").as("bucket"))
    // evaluate each colliding pair ONLY at its first colliding band
    // (earlier 16-bit groups of the xor must all be nonzero) — no
    // duplicate hamming evaluations and no distinct exchange. Natural
    // text gives BIASED simhash bits, so band buckets collide far
    // more than uniformly; filtering before any exchange matters.
    val xor = col("x.simhash").bitwiseXOR(col("y.simhash"))
    val firstCollision =
      (col("x.band") < 1 || xor.bitwiseAND(lit(65535L)) =!= 0) &&
        (col("x.band") < 2 || shiftright(xor, 16).bitwiseAND(lit(65535L)) =!= 0) &&
        (col("x.band") < 3 || shiftright(xor, 32).bitwiseAND(lit(65535L)) =!= 0)
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .filter(firstCollision && bit_count(xor) <= 3)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(xor).as("hamming"))
  }

  /** Random-hyperplane LSH ANN: 8 seeded ±1 hyperplanes → 256 buckets;
    * probes only compare against their own bucket. The scale path for
    * q34 — the brute-force pass becomes a bucket-local pass. */
  private val q35: QFn = (s, d) => {
    val emb = Tables.embeddings(s, d)
    // sign bit j = dot(v, h_j) > 0 with h_j[k] = ±1 from xxhash64(j,k)
    // — one codegen hyperplane_bits pass (bit-equal to the
    // aggregate/zip_with SQL formulation, which runs interpreted at
    // planes×dims lambda dispatches per row; parity spec-pinned)
    val withBucket = emb.withColumn("bucket",
      graft.functions.GraftFunctions.hyperplaneBits(col("embedding"), 0, 8))
    val probes = withBucket.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"), col("bucket"))
    val cands = withBucket
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"), col("bucket"))
    // codegen cosine (native expression) — the aggregate/zip_with HOF
    // formulation of the same dot is interpreted and ~100× slower
    val scored = probes.join(cands, Seq("bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        graft.functions.GraftFunctions.cosineSim(col("pe"), col("ne")))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("probe_id"), col("neighbor_id"), col("rnk"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Approximate distinct counting (HLL++): the 100-TB substitute for
    * q08's exact COUNT(DISTINCT). Sketch internals differ from
    * DuckDB's, so rows-only here; the spec asserts <5% relative error
    * against the exact count. */
  private val q42: QFn = (s, d) => {
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
        count(lit(1)).as("n_events"))
  }

  /** IVF-style ANN: coarse quantization by per-label mean centroids
    * (deterministic stand-in for a k-means train step, which at 100 TB
    * would run on a sample), nprobe=4 — each probe scans only the
    * inverted lists of its 4 nearest centroids instead of the full
    * collection. Rows-only (seeded/training-dependent); the spec pins
    * shape and determinism, and recall is measured against exact q34. */
  /** IVF search core: assign all vectors to their nearest coarse
    * centroid (inverted lists), route each probe to its `nprobe`
    * nearest centroids, scan only those lists. Shared by q45
    * (label-mean centroids) and q49 (k-means-trained centroids). */
  private[operators] def ivfSearch(emb: DataFrame, cents: DataFrame,
      nprobe: Int): DataFrame = {
    // all similarity scoring via the native codegen cosine_sim — the
    // aggregate/zip_with HOF dot is interpreted and ~100× slower
    val cos = graft.functions.GraftFunctions.cosineSim _
    // assign every vector to its nearest centroid (cosine): a max_by
    // AGGREGATION over the n·k scored rows — where a row_number
    // window would shuffle-and-sort all n·k rows. struct(sim,
    // -cent_id) reproduces the (sim desc, cent_id asc) tiebreak. The
    // aggregate carries ONLY narrow columns; the embedding re-joins
    // on vec_id (round-11 fix: a wide first(embedding) buffer bars
    // codegen hash agg and the ObjectHashAggregate fallback sorts
    // every n·k scored row WITH its array — see VectorIndex.assign)
    val bestCent = graft.util.Partitioning.widenForExplosion(emb)
      .join(broadcast(cents),
        col("vec_id").isNotNull) // cross join against the tiny centroid set
      .withColumn("sim", cos(col("embedding"), col("cvec")))
      .select("vec_id", "sim", "cent_id")
      .groupBy("vec_id")
      .agg(max_by(col("cent_id"), struct(col("sim"), -col("cent_id"))).as("cent_id"))
    val assigned = emb.join(bestCent, Seq("vec_id"))
      .select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ne"), col("cent_id"))
    // probes search their nprobe nearest centroid lists
    val wProbe = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("cent_id").asc)
    val probeLists = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      .join(broadcast(cents), col("probe_id").isNotNull)
      .withColumn("sim", cos(col("pe"), col("cvec")))
      .withColumn("rk", row_number().over(wProbe))
      .filter(col("rk") <= nprobe)
      .select(col("probe_id"), col("pe"), col("cent_id"))
    val wTop = Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    probeLists.join(assigned, Seq("cent_id"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine", cos(col("pe"), col("ne")))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= 3)
      .select(col("probe_id"), col("neighbor_id"), col("rnk"),
        round(col("cosine"), 6).as("cosine"))
  }

  private val q45: QFn = (s, d) => {
    val emb = Tables.embeddings(s, d)
    // coarse centroids without a train step: mean vector per label
    val cents = emb
      .select(col("label"), posexplode(col("embedding")))
      .groupBy("label", "pos").agg(avg(col("col").cast("double")).as("c"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("label").as("cent_id"),
        transform(col("pc"), p => p.getField("c")).as("cvec"))
    ivfSearch(emb, cents, nprobe = 4)
  }

  /** IVF with TRAINED coarse centroids: distributed Lloyd's k-means
    * (KMeansVec, k=10, 5 iterations) replaces q45's label means —
    * the real index-build path, where cluster geometry adapts to the
    * data instead of to a labeling. Rows-only (training-dependent);
    * the spec pins determinism and compares recall against exact
    * q34. */
  private val q49: QFn = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val cents = KMeansVec.centroidsDF(s, KMeansVec.train(emb, k = 10, iters = 5))
    ivfSearch(emb, cents, nprobe = 4)
  }

  /** Embedding-cosine near-dup pairs at scale: random-hyperplane LSH
    * candidate generation + exact-decimal cosine verify. 16 bands × 2
    * hyperplanes (32 seeded ±1 planes): a pair at the q46 threshold
    * (cosine 0.4 → P[same sign] ≈ 0.63) collides in ≥1 band with
    * p ≈ 1 − (1 − 0.63²)¹⁶ ≈ 0.9997, and recall rises steeply above
    * the threshold. The verify step removes all false positives, so
    * output ⊆ q46 with near-1 recall (measured in the spec).
    *
    * Plan shape: the only full-data exchange is the 16-rows-per-vector
    * band table (O(n·bands), arrays carried along). Within-bucket
    * candidate pairs are generated AND cosine-filtered inside one
    * codegen join stage — they never hit an exchange, so the loose
    * 2-bit buckets (needed for recall at this low threshold) cannot
    * turn into a quadratic shuffle; only the handful of survivors
    * reaches `distinct` + the exact-decimal recompute. */
  private val q47: QFn = (s, d) =>
    cosinePairsLsh(Tables.embeddings(s, d), 0.4, s"bands47:$d")

  /** [[cosinePairsLsh]] with a SELECTIVE profile for high-cosine
    * dedup: at t = 0.5 (P[same sign] = 2/3) a 3-bit band still
    * collides with p³ ≈ 0.30 per band → ≥1 of 21 bands with
    * p ≈ 1 − (1 − 0.30)²¹ ≈ 0.9994 at the threshold (→ 1 above it),
    * while an unrelated pair (cosine ≈ 0) collides per band with only
    * 2⁻³ vs the loose profile's 2⁻² — buckets are 2× more selective
    * exactly where a high-threshold dedup would drown q47's profile
    * in near-orthogonal candidates. (0.5 is the highest threshold the
    * test corpus populates — its max pairwise cosine is ≈0.6.)
    * Oracle-checked against the exact SQL at 0.5 (same shape as
    * q46's) — so the profile's recall on this data is pinned to 1,
    * not sampled. */
  private val q64: QFn = (s, d) =>
    cosinePairsLsh(Tables.embeddings(s, d), 0.5, s"bands64:$d",
      bandBits = 3, numBands = 21, seedBase = 300)

  /** The LSH path behind [[VectorOps.cosinePairs]]'s size guard, q47
    * (2-bit bands, recall profile for low thresholds), and q64 (4-bit
    * bands, selective profile for high-threshold dedup). `cacheKey`
    * memoizes the band table per (session, key) — both sides of the
    * self-join read it, so it must be cached or the signature build
    * runs twice. `bandBits × numBands ≤ 64`: all sign bits pack into
    * one long from ONE codegen `hyperplane_bits` pass. */
  private[operators] def cosinePairsLsh(emb: DataFrame, t: Double,
      cacheKey: String, bandBits: Int = 2, numBands: Int = 16,
      seedBase: Int = 200): DataFrame = {
    require(bandBits >= 1 && bandBits * numBands <= 64,
      s"bandBits=$bandBits × numBands=$numBands exceeds one packed long")
    val s = emb.sparkSession
    val planes = bandBits * numBands
    val bucketMask = (1L << bandBits) - 1L
    // band b's bucket: sign bits of dots with hyperplanes
    // [b·bandBits, (b+1)·bandBits); plane j's components are ±1 from
    // xxhash64(seedBase+j, k). All sign bits come from ONE codegen
    // hyperplane_bits pass; each band slices its bits out of the
    // packed signature. cached: both sides of the self-join read
    // these numBands·n rows. Memoized per (session, cacheKey).
    val bands = graft.util.DfCache.getOrBuild(s, cacheKey) {
      // widen first (r14): the embeddings table arrives as ONE scan
      // split at bench scale, so the cached band table landed in ONE
      // partition — and a single-partition side satisfies any
      // distribution, so the band self-join, collision filter, AND
      // cosine scoring all fused into ONE serial task (profiled: q47 =
      // one 2.1 s single-task stage). The widen costs one narrow
      // (vec_id, embedding) exchange and parallelizes the whole
      // collision pipeline at session width.
      // LIGHT rows only (r14): the band table used to carry the full
      // embedding so the cosine filter could run inside the band join
      // — which shipped every embedding ×numBands through BOTH sides
      // of the join exchange (the dim-scaled payload shuffle flagged
      // in r13). Candidates now leave the band join as id pairs and
      // re-attach embeddings by id inside verifyCosine (the shape
      // every other verify path already uses), so the ×numBands
      // exchange moves 4 longs per row.
      val b = graft.util.Partitioning.widenForExplosion(emb)
        .withColumn("sig", graft.functions.GraftFunctions
          .hyperplaneBits(col("embedding"), seedBase, planes))
        .select(col("vec_id"), col("sig"), posexplode(expr(
          s"transform(sequence(0, ${numBands - 1}), " +
            s"b -> shiftright(sig, b * $bandBits) & $bucketMask)")))
        .select(col("vec_id"), col("sig"),
          col("pos").as("band"), col("col").as("bucket"))
        .cache()
      b.count()
      b
    }
    val x = bands.select(col("vec_id").as("vec_a"),
      col("sig").as("sa"), col("band"), col("bucket"))
    val y = bands.select(col("vec_id").as("vec_b"),
      col("sig").as("sb"), col("band"), col("bucket"))
    // Each colliding pair is evaluated ONLY in its first colliding
    // band: band b' collides ⇔ the bandBits-wide group b' of
    // (sa ^ sb) is all-zero ⇔ group b' of ~(sa ^ sb) is all-one ⇔
    // AND-folding each group of ~(sa ^ sb) down to its low bit leaves
    // that bit set. So "no band before `band` collides" is: fold,
    // mask the group low bits, restrict to the low band·bandBits
    // bits, require zero — a handful of codegen bit ops that both
    // dedup the work (a pair colliding in k bands was cosine-scored
    // k times) and remove the `distinct` exchange entirely.
    val folded = (0 until bandBits)
      .map(sh => if (sh == 0) "(~(sa ^ sb))"
                 else s"shiftright(~(sa ^ sb), $sh)")
      .mkString(" & ")
    val groupLowBits = (0 until numBands)
      .map(i => 1L << (i * bandBits)).sum
    val firstCollision = expr(
      s"(($folded) & ${groupLowBits}L" +
        s" & (shiftleft(cast(1 as bigint), band * $bandBits) - 1)) = 0")
    // the in-band cosine pre-filter moved into verifyCosine's phase 1
    // (same t − 1e-6 bound over the re-attached embeddings): identical
    // survivor set, one filter instead of the same filter twice
    val cand = x.join(y, Seq("band", "bucket"))
      .filter(col("vec_a") < col("vec_b") && firstCollision)
      .select("vec_a", "vec_b")
    VectorOps.verifyCosine(emb, cand, t)
  }

  /** Approximate quantiles (Greenwald-Khanna sketch): the 100-TB
    * substitute for q16's exact percentiles — mergeable sketches, one
    * pass, bounded memory. Sketch internals differ from DuckDB's →
    * rows-only; spec asserts <1% relative error vs exact. */
  private val q44: QFn = (s, d) => {
    Tables.orders(s, d)
      .groupBy("o_orderstatus")
      .agg(
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("approx_p50"),
        expr("approx_percentile(o_totalprice, 0.9, 10000)").as("approx_p90"),
        count(lit(1)).as("n"))
  }

  /** q86: product-quantized ANN (VectorPQ) — the MEMORY scale path
    * next to IVF's IO scale path. Codebooks train on the bounded
    * hash-rank sample, every vector encodes to m=16 4-bit
    * codes (32× smaller than the raw floats), candidates rank by
    * asymmetric distance FROM THE CODES ALONE (the raw embedding
    * table is touched only for the final exact-decimal top-3 rerank
    * of the ADC top-30). Rows-only: the test embeddings are
    * near-orthogonal random vectors — neighbor-cosine gaps (~0.02)
    * sit BELOW PQ's quantization distortion, the hardest possible
    * regime — so exact-oracle equality is not honest here; the spec
    * pins determinism and measured recall vs exact q34 instead
    * (real-corpus embeddings cluster, where PQ recall is far higher). */
  private val q86: QFn = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val cb = VectorPQ.train(emb, m = 16, ksub = 16, iters = 5)
    val codes = VectorPQ.encode(emb, cb)
    val probes = emb.filter(col("vec_id") < 5)
    val cand = VectorPQ.searchADC(probes, codes, cb, k = 30)
      .select("probe_id", "neighbor_id")
    VectorOps.exactTopK(emb, cand, 3)
  }

  /** Deterministic on-disk location for `dir`'s prebuilt IVF-PQ index.
    * Keyed on the embeddings file's length + mtime (a regenerated
    * corpus can never silently reuse a stale index) and on a layout
    * version (bumped if the index format changes). */
  def pqIndexPath(s: SparkSession, dir: String): String = {
    val st = org.apache.hadoop.fs.FileSystem
      .get(new java.net.URI(dir), s.sparkContext.hadoopConfiguration)
      .getFileStatus(new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet"))
    val key = Integer.toHexString(scala.util.hashing.MurmurHash3
      .stringHash(s"$dir:${st.getLen}:${st.getModificationTime}"))
    s"${sys.props("java.io.tmpdir")}/graft_pqidx_v2_$key"
  }

  /** Build the production-config IVF-PQ index for `dir` once (OPQ
    * rotation + residual encoding + 4-bit packed lists) and return
    * its path. The bench warms this up BEFORE timing q91, so the q91
    * row is a stable SEARCH-path number — the index-build cost
    * (train + encode) is q86's row and is paid once per corpus, not
    * per query. */
  def ensurePqIndex(s: SparkSession, dir: String): String = {
    val path = pqIndexPath(s, dir)
    if (!VectorIndex.isPQ(s, path))
      VectorIndex.buildPQ(Tables.embeddings(s, dir), path, k = 10, m = 16,
        ksub = 16, iters = 5, residual = true, packed = true, opq = true)
    path
  }

  /** q91: ANN search over the PREBUILT persisted IVF-PQ index — what
    * every query after the first pays at 100 TB: centroid routing, a
    * partition-pruned scan of the packed code lists, broadcast-LUT
    * ADC, and an exact rerank of the ADC top-(rf·k). Production
    * config nprobe=8, rerankFactor=32 (round-9 A/B: on the
    * near-orthogonal test embeddings the dominant loss was the
    * SHALLOW rerank pool, not routing or OPQ — rf 4→32 moved
    * recall@10 from 0.53 to 0.91 at unchanged ADC scan cost; the pool
    * is rf·k point lookups per probe, trivial at any scale). Rows-only
    * (training-dependent); the packed-index spec pins plain ≡ packed
    * and the shared-oracle q87 pins the rerank discipline. */
  private val q91: QFn = (s, d) => {
    val path = ensurePqIndex(s, d)
    val emb = Tables.embeddings(s, d)
    val probes = emb.filter(col("vec_id") < 5)
    VectorIndex.searchPQ(s, path, probes, emb, nprobe = 8, k = 3,
      rerankFactor = 32)
  }

  /** q87: INT8 scalar-quantized ANN — the LOW-DISTORTION compression
    * point (4×, ~0.4%/component error) where PQ's 32× is overkill.
    * The candidate scan reads only the tinyint code column —
    * bandwidth, not FLOPs, is the 100 TB brute-force cost — and the
    * exact-decimal top-3 rerank of the SQ top-12 reproduces q34's
    * output: measured identical at every SF (the margin holds because
    * SQ8 dot error is ~0.002 while the rank-3→rank-13 cosine gap in
    * the data is ≥0.01), so it SHARES q34's oracle — a hash match
    * pins SQ8 recall on this data at exactly 1. */
  private val q87: QFn = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val codes = VectorPQ.encodeSQ8(emb)
    val probes = emb.filter(col("vec_id") < 5)
    val cand = VectorPQ.searchSQ8(probes, codes, k = 12)
      .select("probe_id", "neighbor_id")
    VectorOps.exactTopK(emb, cand, 3)
  }

  /** q92: cluster-balanced semantic mixing — the SemDeDup-adjacent
    * "topic rebalance" a training pipeline runs between dedup and
    * sampling: cluster the embedding space with the (sample-trained)
    * k-means, give every cluster an EQUAL share of the output corpus
    * (q68's equal-share planner over LEARNED semantic cells instead
    * of source labels), and keep vectors through q67's deterministic
    * md5-threshold rule. Output: the per-cluster mixing report
    * (cent_id, n, keep_rate, n_kept).
    *
    * Scale shape: one broadcast-scored assignment pass (n·k in-row
    * codegen cosines, map-side max_by), two k-row aggregates, a
    * broadcast rate join, and a map-side hash filter — the only
    * data-sized exchange is the assignment groupBy on vec_id.
    * Rows-only (centroids are trained); the spec pins determinism,
    * conservation, and that rebalancing never widens the cluster-size
    * spread. */
  private val q92: QFn = (s, d) => {
    val cos = graft.functions.GraftFunctions.cosineSim _
    val emb = Tables.embeddings(s, d)
    val cents = KMeansVec.centroidsDF(s,
      KMeansVec.train(emb, k = 8, iters = 3))
    // cached: counts (→ rates) and kept both read the assignment, and
    // without the cache the n·k broadcast-scored pass would run twice
    // — (vec_id, cent_id) longs are far cheaper to hold than rescore
    val assigned = emb.join(broadcast(cents), col("vec_id").isNotNull)
      .withColumn("sim", cos(col("embedding"), col("cvec")))
      .groupBy("vec_id")
      .agg(max_by(col("cent_id"), struct(col("sim"), -col("cent_id")))
        .as("cent_id"))
      .cache()
    val counts = assigned.groupBy("cent_id").agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum(col("n")).as("total"),
      count(lit(1)).as("nc"))
    val rates = counts.crossJoin(broadcast(totals))
      .withColumn("kr",
        least(lit(1.0), (col("total").cast("double") / col("nc")) / col("n")))
      .select(col("cent_id"), col("n"), col("kr"))
    val kept = assigned.join(broadcast(rates.select("cent_id", "kr")),
        Seq("cent_id"))
      .filter(TextOps.keepByRate(col("vec_id"), col("kr")))
      .groupBy("cent_id").agg(count(lit(1)).as("n_kept"))
    rates.join(kept, Seq("cent_id"), "left")
      .select(col("cent_id"), col("n"), round(col("kr"), 6).as("keep_rate"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy("cent_id")
  }

  /** q90: pairwise source-vocabulary overlap through the KMV/theta
    * set sketch ([[SetSketch]]) — distinct-set UNION / INTERSECTION /
    * Jaccard between every pair of sources from ONE partial-agg
    * sketch-building pass (segments² algebra on KB sketches, never
    * data²). On the test corpus every source vocabulary is far below
    * k=256, so the sketches are EXACT and the output carries a real
    * DuckDB oracle; beyond k the same query degrades gracefully to
    * (k−1)/θ estimation (spec pins the estimation path separately on
    * synthetic data that overflows k). */
  private val q90: QFn = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("source"), explode(words(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
    SetSketch.pairwiseOverlap(toks, "source", xxhash64(col("tok")), k = 256)
  }
  private val q90Sql =
    """WITH t AS (
      |  SELECT DISTINCT source, tok FROM (
      |    SELECT source,
      |      unnest(string_split_regex(trim(text), '\s+')) AS tok
      |    FROM documents)
      |  WHERE length(tok) > 0),
      |card AS (SELECT source, COUNT(*) AS n FROM t GROUP BY 1),
      |p AS (SELECT a.source AS seg_a, b.source AS seg_b
      |      FROM card a JOIN card b ON a.source < b.source),
      |inter AS (
      |  SELECT x.source AS sa, y.source AS sb, COUNT(*) AS n
      |  FROM t x JOIN t y ON x.tok = y.tok AND x.source < y.source
      |  GROUP BY 1, 2)
      |SELECT p.seg_a, p.seg_b,
      |  CAST(ca.n + cb.n - COALESCE(i.n, 0) AS BIGINT) AS est_union,
      |  CAST(COALESCE(i.n, 0) AS BIGINT) AS est_intersect,
      |  CAST(COALESCE(i.n, 0) AS DOUBLE)
      |    / (ca.n + cb.n - COALESCE(i.n, 0)) AS est_jaccard
      |FROM p
      |JOIN card ca ON ca.source = p.seg_a
      |JOIN card cb ON cb.source = p.seg_b
      |LEFT JOIN inter i ON i.sa = p.seg_a AND i.sb = p.seg_b""".stripMargin

  /** q108: SEMANTIC dedup, SemDeDup-shaped (Abbas et al. 2023,
    * arXiv:2303.09540 — public): embedding-space near-duplicate
    * removal WITHIN k-means clusters. The all-pairs cosine screen
    * (q46's shape) is O(n²) at corpus scale; SemDeDup's bargain is to
    * pay pairwise cost only INSIDE coarse clusters — O(Σ|cluster|²),
    * tunable by k — accepting that cross-cluster near-dups (rare: a
    * near-dup pair lands in one cluster unless it straddles a
    * boundary) are missed. Build: sample-bounded Lloyd training
    * (KMeansVec — the 100-TB trainer), broadcast centroid assignment
    * (map-side, in-row argmin), within-cluster self-join + native
    * codegen cosine, then the dropNearDupsWithinBatch policy — drop
    * every vector with a SMALLER-id neighbor at cosine ≥ τ in its
    * cluster (greedy, deterministic, no iteration). Rows-only
    * (training-dependent clustering); the spec pins the two defining
    * invariants — no kept pair within a cluster at ≥ τ, every dropped
    * vector has a smaller in-cluster ≥ τ witness — plus determinism. */
  private val q108: QFn = (s, d) => {
    val tau = 0.4
    val emb = Tables.embeddings(s, d)
    val dp = graft.functions.GraftFunctions.dotProduct _
    val cos = graft.functions.GraftFunctions.cosineSim _
    val cents = KMeansVec.centroidsDF(s, KMeansVec.train(emb, k = 8, iters = 3))
    // narrow assignment aggregate + embedding re-join (round-11 fix:
    // a wide first(embedding) buffer forces the ObjectHashAggregate
    // sort fallback over all n·k scored rows — see VectorIndex.assign)
    val bestCent = graft.util.Partitioning.widenForExplosion(emb)
      .join(broadcast(cents), col("vec_id").isNotNull)
      .withColumn("score",
        dp(col("cvec"), col("cvec")) - lit(2.0) * dp(col("embedding"), col("cvec")))
      .select("vec_id", "score", "cent_id")
      .groupBy("vec_id")
      .agg(min_by(col("cent_id"), struct(col("score"), col("cent_id"))).as("cent_id"))
    val assigned = emb.join(bestCent, Seq("vec_id"))
      .select("vec_id", "cent_id", "embedding")
    val a = assigned.select(col("cent_id"), col("vec_id").as("i"), col("embedding").as("ei"))
    val b = assigned.select(col("cent_id"), col("vec_id").as("j"), col("embedding").as("ej"))
    // pair generation + cosine filter fuse into one codegen join
    // stage per cluster key — only ≥τ survivors reach the shuffle
    val dropped = a.join(b, Seq("cent_id"))
      .filter(col("i") < col("j") && cos(col("ei"), col("ej")) >= tau)
      .select(col("j").as("vec_id")).distinct()
    assigned
      .join(dropped.withColumn("dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cent_id"), col("dup").isNull.as("kept"))
  }

  val queries: Map[String, QFn] = Map(
    "q32_minhash_pairs" -> q32,
    "q33_simhash" -> q33,
    "q35_ann_lsh" -> q35,
    "q42_approx_distinct" -> q42,
    "q43_simhash_pairs" -> q43,
    "q44_approx_quantile" -> q44,
    "q45_ann_ivf" -> q45,
    "q47_cosine_pairs_lsh" -> q47,
    "q49_ann_ivf_kmeans" -> q49,
    "q64_cosine_pairs_hi" -> q64,
    "q86_ann_pq" -> q86,
    "q87_ann_sq8" -> q87,
    "q90_source_overlap" -> q90,
    "q91_ann_pq_search" -> q91,
    "q92_semantic_mix" -> q92,
    "q108_semantic_dedup" -> q108)

  /** q32's verified output equals the exact trigram-Jaccard pair set:
    * the lowest true pair in the test data sits at j≈0.89 where 16×4
    * banding misses with p≈1e-7, and the exact-verify step removes all
    * false positives — so it shares q31's oracle (same columns). The
    * others are hash-seeded and rows-only by design. */
  val oracleSql: Map[String, String] = Map(
    "q32_minhash_pairs" -> TextOps.oracleSql("q31_ngram_jaccard"),
    // q47's verify step removes every false positive and the banded
    // hyperplane collision probability leaves ~3e-4 miss probability
    // per threshold pair (measured: identical pair sets at all three
    // SFs) — so it shares the exact all-pairs oracle.
    "q47_cosine_pairs_lsh" -> VectorOps.oracleSql("q46_cosine_pairs"),
    // q64 is oracle-checked against the EXACT pair SQL at its own
    // threshold: a hash match means the selective profile's recall on
    // this data is exactly 1, not sampled.
    "q64_cosine_pairs_hi" -> VectorOps.cosinePairsSql(0.5),
    // q87's exact-decimal top-3 rerank over the SQ8 top-12 reproduces
    // the brute-force exact search (measured identical at all SFs) —
    // so it shares q34's oracle; a hash match pins its recall at 1.
    "q87_ann_sq8" -> VectorOps.oracleSql("q34_ann_cosine"),
    // q90's k exceeds every test-SF source vocabulary, so the KMV
    // sketches are exact sets and the overlap algebra hash-matches
    // the exact SQL; the >k estimation path is spec-pinned instead.
    "q90_source_overlap" -> q90Sql)
}
