package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Product quantization (Jégou et al., PAMI 2011) — the MEMORY scale
  * path for similarity search. IVF (q45/q49/VectorIndex) prunes which
  * vectors a query READS; PQ compresses what each vector COSTS: a
  * 64-float embedding (256 B) becomes `m` codebook indices (m=8,
  * ksub=16 → 4 B — 64×), and search ranks candidates from the codes
  * alone via asymmetric distance (ADC). At 100 TB of raw embeddings
  * the code table is ~1.6 TB — the difference between a scan that
  * fits in cluster page cache and one that doesn't.
  *
  * Spark shapes, end to end:
  *  - TRAIN runs Lloyd's over ALL `m` subspaces in ONE set of jobs per
  *    iteration: each row explodes to its m subvectors ONCE per
  *    iteration (map-side), scores against the broadcast (m·ksub)×dsub
  *    codebook IN-ROW via the codegen `dot_product`, and min_by picks
  *    the nearest codeword with map-side partial aggregation — no
  *    per-subspace passes, no row_number sort. Only the codebook
  *    (KBs) ever reaches the driver.
  *  - ENCODE is the same one-pass assignment, folded to one
  *    `codes: array<int>` row per vector (array_sort(collect_list) of
  *    m entries per group — bounded by m, never by data).
  *  - SEARCH broadcasts a per-probe lookup table (p·m·ksub partial
  *    distances, KBs for a probe batch), joins it map-side onto the
  *    posexploded code stream, and sums the m partials per
  *    (probe, vector) with partial aggregation — the only shuffle is
  *    that final sum, keyed by (probe, vec). A rerank table (the raw
  *    embeddings) optionally refines the top ADC candidates with the
  *    exact codegen cosine — the same two-phase discipline as q34.
  *
  * Deterministic end to end: hash-ranked init, fixed iterations,
  * in-row double scoring (one accumulation order per pair), DECIMAL
  * accumulation for both centroid means and the m-term ADC sums
  * (plain sum(double) varies with partition merge order), and
  * code/vec_id tiebreaks everywhere.
  *
  * On unit-norm embeddings (the corpus convention — Multimodal
  * `embedImages` emits unit vectors) euclidean PQ ranking is exactly
  * cosine ranking: |q−x|² = 2 − 2·cos(q,x).
  */
object VectorPQ {

  private val DecA = org.apache.spark.sql.types.DecimalType(28, 12)

  /** The auto training-sample bound: max(64·ksub, 1024) — ~100 points
    * per codeword, the public FAISS-style sizing. */
  private[operators] def sampleSize(ksub: Int, trainSample: Int): Int =
    if (trainSample > 0) trainSample else math.max(64 * ksub, 1024)

  /** Codebook row layout: one codeword per (sub_id, code_id). */
  private val cbSchema = StructType(Seq(
    StructField("sub_id", IntegerType), StructField("code_id", IntegerType),
    StructField("cvec", ArrayType(DoubleType))))

  /** The m subvector views of the embedding column, exploded:
    * (keyCols…, sub_id, svec: array<double>). Map-side only. */
  private def subvectorsKeyed(df: DataFrame, keyCols: Seq[String],
      m: Int, dsub: Int): DataFrame =
    df.select(keyCols.map(col) :+ posexplode(
        transform(sequence(lit(0), lit(m - 1)), s =>
          slice(col("embedding"), s * dsub + 1, lit(dsub)))): _*)
      .select(keyCols.map(col) :+ col("pos").cast("int").as("sub_id") :+
        transform(col("col"), _.cast("double")).as("svec"): _*)

  private def subvectors(emb: DataFrame, m: Int, dsub: Int): DataFrame =
    subvectorsKeyed(emb, Seq("vec_id"), m, dsub)

  /** Nearest codeword per (vector, subspace): in-row squared-euclidean
    * scoring against the broadcast codebook, min_by partial agg.
    * argmin |s−c|² = argmin (|c|² − 2·s·c); |s|² constant per row.
    *
    * Two rejected "optimizations" (both measured slower at sf0.1):
    * an in-row transform-HOF argmin over a nested codebook literal
    * (6.5→7.6 s warm — higher-order functions interpret their lambda,
    * the standing repo lesson), and carrying svec through this
    * aggregation via first() to skip the join back (6.5→9.3 s —
    * array-valued agg buffers push the whole aggregate into the
    * object-hash path, costing more than the cached-join re-read). */
  private def assign(sub: DataFrame, codebook: DataFrame): DataFrame = {
    val dp = graft.functions.GraftFunctions.dotProduct _
    sub.join(broadcast(codebook), Seq("sub_id"))
      .withColumn("score",
        dp(col("cvec"), col("cvec")) - lit(2.0) * dp(col("svec"), col("cvec")))
      .groupBy("vec_id", "sub_id")
      .agg(min_by(col("code_id"), struct(col("score"), col("code_id")))
        .as("code_id"))
  }

  /** Train per-subspace codebooks: `m` subspaces × `ksub` codewords,
    * `iters` Lloyd iterations — all subspaces per pass, over a BOUNDED
    * deterministic sample: fitting m·ksub codewords needs ~100 points
    * per codeword, not the corpus, and an unsampled trainer pays
    * `iters` full-table scans before a single vector encodes — the
    * dominant index-build cost at 100 TB. The sample is the
    * hash-lowest `trainSample` vectors (0 = auto: max(64·ksub, 1024),
    * FAISS-style practice; the init seed is a prefix of it, so a
    * sample that covers the corpus trains bit-identically to the
    * unsampled form). [[encode]] still covers every vector in one
    * pass. Returns the (sub_id, code_id, cvec) codebook DataFrame
    * (m·ksub rows). */
  def train(emb: DataFrame, m: Int, ksub: Int, iters: Int = 5,
      trainSample: Int = 0): DataFrame = {
    val spark = emb.sparkSession
    val n = sampleSize(ksub, trainSample)
    require(n >= ksub,
      s"trainSample=$n < ksub=$ksub would silently train a smaller " +
        "codebook; raise the sample bound")
    // one job: the deterministic hash-rank sample (sorted by
    // (xxhash64(vec_id), vec_id) — its ksub-prefix is the init seed).
    // Model-sized by construction (≤max(64·ksub,1024) vectors), so
    // the Lloyd rounds run on the DRIVER — the cluster loop paid ~2
    // jobs/iteration over ≤1024 rows, pure scheduling overhead at any
    // data scale. Bit-identical to [[trainDistributed]] (spec-pinned):
    // same index-order dot accumulation, same strict-less argmin with
    // code_id-ascending tiebreak, same decimal(28,12) HALF_UP mean.
    val sample: Array[Array[Double]] = emb
      .select(col("vec_id"), col("embedding"))
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy(col("h"), col("vec_id"))
      .limit(n).collect()
      .map(_.getSeq[Number](1)
        .map(_.doubleValue()).toArray)
    require(sample.nonEmpty, "PQ train on an empty embedding table")
    val d = sample.head.length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    // oversized trainSample → distributed witness loop (bit-identical)
    // rather than holding the oversized sample on the driver
    if (sample.length.toLong * d > (1L << 24))
      return trainDistributed(emb, m, ksub, iters, trainSample)
    val dsub = d / m
    // cb[sub][code][dim]; seed: code j of EVERY subspace = the j-th
    // sample vector's j-th subvector slice
    var cb: Array[Array[Array[Double]]] =
      Array.tabulate(m) { s =>
        sample.take(ksub).map(_.slice(s * dsub, (s + 1) * dsub))
      }
    (1 to iters).foreach { _ =>
      val sums =
        Array.fill(m, ksub, dsub)(java.math.BigDecimal.ZERO)
      val cnt = Array.ofDim[Long](m, ksub)
      sample.foreach { v =>
        var s = 0
        while (s < m) {
          val codes = cb(s)
          var best = 0
          var bestScore = Double.PositiveInfinity
          var j = 0
          while (j < ksub) {
            val c = codes(j)
            // |c|² − 2·s·c, each dot in index order (codegen order)
            var cn2 = 0.0; var dotSC = 0.0; var p = 0
            while (p < dsub) {
              cn2 += c(p) * c(p)
              dotSC += v(s * dsub + p) * c(p)
              p += 1
            }
            val score = cn2 - 2.0 * dotSC
            if (score < bestScore) { bestScore = score; best = j }
            j += 1
          }
          cnt(s)(best) += 1
          var p = 0
          while (p < dsub) {
            // valueOf matches Spark's Decimal(double) toString-based
            // conversion; the exact-binary constructor does not (see
            // KMeansVec.trainLocal)
            sums(s)(best)(p) = sums(s)(best)(p).add(
              java.math.BigDecimal.valueOf(v(s * dsub + p))
                .setScale(12, java.math.RoundingMode.HALF_UP))
            p += 1
          }
          s += 1
        }
      }
      val updated = cb.map(_.map(_.clone()))
      var s = 0
      while (s < m) {
        var j = 0
        while (j < ksub) {
          if (cnt(s)(j) > 0) {
            var p = 0
            while (p < dsub) {
              updated(s)(j)(p) = sums(s)(j)(p).doubleValue() /
                cnt(s)(j).toDouble
              p += 1
            }
          }
          j += 1
        }
        s += 1
      }
      cb = updated
    }
    codebookDF(spark, cb)
  }

  /** The original cluster-side PQ Lloyd loop — kept as the
    * bit-identity witness for [[train]]'s driver loop (spec
    * cross-checks the codebooks element-wise). */
  private[graft] def trainDistributed(emb: DataFrame, m: Int, ksub: Int,
      iters: Int = 5, trainSample: Int = 0): DataFrame = {
    val spark = emb.sparkSession
    val d = emb.select(size(col("embedding"))).head.getInt(0)
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val dsub = d / m
    val n = sampleSize(ksub, trainSample)
    require(n >= ksub,
      s"trainSample=$n < ksub=$ksub would silently train a smaller " +
        "codebook; raise the sample bound")
    // cache the sample: the seed collect and the subvector explosion
    // would otherwise each re-run the corpus TakeOrdered (and, in the
    // residual path, the centroid-assignment join above it)
    val tr = KMeansVec
      .hashSample(emb.select(col("vec_id"), col("embedding")), n)
      .cache()
    // deterministic init: the ksub hash-lowest vectors seed code j of
    // EVERY subspace with their j-th subvector (one tiny collect)
    val seedRows = tr
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy(col("h"), col("vec_id"))
      .limit(ksub).collect()
    var cb: Array[Array[Array[Double]]] = // [sub][code][dim]
      Array.tabulate(m) { s =>
        seedRows.map(_.getSeq[Number](1) // float embeddings OR double residuals
          .slice(s * dsub, (s + 1) * dsub).map(_.doubleValue()).toArray)
      }
    val sub = subvectors(tr, m, dsub).cache()
    try {
      (1 to iters).foreach { _ =>
        val assigned = assign(sub, codebookDF(spark, cb))
        // centroid update: decimal accumulation → bit-stable means
        val next = sub.join(assigned, Seq("vec_id", "sub_id"))
          .select(col("sub_id"), col("code_id"), posexplode(col("svec")))
          .groupBy("sub_id", "code_id", "pos")
          .agg((sum(col("col").cast(DecA)).cast("double") / count(lit(1)))
            .as("c"))
          .collect()
        val updated = cb.map(_.map(_.clone()))
        next.foreach { r =>
          updated(r.getAs[Int]("sub_id"))(r.getAs[Int]("code_id"))(
            r.getAs[Int]("pos")) = r.getAs[Double]("c")
        }
        cb = updated
      }
    } finally { sub.unpersist(); tr.unpersist() }
    codebookDF(spark, cb)
  }

  private def codebookDF(spark: SparkSession,
      cb: Array[Array[Array[Double]]]): DataFrame = {
    val rows = for {
      (codes, s) <- cb.zipWithIndex
      (c, j) <- codes.zipWithIndex
    } yield Row(s, j, c.toSeq)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), cbSchema)
  }

  /** Encode every vector to its `m` codebook indices:
    * (vec_id, codes: array<int>) — the 64×-compressed search table. */
  def encode(emb: DataFrame, codebook: DataFrame): DataFrame = {
    val m = codebook.agg(max(col("sub_id"))).head.getInt(0) + 1
    val dsub = codebook.select(size(col("cvec"))).head.getInt(0)
    // widen BEFORE the m-way posexplode × ksub scoring fan-out:
    // scan-sized splits are m·ksub× too coarse (util.Partitioning)
    assign(subvectors(
        graft.util.Partitioning.widenForExplosion(emb), m, dsub), codebook)
      .groupBy("vec_id")
      .agg(transform(
        array_sort(collect_list(struct(col("sub_id"), col("code_id")))),
        x => x.getField("code_id")).as("codes"))
  }

  // ---- scalar quantization (the low-distortion sibling) ------------

  /** INT8 scalar quantization: each component → round(x·127) as a
    * TINYINT — 4× smaller than float32 with ~0.4% per-component
    * distortion (PQ is 32–64× but with distortion that can rival
    * neighbor gaps; SQ8 is the safe default real vector stores reach
    * for first). Unit-norm convention: components in [−1, 1]. */
  def encodeSQ8(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * 127).cast("tinyint")).as("codes"))

  /** These are probe-BATCH operators: the probe side is broadcast
    * (searchSQ8 joins it nested-loop against every code row; the ADC
    * searches broadcast a p·m·ksub partial-distance LUT), so cost and
    * broadcast size grow linearly with the probe count. The guard
    * makes an oversized probe table a loud error instead of a silent
    * p×n explosion — the same boundary discipline as
    * [[VectorOps.cosinePairs]]'s `exactLimit`. Raise `probeLimit`
    * deliberately, or split the probe set into batches. */
  private def requireProbeBatch(probes: DataFrame, probeLimit: Long,
      who: String): Unit = {
    // limit+count early-exits the probe plan at probeLimit+1 rows —
    // the guard must not itself cost a corpus-sized scan
    val over = probes.limit((probeLimit + 1).toInt).count() > probeLimit
    require(!over,
      s"$who got more than probeLimit=$probeLimit probes: it " +
        "broadcasts per-probe state, so cost grows linearly with " +
        "probes - batch the probe set or raise probeLimit deliberately")
  }

  /** Brute-force top-k over the SQ8 code column: the same scan shape
    * as exact brute force but reading the 4×-smaller codes (at 100 TB
    * the scan is bandwidth-bound, so bytes ARE the cost). The codegen
    * dot product reads the tinyint codes DIRECTLY (no dequantize
    * pass, no interpreted HOF on the hot path): dot(probe, codes) =
    * 127·dot(probe, dequantized) — a constant positive scale, so the
    * ranking is identical and the division never happens. Output
    * (probe_id, neighbor_id, rnk) by approximate cosine. */
  def searchSQ8(probes: DataFrame, codes: DataFrame, k: Int,
      probeLimit: Long = 4096L): DataFrame = {
    requireProbeBatch(probes, probeLimit, "searchSQ8")
    val dp = graft.functions.GraftFunctions.dotProduct _
    val w = Window.partitionBy("probe_id")
      .orderBy(col("adot").desc, col("vec_id").asc)
    codes
      .join(broadcast(probes.select(col("vec_id").as("probe_id"),
        col("embedding").as("pe"))),
        col("probe_id") =!= col("vec_id"))
      .withColumn("adot", dp(col("pe"), col("codes")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("rnk"))
  }

  /** Partial-distance LUT: |c|² − 2·q_s·c for every (sub, code) per
    * LUT key (`keyCols` ∋ probe_id; the residual form adds cent_id,
    * because each routed centroid sees a different probe residual) —
    * |keys|·m·ksub rows, KBs per probe batch → broadcast. */
  private[operators] def lutKeyed(queries: DataFrame, keyCols: Seq[String],
      codebook: DataFrame): DataFrame = {
    val dp = graft.functions.GraftFunctions.dotProduct _
    val m = codebook.agg(max(col("sub_id"))).head.getInt(0) + 1
    val dsub = codebook.select(size(col("cvec"))).head.getInt(0)
    subvectorsKeyed(queries, keyCols, m, dsub)
      .join(codebook, Seq("sub_id"))
      .select(keyCols.map(col) :+ col("sub_id") :+ col("code_id") :+
        (dp(col("cvec"), col("cvec")) -
          lit(2.0) * dp(col("svec"), col("cvec"))).as("pd"): _*)
  }

  private def probeLut(probes: DataFrame, codebook: DataFrame): DataFrame =
    lutKeyed(probes.select(col("vec_id").as("probe_id"),
      col("embedding")), Seq("probe_id"), codebook)

  /** ADC top-k over PER-PROBE candidate code rows
    * (lutKeys…, vec_id, codes) against a prebuilt broadcast LUT — the
    * routed-IVF consumer ([[VectorIndex.searchPQ]]), where each probe
    * ranks only its own routed lists (and, in residual form, each
    * (probe, cent) pair has its own LUT slice). Same LUT-join +
    * decimal partial-agg shape as [[searchADC]]; returns
    * (probe_id, neighbor_id). */
  private[operators] def adcTopKWith(lut: DataFrame, cand: DataFrame,
      lutKeys: Seq[String], k: Int,
      packedM: Option[Int] = None): DataFrame = {
    val w = Window.partitionBy("probe_id")
      .orderBy(col("adist").asc, col("vec_id").asc)
    // the (…, vec_id, sub_id, code_id) stream — packed lists unmask
    // their nibble per exploded row with builtins (shiftright /
    // bitwiseAND), NEVER a transform HOF: its lambda interprets, and
    // this is the per-candidate search scan
    val stream = packedM match {
      case Some(m) =>
        val byte = element_at(col("codes"),
          (col("sub_id") / 2).cast("int") + 1).cast("int") + 128 // unbias
        cand.select(lutKeys.map(col) :+ col("vec_id") :+ col("codes") :+
            explode(sequence(lit(0), lit(m - 1))).as("sub_id"): _*)
          .select(lutKeys.map(col) :+ col("vec_id") :+ col("sub_id") :+
            when(col("sub_id") % 2 === 0, byte.bitwiseAND(15))
              .otherwise(shiftright(byte, 4).bitwiseAND(15))
              .as("code_id"): _*)
      case None =>
        cand.select(lutKeys.map(col) :+ col("vec_id") :+
            posexplode(col("codes")): _*)
          .select(lutKeys.map(col) :+ col("vec_id") :+
            col("pos").cast("int").as("sub_id") :+
            col("col").cast("int").as("code_id"): _*)
    }
    stream
      .join(broadcast(lut), lutKeys ++ Seq("sub_id", "code_id"))
      .groupBy("probe_id", "vec_id")
      .agg(sum(col("pd").cast(DecA)).as("adist"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"))
  }

  /** ADC top-k over per-probe candidate code rows with a plain
    * (non-residual) probe LUT. `packedM = Some(m)` reads 4-bit packed
    * candidate lists (stream-unmasked, builtins only). */
  def adcTopK(probes: DataFrame, cand: DataFrame, codebook: DataFrame,
      k: Int, packedM: Option[Int] = None): DataFrame =
    adcTopKWith(probeLut(probes, codebook), cand, Seq("probe_id"), k,
      packedM)

  // ---- 4-bit packed codes (ksub ≤ 16): two codes per byte ----------

  /** Pack an `array<int>` of m 4-bit codes into `array<byte>` of
    * m/2 — the TRUE 4-bit storage layout (the plain int-array codes
    * parquet-encode well, but the packed form halves the in-memory
    * and shuffle width too). Code 2i lives in the low nibble, 2i+1 in
    * the high, biased by −128 into the signed-byte range (ANSI casts
    * refuse to wrap). Builtins only — packing stays inside codegen. */
  def packCodes(codes: org.apache.spark.sql.Column,
      m: Int): org.apache.spark.sql.Column = {
    require(m % 2 == 0, s"m=$m must be even to pack nibble pairs")
    transform(sequence(lit(0), lit(m / 2 - 1)), i =>
      (element_at(codes, i * 2 + 1) +
        element_at(codes, i * 2 + 2) * 16 - 128).cast("tinyint"))
  }

  /** The inverse of [[packCodes]] as a column transform — for
    * materializing a plain view of packed codes (migrations, debug).
    * NOT for hot paths: `transform`'s lambda runs interpreted; the
    * search scans stream-unmask per exploded row with builtins
    * instead ([[adcTopKWith]]'s packedM branch). */
  def unpackCodes(codes: org.apache.spark.sql.Column,
      m: Int): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(m - 1)), i => {
      val byte = element_at(codes, (i / 2).cast("int") + 1).cast("int") + 128
      when(i % 2 === 0, byte.bitwiseAND(15))
        .otherwise(shiftright(byte, 4).bitwiseAND(15))
    })

  /** [[encode]] + [[packCodes]]: (vec_id, codes: array<byte> m/2). */
  def encodePacked(emb: DataFrame, codebook: DataFrame): DataFrame = {
    val m = codebook.agg(max(col("sub_id"))).head.getInt(0) + 1
    val ksub = codebook.agg(max(col("code_id"))).head.getInt(0) + 1
    require(ksub <= 16, s"ksub=$ksub does not fit a nibble")
    encode(emb, codebook)
      .select(col("vec_id"), packCodes(col("codes"), m).as("codes"))
  }

  /** The exploded (vec_id, sub_id, code_id) stream from PLAIN codes. */
  private def codeStream(codes: DataFrame): DataFrame =
    codes.select(col("vec_id"), posexplode(col("codes")))
      .select(col("vec_id"), col("pos").cast("int").as("sub_id"),
        col("col").cast("int").as("code_id"))

  /** The same stream from PACKED codes: explode m sub ids and unmask
    * the right nibble — shiftright/bitwiseAND builtins, all codegen. */
  private def packedCodeStream(codes: DataFrame, m: Int): DataFrame = {
    val byte = element_at(col("codes"),
      (col("sub_id") / 2).cast("int") + 1).cast("int") + 128 // unbias
    codes.select(col("vec_id"), col("codes"),
        explode(sequence(lit(0), lit(m - 1))).as("sub_id"))
      .select(col("vec_id"), col("sub_id"),
        when(col("sub_id") % 2 === 0, byte.bitwiseAND(15))
          .otherwise(shiftright(byte, 4).bitwiseAND(15))
          .as("code_id"))
  }

  /** ADC top-k over the PACKED code table: identical ranking to
    * [[searchADC]] on the unpacked codes (the nibbles are the same
    * code values), reading half the bytes. */
  def searchADCPacked(probes: DataFrame, packed: DataFrame,
      codebook: DataFrame, k: Int, rerank: Option[DataFrame] = None,
      rerankFactor: Int = 4, probeLimit: Long = 4096L): DataFrame = {
    requireProbeBatch(probes, probeLimit, "searchADCPacked")
    val m = codebook.agg(max(col("sub_id"))).head.getInt(0) + 1
    searchADCStream(probes, packedCodeStream(packed, m), codebook, k,
      rerank, rerankFactor)
  }

  /** ADC top-k: rank the code table by asymmetric distance to each
    * probe, optionally exact-cosine reranking the top `rerankFactor·k`
    * ADC candidates against `rerank` (the raw embedding table). Output
    * (probe_id, neighbor_id, rnk[, cosine]). */
  def searchADC(probes: DataFrame, codes: DataFrame, codebook: DataFrame,
      k: Int, rerank: Option[DataFrame] = None,
      rerankFactor: Int = 4, probeLimit: Long = 4096L): DataFrame = {
    requireProbeBatch(probes, probeLimit, "searchADC")
    searchADCStream(probes, codeStream(codes), codebook, k, rerank,
      rerankFactor)
  }

  private def searchADCStream(probes: DataFrame, stream: DataFrame,
      codebook: DataFrame, k: Int, rerank: Option[DataFrame],
      rerankFactor: Int): DataFrame = {
    val lut = probeLut(probes, codebook)
    // map-side LUT join on the exploded code stream; the only shuffle
    // is the (probe, vec) partial-agg sum of the m decimal partials
    val adc = stream
      .join(broadcast(lut), Seq("sub_id", "code_id"))
      .filter(col("probe_id") =!= col("vec_id"))
      .groupBy("probe_id", "vec_id")
      .agg(sum(col("pd").cast(DecA)).as("adist"))
    val wAdc = Window.partitionBy("probe_id")
      .orderBy(col("adist").asc, col("vec_id").asc)
    rerank match {
      case None =>
        adc.withColumn("rnk", row_number().over(wAdc))
          .filter(col("rnk") <= k)
          .select(col("probe_id"), col("vec_id").as("neighbor_id"),
            col("rnk"))
      case Some(emb) =>
        val cos = graft.functions.GraftFunctions.cosineSim _
        val cand = adc.withColumn("rnk", row_number().over(wAdc))
          .filter(col("rnk") <= k * rerankFactor)
          .select("probe_id", "vec_id")
        val wCos = Window.partitionBy("probe_id")
          .orderBy(col("cosine").desc, col("vec_id").asc)
        cand
          .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
          .join(probes.select(col("vec_id").as("probe_id"),
            col("embedding").as("pe")), Seq("probe_id"))
          .withColumn("cosine", cos(col("pe"), col("embedding")))
          .withColumn("rnk", row_number().over(wCos))
          .filter(col("rnk") <= k)
          .select(col("probe_id"), col("vec_id").as("neighbor_id"),
            col("rnk"), round(col("cosine"), 6).as("cosine"))
    }
  }
}
