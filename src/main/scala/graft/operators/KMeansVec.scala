package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DecimalType, DoubleType, LongType, StructField, StructType}

/** Distributed Lloyd's k-means over an embedding column — the train
  * step for IVF coarse quantization (q49).
  *
  * Shape at 100 TB: each iteration scores every (vector, centroid)
  * pair IN-ROW against the broadcast k×d centroid matrix with the
  * native codegen `dot_product` (n·k rows, no exploded join), then
  * recomputes per-(cluster, pos) means over the exploded view with
  * map-side partial aggregation. Training fits a k×d model from a
  * BOUNDED deterministic sample (≤128·k vectors — model-sized at any
  * data scale), so the Lloyd loop itself runs on the DRIVER over the
  * collected sample ([[train]] → trainLocal, bit-identical to the
  * cluster loop and ~10 Spark jobs cheaper); the corpus-sized
  * assignment/encode passes downstream stay fully distributed.
  *
  * Deterministic end-to-end: hash-ranked init, fixed iteration count,
  * index tiebreaks — and, crucially, the two float-sensitive steps are
  * order-independent: assignment scores are computed in-row (one fixed
  * accumulation order per pair, regardless of partitioning), and the
  * centroid means accumulate through an exact DECIMAL(28,12) sum, so
  * trained centroids are bit-stable across runs and cluster layouts.
  * (A plain `sum(double)`/`avg(double)` here varies with partition
  * merge order and silently made q49/VectorIndex nondeterministic.)
  */
object KMeansVec {

  private val DecC = DecimalType(28, 12)

  /** The deterministic hash-rank training sample: the `n` vectors with
    * the lowest xxhash64(vec_id) — the same order the init seed uses,
    * so the seed set is always a prefix of the sample. TakeOrdered
    * keeps one partial top-n per partition and merges once (never a
    * full sort); the repartition spreads the merged sample back out
    * for the iteration joins. When `n` covers the corpus this is the
    * whole table and training is bit-identical to an unsampled run
    * (assignment is in-row, means are decimal — layout-independent). */
  private[operators] def hashSample(emb: DataFrame, n: Int): DataFrame =
    emb
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy(col("h"), col("vec_id"))
      .limit(n)
      .drop("h")
      .repartition(col("vec_id"))

  /** Train k centroids with `iters` Lloyd iterations over a BOUNDED
    * deterministic sample — fitting a k×d model never needs the
    * corpus, and at 100 TB an unsampled trainer would pay `iters`
    * full-table scans before a single vector is indexed. The sample
    * is the hash-lowest `trainSample` vectors (0 = auto: 128·k, ~100×
    * the centroid count, FAISS-style practice); assignment/encode
    * passes downstream still cover every vector. Returns the centroid
    * matrix (cent_id → components). */
  def train(emb: DataFrame, k: Int, iters: Int,
      trainSample: Int = 0): Array[Array[Double]] =
    graft.util.PhaseTimer.time("kmeans_train") {
      trainLocal(emb, k, iters, trainSample)
    }

  /** Driver-side Lloyd loop over the SAME bounded deterministic
    * sample — bit-identical to [[trainDistributed]] (spec-pinned
    * element-wise): the sample is collected ONCE (one TakeOrdered
    * job — it is model-sized by construction: ≤128·k vectors, the
    * same bound that already made the iteration legitimate), and the
    * `iters` Lloyd rounds run as plain loops. The distributed loop
    * paid ~2 jobs per iteration over ≤1280 rows — at ANY data scale
    * that is pure job-scheduling overhead, because the per-iteration
    * inputs are the bounded sample, never the corpus (guide §1.2:
    * fix the algorithm's pass structure first). Bit-identity:
    *  - assignment scores accumulate in index order exactly like the
    *    codegen `dot_product` (score = |c|² − 2·v·c, strict-less
    *    argmin with cent_id ascending = min_by struct tiebreak);
    *  - means replicate `sum(cast(x as decimal(28,12)))` exactly:
    *    each element rounds to scale 12 HALF_UP (Spark's
    *    double→decimal cast), sums exactly in BigDecimal, converts
    *    via doubleValue (= Decimal.toDouble), divides by the count
    *    as IEEE double — order-independent, so ANY iteration order
    *    matches the cluster's merge order. */
  private def trainLocal(emb: DataFrame, k: Int, iters: Int,
      trainSample: Int): Array[Array[Double]] = {
    val n = if (trainSample > 0) trainSample else 128 * k
    require(n >= k,
      s"trainSample=$n < k=$k would silently train fewer centroids; " +
        "raise the sample bound")
    // one job: the deterministic hash-rank sample, already sorted by
    // (xxhash64(vec_id), vec_id) — its prefix is the init seed
    val sample: Array[Array[Double]] = emb
      .select(col("vec_id"), col("embedding"))
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy(col("h"), col("vec_id"))
      .limit(n).collect()
      .map(_.getSeq[Number](1) // float embeddings OR rotated doubles
        .map(_.doubleValue()).toArray)
    require(sample.nonEmpty, "k-means train on an empty embedding table")
    val d = sample.head.length
    // driver-memory guard: the sample is model-sized (≤128·k·d
    // doubles); a caller-forced oversized trainSample dispatches to
    // the distributed witness loop (bit-identical) instead of keeping
    // the oversized sample resident through `iters` driver rounds
    if (sample.length.toLong * d > (1L << 24))
      return trainDistributed(emb, k, iters, trainSample)
    var cents: Array[Array[Double]] = sample.take(k).map(_.clone())
    (1 to iters).foreach { _ =>
      // |c|² once per centroid (the distributed plan recomputes it
      // per row — same value, same index-order accumulation)
      val cn2 = cents.map(c => dot(c, c))
      val sums = Array.fill(k, d)(java.math.BigDecimal.ZERO)
      val cnt = new Array[Long](k)
      sample.foreach { v =>
        var best = 0
        var bestScore = Double.PositiveInfinity
        var j = 0
        while (j < k) {
          val score = cn2(j) - 2.0 * dot(v, cents(j))
          if (score < bestScore) { bestScore = score; best = j }
          j += 1
        }
        cnt(best) += 1
        var p = 0
        while (p < d) {
          // valueOf = Double.toString shortest-repr — the SAME
          // conversion Spark's double→decimal cast performs
          // (Decimal.set(d) → scala BigDecimal(d) → valueOf); the
          // exact-binary `new BigDecimal(d)` constructor disagrees
          // with it ~1/54k roundings at scale 12 and silently broke
          // the trainDistributed bit-identity contract
          sums(best)(p) = sums(best)(p).add(java.math.BigDecimal.valueOf(v(p))
            .setScale(12, java.math.RoundingMode.HALF_UP))
          p += 1
        }
      }
      val updated = cents.map(_.clone())
      var j = 0
      while (j < k) {
        if (cnt(j) > 0) {
          var p = 0
          while (p < d) {
            updated(j)(p) = sums(j)(p).doubleValue() / cnt(j).toDouble
            p += 1
          }
        }
        j += 1
      }
      cents = updated
    }
    cents
  }

  /** Index-order dot product — the codegen `dot_product`'s exact
    * accumulation order (see VectorExprs doc). */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** The original cluster-side Lloyd loop, kept as the bit-identity
    * witness for [[trainLocal]] (spec cross-checks them element-wise)
    * and as the escape hatch for a sample deliberately sized past
    * driver memory. */
  private[graft] def trainDistributed(emb: DataFrame, k: Int, iters: Int,
      trainSample: Int): Array[Array[Double]] = {
    val spark = emb.sparkSession
    val n = if (trainSample > 0) trainSample else 128 * k
    require(n >= k,
      s"trainSample=$n < k=$k would silently train fewer centroids; " +
        "raise the sample bound")
    val tr =
      hashSample(emb.select(col("vec_id"), col("embedding")), n).cache()
    val el = tr.select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos"), col("col").cast("double").as("x"))
      .cache()
    // deterministic pseudo-random init: k vectors with the lowest
    // xxhash64(vec_id) — order-free, seed-free, stable across runs
    // (a prefix of the training sample, so sampling never moves it)
    var cents: Array[Array[Double]] = tr
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy(col("h"), col("vec_id"))
      .limit(k).collect()
      .map(_.getSeq[Number](1) // float embeddings OR rotated doubles
        .map(_.doubleValue()).toArray)

    val dp = graft.functions.GraftFunctions.dotProduct _
    (1 to iters).foreach { _ =>
      val centDf = centroidsDF(spark, cents)
      // nearest centroid by squared euclidean distance, scored in-row:
      // argmin |v−c|² = argmin (|c|² − 2·v·c); |v|² is constant per vec
      val assign = tr
        .join(broadcast(centDf), col("vec_id").isNotNull)
        .withColumn("score",
          dp(col("cvec"), col("cvec")) - lit(2.0) * dp(col("embedding"), col("cvec")))
        .groupBy("vec_id")
        .agg(min_by(col("cent_id"), struct(col("score"), col("cent_id"))).as("cent_id"))
      // centroid update: exact decimal accumulation → bit-stable means
      val next = el.join(assign, Seq("vec_id"))
        .groupBy("cent_id", "pos")
        .agg((sum(col("x").cast(DecC)).cast("double") / count(lit(1))).as("c"))
        .collect()
      val updated = cents.map(_.clone())
      next.foreach { r =>
        updated(r.getAs[Long]("cent_id").toInt)(r.getAs[Int]("pos")) =
          r.getAs[Double]("c")
      }
      cents = updated
    }
    el.unpersist()
    tr.unpersist()
    cents
  }

  /** Centroid matrix as a (cent_id, cvec) DataFrame for IVF search. */
  def centroidsDF(spark: SparkSession, cents: Array[Array[Double]]): DataFrame = {
    val rows = cents.zipWithIndex.map { case (c, id) => Row(id.toLong, c.toSeq) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(StructField("cent_id", LongType),
        StructField("cvec", ArrayType(DoubleType)))))
  }
}
