package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Optimized Product Quantization rotation (Ge et al., CVPR 2013,
  * non-parametric variant): learn an orthogonal d×d transform R that
  * minimizes the PQ reconstruction error of the ROTATED data, so the
  * m subspaces cut the variance where the codebooks can spend their
  * bits. PQ's weakness is fixed axis-aligned subspace boundaries;
  * rotating first is the standard recall lever that needs no extra
  * bits at search time.
  *
  * Training runs ON THE DRIVER over the same bounded hash-rank sample
  * the PQ/k-means trainers use — fitting a d×d model is sample-sized
  * work by design (≤ a few thousand vectors × 64 dims ≈ MBs), the
  * same economics as the centroid collects; the corpus-sized passes
  * (encode, assign) stay distributed and apply R through an
  * `array(dot_product…)` of native codegen expressions (never an
  * interpreted HOF lambda — the standing repo lesson). The OPQ-NP
  * alternation is: rotate sample → fit per-subspace codebooks (local
  * Lloyd, hash-order seeds) → reconstruct → orthogonal-Procrustes
  * update R = V·Uᵀ from SVD(Σ xᵢyᵢᵀ), iterated a fixed number of
  * sweeps. The SVD is built on a cyclic Jacobi eigensolver of the
  * symmetric MᵀM (d=64: microseconds) — deterministic end to end:
  * fixed sweep counts, fixed sample order (hash, vec_id), index
  * tiebreaks, no RNG anywhere.
  *
  * The learned internal codebooks are only the vehicle for optimizing
  * R; the index build retrains its codebooks Spark-side (decimal-
  * stable) on the rotated data, so there is exactly ONE codebook
  * trainer in the library and OPQ composes freely with the residual
  * and packed layouts ([[VectorIndex.buildPQ]]).
  */
object VectorOPQ {

  private def identityMat(d: Int): Array[Array[Double]] =
    Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)

  private def matVec(m: Array[Array[Double]],
      x: Array[Double]): Array[Double] = {
    val d = m.length
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      var s = 0.0; var j = 0
      while (j < x.length) { s += m(i)(j) * x(j); j += 1 }
      out(i) = s; i += 1
    }
    out
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * A = V·diag(λ)·Vᵀ, V's COLUMNS the eigenvectors. Fixed sweep
    * bound + off-diagonal convergence check — deterministic. */
  private def jacobiEig(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = identityMat(d)
    val frob = math.sqrt(a.map(_.map(x => x * x).sum).sum)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-13 * math.max(frob, 1e-300)) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1))
            val c = 1.0 / math.sqrt(t * t + 1); val s = t * c
            var k = 0
            while (k < d) { // columns p,q of every row
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) { // rows p,q of every column
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { off += 2 * a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      off = math.sqrt(off)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** R maximizing tr(R·M) over orthogonal matrices: R = V·Uᵀ from
    * M = U·Σ·Vᵀ (orthogonal Procrustes). U comes from uⱼ = M·vⱼ/σⱼ;
    * near-zero σ columns are completed by Gram-Schmidt against the
    * standard basis (deterministic), keeping R exactly orthogonal. */
  private def procrustes(m: Array[Array[Double]]): Array[Array[Double]] = {
    val d = m.length
    val mtm = Array.tabulate(d, d) { (i, j) =>
      var s = 0.0; var k = 0
      while (k < d) { s += m(k)(i) * m(k)(j); k += 1 }
      s
    }
    val (lam, vcols) = jacobiEig(mtm)
    // deterministic eigen order: descending eigenvalue, index tiebreak
    val order = (0 until d).sortBy(j => (-lam(j), j))
    val v = Array.tabulate(d, d)((i, j) => vcols(i)(order(j)))
    val sig = order.map(j => math.sqrt(math.max(lam(j), 0.0))).toArray
    val sigMax = math.max(sig.headOption.getOrElse(0.0), 1e-300)
    val u = Array.ofDim[Double](d, d) // columns uⱼ
    val have = Array.fill(d)(false)
    var j = 0
    while (j < d) {
      if (sig(j) > 1e-8 * sigMax) {
        var i = 0
        while (i < d) {
          var s = 0.0; var k = 0
          while (k < d) { s += m(i)(k) * v(k)(j); k += 1 }
          u(i)(j) = s / sig(j); i += 1
        }
        have(j) = true
      }
      j += 1
    }
    // modified Gram-Schmidt over the filled columns IN ORDER: with
    // near-degenerate σ the raw M·vⱼ/σⱼ columns are noise-dominated
    // and lose mutual orthogonality, which would make R = V·Uᵀ
    // non-orthogonal (property-caught on duplicated-vector samples);
    // a column that collapses under re-orthonormalization is demoted
    // to the basis-completion pass below
    j = 0
    while (j < d) {
      if (have(j)) {
        var jj = 0
        while (jj < j) {
          if (have(jj)) {
            var dot = 0.0; var i = 0
            while (i < d) { dot += u(i)(j) * u(i)(jj); i += 1 }
            i = 0
            while (i < d) { u(i)(j) -= dot * u(i)(jj); i += 1 }
          }
          jj += 1
        }
        var nrm = 0.0
        var i = 0
        while (i < d) { nrm += u(i)(j) * u(i)(j); i += 1 }
        nrm = math.sqrt(nrm)
        if (nrm > 1e-6) {
          i = 0
          while (i < d) { u(i)(j) /= nrm; i += 1 }
        } else have(j) = false
      }
      j += 1
    }
    // complete the missing U columns: Gram-Schmidt e_b against the rest
    j = 0
    while (j < d) {
      if (!have(j)) {
        var done = false
        var b = 0
        while (b < d && !done) {
          val cand = Array.tabulate(d)(i => if (i == b) 1.0 else 0.0)
          var jj = 0
          while (jj < d) {
            if (have(jj)) {
              var dot = 0.0; var i = 0
              while (i < d) { dot += cand(i) * u(i)(jj); i += 1 }
              i = 0
              while (i < d) { cand(i) -= dot * u(i)(jj); i += 1 }
            }
            jj += 1
          }
          val nrm = math.sqrt(cand.map(x => x * x).sum)
          if (nrm > 1e-6) {
            var i = 0
            while (i < d) { u(i)(j) = cand(i) / nrm; i += 1 }
            have(j) = true; done = true
          }
          b += 1
        }
      }
      j += 1
    }
    // R = V·Uᵀ
    Array.tabulate(d, d) { (a, b) =>
      var s = 0.0; var k = 0
      while (k < d) { s += v(a)(k) * u(b)(k); k += 1 }
      s
    }
  }

  /** One local Lloyd fit of a ksub-codeword codebook over the rows'
    * [lo, lo+dsub) slice: hash-order seeds, squared-euclidean
    * assignment with index tiebreak, empty cells keep their codeword. */
  private def lloydSub(xs: Array[Array[Double]], lo: Int, dsub: Int,
      ksub: Int, iters: Int): Array[Array[Double]] = {
    var cents = Array.tabulate(math.min(ksub, xs.length))(
      i => xs(i).slice(lo, lo + dsub))
    if (cents.length < ksub) // degenerate tiny sample: repeat seeds
      cents = Array.tabulate(ksub)(i => cents(i % cents.length).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.ofDim[Double](ksub, dsub)
      val counts = new Array[Long](ksub)
      xs.foreach { x =>
        val j = nearestSub(x, lo, dsub, cents)
        counts(j) += 1
        var t = 0
        while (t < dsub) { sums(j)(t) += x(lo + t); t += 1 }
      }
      cents = Array.tabulate(ksub) { jj =>
        if (counts(jj) > 0) Array.tabulate(dsub)(t => sums(jj)(t) / counts(jj))
        else cents(jj)
      }
      it += 1
    }
    cents
  }

  private def nearestSub(x: Array[Double], lo: Int, dsub: Int,
      cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var j = 0
    while (j < cents.length) {
      var s = 0.0; var t = 0
      while (t < dsub) {
        val diff = x(lo + t) - cents(j)(t); s += diff * diff; t += 1
      }
      if (s < bestD) { bestD = s; best = j }
      j += 1
    }
    best
  }

  /** Learn the OPQ rotation for (m, ksub) product quantization on the
    * hash-lowest `trainSample` vectors (0 = the PQ trainer's auto
    * bound). Returns the d×d orthogonal matrix R, to be applied as
    * v → R·v ([[rotateCol]]). */
  def trainRotation(emb: DataFrame, m: Int, ksub: Int, sweeps: Int = 8,
      lloydIters: Int = 4, trainSample: Int = 0): Array[Array[Double]] = {
    val n = VectorPQ.sampleSize(ksub, trainSample)
    val rows = emb.select(col("vec_id"), col("embedding"))
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy(col("h"), col("vec_id"))
      .limit(n).collect() // bounded by design: the model-fitting sample
    val x = rows.map(_.getSeq[Number](1).map(_.doubleValue()).toArray)
    require(x.nonEmpty, "empty training sample")
    val d = x(0).length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val dsub = d / m
    var r = identityMat(d)
    var sweep = 0
    while (sweep < sweeps) {
      val xr = x.map(matVec(r, _))
      val cbs = Array.tabulate(m)(s =>
        lloydSub(xr, s * dsub, dsub, ksub, lloydIters))
      // reconstruction of each rotated sample vector from its codes
      val y = xr.map { v =>
        val out = new Array[Double](d)
        var s = 0
        while (s < m) {
          val cw = cbs(s)(nearestSub(v, s * dsub, dsub, cbs(s)))
          System.arraycopy(cw, 0, out, s * dsub, dsub)
          s += 1
        }
        out
      }
      // M = Σ xᵢ·yᵢᵀ (UNrotated x against rotated-space reconstruction)
      val mm = Array.ofDim[Double](d, d)
      var i = 0
      while (i < x.length) {
        val xi = x(i); val yi = y(i)
        var a = 0
        while (a < d) {
          val xa = xi(a)
          if (xa != 0.0) {
            var b = 0
            while (b < d) { mm(a)(b) += xa * yi(b); b += 1 }
          }
          a += 1
        }
        i += 1
      }
      r = procrustes(mm)
      sweep += 1
    }
    r
  }

  /** Apply v → R·v in-row: an array constructor of d native codegen
    * dot products against R's literal rows — whole-stage-codegen
    * friendly, no interpreted HOF lambda on the encode path. */
  def rotateCol(r: Array[Array[Double]], v: Column): Column =
    array(r.map(row =>
      graft.functions.GraftFunctions.dotProduct(typedLit(row.toSeq), v)): _*)

  /** The rotation as a (row_id, rvec) DataFrame for persistence next
    * to an index's other models. */
  def rotationDF(spark: org.apache.spark.sql.SparkSession,
      r: Array[Array[Double]]): DataFrame = {
    import org.apache.spark.sql.{Row => SqlRow}
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        r.zipWithIndex.map { case (row, i) => SqlRow(i, row.toSeq) }.toSeq, 1),
      StructType(Seq(StructField("row_id", IntegerType),
        StructField("rvec", ArrayType(DoubleType)))))
  }

  /** Read back [[rotationDF]] into the matrix form (row-order pinned
    * by row_id). */
  def loadRotation(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Double]] =
    spark.read.parquet(path)
      .orderBy("row_id").collect()
      .map(_.getSeq[Double](1).toArray)
}
