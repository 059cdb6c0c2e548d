package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV ("k minimum values") / theta sketch: bounded-size distinct-SET
  * algebra — the member of the sketch family that answers UNION /
  * INTERSECTION / DIFFERENCE cardinalities, which HLL alone cannot
  * (Spark's HLL sketches union, but never intersect). Beyer et al.
  * (SIGMOD 2007); the Theta generalization is Dasgupta et al.
  *
  * A sketch is the k smallest distinct 64-bit hashes of the set,
  * kept sorted. That makes it:
  *  - MERGEABLE with map-side partial aggregation (merge = sorted
  *    merge, distinct, take k) — it runs as a typed `Aggregator`
  *    inside a normal groupBy, so building sketches for every segment
  *    is ONE pass with partial aggs, never a collect;
  *  - ORDER-INDEPENDENT: "k smallest of a set" doesn't depend on
  *    arrival or merge order, so folds are bit-identical to a
  *    from-scratch build — the maintained-sketch family contract
  *    (HLL register-max, CMS counter-add, DDSketch bucket-add, and
  *    now KMV min-k);
  *  - DETERMINISTIC: hashes come from xxhash64, no seeds or RNG.
  *
  * Estimation: with u(h) mapping the signed hash to [0,1), the k-th
  * minimum θ estimates density, and |S| ≈ (k−1)/θ. Set ops evaluate
  * on the KB-scale sketches (driver-side, like every sketch query
  * here): both sketches truncate to the smaller θ and intersection /
  * difference counts survivors below θ, scaled by 1/θ. Sketches
  * smaller than k are EXACT distinct sets (θ = 1 conceptually).
  */
object SetSketch {

  /** Map a signed 64-bit hash onto the unit interval. */
  private def unit(h: Long): Double =
    (h.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)

  /** Typed KMV aggregator over pre-hashed values: buffer and result
    * are the sorted k smallest distinct hashes. */
  final case class Kmv(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 16, s"k=$k too small for meaningful estimates")

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf // already present
      else {
        val ins = -pos - 1
        if (buf.length >= k && ins >= k) buf // larger than the k-th min
        else {
          val n = math.min(buf.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
          out
        }
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // sorted merge, distinct, take k — associative and commutative
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < a.length || j < b.length)) {
        val take =
          if (i >= a.length) { val v = b(j); j += 1; v }
          else if (j >= b.length) { val v = a(i); i += 1; v }
          else if (a(i) < b(j)) { val v = a(i); i += 1; v }
          else if (a(i) > b(j)) { val v = b(j); j += 1; v }
          else { val v = a(i); i += 1; j += 1; v }
        if (n == 0 || out(n - 1) != take) { out(n) = take; n += 1 }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** The KMV sketch as an untyped aggregate Column over a PRE-HASHED
    * long column (`xxhash64(...)`): usable in any groupBy. */
  def kmvAgg(hashed: Column, k: Int): Column = udaf(Kmv(k)).apply(hashed)

  /** Distinct-cardinality estimate of one sketch. */
  def estimate(sk: Array[Long], k: Int): Double =
    if (sk.length < k) sk.length.toDouble
    else (k - 1).toDouble / unit(sk(k - 1))

  /** θ-truncate both sketches to a common density threshold. */
  private def common(a: Array[Long], b: Array[Long], k: Int)
      : (Array[Long], Array[Long], Double) = {
    val theta = math.min(
      if (a.length < k) 1.0 else unit(a(k - 1)),
      if (b.length < k) 1.0 else unit(b(k - 1)))
    (a.filter(unit(_) < theta), b.filter(unit(_) < theta), theta)
  }

  /** |A ∪ B| estimate: merge to a union KMV and estimate it. */
  def estimateUnion(a: Array[Long], b: Array[Long], k: Int): Double =
    estimate(Kmv(k).merge(a, b), k)

  /** |A ∩ B| estimate: survivors below the common θ, scaled by 1/θ. */
  def estimateIntersect(a: Array[Long], b: Array[Long], k: Int): Double = {
    val (ta, tb, theta) = common(a, b, k)
    ta.toSet.intersect(tb.toSet).size / theta
  }

  /** |A \ B| estimate. */
  def estimateDiff(a: Array[Long], b: Array[Long], k: Int): Double = {
    val (ta, tb, theta) = common(a, b, k)
    ta.toSet.diff(tb.toSet).size / theta
  }

  /** Maintained per-segment KMV view (the fourth maintained sketch,
    * next to MaterializedAgg's HLL, SketchView's CMS and QuantileView's
    * DDSketch): state = one (seg, sk) row per segment through
    * [[graft.lakehouse.VersionedTable]]. A fold EXPLODES the stored
    * sketches back to hashes, unions the fresh batch's hashes, and
    * re-aggregates with the same KMV — sound because kmv(A ∪ kmv(B))
    * = kmv(A ∪ B) whenever kmv(B) keeps B's k smallest (min-k is a
    * lossless filter for further min-k), and order-independent, so
    * the maintained state is BIT-IDENTICAL to a from-scratch build.
    * Exactly-once streaming folds by batch id, same marker protocol
    * as the other members. */
  final case class ViewSpec(segCol: String, hashExpr: Column, k: Int = 256)

  def update(spark: org.apache.spark.sql.SparkSession, root: String,
      batch: DataFrame, spec: ViewSpec): Long =
    commitView(spark, root, merged(spark, root, batch, spec), None)

  /** Fold a micro-batch exactly once (idempotent by batchId). */
  def foldBatch(spark: org.apache.spark.sql.SparkSession, root: String,
      batch: DataFrame, spec: ViewSpec, batchId: Long): Boolean = {
    if (graft.lakehouse.VersionedTable.lastFoldedBatch(spark, root)
        .exists(_ >= batchId)) return false
    commitView(spark, root, merged(spark, root, batch, spec), Some(batchId))
    true
  }

  /** Current state as (seg, sk) pairs. */
  def read(spark: org.apache.spark.sql.SparkSession,
      root: String): Map[String, Array[Long]] =
    graft.lakehouse.VersionedTable.currentVersion(spark, root)
      .map(_ => graft.lakehouse.VersionedTable.read(spark, root)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray)
        .toMap)
      .getOrElse(Map.empty)

  private def merged(spark: org.apache.spark.sql.SparkSession, root: String,
      batch: DataFrame, spec: ViewSpec): DataFrame = {
    // segments normalize to non-null strings: null segments are
    // dropped (nothing meaningful to sketch them under) and numeric
    // segment columns stringify instead of failing reads later; null
    // hash values are dropped too — the typed Long aggregator would
    // decode a null as 0L and count it as a real member (xxhash64
    // never yields null, but ViewSpec.hashExpr is user-supplied)
    val fresh = batch.filter(col(spec.segCol).isNotNull &&
        spec.hashExpr.isNotNull)
      .select(col(spec.segCol).cast("string").as("seg"),
        spec.hashExpr.as("h"))
    val all = graft.lakehouse.VersionedTable.currentVersion(spark, root) match {
      case None => fresh
      case Some(_) => graft.lakehouse.VersionedTable.read(spark, root)
        .select(col("seg"), explode(col("sk")).as("h"))
        .unionByName(fresh)
    }
    all.groupBy("seg").agg(kmvAgg(col("h"), spec.k).as("sk"))
  }

  private def commitView(spark: org.apache.spark.sql.SparkSession,
      root: String, state: DataFrame, batchId: Option[Long]): Long =
    graft.lakehouse.VersionedTable.commit(spark, root) { stage =>
      state.coalesce(1).write.mode("overwrite").parquet(stage)
      batchId.foreach(
        graft.lakehouse.VersionedTable.stampBatch(spark, stage, _))
    }

  /** Streaming maintenance: each micro-batch of the file stream folds
    * exactly once — the same AvailableNow shape as the other
    * maintained views. */
  def runStream(spark: org.apache.spark.sql.SparkSession, srcDir: String,
      viewRoot: String, checkpointDir: String,
      schema: org.apache.spark.sql.types.StructType,
      spec: ViewSpec): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("header", "true")
      .csv(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(spark, viewRoot, batch, spec, batchId)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Per-segment vocabulary sketches + pairwise set algebra: for every
    * pair of `segCol` values, estimated distinct-union / intersection
    * / Jaccard of their `hashCol` sets. ONE sketch-building pass over
    * the data (partial-agg KMV per segment); the pairwise algebra runs
    * on the collected KB-scale sketches — segments², not data². */
  def pairwiseOverlap(df: DataFrame, segCol: String, hashed: Column,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    // null segments and null hashes dropped, non-string segments
    // stringified — same normalization as the maintained view
    val sk = df.filter(col(segCol).isNotNull && hashed.isNotNull)
      .groupBy(col(segCol).cast("string").as("seg"))
      .agg(kmvAgg(hashed, k).as("sk"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    val rows = for {
      i <- sk.indices; j <- (i + 1) until sk.length
      (sa, ska) = sk(i); (sb, skb) = sk(j)
    } yield {
      val un = estimateUnion(ska, skb, k)
      val in = estimateIntersect(ska, skb, k)
      // plain IEEE division: when the sketches are exact (< k) this is
      // engine-identical to exact_intersect / exact_union
      (sa, sb, math.round(un), math.round(in),
        if (un == 0.0) 0.0 else in / un)
    }
    import spark.implicits._
    rows.toSeq.toDF("seg_a", "seg_b", "est_union", "est_intersect",
      "est_jaccard")
  }
}
