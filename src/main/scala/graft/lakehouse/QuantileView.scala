package graft.lakehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Incrementally-maintained QUANTILE sketch — the third member of the
  * maintained-sketch family ([[MaterializedAgg]] keeps HLL distincts,
  * [[SketchView]] a count-min frequency sketch; this keeps
  * percentiles), built DDSketch-style (Masson et al., VLDB 2019):
  * log-scale buckets with RELATIVE-error value guarantees.
  *
  * Why DDSketch and not KLL/t-digest/GK: those sketches' merges are
  * ORDER-SENSITIVE — fold A then B and you hold different bytes than
  * folding B then A — which breaks the family's core contract (the
  * maintained state is bit-identical to a from-scratch build, so no
  * drift accumulates over months of folds). DDSketch state is integer
  * counts per log-bucket; folds are counter ADDITION — associative,
  * commutative, order-independent — so the maintained view after any
  * sequence of batches equals one build over their union exactly,
  * like HLL's register-max and CMS's counter-add (spec-pinned).
  *
  * Spark shapes: bucket assignment is one in-row codegen expression
  * (ceil(log_γ v)); per-batch counts are a groupBy over ≤ a few
  * thousand bucket keys (log_γ spans 15 decades in ~2k buckets at
  * α=1%) with map-side partial aggregation; the fold is a unionByName
  * + re-aggregate of two bucket tables. Nothing data-sized ever
  * reaches the driver — quantile queries read the KB-scale state.
  *
  * Guarantee: `quantile(q)` returns v̂ with |v̂ − v| ≤ α·|v| for the
  * true q-quantile v (both signs handled by a mirrored negative
  * histogram; zeros counted exactly; nulls skipped).
  */
object QuantileView {

  /** `alpha` = guaranteed relative value error of every quantile. */
  final case class Spec(column: String, alpha: Double = 0.01)

  private def gamma(alpha: Double): Double = (1 + alpha) / (1 - alpha)

  /** In-row bucket key: (sign, ceil(log_γ |v|)); zero → (0, 0). */
  private def bucketCol(c: org.apache.spark.sql.Column, alpha: Double) = {
    val lg = log(gamma(alpha), abs(c.cast("double")))
    struct(signum(c.cast("double")).cast("int").as("sign"),
      when(c.cast("double") === 0.0, 0L)
        .otherwise(ceil(lg).cast("long")).as("bucket"))
  }

  /** One batch → its bucket-count table (sign, bucket, cnt). NaN and
    * ±Infinity rows are skipped like nulls — under non-ANSI casts
    * signum(NaN) and ceil(log NaN) both land on 0, silently counting
    * NaNs as exact zeros, and ceil(log ∞) lands on Long.MaxValue,
    * making quantile() return Infinity for high quantiles (or failing
    * the job outright under ANSI). Only finite values bucket. */
  private def bucketize(batch: DataFrame, spec: Spec): DataFrame =
    batch.filter(col(spec.column).isNotNull &&
        !isnan(col(spec.column).cast("double")) &&
        abs(col(spec.column).cast("double")) =!= Double.PositiveInfinity)
      .select(bucketCol(col(spec.column), spec.alpha).as("b"))
      .groupBy(col("b.sign").as("sign"), col("b.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Current state (sign, bucket, cnt) or empty. */
  def state(spark: SparkSession, root: String): Option[DataFrame] =
    VersionedTable.currentVersion(spark, root)
      .map(_ => VersionedTable.read(spark, root))

  private def commitState(spark: SparkSession, root: String,
      merged: DataFrame, spec: Spec, batchId: Option[Long]): Long =
    VersionedTable.commit(spark, root) { stage =>
      merged.coalesce(1).write.mode("overwrite").parquet(stage)
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(stage),
        spark.sparkContext.hadoopConfiguration)
      // the buckets are meaningless without the γ they were cut with:
      // stamp α into the version dir (one `=`-free hidden marker, so
      // flat scans never see it) and refuse folds/reads at another α.
      // Double.toString is locale-independent and round-trips exactly
      // (an f"%.9f" both breaks under comma-decimal locales and fails
      // its own guard for alphas needing more digits).
      fs.create(new org.apache.hadoop.fs.Path(stage,
        s"_alpha-${java.lang.Double.toString(spec.alpha)}"), true).close()
      batchId.foreach(VersionedTable.stampBatch(spark, stage, _))
    }

  /** The α the current state was bucketed with (None before the first
    * fold; also None for pre-marker states, which predate the guard). */
  def storedAlpha(spark: SparkSession, root: String): Option[Double] =
    VersionedTable.currentVersion(spark, root).flatMap { _ =>
      val dir = VersionedTable.currentPath(spark, root)
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dir),
        spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
        .map(_.getPath.getName)
        .collectFirst { case n if n.startsWith("_alpha-") =>
          n.stripPrefix("_alpha-").toDouble }
    }

  private def requireAlpha(spark: SparkSession, root: String,
      spec: Spec): Unit =
    storedAlpha(spark, root).foreach { a =>
      require(math.abs(a - spec.alpha) < 1e-12,
        s"state at $root was bucketed with alpha=$a; " +
          s"reading or folding it at alpha=${spec.alpha} would be silently wrong")
    }

  private def merge(spark: SparkSession, root: String, batch: DataFrame,
      spec: Spec): DataFrame = {
    requireAlpha(spark, root, spec)
    val fresh = bucketize(batch, spec)
    state(spark, root) match {
      case None => fresh
      case Some(cur) => cur.unionByName(fresh)
        .groupBy("sign", "bucket").agg(sum(col("cnt")).as("cnt"))
    }
  }

  /** Fold one batch into the maintained state. */
  def update(spark: SparkSession, root: String, batch: DataFrame,
      spec: Spec): Long =
    commitState(spark, root, merge(spark, root, batch, spec), spec, None)

  /** Fold a micro-batch EXACTLY ONCE (idempotent by batchId; same
    * marker protocol as [[MaterializedAgg.foldBatch]]). */
  def foldBatch(spark: SparkSession, root: String, batch: DataFrame,
      spec: Spec, batchId: Long): Boolean = {
    if (VersionedTable.lastFoldedBatch(spark, root).exists(_ >= batchId))
      return false
    commitState(spark, root, merge(spark, root, batch, spec), spec,
      Some(batchId))
    true
  }

  /** The q-quantile estimate (0 ≤ q ≤ 1) with |v̂ − v| ≤ α·|v|, from
    * the KB-scale state: negative buckets walk from the most negative
    * (highest |bucket| first), then zeros, then positive ascending.
    * Bucket i covers (γ^(i−1), γ^i]; the midpoint estimate 2γ^i/(γ+1)
    * carries the α bound. Returns None before the first fold. */
  def quantile(spark: SparkSession, root: String, spec: Spec,
      q: Double): Option[Double] =
    quantiles(spark, root, spec, Seq(q))(q)

  /** Batch form: several quantiles from ONE state read (the state is
    * KBs; the collect happens once, not per q). */
  def quantiles(spark: SparkSession, root: String, spec: Spec,
      qs: Seq[Double]): Map[Double, Option[Double]] = {
    // one read; quantile() per q would re-collect the state each time
    requireAlpha(spark, root, spec)
    val g = gamma(spec.alpha)
    state(spark, root) match {
      case None => qs.map(_ -> None).toMap
      case Some(st) =>
        val rows = st.collect().map(r =>
          (r.getAs[Int]("sign"), r.getAs[Long]("bucket"), r.getAs[Long]("cnt")))
        if (rows.isEmpty) qs.map(_ -> None).toMap
        else {
          val ordered = rows.sortBy { case (s, b, _) =>
            if (s < 0) (0, -b) else if (s == 0) (1, 0L) else (2, b)
          }
          val n = ordered.map(_._3).sum
          val cum = ordered.scanLeft(0L)(_ + _._3).tail
          qs.map { q =>
            require(q >= 0 && q <= 1, s"quantile $q out of [0,1]")
            val rank = math.max(1L, math.ceil(q * n).toLong)
            val i = cum.indexWhere(_ >= rank)
            val (s, b, _) = ordered(i)
            val mag = 2.0 * math.pow(g, b.toDouble) / (g + 1)
            q -> Some(if (s < 0) -mag else if (s == 0) 0.0 else mag)
          }.toMap
        }
    }
  }

  /** WINSORIZE a batch against the MAINTAINED quantile state: clip
    * `spec.column` to the sketch's [pLo, pHi] estimates — q115's
    * cleaning pass without its per-batch bounds scan. At 100 TB the
    * difference is structural: exact bounds need two passes over the
    * batch (and drift batch-to-batch); the maintained DDSketch serves
    * α-accurate CORPUS-WIDE bounds from KBs of state, so clipping is
    * pure MAP-SIDE work with bounds that are stable across the whole
    * ingestion history — fold each batch, then clip the next against
    * the state-so-far (the DsirView fold-then-use cadence). Refuses
    * before the first fold (clipping against nothing would silently
    * pass everything). */
  def clip(spark: SparkSession, root: String, batch: DataFrame,
      spec: Spec, pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo < pHi, s"pLo=$pLo must be below pHi=$pHi")
    val qs = quantiles(spark, root, spec, Seq(pLo, pHi))
    val (lo, hi) = (qs(pLo), qs(pHi)) match {
      case (Some(l), Some(h)) => (l, h)
      case _ => throw new IllegalStateException(
        s"no folded quantile state at $root — fold a batch before clipping")
    }
    batch.withColumn(spec.column,
      least(greatest(col(spec.column), lit(lo)), lit(hi)))
  }

  /** Streaming maintenance: each micro-batch folds exactly once. */
  def runStream(spark: SparkSession, srcDir: String, viewRoot: String,
      checkpointDir: String, schema: StructType, spec: Spec): StreamingQuery =
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
      .trigger(Trigger.AvailableNow())
      .start()
}
