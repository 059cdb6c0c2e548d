package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** MODEL-BASED quality filtering — the classifier stage of the
  * GPT-3/LLaMA data pipelines (Brown et al. 2020 §A; Touvron et al.
  * 2023: a linear classifier over hashed text features separates
  * "reference-like" documents from the crawl, and the corpus keeps
  * docs the model scores high). Re-expressed Spark-first:
  *
  *  - FEATURES are hashed token counts: `pmod(hash(term), dim)` in
  *    plain Catalyst (Murmur3 — the codegen'd builtin), so the exact
  *    same expression builds features at train and at score time;
  *    no external tokenizer or feature library.
  *  - TRAINING runs on a bounded LABELED SAMPLE (the weak-label
  *    shape: "docs from a trusted slice = positive") through
  *    spark.ml's LogisticRegression — model-sized work, one
  *    driver-coordinated job over the sample, exactly the
  *    `KMeansVec`/`VectorPQ` sample-bounded discipline.
  *  - The MODEL persists as a plain (bucket, weight) parquet table +
  *    a 1-row intercept — no ML-pipeline serialization, nothing a
  *    reader needs spark.ml for.
  *  - SCORING is the 100-TB path and uses ZERO UDFs and ZERO ml
  *    classes: explode → bucket → broadcast-join the weight table
  *    (≤ dim rows, KBs–MBs) → one per-doc aggregate →
  *    `sigmoid(intercept + Σ w·count)` as a fixed expression. Plans
  *    as scan + broadcast hash join + partial aggregate; linear,
  *    shuffle = one doc-keyed aggregate.
  *
  * The vector assembly at TRAIN time uses one udf to build the
  * spark.ml SparseVector — acceptable there: the train set is
  * sample-bounded by contract, never the corpus.
  */
object QualityModel {

  private def fsOf(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)

  /** Resolve the LIVE model root: the highest committed generation
    * dir (`root/g<N>` under `_gens/gen-<N>` markers), or `root`
    * itself for flat/new layouts — the [[VectorIndex]] generation
    * protocol applied to the classifier, so a periodic re-fit flips
    * atomically and an in-flight scorer keeps a consistent model. */
  private def dataRoot(spark: SparkSession, root: String): String = {
    val fs = fsOf(spark, root)
    val gens = new org.apache.hadoop.fs.Path(s"$root/_gens")
    if (!fs.exists(gens)) root
    else {
      val ns = fs.listStatus(gens).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("gen-")).map(_.stripPrefix("gen-").toLong)
      if (ns.isEmpty) root else s"$root/g${ns.max}"
    }
  }

  /** Committed model generation (0 = flat/legacy layout). */
  def generation(spark: SparkSession, root: String): Long = {
    val fs = fsOf(spark, root)
    val gens = new org.apache.hadoop.fs.Path(s"$root/_gens")
    if (!fs.exists(gens)) 0L
    else fs.listStatus(gens).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("gen-")).map(_.stripPrefix("gen-").toLong)
      .foldLeft(0L)(math.max)
  }

  /** Whether a trained model exists under `root`. */
  def exists(spark: SparkSession, root: String): Boolean =
    fsOf(spark, root).exists(new org.apache.hadoop.fs.Path(
      s"${dataRoot(spark, root)}/meta/_SUCCESS"))

  /** RE-FIT the classifier on a fresh labeled sample and commit it as
    * a new generation with ONE marker write — scorers see the old
    * weights until the flip, the new after, never a mix. The
    * classifier twin of [[VectorIndex.retrain]]: a model trained on
    * an early crawl slice drifts as the corpus shifts; the daemon
    * re-fits on cadence. A crashed attempt's unmarked `g<N>` dir is
    * invisible and overwritten by the next try. Returns the committed
    * generation. */
  def retrain(spark: SparkSession, root: String, sample: DataFrame,
      labelCol: String = "label", textCol: String = "text",
      idCol: String = "doc_id", dim: Int = 1 << 18, maxIter: Int = 60,
      regParam: Double = 1e-4): Long = {
    val fs = fsOf(spark, root)
    val next = generation(spark, root) + 1L
    val stage = s"$root/g$next"
    fs.delete(new org.apache.hadoop.fs.Path(stage), true) // crashed try
    train(sample, stage, labelCol, textCol, idCol, dim, maxIter, regParam)
    require(fs.exists(new org.apache.hadoop.fs.Path(
      s"$stage/meta/_SUCCESS")),
      s"retrain left no complete model at $stage")
    val marker = new org.apache.hadoop.fs.Path(s"$root/_gens/gen-$next")
    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close() // commit point: model flips live
    next
  }

  /** Delete superseded generation dirs (and the flat legacy model
    * once a generation took over). Call on the maintenance cadence so
    * in-flight scorers get a grace window. Returns roots deleted. */
  def vacuumGenerations(spark: SparkSession, root: String): Long = {
    val fs = fsOf(spark, root)
    val cur = generation(spark, root)
    if (cur == 0L) return 0L
    var n = 0L
    (1L until cur).foreach { m =>
      val d = new org.apache.hadoop.fs.Path(s"$root/g$m")
      if (fs.exists(d)) { fs.delete(d, true); n += 1 }
    }
    Seq("weights", "meta").foreach { s =>
      val d = new org.apache.hadoop.fs.Path(s"$root/$s")
      if (fs.exists(d)) { fs.delete(d, true); n += 1 }
    }
    n
  }

  /** Tokens → hashed buckets, the ONE feature definition train and
    * score share. */
  private def buckets(docs: DataFrame, textCol: String, idCol: String,
      dim: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextOps.words(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .select(col("doc_id"), pmod(hash(col("term")), lit(dim)).as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))

  /** Train on a labeled sample: `labelCol` must be 0.0/1.0. Persists
    * the model under `root` as `weights` (bucket, weight — only
    * non-zero rows) and `meta` (intercept, dim). The sample should be
    * BOUNDED (thousands–millions of rows, the weak-label slice) —
    * training is model-sized work by contract. */
  def train(sample: DataFrame, root: String, labelCol: String = "label",
      textCol: String = "text", idCol: String = "doc_id",
      dim: Int = 1 << 18, maxIter: Int = 60, regParam: Double = 1e-4): Unit = {
    val spark = sample.sparkSession
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.linalg.Vectors
    val feats = buckets(sample, textCol, idCol, dim)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("bucket"), col("cnt"))))
        .as("bc"))
    val toVec = udf((bc: Seq[org.apache.spark.sql.Row]) =>
      Vectors.sparse(dim, bc.map(_.getInt(0)).toArray,
        bc.map(_.getLong(1).toDouble).toArray))
    val train = sample.select(col(idCol).as("doc_id"),
        col(labelCol).cast("double").as("label"))
      .join(feats, Seq("doc_id"))
      .select(col("label"), toVec(col("bc")).as("features"))
    val model = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).setStandardization(false)
      .fit(train)
    val w = model.coefficients.toArray
    val rows = w.iterator.zipWithIndex.collect {
      case (v, i) if v != 0.0 => (i, v)
    }.toSeq
    import spark.implicits._
    val rt = dataRoot(spark, root) // live generation (root when flat)
    rows.toDF("bucket", "weight").repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$rt/weights")
    Seq((model.intercept, dim)).toDF("intercept", "dim")
      .write.mode(SaveMode.Overwrite).parquet(s"$rt/meta")
  }

  /** Score any document frame against the persisted model: appends
    * `quality_p` = P(positive). Pure Catalyst — scan, broadcast hash
    * join on the bucket, one doc-keyed aggregate, a sigmoid
    * projection. Docs with zero in-vocabulary tokens score
    * `sigmoid(intercept)`. */
  def score(spark: SparkSession, root: String, docs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val rt = dataRoot(spark, root) // resolved ONCE: a concurrent
    // retrain flip cannot hand this scorer mixed weights/meta
    val meta = spark.read.parquet(s"$rt/meta").head()
    val (b, dim) = (meta.getDouble(0), meta.getInt(1))
    val weights = spark.read.parquet(s"$rt/weights")
    val z = buckets(docs.select(col(idCol).as("doc_id"),
        col(textCol).as("text")), "text", "doc_id", dim)
      .join(broadcast(weights), Seq("bucket"))
      .groupBy("doc_id")
      // per-bucket contribution rounded to 6 dp, folded through the
      // exact decimal accumulator (§4 discipline): a plain double sum
      // is accumulation-order-dependent, so a doc near the gate
      // threshold could flip across repartitionings — gate decisions
      // must be stable under any partition layout
      .agg(graft.util.Exact.dsum(round(col("weight") * col("cnt"), 6))
        .as("wx"))
    docs.select(col(idCol).as("doc_id")).distinct()
      .join(z, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (lit(1.0) / (lit(1.0) +
          exp(-(coalesce(col("wx"), lit(0.0)) + lit(b)))))
          .as("quality_p"))
  }
}
