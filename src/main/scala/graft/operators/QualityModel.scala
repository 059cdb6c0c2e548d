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
    rows.toDF("bucket", "weight").repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$root/weights")
    Seq((model.intercept, dim)).toDF("intercept", "dim")
      .write.mode(SaveMode.Overwrite).parquet(s"$root/meta")
  }

  /** Score any document frame against the persisted model: appends
    * `quality_p` = P(positive). Pure Catalyst — scan, broadcast hash
    * join on the bucket, one doc-keyed aggregate, a sigmoid
    * projection. Docs with zero in-vocabulary tokens score
    * `sigmoid(intercept)`. */
  def score(spark: SparkSession, root: String, docs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val meta = spark.read.parquet(s"$root/meta").head()
    val (b, dim) = (meta.getDouble(0), meta.getInt(1))
    val weights = spark.read.parquet(s"$root/weights")
    val z = buckets(docs.select(col(idCol).as("doc_id"),
        col(textCol).as("text")), "text", "doc_id", dim)
      .join(broadcast(weights), Seq("bucket"))
      .groupBy("doc_id")
      .agg(sum(col("weight") * col("cnt")).as("wx"))
    docs.select(col(idCol).as("doc_id")).distinct()
      .join(z, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (lit(1.0) / (lit(1.0) +
          exp(-(coalesce(col("wx"), lit(0.0)) + lit(b)))))
          .as("quality_p"))
  }
}
