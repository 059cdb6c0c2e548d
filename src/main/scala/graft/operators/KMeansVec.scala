package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StructField, StructType}

/** Distributed Lloyd's k-means over an embedding column — the train
  * step for IVF coarse quantization (q49).
  *
  * Shape at 100 TB: every iteration is two codegen aggregations over
  * the exploded (vec, pos, x) view — assignment via a broadcast
  * centroid join (n·k·d product rows flow through map-side partial
  * aggregation, never materialized), then per-(cluster, pos) means.
  * Only the k×d centroid matrix ever reaches the driver (k≈2¹⁰ even
  * at scale ⇒ KB), which is what makes the loop legitimate: the DATA
  * never collects, the model does. Deterministic: hash-ranked init,
  * fixed iteration count, index tiebreaks.
  */
object KMeansVec {

  /** Train k centroids with `iters` Lloyd iterations. Returns the
    * centroid matrix (cent_id → components). */
  def train(emb: DataFrame, k: Int, iters: Int): Array[Array[Double]] = {
    val el = emb.select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos"), col("col").cast("double").as("x"))
      .cache()
    // deterministic pseudo-random init: k vectors with the lowest
    // xxhash64(vec_id) — order-free, seed-free, stable across runs
    var cents: Array[Array[Double]] = emb
      .select(col("vec_id"), col("embedding"))
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy(col("h"), col("vec_id"))
      .limit(k).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)

    val spark = emb.sparkSession
    (1 to iters).foreach { _ =>
      val centRows = cents.zipWithIndex.flatMap { case (c, id) =>
        c.zipWithIndex.map { case (v, pos) => Row(id, pos, v) }
      }
      val centEl = spark.createDataFrame(
        spark.sparkContext.parallelize(centRows.toSeq, 1),
        StructType(Seq(StructField("cent_id", IntegerType),
          StructField("pos", IntegerType), StructField("c", DoubleType))))
      // nearest centroid by squared euclidean distance:
      // argmin |v−c|² = argmin (|c|² − 2·v·c); |v|² is constant per vec
      val cNormSq = cents.map(c => c.map(x => x * x).sum)
      val cNorms = spark.createDataFrame(
        spark.sparkContext.parallelize(
          cNormSq.zipWithIndex.map { case (n, id) => Row(id, n) }.toSeq, 1),
        StructType(Seq(StructField("cent_id", IntegerType),
          StructField("cn", DoubleType))))
      val assign = el.join(broadcast(centEl), Seq("pos"))
        .groupBy("vec_id", "cent_id")
        .agg(sum(col("x") * col("c")).as("dot"))
        .join(broadcast(cNorms), Seq("cent_id"))
        .withColumn("score", col("cn") - lit(2.0) * col("dot"))
        .groupBy("vec_id")
        .agg(min_by(col("cent_id"), struct(col("score"), col("cent_id"))).as("cent_id"))
      val next = el.join(assign, Seq("vec_id"))
        .groupBy("cent_id", "pos")
        .agg(avg(col("x")).as("c"))
        .collect()
      val updated = cents.map(_.clone())
      next.foreach { r =>
        updated(r.getAs[Int]("cent_id"))(r.getAs[Int]("pos")) = r.getAs[Double]("c")
      }
      cents = updated
    }
    el.unpersist()
    cents
  }

  /** Centroid matrix as a (cent_id, cvec) DataFrame for IVF search. */
  def centroidsDF(spark: SparkSession, cents: Array[Array[Double]]): DataFrame = {
    val rows = cents.zipWithIndex.map { case (c, id) => Row(id.toLong, c.toSeq) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(StructField("cent_id", org.apache.spark.sql.types.LongType),
        StructField("cvec", ArrayType(DoubleType)))))
  }
}
