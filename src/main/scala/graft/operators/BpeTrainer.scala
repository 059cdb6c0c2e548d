package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich, Haddow & Birch, ACL
  * 2016 — public): learn `numMerges` byte-pair merges from a corpus,
  * then segment text with them.
  *
  * The scale insight BPE training rides is that it never needs the
  * corpus after one pass: merges are learned over the WORD-FREQUENCY
  * DICTIONARY — (distinct word, count) — which is vocabulary-sized
  * (~10⁵–10⁷ rows at any corpus size, Heaps' law), not corpus-sized.
  * So: one corpus-sized aggregate builds the dictionary; each of the
  * `numMerges` rounds is then one pair-count aggregate + one merge map
  * over dictionary rows only, with ONLY the argmax pair (one row)
  * reaching the driver per round. The dictionary can additionally be
  * hash-sample-bounded (`maxWords`, the KMeansVec/q61 primitive) —
  * frequency-ranked truncation is the standard practice when even the
  * vocabulary is huge.
  *
  * Determinism: the argmax pair breaks ties lexicographically, the
  * dictionary sample is hash-ranked, and merge application is a pure
  * function — so the learned merge table is reproducible across runs,
  * partitionings, and cluster sizes (spec-pinned).
  */
object BpeTrainer {

  /** End-of-word marker (the 2016 paper's `</w>`): lets the learner
    * distinguish "low" the word from "low" the prefix of "lower". */
  val Eow = "</w>"

  /** Split a word into its initial symbol sequence: one symbol per
    * character, end-of-word marker appended to the last. */
  private def initSymbols(w: String): Vector[String] = {
    val cs = w.map(_.toString).toVector
    if (cs.isEmpty) cs else cs.init :+ (cs.last + Eow)
  }

  /** Apply one learned merge (a, b) → "ab" to a symbol sequence. */
  private[operators] def applyMerge(sym: Vector[String],
      a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += sym(i); i += 1 }
    }
    out.result()
  }

  /** Learn `numMerges` merges from the corpus' `textCol`. Returns the
    * ordered merge table. `maxWords > 0` bounds the dictionary to the
    * hash-lowest N distinct words (deterministic sample). */
  def train(docs: DataFrame, numMerges: Int, textCol: String = "text",
      maxWords: Int = 0): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // ONE corpus-sized pass: the word-frequency dictionary
    var dict = docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)]
    if (maxWords > 0)
      dict = dict.toDF("w", "n")
        .withColumn("h", xxhash64(col("w")))
        .orderBy(col("h"), col("w")).limit(maxWords)
        .select("w", "n").as[(String, Long)]
    var words = dict.map { case (w, n) => (initSymbols(w), n) }
      .rdd.cache()
    val merges = Vector.newBuilder[(String, String)]
    // each round's pair-count fold is the ONLY action — it
    // materializes the current (cached) dictionary, after which the
    // PREVIOUS round's cache is safe to release; lineage is cut every
    // 16 rounds so long trainings keep constant-size plans (the
    // q66/q98 lesson)
    var prev: Option[org.apache.spark.rdd.RDD[(Vector[String], Long)]] = None
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      // weighted adjacent-pair counts over dictionary rows; argmax
      // with lexicographic tiebreak — ONE row to the driver
      val best = words.flatMap { case (sym, n) =>
        sym.iterator.zip(sym.iterator.drop(1)).map(p => (p, n))
      }.reduceByKey(_ + _)
        .map { case ((a, b), n) => (n, a, b) }
        .fold((0L, "", "")) { (x, y) =>
          if (y._1 > x._1 ||
            (y._1 == x._1 && y._1 > 0L && (y._2 < x._2 ||
              (y._2 == x._2 && y._3 < x._3)))) y
          else x
        }
      prev.foreach(_.unpersist(false))
      prev = None
      if (best._1 < 2) done = true // a pair seen once cannot compress
      else {
        val (_, a, b) = best
        merges += ((a, b))
        prev = Some(words)
        words = words.map { case (sym, n) =>
          (applyMerge(sym, a, b), n)
        }.cache()
        round += 1
        if (round % 16 == 0) {
          words.localCheckpoint()
          words.count()
        }
      }
    }
    prev.foreach(_.unpersist(false))
    words.unpersist(false)
    merges.result()
  }

  /** Segment `textCol` with a learned merge table: per-doc subword
    * token count plus the mean tokens-per-word fertility (the
    * tokenizer-quality number vocab sweeps optimize). Pure map-side —
    * the merge table broadcasts, nothing shuffles but the per-doc
    * output. */
  def segment(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(merges.toVector)
    val rdd = docs.select(col(idCol).cast("long"), col(textCol)).rdd
      .mapPartitions { it =>
        val ms = bc.value
        it.map { r =>
          val id = r.getLong(0)
          val ws = Option(r.getString(1)).getOrElse("")
            .trim.split("\\s+").filter(_.nonEmpty)
          var tokens = 0L
          ws.foreach { w =>
            var sym = initSymbols(w)
            ms.foreach { case (a, b) => sym = applyMerge(sym, a, b) }
            tokens += sym.length
          }
          Row(id, ws.length.toLong, tokens)
        }
      }
    spark.createDataFrame(rdd, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_words",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_tokens",
        org.apache.spark.sql.types.LongType))))
      .withColumn("fertility",
        when(col("n_words") > 0,
          col("n_tokens").cast("double") / col("n_words")))
  }
}
