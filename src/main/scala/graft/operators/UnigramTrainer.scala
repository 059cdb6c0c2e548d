package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo, ACL 2018 — the SentencePiece
  * unigram model; public): pieces carry probabilities, a word's
  * segmentation is the Viterbi-best piece sequence, and training
  * alternates EM probability re-fits with pruning of low-probability
  * pieces until the vocabulary reaches the target size.
  *
  * Scale discipline — exactly [[BpeTrainer]]'s: training never needs
  * the corpus after ONE distributed pass. The (distinct word, count)
  * dictionary is vocabulary-sized (Heaps' law) and hash-sample-bounded
  * by `maxWords`, so the seed-substring extraction, the EM rounds, and
  * the pruning sweeps all run DRIVER-LOCAL over a model-sized table —
  * total job count independent of vocabulary size or EM rounds.
  * Encoding is pure map-side (the piece table broadcasts, KBs).
  *
  * Determinism: the dictionary sample is hash-ranked, seed selection
  * and pruning break ties lexicographically, EM iterates pieces in
  * sorted order, and Viterbi prefers the LONGEST piece then
  * lexicographic on equal score — the learned model is reproducible
  * across runs, partitionings, and cluster sizes (spec-pinned).
  *
  * Simplification vs the paper, documented: the E-step uses VITERBI
  * (hard) counts rather than full forward-backward expectations, and
  * pruning drops the lowest-probability pieces directly rather than
  * re-scoring the likelihood loss of each removal. Both keep the
  * alternating structure and the single-character coverage floor;
  * hard-EM unigram models are a standard, deterministic variant. */
object UnigramTrainer {

  /** Reserved id for characters outside the trained alphabet —
    * [[encode]] maps them here and counts them per doc. */
  val UnkId = 0

  /** log-prob assigned to an out-of-alphabet single character during
    * segmentation, low enough that known pieces always win but finite
    * so every string segments. */
  private val UnkLogProb = -1e4

  /** A trained model: pieces sorted lexicographically, each with its
    * log probability. Single characters of the training alphabet are
    * always present (the coverage floor). */
  type Model = Array[(String, Double)]

  /** The bounded word-frequency dictionary — ONE corpus pass, then
    * driver-local. Mirrors BpeTrainer.train's dictionary stage. */
  private def dictionary(docs: DataFrame, textCol: String,
      maxWords: Int): Array[(String, Long)] = {
    require(maxWords > 0,
      "UnigramTrainer: pass maxWords > 0 — the EM loop is driver-local " +
        "over the bounded dictionary (the BpeTrainer discipline)")
    docs.select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .withColumn("h", xxhash64(col("w")))
      .orderBy(col("h"), col("w")).limit(maxWords)
      .select("w", "n")
      .collect().map(r => (r.getString(0), r.getLong(1)))
  }

  /** Viterbi-best segmentation of `w` under piece log-probs `lp`.
    * Ties: higher score wins; on equal score the LONGER last piece,
    * then the lexicographically smaller one — a total order, so the
    * segmentation is deterministic. */
  private[graft] def viterbi(w: String, lp: collection.Map[String, Double],
      maxPieceLen: Int): Vector[String] = {
    val n = w.length
    if (n == 0) return Vector.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1) // start index of the piece ending here
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (best(j) > Double.NegativeInfinity) {
          val piece = w.substring(j, i)
          val p =
            if (lp.contains(piece)) lp(piece)
            else if (i - j == 1) UnkLogProb
            else Double.NegativeInfinity
          if (p > Double.NegativeInfinity) {
            val s = best(j) + p
            val better = s > best(i) ||
              (s == best(i) && (back(i) == -1 || j < back(i) ||
                (j == back(i) && piece < w.substring(back(i), i))))
            if (better) { best(i) = s; back(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    var k = n
    var pieces = List.empty[String]
    while (k > 0) { val j = back(k); pieces = w.substring(j, k) :: pieces; k = j }
    pieces.toVector
  }

  /** Train a unigram-LM piece table of (at most) `vocabSize` pieces
    * over the corpus' `textCol`.
    *
    * Rounds: seed = the `seedFactor * vocabSize` highest
    * frequency·length substrings (≤ `maxPieceLen`) of the bounded
    * dictionary, plus every single character; then alternate
    * [`emIters` hard-EM re-fits] with [prune the lowest-probability
    * `pruneFrac` of multi-char pieces] until ≤ `vocabSize` pieces
    * remain, finishing with a final EM re-fit. */
  def train(docs: DataFrame, vocabSize: Int, textCol: String = "text",
      maxWords: Int = 50000, maxPieceLen: Int = 8, emIters: Int = 2,
      pruneFrac: Double = 0.25, seedFactor: Int = 4): Model = {
    require(vocabSize > 0, "vocabSize must be positive")
    val dict = dictionary(docs, textCol, maxWords)
    // single-character coverage floor: never pruned
    val chars: Set[String] =
      dict.iterator.flatMap(_._1.map(_.toString)).toSet
    // seed: substring counts weighted by frequency (longer pieces
    // naturally score high via their count·length product)
    val seedCount = scala.collection.mutable.HashMap.empty[String, Long]
    dict.foreach { case (w, n) =>
      var i = 0
      while (i < w.length) {
        var l = 2
        while (l <= maxPieceLen && i + l <= w.length) {
          val s = w.substring(i, i + l)
          seedCount(s) = seedCount.getOrElse(s, 0L) + n * l
          l += 1
        }
        i += 1
      }
    }
    val seedBudget = math.max(vocabSize * seedFactor - chars.size, 0)
    val seeded: Array[String] = seedCount.toArray
      .sortBy { case (s, c) => (-c, s) }.take(seedBudget).map(_._1)
    var pieces: Array[String] = (chars.toArray ++ seeded).distinct.sorted

    def emFit(ps: Array[String]): Array[(String, Double)] = {
      var lp: Map[String, Double] = {
        val u = -math.log(ps.length.toDouble)
        ps.iterator.map(p => p -> u).toMap
      }
      var it = 0
      while (it < emIters) {
        val cnt = scala.collection.mutable.HashMap.empty[String, Double]
        dict.foreach { case (w, n) =>
          viterbi(w, lp, maxPieceLen).foreach { p =>
            if (lp.contains(p)) cnt(p) = cnt.getOrElse(p, 0.0) + n.toDouble
          }
        }
        val tot = math.max(cnt.valuesIterator.sum, 1.0)
        // Laplace floor keeps unused pieces finite for the pruner
        lp = ps.iterator.map(p =>
          p -> math.log((cnt.getOrElse(p, 0.0) + 0.5) / (tot + 0.5 * ps.length))
        ).toMap
        it += 1
      }
      ps.sorted.map(p => (p, lp(p)))
    }

    var model = emFit(pieces)
    while (model.length > vocabSize) {
      val (charRows, multiRows) = model.partition(_._1.length == 1)
      val keepMulti = math.max(vocabSize - charRows.length,
        math.min(multiRows.length - 1,
          (multiRows.length * (1.0 - pruneFrac)).toInt))
      val kept = multiRows.sortBy { case (p, l) => (-l, p) }.take(keepMulti)
      pieces = (charRows.map(_._1) ++ kept.map(_._1)).sorted
      val next = emFit(pieces)
      if (next.length == model.length) return next // floor reached
      model = next
    }
    model
  }

  /** Deterministic token→id vocabulary: id 0 = `<unk>`, then pieces
    * in lexicographic order. Columns: (token, id). */
  def vocab(model: Model): Array[(String, Int)] =
    ("<unk>", UnkId) +: model.map(_._1).sorted.zipWithIndex
      .map { case (t, i) => (t, i + 1) }

  private def maxLenOf(model: Model): Int =
    if (model.isEmpty) 1 else model.iterator.map(_._1.length).max

  /** ENCODE each doc to its Viterbi token-id sequence — same output
    * schema as [[BpeTrainer.encode]] (doc_id, ids, n_tokens, n_oov),
    * so [[BpeTrainer.packSequences]] packs either tokenizer's output
    * unchanged. Pure map-side: model + vocab broadcast. */
  def encode(docs: DataFrame, model: Model,
      vocabTable: Array[(String, Int)], textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val maxLen = maxLenOf(model)
    val bc = spark.sparkContext.broadcast(
      (model.toMap, vocabTable.toMap, maxLen))
    val rdd = docs.select(col(idCol).cast("long"), col(textCol)).rdd
      .mapPartitions { it =>
        val (lp, vm, ml) = bc.value
        it.map { r =>
          val id = r.getLong(0)
          val ws = Option(r.getString(1)).getOrElse("")
            .trim.split("\\s+").filter(_.nonEmpty)
          val ids = Array.newBuilder[Int]
          var oov = 0L
          ws.foreach { w =>
            viterbi(w, lp, ml).foreach { t =>
              val i = vm.getOrElse(t, UnkId)
              if (i == UnkId) oov += 1L
              ids += i
            }
          }
          val arr = ids.result()
          Row(id, arr, arr.length.toLong, oov)
        }
      }
    import org.apache.spark.sql.types._
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType),
      StructField("ids", ArrayType(IntegerType, containsNull = false)),
      StructField("n_tokens", LongType),
      StructField("n_oov", LongType))))
  }

  /** Per-doc token counts + fertility under the unigram model — the
    * comparison row against [[BpeTrainer.segment]] in vocab sweeps. */
  def segment(docs: DataFrame, model: Model, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val maxLen = maxLenOf(model)
    val bc = spark.sparkContext.broadcast((model.toMap, maxLen))
    val rdd = docs.select(col(idCol).cast("long"), col(textCol)).rdd
      .mapPartitions { it =>
        val (lp, ml) = bc.value
        it.map { r =>
          val id = r.getLong(0)
          val ws = Option(r.getString(1)).getOrElse("")
            .trim.split("\\s+").filter(_.nonEmpty)
          var tokens = 0L
          ws.foreach(w => tokens += viterbi(w, lp, ml).length.toLong)
          Row(id, ws.length.toLong, tokens)
        }
      }
    import org.apache.spark.sql.types._
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_words", LongType),
      StructField("n_tokens", LongType))))
      .withColumn("fertility",
        when(col("n_words") > 0,
          col("n_tokens").cast("double") / col("n_words")))
  }
}
