package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.util.Checkpoints.CutOps

/** Multimodal-column plumbing: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with a typed metadata struct;
  * decode/feature-extraction runs batch-wise over partitions so a real
  * decoder (JNI/FFI or a Python worker at the end of the pipeline)
  * slots in without changing the plan shape.
  *
  * The container has no media libraries, so `decodeStub` is a
  * clearly-marked deterministic fake — the Spark-side contract
  * (schema, batch iteration, partitioning) is real and tested.
  */
object Multimodal {

  /** Metadata carried alongside every blob. */
  val metaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("content_hash", StringType, nullable = false)))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("feature", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  /** Build a blob table from the documents: payload as opaque binary +
    * typed metadata. (Stands in for reading real image/audio files —
    * same shape: binary column + metadata struct.) */
  def blobTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        lit("text/fake-image").as("modality"),
        md5(col("text").cast("binary")).as("content_hash")).as("meta"))

  /** STUB decoder: deterministic fake "image decode + feature
    * extract". A real implementation would replace the body of the
    * per-batch function with an actual codec; everything around it
    * (mapPartitions batching, row encoding, schema) stays. */
  def decodeStub(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    val rdd = blobs.select("doc_id", "payload").rdd.mapPartitions { it =>
      // one "decoder" per partition (where codec init would happen);
      // per-row work is pure byte math so results are deterministic
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val n = bytes.length.toLong
        // fake dimensions derived from content, as a real decode would
        val h0 = bytes.take(8).foldLeft(1125899906842597L)((a, b) => 31 * a + b)
        val w = (math.abs(h0) % 640 + 1).toInt
        val h = (math.abs(h0 / 640) % 480 + 1).toInt
        // fake 8-dim feature: mean byte value per stride-8 lane
        val feat = (0 until 8).map { lane =>
          val lanes = bytes.indices.collect {
            case i if i % 8 == lane => bytes(i) & 0xFF
          }
          if (lanes.isEmpty) 0.0 else lanes.sum.toDouble / lanes.length
        }.toArray
        Row(id, n, w, h, feat.toSeq)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  val resizedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** STUB resize: 1→1 batch transform to a fixed target geometry.
    * The fake "resample" deterministically strides the source bytes to
    * the target size; a real implementation swaps the inner loop for a
    * codec call. Plumbing (schema, batch shape, partitioning) real. */
  def resizeStub(blobs: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = blobs.sparkSession
    val n = targetW.toLong * targetH
    val rdd = blobs.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val out = new Array[Byte](n.toInt)
        var i = 0
        while (i < out.length) {
          out(i) = if (bytes.isEmpty) 0 else bytes((i * bytes.length / out.length) % bytes.length)
          i += 1
        }
        Row(r.getLong(0), targetW, targetH, out)
      }
    }
    spark.createDataFrame(rdd, resizedSchema)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** STUB frame sampling: the 1→N batch shape (one video blob emits a
    * row per sampled frame, via iterator flatMap — no per-partition
    * materialization, so an hour-long video streams). The fake
    * "demux" slices the payload into fixed-size chunks and keeps
    * every `everyN`-th; a real demuxer replaces the slicing only. */
  def frameSampleStub(blobs: DataFrame, frameBytes: Int = 64,
      everyN: Int = 4): DataFrame = {
    val spark = blobs.sparkSession
    val rdd = blobs.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val nFrames = bytes.length / frameBytes
        (0 until nFrames by everyN).iterator.map { f =>
          Row(id, f, java.util.Arrays.copyOfRange(bytes,
            f * frameBytes, (f + 1) * frameBytes))
        }
      }
    }
    spark.createDataFrame(rdd, frameSchema)
  }

  val embedSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false),
      nullable = false),
    StructField("label", StringType, nullable = false)))

  /** STUB embedder: blob → unit-L2-norm `Array[Float]` — the bridge
    * from the multimodal columns into the vector stack (its output
    * schema IS the embeddings-table schema, so VectorIndex / ANN /
    * near-dup operators consume it unchanged). The fake embedding is
    * per-lane signed byte sums, L2-normalized — deterministic and
    * content-sensitive; a real model inference (ONNX/JNI or a Python
    * worker) replaces the per-row math, keeping the batch plumbing. */
  def embedStub(blobs: DataFrame, dim: Int = 16): DataFrame = {
    val spark = blobs.sparkSession
    val rdd = blobs.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val raw = new Array[Double](dim)
        var i = 0
        while (i < bytes.length) {
          val v = bytes(i) & 0xFF
          raw(i % dim) += (if ((v & 1) == 1) v else -v)
          i += 1
        }
        val nrm = math.sqrt(raw.map(x => x * x).sum)
        val emb = raw.map(x => if (nrm == 0) 0f else (x / nrm).toFloat)
        Row(id, emb.toSeq, "blob")
      }
    }
    spark.createDataFrame(rdd, embedSchema)
  }

  /** Distinct per-video frame hashes: frame demux (the 1→N stub) →
    * 64-bit content hash per frame. With a real decoder the hash
    * becomes a perceptual hash (pHash/videohash — public practice for
    * near-dup video detection); the DISTRIBUTED shape is identical
    * either way: frames never leave the executor as bytes, only
    * (doc_id, hash) longs shuffle. */
  def frameHashes(blobs: DataFrame, frameBytes: Int = 64,
      everyN: Int = 4): DataFrame =
    frameSampleStub(blobs, frameBytes, everyN)
      .select(col("doc_id"), xxhash64(col("frame")).as("fh"))
      .distinct()

  /** NEAR-DUP VIDEO pairs by frame-hash Jaccard — the multimodal twin
    * of q31's document near-dup: videos sharing ≥ `t` of their
    * distinct sampled-frame hashes (re-encodes, trims, and re-uploads
    * share most frames; unrelated videos share none). Postings-join
    * shape: the frame-hash table self-joins ON THE HASH — candidate
    * volume follows shared-frame buckets, never |videos|² — then one
    * pair-keyed aggregate and a broadcast-free count join. At crawl
    * scale a hot bucket (an intro card shared by thousands of
    * videos) is the q31 prefix-filter / q32 banding lever; the
    * composition here keeps the exact form. */
  def nearDupVideoPairs(blobs: DataFrame, t: Double,
      frameBytes: Int = 64, everyN: Int = 4): DataFrame = {
    val fh = frameHashes(blobs, frameBytes, everyN).cutLineage()
    val nf = fh.groupBy("doc_id").agg(count(lit(1)).as("nf"))
    fh.select(col("doc_id").as("a"), col("fh"))
      .join(fh.select(col("doc_id").as("b"), col("fh")), Seq("fh"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
      .join(nf.select(col("doc_id").as("a"), col("nf").as("na")), Seq("a"))
      .join(nf.select(col("doc_id").as("b"), col("nf").as("nb")), Seq("b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= t)
      .select("a", "b", "inter", "jaccard")
  }

  /** Greedy near-dup video drop: remove every video with a SMALLER-id
    * near-dup (the dropNearDupsWithinBatch policy, applied to blobs).
    * Returns the surviving blob rows unchanged. */
  def dropNearDupVideos(blobs: DataFrame, t: Double,
      frameBytes: Int = 64, everyN: Int = 4): DataFrame = {
    val dropped = nearDupVideoPairs(blobs, t, frameBytes, everyN)
      .select(col("b").as("doc_id")).distinct()
    blobs.join(dropped, Seq("doc_id"), "left_anti")
  }

  /** Oracle-checkable slice of the blob pipeline: metadata projection
    * (byte length + content hash) — q41. */
  val q41: (SparkSession, String) => DataFrame = (s, d) =>
    blobTable(s, d).select(
      col("doc_id"),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.modality").as("modality"),
      col("meta.content_hash").as("content_hash"))

  val q41Sql: String =
    """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  'text/fake-image' AS modality, md5(text) AS content_hash
      |FROM documents""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_blob_meta" -> q41)
  val oracleSql: Map[String, String] = Map(
    "q41_blob_meta" -> q41Sql)
}
