package graft.sources

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** READ-ONLY Delta Lake compatibility reader (r10 verdict item 6 —
  * the single most user-visible interop gap: a user adopting this
  * engine almost certainly has existing Delta tables).
  *
  * Implements the PUBLISHED Delta transaction-log protocol
  * (github.com/delta-io/delta PROTOCOL.md), JSON commit log only:
  * `_delta_log/%020d.json` files are replayed in version order; each
  * line is one action — `add` registers a data file (with its
  * partition values), `remove` tombstones one, the LAST `metaData`
  * wins (metadata-only schema evolution), `protocol` gates reader
  * compatibility. Zero new dependencies: jackson (already on Spark's
  * classpath) parses the log; the data files are plain parquet scans.
  *
  * Spark-first partition handling: Delta data files do NOT contain
  * their partition columns — values live in the log's
  * `add.partitionValues`. Files are grouped by partition tuple and
  * each group becomes one parquet scan with its partition columns
  * attached as literals; groups union. A filter on a partition column
  * then constant-folds to `false` on non-matching branches and
  * Catalyst's empty-relation propagation PRUNES those scans from the
  * plan — partition pruning via the optimizer, no custom source
  * needed (spec-pinned: the pruned branch's relation vanishes from
  * the optimized plan).
  *
  * Supported: reader-version-1 tables (add/remove/metaData/protocol/
  * commitInfo/txn), partitioned or not, schema evolution across
  * commits, `asOfVersion` time travel, multi-part checkpoints ABSENT
  * (JSON log only — tables with checkpoints still read IF every
  * commit's JSON is retained, the default).
  * NOT supported (throws loudly rather than mis-reading): deletion
  * vectors, column mapping, generated/identity columns requiring
  * writer features, reader version ≥ 3 feature tables
  * (v2Checkpoint, timestampNtz, …), `_last_checkpoint`-only logs
  * (truncated JSON history).
  */
object DeltaCompat {

  private val mapper = new ObjectMapper()

  final case class AddFile(path: String, partitionValues: Map[String, String])

  final case class Snapshot(version: Long, schema: StructType,
      partitionColumns: Seq[String], files: Seq[AddFile])

  /** Replay the JSON commit log up to `asOfVersion` (inclusive;
    * None = latest) and return the table snapshot. */
  def snapshot(spark: SparkSession, tablePath: String,
      asOfVersion: Option[Long] = None): Snapshot = {
    val logDir = new Path(tablePath, "_delta_log")
    val fs = logDir.getFileSystem(
      spark.sessionState.newHadoopConf())
    require(fs.exists(logDir), s"not a Delta table (no _delta_log): $tablePath")
    val versionRe = """(\d{20})\.json""".r
    val commits = fs.listStatus(logDir).toSeq
      .flatMap { st =>
        st.getPath.getName match {
          case versionRe(v) => Some((v.toLong, st.getPath))
          case _ => None
        }
      }
      .filter { case (v, _) => asOfVersion.forall(v <= _) }
      .sortBy(_._1)
    require(commits.nonEmpty,
      s"no JSON commits in $logDir" +
        asOfVersion.fold("")(v => s" at or below version $v"))
    require(commits.head._1 == 0L,
      s"JSON log starts at version ${commits.head._1}, not 0 — the " +
        "early history was checkpoint-truncated; this reader replays " +
        "JSON commits only (see class doc)")
    require(commits.zipWithIndex.forall { case ((v, _), i) => v == i },
      s"gap in JSON commit versions under $logDir")

    var schema: StructType = null
    var partCols: Seq[String] = Seq.empty
    val files = mutable.LinkedHashMap[String, AddFile]()
    for ((_, p) <- commits) {
      val in = fs.open(p)
      val content = try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n != -1) { bos.write(buf, 0, n); n = in.read(buf) }
        bos.toString("UTF-8")
      } finally in.close()
      content.linesIterator.filter(_.trim.nonEmpty).foreach { line =>
        val node = mapper.readTree(line)
        if (node.has("protocol")) checkProtocol(node.get("protocol"))
        if (node.has("metaData")) {
          val md = node.get("metaData")
          val fmt = Option(md.get("format")).flatMap(f =>
            Option(f.get("provider"))).map(_.asText).getOrElse("parquet")
          require(fmt == "parquet", s"unsupported data format: $fmt")
          val mapping = Option(md.get("configuration"))
            .flatMap(c => Option(c.get("delta.columnMapping.mode")))
            .map(_.asText).getOrElse("none")
          require(mapping == "none",
            s"column mapping mode '$mapping' is not supported (class doc)")
          schema = DataType.fromJson(md.get("schemaString").asText)
            .asInstanceOf[StructType]
          partCols = Option(md.get("partitionColumns")).map(pc =>
            (0 until pc.size).map(pc.get(_).asText)).getOrElse(Seq.empty)
        }
        if (node.has("add")) {
          val a = node.get("add")
          require(!a.has("deletionVector") || a.get("deletionVector").isNull,
            "deletion vectors are not supported by this reader (class doc)")
          val pv = Option(a.get("partitionValues")).map { o =>
            val it = o.fieldNames()
            val m = mutable.LinkedHashMap[String, String]()
            while (it.hasNext) {
              val k = it.next()
              // null partition value = JSON null (protocol: missing
              // data encodes as null)
              m += k -> (if (o.get(k).isNull) null else o.get(k).asText)
            }
            m.toMap
          }.getOrElse(Map.empty[String, String])
          files += a.get("path").asText -> AddFile(a.get("path").asText, pv)
        }
        if (node.has("remove"))
          files -= node.get("remove").get("path").asText
      }
    }
    require(schema != null, s"no metaData action in the log of $tablePath")
    Snapshot(commits.last._1, schema, partCols, files.values.toSeq)
  }

  private def checkProtocol(p: JsonNode): Unit = {
    val reader = Option(p.get("minReaderVersion")).map(_.asInt).getOrElse(1)
    if (reader >= 3) {
      val feats = Option(p.get("readerFeatures")).map(f =>
        (0 until f.size).map(f.get(_).asText).toSet).getOrElse(Set.empty)
      // no reader feature (deletionVectors, columnMapping,
      // v2Checkpoint, timestampNtz, …) is implemented here
      require(feats.isEmpty,
        s"unsupported Delta reader features: ${feats.mkString(", ")}" +
          " (this reader supports the base reader-version-1 protocol only)")
    } else require(reader <= 2,
      s"unsupported minReaderVersion $reader")
    // reader version 2 tables are column-mapping CAPABLE; they only
    // break this reader if mapping is actually on, which the metaData
    // handler checks via delta.columnMapping.mode
  }

  /** Read the table as a DataFrame: one parquet scan per partition
    * tuple with the partition columns attached as cast literals,
    * unioned. Filters on partition columns constant-fold and prune
    * whole scans in the optimized plan. */
  def read(spark: SparkSession, tablePath: String,
      asOfVersion: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, tablePath, asOfVersion)
    require(snap.files.nonEmpty || snap.schema.nonEmpty,
      s"empty snapshot for $tablePath")
    val dataSchema = StructType(
      snap.schema.filterNot(f => snap.partitionColumns.contains(f.name)))
    val partTypes = snap.partitionColumns.map(c =>
      c -> snap.schema(c).dataType).toMap
    def abs(rel: String): String = {
      val p = new Path(rel)
      if (p.isAbsolute) rel else new Path(tablePath, rel).toString
    }
    if (snap.files.isEmpty) {
      // empty table: zero-row frame with the declared schema
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    }
    val groups = snap.files.groupBy(_.partitionValues).toSeq
      .sortBy(_._1.toSeq.sortBy(_._1).mkString(","))
    val parts = groups.map { case (pv, fs) =>
      var df = spark.read.schema(dataSchema)
        .parquet(fs.map(f => abs(f.path)): _*)
      snap.partitionColumns.foreach { c =>
        val v = pv.getOrElse(c, null)
        val t = partTypes(c)
        df = df.withColumn(c,
          (if (v == null) lit(null) else lit(v)).cast(t))
      }
      df.select(snap.schema.map(f => col(f.name)): _*)
    }
    parts.reduce(_ unionAll _)
  }

  /** Materialize a DataFrame as a MINIMAL protocol-valid Delta table:
    * Spark writes the parquet data files (partitioned layout if
    * `partitionBy` is set — Spark's `k=v/` dir convention is Delta's),
    * then one version-0 commit (protocol + metaData + adds) describes
    * them. Reader-version-1 only, single snapshot — an export/fixture
    * writer (real Delta readers can open the result), NOT a
    * transactional writer: no appends, no concurrent-commit
    * arbitration (that is `VersionedTable`'s job on its own format). */
  def writeTable(df: DataFrame, tablePath: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tablePath)
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // enumerate data files; partition values parse from the k=v dirs
    val it = fs.listFiles(root, true)
    val adds = mutable.ArrayBuffer[String]()
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (name.endsWith(".parquet") && !name.startsWith("_")) {
        val rel = st.getPath.toString
          .stripPrefix(fs.makeQualified(root).toString).stripPrefix("/")
        val pv = rel.split('/').dropRight(1).collect {
          case seg if seg.contains('=') =>
            val Array(k, v) = seg.split("=", 2)
            // Spark's partition-dir escaping is URL-style; values here
            // are plain category strings, but decode for safety
            s""""$k":"${java.net.URLDecoder.decode(v, "UTF-8")}""""
        }.mkString(",")
        adds += s"""{"add":{"path":"$rel","partitionValues":{$pv},""" +
          s""""size":${st.getLen},"modificationTime":${st.getModificationTime},""" +
          """"dataChange":true}}"""
      }
    }
    require(adds.nonEmpty, s"no data files written under $tablePath")
    val schemaJson = df.schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    val partJson = partitionBy.map(c => s""""$c"""").mkString(",")
    val lines = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"graft-${math.abs(tablePath.hashCode)}","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[$partJson],"configuration":{},"createdTime":0}}""") ++ adds
    val logDir = new Path(root, "_delta_log")
    fs.mkdirs(logDir)
    val out = fs.create(new Path(logDir, f"${0L}%020d.json"), true)
    try out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    // Spark's own _SUCCESS marker is harmless but not a Delta file
  }
}
