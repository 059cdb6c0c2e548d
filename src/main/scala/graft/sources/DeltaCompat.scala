package graft.sources

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** READ-ONLY Delta Lake compatibility reader (r10 verdict item 6 —
  * the single most user-visible interop gap: a user adopting this
  * engine almost certainly has existing Delta tables).
  *
  * Implements the PUBLISHED Delta transaction-log protocol
  * (github.com/delta-io/delta PROTOCOL.md): the table state is the
  * latest classic checkpoint parquet (`%020d.checkpoint.parquet`,
  * single- or multi-part, discovered from the `_last_checkpoint`
  * pointer and cross-checked against the directory listing — the
  * protocol says the pointer may be stale) plus a replay of the JSON
  * commits after it (`_delta_log/%020d.json`, one action per line:
  * `add` registers a data file with its partition values, `remove`
  * tombstones one, the LAST `metaData` wins, `protocol` gates reader
  * compatibility). Tables whose early JSON history was checkpoint-
  * truncated — which is MOST mature Delta tables, since writers
  * checkpoint every 10 commits and log-cleanup deletes old JSON —
  * read through the checkpoint. Zero new dependencies: jackson
  * (already on Spark's classpath) parses the log, the checkpoint is
  * a plain parquet file Spark already reads, and each checkpoint row
  * is re-serialized to JSON so ONE action interpreter handles both
  * log forms.
  *
  * Spark-first partition handling, single-relation plan: Delta data
  * files do NOT contain their partition columns — values live in the
  * log's `add.partitionValues`. The whole file set becomes ONE
  * `HadoopFsRelation` over a log-backed [[FileIndex]] whose
  * `PartitionDirectory` rows carry the typed partition values
  * (`Cast` from the protocol's string serialization). Catalyst's
  * file-source strategy pushes partition-column predicates into
  * `listFiles`, so pruning is O(#partitions) METADATA work inside one
  * scan node — the plan itself is O(1) in partition count (the r11
  * per-tuple-union shape was O(#partitions) analyzer work on every
  * query; a daily-partitioned 10-year table is a 3,650-way union).
  * Driver memory is O(#live files), the same bound as the log replay
  * itself. `add.path` is an RFC 2396 URI per the protocol and is
  * DECODED when resolved against the table root (raw strings stay
  * the add/remove map keys so replay is byte-exact).
  *
  * Supported: reader-version-1 tables (add/remove/metaData/protocol/
  * commitInfo/txn), partitioned or not, schema evolution across
  * commits, `asOfVersion` time travel (at, before, and after a
  * checkpoint), classic single- and multi-part checkpoints,
  * checkpoint-truncated JSON history.
  * NOT supported (throws loudly rather than mis-reading): deletion
  * vectors, column mapping, v2 checkpoints / sidecars and other
  * reader version ≥ 3 feature tables (v2Checkpoint, timestampNtz, …).
  */
object DeltaCompat {

  private val mapper = new ObjectMapper()

  final case class AddFile(path: String, partitionValues: Map[String, String],
      size: Long, modificationTime: Long)

  final case class Snapshot(version: Long, schema: StructType,
      partitionColumns: Seq[String], files: Seq[AddFile])

  /** Mutable log-replay state shared by the checkpoint and JSON
    * paths: one action interpreter, two transports. */
  private final class ReplayState {
    var schema: StructType = null
    var partCols: Seq[String] = Seq.empty
    // keyed by the RAW path string exactly as written in the log —
    // decode happens only at Path-resolution time, so add/remove
    // pairing is byte-exact regardless of how the writer encoded
    val files: mutable.LinkedHashMap[String, AddFile] =
      mutable.LinkedHashMap[String, AddFile]()
  }

  /** Apply one action (a parsed JSON-log line, or a checkpoint row
    * re-serialized to JSON). `fromCheckpoint` skips `remove`: a
    * checkpoint's removes are expired tombstones retained for vacuum,
    * not state transitions. */
  private def applyAction(node: JsonNode, st: ReplayState,
      fromCheckpoint: Boolean): Unit = {
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
      st.schema = DataType.fromJson(md.get("schemaString").asText)
        .asInstanceOf[StructType]
      st.partCols = Option(md.get("partitionColumns")).map(pc =>
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
      val path = a.get("path").asText
      val size = Option(a.get("size")).filterNot(_.isNull)
        .map(_.asLong).getOrElse(-1L)
      val mtime = Option(a.get("modificationTime")).filterNot(_.isNull)
        .map(_.asLong).getOrElse(0L)
      st.files += path -> AddFile(path, pv, size, mtime)
    }
    if (node.has("remove") && !fromCheckpoint)
      st.files -= node.get("remove").get("path").asText
  }

  /** Replay the log (latest usable checkpoint + JSON commits) up to
    * `asOfVersion` (inclusive; None = latest) and return the table
    * snapshot. */
  def snapshot(spark: SparkSession, tablePath: String,
      asOfVersion: Option[Long] = None): Snapshot = {
    val logDir = new Path(tablePath, "_delta_log")
    val fs = logDir.getFileSystem(
      spark.sessionState.newHadoopConf())
    require(fs.exists(logDir), s"not a Delta table (no _delta_log): $tablePath")
    val versionRe = """(\d{20})\.json""".r
    val cpSingleRe = """(\d{20})\.checkpoint\.parquet""".r
    val cpMultiRe = """(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet""".r
    val listing = fs.listStatus(logDir).toSeq
    val jsons = listing.flatMap { s =>
      s.getPath.getName match {
        case versionRe(v) => Some(v.toLong -> s.getPath)
        case _ => None
      }
    }.toMap
    // classic checkpoints, keeping only COMPLETE part sets (protocol:
    // a multi-part checkpoint is unusable unless all N parts exist)
    val cpParts = mutable.Map[Long, mutable.Map[Int, Path]]()
    val cpTotal = mutable.Map[Long, Int]()
    listing.foreach { s =>
      s.getPath.getName match {
        case cpSingleRe(v) =>
          cpParts.getOrElseUpdate(v.toLong, mutable.Map()) += 1 -> s.getPath
          cpTotal(v.toLong) = 1
        case cpMultiRe(v, part, total) =>
          cpParts.getOrElseUpdate(v.toLong, mutable.Map()) +=
            part.toInt -> s.getPath
          cpTotal(v.toLong) = total.toInt
        case _ => ()
      }
    }
    val checkpoints: Map[Long, Seq[Path]] = cpParts.toMap.collect {
      case (v, parts) if parts.size == cpTotal(v) =>
        v -> (1 to cpTotal(v)).map(parts(_))
    }
    // `_last_checkpoint` is a pointer the protocol allows to be stale
    // or to name a checkpoint mid-write; parse it (it is the fast
    // path on object stores where LIST is expensive) but trust only
    // pointers whose checkpoint files are actually complete
    val lastCpFile = new Path(logDir, "_last_checkpoint")
    val lastCpHint: Option[Long] =
      if (!fs.exists(lastCpFile)) None
      else try {
        val in = fs.open(lastCpFile)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        Some(mapper.readTree(txt).get("version").asLong)
          .filter(checkpoints.contains)
      } catch { case scala.util.control.NonFatal(_) => None }

    val allVersions = jsons.keySet ++ checkpoints.keySet
    require(allVersions.nonEmpty, s"no JSON commits or checkpoints in $logDir")
    val reachable = allVersions.filter(v => asOfVersion.forall(v <= _))
    require(reachable.nonEmpty,
      s"no log state in $logDir at or below version ${asOfVersion.get} — " +
        "the early JSON history was checkpoint-truncated past it")
    val target = reachable.max
    // base = newest usable checkpoint ≤ target with contiguous JSON
    // after it (the `_last_checkpoint` hint first — on a real table
    // it IS the answer); fall back to pure-JSON replay from 0
    val cpCandidates =
      (lastCpHint.toSeq ++ checkpoints.keys.toSeq.sorted.reverse)
        .filter(v => v <= target &&
          ((v + 1) to target).forall(jsons.contains))
    val base: Option[Long] = cpCandidates.headOption
    require(base.isDefined || (0L to target).forall(jsons.contains),
      s"cannot reconstruct version $target of $tablePath: the JSON log " +
        s"is checkpoint-truncated (earliest JSON ${jsons.keySet.minOption
          .getOrElse("none")}) and no complete checkpoint ≤ $target " +
        s"covers the gap (checkpoints at ${checkpoints.keySet.toSeq.sorted
          .mkString("[", ",", "]")})")

    val st = new ReplayState
    base.foreach { cpV =>
      // one parquet read; each row is one action struct — re-serialize
      // to JSON (toJSON omits null fields) and reuse the interpreter.
      // Driver-side collect is O(#live files), the replay state's own
      // bound. Reject v2-checkpoint layouts loudly.
      val cp = spark.read.parquet(checkpoints(cpV).map(_.toString): _*)
      require(!cp.columns.contains("checkpointMetadata") &&
        !cp.columns.contains("sidecar"),
        "v2 checkpoints (sidecar layout) are not supported (class doc)")
      cp.toJSON.collect().foreach { line =>
        applyAction(mapper.readTree(line), st, fromCheckpoint = true)
      }
      require(st.schema != null,
        s"checkpoint $cpV of $tablePath has no metaData row")
    }
    for (v <- (base.fold(0L)(_ + 1L)) to target; p = jsons(v)) {
      val in = fs.open(p)
      val content = try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n != -1) { bos.write(buf, 0, n); n = in.read(buf) }
        bos.toString("UTF-8")
      } finally in.close()
      content.linesIterator.filter(_.trim.nonEmpty).foreach { line =>
        applyAction(mapper.readTree(line), st, fromCheckpoint = false)
      }
    }
    require(st.schema != null, s"no metaData action in the log of $tablePath")
    Snapshot(target, st.schema, st.partCols, st.files.values.toSeq)
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

  /** Resolve an add/remove `path` against the table root. Per
    * PROTOCOL.md the field is an RFC 2396 URI (percent-encoded),
    * relative to the table root unless absolute — decode BEFORE
    * touching the filesystem (a raw `new Path(rel)` reads the wrong
    * file, or none, whenever a name contains a space/'%'/unicode).
    * Illegal URIs (some writers emit raw paths) fall back to the
    * literal string. */
  private[sources] def resolvePath(root: Path, rel: String): Path = {
    val uri =
      try new java.net.URI(rel)
      catch { case _: java.net.URISyntaxException => null }
    if (uri == null) {
      val p = new Path(rel)
      if (p.isAbsolute) p else new Path(root, p)
    } else if (uri.isAbsolute) new Path(uri)
    else {
      // decoded relative path; the 3-arg Path ctor skips URI
      // re-parsing so ':' or '%' in decoded names stay literal
      val p = new Path(null, null, uri.getPath)
      if (p.isAbsolute) p else new Path(root, p)
    }
  }

  /** Read the table as a DataFrame: ONE parquet relation over a
    * log-backed FileIndex carrying the partition spec; partition-
    * column predicates prune file listings inside the single scan
    * node (plan size independent of partition count). */
  def read(spark: SparkSession, tablePath: String,
      asOfVersion: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, tablePath, asOfVersion)
    require(snap.files.nonEmpty || snap.schema.nonEmpty,
      s"empty snapshot for $tablePath")
    if (snap.files.isEmpty) {
      // empty table: zero-row frame with the declared schema
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], snap.schema)
    }
    val dataSchema = StructType(
      snap.schema.filterNot(f => snap.partitionColumns.contains(f.name)))
    val partitionSchema = StructType(
      snap.partitionColumns.map(c => snap.schema(c)))
    val root = new Path(tablePath)
    val qualified = root.getFileSystem(
      spark.sessionState.newHadoopConf()).makeQualified(root)
    val metaFiles = snap.files.map(f => MetaDataFile(
      resolvePath(qualified, f.path), f.size, f.modificationTime,
      f.partitionValues))
    val index = new MetaFileIndex(spark, root, partitionSchema, metaFiles)
    val relation = HadoopFsRelation(index, partitionSchema, dataSchema,
      None, new ParquetFileFormat(), Map.empty[String, String])(spark)
    spark.baseRelationToDataFrame(relation)
      .select(snap.schema.map(f => col(f.name)): _*)
  }

  /** Materialize a DataFrame as a MINIMAL protocol-valid Delta table:
    * Spark writes the parquet data files (partitioned layout if
    * `partitionBy` is set — Spark's `k=v/` dir convention is Delta's),
    * then one version-0 commit (protocol + metaData + adds) describes
    * them. Reader-version-1 only, single snapshot — an export/fixture
    * writer (real Delta readers can open the result), NOT a
    * transactional writer: no appends, no concurrent-commit
    * arbitration (that is `VersionedTable`'s job on its own format).
    * Partition dir names unescape via Spark's own Hive-path rules
    * (URLDecoder would corrupt a literal '+' to a space); emitted
    * `add.path` fields are URI-encoded per the protocol. */
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
            val dec = ExternalCatalogUtils.unescapePathName(v)
            val vJson =
              if (dec == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) "null"
              else mapper.writeValueAsString(dec)
            s"${mapper.writeValueAsString(k)}:$vJson"
        }.mkString(",")
        val uriPath = new java.net.URI(null, null, rel, null).toASCIIString
        adds += s"""{"add":{"path":${mapper.writeValueAsString(uriPath)},""" +
          s""""partitionValues":{$pv},""" +
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

  /** Write a classic single-part checkpoint parquet for `version`
    * (default: latest) plus the `_last_checkpoint` pointer — the
    * maintenance step that lets log-cleanup delete old JSON commits
    * (and the reason a reader MUST understand checkpoints). Row
    * layout per PROTOCOL.md's checkpoint schema: one action struct
    * per row (`protocol` / `metaData` / one `add` per live file),
    * null elsewhere; expired tombstones are vacuum bookkeeping and a
    * fresh snapshot has none to persist. */
  def checkpoint(spark: SparkSession, tablePath: String,
      version: Option[Long] = None): Long = {
    import spark.implicits._
    val snap = snapshot(spark, tablePath, version)
    val schemaJson = snap.schema.json
    val protoLine =
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
    val mdNode = mapper.createObjectNode()
    val md = mdNode.putObject("metaData")
    md.put("id", s"graft-${math.abs(tablePath.hashCode)}")
    md.putObject("format").put("provider", "parquet")
      .putObject("options")
    md.put("schemaString", schemaJson)
    val pcArr = md.putArray("partitionColumns")
    snap.partitionColumns.foreach(pcArr.add)
    md.putObject("configuration")
    md.put("createdTime", 0L)
    val addLines = snap.files.map { f =>
      val n = mapper.createObjectNode()
      val a = n.putObject("add")
      a.put("path", f.path)
      val pvo = a.putObject("partitionValues")
      f.partitionValues.foreach { case (k, v) =>
        if (v == null) pvo.putNull(k) else pvo.put(k, v)
      }
      a.put("size", f.size)
      a.put("modificationTime", f.modificationTime)
      a.put("dataChange", true)
      mapper.writeValueAsString(n)
    }
    val actionLines = Seq(protoLine, mapper.writeValueAsString(mdNode)) ++
      addLines
    // JSON-lines → one struct row per action, written as ONE parquet
    // file (a checkpoint must be self-consistent; one part suffices
    // for the file counts this writer targets)
    val df = spark.read.json(actionLines.toDS())
    val logDir = new Path(tablePath, "_delta_log")
    val fs = logDir.getFileSystem(spark.sessionState.newHadoopConf())
    val staging = new Path(logDir, s".cp_staging_${snap.version}")
    df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = fs.listStatus(staging).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"checkpoint staging produced no parquet: $staging"))
    val dest = new Path(logDir, f"${snap.version}%020d.checkpoint.parquet")
    fs.delete(dest, false)
    require(fs.rename(part, dest), s"rename $part -> $dest failed")
    fs.delete(staging, true)
    val ptr = fs.create(new Path(logDir, "_last_checkpoint"), true)
    try ptr.write(
      s"""{"version":${snap.version},"size":${actionLines.size}}"""
        .getBytes("UTF-8"))
    finally ptr.close()
    snap.version
  }
}
