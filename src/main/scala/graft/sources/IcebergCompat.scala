package graft.sources

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** READ-ONLY Apache Iceberg compatibility reader (r11 verdict
  * residual 3 — the second-in-line interop gap after Delta).
  * Implements the PUBLISHED Iceberg table spec
  * (iceberg.apache.org/spec): table state resolves
  * `metadata/version-hint.text` → `vN.metadata.json` (falling back to
  * the highest `v*.metadata.json` when the hint is absent/stale), the
  * current (or requested) snapshot's MANIFEST LIST (Avro) enumerates
  * its manifests, each manifest (Avro) carries `manifest_entry` rows
  * whose non-DELETED `data_file` records are the live parquet files
  * with their typed partition tuples. Zero new dependencies: the
  * manifests are parsed driver-side with the Avro core library
  * already on Spark's classpath (`GenericDatumReader` — manifests are
  * KB–MB metadata, which is exactly how Iceberg's own client reads
  * them), and the data files are plain parquet scans.
  *
  * The relation is the same single-scan shape as [[DeltaCompat]]:
  * ONE `HadoopFsRelation` over a [[MetaFileIndex]] whose partition
  * values come from the manifests' partition tuples (file sizes from
  * `file_size_in_bytes` — no filesystem RPCs), so partition pruning
  * is metadata work inside one scan node and the PLAN is O(1) in
  * partition count. Identity-transform partition columns may or may
  * not be present in the data files (Iceberg writers include them;
  * this library's fixture writer uses the Hive layout which strips
  * them) — the reader takes the values from the MANIFEST either way
  * and reads only the non-partition columns from parquet, so both
  * layouts read identically.
  *
  * Supported: format-version 1 and 2 tables, flat schemas of the
  * primitive types, identity (and void) partition transforms,
  * `asOfSnapshotId` time travel across the metadata's snapshot list,
  * v1 inline `manifests` arrays and v2 `manifest-list` files, and v2
  * merge-on-read POSITIONAL deletes — delete manifests (content=1)
  * contribute (file_path, pos) parquet delete files that apply as an
  * anti-join on the scan's `_metadata` columns (see [[read]]), and
  * [[deletePositional]] writes that MoR shape.
  * Non-identity partition transforms (bucket/truncate/day/…) READ
  * correctly — their derived tuples are metadata, not table columns,
  * and Iceberg data files always carry the full row — but contribute
  * no manifest-level pruning here (identity fields do).
  *
  * Round 13 (r12 verdict item 3): EQUALITY deletes (content=2) now
  * apply with the spec's SEQUENCE-NUMBER ordering — per-file data
  * sequence numbers come from the manifest entries (inheriting the
  * manifest-list row's on ADDED entries), and each (seq,
  * equality_ids) delete group anti-joins null-safely against only
  * the data rows with a STRICTLY LOWER sequence number, so a row
  * re-inserted after the delete survives it (the Flink/CDC upsert
  * pattern). Columns resolve BY FIELD ID (`parquet.field.id`
  * metadata on the scan schema + Spark's fieldId read conf), so
  * renamed-column histories read correctly — [[renameColumn]] is the
  * matching metadata-only evolution writer, [[deleteEquality]] the
  * matching MoR writer.
  * Round 13 also adds NESTED TYPES: struct/list/map schema-JSON
  * parses recursively to the Spark type, nested struct fields keep
  * their field-id metadata (so renamed NESTED fields resolve by id,
  * same as top level — list element / map key+value levels resolve
  * structurally, matching parquet's physical layout), and the export
  * writer allocates spec-compliant ids for every nested field
  * (element-id / key-id / value-id, `last-column-id` = the DFS
  * maximum) while stamping the same ids into the parquet files.
  * NOT supported, rejected loudly: non-parquet files,
  * format-version ≥ 3.
  */
object IcebergCompat {

  private val mapper = new ObjectMapper()

  final case class IceFile(path: String, size: Long,
      partitionValues: Map[String, String], seq: Long = 0L)

  /** A MoR delete file: `content` 1 = POSITIONAL (a parquet of
    * (file_path, pos) rows, or — format-version 3 — a PUFFIN
    * deletion-vector blob addressed by `dvRef`/`dvOffset`/`dvLength`),
    * 2 = EQUALITY (parquet of values for the `equalityIds` columns;
    * deletes every row of any data file with a STRICTLY LOWER data
    * sequence number whose values match null-safely — the spec's
    * ordering rule, which is what lets a row re-inserted after the
    * delete survive it). A v3 DV names exactly ONE data file
    * (`referenced_data_file`); when several snapshots carry DVs for
    * the same file, the HIGHEST-sequence one is the file's vector
    * (a replacement DV carries the union, per the spec). */
  final case class IceDelete(path: String, size: Long,
      content: Long = 1L, seq: Long = 0L, equalityIds: Seq[Int] = Seq.empty,
      dvRef: Option[String] = None, dvOffset: Option[Long] = None,
      dvLength: Option[Long] = None)

  final case class Snapshot(snapshotId: Long, schema: StructType,
      partitionColumns: Seq[String], files: Seq[IceFile],
      deletes: Seq[IceDelete] = Seq.empty)

  // ---- metadata.json ----

  private def readJson(spark: SparkSession, p: Path): JsonNode = {
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    mapper.readTree(txt)
  }

  /** Resolve the CURRENT metadata file: the `version-hint.text`
    * pointer when present and extant (the HadoopCatalog protocol),
    * else the highest `v*.metadata.json` in `metadata/`. */
  private def currentMetadataPath(spark: SparkSession,
      tablePath: String): Path = {
    val metaDir = new Path(tablePath, "metadata")
    val fs = metaDir.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(metaDir),
      s"not an Iceberg table (no metadata/ dir): $tablePath")
    val hint = new Path(metaDir, "version-hint.text")
    if (fs.exists(hint)) {
      val in = fs.open(hint)
      val n = try scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim finally in.close()
      val p = new Path(metaDir, s"v$n.metadata.json")
      if (fs.exists(p)) return p
      // stale hint: fall through to the directory scan
    }
    val versionRe = """v(\d+)\.metadata\.json""".r
    val versions = fs.listStatus(metaDir).toSeq.flatMap { st =>
      st.getPath.getName match {
        case versionRe(v) => Some(v.toLong -> st.getPath)
        case _ => None
      }
    }
    require(versions.nonEmpty,
      s"no v*.metadata.json under $metaDir")
    versions.maxBy(_._1)._2
  }

  private def toSparkType(t: String): DataType = t match {
    case "boolean" => BooleanType
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "string" => StringType
    case "date" => DateType
    case "timestamp" => TimestampNTZType
    case "timestamptz" => TimestampType
    case "binary" => BinaryType
    case dec if dec.startsWith("decimal(") =>
      val Array(p, s) = dec.stripPrefix("decimal(").stripSuffix(")")
        .split(",").map(_.trim.toInt)
      DecimalType(p, s)
    case other => throw new IllegalArgumentException(
      s"unsupported Iceberg primitive type '$other' — see class doc")
  }

  /** An Iceberg schema `type` node — a primitive string or a NESTED
    * struct/list/map object (round 13) — to the Spark type. Nested
    * struct fields keep their field-id metadata, so Spark's
    * field-id-based parquet resolution works at ANY depth (renamed
    * nested fields in old data files resolve by id, same as top
    * level); list element / map key+value ids have no StructField
    * metadata slot — those levels resolve structurally, which is
    * exact for parquet's list/map physical layout. */
  private def toSparkTypeNode(t: JsonNode): DataType =
    if (t.isTextual) toSparkType(t.asText)
    else t.get("type").asText match {
      case "struct" => schemaOf(t)
      case "list" =>
        ArrayType(toSparkTypeNode(t.get("element")),
          containsNull = !Option(t.get("element-required"))
            .exists(_.asBoolean(false)))
      case "map" =>
        MapType(toSparkTypeNode(t.get("key")),
          toSparkTypeNode(t.get("value")),
          valueContainsNull = !Option(t.get("value-required"))
            .exists(_.asBoolean(false)))
      case other => throw new IllegalArgumentException(
        s"unsupported Iceberg nested type kind '$other'")
    }

  /** The StructField metadata key Spark's parquet reader resolves
    * columns BY FIELD ID through (`spark.sql.parquet.fieldId.read
    * .enabled`) — the Iceberg spec's required column-resolution rule,
    * which is what makes renamed-column histories read correctly
    * (old data files carry old names but the SAME ids). */
  private val FieldIdKey = "parquet.field.id"

  private def schemaOf(node: JsonNode): StructType = {
    val fields = node.get("fields")
    StructType((0 until fields.size).map { i =>
      val f = fields.get(i)
      // a v3 initial-default fills the column for rows written BEFORE
      // it was added — ignoring it would silently read nulls
      require(!f.has("initial-default") || f.get("initial-default").isNull,
        s"field '${f.get("name").asText}' carries a v3 initial-default; " +
          "default-value fill is not implemented (would mis-read as null)")
      val md = new org.apache.spark.sql.types.MetadataBuilder()
      Option(f.get("id")).filterNot(_.isNull)
        .foreach(id => md.putLong(FieldIdKey, id.asLong))
      StructField(f.get("name").asText, toSparkTypeNode(f.get("type")),
        nullable = !f.get("required").asBoolean(false),
        metadata = md.build())
    })
  }

  /** field id -> current column name, from the schema's metadata. */
  private def idToName(schema: StructType): Map[Long, String] =
    schema.fields.flatMap(f =>
      if (f.metadata.contains(FieldIdKey))
        Some(f.metadata.getLong(FieldIdKey) -> f.name)
      else None).toMap

  // ---- avro manifest parsing (driver-side, KB–MB metadata) ----

  private def avroRecords(spark: SparkSession, p: Path)
      : Seq[GenericRecord] = {
    val in = new FsInput(p, spark.sessionState.newHadoopConf())
    val rd = new DataFileReader[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
    try rd.iterator().asScala.toVector finally { rd.close() }
  }

  // schema-safe accessors: a record written under an OLDER schema
  // (e.g. a pre-round-13 manifest list without sequence_number) has
  // no such field at all, and GenericData.Record.get THROWS on
  // unknown names rather than returning null
  private def str(r: GenericRecord, field: String): String =
    if (r.getSchema.getField(field) == null) null
    else Option(r.get(field)).map(_.toString).orNull

  private def lng(r: GenericRecord, field: String, dflt: Long): Long =
    if (r.getSchema.getField(field) == null) dflt
    else Option(r.get(field)).map(_.asInstanceOf[Number].longValue)
      .getOrElse(dflt)

  /** One manifest partition value (the Avro-decoded JVM object) → the
    * STRING serialization [[MetaFileIndex]]'s Cast-from-string expects
    * for the column's Spark type. TYPE-AWARE (r12 ADVICE high): the
    * Iceberg spec stores date partition values as int days-since-epoch,
    * timestamp/timestamptz as long MICROseconds, decimal as unscaled
    * big-endian fixed/bytes — a bare toString yields '18262' etc.,
    * which Cast to Date/Timestamp/Decimal silently evaluates to NULL,
    * so a real date-partitioned table read back with null partition
    * columns and partition pruning dropped every file. Timestamps
    * serialize with an explicit UTC zone marker (micros are UTC
    * instants per the spec) so the session-timezone Cast cannot shift
    * them; unsupported value shapes reject loudly like the other
    * unsupported paths. */
  private[graft] def partValueString(v: AnyRef, dt: DataType,
      colName: String): String = v match {
    case null => null
    case s: CharSequence => s.toString // already a string serialization
    case n: Number => dt match {
      case DateType =>
        java.time.LocalDate.ofEpochDay(n.longValue).toString
      case TimestampType =>
        val us = n.longValue
        java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
          Math.floorMod(us, 1000000L) * 1000L).toString // ...Z = UTC
      case TimestampNTZType =>
        val us = n.longValue
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
          .format(java.time.format.DateTimeFormatter.ofPattern(
            "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      case _: DecimalType | _: IntegerType.type | _: LongType.type |
           _: FloatType.type | _: DoubleType.type => n.toString
      case other => throw new IllegalArgumentException(
        s"partition column '$colName': cannot convert numeric manifest " +
          s"value to Spark type $other")
    }
    case b: java.lang.Boolean => b.toString
    case bytes @ (_: java.nio.ByteBuffer |
                  _: org.apache.avro.generic.GenericFixed) => dt match {
      case d: DecimalType =>
        val arr = bytes match {
          case bb: java.nio.ByteBuffer =>
            val dup = bb.duplicate()
            val a = new Array[Byte](dup.remaining()); dup.get(a); a
          case gf: org.apache.avro.generic.GenericFixed => gf.bytes()
        }
        new java.math.BigDecimal(
          new java.math.BigInteger(arr), d.scale).toPlainString
      case other => throw new IllegalArgumentException(
        s"partition column '$colName': fixed/bytes manifest value for " +
          s"non-decimal Spark type $other is not supported")
    }
    case other => throw new IllegalArgumentException(
      s"partition column '$colName': unsupported manifest partition " +
        s"value ${other.getClass.getName} for Spark type $dt")
  }

  /** Diagnostics: how many MANIFEST files this JVM has actually
    * opened and parsed — the number summary pruning exists to keep
    * small (spec-pinned on the many-manifest fixture). */
  private[graft] val manifestsOpened =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Everything the metadata.json tells us before any manifest is
    * opened. */
  private final case class TableMeta(schema: StructType,
      partPairs: Seq[(String, String)], snapNode: Option[JsonNode],
      wantedId: Long, totalFilesSize: Option[Long])

  private def tableMeta(spark: SparkSession, tablePath: String,
      asOfSnapshotId: Option[Long], ref: Option[String] = None)
      : TableMeta = {
    require(asOfSnapshotId.isEmpty || ref.isEmpty,
      "pass asOfSnapshotId OR ref, not both")
    val meta = readJson(spark, currentMetadataPath(spark, tablePath))
    val fv = Option(meta.get("format-version")).map(_.asInt).getOrElse(1)
    // v3 accepted for its DELETION-VECTOR feature (round 13); the v3
    // features a reader cannot silently ignore stay guarded —
    // initial-default rejects in schemaOf, unknown type kinds reject
    // in toSparkTypeNode, and row-lineage fields are pure metadata
    require(fv <= 3, s"unsupported Iceberg format-version $fv")
    // schema: the schemas list keyed by current-schema-id, or the
    // legacy single "schema" field (v1 tables)
    val schema: StructType =
      if (meta.has("schemas")) {
        val id = meta.get("current-schema-id").asInt
        val arr = meta.get("schemas")
        val node = (0 until arr.size).map(arr.get)
          .find(_.get("schema-id").asInt == id)
          .getOrElse(throw new IllegalArgumentException(
            s"current-schema-id $id not in schemas list"))
        schemaOf(node)
      } else schemaOf(meta.get("schema"))
    // identity partition columns from the default spec (or legacy
    // "partition-spec"); non-identity transforms reject loudly
    val specFields: Seq[JsonNode] =
      if (meta.has("partition-specs")) {
        val id = Option(meta.get("default-spec-id")).map(_.asInt).getOrElse(0)
        val arr = meta.get("partition-specs")
        val spec = (0 until arr.size).map(arr.get)
          .find(_.get("spec-id").asInt == id)
          .getOrElse(throw new IllegalArgumentException(
            s"default-spec-id $id not in partition-specs"))
        val fs = spec.get("fields")
        (0 until fs.size).map(fs.get)
      } else if (meta.has("partition-spec")) {
        val fs = meta.get("partition-spec")
        (0 until fs.size).map(fs.get)
      } else Seq.empty
    // identity fields re-attach from the manifest; NON-identity
    // transforms (bucket/truncate/day/…) derive EXTRA metadata
    // columns that are not table columns at all — Iceberg data files
    // always carry the full row, so such tables READ correctly by
    // simply ignoring the derived tuple (manifest-level partition
    // pruning for them is the documented loss, not correctness).
    // The SOURCE COLUMN resolves by source-id (spec rule): a renamed
    // column keeps the OLD spec-field name in the partition tuples,
    // so we track (spec field name, current column name) pairs.
    val idNames = idToName(schema)
    val partPairs: Seq[(String, String)] = specFields.flatMap { f =>
      f.get("transform").asText match {
        case "identity" =>
          val specName = f.get("name").asText
          val colName = Option(f.get("source-id")).filterNot(_.isNull)
            .map(_.asLong).flatMap(idNames.get).getOrElse(specName)
          Some(specName -> colName)
        case _ => None
      }
    }
    // snapshot selection: a NAMED REF (the spec's refs map — branches
    // and tags) resolves first, then an explicit snapshot id, then
    // the current snapshot
    val refId: Option[Long] = ref.map { r =>
      val refsNode = Option(meta.get("refs")).filterNot(_.isNull)
        .getOrElse(throw new IllegalArgumentException(
          s"table $tablePath has no refs; cannot resolve '$r'"))
      val node = Option(refsNode.get(r)).filterNot(_.isNull)
        .getOrElse(throw new IllegalArgumentException(
          s"unknown ref '$r' in $tablePath (have " +
            refsNode.fieldNames.asScala.mkString("[", ",", "]") + ")"))
      node.get("snapshot-id").asLong
    }
    val snaps = Option(meta.get("snapshots")).map(arr =>
      (0 until arr.size).map(arr.get)).getOrElse(Seq.empty)
    val wantedId = refId.orElse(asOfSnapshotId).orElse(
      Option(meta.get("current-snapshot-id")).map(_.asLong)
        .filter(_ != -1L))
    val snapNode = wantedId.map { id =>
      snaps.find(_.get("snapshot-id").asLong == id)
        .getOrElse(throw new IllegalArgumentException(
          s"snapshot $id not in the metadata of $tablePath (have " +
            s"${snaps.map(_.get("snapshot-id").asLong).mkString("[", ",", "]")})"))
    }
    val totalSize = snapNode.flatMap(sn =>
      Option(sn.get("summary")).flatMap(s =>
        Option(s.get("total-files-size"))).filterNot(_.isNull)
        .flatMap(n => scala.util.Try(n.asText.toLong).toOption)
        .filter(_ > 0))
    TableMeta(schema, partPairs, snapNode, wantedId.getOrElse(-1L),
      totalSize)
  }

  /** The snapshot's manifests, from ONE manifest-list read: lazy
    * refs (path, sequence number, field summaries) + content flag.
    * No data manifest is opened here. */
  private def manifestRefs(spark: SparkSession, root: Path,
      snapNode: Option[JsonNode]): Seq[(IceManifestRef, Long)] =
    snapNode.toSeq.flatMap { sn =>
      val snapSeq = Option(sn.get("sequence-number"))
        .filterNot(_.isNull).map(_.asLong).getOrElse(0L)
      if (sn.has("manifest-list")) {
        val mlPath = DeltaCompat.resolvePath(root,
          sn.get("manifest-list").asText)
        avroRecords(spark, mlPath).map { mf =>
          val sums: Option[Seq[IceFieldSummary]] =
            (if (mf.getSchema.getField("partitions") == null) None
             else Option(mf.get("partitions"))).collect {
              case arr: java.util.Collection[_] =>
                arr.asScala.toSeq.map { s0 =>
                  val s = s0.asInstanceOf[GenericRecord]
                  def bytesOf(f: String): Option[Array[Byte]] =
                    if (s.getSchema.getField(f) == null) None
                    else Option(s.get(f)).map {
                      case bb: java.nio.ByteBuffer =>
                        val d = bb.duplicate()
                        val a = new Array[Byte](d.remaining()); d.get(a); a
                      case gf: org.apache.avro.generic.GenericFixed =>
                        gf.bytes()
                      case other => other.toString.getBytes("UTF-8")
                    }
                  IceFieldSummary(
                    Option(s.get("contains_null"))
                      .exists(_.asInstanceOf[Boolean]),
                    bytesOf("lower_bound"), bytesOf("upper_bound"))
                }
            }
          (IceManifestRef(
            DeltaCompat.resolvePath(root, str(mf, "manifest_path")),
            lng(mf, "sequence_number", snapSeq), sums),
            lng(mf, "content", 0L))
        }
      } else {
        val arr = sn.get("manifests")
        require(arr != null,
          "snapshot carries neither manifest-list nor manifests")
        (0 until arr.size).map(i =>
          (IceManifestRef(
            DeltaCompat.resolvePath(root, arr.get(i).asText), 0L, None),
            0L))
      }
    }

  /** Parse ONE manifest into its live (non-DELETED) files/deletes.
    * Thread-safe; counts into [[manifestsOpened]]. */
  private def parseManifest(spark: SparkSession, mp: Path,
      manifestContent: Long, listSeq: Long, schema: StructType,
      partPairs: Seq[(String, String)])
      : (Seq[IceFile], Seq[IceDelete]) = {
    manifestsOpened.incrementAndGet()
    val files = mutable.ArrayBuffer[IceFile]()
    val deletes = mutable.ArrayBuffer[IceDelete]()
    avroRecords(spark, mp).foreach { entry =>
      val status = lng(entry, "status", 1L)
      if (status != 2L) { // 2 = DELETED: not part of the snapshot
        val dfr = entry.get("data_file").asInstanceOf[GenericRecord]
        val fmt = str(dfr, "file_format")
        val content = math.max(lng(dfr, "content", 0L), manifestContent)
        // puffin is legal ONLY for v3 deletion vectors (content=1 with
        // a referenced data file); everything else must be parquet
        val isPuffin = fmt != null && fmt.equalsIgnoreCase("puffin")
        require(fmt != null && (fmt.equalsIgnoreCase("parquet") ||
            (isPuffin && content == 1L)),
          s"unsupported data file format: $fmt (content=$content)")
        val entrySeq = lng(entry, "sequence_number", listSeq)
        content match {
          case 0L =>
            val pv: Map[String, String] =
              Option(dfr.get("partition")) match {
                case Some(pr: GenericRecord) =>
                  partPairs.map { case (specName, c) =>
                    // the tuple's field carries the SPEC name; fall
                    // back to the current column name for writers
                    // that used it directly
                    val raw: AnyRef =
                      if (pr.getSchema.getField(specName) != null)
                        pr.get(specName)
                      else if (pr.getSchema.getField(c) != null)
                        pr.get(c)
                      else null
                    c -> partValueString(raw, schema(c).dataType, c)
                  }.toMap
                case _ => Map.empty
              }
            files += IceFile(str(dfr, "file_path"),
              lng(dfr, "file_size_in_bytes", -1L), pv, entrySeq)
          case 1L if isPuffin =>
            // v3 DELETION VECTOR: one blob per referenced data file,
            // addressed inside the puffin file by offset + length
            val ref = str(dfr, "referenced_data_file")
            val off = lng(dfr, "content_offset", -1L)
            val len = lng(dfr, "content_size_in_bytes", -1L)
            require(ref != null && off >= 0 && len > 0,
              s"puffin deletion vector in $mp lacks " +
                "referenced_data_file/content_offset/content_size_in_bytes")
            deletes += IceDelete(str(dfr, "file_path"),
              lng(dfr, "file_size_in_bytes", -1L), 1L, entrySeq,
              Seq.empty, Some(ref), Some(off), Some(len))
          case 1L =>
            deletes += IceDelete(str(dfr, "file_path"),
              lng(dfr, "file_size_in_bytes", -1L), 1L, entrySeq)
          case 2L =>
            val eqIds: Seq[Int] = Option(dfr.get("equality_ids")) match {
              case Some(arr: java.util.Collection[_]) =>
                arr.asScala.toSeq.map(_.asInstanceOf[Number].intValue)
              case _ => Seq.empty
            }
            require(eqIds.nonEmpty,
              s"equality delete file ${str(dfr, "file_path")} " +
                "carries no equality_ids")
            deletes += IceDelete(str(dfr, "file_path"),
              lng(dfr, "file_size_in_bytes", -1L), 2L, entrySeq, eqIds)
          case other => throw new IllegalArgumentException(
            s"unknown data_file content=$other in $mp")
        }
      }
    }
    (files.toSeq, deletes.toSeq)
  }

  /** Parse `refs` IN PARALLEL on a bounded pool (r12 verdict item 5:
    * the serialized per-manifest driver loop was the declared 100×
    * soft spot — manifests are independent metadata, and Iceberg's
    * own client reads them on a worker pool). Merge order follows
    * `refs`, so results are deterministic. */
  private def parseManifestsParallel(spark: SparkSession,
      refs: Seq[(IceManifestRef, Long)], schema: StructType,
      partPairs: Seq[(String, String)])
      : (Seq[IceFile], Seq[IceDelete]) = {
    if (refs.isEmpty) return (Seq.empty, Seq.empty)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, math.max(1, Runtime.getRuntime.availableProcessors)))
    try {
      val futures = refs.map { case (ref, content) =>
        pool.submit(new java.util.concurrent.Callable[
            (Seq[IceFile], Seq[IceDelete])] {
          def call(): (Seq[IceFile], Seq[IceDelete]) =
            parseManifest(spark, ref.path, content, ref.seq, schema,
              partPairs)
        })
      }
      // in refs order; re-throw the ORIGINAL loud error, not the
      // pool's ExecutionException wrapper
      val parts = futures.map { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      }
      (parts.flatMap(_._1), parts.flatMap(_._2))
    } finally pool.shutdown()
  }

  /** Reconstruct the requested snapshot: metadata → manifest list →
    * manifests (parsed in parallel) → live (non-DELETED) data
    * files. */
  def snapshot(spark: SparkSession, tablePath: String,
      asOfSnapshotId: Option[Long] = None,
      ref: Option[String] = None): Snapshot = {
    val tm = tableMeta(spark, tablePath, asOfSnapshotId, ref)
    val refs = manifestRefs(spark, new Path(tablePath), tm.snapNode)
    val (files, deletes) = parseManifestsParallel(spark, refs,
      tm.schema, tm.partPairs)
    Snapshot(tm.wantedId, tm.schema, tm.partPairs.map(_._2),
      files.toVector, deletes.toVector)
  }

  /** The relation over a snapshot's data files, columns in declared
    * order — `_metadata` (file_path, row_index) still resolvable on
    * the result for the MoR delete join. */
  private def relationFor(spark: SparkSession, tablePath: String,
      snap: Snapshot): DataFrame = {
    // resolve parquet columns BY FIELD ID (the Iceberg spec's rule):
    // the data schema's fields carry parquet.field.id metadata, and
    // this session conf makes Spark's parquet reader honor it — a
    // renamed column's OLD files (old name, same id) read correctly.
    // Only schemas that CARRY id metadata are affected (this
    // relation's); scans of id-less schemas are untouched by the conf.
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val dataSchema = StructType(
      snap.schema.filterNot(f => snap.partitionColumns.contains(f.name)))
    val partitionSchema = StructType(
      snap.partitionColumns.map(c => snap.schema(c)))
    val root = new Path(tablePath)
    val qualified = root.getFileSystem(
      spark.sessionState.newHadoopConf()).makeQualified(root)
    val metaFiles = snap.files.map(f => MetaDataFile(
      DeltaCompat.resolvePath(qualified, f.path), f.size, 0L,
      f.partitionValues))
    val index = new MetaFileIndex(spark, root, partitionSchema, metaFiles)
    val relation = HadoopFsRelation(index, partitionSchema, dataSchema,
      None, new ParquetFileFormat(), Map.empty[String, String])(spark)
    spark.baseRelationToDataFrame(relation)
  }

  /** Iceberg v3 DELETION-VECTOR blob (the spec's "Deletion vectors"
    * layout) at `offset` in a puffin file: a 4-byte BIG-endian length
    * of (magic + vector), the 4-byte magic D1 D3 39 64, the vector in
    * the 64-bit RoaringBitmapArray portable serialization — the SAME
    * format Delta DVs ride, decoded by [[graft.util.RoaringBitmapArray]]
    * — and a 4-byte big-endian CRC-32 of (magic + vector), verified so
    * a torn vector can never read as "fewer deleted rows". Runs on
    * EXECUTORS (one task per DV). The enclosing puffin footer is NOT
    * consulted: the manifest's content_offset/content_size_in_bytes
    * address the blob directly, per the spec. */
  private[sources] def readPuffinDv(
      conf: org.apache.hadoop.conf.Configuration, file: String,
      offset: Long, length: Long): Array[Long] = {
    val p = new Path(file)
    val in = p.getFileSystem(conf).open(p)
    try {
      in.seek(offset)
      val len = in.readInt() // big-endian
      require(len.toLong == length - 8L && len >= 4,
        s"DV blob at $file@$offset declares $len magic+vector bytes; " +
          s"content_size_in_bytes $length wants ${length - 8} (>= 4)" +
          " — torn or hostile vector")
      val magic = new Array[Byte](4); in.readFully(magic)
      require(magic(0) == 0xD1.toByte && magic(1) == 0xD3.toByte &&
        magic(2) == 0x39.toByte && magic(3) == 0x64.toByte,
        s"bad DV magic at $file@$offset: ${magic.mkString(",")}")
      val vec = new Array[Byte](len - 4); in.readFully(vec)
      val crc = in.readInt()
      val c = new java.util.zip.CRC32(); c.update(magic); c.update(vec)
      require(crc == c.getValue.toInt,
        s"DV checksum mismatch at $file@$offset")
      graft.util.RoaringBitmapArray.decode(vec)
    } finally in.close()
  }

  /** (scan-form data file path, deleted position) rows for v3 DV
    * deletes: per referenced data file the HIGHEST-sequence DV wins
    * (a replacement vector carries the union, per the spec — older
    * snapshots' vectors for the same file are superseded, not
    * stacked); each surviving DV decodes as one executor task. */
  private def dvDeleteRows(spark: SparkSession, rootStr: String,
      dvDels: Seq[IceDelete]): DataFrame = {
    import spark.implicits._
    val newest = dvDels.groupBy(_.dvRef.get)
      .map { case (_, ds) => ds.maxBy(_.seq) }.toSeq
    val specs = newest.map { d =>
      (d.dvRef.get,
        DeltaCompat.resolvePath(new Path(rootStr), d.path).toString,
        d.dvOffset.get, d.dvLength.get)
    }
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    spark.createDataset(specs)
      .flatMap { case (ref, pf, off, len) =>
        val fp = org.apache.spark.paths.SparkPath.fromPath(
          DeltaCompat.resolvePath(new Path(rootStr), ref)).urlEncoded
        readPuffinDv(hconf.value, pf, off, len).map(pos => (fp, pos))
      }.toDF("_ice_del_fp", "_ice_del_pos")
  }

  /** Read the table as a DataFrame — ONE parquet relation over the
    * manifest-backed [[MetaFileIndex]], partition pruning inside the
    * single scan node (the [[DeltaCompat.read]] shape). A v2 MoR
    * snapshot's POSITIONAL deletes apply as an anti-join on Spark's
    * own `_metadata.(file_path, row_index)` scan columns — the
    * standard merge-on-read shape: the delete set is a parquet scan
    * of (file_path, pos) rows, translated from the writer's
    * manifest-path form to the scan's resolved-URI form through a
    * files-sized broadcast map (positional deletes name files
    * explicitly, so application is sequence-number-safe by
    * construction — a path can never be re-added in Iceberg). */
  def read(spark: SparkSession, tablePath: String,
      asOfSnapshotId: Option[Long] = None,
      ref: Option[String] = None): DataFrame = {
    val tm = tableMeta(spark, tablePath, asOfSnapshotId, ref)
    val root = new Path(tablePath)
    val refs = manifestRefs(spark, root, tm.snapNode)
    if (refs.isEmpty) {
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], tm.schema)
    }
    // DELETE manifests (content=1 list rows) are few and decide the
    // plan's shape — parse them eagerly, in parallel; DATA manifests
    // stay LAZY behind the IceManifestIndex unless equality deletes
    // force per-file sequence numbers
    val (_, deletes) = parseManifestsParallel(spark,
      refs.filter(_._2 == 1L), tm.schema, tm.partPairs)
    if (deletes.exists(_.content == 2L))
      return readWithDeletes(spark, tablePath,
        snapshot(spark, tablePath, asOfSnapshotId, ref))
    val partCols = tm.partPairs.map(_._2)
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val dataSchema = StructType(
      tm.schema.filterNot(f => partCols.contains(f.name)))
    val partitionSchema = StructType(partCols.map(c => tm.schema(c)))
    val qualified = root.getFileSystem(
      spark.sessionState.newHadoopConf()).makeQualified(root)
    val dataRefs = refs.filter(_._2 == 0L).map(_._1)
    val parseFn: IceManifestRef => Seq[MetaDataFile] = ref => {
      val (files, extraDels) = parseManifest(spark, ref.path, 0L,
        ref.seq, tm.schema, tm.partPairs)
      require(extraDels.isEmpty,
        s"delete files inside a DATA manifest ${ref.path} (spec violation)")
      files.map(f => MetaDataFile(
        DeltaCompat.resolvePath(qualified, f.path), f.size, 0L,
        f.partitionValues))
    }
    val index = new IceManifestIndex(spark, root, partitionSchema,
      dataRefs, parseFn, tm.totalFilesSize)
    val relation = HadoopFsRelation(index, partitionSchema, dataSchema,
      None, new ParquetFileFormat(), Map.empty[String, String])(spark)
    val base = spark.baseRelationToDataFrame(relation)
    val outCols = tm.schema.map(f => col(f.name))
    val posDels = deletes.filter(_.content == 1L)
    if (posDels.isEmpty) return base.select(outCols: _*)
    // positional deletes: translate the delete rows' manifest-form
    // file_path to the scan's _metadata form DIRECTLY (pure string/URI
    // work on executors — no need to enumerate the data files); v3
    // deletion vectors decode per-blob and union in
    import spark.implicits._
    val rootStr = qualified.toString
    val (dvDels, pqDels) = posDels.partition(_.dvRef.isDefined)
    val pqRows =
      if (pqDels.isEmpty) None
      else Some {
        val delPaths = pqDels.map(d =>
          DeltaCompat.resolvePath(qualified, d.path).toString)
        spark.read
          .schema("file_path STRING, pos BIGINT")
          .parquet(delPaths: _*)
          .as[(String, Long)]
          .map { case (fp, pos) =>
            (org.apache.spark.paths.SparkPath.fromPath(
              DeltaCompat.resolvePath(new Path(rootStr), fp)).urlEncoded,
              pos)
          }
          .toDF("_ice_del_fp", "_ice_del_pos")
      }
    val dvRows =
      if (dvDels.isEmpty) None
      else Some(dvDeleteRows(spark, rootStr, dvDels))
    val dels = (pqRows.toSeq ++ dvRows.toSeq).reduce(_ union _)
    base
      .withColumn("_ice_fp", col("_metadata.file_path"))
      .withColumn("_ice_pos", col("_metadata.row_index"))
      .join(dels, col("_ice_fp") === col("_ice_del_fp") &&
        col("_ice_pos") === col("_ice_del_pos"), "left_anti")
      .select(outCols: _*)
  }

  /** The EAGER read shape for snapshots with EQUALITY deletes: their
    * application needs every data file's sequence number, so the full
    * snapshot materializes (still a parallel manifest parse) and the
    * relation rides the eager [[MetaFileIndex]]. */
  private def readWithDeletes(spark: SparkSession, tablePath: String,
      snap: Snapshot): DataFrame = {
    if (snap.files.isEmpty) {
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], snap.schema)
    }
    val base = relationFor(spark, tablePath, snap)
    val outCols = snap.schema.map(f => col(f.name))
    if (snap.deletes.isEmpty) return base.select(outCols: _*)
    import spark.implicits._
    val root = new Path(tablePath)
    val qualified = root.getFileSystem(
      spark.sessionState.newHadoopConf()).makeQualified(root)
    // writer-form manifest path -> the exact string the scan's
    // _metadata.file_path yields (the SparkPath url form) + the data
    // file's sequence number (the equality-delete ordering key)
    val trans = snap.files.map { f =>
      val resolved = DeltaCompat.resolvePath(qualified, f.path)
      (f.path,
        org.apache.spark.paths.SparkPath.fromPath(resolved).urlEncoded,
        f.seq)
    }.toDF("file_path", "_ice_resolved", "_ice_seq")
    var cur = base
      .withColumn("_ice_fp", col("_metadata.file_path"))
      .withColumn("_ice_pos", col("_metadata.row_index"))
    val (dvDels, posDels) = snap.deletes.filter(_.content == 1L)
      .partition(_.dvRef.isDefined)
    if (posDels.nonEmpty) {
      val delPaths = posDels.map(d =>
        DeltaCompat.resolvePath(qualified, d.path).toString)
      val dels = spark.read
        .schema("file_path STRING, pos BIGINT")
        .parquet(delPaths: _*)
        .join(broadcast(trans.select("file_path", "_ice_resolved")),
          Seq("file_path"), "left")
        .select(coalesce(col("_ice_resolved"), col("file_path"))
          .as("_ice_del_fp"), col("pos").as("_ice_del_pos"))
      cur = cur.join(dels, col("_ice_fp") === col("_ice_del_fp") &&
        col("_ice_pos") === col("_ice_del_pos"), "left_anti")
    }
    if (dvDels.nonEmpty) {
      val dels = dvDeleteRows(spark, qualified.toString, dvDels)
      cur = cur.join(dels, col("_ice_fp") === col("_ice_del_fp") &&
        col("_ice_pos") === col("_ice_del_pos"), "left_anti")
    }
    val eqDels = snap.deletes.filter(_.content == 2L)
    if (eqDels.nonEmpty) {
      // a row is deleted by an equality delete with a STRICTLY HIGHER
      // sequence number than its data file's — attach the per-file
      // seq (a files-sized broadcast), then one null-safe anti-join
      // per (seq, equality_ids) delete group. The delete parquet is
      // read under the id-carrying schema, so deletes written before
      // a rename still resolve.
      cur = cur.join(
        broadcast(trans.select(col("_ice_resolved").as("_ice_fp"),
          col("_ice_seq"))), Seq("_ice_fp"), "left")
      val names = idToName(snap.schema)
      eqDels.groupBy(d => (d.seq, d.equalityIds)).foreach {
        case ((dseq, ids), group) =>
          val cols = ids.map { id =>
            names.getOrElse(id.toLong, throw new IllegalArgumentException(
              s"equality_ids field $id not in the current schema " +
                s"(have ids ${names.keys.toSeq.sorted.mkString(",")})"))
          }
          val delSchema = StructType(cols.map(c => snap.schema(c)))
          val paths = group.map(d =>
            DeltaCompat.resolvePath(qualified, d.path).toString)
          val delRows = spark.read.schema(delSchema).parquet(paths: _*)
            .select(cols.map(c => col(c).as(s"_ice_eq_$c")): _*)
            .distinct()
          val cond = cols.map(c => col(c) <=> col(s"_ice_eq_$c"))
            .reduce(_ && _) && lit(dseq) > col("_ice_seq")
          cur = cur.join(delRows, cond, "left_anti")
      }
    }
    cur.select(outCols: _*)
  }

  // ---- fixture/export writer ----

  private def icebergTypeOf(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "string"
    case DateType => "date"
    case TimestampNTZType => "timestamp"
    case TimestampType => "timestamptz"
    case BinaryType => "binary"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other => throw new IllegalArgumentException(
      s"cannot export Spark type $other as an Iceberg primitive")
  }

  /** DFS field-id assignment over a Spark schema (round 13 — NESTED
    * export): returns (the schema with `parquet.field.id` stamped on
    * every struct field at every depth — Spark's parquet writer
    * persists those ids, so nested renames resolve by id on read —
    * the Iceberg schema-JSON `fields` array body with
    * element-id/key-id/value-id allocated per the spec, and the last
    * id used for `last-column-id`). A field's id precedes its
    * children's, so FLAT schemas keep the historical 1..N ids.
    * Parquet has no metadata slot for list-element / map-key/value
    * ids — those levels resolve structurally on read, which matches
    * parquet's physical list/map layout exactly. */
  private def annotateIds(schema: StructType): (StructType, String, Int) = {
    var next = 0
    def alloc(): Int = { next += 1; next }
    def walkType(dt: DataType): (DataType, String) = dt match {
      case st: StructType =>
        val (fs, js) = st.fields.map(walkField).unzip
        (StructType(fs.toSeq),
          s"""{"type":"struct","fields":[${js.mkString(",")}]}""")
      case at: ArrayType =>
        val eid = alloc()
        val (et, ej) = walkType(at.elementType)
        (ArrayType(et, at.containsNull),
          s"""{"type":"list","element-id":$eid,""" +
            s""""element-required":${!at.containsNull},"element":$ej}""")
      case mt: MapType =>
        val kid = alloc()
        val (kt, kj) = walkType(mt.keyType)
        val vid = alloc()
        val (vt, vj) = walkType(mt.valueType)
        (MapType(kt, vt, mt.valueContainsNull),
          s"""{"type":"map","key-id":$kid,"key":$kj,""" +
            s""""value-id":$vid,""" +
            s""""value-required":${!mt.valueContainsNull},"value":$vj}""")
      case p => (p, "\"" + icebergTypeOf(p) + "\"")
    }
    def walkField(f: StructField): (StructField, String) = {
      val id = alloc()
      val (t, tj) = walkType(f.dataType)
      (f.copy(dataType = t,
        metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata).putLong(FieldIdKey, id.toLong).build()),
        s"""{"id":$id,"name":"${f.name}","required":${!f.nullable},""" +
          s""""type":$tj}""")
    }
    val (fs, js) = schema.fields.map(walkField).unzip
    (StructType(fs.toSeq), js.mkString(","), next)
  }

  private def avroTypeOf(dt: DataType): String = dt match {
    case IntegerType => "int"
    case DateType => "int" // days since epoch, per the Iceberg spec
    case LongType => "long"
    case DoubleType => "double"
    case StringType => "string"
    case BooleanType => "boolean"
    case other => throw new IllegalArgumentException(
      s"unsupported partition column type for the fixture writer: $other")
  }

  private[graft] val manifestListSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"content","type":"int","default":0},
      |{"name":"sequence_number","type":"long","default":0},
      |{"name":"added_snapshot_id","type":"long"},
      |{"name":"partitions","type":["null",{"type":"array","items":
      |{"type":"record","name":"field_summary","fields":[
      |{"name":"contains_null","type":"boolean"},
      |{"name":"lower_bound","type":["null","bytes"],"default":null},
      |{"name":"upper_bound","type":["null","bytes"],"default":null}]}}],
      |"default":null}]}""".stripMargin)

  private[graft] def manifestEntrySchema(
      partFields: Seq[(String, DataType)]): Schema = {
    val pf = partFields.map { case (n, dt) =>
      s"""{"name":"$n","type":["null","${avroTypeOf(dt)}"],"default":null}"""
    }.mkString(",")
    new Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"snapshot_id","type":["null","long"],"default":null},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |{"name":"content","type":"int","default":0},
        |{"name":"file_path","type":"string"},
        |{"name":"file_format","type":"string"},
        |{"name":"partition","type":{"type":"record","name":"r102","fields":[$pf]}},
        |{"name":"record_count","type":"long"},
        |{"name":"file_size_in_bytes","type":"long"},
        |{"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null},
        |{"name":"referenced_data_file","type":["null","string"],"default":null},
        |{"name":"content_offset","type":["null","long"],"default":null},
        |{"name":"content_size_in_bytes","type":["null","long"],"default":null}]}}]}""".stripMargin)
  }

  /** The spec's single-value binary serialization of a partition
    * bound (int/date 4B LE, long 8B LE, double 8B LE, boolean 1B,
    * string UTF-8) — what field summaries carry. */
  private def boundBytes(v: AnyRef): Array[Byte] = v match {
    case i: Integer => java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(i).array()
    case l: java.lang.Long => java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(l).array()
    case d: java.lang.Double => java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(d).array()
    case b: java.lang.Boolean => Array[Byte](if (b) 1 else 0)
    case s => s.toString.getBytes("UTF-8")
  }

  private val fieldSummarySchema: Schema = {
    val union = manifestListSchema.getField("partitions").schema()
    union.getTypes.get(1).getElementType
  }

  /** Per-partition-field value summaries over a manifest's entries —
    * the manifest-list metadata [[IceManifestIndex]] prunes with. */
  private def fieldSummaries(entries: Seq[GenericRecord],
      partTypes: Seq[(String, DataType)])
      : Option[java.util.List[GenericRecord]] = {
    if (partTypes.isEmpty) return None
    val arr = new java.util.ArrayList[GenericRecord](partTypes.size)
    partTypes.foreach { case (name, _) =>
      val vals = entries.map { e =>
        e.get("data_file").asInstanceOf[GenericRecord]
          .get("partition").asInstanceOf[GenericRecord].get(name)
      }
      val nonNull = vals.filter(_ != null)
      val rec = new GenericData.Record(fieldSummarySchema)
      rec.put("contains_null",
        java.lang.Boolean.valueOf(vals.exists(_ == null)))
      if (nonNull.nonEmpty) {
        implicit val ord: Ordering[AnyRef] = new Ordering[AnyRef] {
          def compare(a: AnyRef, b: AnyRef): Int = (a, b) match {
            case (x: Integer, y: Integer) => x.compareTo(y)
            case (x: java.lang.Long, y: java.lang.Long) => x.compareTo(y)
            case (x: java.lang.Double, y: java.lang.Double) => x.compareTo(y)
            case (x: java.lang.Boolean, y: java.lang.Boolean) => x.compareTo(y)
            case (x, y) =>
              // strings order as UNSIGNED UTF-8 bytes — the same
              // ordering the read-side range check uses (Java String
              // order diverges for non-BMP chars)
              val (a, b) = (boundBytes(x), boundBytes(y))
              val n = math.min(a.length, b.length)
              var i = 0; var c = 0
              while (i < n && c == 0) {
                c = Integer.compare(a(i) & 0xff, b(i) & 0xff); i += 1
              }
              if (c != 0) c else Integer.compare(a.length, b.length)
          }
        }
        rec.put("lower_bound",
          java.nio.ByteBuffer.wrap(boundBytes(nonNull.min)))
        rec.put("upper_bound",
          java.nio.ByteBuffer.wrap(boundBytes(nonNull.max)))
      }
      arr.add(rec)
    }
    Some(arr)
  }

  private[graft] def writeAvro(spark: SparkSession, p: Path, schema: Schema,
      records: Seq[GenericRecord]): Long = {
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    try {
      w.create(schema, out)
      records.foreach(w.append)
    } finally w.close()
    fs.getFileStatus(p).getLen
  }

  /** MINIMAL merge-on-read DELETE: mark every current row matching
    * `predicate` as deleted via a POSITIONAL delete file — the v2 MoR
    * write path (no data file is rewritten). Positions come from the
    * same `_metadata.(file_path, row_index)` scan columns the read
    * side joins on; the delete parquet is the spec's (file_path, pos)
    * layout with file_path BYTE-IDENTICAL to the referenced
    * data_file.file_path (translated from the scan's resolved URI
    * form, as the spec requires), a new delete
    * manifest (content=1) joins the existing manifests in a new
    * manifest list, and a new metadata version + snapshot + hint
    * publish it. Returns the new snapshot id (rows may match zero
    * files; the snapshot still advances, like a real engine's
    * no-op-guarded DELETE). Fixture/export grade, like
    * [[writeTable]]: single-writer, no concurrent-commit arbitration. */
  def deletePositional(spark: SparkSession, tablePath: String,
      predicate: org.apache.spark.sql.Column): Long = {
    val metaPath = currentMetadataPath(spark, tablePath)
    val meta = readJson(spark, metaPath)
    val snap = snapshot(spark, tablePath)
    val newSnapId = snap.snapshotId + 1
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // positions of the matching rows, from the scan's own metadata —
    // TRANSLATED back to the manifests' data_file.file_path form
    // before writing (r12 ADVICE medium: the spec requires the delete
    // parquet's file_path to be byte-identical to the referenced
    // data_file.file_path; the scan's _metadata URI form cannot match
    // for real Iceberg readers). The map is files-sized metadata.
    import spark.implicits._
    val qualifiedRoot = fs.makeQualified(root)
    val scanToManifest = snap.files.map { f =>
      (org.apache.spark.paths.SparkPath.fromPath(
        DeltaCompat.resolvePath(qualifiedRoot, f.path)).urlEncoded,
        f.path)
    }.toDF("_scan_fp", "file_path")
    val delRows = relationFor(spark, tablePath, snap)
      .filter(predicate)
      .select(col("_metadata.file_path").as("_scan_fp"),
        col("_metadata.row_index").as("pos"))
      .join(broadcast(scanToManifest), Seq("_scan_fp"))
      .select("file_path", "pos")
    val delDir = new Path(root, s"delete-$newSnapId.parquet")
    delRows.coalesce(1).write.mode("overwrite").parquet(delDir.toString)
    val delFile = fs.listStatus(delDir).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no delete parquet under $delDir"))
    publishDeleteSnapshot(spark, tablePath, metaPath, meta,
      snap.snapshotId, newSnapId, delFile, eqIds = Seq.empty)
  }

  /** MINIMAL merge-on-read EQUALITY DELETE (content=2): write the
    * distinct values of `eqCols` from `rows` as an equality-delete
    * parquet (columns carry their field ids, so the delete still
    * resolves after a later rename), publish it in a content=1 delete
    * manifest whose data_file names the matching `equality_ids`, and
    * advance the snapshot/sequence number. Per the spec the delete
    * applies only to data files with a STRICTLY LOWER sequence number
    * — rows (re-)written AFTER this commit survive it, which is the
    * Flink/CDC upsert pattern this exists for. Fixture/export grade,
    * like [[deletePositional]]. Returns the new snapshot id. */
  def deleteEquality(spark: SparkSession, tablePath: String,
      eqCols: Seq[String], rows: DataFrame): Long = {
    require(eqCols.nonEmpty, "eqCols must be non-empty")
    val metaPath = currentMetadataPath(spark, tablePath)
    val meta = readJson(spark, metaPath)
    val snap = snapshot(spark, tablePath)
    val newSnapId = snap.snapshotId + 1
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val names = idToName(snap.schema)
    val eqIds = eqCols.map { c =>
      val f = snap.schema(c)
      require(f.metadata.contains(FieldIdKey),
        s"column '$c' carries no field id in the table schema")
      f.metadata.getLong(FieldIdKey).toInt
    }
    require(eqIds.forall(id => names.contains(id.toLong)),
      s"equality ids $eqIds not all resolvable")
    // the delete rows, under the current names WITH their field ids
    val delDf = rows.select(eqCols.map { c =>
      val f = snap.schema(c)
      rows(c).cast(f.dataType).as(c, f.metadata)
    }: _*).distinct()
    val delDir = new Path(root, s"eqdelete-$newSnapId.parquet")
    delDf.coalesce(1).write.mode("overwrite").parquet(delDir.toString)
    val delFile = fs.listStatus(delDir).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no delete parquet under $delDir"))
    publishDeleteSnapshot(spark, tablePath, metaPath, meta,
      snap.snapshotId, newSnapId, delFile, eqIds)
  }

  /** MERGE-ON-READ DELETE via format-version 3 DELETION VECTORS
    * (round 13): every current row matching `predicate` folds into a
    * per-data-file position bitmap; each affected file's vector is
    * the UNION of its existing vector (superseded by sequence, never
    * stacked) and the new positions; all vectors pack into ONE puffin
    * file (spec layout: "PFA1" magic, blobs back-to-back, footer with
    * JSON blob metadata + payload size + flags + trailing magic) and
    * publish through a content=1 delete manifest whose entries carry
    * `file_format=PUFFIN` + `referenced_data_file` +
    * `content_offset`/`content_size_in_bytes`, upgrading the table's
    * declared format-version to 3. Fixture/export grade like the
    * other writers: single-writer, driver memory O(matched rows).
    * Returns the new snapshot id. */
  def deleteVectors(spark: SparkSession, tablePath: String,
      predicate: org.apache.spark.sql.Column): Long = {
    val metaPath = currentMetadataPath(spark, tablePath)
    val meta = readJson(spark, metaPath)
    val snap = snapshot(spark, tablePath)
    val newSnapId = snap.snapshotId + 1
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val qualified = fs.makeQualified(root)
    import spark.implicits._
    val scanToManifest = snap.files.map { f =>
      (org.apache.spark.paths.SparkPath.fromPath(
        DeltaCompat.resolvePath(qualified, f.path)).urlEncoded,
        f.path)
    }.toMap
    val matched: Map[String, Array[Long]] =
      relationFor(spark, tablePath, snap)
        .filter(predicate)
        .select(col("_metadata.file_path").as("_scan_fp"),
          col("_metadata.row_index").as("pos"))
        .as[(String, Long)].collect() // fixture-grade, O(matched rows)
        .groupBy(r => scanToManifest(r._1))
        .view.mapValues(_.map(_._2)).toMap
    require(matched.nonEmpty,
      s"predicate matched no live rows of $tablePath — nothing to delete")
    // existing newest DV per referenced file (the vector to union)
    val hconf = spark.sessionState.newHadoopConf()
    val priorDv: Map[String, IceDelete] = snap.deletes
      .filter(d => d.content == 1L && d.dvRef.isDefined)
      .groupBy(_.dvRef.get).view.mapValues(_.maxBy(_.seq)).toMap
    val vectors: Seq[(String, Array[Byte])] = matched.toSeq.sortBy(_._1)
      .map { case (rawPath, positions) =>
        val old: Array[Long] = priorDv.get(rawPath).fold(Array.empty[Long]) {
          d => readPuffinDv(hconf,
            DeltaCompat.resolvePath(qualified, d.path).toString,
            d.dvOffset.get, d.dvLength.get)
        }
        rawPath -> graft.util.RoaringBitmapArray.encode(
          (old ++ positions).distinct.sorted)
      }
    // ---- one puffin file: magic, blobs, footer ----
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.write("PFA1".getBytes("UTF-8"))
    val placed: Seq[(String, Long, Long)] = vectors.map { case (raw, vec) =>
      val off = bos.size().toLong
      dos.writeInt(vec.length + 4) // BE length of magic+vector
      dos.write(Array[Byte](0xD1.toByte, 0xD3.toByte, 0x39, 0x64))
      dos.write(vec)
      val c = new java.util.zip.CRC32()
      c.update(Array[Byte](0xD1.toByte, 0xD3.toByte, 0x39, 0x64))
      c.update(vec)
      dos.writeInt(c.getValue.toInt) // BE CRC of magic+vector
      (raw, off, bos.size().toLong - off)
    }
    val blobsJson = placed.map { case (_, off, len) =>
      s"""{"type":"deletion-vector-v1","fields":[],""" +
        s""""snapshot-id":$newSnapId,"sequence-number":$newSnapId,""" +
        s""""offset":$off,"length":$len}"""
    }.mkString(",")
    val payload =
      s"""{"blobs":[$blobsJson],"properties":{}}""".getBytes("UTF-8")
    dos.write("PFA1".getBytes("UTF-8"))
    dos.write(payload)
    // footer payload size: 4 bytes LITTLE-endian, then 4 flag bytes
    // (all zero: uncompressed payload), then the trailing magic
    dos.write(java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(payload.length)
      .array())
    dos.write(Array[Byte](0, 0, 0, 0))
    dos.write("PFA1".getBytes("UTF-8"))
    dos.flush()
    val puffinPath = new Path(qualified, s"dv-$newSnapId.puffin")
    val out = fs.create(puffinPath, true)
    try out.write(bos.toByteArray) finally out.close()
    // ---- delete manifest: one puffin entry per referenced file ----
    val entrySchema = manifestEntrySchema(Seq.empty)
    val dfSchema = entrySchema.getField("data_file").schema()
    val partSchema = dfSchema.getField("partition").schema()
    val entries = placed.map { case (raw, off, len) =>
      val dfr = new GenericData.Record(dfSchema)
      dfr.put("content", Integer.valueOf(1))
      dfr.put("file_path", puffinPath.toString)
      dfr.put("file_format", "PUFFIN")
      dfr.put("partition", new GenericData.Record(partSchema))
      dfr.put("record_count", java.lang.Long.valueOf(-1L))
      dfr.put("file_size_in_bytes",
        java.lang.Long.valueOf(fs.getFileStatus(puffinPath).getLen))
      dfr.put("referenced_data_file", raw)
      dfr.put("content_offset", java.lang.Long.valueOf(off))
      dfr.put("content_size_in_bytes", java.lang.Long.valueOf(len))
      val e = new GenericData.Record(entrySchema)
      e.put("status", Integer.valueOf(1))
      e.put("snapshot_id", java.lang.Long.valueOf(newSnapId))
      e.put("data_file", dfr)
      e
    }
    val metaDir = new Path(root, "metadata")
    val delManifest = new Path(metaDir, s"manifest-dv-$newSnapId.avro")
    val dmLen = writeAvro(spark, delManifest, entrySchema, entries)
    publishSnapshot(spark, tablePath, metaPath, meta, snap.snapshotId,
      newSnapId, delManifest, dmLen, manifestContent = 1,
      operation = "delete", formatVersion = Some(3))
  }

  /** Shared publish step of the two MoR delete writers: a delete
    * manifest (content 1 or 2 at the data_file level per `eqIds`),
    * then [[publishSnapshot]]. */
  private def publishDeleteSnapshot(spark: SparkSession, tablePath: String,
      metaPath: Path, meta: JsonNode, curSnapId: Long, newSnapId: Long,
      delFile: Path, eqIds: Seq[Int]): Long = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val entrySchema = manifestEntrySchema(Seq.empty)
    val dfSchema = entrySchema.getField("data_file").schema()
    val partSchema = dfSchema.getField("partition").schema()
    val dfr = new GenericData.Record(dfSchema)
    dfr.put("content", Integer.valueOf(if (eqIds.isEmpty) 1 else 2))
    dfr.put("file_path", delFile.toString)
    dfr.put("file_format", "PARQUET")
    dfr.put("partition", new GenericData.Record(partSchema))
    dfr.put("record_count", java.lang.Long.valueOf(-1L))
    dfr.put("file_size_in_bytes",
      java.lang.Long.valueOf(fs.getFileStatus(delFile).getLen))
    if (eqIds.nonEmpty) {
      val arr = new java.util.ArrayList[Integer](eqIds.size)
      eqIds.foreach(id => arr.add(Integer.valueOf(id)))
      dfr.put("equality_ids", arr)
    }
    val e = new GenericData.Record(entrySchema)
    e.put("status", Integer.valueOf(1))
    e.put("snapshot_id", java.lang.Long.valueOf(newSnapId))
    e.put("data_file", dfr)
    val metaDir = new Path(root, "metadata")
    val delManifest = new Path(metaDir, s"manifest-del-$newSnapId.avro")
    val dmLen = writeAvro(spark, delManifest, entrySchema, Seq(e))
    publishSnapshot(spark, tablePath, metaPath, meta, curSnapId,
      newSnapId, delManifest, dmLen, manifestContent = 1,
      operation = "delete")
  }

  /** The snapshot-COMMIT step shared by every incremental writer
    * ([[deletePositional]], [[deleteEquality]], [[appendTable]]): a
    * new manifest list carrying every prior manifest (sequence
    * numbers PRESERVED — they are the equality-delete ordering key)
    * plus the new manifest at the new sequence number, then a new
    * metadata version + snapshot + hint swap. */
  private def publishSnapshot(spark: SparkSession, tablePath: String,
      metaPath: Path, meta: JsonNode, curSnapId: Long, newSnapId: Long,
      newManifest: Path, manifestLen: Long, manifestContent: Int,
      operation: String,
      partitions: Option[java.util.List[GenericRecord]] = None,
      addedDataSize: Long = 0L,
      formatVersion: Option[Int] = None): Long = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val metaDir = new Path(root, "metadata")
    // new manifest list = the current snapshot's manifests + the new one
    val curSnaps = meta.get("snapshots")
    val curSnap = (0 until curSnaps.size).map(curSnaps.get)
      .find(_.get("snapshot-id").asLong == curSnapId)
      .getOrElse(throw new IllegalArgumentException(
        s"current snapshot $curSnapId missing from metadata"))
    val prior: Seq[GenericRecord] =
      if (curSnap.has("manifest-list"))
        avroRecords(spark, DeltaCompat.resolvePath(root,
          curSnap.get("manifest-list").asText))
      else Seq.empty
    val mlRecs = prior.map { r =>
      // re-project into OUR list schema (a prior list may carry more
      // optional fields than the fixture schema declares); sequence
      // numbers PRESERVED — they are the equality-delete ordering key
      val ml = new GenericData.Record(manifestListSchema)
      ml.put("manifest_path", str(r, "manifest_path"))
      ml.put("manifest_length",
        java.lang.Long.valueOf(lng(r, "manifest_length", -1L)))
      ml.put("partition_spec_id",
        Integer.valueOf(lng(r, "partition_spec_id", 0L).toInt))
      ml.put("content", Integer.valueOf(lng(r, "content", 0L).toInt))
      ml.put("sequence_number",
        java.lang.Long.valueOf(lng(r, "sequence_number", 0L)))
      ml.put("added_snapshot_id",
        java.lang.Long.valueOf(lng(r, "added_snapshot_id", 0L)))
      // carry the pruning summaries through commits (defensively
      // re-projected; dropping them is correctness-neutral)
      if (r.getSchema.getField("partitions") != null)
        try Option(r.get("partitions")).foreach {
          case arr: java.util.Collection[_] =>
            val out = new java.util.ArrayList[GenericRecord](arr.size)
            arr.asScala.foreach { s0 =>
              val s = s0.asInstanceOf[GenericRecord]
              val rec = new GenericData.Record(fieldSummarySchema)
              rec.put("contains_null", java.lang.Boolean.valueOf(
                Option(s.get("contains_null"))
                  .exists(_.asInstanceOf[Boolean])))
              Seq("lower_bound", "upper_bound").foreach { f =>
                if (s.getSchema.getField(f) != null)
                  rec.put(f, s.get(f))
              }
              out.add(rec)
            }
            ml.put("partitions", out)
          case _ => ()
        } catch { case scala.util.control.NonFatal(_) => () }
      ml
    } :+ {
      val ml = new GenericData.Record(manifestListSchema)
      ml.put("manifest_path", newManifest.toString)
      ml.put("manifest_length", java.lang.Long.valueOf(manifestLen))
      ml.put("partition_spec_id", Integer.valueOf(0))
      ml.put("content", Integer.valueOf(manifestContent))
      ml.put("sequence_number", java.lang.Long.valueOf(newSnapId))
      ml.put("added_snapshot_id", java.lang.Long.valueOf(newSnapId))
      partitions.foreach(p => ml.put("partitions", p))
      ml
    }
    val mlPath = new Path(metaDir, s"snap-$newSnapId.avro")
    writeAvro(spark, mlPath, manifestListSchema, mlRecs)
    // new metadata version: same everything, one more snapshot
    val metaTxt = {
      val in = fs.open(metaPath)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val node = mapper.readTree(metaTxt)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.put("current-snapshot-id", newSnapId)
    node.put("last-sequence-number", newSnapId)
    // a v3 feature writer (deletion vectors) upgrades the table's
    // declared format version; downgrades are never emitted
    formatVersion.foreach { v =>
      val cur = Option(node.get("format-version")).map(_.asInt).getOrElse(1)
      if (v > cur) node.put("format-version", v)
    }
    val snapNode = node.withArray("snapshots").addObject()
    snapNode.put("snapshot-id", newSnapId)
    snapNode.put("timestamp-ms", 0L)
    snapNode.put("sequence-number", newSnapId)
    val sumNode = snapNode.putObject("summary")
    sumNode.put("operation", operation)
    // maintain total-files-size (what sizeInBytes answers from
    // without parsing any manifest): prior snapshot's value + what
    // this commit added; deletes are MoR, data bytes unchanged
    Option(curSnap.get("summary")).flatMap(s =>
      Option(s.get("total-files-size"))).filterNot(_.isNull)
      .flatMap(n => scala.util.Try(n.asText.toLong).toOption)
      .foreach(prior =>
        sumNode.put("total-files-size", (prior + addedDataSize).toString))
    snapNode.put("manifest-list", mlPath.toString)
    snapNode.put("schema-id", 0)
    val versionRe = """v(\d+)\.metadata\.json""".r
    val curV = metaPath.getName match { case versionRe(v) => v.toLong }
    val out = fs.create(
      new Path(metaDir, s"v${curV + 1}.metadata.json"), true)
    try out.write(mapper.writeValueAsString(node).getBytes("UTF-8"))
    finally out.close()
    val hint = fs.create(new Path(metaDir, "version-hint.text"), true)
    try hint.write(s"${curV + 1}".getBytes("UTF-8")) finally hint.close()
    newSnapId
  }

  /** Metadata-only column RENAME: append a new schema (same field
    * ids, one name changed) to the `schemas` list, point
    * `current-schema-id` at it, and publish a new metadata version +
    * hint. No data file changes — old files keep the old parquet
    * column name and resolve BY FIELD ID, which is exactly what the
    * reader's id-based column resolution exists for. */
  def renameColumn(spark: SparkSession, tablePath: String,
      from: String, to: String): Unit = {
    val metaPath = currentMetadataPath(spark, tablePath)
    val meta = readJson(spark, metaPath)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    require(meta.has("schemas"),
      "renameColumn needs the modern 'schemas' metadata form")
    val curId = meta.get("current-schema-id").asInt
    val arr = meta.withArray("schemas")
    val cur = (0 until arr.size).map(arr.get)
      .find(_.get("schema-id").asInt == curId)
      .getOrElse(throw new IllegalArgumentException(
        s"current-schema-id $curId not in schemas"))
    val maxId = (0 until arr.size).map(arr.get(_).get("schema-id").asInt).max
    val next = cur.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    next.put("schema-id", maxId + 1)
    val fields = next.withArray("fields")
    var hit = false
    (0 until fields.size).map(fields.get).foreach { f =>
      if (f.get("name").asText == from) {
        f.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          .put("name", to)
        hit = true
      }
    }
    require(hit, s"no column '$from' in the current schema")
    arr.add(next)
    meta.put("current-schema-id", maxId + 1)
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val metaDir = new Path(root, "metadata")
    val versionRe = """v(\d+)\.metadata\.json""".r
    val curV = metaPath.getName match { case versionRe(v) => v.toLong }
    val out = fs.create(
      new Path(metaDir, s"v${curV + 1}.metadata.json"), true)
    try out.write(mapper.writeValueAsString(meta).getBytes("UTF-8"))
    finally out.close()
    val hint = fs.create(new Path(metaDir, "version-hint.text"), true)
    try hint.write(s"${curV + 1}".getBytes("UTF-8")) finally hint.close()
  }

  /** Set (or retarget) a NAMED REF — the spec's `refs` map: a `tag`
    * pins a snapshot forever, a `branch` is a movable head. Publishes
    * a new metadata version + hint; the ref is readable via
    * `read(..., ref = Some(name))`. Fixture/export grade like the
    * other writers. */
  def setRef(spark: SparkSession, tablePath: String, name: String,
      snapshotId: Long, refType: String = "tag"): Unit = {
    require(refType == "tag" || refType == "branch",
      s"refType must be tag or branch, got $refType")
    val metaPath = currentMetadataPath(spark, tablePath)
    val meta = readJson(spark, metaPath)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val snaps = Option(meta.get("snapshots")).map(arr =>
      (0 until arr.size).map(arr.get(_).get("snapshot-id").asLong))
      .getOrElse(Seq.empty)
    require(snaps.contains(snapshotId),
      s"snapshot $snapshotId not in $tablePath (have " +
        snaps.mkString("[", ",", "]") + ")")
    val refs =
      if (meta.has("refs") && !meta.get("refs").isNull)
        meta.get("refs")
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      else meta.putObject("refs")
    val r = refs.putObject(name)
    r.put("snapshot-id", snapshotId)
    r.put("type", refType)
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val metaDir = new Path(root, "metadata")
    val versionRe = """v(\d+)\.metadata\.json""".r
    val curV = metaPath.getName match { case versionRe(v) => v.toLong }
    val out = fs.create(
      new Path(metaDir, s"v${curV + 1}.metadata.json"), true)
    try out.write(mapper.writeValueAsString(meta).getBytes("UTF-8"))
    finally out.close()
    val hint = fs.create(new Path(metaDir, "version-hint.text"), true)
    try hint.write(s"${curV + 1}".getBytes("UTF-8")) finally hint.close()
  }

  /** Materialize a DataFrame as a MINIMAL spec-valid Iceberg table
    * (format-version 2, one snapshot): Spark writes the parquet data
    * files (Hive layout when `partitionBy` is set; the reader takes
    * partition values from the manifest, so the stripped columns are
    * re-attached exactly), then one manifest + manifest list +
    * `v1.metadata.json` + `version-hint.text` describe them. A
    * fixture/export writer, not a transactional one — same contract
    * as [[DeltaCompat.writeTable]]. */
  /** Enumerate the parquet data files under `scanRoot` (skipping
    * `metadata/` and `_`-prefixed names) into ADDED manifest entries:
    * full-URI file paths, partition values parsed from the Hive
    * `k=v/` dirs into the spec's typed manifest encodings. */
  private def dataManifestEntries(spark: SparkSession, scanRoot: Path,
      partTypes: Seq[(String, DataType)], entrySchema: Schema,
      snapshotId: Long): Seq[GenericRecord] = {
    val fs = scanRoot.getFileSystem(spark.sessionState.newHadoopConf())
    val dfSchema = entrySchema.getField("data_file").schema()
    val partSchema = dfSchema.getField("partition").schema()
    val it = fs.listFiles(scanRoot, true)
    val entries = mutable.ArrayBuffer[GenericRecord]()
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (name.endsWith(".parquet") && !name.startsWith("_") &&
          !st.getPath.toString.contains("/metadata/")) {
        val rel = st.getPath.toString
          .stripPrefix(fs.makeQualified(scanRoot).toString).stripPrefix("/")
        val pvals: Map[String, String] = rel.split('/').dropRight(1)
          .collect {
            case seg if seg.contains('=') =>
              val Array(k, v) = seg.split("=", 2)
              k -> ExternalCatalogUtils.unescapePathName(v)
          }.toMap
        val partRec = new GenericData.Record(partSchema)
        partTypes.foreach { case (c, dt) =>
          val raw = pvals.get(c).filterNot(
            _ == ExternalCatalogUtils.DEFAULT_PARTITION_NAME).orNull
          val typed: AnyRef =
            if (raw == null) null
            else dt match {
              case IntegerType => Integer.valueOf(raw.toInt)
              case LongType => java.lang.Long.valueOf(raw.toLong)
              case DoubleType => java.lang.Double.valueOf(raw.toDouble)
              case BooleanType => java.lang.Boolean.valueOf(raw.toBoolean)
              // date partition dirs are ISO local dates; the manifest
              // stores int days-since-epoch per the spec
              case DateType => Integer.valueOf(
                java.time.LocalDate.parse(raw).toEpochDay.toInt)
              case _ => raw
            }
          partRec.put(c, typed)
        }
        val dfr = new GenericData.Record(dfSchema)
        dfr.put("content", Integer.valueOf(0))
        // the Iceberg spec requires data_file.file_path to be a FULL
        // URI (r12 ADVICE medium: a root-relative path breaks real
        // Iceberg readers); the reader's resolvePath handles both
        dfr.put("file_path", st.getPath.toString)
        dfr.put("file_format", "PARQUET")
        dfr.put("partition", partRec)
        dfr.put("record_count", java.lang.Long.valueOf(-1L))
        dfr.put("file_size_in_bytes", java.lang.Long.valueOf(st.getLen))
        val e = new GenericData.Record(entrySchema)
        e.put("status", Integer.valueOf(1)) // ADDED
        e.put("snapshot_id", java.lang.Long.valueOf(snapshotId))
        e.put("data_file", dfr)
        entries += e
      }
    }
    entries.toSeq
  }

  /** APPEND a new data snapshot to an existing table — the
    * snapshot-commit write path (r12 verdict stretch item 8): the new
    * rows land as parquet under a fresh `data-<snapshot>` subdir
    * (Hive layout when `partitionBy` is set), one new data manifest
    * describes them, and [[publishSnapshot]] commits manifest list +
    * metadata + hint. Columns are written with the TABLE's field ids
    * (resolved by name against the current schema), and the new files
    * carry the new SEQUENCE NUMBER — so rows re-inserted after an
    * equality delete survive it, per the spec. Returns the new
    * snapshot id. Fixture/export grade: single-writer, no
    * concurrent-commit arbitration. */
  def appendTable(df: DataFrame, tablePath: String,
      partitionBy: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    val metaPath = currentMetadataPath(spark, tablePath)
    val meta = readJson(spark, metaPath)
    val snap = snapshot(spark, tablePath)
    val newSnapId = snap.snapshotId + 1
    val root = new Path(tablePath)
    val withIds = df.select(df.columns.toSeq.map { c =>
      val f = snap.schema(c) // loud if the column is not in the schema
      df(c).cast(f.dataType).as(c, f.metadata)
    }: _*)
    val dataDir = new Path(root, s"data-$newSnapId")
    val w = withIds.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(dataDir.toString)
    val partTypes = partitionBy.map(c => c -> snap.schema(c).dataType)
    val entrySchema = manifestEntrySchema(partTypes)
    val entries = dataManifestEntries(spark, dataDir, partTypes,
      entrySchema, newSnapId)
    require(entries.nonEmpty, s"no data files written under $dataDir")
    val metaDir = new Path(root, "metadata")
    val manifest = new Path(metaDir, s"manifest-$newSnapId.avro")
    val mLen = writeAvro(spark, manifest, entrySchema, entries)
    val addedSize = entries.map(e => lng(
      e.get("data_file").asInstanceOf[GenericRecord],
      "file_size_in_bytes", 0L)).sum
    publishSnapshot(spark, tablePath, metaPath, meta, snap.snapshotId,
      newSnapId, manifest, mLen, manifestContent = 0,
      operation = "append",
      partitions = fieldSummaries(entries, partTypes),
      addedDataSize = addedSize)
  }

  def writeTable(df: DataFrame, tablePath: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    // stamp field ids into the parquet files (Spark writes them when
    // the schema carries parquet.field.id metadata) — the spec
    // REQUIRES data files to carry ids, and the reader resolves by id;
    // annotateIds walks NESTED structs too, allocating the same ids
    // the metadata.json below declares
    val (annSchema, fieldsJson, lastColId) = annotateIds(df.schema)
    // Dataset.to() drops the metadata — select with the annotated
    // alias (top-level ids) and a cast to the annotated type (whose
    // nested StructFields carry theirs; metadata differences keep the
    // cast from simplifying away)
    val withIds = df.select(df.schema.fields.map { f =>
      val af = annSchema(f.name)
      df(f.name).cast(af.dataType).as(f.name, af.metadata)
    }.toSeq: _*)
    val w = withIds.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tablePath)
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val partTypes = partitionBy.map(c => c -> df.schema(c).dataType)
    val entrySchema = manifestEntrySchema(partTypes)
    val entries = dataManifestEntries(spark, root, partTypes,
      entrySchema, snapshotId = 1L)
    require(entries.nonEmpty, s"no data files written under $tablePath")
    val metaDir = new Path(root, "metadata")
    fs.mkdirs(metaDir)
    val manifestPath = new Path(metaDir, "manifest-1.avro")
    val mLen = writeAvro(spark, manifestPath, entrySchema, entries)
    val ml = new GenericData.Record(manifestListSchema)
    ml.put("manifest_path", manifestPath.toString)
    ml.put("manifest_length", java.lang.Long.valueOf(mLen))
    ml.put("partition_spec_id", Integer.valueOf(0))
    ml.put("content", Integer.valueOf(0))
    ml.put("sequence_number", java.lang.Long.valueOf(1L))
    ml.put("added_snapshot_id", java.lang.Long.valueOf(1L))
    fieldSummaries(entries, partTypes).foreach(p => ml.put("partitions", p))
    val mlPath = new Path(metaDir, "snap-1.avro")
    writeAvro(spark, mlPath, manifestListSchema, Seq(ml))
    val specJson = partitionBy.zipWithIndex.map { case (c, i) =>
      // partition sources resolve by the ANNOTATED id (nested fields
      // shift later top-level ids away from position+1)
      val srcId = annSchema(c).metadata.getLong(FieldIdKey)
      s"""{"name":"$c","transform":"identity","source-id":$srcId,""" +
        s""""field-id":${1000 + i}}"""
    }.mkString(",")
    val metaJson =
      s"""{"format-version":2,
        |"table-uuid":"graft-${math.abs(tablePath.hashCode)}",
        |"location":"$tablePath",
        |"last-sequence-number":1,"last-updated-ms":0,"last-column-id":$lastColId,
        |"current-schema-id":0,
        |"schemas":[{"type":"struct","schema-id":0,"fields":[$fieldsJson]}],
        |"default-spec-id":0,
        |"partition-specs":[{"spec-id":0,"fields":[$specJson]}],
        |"last-partition-id":${999 + partitionBy.size},
        |"default-sort-order-id":0,"sort-orders":[{"order-id":0,"fields":[]}],
        |"current-snapshot-id":1,
        |"snapshots":[{"snapshot-id":1,"timestamp-ms":0,"sequence-number":1,
        |"summary":{"operation":"append","total-files-size":"${
          entries.map(e => lng(e.get("data_file")
            .asInstanceOf[GenericRecord], "file_size_in_bytes", 0L)).sum}"},
        |"manifest-list":"${mlPath.toString}","schema-id":0}]}""".stripMargin
    val out = fs.create(new Path(metaDir, "v1.metadata.json"), true)
    try out.write(metaJson.getBytes("UTF-8")) finally out.close()
    val hint = fs.create(new Path(metaDir, "version-hint.text"), true)
    try hint.write("1".getBytes("UTF-8")) finally hint.close()
  }
}
