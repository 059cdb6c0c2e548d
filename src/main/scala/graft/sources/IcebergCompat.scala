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
  * NOT supported, rejected loudly: EQUALITY deletes (content=2 —
  * their correct application needs sequence-number ordering;
  * positional deletes name files explicitly and are order-safe),
  * nested types, column-mapping by field id (columns match by NAME —
  * renamed-column histories would need id mapping), non-parquet
  * files.
  */
object IcebergCompat {

  private val mapper = new ObjectMapper()

  final case class IceFile(path: String, size: Long,
      partitionValues: Map[String, String])

  /** A POSITIONAL delete file (v2 MoR): parquet of (file_path, pos)
    * rows naming data-file rows removed from the snapshot. */
  final case class IceDelete(path: String, size: Long)

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
      s"unsupported Iceberg type '$other' (flat primitive types only" +
        " — see class doc)")
  }

  private def schemaOf(node: JsonNode): StructType = {
    val fields = node.get("fields")
    StructType((0 until fields.size).map { i =>
      val f = fields.get(i)
      val t = f.get("type")
      require(t.isTextual,
        s"unsupported nested Iceberg type at field '${f.get("name").asText}'")
      StructField(f.get("name").asText, toSparkType(t.asText),
        nullable = !f.get("required").asBoolean(false))
    })
  }

  // ---- avro manifest parsing (driver-side, KB–MB metadata) ----

  private def avroRecords(spark: SparkSession, p: Path)
      : Seq[GenericRecord] = {
    val in = new FsInput(p, spark.sessionState.newHadoopConf())
    val rd = new DataFileReader[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
    try rd.iterator().asScala.toVector finally { rd.close() }
  }

  private def str(r: GenericRecord, field: String): String =
    Option(r.get(field)).map(_.toString).orNull

  private def lng(r: GenericRecord, field: String, dflt: Long): Long =
    Option(r.get(field)).map(_.asInstanceOf[Number].longValue)
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

  /** Reconstruct the requested snapshot: metadata → manifest list →
    * manifests → live (non-DELETED) data files. */
  def snapshot(spark: SparkSession, tablePath: String,
      asOfSnapshotId: Option[Long] = None): Snapshot = {
    val meta = readJson(spark, currentMetadataPath(spark, tablePath))
    val fv = Option(meta.get("format-version")).map(_.asInt).getOrElse(1)
    require(fv <= 2, s"unsupported Iceberg format-version $fv")
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
    // pruning for them is the documented loss, not correctness)
    val partCols = specFields.flatMap { f =>
      f.get("transform").asText match {
        case "identity" => Some(f.get("name").asText)
        case _ => None
      }
    }
    // snapshot selection
    val snaps = Option(meta.get("snapshots")).map(arr =>
      (0 until arr.size).map(arr.get)).getOrElse(Seq.empty)
    val wantedId = asOfSnapshotId.orElse(
      Option(meta.get("current-snapshot-id")).map(_.asLong)
        .filter(_ != -1L))
    val snapNode = wantedId.map { id =>
      snaps.find(_.get("snapshot-id").asLong == id)
        .getOrElse(throw new IllegalArgumentException(
          s"snapshot $id not in the metadata of $tablePath (have " +
            s"${snaps.map(_.get("snapshot-id").asLong).mkString("[", ",", "]")})"))
    }
    val files = mutable.ArrayBuffer[IceFile]()
    val deletes = mutable.ArrayBuffer[IceDelete]()
    snapNode.foreach { sn =>
      val root = new Path(tablePath)
      // (manifest path, content): 0 = data manifest, 1 = deletes
      val manifestPaths: Seq[(Path, Long)] =
        if (sn.has("manifest-list")) {
          val mlPath = DeltaCompat.resolvePath(root,
            sn.get("manifest-list").asText)
          avroRecords(spark, mlPath).map { mf =>
            (DeltaCompat.resolvePath(root, str(mf, "manifest_path")),
              lng(mf, "content", 0L))
          }
        } else {
          val arr = sn.get("manifests")
          require(arr != null,
            "snapshot carries neither manifest-list nor manifests")
          (0 until arr.size).map(i =>
            (DeltaCompat.resolvePath(root, arr.get(i).asText), 0L))
        }
      manifestPaths.foreach { case (mp, manifestContent) =>
        avroRecords(spark, mp).foreach { entry =>
          val status = lng(entry, "status", 1L)
          if (status != 2L) { // 2 = DELETED: not part of the snapshot
            val dfr = entry.get("data_file").asInstanceOf[GenericRecord]
            val fmt = str(dfr, "file_format")
            require(fmt != null && fmt.equalsIgnoreCase("parquet"),
              s"unsupported data file format: $fmt")
            val content = math.max(lng(dfr, "content", 0L),
              manifestContent)
            content match {
              case 0L =>
                val pv: Map[String, String] =
                  Option(dfr.get("partition")) match {
                    case Some(pr: GenericRecord) =>
                      partCols.map { c =>
                        c -> partValueString(
                          pr.get(c).asInstanceOf[AnyRef],
                          schema(c).dataType, c)
                      }.toMap
                    case _ => Map.empty
                  }
                files += IceFile(str(dfr, "file_path"),
                  lng(dfr, "file_size_in_bytes", -1L), pv)
              case 1L =>
                deletes += IceDelete(str(dfr, "file_path"),
                  lng(dfr, "file_size_in_bytes", -1L))
              case other => throw new IllegalArgumentException(
                "equality delete files are not supported by this " +
                  s"reader (class doc): content=$other")
            }
          }
        }
      }
    }
    Snapshot(wantedId.getOrElse(-1L), schema, partCols, files.toVector,
      deletes.toVector)
  }

  /** The relation over a snapshot's data files, columns in declared
    * order — `_metadata` (file_path, row_index) still resolvable on
    * the result for the MoR delete join. */
  private def relationFor(spark: SparkSession, tablePath: String,
      snap: Snapshot): DataFrame = {
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
      asOfSnapshotId: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, tablePath, asOfSnapshotId)
    if (snap.files.isEmpty) {
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], snap.schema)
    }
    val base = relationFor(spark, tablePath, snap)
    val outCols = snap.schema.map(f => col(f.name))
    if (snap.deletes.isEmpty) base.select(outCols: _*)
    else {
      import spark.implicits._
      val root = new Path(tablePath)
      val qualified = root.getFileSystem(
        spark.sessionState.newHadoopConf()).makeQualified(root)
      // writer-form manifest path -> the exact string the scan's
      // _metadata.file_path yields (the SparkPath url form)
      val trans = snap.files.map { f =>
        val resolved = DeltaCompat.resolvePath(qualified, f.path)
        (f.path,
          org.apache.spark.paths.SparkPath.fromPath(resolved).urlEncoded)
      }.toDF("file_path", "_ice_resolved")
      val delPaths = snap.deletes.map(d =>
        DeltaCompat.resolvePath(qualified, d.path).toString)
      val dels = spark.read
        .schema("file_path STRING, pos BIGINT")
        .parquet(delPaths: _*)
        .join(broadcast(trans), Seq("file_path"), "left")
        .select(coalesce(col("_ice_resolved"), col("file_path"))
          .as("_ice_del_fp"), col("pos").as("_ice_del_pos"))
      base
        .withColumn("_ice_fp", col("_metadata.file_path"))
        .withColumn("_ice_pos", col("_metadata.row_index"))
        .join(dels, col("_ice_fp") === col("_ice_del_fp") &&
          col("_ice_pos") === col("_ice_del_pos"), "left_anti")
        .select(outCols: _*)
    }
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
      s"cannot export Spark type $other to Iceberg (flat primitives)")
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
      |{"name":"added_snapshot_id","type":"long"}]}""".stripMargin)

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
        |{"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin)
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
    // delete manifest (content=1 at both levels, per the spec)
    val entrySchema = manifestEntrySchema(Seq.empty)
    val dfSchema = entrySchema.getField("data_file").schema()
    val partSchema = dfSchema.getField("partition").schema()
    val dfr = new GenericData.Record(dfSchema)
    dfr.put("content", Integer.valueOf(1))
    dfr.put("file_path", delFile.toString)
    dfr.put("file_format", "PARQUET")
    dfr.put("partition", new GenericData.Record(partSchema))
    dfr.put("record_count", java.lang.Long.valueOf(-1L))
    dfr.put("file_size_in_bytes",
      java.lang.Long.valueOf(fs.getFileStatus(delFile).getLen))
    val e = new GenericData.Record(entrySchema)
    e.put("status", Integer.valueOf(1))
    e.put("snapshot_id", java.lang.Long.valueOf(newSnapId))
    e.put("data_file", dfr)
    val metaDir = new Path(root, "metadata")
    val delManifest = new Path(metaDir, s"manifest-del-$newSnapId.avro")
    val dmLen = writeAvro(spark, delManifest, entrySchema, Seq(e))
    // new manifest list = the current snapshot's manifests + the
    // delete manifest
    val curSnaps = meta.get("snapshots")
    val curSnap = (0 until curSnaps.size).map(curSnaps.get)
      .find(_.get("snapshot-id").asLong == snap.snapshotId)
      .getOrElse(throw new IllegalArgumentException(
        s"current snapshot ${snap.snapshotId} missing from metadata"))
    val prior: Seq[GenericRecord] =
      if (curSnap.has("manifest-list"))
        avroRecords(spark, DeltaCompat.resolvePath(root,
          curSnap.get("manifest-list").asText))
      else Seq.empty
    val mlRecs = prior.map { r =>
      // re-project into OUR list schema (a prior list may carry more
      // optional fields than the fixture schema declares)
      val ml = new GenericData.Record(manifestListSchema)
      ml.put("manifest_path", str(r, "manifest_path"))
      ml.put("manifest_length",
        java.lang.Long.valueOf(lng(r, "manifest_length", -1L)))
      ml.put("partition_spec_id",
        Integer.valueOf(lng(r, "partition_spec_id", 0L).toInt))
      ml.put("content", Integer.valueOf(lng(r, "content", 0L).toInt))
      ml.put("added_snapshot_id",
        java.lang.Long.valueOf(lng(r, "added_snapshot_id", 0L)))
      ml
    } :+ {
      val ml = new GenericData.Record(manifestListSchema)
      ml.put("manifest_path", delManifest.toString)
      ml.put("manifest_length", java.lang.Long.valueOf(dmLen))
      ml.put("partition_spec_id", Integer.valueOf(0))
      ml.put("content", Integer.valueOf(1))
      ml.put("added_snapshot_id", java.lang.Long.valueOf(newSnapId))
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
    val snapNode = node.withArray("snapshots").addObject()
    snapNode.put("snapshot-id", newSnapId)
    snapNode.put("timestamp-ms", 0L)
    snapNode.put("sequence-number", newSnapId)
    snapNode.putObject("summary").put("operation", "delete")
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

  /** Materialize a DataFrame as a MINIMAL spec-valid Iceberg table
    * (format-version 2, one snapshot): Spark writes the parquet data
    * files (Hive layout when `partitionBy` is set; the reader takes
    * partition values from the manifest, so the stripped columns are
    * re-attached exactly), then one manifest + manifest list +
    * `v1.metadata.json` + `version-hint.text` describe them. A
    * fixture/export writer, not a transactional one — same contract
    * as [[DeltaCompat.writeTable]]. */
  def writeTable(df: DataFrame, tablePath: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tablePath)
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val partTypes = partitionBy.map(c => c -> df.schema(c).dataType)
    val entrySchema = manifestEntrySchema(partTypes)
    val dfSchema = entrySchema.getField("data_file").schema()
    val partSchema = dfSchema.getField("partition").schema()
    // enumerate data files; partition values parse from the k=v dirs
    val it = fs.listFiles(root, true)
    val entries = mutable.ArrayBuffer[GenericRecord]()
    var nFiles = 0
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (name.endsWith(".parquet") && !name.startsWith("_") &&
          !st.getPath.toString.contains("/metadata/")) {
        val rel = st.getPath.toString
          .stripPrefix(fs.makeQualified(root).toString).stripPrefix("/")
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
        e.put("snapshot_id", java.lang.Long.valueOf(1L))
        e.put("data_file", dfr)
        entries += e
        nFiles += 1
      }
    }
    require(nFiles > 0, s"no data files written under $tablePath")
    val metaDir = new Path(root, "metadata")
    fs.mkdirs(metaDir)
    val manifestPath = new Path(metaDir, "manifest-1.avro")
    val mLen = writeAvro(spark, manifestPath, entrySchema, entries.toSeq)
    val ml = new GenericData.Record(manifestListSchema)
    ml.put("manifest_path", manifestPath.toString)
    ml.put("manifest_length", java.lang.Long.valueOf(mLen))
    ml.put("partition_spec_id", Integer.valueOf(0))
    ml.put("content", Integer.valueOf(0))
    ml.put("added_snapshot_id", java.lang.Long.valueOf(1L))
    val mlPath = new Path(metaDir, "snap-1.avro")
    writeAvro(spark, mlPath, manifestListSchema, Seq(ml))
    val fieldsJson = df.schema.fields.zipWithIndex.map { case (f, i) =>
      s"""{"id":${i + 1},"name":"${f.name}","required":${!f.nullable},""" +
        s""""type":"${icebergTypeOf(f.dataType)}"}"""
    }.mkString(",")
    val specJson = partitionBy.zipWithIndex.map { case (c, i) =>
      val srcId = df.schema.fieldIndex(c) + 1
      s"""{"name":"$c","transform":"identity","source-id":$srcId,""" +
        s""""field-id":${1000 + i}}"""
    }.mkString(",")
    val metaJson =
      s"""{"format-version":2,
        |"table-uuid":"graft-${math.abs(tablePath.hashCode)}",
        |"location":"$tablePath",
        |"last-sequence-number":1,"last-updated-ms":0,"last-column-id":${df.schema.size},
        |"current-schema-id":0,
        |"schemas":[{"type":"struct","schema-id":0,"fields":[$fieldsJson]}],
        |"default-spec-id":0,
        |"partition-specs":[{"spec-id":0,"fields":[$specJson]}],
        |"last-partition-id":${999 + partitionBy.size},
        |"default-sort-order-id":0,"sort-orders":[{"order-id":0,"fields":[]}],
        |"current-snapshot-id":1,
        |"snapshots":[{"snapshot-id":1,"timestamp-ms":0,"sequence-number":1,
        |"summary":{"operation":"append"},
        |"manifest-list":"${mlPath.toString}","schema-id":0}]}""".stripMargin
    val out = fs.create(new Path(metaDir, "v1.metadata.json"), true)
    try out.write(metaJson.getBytes("UTF-8")) finally out.close()
    val hint = fs.create(new Path(metaDir, "version-hint.text"), true)
    try hint.write("1".getBytes("UTF-8")) finally hint.close()
  }
}
