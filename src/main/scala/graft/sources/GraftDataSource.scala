package graft.sources

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SaveMode, SparkSession, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Cast, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Not, Or, StartsWith, XxHash64}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.lakehouse.VersionedTable

/** `spark.read.format("graft")` / `df.write.format("graft")`: the
  * [[VersionedTable]] commit protocol as a first-class Spark data
  * source, registered under the short name `graft` (so SQL can also
  * say `SELECT * FROM graft.`/path``, completing the read half of
  * the two-part-name surface whose write half is
  * [[graft.plans.GraftDml]]).
  *
  * The read path is planned by CATALYST, not by a helper method: the
  * relation is a plain [[HadoopFsRelation]] over the vectorized
  * parquet format whose [[FileIndex]] is [[GraftFileIndex]] — so when
  * the optimizer pushes a filter into the scan, `listFiles` consults
  * the commit manifest's per-file min/max/null stats and per-file
  * bloom filters and returns only the files the predicate can touch.
  * Data skipping becomes a property of EVERY query shape over the
  * table (joins, aggregates, SQL) rather than of dedicated entry
  * points like `readPruned`/`readPointLookup`, while whole-stage
  * codegen and the vectorized reader stay intact because the scan
  * node is the stock `FileSourceScanExec`. At 100 TB this is the
  * difference between "pruning where the author remembered to call
  * the pruning API" and "pruning always".
  *
  * Versions that carry merge-on-read sidecars (positional deletion
  * vectors / equality deletes) cannot be served as a bare file scan —
  * hidden rows must be anti-joined out — so those fall back to a
  * [[PrunedFilteredScan]] relation that still does manifest-based
  * file skipping (sound under MoR: sidecars only REMOVE rows, so a
  * file a predicate cannot touch stays untouchable) and still reads
  * parquet vectorized inside its inner plan, then applies the DV/ED
  * anti-joins exactly like [[VersionedTable.readVersion]]. The
  * fallback is chosen per-VERSION: compact away the sidecars and the
  * same table serves the fast path again.
  *
  * Read options: `versionAsOf` (long) and `tag` (string) time-travel
  * the scan, mirroring `readVersion`/`readTag`. Write options:
  * `statsCols`/`bloomCols` (comma-separated) feed the manifest's
  * data-skipping payload; `keepVersions` widens the retention window.
  * `mode("append")` is an O(batch) [[VersionedTable.appendDelta]]
  * (current files carried by reference, stats/blooms copied forward);
  * `mode("overwrite")` is a full [[VersionedTable.commit]]. Both
  * publish with the single-object manifest PUT, so a `format("graft")`
  * writer racing readers keeps every commit-protocol guarantee.
  */
final class GraftDataSource extends RelationProvider
    with CreatableRelationProvider with StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "format(\"graft\") needs a path: .load(\"/table/root\")"))

  private def resolveVersion(spark: SparkSession, root: String,
      parameters: Map[String, String]): Long = {
    val asOf = parameters.get("versionAsOf").map(_.toLong)
    val tag = parameters.get("tag").map { t =>
      VersionedTable.tagVersion(spark, root, t).getOrElse(
        throw new IllegalArgumentException(s"no tag '$t' on $root"))
    }
    require(asOf.isEmpty || tag.isEmpty,
      "versionAsOf and tag are mutually exclusive")
    asOf.orElse(tag).getOrElse(
      VersionedTable.currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(
          s"$root has no committed version — " +
            "publish one with df.write.format(\"graft\").save(root)")))
  }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    val version = resolveVersion(spark, root, parameters)
    val refs = VersionedTable.filesAt(spark, root, version)
    val absFiles = refs.map(r => s"$root/$r")
    // an ALTERed table serves its manifest-declared LOGICAL schema;
    // the physical union read + rename-coalesce projection live in
    // readFilesWithDv, so such tables take the inner-plan relation
    // (same seam as merge-on-read versions)
    val evolved = VersionedTable.manifestSchema(spark, root, version)
    val dataSchema = evolved.getOrElse {
      if (absFiles.isEmpty) new StructType()
      else spark.read.parquet(absFiles: _*).schema
    }
    val skipper = ManifestSkipping(spark, root, version, dataSchema)
    val mor = evolved.nonEmpty ||
      VersionedTable.deleteVectors(spark, root, version).nonEmpty ||
        VersionedTable.equalityDeletes(spark, root, version).nonEmpty
    if (!mor) {
      val index = new GraftFileIndex(spark, root, refs, skipper)
      HadoopFsRelation(index, new StructType(), dataSchema, None,
        new ParquetFileFormat, Map.empty)(spark)
    } else {
      // real byte size (one LIST per version dir): BaseRelation's
      // default is conf.defaultSizeInBytes ≈ infinite, which would
      // silently stop Catalyst from BROADCASTING small MoR/evolved
      // dim tables in joins
      val bytes =
        new GraftFileIndex(spark, root, refs, skipper).sizeInBytes
      new GraftMorRelation(sqlContext, root, version, refs, dataSchema,
        skipper, bytes)
    }
  }

  private def csv(parameters: Map[String, String], key: String): Seq[String] =
    parameters.get(key).toSeq.flatMap(_.split(",")).map(_.trim)
      .filter(_.nonEmpty)

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    require(!parameters.contains("versionAsOf") && !parameters.contains("tag"),
      "time travel options are read-only — writes always target the head")
    val statsCols = csv(parameters, "statsCols")
    val bloomCols = csv(parameters, "bloomCols")
    val keep = parameters.get("keepVersions").map(_.toInt).getOrElse(1)
    val exists = VersionedTable.currentVersion(spark, root).nonEmpty
    def create(): Unit =
      VersionedTable.commit(spark, root, keep, statsCols, bloomCols) { st =>
        data.write.mode(SaveMode.Overwrite).parquet(st)
      }
    mode match {
      case SaveMode.Overwrite => create()
      case SaveMode.Append if exists =>
        // mergeSchema (Delta's option name): accept drifted batches by
        // metadata-only schema evolution — adds/widens in the SAME
        // commit as the batch; without it drift stays a loud error
        if (parameters.get("mergeSchema").exists(_.toBoolean))
          VersionedTable.appendDeltaEvolve(spark, root, data, keep,
            statsCols, bloomCols)
        else {
          GraftDataSource.requireSameSchema(
            VersionedTable.read(spark, root).schema, data.schema,
            s"""format("graft") append to $root""")
          VersionedTable.appendDelta(spark, root, keep, statsCols, bloomCols) {
            st => data.write.mode(SaveMode.Overwrite).parquet(st)
          }
        }
      case SaveMode.Append => create()
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(
          s"$root already has a committed version (mode=ErrorIfExists)")
      case SaveMode.ErrorIfExists => create()
      case SaveMode.Ignore if exists => ()
      case SaveMode.Ignore => create()
    }
    createRelation(sqlContext, parameters)
  }

  // ---- streaming: versions as offsets ------------------------------

  private def cdcOf(parameters: Map[String, String]): Boolean =
    parameters.get("cdc").forall(_.toBoolean)

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), GraftStreamSource.schemaFor(sqlContext.sparkSession,
      rootOf(parameters), cdcOf(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    val base = parameters.get("startingVersion") match {
      case Some("earliest") => -1L
      case Some(n) => n.toLong
      case None => VersionedTable.currentVersion(spark, root).getOrElse(0L)
    }
    new GraftStreamSource(spark, root, csv(parameters, "keyCols"),
      cdcOf(parameters), base,
      parameters.get("maxVersionsPerBatch").map(_.toLong)
        .getOrElse(Long.MaxValue))
  }

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val root = rootOf(parameters)
    require(partitionColumns.isEmpty,
      "format(\"graft\") sink does not take partitionBy — cluster " +
        "inside the batch instead (Bucketing.*)")
    new GraftStreamSink(sqlContext.sparkSession, root,
      parameters.getOrElse("mode", "append"), csv(parameters, "keyCols"),
      csv(parameters, "statsCols"), csv(parameters, "bloomCols"),
      parameters.get("keepVersions").map(_.toInt).getOrElse(1))
  }
}

/** The [[FileIndex]] a graft version's manifest defines: the file
  * list comes from the commit (no directory listing race — a reader
  * never sees an in-flight version), and `listFiles` answers Catalyst
  * data filters by [[ManifestSkipping]], so file pruning happens at
  * PLAN time inside the stock `FileSourceScanExec`, visible in its
  * `numFiles` metric. File statuses are gathered with one LIST per
  * referenced version dir (not one stat call per file — the listing
  * cost object stores actually charge for). */
final class GraftFileIndex(spark: SparkSession, root: String,
    refs: Seq[String], skipper: ManifestSkipping) extends FileIndex {

  private val statuses: Seq[(String, FileStatus)] = {
    val fs = FileSystem.get(new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration)
    refs.groupBy(_.takeWhile(_ != '/')).toSeq.flatMap { case (dir, rs) =>
      val listed = fs.listStatus(new Path(s"$root/$dir"))
        .filter(_.isFile).map(st => st.getPath.getName -> st).toMap
      rs.map { r =>
        val name = r.drop(dir.length + 1)
        r -> listed.getOrElse(name,
          fs.getFileStatus(new Path(s"$root/$r")))
      }
    }
  }

  override def rootPaths: Seq[Path] = Seq(new Path(root))

  override def partitionSchema: StructType = new StructType()

  override def inputFiles: Array[String] =
    statuses.map(_._2.getPath.toString).toArray

  override def sizeInBytes: Long = statuses.map(_._2.getLen).sum

  override def refresh(): Unit = ()

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept = statuses.collect {
      case (ref, st) if dataFilters.forall(skipper.keepCatalyst(ref, _)) =>
        st
    }
    Seq(PartitionDirectory(InternalRow.empty, kept.toArray))
  }
}

/** Merge-on-read fallback relation: manifest-pruned file subset →
  * [[VersionedTable.readFilesWithDv]] (vectorized parquet + DV/ED
  * anti-joins) → filter/projection, returned as the inner plan's
  * internal rows (`needConversion = false` — no external-Row
  * round-trip; Spark re-checks every filter above the scan, so
  * partially-translated pushdown stays exact). */
final class GraftMorRelation(sqlCtx: SQLContext, root: String,
    version: Long, refs: Seq[String], val schema: StructType,
    skipper: ManifestSkipping, bytes: Long)
    extends BaseRelation with PrunedFilteredScan {

  override def sqlContext: SQLContext = sqlCtx

  override def needConversion: Boolean = false

  /** Manifest-derived size — lets Catalyst broadcast small MoR/
    * evolved tables instead of defaulting to "infinite". The DV/ED
    * anti-joins only REMOVE rows, so the physical byte total stays a
    * sound upper bound. */
  override def sizeInBytes: Long = bytes

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val spark = sqlCtx.sparkSession
    val kept = refs.filter(r => filters.forall(skipper.keepSource(r, _)))
    val base =
      if (kept.isEmpty)
        VersionedTable.readVersion(spark, root, version).limit(0)
      else VersionedTable.readFilesWithDv(spark, root, version,
        kept.map(r => s"$root/$r"))
    // re-apply the filters inside the inner plan too, so Catalyst
    // pushes them down to the parquet scan under the anti-joins
    val filtered = filters.foldLeft(base) { (df, f) =>
      skipper.toColumn(df, f).map(df.filter).getOrElse(df)
    }
    val projected =
      if (requiredColumns.isEmpty) filtered.select()
      else filtered.select(requiredColumns.toSeq.map(c => col(s"`$c`")): _*)
    projected.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}

/** Driver-side data-skipping oracle over one version's manifest
  * payload: answers "may file F contain a row matching predicate P?"
  * for both Catalyst expressions (the [[FileIndex]] path) and
  * `sources.Filter`s (the MoR path). Sound by construction — any
  * shape it does not understand keeps the file; min/max compare
  * through the column type's interpreted ordering after casting the
  * manifest's string stats back (the same cast `countWhere` plans
  * with); bloom membership recomputes the write side's
  * `xxhash64(value, j)` bits exactly.
  *
  * Timestamp caveat (inherited from the manifest format, same as
  * `countWhere`): TIMESTAMP stats are rendered and re-parsed through
  * the SESSION time zone, so writers and readers must agree on
  * `spark.sql.session.timeZone` for timestamp pruning to be exact —
  * every session this library builds pins UTC. */
final class ManifestSkipping(
    schema: StructType, zone: String,
    stats: Map[String, VersionedTable.FileStat],
    blooms: Map[(String, String), (Int, Int, java.util.BitSet)])
    extends Serializable {

  private def statOf(ref: String): Option[VersionedTable.FileStat] =
    stats.get(ref).orElse(stats.get(ref.drop(ref.indexOf('/') + 1)))

  private def bloomOf(ref: String, c: String)
      : Option[(Int, Int, java.util.BitSet)] = {
    val bare = ref.drop(ref.indexOf('/') + 1)
    blooms.collectFirst {
      case ((f, bc), b) if (f == ref || f == bare) && bc.equalsIgnoreCase(c) =>
        b
    }
  }

  import ManifestSkipping.Extent

  private def internal(dt: DataType, s: String): Any =
    Cast(Literal(UTF8String.fromString(s), StringType), dt, Some(zone))
      .eval(null)

  // memoized per (file, column): at 10^5 manifest files a query's
  // listFiles evaluates every (file, filter) pair on the driver, and
  // re-casting stat strings per query would dominate plan time
  private val extentCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      Option[Extent]]()

  private def extent(ref: String, c: String, dt: DataType): Option[Extent] =
    extentCache.computeIfAbsent((ref, c.toLowerCase), _ =>
      statOf(ref).flatMap { s =>
        (s.min.keySet ++ s.max.keySet ++ s.nulls.keySet)
          .find(_.equalsIgnoreCase(c)).map { k =>
            val mnS = s.min.getOrElse(k, None)
            val mxS = s.max.getOrElse(k, None)
            Extent(
              allNull = s.min.contains(k) && mnS.isEmpty && mxS.isEmpty,
              mayNull = s.nulls.get(k).forall(_ > 0L),
              mn = mnS.map(internal(dt, _)).filter(_ != null),
              mx = mxS.map(internal(dt, _)).filter(_ != null))
          }
      })

  private val ordCache =
    new java.util.concurrent.ConcurrentHashMap[DataType, Ordering[Any]]()

  private def ord(dt: DataType): Ordering[Any] =
    ordCache.computeIfAbsent(dt, TypeUtils.getInterpretedOrdering)

  private sealed trait Op
  private case object EQ extends Op
  private case object LT extends Op
  private case object LE extends Op
  private case object GT extends Op
  private case object GE extends Op

  /** May any row of `ref` satisfy `col <op> v`? (`v` internal,
    * non-null; comparisons are null-rejecting, so an all-null column
    * excludes the file outright.) */
  private def mayCmp(ref: String, c: String, v: Any, dt: DataType,
      op: Op): Boolean =
    extent(ref, c, dt).forall { ex =>
      if (ex.allNull) false
      else {
        val o = ord(dt)
        op match {
          case EQ => ex.mn.forall(o.lteq(_, v)) && ex.mx.forall(o.gteq(_, v))
          case LT => ex.mn.forall(o.lt(_, v))
          case LE => ex.mn.forall(o.lteq(_, v))
          case GT => ex.mx.forall(o.gt(_, v))
          case GE => ex.mx.forall(o.gteq(_, v))
        }
      }
    }

  /** [[mayCmp]](EQ) plus the bloom bits when the manifest carries a
    * bloom for the column — the write side hashed `xxhash64(value,
    * j)` per hash index j, so membership re-evaluates the same
    * builtin on the same typed value. */
  private def mayEq(ref: String, c: String, v: Any, dt: DataType): Boolean =
    mayCmp(ref, c, v, dt, EQ) && bloomOf(ref, c).forall {
      case (bits, k, bs) =>
        (0 until k).forall { j =>
          val h = XxHash64(Seq(Literal(v, dt), Literal(j)), 42L)
            .eval(null).asInstanceOf[Long]
          bs.get(java.lang.Math.floorMod(h, bits.toLong).toInt)
        }
    }

  private def mayNull(ref: String, c: String, dt: DataType): Boolean =
    extent(ref, c, dt).forall(_.mayNull)

  private def mayNonNull(ref: String, c: String, dt: DataType): Boolean =
    extent(ref, c, dt).forall(!_.allNull)

  private def mayPrefix(ref: String, c: String, p: String): Boolean =
    extent(ref, c, StringType).forall { ex =>
      if (ex.allNull) false
      else ex.mx.forall(_.toString >= p) &&
        ex.mn.forall(_.toString.take(p.length) <= p)
    }

  /** The [[FileIndex]] entry: may `ref` contain a row matching the
    * Catalyst data filter `e`? */
  def keepCatalyst(ref: String, e: Expression): Boolean = e match {
    case And(l, r) => keepCatalyst(ref, l) && keepCatalyst(ref, r)
    case Or(l, r) => keepCatalyst(ref, l) || keepCatalyst(ref, r)
    case IsNotNull(a: Attribute) => mayNonNull(ref, a.name, a.dataType)
    case Not(IsNull(a: Attribute)) => mayNonNull(ref, a.name, a.dataType)
    case IsNull(a: Attribute) => mayNull(ref, a.name, a.dataType)
    case EqualTo(a: Attribute, Literal(v, dt)) =>
      v != null && mayEq(ref, a.name, v, dt)
    case EqualTo(Literal(v, dt), a: Attribute) =>
      v != null && mayEq(ref, a.name, v, dt)
    case EqualNullSafe(a: Attribute, Literal(v, dt)) =>
      if (v == null) mayNull(ref, a.name, a.dataType)
      else mayEq(ref, a.name, v, dt)
    case EqualNullSafe(Literal(v, dt), a: Attribute) =>
      if (v == null) mayNull(ref, a.name, a.dataType)
      else mayEq(ref, a.name, v, dt)
    case LessThan(a: Attribute, Literal(v, dt)) =>
      v != null && mayCmp(ref, a.name, v, dt, LT)
    case LessThanOrEqual(a: Attribute, Literal(v, dt)) =>
      v != null && mayCmp(ref, a.name, v, dt, LE)
    case GreaterThan(a: Attribute, Literal(v, dt)) =>
      v != null && mayCmp(ref, a.name, v, dt, GT)
    case GreaterThanOrEqual(a: Attribute, Literal(v, dt)) =>
      v != null && mayCmp(ref, a.name, v, dt, GE)
    case LessThan(Literal(v, dt), a: Attribute) => // v < a  ⇔  a > v
      v != null && mayCmp(ref, a.name, v, dt, GT)
    case LessThanOrEqual(Literal(v, dt), a: Attribute) =>
      v != null && mayCmp(ref, a.name, v, dt, GE)
    case GreaterThan(Literal(v, dt), a: Attribute) =>
      v != null && mayCmp(ref, a.name, v, dt, LT)
    case GreaterThanOrEqual(Literal(v, dt), a: Attribute) =>
      v != null && mayCmp(ref, a.name, v, dt, LE)
    case In(a: Attribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists { case Literal(v, dt) =>
        v != null && mayEq(ref, a.name, v, dt)
      }
    case InSet(a: Attribute, hs) =>
      hs.exists(v => v != null && mayEq(ref, a.name, v, a.dataType))
    case StartsWith(a: Attribute, Literal(p: UTF8String, _)) if p != null =>
      mayPrefix(ref, a.name, p.toString)
    case _ => true
  }

  private def dtOf(c: String): Option[DataType] =
    schema.find(_.name.equalsIgnoreCase(c)).map(_.dataType)

  /** External (sources.Filter) literal → the column's internal
    * representation, via the same Cast the Catalyst path trusts. */
  private def toInternal(v: Any, dt: DataType): Any =
    Cast(Literal(v), dt, Some(zone)).eval(null)

  private def cmpSource(ref: String, c: String, v: Any, op: Op): Boolean =
    dtOf(c).forall { dt =>
      val iv = toInternal(v, dt)
      iv == null || mayCmp(ref, c, iv, dt, op)
    }

  /** The MoR-path entry: may `ref` contain a row matching the
    * translated source filter `f`? */
  def keepSource(ref: String, f: Filter): Boolean = f match {
    case org.apache.spark.sql.sources.And(l, r) =>
      keepSource(ref, l) && keepSource(ref, r)
    case org.apache.spark.sql.sources.Or(l, r) =>
      keepSource(ref, l) || keepSource(ref, r)
    case org.apache.spark.sql.sources.Not(
        org.apache.spark.sql.sources.IsNull(c)) =>
      dtOf(c).forall(dt => mayNonNull(ref, c, dt))
    case org.apache.spark.sql.sources.IsNotNull(c) =>
      dtOf(c).forall(dt => mayNonNull(ref, c, dt))
    case org.apache.spark.sql.sources.IsNull(c) =>
      dtOf(c).forall(dt => mayNull(ref, c, dt))
    case org.apache.spark.sql.sources.EqualTo(c, v) if v != null =>
      dtOf(c).forall { dt =>
        val iv = toInternal(v, dt)
        iv == null || mayEq(ref, c, iv, dt)
      }
    case org.apache.spark.sql.sources.EqualNullSafe(c, v) if v != null =>
      dtOf(c).forall { dt =>
        val iv = toInternal(v, dt)
        iv == null || mayEq(ref, c, iv, dt)
      }
    case org.apache.spark.sql.sources.EqualNullSafe(c, null) =>
      dtOf(c).forall(dt => mayNull(ref, c, dt))
    case org.apache.spark.sql.sources.LessThan(c, v) if v != null =>
      cmpSource(ref, c, v, LT)
    case org.apache.spark.sql.sources.LessThanOrEqual(c, v) if v != null =>
      cmpSource(ref, c, v, LE)
    case org.apache.spark.sql.sources.GreaterThan(c, v) if v != null =>
      cmpSource(ref, c, v, GT)
    case org.apache.spark.sql.sources.GreaterThanOrEqual(c, v) if v != null =>
      cmpSource(ref, c, v, GE)
    case org.apache.spark.sql.sources.In(c, vs) =>
      dtOf(c).forall { dt =>
        vs.exists { v =>
          if (v == null) false
          else {
            val iv = toInternal(v, dt)
            iv == null || mayEq(ref, c, iv, dt)
          }
        }
      }
    case org.apache.spark.sql.sources.StringStartsWith(c, p) if p != null =>
      mayPrefix(ref, c, p)
    case _ => true
  }

  /** Source filter → Column for the MoR inner plan (so parquet-level
    * pushdown still happens below the anti-joins); None when the
    * shape has no direct Column form — Spark re-applies every filter
    * above the scan, so dropping one only costs, never corrupts. */
  def toColumn(df: DataFrame, f: Filter)
      : Option[org.apache.spark.sql.Column] = {
    def c(n: String) = df.col(s"`$n`")
    f match {
      case org.apache.spark.sql.sources.And(l, r) =>
        for (a <- toColumn(df, l); b <- toColumn(df, r)) yield a && b
      case org.apache.spark.sql.sources.Or(l, r) =>
        for (a <- toColumn(df, l); b <- toColumn(df, r)) yield a || b
      case org.apache.spark.sql.sources.Not(x) => toColumn(df, x).map(!_)
      case org.apache.spark.sql.sources.EqualTo(n, v) =>
        Some(c(n) === org.apache.spark.sql.functions.lit(v))
      case org.apache.spark.sql.sources.EqualNullSafe(n, v) =>
        Some(c(n) <=> org.apache.spark.sql.functions.lit(v))
      case org.apache.spark.sql.sources.LessThan(n, v) =>
        Some(c(n) < org.apache.spark.sql.functions.lit(v))
      case org.apache.spark.sql.sources.LessThanOrEqual(n, v) =>
        Some(c(n) <= org.apache.spark.sql.functions.lit(v))
      case org.apache.spark.sql.sources.GreaterThan(n, v) =>
        Some(c(n) > org.apache.spark.sql.functions.lit(v))
      case org.apache.spark.sql.sources.GreaterThanOrEqual(n, v) =>
        Some(c(n) >= org.apache.spark.sql.functions.lit(v))
      case org.apache.spark.sql.sources.In(n, vs) =>
        Some(c(n).isin(vs.toSeq: _*))
      case org.apache.spark.sql.sources.IsNull(n) => Some(c(n).isNull)
      case org.apache.spark.sql.sources.IsNotNull(n) => Some(c(n).isNotNull)
      case org.apache.spark.sql.sources.StringStartsWith(n, p) =>
        Some(c(n).startsWith(p))
      case _ => None
    }
  }
}

object GraftDataSource {
  /** Drift guard for APPEND paths: a parquet union resolves columns
    * by name from a sampled footer, so a batch with renamed/retyped/
    * extra columns would land silently shadowed or invisible instead
    * of failing. Appends therefore require the exact column set and
    * types (case-insensitive names, any order); schema evolution is
    * an explicit `Maintenance.alignAppend` + full commit. */
  private[sources] def requireSameSchema(current: StructType,
      batch: StructType, ctx: String): Unit = {
    def norm(st: StructType) =
      st.map(f => f.name.toLowerCase -> f.dataType).toMap
    require(norm(current) == norm(batch),
      s"$ctx schema drift: batch columns " +
        s"(${batch.fields.map(f => s"${f.name}:${f.dataType.simpleString}")
          .sorted.mkString(", ")}) != table columns " +
        s"(${current.fields.map(f => s"${f.name}:${f.dataType.simpleString}")
          .sorted.mkString(", ")}) — evolve explicitly with " +
        "Maintenance.alignAppend and a full commit")
  }
}

object ManifestSkipping {
  /** One column's manifest extent in a file: `allNull` when the
    * commit recorded a null min AND max (no non-null values at all),
    * `mayNull` false only when the null count is known zero. A `None`
    * bound means "unknown" and never excludes. */
  private final case class Extent(allNull: Boolean, mayNull: Boolean,
    mn: Option[Any], mx: Option[Any])

  /** Build the skipping oracle for one (root, version) from its
    * manifest — stats and blooms load once at relation-creation time
    * (KBs; the same objects `countWhere` and `prunedFilesEq` read). */
  def apply(spark: SparkSession, root: String, version: Long,
      schema: StructType): ManifestSkipping = {
    val stats = VersionedTable.manifestStats(spark, root, version)
      .map(s => s.file -> s).toMap
    val blooms = VersionedTable.manifestBlooms(spark, root, version)
    new ManifestSkipping(schema,
      spark.conf.get("spark.sql.session.timeZone"), stats, blooms)
  }
}
