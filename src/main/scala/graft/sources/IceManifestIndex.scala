package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, BoundReference, Cast, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Not, Or, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One data manifest as the MANIFEST LIST describes it: its path, its
  * sequence number, and (when the writer recorded them) the per-
  * partition-field value summaries — `contains_null` + the spec's
  * single-value-binary `lower_bound`/`upper_bound`. */
private[sources] final case class IceManifestRef(path: Path, seq: Long,
    summaries: Option[Seq[IceFieldSummary]])

private[sources] final case class IceFieldSummary(containsNull: Boolean,
    lower: Option[Array[Byte]], upper: Option[Array[Byte]])

/** LAZY manifest-backed [[FileIndex]] for [[IcebergCompat.read]]
  * (r12 verdict item 5 — the one declared `weak`): planning no longer
  * parses every data manifest up front on one thread. Instead:
  *
  *   - `listFiles` first SKIPS manifests whose manifest-list field
  *     summaries prove no partition can match the pushed partition
  *     filters (min/max + contains_null range logic, CONSERVATIVE:
  *     any shape it can't reason about keeps the manifest) — a
  *     filtered query against a 1000-manifest table opens only the
  *     manifests its partitions live in;
  *   - surviving manifests parse IN PARALLEL on a bounded pool
  *     (manifests are independent KB–MB Avro metadata; Iceberg's own
  *     client reads them on a worker pool) and CACHE, so repeated
  *     plans over the same index never re-read;
  *   - `sizeInBytes` answers from the snapshot summary's
  *     `total-files-size` when the writer recorded it, falling back
  *     to a full (parallel, cached) parse — so planner stats never
  *     force an eager scan of a summarized table.
  *
  * Safety: summary pruning only ever REMOVES manifests whose value
  * RANGE cannot intersect the predicate; string bounds compare as
  * unsigned UTF-8 bytes, which stays conservative under the spec's
  * truncated-bound allowance (a truncated lower is ≤ the true min, a
  * truncated-incremented upper is ≥ the true max). Partition-level
  * pruning inside the surviving manifests then proceeds exactly as
  * [[MetaFileIndex]] does.
  */
private[sources] final class IceManifestIndex(spark: SparkSession,
    root: Path, override val partitionSchema: StructType,
    manifests: Seq[IceManifestRef],
    parse: IceManifestRef => Seq[MetaDataFile],
    estSizeInBytes: Option[Long]) extends FileIndex {

  private val tz = spark.sessionState.conf.sessionLocalTimeZone
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[MetaDataFile]]()

  /** Parse `refs` on a bounded pool, through the cache. Result order
    * follows `refs` (deterministic partition-directory grouping). */
  private def parseAll(refs: Seq[IceManifestRef]): Seq[MetaDataFile] = {
    val missing = refs.filter(r => !cache.containsKey(r.path.toString))
    if (missing.nonEmpty) {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(8, math.max(1, Runtime.getRuntime.availableProcessors)))
      try {
        val futures = missing.map { r =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = cache.put(r.path.toString, parse(r))
          })
        }
        futures.foreach { f => // propagate the ORIGINAL parse failure
          try f.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              throw e.getCause
          }
        }
      } finally pool.shutdown()
    }
    refs.flatMap(r => cache.get(r.path.toString))
  }

  // ---- manifest-level range pruning ----

  /** Decode a spec single-value-binary bound for `dt`. None = a type
    * this evaluator doesn't reason about (keep the manifest). */
  private def decodeBound(b: Array[Byte], dt: DataType): Option[Any] = {
    def le = java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    dt match {
      case IntegerType | DateType if b.length >= 4 => Some(le.getInt)
      case LongType | TimestampType | TimestampNTZType if b.length >= 8 =>
        Some(le.getLong)
      case FloatType if b.length >= 4 => Some(le.getFloat)
      case DoubleType if b.length >= 8 => Some(le.getDouble)
      case BooleanType if b.length >= 1 => Some(b(0) != 0)
      case StringType => Some(b) // compare as unsigned UTF-8 bytes
      case d: DecimalType =>
        Some(new java.math.BigDecimal(new java.math.BigInteger(b), d.scale))
      case _ => None
    }
  }

  /** Catalyst literal value (internal representation) → the decoded-
    * bound comparison domain. None = not comparable here. */
  private def litValue(v: Any, dt: DataType): Option[Any] = (v, dt) match {
    case (null, _) => None
    case (u: UTF8String, StringType) => Some(u.getBytes)
    case (i: Integer, IntegerType | DateType) => Some(i.intValue)
    case (l: java.lang.Long, LongType | TimestampType | TimestampNTZType) =>
      Some(l.longValue)
    case (f: java.lang.Float, FloatType) => Some(f.floatValue)
    case (x: java.lang.Double, DoubleType) => Some(x.doubleValue)
    case (b: java.lang.Boolean, BooleanType) => Some(b.booleanValue)
    case (d: org.apache.spark.sql.types.Decimal, _: DecimalType) =>
      Some(d.toJavaBigDecimal)
    case _ => None
  }

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Int, y: Int) => Some(Integer.compare(x, y))
    case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
    case (x: Float, y: Float) => Some(java.lang.Float.compare(x, y))
    case (x: Double, y: Double) => Some(java.lang.Double.compare(x, y))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) =>
      Some(x.compareTo(y))
    case (x: Array[Byte], y: Array[Byte]) =>
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = Integer.compare(x(i) & 0xff, y(i) & 0xff)
        if (c != 0) return Some(c)
        i += 1
      }
      Some(Integer.compare(x.length, y.length))
    case _ => None
  }

  private def fieldIdx(name: String): Int =
    partitionSchema.fieldNames.indexWhere(_.equalsIgnoreCase(name))

  /** Could ANY partition value in this manifest satisfy `e`? True on
    * anything this evaluator cannot disprove. */
  private def mightMatch(sums: Seq[IceFieldSummary], e: Expression): Boolean = {
    def range(a: Attribute): Option[(IceFieldSummary, DataType)] = {
      val i = fieldIdx(a.name)
      if (i < 0 || i >= sums.size) None
      else Some((sums(i), partitionSchema(i).dataType))
    }
    e match {
      case And(l, r) => mightMatch(sums, l) && mightMatch(sums, r)
      case Or(l, r) => mightMatch(sums, l) || mightMatch(sums, r)
      case EqualTo(a: Attribute, Literal(v, _)) => eqMatch(sums, a, v)
      case EqualTo(Literal(v, _), a: Attribute) => eqMatch(sums, a, v)
      case EqualNullSafe(a: Attribute, Literal(v, _)) =>
        if (v == null) range(a).forall(_._1.containsNull)
        else eqMatch(sums, a, v)
      case EqualNullSafe(Literal(v, _), a: Attribute) =>
        if (v == null) range(a).forall(_._1.containsNull)
        else eqMatch(sums, a, v)
      case In(a: Attribute, list) if list.forall(_.isInstanceOf[Literal]) =>
        list.exists { case Literal(v, _) => eqMatch(sums, a, v) }
      case InSet(a: Attribute, set) =>
        set.exists(v => eqMatch(sums, a, v))
      case GreaterThan(a: Attribute, Literal(v, _)) =>
        upperAbove(sums, a, v, strict = true)
      case GreaterThanOrEqual(a: Attribute, Literal(v, _)) =>
        upperAbove(sums, a, v, strict = false)
      case LessThan(a: Attribute, Literal(v, _)) =>
        lowerBelow(sums, a, v, strict = true)
      case LessThanOrEqual(a: Attribute, Literal(v, _)) =>
        lowerBelow(sums, a, v, strict = false)
      case GreaterThan(Literal(v, _), a: Attribute) =>
        lowerBelow(sums, a, v, strict = true)
      case GreaterThanOrEqual(Literal(v, _), a: Attribute) =>
        lowerBelow(sums, a, v, strict = false)
      case LessThan(Literal(v, _), a: Attribute) =>
        upperAbove(sums, a, v, strict = true)
      case LessThanOrEqual(Literal(v, _), a: Attribute) =>
        upperAbove(sums, a, v, strict = false)
      case IsNull(a: Attribute) =>
        val i = fieldIdx(a.name)
        i < 0 || i >= sums.size || sums(i).containsNull
      case IsNotNull(_) => true // bounds say nothing about all-null here
      case Not(inner) => !cannotMatchNegation(sums, inner)
      case _ => true // anything else: keep (conservative)
    }
  }

  /** For Not(x): prune only when x provably matches EVERY value of
    * the manifest — too strong to establish from min/max alone, so
    * always keep. (Kept as a hook; returning false = never prune.) */
  private def cannotMatchNegation(sums: Seq[IceFieldSummary],
      e: Expression): Boolean = false

  /** lit ∈ [lower, upper] (null value in range counts only via
    * explicit IsNull — equality with a non-null literal never matches
    * null rows). */
  private def eqMatch(sums: Seq[IceFieldSummary], a: Attribute,
      v: Any): Boolean = {
    if (v == null) return false // EqualTo(null) matches nothing
    val i = fieldIdx(a.name)
    if (i < 0 || i >= sums.size) return true
    val s = sums(i); val dt = partitionSchema(i).dataType
    litValue(v, dt).forall { lit =>
      val aboveLo = s.lower.flatMap(decodeBound(_, dt))
        .flatMap(lo => cmp(lit, lo)).forall(_ >= 0)
      val belowHi = s.upper.flatMap(decodeBound(_, dt))
        .flatMap(hi => cmp(lit, hi)).forall(_ <= 0)
      aboveLo && belowHi
    }
  }

  /** Some value of the range can be ABOVE lit (x > lit / x >= lit):
    * decided by the UPPER bound. */
  private def upperAbove(sums: Seq[IceFieldSummary], a: Attribute,
      v: Any, strict: Boolean): Boolean = {
    if (v == null) return false
    val i = fieldIdx(a.name)
    if (i < 0 || i >= sums.size) return true
    val s = sums(i); val dt = partitionSchema(i).dataType
    litValue(v, dt).forall { lit =>
      s.upper.flatMap(decodeBound(_, dt)).flatMap(hi => cmp(hi, lit))
        .forall(c => if (strict) c > 0 else c >= 0)
    }
  }

  /** Some value of the range can be BELOW lit: decided by LOWER. */
  private def lowerBelow(sums: Seq[IceFieldSummary], a: Attribute,
      v: Any, strict: Boolean): Boolean = {
    if (v == null) return false
    val i = fieldIdx(a.name)
    if (i < 0 || i >= sums.size) return true
    val s = sums(i); val dt = partitionSchema(i).dataType
    litValue(v, dt).forall { lit =>
      s.lower.flatMap(decodeBound(_, dt)).flatMap(lo => cmp(lo, lit))
        .forall(c => if (strict) c < 0 else c <= 0)
    }
  }

  // ---- FileIndex ----

  private def typedPartVal(raw: String, dt: DataType): Any =
    if (raw == null) null
    else Cast(Literal.create(raw, StringType), dt, Option(tz)).eval(null)

  private def dirsOf(files: Seq[MetaDataFile]): Seq[PartitionDirectory] =
    files.groupBy(_.partitionValues).toSeq
      .sortBy(_._1.toSeq.sortBy(_._1).mkString(","))
      .map { case (pv, fsOfPart) =>
        val values = InternalRow.fromSeq(partitionSchema.map(f =>
          typedPartVal(pv.getOrElse(f.name, null), f.dataType)))
        val statuses = fsOfPart.map { f =>
          new org.apache.hadoop.fs.FileStatus(math.max(f.size, 0L), false,
            1, 128L * 1024 * 1024, f.modificationTime, f.path)
        }.toArray
        PartitionDirectory(values, statuses)
      }

  override def rootPaths: Seq[Path] = Seq(root)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val surviving =
      if (partitionFilters.isEmpty || partitionSchema.isEmpty) manifests
      else manifests.filter { m =>
        m.summaries match {
          case Some(sums) =>
            try partitionFilters.forall(mightMatch(sums, _))
            catch { case scala.util.control.NonFatal(_) => true }
          case None => true // no summaries recorded: must open
        }
      }
    val dirs = dirsOf(parseAll(surviving))
    if (partitionFilters.isEmpty || partitionSchema.isEmpty) dirs
    else try {
      val bound = partitionFilters.reduce(And).transform {
        case a: AttributeReference =>
          val i = fieldIdx(a.name)
          require(i >= 0, s"unbound partition attribute ${a.name}")
          BoundReference(i, partitionSchema(i).dataType, nullable = true)
      }
      val pred = Predicate.createInterpreted(bound.asInstanceOf[Expression])
      pred.initialize(0)
      dirs.filter(d => pred.eval(d.values))
    } catch {
      case scala.util.control.NonFatal(_) => dirs
    }
  }

  override def inputFiles: Array[String] =
    parseAll(manifests).map(_.path.toString).toArray

  override def refresh(): Unit = cache.clear()

  override def sizeInBytes: Long = estSizeInBytes.getOrElse(
    math.max(1L, parseAll(manifests).map(f => math.max(f.size, 0L)).sum))
}
