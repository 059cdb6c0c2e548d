package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Cast, Expression, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{DataType, StringType, StructType}

/** One data file of a metadata-described table: absolute path, size
  * and mtime from the table's own log/manifest (no filesystem RPCs),
  * and the file's partition values in the format's STRING
  * serialization (null = null partition value). */
final case class MetaDataFile(path: Path, size: Long,
    modificationTime: Long, partitionValues: Map[String, String])

/** Log/manifest-backed [[FileIndex]] shared by the table-format
  * compatibility readers ([[DeltaCompat]], [[IcebergCompat]]): the
  * whole snapshot becomes ONE `HadoopFsRelation` whose
  * `PartitionDirectory` rows carry typed partition values (`Cast`
  * from the string serialization), so the PLAN is O(1) in partition
  * count and partition-column predicates prune file listings as
  * metadata work inside the single scan node — the same evaluation
  * Spark's own `PartitioningAwareFileIndex.prunePartitions` does. */
private[sources] final class MetaFileIndex(spark: SparkSession, root: Path,
    override val partitionSchema: StructType, files: Seq[MetaDataFile])
    extends FileIndex {
  private val tz = spark.sessionState.conf.sessionLocalTimeZone

  private def typedPartVal(raw: String, dt: DataType): Any =
    if (raw == null) null
    else Cast(Literal.create(raw, StringType), dt, Option(tz)).eval(null)

  private val dirs: Seq[PartitionDirectory] =
    files.groupBy(_.partitionValues).toSeq
      .sortBy(_._1.toSeq.sortBy(_._1).mkString(","))
      .map { case (pv, fsOfPart) =>
        val values = InternalRow.fromSeq(partitionSchema.map(f =>
          typedPartVal(pv.getOrElse(f.name, null), f.dataType)))
        val statuses = fsOfPart.map { f =>
          // size < 0 only on spec-violating metadata: one RPC fallback
          val len = if (f.size >= 0) f.size
            else f.path.getFileSystem(
              spark.sessionState.newHadoopConf())
              .getFileStatus(f.path).getLen
          new FileStatus(len, false, 1, 128L * 1024 * 1024,
            f.modificationTime, f.path)
        }.toArray
        PartitionDirectory(values, statuses)
      }

  override def rootPaths: Seq[Path] = Seq(root)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    if (partitionFilters.isEmpty || partitionSchema.isEmpty) dirs
    else try {
      val bound = partitionFilters.reduce(And).transform {
        case a: AttributeReference =>
          val i = partitionSchema.fieldNames.indexWhere(
            _.equalsIgnoreCase(a.name))
          require(i >= 0, s"unbound partition attribute ${a.name}")
          BoundReference(i, partitionSchema(i).dataType, nullable = true)
      }
      val pred = Predicate.createInterpreted(bound.asInstanceOf[Expression])
      pred.initialize(0)
      dirs.filter(d => pred.eval(d.values))
    } catch {
      // an un-evaluable pushed predicate (e.g. a runtime subquery
      // this index cannot bind) must never lose rows: fall back to
      // the full listing and let the scan's data filters handle it
      case scala.util.control.NonFatal(_) => dirs
    }
  }

  override def inputFiles: Array[String] =
    dirs.flatMap(_.files.map(_.getPath.toString)).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long =
    math.max(1L, files.map(f => math.max(f.size, 0L)).sum)
}
