package graft.plans

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedFunction, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, GreaterThanOrEqual, LessThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.analysis.{UnresolvedFieldName, UnresolvedIdentifier, UnresolvedTable}
import org.apache.spark.sql.catalyst.plans.logical.{AddCheckConstraint, AddColumns, AlterColumns, CreateTable, CreateTableAsSelect, DeleteFromTable, DescribeRelation, DropColumns, DropConstraint, InsertIntoStatement, Join, LogicalPlan, MergeIntoTable, RenameColumn, ReplaceTableAsSelect, SubqueryAlias, TableSpecBase, UnresolvedTableSpec, UpdateTable}
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL syntax extension: `ASOF JOIN`.
  *
  * ```sql
  * SELECT ... FROM events e
  * ASOF JOIN orders o
  *   ON e.user_id = o.o_custkey
  *  AND CAST(o.o_orderdate AS TIMESTAMP) <= e.ts
  * ```
  *
  * plans straight onto the native [[AsOfJoin]] operator. The delegate
  * (Spark's own parser) does all real parsing: `ASOF JOIN <rel> ON c`
  * is textually bridged to `JOIN <rel> ON __graft_asof() AND c`, and
  * the marked Join node is rewritten to [[AsOfJoin]] before analysis.
  * The ON clause must be one key equality plus one time bound with
  * the left (probe) side's time as the upper bound; the equality may
  * be written in either order (the planner fixes sides by reference).
  * Installed via `spark.sql.extensions=graft.functions.GraftExtensions`
  * (injectParser).
  */
class GraftSqlParser(delegate: ParserInterface)
  extends ParserInterface with PredicateHelper {

  // `ASOF JOIN t [TOLERANCE <n>] ON …` — the optional TOLERANCE
  // literal (time-column native units: micros for timestamps, days
  // for dates) rides through the marker function's argument
  private val asofPattern =
    "(?is)\\bASOF\\s+JOIN\\s+(.+?)\\s+(?:TOLERANCE\\s+(\\d+)\\s+)?ON\\s+".r
  private val Marker = "__graft_asof"

  private def preprocess(sqlText: String): String =
    asofPattern.replaceAllIn(sqlText, m => {
      val tol = Option(m.group(2)).getOrElse("")
      scala.util.matching.Regex.quoteReplacement(
        s"JOIN ${m.group(1)} ON $Marker($tol) AND ")
    })

  private def isMarker(e: Expression): Boolean = e match {
    case f: UnresolvedFunction =>
      f.nameParts.map(_.toLowerCase) == Seq(Marker)
    case _ => false
  }

  // The marker's argument is the TOLERANCE digits verbatim; beyond
  // Long range the delegate parses them as a Decimal literal, which
  // must still resolve or FAIL — silently dropping the user's
  // tolerance would unbounded the match window.
  private def markerTolerance(e: Expression): Option[Long] = e match {
    case f: UnresolvedFunction => f.arguments.headOption.map {
      case Literal(v: Int, _) => v.toLong
      case Literal(v: Long, _) => v
      case Literal(d: org.apache.spark.sql.types.Decimal, _)
          if d.toBigDecimal.isValidLong && d.toBigDecimal >= 0 =>
        d.toBigDecimal.toLongExact
      case other => throw new AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_3100",
        messageParameters = Map("message" ->
          ("ASOF JOIN TOLERANCE must be a non-negative integer that " +
            s"fits in a 64-bit long; got: ${other.sql}")))
    }
    case _ => None
  }

  private def rewriteAsOf(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case Join(l, r, Inner, Some(cond), _)
          if splitConjunctivePredicates(cond).exists(isMarker) =>
        val preds = splitConjunctivePredicates(cond).filterNot(isMarker)
        val tolerance = splitConjunctivePredicates(cond).find(isMarker)
          .flatMap(markerTolerance)
        val (eqs, rest) = preds.partition(_.isInstanceOf[EqualTo])
        val times = rest.collect {
          case LessThanOrEqual(rt, lt) => (lt, rt) // rightTime <= leftTime
          case GreaterThanOrEqual(lt, rt) => (lt, rt)
        }
        if (eqs.size != 1 || times.size != 1 || rest.size != 1) {
          throw new AnalysisException(
            errorClass = "_LEGACY_ERROR_TEMP_3100",
            messageParameters = Map("message" ->
              ("ASOF JOIN requires ON <key> = <key> AND <rightTime> <= " +
                s"<leftTime>; got: ${cond.sql}")))
        }
        val EqualTo(k1, k2) = eqs.head: @unchecked
        val (lt, rt) = times.head
        // direction resolves in the strategy (a side-swapped time bound
        // flips it to FORWARD); tolerance passes through here
        AsOfJoin(l, r, k1, k2, lt, rt, None, tolerance = tolerance)
    }

  /** DML statements targeting `graft.<root>` become [[GraftDml]]
    * commands over VersionedTable rewrites (top-level match only —
    * DML cannot nest, and a CTE-wrapped form should hit Spark's own
    * resolution error rather than lose its CTE definitions). */
  private def rewriteDml(plan: LogicalPlan): LogicalPlan = plan match {
    case DeleteFromTable(GraftDml.GraftTarget(root, alias), cond) =>
      GraftDeleteCommand(root, alias, GraftDml.Raw(cond))
    case UpdateTable(GraftDml.GraftTarget(root, alias), assigns, cond) =>
      GraftUpdateCommand(root, alias, GraftDml.Raw(assigns), GraftDml.Raw(cond))
    case MergeIntoTable(GraftDml.GraftTarget(root, _), source, cond,
        matched, notMatched, notMatchedBySource, schemaEvolution) =>
      GraftMergeCommand.from(root, source, cond, matched, notMatched,
        notMatchedBySource, schemaEvolution)
    case i @ InsertIntoStatement(GraftDml.GraftTarget(root, _), _, _,
        query, overwrite, _, byName) =>
      if (i.partitionSpec.nonEmpty || i.ifPartitionNotExists)
        GraftDml.fail("partitioned INSERT is not supported on graft " +
          "tables — cluster inside the query (Bucketing.*) instead")
      if (i.userSpecifiedCols.nonEmpty)
        GraftDml.fail("INSERT with a column list is not supported on " +
          "graft tables — use INSERT INTO ... BY NAME")
      GraftInsertCommand(root, query, overwrite, byName)
    // DDL: CTAS / CREATE OR REPLACE … AS SELECT / plain CREATE TABLE
    case CreateTableAsSelect(UnresolvedIdentifier(Seq(g, path), _), parts,
        query, spec, _, ifNotExists, _) if g.equalsIgnoreCase("graft") =>
      requireUnpartitioned(parts)
      val (st, bl) = indexProps(spec)
      GraftCtasCommand(path, query, ifNotExists, replace = false,
        orCreate = false, st, bl)
    case ReplaceTableAsSelect(UnresolvedIdentifier(Seq(g, path), _), parts,
        query, spec, _, orCreate, _) if g.equalsIgnoreCase("graft") =>
      requireUnpartitioned(parts)
      val (st, bl) = indexProps(spec)
      GraftCtasCommand(path, query, ifNotExists = false, replace = true,
        orCreate, st, bl)
    case CreateTable(UnresolvedIdentifier(Seq(g, path), _), cols, parts,
        spec, ifNotExists) if g.equalsIgnoreCase("graft") =>
      requireUnpartitioned(parts)
      val (st, bl) = indexProps(spec)
      GraftCreateTableCommand(path,
        GraftDml.Raw(StructType(cols.map(_.toV1Column))), ifNotExists, st, bl,
        checkConstraints(spec))
    // DDL: metadata-only ALTER TABLE schema evolution
    case AddColumns(GraftAlterTable(root), cols) =>
      val c = cols match {
        case Seq(one) => one
        case _ => GraftDml.fail(
          "graft ALTER TABLE supports one ADD COLUMN per statement")
      }
      if (c.position.nonEmpty || c.default.nonEmpty) GraftDml.fail(
        "ADD COLUMN position/default are not supported on graft tables")
      // a nested path (ADD COLUMN meta.codec) joins to the dotted
      // form the engine's struct-path rewriter takes
      val prefix = c.path.toSeq.flatMap {
        case UnresolvedFieldName(parts) => parts
        case other => GraftDml.fail(s"unsupported ADD COLUMN path: $other")
      }
      GraftAlterCommand(root, GraftAlterCommand.Add(
        (prefix :+ c.colName).mkString("."), c.dataType))
    case DropColumns(GraftAlterTable(root), cols, ifExists) =>
      val name = cols match {
        case Seq(UnresolvedFieldName(parts)) => parts.mkString(".")
        case _ => GraftDml.fail("graft ALTER TABLE supports one " +
          "DROP COLUMN per statement")
      }
      GraftAlterCommand(root, GraftAlterCommand.Drop(name, ifExists))
    case RenameColumn(GraftAlterTable(root),
        UnresolvedFieldName(parts), to) =>
      GraftAlterCommand(root, GraftAlterCommand.Rename(
        parts.mkString("."), to))
    case AlterColumns(GraftAlterTable(root), specs) =>
      val s = specs match {
        case Seq(one) => one
        case _ => GraftDml.fail(
          "graft ALTER TABLE supports one ALTER COLUMN per statement")
      }
      val name = s.column match {
        case UnresolvedFieldName(parts) => parts.mkString(".")
        case _ => GraftDml.fail(
          "graft ALTER COLUMN takes a (possibly nested) column name")
      }
      val dt = s.newDataType.getOrElse(GraftDml.fail(
        "graft ALTER COLUMN supports only TYPE widening " +
          "(int->long, float->double, ...)"))
      if (s.newNullability.nonEmpty || s.newComment.nonEmpty ||
          s.newPosition.nonEmpty || s.newDefaultExpression.nonEmpty)
        GraftDml.fail("graft ALTER COLUMN supports only TYPE widening")
      GraftAlterCommand(root, GraftAlterCommand.Widen(name, dt))
    // DESCRIBE over a graft root: logical schema + version/files/
    // constraints metadata section (standard 3-column output shape)
    case d @ DescribeRelation(child, _, _, out) =>
      child.collectFirst {
        case org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView(
            Seq(g, path), _, _) if g.equalsIgnoreCase("graft") => path
      } match {
        case Some(root) => GraftDescribeCommand(root, out)
        case None => d
      }
    // DDL: declarative CHECK constraints (enforced on every write).
    // The parser wraps ADD CONSTRAINT's target in a validation scan
    // (Filter(NOT cond, UnresolvedRelation)) — dig the relation out.
    case a @ AddCheckConstraint(child, cc) =>
      child.collectFirst {
        case UnresolvedRelation(Seq(g, path), _, _)
            if g.equalsIgnoreCase("graft") => path
      } match {
        case Some(root) => GraftAlterCommand(root,
          GraftAlterCommand.AddCheck(cc.name, cc.condition))
        case None => a
      }
    case DropConstraint(GraftAlterTable(root), name, ifExists, cascade) =>
      if (cascade) GraftDml.fail(
        "DROP CONSTRAINT ... CASCADE is not supported on graft tables")
      GraftAlterCommand(root, GraftAlterCommand.DropCheck(name, ifExists))
    case p => p
  }

  /** Matches an ALTER target `graft.<root>` (an UnresolvedTable). */
  private object GraftAlterTable {
    def unapply(plan: LogicalPlan): Option[String] = plan match {
      case UnresolvedTable(Seq(g, path), _, _)
          if g.equalsIgnoreCase("graft") => Some(path)
      case _ => None
    }
  }

  private def requireUnpartitioned(
      parts: Seq[org.apache.spark.sql.connector.expressions.Transform]): Unit =
    if (parts.nonEmpty) GraftDml.fail(
      "PARTITIONED BY is not supported on graft tables — cluster inside " +
        "the query (Bucketing.*) and index via TBLPROPERTIES " +
        "('graft.statsCols'/'graft.bloomCols') instead")

  /** Declared CHECK constraints of a CREATE/REPLACE statement; any
    * other constraint kind (PRIMARY KEY / FOREIGN KEY / UNIQUE) is
    * refused loudly — graft enforces only CHECK. */
  private def checkConstraints(
      spec: TableSpecBase): Seq[(String, String)] = spec match {
    case u: UnresolvedTableSpec => u.constraints.map {
      case c: org.apache.spark.sql.catalyst.expressions.CheckConstraint =>
        (c.name, c.condition)
      case other => GraftDml.fail("only CHECK constraints are supported " +
        s"on graft tables, got: ${other.getClass.getSimpleName}")
    }
    case _ => Nil
  }

  /** Data-skipping index columns from literal TBLPROPERTIES. */
  private def indexProps(spec: TableSpecBase): (Seq[String], Seq[String]) = {
    val props = spec match {
      case u: UnresolvedTableSpec => u.properties
      case t: org.apache.spark.sql.catalyst.plans.logical.TableSpec =>
        t.properties
      case _ => Map.empty[String, String]
    }
    def csv(k: String): Seq[String] = props.getOrElse(k, "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    (csv("graft.statsCols"), csv("graft.bloomCols"))
  }

  /** Read-position `graft.<root>` names resolve AT PARSE TIME to the
    * [[graft.sources.GraftDataSource]] relation — `SELECT * FROM
    * graft.`/data/t``, joins, CTEs. The parser is the seam because
    * Spark's SQL-on-files analyzer rule serves only FileFormat
    * providers and fails analysis BEFORE injected resolution rules
    * run. Only names whose path has a committed version rewrite
    * (anything else keeps Spark's normal resolution error). WRITE
    * targets — INSERT/DELETE/UPDATE/MERGE — are left alone so
    * [[rewriteDml]] (which runs after this) still sees them as
    * two-part names; their SOURCE sides (MERGE USING, INSERT's query)
    * DO rewrite here, which is what lets a graft table feed another
    * graft table's DML. */
  private def rewriteGraftReads(plan: LogicalPlan): LogicalPlan =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case None => plan
      case Some(spark) =>
        def bare(p: LogicalPlan): Seq[LogicalPlan] = p match {
          case SubqueryAlias(_, u: UnresolvedRelation) => Seq(u)
          case u: UnresolvedRelation => Seq(u)
          case _ => Nil
        }
        val writeTargets = plan.collect {
          case i: InsertIntoStatement => bare(i.table)
          case d: DeleteFromTable => bare(d.table)
          case u: UpdateTable => bare(u.table)
          case m: MergeIntoTable => bare(m.targetTable)
          // ADD CONSTRAINT wraps its target in a validation scan —
          // keep the two-part name so rewriteDml can claim the DDL
          case a: AddCheckConstraint =>
            a.child.collect { case u: UnresolvedRelation => u }
        }.flatten.toSet
        def committed(path: String): Boolean =
          scala.util.Try(graft.lakehouse.VersionedTable
            .currentVersion(spark, path)).toOption.flatten.nonEmpty
        def relation(path: String, opts: Map[String, String]) =
          org.apache.spark.sql.execution.datasources.LogicalRelation(
            new graft.sources.GraftDataSource().createRelation(
              spark.sqlContext, opts + ("path" -> path)),
            false)
        plan.transformUp {
          case u @ UnresolvedRelation(Seq(g, path), _, _)
              if g.equalsIgnoreCase("graft") && !writeTargets.contains(u) &&
                committed(path) =>
            relation(path, Map.empty)
          // SQL time travel: `VERSION AS OF <n | 'tag'>` resolves to
          // the versionAsOf/tag read options; `TIMESTAMP AS OF t`
          // picks the newest version committed at or before t (the
          // manifest's own mtime — its creation IS the commit)
          case org.apache.spark.sql.catalyst.analysis.RelationTimeTravel(
              UnresolvedRelation(Seq(g, path), _, _), ts, ver)
              if g.equalsIgnoreCase("graft") && committed(path) =>
            ver match {
              case Some(v) =>
                val key =
                  if (v.toLongOption.isDefined) "versionAsOf" else "tag"
                relation(path, Map(key -> v))
              case None =>
                val e = ts.getOrElse(GraftDml.fail(
                  "time travel needs VERSION AS OF or TIMESTAMP AS OF"))
                val micros = org.apache.spark.sql.catalyst.expressions.Cast(
                  e, org.apache.spark.sql.types.TimestampType,
                  Some(spark.conf.get("spark.sql.session.timeZone")))
                  .eval(null)
                if (micros == null) GraftDml.fail(
                  s"cannot evaluate TIMESTAMP AS OF ${e.sql}")
                val v = graft.lakehouse.VersionedTable.versionAsOfTimestamp(
                  spark, path, micros.asInstanceOf[Long] / 1000L)
                  .getOrElse(GraftDml.fail(
                    s"no retained version of $path at or before ${e.sql}"))
                relation(path, Map("versionAsOf" -> v.toString))
            }
        }
    }

  override def parsePlan(sqlText: String): LogicalPlan =
    rewriteDml(
      rewriteGraftReads(rewriteAsOf(delegate.parsePlan(preprocess(sqlText)))))

  override def parseQuery(sqlText: String): LogicalPlan =
    rewriteGraftReads(
      rewriteAsOf(delegate.parseQuery(preprocess(sqlText))))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)

  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)

  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)

  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)

  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)

  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)

  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
}
