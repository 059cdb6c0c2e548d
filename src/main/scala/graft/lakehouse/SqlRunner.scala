package graft.lakehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Ad-hoc SQL execution surface — the Spark-native form of the
  * reference's query API (`lib/commondb.py:80-123`: `execute_pd_query`
  * returns rows + elapsed seconds, `execute_ddl_query` runs DDL,
  * `execute_query` runs multi-statement scripts, `execute_callproc`
  * runs named server-side routines).
  *
  * Mapping:
  *  - result query + timing  → [[query]] (DataFrame + seconds)
  *  - DDL                    → [[ddl]] (views/tables through the
  *                             session catalog)
  *  - multi-statement script → [[script]] (split on `;`, run in
  *                             order, last result returned)
  *  - stored procedure       → [[callProc]] over a registry of named
  *                             Scala procedures (Spark has no
  *                             server-side procs; a named function
  *                             over DataFrames is the idiomatic
  *                             equivalent)
  *
  * Timing is wall-clock to ACTION completion, not plan construction —
  * lazy evaluation would otherwise report 0s for everything.
  */
object SqlRunner {

  /** Register the driver-provided parquet tables as temp views so
    * ad-hoc SQL can reference them by name. Routed through the typed
    * per-table loaders (events needs the nanos-timestamp handling). */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    Tables.region(spark, dir).createOrReplaceTempView("region")
    Tables.nation(spark, dir).createOrReplaceTempView("nation")
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.supplier(spark, dir).createOrReplaceTempView("supplier")
    Tables.part(spark, dir).createOrReplaceTempView("part")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    Tables.events(spark, dir).createOrReplaceTempView("events")
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
  }

  /** Run one SELECT; returns the materialized result and elapsed
    * seconds (rounded to 0.1s like the reference). */
  def query(spark: SparkSession, sql: String): (DataFrame, Double) = {
    val t0 = System.nanoTime()
    val df = spark.sql(sql)
    df.collect() // time to completion, mirroring cursor.execute+fetchall
    (df, roundSec(t0))
  }

  /** Run one DDL/DML statement; returns elapsed seconds. */
  def ddl(spark: SparkSession, sql: String): Double = {
    val t0 = System.nanoTime()
    spark.sql(sql).collect()
    roundSec(t0)
  }

  /** Run a `;`-separated multi-statement script in order; returns the
    * last statement's result (if any) and total elapsed seconds. */
  def script(spark: SparkSession, sql: String): (Option[DataFrame], Double) = {
    val t0 = System.nanoTime()
    val stmts = sql.split(";").map(_.trim).filter(_.nonEmpty)
    val last = stmts.foldLeft(Option.empty[DataFrame]) { (_, stmt) =>
      val df = spark.sql(stmt)
      df.collect()
      Some(df)
    }
    (last, roundSec(t0))
  }

  /** Named-procedure registry (the `callproc` equivalent): procedures
    * are Scala functions (SparkSession, args) => DataFrame registered
    * by name. */
  private val procs =
    scala.collection.concurrent.TrieMap.empty[String, (SparkSession, Seq[String]) => DataFrame]

  def registerProc(name: String)(
      fn: (SparkSession, Seq[String]) => DataFrame): Unit =
    procs.put(name, fn)

  def callProc(spark: SparkSession, name: String,
      args: Seq[String]): (DataFrame, Double) = {
    val fn = procs.getOrElse(name,
      throw new NoSuchElementException(s"no procedure named $name"))
    val t0 = System.nanoTime()
    val df = fn(spark, args)
    df.collect()
    (df, roundSec(t0))
  }

  private def oneRow(spark: SparkSession, names: Seq[String],
      values: Seq[Any]): DataFrame = {
    import org.apache.spark.sql.{Row => R}
    import org.apache.spark.sql.types._
    val fields = names.zip(values).map {
      case (n, _: Long) => StructField(n, LongType)
      case (n, _: Int) => StructField(n, IntegerType)
      case (n, _: Boolean) => StructField(n, BooleanType)
      case (n, _) => StructField(n, StringType)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(R(values: _*)), 1),
      StructType(fields))
  }

  // Built-in MAINTENANCE procedures — the SQL-ops surface of the
  // versioned lakehouse, so an operator can drive snapshots, rollback,
  // vacuum and compaction from a SQL console without touching Scala:
  //   CALL-style: SqlRunner.callProc(spark, "graft_tag", Seq(root, name))
  registerProc("graft_tag") { (s, a) =>
    require(a.size >= 2, "graft_tag(root, name[, version])")
    val v = VersionedTable.tag(s, a(0), a(1),
      version = a.lift(2).map(_.toLong), replace = true)
    oneRow(s, Seq("tag", "version"), Seq(a(1), v))
  }
  registerProc("graft_drop_tag") { (s, a) =>
    require(a.size == 2, "graft_drop_tag(root, name)")
    oneRow(s, Seq("tag", "existed"),
      Seq(a(1), VersionedTable.dropTag(s, a(0), a(1))))
  }
  registerProc("graft_rollback") { (s, a) =>
    require(a.size >= 2 && a.size <= 3,
      "graft_rollback(root, versionOrTag[, keepVersions])")
    val keep = a.lift(2).map(_.toInt).getOrElse(1)
    val v = a(1).toLongOption match {
      case Some(n) => VersionedTable.rollback(s, a(0), n, keep)
      case None => VersionedTable.rollbackTo(s, a(0), a(1), keep)
    }
    oneRow(s, Seq("new_version"), Seq(v))
  }
  registerProc("graft_vacuum") { (s, a) =>
    require(a.size == 2, "graft_vacuum(root, olderThanMs)")
    val deleted = VersionedTable.vacuum(s, a(0), a(1).toLong)
    oneRow(s, Seq("deleted"), Seq(deleted.size.toLong))
  }
  // the reference's core loop — poll a drop dir, load fresh files,
  // record every attempt (check_lakehouse.py:139-160 drives it from
  // SQL stored procedures) — callable from the SQL console: one
  // registry-deduped incremental load pass, schema given as DDL.
  // `optimistic = true` routes appends through the multi-writer
  // rebase path (appendDeltaOptimistic) on delta tables.
  registerProc("graft_load") { (s, a) =>
    require(a.size >= 4 && a.size <= 6,
      "graft_load(srcDir, tableDir, registryDir, schemaDdl" +
        "[, format[, optimistic]])")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(a(3))
    val r = IncrementalLoader.run(s, a(0), a(1), a(2), schema,
      format = a.lift(4).getOrElse("csv"),
      optimistic = a.lift(5).exists(_.toBoolean))
    oneRow(s, Seq("loaded", "skipped", "failed", "quarantined"),
      Seq(r.loaded.size.toLong, r.skipped.size.toLong,
        r.failed.size.toLong, r.quarantined.size.toLong))
  }
  // write–audit–publish branch lifecycle from the SQL console
  registerProc("graft_create_branch") { (s, a) =>
    require(a.size == 2, "graft_create_branch(root, name)")
    oneRow(s, Seq("branch", "base_version"),
      Seq(a(1), VersionedTable.createBranch(s, a(0), a(1))))
  }
  registerProc("graft_publish_branch") { (s, a) =>
    require(a.size >= 2 && a.size <= 3,
      "graft_publish_branch(root, name[, force])")
    val v = VersionedTable.publishBranch(s, a(0), a(1),
      force = a.lift(2).exists(_.toBoolean))
    oneRow(s, Seq("branch", "new_version"), Seq(a(1), v))
  }
  registerProc("graft_drop_branch") { (s, a) =>
    require(a.size == 2, "graft_drop_branch(root, name)")
    oneRow(s, Seq("branch", "existed"),
      Seq(a(1), VersionedTable.dropBranch(s, a(0), a(1))))
  }
  registerProc("graft_retrieval_compact") { (s, a) =>
    require(a.size == 1, "graft_retrieval_compact(root)")
    val did = RetrievalView.compact(s, a(0))
    val vacuumed = if (did) RetrievalView.vacuumCompacted(s, a(0)) else 0
    oneRow(s, Seq("compacted", "vacuumed"), Seq(did, vacuumed.toLong))
  }
  // retroactive curation from the console: remove docs from the
  // maintained BM25 index with exact stat retraction (ids CSV; longs
  // when all-numeric, else strings — matching the folded id type)
  registerProc("graft_retrieval_remove") { (s, a) =>
    require(a.size == 3, "graft_retrieval_remove(root, idsCsv, batchId)")
    import s.implicits._
    val raw = a(1).split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    require(raw.nonEmpty, "graft_retrieval_remove: empty id list")
    val ids =
      if (raw.forall(_.toLongOption.isDefined))
        raw.map(_.toLong).toDF("doc_id")
      else raw.toDF("doc_id")
    val folded = RetrievalView.remove(s, a(0), ids, a(2).toLong)
    oneRow(s, Seq("folded", "ids"), Seq(folded, raw.size.toLong))
  }
  // re-fit the ANN index's geometry on what it serves today and flip
  // the new generation live atomically — sourceRoot is the
  // full-precision vector table (a graft root or a plain parquet
  // dir); the index's own recorded _params supply k/m/layout
  registerProc("graft_ann_retrain") { (s, a) =>
    require(a.size >= 2 && a.size <= 3,
      "graft_ann_retrain(indexPath, sourceRoot[, vacuumOld])")
    val src =
      if (VersionedTable.currentVersion(s, a(1)).isDefined)
        VersionedTable.read(s, a(1))
      else s.read.parquet(a(1))
    val gen = graft.operators.VectorIndex.retrainAuto(s, a(0), src)
    val vac =
      if (a.lift(2).forall(_.toBoolean))
        graft.operators.VectorIndex.vacuumGenerations(s, a(0))
      else 0L
    oneRow(s, Seq("generation", "vacuumed_roots"), Seq(gen, vac))
  }
  registerProc("graft_sync_agg") { (s, a) =>
    require(a.size == 4,
      "graft_sync_agg(srcRoot, viewRoot, keysCsv, sumsCsv)")
    val spec = MaterializedAgg.Spec(
      a(2).split(",").toSeq.filter(_.nonEmpty),
      a(3).split(",").toSeq.filter(_.nonEmpty))
    val r = CdcAggView.sync(s, a(0), a(1), spec)
    oneRow(s, Seq("from_version", "to_version"),
      Seq(r.map(_._1).getOrElse(-1L), r.map(_._2).getOrElse(-1L)))
  }
  registerProc("graft_resolve_deletes") { (s, a) =>
    require(a.nonEmpty && a.size <= 2,
      "graft_resolve_deletes(root[, keepVersions])")
    val n = VersionedTable.resolveEqualityDeletes(s, a(0),
      keepVersions = a.lift(1).map(_.toInt).getOrElse(1))
    oneRow(s, Seq("converted"), Seq(n))
  }
  // On-demand DATA-QUALITY audit from the console: a compact check
  // spec ("not_null:a,b;unique:k;in_range:v,0,100;in_set:s,x,y;
  // min_rows:10;max_null_frac:v,0.1") compiles to DataQuality's
  // single-pass aggregate over the table's CURRENT version — one row
  // per violation (empty = clean), so an operator can gate a manual
  // promote/rollback decision without any Scala.
  registerProc("graft_audit") { (s, a) =>
    require(a.size == 2, "graft_audit(root, checkSpec)")
    // mini-grammar: ';' separates checks, ',' separates args; a
    // LITERAL ';' or ',' inside an in_set value escapes as '\;' /
    // '\,'. Every parse failure names the offending spec — a raw
    // NumberFormatException out of a 6-check string is undebuggable.
    def unesc(x: String) = x.replace("\\;", ";").replace("\\,", ",")
    val checks = a(1).split("(?<!\\\\);").toSeq.map(_.trim)
      .filter(_.nonEmpty).map { spec =>
        try {
          val (kind, rest) = spec.span(_ != ':')
          val args = rest.stripPrefix(":").split("(?<!\\\\),").toSeq
            .map(x => unesc(x.trim)).filter(_.nonEmpty)
          kind.trim match {
            case "not_null" => DataQuality.NotNull(args)
            case "unique" => DataQuality.Unique(args)
            case "in_range" =>
              require(args.size == 3, s"in_range:col,lo,hi — got $spec")
              DataQuality.InRange(args(0), args(1).toDouble, args(2).toDouble)
            case "in_set" =>
              require(args.size >= 2, s"in_set:col,v1[,v2…] — got $spec")
              DataQuality.InSet(args.head, args.tail)
            case "min_rows" => DataQuality.MinRows(args.head.toLong)
            case "max_null_frac" =>
              require(args.size == 2, s"max_null_frac:col,frac — got $spec")
              DataQuality.MaxNullFraction(args(0), args(1).toDouble)
            case other =>
              throw new IllegalArgumentException(s"unknown check: $other")
          }
        } catch {
          case e: IllegalArgumentException
              if e.getMessage != null && e.getMessage.contains(spec) =>
            throw e // already names the spec
          case e @ (_: NumberFormatException | _: RuntimeException) =>
            throw new IllegalArgumentException(
              s"bad check spec `$spec`: ${e.getMessage}", e)
        }
      }
    val bad = DataQuality.violations(VersionedTable.read(s, a(0)), checks)
    import s.implicits._
    bad.toDF("violation")
  }

  registerProc("graft_purge_deletes") { (s, a) =>
    require(a.nonEmpty && a.size <= 2,
      "graft_purge_deletes(root[, keepVersions])")
    val n = Maintenance.purgeDeletes(s, a(0),
      keepVersions = a.lift(1).map(_.toInt).getOrElse(1))
    oneRow(s, Seq("rewritten"), Seq(n.toLong))
  }
  registerProc("graft_compact") { (s, a) =>
    require(a.nonEmpty && a.size <= 3,
      "graft_compact(root[, smallFileBytes[, sortCol]])")
    val (packed, written) = Maintenance.compactSmallFiles(s, a(0),
      smallFileBytes = a.lift(1).map(_.toLong).getOrElse(32L << 20),
      sortCol = a.lift(2))
    oneRow(s, Seq("packed", "written"),
      Seq(packed.toLong, written.toLong))
  }

  private def roundSec(t0: Long): Double =
    math.round((System.nanoTime() - t0) / 1e8) / 10.0
}
