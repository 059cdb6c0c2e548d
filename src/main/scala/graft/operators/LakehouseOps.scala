package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Exact._

/** Query-shaped lakehouse-maintenance semantics — the relational core
  * of the reference's incremental-refresh loop
  * (`check_lakehouse.py:100-160`): change-data compaction (latest
  * version per key), MERGE/upsert application, and data-quality
  * profiling of a freshly loaded table.
  *
  * The stateful file-level counterparts (registry, retention,
  * compaction, streaming refresh) live in `graft.lakehouse`.
  */
object LakehouseOps {

  type QFn = (SparkSession, String) => DataFrame

  /** CDC compaction: keep only the latest record per key. This is the
    * read-side of every merge-on-read lakehouse table; row_number with
    * a total order (ts desc, event_id desc) keeps it deterministic.
    * At 100 TB this is one shuffle on the key — no sort of the whole
    * table, just per-key top-1. */
  private val q21: QFn = (s, d) => {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
        col("event_type"), col("value"))
  }
  private val q21Sql =
    """SELECT user_id, event_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
      |  event_type, value
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |        ORDER BY ts DESC, event_id DESC) AS rn FROM events) t
      |WHERE rn = 1""".stripMargin

  /** MERGE/upsert semantics (the Spark-native `heatwave_load` refresh,
    * check_lakehouse.py:139-160): apply a change-set of per-customer
    * balance deltas onto the customer snapshot. Left join + coalesce =
    * matched-update; unmatched targets pass through. The change-set
    * side is an aggregate (small) → broadcast; the snapshot is never
    * re-shuffled. */
  private val q22: QFn = (s, d) => {
    val c = Tables.customer(s, d)
    val delta = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      .groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice") * 0.0001).as("delta"))
    c.join(broadcast(delta), col("c_custkey") === col("o_custkey"), "left")
      .select(
        col("c_custkey"),
        col("c_acctbal").as("old_bal"),
        (col("c_acctbal") + coalesce(col("delta"), lit(0.0))).as("new_bal"),
        col("delta").isNotNull.as("updated"))
  }
  private val q22Sql =
    s"""SELECT c_custkey, c_acctbal AS old_bal,
       |  c_acctbal + COALESCE(delta, 0.0) AS new_bal,
       |  delta IS NOT NULL AS updated
       |FROM customer
       |LEFT JOIN (SELECT o_custkey, ${sqlSum("o_totalprice * 0.0001")} AS delta
       |           FROM orders
       |           WHERE o_orderdate >= TIMESTAMP '1997-01-01'
       |           GROUP BY o_custkey) ch ON c_custkey = o_custkey""".stripMargin

  /** Post-load data-quality profile: the validation a lakehouse
    * refresh runs before marking a load `is_apply=1` in the registry
    * (check_lakehouse.py:113-118). Single-pass aggregation. */
  private val q23: QFn = (s, d) => {
    Tables.orders(s, d).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("n_null_custkey"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("n_nonpositive_price"),
      countDistinct(col("o_orderstatus")).as("n_status"),
      min(col("o_totalprice")).as("min_price"),
      max(col("o_totalprice")).as("max_price"),
      date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("min_date"),
      date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("max_date"))
  }
  private val q23Sql =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_custkey,
      |  CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonpositive_price,
      |  COUNT(DISTINCT o_orderstatus) AS n_status,
      |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
      |  strftime(MIN(o_orderdate), '%Y-%m-%d') AS min_date,
      |  strftime(MAX(o_orderdate), '%Y-%m-%d') AS max_date
      |FROM orders""".stripMargin

  /** AS-OF join: for each event, the most recent order of the same
    * key at-or-before the event time. Spark has no native as-of join;
    * the composition is a range join + per-left-row top-1
    * (row_number with a total order). At scale the range join shuffles
    * on the equi-key and AQE handles the skew; the window shares the
    * same partitioning. */
  private val q24: QFn = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"))
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    val w = Window.partitionBy("event_id")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    ev.join(o, col("o_custkey") === col("user_id") &&
        col("o_orderdate") <= col("ts"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
        col("o_orderkey").as("asof_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("asof_orderdate"))
  }
  private val q24Sql =
    """SELECT event_id, user_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
      |  o_orderkey AS asof_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS asof_orderdate
      |FROM (
      |  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
      |    ROW_NUMBER() OVER (PARTITION BY e.event_id
      |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |  FROM events e
      |  LEFT JOIN orders o ON o.o_custkey = e.user_id
      |                    AND o.o_orderdate <= e.ts) t
      |WHERE rn = 1""".stripMargin

  /** The same AS-OF join through the native Catalyst operator
    * (graft.plans.AsOfJoin): one streaming merge per partition instead
    * of materializing every (event, earlier-order) pair and window-
    * discarding all but one. Output is identical to q24 → shares its
    * oracle. */
  private val q48: QFn = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"))
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    graft.plans.AsOf.join(ev, o,
        col("user_id"), col("o_custkey"), col("ts"),
        // orders carries TIMESTAMP_NTZ; the UTC session makes the
        // cast to the events side's TIMESTAMP an identity
        col("o_orderdate").cast("timestamp"),
        tiebreak = Some(col("o_orderkey")))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
        col("o_orderkey").as("asof_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("asof_orderdate"))
  }

  /** q191: SCD-2 RANGE RECONSTRUCTION — collapse each user's event
    * stream into TYPE-RUN validity ranges (effective_from = run
    * start, effective_to = next run's start, NULL = current) and
    * profile them: the slowly-changing-dimension history a CDC
    * mirror materializes, rebuilt from the raw change log (the
    * dimension-versioning complement to q21's latest-per-key
    * compaction). Scale shape: run boundaries are one lag + one
    * conditional prefix count per user (user-PARTITIONED windows —
    * partition-parallel at any user count), ranges are a
    * (user, run) aggregate with map-side partials, the profile is a
    * tiny per-type rollup; durations are exact microsecond integers.
    * Exact, hash-checked. */
  private val q191: QFn = (s, d) => {
    val w = Window.partitionBy("user_id")
      .orderBy(col("us").asc, col("event_id").asc)
    val marked = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull ||
          lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("run", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ranges = marked.groupBy("user_id", "run")
      // all types inside a run are equal by construction; min is the
      // aggregate both engines compute identically
      .agg(min(col("event_type")).as("event_type"),
        min(col("us")).as("from_us"),
        count(lit(1)).as("n_events"))
    val w2 = Window.partitionBy("user_id").orderBy(col("run"))
    val withTo = ranges
      .withColumn("to_us", lead(col("from_us"), 1).over(w2))
    withTo.groupBy("event_type")
      .agg(count(lit(1)).as("n_ranges"),
        sum(col("n_events")).as("n_events"),
        count(when(col("to_us").isNull, 1)).as("n_open"),
        sum(when(col("to_us").isNotNull,
          col("to_us") - col("from_us"))).as("closed_dur_us"))
  }
  private val q191Sql =
    """WITH marked AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
      |    CASE WHEN LAG(event_type) OVER w IS NULL
      |      OR LAG(event_type) OVER w <> event_type
      |      THEN 1 ELSE 0 END AS chg
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |runs AS (
      |  SELECT *, SUM(chg) OVER (PARTITION BY user_id
      |    ORDER BY us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      |  FROM marked),
      |ranges AS (
      |  SELECT user_id, run, MIN(event_type) AS event_type,
      |    MIN(us) AS from_us, CAST(COUNT(*) AS BIGINT) AS n_events
      |  FROM runs GROUP BY 1, 2),
      |witho AS (
      |  SELECT *, LEAD(from_us) OVER (PARTITION BY user_id
      |    ORDER BY run) AS to_us
      |  FROM ranges)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_ranges,
      |  CAST(SUM(n_events) AS BIGINT) AS n_events,
      |  CAST(COUNT(CASE WHEN to_us IS NULL THEN 1 END) AS BIGINT)
      |    AS n_open,
      |  CAST(SUM(CASE WHEN to_us IS NOT NULL
      |    THEN to_us - from_us END) AS BIGINT) AS closed_dur_us
      |FROM witho GROUP BY 1""".stripMargin

  /** q243: FORWARD as-of join WITH TOLERANCE through the native
    * streaming-merge operator (round 9 — the pandas `merge_asof`
    * direction/tolerance surface): for every event, the customer's
    * NEXT order at-or-after the event, but only within 60 days —
    * "did this engagement convert, and to which order?" — the
    * attribution twin of q48's backward "state as of". Same O(n+m)
    * merge, one exchange per side, ONE peeked right row of state;
    * the oracle is the composable window form (LEFT range join +
    * row_number), so the hash pins direction, tiebreak (smallest
    * (date, orderkey)), tolerance cutoff, and null extension. */
  private val q243: QFn = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"))
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    val tolMicros = 60L * 86400L * 1000000L // 60 days
    graft.plans.AsOf.join(ev, o,
        col("user_id"), col("o_custkey"), col("ts"),
        col("o_orderdate").cast("timestamp"),
        tiebreak = Some(col("o_orderkey")),
        forward = true, tolerance = Some(tolMicros))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
        col("o_orderkey").as("next_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("next_orderdate"))
  }
  private val q243Sql =
    """SELECT event_id, user_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
      |  o_orderkey AS next_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS next_orderdate
      |FROM (
      |  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
      |    ROW_NUMBER() OVER (PARTITION BY e.event_id
      |      ORDER BY o.o_orderdate ASC, o.o_orderkey ASC) AS rn
      |  FROM events e LEFT JOIN orders o
      |    ON o.o_custkey = e.user_id
      |    AND CAST(o.o_orderdate AS TIMESTAMP) >= e.ts
      |    AND epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) - epoch_us(e.ts)
      |      <= 5184000000000
      |) t WHERE rn = 1""".stripMargin

  /** q264: NEAREST as-of join — for each event, the customer's order
    * CLOSEST in time in EITHER direction, ties to the backward side
    * (pandas merge_asof direction='nearest', completing the
    * backward/forward/tolerance surface of q24/q48/q243). COMPOSED
    * from two native streaming-merge as-of joins (backward + forward,
    * each O(n+m) with one peeked row of state) and a row-wise argmin
    * — no new physical operator, no |events|×|orders| pair
    * materialization; the two merges share the events exchange. The
    * oracle is the window form over the full left join, so the hash
    * pins distance, the backward tie rule, each side's key tiebreak
    * (backward largest, forward smallest — the q24/q243 conventions),
    * and null extension. */
  private val q264: QFn = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"))
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    val back = graft.plans.AsOf.join(ev, o,
        col("user_id"), col("o_custkey"), col("ts"),
        col("o_orderdate").cast("timestamp"),
        tiebreak = Some(col("o_orderkey")))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("o_orderkey").as("b_key"),
        col("o_orderdate").cast("timestamp").as("b_ts"))
    val fwd = graft.plans.AsOf.join(ev, o,
        col("user_id"), col("o_custkey"), col("ts"),
        col("o_orderdate").cast("timestamp"),
        tiebreak = Some(col("o_orderkey")), forward = true)
      .select(col("event_id").as("f_event_id"),
        col("o_orderkey").as("f_key"),
        col("o_orderdate").cast("timestamp").as("f_ts"))
    val bd = unix_micros(col("ts")) - unix_micros(col("b_ts"))
    val fd = unix_micros(col("f_ts")) - unix_micros(col("ts"))
    val useB = col("f_key").isNull ||
      (col("b_key").isNotNull && bd <= fd)
    back.join(fwd, col("event_id") === col("f_event_id"))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
        when(useB, col("b_key")).otherwise(col("f_key"))
          .as("nearest_orderkey"),
        date_format(when(useB, col("b_ts")).otherwise(col("f_ts")),
          "yyyy-MM-dd").as("nearest_orderdate"),
        when(col("b_key").isNull && col("f_key").isNull,
            lit(null).cast("string"))
          .when(useB, lit("backward")).otherwise(lit("forward"))
          .as("direction"))
  }
  private val q264Sql =
    """SELECT event_id, user_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
      |  o_orderkey AS nearest_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS nearest_orderdate,
      |  CASE WHEN o_orderkey IS NULL THEN NULL
      |       WHEN CAST(o_orderdate AS TIMESTAMP) > ts THEN 'forward'
      |       ELSE 'backward' END AS direction
      |FROM (
      |  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
      |    ROW_NUMBER() OVER (PARTITION BY e.event_id ORDER BY
      |      abs(epoch_us(CAST(o.o_orderdate AS TIMESTAMP))
      |        - epoch_us(e.ts)) ASC,
      |      CASE WHEN CAST(o.o_orderdate AS TIMESTAMP) > e.ts
      |        THEN 1 ELSE 0 END ASC,
      |      CASE WHEN CAST(o.o_orderdate AS TIMESTAMP) > e.ts
      |        THEN o.o_orderkey ELSE -o.o_orderkey END ASC) AS rn
      |  FROM events e LEFT JOIN orders o ON o.o_custkey = e.user_id) t
      |WHERE rn = 1""".stripMargin

  /** q269: DELTA-LAKE ROUND TRIP on real data — materialize a slice
    * of lineitem as a protocol-valid Delta table (Spark parquet files
    * partitioned by return flag + a hand-built v0 `_delta_log`), read
    * it back through `sources.DeltaCompat` (the published-protocol
    * JSON-log replay, partition values re-attached from the log), and
    * aggregate; the oracle computes the same aggregate straight from
    * the source parquet. Hash-green ⇔ the Delta reader loses nothing:
    * file enumeration, partition reattachment, and schema all exact.
    * The fixture writes once per (sf, slice-version) under /tmp and
    * re-reads on later runs — the read path is what the query times. */
  /** Fixture cache key: MD5 of the source-dir path PLUS a content
    * fingerprint of the lineitem parquet files (name:len:mtime) — a
    * regenerated dataset at the same path gets a fresh fixture
    * instead of silently reusing the stale slice (r11 ADVICE item:
    * the path-only key turned dataset regeneration into a confusing
    * false gate failure). */
  private def deltaFixtureKey(s: SparkSession, d: String): String = {
    val src = new org.apache.hadoop.fs.Path(s"$d/lineitem.parquet")
    val fs = src.getFileSystem(s.sessionState.newHadoopConf())
    val sig = fs.listStatus(src).filter(_.isFile)
      .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .sorted.mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d|$sig".getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def deltaSlice(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_quantity") < 10)
      .select("l_orderkey", "l_quantity", "l_extendedprice",
        "l_returnflag")

  private val q269: QFn = (s, d) => {
    val dir = "/tmp/graft_delta_rt_v2_" + deltaFixtureKey(s, d)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      s.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir, "_delta_log")))
      graft.sources.DeltaCompat.writeTable(deltaSlice(s, d), dir,
        partitionBy = Seq("l_returnflag"))
    graft.sources.DeltaCompat.read(s, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("revenue"),
        dsum(col("l_quantity")).as("qty"))
  }
  private val q269Sql =
    s"""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
      |  ${sqlSum("l_extendedprice")} AS revenue,
      |  ${sqlSum("l_quantity")} AS qty
      |FROM lineitem WHERE l_quantity < 10
      |GROUP BY l_returnflag""".stripMargin

  /** q272: DELTA CHECKPOINT-TRUNCATED READ on real data (r11 verdict
    * item 1) — the fixture is what a MATURE Delta table looks like
    * after log cleanup: a classic checkpoint parquet + only the JSON
    * commits after it (the version-0 JSON is deleted). Version 1 is a
    * hand-written commit that `remove`s every file of the
    * `l_returnflag = 'R'` partition, so a hash-green result proves
    * the full chain: `_last_checkpoint` discovery → checkpoint-parquet
    * state reconstruction → JSON replay (removes) on top of it. The
    * oracle computes the same aggregate from the source parquet with
    * the 'R' slice excluded. */
  private val q272: QFn = (s, d) => {
    val dir = "/tmp/graft_delta_cp_v1_" + deltaFixtureKey(s, d)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    val logDir = new org.apache.hadoop.fs.Path(dir, "_delta_log")
    if (!fs.exists(new org.apache.hadoop.fs.Path(logDir, "_last_checkpoint"))) {
      graft.sources.DeltaCompat.writeTable(deltaSlice(s, d), dir,
        partitionBy = Seq("l_returnflag"))
      // v1: tombstone the 'R' partition (paths are writeTable's own
      // URI-encoded ASCII — safe to interpolate into JSON verbatim)
      val snap = graft.sources.DeltaCompat.snapshot(s, dir)
      val lines = snap.files
        .filter(_.partitionValues.get("l_returnflag").contains("R"))
        .map(f => s"""{"remove":{"path":"${f.path}",""" +
          """"deletionTimestamp":1,"dataChange":true}}""")
      require(lines.nonEmpty, s"fixture $dir has no 'R' partition files")
      val out = fs.create(
        new org.apache.hadoop.fs.Path(logDir, f"${1L}%020d.json"), true)
      try out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
      finally out.close()
      // checkpoint version 0, then truncate its JSON — log cleanup
      graft.sources.DeltaCompat.checkpoint(s, dir, Some(0L))
      fs.delete(
        new org.apache.hadoop.fs.Path(logDir, f"${0L}%020d.json"), false)
    }
    graft.sources.DeltaCompat.read(s, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("revenue"),
        dsum(col("l_quantity")).as("qty"))
  }
  private val q272Sql =
    s"""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
      |  ${sqlSum("l_extendedprice")} AS revenue,
      |  ${sqlSum("l_quantity")} AS qty
      |FROM lineitem WHERE l_quantity < 10 AND l_returnflag <> 'R'
      |GROUP BY l_returnflag""".stripMargin

  /** q273: ICEBERG ROUND TRIP on real data (round 12 — the r11
    * "missing 3" interop stretch): materialize a lineitem slice as a
    * spec-valid Iceberg table (`IcebergCompat.writeTable` — parquet
    * data + Avro manifest/manifest-list + metadata.json +
    * version-hint), read it back through the manifest-backed
    * single-relation reader, and aggregate; the oracle computes the
    * same aggregate from the source parquet. Hash-green ⇔ metadata
    * resolution, manifest parsing, identity-partition reattachment,
    * and schema are all exact. */
  private val q273: QFn = (s, d) => {
    val dir = "/tmp/graft_ice_rt_v3_" + deltaFixtureKey(s, d)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      s.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(
        dir, "metadata/version-hint.text")))
      graft.sources.IcebergCompat.writeTable(deltaSlice(s, d), dir,
        partitionBy = Seq("l_returnflag"))
    graft.sources.IcebergCompat.read(s, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("revenue"),
        dsum(col("l_quantity")).as("qty"))
  }
  private val q273Sql = q269Sql

  /** q274: ICEBERG v2 MERGE-ON-READ on real data — the fixture is a
    * MoR table: base snapshot of the slice, then a POSITIONAL-delete
    * snapshot removing every `l_returnflag = 'R'` row
    * (`IcebergCompat.deletePositional` — no data file rewritten; the
    * read side anti-joins the delete set on the scan's `_metadata`
    * columns). The oracle computes the aggregate with the 'R' rows
    * excluded — hash-green ⇔ the delete file, its manifest, the new
    * snapshot, and the positional application are all exact. */
  private val q274: QFn = (s, d) => {
    val dir = "/tmp/graft_ice_mor_v3_" + deltaFixtureKey(s, d)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      s.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(
        dir, "metadata/v2.metadata.json"))) {
      graft.sources.IcebergCompat.writeTable(deltaSlice(s, d), dir,
        partitionBy = Seq("l_returnflag"))
      graft.sources.IcebergCompat.deletePositional(s, dir,
        col("l_returnflag") === "R")
    }
    graft.sources.IcebergCompat.read(s, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("revenue"),
        dsum(col("l_quantity")).as("qty"))
  }
  private val q274Sql = q272Sql

  /** q275: DELTA DELETION VECTORS on real data (r12 verdict item 1 —
    * Databricks-written tables have DVs on by default, so this is the
    * gap that made the reader refuse most production tables). The
    * fixture is a partitioned Delta slice plus TWO merge-on-read
    * DELETE commits from `DeltaCompat.writeDeletionVectors`: v1 marks
    * `l_quantity = 5` rows in per-file RoaringBitmapArray vectors (no
    * data file rewritten), v2 deletes `l_quantity < 3` — superseding
    * v1's vectors with the union under fresh DV ids (remove old DV id
    * + add new, per the protocol). The read decodes the bitmaps on
    * executors and anti-joins `_metadata.(file_path, row_index)`;
    * hash-green ⇔ bitmap encode/decode, descriptor resolution,
    * supersession, and the positional application are ALL exact —
    * the oracle computes the same aggregate from the source parquet
    * with both predicates excluded. */
  private val q275: QFn = (s, d) => {
    val dir = "/tmp/graft_delta_dv_v1_" + deltaFixtureKey(s, d)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      s.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(
        dir, f"_delta_log/${2L}%020d.json"))) {
      graft.sources.DeltaCompat.writeTable(deltaSlice(s, d), dir,
        partitionBy = Seq("l_returnflag"))
      graft.sources.DeltaCompat.writeDeletionVectors(s, dir,
        col("l_quantity") === 5)
      graft.sources.DeltaCompat.writeDeletionVectors(s, dir,
        col("l_quantity") < 3)
    }
    graft.sources.DeltaCompat.read(s, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("revenue"),
        dsum(col("l_quantity")).as("qty"))
  }
  private val q275Sql =
    s"""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
      |  ${sqlSum("l_extendedprice")} AS revenue,
      |  ${sqlSum("l_quantity")} AS qty
      |FROM lineitem
      |WHERE l_quantity < 10 AND l_quantity <> 5 AND l_quantity >= 3
      |GROUP BY l_returnflag""".stripMargin

  /** q276: DELTA COLUMN MAPPING + TIMESTAMPNTZ on real data (r12
    * verdict item 2) — the fixture is written in `name` mapping mode:
    * parquet files and partition dirs carry PHYSICAL `col-N` names,
    * the metaData schema maps them to logical names with an NTZ
    * shipdate column, and the protocol declares the reader-3
    * columnMapping/timestampNtz features. Hash-green ⇔ the
    * physical→logical projection (including the PHYSICAL-keyed
    * partition values) and the NTZ type both read exactly — the
    * oracle computes the same aggregate from the source parquet under
    * the logical names. */
  private val q276: QFn = (s, d) => {
    val dir = "/tmp/graft_delta_cm_v1_" + deltaFixtureKey(s, d)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      s.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir, "_delta_log")))
      graft.sources.DeltaCompat.writeTable(
        Tables.lineitem(s, d).filter(col("l_quantity") < 10)
          .select(col("l_orderkey"), col("l_quantity"),
            col("l_shipdate")
              .cast(org.apache.spark.sql.types.TimestampNTZType)
              .as("l_ship_ntz"),
            col("l_returnflag")),
        dir, partitionBy = Seq("l_returnflag"), columnMapping = true)
    graft.sources.DeltaCompat.read(s, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("qty"),
        date_format(max(col("l_ship_ntz")),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("max_ship"))
  }
  private val q276Sql =
    s"""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
      |  ${sqlSum("l_quantity")} AS qty,
      |  strftime(MAX(CAST(l_shipdate AS TIMESTAMP)),
      |           '%Y-%m-%d %H:%M:%S.%f') AS max_ship
      |FROM lineitem WHERE l_quantity < 10
      |GROUP BY l_returnflag""".stripMargin

  /** q279: DELTA V2 CHECKPOINT on real data (round 13 — the last
    * default-on reader-3 feature after q275/q276): the fixture is a
    * partitioned slice + a deletion-vector MoR DELETE, then a V2
    * CHECKPOINT (UUID-named parquet top-level, checkpointMetadata,
    * file actions fanned out into TWO `_sidecars/` parquet files)
    * with ALL prior JSON history deleted — the log-cleanup state of a
    * modern Databricks table — and a SECOND DV commit written ON TOP
    * of the truncated log (so the writer, too, must reconstruct
    * through the v2 checkpoint). Hash-green ⇔ sidecar discovery +
    * replay, DV descriptors riding through the checkpoint, the
    * v2Checkpoint protocol feature gate, and post-checkpoint JSON
    * replay are ALL exact; the oracle computes the aggregate from
    * source parquet with both delete predicates excluded (q275's
    * SQL, by construction the same surviving set). */
  private val q279: QFn = (s, d) => {
    val dir = "/tmp/graft_delta_v2cp_v1_" + deltaFixtureKey(s, d)
    val logDir = new org.apache.hadoop.fs.Path(dir, "_delta_log")
    val fs = logDir.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(
        logDir, f"${2L}%020d.json"))) {
      graft.sources.DeltaCompat.writeTable(deltaSlice(s, d), dir,
        partitionBy = Seq("l_returnflag"))
      graft.sources.DeltaCompat.writeDeletionVectors(s, dir,
        col("l_quantity") === 5)
      graft.sources.DeltaCompat.checkpointV2(s, dir, numSidecars = 2)
      fs.delete(new org.apache.hadoop.fs.Path(
        logDir, f"${0L}%020d.json"), false)
      fs.delete(new org.apache.hadoop.fs.Path(
        logDir, f"${1L}%020d.json"), false)
      graft.sources.DeltaCompat.writeDeletionVectors(s, dir,
        col("l_quantity") < 3)
    }
    graft.sources.DeltaCompat.read(s, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("revenue"),
        dsum(col("l_quantity")).as("qty"))
  }

  /** q277: ICEBERG EQUALITY DELETES + FIELD-ID RENAME on real data
    * (r12 verdict item 3) — the fixture stacks the full Flink/CDC
    * shape: v1 writes the partitioned slice, v2 RENAMES
    * `l_returnflag`→`flag` (metadata-only; old data files keep the
    * old parquet column name and resolve BY FIELD ID), v3 is an
    * equality DELETE of `flag='R'` (content=2, sequence number 2),
    * and v4 RE-INSERTS the `l_quantity=5` R rows via `appendTable`
    * (sequence number 3 — STRICTLY ABOVE the delete, so per the
    * spec's ordering rule they must SURVIVE it). The oracle computes
    * the same aggregate from source parquet: everything but R, plus
    * the re-inserted R slice. Hash-green ⇔ field-id resolution,
    * spec-field→source-id partition mapping, null-safe equality
    * application, AND sequence ordering are all exact. */
  private val q277: QFn = (s, d) => {
    val dir = "/tmp/graft_ice_eq_v1_" + deltaFixtureKey(s, d)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      s.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(
        dir, "metadata/v4.metadata.json"))) {
      import s.implicits._
      graft.sources.IcebergCompat.writeTable(deltaSlice(s, d), dir,
        partitionBy = Seq("l_returnflag"))
      graft.sources.IcebergCompat.renameColumn(s, dir,
        "l_returnflag", "flag")
      graft.sources.IcebergCompat.deleteEquality(s, dir, Seq("flag"),
        Seq("R").toDF("flag"))
      graft.sources.IcebergCompat.appendTable(
        deltaSlice(s, d)
          .filter(col("l_returnflag") === "R" && col("l_quantity") === 5)
          .withColumnRenamed("l_returnflag", "flag"),
        dir, partitionBy = Seq("flag"))
    }
    graft.sources.IcebergCompat.read(s, dir)
      .groupBy("flag")
      .agg(count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("revenue"),
        dsum(col("l_quantity")).as("qty"))
  }
  private val q277Sql =
    s"""SELECT l_returnflag AS flag, CAST(COUNT(*) AS BIGINT) AS n,
      |  ${sqlSum("l_extendedprice")} AS revenue,
      |  ${sqlSum("l_quantity")} AS qty
      |FROM lineitem
      |WHERE l_quantity < 10
      |  AND (l_returnflag <> 'R' OR l_quantity = 5)
      |GROUP BY l_returnflag""".stripMargin

  /** q280: ICEBERG NESTED TYPES on real data (round 13) — the fixture
    * reshapes the lineitem slice into the three nested kinds the spec
    * defines: a STRUCT of the measures, a LIST of the part/supp keys,
    * and a MAP keyed by linestatus; `writeTable` exports it with
    * spec-compliant nested field ids (element-id/key-id/value-id,
    * DFS last-column-id) and the reader parses the nested schema JSON
    * back. The aggregate reads THROUGH every nesting kind
    * (struct-field dot paths, element_at on the list, map_values on
    * the map), so hash-green ⇔ nested schema round-trip, nested
    * field-id stamping, and nested column pruning are all exact —
    * the oracle computes the same numbers from the flat source
    * parquet. */
  private val q280: QFn = (s, d) => {
    val dir = "/tmp/graft_ice_nested_v1_" + deltaFixtureKey(s, d)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      s.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(
        dir, "metadata/version-hint.text"))) {
      val src = Tables.lineitem(s, d).filter(col("l_quantity") < 10)
        .select(col("l_orderkey"),
          struct(col("l_quantity").as("qty"),
            col("l_extendedprice").as("price")).as("meas"),
          array(col("l_partkey"), col("l_suppkey")).as("keys"),
          map(col("l_linestatus"), col("l_discount"))
            .as("disc_by_status"),
          col("l_returnflag"))
      graft.sources.IcebergCompat.writeTable(src, dir,
        partitionBy = Seq("l_returnflag"))
    }
    graft.sources.IcebergCompat.read(s, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        dsum(col("meas.qty")).as("qty"),
        dsum(col("meas.price")).as("revenue"),
        sum(element_at(col("keys"), 1)).as("partkeys"),
        dsum(element_at(map_values(col("disc_by_status")), 1))
          .as("disc"))
  }
  private val q280Sql =
    s"""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
      |  ${sqlSum("l_quantity")} AS qty,
      |  ${sqlSum("l_extendedprice")} AS revenue,
      |  CAST(SUM(l_partkey) AS BIGINT) AS partkeys,
      |  ${sqlSum("l_discount")} AS disc
      |FROM lineitem WHERE l_quantity < 10
      |GROUP BY l_returnflag""".stripMargin

  /** q281: ICEBERG v3 DELETION VECTORS on real data (round 13) — the
    * Iceberg twin of q275: the partitioned slice takes TWO
    * `deleteVectors` MoR commits (`l_quantity=5`, then `l_quantity<3`
    * whose replacement vectors carry the union at a higher sequence),
    * each packing per-file RoaringBitmapArray blobs into a spec-layout
    * puffin file referenced from content=1 delete manifests and
    * upgrading the table to format-version 3. Hash-green ⇔ puffin
    * blob decode (magic/CRC), referenced-file resolution,
    * newest-DV-per-file supersession, and the v3 metadata gate are
    * all exact — the oracle (q275's SQL) computes the aggregate with
    * both predicates excluded. */
  private val q281: QFn = (s, d) => {
    val dir = "/tmp/graft_ice_dv_v1_" + deltaFixtureKey(s, d)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      s.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir, "dv-3.puffin"))) {
      graft.sources.IcebergCompat.writeTable(deltaSlice(s, d), dir,
        partitionBy = Seq("l_returnflag"))
      graft.sources.IcebergCompat.deleteVectors(s, dir,
        col("l_quantity") === 5)
      graft.sources.IcebergCompat.deleteVectors(s, dir,
        col("l_quantity") < 3)
    }
    graft.sources.IcebergCompat.read(s, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("revenue"),
        dsum(col("l_quantity")).as("qty"))
  }

  val queries: Map[String, QFn] = Map(
    "q277_iceberg_eqdelete" -> q277,
    "q275_delta_dv" -> q275,
    "q276_delta_colmap" -> q276,
    "q279_delta_v2checkpoint" -> q279,
    "q280_iceberg_nested" -> q280,
    "q281_iceberg_dv" -> q281,
    "q269_delta_roundtrip" -> q269,
    "q272_delta_checkpoint" -> q272,
    "q273_iceberg_roundtrip" -> q273,
    "q274_iceberg_mor" -> q274,
    "q264_asof_nearest" -> q264,
    "q21_cdc_latest" -> q21,
    "q22_merge_upsert" -> q22,
    "q23_dq_profile" -> q23,
    "q24_asof_join" -> q24,
    "q48_asof_native" -> q48,
    "q243_asof_forward" -> q243,
    "q191_scd2_ranges" -> q191)

  val oracleSql: Map[String, String] = Map(
    "q277_iceberg_eqdelete" -> q277Sql,
    "q275_delta_dv" -> q275Sql,
    "q276_delta_colmap" -> q276Sql,
    "q279_delta_v2checkpoint" -> q275Sql,
    "q280_iceberg_nested" -> q280Sql,
    "q281_iceberg_dv" -> q275Sql,
    "q269_delta_roundtrip" -> q269Sql,
    "q272_delta_checkpoint" -> q272Sql,
    "q273_iceberg_roundtrip" -> q273Sql,
    "q274_iceberg_mor" -> q274Sql,
    "q264_asof_nearest" -> q264Sql,
    "q21_cdc_latest" -> q21Sql,
    "q22_merge_upsert" -> q22Sql,
    "q23_dq_profile" -> q23Sql,
    "q24_asof_join" -> q24Sql,
    "q48_asof_native" -> q24Sql,
    "q243_asof_forward" -> q243Sql,
    "q191_scd2_ranges" -> q191Sql)
}
