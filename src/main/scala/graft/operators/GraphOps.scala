package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Checkpoints.CutOps

/** Distributed graph-authority scoring (PageRank, Brin & Page 1998) —
  * the link-graph quality signal large-crawl curation pipelines use
  * for URL-level filtering (CommonCrawl-derived corpora rank hosts by
  * centrality before sampling; the reference's survey data has no web
  * graph, so q98 scores the bipartite customer↔part co-purchase graph
  * the same way).
  *
  * Scale shape (100 TB of edges):
  *  - the edge list is hash-partitioned by `src` ONCE and lineage-cut
  *    ([[graft.util.Checkpoints.cut]]: executor-local by default —
  *    zero I/O on one JVM — or a RELIABLE `Dataset.checkpoint` when
  *    `spark.graft.checkpointDir` is set, so an executor loss during
  *    an hours-long iteration re-reads the cut state instead of
  *    failing the job). Both paths preserve the physical partitioning
  *    in the resulting `LogicalRDD`, so every iteration's edges⋈ranks
  *    join re-shuffles only the V-sized rank state, never the E-sized
  *    edge list.
  *  - per iteration: one join (edges ⋈ ranks, co-partitioned big
  *    side) + one aggregation (contributions by dst, map-side partial
  *    agg bounds the shuffle at O(V) per partition). No collect — the
  *    only driver value is the node COUNT.
  *  - rank state is `localCheckpoint`ed per round: the loop re-reads
  *    flat (node, rank, deg) rows, and the logical plan stays
  *    constant-size instead of growing by two joins per iteration
  *    (the q66 lineage lesson).
  *  - float determinism: contributions accumulate through an exact
  *    DECIMAL(38,18) sum (order-independent; a plain `sum(double)`
  *    varies with partition merge order), and everything else is
  *    scalar IEEE arithmetic on identical inputs — so the iterates
  *    are bit-identical across runs, layouts, AND engines (the DuckDB
  *    oracle unrolls the same recurrence over the same decimal sums).
  */
object GraphOps {

  type QFn = (SparkSession, String) => DataFrame

  /** The contribution accumulator is semantically DECIMAL(38,18):
    * per-term rounding error ≤5e-19 against rank masses ~1/V — far
    * below any reported digit (not [[graft.util.Exact.Dec]]: scale 6
    * is price-grained; rank contributions need the full 18). It is
    * EVALUATED as exact fixed-point integer sums — see the round loop.
    *
    * `cast(c as decimal(38,18))` as a scale-18 unscaled long — the
    * SAME value Spark's double→decimal cast produces (Decimal(d) parses
    * Double.toString = BigDecimal.valueOf, changePrecision rounds
    * HALF_UP to scale 18), so downstream integer sums of these are
    * bit-equal to the decimal sum. Restricted to |c| < ~9.2 (unscaled
    * fits one long) — rank/outdeg contributions are ≤ total rank mass
    * = 1 by construction; longValueExact fails LOUDLY if a caller ever
    * feeds a value outside that domain instead of corrupting the sum. */
  private val unscaled18 = udf((c: Double) =>
    java.math.BigDecimal.valueOf(c)
      .setScale(18, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact())

  /** Reassemble the three-way digit-split sums (see the round loop)
    * into the exact 128-bit unscaled total and convert EXACTLY like
    * `cast(decimal(38,18) as double)` (BigDecimal.doubleValue). */
  private val splitSumToDouble = udf((s2: Long, s1: Long, s0: Long) =>
    new java.math.BigDecimal(
      java.math.BigInteger.valueOf(s2)
        .multiply(java.math.BigInteger.valueOf(1000000000000L))
        .add(java.math.BigInteger.valueOf(s1)
          .multiply(java.math.BigInteger.valueOf(1000000L)))
        .add(java.math.BigInteger.valueOf(s0)), 18).doubleValue())

  /** Run `body` with AQE disabled — checkpoints taken inside report a
    * concrete outputPartitioning instead of adaptive-unknown. */
  private def withoutAqe[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, prev)
  }

  /** Shuffle width for the V-sized rank state: one partition per
    * ~64k nodes, capped at the cluster's parallelism. The rank update
    * is V rows per round — scheduling the ambient shuffle width (32
    * locally, thousands on a big cluster) over ~100k rows makes every
    * round mostly task-launch overhead; deriving the width from N
    * keeps per-round job shape proportional to the state. Decimal
    * contribution sums keep the iterates bit-identical at ANY width. */
  private[graft] def rankStateParts(spark: SparkSession, n: Long): Int = {
    val rowsPer = 1L << 16
    val maxP = math.max(1, spark.sparkContext.defaultParallelism).toLong
    // floor at min(maxP, 8): the per-round final aggregate merges up to
    // mapWidth×V partial rows — at width 1 that merge is a SERIAL
    // ~0.3 s/round bottleneck for a small V on a wide edge layout,
    // while 8 small reduce tasks are negligible scheduling at any
    // cluster size (the cap keeps the big-cluster tiny-state posture)
    math.max(math.min(maxP, 8L),
      math.min(maxP, (n + rowsPer - 1) / rowsPer)).toInt
  }

  /** Damped PageRank over a directed edge list `(src, dst)`.
    *
    * Node set = nodes with at least one OUT-edge (for an undirected
    * graph fed as both directions — the q98 shape — that is every
    * node, and total rank mass is conserved). Fixed `iters` rounds of
    *   r'(v) = (1−d)/N + d · Σ_{u→v} r(u)/outdeg(u)
    * — fixed-round, not convergence-tested, so the result is a pure
    * function of the graph and the oracle can unroll it. Returns
    * (node, rank), checkpointed — the iteration work happens HERE (and
    * is phase-accounted via [[graft.util.PhaseTimer]]: `pr_edges` =
    * edge layout + degree state, `pr_rounds` = all rank rounds), not
    * at the caller's first action. */
  def pagerank(edges: DataFrame, iters: Int,
      damping: Double = 0.85, dedupEdges: Boolean = false): DataFrame = {
    val spark = edges.sparkSession
    // E-sized side partitioned by the join key once, lineage cut; every
    // iteration reuses this layout and shuffles only the rank state.
    // The checkpoints are taken with AQE OFF: under AQE the physical
    // plan is adaptive and Dataset.localCheckpoint records
    // UnknownPartitioning in its LogicalRDD, so every round would
    // silently re-exchange the E-sized edge list (observed: 5 edge
    // shuffles in the 5-round plan; 0 after this).
    val (e, deg, n) = graft.util.PhaseTimer.time("pr_edges") {
      withoutAqe(spark) {
        // dedupEdges folds the caller's DISTINCT into THIS exchange:
        // hashpartitioning(src) satisfies the (src,dst) clustering the
        // dedup aggregate needs, so it runs partition-local here — one
        // full edge shuffle instead of the caller's distinct exchange
        // PLUS this repartition (r14; same row set either way)
        val ePart = edges.select(col("src"), col("dst"))
          .repartition(col("src"))
        val e0 = (if (dedupEdges) ePart.dropDuplicates("src", "dst")
                  else ePart).cutLineage()
        val d0 = e0.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("deg")).cutLineage()
        val cnt = d0.count() // scalar to the driver — the model, not the data
        require(cnt > 0, "pagerank on an empty edge list")
        // re-lay the V-sized state at its size-derived width so every
        // round's aggregate + rank join schedule O(N/64k) tasks, not
        // the ambient shuffle width
        (e0, d0.repartition(rankStateParts(spark, cnt), col("node"))
          .cutLineage(), cnt)
      }
    }
    graft.util.PhaseTimer.time("pr_rounds") {
      val spKey = "spark.sql.shuffle.partitions"
      val smjKey = "spark.sql.join.preferSortMergeJoin"
      val abtKey = "spark.sql.autoBroadcastJoinThreshold"
      val prevSp = spark.conf.get(spKey)
      val prevSmj = spark.conf.get(smjKey, "true")
      val prevAbt = spark.conf.get(abtKey, "10485760")
      spark.conf.set(spKey, rankStateParts(spark, n).toString)
      // shuffled-hash, not sort-merge, for the round joins (guide
      // §3.1): SMJ re-sorts the E-sized edge stream EVERY round; SHJ
      // builds a hash table of the V-sized rank/degree state per
      // partition instead (≤64k rows by rankStateParts construction —
      // bounded regardless of data scale) and streams the edges
      // unsorted. Same rows, same decimal sums — plan-shape only.
      // Auto-broadcast is OFF here too (r14): a small rank state gets
      // broadcast-planned otherwise, which re-collects V rows to the
      // driver and rebroadcasts them EVERY round — per-round driver
      // round-trips the SHJ exchange avoids (and the r13 broadcast
      // A/B already measured slower with 2-3x the variance).
      spark.conf.set(smjKey, "false")
      spark.conf.set(abtKey, "-1")
      try {
        val base = lit((1.0 - damping) / n)
        var ranks = deg.select(col("node"), lit(1.0 / n).as("rank"), col("deg"))
        (1 to iters).foreach { i =>
          // The contribution sum is semantically
          //   sum(cast(rank/deg as decimal(38,18))).cast("double")
          // but evaluated per EDGE that form pays a boxed decimal cast
          // + BigDecimal add per row. rank/deg is per-NODE: convert it
          // to the exact scale-18 unscaled long ONCE per node (V-sized
          // work), digit-split it into three ≤1e6 components so the
          // per-edge aggregation is three plain long sums in
          // whole-stage codegen (t = t2·1e12 + t1·1e6 + t0 holds
          // exactly; each component sum stays far from long overflow
          // for any in-degree < 1e12), then reassemble the 128-bit
          // total per node. Bit-identical by construction: same
          // rounding per term (unscaled18 doc), exact integer sums,
          // same final BigDecimal→double conversion.
          val contribSrc = ranks.select(col("node").as("src"),
              unscaled18(col("rank") / col("deg")).as("t"))
            .select(col("src"), expr("t div 1000000000000").as("t2"),
              expr("(t div 1000000) % 1000000").as("t1"),
              expr("t % 1000000").as("t0"))
          val contribs = e
            .join(contribSrc.hint("shuffle_hash"), "src")
            .select(col("dst").as("node"), col("t2"), col("t1"), col("t0"))
            .groupBy("node")
            .agg(sum("t2").as("s2"), sum("t1").as("s1"), sum("t0").as("s0"))
            .select(col("node"),
              splitSumToDouble(col("s2"), col("s1"), col("s0")).as("in"))
          ranks = deg
            .join(contribs.hint("shuffle_hash"), Seq("node"), "left")
            .select(col("node"),
              (base + lit(damping) * coalesce(col("in"), lit(0.0))).as("rank"),
              col("deg"))
          if (sys.env.contains("SPARK_GRAFT_PR_DEBUG") && i <= 3)
            ranks.explain("formatted")
          // cut the lineage EVERY round (r14; was every 4th): a
          // multi-round lazy chain makes every round's operators
          // distinct codegen stages (codegenStageId is embedded in the
          // generated source, so NOTHING is reused — each round pays
          // class-load + JIT warmup over the E-sized stream, measured
          // as 3-10x the round's real work) and grows the task binary
          // per round (measured: executorDeserializeTime 0.2→1.1 s
          // across rounds 1-4). With a cut per round every iteration
          // is the SAME two-stage query — identical generated source,
          // one hot class set — at the cost of one ~50 ms driver
          // round-trip per iteration, which the reuse repays several
          // times over at any scale.
          if (i < iters) ranks = ranks.cutLineage()
        }
        // materialize the tail rounds HERE, inside the scoped shuffle
        // width (a lazy return would run them later under the ambient
        // conf) — and hand the caller a V-sized checkpointed result
        ranks.select("node", "rank").cutLineage()
      } finally {
        spark.conf.set(spKey, prevSp)
        spark.conf.set(smjKey, prevSmj)
        spark.conf.set(abtKey, prevAbt)
      }
    }
  }

  /** q98: co-purchase authority — PageRank over the bipartite
    * customer↔part graph (distinct orders⋈lineitem pairs, both
    * directions; node ids disambiguated as 2·custkey / 2·partkey+1).
    * Top 25 by rounded rank, node tiebreak, so the cutoff is
    * deterministic in both engines. */
  private val q98: QFn = (s, d) => {
    // raw (undeduped) pair stream: the DISTINCT runs inside pagerank's
    // single edge exchange (dedupEdges) instead of paying its own
    // (src,dst) exchange first — distinct(union(raw, raw.rev)) ≡
    // union(distinct(raw), distinct(raw).rev) here because src is
    // always even and dst odd (no symmetric duplicates possible)
    val e0 = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(s, d).select("l_orderkey", "l_partkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_partkey") * 2 + 1).as("dst"))
    pagerank(e0.union(e0.select(col("dst"), col("src"))), iters = 5,
      dedupEdges = true)
      .select(col("node").as("node_id"), round(col("rank"), 9).as("pr"))
      .orderBy(col("pr").desc, col("node_id"))
      .limit(25)
  }

  /** The same recurrence unrolled: DuckDB has no aggregation in
    * recursive CTEs, and a fixed-round recurrence is strictly more
    * oracle-friendly anyway — same decimal-exact contribution sums,
    * same IEEE scalar ops, so the hash must match bit-for-bit. */
  private val q98Sql: String = {
    val steps = (1 to 5).map { i =>
      s"""r$i AS (
         |  SELECT deg.node,
         |    (1.0 - 0.85)/(SELECT cnt FROM n) + 0.85*COALESCE(s.c, 0.0) AS r
         |  FROM deg LEFT JOIN (
         |    SELECT e.dst AS node,
         |      CAST(SUM(CAST(rp.r / dd.d AS DECIMAL(38,18))) AS DOUBLE) AS c
         |    FROM edges e
         |    JOIN r${i - 1} rp ON rp.node = e.src
         |    JOIN deg dd ON dd.node = e.src
         |    GROUP BY e.dst) s ON s.node = deg.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH
       |e0 AS (
       |  SELECT DISTINCT o_custkey*2 AS src, l_partkey*2+1 AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |edges AS (SELECT src, dst FROM e0
       |  UNION ALL SELECT dst, src FROM e0),
       |deg AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY 1),
       |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS cnt FROM deg),
       |r0 AS (SELECT node, 1.0/(SELECT cnt FROM n) AS r FROM deg),
       |$steps
       |SELECT node AS node_id, ROUND(r, 9) AS pr FROM r5
       |ORDER BY pr DESC, node_id LIMIT 25""".stripMargin
  }

  /** q105: TRIANGLE COUNTS + local clustering coefficient over the
    * thresholded co-purchase projection (part–part edges co-ordered
    * in ≥2 orders — q102's pair set). The node-iterator shape that
    * scales: orient every edge from the (degree, id)-SMALLER endpoint
    * to the larger, so each triangle is enumerated exactly once from
    * its smallest corner and the wedge join's fanout is bounded by
    * out-degree ≤ O(√E) on any graph (the arboricity argument behind
    * every distributed triangle count — a hub of degree d never fans
    * out d²). Wedges = dir ⋈ dir on the middle vertex; closure =
    * equi-join against the directed edge set; per-node credit =
    * explode the 3 corners. Coefficient = 2·tri / (deg·(deg−1)),
    * identical IEEE in both engines, 6 dp.
    *
    * Note the contrast with q98: PageRank is iterative (fixed-round
    * recurrence), triangles are a pure 2-join dataflow — the two
    * canonical distributed-graph shapes, both over the same derived
    * edge relation. */
  /** Thresholded co-purchase projection (part–part edges co-ordered
    * in ≥2 orders — q102's pair set), BOTH directions: the shared
    * derived edge relation under q105's triangles and q107's 2-hop
    * reach. The ≥2-support threshold is also the scale lever: it is
    * what keeps the projection's degree distribution bounded, so the
    * wedge/neighbor joins downstream never fan a raw hub out
    * quadratically. */
  private def coPurchaseEdges(s: SparkSession, d: String): DataFrame = {
    val b = Tables.orders(s, d).select("o_orderkey")
      .join(Tables.lineitem(s, d).select("l_orderkey", "l_partkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val pairs = b.select(col("o"), col("p").as("x"))
      .join(b.select(col("o"), col("p").as("y")), Seq("o"))
      .filter(col("x") < col("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .select("x", "y")
    pairs.union(pairs.select(col("y"), col("x"))).toDF("u", "v")
  }

  /** The same projection as a DuckDB CTE prefix (b, pairs, sym). */
  private val coPurchaseCte =
    """WITH b AS (
      |  SELECT DISTINCT o_orderkey AS o, l_partkey AS p
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |pairs AS (
      |  SELECT a.p AS x, b2.p AS y FROM b a JOIN b b2
      |  ON a.o = b2.o AND a.p < b2.p
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |sym AS (SELECT x AS u, y AS v FROM pairs
      |  UNION ALL SELECT y, x FROM pairs)""".stripMargin

  private val q105: QFn = (s, d) => {
    val sym = coPurchaseEdges(s, d)
    val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
    // direct each edge small→large under the (deg, id) total order
    val dir = sym
      .join(deg.select(col("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("u").as("v"), col("deg").as("dv")), Seq("v"))
      .filter(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")))
      .select("u", "v")
    val wedges = dir.select(col("u").as("a"), col("v").as("b"))
      .join(dir.select(col("u").as("b"), col("v").as("c")), Seq("b"))
    val tri = wedges.join(dir.select(col("u").as("a"), col("v").as("c")),
      Seq("a", "c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("u"))
      .groupBy("u").agg(count(lit(1)).as("n_tri"))
    deg.filter(col("deg") >= 2)
      .join(perNode, Seq("u"), "left")
      .select(col("u").as("part"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        round(coalesce(col("n_tri"), lit(0L)).cast("double") * lit(2.0) /
          (col("deg") * (col("deg") - 1)), 6).as("clustering"))
  }
  private val q105Sql = coPurchaseCte +
    """,
      |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM sym
      |  GROUP BY u),
      |dir AS (
      |  SELECT s.u, s.v FROM sym s
      |  JOIN deg a ON a.u = s.u JOIN deg b ON b.u = s.v
      |  WHERE a.deg < b.deg OR (a.deg = b.deg AND s.u < s.v)),
      |tri AS (
      |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |  FROM dir e1 JOIN dir e2 ON e1.v = e2.u
      |  JOIN dir e3 ON e3.u = e1.u AND e3.v = e2.v),
      |pn AS (
      |  SELECT u, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
      |    SELECT a AS u FROM tri UNION ALL SELECT b FROM tri
      |    UNION ALL SELECT c FROM tri) t GROUP BY u)
      |SELECT d.u AS part, d.deg,
      |  COALESCE(pn.n_tri, 0) AS n_tri,
      |  ROUND(CAST(COALESCE(pn.n_tri, 0) AS DOUBLE) * 2.0 /
      |    (d.deg * (d.deg - 1)), 6) AS clustering
      |FROM deg d LEFT JOIN pn ON pn.u = d.u
      |WHERE d.deg >= 2""".stripMargin

  /** q107: 2-HOP REACH — |{v : dist(u,v) ≤ 2}| per node over the
    * co-purchase projection, the neighborhood-size signal behind
    * "related items" breadth and influence-radius ranking. The third
    * canonical distributed-graph shape next to q98 (iterative) and
    * q105 (oriented 2-join): a single self-join on the SYMMETRIC edge
    * list whose fanout is Σ deg² — bounded here by the projection's
    * support threshold (the standard k-hop mitigation: threshold or
    * cap hub degrees BEFORE expanding; a raw power-law graph would
    * need the q79 salting treatment instead). The union+distinct
    * dedups (1-hop ∪ 2-hop) pairs with map-side partial aggregation
    * — the only full shuffle is keyed on the pair, then the per-node
    * count is a second, V-sized aggregate. Exact, hash-checked:
    * output (part, deg, reach_2hop). */
  private val q107: QFn = (s, d) => {
    val sym = coPurchaseEdges(s, d).cutLineage()
    val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
    val two = sym.select(col("u"), col("v").as("m"))
      .join(sym.select(col("u").as("m"), col("v").as("w")), Seq("m"))
      .filter(col("w") =!= col("u"))
      .select(col("u"), col("w").as("v"))
    val reach = sym.select("u", "v").union(two).distinct()
      .groupBy("u").agg(count(lit(1)).as("reach_2hop"))
    deg.join(reach, Seq("u"))
      .select(col("u").as("part"), col("deg"), col("reach_2hop"))
  }
  private val q107Sql = coPurchaseCte +
    """,
      |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM sym
      |  GROUP BY u),
      |two AS (
      |  SELECT a.u, b2.v FROM sym a JOIN sym b2 ON a.v = b2.u
      |  WHERE b2.v <> a.u),
      |reach AS (
      |  SELECT u, CAST(COUNT(*) AS BIGINT) AS reach_2hop FROM (
      |    SELECT DISTINCT u, v FROM (
      |      SELECT u, v FROM sym UNION ALL SELECT u, v FROM two)) r
      |  GROUP BY u)
      |SELECT deg.u AS part, deg.deg, reach.reach_2hop
      |FROM deg JOIN reach ON reach.u = deg.u""".stripMargin

  /** q171: DEGREE ASSORTATIVITY (Newman 2002, Phys. Rev. Lett. 89) —
    * the Pearson correlation of endpoint degrees over the co-purchase
    * projection's edges: positive r = hubs link to hubs (a "rich
    * club"), negative = hub-and-spoke. The fourth graph shape next to
    * q98 (iterative), q105 (oriented 2-join), q107 (neighborhood
    * expansion): degrees are one V-sized aggregate, each directed
    * edge picks up its endpoint degrees via two key-partitioned joins
    * (the edge list is already keyed on `u` from the projection, and
    * `sym` contains BOTH orientations so the marginal sums are
    * symmetric and plain Pearson over directed edges IS the
    * undirected coefficient), and the statistic folds as SIX
    * integer-exact decimal(38) sums — degree products reach deg² ≈
    * 1e12 per edge and Σ over 1e12 edges ≈ 1e24, past int64 but
    * inside decimal(38) — with ONE fixed IEEE expression at the end
    * (the q141/q155 discipline). Exact, hash-checked. */
  private val q171: QFn = (s, d) => {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val sym = coPurchaseEdges(s, d)
    val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
    val e = sym
      .join(deg.select(col("u"), col("deg").as("dj")), Seq("u"))
      .join(deg.select(col("u").as("v"), col("deg").as("dk")), Seq("v"))
    val t = e.agg(
      count(lit(1)).as("m"),
      countDistinct(col("u")).as("n_nodes"),
      sum(col("dj").cast(dec38)).as("sj"),
      sum(col("dk").cast(dec38)).as("sk"),
      sum((col("dj") * col("dk")).cast(dec38)).as("sjk"),
      sum((col("dj") * col("dj")).cast(dec38)).as("sjj"),
      sum((col("dk") * col("dk")).cast(dec38)).as("skk"))
    val md = col("m").cast("double")
    val r = (md * col("sjk").cast("double") -
        col("sj").cast("double") * col("sk").cast("double")) /
      sqrt((md * col("sjj").cast("double") -
          col("sj").cast("double") * col("sj").cast("double")) *
        (md * col("skk").cast("double") -
          col("sk").cast("double") * col("sk").cast("double")))
    t.select(col("n_nodes"), (col("m") / 2).cast("long").as("n_edges"),
      round(col("sj").cast("double") / md, 6).as("mean_edge_deg"),
      round(r, 6).as("assortativity"))
  }
  private val q171Sql = coPurchaseCte +
    """,
      |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM sym
      |  GROUP BY u),
      |e AS (
      |  SELECT s.u, a.deg AS dj, b.deg AS dk FROM sym s
      |  JOIN deg a ON a.u = s.u JOIN deg b ON b.u = s.v),
      |t AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
      |    CAST(COUNT(DISTINCT u) AS BIGINT) AS n_nodes,
      |    SUM(CAST(dj AS DECIMAL(38,0))) AS sj,
      |    SUM(CAST(dk AS DECIMAL(38,0))) AS sk,
      |    SUM(CAST(dj * dk AS DECIMAL(38,0))) AS sjk,
      |    SUM(CAST(dj * dj AS DECIMAL(38,0))) AS sjj,
      |    SUM(CAST(dk * dk AS DECIMAL(38,0))) AS skk
      |  FROM e)
      |SELECT n_nodes, CAST(m / 2 AS BIGINT) AS n_edges,
      |  ROUND(CAST(sj AS DOUBLE) / CAST(m AS DOUBLE), 6) AS mean_edge_deg,
      |  ROUND((CAST(m AS DOUBLE) * CAST(sjk AS DOUBLE)
      |      - CAST(sj AS DOUBLE) * CAST(sk AS DOUBLE))
      |    / SQRT((CAST(m AS DOUBLE) * CAST(sjj AS DOUBLE)
      |        - CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE))
      |      * (CAST(m AS DOUBLE) * CAST(skk AS DOUBLE)
      |        - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE))), 6)
      |    AS assortativity
      |FROM t""".stripMargin

  /** q177: NEWMAN MODULARITY of the BRAND partition over the
    * co-purchase projection (Newman & Girvan 2004, Phys. Rev. E 69):
    * Q = Σ_c (e_c − a_c²), e_c = the fraction of edge ENDS inside
    * community c, a_c = the fraction of ends attached to c — does the
    * catalog's brand structure explain who is bought with whom
    * (Q > 0), or do purchases cut across brands (Q ≈ 0)? The
    * community-structure complement to q171's degree mixing. Scale
    * shape: the community map is a DIM (part → brand, broadcast onto
    * both endpoints of the already-derived edge relation), the two
    * community aggregates are brand-sized, m comes from sym's count
    * (both orientations = edge ends — exactly the 2m the formula
    * wants), and the K-community sum folds 12-dp-rounded terms
    * through the exact decimal accumulator (the q151 discipline —
    * double summation order never matters). Exact, hash-checked. */
  private val q177: QFn = (s, d) => {
    val sym = coPurchaseEdges(s, d)
    val bu = broadcast(Tables.part(s, d)
      .select(col("p_partkey").as("u"), col("p_brand").as("cu")))
    val bv = broadcast(Tables.part(s, d)
      .select(col("p_partkey").as("v"), col("p_brand").as("cv")))
    val e = sym.join(bu, Seq("u")).join(bv, Seq("v"))
    val byC = e.groupBy(col("cu").as("community")).agg(
      count(lit(1)).as("ends"),
      count(when(col("cu") === col("cv"), 1)).as("within"))
    val m = e.agg(count(lit(1)).as("m2"))
    val term = round(
      col("within").cast("double") / col("m2").cast("double") -
        (col("ends").cast("double") / col("m2").cast("double")) *
          (col("ends").cast("double") / col("m2").cast("double")), 12)
    byC.crossJoin(broadcast(m))
      .agg(count(lit(1)).as("n_communities"),
        (max(col("m2")) / 2).cast("long").as("n_edges"),
        round(sum(term.cast(
          org.apache.spark.sql.types.DecimalType(38, 12)))
          .cast("double"), 6).as("modularity"))
  }
  private val q177Sql = coPurchaseCte +
    """,
      |e AS (
      |  SELECT pa.p_brand AS cu, pb.p_brand AS cv FROM sym
      |  JOIN part pa ON pa.p_partkey = sym.u
      |  JOIN part pb ON pb.p_partkey = sym.v),
      |byc AS (
      |  SELECT cu AS community, CAST(COUNT(*) AS BIGINT) AS ends,
      |    CAST(COUNT(CASE WHEN cu = cv THEN 1 END) AS BIGINT) AS within
      |  FROM e GROUP BY 1),
      |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM e)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
      |  CAST(MAX(m2) / 2 AS BIGINT) AS n_edges,
      |  ROUND(CAST(SUM(CAST(ROUND(
      |    CAST(within AS DOUBLE) / CAST(m2 AS DOUBLE)
      |      - (CAST(ends AS DOUBLE) / CAST(m2 AS DOUBLE))
      |        * (CAST(ends AS DOUBLE) / CAST(m2 AS DOUBLE)), 12)
      |    AS DECIMAL(38,12))) AS DOUBLE), 6) AS modularity
      |FROM byc, m""".stripMargin

  /** q181: FIXED-ROUND k-CORE PRUNING (k=3, 4 rounds) over the
    * co-purchase projection — the standard dense-subgraph screen
    * (Seidman 1983): repeatedly drop nodes of degree < k; what
    * survives is the interaction core spam/fringe parts fall out of.
    * FIXED rounds, not run-to-convergence: deterministic,
    * oracle-unrollable (the q98/q161 fixed-iteration discipline), and
    * each round is one V-sized degree aggregate + two key-partitioned
    * semi-joins over a SHRINKING edge set — the plan is 4 unrolled
    * join-aggregate blocks, constant-size at any data volume. Output:
    * survivor count, edges, min degree (≥ k once converged — the
    * convergence INDICATOR is part of the result). Exact,
    * hash-checked. */
  private val q181: QFn = (s, d) => {
    val k = 3
    // MATERIALIZE each round (the q98 lineage discipline): round r's
    // edge set feeds BOTH the degree aggregate and round r+1's joins —
    // left lazy, every consumer recomputes its whole prefix and the
    // base projection runs 2^rounds times (measured: 9.0 s lazy vs
    // ~3.5 s materialized at sf0.1); the edge set only shrinks, so
    // each checkpoint is at most projection-sized
    var e = coPurchaseEdges(s, d).cutLineage()
    (1 to 4).foreach { _ =>
      val keep = e.groupBy("u").agg(count(lit(1)).as("dg"))
        .filter(col("dg") >= k).select("u")
      e = e.join(keep, Seq("u"))
        .join(keep.select(col("u").as("v")), Seq("v"))
        .select("u", "v")
        .cutLineage()
    }
    val deg = e.groupBy("u").agg(count(lit(1)).as("dg"))
    deg.agg(count(lit(1)).as("n_nodes"),
      (sum(col("dg")) / 2).cast("long").as("n_edges"),
      min(col("dg")).as("min_deg"))
  }
  private val q181Sql = coPurchaseCte +
    """,
      |k1 AS (SELECT u FROM sym GROUP BY u HAVING COUNT(*) >= 3),
      |e1 AS (SELECT s.u, s.v FROM sym s
      |  JOIN k1 a ON a.u = s.u JOIN k1 b ON b.u = s.v),
      |k2 AS (SELECT u FROM e1 GROUP BY u HAVING COUNT(*) >= 3),
      |e2 AS (SELECT s.u, s.v FROM e1 s
      |  JOIN k2 a ON a.u = s.u JOIN k2 b ON b.u = s.v),
      |k3 AS (SELECT u FROM e2 GROUP BY u HAVING COUNT(*) >= 3),
      |e3 AS (SELECT s.u, s.v FROM e2 s
      |  JOIN k3 a ON a.u = s.u JOIN k3 b ON b.u = s.v),
      |k4 AS (SELECT u FROM e3 GROUP BY u HAVING COUNT(*) >= 3),
      |e4 AS (SELECT s.u, s.v FROM e3 s
      |  JOIN k4 a ON a.u = s.u JOIN k4 b ON b.u = s.v),
      |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS dg
      |  FROM e4 GROUP BY u)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |  CAST(SUM(dg) / 2 AS BIGINT) AS n_edges,
      |  MIN(dg) AS min_deg
      |FROM deg""".stripMargin

  /** q194: GLOBAL TRANSITIVITY — 3·triangles / wedges, the one-number
    * closure probability ("a friend of a friend is a friend") that
    * complements q105's per-node coefficients (transitivity weights
    * hubs by their wedge count; the mean local coefficient doesn't):
    * triangle count via q105's degree-oriented closure join (each
    * triangle once from its smallest corner — bounded fanout), wedge
    * count = Σ deg·(deg−1)/2 is integer-exact in decimal(38) off the
    * V-sized degree table (deg ≈ 1e6 ⇒ deg² ≈ 1e12 per node, Σ well
    * past int64 at scale), ratio one fixed IEEE expression. Exact,
    * hash-checked. */
  private val q194: QFn = (s, d) => {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val sym = coPurchaseEdges(s, d)
    val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
    val dir = sym
      .join(deg.select(col("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("u").as("v"), col("deg").as("dv")), Seq("v"))
      .filter(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")))
      .select("u", "v")
    val wedges = dir.select(col("u").as("a"), col("v").as("b"))
      .join(dir.select(col("u").as("b"), col("v").as("c")), Seq("b"))
    val tri = wedges.join(
      dir.select(col("u").as("a"), col("v").as("c")), Seq("a", "c"))
      .agg(count(lit(1)).as("n_tri"))
    val wed = deg.agg(
      sum((col("deg") * (col("deg") - 1) / 2).cast(dec38)).as("n_wedges"),
      count(lit(1)).as("n_nodes"))
    wed.crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_wedges").cast("long").as("n_wedges"),
        col("n_tri"),
        round(lit(3.0) * col("n_tri").cast("double") /
          col("n_wedges").cast("double"), 6).as("transitivity"))
  }
  private val q194Sql = coPurchaseCte +
    """,
      |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM sym
      |  GROUP BY u),
      |dir AS (
      |  SELECT s.u, s.v FROM sym s
      |  JOIN deg a ON a.u = s.u JOIN deg b ON b.u = s.v
      |  WHERE a.deg < b.deg OR (a.deg = b.deg AND s.u < s.v)),
      |tri AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_tri
      |  FROM dir e1 JOIN dir e2 ON e2.u = e1.v
      |  JOIN dir e3 ON e3.u = e1.u AND e3.v = e2.v),
      |wed AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |    SUM(CAST(deg * (deg - 1) / 2 AS DECIMAL(38,0))) AS n_wedges
      |  FROM deg)
      |SELECT n_nodes, CAST(n_wedges AS BIGINT) AS n_wedges, n_tri,
      |  ROUND(3.0 * CAST(n_tri AS DOUBLE) / CAST(n_wedges AS DOUBLE), 6)
      |    AS transitivity
      |FROM wed, tri""".stripMargin

  /** q195: DEGREE POWER-LAW MLE — the continuous-approximation
    * Clauset–Shalizi–Newman exponent α̂ = 1 + n/Σ ln(d/(dmin−½)) over
    * the co-purchase degree distribution (α ≈ 2–3 = scale-free hubs,
    * larger = homogeneous — with q171's mixing and q194's closure,
    * the third one-number graph-shape summary). Degrees are one
    * V-sized aggregate, dmin one tiny min, each ln term rounds at
    * 6 dp into the exact decimal accumulator (the q142 libm
    * discipline — V-sized double sums are order-dependent), α̂ one
    * fixed IEEE expression. Exact, hash-checked. */
  private val q195: QFn = (s, d) => {
    val sym = coPurchaseEdges(s, d)
    val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
    val dmin = deg.agg(min(col("deg")).as("dmin"))
    val terms = deg.crossJoin(broadcast(dmin))
      .select(round(log(col("deg").cast("double") /
        (col("dmin").cast("double") - lit(0.5))), 6).as("t"))
    terms.agg(count(lit(1)).as("n_nodes"),
      sum(col("t").cast(graft.util.Exact.Dec)).as("st"))
      .select(col("n_nodes"),
        round(lit(1.0) + col("n_nodes").cast("double") /
          col("st").cast("double"), 6).as("alpha_hat"))
  }
  private val q195Sql = coPurchaseCte +
    """,
      |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM sym
      |  GROUP BY u),
      |dm AS (SELECT MIN(deg) AS dmin FROM deg),
      |terms AS (
      |  SELECT ROUND(ln(CAST(deg AS DOUBLE)
      |    / (CAST(dmin AS DOUBLE) - 0.5)), 6) AS t
      |  FROM deg, dm)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |  ROUND(1.0 + COUNT(*) / CAST(SUM(CAST(t AS DECIMAL(28,6)))
      |    AS DOUBLE), 6) AS alpha_hat
      |FROM terms""".stripMargin

  val queries: Map[String, QFn] = Map(
    "q98_pagerank" -> q98,
    "q105_triangles" -> q105,
    "q107_khop_reach" -> q107,
    "q171_assortativity" -> q171,
    "q177_brand_modularity" -> q177,
    "q181_kcore" -> q181,
    "q194_transitivity" -> q194,
    "q195_degree_powerlaw" -> q195)
  val oracleSql: Map[String, String] = Map(
    "q98_pagerank" -> q98Sql,
    "q105_triangles" -> q105Sql,
    "q107_khop_reach" -> q107Sql,
    "q171_assortativity" -> q171Sql,
    "q177_brand_modularity" -> q177Sql,
    "q181_kcore" -> q181Sql,
    "q194_transitivity" -> q194Sql,
    "q195_degree_powerlaw" -> q195Sql)
}
