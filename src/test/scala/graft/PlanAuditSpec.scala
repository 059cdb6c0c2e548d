package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowGroupLimitExec
import graft.operators.Relational

/** Physical-plan audits: the optimization landmarks SURVEY.md claims,
  * pinned as tests so a regression in plan shape fails loudly. */
class PlanAuditSpec extends SparkSpec {

  /** Flattens the executed plan INCLUDING the subtrees hidden inside
    * AQE query stages (QueryStageExec is a leaf wrapping its stage). */
  private def nodes(df: DataFrame): Seq[SparkPlan] = {
    df.collect() // materialize so AQE settles on the final plan
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val nested = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          Seq(r.child)
        case _ => Nil
      }
      p +: (p.children ++ nested).flatMap(flatten)
    }
    flatten(df.queryExecution.executedPlan).distinct
  }

  test("q02: all predicates push into the parquet scan; schema pruned") {
    val scan = nodes(Relational.queries("q02_revenue_filter")(spark, sfDir))
      .collectFirst { case f: FileSourceScanExec => f }.get
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), pushed)
    assert(pushed.contains("LessThan(l_quantity"), pushed)
    // 4 of 11 lineitem columns read
    assert(scan.requiredSchema.fields.length == 4, scan.requiredSchema)
  }

  test("q03/q09: top-k plans TakeOrderedAndProject, not a global sort") {
    Seq("q03_shipping_priority", "q09_topk_parts").foreach { q =>
      val ns = nodes(Relational.queries(q)(spark, sfDir))
      assert(ns.exists(_.isInstanceOf[TakeOrderedAndProjectExec]), q)
    }
  }

  test("q05: all-broadcast star join with exactly one shuffle") {
    val shuffles = nodes(Relational.queries("q05_local_supplier")(spark, sfDir))
      .filter(_.isInstanceOf[ShuffleExchangeExec])
    assert(shuffles.size == 1, shuffles.toString)
  }

  test("q118/q121: double star keeps one shuffle; disjunction rides a broadcast join") {
    // q118 joins two dim chains (supplier->nation, customer->nation)
    // plus the orders key join - the orders join shuffles or
    // broadcasts per AQE, but the final aggregate must be the ONLY
    // exchange beyond it (no dim chain may shuffle)
    val sh118 = nodes(Relational.queries("q118_nation_volume")(spark, sfDir))
      .filter(_.isInstanceOf[ShuffleExchangeExec])
    assert(sh118.size <= 2, sh118.map(_.nodeName).toString)
    val ns121 = nodes(Relational.queries("q121_disjunctive")(spark, sfDir))
    assert(ns121.exists(_.nodeName.contains("BroadcastHashJoin")),
      ns121.map(_.nodeName).toString)
    assert(!ns121.exists(_.nodeName.contains("BroadcastNestedLoopJoin")))
  }

  test("q06: rank filter plans WindowGroupLimit (per-partition top-k)") {
    val ns = nodes(Relational.queries("q06_window_rank")(spark, sfDir))
    assert(ns.exists(_.isInstanceOf[WindowGroupLimitExec]), ns.map(_.nodeName).toString)
  }

  test("q96: per-group top-k bounds below the sort, agg keeps map-side partials") {
    val ns = nodes(Relational.queries("q96_topk_per_group")(spark, sfDir))
    // the rk <= 3 filter must push into WindowGroupLimit so each
    // partition keeps 3 rows per supplier before the window sort pays
    assert(ns.exists(_.isInstanceOf[WindowGroupLimitExec]), ns.map(_.nodeName).toString)
    // the revenue aggregate keeps a partial (map-side) stage
    val aggs = ns.filter(_.nodeName.contains("HashAggregate"))
    assert(aggs.size >= 2, aggs.map(_.nodeName).toString)
  }

  test("q67: weighted sampling is a pure map-side filter — zero shuffles") {
    val ns = nodes(graft.operators.TextOps.queries("q67_weighted_sample")(spark, sfDir))
    assert(!ns.exists(_.isInstanceOf[ShuffleExchangeExec]),
      ns.map(_.nodeName).toString)
  }

  test("q68: nothing data-sized shuffles — only the rate aggregates exchange") {
    // the doc-sized side reaches the output through scan → broadcast
    // join → filter; every shuffle in the plan belongs to the tiny
    // per-source aggregate chain (rows = #sources)
    val ns = nodes(graft.operators.TextOps.queries("q68_mixing_planner")(spark, sfDir))
    val bhj = ns.filter(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec])
    assert(bhj.nonEmpty, "rates must broadcast-join onto the doc stream")
    val shuffles = ns.collect { case s: ShuffleExchangeExec => s }
    // every exchange sits below an aggregate over per-source rows
    assert(shuffles.size <= 3, ns.map(_.nodeName).toString)
  }

  test("q76/q77: decontamination broadcasts the benchmark; repetition never shuffles") {
    val ns76 = nodes(graft.operators.TextOps.queries("q76_decontaminate")(spark, sfDir))
    assert(ns76.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      "benchmark gram set must broadcast-join onto the corpus postings")
    val ns77 = nodes(graft.operators.TextOps.queries("q77_repetition")(spark, sfDir))
    assert(!ns77.exists(_.isInstanceOf[ShuffleExchangeExec]),
      ns77.map(_.nodeName).toString)
  }

  test("PlanLint flags single-reducer windows and cartesians, clears the scale paths") {
    import graft.util.PlanLint
    // q29's global NTILE window is the canonical single-reducer shape
    val w = PlanLint.check(Relational.queries("q29_deciles")(spark, sfDir))
    assert(w.exists(_.kind == "single-partition-window"), w.toString)
    // its RankOps twin is clean
    assert(PlanLint.check(
      Relational.queries("q63_deciles_scalable")(spark, sfDir)).isEmpty)
    // q46's all-pairs candidate join is a deliberate (guarded) cartesian
    val c = PlanLint.check(
      graft.operators.VectorOps.queries("q46_cosine_pairs")(spark, sfDir))
    assert(c.exists(_.kind == "cartesian"), c.toString)
    // the LSH path is clean
    assert(!PlanLint.check(
      graft.operators.ScaleOps.queries("q47_cosine_pairs_lsh")(spark, sfDir))
      .exists(_.kind == "cartesian"))
    // the star-join and packing paths are clean
    Seq("q05_local_supplier", "q70_sole_late_supplier").foreach { q =>
      assert(PlanLint.check(Relational.queries(q)(spark, sfDir)).isEmpty, q)
    }
    // the banded range join recovers an equi join from a pure range
    // condition: no cartesian finding, no nested loop in the plan
    val q72 = graft.operators.SessionOps.queries("q72_click_attribution")(spark, sfDir)
    assert(PlanLint.check(q72).isEmpty)
    assert(!q72.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
  }

  test("q70/q73: double-referenced subplans read the cache, not the fact twice") {
    // Spark plans no ReusedExchange across the two references, so the
    // shared relation must come from an InMemoryTableScan — a
    // regression here silently doubles the fact-table scans
    Seq("q70_sole_late_supplier", "q73_top_supplier").foreach { q =>
      val df = Relational.queries(q)(spark, sfDir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("InMemoryTableScan"), s"$q lost its cached subplan")
    }
  }

  test("PlanLint sweep of q139-q146: scale paths clean; the documented " +
      "exceptions are exactly the bounded shapes") {
    import graft.util.PlanLint
    // fully clean: two-aggregate star (q139), prefix-sum midranks
    // (q141), capped window ranks (q142), A/B counts (q145)
    Seq("q139_dominant_supplier", "q141_mannwhitney",
      "q145_ab_test").foreach { q =>
      assert(PlanLint.check(Relational.queries(q)(spark, sfDir)).isEmpty, q)
    }
    assert(PlanLint.check(
      graft.operators.TextOps.queries("q142_zipf_slope")(spark, sfDir))
      .isEmpty)
    // q140/q144 cross-join a ONE-ROW broadcast scalar (the grand
    // total / tie correction) onto a K-row aggregate — the flagged
    // cartesian multiplies by exactly 1 at any data size (q137's
    // established shape)
    Seq("q140_chi_square", "q144_kruskal_wallis").foreach { q =>
      val f = PlanLint.check(Relational.queries(q)(spark, sfDir))
      assert(f.forall(_.kind == "cartesian"), s"$q: $f")
    }
    // q143's dense side is the deliberate guarded brute-force baseline
    // (3 probes x N) — the cartesian is probe-bounded, like q46's
    val f143 = PlanLint.check(
      graft.operators.VectorOps.queries("q143_hybrid_rrf")(spark, sfDir))
    assert(f143.forall(_.kind == "cartesian"), f143.toString)
    // q146's only window runs over the 10-row decile aggregate — the
    // one place a single-partition window is genuinely scale-free
    val f146 = PlanLint.check(
      Relational.queries("q146_revenue_lift")(spark, sfDir))
    assert(f146.forall(_.kind == "single-partition-window"), f146.toString)
  }

  test("PlanLint sweep of q151-q153: concentration/Heaps/Theil scale paths") {
    import graft.util.PlanLint
    // q151's share pass joins a nation-count-sized broadcast aggregate
    // back on its key; q152's running sums go through RankOps'
    // two-pass prefix scheme — both fully clean
    assert(PlanLint.check(
      Relational.queries("q151_hhi")(spark, sfDir)).isEmpty, "q151")
    assert(PlanLint.check(
      graft.operators.TextOps.queries("q152_heaps_beta")(spark, sfDir))
      .isEmpty, "q152")
    // q153 cross-joins the ONE-ROW grand-total scalar onto the
    // nation-sized aggregate — multiplies by exactly 1 at any data
    // size (q137/q140/q144's established shape)
    val f = PlanLint.check(Relational.queries("q153_theil")(spark, sfDir))
    assert(f.forall(_.kind == "cartesian"), f.toString)
  }

  test("PlanLint sweep of q154-q158: Q12/Spearman/JSD/Gopher/bigram-LM " +
      "scale paths") {
    import graft.util.PlanLint
    // q154 is a plain fact-fact join + tiny grouped conditional agg;
    // q157 is map-only per-doc features + a K-row rollup — fully clean
    assert(PlanLint.check(
      Relational.queries("q154_priority_class")(spark, sfDir))
      .isEmpty, "q154")
    assert(PlanLint.check(
      graft.operators.TextOps.queries("q157_gopher_rules")(spark, sfDir))
      .isEmpty, "q157")
    // q155's rank tables shuffle-join back on value (no windows over
    // the fact — midranks ride RankOps' two-pass prefix sums)
    assert(PlanLint.check(
      Relational.queries("q155_spearman")(spark, sfDir)).isEmpty, "q155")
    // q156/q158 cross-join a ONE-ROW broadcast scalar (the corpus
    // total / vocabulary size) — multiplies by exactly 1 at any data
    // size (q137/q140/q144/q153's established shape)
    Seq("q156_jsd_drift", "q158_bigram_surprisal").foreach { q =>
      val f = PlanLint.check(
        graft.operators.TextOps.queries(q)(spark, sfDir))
      assert(f.forall(_.kind == "cartesian"), s"$q: $f")
    }
  }

  test("PlanLint sweep of q159-q170: the round-7 statistics suite " +
      "scale paths") {
    import graft.util.PlanLint
    // fully clean: grouped/broadcast aggregates (q159 hour entropy,
    // q161 matrix build, q163 prefix-sum weighted median, q164
    // two-pass moments, q166 TTR, q167 double global rank, q168
    // survival explode, q169 one-aggregate OLS, q170 bounded pair
    // join + top-k)
    Seq("q163_weighted_median", "q164_moments", "q167_decile_migration",
      "q168_survival_curve", "q169_ols_loglog", "q170_basket_jaccard")
      .foreach { q =>
        assert(PlanLint.check(Relational.queries(q)(spark, sfDir))
          .isEmpty, q)
      }
    Seq("q159_hour_entropy", "q161_markov_stationary").foreach { q =>
      assert(PlanLint.check(
        graft.operators.SessionOps.queries(q)(spark, sfDir)).isEmpty, q)
    }
    assert(PlanLint.check(
      graft.operators.TextOps.queries("q166_ttr")(spark, sfDir))
      .isEmpty, "q166")
    // q160/q162/q165 cross-join ONE-ROW broadcast scalars (grand
    // totals / entropies) — multiplies by exactly 1 at any data size
    // (q137/q140/q144's established shape)
    assert(PlanLint.check(
      Relational.queries("q160_cramers_v")(spark, sfDir))
      .forall(_.kind == "cartesian"), "q160")
    Seq("q162_mutual_information", "q165_pareto_share").foreach { q =>
      val f = PlanLint.check(
        graft.operators.SessionOps.queries(q)(spark, sfDir))
      assert(f.forall(_.kind == "cartesian"), s"$q: $f")
    }
  }

  test("PlanLint sweep of q171-q174: assortativity/trend/tau/intervals " +
      "scale paths") {
    import graft.util.PlanLint
    // fully clean: q171 two key-partitioned degree joins + one
    // aggregate; q172 grouped aggregate to the k-row dose table;
    // q173 calendar-bounded pair join (quadratic in months-per-
    // nation, not data volume)
    assert(PlanLint.check(
      graft.operators.GraphOps.queries("q171_assortativity")(spark, sfDir))
      .isEmpty, "q171")
    Seq("q172_ca_trend", "q173_kendall_tau").foreach { q =>
      assert(PlanLint.check(Relational.queries(q)(spark, sfDir))
        .isEmpty, q)
    }
    // q174's running sum windows the CALENDAR-sized day-grain delta
    // table (thousands of rows at any data volume — the q07/q28
    // documented day-grain shape): the single-partition window is the
    // deliberate, bounded exception, and must be the ONLY finding
    val f174 = PlanLint.check(
      Relational.queries("q174_open_orders")(spark, sfDir))
    assert(f174.forall(_.kind == "single-partition-window"),
      s"q174: $f174")
  }

  test("PlanLint sweep of q175-q178: runs/Theil-Sen/modularity/records " +
      "scale paths") {
    import graft.util.PlanLint
    // q176 is fully clean: calendar-bounded pair join (equi on
    // nation), nation-PARTITIONED median rank — no global window
    assert(PlanLint.check(
      Relational.queries("q176_theil_sen")(spark, sfDir)).isEmpty, "q176")
    // q177 crosses ONE broadcast scalar row (2m) into the brand-sized
    // table — the q137/q151 documented shape; nothing else flags
    assert(PlanLint.check(
      graft.operators.GraphOps.queries("q177_brand_modularity")(spark, sfDir))
      .forall(_.kind == "cartesian"), "q177")
    // q175/q178 window the CALENDAR-sized day-grain series (q174's
    // documented exception); q175 also crosses the one-row total
    Seq("q175_runs_test", "q178_record_days").foreach { q =>
      val f = PlanLint.check(Relational.queries(q)(spark, sfDir))
      assert(f.forall(x => x.kind == "single-partition-window" ||
        x.kind == "cartesian"), s"$q: $f")
    }
  }

  test("PlanLint sweep of q179-q182: stickiness/Gumbel/kcore/overlap " +
      "scale paths") {
    import graft.util.PlanLint
    // fully clean: q179 two distinct aggregates + weekly rollup; q180
    // day-grain reduce + tiny max + one moment aggregate; q181 four
    // unrolled degree-prune blocks (keyed semi-joins, no windows);
    // q182 grouped top-k (WindowGroupLimit is PARTITIONED) + pair join
    assert(PlanLint.check(graft.operators.SessionOps
      .queries("q179_stickiness")(spark, sfDir)).isEmpty, "q179")
    assert(PlanLint.check(
      Relational.queries("q180_gumbel_maxima")(spark, sfDir))
      .isEmpty, "q180")
    assert(PlanLint.check(graft.operators.GraphOps
      .queries("q181_kcore")(spark, sfDir)).isEmpty, "q181")
    assert(PlanLint.check(graft.operators.TextOps
      .queries("q182_vocab_overlap")(spark, sfDir)).isEmpty, "q182")
    // q182's top-k must plan the rank-limit pushdown, not a full sort
    val p182 = graft.operators.TextOps
      .queries("q182_vocab_overlap")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p182.contains("WindowGroupLimit"),
      "q182 lost the partial top-k plan")
    // q183/q184/q185: grouped-aggregate / pivot-join shapes, clean
    Seq("q183_price_dispersion", "q184_sign_test",
      "q185_brand_elasticity").foreach { q =>
      assert(PlanLint.check(Relational.queries(q)(spark, sfDir))
        .isEmpty, q)
    }
    // q186-q189 + q193: grouped moments / prefix-sum medians, clean
    Seq("q186_anova_f", "q187_brown_forsythe", "q188_overdispersion",
      "q189_nbinom_fit", "q193_jarque_bera").foreach { q =>
      assert(PlanLint.check(Relational.queries(q)(spark, sfDir))
        .isEmpty, q)
    }
    // q190 crosses the ONE-ROW broadcast total (the q137/q159 shape);
    // the lead window is user-partitioned, so nothing else flags
    val f190 = PlanLint.check(graft.operators.SessionOps
      .queries("q190_entropy_rate")(spark, sfDir))
    assert(f190.forall(_.kind == "cartesian"), s"q190: $f190")
    // q191/q192: user-partitioned run windows / RDD prefix-sum
    // packing — no global window, no cartesian
    assert(PlanLint.check(graft.operators.LakehouseOps
      .queries("q191_scd2_ranges")(spark, sfDir)).isEmpty, "q191")
    assert(PlanLint.check(graft.operators.TextOps
      .queries("q192_token_sequences")(spark, sfDir)).isEmpty, "q192")
    // q194/q195 cross ONE-ROW broadcast scalars (triangle total /
    // dmin) — the q137 documented shape; everything else keyed
    Seq("q194_transitivity", "q195_degree_powerlaw").foreach { q =>
      val f = PlanLint.check(
        graft.operators.GraphOps.queries(q)(spark, sfDir))
      assert(f.forall(_.kind == "cartesian"), s"$q: $f")
    }
    // q196: map-side explode + grouped entropy folds, fully clean
    assert(PlanLint.check(graft.operators.TextOps
      .queries("q196_char_entropy")(spark, sfDir)).isEmpty, "q196")
    // q197 windows the WEEK-grain series (q174's documented
    // exception); q198's lag is customer-partitioned — clean
    assert(PlanLint.check(
      Relational.queries("q197_weekly_volatility")(spark, sfDir))
      .forall(_.kind == "single-partition-window"), "q197")
    assert(PlanLint.check(
      Relational.queries("q198_purchase_rate")(spark, sfDir))
      .isEmpty, "q198")
    // q199 one brand aggregate + top-k; q200 grouped prefix-sum Gini
    assert(PlanLint.check(
      Relational.queries("q199_wilson_returns")(spark, sfDir))
      .isEmpty, "q199")
    assert(PlanLint.check(graft.operators.TextOps
      .queries("q200_token_gini")(spark, sfDir)).isEmpty, "q200")
  }

  test("graft_lint TVF: the plan rules from SQL — findings for the " +
      "single-task window and the cartesian, zero rows for clean plans") {
    graft.functions.GraftFunctions.registerTableFunctions(spark)
    val li = s"parquet.`$sfDir/lineitem.parquet`"
    // a global (unpartitioned) window: flagged, nothing executed
    val winSql = s"SELECT sum(l_quantity) OVER (ORDER BY l_orderkey) " +
      s"FROM $li"
    val f1 = spark.sql(
      s"""SELECT * FROM graft_lint("$winSql")""").collect()
    assert(f1.exists(_.getString(0) == "single-partition-window"),
      f1.mkString(","))
    // a joinless cartesian: flagged
    val crossSql = s"SELECT * FROM $li a CROSS JOIN $li b"
    assert(spark.sql(s"""SELECT * FROM graft_lint("$crossSql")""")
      .collect().exists(_.getString(0) == "cartesian"))
    // the clean grouped-aggregate shape: zero findings, typed schema
    val okSql = s"SELECT l_returnflag, sum(l_quantity) FROM $li GROUP BY 1"
    val ok = spark.sql(s"""SELECT * FROM graft_lint("$okSql")""")
    assert(ok.columns.toSeq == Seq("kind", "detail"))
    assert(ok.count() == 0L)
  }

  test("session-wired lint rule records findings when enabled") {
    import graft.util.PlanLint
    // the extensions inject LintRule into this session (SparkSpec sets
    // spark.sql.extensions=graft.functions.GraftExtensions)
    spark.conf.set("spark.graft.lint", "true")
    try {
      PlanLint.drain()
      Relational.queries("q29_deciles")(spark, sfDir).collect()
      val found = PlanLint.drain()
      assert(found.exists(_.kind == "single-partition-window"), found.toString)
      // clean queries record nothing
      Relational.queries("q05_local_supplier")(spark, sfDir).collect()
      assert(!PlanLint.drain().exists(_.kind == "single-partition-window"))
    } finally spark.conf.set("spark.graft.lint", "false")
  }

  test("q87/q88: SQ8 scan shape and windowless co-partitioned funnel") {
    // q87's candidate phase reads the tinyint code column and scores
    // through the native dot product — no interpreted HOFs beyond the
    // exact-recompute tail (same contract as q47)
    val df87 = graft.operators.ScaleOps.queries("q87_ann_sq8")(spark, sfDir)
    df87.collect()
    val p87 = df87.queryExecution.executedPlan.toString
    assert(p87.contains("dot_product"), "q87 lost the native dot scoring")
    // the candidate hot path reads tinyint codes straight in the
    // codegen dot — the only HOFs left are the map-only encode
    // (transform, n rows not n·p) and the exact-recompute zip_with
    assert(p87.sliding("zip_with".length).count(_ == "zip_with") <= 2,
      "q87 grew interpreted HOFs beyond the exact-recompute phase")
    // q88 never sorts the event stream: no window exec anywhere, and
    // every exchange keys on user_id (plus the final single-row
    // stage-count aggregates)
    val df88 = graft.operators.SessionOps.queries("q88_funnel")(spark, sfDir)
    val ns = nodes(df88)
    assert(!ns.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.window.WindowExec]),
      "q88 must not plan a window")
    val shuffles = ns.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.forall(s =>
      s.outputPartitioning.toString.contains("user_id") ||
        s.outputPartitioning.toString.contains("SinglePartition")),
      shuffles.map(_.outputPartitioning).mkString(", "))
  }

  test("ANN paths run on native codegen expressions, not interpreted HOFs") {
    // q35 / q45 / q49 hot paths: every similarity score comes from the
    // native cosine_sim (and q35's buckets from hyperplane_bits); no
    // aggregate/zip_with lambda anywhere in the plan. q47 keeps
    // exactly one zip_with: the DECIMAL-exact recompute of the tiny
    // survivor set (the two-phase exactness contract), everything
    // upstream of it codegen.
    def planStr(q: String): String = {
      val df = graft.operators.ScaleOps.queries(q)(spark, sfDir)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    Seq("q35_ann_lsh", "q45_ann_ivf").foreach { q =>
      val p = planStr(q)
      assert(p.contains("cosine_sim"), s"$q lost the native cosine")
      assert(!p.contains("zip_with") && !p.contains("lambdafunction"),
        s"$q has interpreted HOFs on the hot path")
    }
    assert(planStr("q35_ann_lsh").contains("hyperplane_bits"))
    val p47 = planStr("q47_cosine_pairs_lsh")
    assert(p47.contains("hyperplane_bits") || p47.contains("InMemory"), p47.take(200))
    assert(p47.sliding("zip_with".length).count(_ == "zip_with") <= 2,
      "q47 grew interpreted HOFs beyond the exact-recompute phase")
  }

  test("q91: pruned packed-list scan, builtin unmask, bounded lambdas") {
    val df = graft.operators.ScaleOps.queries("q91_ann_pq_search")(
      spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // exact rerank through the native cosine; nibble unmask through
    // builtin bit ops (shiftright), never a transform lambda on the
    // candidate stream
    assert(p.contains("cosine_sim"), "rerank lost the native cosine")
    assert(p.contains("shiftright"), "packed unmask should be bit builtins")
    // the codes scan only reads the routed centroid partitions
    assert("PartitionFilters: \\[[^\\]]".r.findFirstIn(p).isDefined,
      "codes scan is not partition-pruned")
    // the only lambdas left construct the PROBE-sized LUT (subvector
    // slicing of a handful of probe rows) — bounded, never data-sized
    assert(p.sliding("lambdafunction".length)
      .count(_ == "lambdafunction") <= 8,
      "q91 grew interpreted HOFs beyond the probe-sized LUT build")
  }

  test("q137: the ECDF cumulative sums plan WITHOUT a Window operator") {
    val df = graft.operators.Relational.queries("q137_ks_test")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the KS cumulatives run as RankOps' two-pass prefix sums — a
    // `SUM(...) OVER (ORDER BY v)` would plan a single-partition
    // Window over every distinct value and serialize the whole ECDF
    assert(!plan.contains("Window"), s"q137 grew a Window operator\n$plan")
  }

  test("q141: midrank cumulatives plan WITHOUT a Window operator") {
    val df = graft.operators.Relational.queries("q141_mannwhitney")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the cumulative counts behind the midranks run as RankOps'
    // two-pass prefix sums — `SUM(...) OVER (ORDER BY v)` would plan
    // a single-partition Window over every distinct order value
    assert(!plan.contains("Window"), s"q141 grew a Window operator\n$plan")
  }

  test("q142: the per-source top-1000 rank plans WindowGroupLimit") {
    val ns = nodes(graft.operators.TextOps.queries("q142_zipf_slope")(spark, sfDir))
    // rk <= 1000 must push into the window so each partition keeps a
    // bounded top-k of its vocabulary before the source shuffle — the
    // lever that keeps a 10-billion-term vocabulary off one task
    assert(ns.exists(_.isInstanceOf[WindowGroupLimitExec]),
      ns.map(_.nodeName).toString)
  }

  test("q132: query terms and idf broadcast onto the tf stream") {
    val df = graft.operators.TextOps.queries("q132_bm25")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the query side must never shuffle the corpus-sized tf stream:
    // qterms⋈idf and the rate join are broadcasts
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q98: rank rounds materialize inside pagerank — the caller's plan " +
      "is a top-k over the checkpointed V-sized state") {
    val df = graft.operators.GraphOps.queries("q98_pagerank")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // pagerank returns a checkpointed result (rounds run inside, under
    // the size-derived shuffle width and phase accounting), so the
    // caller's executed plan must be a TakeOrdered over a LogicalRDD —
    // re-appearing joins/exchanges here mean the checkpoint was lost
    // and the iteration lineage leaked into every downstream action
    assert(plan.contains("TakeOrderedAndProject"), plan)
    val n = "Exchange".r.findAllIn(plan).length
    assert(n == 0, s"q98 caller plan has $n exchanges — result " +
      s"checkpoint lost?\n$plan")
    assert(!plan.contains("Join"), s"q98 iteration lineage leaked\n$plan")
  }

  test("round-8 queries lint clean or cross only documented shapes") {
    import graft.util.PlanLint
    import graft.operators.{SessionOps, TextOps}
    // q201 map-side segment + one key join; q204/q208 aggregates;
    // q205 customer-keyed min joined back; q203 user-keyed windows —
    // all fully clean
    Seq("q201_unigram_fertility" -> TextOps.queries,
        "q210_cluster_sizes" -> TextOps.queries).foreach { case (q, m) =>
      assert(PlanLint.check(m(q)(spark, sfDir)).isEmpty, q)
    }
    assert(PlanLint.check(
      SessionOps.queries("q203_bounce_rate")(spark, sfDir)).isEmpty,
      "q203")
    Seq("q204_cohens_kappa", "q205_new_vs_returning", "q208_cycle_time",
      "q202_trade_balance").foreach { q =>
      assert(PlanLint.check(Relational.queries(q)(spark, sfDir)).isEmpty, q)
    }
    // q207/q209 cross ONE-ROW broadcast scalars (margins total /
    // method-of-moments prior) — the documented q137/q159 shape
    assert(PlanLint.check(TextOps
      .queries("q207_lang_source_residuals")(spark, sfDir))
      .forall(_.kind == "cartesian"), "q207")
    assert(PlanLint.check(Relational
      .queries("q209_shrunk_reliability")(spark, sfDir))
      .forall(_.kind == "cartesian"), "q209")
    // q206 runs entirely on a bounded 201-row top-k set: its global
    // window and its one-row xref cross are both size-capped by
    // construction (the documented bounded-set exceptions)
    assert(PlanLint.check(Relational.queries("q206_hill_tail")(spark, sfDir))
      .forall(f => f.kind == "cartesian" ||
        f.kind == "single-partition-window"), "q206")
    // q211/q212/q213/q214/q217/q218/q220: keyed aggregates/joins only
    Seq("q211_outlier_days", "q212_cohens_d", "q214_nation_flow",
      "q218_price_index", "q220_eta_seasonality").foreach { q =>
      assert(PlanLint.check(Relational.queries(q)(spark, sfDir)).isEmpty, q)
    }
    Seq("q213_dup_rate_by_source", "q217_readability").foreach { q =>
      assert(PlanLint.check(TextOps.queries(q)(spark, sfDir)).isEmpty, q)
    }
    // q215/q219 cross ONE-ROW broadcast grids (decile cuts /
    // checkpoint grid); q216's month-pair self-join + one-row n cross
    // run on a model-sized month series — documented bounded shapes
    Seq("q215_psi_drift" -> Relational.queries,
        "q216_mann_kendall" -> Relational.queries).foreach { case (q, m) =>
      assert(PlanLint.check(m(q)(spark, sfDir))
        .forall(_.kind == "cartesian"), q)
    }
    assert(PlanLint.check(TextOps.queries("q219_vocab_growth")(spark, sfDir))
      .forall(_.kind == "cartesian"), "q219")
    // q221/q222/q223: broadcast dims + keyed windows only
    Seq("q221_region_share_trend", "q222_quantity_mode",
      "q223_growth_streak").foreach { q =>
      assert(PlanLint.check(Relational.queries(q)(spark, sfDir)).isEmpty, q)
    }
    // q224/q227/q228 customer-keyed windows; q225 keyed argmax —
    // clean; q226 crosses the |years| one-row-ish broadcast grid
    Seq("q224_repeat_lag", "q227_priority_transitions",
      "q228_reactivation").foreach { q =>
      assert(PlanLint.check(Relational.queries(q)(spark, sfDir)).isEmpty, q)
    }
    assert(PlanLint.check(
      SessionOps.queries("q225_peak_hour")(spark, sfDir)).isEmpty, "q225")
    assert(PlanLint.check(
      Relational.queries("q226_penetration_curve")(spark, sfDir))
      .forall(_.kind == "cartesian"), "q226")
    // q229 segment-keyed cuts broadcast; q231 key-sized self-join —
    // clean; q230 crosses the ONE-ROW p5 cut
    Seq("q229_trimmed_mean", "q231_annual_retention").foreach { q =>
      assert(PlanLint.check(Relational.queries(q)(spark, sfDir)).isEmpty, q)
    }
    assert(PlanLint.check(
      Relational.queries("q230_expected_shortfall")(spark, sfDir))
      .forall(_.kind == "cartesian"), "q230")
  }
}
