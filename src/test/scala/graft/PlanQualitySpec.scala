package graft

/** Physical-plan assertions — the 100 TB contract. These pin the plan
  * shapes that make the engine scale (filter/column pushdown to parquet,
  * broadcast of dimension tables, partial aggregation before shuffle,
  * top-K without global sort) so a regression shows up as a test
  * failure, not a 100× slowdown on the cluster.
  */
class PlanQualitySpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  // The MV registry is JVM-global and other suites (OperatorSmokeSpec,
  // Verify-style sweeps) legitimately leave MVs registered — exact for
  // VALUES by the registry's invariant, but a leftover tile can answer a
  // sub-plan here (even a union-compensation residual) from cache and
  // change the very plan SHAPE these gates pin. Pin the shapes from a
  // clean registry instead of from suite-ordering luck.
  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.plans.MaterializedViews.clear()
  }

  private def plan(name: String): String =
    run(name).queryExecution.executedPlan.toString

  test("q01: filter + column pruning reach the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$p")
    assert(p.contains("ReadSchema") && !p.contains("l_orderkey"),
      "unused columns must not be read")
  }

  test("q01: aggregation is partial before the shuffle") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum"), "map-side partial aggregation missing")
  }

  test("q03: dimension join is broadcast, top-K avoids global sort") {
    val p = plan("q03_topk_join")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(p.contains("TakeOrderedAndProject"), "expected TakeOrderedAndProject for ORDER BY+LIMIT")
  }

  test("q05: all five dimension joins broadcast; no cartesian products") {
    val p = plan("q05_local_supplier")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"), "cartesian product in join tree")
  }

  test("q04/q41: existence subqueries plan as semi/anti hash joins") {
    assert(plan("q04_exists_semi").contains("LeftSemi"))
    assert(plan("q41_not_exists_anti").contains("LeftAnti"))
  }

  test("q06: selective scan reads only needed columns") {
    val p = plan("q06_forecast_revenue")
    assert(p.contains("PushedFilters"))
    assert(!p.contains("l_orderkey") && !p.contains("l_returnflag"),
      "projection must prune to the 4 referenced columns")
  }

  test("q96 asof: single equi-key shuffle, no range-join explosion") {
    val p = plan("q96_asof_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"asof lowering must not produce a product join:\n$p")
  }

  test("d09 knn: query side broadcast, candidates scanned once") {
    val p = plan("d09_knn_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "query vectors must broadcast")
  }

  test("q111 grid spatial join: equi-join on cells, no cartesian product") {
    val p = plan("q111_spatial_grid_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"grid banding must keep the join equi-keyed on cells:\n$p")
  }

  test("q107 mark join: no row duplication path (distinct right keys)") {
    val p = plan("q107_mark_join")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
      s"right key-set must be deduplicated before the mark join:\n$p")
    assert(!p.contains("CartesianProduct"), s"mark join must stay keyed:\n$p")
  }

  test("d16 stratified sample: no shuffle before the filter") {
    // the keep decision is row-local — the only exchange is the final
    // per-stratum count aggregate
    val p = plan("d16_stratified_sample")
    val exchanges = "Exchange".r.findAllIn(p.replace("BroadcastExchange", "")).size
    assert(exchanges <= 2, s"sampling must not shuffle the corpus:\n$p")
  }

  test("q115 count-bug: decorrelates to outer join over a keyed count, no product") {
    val p = plan("q115_count_bug")
    assert(p.contains("LeftOuter"), s"COUNT subquery must decorrelate to an outer join:\n$p")
    assert(p.contains("partial_count"), "count must partial-aggregate before its shuffle")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"decorrelation must stay keyed:\n$p")
  }

  test("q116 NOT IN: plans as a null-aware anti join, not a product") {
    val p = plan("q116_not_in_null")
    assert(p.contains("LeftAnti"), s"expected anti join:\n$p")
    assert(!p.contains("CartesianProduct"), s"null-aware NOT IN must stay hashed:\n$p")
  }

  test("q117 EXISTS-under-OR: plans as an existence join") {
    assert(plan("q117_exists_or").contains("ExistenceJoin"))
  }

  test("q113 unsigned: range checks stay inside codegen") {
    val p = run("q113_unsigned").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(p.contains("WholeStageCodegen"), "unsigned checks fell out of codegen")
  }

  test("q114 timestamp_tz: no UDF in the plan (pure builtin arithmetic)") {
    val p = plan("q114_timestamp_tz")
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"),
      s"tz surface must be builtin expressions:\n$p")
  }

  test("q125 funnel: all stages keyed, no product joins") {
    val p = plan("q125_funnel")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"funnel must stay keyed on user_id:\n$p")
  }

  test("d21 decontamination: benchmark n-gram set broadcasts") {
    val p = plan("d21_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"benchmark set must broadcast:\n$p")
  }

  test("d25 fuzzy join: banding keeps the join hashed, not a cross product") {
    val p = plan("d25_fuzzy_join")
    assert(!p.contains("CartesianProduct"), s"length banding must avoid the cross join:\n$p")
  }

  test("d14 embedding neardup: block-pair equi-join, no full-corpus broadcast BNLJ") {
    val p = plan("d14_embedding_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"all-pairs work must decompose into the block-pair equi-join:\n$p")
  }

  test("d19 domain cap: window input is pre-capped map-side (no full-table window)") {
    val p = plan("d19_domain_cap")
    // the bounded-heap pre-cap is a typed mapPartitions stage; the window
    // must sit ABOVE it, never directly over the scan
    val winAt = p.indexOf("Window")
    val mapAt = math.max(p.indexOf("MapPartitions"), p.indexOf("SerializeFromObject"))
    assert(winAt >= 0 && mapAt >= 0 && winAt < mapAt, // executedPlan prints top-down
      s"window must consume the pre-capped relation:\n$p")
  }

  test("q138 session TVF: every window partitions on the session key (no global sort)") {
    val p = plan("q138_session_tvf")
    // three window passes (lag, running sum, min/max) — each must carry
    // user_id in its partition spec; an empty partition spec would be a
    // single-task global sort at 100 TB
    val specs = "windowspecdefinition\\(([^)]*)".r.findAllMatchIn(p.toLowerCase).map(_.group(1)).toSeq
    assert(specs.nonEmpty, s"no window in plan:\n$p")
    assert(specs.forall(_.contains("user_id")), s"unkeyed window spec found:\n$p")
  }

  test("q139 distinct on: one keyed row_number, filter runs group-limit style") {
    val p = plan("q139_distinct_on")
    val specs = "windowspecdefinition\\(([^)]*)".r.findAllMatchIn(p.toLowerCase).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("o_custkey")),
      s"row_number must partition on the DISTINCT ON key:\n$p")
    // Spark's WindowGroupLimit prunes each group to the top row before
    // the full window when the filter is rn = 1
    assert(p.contains("WindowGroupLimit"), s"expected WindowGroupLimit pruning:\n$p")
  }

  test("q142 window FILTER: lowers to one keyed window, no second pass") {
    val p = plan("q142_window_filter")
    val specs = "windowspecdefinition\\(([^)]*)".r.findAllMatchIn(p.toLowerCase).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("l_orderkey")),
      s"window must partition on l_orderkey:\n$p")
    // both FILTERed aggregates ride ONE Window operator over one
    // exchange — the CASE lowering must not add a pass per aggregate
    assert("(?s)Window".r.findAllIn(p).size <= 2, // Window + its spec echo
      s"expected a single window pass:\n$p")
  }

  test("q143 within distinct: two-level restatement, no pair-collection fold") {
    val p = plan("q143_within_distinct")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"unexpected join strategy:\n$p")
    val exchanges = "Exchange hashpartitioning\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(exchanges.exists(_.contains("o_custkey")),
      s"aggregation must shuffle on o_custkey:\n$p")
    // round 7: the plain grouped shape lowers to GROUP BY (g, keys) →
    // GROUP BY g — hash aggregates with O(1) per-key state; a
    // collect_list fold here means the scalable path regressed
    assert(!p.toLowerCase.contains("collect_list"),
      s"expected the two-level restatement, found a pair fold:\n$p")
  }

  test("ds07 above-average returns: broadcast dims, window re-uses the agg partitioning") {
    val p = plan("ds07_returns_above_avg")
    assert(p.contains("BroadcastHashJoin"), s"customer dim must broadcast:\n$p")
    assert(p.contains("partial_sum"), "map-side partial aggregation missing")
    // the per-nation window must NOT re-shuffle the whole fact — only
    // the customer-grain aggregate flows into it
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"unexpected join strategy:\n$p")
  }

  test("ds12 multi-nation orders: supplier broadcast + partial count-distinct") {
    val p = plan("ds12_multi_nation_orders")
    assert(p.contains("BroadcastHashJoin"), s"supplier dim must broadcast:\n$p")
    val exchanges = "Exchange hashpartitioning\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(exchanges.exists(_.contains("l_orderkey")),
      s"count-distinct must shuffle on the order key:\n$p")
  }

  test("q145 unbounded EXCLUDE: difference-of-windows, NO self-join") {
    val p = plan("q145_window_exclude")
    // the unbounded-frame EXCLUDE lowering is two window aggregates
    // (partition total minus peer total) — any join here means the
    // |partition|² fallback regressed into the scale path
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
      !p.contains("CartesianProduct"),
      s"unbounded EXCLUDE must not plan a join:\n$p")
    assert("(?i)window".r.findFirstIn(p).isDefined, s"expected window operators:\n$p")
  }

  test("q146 bounded EXCLUDE: explode-generated frame equi-joined on (partition, rn)") {
    val p = plan("q146_window_exclude_bounded")
    // the bounded-frame path generates frame row-numbers with
    // explode(sequence(...)) and EQUI-joins them — O(n·frame), hashed;
    // neither a cartesian pair enumeration nor a broadcast loop
    assert(p.toLowerCase.contains("explode"), s"expected generated frame rows:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"expected an equi-join on the frame keys:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bounded EXCLUDE must not pair-enumerate:\n$p")
    assert(p.contains("__jrn"), s"join must key on the generated frame rn:\n$p")
  }

  test("q147 mixed-frame EXCLUDE: explode equi-join + base window columns, NO self-join") {
    val p = plan("q147_window_exclude_mixed")
    // bounded EXCLUDE joins the generated frame; the unbounded calls
    // are window columns in the base CTE — a cartesian/nested-loop
    // join here means the |partition|² fallback regressed
    assert(p.toLowerCase.contains("explode"), s"expected generated frame rows:\n$p")
    assert(p.contains("__jrn"), s"join must key on the generated frame rn:\n$p")
    assert("(?i)window".r.findFirstIn(p).isDefined,
      s"unbounded calls must ride base window columns:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"mixed-frame EXCLUDE must not pair-enumerate:\n$p")
  }

  test("ds27: dimension broadcast + partial agg; the rank window rides the brand aggregate") {
    val p = plan("ds27_return_ratio_rank")
    // the part dimension broadcasts onto the fact scan; ranking runs
    // over the |brands|-row aggregate, never the fact table
    assert(p.contains("BroadcastHashJoin"), s"part dim must broadcast:\n$p")
    assert(p.contains("partial_sum"), s"map-side partial aggregation missing:\n$p")
    assert("(?i)window".r.findFirstIn(p).isDefined, s"expected rank window:\n$p")
  }

  test("ds30: exists/not-exists panel is ONE per-order aggregate, no self-join") {
    val p = plan("ds30_multi_supplier_clean")
    // the reference's EXISTS + NOT EXISTS pair collapses into a single
    // groupBy(l_orderkey) — a join here means the subquery pair
    // regressed into two extra fact passes
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
      !p.contains("CartesianProduct"), s"panel must not join:\n$p")
  }

  test("ds28: census panel is one conditional-aggregation scan, not N subquery scans") {
    val p = plan("ds28_quantity_band_panel")
    assert("FileScan parquet".r.findAllMatchIn(p).length == 1,
      s"panel must scan the fact table exactly once:\n$p")
  }

  test("whole-stage codegen covers the hot aggregation path") {
    val p = run("q01_pricing_summary").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(p.contains("WholeStageCodegen"), "hot path fell out of codegen")
  }

  // ---- round-10 pack gates (ds64–ds96, d42) -----------------------------

  test("ds68: count-gated bucket panel is ONE fact scan, no joins") {
    val p = plan("ds68_gated_buckets")
    assert("FileScan parquet".r.findAllMatchIn(p).length == 1,
      s"panel must scan the fact table exactly once:\n$p")
    assert(!p.contains("Join"), s"panel must not join:\n$p")
  }

  test("ds76: excess-discount decorrelates to one per-part aggregate join") {
    val p = plan("ds76_excess_discount")
    // the correlated scalar (per-part average) must become ONE keyed
    // aggregate joined back on l_partkey — never a per-row subquery
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"correlated compare regressed to a product:\n$p")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "per-part aggregate must be partial before its shuffle")
  }

  test("ds90: three-channel return shares are one conditional pass, no union of scans") {
    val p = plan("ds90_return_share_panel")
    assert("FileScan parquet".r.findAllMatchIn(p).length == 1,
      s"three channels must fold into one scan:\n$p")
    assert(!p.contains("Union"), s"no per-channel union:\n$p")
  }

  test("ds64: week-over-week self-join shuffles both sides on the same key") {
    val p = plan("ds64_week_over_week")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"shifted-key self-join must stay hashed:\n$p")
  }

  test("d42: span dedup is keyed shuffles only — no product, no corpus broadcast") {
    val p = plan("d42_span_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"span count/join must shuffle on the span key:\n$p")
  }

  test("ds65: four year-channel slices fold into ONE fact-side aggregate pass") {
    val p = plan("ds65_two_channel_growth")
    // lineitem + orders = exactly two scans; the 4 conditional sums and
    // the growth cross-multiply must NOT expand into per-slice scans
    assert("FileScan parquet".r.findAllMatchIn(p).length == 2,
      s"expected exactly lineitem+orders scans:\n$p")
    assert(p.contains("partial_sum"), "slices must aggregate map-side")
  }

  test("ds79: OR of memberships runs as ONE semi-join, not a union of fact passes") {
    val p = plan("ds79_or_membership")
    // orders appears twice (fact + big-spender derivation) and customer
    // once — the OR must not triple-scan the fact side
    assert("FileScan parquet".r.findAllMatchIn(p).length <= 4,
      s"OR-of-memberships expanded into extra fact scans:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"membership must stay hashed:\n$p")
  }

  test("ds92: the year window rides the monthly aggregate, no second fact pass") {
    val p = plan("ds92_month_deviation")
    assert("FileScan parquet".r.findAllMatchIn(p).length == 2,
      s"expected exactly lineitem+part scans (window on the aggregate):\n$p")
  }

  test("d43: semantic dedup pairs only within cells — no all-pairs product") {
    val p = plan("d43_semantic_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"within-cell pair join must stay hashed on (cid, pos):\n$p")
  }

  test("d44: audio decode is row-local — exactly one scan, no joins, no pre-sort shuffle") {
    val p = plan("d44_audio_features")
    assert("FileScan parquet".r.findAllMatchIn(p).length == 1,
      s"decode must be one pass over the media column:\n$p")
    assert(!p.contains("Join"), s"feature extraction must not join:\n$p")
  }

  test("d45/d46: span audit shuffles 8-byte hashes, no product join, no text re-shuffle") {
    val p = plan("d46_span_audit_l8")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"span-count join must stay hashed on the window hash:\n$p")
    // the shuffle key is the bigint hash column g, never the span text
    assert("Exchange hashpartitioning\\(g#\\d+L".r.findFirstIn(p).isDefined,
      s"expected the hash-keyed exchange:\n$p")
    assert("FileScan parquet".r.findAllMatchIn(p).length <= 2,
      s"grams are derived from ≤2 linear passes of documents:\n$p")
  }

  test("q148: filtered-MV substitution fires — the rollup reads the cached MV, not parquet") {
    try {
      val q = run("q148_mv_filtered_rollup")
      val lp = q.queryExecution.optimizedPlan
      assert(lp.toString.contains("InMemoryRelation"),
        s"query must be answered from the materialized slice:\n$lp")
      assert(lp.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }.isEmpty, s"orders must not be rescanned:\n$lp")
    } finally graft.plans.MaterializedViews.drop(spark, "q148_mv")
  }

  test("q149: union compensation — cached partials + ONE residual-slice scan") {
    try {
      val q = run("q149_mv_union_rollup")
      val lp = q.queryExecution.optimizedPlan
      assert(lp.toString.contains("InMemoryRelation"),
        s"covered slice must come from the cache:\n$lp")
      assert(lp.collect {
        case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
      }.nonEmpty, s"expected the partial-coverage union:\n$lp")
      assert(lp.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }.size == 1, s"residual slice scans the fact exactly once:\n$lp")
    } finally graft.plans.MaterializedViews.drop(spark, "q149_mv")
  }

  test("q160: FK union — tile cache + ONE pruned pushed-down fact residual, dims never scanned") {
    try {
      val q = run("q160_mv_fk_union")
      val lp = q.queryExecution.optimizedPlan
      assert(lp.toString.contains("InMemoryRelation"),
        s"covered slice must come from the star tile cache:\n$lp")
      assert(lp.collect {
        case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
      }.nonEmpty, s"expected the FK partial-coverage union:\n$lp")
      val scans = lp.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }
      assert(scans.size == 1, s"exactly the fact residual may scan:\n$lp")
      val loc = scans.head.relation
        .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
        .location.rootPaths.map(_.toString).mkString
      assert(loc.contains("orders") && !loc.contains("customer"),
        s"the residual must scan the FACT, never the dims: $loc")
      // the residual's range must reach the parquet scan, and its
      // ReadSchema must be pruned to keys + aggregated columns — a
      // residual reading o_custkey (the join key the FK made redundant)
      // or every column would be wrong at 100 TB
      val pp = q.queryExecution.executedPlan.toString
      assert(pp.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
        s"residual range must push to the scan:\n$pp")
      val read = pp.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
      assert(!read.contains("o_custkey") && !read.contains("o_orderpriority"),
        s"residual ReadSchema must be pruned: $read")
    } finally graft.plans.MaterializedViews.drop(spark, "q160_mv")
  }

  test("q150: join compensation — cached MV rollup ⋈ dimension, fact never rescanned") {
    try {
      val q = run("q150_mv_join_rollup")
      val lp = q.queryExecution.optimizedPlan
      assert(lp.toString.contains("InMemoryRelation"),
        s"the star must be answered from the cached MV:\n$lp")
      val scans = lp.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }
      assert(scans.size == 1,
        s"exactly ONE scan (the nation dimension) may remain:\n$lp")
      assert(scans.head.schema.fieldNames.contains("n_name"),
        s"the remaining scan must be the dimension:\n$lp")
      // physically: the MV-rows × dimension join broadcasts — no
      // fact-sized shuffle survives the rewrite
      val pp = q.queryExecution.executedPlan.toString
      assert(pp.contains("BroadcastHashJoin"),
        s"tiny dimension join must broadcast:\n$pp")
    } finally graft.plans.MaterializedViews.drop(spark, "q150_mv")
  }

  test("q151: snowflake compensation — ONLY the two dimension scans remain") {
    try {
      val q = run("q151_mv_snowflake_rollup")
      val lp = q.queryExecution.optimizedPlan
      assert(lp.toString.contains("InMemoryRelation"),
        s"the star must be answered from the cached MV:\n$lp")
      val scans = lp.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }
      assert(scans.size == 2, s"exactly nation + region may be scanned:\n$lp")
      val scanned = scans.flatMap(_.schema.fieldNames).toSet
      assert(scanned.contains("n_name") && scanned.contains("r_name"),
        s"the remaining scans must be the dimensions:\n$lp")
    } finally graft.plans.MaterializedViews.drop(spark, "q151_mv")
  }

  test("q153: derived-measure rollup — Q1 measures answered with zero lineitem scans") {
    try {
      val q = run("q153_mv_measure_rollup")
      val lp = q.queryExecution.optimizedPlan
      assert(lp.toString.contains("InMemoryRelation"),
        s"measure rollup must come from the cached tile:\n$lp")
      assert(lp.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }.isEmpty, s"lineitem must not be rescanned:\n$lp")
    } finally graft.plans.MaterializedViews.drop(spark, "q153_mv")
  }

  test("q154: ROLLUP grouping sets ride the tile — Expand over the cache, zero fact scans") {
    try {
      val q = run("q154_mv_grouping_sets")
      val lp = q.queryExecution.optimizedPlan
      assert(lp.collect {
        case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e
      }.nonEmpty, s"the grouping-set Expand must survive the rewrite:\n$lp")
      assert(lp.toString.contains("InMemoryRelation"),
        s"the rollup must be answered from the cached tile:\n$lp")
      assert(lp.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }.isEmpty, s"orders must not be rescanned:\n$lp")
    } finally graft.plans.MaterializedViews.drop(spark, "q154_mv")
  }

  test("q156: cross-tile subsumption — the FINER tile answers, fact never rescanned") {
    try {
      val q = run("q156_mv_cross_tile")
      val lp = q.queryExecution.optimizedPlan
      assert(lp.toString.contains("InMemoryRelation"),
        s"COUNT(DISTINCT key-of-finer-tile) must ride a tile:\n$lp")
      assert(lp.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }.isEmpty, s"orders must not be rescanned:\n$lp")
      val cached = lp.collect {
        case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m
      }
      assert(cached.exists(_.output.exists(_.name == "o_orderpriority")),
        s"the FINER tile (priority key) must be the one substituted:\n$lp")
    } finally {
      graft.plans.MaterializedViews.drop(spark, "q156_mv_coarse")
      graft.plans.MaterializedViews.drop(spark, "q156_mv_fine")
    }
  }

  test("q157: durable tile — the re-adopted partials answer, fact never rescanned") {
    try {
      val q = run("q157_mv_durable_tile")
      val lp = q.queryExecution.optimizedPlan
      assert(lp.toString.contains("InMemoryRelation"),
        s"the reloaded tile must answer the rollup:\n$lp")
      assert(lp.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }.isEmpty, s"orders must not be rescanned:\n$lp")
    } finally graft.plans.MaterializedViews.drop(spark, "q157_mv")
  }

  test("q158: advisor loop — the workload rollup rides a SUGGESTED tile") {
    try {
      val q = run("q158_mv_advisor_loop")
      val lp = q.queryExecution.optimizedPlan
      assert(lp.toString.contains("InMemoryRelation"),
        s"the suggested tile must answer the rollup:\n$lp")
      assert(lp.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }.isEmpty, s"orders must not be rescanned:\n$lp")
    } finally graft.plans.MaterializedViews.clear()
  }

  test("q159: FK-declared star tile answers the fact-only rollup — zero scans") {
    try {
      val q = run("q159_mv_fk_tile")
      val lp = q.queryExecution.optimizedPlan
      assert(lp.toString.contains("InMemoryRelation"),
        s"the star tile must answer the fact-only rollup:\n$lp")
      assert(lp.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }.isEmpty, s"neither orders nor customer may be rescanned:\n$lp")
    } finally {
      graft.plans.MaterializedViews.drop(spark, "q159_mv")
      graft.catalog.Constraints.clear()
    }
  }

  test("q155: ROLLUP(year(key), status) rides the day tile — zero fact scans") {
    try {
      val q = run("q155_mv_time_grouping_sets")
      val lp = q.queryExecution.optimizedPlan
      assert(lp.collect {
        case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e
      }.nonEmpty, s"the grouping-set Expand must survive the rewrite:\n$lp")
      assert(lp.toString.contains("InMemoryRelation"),
        s"the time rollup must be answered from the cached tile:\n$lp")
      assert(lp.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }.isEmpty, s"orders must not be rescanned:\n$lp")
    } finally graft.plans.MaterializedViews.drop(spark, "q155_mv")
  }

  test("q152: year() rollup from the day-keyed tile — fact never rescanned") {
    try {
      val q = run("q152_mv_time_rollup")
      val lp = q.queryExecution.optimizedPlan
      assert(lp.toString.contains("InMemoryRelation"),
        s"time rollup must come from the cached tile:\n$lp")
      assert(lp.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }.isEmpty, s"orders must not be rescanned:\n$lp")
    } finally graft.plans.MaterializedViews.drop(spark, "q152_mv")
  }

  test("q173: semi rewrite — broadcast existence probe builds ONE column") {
    val p = plan("q173_semi_join_agg")
    assert(p.contains("LeftSemi"), s"expected a semi join:\n$p")
    assert(p.contains("BroadcastHashJoin"), "the probe side should broadcast")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint>"),
      s"lineitem must contribute nothing but the join key:\n$p")
  }

  test("q174: eager aggregation — the partial groups by the join key BELOW the join") {
    val p = plan("q174_eager_agg")
    assert(p.contains("_eager_0"), s"no eager partial in the plan:\n$p")
    assert(p.contains("HashAggregate(keys=[o_custkey"),
      s"the partial must key on the fact join key:\n$p")
  }

  test("q176: outer-join eager aggregation keeps the LEFT join") {
    val p = plan("q176_eager_agg_outer")
    assert(p.contains("_eager_0"), s"no eager partial in the plan:\n$p")
    assert(p.contains("LeftOuter"), s"the outer join must survive the push:\n$p")
  }
}
