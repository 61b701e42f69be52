package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core relational operators: scan, filter, project, join (inner / semi /
  * anti / outer / cross), aggregate (plain, rollup, distinct, FILTER),
  * sort/limit. Semantics follow the reference algebra in
  * `rel/core/{TableScan,Filter,Project,Join,Aggregate,Sort}.java` (see
  * /root/reference, cited per query); execution is plain Catalyst —
  * group-bys get map-side partial aggregation, small dimension tables are
  * broadcast explicitly so the plans hold at 100 TB fact-table scale.
  */
object Relational {

  /** TPC-H Q1-style pricing summary. Aggregate with multiple calls incl.
    * order-independent decimal sums (ref: rel/core/Aggregate.java:118).
    * Scale: partial agg on 6 groups → tiny shuffle regardless of input. */
  val q01_pricing_summary = Q(
    (s, dir) => {
      // spread (r15): the 4 decimal sums are the stage cost; on the
      // driver's single-row-group files the scan+partial-agg serialized
      // onto one core (measured ~520 ms of a ~750 ms query).
      // High-cardinality l_orderkey as the distribution key — the group
      // keys have only 6 values (§2.5: never hash-partition on a
      // key with fewer distinct values than partitions).
      val li = T.spread(s, dir, "lineitem", "l_orderkey")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          T.dsum(col("l_quantity")).as("sum_qty"),
          T.dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(T.dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(12, 2)) - T.dec2(col("l_discount"))))
            .cast(DoubleType).as("sum_disc_price"),
          T.davg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** Filter + project with computed expressions; predicates and the
    * 4-column read schema push down to the parquet scan
    * (ref: rel/core/{Filter,Project}.java). */
  val q02_filter_project = Q(
    (s, dir) => {
      T(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-01-01") && col("l_quantity") >= 48.0 && col("l_discount") >= 0.08)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (T.dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(12, 2)) - T.dec2(col("l_discount"))))
            .cast(DoubleType).as("net_price"),
          col("l_quantity").cast(DoubleType).as("qty"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
        CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS net_price,
        CAST(l_quantity AS DOUBLE) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' AND l_quantity >= 48.0 AND l_discount >= 0.08
      ORDER BY l_orderkey, l_linenumber"""))

  /** TPC-H Q3-style 3-way join + agg + top-K
    * (ref: rel/core/Join.java:1, EnumerableLimitSort.java:38). The 1500-row
    * customer dim is broadcast; orders⋈lineitem shuffles on the join key;
    * top-K runs as TakeOrderedAndProject (no global sort at scale). */
  val q03_topk_join = Q(
    (s, dir) => {
      val cust = T(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = T(s, dir, "orders").filter(col("o_orderdate") < lit("1998-03-15"))
      // spread on the join key (r15): the probe side's join+agg work was
      // serialized onto the single row-group's one scan task.
      val li = T.spread(s, dir, "lineitem", "l_orderkey")
        .filter(col("l_shipdate") > lit("1998-03-15"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(T.dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(12, 2)) - T.dec2(col("l_discount"))))
          .cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    },
    Some("""
      SELECT l_orderkey, o_orderdate, o_orderpriority,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, o_orderdate, l_orderkey
      LIMIT 10"""))

  /** EXISTS → left-semi join (ref: JoinRelType.java:59,
    * rel/rules/SemiJoinRule.java). Semi join never duplicates left rows,
    * so no post-dedup shuffle is needed. */
  val q04_exists_semi = Q(
    (s, dir) => {
      val ord = T(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01") && col("o_orderdate") < lit("1997-04-01"))
      val bigLines = T(s, dir, "lineitem").filter(col("l_quantity") > 45).select("l_orderkey")
      ord.join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  /** TPC-H Q5-style multi-way join through region→nation→customer→orders→
    * lineitem→supplier (ref: rel/core/Join.java). All dims broadcast; the
    * only shuffle is orders⋈lineitem + final 25-group agg. */
  val q05_local_supplier = Q(
    (s, dir) => {
      val region = T(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = T(s, dir, "nation")
      val cust = T(s, dir, "customer")
      val supp = T(s, dir, "supplier")
      val ord = T(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
      // spread on the first join key (r15): five broadcast probes ran on
      // the single-row-group scan's one task (measured ~520 ms stage).
      val li = T.spread(s, dir, "lineitem", "l_orderkey")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp,
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(T.dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(12, 2)) - T.dec2(col("l_discount"))))
          .cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""
      SELECT n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name"""))

  /** TPC-H Q6 forecast revenue: tight scan+filter+agg, fully pushed to the
    * parquet reader (ref: rel/core/Filter.java:1). */
  val q06_forecast_revenue = Q(
    (s, dir) => {
      T(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(T.dec2(col("l_extendedprice")) * T.dec2(col("l_discount"))).cast(DoubleType).as("revenue"))
    },
    Some("""
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""))

  /** TPC-H Q13-style left outer join + two-level aggregate, keeping
    * customers with zero orders (ref: JoinRelType.java:30 LEFT). */
  val q07_cust_order_dist = Q(
    (s, dir) => {
      val cust = T(s, dir, "customer")
      val ord = T(s, dir, "orders")
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""
      SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey) t
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC"""))

  /** FULL OUTER join of two per-day event aggregates
    * (ref: JoinRelType.java:30 FULL). */
  val q08_full_outer = Q(
    (s, dir) => {
      val ev = T(s, dir, "events")
      def daily(typ: String, cname: String) =
        ev.filter(col("event_type") === typ)
          .groupBy(to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as(cname))
      val c = daily("click", "nc")
      val p = daily("purchase", "np")
      c.join(p, c("d") === p("d"), "full")
        .select(
          coalesce(c("d"), p("d")).as("day"),
          coalesce(col("nc"), lit(0L)).as("clicks"),
          coalesce(col("np"), lit(0L)).as("purchases"))
        .orderBy("day")
    },
    Some("""
      WITH c AS (SELECT CAST(ts AS DATE) AS d, COUNT(*) AS nc FROM events WHERE event_type = 'click' GROUP BY 1),
           p AS (SELECT CAST(ts AS DATE) AS d, COUNT(*) AS np FROM events WHERE event_type = 'purchase' GROUP BY 1)
      SELECT COALESCE(c.d, p.d) AS day, COALESCE(nc, 0) AS clicks, COALESCE(np, 0) AS purchases
      FROM c FULL OUTER JOIN p ON c.d = p.d
      ORDER BY day"""))

  /** Cross join (small × small only — ref: rel/core/Join.java FULL cartesian;
    * at scale this is only sane when one side is tiny and broadcast). */
  val q09_cross_join = Q(
    (s, dir) => {
      val region = T(s, dir, "region").select("r_name")
      val statuses = T(s, dir, "orders").select(col("o_orderstatus")).distinct()
      region.crossJoin(broadcast(statuses)) // fixed cardinality: 5 regions × ≤3 statuses
        .orderBy("r_name", "o_orderstatus")
    },
    Some("""
      SELECT r_name, o_orderstatus
      FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) t
      ORDER BY r_name, o_orderstatus"""))

  /** ROLLUP grouping sets (ref: rel/core/Aggregate.java:118-167 groupSets).
    * Catalyst expands to a single Expand + one shuffle. */
  val q10_rollup = Q(
    (s, dir) => {
      T(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), T.dsum(col("l_quantity")).as("qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  /** CUBE grouping sets with GROUPING() markers
    * (ref: SqlStdOperatorTable.java:244 GROUPING, :226 CUBE). */
  val q11_cube_grouping = Q(
    (s, dir) => {
      T(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).cast(IntegerType).as("g_status"),
          grouping(col("o_orderpriority")).cast(IntegerType).as("g_prio"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
    },
    Some("""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""))

  /** Multiple DISTINCT aggregates in one pass (ref:
    * rel/rules/AggregateExpandDistinctAggregatesRule.java:1 — Spark's
    * RewriteDistinctAggregates performs the same expansion). */
  val q12_distinct_agg = Q(
    (s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    Some("""
      SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
        COUNT(DISTINCT l_partkey) AS n_part, COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Aggregate FILTER clause (ref: rel/core/AggregateCall.java:65-76). */
  val q13_agg_filter = Q(
    (s, dir) => {
      T(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", T.dec2(col("o_totalprice")))).cast(DoubleType).as("tot_o"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority,
        COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS tot_o,
        COUNT(*) AS n
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** HAVING → post-aggregation filter (ref: rel/core/Filter.java over Aggregate). */
  val q14_having = Q(
    (s, dir) => {
      T(s, dir, "part")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), T.dsum(col("p_retailprice")).as("tot"))
        .filter(col("n") > 30)
        .orderBy("p_brand")
    },
    Some("""
      SELECT p_brand, COUNT(*) AS n, CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS tot
      FROM part GROUP BY p_brand HAVING COUNT(*) > 30 ORDER BY p_brand"""))

  /** Sort + OFFSET + FETCH (ref: rel/core/Sort.java:1, EnumerableLimit.java:1). */
  val q15_sort_offset_fetch = Q(
    (s, dir) => {
      T(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .offset(10).limit(20)
    },
    Some("""
      SELECT c_custkey, c_name, c_acctbal FROM customer
      ORDER BY c_acctbal DESC, c_custkey OFFSET 10 LIMIT 20"""))

  /** min_by/max_by — ARG_MIN/ARG_MAX (ref: SqlStdOperatorTable.java:1126-1135). */
  val q16_arg_min_max = Q(
    (s, dir) => {
      T(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("priciest_order"),
          min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("cheapest_order"),
          max(col("o_totalprice")).as("max_price"),
          min(col("o_totalprice")).as("min_price"))
        .orderBy("o_orderstatus")
    },
    // DuckDB 1.0's arg_max has no composite ordering key, so the oracle
    // breaks ties with window row_numbers (equivalent to max_by on a
    // (price, orderkey) struct).
    Some("""
      SELECT o_orderstatus,
        MAX(CASE WHEN rn_max = 1 THEN o_orderkey END) AS priciest_order,
        MAX(CASE WHEN rn_min = 1 THEN o_orderkey END) AS cheapest_order,
        MAX(o_totalprice) AS max_price,
        MIN(o_totalprice) AS min_price
      FROM (SELECT o_orderstatus, o_orderkey, o_totalprice,
              ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_max,
              ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS rn_min
            FROM orders) t
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  val all: Map[String, Q] = Map(
    "q01_pricing_summary" -> q01_pricing_summary,
    "q02_filter_project" -> q02_filter_project,
    "q03_topk_join" -> q03_topk_join,
    "q04_exists_semi" -> q04_exists_semi,
    "q05_local_supplier" -> q05_local_supplier,
    "q06_forecast_revenue" -> q06_forecast_revenue,
    "q07_cust_order_dist" -> q07_cust_order_dist,
    "q08_full_outer" -> q08_full_outer,
    "q09_cross_join" -> q09_cross_join,
    "q10_rollup" -> q10_rollup,
    "q11_cube_grouping" -> q11_cube_grouping,
    "q12_distinct_agg" -> q12_distinct_agg,
    "q13_agg_filter" -> q13_agg_filter,
    "q14_having" -> q14_having,
    "q15_sort_offset_fetch" -> q15_sort_offset_fetch,
    "q16_arg_min_max" -> q16_arg_min_max)
}
