package graft.operators

import org.apache.spark.sql.functions._

import graft.{Q, T}
import graft.plans.MaterializedViews

/** Round-12 pack: MV join compensation exercised end-to-end under the
  * driver's DuckDB oracle.
  */
object Round12 {

  /** JOIN compensation (ref: rel/rules/materialize/MaterializedViewRules
    * .java join variants + plan/SubstitutionVisitor.java unification):
    * the MV materializes orders⋈customer pre-aggregated by
    * (o_orderstatus, c_nationkey); the query joins the same star to ONE
    * extra dimension — nation — and rolls up by n_name. The optimizer
    * answers it as (cached MV rollup) ⋈ nation: the fact-side join and
    * shuffle are gone, the only scan left is the 25-row dimension
    * (plan-gated in PlanQualitySpec). Aggregates stay exact: the revenue
    * column is cast to DECIMAL(12,2) BELOW the join, so the MV's partial
    * sums are exact decimals and the rollup is order-independent — the
    * substituted result is bit-identical to the direct 3-way join at any
    * partitioning. At 100 TB this is the dashboard-over-lattice shape:
    * the star is scanned once at registration, and every later
    * by-dimension breakdown runs MV-rows × dimension, both tiny. */
  val q150_mv_join_rollup = Q(
    (s, dir) => {
      val orders = T(s, dir, "orders")
        .withColumn("o_totalprice", T.dec2(col("o_totalprice")))
      val customer = T(s, dir, "customer")
      val nation = T(s, dir, "nation")
      val star = orders.join(customer, col("o_custkey") === col("c_custkey"))
      MaterializedViews.registerOnce(s, "q150_mv", star,
          keys = Seq("o_orderstatus", "c_nationkey"),
          sums = Seq("o_totalprice"))
      star.join(nation, col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n"), sum("o_totalprice").as("rev0"))
        .select(col("n_name"), col("n"),
          col("rev0").cast("double").as("rev"))
        .orderBy("n_name")
    },
    Some("""
      SELECT n_name, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev
      FROM orders, customer, nation
      WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name"""))

  /** Snowflake join compensation with weighted dim aggregates (ref:
    * MaterializedViewRules join variants + the aggregate-join-transpose
    * identity): the same orders⋈customer star MV answers a query that
    * adds TWO dimension layers — nation on the MV key, region bridged
    * through NATION's column — and aggregates BOTH star columns (from
    * partials) and dim columns: COUNT(n_name) re-weights each dim match
    * by the group's row count (__mv_cnt), so the result is identical to
    * the row-level 4-way join. Plan-gated: only the two dimension scans
    * remain (PlanQualitySpec). At 100 TB: zero fact I/O for any
    * by-geography breakdown once the star tile exists. */
  val q151_mv_snowflake_rollup = Q(
    (s, dir) => {
      val orders = T(s, dir, "orders")
        .withColumn("o_totalprice", T.dec2(col("o_totalprice")))
      val customer = T(s, dir, "customer")
      val nation = T(s, dir, "nation")
      val region = T(s, dir, "region")
      val star = orders.join(customer, col("o_custkey") === col("c_custkey"))
      MaterializedViews.registerOnce(s, "q151_mv", star,
          keys = Seq("o_orderstatus", "c_nationkey"),
          sums = Seq("o_totalprice"))
      star.join(nation, col("c_nationkey") === col("n_nationkey"))
        .join(region, col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n"), sum("o_totalprice").as("rev0"),
          count(col("n_name")).as("cn"))
        .select(col("r_name"), col("n"),
          col("rev0").cast("double").as("rev"), col("cn"))
        .orderBy("r_name")
    },
    Some("""
      SELECT r_name, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev,
             COUNT(n_name) AS cn
      FROM orders, customer, nation, region
      WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
        AND n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""))

  /** Time-hierarchy rollup from a day-keyed tile (ref: materialize/
    * Lattice.java time dimensions + SubstitutionVisitor expression
    * unification): the MV is keyed by (status, orderdate) at DAY grain;
    * the query groups by year(o_orderdate) — a deterministic expression
    * of a grouping key — so equal keys imply equal years and the rollup
    * merely MERGES tile groups, which is exactly the partial merge. The
    * fact table is never rescanned (plan-gated). At 100 TB this is why
    * ONE day-grain tile serves every month/quarter/year dashboard. */
  val q152_mv_time_rollup = Q(
    (s, dir) => {
      val orders = T(s, dir, "orders")
      MaterializedViews.registerOnce(s, "q152_mv", orders,
          keys = Seq("o_orderstatus", "o_orderdate"),
          sums = Nil, maxs = Seq("o_orderkey"))
      orders.groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(count(lit(1)).as("n"), max("o_orderkey").as("last_key"))
        .orderBy("yr")
    },
    Some("""
      SELECT year(o_orderdate) AS yr, COUNT(*) AS n,
             max(o_orderkey) AS last_key
      FROM orders GROUP BY 1 ORDER BY yr"""))

  /** Derived-measure tile (ref: materialize/Lattice.java measure
    * expressions + MaterializedViewAggregateRule): the MV carries
    * SUM/COUNT partials for the EXPRESSIONS qty = dec(l_quantity) and
    * disc_price = dec(l_extendedprice) × (1 − dec(l_discount)) — the
    * TPC-H Q1 measures — keyed by (returnflag, linestatus) with the Q1
    * ship-date filter absorbed exactly. The query's aggregate ARGUMENTS
    * match the registered expressions by canonical folded SQL and roll
    * up from the cached partials: zero lineitem scans (plan-gated).
    * Decimal arithmetic keeps every partial exact, so the substituted
    * result is bit-identical at any partitioning. At 100 TB this is the
    * full lattice play: ONE pass over the fact precomputes the measure
    * expressions every pricing dashboard reads. */
  val q153_mv_measure_rollup = Q(
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val li = T(s, dir, "lineitem").filter(col("l_shipdate") <= lit("1998-09-02"))
      def qty = T.dec2(col("l_quantity"))
      def discPrice = T.dec2(col("l_extendedprice")) *
        (lit(1).cast(DecimalType(12, 2)) - T.dec2(col("l_discount")))
      MaterializedViews.registerOnce(s, "q153_mv", li,
          keys = Seq("l_returnflag", "l_linestatus"), sums = Nil,
          sumExprs = Seq("qty" -> qty, "disc_price" -> discPrice))
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(qty).cast("double").as("sum_qty"),
          sum(discPrice).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** GROUPING SETS / ROLLUP / CUBE from a tile (ref: rel/rules/
    * AggregateStarTableRule.java + materialize/Lattice.java — a tile
    * whose keys cover the grouping columns answers any grouping-set
    * query over them). Catalyst plans ROLLUP as Aggregate over Expand;
    * the rewrite substitutes the cached tile BELOW the same Expand,
    * re-pointing grouping entries at tile keys and aggregates at the
    * carried partials — so the whole 3-level rollup (status×priority,
    * status, grand total) runs over tile rows with zero fact scans
    * (plan-gated in PlanQualitySpec). Exact by the merge argument: all
    * rows of a tile group share every key, so nulling a key per
    * grouping set merges whole groups — precisely the partial merge.
    * At 100 TB this is the cube-dashboard play: one tile pass absorbs
    * every ROLLUP/CUBE panel a BI layer fires. */
  val q154_mv_grouping_sets = Q(
    (s, dir) => {
      val orders = T(s, dir, "orders")
        .withColumn("o_totalprice", T.dec2(col("o_totalprice")))
      MaterializedViews.registerOnce(s, "q154_mv", orders,
          keys = Seq("o_orderstatus", "o_orderpriority"),
          sums = Seq("o_totalprice"))
      orders.rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum("o_totalprice").cast("double").as("rev"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev,
             CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
      FROM orders
      GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      ORDER BY gid, o_orderstatus, o_orderpriority"""))

  /** Time-hierarchy × grouping sets (ref: AggregateStarTableRule +
    * Lattice.java time dimensions): ROLLUP(year(o_orderdate),
    * o_orderstatus) answered from the DAY-keyed tile — Catalyst
    * extracts year(...) into the Project below Expand, and the rewrite
    * rebinds the grouping entry through that alias to the tile key
    * (equal day keys imply equal years, so the per-set merge IS the
    * partial merge). Zero fact scans (plan-gated). At 100 TB: the
    * year/quarter/month drill-down panel never rescans the fact. */
  val q155_mv_time_grouping_sets = Q(
    (s, dir) => {
      val orders = T(s, dir, "orders")
      MaterializedViews.registerOnce(s, "q155_mv", orders,
        keys = Seq("o_orderstatus", "o_orderdate"),
        sums = Nil, maxs = Seq("o_orderkey"))
      orders.rollup(year(col("o_orderdate")).as("yr"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), max("o_orderkey").as("last_key"),
          grouping_id().as("gid"))
        .select(col("yr").cast("long").as("yr"), col("o_orderstatus"),
          col("n"), col("last_key"), col("gid"))
        .orderBy(col("gid"), col("yr"), col("o_orderstatus"))
    },
    Some("""
      SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderstatus,
             COUNT(*) AS n, MAX(o_orderkey) AS last_key,
             CAST(GROUPING(year(o_orderdate), o_orderstatus) AS BIGINT) AS gid
      FROM orders
      GROUP BY ROLLUP(year(o_orderdate), o_orderstatus)
      ORDER BY gid, yr, o_orderstatus"""))

  val all: Map[String, Q] = Map(
    "q150_mv_join_rollup" -> q150_mv_join_rollup,
    "q151_mv_snowflake_rollup" -> q151_mv_snowflake_rollup,
    "q152_mv_time_rollup" -> q152_mv_time_rollup,
    "q153_mv_measure_rollup" -> q153_mv_measure_rollup,
    "q154_mv_grouping_sets" -> q154_mv_grouping_sets,
    "q155_mv_time_grouping_sets" -> q155_mv_time_grouping_sets)
}
