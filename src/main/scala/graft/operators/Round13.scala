package graft.operators

import org.apache.spark.sql.functions._

import graft.{Q, T}
import graft.plans.MaterializedViews

/** Round-13 pack: cross-tile subsumption, durable tiles, and the closed
  * profile → recommend → materialize → rewrite advisor loop, each
  * exercised end-to-end under the driver's DuckDB oracle.
  */
object Round13 {

  /** Cross-tile subsumption with cost-based tile choice (ref: plan/
    * SubstitutionVisitor.java unification across ALL registered
    * materializations + materialize/Lattice.java getTile least-cost
    * selection): TWO tiles are registered over the same fact — a COARSE
    * one keyed by status only, and a FINER one keyed by
    * (status, priority). The query needs COUNT(DISTINCT o_orderpriority)
    * per status: the coarse tile cannot answer it (priority is not a key
    * it carries), so substitution keeps probing and rolls the FINER tile
    * up — priority is one of its keys, so the tile carries each
    * (status, priority) combination exactly once and the distinct count
    * re-aggregates exactly; SUM folds from partials. Candidates probe
    * cheapest-first (tile row count), so when several tiles can answer,
    * the smallest adequate one wins — plan-gated in
    * MaterializedViewSpec. At 100 TB: the dashboard's distinct-count
    * panel rides the finer tile instead of re-scanning the fact. */
  val q156_mv_cross_tile = Q(
    (s, dir) => {
      val orders = T(s, dir, "orders")
        .withColumn("o_totalprice", T.dec2(col("o_totalprice")))
      MaterializedViews.registerOnce(s, "q156_mv_coarse", orders,
        keys = Seq("o_orderstatus"), sums = Seq("o_totalprice"))
      MaterializedViews.registerOnce(s, "q156_mv_fine", orders,
        keys = Seq("o_orderstatus", "o_orderpriority"),
        sums = Seq("o_totalprice"))
      orders.groupBy("o_orderstatus")
        .agg(countDistinct(col("o_orderpriority")).as("prios"),
          sum("o_totalprice").cast("double").as("rev"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    },
    Some("""
      SELECT o_orderstatus, COUNT(DISTINCT o_orderpriority) AS prios,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev,
             COUNT(*) AS n
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Durable tile surviving a session restart (ref: materialize/
    * MaterializationService.java + MaterializationActor.java — the
    * reference stores materializations as actual schema tables keyed and
    * re-resolved centrally; they survive the connection): the tile's
    * partials persist as parquet under a lattice directory, the
    * in-session registration is released (the restart analog — caches
    * gone, registry empty for this name), and adoptTiles re-loads the
    * partials and re-registers the rewrite. The rollup below then
    * answers from the RELOADED tile — the fact is never rescanned
    * (plan-gated in MaterializedViewDurableSpec, which also drives a
    * true second SparkSession and the DML-invalidation-of-the-durable-
    * home path). At 100 TB this is what makes the lattice economics
    * survive a driver restart: the most expensive pass in the system —
    * the fact pre-aggregation — is paid once, not once per session. */
  val q157_mv_durable_tile = Q(
    (s, dir) => {
      val orders = T(s, dir, "orders")
        .withColumn("o_totalprice", T.dec2(col("o_totalprice")))
      val lat = java.nio.file.Files.createTempDirectory("graft_lattice").toString
      MaterializedViews.registerOnce(s, "q157_mv", orders,
        keys = Seq("o_orderpriority"), sums = Seq("o_totalprice"))
      MaterializedViews.persistTile(s, "q157_mv", lat)
      MaterializedViews.release(s, "q157_mv") // restart analog
      MaterializedViews.adoptTiles(s, lat)
      orders.groupBy("o_orderpriority")
        .agg(sum("o_totalprice").cast("double").as("rev"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev,
             COUNT(*) AS n
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** The closed advisor loop (ref: materialize/TileSuggester.java →
    * Lattice.java auto-materialization): ONE profiling pass estimates
    * tile sizes over the dimension lattice of (status, priority), the
    * suggestions within the row budget materialize as
    * substitutable MVs, and the workload rollup below is answered from a
    * suggested tile with zero fact scans (plan-gated in DmlLatticeSpec,
    * along with the budget rejecting an oversized tile). This is the
    * reference's profile → recommend → materialize → rewrite loop as one
    * composition. */
  val q158_mv_advisor_loop = Q(
    (s, dir) => {
      val orders = T(s, dir, "orders")
        .withColumn("o_totalprice", T.dec2(col("o_totalprice")))
      graft.catalog.Lattice.materializeSuggestions(s, "q158_tile", orders,
        dims = Seq("o_orderstatus", "o_orderpriority"),
        sums = Seq("o_totalprice"), budgetRows = 1000L, maxTiles = 2): Unit
      orders.groupBy("o_orderstatus", "o_orderpriority")
        .agg(sum("o_totalprice").cast("double").as("rev"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus", "o_orderpriority")
    },
    Some("""
      SELECT o_orderstatus, o_orderpriority,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev,
             COUNT(*) AS n
      FROM orders GROUP BY o_orderstatus, o_orderpriority
      ORDER BY o_orderstatus, o_orderpriority"""))

  /** Constraint-based tile answering (ref: rel/rules/materialize/
    * MaterializedViewJoinRule + plan/RelOptReferentialConstraint +
    * schema/Statistic.java getReferentialConstraints): the tile
    * pre-aggregates the orders⋈customer STAR; the query rolls up ORDERS
    * ALONE. A declared foreign key o_custkey → c_custkey proves the
    * tile's extra join lossless (unique key, non-null FK, referential
    * integrity — the TPC-H contract), so every fact row matched exactly
    * one customer and the star's partials ARE the fact's partials: the
    * fact-only rollup answers from the tile with zero scans (plan-gated
    * in MvConstraintSpec + PlanQualitySpec). At 100 TB this halves the
    * lattice bill: ONE wide star tile serves every join-subset rollup —
    * without constraints each subset needs its own materialization. */
  val q159_mv_fk_tile = Q(
    (s, dir) => {
      val orders = T(s, dir, "orders")
        .withColumn("o_totalprice", T.dec2(col("o_totalprice")))
      val customer = T(s, dir, "customer")
      val star = orders.join(customer, col("o_custkey") === col("c_custkey"))
      MaterializedViews.registerOnce(s, "q159_mv", star,
        keys = Seq("o_orderstatus", "c_nationkey"), sums = Seq("o_totalprice"))
      graft.catalog.Constraints.declareForeignKey(s,
        s"$dir/orders.parquet", "o_custkey", s"$dir/customer.parquet", "c_custkey")
      orders.groupBy("o_orderstatus")
        .agg(sum("o_totalprice").cast("double").as("rev"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    },
    Some("""
      SELECT o_orderstatus,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev,
             COUNT(*) AS n
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  val all: Map[String, Q] = Map(
    "q156_mv_cross_tile" -> q156_mv_cross_tile,
    "q157_mv_durable_tile" -> q157_mv_durable_tile,
    "q158_mv_advisor_loop" -> q158_mv_advisor_loop,
    "q159_mv_fk_tile" -> q159_mv_fk_tile)
}
