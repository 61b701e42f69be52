package graft.operators

import org.apache.spark.sql.functions._

import graft.{Q, T}
import graft.plans.MaterializedViews

/** Round-14 pack: FK-subsumption beyond equality compensation (the
  * fact-only union residual) and the advisor → durable-lattice
  * composition, each end-to-end under the driver's DuckDB oracle.
  */
object Round14 {

  /** FK union compensation (ref: rel/rules/materialize/
    * MaterializedViewAggregateRule.java union rewriting composed with
    * RelOptReferentialConstraint join compensation): the tile
    * pre-aggregates the orders⋈customer STAR over the hot window
    * (1997-07-01+); the query rolls up ORDERS ALONE over a strictly
    * WIDER window (1997-01-01+). The declared FK o_custkey → c_custkey
    * proves the star's join lossless, so the tile's fact-side partials
    * answer the covered slice, and the residual half-year is a partial
    * aggregate over the FACT only — the optimizer splices
    * rollup(cached star partials ∪ fact-slice partials); customer is
    * never scanned, orders only for the residual months (plan-gated in
    * MvConstraintSpec). At 100 TB this composes the round-13 lattice
    * halves: ONE star tile over the hot window serves join-subset
    * rollups AND occasional wider lookbacks at fact-slice cost. */
  val q160_mv_fk_union = Q(
    (s, dir) => {
      val orders = T(s, dir, "orders")
        .withColumn("o_totalprice", T.dec2(col("o_totalprice")))
      val customer = T(s, dir, "customer")
      val star = orders.filter(col("o_orderdate") >= "1997-07-01")
        .join(customer, col("o_custkey") === col("c_custkey"))
      MaterializedViews.registerOnce(s, "q160_mv", star,
        keys = Seq("o_orderstatus", "o_orderdate"), sums = Seq("o_totalprice"))
      graft.catalog.Constraints.declareForeignKey(s,
        s"$dir/orders.parquet", "o_custkey", s"$dir/customer.parquet", "c_custkey")
      orders.filter(col("o_orderdate") >= "1997-01-01")
        .groupBy("o_orderstatus")
        .agg(sum("o_totalprice").cast("double").as("rev"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    },
    Some("""
      SELECT o_orderstatus,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev,
             COUNT(*) AS n
      FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Advisor → durable lattice composition (ref: materialize/
    * TileSuggester.java feeding Lattice.java, stored through
    * MaterializationService.java): ONE profiling pass recommends tiles
    * within the row budget, the suggestions materialize AND persist
    * under a lattice directory, the in-session registrations are
    * released (the restart analog), and adoptTiles re-loads the
    * SUGGESTED tile — the workload rollup below answers from the
    * re-adopted suggestion with zero fact scans (plan-gated in
    * MaterializedViewDurableSpec). At 100 TB this closes the loop the
    * reference runs as a service: recommend once, pay the fact pass
    * once, and every driver restart inherits the warmed lattice. */
  val q161_mv_advisor_durable = Q(
    (s, dir) => {
      val orders = T(s, dir, "orders")
        .withColumn("o_totalprice", T.dec2(col("o_totalprice")))
      val lat = java.nio.file.Files.createTempDirectory("graft_lattice").toString
      val names = graft.catalog.Lattice.materializeSuggestions(s, "q161_tile",
        orders, dims = Seq("o_orderstatus", "o_orderpriority"),
        sums = Seq("o_totalprice"), budgetRows = 1000L, maxTiles = 1)
      names.foreach(n => MaterializedViews.persistTile(s, n, lat): Unit)
      names.foreach(n => MaterializedViews.release(s, n))
      MaterializedViews.adoptTiles(s, lat): Unit
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

  /** Functional-dependency profiling (ref: profile/ProfilerImpl.java —
    * the reference's profiler mines FDs from HLL sketch lattices; here
    * ONE pass sketches every dimension pair and each ordered pair gets
    * a determinant→dependent verdict). The oracle recomputes the same
    * verdicts with EXACT distinct counts, so the hash compare proves
    * the sketch-driven classification matches ground truth:
    * o_orderdate → year(o_orderdate) holds, the other five ordered
    * pairs over (date, year, status) do not. At 100 TB this is the
    * pass a pipeline runs before choosing lattice tiles or partition
    * keys — hierarchy columns reveal themselves without a groupBy per
    * candidate. */
  val q162_profile_fds = Q(
    (s, dir) => {
      val t = T(s, dir, "orders")
        .withColumn("yr", year(col("o_orderdate")))
        .select(col("o_orderdate").as("d"), col("yr"),
          col("o_orderstatus").as("st"))
      graft.catalog.Lattice.functionalDependencies(t, Seq("d", "yr", "st"))
        .orderBy("determinant", "dependent")
    },
    Some("""
      WITH t AS (SELECT o_orderdate AS d, year(o_orderdate) AS yr,
                        o_orderstatus AS st FROM orders),
      c AS (SELECT COUNT(DISTINCT d) AS cd, COUNT(DISTINCT yr) AS cy,
                   COUNT(DISTINCT st) AS cs,
                   (SELECT COUNT(*) FROM (SELECT DISTINCT d, yr FROM t)) AS cdy,
                   (SELECT COUNT(*) FROM (SELECT DISTINCT d, st FROM t)) AS cds,
                   (SELECT COUNT(*) FROM (SELECT DISTINCT yr, st FROM t)) AS cys
            FROM t)
      SELECT * FROM (
        SELECT 'd' AS determinant, 'st' AS dependent, cds <= 1.1*cd AS fd FROM c
        UNION ALL SELECT 'd', 'yr', cdy <= 1.1*cd FROM c
        UNION ALL SELECT 'st', 'd', cds <= 1.1*cs FROM c
        UNION ALL SELECT 'st', 'yr', cys <= 1.1*cs FROM c
        UNION ALL SELECT 'yr', 'd', cdy <= 1.1*cy FROM c
        UNION ALL SELECT 'yr', 'st', cys <= 1.1*cy FROM c)
      ORDER BY determinant, dependent"""))

  /** Verified constraint declaration (the checked counterpart of the
    * reference's trusted metadata, schema/Statistic.java): the engine
    * PROVES the three FK conditions with exact queries before
    * declaring. orders.o_custkey → customer.c_custkey passes all three
    * (the TPC-H contract); orders.o_orderkey → lineitem.l_orderkey
    * fails uniqueness (an order has several line items) and is refused
    * — the rewrite never gains an unsound lossless-join proof. */
  val q163_fk_verify = Q(
    (s, dir) => {
      val good = graft.catalog.Constraints.verifyAndDeclare(s,
        s"$dir/orders.parquet", "o_custkey", s"$dir/customer.parquet", "c_custkey")
      val bad = graft.catalog.Constraints.verifyAndDeclare(s,
        s"$dir/orders.parquet", "o_orderkey", s"$dir/lineitem.parquet", "l_orderkey")
      val session = s
      import session.implicits._
      Seq(
        ("o_custkey", "c_custkey", good.uniqueKey, good.noNulls,
          good.contained, good.valid),
        ("o_orderkey", "l_orderkey", bad.uniqueKey, bad.noNulls,
          bad.contained, bad.valid))
        .toDF("fact_col", "dim_key", "unique_key", "no_nulls", "contained", "valid")
        .orderBy("fact_col")
    },
    Some("""
      SELECT fact_col, dim_key, unique_key, no_nulls, contained,
             (unique_key AND no_nulls AND contained) AS valid
      FROM (
        SELECT 'o_custkey' AS fact_col, 'c_custkey' AS dim_key,
          (SELECT COUNT(*) FROM (SELECT c_custkey FROM customer
             GROUP BY 1 HAVING COUNT(*) > 1)) = 0 AS unique_key,
          (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) = 0 AS no_nulls,
          (SELECT COUNT(*) FROM orders o LEFT JOIN customer c
             ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) = 0 AS contained
        UNION ALL
        SELECT 'o_orderkey', 'l_orderkey',
          (SELECT COUNT(*) FROM (SELECT l_orderkey FROM lineitem
             GROUP BY 1 HAVING COUNT(*) > 1)) = 0,
          (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL) = 0,
          (SELECT COUNT(*) FROM orders o LEFT JOIN lineitem l
             ON o.o_orderkey = l.l_orderkey WHERE l.l_orderkey IS NULL) = 0
      ) t ORDER BY fact_col"""))

  /** Constraint-based join elimination (ref: rel/rules/
    * ProjectJoinRemoveRule.java over Statistic.java's referential
    * constraints): the query joins the whole star out of habit but
    * reads only fact columns — the declared FK proves each fact row
    * matched exactly one customer, so the optimizer deletes the join
    * and the dim scan outright (plan-gated in MvConstraintSpec). The
    * oracle runs the JOIN as written: identical values prove the
    * elimination lossless. At 100 TB this is generated-BI insurance —
    * the broadcast the query never needed costs zero instead of a dim
    * scan + build. */
  val q164_fk_join_elim = Q(
    (s, dir) => {
      graft.catalog.Constraints.declareForeignKey(s,
        s"$dir/orders.parquet", "o_custkey", s"$dir/customer.parquet", "c_custkey")
      val orders = T(s, dir, "orders")
        .withColumn("o_totalprice", T.dec2(col("o_totalprice")))
      orders.join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderstatus")
        .agg(sum("o_totalprice").cast("double").as("rev"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    },
    Some("""
      SELECT o_orderstatus,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev,
             COUNT(*) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Unique-key discovery (ref: profile/ProfilerImpl.java unique-key
    * output + schema/Statistic.java getKeys): one sketch pass classifies
    * singles and pairs as keys of orders. The oracle recomputes the
    * verdicts with exact distinct counts — o_orderkey (and any pair
    * containing it) is a key; status/priority and their pair are not.
    * est_distinct itself is approximate, so only the CLASSIFICATION is
    * surfaced (the driver hash stays deterministic). */
  val q165_profile_keys = Q(
    (s, dir) => {
      val t = T(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          col("o_orderpriority").as("pri"))
      graft.catalog.Lattice.uniqueKeyCandidates(t, Seq("k", "st", "pri"))
        .select(col("columns"), col("unique_key"))
        .orderBy("columns")
    },
    Some("""
      WITH t AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                        o_orderpriority AS pri FROM orders),
      c AS (SELECT COUNT(*) AS n, COUNT(DISTINCT k) AS ck,
                   COUNT(DISTINCT st) AS cs, COUNT(DISTINCT pri) AS cp,
                   (SELECT COUNT(*) FROM (SELECT DISTINCT k, st FROM t)) AS cks,
                   (SELECT COUNT(*) FROM (SELECT DISTINCT k, pri FROM t)) AS ckp,
                   (SELECT COUNT(*) FROM (SELECT DISTINCT st, pri FROM t)) AS csp
            FROM t)
      SELECT columns, unique_key FROM (
        SELECT 'k' AS columns, 1.1*ck >= n AS unique_key FROM c
        UNION ALL SELECT 'st', 1.1*cs >= n FROM c
        UNION ALL SELECT 'pri', 1.1*cp >= n FROM c
        UNION ALL SELECT 'k,st', 1.1*cks >= n FROM c
        UNION ALL SELECT 'k,pri', 1.1*ckp >= n FROM c
        UNION ALL SELECT 'st,pri', 1.1*csp >= n FROM c)
      ORDER BY columns"""))

  val all: Map[String, Q] = Map(
    "q165_profile_keys" -> q165_profile_keys,
    "q164_fk_join_elim" -> q164_fk_join_elim,
    "q160_mv_fk_union" -> q160_mv_fk_union,
    "q161_mv_advisor_durable" -> q161_mv_advisor_durable,
    "q162_profile_fds" -> q162_profile_fds,
    "q163_fk_verify" -> q163_fk_verify)
}
