package graft.operators

import org.apache.spark.sql.functions._

import graft.{Q, T}
import graft.plans.MaterializedViews

/** Round-11 pack: filtered-MV substitution exercised end-to-end under
  * the driver's DuckDB oracle.
  */
object Round11 {

  /** Filtered-MV substitution with a compensating predicate (ref:
    * rel/rules/materialize/MaterializedViewRules.java:1 +
    * plan/SubstitutionVisitor.java:1 filter subsumption): the MV
    * materializes the 1997-07-01+ slice of orders pre-aggregated by
    * (status, orderdate); the query asks for the narrower 1998+ slice,
    * so its predicate IMPLIES the MV's and the optimizer answers it
    * from the cached rollup with the query predicate re-applied as the
    * compensation — the fact table is not rescanned (plan-gated in
    * PlanQualitySpec). Aggregates are exact (COUNT, MAX of bigint), so
    * the substituted rollup is bit-identical to the direct scan at any
    * partitioning. At 100 TB this is the filtered-lattice play: one
    * bounded slice absorbs every dashboard query over the recent range. */
  val q148_mv_filtered_rollup = Q(
    (s, dir) => {
      val orders = T(s, dir, "orders")
      val src = orders.filter(col("o_orderdate") >= "1997-07-01")
      // register once per session: later invocations (bench's timed
      // runs, dashboard re-queries) measure the MV HIT, which is the
      // lattice amortization story; DML on orders would drop it
      MaterializedViews.registerOnce(s, "q148_mv", src,
          keys = Seq("o_orderstatus", "o_orderdate"),
          sums = Nil, maxs = Seq("o_orderkey"))
      orders.filter(col("o_orderdate") >= "1998-01-01")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), max("o_orderkey").as("last_key"))
    },
    Some("""
      SELECT o_orderstatus, COUNT(*) AS n, max(o_orderkey) AS last_key
      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
      GROUP BY o_orderstatus"""))

  /** Partial-coverage UNION compensation (ref: MaterializedViewRules
    * .java union rewrite): the MV holds the 1998+ slice pre-aggregated,
    * the query asks for 1997-07-01+ — STRICTLY WIDER — so the optimizer
    * answers it as rollup(cached partials ∪ partial-agg of ONLY the
    * [1997-07-01, 1998) residual slice). The fact table is scanned for
    * the residual months alone (the complement predicate reaches the
    * parquet scan); at 100 TB this is the dashboard-over-hot-window
    * play where occasional wider lookbacks touch only the uncovered
    * slice. Exact aggregates (COUNT, MAX of bigint) keep the union
    * rollup bit-identical to a direct scan — which also makes the
    * session-global registration safe: any OTHER orders rollup these
    * MVs happen to answer (q148's stays registered for the rest of the
    * driver session) gets the same exact values by construction. The
    * query bound (1997-01-01) strictly contains BOTH round-11 MV
    * slices, so the union path fires whichever the registry yields. */
  val q149_mv_union_rollup = Q(
    (s, dir) => {
      val orders = T(s, dir, "orders")
      val src = orders.filter(col("o_orderdate") >= "1998-01-01")
      MaterializedViews.registerOnce(s, "q149_mv", src,
          keys = Seq("o_orderstatus", "o_orderdate"),
          sums = Nil, maxs = Seq("o_orderkey"))
      orders.filter(col("o_orderdate") >= "1997-01-01")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), max("o_orderkey").as("last_key"))
    },
    Some("""
      SELECT o_orderstatus, COUNT(*) AS n, max(o_orderkey) AS last_key
      FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      GROUP BY o_orderstatus"""))

  val all: Map[String, Q] = Map(
    "q148_mv_filtered_rollup" -> q148_mv_filtered_rollup,
    "q149_mv_union_rollup" -> q149_mv_union_rollup)
}
