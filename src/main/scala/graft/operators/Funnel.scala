package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ordered-funnel analytics (view → click → purchase) — the event-
  * sequence KPI query every analytics engine ships; the reference
  * expresses it via MATCH_RECOGNIZE (our q94/q98 family), but the
  * strictly-ordered first-transition form lowers to three keyed
  * min-aggregations, each reusing the user_id partitioning — no NFA
  * needed and no per-user state beyond three timestamps. At 100 TB:
  * three shuffles on the same high-cardinality key (AQE-coalesced),
  * no window over raw events, no buffering.
  */
object Funnel {

  val q125_funnel = Q(
    (s, dir) => {
      val ev = T(s, dir, "events").select(col("user_id"), col("ts"), col("event_type"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c = ev.filter(col("event_type") === "click").as("e")
        .join(v, "user_id")
        .filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"), col("t1"), col("t2"), col("t3"),
          when(col("t3").isNotNull, 3)
            .when(col("t2").isNotNull, 2)
            .otherwise(1).cast(IntegerType).as("stage"))
        .orderBy("user_id")
    },
    Some("""
      WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
                 WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
            JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
            WHERE e.event_type = 'click' GROUP BY 1),
      p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
            JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
            WHERE e.event_type = 'purchase' GROUP BY 1)
      SELECT v.user_id AS user_id, t1, t2, t3,
        CAST(CASE WHEN t3 IS NOT NULL THEN 3
                  WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS INT) AS stage
      FROM v LEFT JOIN c ON v.user_id = c.user_id
             LEFT JOIN p ON v.user_id = p.user_id
      ORDER BY v.user_id"""))

  /** Cohort retention: users grouped by first-seen week, counting how
    * many return in each subsequent week — two passes over events
    * keyed by user then (cohort, week): the self-join-free formulation
    * (first_seen joins back by key, not by inequality). */
  val q126_cohort_retention = Q(
    (s, dir) => {
      val ev = T(s, dir, "events")
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .distinct()
      val first = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
      ev.join(first, "user_id")
        .groupBy(col("cohort"),
          (datediff(col("wk"), col("cohort")) / 7).cast(IntegerType).as("week_n"))
        .agg(countDistinct(col("user_id")).as("active_users"))
        .orderBy("cohort", "week_n")
    },
    Some("""
      WITH ev AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
      first AS (SELECT user_id, min(wk) AS cohort FROM ev GROUP BY 1)
      SELECT cohort, CAST(date_diff('day', cohort, wk) // 7 AS INT) AS week_n,
             count(DISTINCT ev.user_id) AS active_users
      FROM ev JOIN first ON ev.user_id = first.user_id
      GROUP BY 1, 2 ORDER BY cohort, week_n"""))

  /** Histogram binning both ways: equi-width via explicit bucket
    * arithmetic (DuckDB 1.0 lacks width_bucket) and equi-depth via ntile over the value
    * order — the profiler's histogram device as a first-class query. */
  val q127_histograms = Q(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = T(s, dir, "orders")
      val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
      val binned = o.select(col("o_orderkey"), col("o_totalprice"),
        expr("CAST(LEAST(floor(o_totalprice / 50000) + 1, 12) AS INT)").as("wb"),
        ntile(8).over(w).as("depth_bin"))
      binned.groupBy(col("wb"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("depth_bin")).cast(IntegerType).as("n_depth_bins"),
          T.dsum(col("o_totalprice")).as("mass"))
        .orderBy("wb")
    },
    Some("""
      WITH b AS (
        SELECT o_orderkey, o_totalprice,
          CAST(LEAST(floor(o_totalprice / 50000) + 1, 12) AS INT) AS wb,
          ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS depth_bin
        FROM orders)
      SELECT wb, count(*) AS n,
        CAST(count(DISTINCT depth_bin) AS INT) AS n_depth_bins,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS mass
      FROM b GROUP BY wb ORDER BY wb"""))

  /** Data-quality check run over orders (+ lineitem referential
    * integrity against it): one conditional-count pass for the
    * row-local rules, a groupBy for unique, an anti join for the FK —
    * violations per rule, oracle-checked. */
  val q128_dq_checks = Q(
    (s, dir) => {
      import graft.catalog.Checks._
      run(T(s, dir, "orders"), Seq(
        NotNull("o_custkey"),
        AcceptedValues("o_orderstatus", Seq("F", "O", "P")),
        InRange("o_totalprice", 0.0, 500000.0),
        Unique("o_orderkey"),
        RefIntegrity("o_custkey", T(s, dir, "customer"), "c_custkey")))
    },
    Some("""
      SELECT 'accepted_values' AS rule, 'o_orderstatus' AS "column",
             CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('F','O','P')
                              OR o_orderstatus IS NULL) AS BIGINT) AS violations
      FROM orders
      UNION ALL
      SELECT 'in_range', 'o_totalprice',
             count(*) FILTER (WHERE o_totalprice < 0 OR o_totalprice > 500000
                              OR o_totalprice IS NULL)
      FROM orders
      UNION ALL
      SELECT 'not_null', 'o_custkey',
             count(*) FILTER (WHERE o_custkey IS NULL) FROM orders
      UNION ALL
      SELECT 'ref_integrity', 'o_custkey',
             (SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL
              AND o_custkey NOT IN (SELECT c_custkey FROM customer))
      UNION ALL
      SELECT 'unique', 'o_orderkey',
             CAST(coalesce((SELECT sum(n) FROM (
               SELECT count(*) AS n FROM orders GROUP BY o_orderkey
               HAVING count(*) > 1) d), 0) AS BIGINT)
      ORDER BY rule, "column""""))

  /** SCD2 dimension build (ref: the warehouse pattern behind
    * rel/core/Snapshot.java's sys_start/sys_end convention): each
    * user's event history becomes validity-interval versions —
    * effective_from = event time, effective_to = next event's time
    * (NULL while current) — one window pass on the entity key. */
  val q129_scd2 = Q(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      T(s, dir, "events")
        .filter(col("user_id") <= 30)
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
        .withColumn("effective_from", col("ts"))
        .withColumn("effective_to", lead(col("ts"), 1).over(w))
        .withColumn("is_current", col("effective_to").isNull)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("effective_from"), col("effective_to"), col("is_current"))
        .orderBy("user_id", "effective_from", "event_id")
    },
    Some("""
      SELECT user_id, event_id, event_type,
        ts AS effective_from,
        lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS effective_to,
        lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
      FROM events WHERE user_id <= 30
      ORDER BY user_id, effective_from, event_id"""))

  val all: Map[String, Q] = Map(
    "q125_funnel" -> q125_funnel,
    "q126_cohort_retention" -> q126_cohort_retention,
    "q127_histograms" -> q127_histograms,
    "q128_dq_checks" -> q128_dq_checks,
    "q129_scd2" -> q129_scd2)
}
