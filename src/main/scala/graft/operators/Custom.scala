package graft.operators

import graft.{Q, T}
import graft.plans.{AsofJoin, RecursiveUnion}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Operators Spark lacks natively, built per SURVEY.md §7.2: ASOF JOIN
  * and recursive union (WITH RECURSIVE). */
object Custom {

  /** ASOF LEFT JOIN: each purchase matched to the user's most recent
    * click at-or-before it (ref: rel/core/AsofJoin.java:1; asof.iq:11-16;
    * oracle = DuckDB's native ASOF JOIN, the same engine asof.iq
    * validates against). Right side is deduped per (user, ts) so ties
    * are well-defined. */
  val q96_asof_join = Q(
    (s, dir) => {
      val ev = T(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      // r16 (guide §2.4 — remove shuffles outright): the explicit
      // per-(user, ts) dedup (groupBy + max(event_id)) duplicated work
      // the asof carry already does. With click_id as the rightTiebreak,
      // equal-(user, ts) click rows sort ascending by click_id inside
      // the window and the last-value carry picks the LARGEST — exactly
      // the row the old aggregate kept. Ties stay well-defined, the
      // dedup exchange + two hash aggregates disappear, and both event
      // filters now feed one union stage (their scans overlap).
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      AsofJoin.leftAsof(purchases, clicks,
          key = "user_id", leftTime = "ts", rightTime = "click_ts",
          payload = Seq("click_id"),
          rightTiebreak = Seq("click_id"),
          // Explicit window parallelization measured and REJECTED at
          // bench scale (r16, guide §1.2): rows-sized parts=24 gave
          // 0.604 s and parts=6 gave 0.460 s vs 0.393 s letting AQE
          // coalesce (the 47k-row window is cheaper than the extra task
          // + range-sample overhead). At large inputs AQE's byte-based
          // sizing parallelizes this exchange on its own; leftAsof keeps
          // the `parts` hook for callers whose input defeats it.
          parts = 0)
        .orderBy("event_id")
    },
    Some("""
      WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
           c AS (SELECT user_id, ts AS click_ts, MAX(event_id) AS click_id
                 FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      SELECT p.event_id, p.user_id, p.ts, c.click_id, c.click_ts
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.click_ts
      ORDER BY p.event_id"""))

  /** WITH RECURSIVE: doubling chain seeded from nation keys
    * (ref: rel/core/RepeatUnion.java:1; recursive_queries.iq). */
  val q97_recursive_union = Q(
    (s, dir) => {
      val seed = T(s, dir, "nation")
        .filter(col("n_nationkey") > 0 && col("n_nationkey") < 10)
        .select(col("n_nationkey").cast(LongType).as("n"), lit(0).as("depth"))
      val result = RecursiveUnion.repeatUnionAll(
        seed,
        prev => prev.filter(col("n") * 2 <= 1000)
          .select((col("n") * 2).as("n"), (col("depth") + 1).as("depth")),
        iterationLimit = 32)
      result.orderBy("n", "depth")
    },
    Some("""
      WITH RECURSIVE t(n, depth) AS (
        SELECT CAST(n_nationkey AS BIGINT), 0 FROM nation WHERE n_nationkey > 0 AND n_nationkey < 10
        UNION ALL
        SELECT n * 2, depth + 1 FROM t WHERE n * 2 <= 1000)
      SELECT n, depth FROM t ORDER BY n, depth"""))

  /** The same recursion through the SQL surface: Spark 4 parses
    * WITH RECURSIVE natively (UnionLoop execution), so GraftSql
    * delegates — this query proves the SQL path end-to-end against the
    * DuckDB recursive oracle (ref: recursive_queries.iq;
    * rel/core/RepeatUnion.java:1). The depth column is computed
    * per-iteration, the classic transitive-closure shape. */
  val q104_recursive_sql = Q(
    (s, dir) => {
      T(s, dir, "nation").createOrReplaceTempView("nation")
      graft.sql.GraftSql.sql(s, """
        WITH RECURSIVE t(n, depth) AS (
          SELECT CAST(n_nationkey AS BIGINT), 0
          FROM nation WHERE n_nationkey > 0 AND n_nationkey < 10
          UNION ALL
          SELECT n * 2, depth + 1 FROM t WHERE n * 2 <= 1000)
        SELECT n, depth FROM t ORDER BY n, depth""")
    },
    Some("""
      WITH RECURSIVE t(n, depth) AS (
        SELECT CAST(n_nationkey AS BIGINT), 0 FROM nation WHERE n_nationkey > 0 AND n_nationkey < 10
        UNION ALL
        SELECT n * 2, depth + 1 FROM t WHERE n * 2 <= 1000)
      SELECT n, depth FROM t ORDER BY n, depth"""))

  val all: Map[String, Q] = Map(
    "q96_asof_join" -> q96_asof_join,
    "q97_recursive_union" -> q97_recursive_union,
    "q104_recursive_sql" -> q104_recursive_sql)
}
