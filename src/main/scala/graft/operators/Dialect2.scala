package graft.operators

import org.apache.spark.sql.functions._

import graft.{Q, T}

/** Round-7 SQL-surface pack: driver-gated queries for the windowing
  * TVF SESSION form (SqlWindowTableFunction.java / stream.iq), Postgres
  * DISTINCT ON (babel select.iq, CALCITE-5406), the SELECT..BY sugar
  * (SqlByRewriter.java), and WITHIN GROUP aggregates as window
  * functions (babel within-group-over.iq). Each runs through GraftSql
  * so the driver exercises the same rewrite path a SQL user hits.
  */
object Dialect2 {

  /** SESSION gap windows as a batch relation: per-user 30-minute
    * sessions over the events stream, one row per session. The lowering
    * (sql/WindowTvfSql.scala) partitions every window on user_id — at
    * 100 TB the state per task is one user's events, never a global
    * sort. */
  val q138_session_tvf = Q(
    (s, dir) => {
      T(s, dir, "events").createOrReplaceTempView("events_v138")
      graft.sql.GraftSql.sql(s, """
        SELECT user_id, window_start, window_end, COUNT(*) AS n
        FROM TABLE(SESSION(TABLE events_v138, DESCRIPTOR(ts), DESCRIPTOR(user_id), INTERVAL '30' MINUTE))
        GROUP BY user_id, window_start, window_end""")
    },
    Some("""
      WITH o AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sess AS (
        SELECT user_id, ts,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        FROM o)
      SELECT user_id, MIN(ts) AS window_start,
             MAX(ts) + INTERVAL 30 MINUTE AS window_end, COUNT(*) AS n
      FROM sess GROUP BY user_id, sid"""))

  /** Postgres `SELECT DISTINCT ON`: first order per customer under the
    * statement ordering (lowered to a keyed row_number filter — one
    * hash shuffle on the high-cardinality key). */
  val q139_distinct_on = Q(
    (s, dir) => {
      T(s, dir, "orders").createOrReplaceTempView("orders_v139")
      graft.sql.GraftSql.sql(s, """
        SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_orderpriority
        FROM orders_v139
        ORDER BY o_custkey, o_orderdate, o_orderkey""")
    },
    Some("""
      SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_orderpriority
      FROM orders
      ORDER BY o_custkey, o_orderdate, o_orderkey"""))

  /** `SELECT a BY b` sugar (one grouped aggregation; the implicit
    * per-group aggregate is MAX, matching the reference's enumerable
    * ANY_VALUE). The oracle states the desugared form explicitly. */
  val q140_select_by = Q(
    (s, dir) => {
      T(s, dir, "orders").createOrReplaceTempView("orders_v140")
      graft.sql.GraftSql.sql(s,
        "SELECT o_orderkey BY o_custkey FROM orders_v140")
    },
    Some("""
      SELECT o_custkey, max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey ORDER BY o_custkey"""))

  /** WITHIN GROUP ordered aggregate as an analytic function (babel
    * allowWithinGroupOverAggregate): the region's ordered name list
    * broadcast to every member row. */
  val q141_listagg_over = Q(
    (s, dir) => {
      T(s, dir, "nation").createOrReplaceTempView("nation_v141")
      graft.sql.GraftSql.sql(s, """
        SELECT n_nationkey,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)
                 OVER (PARTITION BY n_regionkey) AS names
        FROM nation_v141""").orderBy(col("n_nationkey"))
    },
    Some("""
      SELECT n.n_nationkey,
             (SELECT string_agg(n2.n_name, ',' ORDER BY n2.n_name)
              FROM nation n2 WHERE n2.n_regionkey = n.n_regionkey) AS names
      FROM nation n ORDER BY n.n_nationkey"""))

  /** SQL:2011 FILTER on a window aggregate (CALCITE-6442; Spark rejects
    * the clause on window functions). GraftSql lowers it to the
    * equivalent null-injecting CASE per argument, so the plan is a
    * plain window over the l_orderkey shuffle — no extra pass. Sums
    * stay in DECIMAL inside the frame (double association differs
    * across engines), cast after. */
  val q142_window_filter = Q(
    (s, dir) => {
      T(s, dir, "lineitem").createOrReplaceTempView("lineitem_v142")
      graft.sql.GraftSql.sql(s, """
        SELECT l_orderkey, l_linenumber,
               count(*) FILTER (WHERE l_quantity > 25)
                 OVER (PARTITION BY l_orderkey) AS big_cnt,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2)))
                      FILTER (WHERE l_discount > 0.05)
                      OVER (PARTITION BY l_orderkey) AS DOUBLE) AS disc_qty
        FROM lineitem_v142""")
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
             count(*) FILTER (WHERE l_quantity > 25)
               OVER (PARTITION BY l_orderkey) AS big_cnt,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2)))
                    FILTER (WHERE l_discount > 0.05)
                    OVER (PARTITION BY l_orderkey) AS DOUBLE) AS disc_qty
      FROM lineitem"""))

  /** `agg(e) WITHIN DISTINCT (keys)` (CALCITE-4483): each order's
    * totalprice counts ONCE per customer even though the join
    * denormalizes it onto every line item — the canonical
    * double-counting guard. The lowering (sql/WithinDistinctSql.scala)
    * folds a group-local distinct pair set; per-group state is the
    * distinct ORDER count per customer, bounded at any corpus scale. */
  val q143_within_distinct = Q(
    (s, dir) => {
      T(s, dir, "orders").createOrReplaceTempView("orders_v143")
      T(s, dir, "lineitem").createOrReplaceTempView("lineitem_v143")
      graft.sql.GraftSql.sql(s, """
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                      WITHIN DISTINCT (o_orderkey) AS DOUBLE) AS order_rev,
               CAST(COUNT(*) WITHIN DISTINCT (o_orderkey) AS BIGINT) AS n_orders
        FROM (SELECT o_custkey, o_orderkey, o_totalprice
              FROM orders_v143 JOIN lineitem_v143 ON l_orderkey = o_orderkey)
        GROUP BY o_custkey""")
    },
    Some("""
      WITH de AS (
        SELECT DISTINCT o_custkey, o_orderkey, o_totalprice
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey)
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS order_rev,
             COUNT(*) AS n_orders
      FROM de GROUP BY o_custkey"""))

  /** SQL:2016 window frame EXCLUDE (GraftSql lowers it to a position
    * self-join keyed on the partition — sql/ExcludeFrameSql.scala);
    * DuckDB executes the clause natively, so the oracle checks the
    * lowering against an independent native implementation. Partition
    * by l_orderkey bounds the join to ≤7 rows per key at any scale;
    * quantities are integer-valued so the sums are bit-exact doubles. */
  val q145_window_exclude = Q(
    (s, dir) => {
      T(s, dir, "lineitem").createOrReplaceTempView("lineitem_v145")
      graft.sql.GraftSql.sql(s, """
        SELECT l_orderkey, l_linenumber,
               sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_returnflag
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE GROUP) AS xg,
               sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_returnflag
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE TIES) AS xt,
               count(*) OVER (PARTITION BY l_orderkey ORDER BY l_returnflag
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW) AS xc
        FROM lineitem_v145""")
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
             sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_returnflag
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE GROUP) AS xg,
             sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_returnflag
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE TIES) AS xt,
             count(*) OVER (PARTITION BY l_orderkey ORDER BY l_returnflag
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW) AS xc
      FROM lineitem"""))

  /** Bounded-frame EXCLUDE (the scale path): `n PRECEDING..m FOLLOWING
    * EXCLUDE ...` lowers to an explode(sequence)-generated frame plus an
    * EQUI-join on (partition, __rn) — O(n·frame) rows, hash-joined, vs
    * the |partition|² self-join the unbounded shapes need
    * (sql/ExcludeFrameSql.scala, plan-gated in PlanQualitySpec).
    * DuckDB executes EXCLUDE natively — an independent oracle. */
  val q146_window_exclude_bounded = Q(
    (s, dir) => {
      T(s, dir, "lineitem").createOrReplaceTempView("lineitem_v146")
      graft.sql.GraftSql.sql(s, """
        SELECT l_orderkey, l_linenumber,
               sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity
                 ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW) AS xc,
               count(*) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity
                 ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS xg
        FROM lineitem_v146""")
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
             sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity
               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW) AS xc,
             count(*) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity
               ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS xg
      FROM lineitem"""))

  /** MIXED-frame EXCLUDE (round 9, the last quadratic retired): a
    * bounded EXCLUDE call joins the explode-generated frame, the
    * unbounded EXCLUDE and the plain unbounded count ride the base CTE
    * as difference-of-windows / verbatim window columns — no
    * |partition|² self-join (plan-gated in PlanQualitySpec). DuckDB
    * executes EXCLUDE natively as the independent oracle. */
  val q147_window_exclude_mixed = Q(
    (s, dir) => {
      T(s, dir, "lineitem").createOrReplaceTempView("lineitem_v147")
      graft.sql.GraftSql.sql(s, """
        SELECT l_orderkey, l_linenumber,
               sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity
                 ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW) AS xb,
               sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE GROUP) AS xu,
               count(*) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS nall
        FROM lineitem_v147""")
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
             sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity
               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW) AS xb,
             sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE GROUP) AS xu,
             count(*) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS nall
      FROM lineitem"""))

  val all: Map[String, Q] = Map(
    "q138_session_tvf" -> q138_session_tvf,
    "q145_window_exclude" -> q145_window_exclude,
    "q146_window_exclude_bounded" -> q146_window_exclude_bounded,
    "q147_window_exclude_mixed" -> q147_window_exclude_mixed,
    "q139_distinct_on" -> q139_distinct_on,
    "q140_select_by" -> q140_select_by,
    "q141_listagg_over" -> q141_listagg_over,
    "q142_window_filter" -> q142_window_filter,
    "q143_within_distinct" -> q143_within_distinct)
}
