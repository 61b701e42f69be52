package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-DS oracle pack 11 (ds82–ds89): the one-month brand star (Q52),
  * the manager-slice brand revenue (Q55), the channel×hour breakdown
  * (Q71), the late-shipment census (Q72), the union-of-channels census
  * (Q76), the per-channel sales-and-returns rollup (Q77), the
  * promo net-revenue panel (Q80), and the returns-vs-1.2×-nation-average
  * outliers (Q81).
  *
  * Same determinism contract as packs 9–10 (integer cents / bp, DIV
  * vs //, exact cross-multiplied compares, day arithmetic).
  */
object Tpcds11 {

  /** Q52 shape: the one-month brand star — single month filter pushed
    * to the fact scan, brand grain, revenue ordered descending (key
    * tiebreak keeps it deterministic). */
  val ds82_month_brand_star = Q(
    (s, dir) =>
      T(s, dir, "lineitem")
        .filter(year(col("l_shipdate")) === 1996 && month(col("l_shipdate")) === 3)
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg((sum(T.dec2(col("l_extendedprice"))) * 100).cast(LongType).as("cents"))
        .orderBy(col("cents").desc, col("p_brand")),
    Some("""
      SELECT p_brand,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE EXTRACT(YEAR FROM l_shipdate) = 1996 AND EXTRACT(MONTH FROM l_shipdate) = 3
      GROUP BY p_brand ORDER BY cents DESC, p_brand"""))

  /** Q55 shape: the manager-slice brand revenue — one "manager"'s
    * suppliers (a nation slice) and one month, brand grain. */
  val ds83_manager_brand_rev = Q(
    (s, dir) =>
      T(s, dir, "lineitem")
        .filter(year(col("l_shipdate")) === 1997)
        .join(T(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .filter(col("s_nationkey") < 5)
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg((sum(T.dec2(col("l_extendedprice"))) * 100).cast(LongType).as("cents"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("p_brand")),
    Some("""
      SELECT p_brand,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents,
        COUNT(*) AS n_lines
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN part ON l_partkey = p_partkey
      WHERE EXTRACT(YEAR FROM l_shipdate) = 1997 AND s_nationkey < 5
      GROUP BY p_brand ORDER BY p_brand"""))

  /** Q71 shape: the channel × hour breakdown — two event channels
    * UNION ALL'd with a channel label, value summed per (channel,
    * hour-of-day). The events table routes through T() (nanos→µs). */
  val ds84_channel_hour = Q(
    (s, dir) => {
      val ev = T(s, dir, "events")
      def chan(label: String, types: Seq[String]) =
        ev.filter(col("event_type").isin(types: _*))
          .select(lit(label).as("channel"), hour(col("ts")).as("hr"), col("value"))
      chan("engage", Seq("click", "view"))
        .unionAll(chan("convert", Seq("signup", "purchase")))
        .groupBy(col("channel"), col("hr"))
        .agg((sum(T.dec2(col("value"))) * 100).cast(LongType).as("cents"),
          count(lit(1)).as("n_events"))
        .orderBy(col("channel"), col("hr"))
    },
    Some("""
      SELECT channel, hr,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents,
        COUNT(*) AS n_events
      FROM (
        SELECT 'engage' AS channel, CAST(EXTRACT(HOUR FROM ts) AS INT) AS hr, value
        FROM events WHERE event_type IN ('click', 'view')
        UNION ALL
        SELECT 'convert' AS channel, CAST(EXTRACT(HOUR FROM ts) AS INT) AS hr, value
        FROM events WHERE event_type IN ('signup', 'purchase'))
      GROUP BY channel, hr ORDER BY channel, hr"""))

  /** Q72 shape: the late-shipment census — lines shipped more than 60
    * days after their order, counted per (priority, promo-flag); the
    * promo flag is a LEFT-join analog folded into one pass. */
  val ds85_late_shipments = Q(
    (s, dir) =>
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority")), col("l_orderkey") === col("o_orderkey"))
        .filter(datediff(col("l_shipdate"), col("o_orderdate")) > 60)
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_type")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("o_orderpriority"),
          when(col("p_type").startsWith("PROMO"), lit("promo")).otherwise(lit("plain"))
            .as("promo_flag"))
        .agg(count(lit(1)).as("n_late"),
          (sum(T.dec2(col("l_extendedprice"))) * 100).cast(LongType).as("cents"))
        .orderBy(col("o_orderpriority"), col("promo_flag")),
    Some("""
      SELECT o_orderpriority,
        CASE WHEN p_type LIKE 'PROMO%' THEN 'promo' ELSE 'plain' END AS promo_flag,
        COUNT(*) AS n_late,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
      WHERE date_diff('day', o_orderdate, l_shipdate) > 60
      GROUP BY 1, 2 ORDER BY o_orderpriority, promo_flag"""))

  /** Q76 shape: the union-of-channels census — two channel slices
    * UNION ALL'd with their label and counted by (channel, year,
    * linestatus-analog); one pass per slice, labels fold the union. */
  val ds86_union_channel_census = Q(
    (s, dir) => {
      val li = T(s, dir, "lineitem")
      val a = li.filter(col("l_returnflag") === "R")
        .select(lit("returns").as("channel"), year(col("l_shipdate")).as("yr"),
          col("l_extendedprice"))
      val b = li.filter(col("l_returnflag") =!= "R" && col("l_linestatus") === "F")
        .select(lit("finished").as("channel"), year(col("l_shipdate")).as("yr"),
          col("l_extendedprice"))
      a.unionAll(b)
        .groupBy(col("channel"), col("yr"))
        .agg(count(lit(1)).as("n"),
          (sum(T.dec2(col("l_extendedprice"))) * 100).cast(LongType).as("cents"))
        .orderBy(col("channel"), col("yr"))
    },
    Some("""
      SELECT channel, yr, COUNT(*) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
      FROM (
        SELECT 'returns' AS channel, CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS yr, l_extendedprice
        FROM lineitem WHERE l_returnflag = 'R'
        UNION ALL
        SELECT 'finished' AS channel, CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS yr, l_extendedprice
        FROM lineitem WHERE l_returnflag <> 'R' AND l_linestatus = 'F')
      GROUP BY channel, yr ORDER BY channel, yr"""))

  /** Q77 shape: the per-channel sales-and-returns rollup — sold and
    * returned cents per linestatus channel plus the all-channel total
    * row, one conditional-aggregation pass under ROLLUP. */
  val ds87_channel_profit_rollup = Q(
    (s, dir) =>
      T(s, dir, "lineitem")
        .rollup(col("l_linestatus"))
        .agg(
          (sum(when(col("l_returnflag") =!= "R", T.dec2(col("l_extendedprice")))
            .otherwise(T.dec2(lit(0)))) * 100).cast(LongType).as("sold_cents"),
          (sum(when(col("l_returnflag") === "R", T.dec2(col("l_extendedprice")))
            .otherwise(T.dec2(lit(0)))) * 100).cast(LongType).as("ret_cents"),
          grouping(col("l_linestatus")).cast(LongType).as("g"))
        .select(col("l_linestatus"), col("g"), col("sold_cents"), col("ret_cents"),
          (col("sold_cents") - col("ret_cents")).as("net_cents"))
        .orderBy(col("g"), col("l_linestatus")),
    Some("""
      SELECT l_linestatus, CAST(GROUPING(l_linestatus) AS BIGINT) AS g,
        CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END) * 100 AS BIGINT) AS sold_cents,
        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END) * 100 AS BIGINT) AS ret_cents,
        CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END) * 100
           - SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END) * 100 AS BIGINT) AS net_cents
      FROM lineitem
      GROUP BY ROLLUP(l_linestatus)
      ORDER BY g, l_linestatus"""))

  /** Q80 shape: the promo net-revenue panel — PROMO parts only, sold
    * minus returned cents per brand, counts for both legs, one pass. */
  val ds88_promo_net_revenue = Q(
    (s, dir) =>
      T(s, dir, "lineitem")
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_brand"), col("p_type")),
          col("l_partkey") === col("p_partkey"))
        .filter(col("p_type").startsWith("PROMO"))
        .groupBy(col("p_brand"))
        .agg(
          sum(when(col("l_returnflag") =!= "R", 1L).otherwise(0L)).as("n_sold"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_ret"),
          (sum(when(col("l_returnflag") =!= "R", T.dec2(col("l_extendedprice")))
            .otherwise(T.dec2(lit(0)))) * 100).cast(LongType).as("sold_cents"),
          (sum(when(col("l_returnflag") === "R", T.dec2(col("l_extendedprice")))
            .otherwise(T.dec2(lit(0)))) * 100).cast(LongType).as("ret_cents"))
        .select(col("p_brand"), col("n_sold"), col("n_ret"),
          (col("sold_cents") - col("ret_cents")).as("net_cents"))
        .orderBy(col("p_brand")),
    Some("""
      SELECT p_brand,
        COUNT(CASE WHEN l_returnflag <> 'R' THEN 1 END) AS n_sold,
        COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_ret,
        CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END) * 100
           - SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END) * 100 AS BIGINT) AS net_cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_type LIKE 'PROMO%'
      GROUP BY p_brand ORDER BY p_brand"""))

  /** Q81 shape: customers whose returned total beats 1.2× their
    * nation's average — the state-grain correlated scalar decorrelates
    * to a per-nation aggregate join; the 1.2× compare is the exact
    * integer inequality 10·cents·n > 12·Σcents. */
  val ds89_return_outliers = Q(
    (s, dir) => {
      val perCust = T(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_nationkey"))
        .agg((sum(T.dec2(col("l_extendedprice"))) * 100).cast(LongType).as("ret_cents"))
      val perNation = perCust.groupBy(col("c_nationkey"))
        .agg(sum(col("ret_cents")).as("nat_cents"), count(lit(1)).as("n_cust"))
      perCust.join(perNation, Seq("c_nationkey"))
        .filter(col("ret_cents") * col("n_cust") * 10 > col("nat_cents") * 12)
        .join(broadcast(T(s, dir, "nation").select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name"), col("ret_cents"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      WITH per_cust AS (
        SELECT c_custkey, c_nationkey,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS ret_cents
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_nationkey),
      per_nation AS (
        SELECT c_nationkey, CAST(SUM(ret_cents) AS BIGINT) AS nat_cents,
          COUNT(*) AS n_cust
        FROM per_cust GROUP BY c_nationkey)
      SELECT c_custkey, n_name, ret_cents
      FROM per_cust
        JOIN per_nation USING (c_nationkey)
        JOIN nation ON c_nationkey = n_nationkey
      WHERE ret_cents * n_cust * 10 > nat_cents * 12
      ORDER BY c_custkey"""))

  val all: Map[String, Q] = Map(
    "ds82_month_brand_star" -> ds82_month_brand_star,
    "ds83_manager_brand_rev" -> ds83_manager_brand_rev,
    "ds84_channel_hour" -> ds84_channel_hour,
    "ds85_late_shipments" -> ds85_late_shipments,
    "ds86_union_channel_census" -> ds86_union_channel_census,
    "ds87_channel_profit_rollup" -> ds87_channel_profit_rollup,
    "ds88_promo_net_revenue" -> ds88_promo_net_revenue,
    "ds89_return_outliers" -> ds89_return_outliers)
}
