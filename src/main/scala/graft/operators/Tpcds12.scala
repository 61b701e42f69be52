package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-DS oracle pack 12 (ds90–ds96): the three-channel return share
  * panel (Q83), the customer lookup projection (Q84), the
  * month-vs-year-average deviation screen (Q89), the returns-loss
  * demographics census (Q91), the multi-supplier clean-order count
  * (Q94), the narrow-window selective count (Q96), and the ship-lag
  * buckets by priority and status (Q99).
  *
  * With packs 9–11 this closes the TPC-DS shape inventory: every one
  * of the 99 reference queries (plus/src/test/resources/sql/tpcds)
  * now has a DuckDB-hash-checked shape row. Same determinism contract
  * as packs 9–11.
  */
object Tpcds12 {

  /** Q83 shape: the three-channel return share — per part, quantity
    * by return flag channel (R/A/N), every channel required, each
    * share as integer ppm of the part's total. One conditional pass,
    * no three-scan union. */
  val ds90_return_share_panel = Q(
    (s, dir) => {
      def q(flag: String) =
        sum(when(col("l_returnflag") === flag, col("l_quantity").cast(LongType))
          .otherwise(0L))
      T(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(q("R").as("q_r"), q("A").as("q_a"), q("N").as("q_n"))
        .filter(col("q_r") > 0 && col("q_a") > 0 && col("q_n") > 0)
        .select(col("l_partkey"), col("q_r"), col("q_a"), col("q_n"),
          expr("q_r * 1000000 DIV (q_r + q_a + q_n)").as("r_ppm"),
          expr("q_a * 1000000 DIV (q_r + q_a + q_n)").as("a_ppm"),
          expr("q_n * 1000000 DIV (q_r + q_a + q_n)").as("n_ppm"))
        .orderBy(col("l_partkey"))
    },
    Some("""
      WITH per_part AS (
        SELECT l_partkey,
          CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q_r,
          CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q_a,
          CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q_n
        FROM lineitem GROUP BY l_partkey
        HAVING q_r > 0 AND q_a > 0 AND q_n > 0)
      SELECT l_partkey, q_r, q_a, q_n,
        CAST(q_r * 1000000 // (q_r + q_a + q_n) AS BIGINT) AS r_ppm,
        CAST(q_a * 1000000 // (q_r + q_a + q_n) AS BIGINT) AS a_ppm,
        CAST(q_n * 1000000 // (q_r + q_a + q_n) AS BIGINT) AS n_ppm
      FROM per_part ORDER BY l_partkey"""))

  /** Q84 shape: the customer lookup projection — dimension-chain
    * filter (region + balance band), a concatenated display name, no
    * aggregation at all. */
  val ds91_customer_lookup = Q(
    (s, dir) =>
      T(s, dir, "customer")
        .filter(col("c_acctbal").between(2000.0, 3000.0))
        .join(broadcast(T(s, dir, "nation").select(col("n_nationkey"), col("n_name"),
          col("n_regionkey"))), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T(s, dir, "region").select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
        .select(col("c_custkey"),
          concat(col("c_name"), lit(" : "), col("n_name")).as("customername"))
        .orderBy(col("c_custkey")),
    Some("""
      SELECT c_custkey, c_name || ' : ' || n_name AS customername
      FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE c_acctbal BETWEEN 2000 AND 3000 AND r_name = 'EUROPE'
      ORDER BY c_custkey"""))

  /** Q89 shape: months deviating more than 10% from their brand-year
    * average — the average rides a window over the (brand, year)
    * slice; the 10% screen is the exact integer inequality
    * |cents·n − Σ| · 10 > Σ. */
  val ds92_month_deviation = Q(
    (s, dir) => {
      val monthly = T(s, dir, "lineitem")
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), year(col("l_shipdate")).as("yr"),
          month(col("l_shipdate")).as("mo"))
        .agg((sum(T.dec2(col("l_extendedprice"))) * 100).cast(LongType).as("cents"))
      val w = Window.partitionBy(col("p_brand"), col("yr"))
      monthly
        .select(col("p_brand"), col("yr"), col("mo"), col("cents"),
          sum(col("cents")).over(w).as("yr_cents"),
          count(lit(1)).over(w).as("n_months"))
        .filter(abs(col("cents") * col("n_months") - col("yr_cents")) * 10 > col("yr_cents"))
        .orderBy(col("p_brand"), col("yr"), col("mo"))
    },
    Some("""
      WITH monthly AS (
        SELECT p_brand, CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS yr,
          CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) AS mo,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2, 3)
      SELECT p_brand, yr, mo, cents, yr_cents, n_months FROM (
        SELECT p_brand, yr, mo, cents,
          CAST(SUM(cents) OVER (PARTITION BY p_brand, yr) AS BIGINT) AS yr_cents,
          COUNT(*) OVER (PARTITION BY p_brand, yr) AS n_months
        FROM monthly)
      WHERE ABS(cents * n_months - yr_cents) * 10 > yr_cents
      ORDER BY p_brand, yr, mo"""))

  /** Q91 shape: the returns-loss demographics census — returned
    * revenue by (order priority, market segment) over two segments. */
  val ds93_returns_loss_census = Q(
    (s, dir) =>
      T(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
          col("o_orderpriority")), col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD"))
        .groupBy(col("o_orderpriority"), col("c_mktsegment"))
        .agg((sum(T.dec2(col("l_extendedprice"))) * 100).cast(LongType).as("loss_cents"),
          count(lit(1)).as("n_returns"))
        .orderBy(col("o_orderpriority"), col("c_mktsegment")),
    Some("""
      SELECT o_orderpriority, c_mktsegment,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS loss_cents,
        COUNT(*) AS n_returns
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R' AND c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')
      GROUP BY 1, 2 ORDER BY o_orderpriority, c_mktsegment"""))

  /** Q94 shape: the multi-supplier clean-order count — 1996 orders
    * drawing on at least two distinct suppliers with NO returned line,
    * both existence tests folded into ONE per-order aggregate (no
    * EXISTS/NOT-EXISTS double scan). */
  val ds94_clean_multi_supplier = Q(
    (s, dir) =>
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .filter(year(col("o_orderdate")) === 1996)
        .groupBy(col("o_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("has_ret"),
          (sum(T.dec2(col("l_extendedprice"))) * 100).cast(LongType).as("cents"))
        .filter(col("n_supp") >= 2 && col("has_ret") === 0)
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("total_cents")),
    Some("""
      SELECT COUNT(*) AS n_orders, CAST(SUM(cents) AS BIGINT) AS total_cents
      FROM (
        SELECT o_orderkey,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
        GROUP BY o_orderkey
        HAVING COUNT(DISTINCT l_suppkey) >= 2
           AND MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) = 0)"""))

  /** Q96 shape: the narrow-window selective count — one highly
    * selective conjunctive filter, one number out; every predicate
    * pushes to the scan. Day-of-week is T.dow as in ds64/ds78. */
  val ds95_selective_count = Q(
    (s, dir) =>
      T(s, dir, "lineitem")
        .filter(col("l_quantity").between(26, 30) &&
          T.dow(col("l_shipdate")) === 4 &&
          col("l_discount") >= 0.08)
        .agg(count(lit(1)).as("n_lines")),
    Some("""
      SELECT COUNT(*) AS n_lines
      FROM lineitem
      WHERE l_quantity BETWEEN 26 AND 30
        AND date_diff('day', TIMESTAMP '1970-01-05', l_shipdate) % 7 = 4
        AND l_discount >= CAST(0.08 AS DOUBLE)"""))

  /** Q99 shape: ship-lag buckets by (priority, linestatus) — the
    * catalog twin of ds81's nation panel: five lag bands as columns
    * from one conditional-aggregation pass over the joined fact. */
  val ds96_lag_by_priority = Q(
    (s, dir) => {
      val lag = datediff(col("l_shipdate"), col("o_orderdate"))
      def b(name: String, cond: org.apache.spark.sql.Column) =
        sum(when(cond, 1L).otherwise(0L)).as(name)
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority")), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"), col("l_linestatus"))
        .agg(b("d30", lag <= 30), b("d60", lag > 30 && lag <= 60),
          b("d90", lag > 60 && lag <= 90), b("d120", lag > 90 && lag <= 120),
          b("dover", lag > 120))
        .orderBy(col("o_orderpriority"), col("l_linestatus"))
    },
    Some("""
      SELECT o_orderpriority, l_linestatus,
        COUNT(CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN 1 END) AS d30,
        COUNT(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 30 AND date_diff('day', o_orderdate, l_shipdate) <= 60 THEN 1 END) AS d60,
        COUNT(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60 AND date_diff('day', o_orderdate, l_shipdate) <= 90 THEN 1 END) AS d90,
        COUNT(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90 AND date_diff('day', o_orderdate, l_shipdate) <= 120 THEN 1 END) AS d120,
        COUNT(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 120 THEN 1 END) AS dover
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority, l_linestatus
      ORDER BY o_orderpriority, l_linestatus"""))

  val all: Map[String, Q] = Map(
    "ds90_return_share_panel" -> ds90_return_share_panel,
    "ds91_customer_lookup" -> ds91_customer_lookup,
    "ds92_month_deviation" -> ds92_month_deviation,
    "ds93_returns_loss_census" -> ds93_returns_loss_census,
    "ds94_clean_multi_supplier" -> ds94_clean_multi_supplier,
    "ds95_selective_count" -> ds95_selective_count,
    "ds96_lag_by_priority" -> ds96_lag_by_priority)
}
