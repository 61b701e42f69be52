package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-DS oracle pack 2 (ds07–ds16): ten more decision-support shapes
  * from the reference's TPC-DS surface (ref: plus/.../TpcdsTest.java,
  * queries via net.hydromatic:tpcds), value-checked against DuckDB —
  * the corpus spec runs all 99 end-to-end, these pin the VALUES of the
  * representative patterns: above-average filters (Q1/Q6), monthly
  * brand top-N (Q3), channel INTERSECT (Q33/Q56), time-band scalar
  * panels (Q88), ratio reports (Q90), multi-supplier orders (Q95),
  * below-average items (Q65), calendar rollups (Q42), and best-customer
  * CTE composition (Q23).
  *
  * Determinism contract: every avg-threshold compare is restated as an
  * exact integer-scaled DECIMAL cross-multiply (`n*rev > k*tot` instead
  * of `rev/n > tot*x`), so no float division sits on a filter boundary;
  * money lands on the output surface only as one DECIMAL→DOUBLE cast or
  * an integer. Scale: one fact pass per shape, broadcast dimensions,
  * partial aggregation before every shuffle; windows re-use the
  * aggregate partitioning where the partition key prefixes the group
  * keys.
  */
object Tpcds2 {

  /** Q1 shape: customers whose returned revenue exceeds 1.2× their
    * nation's average returned revenue. The per-nation average is a
    * window over the customer aggregate (no second fact shuffle); the
    * 1.2× compare cross-multiplies DECIMALs (5*rev*n > 6*tot — exact). */
  val ds07_returns_above_avg = Q(
    (s, dir) => {
      val ret = T(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("c_custkey"))
        .agg(sum(T.dec2(col("l_extendedprice"))).as("ret_dec"))
      val w = Window.partitionBy(col("c_nationkey"))
      ret.select(col("c_nationkey"), col("c_custkey"), col("ret_dec"),
          sum(col("ret_dec")).over(w).as("tot"),
          count(lit(1)).over(w).as("n"))
        .filter(col("ret_dec") * lit(5) * col("n") > col("tot") * lit(6))
        .select(col("c_nationkey"), col("c_custkey"),
          col("ret_dec").cast(DoubleType).as("ret_rev"))
        .orderBy("c_nationkey", "c_custkey")
    },
    Some("""
      WITH ret AS (
        SELECT c_nationkey, c_custkey,
          SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS ret_dec
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
        GROUP BY c_nationkey, c_custkey)
      SELECT c_nationkey, c_custkey, CAST(ret_dec AS DOUBLE) AS ret_rev
      FROM (SELECT *,
              SUM(ret_dec) OVER (PARTITION BY c_nationkey) AS tot,
              COUNT(*) OVER (PARTITION BY c_nationkey) AS n
            FROM ret)
      WHERE ret_dec * 5 * n > tot * 6
      ORDER BY c_nationkey, c_custkey"""))

  /** Q3 shape: monthly revenue per brand, top 3 months per brand by
    * revenue (rank window re-uses the aggregate's brand partitioning). */
  val ds08_brand_monthly_topn = Q(
    (s, dir) => {
      val agg = T(s, dir, "lineitem")
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"),
          month(col("l_shipdate")).as("mo"))
        .agg(sum(T.dec2(col("l_extendedprice"))).as("rev_dec"),
          count(lit(1)).as("n_lines"))
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("rev_dec").desc, col("mo"))
      agg.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("p_brand"), col("mo"), col("n_lines"),
          col("rev_dec").cast(DoubleType).as("revenue"),
          col("rk").cast(IntegerType).as("rk"))
        .orderBy("p_brand", "rk")
    },
    Some("""
      SELECT p_brand, mo, n_lines, CAST(rev_dec AS DOUBLE) AS revenue,
        CAST(rk AS INT) AS rk
      FROM (
        SELECT p_brand, mo, n_lines, rev_dec,
          row_number() OVER (PARTITION BY p_brand ORDER BY rev_dec DESC, mo) AS rk
        FROM (
          SELECT p_brand, CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) AS mo,
            SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev_dec,
            COUNT(*) AS n_lines
          FROM lineitem JOIN part ON p_partkey = l_partkey
          GROUP BY p_brand, mo) a) b
      WHERE rk <= 3
      ORDER BY p_brand, rk"""))

  /** Q33/Q56 shape: part types that are top-revenue in BOTH the
    * high-discount and the low-discount channel — two aggregates over
    * disjoint fact slices, INTERSECT on the type key. */
  val ds09_channel_intersect = Q(
    (s, dir) => {
      val li = T(s, dir, "lineitem")
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_type")),
          col("l_partkey") === col("p_partkey"))
      def top(slice: org.apache.spark.sql.DataFrame) = slice
        .groupBy(col("p_type"))
        .agg(sum(T.dec2(col("l_extendedprice"))).as("rev"))
        .orderBy(col("rev").desc, col("p_type")).limit(40)
        .select(col("p_type"))
      top(li.filter(col("l_discount") >= 0.05))
        .intersect(top(li.filter(col("l_discount") < 0.05)))
        .orderBy("p_type")
    },
    Some("""
      WITH hi AS (
        SELECT p_type FROM (
          SELECT p_type, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE l_discount >= 0.05 GROUP BY p_type
          ORDER BY rev DESC, p_type LIMIT 40)),
      lo AS (
        SELECT p_type FROM (
          SELECT p_type, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE l_discount < 0.05 GROUP BY p_type
          ORDER BY rev DESC, p_type LIMIT 40))
      SELECT p_type FROM hi INTERSECT SELECT p_type FROM lo
      ORDER BY p_type"""))

  /** Q88 shape: the time-band panel — one row of independent scalar
    * counts over quantity bands, each a filtered aggregate of the same
    * fact pass (Spark computes all four in ONE scan via conditional
    * aggregation; the reference cross-joins eight scalar subqueries). */
  val ds10_band_panel = Q(
    (s, dir) => {
      T(s, dir, "lineitem").agg(
        sum(when(col("l_quantity") <= 10, 1L).otherwise(0L)).as("b1"),
        sum(when(col("l_quantity") > 10 && col("l_quantity") <= 25, 1L).otherwise(0L)).as("b2"),
        sum(when(col("l_quantity") > 25 && col("l_quantity") <= 40, 1L).otherwise(0L)).as("b3"),
        sum(when(col("l_quantity") > 40, 1L).otherwise(0L)).as("b4"))
    },
    Some("""
      SELECT
        CAST(SUM(CASE WHEN l_quantity <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
        CAST(SUM(CASE WHEN l_quantity > 10 AND l_quantity <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS b2,
        CAST(SUM(CASE WHEN l_quantity > 25 AND l_quantity <= 40 THEN 1 ELSE 0 END) AS BIGINT) AS b3,
        CAST(SUM(CASE WHEN l_quantity > 40 THEN 1 ELSE 0 END) AS BIGINT) AS b4
      FROM lineitem"""))

  /** Q90 shape: morning/afternoon ratio report — here small-vs-large
    * quantity order counts per priority, ratio emitted as an INTEGER
    * ppm (the d36 device: no float division on the hashed surface). */
  val ds11_ratio_report = Q(
    (s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("l_quantity") <= 25, 1L).otherwise(0L)).as("n_small"),
          sum(when(col("l_quantity") > 25, 1L).otherwise(0L)).as("n_large"))
        .withColumn("ratio_ppm",
          floor(col("n_small") * lit(1000000L) / col("n_large")).cast(LongType))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority,
        CAST(SUM(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
        CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
        CAST(FLOOR(SUM(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END) * 1000000.0 /
             SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END)) AS BIGINT) AS ratio_ppm
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Q95 shape: orders shipped from 2+ distinct supplier nations —
    * per-priority counts. One fact shuffle on l_orderkey (count
    * distinct via the supplier broadcast), then a broadcast-joined
    * order-side rollup. */
  val ds12_multi_nation_orders = Q(
    (s, dir) => {
      val multi = T(s, dir, "lineitem")
        .join(T(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_orderkey"))
        .agg(countDistinct(col("s_nationkey")).as("n_nations"))
        .filter(col("n_nations") >= 2)
      T(s, dir, "orders")
        .join(multi, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          max(col("n_nations")).as("max_nations"))
        .orderBy("o_orderpriority")
    },
    Some("""
      WITH multi AS (
        SELECT l_orderkey, COUNT(DISTINCT s_nationkey) AS n_nations
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY l_orderkey HAVING COUNT(DISTINCT s_nationkey) >= 2)
      SELECT o_orderpriority, COUNT(*) AS n_orders, MAX(n_nations) AS max_nations
      FROM orders JOIN multi ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Q65 shape: per-brand parts whose revenue is below 0.8× the brand
    * average — the below-average filter cross-multiplies (5*rev*n <
    * 4*tot) over exact DECIMALs. */
  val ds13_below_avg_items = Q(
    (s, dir) => {
      val byPart = T(s, dir, "lineitem")
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_partkey"))
        .agg(sum(T.dec2(col("l_extendedprice"))).as("rev_dec"))
      val w = Window.partitionBy(col("p_brand"))
      byPart.select(col("p_brand"), col("p_partkey"), col("rev_dec"),
          sum(col("rev_dec")).over(w).as("tot"),
          count(lit(1)).over(w).as("n"))
        .filter(col("rev_dec") * lit(5) * col("n") < col("tot") * lit(4))
        .select(col("p_brand"), col("p_partkey"),
          col("rev_dec").cast(DoubleType).as("revenue"))
        .orderBy("p_brand", "p_partkey")
    },
    Some("""
      WITH byp AS (
        SELECT p_brand, p_partkey,
          SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev_dec
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY p_brand, p_partkey)
      SELECT p_brand, p_partkey, CAST(rev_dec AS DOUBLE) AS revenue
      FROM (SELECT *,
              SUM(rev_dec) OVER (PARTITION BY p_brand) AS tot,
              COUNT(*) OVER (PARTITION BY p_brand) AS n
            FROM byp)
      WHERE rev_dec * 5 * n < tot * 4
      ORDER BY p_brand, p_partkey"""))

  /** Q42 shape: calendar rollup — revenue by (year, day-of-week) with
    * ROLLUP subtotals. DOW follows ISO Monday=1 on both engines
    * (Spark's dayofweek is Sunday=1 — shifted to match DuckDB's
    * isodow). */
  val ds14_calendar_rollup = Q(
    (s, dir) => {
      T(s, dir, "orders")
        .select(year(col("o_orderdate")).as("yr"),
          ((dayofweek(col("o_orderdate")) + lit(5)) % lit(7) + lit(1)).as("dow"),
          T.dec2(col("o_totalprice")).as("price"))
        .rollup(col("yr"), col("dow"))
        .agg(sum(col("price")).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(asc_nulls_first("yr"), asc_nulls_first("dow"))
    },
    Some("""
      SELECT yr, dow, CAST(SUM(price) AS DOUBLE) AS revenue,
        COUNT(*) AS n_orders
      FROM (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
          CAST(isodow(o_orderdate) AS INT) AS dow,
          CAST(o_totalprice AS DECIMAL(12,2)) AS price
        FROM orders)
      GROUP BY ROLLUP(yr, dow)
      ORDER BY yr ASC NULLS FIRST, dow ASC NULLS FIRST"""))

  /** Q23 shape: best customers — customers in the global top decile of
    * total spend whose single largest order is more than an eighth of their spend. CTE composition: two broadcast-size aggregates gate
    * a semi join; thresholds are exact order statistics (row_number
    * over counts), not float quantiles. */
  val ds15_best_customers = Q(
    (s, dir) => {
      val spend = T(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(T.dec2(col("o_totalprice"))).as("spend"),
          max(T.dec2(col("o_totalprice"))).as("max_order"))
      val n = Window.orderBy(col("spend").desc, col("o_custkey"))
      val ranked = spend.withColumn("rk", row_number().over(n))
        .withColumn("n_cust", count(lit(1)).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      ranked.filter(col("rk") * 10 <= col("n_cust"))
        .filter(col("max_order") * lit(8) > col("spend"))
        .select(col("o_custkey"),
          col("spend").cast(DoubleType).as("spend"),
          col("max_order").cast(DoubleType).as("max_order"))
        .orderBy("o_custkey")
    },
    Some("""
      WITH spend AS (
        SELECT o_custkey,
          SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spend,
          MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS max_order
        FROM orders GROUP BY o_custkey),
      ranked AS (
        SELECT *, row_number() OVER (ORDER BY spend DESC, o_custkey) AS rk,
          COUNT(*) OVER () AS n_cust
        FROM spend)
      SELECT o_custkey, CAST(spend AS DOUBLE) AS spend,
        CAST(max_order AS DOUBLE) AS max_order
      FROM ranked
      WHERE rk * 10 <= n_cust AND max_order * 8 > spend
      ORDER BY o_custkey"""))

  /** Q6 shape: per-nation count of customers whose account balance
    * exceeds 1.2× the global average balance — the scalar average is a
    * broadcast single-row aggregate; the compare cross-multiplies
    * (5*bal*n > 6*tot) over exact DECIMALs. */
  val ds16_above_avg_balance = Q(
    (s, dir) => {
      val cust = T(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), T.dec2(col("c_acctbal")).as("bal"))
      val tot = cust.agg(sum(col("bal")).as("tot"), count(lit(1)).as("n"))
      cust.crossJoin(broadcast(tot)) // 1 row: global agg
        .filter(col("bal") * lit(5) * col("n") > col("tot") * lit(6))
        .join(broadcast(T(s, dir, "nation").select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_rich"))
        .orderBy("n_name")
    },
    Some("""
      WITH cust AS (
        SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(12,2)) AS bal
        FROM customer),
      tot AS (SELECT SUM(bal) AS tot, COUNT(*) AS n FROM cust)
      SELECT n_name, COUNT(*) AS n_rich
      FROM cust CROSS JOIN tot
      JOIN nation ON c_nationkey = n_nationkey
      WHERE bal * 5 * n > tot * 6
      GROUP BY n_name ORDER BY n_name"""))

  val all: Map[String, Q] = Map(
    "ds07_returns_above_avg" -> ds07_returns_above_avg,
    "ds08_brand_monthly_topn" -> ds08_brand_monthly_topn,
    "ds09_channel_intersect" -> ds09_channel_intersect,
    "ds10_band_panel" -> ds10_band_panel,
    "ds11_ratio_report" -> ds11_ratio_report,
    "ds12_multi_nation_orders" -> ds12_multi_nation_orders,
    "ds13_below_avg_items" -> ds13_below_avg_items,
    "ds14_calendar_rollup" -> ds14_calendar_rollup,
    "ds15_best_customers" -> ds15_best_customers,
    "ds16_above_avg_balance" -> ds16_above_avg_balance)
}
