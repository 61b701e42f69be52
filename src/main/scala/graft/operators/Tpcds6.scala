package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-DS oracle pack 6 (ds43–ds50) — half of the reference's 99
  * shapes now carry an exact DuckDB oracle: per-customer return
  * outliers vs the nation average (Q30), below-average brand-supplier
  * pairs (Q65), two-hop shared-supplier orders (Q95), integer-exact
  * quantity dispersion (Q17/Q39's stddev filter, decomposed so no
  * float ever forms), cross-channel growth-ratio comparison (Q11/Q74),
  * top-decile nations (Q15 class), ship-delay band census (Q62), and
  * within-parent revenue share (Q20/Q36 class). Determinism contract
  * as packs 2–5.
  */
object Tpcds6 {

  /** Q30 shape: customers whose return total exceeds 2× their nation's
    * average per-customer return — the nation average never divides:
    * the compare cross-multiplies (ret · n_cust > 2 · nation_total). */
  val ds43_return_outliers = Q(
    (s, dir) => {
      val perCust = T(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("o_custkey"))
        .agg(sum(T.dec2(col("l_extendedprice"))).as("ret"))
      val w = Window.partitionBy(col("c_nationkey"))
      perCust.select(col("c_nationkey"), col("o_custkey"), col("ret"),
          sum(col("ret")).over(w).as("nation_total"),
          count(lit(1)).over(w).as("n_cust"))
        .filter(col("ret") * col("n_cust") > col("nation_total") * 2)
        .select(col("c_nationkey"), col("o_custkey"),
          col("ret").cast(DoubleType).as("ret"))
        .orderBy(col("c_nationkey"), col("o_custkey"))
    },
    Some("""
      SELECT c_nationkey, o_custkey, CAST(ret AS DOUBLE) AS ret
      FROM (
        SELECT c_nationkey, o_custkey, ret,
          SUM(ret) OVER (PARTITION BY c_nationkey) AS nation_total,
          COUNT(*) OVER (PARTITION BY c_nationkey) AS n_cust
        FROM (
          SELECT c_nationkey, o_custkey,
            SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS ret
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          WHERE l_returnflag = 'R'
          GROUP BY c_nationkey, o_custkey))
      WHERE ret * n_cust > nation_total * 2
      ORDER BY c_nationkey, o_custkey"""))

  /** Q65 shape: (supplier, brand) pairs whose revenue falls below half
    * the supplier's average brand revenue — window aggregates over the
    * small pair relation, cross-multiplied compare. */
  val ds44_below_avg_pairs = Q(
    (s, dir) => {
      val pairs = T(s, dir, "lineitem")
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("p_brand"))
        .agg(sum(T.dec2(col("l_extendedprice"))).as("rev"))
      val w = Window.partitionBy(col("l_suppkey"))
      pairs.select(col("l_suppkey"), col("p_brand"), col("rev"),
          sum(col("rev")).over(w).as("tot"), count(lit(1)).over(w).as("nb"))
        .filter(col("rev") * col("nb") * 2 < col("tot"))
        .select(col("l_suppkey"), col("p_brand"), col("rev").cast(DoubleType).as("rev"))
        .orderBy(col("l_suppkey"), col("p_brand"))
    },
    Some("""
      SELECT l_suppkey, p_brand, CAST(rev AS DOUBLE) AS rev
      FROM (
        SELECT l_suppkey, p_brand, rev,
          SUM(rev) OVER (PARTITION BY l_suppkey) AS tot,
          COUNT(*) OVER (PARTITION BY l_suppkey) AS nb
        FROM (
          SELECT l_suppkey, p_brand, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY l_suppkey, p_brand))
      WHERE rev * nb * 2 < tot
      ORDER BY l_suppkey, p_brand"""))

  /** Q95 shape: two-hop pairing — orders whose (customer, supplier)
    * pair recurs in a DIFFERENT order. The pair relation aggregates
    * first (one shuffle), so the "exists another order" test is a
    * count on the pair key, not a fact self-join. */
  val ds45_two_hop_pairs = Q(
    (s, dir) => {
      val pairs = T(s, dir, "lineitem")
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("l_suppkey"), col("o_orderkey")).distinct()
      pairs.groupBy(col("o_custkey"), col("l_suppkey"))
        .agg(countDistinct(col("o_orderkey")).as("n_orders"))
        .filter(col("n_orders") >= 2)
        .agg(count(lit(1)).as("n_pairs"), sum(col("n_orders")).as("n_pair_orders"))
    },
    Some("""
      SELECT COUNT(*) AS n_pairs, CAST(SUM(n_orders) AS BIGINT) AS n_pair_orders
      FROM (
        SELECT o_custkey, l_suppkey, COUNT(DISTINCT o_orderkey) AS n_orders
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_custkey, l_suppkey)
      WHERE n_orders >= 2"""))

  /** Q17/Q39 shape: quantity dispersion per part — the stddev filter
    * decomposed to INTEGER moments (n, Σq, Σq²), so the variance
    * compare 10·n·Σq² > 14·(Σq)² never forms a float. */
  val ds46_qty_dispersion = Q(
    (s, dir) =>
      T(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity").cast(LongType).as("q"))
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"),
          sum(col("q") * col("q")).as("sqq"))
        .filter(col("n") >= 10 && col("n") * col("sqq") * 10 > col("sq") * col("sq") * 14)
        .orderBy(col("l_partkey")),
    Some("""
      SELECT l_partkey, COUNT(*) AS n,
        CAST(SUM(q) AS BIGINT) AS sq, CAST(SUM(q * q) AS BIGINT) AS sqq
      FROM (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q FROM lineitem)
      GROUP BY l_partkey
      HAVING COUNT(*) >= 10 AND COUNT(*) * SUM(q * q) * 10 > SUM(q) * SUM(q) * 14
      ORDER BY l_partkey"""))

  /** Q11/Q74 shape: customers whose 1996→1997 growth in the returned
    * channel beats their growth in the kept channel — four exact
    * decimal sums per customer, the ratio compare cross-multiplies
    * (r97·k96 > k97·r96), zero divisions. */
  val ds47_growth_ratio_compare = Q(
    (s, dir) => {
      def rev(flagR: Boolean, yr: Int) =
        sum(when((if (flagR) col("l_returnflag") === "R" else col("l_returnflag") =!= "R") &&
          year(col("l_shipdate")) === yr, T.dec2(col("l_extendedprice")))
          .otherwise(T.dec2(lit(0))))
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(rev(flagR = true, 1996).as("r96"), rev(flagR = true, 1997).as("r97"),
          rev(flagR = false, 1996).as("k96"), rev(flagR = false, 1997).as("k97"))
        .filter(col("r96") > 0 && col("k96") > 0 &&
          col("r97") * col("k96") > col("k97") * col("r96"))
        .select(col("o_custkey"),
          col("r96").cast(DoubleType).as("r96"), col("r97").cast(DoubleType).as("r97"),
          col("k96").cast(DoubleType).as("k96"), col("k97").cast(DoubleType).as("k97"))
        .orderBy(col("o_custkey"))
    },
    Some("""
      SELECT o_custkey, CAST(r96 AS DOUBLE) AS r96, CAST(r97 AS DOUBLE) AS r97,
        CAST(k96 AS DOUBLE) AS k96, CAST(k97 AS DOUBLE) AS k97
      FROM (
        SELECT o_custkey,
          SUM(CASE WHEN l_returnflag = 'R' AND EXTRACT(YEAR FROM l_shipdate) = 1996
              THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS r96,
          SUM(CASE WHEN l_returnflag = 'R' AND EXTRACT(YEAR FROM l_shipdate) = 1997
              THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS r97,
          SUM(CASE WHEN l_returnflag <> 'R' AND EXTRACT(YEAR FROM l_shipdate) = 1996
              THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS k96,
          SUM(CASE WHEN l_returnflag <> 'R' AND EXTRACT(YEAR FROM l_shipdate) = 1997
              THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS k97
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_custkey)
      WHERE r96 > 0 AND k96 > 0 AND r97 * k96 > k97 * r96
      ORDER BY o_custkey"""))

  /** Q15 class: nations holding more than a 4.5% share of total revenue —
    * the total rides a window over the |nations|-row aggregate. */
  val ds48_top_decile_nations = Q(
    (s, dir) => {
      val byNation = T(s, dir, "lineitem")
        .join(T(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(T(s, dir, "nation").select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(T.dec2(col("l_extendedprice"))).as("rev"))
      byNation.select(col("n_name"), col("rev"),
          sum(col("rev")).over(Window.partitionBy()).as("total"))
        .filter(col("rev") * 1000 > col("total") * 45)
        .select(col("n_name"), col("rev").cast(DoubleType).as("rev"))
        .orderBy(col("n_name"))
    },
    Some("""
      SELECT n_name, CAST(rev AS DOUBLE) AS rev
      FROM (
        SELECT n_name, rev, SUM(rev) OVER () AS total
        FROM (
          SELECT n_name, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          GROUP BY n_name))
      WHERE rev * 1000 > total * 45
      ORDER BY n_name"""))

  /** Q62 shape: ship-delay band census — days between order and ship
    * date bucketed, counted per band; one conditional-aggregation
    * pass over the joined fact. */
  val ds49_ship_delay_bands = Q(
    (s, dir) =>
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(datediff(col("l_shipdate"), col("o_orderdate")).as("delay"))
        .agg(
          sum(when(col("delay") <= 30, 1L).otherwise(0L)).as("d30"),
          sum(when(col("delay") > 30 && col("delay") <= 60, 1L).otherwise(0L)).as("d60"),
          sum(when(col("delay") > 60 && col("delay") <= 90, 1L).otherwise(0L)).as("d90"),
          sum(when(col("delay") > 90 && col("delay") <= 120, 1L).otherwise(0L)).as("d120"),
          sum(when(col("delay") > 120, 1L).otherwise(0L)).as("dmore")),
    Some("""
      SELECT
        CAST(SUM(CASE WHEN delay <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
        CAST(SUM(CASE WHEN delay > 30 AND delay <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
        CAST(SUM(CASE WHEN delay > 60 AND delay <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90,
        CAST(SUM(CASE WHEN delay > 90 AND delay <= 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120,
        CAST(SUM(CASE WHEN delay > 120 THEN 1 ELSE 0 END) AS BIGINT) AS dmore
      FROM (
        SELECT DATEDIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS delay
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey)"""))

  /** Q20/Q36 class: each brand's revenue share of its parent type
    * grain, as integer ppm (the double-ppm device of packs 2-5: the
    * exact decimal sums cast to DOUBLE once on both engines before the
    * one division). */
  val ds50_share_of_parent = Q(
    (s, dir) => {
      val byBrand = T(s, dir, "lineitem")
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_type"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_type"), col("p_brand"))
        .agg(sum(T.dec2(col("l_extendedprice"))).as("rev"))
      val w = Window.partitionBy(col("p_type"))
      byBrand.select(col("p_type"), col("p_brand"),
          floor(col("rev").cast(DoubleType) * 1000000 /
            sum(col("rev")).over(w).cast(DoubleType)).cast(LongType).as("share_ppm"))
        .orderBy(col("p_type"), col("p_brand"))
    },
    Some("""
      SELECT p_type, p_brand,
        CAST(FLOOR(CAST(rev AS DOUBLE) * 1000000 / CAST(tot AS DOUBLE)) AS BIGINT) AS share_ppm
      FROM (
        SELECT p_type, p_brand, rev, SUM(rev) OVER (PARTITION BY p_type) AS tot
        FROM (
          SELECT p_type, p_brand, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY p_type, p_brand))
      ORDER BY p_type, p_brand"""))

  val all: Map[String, Q] = Map(
    "ds43_return_outliers" -> ds43_return_outliers,
    "ds44_below_avg_pairs" -> ds44_below_avg_pairs,
    "ds45_two_hop_pairs" -> ds45_two_hop_pairs,
    "ds46_qty_dispersion" -> ds46_qty_dispersion,
    "ds47_growth_ratio_compare" -> ds47_growth_ratio_compare,
    "ds48_top_decile_nations" -> ds48_top_decile_nations,
    "ds49_ship_delay_bands" -> ds49_ship_delay_bands,
    "ds50_share_of_parent" -> ds50_share_of_parent)
}
