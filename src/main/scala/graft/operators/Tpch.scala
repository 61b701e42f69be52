package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-H breadth pack — the remaining classic query shapes beyond the
  * q01-q09 set, adapted to the driver's reduced schema (no partsupp, no
  * commit/receipt dates; synthetic NATION_n names). Shapes follow the
  * reference's TPC-H surface (plus/src/main/java/org/apache/calcite/
  * adapter/tpch/TpchSchema.java:1, queries exercised by
  * plus/src/test/java/org/apache/calcite/adapter/tpch/TpchTest.java:1).
  *
  * Scale notes, per the 100 TB design point:
  * - every dimension (region/nation/supplier/part/customer) is joined
  *   with an explicit broadcast(), so the fact scan never shuffles for
  *   a dim join;
  * - correlated aggregates (t02 min-cost, t17 avg-qty, t11/t15/t22
  *   global scalars) are decorrelated into pre-aggregations joined back
  *   — one extra partial-agg pass instead of a per-row subquery;
  * - all money math routes through DECIMAL(12,2) (T.dec2/dsum) so the
  *   partial aggregation is order-independent and the DuckDB hash
  *   compare is exact.
  */
object Tpch {

  private def rev(): Column =
    T.dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(12, 2)) - T.dec2(col("l_discount")))

  private val revSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"

  /** TPC-H Q2 shape: min-cost supplier per part inside one region.
    * The correlated MIN subquery decorrelates to a per-part partial
    * aggregation broadcast back onto the (already filtered) join. */
  val t02_min_cost_supplier = Q(
    (s, dir) => {
      val euroSupp = T(s, dir, "supplier")
          .join(broadcast(T(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(T(s, dir, "region").filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
      val parts = T(s, dir, "part").filter(col("p_size") <= 10 && col("p_type") === "LARGE")
      val joined = T(s, dir, "lineitem")
        .join(parts, col("l_partkey") === col("p_partkey"))
        .join(euroSupp, col("l_suppkey") === col("s_suppkey"))
      val minPrice = joined.groupBy(col("l_partkey").as("mp_partkey"))
        .agg(min(col("l_extendedprice")).as("min_price"))
      joined
        .join(minPrice,
          col("l_partkey") === col("mp_partkey") && col("l_extendedprice") === col("min_price"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"), col("p_name"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },
    Some("""
      SELECT s_acctbal, s_name, n_name, p_partkey, p_name
      FROM part, lineitem, supplier, nation, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND p_size <= 10 AND p_type = 'LARGE'
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
        AND l_extendedprice = (
          SELECT min(l2.l_extendedprice)
          FROM lineitem l2, supplier s2, nation n2, region r2
          WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
            AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
            AND r2.r_name = 'EUROPE')
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"""))

  /** TPC-H Q8 shape: national market share — conditional revenue ratio
    * per order year. Six dimension joins, all broadcast. */
  val t08_market_share = Q(
    (s, dir) => {
      val custAmerica = T(s, dir, "customer")
          .join(broadcast(T(s, dir, "nation")).as("cn"), col("c_nationkey") === col("cn.n_nationkey"))
          .join(broadcast(T(s, dir, "region").filter(col("r_name") === "AMERICA")),
            col("cn.n_regionkey") === col("r_regionkey"))
          .select(col("c_custkey"))
      val suppNation = T(s, dir, "supplier")
          .join(broadcast(T(s, dir, "nation")).as("sn"), col("s_nationkey") === col("sn.n_nationkey"))
          .select(col("s_suppkey"), col("sn.n_name").as("supp_nation"))
      val parts = T(s, dir, "part").filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(custAmerica, col("o_custkey") === col("c_custkey"))
        .join(suppNation, col("l_suppkey") === col("s_suppkey"))
        .join(parts, col("l_partkey") === col("p_partkey"))
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(
          sum(when(col("supp_nation") === "NATION_5", rev()).otherwise(lit(0).cast(DecimalType(12, 2))))
            .cast(DoubleType).as("nat"),
          sum(rev()).cast(DoubleType).as("tot"))
        .select(col("yr"), (lit(100.0) * (col("nat") / col("tot"))).as("mkt_share"))
        .orderBy("yr")
    },
    Some(s"""
      SELECT yr, 100.0 * (nat / tot) AS mkt_share FROM (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
          CAST(SUM(CASE WHEN sn.n_name = 'NATION_5' THEN $revSql
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS nat,
          CAST(SUM($revSql) AS DOUBLE) AS tot
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        JOIN region ON r_regionkey = cn.n_regionkey AND r_name = 'AMERICA'
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        JOIN part ON p_partkey = l_partkey AND p_type = 'ECONOMY'
        GROUP BY 1) t ORDER BY yr"""))

  /** TPC-H Q9 shape: profit (revenue minus a retail-price cost proxy)
    * by supplier nation and ship year. */
  val t09_product_profit = Q(
    (s, dir) => {
      val suppNation = T(s, dir, "supplier")
          .join(broadcast(T(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name"))
      val parts = T(s, dir, "part").filter(col("p_name").like("%widget%"))
          .select(col("p_partkey"), col("p_retailprice"))
      T(s, dir, "lineitem")
        .join(parts, col("l_partkey") === col("p_partkey"))
        .join(suppNation, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("n_name").as("nation"), year(col("l_shipdate")).as("yr"))
        .agg(sum(
          rev() - T.dec2(col("p_retailprice")) * T.dec2(col("l_quantity")) * lit(0.1).cast(DecimalType(12, 2)))
          .cast(DoubleType).as("profit"))
        .orderBy("nation", "yr")
    },
    Some(s"""
      SELECT n_name AS nation, CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS yr,
        CAST(SUM($revSql
          - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) * CAST(0.1 AS DECIMAL(12,2))) AS DOUBLE) AS profit
      FROM lineitem
      JOIN part ON p_partkey = l_partkey AND p_name LIKE '%widget%'
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      GROUP BY 1, 2 ORDER BY nation, yr"""))

  /** TPC-H Q10 shape: top returned-item customers by quarter revenue. */
  val t10_returned_items = Q(
    (s, dir) => {
      T(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(T(s, dir, "orders")
          .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-04-01"),
          col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(T(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(rev()).cast(DoubleType).as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some(s"""
      SELECT c_custkey, c_name, CAST(SUM($revSql) AS DOUBLE) AS revenue, c_acctbal, n_name
      FROM customer
      JOIN orders ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON n_nationkey = c_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  /** TPC-H Q11 shape: parts whose summed value exceeds a global-total
    * fraction — HAVING against a scalar subquery, decorrelated into a
    * broadcast cross join of the 1-row total. */
  val t11_important_parts = Q(
    (s, dir) => {
      val base = T(s, dir, "lineitem")
        .join(T(s, dir, "supplier")
            .join(broadcast(T(s, dir, "nation")
                .filter(col("n_name").isin("NATION_7", "NATION_8", "NATION_9"))),
              col("s_nationkey") === col("n_nationkey"))
            .select(col("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"))
      val perPart = base.groupBy(col("l_partkey").as("partkey"))
        .agg(T.dsum(col("l_extendedprice")).as("value"))
      val total = base.agg(T.dsum(col("l_extendedprice")).as("total"))
      perPart.crossJoin(broadcast(total)) // 1 row: global agg
        .filter(col("value") > lit(0.001) * col("total"))
        .select(col("partkey"), col("value"))
        .orderBy(col("value").desc, col("partkey"))
    },
    Some("""
      SELECT l_partkey AS partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS value
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey AND n_name IN ('NATION_7','NATION_8','NATION_9')
      GROUP BY l_partkey
      HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) > 0.001 * (
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey AND n_name IN ('NATION_7','NATION_8','NATION_9'))
      ORDER BY value DESC, partkey"""))

  /** TPC-H Q12 shape: priority line counts per return flag (conditional
    * SUM(CASE) aggregation over a fact-fact join). */
  val t12_priority_lines = Q(
    (s, dir) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      T(s, dir, "orders")
        .join(T(s, dir, "lineitem")
          .filter(col("l_returnflag").isin("A", "R") &&
            col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1998-01-01"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy("l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      WHERE l_returnflag IN ('A','R')
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** TPC-H Q14 shape: promo revenue percentage for one month — a global
    * conditional/total ratio collapsing to one row. */
  val t14_promo_revenue = Q(
    (s, dir) => {
      T(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1997-09-01" && col("l_shipdate") < "1997-10-01")
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", rev()).otherwise(lit(0).cast(DecimalType(12, 2))))
            .cast(DoubleType).as("promo"),
          sum(rev()).cast(DoubleType).as("tot"))
        .select((lit(100.0) * (col("promo") / col("tot"))).as("promo_revenue"))
    },
    Some(s"""
      SELECT 100.0 * (promo / tot) AS promo_revenue FROM (
        SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $revSql
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo,
          CAST(SUM($revSql) AS DOUBLE) AS tot
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00') t"""))

  /** TPC-H Q15 shape: supplier(s) with the maximum quarter revenue —
    * aggregate, then equality against the broadcast 1-row max. */
  val t15_top_supplier = Q(
    (s, dir) => {
      val revenue = T(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1997-04-01")
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(rev()).cast(DoubleType).as("total_revenue"))
      val top = revenue.agg(max(col("total_revenue")).as("m"))
      T(s, dir, "supplier")
        .join(revenue, col("s_suppkey") === col("supplier_no"))
        .join(broadcast(top), col("total_revenue") === col("m"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    },
    Some(s"""
      WITH revenue AS (
        SELECT l_suppkey AS supplier_no, CAST(SUM($revSql) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM supplier JOIN revenue ON s_suppkey = supplier_no
      WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      ORDER BY s_suppkey"""))

  /** TPC-H Q16 shape: distinct-supplier counts per part attribute
    * triple with NOT-style part filters. */
  val t16_supplier_cnt = Q(
    (s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "part").filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 50)),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },
    Some("""
      SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' AND p_size IN (1, 4, 9, 14, 23, 36, 45, 50)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""))

  /** TPC-H Q17 shape: revenue of small-quantity lines vs the per-part
    * average — the correlated AVG decorrelates to a per-part partial
    * aggregation joined back (Catalyst gets one shuffle on l_partkey
    * instead of a per-row subquery). */
  val t17_small_qty = Q(
    (s, dir) => {
      val li = T(s, dir, "lineitem")
      val brand = T(s, dir, "part").filter(col("p_brand") === "Brand#3").select(col("p_partkey"))
      val branded = li.join(brand, col("l_partkey") === col("p_partkey"))
      val avgQty = branded.groupBy(col("l_partkey").as("ap_partkey"))
        .agg((lit(0.5) * (sum(T.dec2(col("l_quantity"))).cast(DoubleType) / count(lit(1)))).as("half_avg"))
      branded
        .join(avgQty, col("l_partkey") === col("ap_partkey"))
        .filter(col("l_quantity") < col("half_avg"))
        .agg((sum(T.dec2(col("l_extendedprice"))).cast(DoubleType) / lit(7.0)).as("avg_yearly"))
    },
    Some("""
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#3'
        AND l_quantity < (
          SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
          FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"""))

  /** TPC-H Q18 shape: large-volume orders — IN over a grouped HAVING
    * subquery, here a semi join against the pre-aggregated order keys. */
  val t18_large_orders = Q(
    (s, dir) => {
      val li = T(s, dir, "lineitem")
      val bigOrders = li.groupBy(col("l_orderkey").as("bo_orderkey"))
        .agg(T.dsum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 300.0)
      T(s, dir, "orders")
        .join(bigOrders, col("o_orderkey") === col("bo_orderkey"))
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
    Some("""
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM customer JOIN orders ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 300)
      GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""))

  /** TPC-H Q20 shape: suppliers with excess shipped quantity of a part
    * family — nested IN chain lowered to semi joins. */
  val t20_excess_suppliers = Q(
    (s, dir) => {
      val partkeys = T(s, dir, "part").filter(col("p_name").like("%widget%")).select(col("p_partkey"))
      val bigShippers = T(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1998-01-01")
        .join(partkeys, col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_suppkey"))
        .agg(T.dsum(col("l_quantity")).as("q"))
        .filter(col("q") > 50.0)
        .select(col("l_suppkey"))
      T(s, dir, "supplier")
        .join(broadcast(T(s, dir, "nation")
          .filter(col("n_name").isin("NATION_3", "NATION_4", "NATION_5"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(bigShippers, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy("s_name")
    },
    Some("""
      SELECT s_suppkey, s_name FROM supplier
      JOIN nation ON n_nationkey = s_nationkey AND n_name IN ('NATION_3','NATION_4','NATION_5')
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 50)
      ORDER BY s_name"""))

  /** TPC-H Q21 shape: the last shipper of multi-supplier finished
    * orders — EXISTS (another supplier's line) + NOT EXISTS (a later
    * line), lowered to a semi and an anti self-join on the fact. */
  val t21_waiting_suppliers = Q(
    (s, dir) => {
      val li = T(s, dir, "lineitem")
      val l1 = li.select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val l2 = li.select(col("l_orderkey").as("l2_orderkey"), col("l_suppkey").as("l2_suppkey"))
      val l3 = li.select(col("l_orderkey").as("l3_orderkey"), col("l_shipdate").as("l3_shipdate"))
      l1
        .join(T(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .join(l2, col("l_orderkey") === col("l2_orderkey") && col("l_suppkey") =!= col("l2_suppkey"),
          "left_semi")
        .join(l3, col("l_orderkey") === col("l3_orderkey") && col("l3_shipdate") > col("l_shipdate"),
          "left_anti")
        .join(T(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(countDistinct(col("l_orderkey")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    },
    Some("""
      SELECT s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
      FROM supplier
      JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
      WHERE EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_shipdate > l1.l_shipdate)
      GROUP BY s_name
      ORDER BY numwait DESC, s_name LIMIT 20"""))

  /** TPC-H Q22 shape: high-balance customers with no recent orders —
    * scalar-subquery threshold + anti join, grouped by segment. */
  val t22_sales_opportunity = Q(
    (s, dir) => {
      val cust = T(s, dir, "customer")
      val avgBal = cust.filter(col("c_acctbal") > 0.0)
        .agg((sum(T.dec2(col("c_acctbal"))).cast(DoubleType) / count(lit(1))).as("avg_bal"))
      val recent = T(s, dir, "orders").filter(col("o_orderdate") >= "2000-01-01")
        .select(col("o_custkey"))
      cust.crossJoin(broadcast(avgBal)) // 1 row: global agg
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"), T.dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment, COUNT(*) AS numcust,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      FROM customer
      WHERE c_acctbal > (
          SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
          FROM customer c2 WHERE c2.c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  val all: Map[String, Q] = Map(
    "t02_min_cost_supplier" -> t02_min_cost_supplier,
    "t08_market_share" -> t08_market_share,
    "t09_product_profit" -> t09_product_profit,
    "t10_returned_items" -> t10_returned_items,
    "t11_important_parts" -> t11_important_parts,
    "t12_priority_lines" -> t12_priority_lines,
    "t14_promo_revenue" -> t14_promo_revenue,
    "t15_top_supplier" -> t15_top_supplier,
    "t16_supplier_cnt" -> t16_supplier_cnt,
    "t17_small_qty" -> t17_small_qty,
    "t18_large_orders" -> t18_large_orders,
    "t20_excess_suppliers" -> t20_excess_suppliers,
    "t21_waiting_suppliers" -> t21_waiting_suppliers,
    "t22_sales_opportunity" -> t22_sales_opportunity)
}
