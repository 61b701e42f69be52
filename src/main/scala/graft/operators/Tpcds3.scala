package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-DS oracle pack 3 (ds17–ds26): the classes the round-8 verdict
  * called out as unchecked (ref: plus/src/test/java/org/apache/calcite/
  * adapter/tpcds/TpcdsTest.java — the reference plans all 99):
  * windowed cumulative market-share (Q51), monthly-deviation panels
  * (Q53/Q63), EXISTS-heavy customer classification (Q10/Q35), rollup
  * hierarchies with within-parent rank (Q36/Q86), big-quantity CTEs
  * (Q18), returns-adjusted sales (Q93), excess-discount windows (Q92),
  * channel ratio reports (Q61), and sequential-period growth (Q31).
  *
  * Same determinism contract as pack 2: money sums go through
  * DECIMAL(12,2) (exact, order-independent), avg-threshold compares
  * cross-multiply integers instead of dividing, counts surface as
  * BIGINT on both sides (DuckDB SUM(int) is HUGEINT → every oracle
  * SUM that lands on the output is CAST to BIGINT), and ratios use the
  * floor(n*1000000/d) integer-ppm device. Scale: one fact pass per
  * shape, broadcast dimensions, windows re-using aggregate
  * partitioning.
  */
object Tpcds3 {

  /** Q51 shape: monthly cumulative revenue per channel (returnflag R
    * vs N), full-outer joined on month, keeping months where the
    * return channel's cumulative overtakes. Window cumsum runs over
    * the small monthly aggregate, not the fact table. */
  val ds17_cumulative_share = Q(
    (s, dir) => {
      def monthly(flag: String, alias: String) = {
        val w = Window.orderBy(col("mo")).rowsBetween(Window.unboundedPreceding, 0)
        T(s, dir, "lineitem").filter(col("l_returnflag") === flag)
          .groupBy((year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).as("mo"))
          .agg(sum(T.dec2(col("l_extendedprice"))).as("rev"))
          .select(col("mo"), sum(col("rev")).over(w).as(alias))
      }
      val r = monthly("R", "cum_r")
      val n = monthly("N", "cum_n")
      r.join(n, Seq("mo"), "full_outer")
        .filter(col("cum_r") > col("cum_n"))
        .select(col("mo"),
          col("cum_r").cast(DoubleType).as("cum_r"),
          col("cum_n").cast(DoubleType).as("cum_n"))
        .orderBy("mo")
    },
    Some("""
      WITH r AS (
        SELECT mo, SUM(rev) OVER (ORDER BY mo ROWS UNBOUNDED PRECEDING) AS cum_r
        FROM (SELECT CAST(EXTRACT(YEAR FROM l_shipdate) * 100 + EXTRACT(MONTH FROM l_shipdate) AS INT) AS mo,
                SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
              FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1)),
      n AS (
        SELECT mo, SUM(rev) OVER (ORDER BY mo ROWS UNBOUNDED PRECEDING) AS cum_n
        FROM (SELECT CAST(EXTRACT(YEAR FROM l_shipdate) * 100 + EXTRACT(MONTH FROM l_shipdate) AS INT) AS mo,
                SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
              FROM lineitem WHERE l_returnflag = 'N' GROUP BY 1))
      SELECT mo, CAST(cum_r AS DOUBLE) AS cum_r, CAST(cum_n AS DOUBLE) AS cum_n
      FROM r FULL OUTER JOIN n USING (mo)
      WHERE cum_r > cum_n
      ORDER BY mo"""))

  /** Q53/Q63 shape: brand-quarters whose revenue deviates from the
    * brand's yearly quarterly average by more than 10% — the deviation
    * compare is the exact cross-multiply |4·rev − tot| · 10 > tot. */
  val ds18_quarterly_deviation = Q(
    (s, dir) => {
      val q = T(s, dir, "lineitem")
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), year(col("l_shipdate")).as("yr"),
          quarter(col("l_shipdate")).as("qtr"))
        .agg(sum(T.dec2(col("l_extendedprice"))).as("rev"))
      val w = Window.partitionBy(col("p_brand"), col("yr"))
      q.select(col("p_brand"), col("yr"), col("qtr"), col("rev"),
          sum(col("rev")).over(w).as("tot"), count(lit(1)).over(w).as("nq"))
        .filter(col("nq") === 4)
        .filter(abs(col("rev") * lit(4) - col("tot")) * lit(10) > col("tot"))
        .select(col("p_brand"), col("yr"), col("qtr"),
          col("rev").cast(DoubleType).as("rev"))
        .orderBy("p_brand", "yr", "qtr")
    },
    Some("""
      WITH q AS (
        SELECT p_brand, CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS yr,
          CAST(EXTRACT(QUARTER FROM l_shipdate) AS INT) AS qtr,
          SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2, 3)
      SELECT p_brand, yr, qtr, CAST(rev AS DOUBLE) AS rev
      FROM (SELECT *, SUM(rev) OVER (PARTITION BY p_brand, yr) AS tot,
              COUNT(*) OVER (PARTITION BY p_brand, yr) AS nq
            FROM q)
      WHERE nq = 4 AND ABS(rev * 4 - tot) * 10 > tot
      ORDER BY p_brand, yr, qtr"""))

  /** Q10 shape: per-nation profile of customers who have a returned
    * line AND an urgent-priority order — two independent EXISTS
    * (left-semi joins on the customer key, both sides pre-aggregated
    * to distinct keys before the shuffle). */
  val ds19_exists_profile = Q(
    (s, dir) => {
      val orders = T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_orderpriority"))
      val returned = T(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"))
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey")).distinct()
      val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey")).distinct()
      T(s, dir, "customer")
        .join(returned, col("c_custkey") === returned("o_custkey"), "left_semi")
        .join(urgent, col("c_custkey") === urgent("o_custkey"), "left_semi")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          min(T.dec2(col("c_acctbal"))).cast(DoubleType).as("min_bal"),
          max(T.dec2(col("c_acctbal"))).cast(DoubleType).as("max_bal"))
        .orderBy("c_nationkey")
    },
    Some("""
      SELECT c_nationkey, COUNT(*) AS n_cust,
        CAST(MIN(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS min_bal,
        CAST(MAX(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS max_bal
      FROM customer
      WHERE EXISTS (
          SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_returnflag = 'R' AND o_custkey = c_custkey)
        AND EXISTS (
          SELECT 1 FROM orders
          WHERE o_orderpriority = '1-URGENT' AND o_custkey = c_custkey)
      GROUP BY c_nationkey ORDER BY c_nationkey"""))

  /** Q35/Q69 shape: customers WITH orders but with NO returned line —
    * a semi join then an anti join on the same key (both sides distinct
    * keys; the anti side reuses the returned-keys build). */
  val ds20_no_returns_profile = Q(
    (s, dir) => {
      val orders = T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val withOrders = orders.select(col("o_custkey")).distinct()
      val returned = T(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"))
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey")).distinct()
      T(s, dir, "customer")
        .join(withOrders, col("c_custkey") === withOrders("o_custkey"), "left_semi")
        .join(returned, col("c_custkey") === returned("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy("c_nationkey", "c_mktsegment")
    },
    Some("""
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS n_cust
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        AND NOT EXISTS (
          SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_returnflag = 'R' AND o_custkey = c_custkey)
      GROUP BY c_nationkey, c_mktsegment
      ORDER BY c_nationkey, c_mktsegment"""))

  /** Q36/Q86 shape: margin hierarchy over ROLLUP(region, nation) with
    * the within-parent rank — lochierarchy = grouping(region) +
    * grouping(nation); rank partitions by (lochierarchy, parent
    * region). Margin and revenue are exact decimal sums; the rank
    * orders by their double ratio with a name tiebreak. */
  val ds21_margin_rollup_rank = Q(
    (s, dir) => {
      val fact = T(s, dir, "lineitem")
        .join(T(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(T(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(T(s, dir, "region").select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"), col("n_name"),
          // price×(1−disc) stays EXACT decimal arithmetic — rounding the
          // double product to 2 decimals per row is engine-specific at
          // the .005 boundaries (Spark HALF_UP vs DuckDB half-even)
          (T.dec2(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(8, 4)) - col("l_discount").cast(DecimalType(8, 4))))
            .as("margin"),
          T.dec2(col("l_extendedprice")).as("rev"))
      val rolled = fact.rollup(col("r_name"), col("n_name"))
        .agg(sum(col("margin")).as("margin"), sum(col("rev")).as("rev"),
          (grouping(col("r_name")) + grouping(col("n_name"))).as("lochierarchy"))
      val w = Window.partitionBy(col("lochierarchy"),
          when(col("lochierarchy") === 0, col("r_name")))
        .orderBy((col("margin").cast(DoubleType) / col("rev").cast(DoubleType)).asc,
          col("n_name").asc_nulls_first)
      rolled.select(col("r_name"), col("n_name"), col("lochierarchy"),
          col("margin").cast(DoubleType).as("margin"),
          rank().over(w).as("rk"))
        .orderBy(desc("lochierarchy"), asc_nulls_first("r_name"), col("rk"),
          asc_nulls_first("n_name"))
    },
    Some("""
      WITH rolled AS (
        SELECT r_name, n_name, SUM(margin) AS margin, SUM(rev) AS rev,
          CAST(GROUPING(r_name) + GROUPING(n_name) AS INT) AS lochierarchy
        FROM (
          SELECT r_name, n_name,
            CAST(l_extendedprice AS DECIMAL(12,2)) *
              (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))) AS margin,
            CAST(l_extendedprice AS DECIMAL(12,2)) AS rev
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey)
        GROUP BY ROLLUP(r_name, n_name))
      SELECT r_name, n_name, lochierarchy, CAST(margin AS DOUBLE) AS margin,
        RANK() OVER (
          PARTITION BY lochierarchy, CASE WHEN lochierarchy = 0 THEN r_name END
          ORDER BY CAST(margin AS DOUBLE) / CAST(rev AS DOUBLE) ASC,
            n_name ASC NULLS FIRST) AS rk
      FROM rolled
      ORDER BY lochierarchy DESC, r_name ASC NULLS FIRST, rk,
        n_name ASC NULLS FIRST"""))

  /** Q18 shape: big-quantity orders — orders whose total quantity tops
    * 150 units, with the buyer and order facts. Quantities are
    * integer-valued doubles → exact BIGINT sums on both sides. */
  val ds22_big_quantity = Q(
    (s, dir) => {
      val big = T(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast(LongType)).as("qty"))
        .filter(col("qty") > 150)
      T(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(T(s, dir, "customer").select(col("c_custkey"), col("c_name")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"),
          T.dec2(col("o_totalprice")).cast(DoubleType).as("totalprice"),
          col("qty"))
        .orderBy(desc("qty"), col("o_orderkey"))
        .limit(50)
    },
    Some("""
      WITH big AS (
        SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS BIGINT)) > 150)
      SELECT c_name, o_orderkey,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS totalprice, qty
      FROM orders JOIN big ON o_orderkey = l_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY qty DESC, o_orderkey
      LIMIT 50"""))

  /** Q93 shape: returns-adjusted customer spend — revenue counts only
    * non-returned lines; the returned value rides along as its own
    * exact column. One fact pass (conditional aggregation, no
    * self-join). */
  val ds23_net_after_returns = Q(
    (s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(
          sum(when(col("l_returnflag") =!= "R", T.dec2(col("l_extendedprice")))
            .otherwise(T.dec2(lit(0)))).as("net_dec"),
          sum(when(col("l_returnflag") === "R", T.dec2(col("l_extendedprice")))
            .otherwise(T.dec2(lit(0)))).as("ret_dec"))
        .select(col("o_custkey"),
          col("net_dec").cast(DoubleType).as("net_rev"),
          col("ret_dec").cast(DoubleType).as("ret_rev"))
        .orderBy(desc("net_rev"), col("o_custkey"))
        .limit(100)
    },
    Some("""
      SELECT o_custkey,
        CAST(SUM(CASE WHEN l_returnflag <> 'R'
          THEN CAST(l_extendedprice AS DECIMAL(12,2))
          ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS net_rev,
        CAST(SUM(CASE WHEN l_returnflag = 'R'
          THEN CAST(l_extendedprice AS DECIMAL(12,2))
          ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS ret_rev
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_custkey
      ORDER BY net_rev DESC, o_custkey
      LIMIT 100"""))

  /** Q92 shape: excess-discount revenue — lines discounted more than
    * 1.3× their part's average discount. The per-part average is a
    * window over the fact scan (no second pass); the compare
    * cross-multiplies exact DECIMAL(8,4) discounts: 10·disc·n > 13·tot. */
  val ds24_excess_discount = Q(
    (s, dir) => {
      val disc = col("l_discount").cast(DecimalType(8, 4))
      val w = Window.partitionBy(col("l_partkey"))
      T(s, dir, "lineitem")
        .select(col("l_partkey"), disc.as("disc"), T.dec2(col("l_extendedprice")).as("price"))
        .select(col("l_partkey"), col("disc"), col("price"),
          sum(col("disc")).over(w).as("tot"), count(lit(1)).over(w).as("n"))
        .filter(col("disc") * lit(10) * col("n") > col("tot") * lit(13))
        .groupBy(col("l_partkey"))
        .agg(sum(col("price")).cast(DoubleType).as("excess_rev"),
          count(lit(1)).as("n_lines"))
        .orderBy(desc("excess_rev"), col("l_partkey"))
        .limit(100)
    },
    Some("""
      SELECT l_partkey, CAST(SUM(price) AS DOUBLE) AS excess_rev,
        COUNT(*) AS n_lines
      FROM (
        SELECT l_partkey, disc, price,
          SUM(disc) OVER (PARTITION BY l_partkey) AS tot,
          COUNT(*) OVER (PARTITION BY l_partkey) AS n
        FROM (SELECT l_partkey, CAST(l_discount AS DECIMAL(8,4)) AS disc,
                CAST(l_extendedprice AS DECIMAL(12,2)) AS price
              FROM lineitem))
      WHERE disc * 10 * n > tot * 13
      GROUP BY l_partkey
      ORDER BY excess_rev DESC, l_partkey
      LIMIT 100"""))

  /** Q61 shape: promo-channel ratio per nation — conditional sums on
    * one customer-joined fact pass; the ratio lands as integer ppm of
    * exact line counts (the floor-ppm device from ds11). */
  val ds25_promo_ratio = Q(
    (s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_type")),
          col("l_partkey") === col("p_partkey"))
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(
          sum(when(col("p_type").startsWith("PROMO"), 1L).otherwise(0L)).as("n_promo"),
          count(lit(1)).as("n_all"))
        .withColumn("promo_ppm",
          floor(col("n_promo") * lit(1000000L) / col("n_all")).cast(LongType))
        .orderBy("c_nationkey")
    },
    Some("""
      SELECT c_nationkey,
        CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END) AS BIGINT) AS n_promo,
        COUNT(*) AS n_all,
        CAST(FLOOR(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END) * 1000000.0
             / COUNT(*)) AS BIGINT) AS promo_ppm
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      GROUP BY c_nationkey ORDER BY c_nationkey"""))

  /** Q31 shape: quarter-over-quarter growth — nations whose quarterly
    * revenue beat the PREVIOUS quarter (lag window over the small
    * nation×quarter aggregate; exact decimal compare). */
  val ds26_qoq_growth = Q(
    (s, dir) => {
      val q = T(s, dir, "lineitem")
        .join(T(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(T(s, dir, "nation").select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"),
          (year(col("l_shipdate")) * 10 + quarter(col("l_shipdate"))).as("yq"))
        .agg(sum(T.dec2(col("l_extendedprice"))).as("rev"))
      val w = Window.partitionBy(col("n_name")).orderBy(col("yq"))
      q.select(col("n_name"), col("yq"), col("rev"),
          lag(col("rev"), 1).over(w).as("prev_rev"))
        .filter(col("prev_rev").isNotNull && col("rev") > col("prev_rev"))
        .select(col("n_name"), col("yq"),
          col("rev").cast(DoubleType).as("rev"),
          col("prev_rev").cast(DoubleType).as("prev_rev"))
        .orderBy("n_name", "yq")
    },
    Some("""
      WITH q AS (
        SELECT n_name,
          CAST(EXTRACT(YEAR FROM l_shipdate) * 10 + EXTRACT(QUARTER FROM l_shipdate) AS INT) AS yq,
          SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY 1, 2)
      SELECT n_name, yq, CAST(rev AS DOUBLE) AS rev,
        CAST(prev_rev AS DOUBLE) AS prev_rev
      FROM (SELECT *, LAG(rev, 1) OVER (PARTITION BY n_name ORDER BY yq) AS prev_rev
            FROM q)
      WHERE prev_rev IS NOT NULL AND rev > prev_rev
      ORDER BY n_name, yq"""))

  val all: Map[String, Q] = Map(
    "ds17_cumulative_share" -> ds17_cumulative_share,
    "ds18_quarterly_deviation" -> ds18_quarterly_deviation,
    "ds19_exists_profile" -> ds19_exists_profile,
    "ds20_no_returns_profile" -> ds20_no_returns_profile,
    "ds21_margin_rollup_rank" -> ds21_margin_rollup_rank,
    "ds22_big_quantity" -> ds22_big_quantity,
    "ds23_net_after_returns" -> ds23_net_after_returns,
    "ds24_excess_discount" -> ds24_excess_discount,
    "ds25_promo_ratio" -> ds25_promo_ratio,
    "ds26_qoq_growth" -> ds26_qoq_growth)
}
