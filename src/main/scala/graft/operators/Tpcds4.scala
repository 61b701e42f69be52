package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-DS oracle pack 4 (ds27–ds36): ten more of the reference's query
  * classes (ref: plus/src/test/java/org/apache/calcite/adapter/tpcds/
  * TpcdsTest.java plans all 99), re-expressed over the TPC-H-ish
  * tables: worst-return-ratio ranking (Q49), the time-band census
  * panel (Q88), order-size-band customers (Q34/Q73), multi-supplier
  * no-failure orders (Q16), lag/lead neighborhood deviation (Q47/Q57),
  * per-year return-ratio trend (Q78), revenue-band customer histogram
  * (Q54), date-split shipment ratio (Q21), two-period same-item price
  * compare (Q64), and priority share by quarter (Q4-extension of the
  * Q88 panel device).
  *
  * Determinism contract (same as packs 2–3): money through
  * DECIMAL(12,2); quantity (a whole-valued DOUBLE column) CAST to
  * BIGINT before summing; every count/sum that lands on the output is
  * BIGINT on both sides; ratios via the floor(n*1000000/d) ppm device;
  * threshold compares cross-multiply integers/decimals instead of
  * dividing. Scale: one fact pass per shape, dimensions broadcast,
  * windows ride the small aggregate, panels are conditional
  * aggregation (one scan, no N scalar subqueries).
  */
object Tpcds4 {

  /** Q49 shape: brands ranked by return ratio (returned qty over total
    * qty, ppm); worst 5 ranks kept. The rank runs over the per-brand
    * aggregate (|brands| rows), not the fact table. */
  val ds27_return_ratio_rank = Q(
    (s, dir) => {
      val agg = T(s, dir, "lineitem")
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          sum(when(col("l_returnflag") === "R", col("l_quantity").cast(LongType))
            .otherwise(0L)).as("ret_qty"),
          sum(col("l_quantity").cast(LongType)).as("tot_qty"))
        .withColumn("ret_ppm",
          floor(col("ret_qty") * lit(1000000L) / col("tot_qty")).cast(LongType))
      agg.select(col("p_brand"), col("ret_ppm"),
          rank().over(Window.orderBy(col("ret_ppm").desc)).as("rnk"))
        .filter(col("rnk") <= 5)
        .orderBy(col("rnk"), col("p_brand"))
    },
    Some("""
      SELECT p_brand, ret_ppm, rnk FROM (
        SELECT p_brand, ret_ppm, RANK() OVER (ORDER BY ret_ppm DESC) AS rnk
        FROM (
          SELECT p_brand,
            CAST(FLOOR(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
              * 1000000.0 / SUM(CAST(l_quantity AS BIGINT))) AS BIGINT) AS ret_ppm
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY p_brand))
      WHERE rnk <= 5 ORDER BY rnk, p_brand"""))

  /** Q88 shape: the census panel — one row of band counts. The
    * reference writes 8 scalar-subquery scans cross-joined; the
    * Spark-first form is ONE conditional aggregation pass. */
  val ds28_quantity_band_panel = Q(
    (s, dir) =>
      T(s, dir, "lineitem").agg(
        sum(when(col("l_quantity") <= 10, 1L).otherwise(0L)).as("b1"),
        sum(when(col("l_quantity") > 10 && col("l_quantity") <= 20, 1L).otherwise(0L)).as("b2"),
        sum(when(col("l_quantity") > 20 && col("l_quantity") <= 30, 1L).otherwise(0L)).as("b3"),
        sum(when(col("l_quantity") > 30 && col("l_quantity") <= 40, 1L).otherwise(0L)).as("b4"),
        sum(when(col("l_quantity") > 40, 1L).otherwise(0L)).as("b5")),
    Some("""
      SELECT
        CAST(SUM(CASE WHEN l_quantity <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
        CAST(SUM(CASE WHEN l_quantity > 10 AND l_quantity <= 20 THEN 1 ELSE 0 END) AS BIGINT) AS b2,
        CAST(SUM(CASE WHEN l_quantity > 20 AND l_quantity <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS b3,
        CAST(SUM(CASE WHEN l_quantity > 30 AND l_quantity <= 40 THEN 1 ELSE 0 END) AS BIGINT) AS b4,
        CAST(SUM(CASE WHEN l_quantity > 40 THEN 1 ELSE 0 END) AS BIGINT) AS b5
      FROM lineitem"""))

  /** Q34/Q73 shape: customers holding an order of 10–14 line items —
    * the per-order count rides the lineitem aggregate, then one join
    * back to orders for the customer key. */
  val ds29_order_size_band = Q(
    (s, dir) => {
      val sized = T(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_items"))
        .filter(col("n_items").between(10, 14))
      sized.join(T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"), col("n_items"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_custkey, o_orderkey, n_items FROM (
        SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem
        GROUP BY l_orderkey HAVING COUNT(*) BETWEEN 10 AND 14) s
      JOIN orders ON s.l_orderkey = o_orderkey
      ORDER BY o_orderkey"""))

  /** Q16 shape: orders supplied by >= 4 distinct suppliers with NO
    * returned line — the exists/not-exists pair collapses into one
    * per-order aggregate (count distinct + boolean max), then a global
    * count: one shuffle on the natural key. */
  val ds30_multi_supplier_clean = Q(
    (s, dir) =>
      T(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("has_ret"))
        .filter(col("n_supp") >= 4 && col("has_ret") === 0)
        .agg(count(lit(1)).as("n_orders"), sum(col("n_supp")).as("n_supplier_links")),
    Some("""
      SELECT COUNT(*) AS n_orders,
        CAST(SUM(n_supp) AS BIGINT) AS n_supplier_links
      FROM (
        SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp,
          MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_ret
        FROM lineitem GROUP BY l_orderkey)
      WHERE n_supp >= 4 AND has_ret = 0"""))

  /** Q47/Q57 shape: brand-months whose revenue deviates from the mean
    * of its NEIGHBOR months (lag+lead) by more than 20% — the compare
    * is the exact decimal cross-multiply 10·rev > 6·(prev+next). */
  val ds31_neighbor_deviation = Q(
    (s, dir) => {
      val monthly = T(s, dir, "lineitem")
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"),
          (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).as("mo"))
        .agg(sum(T.dec2(col("l_extendedprice"))).as("rev"))
      val w = Window.partitionBy(col("p_brand")).orderBy(col("mo"))
      monthly.select(col("p_brand"), col("mo"), col("rev"),
          lag(col("rev"), 1).over(w).as("prev_rev"),
          lead(col("rev"), 1).over(w).as("next_rev"))
        .filter(col("prev_rev").isNotNull && col("next_rev").isNotNull &&
          col("rev") * 10 > (col("prev_rev") + col("next_rev")) * 6)
        .select(col("p_brand"), col("mo"),
          col("rev").cast(DoubleType).as("rev"),
          col("prev_rev").cast(DoubleType).as("prev_rev"),
          col("next_rev").cast(DoubleType).as("next_rev"))
        .orderBy(col("p_brand"), col("mo"))
    },
    Some("""
      WITH monthly AS (
        SELECT p_brand,
          CAST(EXTRACT(YEAR FROM l_shipdate) * 100 + EXTRACT(MONTH FROM l_shipdate) AS INT) AS mo,
          SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2)
      SELECT p_brand, mo, CAST(rev AS DOUBLE) AS rev,
        CAST(prev_rev AS DOUBLE) AS prev_rev, CAST(next_rev AS DOUBLE) AS next_rev
      FROM (SELECT *,
              LAG(rev, 1) OVER (PARTITION BY p_brand ORDER BY mo) AS prev_rev,
              LEAD(rev, 1) OVER (PARTITION BY p_brand ORDER BY mo) AS next_rev
            FROM monthly)
      WHERE prev_rev IS NOT NULL AND next_rev IS NOT NULL
        AND rev * 10 > (prev_rev + next_rev) * 6
      ORDER BY p_brand, mo"""))

  /** Q78 shape: per-brand yearly return-ratio trend (ppm of quantity
    * returned), years with ratio above 300000 ppm kept. */
  val ds32_yearly_return_trend = Q(
    (s, dir) =>
      T(s, dir, "lineitem")
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), year(col("l_shipdate")).as("yr"))
        .agg(
          sum(when(col("l_returnflag") === "R", col("l_quantity").cast(LongType))
            .otherwise(0L)).as("ret_qty"),
          sum(col("l_quantity").cast(LongType)).as("tot_qty"))
        .withColumn("ret_ppm",
          floor(col("ret_qty") * lit(1000000L) / col("tot_qty")).cast(LongType))
        .filter(col("ret_ppm") > 300000L)
        .select(col("p_brand"), col("yr"), col("ret_ppm"))
        .orderBy(col("p_brand"), col("yr")),
    Some("""
      SELECT p_brand, CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS yr,
        CAST(FLOOR(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
          * 1000000.0 / SUM(CAST(l_quantity AS BIGINT))) AS BIGINT) AS ret_ppm
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
      HAVING CAST(FLOOR(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
          * 1000000.0 / SUM(CAST(l_quantity AS BIGINT))) AS BIGINT) > 300000
      ORDER BY p_brand, yr"""))

  /** Q54 shape: revenue-band customer histogram — each customer's
    * lifetime revenue lands in a 5000-wide band; the histogram counts
    * customers per band. Band arithmetic stays in exact DECIMAL. */
  val ds33_revenue_band_histogram = Q(
    (s, dir) =>
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(T.dec2(col("l_extendedprice"))).as("rev"))
        .select(floor(col("rev") / 5000).cast(LongType).as("band"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("band")),
    Some("""
      SELECT band, COUNT(*) AS n_customers FROM (
        SELECT CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) / 5000) AS BIGINT) AS band
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_custkey)
      GROUP BY band ORDER BY band"""))

  /** Q21 shape: per-supplier before/after date split of shipments;
    * suppliers whose AFTER share beats 60% kept (integer
    * cross-multiply, no division). */
  val ds34_date_split_ratio = Q(
    (s, dir) =>
      T(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(
          sum(when(col("l_shipdate") < lit("1997-01-01").cast("timestamp"), 1L)
            .otherwise(0L)).as("n_before"),
          sum(when(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"), 1L)
            .otherwise(0L)).as("n_after"))
        .filter(col("n_after") * 10 > (col("n_before") + col("n_after")) * 6)
        .orderBy(col("l_suppkey")),
    Some("""
      SELECT l_suppkey,
        CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1997-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS n_before,
        CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS n_after
      FROM lineitem GROUP BY l_suppkey
      HAVING SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01' THEN 1 ELSE 0 END) * 10
           > COUNT(*) * 6
      ORDER BY l_suppkey"""))

  /** Q64 shape: same part sold in BOTH 1995 and 1996 with a higher
    * 1996 average price — the avg compare cross-multiplies the exact
    * decimal sums (sum96·cnt95 > sum95·cnt96), so no division ever
    * happens. Two small per-year aggregates hash-join on the part key. */
  val ds35_two_period_price = Q(
    (s, dir) => {
      def yearly(yr: Int) = T(s, dir, "lineitem")
        .filter(year(col("l_shipdate")) === yr)
        .groupBy(col("l_partkey"))
        .agg(sum(T.dec2(col("l_extendedprice"))).as(s"sum$yr"),
          count(lit(1)).as(s"cnt$yr"))
      yearly(1995).join(yearly(1996), Seq("l_partkey"))
        .filter(col("sum1996") * col("cnt1995") > col("sum1995") * col("cnt1996"))
        .select(col("l_partkey"),
          col("sum1995").cast(DoubleType).as("rev95"), col("cnt1995").as("cnt95"),
          col("sum1996").cast(DoubleType).as("rev96"), col("cnt1996").as("cnt96"))
        .orderBy(col("l_partkey"))
    },
    Some("""
      WITH y95 AS (
        SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sum95,
          COUNT(*) AS cnt95
        FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1995 GROUP BY l_partkey),
      y96 AS (
        SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sum96,
          COUNT(*) AS cnt96
        FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1996 GROUP BY l_partkey)
      SELECT l_partkey, CAST(sum95 AS DOUBLE) AS rev95, cnt95,
        CAST(sum96 AS DOUBLE) AS rev96, cnt96
      FROM y95 JOIN y96 USING (l_partkey)
      WHERE sum96 * cnt95 > sum95 * cnt96
      ORDER BY l_partkey"""))

  /** Priority share by quarter (the Q88 panel device over orders):
    * ppm of URGENT/HIGH orders per quarter — one pass over orders. */
  val ds36_priority_share = Q(
    (s, dir) =>
      T(s, dir, "orders")
        .groupBy((year(col("o_orderdate")) * 10 + quarter(col("o_orderdate"))).as("yq"))
        .agg(
          sum(when(col("o_orderpriority").startsWith("1") ||
            col("o_orderpriority").startsWith("2"), 1L).otherwise(0L)).as("n_pri"),
          count(lit(1)).as("n_all"))
        .withColumn("pri_ppm",
          floor(col("n_pri") * lit(1000000L) / col("n_all")).cast(LongType))
        .orderBy(col("yq")),
    Some("""
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 10 + EXTRACT(QUARTER FROM o_orderdate) AS INT) AS yq,
        CAST(SUM(CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%' THEN 1 ELSE 0 END) AS BIGINT) AS n_pri,
        COUNT(*) AS n_all,
        CAST(FLOOR(SUM(CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%' THEN 1 ELSE 0 END)
          * 1000000.0 / COUNT(*)) AS BIGINT) AS pri_ppm
      FROM orders GROUP BY 1 ORDER BY yq"""))

  val all: Map[String, Q] = Map(
    "ds27_return_ratio_rank" -> ds27_return_ratio_rank,
    "ds28_quantity_band_panel" -> ds28_quantity_band_panel,
    "ds29_order_size_band" -> ds29_order_size_band,
    "ds30_multi_supplier_clean" -> ds30_multi_supplier_clean,
    "ds31_neighbor_deviation" -> ds31_neighbor_deviation,
    "ds32_yearly_return_trend" -> ds32_yearly_return_trend,
    "ds33_revenue_band_histogram" -> ds33_revenue_band_histogram,
    "ds34_date_split_ratio" -> ds34_date_split_ratio,
    "ds35_two_period_price" -> ds35_two_period_price,
    "ds36_priority_share" -> ds36_priority_share)
}
