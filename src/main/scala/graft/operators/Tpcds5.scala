package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-DS oracle pack 5 (ds37–ds42): six more of the reference's query
  * classes (plus/src/test/java/org/apache/calcite/adapter/tpcds/
  * TpcdsTest.java) over the TPC-H-ish tables: frequent-item best
  * customers (Q23), cross-channel item consistency (Q58), the monthly
  * wide pivot (Q66), week-offset period comparison (Q59), the
  * multi-channel UNION aggregate (Q33/Q56/Q60), and the channel
  * customer EXCEPT panel (Q87). Determinism contract as packs 2–4.
  */
object Tpcds5 {

  /** Q23 shape: "frequent" parts (ordered in >= 8 distinct orders)
    * and the top 10 customers by exact decimal spend on those parts.
    * The frequent-part set is a semi-join (no row explosion); spend
    * aggregates once per customer. */
  val ds37_frequent_item_buyers = Q(
    (s, dir) => {
      val li = T(s, dir, "lineitem")
      val freq = li.groupBy(col("l_partkey"))
        .agg(countDistinct(col("l_orderkey")).as("n_ord"))
        .filter(col("n_ord") >= 8)
        .select(col("l_partkey"))
      li.join(freq, Seq("l_partkey"), "left_semi")
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(T.dec2(col("l_extendedprice"))).as("spend"))
        .select(col("o_custkey"), col("spend").cast(DoubleType).as("spend"))
        .orderBy(col("spend").desc, col("o_custkey"))
        .limit(10)
    },
    Some("""
      WITH freq AS (
        SELECT l_partkey FROM lineitem
        GROUP BY l_partkey HAVING COUNT(DISTINCT l_orderkey) >= 8)
      SELECT o_custkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      WHERE l_partkey IN (SELECT l_partkey FROM freq)
      GROUP BY o_custkey
      ORDER BY spend DESC, o_custkey LIMIT 10"""))

  /** Q58 shape: brands whose returned-channel revenue sits within 48-52%
    * of the kept-channel half (cross-channel consistency band) — the
    * band compare cross-multiplies exact decimals. */
  val ds38_channel_consistency = Q(
    (s, dir) =>
      T(s, dir, "lineitem")
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          sum(when(col("l_returnflag") === "R", T.dec2(col("l_extendedprice")))
            .otherwise(T.dec2(lit(0)))).as("rev_r"),
          sum(when(col("l_returnflag") =!= "R", T.dec2(col("l_extendedprice")))
            .otherwise(T.dec2(lit(0)))).as("rev_k"))
        .filter(col("rev_r") * 100 >= col("rev_k") * 48 &&
          col("rev_r") * 100 <= col("rev_k") * 52)
        .select(col("p_brand"),
          col("rev_r").cast(DoubleType).as("rev_r"),
          col("rev_k").cast(DoubleType).as("rev_k"))
        .orderBy(col("p_brand")),
    Some("""
      SELECT p_brand, CAST(rev_r AS DOUBLE) AS rev_r, CAST(rev_k AS DOUBLE) AS rev_k
      FROM (
        SELECT p_brand,
          SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(12,2))
              ELSE CAST(0 AS DECIMAL(12,2)) END) AS rev_r,
          SUM(CASE WHEN l_returnflag <> 'R' THEN CAST(l_extendedprice AS DECIMAL(12,2))
              ELSE CAST(0 AS DECIMAL(12,2)) END) AS rev_k
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand)
      WHERE rev_r * 100 >= rev_k * 48 AND rev_r * 100 <= rev_k * 52
      ORDER BY p_brand"""))

  /** Q66 shape: the wide monthly pivot — per supplier-year, 12 monthly
    * quantity columns from ONE conditional-aggregation pass (the
    * reference's form sums 12 CASE columns the same way). */
  val ds39_monthly_pivot = Q(
    (s, dir) => {
      val base = T(s, dir, "lineitem")
        .filter(year(col("l_shipdate")) === 1997)
        .groupBy(col("l_suppkey"))
      val months = (1 to 12).map(m =>
        sum(when(month(col("l_shipdate")) === m, col("l_quantity").cast(LongType))
          .otherwise(0L)).as(f"qty_m$m%02d"))
      base.agg(months.head, months.tail: _*)
        .orderBy(col("l_suppkey"))
    },
    Some {
      val cols = (1 to 12).map(m =>
        f"CAST(SUM(CASE WHEN EXTRACT(MONTH FROM l_shipdate) = $m THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_m$m%02d")
        .mkString(",\n        ")
      s"""
      SELECT l_suppkey,
        $cols
      FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1997
      GROUP BY l_suppkey ORDER BY l_suppkey"""
    })

  /** Q59 shape: month-over-same-month-last-year comparison — the two
    * small monthly aggregates join on the 12-month offset; growth
    * filter cross-multiplies exact decimals. */
  val ds40_period_offset_compare = Q(
    (s, dir) => {
      val monthly = T(s, dir, "lineitem")
        .groupBy((year(col("l_shipdate")) * 12 + (month(col("l_shipdate")) - 1)).as("m"))
        .agg(sum(T.dec2(col("l_extendedprice"))).as("rev"))
      val prev = monthly.select((col("m") + 12).as("m"), col("rev").as("rev_prev"))
      monthly.join(prev, Seq("m"))
        .filter(col("rev") * 10 > col("rev_prev") * 11)
        .select(col("m"), col("rev").cast(DoubleType).as("rev"),
          col("rev_prev").cast(DoubleType).as("rev_prev"))
        .orderBy(col("m"))
    },
    Some("""
      WITH monthly AS (
        SELECT CAST(EXTRACT(YEAR FROM l_shipdate) * 12 + EXTRACT(MONTH FROM l_shipdate) - 1 AS INT) AS m,
          SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
        FROM lineitem GROUP BY 1)
      SELECT a.m AS m, CAST(a.rev AS DOUBLE) AS rev, CAST(b.rev AS DOUBLE) AS rev_prev
      FROM monthly a JOIN monthly b ON a.m = b.m + 12
      WHERE a.rev * 10 > b.rev * 11
      ORDER BY m"""))

  /** Q33/Q56/Q60 shape: the multi-channel UNION aggregate — three
    * filtered slices (priority bands standing in for the channels)
    * union and re-aggregate by brand. Each branch carries its own
    * partial aggregation before the single re-group. */
  val ds41_union_channel_agg = Q(
    (s, dir) => {
      val li = T(s, dir, "lineitem")
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
      def slice(p: String) = li.filter(col("o_orderpriority").startsWith(p))
        .groupBy(col("p_brand"))
        .agg(sum(T.dec2(col("l_extendedprice"))).as("rev"))
      slice("1").unionAll(slice("3")).unionAll(slice("5"))
        .groupBy(col("p_brand"))
        .agg(sum(col("rev")).cast(DoubleType).as("total_rev"))
        .orderBy(col("p_brand"))
    },
    Some("""
      WITH sl AS (
        SELECT p_brand, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority LIKE '1%' GROUP BY p_brand
        UNION ALL
        SELECT p_brand, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority LIKE '3%' GROUP BY p_brand
        UNION ALL
        SELECT p_brand, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority LIKE '5%' GROUP BY p_brand)
      SELECT p_brand, CAST(SUM(rev) AS DOUBLE) AS total_rev
      FROM sl GROUP BY p_brand ORDER BY p_brand"""))

  /** Q87 shape: the channel EXCEPT panel — customers who ordered in
    * 1996 but NOT in 1997, counted. EXCEPT of two key sets collapses
    * into one per-customer aggregate over the order file. */
  val ds42_except_panel = Q(
    (s, dir) =>
      T(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          max(when(year(col("o_orderdate")) === 1996, 1).otherwise(0)).as("y96"),
          max(when(year(col("o_orderdate")) === 1997, 1).otherwise(0)).as("y97"))
        .filter(col("y96") === 1 && col("y97") === 0)
        .agg(count(lit(1)).as("n_lapsed")),
    Some("""
      SELECT COUNT(*) AS n_lapsed FROM (
        SELECT o_custkey,
          MAX(CASE WHEN EXTRACT(YEAR FROM o_orderdate) = 1996 THEN 1 ELSE 0 END) AS y96,
          MAX(CASE WHEN EXTRACT(YEAR FROM o_orderdate) = 1997 THEN 1 ELSE 0 END) AS y97
        FROM orders GROUP BY o_custkey)
      WHERE y96 = 1 AND y97 = 0"""))

  val all: Map[String, Q] = Map(
    "ds37_frequent_item_buyers" -> ds37_frequent_item_buyers,
    "ds38_channel_consistency" -> ds38_channel_consistency,
    "ds39_monthly_pivot" -> ds39_monthly_pivot,
    "ds40_period_offset_compare" -> ds40_period_offset_compare,
    "ds41_union_channel_agg" -> ds41_union_channel_agg,
    "ds42_except_panel" -> ds42_except_panel)
}
