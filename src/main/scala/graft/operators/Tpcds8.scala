package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-DS oracle pack 8 (ds58–ds63): the best/worst rank panel (Q44),
  * region rollup with within-region rank (Q70), channel overlap census
  * (Q97), the order-size panel by status (Q13 class), the exact
  * averages panel via sum+count pairs (Q26/Q27 class), and the
  * attribute-disjunction name census (Q41). Determinism contract as
  * packs 2–7.
  */
object Tpcds8 {

  /** Q44 shape: best-3 and worst-3 brands by return ppm in ONE output
    * — two ranks over the same per-brand aggregate, unioned; no second
    * fact pass. */
  val ds58_best_worst_panel = Q(
    (s, dir) => {
      val agg = T(s, dir, "lineitem")
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          sum(when(col("l_returnflag") === "R", col("l_quantity").cast(LongType))
            .otherwise(0L)).as("ret"),
          sum(col("l_quantity").cast(LongType)).as("tot"))
        .select(col("p_brand"),
          floor(col("ret") * lit(1000000.0) / col("tot")).cast(LongType).as("ppm"))
      val best = agg.select(lit("best").as("side"), col("p_brand"), col("ppm"),
        rank().over(Window.orderBy(col("ppm").desc, col("p_brand"))).as("rnk"))
      val worst = agg.select(lit("worst").as("side"), col("p_brand"), col("ppm"),
        rank().over(Window.orderBy(col("ppm").asc, col("p_brand"))).as("rnk"))
      best.unionAll(worst).filter(col("rnk") <= 3)
        .orderBy(col("side"), col("rnk"))
    },
    Some("""
      WITH agg AS (
        SELECT p_brand,
          CAST(FLOOR(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
            * 1000000.0 / SUM(CAST(l_quantity AS BIGINT))) AS BIGINT) AS ppm
        FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand)
      SELECT side, p_brand, ppm, rnk FROM (
        SELECT 'best' AS side, p_brand, ppm,
          RANK() OVER (ORDER BY ppm DESC, p_brand) AS rnk FROM agg
        UNION ALL
        SELECT 'worst' AS side, p_brand, ppm,
          RANK() OVER (ORDER BY ppm ASC, p_brand) AS rnk FROM agg)
      WHERE rnk <= 3 ORDER BY side, rnk"""))

  /** Q70 shape: rollup (region, nation) revenue with each nation's
    * rank INSIDE its region — grouping() distinguishes the rollup
    * levels, the rank rides the nation-grain slice. */
  val ds59_region_rollup_rank = Q(
    (s, dir) => {
      val base = T(s, dir, "lineitem")
        .join(T(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(T(s, dir, "nation").select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(T(s, dir, "region").select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"))
      val rolled = base.rollup(col("r_name"), col("n_name"))
        .agg(sum(T.dec2(col("l_extendedprice"))).as("rev"),
          grouping(col("n_name")).as("g"))
      val w = Window.partitionBy(col("r_name"), col("g")).orderBy(col("rev").desc, col("n_name"))
      rolled.filter(col("r_name").isNotNull)
        .select(col("r_name"), col("n_name"), col("g"),
          col("rev").cast(DoubleType).as("rev"),
          when(col("g") === 0, rank().over(w)).otherwise(0L).as("rnk_in_region"))
        .orderBy(col("r_name"), col("g"), col("rnk_in_region"), col("n_name"))
    },
    Some("""
      SELECT r_name, n_name, g, CAST(rev AS DOUBLE) AS rev,
        CASE WHEN g = 0 THEN RANK() OVER (PARTITION BY r_name, g ORDER BY rev DESC, n_name) ELSE 0 END AS rnk_in_region
      FROM (
        SELECT r_name, n_name, GROUPING(n_name) AS g,
          SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name))
      WHERE r_name IS NOT NULL
      ORDER BY r_name, g, rnk_in_region, n_name"""))

  /** Q97 shape: the channel overlap census — parts sold in the
    * returned channel, the kept channel, or both: one per-part
    * aggregate, three counts from its flags. */
  val ds60_channel_overlap = Q(
    (s, dir) =>
      T(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(
          max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("in_r"),
          max(when(col("l_returnflag") =!= "R", 1).otherwise(0)).as("in_k"))
        .agg(
          sum(when(col("in_r") === 1 && col("in_k") === 0, 1L).otherwise(0L)).as("only_returned"),
          sum(when(col("in_r") === 0 && col("in_k") === 1, 1L).otherwise(0L)).as("only_kept"),
          sum(when(col("in_r") === 1 && col("in_k") === 1, 1L).otherwise(0L)).as("both_channels")),
    Some("""
      SELECT
        CAST(SUM(CASE WHEN in_r = 1 AND in_k = 0 THEN 1 ELSE 0 END) AS BIGINT) AS only_returned,
        CAST(SUM(CASE WHEN in_r = 0 AND in_k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS only_kept,
        CAST(SUM(CASE WHEN in_r = 1 AND in_k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS both_channels
      FROM (
        SELECT l_partkey,
          MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS in_r,
          MAX(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS in_k
        FROM lineitem GROUP BY l_partkey)"""))

  /** Q13 class: order-size panel by order status — per status, counts
    * of small/medium/large orders (line-count bands); the per-order
    * size aggregates once, the panel is conditional aggregation. */
  val ds61_status_size_panel = Q(
    (s, dir) => {
      val sized = T(s, dir, "lineitem")
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_items"))
      sized.join(T(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(
          sum(when(col("n_items") <= 2, 1L).otherwise(0L)).as("small_orders"),
          sum(when(col("n_items").between(3, 5), 1L).otherwise(0L)).as("medium_orders"),
          sum(when(col("n_items") >= 6, 1L).otherwise(0L)).as("large_orders"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""
      SELECT o_orderstatus,
        CAST(SUM(CASE WHEN n_items <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS small_orders,
        CAST(SUM(CASE WHEN n_items BETWEEN 3 AND 5 THEN 1 ELSE 0 END) AS BIGINT) AS medium_orders,
        CAST(SUM(CASE WHEN n_items >= 6 THEN 1 ELSE 0 END) AS BIGINT) AS large_orders
      FROM (SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem GROUP BY l_orderkey) s
      JOIN orders ON s.l_orderkey = o_orderkey
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Q26/Q27 class: the averages panel WITHOUT averaging — per order
    * priority, exact decimal sums and counts for quantity and price
    * (the consumer divides; the contract surface never does). */
  val ds62_exact_avg_panel = Q(
    (s, dir) =>
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast(LongType)).as("sum_qty"),
          sum(T.dec2(col("l_extendedprice"))).cast(DoubleType).as("sum_price"))
        .orderBy(col("o_orderpriority")),
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Q41 shape: the attribute-disjunction census — distinct part
    * names matching an OR of attribute predicates, counted. */
  val ds63_attribute_census = Q(
    (s, dir) =>
      T(s, dir, "part")
        .filter((col("p_type").startsWith("PROMO") && col("p_size") <= 10) ||
          (col("p_type").startsWith("STANDARD") && col("p_size") >= 40))
        .agg(countDistinct(col("p_name")).as("n_names"),
          count(lit(1)).as("n_parts")),
    Some("""
      SELECT COUNT(DISTINCT p_name) AS n_names, COUNT(*) AS n_parts
      FROM part
      WHERE (p_type LIKE 'PROMO%' AND p_size <= 10)
         OR (p_type LIKE 'STANDARD%' AND p_size >= 40)"""))

  val all: Map[String, Q] = Map(
    "ds58_best_worst_panel" -> ds58_best_worst_panel,
    "ds59_region_rollup_rank" -> ds59_region_rollup_rank,
    "ds60_channel_overlap" -> ds60_channel_overlap,
    "ds61_status_size_panel" -> ds61_status_size_panel,
    "ds62_exact_avg_panel" -> ds62_exact_avg_panel,
    "ds63_attribute_census" -> ds63_attribute_census)
}
