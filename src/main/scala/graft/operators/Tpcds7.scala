package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-DS oracle pack 7 (ds51–ds57): the date-window price-change
  * compare (Q40), OR-of-AND band sums (Q48/Q85), the monthly champion
  * rank (Q79 class), size-band supplier census (Q37/Q82), per-order
  * outliers vs the nation average (Q68 class), the TRUE hour-band
  * census over the events stream table (Q88/Q90), and the
  * consecutive-years streak profile. Determinism contract as packs
  * 2–6; the events table routes through T() (nanos→µs, matching
  * DuckDB's truncation).
  */
object Tpcds7 {

  /** Q40 shape: quantity sold in the 30 days before vs after a price
    * change date, per part — parts that accelerated kept. One filtered
    * scan, integer counts. */
  val ds51_price_change_window = Q(
    (s, dir) => {
      val d0 = lit("1997-06-01").cast("timestamp")
      T(s, dir, "lineitem")
        .filter(col("l_shipdate") >= date_sub(d0, 30) && col("l_shipdate") < date_add(d0, 30))
        .groupBy(col("l_partkey"))
        .agg(
          sum(when(col("l_shipdate") < d0, col("l_quantity").cast(LongType))
            .otherwise(0L)).as("q_before"),
          sum(when(col("l_shipdate") >= d0, col("l_quantity").cast(LongType))
            .otherwise(0L)).as("q_after"))
        .filter(col("q_after") > col("q_before"))
        .orderBy(col("l_partkey"))
    },
    Some("""
      SELECT l_partkey,
        CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1997-06-01' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q_before,
        CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-06-01' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q_after
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-05-02' AND l_shipdate < TIMESTAMP '1997-07-01'
      GROUP BY l_partkey
      HAVING SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-06-01' THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
           > SUM(CASE WHEN l_shipdate < TIMESTAMP '1997-06-01' THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
      ORDER BY l_partkey"""))

  /** Q48/Q85 shape: one aggregate over an OR of AND bands — the
    * band predicate pushes into a single scan, no union of scans. */
  val ds52_or_band_sum = Q(
    (s, dir) =>
      T(s, dir, "lineitem")
        .filter(
          (col("l_quantity").between(1, 15) && col("l_discount") >= 0.05 && col("l_discount") <= 0.07) ||
          (col("l_quantity").between(16, 35) && col("l_discount") >= 0.03 && col("l_discount") <= 0.05) ||
          (col("l_quantity").between(36, 50) && col("l_discount") >= 0.01 && col("l_discount") <= 0.03))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast(LongType)).as("total_qty")),
    Some("""
      SELECT COUNT(*) AS n_rows, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      FROM lineitem
      WHERE (l_quantity BETWEEN 1 AND 15 AND l_discount BETWEEN CAST(0.05 AS DOUBLE) AND CAST(0.07 AS DOUBLE))
         OR (l_quantity BETWEEN 16 AND 35 AND l_discount BETWEEN CAST(0.03 AS DOUBLE) AND CAST(0.05 AS DOUBLE))
         OR (l_quantity BETWEEN 36 AND 50 AND l_discount BETWEEN CAST(0.01 AS DOUBLE) AND CAST(0.03 AS DOUBLE))"""))

  /** Q79 class: the monthly champion — each month's top customer by
    * exact decimal revenue (rank over the small month×customer
    * aggregate, customer key breaking ties deterministically). */
  val ds53_monthly_champion = Q(
    (s, dir) => {
      val mc = T(s, dir, "lineitem")
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy((year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).as("mo"),
          col("o_custkey"))
        .agg(sum(T.dec2(col("l_extendedprice"))).as("rev"))
      val w = Window.partitionBy(col("mo")).orderBy(col("rev").desc, col("o_custkey"))
      mc.select(col("mo"), col("o_custkey"), col("rev"),
          row_number().over(w).as("rn"))
        .filter(col("rn") === 1)
        .select(col("mo"), col("o_custkey"), col("rev").cast(DoubleType).as("rev"))
        .orderBy(col("mo"))
    },
    Some("""
      SELECT mo, o_custkey, CAST(rev AS DOUBLE) AS rev
      FROM (
        SELECT mo, o_custkey, rev,
          ROW_NUMBER() OVER (PARTITION BY mo ORDER BY rev DESC, o_custkey) AS rn
        FROM (
          SELECT CAST(EXTRACT(YEAR FROM l_shipdate) * 100 + EXTRACT(MONTH FROM l_shipdate) AS INT) AS mo,
            o_custkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1, 2))
      WHERE rn = 1 ORDER BY mo"""))

  /** Q37/Q82 shape: the size-band supplier census — parts bucket by
    * p_size, each band counts its distinct suppliers and parts. */
  val ds54_size_band_suppliers = Q(
    (s, dir) =>
      T(s, dir, "lineitem")
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_size")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(floor((col("p_size") - 1) / 13).cast(LongType).as("size_band"))
        .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
          countDistinct(col("l_partkey")).as("n_parts"))
        .orderBy(col("size_band")),
    Some("""
      SELECT CAST(FLOOR((p_size - 1) / 13.0) AS BIGINT) AS size_band,
        COUNT(DISTINCT l_suppkey) AS n_suppliers,
        COUNT(DISTINCT l_partkey) AS n_parts
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1 ORDER BY size_band"""))

  /** Q68 class: orders whose revenue exceeds 2× their nation's average
    * order revenue — per-order totals, the nation average rides a
    * window, the compare cross-multiplies. Output is the per-nation
    * outlier census. */
  val ds55_order_outliers = Q(
    (s, dir) => {
      val perOrder = T(s, dir, "lineitem")
        .join(T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("o_orderkey"))
        .agg(sum(T.dec2(col("l_extendedprice"))).as("rev"))
      val w = Window.partitionBy(col("c_nationkey"))
      perOrder.select(col("c_nationkey"), col("rev"),
          sum(col("rev")).over(w).as("tot"), count(lit(1)).over(w).as("n_ord"))
        .filter(col("rev") * col("n_ord") > col("tot") * 2)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_outliers"))
        .orderBy(col("c_nationkey"))
    },
    Some("""
      SELECT c_nationkey, COUNT(*) AS n_outliers
      FROM (
        SELECT c_nationkey, rev,
          SUM(rev) OVER (PARTITION BY c_nationkey) AS tot,
          COUNT(*) OVER (PARTITION BY c_nationkey) AS n_ord
        FROM (
          SELECT c_nationkey, o_orderkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          GROUP BY c_nationkey, o_orderkey))
      WHERE rev * n_ord > tot * 2
      GROUP BY c_nationkey ORDER BY c_nationkey"""))

  /** Q88/Q90 TRUE form: the hour-band census over the events table
    * (real time-of-day) — 8 three-hour bands from ONE pass; the am/pm
    * ratio in integer ppm rides the same row. */
  val ds56_hour_band_census = Q(
    (s, dir) => {
      val ev = T(s, dir, "events").select(hour(col("ts")).as("h"))
      val bands = (0 until 8).map(b =>
        sum(when(col("h") >= b * 3 && col("h") < (b + 1) * 3, 1L).otherwise(0L))
          .as(s"b$b"))
      val agged = ev.agg(bands.head, bands.tail: _*)
      agged.select((Seq[org.apache.spark.sql.Column]() ++ (0 until 8).map(b => col(s"b$b"))) :+
        floor((col("b0") + col("b1") + col("b2") + col("b3")) * lit(1000000.0) /
          (col("b4") + col("b5") + col("b6") + col("b7"))).cast(LongType).as("am_pm_ppm"): _*)
    },
    Some {
      val cols = (0 until 8).map(b =>
        s"CAST(SUM(CASE WHEN h >= ${b * 3} AND h < ${(b + 1) * 3} THEN 1 ELSE 0 END) AS BIGINT) AS b$b")
        .mkString(",\n        ")
      s"""
      SELECT $cols,
        CAST(FLOOR((b0 + b1 + b2 + b3) * 1000000.0 / (b4 + b5 + b6 + b7)) AS BIGINT) AS am_pm_ppm
      FROM (SELECT EXTRACT(HOUR FROM ts) AS h FROM events)"""
    })

  /** Consecutive-years streak: customers ordering in >= 3 CONSECUTIVE
    * years — the per-customer year sequence walks a lag-2 window over
    * the tiny (customer, year) relation; output is the streak census. */
  val ds57_consecutive_years = Q(
    (s, dir) => {
      val cy = T(s, dir, "orders")
        .select(col("o_custkey"), year(col("o_orderdate")).as("yr")).distinct()
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("yr"))
      cy.select(col("o_custkey"), col("yr"), lag(col("yr"), 2).over(w).as("yr2"))
        .filter(col("yr2").isNotNull && col("yr") - col("yr2") === 2)
        .select(col("o_custkey")).distinct()
        .agg(count(lit(1)).as("n_streak_customers"))
    },
    Some("""
      SELECT COUNT(*) AS n_streak_customers FROM (
        SELECT DISTINCT o_custkey FROM (
          SELECT o_custkey, yr, LAG(yr, 2) OVER (PARTITION BY o_custkey ORDER BY yr) AS yr2
          FROM (SELECT DISTINCT o_custkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr FROM orders))
        WHERE yr2 IS NOT NULL AND yr - yr2 = 2)"""))

  val all: Map[String, Q] = Map(
    "ds51_price_change_window" -> ds51_price_change_window,
    "ds52_or_band_sum" -> ds52_or_band_sum,
    "ds53_monthly_champion" -> ds53_monthly_champion,
    "ds54_size_band_suppliers" -> ds54_size_band_suppliers,
    "ds55_order_outliers" -> ds55_order_outliers,
    "ds56_hour_band_census" -> ds56_hour_band_census,
    "ds57_consecutive_years" -> ds57_consecutive_years)
}
