package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-DS-style shapes — the decision-support patterns the reference's
  * TPC-DS surface exercises (ref: plus/src/test/java/org/apache/calcite/
  * adapter/tpcds/TpcdsTest.java:1, queries via net.hydromatic:tpcds),
  * adapted to the driver's TPC-H-ish schema: channel UNION ALL +
  * ROLLUP (Q5 family), intra-category rank + revenue-ratio windows
  * (Q98/Q12), year-over-year growth self-comparison (Q74/Q75), and
  * top-N over a rollup lattice (Q67).
  *
  * Scale notes: each shape is one fact pass + one shuffle for its
  * aggregate; the window stages re-use the aggregate's partitioning
  * (partition keys prefix the group keys), so no second fact shuffle.
  * Money math routes through DECIMAL(12,2) (T.dec2/dsum) for
  * order-independent partial aggregation.
  */
object Tpcds {

  /** TPC-DS Q5 shape: per-channel revenue report — UNION ALL of
    * differently-shaped sources normalized to (channel, yr, rev),
    * rolled up with GROUPING SETS semantics. One Expand + one shuffle. */
  val ds01_channel_rollup = Q(
    (s, dir) => {
      val lines = T(s, dir, "lineitem").select(
        lit("lineitem").as("channel"),
        year(col("l_shipdate")).as("yr"),
        (T.dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(12, 2)) - T.dec2(col("l_discount")))).as("rev"))
      val ords = T(s, dir, "orders").select(
        lit("orders").as("channel"),
        year(col("o_orderdate")).as("yr"),
        T.dec2(col("o_totalprice")).as("rev"))
      lines.unionAll(ords)
        .rollup(col("channel"), col("yr"))
        .agg(sum(col("rev")).cast(DoubleType).as("revenue"), count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("channel"), asc_nulls_first("yr"))
    },
    Some("""
      SELECT channel, yr, CAST(SUM(rev) AS DOUBLE) AS revenue, COUNT(*) AS n
      FROM (
        SELECT 'lineitem' AS channel, CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS yr,
          CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS rev
        FROM lineitem
        UNION ALL
        SELECT 'orders', CAST(EXTRACT(YEAR FROM o_orderdate) AS INT),
          CAST(o_totalprice AS DECIMAL(12,2))
        FROM orders) t
      GROUP BY ROLLUP(channel, yr)
      ORDER BY channel ASC NULLS FIRST, yr ASC NULLS FIRST"""))

  /** TPC-DS Q98/Q12 shape: revenue per part inside its category, with
    * the intra-category revenue ratio and rank as window functions over
    * the aggregate — the window re-uses the aggregate's hash
    * partitioning on p_type (its partition key is a prefix of the
    * group keys), so no extra fact shuffle. */
  val ds02_rank_ratio = Q(
    (s, dir) => {
      // the per-type total stays DECIMAL through the window sum (exact,
      // order-independent) and casts to double only inside the ratio
      val byPart = T(s, dir, "lineitem")
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_type")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_type"), col("p_partkey"))
        .agg(sum(T.dec2(col("l_extendedprice"))).as("rev_dec"))
      val w = Window.partitionBy(col("p_type"))
      byPart
        .select(col("p_type"), col("p_partkey"),
          col("rev_dec").cast(DoubleType).as("revenue"),
          (col("rev_dec").cast(DoubleType) * lit(100.0) /
            sum(col("rev_dec")).over(w).cast(DoubleType)).as("revenueratio"),
          rank().over(w.orderBy(col("rev_dec").desc, col("p_partkey"))).cast(IntegerType).as("rk"))
        .filter(col("rk") <= 5)
        .orderBy("p_type", "rk")
    },
    Some("""
      SELECT p_type, p_partkey, CAST(rev_dec AS DOUBLE) AS revenue,
        CAST(rev_dec AS DOUBLE) * 100.0 / CAST(tot AS DOUBLE) AS revenueratio, rk
      FROM (
        SELECT p_type, p_partkey, rev_dec,
          SUM(rev_dec) OVER (PARTITION BY p_type) AS tot,
          CAST(RANK() OVER (PARTITION BY p_type ORDER BY rev_dec DESC, p_partkey) AS INT) AS rk
        FROM (
          SELECT p_type, p_partkey,
            SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev_dec
          FROM lineitem JOIN part ON p_partkey = l_partkey
          GROUP BY p_type, p_partkey) a) b
      WHERE rk <= 5
      ORDER BY p_type, rk"""))

  /** TPC-DS Q74/Q75 shape: year-over-year growth — the customer-year
    * aggregate self-compared across adjacent years via lag(), keeping
    * customers whose spend grew more than 10%. One fact shuffle on
    * (custkey, yr); the lag window re-uses the custkey partitioning. */
  val ds03_yoy_growth = Q(
    (s, dir) => {
      val yearly = T(s, dir, "orders")
        .groupBy(col("o_custkey"), year(col("o_orderdate")).as("yr"))
        .agg(T.dsum(col("o_totalprice")).as("total"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("yr"))
      yearly
        .select(col("o_custkey"), col("yr"), col("total"),
          lag(col("total"), 1).over(w).as("prev_total"),
          lag(col("yr"), 1).over(w).as("prev_yr"))
        .filter(col("prev_yr") === col("yr") - 1 &&
          col("total") > col("prev_total") * lit(1.1))
        .select(col("o_custkey"), col("yr"), col("prev_total"), col("total"))
        .orderBy("o_custkey", "yr")
    },
    Some("""
      SELECT o_custkey, yr, prev_total, total
      FROM (
        SELECT o_custkey, yr, total,
          LAG(total, 1) OVER w AS prev_total,
          LAG(yr, 1) OVER w AS prev_yr
        FROM (
          SELECT o_custkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
          FROM orders GROUP BY 1, 2) a
        WINDOW w AS (PARTITION BY o_custkey ORDER BY yr)) b
      WHERE prev_yr = yr - 1 AND total > prev_total * 1.1
      ORDER BY o_custkey, yr"""))

  /** TPC-DS Q67 shape: top-N rows per rollup stratum — rank within each
    * grouping combination of a ROLLUP lattice, keeping the top 3 of
    * each (grouping-id, nation) stratum. */
  val ds04_rollup_topn = Q(
    (s, dir) => {
      val base = T(s, dir, "orders")
        .join(T(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(T(s, dir, "nation").select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("o_orderpriority"))
        .agg(T.dsum(col("o_totalprice")).as("revenue"),
          grouping_id().cast(IntegerType).as("gid"))
      val w = Window.partitionBy(col("gid"), col("n_name"))
        .orderBy(col("revenue").desc, asc_nulls_first("o_orderpriority"))
      base
        .select(col("n_name"), col("o_orderpriority"), col("revenue"), col("gid"),
          rank().over(w).cast(IntegerType).as("rk"))
        .filter(col("rk") <= 3)
        .orderBy(asc_nulls_first("n_name"), col("gid"), col("rk"))
    },
    Some("""
      SELECT n_name, o_orderpriority, revenue, gid, rk
      FROM (
        SELECT n_name, o_orderpriority, revenue, gid,
          CAST(RANK() OVER (PARTITION BY gid, n_name
            ORDER BY revenue DESC, o_orderpriority ASC NULLS FIRST) AS INT) AS rk
        FROM (
          SELECT n_name, o_orderpriority,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
            CAST(GROUPING(n_name) * 2 + GROUPING(o_orderpriority) AS INT) AS gid
          FROM orders
          JOIN customer ON c_custkey = o_custkey
          JOIN nation ON n_nationkey = c_nationkey
          GROUP BY ROLLUP(n_name, o_orderpriority)) a) b
      WHERE rk <= 3
      ORDER BY n_name ASC NULLS FIRST, gid, rk"""))

  /** TPC-DS Q51 shape: cumulative revenue race between two channels —
    * per-month running totals via window over a channel-pivoted
    * aggregate, reporting months where the lineitem cumulative exceeds
    * the orders cumulative. One fact pass per channel, one monthly
    * aggregate shuffle; the running windows ride on 12·years rows. */
  val ds05_cumulative_race = Q(
    (s, dir) => {
      // cumulative sums stay DECIMAL through the window (exact, engine-
      // independent association) and cast to double only on output
      val li = T(s, dir, "lineitem")
        .groupBy(date_trunc("month", col("l_shipdate")).as("mo"))
        .agg(sum(T.dec2(col("l_extendedprice"))).as("li_rev"))
      val or = T(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("mo"))
        .agg(sum(T.dec2(col("o_totalprice"))).as("or_rev"))
      val zero = lit(0).cast(DecimalType(12, 2))
      val w = Window.orderBy(col("mo"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      li.join(or, Seq("mo"), "full_outer")
        .select(col("mo"),
          sum(coalesce(col("li_rev"), zero)).over(w).as("li_cum_d"),
          sum(coalesce(col("or_rev"), zero)).over(w).as("or_cum_d"))
        .filter(col("or_cum_d") > col("li_cum_d"))
        .select(col("mo"),
          col("li_cum_d").cast(DoubleType).as("li_cum"),
          col("or_cum_d").cast(DoubleType).as("or_cum"),
          (col("or_cum_d") - col("li_cum_d")).cast(DoubleType).as("gap"))
        .orderBy("mo")
    },
    Some("""
      WITH li AS (
        SELECT date_trunc('month', l_shipdate) AS mo,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS li_rev
        FROM lineitem GROUP BY 1),
      orr AS (
        SELECT date_trunc('month', o_orderdate) AS mo,
               SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS or_rev
        FROM orders GROUP BY 1),
      j AS (SELECT coalesce(li.mo, orr.mo) AS mo,
                   coalesce(li_rev, CAST(0 AS DECIMAL(12,2))) AS li_rev,
                   coalesce(or_rev, CAST(0 AS DECIMAL(12,2))) AS or_rev
            FROM li FULL OUTER JOIN orr ON li.mo = orr.mo)
      SELECT mo, CAST(li_cum_d AS DOUBLE) AS li_cum, CAST(or_cum_d AS DOUBLE) AS or_cum,
             CAST(or_cum_d - li_cum_d AS DOUBLE) AS gap FROM (
        SELECT mo,
          SUM(li_rev) OVER (ORDER BY mo ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS li_cum_d,
          SUM(or_rev) OVER (ORDER BY mo ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS or_cum_d
        FROM j) t
      WHERE or_cum_d > li_cum_d
      ORDER BY mo"""))

  /** TPC-DS Q36 shape: gross-margin-style ratio per rollup stratum with
    * a LOCHIERARCHY grouping-depth column (grouping() arithmetic) and
    * rank within each hierarchy level — the canonical GROUPING()/
    * ROLLUP/window composition. */
  val ds06_margin_lochierarchy = Q(
    (s, dir) => {
      val li = T(s, dir, "lineitem")
      val agg = li.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(T.dsum(col("l_extendedprice")).as("rev"),
          T.dsum(col("l_quantity")).as("qty"),
          (grouping(col("l_returnflag")) + grouping(col("l_linestatus")))
            .cast(IntegerType).as("lochierarchy"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("lochierarchy"), (col("rev") / col("qty")).as("ratio"))
      val w = Window.partitionBy(col("lochierarchy"))
        .orderBy(col("ratio").desc, col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
      agg.withColumn("rk", row_number().over(w))
        .orderBy(col("lochierarchy").desc, col("rk"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(GROUPING(l_returnflag) + GROUPING(l_linestatus) AS INT) AS lochierarchy,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) /
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS ratio,
        CAST(row_number() OVER (
          PARTITION BY GROUPING(l_returnflag) + GROUPING(l_linestatus)
          ORDER BY CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) /
                   CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) DESC,
                   l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST) AS INT) AS rk
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY lochierarchy DESC, rk"""))

  val all: Map[String, Q] = Map(
    "ds01_channel_rollup" -> ds01_channel_rollup,
    "ds02_rank_ratio" -> ds02_rank_ratio,
    "ds03_yoy_growth" -> ds03_yoy_growth,
    "ds04_rollup_topn" -> ds04_rollup_topn,
    "ds05_cumulative_race" -> ds05_cumulative_race,
    "ds06_margin_lochierarchy" -> ds06_margin_lochierarchy)
}
