package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window/analytic operators (ref: rel/core/Window.java:259-284 frame
  * specs, EnumerableWindow.java:1). Every window here is partitioned by a
  * high-cardinality key, so at 100 TB each partition's state stays small
  * and Spark's WindowExec never sees a single-partition global sort.
  */
object Windows {

  /** ROW_NUMBER/RANK/DENSE_RANK top-K per group — the QUALIFY pattern
    * (ref: SqlStdOperatorTable.java:1518-1524; qualify.iq). */
  val q20_win_topk_per_group = Q(
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      T(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .withColumn("rk", rank().over(w))
        .filter(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice, rn, rk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)) t
      WHERE rn <= 3
      ORDER BY o_custkey, rn"""))

  /** Running sum over ROWS UNBOUNDED PRECEDING frame
    * (ref: rel/core/Window.java:259 isRows). */
  val q21_win_running_sum = Q(
    (s, dir) => {
      // the synthetic generator emits duplicate (l_orderkey,
      // l_linenumber) pairs (118k at sf0.1), so (shipdate, orderkey,
      // linenumber) is NOT a total order — one sf0.1 tie group made the
      // running sum engine-order-dependent. The quantity as the final
      // key makes the result multiset deterministic: any residual tie
      // has equal summands, so the running values coincide in either
      // order. (linenumber, quantity-cents) pack into ONE bigint —
      // cents are exact on the DECIMAL(12,2) and < 2^32, so the packed
      // key induces the same lexicographic preorder while the
      // window sort compares 3 keys instead of 4 and the sort buffer
      // carries one column less (the r11 tiebreak cost, clawed back).
      // DOMAIN CONTRACT of the pack: it is order-preserving ONLY while
      // cents ∈ [0, 2^32) and linenumber ∈ [0, 2^31) — the TPC-H dbgen
      // domain (linenumber 1..7, quantity 1..50). A negative quantity
      // would borrow into the linenumber limb and a 2^31+ linenumber
      // would overflow the Long; any source outside that domain must
      // use the plain 4-column sort key instead of this pack.
      val ln_qty = col("l_linenumber").cast(LongType) * lit(4294967296L) +
        (T.dec2(col("l_quantity")) * lit(100)).cast(LongType)
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("ln_qty"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // ONE exchange instead of two (r15, guide §2.4): range-partition by
      // l_suppkey FIRST — RangePartitioning clusters equal keys, so it
      // satisfies the window's ClusteredDistribution and no second
      // hash exchange is inserted; the final ORDER BY (suppkey, orderkey,
      // linenumber) then only needs a partition-local sort, because the
      // partitions are already suppkey ranges (global order = range order
      // + local sort). This also stops the old plan's range-sampling pass
      // from recomputing the entire Sort+Window subtree a second time
      // (ShuffleExchangeExec with RangePartitioning executes its child
      // once to sample boundaries): sampling now runs against the bare
      // scan. Result rows and their total order are unchanged.
      T(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate"), ln_qty.as("ln_qty"), T.dec2(col("l_quantity")).as("q"))
        .repartitionByRange(col("l_suppkey"))
        .withColumn("running_qty", sum(col("q")).over(w).cast(DoubleType))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
        .sortWithinPartitions("l_suppkey", "l_orderkey", "l_linenumber")
    },
    Some("""
      SELECT l_suppkey, l_orderkey, l_linenumber,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
          PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      FROM lineitem
      ORDER BY l_suppkey, l_orderkey, l_linenumber"""))

  /** RANGE frame over a numeric (day-offset) ordering key: trailing
    * 30-day spend per customer (ref: rel/core/Window.java:263 lowerBound). */
  val q22_win_range_frame = Q(
    (s, dir) => {
      val dayN = datediff(to_date(col("o_orderdate")), lit("1995-01-01"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(dayN)
        .rangeBetween(-30, 0)
      T(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          T.dec2(col("o_totalprice")).as("p"))
        .withColumn("sum30", sum(col("p")).over(w).cast(DoubleType))
        .select(col("o_custkey"), col("o_orderkey"), col("sum30"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""
      SELECT o_custkey, o_orderkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
          PARTITION BY o_custkey
          ORDER BY DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
          RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum30
      FROM orders
      ORDER BY o_custkey, o_orderkey"""))

  /** LEAD/LAG inter-event gaps (ref: SqlStdOperatorTable.java:1192-1198).
    * Gap arithmetic on exact integer microseconds → deterministic avg. */
  val q23_lead_lag_gaps = Q(
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      T(s, dir, "events")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(
          (sum(col("gap_us")).cast(DoubleType) / count(col("gap_us")) / lit(1e6)).as("avg_gap_sec"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id,
        CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us) / 1e6 AS avg_gap_sec,
        COUNT(*) AS n_events
      FROM (SELECT user_id,
              epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
            FROM events) t
      GROUP BY user_id ORDER BY user_id"""))

  /** NTILE deciles within partitions + min/max per tile
    * (ref: SqlStdOperatorTable.java:1204). */
  val q24_ntile = Q(
    (s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"), col("c_custkey"))
      T(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_acctbal"), col("c_custkey"))
        .withColumn("tile", ntile(10).over(w))
        .groupBy(col("c_mktsegment"), col("tile"))
        .agg(count(lit(1)).as("n"), min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"))
        .orderBy(col("c_mktsegment"), col("tile"))
    },
    Some("""
      SELECT c_mktsegment, CAST(tile AS INT) AS tile, COUNT(*) AS n,
        MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi
      FROM (SELECT c_mktsegment, c_acctbal,
              NTILE(10) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS tile
            FROM customer) t
      GROUP BY c_mktsegment, tile ORDER BY c_mktsegment, tile"""))

  /** FIRST_VALUE/LAST_VALUE per key via dual row_number
    * (ref: SqlStdOperatorTable.java:1168-1186). */
  val q25_first_last = Q(
    (s, dir) => {
      val wa = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wd = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      T(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("value"), col("ts"), col("event_id"))
        .withColumn("rn_a", row_number().over(wa))
        .withColumn("rn_d", row_number().over(wd))
        .groupBy(col("user_id"))
        .agg(
          max(when(col("rn_a") === 1, col("event_type"))).as("first_type"),
          max(when(col("rn_a") === 1, col("value"))).as("first_value"),
          max(when(col("rn_d") === 1, col("event_type"))).as("last_type"),
          max(when(col("rn_d") === 1, col("value"))).as("last_value"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id,
        MAX(CASE WHEN rn_a = 1 THEN event_type END) AS first_type,
        MAX(CASE WHEN rn_a = 1 THEN value END) AS first_value,
        MAX(CASE WHEN rn_d = 1 THEN event_type END) AS last_type,
        MAX(CASE WHEN rn_d = 1 THEN value END) AS last_value
      FROM (SELECT user_id, event_type, value,
              ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_a,
              ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM events) t
      GROUP BY user_id ORDER BY user_id"""))

  /** PERCENT_RANK + CUME_DIST (ref: SqlStdOperatorTable.java:1498-1510).
    * Both are ratios of exact integer ranks → deterministic doubles. */
  val q26_percent_rank = Q(
    (s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"), col("c_custkey"))
      T(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .filter(col("pr") >= 0.95)
        .orderBy(col("c_mktsegment"), col("c_custkey"))
    },
    Some("""
      SELECT c_mktsegment, c_custkey, c_acctbal, pr, cd FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
          PERCENT_RANK() OVER w AS pr, CUME_DIST() OVER w AS cd
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)) t
      WHERE pr >= 0.95
      ORDER BY c_mktsegment, c_custkey"""))

  val all: Map[String, Q] = Map(
    "q20_win_topk_per_group" -> q20_win_topk_per_group,
    "q21_win_running_sum" -> q21_win_running_sum,
    "q22_win_range_frame" -> q22_win_range_frame,
    "q23_lead_lag_gaps" -> q23_lead_lag_gaps,
    "q24_ntile" -> q24_ntile,
    "q25_first_last" -> q25_first_last,
    "q26_percent_rank" -> q26_percent_rank)
}
