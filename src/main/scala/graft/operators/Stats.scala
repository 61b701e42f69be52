package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Statistical, approximate, boolean and bit aggregates
  * (ref: SqlStdOperatorTable.java:1120-1368, §2.3 of SURVEY.md). */
object Stats {

  /** STDDEV/VARIANCE via exact decimal moments: Σx and Σx² are summed in
    * decimal (order-independent), the textbook formula then runs in
    * double — deterministic where a native streaming stddev would be
    * order-dependent across shuffles (ref: SqlStdOperatorTable.java:1222
    * STDDEV_POP..:1282 VARIANCE; AggregateReduceFunctionsRule.java does
    * this same moment decomposition). */
  val q17_stats_moments = Q(
    (s, dir) => {
      val x = T.dec2(col("c_acctbal"))
      T(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n"),
          sum(x).cast(DoubleType).as("sx"),
          sum(x * x).cast(DoubleType).as("sxx"))
        .select(
          col("c_mktsegment"),
          col("n"),
          ((col("sxx") - col("sx") * col("sx") / col("n")) / col("n")).as("var_pop"),
          ((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)).as("var_samp"),
          sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / col("n")).as("stddev_pop"))
        .orderBy("c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment, n,
        (sxx - sx * sx / n) / n AS var_pop,
        (sxx - sx * sx / n) / (n - 1) AS var_samp,
        SQRT((sxx - sx * sx / n) / n) AS stddev_pop
      FROM (SELECT c_mktsegment, COUNT(*) AS n,
              CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sx,
              CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)) * CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sxx
            FROM customer GROUP BY c_mktsegment) t
      ORDER BY c_mktsegment"""))

  /** APPROX_COUNT_DISTINCT (HLL, ref: SqlStdOperatorTable.java:1120;
    * profile/ProfilerImpl.java:577 uses the same sketch family). Spark's
    * builtin sketch ESTIMATE differs from DuckDB's, so the hashed
    * surface (r13, the q66 pattern) carries the exact in-query twin plus
    * a boolean pinning the estimate inside the default-rsd (5%) error
    * envelope at 3σ — the oracle asserts TRUE. The estimate VALUE stays
    * spec-gated; q144_hll_relational is the bit-exact sketch-math twin. */
  val q18_approx_distinct = Q(
    (s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")) <=
            col("exact_parts") * lit(0.15)).as("approx_within_15pct"))
        .orderBy("l_returnflag")
    },
    Some("""
      SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
             TRUE AS approx_within_15pct
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** PERCENTILE_CONT / PERCENTILE_DISC with WITHIN GROUP ordering
    * (ref: SqlStdOperatorTable.java:2507-2523). Linear interpolation is
    * the same a+(b-a)*f in both engines over identical doubles. */
  val q19_percentiles = Q(
    (s, dir) => {
      T.registerViews(s, dir)
      s.sql("""
        SELECT o_orderstatus,
          percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS median_price,
          percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS p90_price,
          percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS median_disc
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    },
    Some("""
      SELECT o_orderstatus,
        percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS median_price,
        percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS p90_price,
        percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS median_disc
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** EVERY/SOME (bool_and/bool_or) + COUNTIF
    * (ref: SqlStdOperatorTable.java:1156-1162; SqlLibraryOperators.java:813). */
  val q84_bool_aggs = Q(
    (s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          bool_and(col("l_discount") <= 0.1).as("all_low_disc"),
          bool_or(col("l_quantity") >= 49).as("any_full_qty"),
          count_if(col("l_tax") > 0.05).as("n_high_tax"))
        .orderBy("l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
        bool_and(l_discount <= 0.1) AS all_low_disc,
        bool_or(l_quantity >= 49) AS any_full_qty,
        count(*) FILTER (WHERE l_tax > 0.05) AS n_high_tax
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** BIT_AND / BIT_OR / BIT_XOR aggregates
    * (ref: SqlStdOperatorTable.java:1356-1368). */
  val q85_bit_aggs = Q(
    (s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_linenumber"))
        .agg(
          bit_and(col("l_orderkey")).as("band"),
          bit_or(col("l_orderkey")).as("bor"),
          bit_xor(col("l_orderkey")).as("bxor"),
          count(lit(1)).as("n"))
        .orderBy("l_linenumber")
    },
    Some("""
      SELECT l_linenumber,
        bit_and(l_orderkey) AS band, bit_or(l_orderkey) AS bor,
        bit_xor(l_orderkey) AS bxor, COUNT(*) AS n
      FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber"""))

  /** MODE + ANY_VALUE (ref: SqlStdOperatorTable.java:1110 MODE, :1174
    * ANY_VALUE). Mode ties are broken by taking the smallest value via
    * a deterministic two-level aggregation (Spark's mode() tie-break is
    * unspecified, so we build it from groupBy + max_by — same shape
    * Calcite's AggregateExpandDistinctAggregatesRule produces). */
  val q86_mode = Q(
    (s, dir) => {
      val counts = T(s, dir, "orders")
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"))
      counts.groupBy(col("o_orderpriority"))
        .agg(min_by(col("o_orderstatus"), struct((-col("cnt")).as("neg"), col("o_orderstatus"))).as("mode_status"))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority,
        MAX(CASE WHEN rn = 1 THEN o_orderstatus END) AS mode_status
      FROM (SELECT o_orderpriority, o_orderstatus,
              ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY COUNT(*) DESC, o_orderstatus) AS rn
            FROM orders GROUP BY o_orderpriority, o_orderstatus) t
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** HLL distinct-count sketch as pure relational algebra — the
    * value-checked twin of q18/q66 (whose builtin sketches have
    * engine-specific internals). The sketch here is fully
    * deterministic, so the DuckDB oracle restates the ENTIRE pipeline
    * and the estimates hash-match exactly: md5(key) → 60-bit hash →
    * 6-bit bucket + 54-bit remainder → rho = leading-zero position →
    * per-bucket MAX register → register sum as an exact BIGINT
    * (Σ 2^(55-reg) — no float association anywhere) → one double
    * division per group for the estimate, linear-counting fallback
    * included (both engines branch on the same integers).
    * Scale: identical to production HLL — per-group state is 64
    * registers, partial max per bucket map-side, one shuffle. */
  val q144_hll_relational = Q(
    (s, dir) => {
      T.registerViews(s, dir)
      s.sql("""
        WITH h AS (
          SELECT l_returnflag AS flag,
                 CAST(conv(substr(md5(CAST(l_partkey AS STRING)), 1, 15), 16, 10) AS BIGINT) AS h,
                 l_partkey
          FROM lineitem),
        r AS (
          SELECT flag, shiftright(h, 54) AS bucket,
                 MAX(CASE WHEN h % 18014398509481984 = 0 THEN 55
                          ELSE instr(lpad(bin(h % 18014398509481984), 54, '0'), '1') END) AS reg
          FROM h GROUP BY flag, shiftright(h, 54)),
        srv AS (
          SELECT flag, SUM(shiftleft(CAST(1 AS BIGINT), 55 - reg)) AS ssum,
                 COUNT(*) AS nb
          FROM r GROUP BY flag),
        ex AS (
          SELECT flag, COUNT(DISTINCT l_partkey) AS exact_parts FROM h GROUP BY flag)
        SELECT srv.flag,
               ROUND(CASE WHEN 2904.064e0 * 36028797018963968e0 / CAST(ssum AS DOUBLE) <= 160e0
                           AND nb < 64
                      THEN 64e0 * ln(64e0 / CAST(64 - nb AS DOUBLE))
                      ELSE 2904.064e0 * 36028797018963968e0 / CAST(ssum AS DOUBLE) END, 4)
                 AS approx_parts,
               ex.exact_parts
        FROM srv JOIN ex ON srv.flag = ex.flag
        ORDER BY srv.flag""")
    },
    Some("""
      WITH h AS (
        SELECT l_returnflag AS flag,
               CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15) AS BIGINT) AS h,
               l_partkey
        FROM lineitem),
      r AS (
        SELECT flag, h >> 54 AS bucket,
               MAX(CASE WHEN h % 18014398509481984 = 0 THEN 55
                        ELSE instr(lpad(bin(h % 18014398509481984), 54, '0'), '1') END) AS reg
        FROM h GROUP BY flag, h >> 54),
      srv AS (
        SELECT flag, CAST(SUM(CAST(1 AS BIGINT) << (55 - reg)) AS BIGINT) AS ssum,
               COUNT(*) AS nb
        FROM r GROUP BY flag),
      ex AS (
        SELECT flag, COUNT(DISTINCT l_partkey) AS exact_parts FROM h GROUP BY flag)
      SELECT srv.flag,
             ROUND(CASE WHEN 2904.064e0 * 36028797018963968e0 / CAST(ssum AS DOUBLE) <= 160e0
                         AND nb < 64
                    THEN 64e0 * ln(64e0 / CAST(64 - nb AS DOUBLE))
                    ELSE 2904.064e0 * 36028797018963968e0 / CAST(ssum AS DOUBLE) END, 4)
               AS approx_parts,
             ex.exact_parts
      FROM srv JOIN ex ON srv.flag = ex.flag
      ORDER BY srv.flag"""))

  val all: Map[String, Q] = Map(
    "q17_stats_moments" -> q17_stats_moments,
    "q18_approx_distinct" -> q18_approx_distinct,
    "q144_hll_relational" -> q144_hll_relational,
    "q19_percentiles" -> q19_percentiles,
    "q84_bool_aggs" -> q84_bool_aggs,
    "q85_bit_aggs" -> q85_bit_aggs,
    "q86_mode" -> q86_mode)
}
