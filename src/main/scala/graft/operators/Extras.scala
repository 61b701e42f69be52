package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second-wave coverage: covariance/regression aggregates, IGNORE NULLS
  * navigation, UNNEST WITH ORDINALITY, batch session/hop windows. */
object Extras {

  /** COVAR_POP/SAMP + REGR_SXX/SYY/COUNT via exact decimal moments
    * (ref: SqlStdOperatorTable.java:1228-1252; same decomposition as
    * AggregateReduceFunctionsRule.java). */
  val q27_covar_regr = Q(
    (s, dir) => {
      val x = T.dec2(col("l_quantity"))
      val y = T.dec2(col("l_extendedprice"))
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(x).cast(DoubleType).as("sx"),
          sum(y).cast(DoubleType).as("sy"),
          sum(x * y).cast(DoubleType).as("sxy"),
          sum(x * x).cast(DoubleType).as("sxx"),
          sum(y * y).cast(DoubleType).as("syy"))
        .select(
          col("l_returnflag"), col("n"),
          ((col("sxy") - col("sx") * col("sy") / col("n")) / col("n")).as("covar_pop"),
          ((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1)).as("covar_samp"),
          (col("sxx") - col("sx") * col("sx") / col("n")).as("regr_sxx"),
          (col("syy") - col("sy") * col("sy") / col("n")).as("regr_syy"))
        .orderBy("l_returnflag")
    },
    Some("""
      SELECT l_returnflag, n,
        (sxy - sx * sy / n) / n AS covar_pop,
        (sxy - sx * sy / n) / (n - 1) AS covar_samp,
        (sxx - sx * sx / n) AS regr_sxx,
        (syy - sy * sy / n) AS regr_syy
      FROM (SELECT l_returnflag, COUNT(*) AS n,
              CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
              CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
              CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy
            FROM lineitem GROUP BY l_returnflag) t
      ORDER BY l_returnflag"""))

  /** LAG ... IGNORE NULLS — last purchase value carried to every event
    * (ref: SqlStdOperatorTable.java:1533 IGNORE_NULLS, :1198 LAG). */
  val q28_lag_ignore_nulls = Q(
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      T(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
        .withColumn("pv", when(col("event_type") === "purchase", col("value")))
        .withColumn("prev_purchase", lag(col("pv"), 1, null, ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("value"), col("prev_purchase"))
        .orderBy("user_id", "event_id")
    },
    Some("""
      SELECT user_id, event_id, value, prev_purchase FROM (
        SELECT user_id, event_id, ts, event_type, value,
          LAG(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_purchase
        FROM events) t
      WHERE event_type = 'purchase'
      ORDER BY user_id, event_id"""))

  /** UNNEST WITH ORDINALITY via posexplode
    * (ref: SqlStdOperatorTable.java:1604 UNNEST_WITH_ORDINALITY;
    * rel/core/Uncollect.java withOrdinality). */
  val q29_unnest_ordinality = Q(
    (s, dir) => {
      T(s, dir, "documents")
        .filter(col("doc_id") < 10)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos0", "word")))
        .select(col("doc_id"), (col("pos0") + 1).cast(LongType).as("ord"), col("word"))
        .orderBy("doc_id", "ord")
    },
    Some("""
      SELECT doc_id,
        unnest(range(1, len(string_split(text, ' ')) + 1)) AS ord,
        unnest(string_split(text, ' ')) AS word
      FROM documents WHERE doc_id < 10
      ORDER BY doc_id, ord"""))

  /** Batch SESSION window — session_window() TVF against the
    * gaps-and-islands SQL definition (session end = last event + gap)
    * (ref: SqlStdOperatorTable.java:2612 SESSION TVF). */
  val q64_session_window = Q(
    (s, dir) => {
      T(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n"))
        .orderBy("user_id", "session_start")
    },
    Some("""
      WITH g AS (
        SELECT user_id, ts,
          CASE WHEN epoch_us(ts) - LAG(epoch_us(ts), 1)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800 * 1000000
               OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               THEN 1 ELSE 0 END AS is_new
        FROM events),
      sid AS (
        SELECT user_id, ts,
          SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        FROM g)
      SELECT user_id, MIN(ts) AS session_start,
        MAX(ts) + INTERVAL '30 minutes' AS session_end, COUNT(*) AS n
      FROM sid GROUP BY user_id, sess
      ORDER BY user_id, session_start"""))

  /** Batch HOP (sliding) window — each event lands in size/slide windows
    * (ref: SqlStdOperatorTable.java:2609 HOP TVF). */
  val q65_hop_window = Q(
    (s, dir) => {
      T(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"))
        .orderBy("window_start", "event_type")
    },
    Some("""
      SELECT window_start, event_type, COUNT(*) AS n FROM (
        SELECT event_type,
          unnest([time_bucket(INTERVAL '30 minutes', ts),
                  time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS window_start
        FROM events) t
      GROUP BY window_start, event_type
      ORDER BY window_start, event_type"""))

  /** Explicit GROUPING SETS — arbitrary set list, not just rollup/cube
    * (ref: rel/core/Aggregate.java:118 groupSets; SqlStdOperatorTable
    * .java:236 GROUPING_SETS). */
  val q36_grouping_sets = Q(
    (s, dir) => {
      T.registerViews(s, dir)
      s.sql("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
    },
    Some("""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  /** Correlated scalar subquery in the SELECT list
    * (ref: rex/RexSubQuery.java scalar; decorrelated by Catalyst). */
  val q37_select_scalar_subquery = Q(
    (s, dir) => {
      T.registerViews(s, dir)
      s.sql("""
        SELECT n_nationkey, n_name,
          (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_custs,
          (SELECT MAX(s_acctbal) FROM supplier WHERE s_nationkey = n_nationkey) AS top_supp_bal
        FROM nation ORDER BY n_nationkey""")
    },
    Some("""
      SELECT n_nationkey, n_name,
        (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_custs,
        (SELECT MAX(s_acctbal) FROM supplier WHERE s_nationkey = n_nationkey) AS top_supp_bal
      FROM nation ORDER BY n_nationkey"""))

  /** SUM(x) WITHIN DISTINCT (key) — each distinct key counted once
    * (ref: AggregateExpandWithinDistinctRule.java:1, within-distinct.iq).
    * Lowered to the rule's own two-level expansion: per-key single value,
    * then the outer sum. p_retailprice is functionally dependent on
    * p_partkey, so the grouped max is the WITHIN DISTINCT single value. */
  val q38_within_distinct = Q(
    (s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_returnflag"), col("p_partkey"))
        .agg(max(T.dec2(col("p_retailprice"))).as("price1"), count(lit(1)).as("uses"))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("price1")).cast(DoubleType).as("sum_distinct_price"),
          sum(col("uses")).as("n_lines"))
        .orderBy("l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
        CAST(SUM(price1) AS DOUBLE) AS sum_distinct_price,
        CAST(SUM(uses) AS BIGINT) AS n_lines
      FROM (SELECT l_returnflag, p_partkey,
              MAX(CAST(p_retailprice AS DECIMAL(12,2))) AS price1, COUNT(*) AS uses
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY l_returnflag, p_partkey) t
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** TPC-H Q7-style nation-pair trade volume: double-aliased dimension
    * joins + pair predicate + yearly rollup (ref: TpchTest.java Q7;
    * rel/core/Join.java self-join aliasing). */
  val q39_nation_pairs = Q(
    (s, dir) => {
      val n1 = T(s, dir, "nation").select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val n2 = T(s, dir, "nation").select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(T(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sk"))
        .join(broadcast(n2), col("c_nationkey") === col("ck"))
        .filter(
          (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
        .agg(sum(T.dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(12, 2)) - T.dec2(col("l_discount"))))
          .cast(DoubleType).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some("""
      SELECT supp_nation, cust_nation, l_year,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
              l_extendedprice, l_discount
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) t
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year"""))

  /** TPC-H Q19-style disjunctive multi-predicate join (ref: TpchTest.java
    * Q19; rel/rules/ExpandDisjunctionForJoinInputsRule.java — Catalyst
    * pushes the common l_partkey=p_partkey conjunct into the join and
    * the disjunction into the scan). */
  val q58_disjunctive_join = Q(
    (s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) && col("l_quantity") >= 1 && col("l_quantity") <= 20) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) && col("l_quantity") >= 10 && col("l_quantity") <= 30) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) && col("l_quantity") >= 20 && col("l_quantity") <= 40))
        .agg(sum(T.dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(12, 2)) - T.dec2(col("l_discount"))))
          .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n"))
    },
    Some("""
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        COUNT(*) AS n
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)"""))

  /** Library-function grab bag (ref: SqlLibraryOperators.java —
    * PARSE_URL :480, SUBSTRING_INDEX :1887, FIND_IN_SET :488,
    * MONTHNAME :1082 / DAYNAME :1090, UNIX_SECONDS :2295,
    * SAFE_DIVIDE :2344). DuckDB lacks url/substring_index/find_in_set
    * natives, so the oracle emulates them with regexp/list ops —
    * value-identical. */
  val q101_lib_funcs = Q(
    (s, dir) => {
      import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
      T(s, dir, "orders").filter(col("o_orderkey") <= 2000)
        .withColumn("url",
          concat(lit("https://ex"), (col("o_orderkey") % 3).cast("string"),
            lit(".com/p/"), col("o_orderkey").cast("string"), lit("?q=1")))
        .select(
          col("o_orderkey"),
          date_format(col("o_orderdate"), "MMMM").as("mn"),
          date_format(col("o_orderdate"), "EEEE").as("dn"),
          unix_seconds(to_utc_timestamp(col("o_orderdate"), "UTC")).as("es"),
          parse_url(col("url"), lit("HOST")).as("host"),
          substring_index(lit("a.b.c.d"), ".", 2).as("ssi"),
          expr("find_in_set('y', 'x,y,z')").cast(IntegerType).as("fis"),
          expr("try_divide(o_totalprice, CAST(o_orderkey % 2 AS DOUBLE))").as("sd"))
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
        monthname(o_orderdate) AS mn, dayname(o_orderdate) AS dn,
        CAST(epoch(o_orderdate) AS BIGINT) AS es,
        regexp_extract('https://ex' || CAST(o_orderkey % 3 AS VARCHAR) || '.com/p/' ||
          CAST(o_orderkey AS VARCHAR) || '?q=1', 'https?://([^/]+)', 1) AS host,
        array_to_string(list_slice(string_split('a.b.c.d', '.'), 1, 2), '.') AS ssi,
        CAST(list_position(string_split('x,y,z', ','), 'y') AS INT) AS fis,
        o_totalprice / nullif(CAST(o_orderkey % 2 AS DOUBLE), 0.0) AS sd
      FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey"""))

  val all: Map[String, Q] = Map(
    "q101_lib_funcs" -> q101_lib_funcs,
    "q36_grouping_sets" -> q36_grouping_sets,
    "q39_nation_pairs" -> q39_nation_pairs,
    "q58_disjunctive_join" -> q58_disjunctive_join,
    "q38_within_distinct" -> q38_within_distinct,
    "q37_select_scalar_subquery" -> q37_select_scalar_subquery,
    "q27_covar_regr" -> q27_covar_regr,
    "q28_lag_ignore_nulls" -> q28_lag_ignore_nulls,
    "q29_unnest_ordinality" -> q29_unnest_ordinality,
    "q64_session_window" -> q64_session_window,
    "q65_hop_window" -> q65_hop_window)
}
