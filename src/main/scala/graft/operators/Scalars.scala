package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function surface — date/time, string, conditional, math
  * (ref: sql/fun/SqlStdOperatorTable.java §2.6 and
  * sql/fun/SqlLibraryOperators.java §2.7 in SURVEY.md). All of these are
  * projections/aggregations over codegen'd builtins — no UDFs — so they
  * stay inside WholeStageCodegen at any scale.
  */
object Scalars {

  /** DATE_TRUNC monthly rollup (ref: SqlLibraryOperators.java:2185). */
  val q60_date_trunc = Q(
    (s, dir) => {
      T(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n"), T.dsum(col("o_totalprice")).as("total"))
        .orderBy("month")
    },
    Some("""
      SELECT DATE_TRUNC('month', o_orderdate) AS month, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders GROUP BY 1 ORDER BY 1"""))

  /** EXTRACT year/month/quarter/dow (ref: SqlStdOperatorTable.java:2236-2298). */
  val q61_extract_parts = Q(
    (s, dir) => {
      T(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"))
        .agg(count(lit(1)).as("n"))
        .orderBy("y", "q")
    },
    Some("""
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
        CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS q,
        COUNT(*) AS n
      FROM orders GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Date arithmetic: order→ship latency (ref: SqlLibraryOperators.java:167
    * DATEDIFF, SqlStdOperatorTable.java:1550 MINUS_DATE). */
  val q62_date_diff = Q(
    (s, dir) => {
      T(s, dir, "orders")
        .join(T(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          (sum(datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))).cast(DoubleType) /
            count(lit(1))).as("avg_days"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority,
        CAST(SUM(DATE_DIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS DOUBLE) / COUNT(*) AS avg_days,
        COUNT(*) AS n
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Tumbling time window via window() TVF — the batch form of the
    * TUMBLE table function (ref: SqlStdOperatorTable.java:2606,
    * SqlWindowTableFunction.java:53-68; window_start/end columns :116). */
  val q63_tumble_window = Q(
    (s, dir) => {
      T(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), T.dsum(col("value")).as("total"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total"))
        .orderBy("window_start", "event_type")
    },
    Some("""
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** String function pack: UPPER/SUBSTRING/LENGTH/REPLACE/LPAD/CONCAT
    * (ref: SqlStdOperatorTable.java:1809-1886, SqlLibraryOperators.java:332). */
  val q70_string_funcs = Q(
    (s, dir) => {
      T(s, dir, "part")
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 5).as("pfx"),
          length(col("p_name")).as("len"),
          regexp_replace(col("p_type"), "ECONOMY", "ECO").as("typ"),
          lpad(col("p_size").cast(StringType), 4, "0").as("size4"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("bt"))
        .orderBy("p_partkey")
    },
    Some("""
      SELECT p_partkey, UPPER(p_name) AS uname, SUBSTRING(p_name, 1, 5) AS pfx,
        CAST(LENGTH(p_name) AS INT) AS len,
        REPLACE(p_type, 'ECONOMY', 'ECO') AS typ,
        LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size4,
        CONCAT(p_brand, ':', p_type) AS bt
      FROM part ORDER BY p_partkey"""))

  /** Library string pack 2 (ref: SqlLibraryOperators.java — LEVENSHTEIN
    * :1911, TRANSLATE3 :1843, REVERSE :1894, CHR :2389, REPEAT :1875,
    * SPLIT_PART, LEFT/RIGHT :1800-1808; POSITION via instr). */
  val q59_string_funcs2 = Q(
    (s, dir) => {
      T(s, dir, "part")
        .select(
          col("p_partkey"),
          levenshtein(col("p_name"), col("p_type")).as("lev"),
          translate(col("p_name"), "aeiou", "AEIOU").as("tr"),
          reverse(col("p_name")).as("rev"),
          ascii(col("p_name")).as("asc_c"),
          expr("chr(65 + (p_partkey % 26))").as("ch"),
          repeat(col("p_brand"), 2).as("rep"),
          instr(col("p_name"), "e").as("pos"),
          expr("split_part(p_type, 'O', 1)").as("sp"),
          expr("left(p_name, 3)").as("l3"),
          expr("right(p_name, 3)").as("r3"))
        .orderBy("p_partkey")
    },
    Some("""
      SELECT p_partkey,
        CAST(levenshtein(p_name, p_type) AS INT) AS lev,
        translate(p_name, 'aeiou', 'AEIOU') AS tr,
        reverse(p_name) AS rev,
        CAST(ascii(p_name) AS INT) AS asc_c,
        chr(CAST(65 + (p_partkey % 26) AS INTEGER)) AS ch,
        repeat(p_brand, 2) AS rep,
        CAST(strpos(p_name, 'e') AS INT) AS pos,
        split_part(p_type, 'O', 1) AS sp,
        left(p_name, 3) AS l3, right(p_name, 3) AS r3
      FROM part ORDER BY p_partkey"""))

  /** LIKE + POSIX regex match (ref: SqlStdOperatorTable.java:1728 LIKE,
    * :1737-1749 POSIX_REGEX; runtime regex in runtime/SqlFunctions.java). */
  val q71_like_regex = Q(
    (s, dir) => {
      T(s, dir, "part")
        .filter(col("p_name").like("%car%") || col("p_name").rlike("^[ab]"))
        .select(col("p_partkey"), col("p_name"))
        .orderBy("p_partkey")
    },
    Some("""
      SELECT p_partkey, p_name FROM part
      WHERE p_name LIKE '%car%' OR regexp_matches(p_name, '^[ab]')
      ORDER BY p_partkey"""))

  /** Ordered LISTAGG/STRING_AGG (ref: SqlStdOperatorTable.java:2535
    * LISTAGG, SqlLibraryOperators.java:847 STRING_AGG). */
  val q72_string_agg = Q(
    (s, dir) => {
      T(s, dir, "nation")
        .join(T(s, dir, "supplier"), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(concat_ws(",", sort_array(collect_list(col("s_name")))).as("supps"),
          count(lit(1)).as("n"))
        .orderBy("n_name")
    },
    Some("""
      SELECT n_name, string_agg(s_name, ',' ORDER BY s_name) AS supps, COUNT(*) AS n
      FROM nation JOIN supplier ON s_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name"""))

  /** Searched CASE bucketing (ref: SqlStdOperatorTable.java:1760 CASE). */
  val q80_case_buckets = Q(
    (s, dir) => {
      T(s, dir, "lineitem")
        .select(
          when(col("l_quantity") < 10, "low")
            .when(col("l_quantity") < 30, "mid")
            .otherwise("high").as("bucket"),
          T.dec2(col("l_extendedprice")).as("p"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("p")).cast(DoubleType).as("tot"))
        .orderBy("bucket")
    },
    Some("""
      SELECT CASE WHEN l_quantity < 10 THEN 'low'
                  WHEN l_quantity < 30 THEN 'mid'
                  ELSE 'high' END AS bucket,
        COUNT(*) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS tot
      FROM lineitem GROUP BY 1 ORDER BY 1"""))

  /** Math pack: mod/abs/floor/ceil/sqrt/sign (ref:
    * SqlStdOperatorTable.java:1899-2051). sqrt is IEEE-exact, so no
    * rounding slop is needed; ln/exp would need ROUND(x, 6). */
  val q81_math_funcs = Q(
    (s, dir) => {
      T(s, dir, "part")
        .select(
          col("p_partkey"),
          (col("p_partkey") % 7).as("m7"),
          abs(col("p_size") - 25).as("dev"),
          floor(col("p_retailprice")).cast(LongType).as("fl"),
          ceil(col("p_retailprice")).cast(LongType).as("ce"),
          round(sqrt(col("p_size").cast(DoubleType)), 6).as("sq"),
          signum(col("p_size") - 25).cast(IntegerType).as("sg"))
        .orderBy("p_partkey")
    },
    Some("""
      SELECT p_partkey, p_partkey % 7 AS m7, ABS(p_size - 25) AS dev,
        CAST(FLOOR(p_retailprice) AS BIGINT) AS fl,
        CAST(CEIL(p_retailprice) AS BIGINT) AS ce,
        ROUND(SQRT(CAST(p_size AS DOUBLE)), 6) AS sq,
        CAST(SIGN(p_size - 25) AS INT) AS sg
      FROM part ORDER BY p_partkey"""))

  /** NULLIF / COALESCE (ref: SqlStdOperatorTable.java:2100-2105). */
  val q82_nullif_coalesce = Q(
    (s, dir) => {
      T(s, dir, "lineitem")
        .select(coalesce(nullif(col("l_returnflag"), lit("N")), lit("NONE")).as("flag"))
        .groupBy(col("flag"))
        .agg(count(lit(1)).as("n"))
        .orderBy("flag")
    },
    Some("""
      SELECT COALESCE(NULLIF(l_returnflag, 'N'), 'NONE') AS flag, COUNT(*) AS n
      FROM lineitem GROUP BY 1 ORDER BY 1"""))

  /** GREATEST/LEAST + IF/NVL-style conditionals
    * (ref: SqlLibraryOperators.java:496-519, :272-312). */
  val q83_greatest_least = Q(
    (s, dir) => {
      T(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          greatest(col("l_quantity"), col("l_discount") * 100).as("g"),
          least(col("l_tax"), col("l_discount")).as("l"))
        .filter(col("l_orderkey") <= 1000)
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
        GREATEST(l_quantity, l_discount * 100) AS g,
        LEAST(l_tax, l_discount) AS l
      FROM lineitem WHERE l_orderkey <= 1000
      ORDER BY l_orderkey, l_linenumber"""))

  /** SQL SIMILAR TO via our custom Catalyst expression (ref:
    * SqlStdOperatorTable.java:1734; translation mirrors
    * runtime/SqlFunctions.java similar()). Oracle: DuckDB's native
    * SIMILAR TO. */
  val q73_similar_to = Q(
    (s, dir) => {
      T(s, dir, "part")
        .filter(graft.functions.GraftFunctions.similar_to(col("p_name"), lit("%(car|dog)%")))
        .select(col("p_partkey"), col("p_name"))
        .orderBy("p_partkey")
    },
    Some("""
      SELECT p_partkey, p_name FROM part
      WHERE p_name SIMILAR TO '%(car|dog)%'
      ORDER BY p_partkey"""))

  val all: Map[String, Q] = Map(
    "q60_date_trunc" -> q60_date_trunc,
    "q73_similar_to" -> q73_similar_to,
    "q61_extract_parts" -> q61_extract_parts,
    "q62_date_diff" -> q62_date_diff,
    "q63_tumble_window" -> q63_tumble_window,
    "q59_string_funcs2" -> q59_string_funcs2,
    "q70_string_funcs" -> q70_string_funcs,
    "q71_like_regex" -> q71_like_regex,
    "q72_string_agg" -> q72_string_agg,
    "q80_case_buckets" -> q80_case_buckets,
    "q81_math_funcs" -> q81_math_funcs,
    "q82_nullif_coalesce" -> q82_nullif_coalesce,
    "q83_greatest_least" -> q83_greatest_least)
}
