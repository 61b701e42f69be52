package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Library function pack 2 — more of the reference's operator library
  * (ref: sql/fun/SqlLibraryOperators.java: RPAD :1489, OVERLAY via
  * SqlStdOperatorTable :1233, HEX-family/FORMAT :2031, STARTS_WITH
  * :1263, ENDS_WITH :1255, CONTAINS_SUBSTR :712, FACTORIAL :1743,
  * LOG2 :1851, CBRT :1724, DEGREES/RADIANS via std, LAST_DAY
  * SqlStdOperatorTable :2290, DAYOFYEAR/WEEK :2296-2308, DATE_FROM_
  * PARTS/MAKE_DATE :833, ADD_MONTHS in o/p dialects).
  *
  * All scalar projections — no shuffle; codegen'd end to end. Doubles
  * from libm-backed functions (cbrt/atan2/degrees) are rounded to 6
  * decimals on BOTH sides so cross-engine ulp drift can't break the
  * hash compare (same convention as q81's sqrt).
  */
object Library2 {

  /** Strings + math over part. */
  val q103_lib_funcs2 = Q(
    (s, dir) => {
      T(s, dir, "part")
        .select(
          col("p_partkey"),
          rpad(col("p_name"), 12, ".").as("padded"),
          bit_length(col("p_type")).as("bits"),
          hex(col("p_partkey")).as("hexkey"),
          bin(col("p_size").cast(LongType)).as("binsize"),
          format_string("%d-%s", col("p_size"), col("p_brand")).as("fmt"),
          col("p_name").startsWith("yellow").as("sw"),
          col("p_name").endsWith("d").as("ew"),
          col("p_name").contains("olive").as("has"),
          overlay(col("p_name"), lit("XY"), lit(3), lit(2)).as("ov"),
          factorial(col("p_size") % 12).as("fact"),
          round(log2(col("p_size").cast(DoubleType)), 6).as("lg2"),
          round(cbrt(col("p_retailprice")), 6).as("cb"),
          round(degrees(col("p_size").cast(DoubleType) / 50.0), 6).as("deg"),
          round(radians(col("p_size").cast(DoubleType)), 6).as("rad"),
          round(atan2(col("p_size").cast(DoubleType), (col("p_partkey") % 17 + 1).cast(DoubleType)), 6).as("at2"))
        .orderBy("p_partkey")
    },
    Some("""
      SELECT p_partkey,
        rpad(p_name, 12, '.') AS padded,
        bit_length(p_type) AS bits,
        hex(p_partkey) AS hexkey,
        bin(CAST(p_size AS BIGINT)) AS binsize,
        printf('%d-%s', p_size, p_brand) AS fmt,
        starts_with(p_name, 'yellow') AS sw,
        ends_with(p_name, 'd') AS ew,
        contains(p_name, 'olive') AS has,
        substr(p_name, 1, 2) || 'XY' || substr(p_name, 5) AS ov,
        CAST(factorial(p_size % 12) AS BIGINT) AS fact,
        round(log2(CAST(p_size AS DOUBLE)), 6) AS lg2,
        round(cbrt(CAST(p_retailprice AS DOUBLE)), 6) AS cb,
        round(degrees(CAST(p_size AS DOUBLE) / 50.0), 6) AS deg,
        round(radians(CAST(p_size AS DOUBLE)), 6) AS rad,
        round(atan2(CAST(p_size AS DOUBLE), CAST(p_partkey % 17 + 1 AS DOUBLE)), 6) AS at2
      FROM part ORDER BY p_partkey"""))

  /** Datetime library over orders (o_orderdate is TIMESTAMP_NTZ → both
    * sides go through DATE). ADD_MONTHS clamps to month end on both
    * engines (Spark add_months ≡ DuckDB + INTERVAL n MONTH). */
  val q105_lib_datetime2 = Q(
    (s, dir) => {
      val d = col("o_orderdate").cast(DateType)
      T(s, dir, "orders")
        .select(
          col("o_orderkey"),
          last_day(d).as("eom"),
          dayofyear(d).as("doy"),
          weekofyear(d).as("woy"),
          make_date(year(d), month(d), dayofmonth(d)).as("remade"),
          add_months(d, 2).as("plus2m"))
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
        last_day(CAST(o_orderdate AS DATE)) AS eom,
        CAST(dayofyear(CAST(o_orderdate AS DATE)) AS INT) AS doy,
        CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INT) AS woy,
        make_date(CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT),
                  CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT),
                  CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT)) AS remade,
        CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m
      FROM orders ORDER BY o_orderkey"""))

  /** SQL/JSON predicates and accessors (ref: SqlStdOperatorTable
    * IS_JSON_VALUE :1694, JSON_EXISTS :1641, JSON_QUERY :1664,
    * JSON_VALUE covered by functions/JsonValue.scala): docs are built
    * identically on both sides (valid object / invalid prose / array
    * by p_partkey mod 3), then IS JSON ≡ `get_json_object(doc,'$') IS
    * NOT NULL` (Spark returns NULL for malformed input), JSON_EXISTS ≡
    * path non-null, JSON_QUERY ≡ the compact fragment both engines
    * print for arrays/objects. */
  val q106_json_predicates = Q(
    (s, dir) => {
      T(s, dir, "part")
        .withColumn("doc",
          when(col("p_partkey") % 3 === 0,
            concat(lit("{\"k\":"), col("p_partkey").cast(StringType),
              lit(",\"a\":[1,2,"), (col("p_partkey") % 7).cast(StringType), lit("]}")))
            .when(col("p_partkey") % 3 === 1, col("p_name"))
            .otherwise(concat(lit("["), col("p_partkey").cast(StringType), lit(", 1]"))))
        .select(
          col("p_partkey"),
          get_json_object(col("doc"), "$").isNotNull.as("is_json"),
          get_json_object(col("doc"), "$.k").isNotNull.as("has_k"),
          get_json_object(col("doc"), "$.a").as("frag_a"),
          json_array_length(when(col("p_partkey") % 3 === 2, col("doc"))).as("alen"))
        .orderBy("p_partkey")
    },
    Some("""
      SELECT p_partkey,
        json_valid(doc) AS is_json,
        json_extract(vdoc, '$.k') IS NOT NULL AS has_k,
        CAST(json_extract(vdoc, '$.a') AS VARCHAR) AS frag_a,
        CASE WHEN p_partkey % 3 = 2
             THEN CAST(json_array_length(vdoc) AS INT) END AS alen
      FROM (
        SELECT p_partkey, doc,
          -- vectorized execution does not short-circuit CASE/AND around
          -- json_extract, so invalid docs are nulled out up front
          CASE WHEN json_valid(doc) THEN doc END AS vdoc
        FROM (
        SELECT p_partkey,
          CASE WHEN p_partkey % 3 = 0
               THEN '{"k":' || CAST(p_partkey AS VARCHAR) ||
                    ',"a":[1,2,' || CAST(p_partkey % 7 AS VARCHAR) || ']}'
               WHEN p_partkey % 3 = 1 THEN p_name
               ELSE '[' || CAST(p_partkey AS VARCHAR) || ', 1]' END AS doc
        FROM part) t0) t
      ORDER BY p_partkey"""))

  val all: Map[String, Q] = Map(
    "q103_lib_funcs2" -> q103_lib_funcs2,
    "q105_lib_datetime2" -> q105_lib_datetime2,
    "q106_json_predicates" -> q106_json_predicates)
}
