package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Interval arithmetic and period predicates (ref: SURVEY.md §1.2
  * YearMonth/DayTime intervals; SqlStdOperatorTable.java:684
  * DATETIME_PLUS, :1624 OVERLAPS + period ops :1627-1642). */
object Temporal {

  /** Year-month and day-time interval arithmetic on timestamps. */
  val q67_interval_arith = Q(
    (s, dir) => {
      T(s, dir, "orders").filter(col("o_orderkey") <= 1000)
        .select(
          col("o_orderkey"),
          (col("o_orderdate") + expr("INTERVAL 3 MONTHS")).as("plus_3m"),
          (col("o_orderdate") - expr("INTERVAL 45 DAYS")).as("minus_45d"),
          (col("o_orderdate") + expr("INTERVAL '36:30' HOUR TO MINUTE")).as("plus_36h30m"))
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
        o_orderdate + INTERVAL '3 months' AS plus_3m,
        o_orderdate - INTERVAL '45 days' AS minus_45d,
        o_orderdate + INTERVAL '36 hours 30 minutes' AS plus_36h30m
      FROM orders WHERE o_orderkey <= 1000
      ORDER BY o_orderkey"""))

  /** OVERLAPS and period CONTAINS/PRECEDES over (start, end) pairs,
    * composed from comparisons exactly as the reference lowers them
    * (ref: SqlStdOperatorTable.java:1624-1639). Each order's 90-day
    * window tested against a fixed quarter. */
  val q68_period_ops = Q(
    (s, dir) => {
      val qStart = lit("1997-04-01").cast(TimestampType)
      val qEnd = lit("1997-07-01").cast(TimestampType)
      val oStart = col("o_orderdate")
      val oEnd = col("o_orderdate") + expr("INTERVAL 90 DAYS")
      T(s, dir, "orders")
        .select(col("o_orderkey"),
          (oStart < qEnd && qStart < oEnd).as("overlaps_q2"),
          (oStart <= qStart && qEnd <= oEnd).as("contains_q2"),
          (oEnd <= qStart).as("precedes_q2"))
        .groupBy(col("overlaps_q2"), col("contains_q2"), col("precedes_q2"))
        .agg(count(lit(1)).as("n"))
        .orderBy("overlaps_q2", "contains_q2", "precedes_q2")
    },
    Some("""
      SELECT overlaps_q2, contains_q2, precedes_q2, COUNT(*) AS n FROM (
        SELECT o_orderkey,
          (o_orderdate < TIMESTAMP '1997-07-01 00:00:00' AND TIMESTAMP '1997-04-01 00:00:00' < o_orderdate + INTERVAL '90 days') AS overlaps_q2,
          (o_orderdate <= TIMESTAMP '1997-04-01 00:00:00' AND TIMESTAMP '1997-07-01 00:00:00' <= o_orderdate + INTERVAL '90 days') AS contains_q2,
          (o_orderdate + INTERVAL '90 days' <= TIMESTAMP '1997-04-01 00:00:00') AS precedes_q2
        FROM orders) t
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  /** XML functions — xpath_* family over constructed XML
    * (ref: SqlLibraryOperators.java:743-764 EXTRACT_VALUE/EXISTS_NODE,
    * runtime/XmlFunctions.java). DuckDB has no XML → rows-only; the
    * spec pins exact values. */
  val q69_xml_xpath = Q(
    (s, dir) => {
      T(s, dir, "part").filter(col("p_partkey") <= 100)
        .select(col("p_partkey"),
          concat(lit("<part><brand>"), col("p_brand"),
            lit("</brand><size>"), col("p_size"),
            lit("</size></part>")).as("xml"))
        .select(
          col("p_partkey"),
          expr("xpath_string(xml, '/part/brand')").as("brand"),
          expr("xpath_int(xml, '/part/size')").as("size"),
          expr("xpath_boolean(xml, '/part/missing')").as("has_missing"))
        .orderBy("p_partkey")
    },
    // the XML is constructed from the source columns, so extraction must
    // round-trip back to them — DuckDB needs no xpath engine to check it
    Some("""
      SELECT p_partkey, p_brand AS brand, CAST(p_size AS INT) AS size,
             false AS has_missing
      FROM part WHERE p_partkey <= 100 ORDER BY p_partkey"""))

  /** ST_DWithin proximity join on synthesized planar coordinates
    * (ref: runtime/SpatialTypeFunctions.java ST_DWithin;
    * rel/rules/SpatialRules.java optimizes exactly this shape). The ST_*
    * functions are pure planar math, so the oracle states the same
    * arithmetic directly. */
  val q74_spatial_dwithin = Q(
    (s, dir) => {
      graft.functions.Spatial.registerAll(s)
      val cust = T(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          expr("st_point(CAST(c_custkey % 100 AS DOUBLE), CAST((c_custkey DIV 97) % 100 AS DOUBLE))").as("cp"))
      val supp = T(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"),
          expr("st_point(CAST(s_suppkey % 100 AS DOUBLE), CAST((s_suppkey DIV 7) % 100 AS DOUBLE))").as("sp"))
      cust.join(supp, col("c_nationkey") === col("s_nationkey"))
        .filter(expr("st_dwithin(cp, sp, 7.5)"))
        .select(col("c_custkey"), col("s_suppkey"),
          round(expr("st_distance(cp, sp)"), 6).as("dist"))
        .orderBy("c_custkey", "s_suppkey")
    },
    Some("""
      SELECT c_custkey, s_suppkey,
        ROUND(SQRT((cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)), 6) AS dist
      FROM (SELECT c_custkey, c_nationkey,
              CAST(c_custkey % 100 AS DOUBLE) AS cx,
              CAST((c_custkey // 97) % 100 AS DOUBLE) AS cy
            FROM customer) c
      JOIN (SELECT s_suppkey, s_nationkey,
              CAST(s_suppkey % 100 AS DOUBLE) AS sx,
              CAST((s_suppkey // 7) % 100 AS DOUBLE) AS sy
            FROM supplier) s
        ON c_nationkey = s_nationkey
      WHERE SQRT((cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)) <= 7.5
      ORDER BY c_custkey, s_suppkey"""))

  val all: Map[String, Q] = Map(
    "q74_spatial_dwithin" -> q74_spatial_dwithin,
    "q67_interval_arith" -> q67_interval_arith,
    "q68_period_ops" -> q68_period_ops,
    "q69_xml_xpath" -> q69_xml_xpath)
}
