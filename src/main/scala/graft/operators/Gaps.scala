package graft.operators

import graft.{Q, T}
import graft.functions.{TimestampTz, Unsigned}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The last two SURVEY §7.2 "semantic gap" rows, closed: unsigned
  * integer types and offset-preserving TIMESTAMP_TZ. Both are encoding
  * layers over builtin types (no UDFs), oracle-checked against DuckDB's
  * native UTINYINT/USMALLINT/UINTEGER and interval arithmetic.
  */
object Gaps {

  /** Unsigned types (ref: SqlTypeName.java:61-64, unsigned.iq): cast
    * into range-checked widened carriers, unsigned arithmetic with
    * range re-checks, aggregation and widening back to signed. DuckDB
    * computes the same in native unsigned types — values must agree
    * exactly. Error paths (negative → UTINYINT, subtraction below
    * zero) are spec-tested in GapsSpec, not here. */
  val q113_unsigned = Q(
    (s, dir) => {
      val li = T(s, dir, "lineitem").filter(col("l_orderkey") <= 2000)
      li.select(
          col("l_orderkey"),
          Unsigned.castUnsigned(col("l_linenumber"), "utinyint").as("u8"),
          Unsigned.castUnsigned(col("l_quantity"), "usmallint").as("u16"),
          Unsigned.castUnsigned(col("l_partkey"), "uinteger").as("u32"))
        .groupBy(col("l_orderkey"))
        .agg(
          sum(col("u8")).cast(LongType).as("sum_u8"),
          max(col("u16")).cast(LongType).as("max_u16"),
          Unsigned.umul(min(col("u32")), lit(2), "uinteger").cast(LongType).as("min_u32_x2"),
          Unsigned.usub(max(col("u16")).cast(LongType) + 7,
            min(col("u8")).cast(LongType), "usmallint").cast(LongType).as("span"))
        .orderBy("l_orderkey")
    },
    Some("""
      SELECT l_orderkey,
        CAST(SUM(CAST(l_linenumber AS UTINYINT)) AS BIGINT) AS sum_u8,
        CAST(MAX(CAST(l_quantity AS USMALLINT)) AS BIGINT) AS max_u16,
        CAST(MIN(CAST(l_partkey AS UINTEGER)) * 2 AS BIGINT) AS min_u32_x2,
        CAST(MAX(CAST(l_quantity AS USMALLINT)) + 7 - MIN(CAST(l_linenumber AS UTINYINT)) AS BIGINT) AS span
      FROM lineitem WHERE l_orderkey <= 2000
      GROUP BY l_orderkey ORDER BY l_orderkey"""))

  /** TIMESTAMP_TZ (ref: SqlTypeName.java:81): per-row source offsets
    * are preserved through AT-ZONE re-anchoring, rendering, and
    * instant-ordering — the DuckDB oracle recomputes the identical
    * struct fields with plain interval arithmetic. Offsets span
    * -6:30..+6:30 in 30-minute steps, so half-hour zones are covered. */
  val q114_timestamp_tz = Q(
    (s, dir) => {
      val ev = T(s, dir, "events").filter(col("event_id") <= 500)
      val offset = ((col("user_id") % 27) - lit(13)).cast(IntegerType) * 30
      val tz = TimestampTz.makeTz(col("ts"), offset)
      ev.select(col("event_id"), tz.as("tz"))
        .select(
          col("event_id"),
          TimestampTz.instant(col("tz")).as("utc"),
          TimestampTz.render(col("tz")).as("rendered"),
          TimestampTz.localTime(TimestampTz.atOffset(col("tz"), lit(330))).as("ist_local"),
          hour(TimestampTz.localTime(col("tz"))).as("local_hour"))
        .orderBy("event_id")
    },
    Some("""
      WITH e AS (
        SELECT event_id, ts,
               CAST(((user_id % 27) - 13) * 30 AS INT) AS off
        FROM events WHERE event_id <= 500),
      t AS (SELECT event_id, off, ts - TO_MINUTES(off) AS utc FROM e)
      SELECT event_id, utc,
        strftime(utc + TO_MINUTES(off), '%Y-%m-%d %H:%M:%S') ||
          (CASE WHEN off < 0 THEN '-' ELSE '+' END) ||
          lpad(CAST(abs(off) // 60 AS VARCHAR), 2, '0') || ':' ||
          lpad(CAST(abs(off) % 60 AS VARCHAR), 2, '0') AS rendered,
        utc + TO_MINUTES(330) AS ist_local,
        CAST(hour(utc + TO_MINUTES(off)) AS INT) AS local_hour
      FROM t ORDER BY event_id"""))

  /** LIKE-family stragglers (ref: SqlLibraryOperators ILIKE :1149 /
    * NOT_ILIKE :1154; SqlStdOperatorTable ESCAPE :1757): ILIKE,
    * NOT ILIKE, and LIKE with a custom ESCAPE character, all through
    * the SQL surface so the parser path is what's exercised. The
    * escape pattern `%r_d%` with `ESCAPE '\'` has no escaped chars —
    * `r_d` keeps `_` as a wildcard — while `%r\_d%` matches a literal
    * underscore (absent from part names), separating the two paths. */
  val q120_like_escape = Q(
    (s, dir) => {
      T(s, dir, "part").createOrReplaceTempView("part")
      s.sql("""
        SELECT p_partkey,
          p_name ILIKE '%RED%' AS has_red_ci,
          p_name NOT ILIKE '%WIDGET%' AS not_widget_ci,
          p_name LIKE '%r_d%' ESCAPE '\\' AS wild_underscore,
          p_name LIKE '%r\\_d%' ESCAPE '\\' AS literal_underscore,
          upper(p_name) LIKE 'BLUE%' AS starts_blue
        FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""")
    },
    Some("""
      SELECT p_partkey,
        p_name ILIKE '%RED%' AS has_red_ci,
        p_name NOT ILIKE '%WIDGET%' AS not_widget_ci,
        p_name LIKE '%r_d%' ESCAPE '\' AS wild_underscore,
        p_name LIKE '%r\_d%' ESCAPE '\' AS literal_underscore,
        upper(p_name) LIKE 'BLUE%' AS starts_blue
      FROM part WHERE p_partkey <= 500 ORDER BY p_partkey"""))

  /** GROUP_ID() with duplicate grouping sets (ref: SqlStdOperatorTable
    * .java:248 GROUP_ID; Calcite expands it by unioning one aggregate
    * per duplicate occurrence — AggregateExpandDistinctAggregatesRule
    * docs note the same device — since no engine evaluates it
    * natively; Spark has no GROUP_ID at all). Here: GROUPING SETS
    * ((status), (status), ()) → the (status) rollup appears twice,
    * group_id 0 and 1, the grand total once with group_id 0. The
    * expansion runs the distinct-set aggregate ONCE per occurrence
    * count tier, not per duplicate (occurrence tiers reuse one
    * aggregate result via union of literals). */
  val q122_group_id = Q(
    (s, dir) => {
      val orders = T(s, dir, "orders")
      val byStatus = orders.groupBy(col("o_orderstatus"))
        .agg(T.dsum(col("o_totalprice")).as("total"))
      val grand = orders.groupBy()
        .agg(T.dsum(col("o_totalprice")).as("total"))
        .select(lit(null).cast(StringType).as("o_orderstatus"), col("total"))
      byStatus.select(col("o_orderstatus"), col("total"), lit(0).as("group_id"))
        .unionByName(byStatus.select(col("o_orderstatus"), col("total"), lit(1).as("group_id")))
        .unionByName(grand.select(col("o_orderstatus"), col("total"), lit(0).as("group_id")))
        .orderBy(col("group_id"), col("o_orderstatus").asc_nulls_last)
    },
    Some("""
      WITH s AS (SELECT o_orderstatus,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
                 FROM orders GROUP BY o_orderstatus)
      SELECT o_orderstatus, total, 0 AS group_id FROM s
      UNION ALL
      SELECT o_orderstatus, total, 1 AS group_id FROM s
      UNION ALL
      SELECT NULL AS o_orderstatus,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
             0 AS group_id
      FROM orders
      ORDER BY group_id, o_orderstatus NULLS LAST"""))

  /** The FETCH/OFFSET dialect surface END TO END: the same ANSI text
    * runs through GraftSql's rewriter on Spark and natively on DuckDB
    * (which parses OFFSET .. FETCH FIRST directly) — a cross-engine
    * check of the rewrite itself, not just its output shape. */
  private val fetchSql = """
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      OFFSET 10 ROWS FETCH FIRST 15 ROWS ONLY"""
  val q123_fetch_clause = Q(
    (s, dir) => {
      T.tableNames.foreach(t => T(s, dir, t).createOrReplaceTempView(t))
      graft.sql.GraftSql.sql(s, fetchSql)
    },
    Some(fetchSql))

  /** QUALIFY end to end against DuckDB's native QUALIFY — the same
    * text, raw window function in the predicate (the qualify.iq
    * canonical form the rewriter projects out as a synthetic column). */
  private val qualifySql = """
      SELECT o_custkey, o_orderkey, o_totalprice FROM orders
      QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) <= 2
      ORDER BY o_custkey, o_totalprice DESC, o_orderkey"""
  val q124_qualify_sql = Q(
    (s, dir) => {
      T.tableNames.foreach(t => T(s, dir, t).createOrReplaceTempView(t))
      graft.sql.GraftSql.sql(s, qualifySql)
    },
    Some(qualifySql))

  /** The plan→SQL unparser exercised END TO END through the oracle
    * gate: a DataFrame plan (filter+aggregate+having+sort) unparses to
    * SQL text, THAT TEXT executes via spark.sql, and DuckDB computes
    * the handwritten equivalent — so the generated SQL is proven to
    * denote the same relation cross-engine, the JdbcImplementor
    * contract (ship unparsed subtrees to a foreign engine). */
  val q130_unparsed_pushdown = Q(
    (s, dir) => {
      val df = T(s, dir, "lineitem")
        .filter(col("l_quantity") >= 30)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), max(col("l_quantity")).as("mx"))
        .filter(col("n") > 50)
        .orderBy("l_returnflag", "l_linestatus")
      val sqlText = graft.sql.Unparser.unparse(df).getOrElse(
        throw new IllegalStateException("plan must be unparseable"))
      s.sql(sqlText)
    },
    Some("""
      SELECT l_returnflag, l_linestatus, count(*) AS n, max(l_quantity) AS mx
      FROM lineitem
      WHERE l_quantity >= 30
      GROUP BY l_returnflag, l_linestatus
      HAVING count(*) > 50
      ORDER BY l_returnflag, l_linestatus"""))

  val all: Map[String, Q] = Map(
    "q113_unsigned" -> q113_unsigned,
    "q114_timestamp_tz" -> q114_timestamp_tz,
    "q120_like_escape" -> q120_like_escape,
    "q122_group_id" -> q122_group_id,
    "q123_fetch_clause" -> q123_fetch_clause,
    "q124_qualify_sql" -> q124_qualify_sql,
    "q130_unparsed_pushdown" -> q130_unparsed_pushdown)
}
