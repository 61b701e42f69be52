package graft.operators

import graft.{Q, T}
import graft.api.GraftOps._
import graft.functions.FormatModels
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-4 pack: LEFT MARK join, TO_CHAR/PARSE format models, the TIME
  * type surface, the data profiler, and a grid-banded spatial proximity
  * join.
  */
object Round4 {

  /** LEFT MARK join (ref: rel/core/JoinRelType.java:97-119,
    * MarkToSemiOrAntiJoinRule.java): customers marked with IN-subquery
    * three-valued semantics. `has_big_3v` probes the NULL path — the
    * right key set contains NULLs (planted via nullif), so "no match"
    * becomes UNKNOWN, exactly what the reference's MARK join carries. */
  val q107_mark_join = Q(
    (s, dir) => {
      val cust = T(s, dir, "customer")
      val big = T(s, dir, "orders").filter(col("o_totalprice") > 150000)
      cust
        .markJoin(big.select(col("o_custkey")), "c_custkey", "o_custkey", "has_big")
        .markJoin(big.select(nullif(col("o_custkey"), lit(7)).as("o_custkey_n")),
          "c_custkey", "o_custkey_n", "has_big_3v")
        .select(col("c_custkey"), col("has_big"), col("has_big_3v"))
        .orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey,
        c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000) AS has_big,
        c_custkey IN (SELECT nullif(o_custkey, 7) FROM orders WHERE o_totalprice > 150000) AS has_big_3v
      FROM customer ORDER BY c_custkey"""))

  /** Format models (ref: util/format/FormatModels.java;
    * SqlLibraryOperators TO_CHAR :2002, PARSE_TIMESTAMP :2073,
    * FORMAT_DATE :2100): Oracle datetime tokens and numeric edit masks,
    * BigQuery %-token parse/format, with a parse round-trip proof. */
  val q108_format_models = Q(
    (s, dir) => {
      T(s, dir, "orders").filter(col("o_orderkey") <= 1000)
        .select(
          col("o_orderkey"),
          FormatModels.to_char_num(col("o_totalprice"), "FM9999990.00").as("n1"),
          FormatModels.to_char_num(col("o_orderkey"), "FM9,999,990").as("n2"),
          FormatModels.to_char_num(col("o_orderkey") % 1000, "9999").as("n3"),
          FormatModels.to_char(col("o_orderdate"), "YYYY-MM-DD HH24:MI:SS").as("dt1"),
          FormatModels.to_char(col("o_orderdate"), "DY DD MON YYYY").as("dt2"),
          (FormatModels.parse_timestamp_bq("%Y-%m-%d %H:%M:%S",
            FormatModels.format_bq("%Y-%m-%d %H:%M:%S", col("o_orderdate")))
            === col("o_orderdate")).as("rt"),
          FormatModels.parse_date_bq("%Y%m%d",
            FormatModels.format_bq("%Y%m%d", col("o_orderdate"))).as("pd"))
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
        printf('%.2f', o_totalprice) AS n1,
        format('{:,}', o_orderkey) AS n2,
        lpad(CAST(o_orderkey % 1000 AS VARCHAR), 5, ' ') AS n3,
        strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS dt1,
        strftime(o_orderdate, '%a %d %b %Y') AS dt2,
        strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') = o_orderdate AS rt,
        CAST(strptime(strftime(o_orderdate, '%Y%m%d'), '%Y%m%d') AS DATE) AS pd
      FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey"""))

  /** TIME type surface (ref: SqlTypeName.java:71-75 — no Spark TIME
    * type; SURVEY §1.2 maps it to millis-of-day, Calcite's own runtime
    * representation): extraction, rendering, and wraparound time
    * arithmetic, all plain integer math that stays in codegen. */
  val q109_time_type = Q(
    (s, dir) => {
      val ms = expr("CAST((unix_micros(ts) % 86400000000) DIV 1000 AS BIGINT)")
      T(s, dir, "events").filter(col("event_id") <= 2000)
        .withColumn("t_ms", ms)
        .withColumn("t_shift", (col("t_ms") + 90L * 60000L) % 86400000L)
        .select(
          col("event_id"),
          col("t_ms"),
          date_format(col("ts"), "HH:mm:ss.SSSSSS").as("t_str"),
          hour(col("ts")).as("t_hh"),
          minute(col("ts")).as("t_mi"),
          second(col("ts")).as("t_ss"),
          concat(
            lpad((col("t_shift") / 3600000L).cast(LongType).cast(StringType), 2, "0"), lit(":"),
            lpad(((col("t_shift") % 3600000L) / 60000L).cast(LongType).cast(StringType), 2, "0"), lit(":"),
            lpad(((col("t_shift") % 60000L) / 1000L).cast(LongType).cast(StringType), 2, "0"))
            .as("t_plus_90m"))
        .orderBy("event_id")
    },
    Some("""
      SELECT event_id, t_ms,
        strftime(ts, '%H:%M:%S.%f') AS t_str,
        CAST(EXTRACT(hour FROM ts) AS INT) AS t_hh,
        CAST(EXTRACT(minute FROM ts) AS INT) AS t_mi,
        CAST(EXTRACT(second FROM ts) AS INT) AS t_ss,
        lpad(CAST(t_shift // 3600000 AS VARCHAR), 2, '0') || ':' ||
        lpad(CAST((t_shift % 3600000) // 60000 AS VARCHAR), 2, '0') || ':' ||
        lpad(CAST((t_shift % 60000) // 1000 AS VARCHAR), 2, '0') AS t_plus_90m
      FROM (
        SELECT event_id, ts,
          (epoch_us(ts) % 86400000000) // 1000 AS t_ms,
          ((epoch_us(ts) % 86400000000) // 1000 + 90 * 60000) % 86400000 AS t_shift
        FROM events) t
      WHERE event_id <= 2000 ORDER BY event_id"""))

  /** Data profiler (ref: profile/ProfilerImpl.java): one-pass per-column
    * statistics over orders. `approx_distinct` is engine-specific (HLL
    * implementations differ) so the declared output carries only the
    * exact statistics; the sketch column is exercised in ProfilerSpec. */
  val q110_profile = Q(
    (s, dir) => {
      graft.catalog.Profiler
        .profile(T(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
        .drop("approx_distinct")
    },
    Some("""
      WITH p AS (
        SELECT 'o_orderkey' AS col_name, COUNT(*) AS n_rows,
          COUNT(*) - COUNT(o_orderkey) AS n_nulls,
          COUNT(DISTINCT o_orderkey) AS n_distinct,
          CAST(MIN(o_orderkey) AS VARCHAR) AS min_s, CAST(MAX(o_orderkey) AS VARCHAR) AS max_s
        FROM orders
        UNION ALL
        SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
          COUNT(DISTINCT o_custkey),
          CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
          COUNT(DISTINCT o_orderstatus),
          MIN(o_orderstatus), MAX(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
          COUNT(DISTINCT o_orderpriority),
          MIN(o_orderpriority), MAX(o_orderpriority)
        FROM orders)
      SELECT * FROM p ORDER BY col_name"""))

  /** Grid-banded spatial proximity self-join (ref: rel/rules/
    * SpatialRules.java — ST_DWithin rewritten to a space-filling-curve
    * range scan; the join analog buckets points into eps-sized grid
    * cells so candidate pairs only materialize inside neighboring
    * cells). The left side replicates each point into its 3×3 cell
    * neighborhood, the join runs cell-to-cell (hash shuffle on the cell
    * key — co-partitioned, no O(n²) crossing), and the exact distance
    * predicate filters candidates. Oracle = the naive quadratic join. */
  val q111_spatial_grid_join = Q(
    (s, dir) => {
      val eps = 2.0
      val pts = T(s, dir, "customer").select(
        col("c_custkey").as("id"),
        (col("c_custkey") % 100).cast(DoubleType).as("x"),
        ((col("c_custkey") / 97).cast(LongType) % 100).cast(DoubleType).as("y"))
      val cellX = floor(col("x") / eps).cast(IntegerType)
      val cellY = floor(col("y") / eps).cast(IntegerType)
      val right = pts.select(col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"),
        cellX.as("cx"), cellY.as("cy"))
      val offs = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
        struct(lit(dx).as("dx"), lit(dy).as("dy")))): _*)
      val left = pts.select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
          cellX.as("cx0"), cellY.as("cy0"), explode(offs).as("o"))
        .select(col("id_a"), col("xa"), col("ya"),
          (col("cx0") + col("o.dx")).as("cx"), (col("cy0") + col("o.dy")).as("cy"))
      left.join(right, Seq("cx", "cy"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("d2",
          (col("xa") - col("xb")) * (col("xa") - col("xb")) +
            (col("ya") - col("yb")) * (col("ya") - col("yb")))
        .filter(col("d2") <= eps * eps)
        .select(col("id_a"), col("id_b"), round(sqrt(col("d2")), 6).as("dist"))
        .orderBy("id_a", "id_b")
    },
    Some("""
      WITH p AS (
        SELECT c_custkey AS id,
          CAST(c_custkey % 100 AS DOUBLE) AS x,
          CAST((c_custkey // 97) % 100 AS DOUBLE) AS y
        FROM customer)
      SELECT a.id AS id_a, b.id AS id_b,
        ROUND(SQRT((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)), 6) AS dist
      FROM p a JOIN p b ON a.id < b.id
      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 4.0
      ORDER BY id_a, id_b"""))

  /** Library stragglers (ref: SqlLibraryOperators AGE :2818,
    * CONTAINS_SUBSTR :1076): calendar AGE decomposition (Postgres
    * borrow semantics) and case-insensitive deep containment. The
    * non-oracle-able siblings (DIFFERENCE, URL_ENCODE/DECODE,
    * COMPRESS/UNCOMPRESS — DuckDB 1.0 lacks them) are spec-verified in
    * Round4Spec. */
  val q112_lib3 = Q(
    (s, dir) => {
      val base = lit("1990-02-17").cast(TimestampType)
      T(s, dir, "orders").filter(col("o_orderkey") <= 5000)
        .select(col("o_orderkey"),
          graft.functions.Misc.age_parts(col("o_orderdate"), base).as("a"),
          graft.functions.Misc.contains_substr(col("o_orderpriority"), "URG").as("has_urg"))
        .select(col("o_orderkey"), col("a.age_y"), col("a.age_m"), col("a.age_d"),
          col("has_urg"))
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
        CAST(date_part('year', age(o_orderdate, TIMESTAMP '1990-02-17')) AS INT) AS age_y,
        CAST(date_part('month', age(o_orderdate, TIMESTAMP '1990-02-17')) AS INT) AS age_m,
        CAST(date_part('day', age(o_orderdate, TIMESTAMP '1990-02-17')) AS INT) AS age_d,
        position('urg' in lower(o_orderpriority)) > 0 AS has_urg
      FROM orders WHERE o_orderkey <= 5000 ORDER BY o_orderkey"""))

  val all: Map[String, Q] = Map(
    "q112_lib3" -> q112_lib3,
    "q107_mark_join" -> q107_mark_join,
    "q108_format_models" -> q108_format_models,
    "q109_time_type" -> q109_time_type,
    "q110_profile" -> q110_profile,
    "q111_spatial_grid_join" -> q111_spatial_grid_join)
}
