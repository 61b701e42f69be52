package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.GraftOps._

/** Sixth-pass join/SQL-surface operators: banded range join (the theta
  * join scale path), event-time temporal join (the join form of
  * rel/core/Snapshot.java), and SQL PIVOT/UNPIVOT + windowing-TVF
  * surfaces through the GraftSql entry point.
  */
object Joins2 {

  /** Non-equi point-in-interval join WITHOUT a nested loop: parts define
    * price bands [20×, 22×) of retail price; every lineitem's extended
    * price lands in all overlapping bands via bin-replicated hash join
    * (plans/RangeJoin). The oracle computes the quadratic theta join, so
    * the banding is proven lossless, not assumed. */
  val q131_range_join = Q(
    (s, dir) => {
      val parts = T(s, dir, "part")
        .filter(col("p_partkey") <= 200)
        .select(col("p_partkey"),
          (col("p_retailprice") * 20.0).as("lo"),
          (col("p_retailprice") * 22.0).as("hi"))
      val points = T(s, dir, "lineitem").select(col("l_extendedprice"))
      points.rangeJoin(parts, "l_extendedprice", "lo", "hi", binWidth = 2000.0)
        .groupBy(col("p_partkey"))
        .agg(count(lit(1)).as("n_in_band"))
        .orderBy("p_partkey")
    },
    Some("""
      SELECT p.p_partkey, count(*) AS n_in_band
      FROM part p JOIN lineitem l
        ON l.l_extendedprice >= p.p_retailprice * 20.0
       AND l.l_extendedprice <  p.p_retailprice * 22.0
      WHERE p.p_partkey <= 200
      GROUP BY 1 ORDER BY 1"""))

  /** Event-time temporal join (FOR SYSTEM_TIME AS OF e.ts over a
    * versioned dimension): purchase events open 7-day validity versions
    * (closed early by the next purchase), and every event joins the
    * version valid AT ITS OWN event time — NULL where no version covers
    * it. One equi-key shuffle via the ASOF lowering; the oracle is the
    * declarative validity-interval join. */
  val q132_temporal_join = Q(
    (s, dir) => {
      val events = T(s, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val versions = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("vstart"),
          least(col("ts") + expr("INTERVAL 7 DAY"),
            coalesce(lead(col("ts"), 1).over(
              Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))),
              col("ts") + expr("INTERVAL 7 DAY"))).as("vend"),
          row_number().over(w).cast(LongType).as("version_no"))
      events.select(col("event_id"), col("user_id"), col("ts"))
        .temporalJoin(versions, key = "user_id", time = "ts",
          vstart = "vstart", vend = "vend", payload = Seq("version_no"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("version_no"), col("vstart"))
        .orderBy("event_id")
    },
    Some("""
      WITH v AS (
        SELECT user_id, ts AS vstart,
               least(ts + INTERVAL 7 DAY,
                     coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                              ts + INTERVAL 7 DAY)) AS vend,
               CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version_no
        FROM events WHERE event_type = 'purchase')
      SELECT e.event_id, e.user_id, e.ts, v.version_no, v.vstart
      FROM events e LEFT JOIN v
        ON v.user_id = e.user_id AND v.vstart <= e.ts AND e.ts < v.vend
      ORDER BY e.event_id"""))

  /** SQL PIVOT surface (pivot.iq; RelBuilder.pivot :4158) through the
    * GraftSql entry — Spark's parser owns the clause; the oracle states
    * the same pivot as conditional aggregation. Missing cells are NULL
    * in Spark's pivot, coalesced to 0 to match COUNT semantics. */
  val q133_sql_pivot = Q(
    (s, dir) => {
      T.registerViews(s, dir)
      graft.sql.GraftSql.sql(s, """
        SELECT n_name,
               coalesce(africa, 0) AS africa,
               coalesce(america, 0) AS america,
               coalesce(asia, 0) AS asia
        FROM (
          SELECT * FROM (
            SELECT n_name, r_name, n_nationkey
            FROM nation JOIN region ON n_regionkey = r_regionkey)
          PIVOT (count(n_nationkey) FOR r_name IN ('AFRICA' AS africa, 'AMERICA' AS america, 'ASIA' AS asia)))
        ORDER BY n_name""")
    },
    Some("""
      SELECT n_name,
        count(CASE WHEN r_name = 'AFRICA' THEN 1 END) AS africa,
        count(CASE WHEN r_name = 'AMERICA' THEN 1 END) AS america,
        count(CASE WHEN r_name = 'ASIA' THEN 1 END) AS asia
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY n_name ORDER BY n_name"""))

  /** Windowing TVF surface: `TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts),
    * INTERVAL '1' HOUR))` (SqlWindowTableFunction.java:53-68) lowered by
    * GraftSql to Spark's window() projection; oracle = DuckDB
    * time_bucket (both are epoch-aligned for whole-hour buckets). */
  val q134_tumble_tvf = Q(
    (s, dir) => {
      T.registerViews(s, dir)
      graft.sql.GraftSql.sql(s, """
        SELECT window_start, window_end, event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        GROUP BY window_start, window_end, event_type
        ORDER BY window_start, event_type""")
    },
    Some("""
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
             event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2, 3
      ORDER BY window_start, event_type"""))

  /** SQL UNPIVOT surface (RelBuilder.unpivot :4226) through GraftSql —
    * Spark's UNPIVOT clause; oracle states the same relation as a
    * UNION ALL (the clause's expansion). */
  val q135_sql_unpivot = Q(
    (s, dir) => {
      T.registerViews(s, dir)
      graft.sql.GraftSql.sql(s, """
        SELECT p_partkey, metric, val FROM (
          SELECT p_partkey,
                 CAST(p_retailprice AS DOUBLE) AS retail,
                 CAST(p_size AS DOUBLE) AS psize
          FROM part WHERE p_partkey <= 50)
        UNPIVOT (val FOR metric IN (retail, psize))
        ORDER BY p_partkey, metric""")
    },
    Some("""
      SELECT p_partkey, metric, val FROM (
        SELECT p_partkey, 'retail' AS metric, CAST(p_retailprice AS DOUBLE) AS val
        FROM part WHERE p_partkey <= 50
        UNION ALL
        SELECT p_partkey, 'psize' AS metric, CAST(p_size AS DOUBLE) AS val
        FROM part WHERE p_partkey <= 50)
      ORDER BY p_partkey, metric"""))

  val all: Map[String, Q] = Map(
    "q131_range_join" -> q131_range_join,
    "q132_temporal_join" -> q132_temporal_join,
    "q133_sql_pivot" -> q133_sql_pivot,
    "q134_tumble_tvf" -> q134_tumble_tvf,
    "q135_sql_unpivot" -> q135_sql_unpivot)
}
