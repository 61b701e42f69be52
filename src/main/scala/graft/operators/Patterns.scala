package graft.operators

import graft.{Q, T}
import graft.plans.MatchRecognize
import graft.plans.MatchRecognize.{SkipPastLastRow, SkipToNextRow}
import org.apache.spark.sql.functions._

/** MATCH_RECOGNIZE queries (ref: rel/core/Match.java:62; match.iq). */
object Patterns {

  /** V-shape detection — the canonical MATCH_RECOGNIZE example
    * (match.iq / stock-ticker): STRT DOWN+ UP+ per user over event
    * values, one match per V, ALL ROWS PER MATCH output. Hash-family-free
    * but engine-specific greedy semantics → spec-tested, no SQL oracle. */
  val q98_match_recognize_v = Q(
    (s, dir) => {
      val ev = T(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      MatchRecognize.matchRecognize(
        ev,
        partitionKeys = Seq("user_id"),
        orderKeys = Seq("ts", "event_id"),
        pattern = "STRT DOWN+ UP+",
        define = Map(
          "DOWN" -> ((cur, prev) => prev.exists(p => cur.getDouble(3) < p.getDouble(3))),
          "UP" -> ((cur, prev) => prev.exists(p => cur.getDouble(3) > p.getDouble(3)))),
        afterMatch = SkipPastLastRow)
        .select(col("user_id"), col("event_id"), col("value"), col("match_no"), col("classifier"))
        .orderBy("user_id", "match_no", "event_id")
    },
    None)

  /** Two consecutive high-value events, AFTER MATCH SKIP TO NEXT ROW —
    * with this skip mode the match set is exactly the lead()-based SQL
    * relation, giving the pattern engine a DuckDB oracle
    * (ref: rel/core/Match.java:82 after-match strategies). */
  val q99_match_adjacent_high = Q(
    (s, dir) => {
      val ev = T(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      val matched = MatchRecognize.matchRecognize(
        ev,
        partitionKeys = Seq("user_id"),
        orderKeys = Seq("ts", "event_id"),
        pattern = "H H",
        define = Map("H" -> ((cur, _) => cur.getDouble(3) > 150.0)),
        afterMatch = SkipToNextRow)
      matched.groupBy(col("user_id"), col("match_no"))
        .agg(min_by(col("event_id"), struct(col("ts"), col("event_id"))).as("start_event_id"),
          count(lit(1)).as("n_rows"))
        .select(col("user_id"), col("start_event_id"), col("n_rows"))
        .orderBy("user_id", "start_event_id")
    },
    Some("""
      SELECT user_id, event_id AS start_event_id, CAST(2 AS BIGINT) AS n_rows
      FROM (SELECT user_id, event_id, value,
              LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
            FROM events) t
      WHERE value > 150 AND next_value > 150
      ORDER BY user_id, start_event_id"""))

  /** The same relation as q99 through the SQL surface (ref:
    * sql/SqlMatchRecognize.java:1, parserImpls.ftl): PARTITION BY /
    * ORDER BY / MEASURES (FIRST + COUNT) / ONE ROW PER MATCH / AFTER
    * MATCH SKIP TO NEXT ROW / PATTERN / DEFINE, parsed by
    * sql/MatchRecognizeSql.scala and lowered onto the automaton with
    * DEFINE precomputed as a boolean column. Same DuckDB oracle as q99. */
  val q100_match_sql = Q(
    (s, dir) => {
      T(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .createOrReplaceTempView("events")
      graft.sql.GraftSql.sql(s, """
        SELECT user_id, start_event_id, n_rows
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(H.event_id) AS start_event_id, COUNT(*) AS n_rows
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (H H)
          DEFINE H AS H.value > 150.0
        ) ORDER BY user_id, start_event_id""")
    },
    Some("""
      SELECT user_id, event_id AS start_event_id, CAST(2 AS BIGINT) AS n_rows
      FROM (SELECT user_id, event_id, value,
              LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
            FROM events) t
      WHERE value > 150 AND next_value > 150
      ORDER BY user_id, start_event_id"""))

  /** SQL-surface MATCH_RECOGNIZE with stream navigation: PREV(x) in
    * DEFINE lowers to lag() over the partition window (SQL:2016 PREV
    * walks the ordered input, exactly what lag computes). Pattern
    * `A B C` with B/C strictly increasing reproduces q94's 3-increasing
    * relation, whose lag-based DuckDB oracle checks the lowering. */
  val q102_match_sql_prev = Q(
    (s, dir) => {
      T(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .createOrReplaceTempView("events")
      graft.sql.GraftSql.sql(s, """
        SELECT user_id, event_id, value
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES LAST(C.event_id) AS event_id, LAST(C.value) AS value
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (A B C)
          DEFINE B AS B.value > PREV(B.value), C AS C.value > PREV(C.value)
        ) ORDER BY user_id, event_id""")
    },
    Some("""
      SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value,
          LAG(value, 1) OVER w AS v1, LAG(value, 2) OVER w AS v2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
      WHERE value > v1 AND v1 > v2
      ORDER BY user_id, event_id"""))

  val all: Map[String, Q] = Map(
    "q98_match_recognize_v" -> q98_match_recognize_v,
    "q99_match_adjacent_high" -> q99_match_adjacent_high,
    "q100_match_sql" -> q100_match_sql,
    "q102_match_sql_prev" -> q102_match_sql_prev)
}
