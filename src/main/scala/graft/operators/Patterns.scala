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
  /** V-shape detection (match.iq's canonical STRT DOWN+ UP+ stock
    * pattern, unanchored): a match is a maximal strictly-descending run
    * immediately followed by a strictly-ascending run, AFTER MATCH SKIP
    * PAST LAST ROW. Without an anchor row the skip mode can't consume
    * the next match's start, so the match set equals the run-length-
    * encoded relation (runs of sign(value - prev) paired D→U) — which
    * is the DuckDB oracle, making the greedy-quantifier + skip-past
    * machinery value-checked end to end. */
  val q98_match_recognize_v = Q(
    (s, dir) => {
      val ev = T(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      MatchRecognize.matchRecognize(
        ev,
        partitionKeys = Seq("user_id"),
        orderKeys = Seq("ts", "event_id"),
        pattern = "DOWN+ UP+",
        define = Map(
          "DOWN" -> ((cur, prev) => prev.exists(p => cur.getDouble(3) < p.getDouble(3))),
          "UP" -> ((cur, prev) => prev.exists(p => cur.getDouble(3) > p.getDouble(3)))),
        afterMatch = SkipPastLastRow)
        .groupBy(col("user_id"), col("match_no"))
        .agg(
          min_by(col("event_id"), struct(col("ts"), col("event_id"))).as("start_event_id"),
          max_by(col("event_id"), struct(col("ts"), col("event_id"))).as("end_event_id"),
          sum(when(col("classifier") === "DOWN", 1L).otherwise(0L)).as("n_down"),
          sum(when(col("classifier") === "UP", 1L).otherwise(0L)).as("n_up"),
          min(col("value")).as("trough"))
        .select(col("user_id"), col("match_no"), col("start_event_id"),
          col("end_event_id"), col("n_down"), col("n_up"), col("trough"))
        .orderBy("user_id", "match_no")
    },
    Some("""
      WITH s AS (
        SELECT user_id, event_id, ts, value,
          LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events),
      d AS (
        SELECT *, CASE WHEN pv IS NULL THEN 'F' WHEN value < pv THEN 'D'
                       WHEN value > pv THEN 'U' ELSE 'F' END AS dir
        FROM s),
      r AS (
        SELECT *, rn - ROW_NUMBER() OVER (PARTITION BY user_id, dir ORDER BY rn) AS grp
        FROM d),
      runs AS (
        SELECT user_id, dir, grp, MIN(rn) AS r0, MAX(rn) AS r1, COUNT(*) AS len
        FROM r GROUP BY user_id, dir, grp),
      pairs AS (
        SELECT a.user_id, a.r0 AS d0, a.r1 AS d1, b.r1 AS u1,
               a.len AS n_down, b.len AS n_up
        FROM runs a JOIN runs b
          ON a.user_id = b.user_id AND a.dir = 'D' AND b.dir = 'U'
         AND b.r0 = a.r1 + 1),
      m AS (
        SELECT user_id, d0, d1, u1, n_down, n_up,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d0) AS match_no
        FROM pairs)
      SELECT m.user_id AS user_id, CAST(m.match_no AS BIGINT) AS match_no,
        st.event_id AS start_event_id, en.event_id AS end_event_id,
        CAST(m.n_down AS BIGINT) AS n_down, CAST(m.n_up AS BIGINT) AS n_up,
        tr.value AS trough
      FROM m
      JOIN d st ON st.user_id = m.user_id AND st.rn = m.d0
      JOIN d en ON en.user_id = m.user_id AND en.rn = m.u1
      JOIN d tr ON tr.user_id = m.user_id AND tr.rn = m.d1
      ORDER BY m.user_id, match_no"""))

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
