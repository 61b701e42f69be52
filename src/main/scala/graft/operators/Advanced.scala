package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pivot/unpivot, sampling, sessionization, and row-pattern precursors
  * (ref: tools/RelBuilder.java:4158 pivot, :4226 unpivot,
  * rel/core/Sample.java:38, rel/core/Match.java:62). */
object Advanced {

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** PIVOT with explicit value list (ref: RelBuilder.java:4158; pivot.iq).
    * Spark's pivot yields NULL for empty cells where SQL conditional
    * counts yield 0, so both sides coalesce. */
  val q90_pivot = Q(
    (s, dir) => {
      val p = T(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .pivot("event_type", eventTypes)
        .count()
      p.select(col("day") +: eventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy("day")
    },
    Some("""
      SELECT CAST(ts AS DATE) AS day,
        COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        COUNT(*) FILTER (WHERE event_type = 'error') AS error,
        COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        COUNT(*) FILTER (WHERE event_type = 'view') AS view
      FROM events GROUP BY 1 ORDER BY 1"""))

  /** UNPIVOT back to long form (ref: RelBuilder.java:4226 unpivot). */
  val q91_unpivot = Q(
    (s, dir) => {
      val p = q90_pivot.build(s, dir)
      p.unpivot(Array(col("day")), eventTypes.map(col).toArray, "event_type", "n")
        .orderBy("day", "event_type")
    },
    Some("""
      WITH p AS (
        SELECT CAST(ts AS DATE) AS day,
          COUNT(*) FILTER (WHERE event_type = 'click') AS click,
          COUNT(*) FILTER (WHERE event_type = 'error') AS error,
          COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
          COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
          COUNT(*) FILTER (WHERE event_type = 'view') AS view
        FROM events GROUP BY 1)
      SELECT day, event_type, n FROM (
        SELECT day, 'click' AS event_type, click AS n FROM p
        UNION ALL SELECT day, 'error', error FROM p
        UNION ALL SELECT day, 'purchase', purchase FROM p
        UNION ALL SELECT day, 'signup', signup FROM p
        UNION ALL SELECT day, 'view', view FROM p) t
      ORDER BY day, event_type"""))

  /** TABLESAMPLE BERNOULLI(10) REPEATABLE (ref: rel/core/Sample.java
    * :65-98, tablesample.iq). The keep decision is a deterministic
    * uniform — u01 = first 8 md5 hex digits of the row key / 2^32 —
    * which IS Bernoulli sampling, with a REPEATABLE guarantee stronger
    * than a seeded RNG's: the sample is identical under any partition
    * layout or engine, so the oracle value-checks it (Spark's own
    * partition-seeded `df.sample` stays exercised via
    * api/GraftOps.tablesample + GraftOpsSpec — its draws follow the
    * physical layout and can't be value-compared). */
  val q92_sample = Q(
    (s, dir) => {
      val u01 = expr(
        "CAST(conv(substring(md5(concat(CAST(l_orderkey AS STRING), '_', CAST(l_linenumber AS STRING))), 1, 8), 16, 10) AS BIGINT)")
        .cast(DoubleType) / lit(4294967296.0)
      T(s, dir, "lineitem")
        .withColumn("u", u01)
        .filter(col("u") < 0.1)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), round(min(col("u")), 6).as("min_u"))
        .orderBy("l_returnflag")
    },
    Some("""
      WITH s AS (
        SELECT l_returnflag,
          CAST(CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '_' ||
            CAST(l_linenumber AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE)
            / 4294967296.0 AS u
        FROM lineitem)
      SELECT l_returnflag, COUNT(*) AS n, ROUND(MIN(u), 6) AS min_u
      FROM s WHERE u < 0.1
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Gaps-and-islands sessionization: 30-min inactivity gap → session ids
    * per user (ref: SESSION window TVF, SqlStdOperatorTable.java:2612;
    * same state machine a streaming session_window builds). */
  val q93_sessionize = Q(
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      T(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), unix_micros(col("ts")).as("us"))
        // r16 (guide §2.5): the window input is CPU-bound on few bytes, so
        // AQE's byte-based coalescing ran both window passes on 2 tasks at
        // bench scale (event-log measured). Size the window shuffle by the
        // source rows; hash on the window's own partition key, so this is
        // the ONLY exchange (ClusteredDistribution satisfied), and the
        // later groupBy(user_id) reuses the same partitioning.
        .repartition(T.sizedParts(s, dir, "events", 16384L), col("user_id"))
        .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
        .withColumn("is_new", when(col("gap_us").isNull || col("gap_us") > 1800L * 1000000L, 1).otherwise(0))
        .withColumn("sess_id", sum(col("is_new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), max(col("sess_id")).cast(LongType).as("n_sessions"))
        .orderBy("user_id")
    },
    Some("""
      WITH g AS (
        SELECT user_id, event_id, ts,
          epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events),
      s AS (
        SELECT user_id,
          CASE WHEN gap_us IS NULL OR gap_us > 1800 * 1000000 THEN 1 ELSE 0 END AS is_new
        FROM g),
      c AS (
        SELECT user_id,
          SUM(is_new) OVER (PARTITION BY user_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        FROM s)
      SELECT user_id, COUNT(*) AS n_events, CAST(MAX(sess_id) AS BIGINT) AS n_sessions
      FROM c GROUP BY user_id ORDER BY user_id"""))

  /** Row-pattern precursor — 3 strictly increasing values in a row per
    * user, the PREV/PREV² shape MATCH_RECOGNIZE compiles to
    * (ref: rel/core/Match.java:62; SqlStdOperatorTable.java:2079 PREV). */
  val q94_pattern_3increasing = Q(
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      T(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("v1", lag(col("value"), 1).over(w))
        .withColumn("v2", lag(col("value"), 2).over(w))
        .filter(col("value") > col("v1") && col("v1") > col("v2"))
        .select(col("user_id"), col("event_id"), col("value"))
        .orderBy("user_id", "event_id")
    },
    Some("""
      SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value,
          LAG(value, 1) OVER w AS v1, LAG(value, 2) OVER w AS v2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
      WHERE value > v1 AND v1 > v2
      ORDER BY user_id, event_id"""))

  /** VALUES inline relation joined to a table
    * (ref: rel/core/Values.java:1). */
  val q95_values_join = Q(
    (s, dir) => {
      val tiers = s.createDataFrame(Seq(
        ("AUTOMOBILE", "retail"), ("BUILDING", "b2b"), ("FURNITURE", "retail"),
        ("HOUSEHOLD", "retail"), ("MACHINERY", "b2b")))
        .toDF("segment", "tier")
      T(s, dir, "customer")
        .join(broadcast(tiers), col("c_mktsegment") === col("segment"))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n"), T.dsum(col("c_acctbal")).as("bal"))
        .orderBy("tier")
    },
    Some("""
      SELECT tier, COUNT(*) AS n, CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
      FROM customer
      JOIN (VALUES ('AUTOMOBILE', 'retail'), ('BUILDING', 'b2b'), ('FURNITURE', 'retail'),
                   ('HOUSEHOLD', 'retail'), ('MACHINERY', 'b2b')) AS t(segment, tier)
        ON c_mktsegment = segment
      GROUP BY tier ORDER BY tier"""))

  val all: Map[String, Q] = Map(
    "q90_pivot" -> q90_pivot,
    "q91_unpivot" -> q91_unpivot,
    "q92_sample" -> q92_sample,
    "q93_sessionize" -> q93_sessionize,
    "q94_pattern_3increasing" -> q94_pattern_3increasing,
    "q95_values_join" -> q95_values_join)
}
