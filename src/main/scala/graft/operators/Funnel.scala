package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ordered-funnel analytics (view → click → purchase) — the event-
  * sequence KPI query every analytics engine ships; the reference
  * expresses it via MATCH_RECOGNIZE (our q94/q98 family), but the
  * strictly-ordered first-transition form lowers to three keyed
  * min-aggregations, each reusing the user_id partitioning — no NFA
  * needed and no per-user state beyond three timestamps. At 100 TB:
  * three shuffles on the same high-cardinality key (AQE-coalesced),
  * no window over raw events, no buffering.
  */
object Funnel {

  val q125_funnel = Q(
    (s, dir) => {
      val ev = T(s, dir, "events").select(col("user_id"), col("ts"), col("event_type"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c = ev.filter(col("event_type") === "click").as("e")
        .join(v, "user_id")
        .filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"), col("t1"), col("t2"), col("t3"),
          when(col("t3").isNotNull, 3)
            .when(col("t2").isNotNull, 2)
            .otherwise(1).cast(IntegerType).as("stage"))
        .orderBy("user_id")
    },
    Some("""
      WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
                 WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
            JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
            WHERE e.event_type = 'click' GROUP BY 1),
      p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
            JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
            WHERE e.event_type = 'purchase' GROUP BY 1)
      SELECT v.user_id AS user_id, t1, t2, t3,
        CAST(CASE WHEN t3 IS NOT NULL THEN 3
                  WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS INT) AS stage
      FROM v LEFT JOIN c ON v.user_id = c.user_id
             LEFT JOIN p ON v.user_id = p.user_id
      ORDER BY v.user_id"""))

  val all: Map[String, Q] = Map("q125_funnel" -> q125_funnel)
}
