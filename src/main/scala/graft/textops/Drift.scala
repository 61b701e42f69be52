package graft.textops

import graft.{Q, T}

/** Distribution-drift detection between two data cohorts — the
  * train/serve (or yesterday/today) comparison every production
  * pipeline runs before trusting a refresh. PSI (population stability
  * index) over FIXED bin edges: per-bin contribution
  * (pa − pb)·ln(pa/pb) with add-one smoothing, quantized to integer
  * micro-nats so the report hash-compares exactly (the d08/d26/d47
  * pattern: one LN per bin, everything else correctly-rounded IEEE
  * arithmetic with token-identical evaluation order in both engines).
  *
  * Scale: one scan bins every row (row-local arithmetic), one tiny
  * grouped count per cohort — the report is 10 rows regardless of
  * table size. */
object Drift {

  /** Shared textually between Spark SQL and DuckDB (fractional
    * literals avoided entirely — integer counts divide as DOUBLE via
    * explicit CASTs, so both engines run the identical double ops). */
  private val psiContrib =
    "CAST(ROUND((CAST(ca + 1 AS DOUBLE) / na - CAST(cb + 1 AS DOUBLE) / nb) * " +
      "LN((CAST(ca + 1 AS DOUBLE) * nb) / (CAST(cb + 1 AS DOUBLE) * na)) * 1000000) AS BIGINT)"

  /** Even/odd order keys stand in for the two snapshots; o_totalprice
    * bins into 10 fixed 60k-wide buckets (top bucket clamps). */
  val d51_psi_drift = Q(
    (s, dir) => {
      T(s, dir, "orders").createOrReplaceTempView("orders_v51")
      s.sql(s"""
        WITH base AS (
          SELECT least(9, CAST(floor(o_totalprice / 60000) AS INT)) AS bin,
                 CAST(o_orderkey % 2 AS INT) AS cohort
          FROM orders_v51
          WHERE o_totalprice IS NOT NULL AND o_totalprice >= 0),
        counts AS (
          SELECT bin,
                 SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS ca0,
                 SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS cb0
          FROM base GROUP BY bin),
        bins AS (SELECT explode(sequence(0, 9)) AS bin),
        filled AS (
          SELECT b.bin, CAST(coalesce(c.ca0, 0) AS BIGINT) AS ca,
                 CAST(coalesce(c.cb0, 0) AS BIGINT) AS cb
          FROM bins b LEFT JOIN counts c ON b.bin = c.bin),
        tot AS (SELECT CAST(SUM(ca) + 10 AS BIGINT) AS na,
                       CAST(SUM(cb) + 10 AS BIGINT) AS nb FROM filled)
        SELECT bin, ca, cb, $psiContrib AS psi_u
        FROM filled CROSS JOIN tot
        ORDER BY bin""")
    },
    Some(s"""
      WITH base AS (
        SELECT least(9, CAST(floor(o_totalprice / 60000) AS INT)) AS bin,
               CAST(o_orderkey % 2 AS INT) AS cohort
        FROM orders
        WHERE o_totalprice IS NOT NULL AND o_totalprice >= 0),
      counts AS (
        SELECT bin,
               SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS ca0,
               SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS cb0
        FROM base GROUP BY bin),
      bins AS (SELECT unnest(range(0, 10)) AS bin),
      filled AS (
        SELECT b.bin, CAST(coalesce(c.ca0, 0) AS BIGINT) AS ca,
               CAST(coalesce(c.cb0, 0) AS BIGINT) AS cb
        FROM bins b LEFT JOIN counts c ON b.bin = c.bin),
      tot AS (SELECT CAST(SUM(ca) + 10 AS BIGINT) AS na,
                     CAST(SUM(cb) + 10 AS BIGINT) AS nb FROM filled)
      SELECT bin, ca, cb, $psiContrib AS psi_u
      FROM filled CROSS JOIN tot
      ORDER BY bin"""))

  val all: Map[String, Q] = Map("d51_psi_drift" -> d51_psi_drift)
}
