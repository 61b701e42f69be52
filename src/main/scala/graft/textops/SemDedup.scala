package graft.textops

import org.apache.spark.sql.functions._

import graft.{Q, T}

/** Semantic deduplication (SemDeDup — "SemDeDup: Data-efficient
  * learning at web-scale through semantic deduplication", Abbas et
  * al. 2023): cluster the embedding space first, then prune
  * near-duplicates WITHIN each cluster only — the device that turns
  * the quadratic all-pairs cosine scan into per-cell work (cells are
  * ~n/k vectors; cross-cell pairs are never materialized).
  */
object SemDedup {

  /** SemDeDup over the embeddings table: assign every vector to its
    * nearest of k=8 fixed codebook centroids (the 8 lowest-md5 vectors
    * — the stand-in for the paper's pretrained k-means, same seed
    * device as d38), then inside each cell drop the higher vec_id of
    * every pair with cosine ≥ 0.4. Everything runs on the round(x·1e3)
    * integer grid, so the cosine test is the EXACT integer inequality
    * dot > 0 ∧ 25·dot² ≥ 4·|a|²·|b|² and the DuckDB oracle restates the
    * whole pipeline bit-for-bit.
    *
    * Scale: one (vec × dim) shuffle for the assignment argmin (k·dim
    * centroid rows join in), one cell-keyed self-join whose work is
    * Σ_cells m_c² instead of n² — at 100 TB k grows with the corpus so
    * cells stay bounded, exactly the paper's cost argument; the dup
    * set is key-only. No broadcast of anything that scales. */
  val d43_semantic_dedup = Q(
    (s, dir) => {
      T.registerViews(s, dir)
      s.sql("""
        WITH q AS (
          SELECT vec_id, pos, CAST(ROUND(CAST(el AS DOUBLE) * 1000e0) AS BIGINT) AS qv
          FROM embeddings LATERAL VIEW posexplode(embedding) t AS pos, el),
        seeds AS (
          SELECT vec_id, rn - 1 AS cid FROM (
            SELECT vec_id, ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS STRING)), vec_id) AS rn
            FROM embeddings) x WHERE rn <= 8),
        cent AS (
          SELECT s.cid, q.pos, q.qv AS cv FROM seeds s JOIN q ON q.vec_id = s.vec_id),
        assign AS (
          SELECT vec_id, cid FROM (
            SELECT q.vec_id, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                     ORDER BY SUM((q.qv - c.cv) * (q.qv - c.cv)), c.cid) AS rk
            FROM q JOIN cent c ON q.pos = c.pos
            GROUP BY q.vec_id, c.cid) y WHERE rk = 1),
        n2 AS (SELECT vec_id, SUM(qv * qv) AS n2 FROM q GROUP BY vec_id),
        vec AS (
          SELECT a.cid, q.vec_id, q.pos, q.qv, n2.n2
          FROM q JOIN assign a ON q.vec_id = a.vec_id
          JOIN n2 ON n2.vec_id = q.vec_id),
        pairs AS (
          SELECT a.vec_id AS ia, b.vec_id AS ib,
                 SUM(a.qv * b.qv) AS dot, MIN(a.n2) AS na2, MIN(b.n2) AS nb2
          FROM vec a JOIN vec b
            ON a.cid = b.cid AND a.pos = b.pos AND a.vec_id < b.vec_id
          GROUP BY a.vec_id, b.vec_id),
        dups AS (
          SELECT DISTINCT ib AS vec_id FROM pairs
          WHERE dot > 0 AND 25 * dot * dot >= 4 * na2 * nb2)
        SELECT a.vec_id, a.cid FROM assign a
        WHERE NOT EXISTS (SELECT 1 FROM dups d WHERE d.vec_id = a.vec_id)
        ORDER BY a.vec_id""")
    },
    Some("""
      WITH q AS (
        SELECT vec_id, i - 1 AS pos, CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000e0) AS BIGINT) AS qv
        FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) t),
      seeds AS (
        SELECT vec_id, rn - 1 AS cid FROM (
          SELECT vec_id, ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
          FROM embeddings) x WHERE rn <= 8),
      cent AS (
        SELECT s.cid, q.pos, q.qv AS cv FROM seeds s JOIN q ON q.vec_id = s.vec_id),
      assign AS (
        SELECT vec_id, cid FROM (
          SELECT q.vec_id, c.cid,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY SUM((q.qv - c.cv) * (q.qv - c.cv)), c.cid) AS rk
          FROM q JOIN cent c ON q.pos = c.pos
          GROUP BY q.vec_id, c.cid) y WHERE rk = 1),
      n2 AS (SELECT vec_id, SUM(qv * qv) AS n2 FROM q GROUP BY vec_id),
      vec AS (
        SELECT a.cid, q.vec_id, q.pos, q.qv, n2.n2
        FROM q JOIN assign a ON q.vec_id = a.vec_id
        JOIN n2 ON n2.vec_id = q.vec_id),
      pairs AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               CAST(SUM(a.qv * b.qv) AS BIGINT) AS dot,
               CAST(MIN(a.n2) AS BIGINT) AS na2, CAST(MIN(b.n2) AS BIGINT) AS nb2
        FROM vec a JOIN vec b
          ON a.cid = b.cid AND a.pos = b.pos AND a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id),
      dups AS (
        SELECT DISTINCT ib AS vec_id FROM pairs
        WHERE dot > 0 AND 25 * dot * dot >= 4 * na2 * nb2)
      SELECT a.vec_id, a.cid FROM assign a
      WHERE a.vec_id NOT IN (SELECT vec_id FROM dups)
      ORDER BY a.vec_id"""))

  val all: Map[String, Q] = Map("d43_semantic_dedup" -> d43_semantic_dedup)
}
