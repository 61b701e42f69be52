package graft.textops

import graft.{Q, T}

/** Sparse text retrieval for training-data pipelines: BM25 scoring with
  * top-k ranking (the lexical half of hybrid search — the dense half is
  * the kNN/ANN family in [[Similarity]]/[[IvfAnn]]), and fixed-window
  * document chunking with stride (the RAG/pretraining segmentation
  * step). Both hash-exact under the DuckDB oracle: BM25 quantizes the
  * only libm-dependent value (per-term IDF) to integer micro-nats and
  * keeps every remaining step in correctly-rounded IEEE arithmetic with
  * identical evaluation order in both engines, so document scores are
  * INTEGER sums — the d08/d26 pattern.
  *
  * Scale shape at 100 TB: term frequencies are one hash shuffle of
  * (doc, term) pairs; document-frequency and corpus stats are tiny
  * aggregates broadcast back; query terms broadcast (queries are
  * human-sized); top-k is a per-query window over only the matching
  * docs. Chunking is row-local — one scan, no joins, no shuffle. */
object Retrieval {

  /** The BM25 scoring core, shared TEXTUALLY by both engines so the
    * double-arithmetic evaluation order is identical token for token
    * (multiplication and division are correctly rounded per IEEE 754,
    * so same order ⇒ same bits ⇒ same ROUND): k1 = 1.2, b = 0.75,
    * contribution = idf_u · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    * with avgdl expanded to sum_dl/nd to stay in exact integers until
    * the one division. */
  private val bm25Contrib =
    "CAST(ROUND(((idf_u * tf) * CAST(2.2 AS DOUBLE)) / (tf + CAST(1.2 AS DOUBLE) * " +
      "(CAST(0.25 AS DOUBLE) + (((CAST(0.75 AS DOUBLE) * dl) * nd) / sum_dl)))) AS BIGINT)"

  /** Integer micro-nat IDF (round(ln·1e6)); the Lucene-style
    * +1-inside-the-log variant keeps it positive even for terms in
    * every document. Every fractional literal is cast to DOUBLE
    * explicitly: Spark parses bare decimal literals as DECIMAL and
    * would evaluate the formula in scale-truncating decimal
    * arithmetic, while DuckDB promotes to DOUBLE — the one way the
    * "identical text" guarantee can silently break. */
  private val bm25Idf =
    "CAST(ROUND(LN(1 + (nd - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE))) * 1000000) AS BIGINT)"

  /** Three fixed queries over the synthetic corpus (one with the rare
    * term `dup`, so the ranking exercises a genuinely discriminative
    * IDF, not just length normalization). */
  private val queryRows =
    "('q1', 'hash'), ('q1', 'join'), ('q1', 'merge')," +
      "('q2', 'dup'), ('q2', 'stream'), ('q2', 'window')," +
      "('q3', 'fast'), ('q3', 'vector'), ('q3', 'scan')"

  /** BM25 top-5 per query. Ties (common here — most terms appear in
    * most docs) break by doc_id, so the ranking is total. */
  val d47_bm25_topk = Q(
    (s, dir) => {
      T(s, dir, "documents").createOrReplaceTempView("documents_v47")
      s.sql(s"""
        WITH d AS (SELECT doc_id,
                     filter(split(lower(text), ' '), w -> w <> '') AS ws
                   FROM documents_v47),
        docs AS (SELECT doc_id, size(ws) AS dl FROM d),
        stats AS (SELECT count(*) AS nd, sum(dl) AS sum_dl FROM docs),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM (SELECT doc_id, explode(ws) AS term FROM d)
               GROUP BY doc_id, term),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        q AS (SELECT * FROM VALUES $queryRows AS q(query_id, term)),
        idf AS (SELECT term, $bm25Idf AS idf_u
                FROM df CROSS JOIN stats),
        scores AS (SELECT q.query_id, tf.doc_id,
                     CAST(sum($bm25Contrib) AS BIGINT) AS score_u
                   FROM q JOIN tf ON q.term = tf.term
                     JOIN idf ON idf.term = q.term
                     JOIN docs ON docs.doc_id = tf.doc_id
                     CROSS JOIN stats
                   GROUP BY q.query_id, tf.doc_id)
        SELECT query_id, rnk, doc_id, score_u FROM (
          SELECT query_id, doc_id, score_u,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY score_u DESC, doc_id) AS BIGINT) AS rnk
          FROM scores)
        WHERE rnk <= 5
        ORDER BY query_id, rnk""")
    },
    Some(s"""
      WITH d AS (SELECT doc_id,
                   list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws
                 FROM documents),
      docs AS (SELECT doc_id, len(ws) AS dl FROM d),
      stats AS (SELECT count(*) AS nd, sum(dl) AS sum_dl FROM docs),
      tf AS (SELECT doc_id, term, count(*) AS tf
             FROM (SELECT doc_id, unnest(ws) AS term FROM d)
             GROUP BY doc_id, term),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      q AS (SELECT * FROM (VALUES $queryRows) q(query_id, term)),
      idf AS (SELECT term, $bm25Idf AS idf_u
              FROM df CROSS JOIN stats),
      scores AS (SELECT q.query_id, tf.doc_id,
                   CAST(sum($bm25Contrib) AS BIGINT) AS score_u
                 FROM q JOIN tf ON q.term = tf.term
                   JOIN idf ON idf.term = q.term
                   JOIN docs ON docs.doc_id = tf.doc_id
                   CROSS JOIN stats
                 GROUP BY q.query_id, tf.doc_id)
      SELECT query_id, rnk, doc_id, score_u FROM (
        SELECT query_id, doc_id, score_u,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY score_u DESC, doc_id) AS BIGINT) AS rnk
        FROM scores)
      WHERE rnk <= 5
      ORDER BY query_id, rnk"""))

  /** Fixed-window chunking with stride (16-word chunks, stride 8 — 50%
    * overlap): every chunk start is a multiple of the stride below the
    * document length, the tail chunk may be short, and (doc_id,
    * chunk_idx) is a key. Row-local: the 100 TB form is one scan that
    * multiplies rows ~len/stride with zero shuffles. */
  val d48_chunk_stride = Q(
    (s, dir) => {
      T(s, dir, "documents").createOrReplaceTempView("documents_v48")
      s.sql("""
        SELECT doc_id, start div 8 AS chunk_idx,
               CAST(least(16, size(ws) - start) AS BIGINT) AS n_tokens,
               array_join(slice(ws, start + 1, 16), ' ') AS chunk_text
        FROM (SELECT doc_id, ws,
                explode(sequence(0, size(ws) - 1, 8)) AS start
              FROM (SELECT doc_id,
                      filter(split(text, ' '), w -> w <> '') AS ws
                    FROM documents_v48)
              WHERE size(ws) > 0)
        ORDER BY doc_id, chunk_idx""")
    },
    Some("""
      SELECT doc_id, start // 8 AS chunk_idx,
             CAST(least(16, len(ws) - start) AS BIGINT) AS n_tokens,
             array_to_string(ws[start + 1 : start + 16], ' ') AS chunk_text
      FROM (SELECT doc_id, ws, unnest(range(0, len(ws), 8)) AS start
            FROM (SELECT doc_id,
                    list_filter(string_split(text, ' '), w -> w <> '') AS ws
                  FROM documents)
            WHERE len(ws) > 0)
      ORDER BY doc_id, chunk_idx"""))

  val all: Map[String, Q] = Map(
    "d47_bm25_topk" -> d47_bm25_topk,
    "d48_chunk_stride" -> d48_chunk_stride)
}
