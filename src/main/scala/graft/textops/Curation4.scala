package graft.textops

import org.apache.spark.sql.functions._

import graft.{Q, T}

/** Curation pack 4: importance-resampling data selection (DSIR —
  * "Data Selection for Language Models via Importance Resampling",
  * Xie et al. 2023): score every corpus document by how target-like
  * its hashed n-gram distribution is, keep the top-weighted docs.
  */
object Curation4 {

  /** DSIR-style selection with the `en` slice as the target
    * distribution. Unigrams hash into 512 buckets (md5-based — the
    * only hash family both engines compute bit-identically); each
    * bucket carries an integer importance score
    * `floor((target_count+1) · 1e6 / (source_count+1))` (Laplace
    * smoothing; the (T+B)/(S+B) normalizer is a constant factor and is
    * dropped — ranking-invariant), and a document's weight is the
    * exact BIGINT Σ tokens_in_bucket · bucket_score. True DSIR
    * sums log-ratios; the integer-ratio scoring is the deterministic
    * twin of the same ranking signal (the same device as the ppm
    * ratios of the TPC-DS packs), so the driver hash is stable.
    *
    * Scale: one token explode, one 512-group aggregation (the bucket
    * score table), one (doc, bucket) aggregation, a BROADCAST of the
    * 512-row score table, and a top-k — no corpus-sized shuffle beyond
    * the two keyed aggregations; the score table is constant-size at
    * any corpus scale. */
  val d41_dsir_select = Q(
    (s, dir) => {
      val toks = T(s, dir, "documents")
        .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .select(col("doc_id"), col("lang"),
          (expr("CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT)") % 512).as("b"))
      val scores = toks.groupBy(col("b")).agg(
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"),
          count(lit(1)).as("cs"))
        .select(col("b"),
          floor((col("ct") + 1) * lit(1000000.0) / (col("cs") + 1)).cast("long").as("score"))
      // per-TOKEN average bucket score: length-invariant (a raw
      // Σ n·score grows with document length regardless of
      // distribution — the average is the target-likeness signal)
      toks.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("n"))
        .join(broadcast(scores), Seq("b"))
        .groupBy(col("doc_id"))
        .agg(floor(sum(col("n") * col("score")) * lit(1.0) / sum(col("n")))
          .cast("long").as("weight"))
        .orderBy(col("weight").desc, col("doc_id"))
        .limit(50)
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, lang,
          CAST('0x' || substring(md5(w), 1, 8) AS BIGINT) % 512 AS b
        FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
              FROM documents)
        WHERE w <> ''),
      sc AS (
        SELECT b,
          CAST(FLOOR((SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1) * 1000000.0
            / (COUNT(*) + 1)) AS BIGINT) AS score
        FROM tok GROUP BY b),
      db AS (SELECT doc_id, b, COUNT(*) AS n FROM tok GROUP BY doc_id, b)
      SELECT doc_id, CAST(FLOOR(SUM(n * score) * 1.0 / SUM(n)) AS BIGINT) AS weight
      FROM db JOIN sc USING (b)
      GROUP BY doc_id ORDER BY weight DESC, doc_id LIMIT 50"""))

  val all: Map[String, Q] = Map(
    "d41_dsir_select" -> d41_dsir_select)
}
