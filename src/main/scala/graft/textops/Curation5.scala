package graft.textops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, T}

/** Curation pack 5: exact substring-span deduplication ("Deduplicating
  * Training Data Makes Language Models Better", Lee et al. 2021). The
  * suffix-array construction of the paper finds repeated substrings of
  * length ≥ L anywhere in the corpus; the distributed equivalent used
  * by production pipelines slides a fixed-length word window over
  * every document and marks any span whose text occurs more than once
  * corpus-wide — the span audit that drives span-removal or
  * whole-document down-weighting.
  */
object Curation5 {

  /** Per-document span-duplication audit over 4-word windows: how many
    * of a document's spans also occur elsewhere (or repeat within it),
    * as a count and an integer ppm ratio.
    *
    * Scale: one explode to (doc, span) rows, ONE shuffle keyed on the
    * span text to count global occurrences (at 100 TB the span string
    * would be xxhash64'd first so shuffle rows stay 16 bytes — here it
    * stays text so the DuckDB oracle restates it bit-for-bit), a join
    * back on the same key (reuses the partitioning), and one doc-keyed
    * aggregation. Nothing is quadratic: the hot-span table is the
    * duplicated tail only, and no suffix array is materialized. */
  val d42_span_dedup = Q(
    (s, dir) => {
      val words = T(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 4)
      val grams = words.select(col("doc_id"),
        explode(expr("transform(sequence(1, size(w) - 3), i -> array_join(slice(w, i, 4), ' '))"))
          .as("g"))
      val counts = grams.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
      grams.join(counts, Seq("g"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup"))
        .select(col("doc_id"), col("n_spans"), col("n_dup"),
          expr("n_dup * 1000000 DIV n_spans").as("dup_ppm"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH words AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
        WHERE len(string_split(text, ' ')) >= 4),
      grams AS (
        SELECT doc_id, array_to_string(w[i:i+3], ' ') AS g
        FROM words, LATERAL (SELECT unnest(generate_series(1, len(w) - 3)) AS i) t),
      counts AS (SELECT g, COUNT(*) AS cnt FROM grams GROUP BY g),
      per_doc AS (
        SELECT doc_id, COUNT(*) AS n_spans,
          COUNT(CASE WHEN cnt > 1 THEN 1 END) AS n_dup
        FROM grams JOIN counts USING (g) GROUP BY doc_id)
      SELECT doc_id, n_spans, n_dup,
        CAST(n_dup * 1000000 // n_spans AS BIGINT) AS dup_ppm
      FROM per_doc ORDER BY doc_id"""))

  val all: Map[String, Q] = Map("d42_span_dedup" -> d42_span_dedup)
}
