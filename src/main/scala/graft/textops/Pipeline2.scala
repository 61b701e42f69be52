package graft.textops

import graft.{Q, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second wave of training-data pipeline operators: deterministic
  * stratified sampling (the training-mix rebalance step), text
  * normalization, and PII scrubbing. All are narrow, codegen'd
  * projections/filters — embarrassingly parallel at 100 TB; the only
  * shuffle anywhere is d16's final count aggregate.
  */
object Pipeline2 {

  /** Deterministic stratified sampling by language — the step that
    * rebalances a training mix (e.g. downsample the dominant language,
    * keep the tails). The keep decision is the shared [[HashSelect]]
    * device — a pure function of the row, integer-compared (u32 hash vs
    * integer threshold). No RNG state, no seed plumbing — the sample is
    * reproducible on any engine and stable under re-partitioning,
    * which is what makes it auditable in a data lineage review.
    * (Contrast TABLESAMPLE/df.sample: partition-seeded, so the sample
    * changes with the physical layout.) */
  val d16_stratified_sample = Q(
    (s, dir) => {
      val rate = when(col("lang") === "en", 0.2)
        .when(col("lang") === "de", 0.5)
        .otherwise(1.0)
      T(s, dir, "documents")
        .withColumn("h", HashSelect.u32(col("doc_id")))
        .filter(col("h") < HashSelect.thr32(rate))
        .withColumn("u", col("h").cast(DoubleType) / lit(4294967296.0))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sampled"),
          round(min(col("u")), 6).as("min_u"),
          round(max(col("u")), 6).as("max_u"))
        .orderBy("lang")
    },
    Some(s"""
      WITH s AS (
        SELECT lang, ${HashSelect.u32Sql("doc_id")} AS h
        FROM documents),
      kept AS (
        SELECT lang, CAST(h AS DOUBLE) / 4294967296.0 AS u
        FROM s
        WHERE h < ${HashSelect.thr32Sql(
        "CASE lang WHEN 'en' THEN 0.2 WHEN 'de' THEN 0.5 ELSE 1.0 END")})
      SELECT lang, COUNT(*) AS n_sampled,
        ROUND(MIN(u), 6) AS min_u, ROUND(MAX(u), 6) AS max_u
      FROM kept
      GROUP BY lang ORDER BY lang"""))

  /** Text normalization: lowercase, strip non-alphanumerics, collapse
    * whitespace, trim — the canonical pre-tokenization cleanup pass. */
  val d17_normalize = Q(
    (s, dir) => {
      T(s, dir, "documents")
        .select(col("doc_id"),
          trim(regexp_replace(
            regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
            " +", " ")).as("norm"))
        .select(col("doc_id"), col("norm"),
          size(split(col("norm"), " ")).cast(LongType).as("n_tokens"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, norm,
        CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens
      FROM (
        SELECT doc_id,
          trim(regexp_replace(
            regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
            ' +', ' ', 'g')) AS norm
        FROM documents) t
      ORDER BY doc_id"""))

  /** PII scrubbing: mask emails, phone-shaped numbers, then any long
    * digit run. The test corpus carries no real PII, so the query first
    * plants a deterministic contact line per document (same construction
    * on both engines), then proves the masks fire and count them.
    * Order matters: email before phone before bare digits, so a masked
    * token is not re-masked by a weaker pattern. */
  val d18_pii_scrub = Q(
    (s, dir) => {
      val planted = concat(
        lit("contact user"), col("doc_id"), lit("@example.com tel 555-"),
        lpad((col("doc_id") % 10000).cast(StringType), 4, "0"), lit(" "), col("text"))
      T(s, dir, "documents")
        .select(col("doc_id"), planted.as("raw"))
        .select(col("doc_id"),
          regexp_replace(
            regexp_replace(
              regexp_replace(col("raw"),
                "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
              "\\b\\d{3}[- ]\\d{4}\\b", "<PHONE>"),
            "\\b\\d{4,}\\b", "<NUM>").as("clean"))
        .select(col("doc_id"), col("clean"),
          (size(split(col("clean"), "<EMAIL>", -1)) - 1).cast(LongType).as("n_email"),
          (size(split(col("clean"), "<PHONE>", -1)) - 1).cast(LongType).as("n_phone"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, clean,
        CAST(len(string_split(clean, '<EMAIL>')) - 1 AS BIGINT) AS n_email,
        CAST(len(string_split(clean, '<PHONE>')) - 1 AS BIGINT) AS n_phone
      FROM (
        SELECT doc_id,
          regexp_replace(
            regexp_replace(
              regexp_replace(
                'contact user' || doc_id || '@example.com tel 555-' ||
                  lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' || text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
              '\b\d{3}[- ]\d{4}\b', '<PHONE>', 'g'),
            '\b\d{4,}\b', '<NUM>', 'g') AS clean
        FROM documents) t
      ORDER BY doc_id"""))

  val all: Map[String, Q] = Map(
    "d16_stratified_sample" -> d16_stratified_sample,
    "d17_normalize" -> d17_normalize,
    "d18_pii_scrub" -> d18_pii_scrub)
}
