package graft.textops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.{Q, T}

/** Curation pack 3: temperature-scaled source mixing and corpus n-gram
  * auditing — two standard large-corpus training-data passes.
  */
object Curation3 {

  /** Temperature sampling across sources (the multilingual-LM mixing
    * rule): source s keeps rate_s = min(1, (n_s^α / Σ n^α) · N_target /
    * n_s) with α = 0.5 and N_target = half the corpus — upweights small
    * sources relative to proportional sampling. Selection is the shared
    * [[HashSelect]] device (as d16/d32): u32 hash vs an INTEGER
    * threshold, so the float rate is folded through one deterministic
    * rounding and never compared or emitted as a double. The α-weight
    * normalizer sums per-source sqrt in SOURCE ORDER on both engines
    * (a handful of doubles — the fold order is pinned), then the rate
    * leaves the contract surface as `rate_ppm BIGINT`: no fp fold order
    * or double rendering can wobble the driver hash.
    *
    * Scale: two aggregations over the corpus plus a broadcast of the
    * per-source rate table (|sources| rows) — one shuffle each; no
    * driver-side data beyond the rate table. */
  val d36_temperature_mix = Q(
    (s, dir) => {
      val docs = T(s, dir, "documents")
        .withColumn("h", HashSelect.u32(col("doc_id")))
      val per = docs.groupBy("source").agg(count(lit(1)).as("n"))
      val tot = per.agg(
        sum(col("n")).as("total"),
        expr("aggregate(array_sort(collect_list(struct(source, CAST(sqrt(n) AS DOUBLE) AS sq))), " +
          "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.sq)").as("sumsq"))
      val rates = per.crossJoin(broadcast(tot)) // 1 row: global agg
        .withColumn("rate", least(lit(1.0),
          expr("sqrt(CAST(n AS DOUBLE)) / sumsq * (0.5 * CAST(total AS DOUBLE)) / CAST(n AS DOUBLE)")))
        .select(col("source"), col("n").as("n_docs"),
          floor(col("rate") * lit(1e6) + lit(0.5)).cast("long").as("rate_ppm"),
          HashSelect.thr32(col("rate")).as("thr"))
      docs.join(broadcast(rates), "source")
        .groupBy(col("source"))
        .agg(first(col("n_docs")).as("n_docs"),
          first(col("rate_ppm")).as("rate_ppm"),
          sum(when(col("h") < col("thr"), 1L).otherwise(0L)).as("n_sampled"))
        .orderBy("source")
    },
    Some(s"""
      WITH docs AS (
        SELECT source, ${HashSelect.u32Sql("doc_id")} AS h
        FROM documents),
      per AS (SELECT source, COUNT(*) AS n FROM docs GROUP BY source),
      tot AS (SELECT SUM(n) AS total,
                     SUM(sqrt(CAST(n AS DOUBLE)) ORDER BY source) AS sumsq
              FROM per),
      rates AS (
        SELECT source, n AS n_docs,
               least(1.0, sqrt(CAST(n AS DOUBLE)) / sumsq * (0.5 * CAST(total AS DOUBLE)) / CAST(n AS DOUBLE)) AS rate
        FROM per, tot),
      r2 AS (
        SELECT source, n_docs,
               CAST(floor(rate * 1e6 + 0.5) AS BIGINT) AS rate_ppm,
               ${HashSelect.thr32Sql("rate")} AS thr
        FROM rates)
      SELECT d.source, r.n_docs, r.rate_ppm,
             CAST(SUM(CASE WHEN d.h < r.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
      FROM docs d JOIN r2 r ON d.source = r.source
      GROUP BY d.source, r.n_docs, r.rate_ppm ORDER BY d.source"""))

  /** Corpus 5-gram audit: the most frequent word 5-grams (boilerplate /
    * template detection — over-represented n-grams mark scraped
    * navigation text and licensing banners). One explode + one count
    * shuffle; the `count >= 3` pre-filter happens in the aggregation
    * (map-side partials), and only the global top 20 reach the driver. */
  val d37_ngram_audit = Q(
    (s, dir) => {
      T(s, dir, "documents")
        .select(split(col("text"), " ").as("w"))
        .select(explode(expr(
          "CASE WHEN size(w) >= 5 THEN transform(sequence(0, size(w) - 5), " +
            "i -> array_join(slice(w, i + 1, 5), ' ')) ELSE array() END")).as("ngram"))
        .groupBy(col("ngram"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 3)
        .orderBy(col("n").desc, col("ngram"))
        .limit(20)
    },
    Some("""
      WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
      g AS (SELECT array_to_string(w[i + 1 : i + 5], ' ') AS ngram
            FROM t, unnest(range(0, GREATEST(len(w) - 4, 0))) AS u(i))
      SELECT ngram, COUNT(*) AS n FROM g GROUP BY ngram
      HAVING COUNT(*) >= 3
      ORDER BY n DESC, ngram LIMIT 20"""))

  /** Gopher-style document quality rules (Rae et al. 2021 §A1.1, the
    * standard pre-training heuristic gate): word-count bounds, mean
    * word length bounds, symbol-to-word ratio, alphabetic-word
    * fraction, and a minimum stop-word count — each emitted as its own
    * column plus the combined keep verdict, so downstream passes can
    * audit WHICH rule fired. Every measure is an exact integer or a
    * single integer division, so the verdicts compare identically in
    * both engines. Scale: one row-local projection — no shuffle, no
    * state; runs at scan speed on any corpus. */
  val d39_gopher_rules = Q(
    (s, dir) => {
      val stop = Seq("the", "a", "of", "and", "to", "in", "is", "it")
        .map(w => s"'$w'").mkString(", ")
      T(s, dir, "documents")
        .select(col("doc_id"), col("text"), split(col("text"), " ").as("w"))
        .select(
          col("doc_id"),
          size(col("w")).cast("long").as("n_words"),
          (expr("aggregate(w, 0, (a, x) -> a + length(x))").cast(DoubleType) /
            size(col("w"))).as("mean_wlen"),
          (regexp_count(col("text"), lit("#|\\.\\.\\.")).cast(DoubleType) /
            size(col("w"))).as("symbol_ratio"),
          (expr("size(filter(w, x -> x rlike '[a-zA-Z]'))").cast(DoubleType) /
            size(col("w"))).as("alpha_frac"),
          expr(s"size(filter(w, x -> lower(x) IN ($stop)))").cast("long").as("n_stop"))
        .withColumn("keep",
          col("n_words").between(50, 100000) &&
            col("mean_wlen").between(3.0, 10.0) &&
            col("symbol_ratio") <= 0.1 &&
            col("alpha_frac") >= 0.8 &&
            col("n_stop") >= 2)
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
      m AS (
        SELECT doc_id,
          CAST(len(w) AS BIGINT) AS n_words,
          CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w) AS mean_wlen,
          CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE) / len(w) AS symbol_ratio,
          CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE) / len(w) AS alpha_frac,
          CAST(len(list_filter(w, x -> lower(x) IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS BIGINT) AS n_stop
        FROM t)
      SELECT doc_id, n_words, mean_wlen, symbol_ratio, alpha_frac, n_stop,
        (n_words BETWEEN 50 AND 100000 AND mean_wlen BETWEEN 3.0 AND 10.0
         AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8 AND n_stop >= 2) AS keep
      FROM m ORDER BY doc_id"""))

  val all: Map[String, Q] = Map(
    "d36_temperature_mix" -> d36_temperature_mix,
    "d37_ngram_audit" -> d37_ngram_audit,
    "d39_gopher_rules" -> d39_gopher_rules)
}
