package graft.textops

import graft.{Q, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for training-data pipelines: token counting
  * (whitespace + BPE-ish regex), quality scoring (length / punctuation /
  * stopword ratios), document fingerprinting and n-gram language ID.
  * All narrow projections over codegen'd builtins — embarrassingly
  * parallel at 100 TB — except langid, whose profile table is a tiny
  * broadcast model built with one aggregation pass.
  */
object TextAnalysis {

  private val bpeish = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Token counting: whitespace tokens and a BPE-ish regex token count
    * (letters runs | digit runs | single punctuation). */
  val d07_token_count = Q(
    (s, dir) => {
      T(s, dir, "documents")
        .select(
          col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("ws_tokens"),
          regexp_count(col("text"), lit(bpeish)).cast(LongType).as("re_tokens"),
          length(col("text")).cast(LongType).as("n_chars"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS re_tokens,
        CAST(LENGTH(text) AS BIGINT) AS n_chars
      FROM documents ORDER BY doc_id"""))

  /** Quality scoring: word count, mean word length, stopword ratio,
    * alpha ratio — the standard cheap quality gates. All ratios are
    * int/int divisions in double, so they hash-match the oracle. */
  val d06_quality_score = Q(
    (s, dir) => {
      val stop = Seq("the", "a", "of", "and", "to", "in", "is", "it")
        .map(w => s"'$w'").mkString(", ")
      T(s, dir, "documents")
        .select(col("doc_id"), col("text"), split(col("text"), " ").as("w"))
        .select(
          col("doc_id"),
          size(col("w")).cast(LongType).as("words"),
          (length(col("text")).cast(DoubleType) / size(col("w"))).as("mean_wlen"),
          (expr(s"size(filter(w, x -> x IN ($stop)))").cast(DoubleType) / size(col("w")))
            .as("stop_ratio"),
          (regexp_count(col("text"), lit("[a-zA-Z]")).cast(DoubleType) / length(col("text")))
            .as("alpha_ratio"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
        CAST(len(w) AS BIGINT) AS words,
        CAST(LENGTH(text) AS DOUBLE) / len(w) AS mean_wlen,
        CAST(len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS DOUBLE) / len(w) AS stop_ratio,
        CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS DOUBLE) / LENGTH(text) AS alpha_ratio
      FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents) t
      ORDER BY doc_id"""))

  /** Language ID via word-frequency profiles (naive Bayes with add-1
    * smoothing). The per-(lang, word) profile is one aggregation over the
    * corpus (tiny result → broadcast); scoring is an explode + broadcast
    * join + log-prob sum — no O(corpus × langs) shuffle. Log-probs are
    * quantized to integer micro-nats (round(ln·1e6) per model entry —
    * one deterministic rounding each) so the per-doc score is a sum of
    * BIGINTs: order-independent under any shuffle, hence oracle-checkable
    * exactly. Ties break to the lexicographically larger language. */
  val d08_langid = Q(
    (s, dir) => {
      val docs = T(s, dir, "documents")
      val words = docs.select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
      val profile = words.groupBy(col("lang"), col("w")).agg(count(lit(1)).as("cnt"))
      val langTotals = profile.groupBy(col("lang")).agg(sum(col("cnt")).as("tot"),
        count(lit(1)).as("vocab"))
      val model = broadcast(profile.join(langTotals, "lang")
        .select(col("lang").as("m_lang"), col("w"),
          round(log((col("cnt") + 1).cast(DoubleType) / (col("tot") + col("vocab"))) * 1e6)
            .cast(LongType).as("logp_u")))
      val scored = words.select(col("doc_id"), col("w"))
        .join(model, Seq("w"), "inner")
        .groupBy(col("doc_id"), col("m_lang"))
        .agg(sum(col("logp_u")).as("score"))
      val best = scored.groupBy(col("doc_id"))
        .agg(max_by(col("m_lang"), struct(col("score"), col("m_lang"))).as("pred_lang"))
      docs.select(col("doc_id"), col("lang")).join(best, "doc_id")
        .orderBy("doc_id")
    },
    Some("""
      WITH words AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        FROM documents),
      wf AS (SELECT * FROM words WHERE w <> ''),
      profile AS (
        SELECT lang, w, COUNT(*) AS cnt FROM wf GROUP BY lang, w),
      totals AS (
        SELECT lang, SUM(cnt) AS tot, COUNT(*) AS vocab
        FROM profile GROUP BY lang),
      model AS (
        SELECT p.lang AS m_lang, p.w,
          CAST(ROUND(ln(CAST(p.cnt + 1 AS DOUBLE) / (t.tot + t.vocab)) * 1e6) AS BIGINT) AS logp_u
        FROM profile p JOIN totals t ON p.lang = t.lang),
      scored AS (
        SELECT wf.doc_id, m.m_lang, SUM(m.logp_u) AS score
        FROM wf JOIN model m ON wf.w = m.w
        GROUP BY wf.doc_id, m.m_lang),
      best AS (
        SELECT doc_id, m_lang AS pred_lang
        FROM scored
        QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, m_lang DESC) = 1)
      SELECT d.doc_id, d.lang, b.pred_lang
      FROM documents d JOIN best b ON d.doc_id = b.doc_id
      ORDER BY d.doc_id"""))

  /** The composed training-data pipeline: quality gate → exact dedup
    * (md5 canonical = min doc_id) → per-language corpus stats. One
    * narrow projection, one hash shuffle for dedup, one partial-agg
    * shuffle for stats — the canonical 100 TB pre-training data flow.
    * chars-per-word is a ratio of exact integer sums, so it
    * hash-matches despite being a double. */
  val d13_pipeline = Q(
    (s, dir) => {
      val scored = T(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"),
          size(split(col("text"), " ")).as("words"),
          length(col("text")).as("chars"),
          (regexp_count(col("text"), lit("[a-zA-Z]")).cast(DoubleType) / length(col("text")))
            .as("alpha_ratio"))
        .filter(col("words") >= 5 && col("alpha_ratio") > 0.4)
      val canonical = scored
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"))
        .select(col("keep_id"))
      scored
        .join(canonical, col("doc_id") === col("keep_id"), "left_semi")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("words")).cast(LongType).as("total_words"),
          (sum(col("chars")).cast(DoubleType) / sum(col("words"))).as("chars_per_word"))
        .orderBy("lang")
    },
    Some("""
      WITH scored AS (
        SELECT doc_id, lang, text,
          len(string_split(text, ' ')) AS words,
          LENGTH(text) AS chars,
          CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS DOUBLE) / LENGTH(text) AS alpha_ratio
        FROM documents),
      kept AS (SELECT * FROM scored WHERE words >= 5 AND alpha_ratio > 0.4),
      canonical AS (SELECT min(doc_id) AS keep_id FROM kept GROUP BY md5(text))
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(words) AS BIGINT) AS total_words,
        CAST(SUM(chars) AS DOUBLE) / SUM(words) AS chars_per_word
      FROM kept WHERE doc_id IN (SELECT keep_id FROM canonical)
      GROUP BY lang ORDER BY lang"""))

  val all: Map[String, Q] = Map(
    "d06_quality_score" -> d06_quality_score,
    "d07_token_count" -> d07_token_count,
    "d08_langid" -> d08_langid,
    "d13_pipeline" -> d13_pipeline)
}
