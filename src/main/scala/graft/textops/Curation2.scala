package graft.textops

import graft.{Q, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second curation pack: URL-level dedup and NEAR-duplicate benchmark
  * decontamination — the two selection stages round 4's pack lacked
  * (d21 catches exact n-gram overlap; real leakage is usually a
  * lightly-edited near-copy).
  *
  * Scale design: d34 is one shuffle on the canonical-URL key (the d01
  * shape, URL-keyed). d35 builds candidates from the df-capped shingle
  * inverted index (the d04 engine, cross-corpus instead of self-join) —
  * the benchmark side is small by definition, the corpus side is
  * scanned once, and only candidate pairs are verified exactly.
  */
object Curation2 {

  /** URL canonicalization + dedup: strip the query string, the trailing
    * slash and the www. prefix, lowercase, then keep the first doc per
    * canonical URL — the crawl-frontier dedup every pipeline runs
    * before any content hashing. The messy URL is synthesized
    * deterministically from (source, doc_id) so the oracle constructs
    * the identical input. */
  val d34_url_dedup = Q(
    (s, dir) => {
      val url = concat(
        lit("HTTPS://WWW."), col("source"), lit("/p/"),
        (col("doc_id") % 50).cast(StringType),
        when(col("doc_id") % 3 === 0, lit("?utm_source=feed")).otherwise(lit("")),
        when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")))
      T(s, dir, "documents")
        .withColumn("url", url)
        .withColumn("canon",
          regexp_replace(
            regexp_replace(
              regexp_replace(lower(col("url")), "\\?.*$", ""),
              "/$", ""),
            "^https://www\\.", "https://"))
        .groupBy(col("canon"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("keep_id")
    },
    Some("""
      WITH u AS (
        SELECT doc_id,
          'HTTPS://WWW.' || source || '/p/' || (doc_id % 50)
            || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed' ELSE '' END
            || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END AS url
        FROM documents),
      c AS (
        SELECT doc_id,
          regexp_replace(
            regexp_replace(
              regexp_replace(lower(url), '\?.*$', ''),
              '/$', ''),
            '^https://www\.', 'https://') AS canon
        FROM u)
      SELECT canon, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      FROM c GROUP BY canon ORDER BY keep_id"""))

  /** NEAR-duplicate benchmark decontamination: a corpus document is
    * contaminated when its 3-gram Jaccard against ANY benchmark
    * document (source 'src0') reaches 0.6 — the fuzzy form of d21's
    * exact-overlap check, catching lightly-edited test-set copies.
    * Candidates come from the df-capped shingle inverted index (hot
    * shingles dropped, Dedup.ShingleDfCap); every candidate pair is
    * verified on the full shingle sets, so the flag is exact. */
  val d35_fuzzy_decontaminate = Q(
    (s, dir) => {
      val docs = T(s, dir, "documents")
        .filter(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"), col("source"))
      val sh = Dedup.docShingles(s, dir).join(docs, "doc_id")
      val bench = sh.filter(col("source") === "src0")
        .select(col("doc_id").as("b_id"), col("ws").as("b_ws"), col("sz").as("b_sz"))
      val corpus = sh.filter(col("source") =!= "src0")
        .select(col("doc_id"), col("ws"), col("sz"))
      val exC = corpus.select(col("doc_id"), explode(col("ws")).as("sh"))
      val exB = bench.select(col("b_id"), explode(col("b_ws")).as("sh"))
      val hot = exC.groupBy(col("sh")).agg(count(lit(1)).as("df"))
        .filter(col("df") > Dedup.ShingleDfCap).select(col("sh"))
      val cand = exC.join(hot, Seq("sh"), "left_anti")
        .join(exB, Seq("sh"))
        .select(col("doc_id"), col("b_id")).distinct()
      val verified = cand.join(corpus, "doc_id").join(bench, "b_id")
        .withColumn("inter", size(array_intersect(col("ws"), col("b_ws"))))
        .withColumn("jac",
          col("inter").cast(DoubleType) / (col("sz") + col("b_sz") - col("inter")))
        .filter(col("jac") >= 0.6)
        .groupBy(col("doc_id"))
        .agg(min(col("b_id")).as("matched_bench"), max(col("jac")).as("max_jac"))
      corpus.select(col("doc_id"))
        .join(verified, Seq("doc_id"), "left")
        .select(col("doc_id"), col("matched_bench"), col("max_jac"),
          col("matched_bench").isNotNull.as("contaminated"))
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w
                 FROM documents),
      ws AS (SELECT doc_id, source,
              list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                             for i in range(1, len(w) - 2 + 1)]) AS sh
            FROM t WHERE len(w) >= 3),
      bench AS (SELECT doc_id AS b_id, sh AS bsh FROM ws WHERE source = 'src0'),
      corpus AS (SELECT doc_id, sh FROM ws WHERE source <> 'src0'),
      p AS (SELECT c.doc_id, b.b_id,
              CAST(len(list_intersect(c.sh, b.bsh)) AS DOUBLE) /
                (len(c.sh) + len(b.bsh) - len(list_intersect(c.sh, b.bsh))) AS jac
            FROM corpus c, bench b),
      v AS (SELECT doc_id, MIN(b_id) AS matched_bench, MAX(jac) AS max_jac
            FROM p WHERE jac >= 0.6 GROUP BY doc_id)
      SELECT c.doc_id, v.matched_bench, v.max_jac,
             v.matched_bench IS NOT NULL AS contaminated
      FROM corpus c LEFT JOIN v USING (doc_id)
      ORDER BY c.doc_id"""))

  val all: Map[String, Q] = Map(
    "d34_url_dedup" -> d34_url_dedup,
    "d35_fuzzy_decontaminate" -> d35_fuzzy_decontaminate)
}
