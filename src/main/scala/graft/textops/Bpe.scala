package graft.textops

import graft.{Q, T}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. '16) as a
  * pipeline op: the corpus collapses to its word-frequency table in
  * one distributed aggregation (the only pass over the 100 TB text),
  * and the merge loop runs over that compact vocabulary on the driver
  * — exactly the published algorithm's structure, where training cost
  * scales with |vocab|, not corpus bytes. Tokenization then applies
  * the learned merge list corpus-wide as a broadcast, shuffle-free
  * typed pass. Deterministic end to end: pair ties break
  * lexicographically, so the same corpus always learns the same
  * merges (reproducible tokenizer builds — the property that matters
  * when a tokenizer must be re-derivable from data provenance).
  */
object Bpe {

  type Merge = (String, String)

  /** Learn `nMerges` merges from (word → count). Greedy most-frequent
    * adjacent pair; ties by lexicographic pair order. */
  private[graft] def learn(words: Map[String, Long], nMerges: Int): Seq[Merge] = {
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, c) => (w.map(_.toString).toVector :+ "</w>", c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (merges.size < nMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[Merge, Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.map { case (syms, c) => (applyMerge(syms, best), c) }
      }
    }
    merges.toSeq
  }

  private def applyMerge(syms: Vector[String], m: Merge): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += (m._1 + m._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Tokenize one word with a learned merge list (applied in learn
    * order, the standard BPE apply rule). */
  private[graft] def tokenize(word: String, merges: Seq[Merge]): Vector[String] =
    merges.foldLeft(word.map(_.toString).toVector :+ "</w>")(applyMerge)

  /** Train 40 merges on the corpus, then report per-document token
    * counts under the learned tokenizer vs raw characters. ORACLE-
    * CHECKED (lifted in r15): the training loop is fully deterministic
    * — integer pair counts, lexicographic tie-break — and the oracle
    * restates all 40 rounds in DuckDB SQL ([[bpeOracle]]): pair counts
    * as a grouped zip of adjacent symbols, the argmax by the same
    * (count DESC, a, b) total order, and the merge application as a
    * per-word RECURSIVE-CTE walk that reproduces the textbook
    * left-to-right greedy scan exactly (a string-replace restatement
    * would diverge on same-symbol runs — the d40 deviation — so the
    * oracle walks token lists instead). Words are restricted to
    * printable ASCII on BOTH sides: within that alphabet Java's
    * UTF-16 ordering and DuckDB's byte collation agree, making the
    * tie-break provably identical. */
  val d24_bpe_tokenize = Q(
    (s, dir) => {
      import s.implicits._
      val wordCounts = T(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        // \A..\z, not ^..$: Java's $ also matches BEFORE a final line
        // terminator, so a word carrying a trailing newline would train
        // the tokenizer while the executor-side Pattern.matches and the
        // oracle's RE2 (both strict) exclude it
        .filter(col("w").rlike("\\A[\\x21-\\x7e]+\\z"))
        .groupBy("w").count()
        .as[(String, Long)].collect().toMap
      val merges = learn(wordCounts, nMerges = 40)
      val bMerges = s.sparkContext.broadcast(merges)
      T(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .as[(Long, Seq[String])]
        .mapPartitions { it =>
          val ms = bMerges.value
          val printable = java.util.regex.Pattern.compile("[\\x21-\\x7e]+")
          it.map { case (id, ws) =>
            val words = ws.filter(w => printable.matcher(w).matches)
            val nBpe = words.map(w => tokenize(w, ms).length).sum
            val nChar = words.map(_.length + 1).sum // +1 = </w>
            (id, nBpe.toLong, nChar.toLong)
          }
        }
        .toDF("doc_id", "n_tokens_bpe", "n_tokens_char")
        .orderBy("doc_id")
    },
    Some(bpeOracle(40)))

  /** The full training + tokenization loop as ONE DuckDB statement:
    * `nMerges` unrolled rounds, each a (pair-count, argmax, per-word
    * recursive token walk) triple over the word-frequency table. The
    * walk IS applyMerge — consume (a,b) when the next two tokens match,
    * else emit one token — so the oracle and the Scala tokenizer agree
    * by construction, including on same-symbol runs. Exhausted corpora
    * (every word fully merged before round n) fall back to a chr(1)
    * no-op pair, mirroring the Scala loop's early stop. CTEs are
    * MATERIALIZED so the plan holds one parquet handle, not one per
    * round. */
  private[graft] def bpeOracle(nMerges: Int): String = {
    val rounds = (1 to nMerges).map { k =>
      val prev = s"s${k - 1}"
      s"""
  p$k AS (SELECT a, b, sum(n) AS c FROM (
           SELECT unnest(t[1:len(t)-1]) AS a, unnest(t[2:len(t)]) AS b, n FROM $prev)
         GROUP BY a, b),
  m$k AS (SELECT
           coalesce((SELECT a FROM p$k ORDER BY c DESC, a, b LIMIT 1), chr(1)) AS a,
           coalesce((SELECT b FROM p$k ORDER BY c DESC, a, b LIMIT 1), chr(1)) AS b),
  r$k(word, done, rest, n) AS (
    SELECT word, []::VARCHAR[], t, n FROM $prev
    UNION ALL
    SELECT r.word,
      CASE WHEN len(r.rest) >= 2 AND r.rest[1] = m.a AND r.rest[2] = m.b
           THEN list_append(r.done, m.a || m.b) ELSE list_append(r.done, r.rest[1]) END,
      CASE WHEN len(r.rest) >= 2 AND r.rest[1] = m.a AND r.rest[2] = m.b
           THEN r.rest[3:] ELSE r.rest[2:] END,
      r.n
    FROM r$k r, m$k m WHERE len(r.rest) > 0),
  s$k AS MATERIALIZED (SELECT word, done AS t, n FROM r$k WHERE len(rest) = 0),"""
    }.mkString
    s"""
WITH RECURSIVE w AS MATERIALIZED (
  SELECT word, count(*) AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE regexp_matches(word, '^[\\x21-\\x7e]+$$')
  GROUP BY word),
s0 AS MATERIALIZED (SELECT word, list_append(regexp_extract_all(word, '.'), '</w>') AS t, n FROM w),
$rounds
tok AS (SELECT word, len(t) AS nt FROM s$nMerges),
d AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
agg AS (SELECT doc_id, sum(tok.nt) AS nb, sum(len(d.word) + 1) AS nch
        FROM d JOIN tok ON d.word = tok.word
        WHERE regexp_matches(d.word, '^[\\x21-\\x7e]+$$')
        GROUP BY doc_id)
SELECT doc.doc_id, CAST(coalesce(agg.nb, 0) AS BIGINT) AS n_tokens_bpe,
       CAST(coalesce(agg.nch, 0) AS BIGINT) AS n_tokens_char
FROM documents doc LEFT JOIN agg ON doc.doc_id = agg.doc_id
ORDER BY doc.doc_id"""
  }

  /** The BPE merge-selection loop as pure relational algebra — the
    * value-checked twin of d24 (whose driver-side loop has no DuckDB
    * oracle). Three rounds unrolled: the corpus collapses to its
    * word-frequency table, each word becomes a space-delimited
    * character string, the weighted adjacent-pair counts pick the
    * most frequent pair (ties lexicographic — d24's rule), and the
    * merge applies by sentinel-delimited string replacement (both
    * engines scan left-to-right non-overlapping, so the semantics are
    * identical by construction; a same-char run needs one extra pass
    * to reach the textbook pairing — documented deviation, natural-
    * language words don't hit it in three rounds). Output is the merge
    * table itself: round, pair, weighted count — the trainable core,
    * hash-compared exactly. Scale: one corpus aggregation, then all
    * work is over the |vocab|-row word table. */
  val d40_bpe_merges = Q(
    (s, dir) => {
      T(s, dir, "documents").createOrReplaceTempView("documents_v40")
      s.sql("""
        WITH w AS (
          SELECT word, count(*) AS n
          FROM (SELECT explode(split(lower(text), ' ')) AS word FROM documents_v40)
          WHERE word RLIKE '^[a-z]+$'
          GROUP BY word),
        s0 AS (SELECT concat(' ', array_join(regexp_extract_all(word, '.', 0), ' '), ' ') AS s, n FROM w),
        p1 AS (SELECT pair, sum(n) AS c FROM (
                 SELECT explode(transform(filter(sequence(1, size(t)), i -> i < size(t)),
                          i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))) AS pair, n
                 FROM (SELECT split(trim(s), ' ') AS t, n FROM s0)) GROUP BY pair),
        m1 AS (SELECT pair, c FROM p1 ORDER BY c DESC, pair LIMIT 1),
        s1 AS (SELECT replace(s, concat(' ', m1.pair, ' '), concat(' ', replace(m1.pair, ' ', ''), ' ')) AS s, n
               FROM s0 CROSS JOIN m1),
        p2 AS (SELECT pair, sum(n) AS c FROM (
                 SELECT explode(transform(filter(sequence(1, size(t)), i -> i < size(t)),
                          i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))) AS pair, n
                 FROM (SELECT split(trim(s), ' ') AS t, n FROM s1)) GROUP BY pair),
        m2 AS (SELECT pair, c FROM p2 ORDER BY c DESC, pair LIMIT 1),
        s2 AS (SELECT replace(s, concat(' ', m2.pair, ' '), concat(' ', replace(m2.pair, ' ', ''), ' ')) AS s, n
               FROM s1 CROSS JOIN m2),
        p3 AS (SELECT pair, sum(n) AS c FROM (
                 SELECT explode(transform(filter(sequence(1, size(t)), i -> i < size(t)),
                          i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))) AS pair, n
                 FROM (SELECT split(trim(s), ' ') AS t, n FROM s2)) GROUP BY pair),
        m3 AS (SELECT pair, c FROM p3 ORDER BY c DESC, pair LIMIT 1)
        SELECT 1 AS merge_no, pair, CAST(c AS BIGINT) AS cnt FROM m1
        UNION ALL SELECT 2, pair, CAST(c AS BIGINT) FROM m2
        UNION ALL SELECT 3, pair, CAST(c AS BIGINT) FROM m3
        ORDER BY merge_no""")
    },
    Some("""
      WITH w AS (
        SELECT word, count(*) AS n
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        WHERE regexp_matches(word, '^[a-z]+$')
        GROUP BY word),
      s0 AS (SELECT ' ' || array_to_string(regexp_extract_all(word, '.'), ' ') || ' ' AS s, n FROM w),
      p1 AS (SELECT pair, sum(n) AS c FROM (
               SELECT unnest([t[i] || ' ' || t[i + 1] for i in range(1, len(t))]) AS pair, n
               FROM (SELECT string_split(trim(s), ' ') AS t, n FROM s0)) GROUP BY pair),
      m1 AS (SELECT pair, c FROM p1 ORDER BY c DESC, pair LIMIT 1),
      s1 AS (SELECT replace(s, ' ' || m1.pair || ' ', ' ' || replace(m1.pair, ' ', '') || ' ') AS s, n
             FROM s0 CROSS JOIN m1),
      p2 AS (SELECT pair, sum(n) AS c FROM (
               SELECT unnest([t[i] || ' ' || t[i + 1] for i in range(1, len(t))]) AS pair, n
               FROM (SELECT string_split(trim(s), ' ') AS t, n FROM s1)) GROUP BY pair),
      m2 AS (SELECT pair, c FROM p2 ORDER BY c DESC, pair LIMIT 1),
      s2 AS (SELECT replace(s, ' ' || m2.pair || ' ', ' ' || replace(m2.pair, ' ', '') || ' ') AS s, n
             FROM s1 CROSS JOIN m2),
      p3 AS (SELECT pair, sum(n) AS c FROM (
               SELECT unnest([t[i] || ' ' || t[i + 1] for i in range(1, len(t))]) AS pair, n
               FROM (SELECT string_split(trim(s), ' ') AS t, n FROM s2)) GROUP BY pair),
      m3 AS (SELECT pair, c FROM p3 ORDER BY c DESC, pair LIMIT 1)
      SELECT 1 AS merge_no, pair, CAST(c AS BIGINT) AS cnt FROM m1
      UNION ALL SELECT 2, pair, CAST(c AS BIGINT) FROM m2
      UNION ALL SELECT 3, pair, CAST(c AS BIGINT) FROM m3
      ORDER BY merge_no"""))

  val all: Map[String, Q] = Map(
    "d24_bpe_tokenize" -> d24_bpe_tokenize,
    "d40_bpe_merges" -> d40_bpe_merges)
}
