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
    * counts under the learned tokenizer vs raw characters (rows-only:
    * the iterative training has no SQL oracle; BpeSpec pins the
    * algebraic properties). */
  val d24_bpe_tokenize = Q(
    (s, dir) => {
      import s.implicits._
      val wordCounts = T(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("w").count()
        .as[(String, Long)].collect().toMap
      val merges = learn(wordCounts, nMerges = 40)
      val bMerges = s.sparkContext.broadcast(merges)
      T(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .as[(Long, Seq[String])]
        .mapPartitions { it =>
          val ms = bMerges.value
          it.map { case (id, ws) =>
            val words = ws.filter(_.nonEmpty)
            val nBpe = words.map(w => tokenize(w, ms).length).sum
            val nChar = words.map(_.length + 1).sum // +1 = </w>
            (id, nBpe.toLong, nChar.toLong)
          }
        }
        .toDF("doc_id", "n_tokens_bpe", "n_tokens_char")
        .orderBy("doc_id")
    },
    None)

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
