package graft.textops

import graft.{Q, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-curation operators — the selection/filtering stages of a
  * large-scale training-data pipeline, beyond the reference's scope
  * (like textops/Dedup): per-domain capping, repetition-based quality
  * filtering (the Gopher-style heuristics of Rae et al. '21 §A1.1),
  * and benchmark decontamination by n-gram overlap.
  *
  * Scale design: d19 is a map-side bounded-heap pre-cap (no shuffle)
  * followed by one shuffle of the ≤ K·P survivors on the domain key —
  * a skewed hot domain costs O(K) per map task, never one straggler
  * window task over the whole domain; d20 is row-local arithmetic plus one
  * bigram-count shuffle keyed by (doc, bigram); d21 broadcasts the
  * benchmark n-gram set (benchmarks are small by definition) so the
  * corpus is scanned exactly once, shuffle-free.
  */
object Curation {

  /** Map-side pre-cap for the per-domain cap: every input partition
    * keeps at most `k` (hash, doc_id)-smallest rows per source via a
    * bounded heap — O(k · sources-per-partition) memory, no shuffle.
    * Order-statistic safety: the global k smallest of a source are each
    * among the k smallest of whichever partition holds them, so the
    * union of per-partition top-ks is a superset of the global top-k
    * and the exact window over it returns identical ranks. A dominant
    * domain thus reaches the window as ≤ k·P rows, not its full row
    * count — the single-straggler-task shape is gone. */
  private[graft] def domainPreCap(
      docs: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select(col("doc_id"), col("source"), md5(col("doc_id").cast(StringType)).as("h"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val heaps = scala.collection.mutable.HashMap
          .empty[String, scala.collection.mutable.PriorityQueue[(String, Long)]]
        it.foreach { case (id, src, h) =>
          val heap = heaps.getOrElseUpdate(src,
            scala.collection.mutable.PriorityQueue.empty[(String, Long)]) // max-heap
          heap.enqueue((h, id))
          if (heap.size > k) heap.dequeue() // evict the largest: keep k smallest
        }
        heaps.iterator.flatMap { case (src, heap) =>
          heap.iterator.map { case (h, id) => (id, src, h) }
        }
      }
      .toDF("doc_id", "source", "h")
  }

  /** Per-domain cap: keep at most K docs per source, chosen by a
    * deterministic hash order (reproducible "random" sample per domain,
    * layout-independent — same device as d16's stratified sampler).
    * Two-level: bounded-heap pre-cap per partition (domainPreCap), then
    * the exact rank window over the ≤ K·P survivors. */
  val d19_domain_cap = Q(
    (s, dir) => {
      val k = 10
      val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
      domainPreCap(T(s, dir, "documents"), k)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k)
        .select(col("doc_id"), col("source"), col("rk"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, source, rk FROM (
        SELECT doc_id, source,
               CAST(row_number() OVER (PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rk
        FROM documents) WHERE rk <= 10 ORDER BY doc_id"""))

  /** Repetition signals per document: duplicate-word fraction and the
    * share of the most frequent bigram — the "repetitious document"
    * quality gate. Ratios are exact (small-int division), so the
    * keep-flag threshold compares identically in both engines. */
  val d20_repetition_filter = Q(
    (s, dir) => {
      val docs = T(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      val base = docs.select(
        col("doc_id"), size(col("w")).as("n_words"),
        (lit(1.0) - size(array_distinct(col("w"))).cast(DoubleType) /
          size(col("w"))).as("dup_frac"))
      val topBigram = docs
        .select(col("doc_id"), size(col("w")).as("n"),
          explode(expr(
            "transform(sequence(1, size(w) - 1), i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
            .as("bg"))
        .groupBy(col("doc_id"), col("n"), col("bg")).count()
        .groupBy(col("doc_id"), col("n")).agg(max(col("count")).as("mx"))
        .select(col("doc_id"),
          (col("mx").cast(DoubleType) / (col("n") - 1)).as("top_bigram_frac"))
      base.join(topBigram, "doc_id")
        .withColumn("keep", col("dup_frac") < 0.8 && col("top_bigram_frac") < 0.2)
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      b AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1]
                                   for i in range(1, len(w))]) AS bg FROM t),
      c AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY 1, 2),
      m AS (SELECT doc_id, max(c) AS mx FROM c GROUP BY 1)
      SELECT t.doc_id, CAST(len(t.w) AS INT) AS n_words,
        1.0 - CAST(len(list_distinct(t.w)) AS DOUBLE) / len(t.w) AS dup_frac,
        CAST(m.mx AS DOUBLE) / (len(t.w) - 1) AS top_bigram_frac,
        (1.0 - CAST(len(list_distinct(t.w)) AS DOUBLE) / len(t.w)) < 0.8
          AND CAST(m.mx AS DOUBLE) / (len(t.w) - 1) < 0.2 AS keep
      FROM t JOIN m ON t.doc_id = m.doc_id ORDER BY t.doc_id"""))

  /** Benchmark decontamination: flag corpus docs whose distinct 8-gram
    * overlap with a benchmark set (here: source 'src0') exceeds 10% —
    * the n-gram-collision test-set leak check. The benchmark n-gram
    * set broadcasts; the corpus is scanned once. */
  val d21_decontaminate = Q(
    (s, dir) => {
      val n = 8
      val grams = T(s, dir, "documents")
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= n)
        .select(col("doc_id"), col("source"),
          explode(expr(
            s"array_distinct(transform(sequence(1, size(w) - ${n - 1}), i -> array_join(slice(w, i, $n), ' ')))"))
            .as("ng"))
      val bench = grams.filter(col("source") === "src0")
        .select(col("ng")).distinct()
      val corpus = grams.filter(col("source") =!= "src0")
      corpus
        .join(broadcast(bench.withColumn("hit", lit(1))), Seq("ng"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("total"), sum(coalesce(col("hit"), lit(0))).as("hits"))
        .select(col("doc_id"), col("total"), col("hits"),
          (col("hits").cast(DoubleType) / col("total")).as("ratio"),
          (col("hits").cast(DoubleType) / col("total") >= 0.1).as("contaminated"))
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w
                 FROM documents),
      g AS (SELECT doc_id, source,
              unnest(list_distinct([array_to_string(w[i:i+7], ' ')
                                    for i in range(1, len(w) - 7 + 1)])) AS ng
            FROM t WHERE len(w) >= 8),
      bench AS (SELECT DISTINCT ng FROM g WHERE source = 'src0'),
      corpus AS (SELECT doc_id, ng FROM g WHERE source <> 'src0')
      SELECT c.doc_id, count(*) AS total, count(b.ng) AS hits,
        CAST(count(b.ng) AS DOUBLE) / count(*) AS ratio,
        CAST(count(b.ng) AS DOUBLE) / count(*) >= 0.1 AS contaminated
      FROM corpus c LEFT JOIN bench b ON c.ng = b.ng
      GROUP BY c.doc_id ORDER BY c.doc_id"""))

  /** Fuzzy string join: part-name pairs within Levenshtein distance 2,
    * without the cross join — lossless length banding (distance ≤ 2
    * implies length diff ≤ 2, so rows replicate into 3 adjacent
    * length-bands and every qualifying pair meets in ≥1 common band),
    * exact verification inside bands only. The DuckDB oracle computes
    * the quadratic ground truth, so the banding is PROVEN lossless on
    * this corpus, not assumed. At 100 TB add a second blocking key
    * (e.g. first-token soundex) to shrink bands further. */
  val d25_fuzzy_join = Q(
    (s, dir) => {
      val names = T(s, dir, "part")
        .select(col("p_partkey"), col("p_name"), length(col("p_name")).as("len"))
      val banded = names.select(col("p_partkey"), col("p_name"),
        explode(array((col("len") / 3).cast("int") - 1,
          (col("len") / 3).cast("int"),
          (col("len") / 3).cast("int") + 1)).as("band"))
      val a = banded.select(col("band"), col("p_partkey").as("key_a"), col("p_name").as("name_a"))
      val b = banded.select(col("band"), col("p_partkey").as("key_b"), col("p_name").as("name_b"))
      a.join(b, Seq("band"))
        .filter(col("key_a") < col("key_b"))
        .filter(col("name_a") =!= col("name_b"))
        .select(col("key_a"), col("key_b"), col("name_a"), col("name_b")).distinct()
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
        .filter(col("dist") <= 2)
        .select(col("key_a"), col("key_b"), col("dist"))
        .orderBy("key_a", "key_b")
    },
    Some("""
      SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
             CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
      FROM part a JOIN part b ON a.p_partkey < b.p_partkey
      WHERE a.p_name <> b.p_name
        AND levenshtein(a.p_name, b.p_name) <= 2
      ORDER BY key_a, key_b"""))

  /** Bigram language-model scoring (the CCNet-style quality signal:
    * docs scored by a corpus LM; low average log-prob = atypical text).
    * MLE bigram model trained in one aggregation; per-doc score is a
    * SUM of integer micro-nats (round(ln·1e6) per model entry, the d08
    * device) so partial aggregation is order-independent and the
    * result engine-exact. The score stays integer end to end — a
    * derived double average would re-introduce the value-canonicalization
    * hazard the micro-nat encoding exists to remove. */
  val d26_lm_score = Q(
    (s, dir) => {
      val bigrams = T(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(w) - 1), i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))"))
          .as("bg"))
        .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
      val model = bigrams.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("c2"))
        .withColumn("c1", sum(col("c2")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))))
        .withColumn("logp_u",
          round(log(col("c2").cast(DoubleType) / col("c1")) * 1e6).cast(LongType))
        .select(col("w1"), col("w2"), col("logp_u"))
      bigrams.join(model, Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("logp_u")).as("score_u"))
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      b AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
            FROM t, unnest(range(1, len(w))) AS u(i)),
      m AS (SELECT w1, w2, count(*) AS c2,
              SUM(count(*)) OVER (PARTITION BY w1) AS c1
            FROM b GROUP BY w1, w2),
      m2 AS (SELECT w1, w2,
               CAST(round(ln(CAST(c2 AS DOUBLE) / c1) * 1e6) AS BIGINT) AS logp_u
             FROM m)
      SELECT b.doc_id, count(*) AS n_bigrams,
             CAST(SUM(logp_u) AS BIGINT) AS score_u
      FROM b JOIN m2 ON b.w1 = m2.w1 AND b.w2 = m2.w2
      GROUP BY b.doc_id ORDER BY b.doc_id"""))

  /** Leakage-free train/validation split: the split decision hashes
    * the near-dup COMPONENT id (d15's connected components), not the
    * document — so near-duplicates land on the same side by
    * construction and the eval set can't be contaminated by training
    * near-copies. Deterministic (md5 threshold, ~80/20), reproducible
    * under any partitioning. */
  val d27_leakage_free_split = Q(
    (s, dir) => {
      val comps = Dedup.d15_neardup_components.build(s, dir)
        .select(col("doc_id"), col("component"))
      comps.withColumn("split",
          when(conv(substring(md5(col("component").cast(StringType)), 1, 8), 16, 10)
            .cast(LongType) % 100 < 80, "train").otherwise("val"))
        .orderBy("doc_id")
    },
    Some("""
      WITH RECURSIVE
      t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      w AS (SELECT doc_id,
              list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                             for i in range(1, greatest(len(w) - 2, 1) + 1)]) AS ws
            FROM t),
      p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM w a JOIN w b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE) /
                (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) >= 0.6),
      e AS (SELECT doc_a AS a, doc_b AS b FROM p
            UNION ALL SELECT doc_b, doc_a FROM p),
      reach(a, b) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
      comp AS (SELECT a AS doc_id, MIN(b) AS component FROM reach GROUP BY a)
      SELECT doc_id, component,
        CASE WHEN CAST('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 80
             THEN 'train' ELSE 'val' END AS split
      FROM comp ORDER BY doc_id"""))

  /** Quality-aware dedup keep-policy: within each near-dup component,
    * keep the HIGHEST-QUALITY member (longest doc; doc_id tie-break),
    * not the arbitrary smallest id — the policy real pipelines use so
    * dedup doesn't systematically keep truncated variants. One window
    * over the (tiny) component relation. */
  val d29_keep_best = Q(
    (s, dir) => {
      val comps = Dedup.d15_neardup_components.build(s, dir)
        .select(col("doc_id"), col("component"))
      val words = T(s, dir, "documents")
        .select(col("doc_id"), size(split(col("text"), " ")).cast(LongType).as("words"))
      val w = Window.partitionBy(col("component"))
        .orderBy(col("words").desc, col("doc_id"))
      comps.join(words, "doc_id")
        .withColumn("keep", row_number().over(w) === 1)
        .select(col("doc_id"), col("component"), col("words"), col("keep"))
        .orderBy("doc_id")
    },
    Some("""
      WITH RECURSIVE
      t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      ws AS (SELECT doc_id,
              list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                             for i in range(1, greatest(len(w) - 2, 1) + 1)]) AS sh
            FROM t),
      p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM ws a JOIN ws b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.6),
      e AS (SELECT doc_a AS a, doc_b AS b FROM p
            UNION ALL SELECT doc_b, doc_a FROM p),
      reach(a, b) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
      comp AS (SELECT a AS doc_id, MIN(b) AS component FROM reach GROUP BY a),
      wc AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS words
             FROM documents)
      SELECT c.doc_id, c.component, wc.words,
        row_number() OVER (PARTITION BY c.component
                           ORDER BY wc.words DESC, c.doc_id) = 1 AS keep
      FROM comp c JOIN wc ON c.doc_id = wc.doc_id
      ORDER BY c.doc_id"""))

  val all: Map[String, Q] = Map(
    "d19_domain_cap" -> d19_domain_cap,
    "d20_repetition_filter" -> d20_repetition_filter,
    "d21_decontaminate" -> d21_decontaminate,
    "d25_fuzzy_join" -> d25_fuzzy_join,
    "d26_lm_score" -> d26_lm_score,
    "d27_leakage_free_split" -> d27_leakage_free_split,
    "d29_keep_best" -> d29_keep_best)
}
