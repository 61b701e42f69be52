package graft.textops

import graft.{Q, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (Array[Float]): brute-force
  * cosine top-k as the exact baseline, and a random-hyperplane LSH
  * bucketed variant as the scale path. Dot products run through
  * `aggregate(zip_with(...))` — codegen'd higher-order functions, no
  * UDFs (ref for the higher-order surface: rex/RexLambda.java:1).
  */
object Similarity {

  /** Sequential in-order double dot product — matches DuckDB's
    * list_cosine_similarity over DOUBLE[] bit-for-bit. Native codegen
    * expression (functions/VectorExprs.scala): a primitive loop inside
    * whole-stage codegen instead of the interpreted
    * aggregate(zip_with(...)) higher-order path. */
  private def dot(a: String, b: String) =
    graft.functions.GraftFunctions.dot_product(col(a), col(b))

  private def withNorm(df: DataFrame, vecCol: String, out: String): DataFrame =
    df.withColumn(out,
      sqrt(graft.functions.GraftFunctions.dot_product(col(vecCol), col(vecCol))))

  /** Brute-force cosine top-3 neighbors for the first 20 query vectors.
    * Exact baseline: queries × corpus via broadcast of the (tiny) query
    * side, per-query top-k window. At scale: broadcast Q, scan corpus
    * once, rank per query — one shuffle of |Q|×k candidates. */
  val d09_knn_bruteforce = Q(
    (s, dir) => {
      val emb = withNorm(T(s, dir, "embeddings"), "embedding", "nrm")
      val q = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"), col("nrm").as("q_nrm"))
      val cand = emb.select(col("vec_id").as("n_id"), col("embedding").as("n_vec"), col("nrm").as("n_nrm"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
      broadcast(q).join(cand, col("q_id") =!= col("n_id"))
        .withColumn("sim", dot("q_vec", "n_vec") / (col("q_nrm") * col("n_nrm")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("q_id"), col("n_id"), col("rk"), col("sim"))
        .orderBy("q_id", "rk")
    },
    Some("""
      SELECT q_id, n_id, rk, sim FROM (
        SELECT a.vec_id AS q_id, b.vec_id AS n_id,
          list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS sim,
          ROW_NUMBER() OVER (PARTITION BY a.vec_id
            ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) DESC,
                     b.vec_id) AS rk
        FROM embeddings a JOIN embeddings b ON a.vec_id < 20 AND b.vec_id <> a.vec_id) t
      WHERE rk <= 3
      ORDER BY q_id, rk"""))

  /** ANN via multi-table random-hyperplane LSH (Charikar '02): 8 hash
    * tables × 4 deterministic hyperplanes → per-table 4-bit signature;
    * candidates = union over tables of same-bucket vectors, then exact
    * cosine re-rank of the candidate set. Scale path: the bucket join
    * replaces the full cross product — per-table bucket population sets
    * the candidate budget, tables set the recall. Hyperplane weights
    * derive from a seeded integer hash (pure, replayable — no RNG
    * object). Note: the synthetic embeddings are i.i.d. gaussian, so
    * near-neighbors are barely above the bulk and LSH recall is
    * intrinsically weak here; the spec therefore ALSO runs this core on
    * planted clustered fixtures where recall is assertable (≥0.6 gate in
    * TextOpsSpec) while the corpus run reports recall informationally. */
  private[graft] def lshKnn(
      raw: DataFrame, dim: Int, nTables: Int = 8, bitsPerTable: Int = 4,
      k: Int = 3, queryMax: Long = 20): DataFrame = {
    // weights derive from md5("t:b:d") — the SAME derivation the DuckDB
    // oracle states in SQL, so the buckets (and hence the whole ANN
    // output) are value-checkable cross-engine
    def weight(t: Int, b: Int, d: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$t:$b:$d".getBytes("UTF-8")).take(4)
        .map(x => f"${x & 0xff}%02x").mkString
      ((java.lang.Long.parseLong(hex, 16) % 2000) - 1000) / 1000.0
    }
    // per-table signature: `bitsPerTable` sign bits of hyperplane projections
    def sigExpr(vecCol: String, t: Int) = {
      (0 until bitsPerTable).map { b =>
        val arr = (0 until dim).map(weight(t, b, _))
          .mkString("CAST(array(", ", ", ") AS ARRAY<DOUBLE>)")
        when(graft.functions.GraftFunctions.dot_product(col(vecCol), expr(arr)) > 0,
          lit(1 << b)).otherwise(lit(0))
      }.reduce(_ + _)
    }
    val emb = withNorm(raw, "embedding", "nrm")
    val tabled = emb.select(
      col("vec_id"), col("embedding"), col("nrm"),
      posexplode(array((0 until nTables).map(t => sigExpr("embedding", t)): _*))
        .as(Seq("table_id", "bucket")))
    val q = tabled.filter(col("vec_id") < queryMax)
      .select(col("vec_id").as("q_id"), col("table_id"), col("bucket"))
    val cand = tabled.select(col("vec_id").as("n_id"), col("table_id"), col("bucket"))
    val pairs = q.join(cand, Seq("table_id", "bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id")).distinct()
    // exact re-rank of the candidate union
    val qv = emb.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"), col("nrm").as("q_nrm"))
    val nv = emb.select(col("vec_id").as("n_id"), col("embedding").as("n_vec"), col("nrm").as("n_nrm"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    pairs.join(broadcast(qv), Seq("q_id")).join(nv, Seq("n_id"))
      .withColumn("sim", dot("q_vec", "n_vec") / (col("q_nrm") * col("n_nrm")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("rk"), col("sim"))
      .orderBy("q_id", "rk")
  }

  val d10_knn_lsh = Q(
    (s, dir) => lshKnn(T(s, dir, "embeddings"), dim = 64),
    Some("""
      WITH w AS (
        SELECT t, b,
               list(((CAST('0x' || substr(md5(t || ':' || b || ':' || d), 1, 8) AS BIGINT) % 2000) - 1000) / 1000.0
                    ORDER BY d) AS wl
        FROM range(0, 8) tt(t), range(0, 4) bb(b), range(0, 64) dd(d)
        GROUP BY t, b),
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      sig AS (
        SELECT e.vec_id, w.t,
               SUM(CASE WHEN list_dot_product(e.v, w.wl) > 0 THEN 1 << b ELSE 0 END) AS bucket
        FROM e, w GROUP BY e.vec_id, w.t),
      pairs AS (
        SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS n_id
        FROM sig q JOIN sig c ON q.t = c.t AND q.bucket = c.bucket
        WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
      ranked AS (
        SELECT p.q_id, p.n_id,
               list_cosine_similarity(a.v, b.v) AS sim,
               ROW_NUMBER() OVER (PARTITION BY p.q_id
                 ORDER BY list_cosine_similarity(a.v, b.v) DESC, p.n_id) AS rk
        FROM pairs p JOIN e a ON a.vec_id = p.q_id JOIN e b ON b.vec_id = p.n_id)
      SELECT q_id, n_id, rk, sim FROM ranked WHERE rk <= 3 ORDER BY q_id, rk"""))

  /** Embedding-cosine near-duplicate removal: a vector is kept iff no
    * LOWER-id vector is within cosine ≥ 0.4 (the keep-first canonical
    * rule).
    *
    * The semantics are EXACT all-pairs (a threshold this close to the
    * gaussian bulk carries no locality an index can exploit — LSH
    * candidates cap recall below 1, see d10), so the scale hazard is
    * MEMORY, not the inherent pair count. Block-pair decomposition:
    * vectors hash into B blocks; every unordered block pair (i ≤ j)
    * becomes one equi-join key, so a task materializes only two blocks
    * (~n/B vectors each) — bounded memory at any corpus size, B(B+1)/2
    * tasks of even work, a plain shuffled hash/sort-merge join (AQE-
    * splittable), and no broadcast of anything but the B²-row pair
    * table. The previous form (broadcast the whole corpus into a
    * BroadcastNestedLoopJoin) OOMs at ~10M vectors; this one just adds
    * tasks. For sublinear pair work accept approximation and use d10's
    * LSH candidates — kept separate because it cannot be value-exact. */
  val d14_embedding_neardup = Q(
    (s, dir) => {
      import s.implicits._
      // B is derived from corpus size, not a constant: a task holds two
      // blocks of ~targetRows vectors (128-dim float ≈ 0.5 KB/row → ~2×50 MB
      // per task), so B grows with the corpus and task memory stays bounded.
      // Floor 4 keeps the block-pair plan shape at tiny SFs (plan gate);
      // cap 256 bounds the pair-table at B(B+1)/2 = 32,896 tasks. Counting
      // the raw scan is parquet-footer-only — no column data is read.
      val targetRows = 100000L
      val n = T(s, dir, "embeddings").count()
      val nBlocks = math.min(256L, math.max(4L, (n + targetRows - 1) / targetRows)).toInt
      val emb = withNorm(T(s, dir, "embeddings"), "embedding", "nrm")
      val blocked = emb.select(col("vec_id"), col("embedding"), col("nrm"),
        pmod(col("vec_id"), lit(nBlocks)).cast(IntegerType).as("blk"))
      val blockPairs = (for { i <- 0 until nBlocks; j <- i until nBlocks }
        yield (i * nBlocks + j, i, j)).toDF("bp", "blk_a", "blk_b")
      val aSide = blocked.join(broadcast(blockPairs), col("blk") === col("blk_a"))
        .select(col("bp"), col("vec_id").as("a_id"),
          col("embedding").as("a_vec"), col("nrm").as("a_nrm"))
      val bSide = blocked.join(broadcast(blockPairs), col("blk") === col("blk_b"))
        .select(col("bp"), col("vec_id").as("b_id"),
          col("embedding").as("b_vec"), col("nrm").as("b_nrm"))
      val dups = aSide.join(bSide, Seq("bp"))
        .filter(col("a_id") =!= col("b_id"))
        .filter(dot("a_vec", "b_vec") / (col("a_nrm") * col("b_nrm")) >= 0.4)
        .select(greatest(col("a_id"), col("b_id")).as("vec_id")).distinct()
      emb.join(dups, Seq("vec_id"), "left_anti")
        .select(col("vec_id"))
        .orderBy("vec_id")
    },
    Some("""
      SELECT vec_id FROM embeddings a
      WHERE NOT EXISTS (
        SELECT 1 FROM embeddings b WHERE b.vec_id < a.vec_id
          AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.4)
      ORDER BY vec_id"""))

  val all: Map[String, Q] = Map(
    "d09_knn_bruteforce" -> d09_knn_bruteforce,
    "d10_knn_lsh" -> d10_knn_lsh,
    "d14_embedding_neardup" -> d14_embedding_neardup)
}
