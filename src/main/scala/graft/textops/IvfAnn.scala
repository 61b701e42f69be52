package graft.textops

import graft.{Q, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer partitions the corpus into cells; queries probe only the
  * nearest cells and exact-rerank inside them. This is the standard
  * billion-vector architecture (IVF-Flat): at 100 TB the corpus is
  * bucketed once (one shuffle keyed by cell), the centroid table is a
  * broadcast, and each query touches |corpus| · nProbe/k vectors.
  *
  * Training is Lloyd's algorithm as distributed aggregation: assignment
  * is a broadcast-join argmin, the update a groupBy mean; only the k×dim
  * centroid matrix ever reaches the driver. Deterministic: seeds from
  * fixed vec_ids, fixed iteration count, no RNG.
  */
object IvfAnn {

  // native codegen squared distance (functions/VectorExprs.scala) —
  // bit-identical to the former aggregate(zip_with(...)) lambda
  private def dist2(a: String, b: String) =
    graft.functions.GraftFunctions.squared_distance(col(a), col(b))

  /** Nearest-centroid assignment as an AGGREGATE, not a window:
    * min_by over the (d2, cid) struct gets map-side partial aggregation
    * — each partition reduces its corpus×k candidate rows locally before
    * ONE shuffle of |corpus| argmin rows — where the former
    * row_number() over (partition by vec_id order by d2, cid) sorted
    * the full candidate set. Tie order is identical: struct comparison
    * is lexicographic, so equal distances break to the lower cid. */
  private[graft] def assignCells(emb: DataFrame, cdf: DataFrame): DataFrame =
    emb.crossJoin(cdf)
      .withColumn("d2", dist2("embedding", "centroid"))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("cid"), col("embedding")),
        struct(col("d2"), col("cid"))).as("__m"))
      .select(col("vec_id"), col("__m.cid").as("cid"),
        col("__m.embedding").as("embedding"))

  /** Train k centroids (returns driver-side matrix; k·dim doubles).
    * The Lloyd's loop is DRIVER-COORDINATED by design: each iteration
    * moves only k seed rows + k per-cell sums (k·dim doubles) through
    * the driver — bounded at any corpus size — and `iters` is a small
    * constant (quantizer training converges in single digits; the
    * corpus pass per iteration is the distributed cost). Serializing a
    * handful of iterations on the driver is the classic IVF recipe,
    * not a scale risk. */
  private[textops] def trainCentroids(
      emb: DataFrame, k: Int, iters: Int): Array[Array[Double]] = {
    val spark = emb.sparkSession
    // deterministic seeding: the k lowest vec_ids
    var centroids: Array[Array[Double]] = emb
      .orderBy("vec_id").limit(k)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    (1 to iters).foreach { _ =>
      val cdf = broadcast(spark.createDataFrame(
        centroids.toIndexedSeq.zipWithIndex.map { case (c, i) => (i, c.toSeq) })
        .toDF("cid", "centroid"))
      val assigned = assignCells(emb, cdf)
      val sums = assigned.groupBy(col("cid"))
        .agg(count(lit(1)).as("n"),
          array((0 until centroids(0).length).map(i =>
            sum(element_at(col("embedding"), i + 1).cast(DoubleType))): _*).as("sums"))
        .collect()
      sums.foreach { r =>
        val cid = r.getInt(0)
        val n = r.getLong(1).toDouble
        centroids(cid) = r.getSeq[Double](2).map(_ / n).toArray
      }
    }
    centroids
  }

  /** IVF top-3 for the first 20 query vectors; probes 4 of 16 cells. */
  val d12_knn_ivf = Q(
    (s, dir) => {
      val k = 16
      val nProbe = 4
      val emb = T(s, dir, "embeddings")
      val centroids = trainCentroids(emb, k, iters = 3)
      val cdf = broadcast(s.createDataFrame(
        centroids.toIndexedSeq.zipWithIndex.map { case (c, i) => (i, c.toSeq) })
        .toDF("cid", "centroid"))

      // index: every vector assigned to its nearest cell — a min_by
      // aggregate (map-side partials, no window sort over corpus×k rows)
      val indexed = assignCells(emb, cdf)
        .select(col("cid"), col("vec_id"), col("embedding"))

      // queries probe their nProbe nearest cells: a top-N per query, so
      // this one stays a window — over the QUERY set only (broadcast-
      // small by construction), never the corpus
      val wProbe = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cid"))
      val probes = emb.filter(col("vec_id") < 20).crossJoin(cdf)
        .withColumn("d2", dist2("embedding", "centroid"))
        .withColumn("rn", row_number().over(wProbe)).filter(col("rn") <= nProbe)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"), col("cid"))

      // search only the probed cells, exact cosine rerank (native
      // codegen dot product — see functions/VectorExprs.scala)
      val dot = graft.functions.GraftFunctions.dot_product(col("q_vec"), col("n_vec"))
      def nrm(c: String) =
        sqrt(graft.functions.GraftFunctions.dot_product(col(c), col(c)))
      val wRank = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
      broadcast(probes)
        .join(indexed.select(col("cid"), col("vec_id").as("n_id"), col("embedding").as("n_vec")), Seq("cid"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("sim", dot / (nrm("q_vec") * nrm("n_vec")))
        .withColumn("rk", row_number().over(wRank))
        .filter(col("rk") <= 3)
        .select(col("q_id"), col("n_id"), col("rk"), round(col("sim"), 6).as("sim"))
        .orderBy("q_id", "rk")
    },
    None)

  /** Lloyd's k-means as pure relational algebra on a quantized grid —
    * the value-checked twin of the IVF/PQ training core (d12/d23 stay
    * recall-gated because their float centroid means are
    * order-dependent under shuffle). Here every step is exact integer
    * arithmetic, so the DuckDB oracle restates the whole algorithm and
    * the clustering hash-matches bit-exactly:
    * coordinates quantize to round(x·1e6) BIGINTs; seeds are the 8
    * lowest md5(vec_id) rows; assignment is argmin of the exact integer
    * squared distance (ties to the lower cluster id); the centroid
    * update floors the per-dimension integer mean. Two unrolled
    * iterations. Scale: the (vec × dim) relation shuffles once per
    * iteration on the cluster key; k·dim centroid rows broadcast —
    * the same cost profile as d12's production trainer. */
  val d38_kmeans_relational = Q(
    (s, dir) => {
      T.registerViews(s, dir)
      s.sql("""
        WITH q AS (
          SELECT vec_id, pos, CAST(ROUND(CAST(el AS DOUBLE) * 1000000e0) AS BIGINT) AS qv
          FROM embeddings LATERAL VIEW posexplode(embedding) t AS pos, el),
        seeds AS (
          SELECT vec_id, rn - 1 AS cl FROM (
            SELECT vec_id, ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS STRING)), vec_id) AS rn
            FROM embeddings) x WHERE rn <= 8),
        c0 AS (
          SELECT s.cl, q.pos, q.qv AS cv FROM seeds s JOIN q ON q.vec_id = s.vec_id),
        a1 AS (
          SELECT vec_id, cl FROM (
            SELECT q.vec_id, c.cl,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                     ORDER BY SUM((q.qv - c.cv) * (q.qv - c.cv)), c.cl) AS rk
            FROM q JOIN c0 c ON q.pos = c.pos
            GROUP BY q.vec_id, c.cl) y WHERE rk = 1),
        c1 AS (
          SELECT a1.cl, q.pos,
                 CAST(FLOOR(CAST(SUM(q.qv) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
          FROM a1 JOIN q ON q.vec_id = a1.vec_id GROUP BY a1.cl, q.pos),
        a2 AS (
          SELECT vec_id, cl FROM (
            SELECT q.vec_id, c.cl,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                     ORDER BY SUM((q.qv - c.cv) * (q.qv - c.cv)), c.cl) AS rk
            FROM q JOIN c1 c ON q.pos = c.pos
            GROUP BY q.vec_id, c.cl) y WHERE rk = 1),
        c2 AS (
          SELECT a2.cl, q.pos,
                 CAST(FLOOR(CAST(SUM(q.qv) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
          FROM a2 JOIN q ON q.vec_id = a2.vec_id GROUP BY a2.cl, q.pos),
        agg AS (
          SELECT cl, COUNT(*) AS n_members, CAST(SUM(vec_id) AS BIGINT) AS id_sum
          FROM a2 GROUP BY cl),
        cs AS (
          SELECT cl, CAST(SUM(ABS(cv)) AS BIGINT) AS centroid_l1 FROM c2 GROUP BY cl)
        SELECT agg.cl, agg.n_members, agg.id_sum, cs.centroid_l1
        FROM agg JOIN cs ON agg.cl = cs.cl
        ORDER BY agg.cl""")
    },
    Some("""
      WITH q AS (
        SELECT vec_id, i - 1 AS pos, CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000e0) AS BIGINT) AS qv
        FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) t),
      seeds AS (
        SELECT vec_id, rn - 1 AS cl FROM (
          SELECT vec_id, ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
          FROM embeddings) x WHERE rn <= 8),
      c0 AS (
        SELECT s.cl, q.pos, q.qv AS cv FROM seeds s JOIN q ON q.vec_id = s.vec_id),
      a1 AS (
        SELECT vec_id, cl FROM (
          SELECT q.vec_id, c.cl,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY SUM((q.qv - c.cv) * (q.qv - c.cv)), c.cl) AS rk
          FROM q JOIN c0 c ON q.pos = c.pos
          GROUP BY q.vec_id, c.cl) y WHERE rk = 1),
      c1 AS (
        SELECT a1.cl, q.pos,
               CAST(FLOOR(CAST(SUM(q.qv) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
        FROM a1 JOIN q ON q.vec_id = a1.vec_id GROUP BY a1.cl, q.pos),
      a2 AS (
        SELECT vec_id, cl FROM (
          SELECT q.vec_id, c.cl,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY SUM((q.qv - c.cv) * (q.qv - c.cv)), c.cl) AS rk
          FROM q JOIN c1 c ON q.pos = c.pos
          GROUP BY q.vec_id, c.cl) y WHERE rk = 1),
      c2 AS (
        SELECT a2.cl, q.pos,
               CAST(FLOOR(CAST(SUM(q.qv) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
        FROM a2 JOIN q ON q.vec_id = a2.vec_id GROUP BY a2.cl, q.pos),
      agg AS (
        SELECT cl, COUNT(*) AS n_members, CAST(SUM(vec_id) AS BIGINT) AS id_sum
        FROM a2 GROUP BY cl),
      cs AS (
        SELECT cl, CAST(SUM(ABS(cv)) AS BIGINT) AS centroid_l1 FROM c2 GROUP BY cl)
      SELECT agg.cl, agg.n_members, agg.id_sum, cs.centroid_l1
      FROM agg JOIN cs ON agg.cl = cs.cl
      ORDER BY agg.cl"""))

  val all: Map[String, Q] = Map(
    "d12_knn_ivf" -> d12_knn_ivf,
    "d38_kmeans_relational" -> d38_kmeans_relational)
}
