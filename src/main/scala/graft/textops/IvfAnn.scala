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

  /** Train k centroids (returns driver-side matrix; k·dim doubles). */
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
      val w = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cid"))
      val assigned = emb.crossJoin(cdf)
        .withColumn("d2", dist2("embedding", "centroid"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
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

      // index: every vector assigned to its nearest cell (one shuffle)
      val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cid"))
      val indexed = emb.crossJoin(cdf)
        .withColumn("d2", dist2("embedding", "centroid"))
        .withColumn("rn", row_number().over(wAssign)).filter(col("rn") === 1)
        .select(col("cid"), col("vec_id"), col("embedding"))

      // queries probe their nProbe nearest cells
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

  val all: Map[String, Q] = Map("d12_knn_ivf" -> d12_knn_ivf)
}
