package graft.textops

import graft.{Q, T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization ANN (Jégou et al. '11): embeddings compress to
  * M sub-space code bytes (here 64 dims → 8 one-byte codes, 32×
  * smaller than float32); queries shortlist the corpus by asymmetric
  * distance to the reconstructed codewords, then exact-rerank only the
  * shortlist — the canonical PQ serving pipeline. The memory-side scale path that
  * complements IVF's compute-side path (d12): at 100 TB the code table
  * fits where raw vectors cannot, codebooks broadcast (M·ks·subDim
  * doubles), and encode/rank are shuffle-free typed passes over the
  * corpus. Training reuses the IVF Lloyd's-as-aggregation machinery on
  * dimension slices — deterministic (fixed seeds, fixed iterations).
  */
object PqAnn {

  private val M = 8 // subspaces
  private val subDim = 8 // dims per subspace (64 total)
  private val ks = 32 // codewords per subspace

  /** codebooks(m)(c) = centroid c of subspace m. */
  private[textops] def trainCodebooks(emb: DataFrame): Array[Array[Array[Double]]] =
    (0 until M).map { m =>
      val sliced = emb.select(col("vec_id"),
        slice(col("embedding"), m * subDim + 1, subDim).as("embedding"))
      IvfAnn.trainCentroids(sliced, ks, iters = 3)
    }.toArray

  private def argminCode(books: Array[Array[Array[Double]]], m: Int,
      v: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < ks) {
      var d = 0.0
      var i = 0
      while (i < subDim) {
        val t = v(i) - books(m)(c)(i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** PQ top-3 for the first 20 query vectors by asymmetric distance
    * (rows-only: approximate op; recall + compression are spec-gated
    * in PqAnnSpec). */
  val d23_pq_ann = Q(
    (s, dir) => {
      import s.implicits._
      val emb = T(s, dir, "embeddings")
      val books = trainCodebooks(emb)
      val bBooks = s.sparkContext.broadcast(books)

      // encode: one shuffle-free typed pass → (vec_id, code[M])
      val codes = emb.select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])]
        .mapPartitions { it =>
          val bk = bBooks.value
          it.map { case (id, e) =>
            val v = e.toArray.map(_.toDouble)
            val code = new Array[Int](M)
            var m = 0
            while (m < M) {
              code(m) = argminCode(bk, m, java.util.Arrays.copyOfRange(v, m * subDim, (m + 1) * subDim))
              m += 1
            }
            (id, code.toSeq)
          }
        }.toDF("vec_id", "code")

      // queries: the first 20 raw vectors, broadcast; ADC = distance to
      // the code's reconstruction, computed per (corpus row × query)
      val queries = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q"))
        .as[(Long, Seq[Float])].collect()
      val bQ = s.sparkContext.broadcast(queries.map { case (id, q) =>
        (id, q.toArray.map(_.toDouble))
      })

      val ranked = codes.as[(Long, Seq[Int])]
        .mapPartitions { it =>
          val bk = bBooks.value
          val qs = bQ.value
          it.flatMap { case (id, code) =>
            qs.iterator.map { case (qid, q) =>
              var d = 0.0
              var m = 0
              while (m < M) {
                val cw = bk(m)(code(m))
                var i = 0
                while (i < subDim) {
                  val t = q(m * subDim + i) - cw(i)
                  d += t * t
                  i += 1
                }
                m += 1
              }
              (qid, id, d)
            }
          }
        }.toDF("q_id", "vec_id", "adc")
        .filter(col("q_id") =!= col("vec_id"))

      // canonical PQ serving shape: the code table SHORTLISTS (top-50
      // by ADC — the only full-corpus pass, touching 8-byte codes, not
      // 256-byte vectors); raw embeddings are fetched for the shortlist
      // alone and exact distance re-ranks the final top-3.
      val wAdc = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))
      val shortlist = ranked.withColumn("srk", row_number().over(wAdc))
        .filter(col("srk") <= 50)
        .select(col("q_id"), col("vec_id"))
      val qdf = broadcast(s.createDataFrame(queries.map { case (id, v) =>
        (id, v.map(_.toDouble))
      }.toIndexedSeq).toDF("q_id", "q_vec"))
      val exact = shortlist
        .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
        .join(qdf, "q_id")
        .withColumn("d2",
          graft.functions.GraftFunctions.squared_distance(col("q_vec"), col("embedding")))
      val wFin = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))
      exact.withColumn("rk", row_number().over(wFin))
        .filter(col("rk") <= 3)
        .select(col("q_id"), col("vec_id"), col("rk"))
        .orderBy("q_id", "rk")
    },
    None)

  val all: Map[String, Q] = Map("d23_pq_ann" -> d23_pq_ann)
}
