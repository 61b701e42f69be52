package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PQ-ANN quality gates: recall@3 against the exact top-3 and the
  * compression arithmetic that motivates the operator.
  */
class PqAnnSpec extends SparkSpec {

  test("d23 PQ recall@3 beats chance by orders of magnitude") {
    val got = run("d23_pq_ann").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val emb = T(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q"))
    val exact = q.crossJoin(emb.select(col("vec_id"), col("embedding")))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("d2",
        graft.functions.GraftFunctions.squared_distance(col("q"), col("embedding")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))
    val truth = exact.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3).select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (got & truth).size.toDouble / truth.size
    // random top-3 over 499 candidates would land ~0.006; PQ on this
    // corpus should recover a large share of the exact neighbors
    assert(recall >= 0.80, s"recall@3 too low: $recall")
  }

  test("PQ code is 32x smaller than the raw float32 vector") {
    // 64 dims * 4 bytes = 256 bytes raw; 8 subspace codes of 16 ids
    // need 4 bits each = 4 bytes (byte-aligned: 8)
    val raw = 64 * 4
    val code = 8 // one byte per code, the materialized layout
    assert(raw / code == 32)
  }
}
