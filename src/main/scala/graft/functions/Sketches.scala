package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

import scala.util.hashing.MurmurHash3

/** Mergeable distributed sketches beyond Misra–Gries (Aggregators.scala)
  * and HLL (Spark-native hll_sketch_agg, q66):
  *
  *  - COUNT-MIN — frequency estimation in fixed memory (Cormode &
  *    Muthukrishnan '05). D×W counter grid, one counter bump per row per
  *    row-hash; estimate = min over rows. MERGEABLE: the union sketch is
  *    the element-wise sum, so 1000-way partial aggregation produces the
  *    exact single-pass sketch (the property the reference's profiler
  *    relies on for HLL, profile/ProfilerImpl.java:34 — extended here to
  *    frequencies). Guarantees: estimate ≥ true count always;
  *    estimate ≤ true + εN with ε = e/W at high probability.
  *
  *  - BOTTOM-K — deterministic uniform sample per group: keep the K rows
  *    with the smallest (hash, id) pair. MERGEABLE (union then re-trim)
  *    and layout-independent — the same K rows come out under any
  *    partitioning, so the "sample" is reproducible AND expressible in
  *    plain SQL (row_number over hash order), which is what lets d33
  *    hash-match a DuckDB oracle — a property no RNG reservoir has.
  */
object Sketches {

  val CmsDepth = 4
  val CmsWidth = 256

  /** Count-Min sketch over strings; result = flat D×W counter array. */
  class CountMin extends Aggregator[String, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](CmsDepth * CmsWidth)
    override def reduce(b: Array[Long], a: String): Array[Long] = {
      if (a != null) {
        var d = 0
        while (d < CmsDepth) {
          b(d * CmsWidth + slot(a, d)) += 1L
          d += 1
        }
      }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  private def slot(item: String, row: Int): Int = {
    val h = MurmurHash3.stringHash(item, 0x9747b28c + row)
    ((h % CmsWidth) + CmsWidth) % CmsWidth
  }

  /** Point estimate from a finished Count-Min sketch. */
  def cmsEstimate(sketch: Array[Long], item: String): Long = {
    var est = Long.MaxValue
    var d = 0
    while (d < CmsDepth) {
      est = math.min(est, sketch(d * CmsWidth + slot(item, d)))
      d += 1
    }
    est
  }

  /** Bottom-K by (sortKey, id): finish returns the K ids in key order. */
  class BottomK(k: Int) extends Aggregator[(String, Long), Seq[(String, Long)], Seq[Long]] {
    override def zero: Seq[(String, Long)] = Vector.empty
    override def reduce(b: Seq[(String, Long)], a: (String, Long)): Seq[(String, Long)] =
      trim(b :+ a)
    override def merge(x: Seq[(String, Long)], y: Seq[(String, Long)]): Seq[(String, Long)] =
      trim(x ++ y)
    override def finish(r: Seq[(String, Long)]): Seq[Long] = r.map(_._2)
    private def trim(s: Seq[(String, Long)]): Seq[(String, Long)] =
      s.sorted.take(k)
    override def bufferEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
