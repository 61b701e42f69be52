package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert space-filling curve + write-side clustering (ref:
  * runtime/HilbertCurve2D.java, rel/rules/SpatialRules.java — the
  * reference turns ST_DWithin into Hilbert index ranges over a
  * curve-indexed column; util in SpatialTypeUtils.java).
  *
  * Spark-first: instead of rewriting predicates into index ranges, we
  * exploit the engine's native min/max data skipping — rows sorted in
  * Hilbert order give every parquet row group a TIGHT bounding box in
  * (x, y), so an ordinary range predicate on the coordinate columns
  * prunes row groups/pages by itself (`PushedFilters` does the work;
  * no query-side rewrite needed). That is the idiomatic-Spark
  * equivalent of the reference's Hilbert range scan, and it holds at
  * 100 TB: clustering is one range-shuffle at write time, and every
  * later spatial query prunes I/O proportionally to its window area.
  *
  * The curve itself is the standard iterative rotate-and-fold (public
  * algorithm; same contract as HilbertCurve2D: bijective on
  * [0,2^order)² with unit steps between consecutive indexes).
  */
object Hilbert {

  /** (x, y) → distance along the order-n Hilbert curve. */
  def xy2d(order: Int, xIn: Long, yIn: Long): Long = {
    val n = 1L << order
    require(xIn >= 0 && xIn < n && yIn >= 0 && yIn < n,
      s"coordinates out of range for order $order: ($xIn,$yIn)")
    var (x, y) = (xIn, yIn)
    var rx = 0L
    var ry = 0L
    var d = 0L
    var s = n / 2
    while (s > 0) {
      rx = if ((x & s) > 0) 1 else 0
      ry = if ((y & s) > 0) 1 else 0
      d += s * s * ((3 * rx) ^ ry)
      // rotate quadrant
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  /** distance → (x, y); inverse of xy2d. */
  def d2xy(order: Int, dIn: Long): (Long, Long) = {
    val n = 1L << order
    var (x, y) = (0L, 0L)
    var t = dIn
    var s = 1L
    while (s < n) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }

  /** Column form (used at write time only — not a query-path UDF). */
  def hilbertCol(x: Column, y: Column, order: Int): Column = {
    val f = udf((xx: Long, yy: Long) => xy2d(order, xx, yy))
    f(x, y)
  }

  /** Cluster a DataFrame in Hilbert order over two integer coordinate
    * columns: one range shuffle + in-partition sort on the curve index,
    * index dropped from the output. Row groups of the written files end
    * up with tight (x, y) min/max bounds → native data skipping serves
    * spatial window queries. */
  def clusterByHilbert(df: DataFrame, xCol: String, yCol: String,
      order: Int, partitions: Int): DataFrame = {
    val h = "__hilbert_d"
    df.withColumn(h, hilbertCol(col(xCol), col(yCol), order))
      .repartitionByRange(partitions, col(h))
      .sortWithinPartitions(h)
      .drop(h)
  }
}
