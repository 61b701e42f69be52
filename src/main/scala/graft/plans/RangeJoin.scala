package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Banded range join — the scale path for non-equi point-in-interval
  * joins (ref: the reference plans these as theta nested-loop joins,
  * `EnumerableNestedLoopJoin.java` / `EnumerableDefaults.java:2539`;
  * Spark's own fallback is BroadcastNestedLoopJoin, which is O(|P|·|I|)
  * work and breaks down when the interval side no longer broadcasts).
  *
  * Spark-first design: discretize the axis into bins of width `binWidth`.
  * A point falls in exactly one bin; an interval is replicated into each
  * bin it overlaps. The join becomes a plain hash EQUI-join on the bin id
  * plus a residual `lo <= x < hi` filter — shuffled, partitionable,
  * AQE-skew-splittable, no product term. Replication factor is
  * `1 + ceil(intervalWidth / binWidth)`, so pick `binWidth` near the max
  * interval width (the cost model of Databricks-style range-join hints).
  *
  * At 100 TB: both sides shuffle once on the bin key — the same wire cost
  * as any equi-join — and bin skew (a hot value range) is ordinary key
  * skew, handled by AQE or salting. A nested-loop plan has no such story.
  */
object RangeJoin {

  /** Join `points` rows to every `intervals` row whose `[lo, hi)` range
    * contains `points(pointCol)`. All columns from both sides survive;
    * matching is inner. `lo`/`hi`/`pointCol` must be numeric. The two
    * sides must not share column names (same precondition as AsofJoin —
    * rename before joining); enforced eagerly, since a silent collision
    * surfaces later as an ambiguous-reference error mid-plan.
    *
    * `maxBinsPerInterval` bounds the replication blow-up: an interval
    * much wider than `binWidth` would otherwise materialize an unbounded
    * bin array (executor OOM). Exceeding it raises at runtime with the
    * offending width — the caller should re-bin with a wider `binWidth`.
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      lo: String,
      hi: String,
      binWidth: Double,
      maxBinsPerInterval: Int = 1 << 16): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"pointInInterval: both sides carry column(s) ${shared.mkString(", ")} — rename one side first")
    val bin = "__rj_bin"
    val pb = points.withColumn(bin, floor(col(pointCol) / binWidth).cast(LongType))
    val binLo = floor(col(lo) / binWidth).cast(LongType)
    val binHi = floor(col(hi) / binWidth).cast(LongType)
    val ib = intervals
      .filter(col(lo) <= col(hi))
      .withColumn(bin, explode(
        when(binHi - binLo < lit(maxBinsPerInterval.toLong), sequence(binLo, binHi))
          .otherwise(raise_error(format_string(
            s"rangeJoin: interval [%s, %s) spans more than $maxBinsPerInterval bins of width $binWidth — increase binWidth",
            col(lo).cast("string"), col(hi).cast("string"))).cast("array<bigint>"))))
    pb.join(ib, Seq(bin))
      .filter(col(pointCol) >= col(lo) && col(pointCol) < col(hi))
      .drop(bin)
  }
}
