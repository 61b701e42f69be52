package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Data profiler (ref: profile/ProfilerImpl.java:34,577-659 — per-column
  * and column-set statistics over one scan, HLL sketches for distinct
  * counts; consumed by the lattice tile recommender
  * materialize/TileSuggester.java). Spark-first shape: ONE aggregation
  * pass computes every per-column statistic (Catalyst plans the
  * multi-distinct via Expand — still a single scan of the input), then a
  * plan-time unpivot lays it out one row per column. At 100 TB the scan
  * dominates and everything here is map-side partial-aggregated; swap
  * `countDistinct` for `approx_count_distinct` (kept as its own column)
  * when the exact count's Expand blowup matters more than sketch error.
  */
object Profiler {

  /** Per-column profile: row count, null count, exact + approximate
    * distinct counts, min/max rendered as strings. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        approx_count_distinct(col(c)).as(s"__ad_$c"),
        min(col(c)).cast(StringType).as(s"__min_$c"),
        max(col(c)).cast(StringType).as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__ad_$c").as("approx_distinct"),
        col(s"__min_$c").as("min_s"),
        col(s"__max_$c").as("max_s"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
      .orderBy("col_name")
  }

  /** Functional dependency det → dep (RelMdColumnUniqueness /
    * ProfilerImpl FD discovery): holds iff grouping by the determinant
    * never sees two dependent values. One aggregation pass. */
  def isFunctionalDependency(df: DataFrame, det: Seq[String], dep: String): Boolean =
    df.groupBy(det.map(col): _*)
      .agg(countDistinct(col(dep)).as("nd"))
      .filter(col("nd") > 1)
      .isEmpty

  /** Unique-key check (schema/Statistic.java getKeys). */
  def isUniqueKey(df: DataFrame, cols: Seq[String]): Boolean =
    df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .isEmpty
}
