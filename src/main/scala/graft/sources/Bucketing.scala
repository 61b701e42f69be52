package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed tables — the co-located join design for 100 TB fact-fact
  * joins (ref: the reference's Exchange/RelDistribution trait,
  * rel/RelDistribution.java:73-93 HASH — a bucketed table IS a
  * persisted HASH distribution, so the planner can satisfy a join's
  * distribution requirement from the layout instead of shuffling).
  *
  * Writing both fact tables bucketed by the join key with the same
  * bucket count lets every subsequent join on that key run with ZERO
  * exchanges: each task reads bucket i of both sides. At 100 TB this
  * converts the dominant cost of a fact-fact join (a full two-sided
  * shuffle) into a pure co-partitioned read — the same contract a
  * pre-partitioned distributed warehouse gives the reference engine.
  *
  * Caveats encoded here: bucketing requires saveAsTable (a catalog
  * entry, not a bare path), and both sides must agree on bucket count
  * and key for exchange-free planning. */
object Bucketing {

  /** Persist `df` as a bucketed catalog table (overwriting). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** A co-located equi-join of two same-bucketed tables. */
  def colocatedJoin(spark: org.apache.spark.sql.SparkSession,
      left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
