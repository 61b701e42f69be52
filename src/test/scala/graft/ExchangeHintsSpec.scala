package graft

import org.apache.spark.sql.functions._

/** Exchange / RelDistribution surface (ref: rel/core/Exchange.java:1,
  * RelDistribution.java:73-93 — HASH/RANGE/SINGLETON/BROADCAST) and join
  * strategy hints. */
class ExchangeHintsSpec extends SparkSpec {

  test("hash / range / singleton / broadcast distributions") {
    val li = T(spark, sfDir, "lineitem")
    val hash = li.repartition(8, col("l_suppkey"))
    assert(hash.rdd.getNumPartitions == 8)
    val range = li.repartitionByRange(8, col("l_shipdate"))
    assert(range.rdd.getNumPartitions == 8)
    val single = li.coalesce(1)
    assert(single.rdd.getNumPartitions == 1)
    val b = li.join(broadcast(T(spark, sfDir, "nation")),
      col("l_suppkey") % 25 === col("n_nationkey"))
    assert(b.queryExecution.executedPlan.toString.contains("BroadcastExchange"))
  }

  test("SQL join hints steer the physical strategy") {
    T.registerViews(spark, sfDir)
    val merge = spark.sql("""
      SELECT /*+ MERGE(orders) */ count(*)
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey""")
    assert(merge.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
    val bcast = spark.sql("""
      SELECT /*+ BROADCAST(orders) */ count(*)
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey""")
    assert(bcast.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(merge.collect()(0).getLong(0) == bcast.collect()(0).getLong(0))
  }

  test("REPARTITION hint inserts the exchange") {
    T.registerViews(spark, sfDir)
    val df = spark.sql("SELECT /*+ REPARTITION(4, l_suppkey) */ * FROM lineitem")
    assert(df.rdd.getNumPartitions == 4)
  }
}
