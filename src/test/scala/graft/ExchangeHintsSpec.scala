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

  test("runtime bloom filter injects on a selective fact-fact join (InjectRuntimeFilter)") {
    // the reference's LoptSemiJoinOptimizer/JoinAddRedundantSemiJoinRule
    // territory — Spark's runtime-filter injection supersedes it: a
    // selective filter on one join side materializes a bloom filter that
    // pre-filters the probe side's scan before the shuffle.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "500MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force a shuffle join
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = T(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
      val ords = T(spark, sfDir, "orders")
        .filter(org.apache.spark.sql.functions.col("o_totalprice") > 300000)
        .select("o_orderkey")
      val q = li.join(ords,
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter") ||
        plan.contains("might_contain"),
        s"expected an injected runtime bloom filter:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("REPARTITION hint inserts the exchange") {
    T.registerViews(spark, sfDir)
    val df = spark.sql("SELECT /*+ REPARTITION(4, l_suppkey) */ * FROM lineitem")
    assert(df.rdd.getNumPartitions == 4)
  }
}
