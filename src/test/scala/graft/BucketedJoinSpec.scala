package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._

/** Co-located join via bucketed tables: the join of two tables bucketed
  * on the same key with the same bucket count must plan WITHOUT a
  * shuffle exchange on either side — the persisted layout satisfies the
  * join's distribution requirement (SURVEY §2.1 Exchange row). */
class BucketedJoinSpec extends SparkSpec {

  test("same-bucketed fact tables join with zero shuffle exchanges") {
    val li = T(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
    val ords = T(spark, sfDir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")

    Bucketing.writeBucketed(li.withColumnRenamed("l_orderkey", "k"), "b_lineitem", "k", 8, Seq("k"))
    Bucketing.writeBucketed(ords.withColumnRenamed("o_orderkey", "k"), "b_orders", "k", 8, Seq("k"))
    try {
      // disable broadcast so the join would otherwise need a two-sided shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.colocatedJoin(spark, "b_lineitem", "b_orders", "k")
      val plan = joined.queryExecution.executedPlan.toString

      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == li.count(), "inner join on the FK preserves lineitem rows")

      // control: the same join over plain (unbucketed) frames DOES shuffle
      val control = li.withColumnRenamed("l_orderkey", "k")
        .join(ords.withColumnRenamed("o_orderkey", "k"), "k")
      val controlPlan = control.queryExecution.executedPlan.toString
      assert(controlPlan.contains("Exchange"), "control join should shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("bucketed aggregation on the bucket key also avoids the shuffle") {
    val ords = T(spark, sfDir, "orders").select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(ords, "b_orders_agg", "o_orderkey", 8)
    try {
      val agg = spark.table("b_orders_agg").groupBy("o_orderkey")
        .agg(sum("o_totalprice").as("t"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"groupBy on the bucket key must reuse the layout:\n$plan")
      assert(agg.count() == ords.count())
    } finally spark.sql("DROP TABLE IF EXISTS b_orders_agg")
  }
}
