package graft

import graft.plans.AsofJoinPlan
import org.apache.spark.sql.functions._

/** The custom AsofJoinPlan node + LowerAsofJoin rule must produce the
  * same relation as calling the lowering directly (q96 path). */
class AsofPlanSpec extends SparkSpec {

  test("custom logical node lowers to the same result as direct leftAsof") {
    AsofJoinPlan.install(spark)
    val ev = T(spark, sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts").as("click_ts"))
      .agg(max(col("event_id")).as("click_id"))
      .select(col("user_id"), col("click_ts"), col("click_id"))

    val viaNode = AsofJoinPlan.asof(spark, purchases, clicks,
      key = "user_id", leftTime = "ts", rightTime = "click_ts",
      payload = Seq("click_id"))
      .orderBy("event_id").collect().map(_.toSeq).toSeq

    val direct = run("q96_asof_join").collect().map(_.toSeq).toSeq

    assert(viaNode.map(_.toSet) == direct.map(_.toSet))
    assert(viaNode.nonEmpty)
  }

  test("node survives downstream operators (filter + aggregate over it)") {
    AsofJoinPlan.install(spark)
    val ev = T(spark, sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val matchedCount = AsofJoinPlan.asof(spark, purchases, clicks,
      "user_id", "ts", "click_ts", Seq("click_id"))
      .filter(col("click_id").isNotNull)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(matchedCount > 0)
  }
}
