package graft

import org.apache.spark.sql.{GraftSqlBridge, SparkSessionExtensions}
import org.apache.spark.sql.functions._

/** The spark.sql.extensions entry point: GraftExtensions injects the
  * engine's optimizer rules; the injected ASOF lowering actually
  * rewrites an AsofJoinPlan node.
  */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects the asof lowering and MV substitution rules") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val rules = GraftSqlBridge.optimizerRulesOf(ext, spark)
    assert(rules.exists(_.isInstanceOf[graft.plans.LowerAsofJoin]),
      s"asof lowering missing from $rules")
    assert(rules.contains(graft.plans.MaterializedViews.MvRewrite),
      s"MV substitution missing from $rules")
  }

  test("the injected asof rule lowers an AsofJoinPlan node end to end") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val lower = GraftSqlBridge.optimizerRulesOf(ext, spark)
      .collectFirst { case r: graft.plans.LowerAsofJoin => r }.get

    val left = T(spark, sfDir, "events").filter(col("event_id") < 50)
      .select(col("user_id"), col("ts"), col("event_id"))
    val right = T(spark, sfDir, "events").filter(col("event_id") >= 50)
      .select(col("user_id"), col("ts").as("rts"), col("value"))
    val node = graft.plans.AsofJoinPlan(
      GraftSqlBridge.logicalPlan(left), GraftSqlBridge.logicalPlan(right),
      "user_id", "ts", "rts", Seq("value"))
    val lowered = lower(node)
    assert(!lowered.isInstanceOf[graft.plans.AsofJoinPlan],
      "rule must replace the custom node")
    // and the lowered plan computes the asof semantics
    val out = GraftSqlBridge.ofRows(spark, lowered)
    assert(out.columns.contains("value") && out.count() > 0)
  }
}
