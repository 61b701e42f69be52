package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The engine's SparkSessionExtensions entry point (ref: SURVEY §7.0
  * layer 5 — "custom Rule[LogicalPlan] + SparkStrategy via
  * spark.extensions"): deployments set
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * and every session materializes with the engine's optimizer rules
  * installed — the ASOF-join lowering and the materialized-view
  * substitution — plus the full function registry, with no per-session
  * wiring code. (The library also self-installs these via
  * `experimental.extraOptimizations` when its APIs are first touched,
  * so embedded/test use works without the config; this class is the
  * idiomatic cluster-deployment hook.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(session =>
      graft.plans.LowerAsofJoin(session.asInstanceOf[org.apache.spark.sql.SparkSession]))
    e.injectOptimizerRule(_ => graft.plans.MaterializedViews.MvRewrite)
    e.injectOptimizerRule(_ => graft.plans.FkJoinElimination)
    e.injectOptimizerRule(_ => graft.plans.SemiJoinRewrite)
    e.injectOptimizerRule(_ => graft.plans.EagerAggregation)
    e.injectOptimizerRule(_ => graft.plans.AggregateUnionTranspose)
    e.injectOptimizerRule(_ => graft.plans.OrJoinToUnion)
    e.injectCheckRule { session =>
      // piggyback session start to register the function surface once
      graft.functions.GraftFunctions.registerAll(
        session.asInstanceOf[org.apache.spark.sql.SparkSession])
      _ => ()
    }
  }
}
