package graft

/** TPC-H breadth pack: row-level sanity plus the plan shapes that keep
  * each query scale-safe (broadcast dims, decorrelated aggregates as
  * single extra shuffles, semi/anti joins instead of row-at-a-time
  * subqueries). Value-level correctness is the DuckDB oracle's job.
  */
class TpchSpec extends SparkSpec {

  private def plan(name: String): String =
    run(name).queryExecution.executedPlan.toString

  test("t02: min-cost decorrelation broadcasts the per-part min, no cartesian") {
    val p = plan("t02_min_cost_supplier")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
    assert(!p.contains("CartesianProduct"))
    // rows exist from sf0.01 up (oracle-checked); sf0.001 has no
    // EUROPE×(size=5,LARGE) lineitem, so no row-count assertion here
  }

  test("t08: market share is one aggregation over broadcast dims") {
    val p = plan("t08_market_share")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("partial_sum"), "conditional sums must partial-aggregate map-side")
    val rows = run("t08_market_share").collect()
    assert(rows.nonEmpty && rows.forall { r =>
      val s = r.getDouble(1); s >= 0.0 && s <= 100.0
    })
  }

  test("t11: global total is computed once and broadcast, not per-row") {
    val p = plan("t11_important_parts")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"1-row total must broadcast:\n$p")
  }

  test("t15: max-revenue equality join stays broadcast") {
    val rows = run("t15_top_supplier").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getDouble(2)).distinct.length == 1, "all rows must share the max revenue")
  }

  test("t17: correlated AVG decorrelates to a partial agg + broadcast join") {
    val p = plan("t17_small_qty")
    assert(p.contains("BroadcastHashJoin"), s"half-avg join must broadcast:\n$p")
    assert(run("t17_small_qty").collect()(0).getDouble(0) > 0.0)
  }

  test("t18: HAVING subquery runs as one grouped pass, top-K avoids global sort") {
    val p = plan("t18_large_orders")
    assert(p.contains("TakeOrderedAndProject"), "ORDER BY + LIMIT must fuse")
    val rows = run("t18_large_orders").collect()
    assert(rows.forall(_.getDouble(5) > 300.0))
  }

  test("t20/t21: IN chains and EXISTS/NOT EXISTS plan as semi/anti joins") {
    val p20 = plan("t20_excess_suppliers")
    assert(p20.contains("LeftSemi"), s"IN chain must lower to semi joins:\n$p20")
    val p21 = plan("t21_waiting_suppliers")
    assert(p21.contains("LeftSemi") && p21.contains("LeftAnti"),
      s"EXISTS/NOT EXISTS must lower to semi+anti:\n$p21")
  }

  test("t22: anti join on recent orders, scalar threshold broadcast") {
    val p = plan("t22_sales_opportunity")
    assert(p.contains("LeftAnti"))
    val rows = run("t22_sales_opportunity").collect()
    assert(rows.map(_.getLong(1)).sum > 0)
  }
}
