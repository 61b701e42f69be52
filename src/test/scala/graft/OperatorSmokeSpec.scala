package graft

/** Every declared query runs end-to-end at sf0.001 and (where the query
  * isn't a filter that can legitimately select zero rows) returns rows.
  * Value correctness is covered by the DuckDB-oracle gate (tools/check.py
  * at sf0.01); this suite is the compile-shape-and-run gate.
  */
class OperatorSmokeSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  // q148–q153 register MVs as part of their definition (register-once,
  // answer-later — the lattice usage pattern). Within ONE session that
  // is exactly the product contract; across test SUITES it leaks
  // global-registry state that can re-shape later suites' plans (an MV
  // answers a sub-plan from cache). Leave the registry as we found it.
  override def afterAll(): Unit = {
    try graft.plans.MaterializedViews.clear()
    finally super.afterAll()
  }

  // queries whose result may be legitimately empty at sf=0.001
  private val mayBeEmpty = Set(
    "q33_except", "q41_not_exists_anti", "q03_topk_join", "q14_having",
    "q73_similar_to", "q99_match_adjacent_high", "q100_match_sql",
    "q39_nation_pairs", "d03_minhash_lsh", "d04_jaccard_pairs", "q116_not_in_null",
    // ds17 keeps months where cumulative R-revenue exceeds N-revenue,
    // ds20 customers with orders but zero returns — both legitimately
    // empty on the 6k-row sf0.001 slice (62/… rows at the sf0.01 oracle)
    "ds17_cumulative_share", "ds20_no_returns_profile")

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name runs") {
      val df = run(name)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }
}
