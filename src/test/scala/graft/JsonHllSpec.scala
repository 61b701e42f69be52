package graft

import org.apache.spark.sql.functions._

class JsonHllSpec extends SparkSpec {

  test("hll sketch union estimate lands near exact distinct") {
    // r13: q66 carries its exact twin in-query — the hashed surface is
    // (y, n_months, exact_custs, sketch_within_5pct); the sketch
    // ESTIMATE is gated here against an independently computed exact
    val rows = run("q66_hll_sketch_union").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3),
        s"year ${r.get(0)}: sketch estimate outside the 5% envelope")
    }
    val got = rows.map(r => r.getInt(0) -> r.getLong(2)).toMap
    val exact = T(spark, sfDir, "orders")
      .groupBy(year(col("o_orderdate")).as("y"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == exact)
  }

  test("q18: the builtin approx-distinct estimate sits inside its error envelope") {
    val rows = run("q18_approx_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(2),
      s"flag ${r.getString(0)}: estimate outside the 15% envelope"))
  }

  test("parameterized queries — the RexDynamicParam surface") {
    T.registerViews(spark, sfDir)
    val byPos = spark.sql(
      "SELECT count(*) FROM orders WHERE o_totalprice > ? AND o_orderstatus = ?",
      Array(100000.0, "O")).collect()(0).getLong(0)
    val byName = spark.sql(
      "SELECT count(*) FROM orders WHERE o_totalprice > :p AND o_orderstatus = :st",
      Map("p" -> 100000.0, "st" -> "O")).collect()(0).getLong(0)
    val literal = spark.sql(
      "SELECT count(*) FROM orders WHERE o_totalprice > 100000.0 AND o_orderstatus = 'O'")
      .collect()(0).getLong(0)
    assert(byPos == literal && byName == literal && literal > 0)
  }
}
