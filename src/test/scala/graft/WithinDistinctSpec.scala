package graft

import graft.sql.WithinDistinctSql

/** WITHIN DISTINCT lowering paths: the scalable two-level restatement
  * (GROUP BY g,k → GROUP BY g — O(1) hash-agg state per key) for plain
  * grouped selects, and the composable fold path for everything else
  * (FILTER, DISTINCT qualifiers, non-grouped shapes). */
class WithinDistinctSpec extends SparkSpec {

  test("plain grouped select lowers to the two-level restatement") {
    val out = WithinDistinctSql.rewrite(
      "SELECT g, SUM(v) WITHIN DISTINCT (k) AS s FROM t GROUP BY g")
    assert(out.contains("__wdt"), s"expected two-level shape: $out")
    assert(out.contains("GROUP BY g, k"), s"inner must group by (g, keys): $out")
    assert(!out.toLowerCase.contains("collect_list"), s"no pair fold expected: $out")
  }

  test("FILTER / DISTINCT qualifier / HAVING keep the fold path") {
    for (q <- Seq(
      "SELECT g, SUM(v) WITHIN DISTINCT (k) FILTER (WHERE v > 0) FROM t GROUP BY g",
      "SELECT g, SUM(DISTINCT v) WITHIN DISTINCT (k) FROM t GROUP BY g",
      "SELECT g, SUM(v) WITHIN DISTINCT (k) FROM t GROUP BY g HAVING count(*) > 1")) {
      val out = WithinDistinctSql.rewrite(q)
      assert(!out.contains("__wdt") && out.toLowerCase.contains("collect_list"),
        s"expected fold path for: $q\ngot: $out")
    }
  }

  test("two-level path computes the de-double-counted values (q143 shape)") {
    spark.sql("""CREATE OR REPLACE TEMP VIEW wd_t AS SELECT * FROM VALUES
      (1, 10, 100.0), (1, 10, 100.0), (1, 20, 50.0), (2, 30, 7.0)
      AS t(g, k, v)""")
    val out = graft.sql.GraftSql.sql(spark, """
      SELECT g, CAST(SUM(v) WITHIN DISTINCT (k) AS DOUBLE) AS s,
             CAST(COUNT(*) WITHIN DISTINCT (k) AS BIGINT) AS n
      FROM wd_t GROUP BY g ORDER BY g""").collect()
    assert(out.map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSeq ==
      Seq((1, 150.0, 2L), (2, 7.0, 1L)))
  }

  test("two-level path raises the reference's UNIQUE_VALUE error on non-dependence") {
    spark.sql("""CREATE OR REPLACE TEMP VIEW wd_bad AS SELECT * FROM VALUES
      (1, 10, 100.0), (1, 10, 999.0) AS t(g, k, v)""")
    val ex = intercept[Exception] {
      graft.sql.GraftSql.sql(spark,
        "SELECT g, SUM(v) WITHIN DISTINCT (k) AS s FROM wd_bad GROUP BY g").collect()
    }
    assert(ex.getMessage.contains("more than one distinct value"),
      s"expected UNIQUE_VALUE error, got: ${ex.getMessage}")
  }

  test("fold and two-level paths agree on the q143 statement") {
    val dir = sfDir
    val a = SparkEntry.queries("q143_within_distinct")(spark, dir)
      .orderBy("o_custkey").collect().toSeq
    // force the fold path by adding a no-op HAVING (two-level bails)
    T(spark, dir, "orders").createOrReplaceTempView("orders_v143")
    T(spark, dir, "lineitem").createOrReplaceTempView("lineitem_v143")
    val b = graft.sql.GraftSql.sql(spark, """
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                    WITHIN DISTINCT (o_orderkey) AS DOUBLE) AS order_rev,
             CAST(COUNT(*) WITHIN DISTINCT (o_orderkey) AS BIGINT) AS n_orders
      FROM (SELECT o_custkey, o_orderkey, o_totalprice
            FROM orders_v143 JOIN lineitem_v143 ON l_orderkey = o_orderkey)
      GROUP BY o_custkey HAVING COUNT(*) >= 0""").orderBy("o_custkey").collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq), "fold vs two-level divergence")
  }
}
