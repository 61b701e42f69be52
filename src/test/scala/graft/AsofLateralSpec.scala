package graft

/** The LATERAL fallback of the ASOF SQL surface (sql/AsofSql.scala):
  * an ASOF JOIN chained after an ordinary join, with bare table
  * aliases and no column lists — CALCITE-7228's shape from the
  * reference corpus (asof.iq:225-266). The window path can't bind this
  * (it needs aligned `AS a(cols)` aliases), so it lowers onto a
  * correlated LATERAL LIMIT-1 subquery instead. */
class AsofLateralSpec extends SparkSpec {
  test("chained LEFT ASOF JOIN with bare aliases picks the latest match per row") {
    spark.sql("CREATE OR REPLACE TEMP VIEW asof_lat_a AS SELECT * FROM VALUES " +
      "(1, 'x', 10), (1, 'x', 25), (2, 'y', 40), (3, 'z', 99) t(k, g, ts)")
    spark.sql("CREATE OR REPLACE TEMP VIEW asof_lat_b AS SELECT * FROM VALUES " +
      "(1, 'dim1'), (2, 'dim2'), (3, 'dim3') t(k, name)")
    spark.sql("CREATE OR REPLACE TEMP VIEW asof_lat_c AS SELECT * FROM VALUES " +
      "(1, 5, 'old'), (1, 24, 'new'), (2, 50, 'late') t(k, ts, v)")
    val rows = graft.sql.GraftSql.sql(spark,
      """SELECT t1.k, t1.ts, t2.name, t3.v FROM asof_lat_a AS t1
        |LEFT JOIN asof_lat_b AS t2 ON t1.k = t2.k
        |LEFT ASOF JOIN asof_lat_c AS t3
        |MATCH_CONDITION ( t1.ts >= t3.ts )
        |ON t1.k = t3.k
        |ORDER BY t1.k, t1.ts""".stripMargin)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), Option(r.getString(3)).getOrElse("-")))
      .toSeq
    // k=1/ts=10 sees only ts=5 ('old'); k=1/ts=25 takes the later ts=24
    // ('new'); k=2/ts=40 precedes c's ts=50 -> null; k=3 has no c rows.
    assert(rows == Seq(
      (1, 10, "dim1", "old"),
      (1, 25, "dim1", "new"),
      (2, 40, "dim2", "-"),
      (3, 99, "dim3", "-")))
  }

  test("inner chained ASOF JOIN drops unmatched left rows") {
    val rows = graft.sql.GraftSql.sql(spark,
      """SELECT t1.k, t1.ts, t3.v FROM asof_lat_a AS t1
        |ASOF JOIN asof_lat_c AS t3
        |MATCH_CONDITION ( t1.ts >= t3.ts )
        |ON t1.k = t3.k
        |ORDER BY t1.k, t1.ts""".stripMargin)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq
    assert(rows == Seq((1, 10, "old"), (1, 25, "new")))
  }
}
