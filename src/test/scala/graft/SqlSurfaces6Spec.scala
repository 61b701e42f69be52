package graft

import graft.sql.GraftSql

/** Product-level gates for the round-6 SQL surfaces (corpus-independent
  * of the reference checkout): WITHIN DISTINCT, FILTER on window
  * aggregates, grouping-set completion (GROUP BY DISTINCT, GROUP_ID,
  * subset GROUPING_ID), row-tuple IN lists, CAST AS ROW types, and
  * UNPIVOT tuple labels.
  */
class SqlSurfaces6Spec extends SparkSpec {

  private def sql1(q: String) = GraftSql.sql(spark, q).collect()

  test("WITHIN DISTINCT dedupes per key set and raises the FD error") {
    spark.sql("""CREATE OR REPLACE TEMP VIEW wd AS SELECT * FROM VALUES
      (1, 10, 100.0), (1, 10, 100.0), (1, 20, 50.0), (2, 30, 70.0)
      AS t(g, k, v)""")
    val r = sql1(
      "SELECT g, SUM(v) WITHIN DISTINCT (k) AS s FROM wd GROUP BY g ORDER BY g")
    assert(r.map(x => (x.getInt(0), x.get(1).toString.toDouble)).toSeq ==
      Seq((1, 150.0), (2, 70.0)))
    // v not functionally dependent on k within the group -> error
    spark.sql("""CREATE OR REPLACE TEMP VIEW wd2 AS SELECT * FROM VALUES
      (1, 10, 100.0), (1, 10, 200.0) AS t(g, k, v)""")
    val e = intercept[Exception] {
      sql1("SELECT g, SUM(v) WITHIN DISTINCT (k) AS s FROM wd2 GROUP BY g")
    }
    assert(e.getMessage.contains("more than one distinct value"))
  }

  test("EXCLUDE keeps partitions apart when the select list omits the partition key") {
    // regression: the self-join/bounded lowerings must GROUP BY the
    // partition keys too — without them, rows of different partitions
    // sharing an __rn and the same plain items merged into one group
    spark.sql("""CREATE OR REPLACE TEMP VIEW exb AS SELECT * FROM VALUES
      ('p1', 1, 10), ('p1', 2, 20), ('p2', 1, 30), ('p2', 2, 40)
      AS t(p, r, v)""")
    val r = sql1("""
      SELECT r, sum(v) OVER (PARTITION BY p ORDER BY r
        ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS x
      FROM exb""")
    // per partition: x(r=1)=other row's v, x(r=2)=other row's v — four
    // rows, never cross-partition sums
    assert(r.length == 4)
    assert(r.map(x => (x.getInt(0), x.get(1).toString.toDouble)).sortBy(t => (t._1, t._2)).toSeq ==
      Seq((1, 20.0), (1, 40.0), (2, 10.0), (2, 30.0)))
  }

  test("WITHIN DISTINCT keys overlapping the GROUP BY keys stay unambiguous") {
    spark.sql("""CREATE OR REPLACE TEMP VIEW wd3 AS SELECT * FROM VALUES
      (1, 10, 100.0), (1, 10, 100.0), (1, 20, 50.0), (2, 30, 70.0)
      AS t(g, k, v)""")
    val r = sql1(
      "SELECT g, k, SUM(v) WITHIN DISTINCT (k) AS s FROM wd3 GROUP BY g, k ORDER BY g, k")
    assert(r.map(x => (x.getInt(0), x.getInt(1), x.get(2).toString.toDouble)).toSeq ==
      Seq((1, 10, 100.0), (1, 20, 50.0), (2, 30, 70.0)))
  }

  test("ORDER BY of a bare output-alias identifier is never rewritten under DISTINCT") {
    spark.sql("""CREATE OR REPLACE TEMP VIEW oba AS SELECT * FROM VALUES
      (1, 9), (2, 8), (3, 7) AS t(a, b)""")
    // ORDER BY a must resolve to the OUTPUT column a (= t.b), not be
    // substituted with the alias of the select item whose EXPR is `a`
    val r = sql1("SELECT DISTINCT a AS b, b AS a FROM oba ORDER BY a LIMIT 1")
    assert((r.head.getInt(0), r.head.getInt(1)) == (3, 7))
  }

  test("FILTER on a window aggregate lowers; navigation functions still reject") {
    spark.sql("""CREATE OR REPLACE TEMP VIEW wf AS SELECT * FROM VALUES
      (1, 10), (1, 25), (2, 5), (2, 40) AS t(g, v)""")
    val r = sql1("""SELECT g, v,
        count(*) FILTER (WHERE v > 20) OVER (PARTITION BY g) AS c
      FROM wf ORDER BY g, v""")
    assert(r.map(_.getLong(2)).toSeq == Seq(1L, 1L, 1L, 1L))
    intercept[Exception] {
      sql1("SELECT first_value(v) FILTER (WHERE v > 0) OVER (ORDER BY v) FROM wf")
    }
  }

  test("GROUP BY DISTINCT dedupes the grouping-set cross product") {
    spark.sql("""CREATE OR REPLACE TEMP VIEW gd AS SELECT * FROM VALUES
      (1, 'a'), (1, 'b'), (2, 'a') AS t(x, y)""")
    val r = sql1(
      "SELECT count(*) AS c FROM gd GROUP BY DISTINCT cube(x, y), rollup(x, y)")
    // dedup -> 4 sets: (x,y), (x), (y), () -> 3 + 2 + 2 + 1 rows
    assert(r.length == 8)
  }

  test("GROUP_ID numbers duplicate grouping sets; 0 without duplicates") {
    spark.sql("""CREATE OR REPLACE TEMP VIEW gi AS SELECT * FROM VALUES
      (10, 1), (10, 2), (20, 3) AS t(d, v)""")
    val dup = sql1("""SELECT d, group_id() AS g, count(*) AS c
      FROM gi GROUP BY GROUPING SETS (d, (), ()) ORDER BY g, d NULLS LAST""")
    assert(dup.map(r => (Option(r.get(0)), r.getInt(1), r.getLong(2))).toSeq ==
      Seq((Some(10), 0, 2L), (Some(20), 0, 1L), (None, 0, 3L), (None, 1, 3L)))
    val no = sql1("SELECT group_id() AS g FROM gi GROUP BY d")
    assert(no.forall(_.getInt(0) == 0))
  }

  test("GROUPING_ID accepts subset and reordered arguments") {
    val r = sql1("""SELECT count(*) AS c, grouping_id(v, d) AS g
      FROM gi GROUP BY rollup(d, v) ORDER BY g, c""")
    // detail rows g=0; v-aggregated rows g=2 (v is the HIGH bit here);
    // grand total g=3
    assert(r.map(_.getInt(1)).distinct.sorted.toSeq == Seq(0, 2, 3))
  }

  test("row-tuple IN over a literal list coerces per field and keeps 3VL") {
    spark.sql("""CREATE OR REPLACE TEMP VIEW ti AS SELECT * FROM VALUES
      (CAST(500.0 AS DECIMAL(7,2)), 1), (CAST(300.0 AS DECIMAL(7,2)), 2),
      (CAST(NULL AS DECIMAL(7,2)), 3) AS t(comm, id)""")
    val r = sql1("""SELECT id, (comm, id) IN ((500, 1), (300, 99)) AS f
      FROM ti ORDER BY id""")
    // row 3 (comm NULL): each conjunct is UNKNOWN AND FALSE = FALSE, so
    // the IN is FALSE, not UNKNOWN — the id fields never match
    assert(r.map(x => Option(x.get(1))).toSeq ==
      Seq(Some(true), Some(false), Some(false)))
    val u = sql1("""SELECT id, (comm, id) IN ((500, 1), (NULL, 3)) AS f
      FROM ti ORDER BY id""")
    // row 3: (NULL = NULL AND 3 = 3) -> UNKNOWN AND TRUE -> UNKNOWN
    assert(u.map(x => Option(x.get(1))).toSeq ==
      Seq(Some(true), Some(false), None))
    val n = sql1("SELECT id FROM ti WHERE (comm, id) NOT IN ((500, 1), (NULL, 2)) ORDER BY id")
    // row 1 matches (NOT IN false); row 2 hits (NULL, 2) -> UNKNOWN,
    // filtered; row 3's conjuncts are all FALSE -> NOT IN true, kept
    assert(n.map(_.getInt(0)).toSeq == Seq(3))
  }

  test("CAST AS ROW type spelling lowers to STRUCT") {
    val r = sql1("SELECT CAST(ROW(1, 'x') AS ROW(a INTEGER, b VARCHAR(5))) AS r")
    assert(r.head.getStruct(0).getInt(0) == 1)
    val u = sql1("""SELECT * FROM UNNEST(ARRAY[ROW(1, 'x'),
      CAST(NULL AS ROW(a INTEGER, b CHAR(1)))]) WITH ORDINALITY AS t(a, b, o)""")
    assert(u.length == 2 && u.map(_.getInt(2)).sorted.toSeq == Seq(1, 2))
  }

  test("window frame EXCLUDE lowers to the position self-join") {
    spark.sql("""CREATE OR REPLACE TEMP VIEW ex AS SELECT * FROM VALUES
      (1, 10), (2, 20), (2, 30), (3, 40) AS t(k, v)""")
    val r = sql1("""SELECT k,
        sum(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW) AS xc,
        sum(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE GROUP) AS xg,
        sum(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE TIES) AS xt,
        sum(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE NO OTHERS) AS xn
      FROM ex ORDER BY k, xc""")
    // total 100; k=2 peers are {20, 30}. The unbounded difference-of-
    // windows path emits exact-DECIMAL-backed DOUBLEs; EXCLUDE NO
    // OTHERS stays the native (long) sum — read via toString
    def d(x: org.apache.spark.sql.Row, i: Int) = x.get(i).toString.toDouble
    val rows = r.map(x => (x.getInt(0), d(x, 1), d(x, 2), d(x, 3), d(x, 4))).toSeq
    assert(rows.contains((2, 80.0, 50.0, 70.0, 100.0))) // the v=20 row
    assert(rows.contains((2, 70.0, 50.0, 80.0, 100.0))) // the v=30 row
    assert(rows.contains((1, 90.0, 90.0, 100.0, 100.0)))
  }

  test("UNPIVOT tuple labels expand per entry with default labels") {
    val r = sql1("""SELECT * FROM (
        SELECT * FROM (VALUES (0, 1, 2, 3, 4)) AS t (c0, c1, c2, c3, c4))
      UNPIVOT ((m0, m1) FOR (a0, a1)
        IN ((c1, c2) AS ('p', 'q'), (c3, c4)))""")
    assert(r.length == 2)
    val labels = r.map(x => (x.getString(1), x.getString(2))).toSet
    assert(labels == Set(("p", "q"), ("C3_C4", "C3_C4")))
  }

  test("generated-column DDL: string literals with commas/parens survive the column split") {
    import graft.sql.GeneratedColumnsSql
    try {
      // the DEFAULT literal carries a comma, a paren, and an escaped
      // quote — none may split the column list or corrupt the definition
      GeneratedColumnsSql.maybeRun(spark,
        "create table gq (i int, lbl varchar(30) default 'a,b(c)''d', j int as (i + 1) virtual)")
      GeneratedColumnsSql.maybeRun(spark, "insert into gq (i, lbl) values (1, 'x')")
      GeneratedColumnsSql.maybeRun(spark, "insert into gq (i) values (2)")
      val rows = spark.sql("select i, lbl, j from gq order by i").collect()
      assert(rows.map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq ==
        Seq((1, "x", 2), (2, "a,b(c)'d", 3)))
      // an unbalanced quote fails loudly instead of mis-parsing
      val e = intercept[Exception] {
        GeneratedColumnsSql.maybeRun(spark,
          "create table gq2 (i int, s varchar(30) default 'oops, j int as (i) virtual)")
      }
      assert(e.getMessage.contains("unbalanced quote"))
    } finally GeneratedColumnsSql.clearRegistry(spark)
  }

  test("CREATE MATERIALIZED VIEW over a parquet rollup feeds the transparent rewrite") {
    import org.apache.spark.sql.functions._
    val orders = T(spark, "/root/testdata/sf0.001", "orders")
    orders.createOrReplaceTempView("orders_ddlmv")
    graft.plans.MaterializedViews.clear()
    try {
      graft.sql.GraftSql.sql(spark,
        """CREATE MATERIALIZED VIEW ddl_tile AS
          |SELECT o_orderstatus, o_orderpriority,
          |       SUM(o_totalprice) AS s, COUNT(*) AS n
          |FROM orders_ddlmv GROUP BY o_orderstatus, o_orderpriority""".stripMargin)
      // the named read target exists (the statement surface)...
      assert(spark.sql("SELECT * FROM ddl_tile").count() > 0)
      // ...AND the planner answers an UNRELATED rollup over the same
      // parquet source from the materialization (the reference's
      // MaterializationService behavior), exact counts included
      def q = orders.groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
      val lp = q.queryExecution.optimizedPlan
      assert(lp.toString.contains("InMemoryRelation"),
        s"rollup must be answered from the DDL materialization:\n$lp")
      assert(lp.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }.isEmpty, s"orders must not be rescanned:\n$lp")
      val got = q.collect().map(_.toString).toSeq
      graft.plans.MaterializedViews.clear()
      assert(got == q.collect().map(_.toString).toSeq)
      // DROP tears the planner registration down with the name
      graft.sql.GraftSql.sql(spark,
        """CREATE MATERIALIZED VIEW ddl_tile2 AS
          |SELECT o_orderstatus, COUNT(*) AS n
          |FROM orders_ddlmv GROUP BY o_orderstatus""".stripMargin)
      graft.sql.GraftSql.sql(spark, "DROP MATERIALIZED VIEW ddl_tile2")
      assert(!q.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"),
        "a dropped DDL materialization must stop answering rollups")
    } finally {
      try { graft.sql.GraftSql.sql(spark, "DROP MATERIALIZED VIEW IF EXISTS ddl_tile"); () }
      catch { case _: Exception => () }
      graft.plans.MaterializedViews.clear()
      spark.catalog.dropTempView("orders_ddlmv"); ()
    }
  }
}
