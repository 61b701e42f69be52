package graft.sql

/** The six conformance rewrites landed in round 9 (the round-8 snapshot
  * referenced them without implementing them): each mirrors a recorded
  * reference behavior from the case-skips it lifts. */
class CalciteRewritesSpec extends graft.SparkSpec {

  private def one(q: String): Any =
    GraftSql.sql(spark, CalciteTyping.rewrite(q)).collect()(0).get(0)

  private def col(q: String): List[Any] =
    GraftSql.sql(spark, CalciteTyping.rewrite(q)).collect().map(_.get(0)).toList

  test("inIsPostfix: unparenthesized IN-subquery under IS TRUE/UNKNOWN (sub-query.iq:1963)") {
    // the rewrite emits the 3VL CASE restatement, parenthesized so the
    // IS postfix binds over it
    val r = CalciteTyping.inIsPostfix("select a IN (select b from t) IS UNKNOWN from u")
    assert(r.contains("CASE WHEN") && r.contains("IS UNKNOWN from u") &&
      !r.contains("a IN (select b from t) IS UNKNOWN"))
    // already parenthesized / non-subquery forms stay put
    assert(CalciteTyping.inIsPostfix("select (a IN (select b from t)) IS TRUE from u") ==
      "select (a IN (select b from t)) IS TRUE from u")
    assert(CalciteTyping.inIsPostfix("select (a > 0) IS TRUE from u") ==
      "select (a > 0) IS TRUE from u")
    // end to end: NULL IN non-empty-set is UNKNOWN
    assert(one("select cast(null as int) IN (select x from VALUES (1), (2) t(x)) is unknown") == true)
    assert(one("select 1 IN (select x from VALUES (1), (2) t(x)) is true") == true)
    // non-null lhs missing from a null-bearing set: UNKNOWN, not FALSE
    assert(one("select 3 IN (select x from VALUES (1), (cast(null as int)) t(x)) is unknown") == true)
    // NOT IN flips through the same restatement
    assert(one("select 3 NOT IN (select x from VALUES (1), (2) t(x)) is true") == true)
  }

  test("orderByGrouping: grouping() in ORDER BY with the column absent from the select list (agg.iq:850)") {
    // rollup total sorts last (grouping=1), detail counts ascending
    assert(col("select count(*) as c from VALUES (10), (10), (20) t(deptno) " +
      "group by rollup(deptno) order by grouping(deptno), c") == List(1L, 2L, 3L))
    // natively-resolvable forms still give the same answer through the rewrite
    assert(col("select deptno, count(*) as c from VALUES (10), (20) t(deptno) " +
      "group by rollup(deptno) order by grouping(deptno), deptno")
      .map(String.valueOf) == List("10", "20", "null"))
  }

  test("valuesRowStrip: VALUES (ROW(...)) expands to the row's columns (join.iq:993, operator.iq:318)") {
    assert(CalciteTyping.valuesRowStrip(
      "SELECT a FROM (VALUES (ROW('k1', 1.0)), (ROW(NULL, NULL))) AS t(a, b)") ==
      "SELECT a FROM (VALUES ('k1', 1.0), (NULL, NULL)) AS t(a, b)")
    // only a ROW that IS the whole row item strips; inner ROWs stay
    assert(CalciteTyping.valuesRowStrip("VALUES (ROW(1), 2)") == "VALUES (ROW(1), 2)")
    assert(CalciteTyping.valuesRowStrip("VALUES (ROW(ROW(3, 7), ROW(4, 8)))") ==
      "VALUES (ROW(3, 7), ROW(4, 8))")
    // end to end with 1-based struct ordinal subscripts (operator.iq:322-357)
    assert(one("select T.X[1] from (VALUES (ROW(ROW(3, 7), ROW(4, 8)))) as T(x, y)") == 3)
    assert(one("select T.X[CAST(2 AS BIGINT)] from (VALUES (ROW(ROW(3, 7), ROW(4, 8)))) as T(x, y)") == 7)
    assert(one("select T.Y[CAST(1 AS TINYINT)] from (VALUES (ROW(ROW(3, 7), ROW(4, 8)))) as T(x, y)") == 4)
  }

  test("rowTypeCast: CAST(x AS ROW(...)) type syntax (cast.iq:2049)") {
    assert(CalciteTyping.rowTypeCast("CAST(x AS ROW(a INTEGER, b VARCHAR(2)))") ==
      "CAST(x AS STRUCT<a: INTEGER, b: VARCHAR(2)>)")
    assert(CalciteTyping.rowTypeCast("CAST(x AS ROW(a ROW(x INTEGER, y CHAR(1)), b INTEGER))") ==
      "CAST(x AS STRUCT<a: STRUCT<x: INTEGER, y: CHAR(1)>, b: INTEGER>)")
    val r = GraftSql.sql(spark, CalciteTyping.rewrite(
      "SELECT CAST(ROW(ROW(2, 'b'), 20) AS ROW(a ROW(x INTEGER, y CHAR(1)), b INTEGER)) AS r"))
      .collect()(0).getStruct(0)
    assert(r.getStruct(0).getInt(0) == 2 && r.getInt(1) == 20)
  }

  test("decimalPrecisionClamp: precision beyond the max clamps (CALCITE-4871, cast.iq:860)") {
    assert(CalciteTyping.decimalPrecisionClamp("cast(15.3 as decimal(1000, 4))") ==
      "cast(15.3 as decimal(38, 4))")
    assert(CalciteTyping.decimalPrecisionClamp("cast(15.3 as decimal(10, 4))") ==
      "cast(15.3 as decimal(10, 4))")
    assert(one("select cast(15.3 as decimal(1000, 4))").toString == "15.3000")
  }

  test("bareCastTimestampTrunc: default TIMESTAMP precision 0, literal precision 3 (misc.iq:2148)") {
    // bare cast truncates to whole seconds
    assert(one("select cast('2016-02-26 19:06:00.123' as timestamp)").toString ==
      "2016-02-26 19:06:00.0")
    // TIMESTAMP(p) keeps p digits
    assert(one("select cast('2016-02-26 19:06:00.123' as timestamp(1))").toString ==
      "2016-02-26 19:06:00.1")
    assert(one("select cast('2016-02-26 19:06:00.123' as timestamp(3))").toString ==
      "2016-02-26 19:06:00.123")
    assert(one("select cast('2016-02-26 19:06:00.123' as timestamp(9))").toString ==
      "2016-02-26 19:06:00.123")
    // literals truncate their text beyond 3 digits
    assert(one("select TIMESTAMP '2016-02-26 19:06:00.123456789'").toString ==
      "2016-02-26 19:06:00.123")
    // a FORMAT-clause cast is untouched by this rewrite
    assert(CalciteTyping.bareCastTimestampTrunc(
      "cast('12-2010-05' as timestamp format 'DD-YYYY-MM')") ==
      "cast('12-2010-05' as timestamp format 'DD-YYYY-MM')")
  }
}
