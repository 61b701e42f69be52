package graft

import graft.sql.{CollectionSql, GraftSql}

/** Value checks for the collection-literal/ITEM/FLOOR-TO surface lowered
  * by sql/CollectionSql.scala (ref: Parser.jj ARRAY/MAP constructors,
  * SqlStdOperatorTable ITEM/FLOOR/CEIL/EVERY, SqlCountAggFunction,
  * SqlGroupingFunction; recorded behaviors from operator.iq:247-292 and
  * agg.iq). */
class CollectionSqlSpec extends SparkSpec {

  private def one(q: String): Any =
    GraftSql.sql(spark, q).collect()(0).get(0)

  private def row(q: String): org.apache.spark.sql.Row =
    GraftSql.sql(spark, q).collect()(0)

  test("ARRAY[...] and MAP[...] literals lower to array()/map()") {
    assert(CollectionSql.rewriteArrayMap("select array[1,2]") == "select array(1,2)")
    assert(CollectionSql.rewriteArrayMap("select map['a', 1, 'b', 2]") ==
      "select map('a', 1, 'b', 2)")
    // nested + string content containing brackets stays intact
    assert(CollectionSql.rewriteArrayMap("select array[array[1],'a[' ]") ==
      "select array(array(1),'a[' )")
    assert(one("SELECT array[1,2,3]").asInstanceOf[scala.collection.Seq[_]].toList == List(1, 2, 3))
    assert(one("SELECT map['k', 7]['k']") == 7)
  }

  test("ITEM subscript is 1-based, NULL out of range (arrays, maps, rows)") {
    assert(one("SELECT array[10,20,30][1]") == 10)
    assert(one("SELECT array[10,20,30][3]") == 30)
    assert(one("SELECT array[10,20,30][4]") == null)
    assert(one("SELECT array[10,20,30][0]") == null)
    assert(one("SELECT map['a', 1]['zz']") == null)
    // row-ordinal access (operator.iq:322 `"T"."X"[1]`)
    assert(one("SELECT t.x[1] FROM (SELECT struct(3, 7) AS x) t") == 3)
    assert(one("SELECT t.x[2] FROM (SELECT struct(3, 7) AS x) t") == 7)
    // nested subscripts
    assert(one("SELECT array[array[1,2],array[3,4]][2][1]") == 3)
  }

  test("FLOOR/CEIL(date TO unit) preserves DATE and uses Sunday weeks") {
    val r = row("SELECT floor(date '2019-07-05' TO year), " +
      "floor(date '2019-07-05' TO quarter), floor(date '2019-07-05' TO month), " +
      "floor(date '2019-07-05' TO week), floor(date '2019-07-05' TO day), " +
      "ceil(date '2019-07-05' TO year), ceil(date '2019-07-05' TO week)")
    assert(r.get(0).toString == "2019-01-01")
    assert(r.get(1).toString == "2019-07-01")
    assert(r.get(2).toString == "2019-07-01")
    assert(r.get(3).toString == "2019-06-30") // reference week floor = Sunday
    assert(r.get(4).toString == "2019-07-05")
    assert(r.get(5).toString == "2020-01-01")
    assert(r.get(6).toString == "2019-07-07")
    assert(GraftSql.sql(spark,
      "SELECT floor(date '2019-07-05' TO month)").schema.head.dataType ==
      org.apache.spark.sql.types.DateType)
  }

  test("FLOOR/CEIL(timestamp TO unit) matches operator.iq:270") {
    val r = row("SELECT " +
      "ceil(timestamp '2019-07-05 12:34:56' TO day), " +
      "ceil(timestamp '2019-07-05 12:34:56' TO hour), " +
      "ceil(timestamp '2019-07-05 12:34:56' TO second), " +
      "floor(timestamp '2019-07-05 12:34:56' TO week), " +
      "ceil(timestamp '2019-07-05 12:34:56' TO week)")
    assert(r.get(0).toString == "2019-07-06 00:00:00.0")
    assert(r.get(1).toString == "2019-07-05 13:00:00.0")
    assert(r.get(2).toString == "2019-07-05 12:34:56.0") // aligned: identity
    assert(r.get(3).toString == "2019-06-30 00:00:00.0")
    assert(r.get(4).toString == "2019-07-07 00:00:00.0")
  }

  test("composite COUNT(a, b) counts rows where every argument is non-null") {
    assert(one("SELECT count(a, b) FROM VALUES (1, 1), (1, NULL), (NULL, 1), (2, 2) t(a, b)") == 2L)
    // DISTINCT multi-arg is Spark-native and must NOT be rewritten
    assert(one("SELECT count(DISTINCT a, b) FROM VALUES (1, 1), (1, 1), (2, 2) t(a, b)") == 2L)
  }

  test("EVERY lowers to bool_and; multi-arg GROUPING to grouping_id") {
    assert(one("SELECT every(x > 0) FROM VALUES (1), (2) t(x)") == true)
    assert(one("SELECT every(x > 1) FROM VALUES (1), (2) t(x)") == false)
    val rows = GraftSql.sql(spark,
      "SELECT grouping(a, b), count(*) FROM VALUES (1, 2) t(a, b) " +
        "GROUP BY rollup(a, b) ORDER BY 1").collect()
    assert(rows.map(_.get(0)).toSeq == Seq(0, 1, 3))
  }

  test("UNNEST: scalar/tuple/map/zip/ordinality/subquery/correlated") {
    def rows(q: String): Seq[Seq[Any]] =
      GraftSql.sql(spark, q).collect().toSeq.map(r => (0 until r.length).map(r.get))
    assert(rows("select * from unnest(array[1, 2])") == Seq(Seq(1), Seq(2)))
    assert(rows("select x, y from unnest(array [(1, 'a'), (2, 'b')]) as t (x, y)") ==
      Seq(Seq(1, "a"), Seq(2, "b")))
    assert(rows("select fruit from UNNEST(array ['apple']) as fruit") == Seq(Seq("apple")))
    // ordinality is 1-based and projected LAST
    assert(rows("select * from unnest(array[10, 20]) with ordinality as t(i, o)") ==
      Seq(Seq(10, 1), Seq(20, 2)))
    assert(rows("select * from unnest(map['x', 10]) as t(k, v)") == Seq(Seq("x", 10)))
    // zip semantics with null padding (CALCITE-7583)
    assert(rows("select * from unnest(array[10, 20, 30], array[1, 2]) as t(a, b)") ==
      Seq(Seq(10, 1), Seq(20, 2), Seq(30, null)))
    // subquery operand: ordinality resets per input row
    assert(rows("select * from unnest(select t.x from (values array[10, 20], array[30]) as t(x)) with ordinality as t(a, o)")
      .sortBy(_.head.asInstanceOf[Int]) == Seq(Seq(10, 1), Seq(20, 2), Seq(30, 1)))
    // correlated comma-join → LATERAL VIEW
    assert(rows("select x, z from (values (1, array[7, 8])) t(x, ys), unnest(t.ys) as z") ==
      Seq(Seq(1, 7), Seq(1, 8)))
  }

  test("OVERLAPS normalizes (high, low) operand order; endpoint touch is false") {
    assert(one("SELECT (date '2001-12-31', date '1999-12-01') overlaps (date '2001-01-01', date '2002-11-11')") == true)
    assert(one("SELECT (date '1999-12-01', date '2001-12-31') overlaps (date '2002-01-01', date '2002-11-11')") == false)
    // equal starts overlap even for zero-length periods
    assert(one("SELECT (date '2001-01-01', date '2001-01-01') overlaps (date '2001-01-01', date '2001-01-05')") == true)
  }

  test("niladic PI and bare-LATERAL alias") {
    assert(one("SELECT pi > 3.14 AND pi < 3.15") == true)
    assert(one("SELECT 1 AS pi") == 1) // alias named pi survives
    assert(one("SELECT dd FROM (SELECT 1 AS deptno) d, LATERAL (SELECT d.deptno + 1 AS dd)") == 2)
  }

  test("quantified comparison over an array operand (exists/forall 3VL)") {
    assert(one("SELECT 1 = any(array[1, 2, 3])") == true)
    assert(one("SELECT 4 = any(array[1, 2, 3])") == false)
    assert(one("SELECT 4 = any(array[1, null])") == null) // no match + null → UNKNOWN
    assert(one("SELECT 0 < all(array[1, 2])") == true)
    assert(one("SELECT 1 < all(array[])") == true) // ALL over empty is TRUE
  }

  test("MULTISET family: literals, bag ops in consume-first order, predicates") {
    def arr(q: String): List[Any] =
      one(q).asInstanceOf[scala.collection.Seq[_]].toList
    // each right occurrence cancels the EARLIEST left one (operator.iq:151)
    assert(arr("SELECT multiset['a', 'c', 'a'] multiset except multiset['a']") == List("c", "a"))
    assert(arr("SELECT multiset['a', 'c', 'a', 'a'] multiset intersect multiset['a', 'a']") == List("a", "a"))
    assert(arr("SELECT multiset['a', 'c', 'b'] multiset union distinct multiset['a']") == List("a", "b", "c"))
    assert(arr("SELECT multiset['a', 'c', 'b'] multiset union multiset['a']") == List("a", "c", "b", "a"))
    assert(one("SELECT multiset[1] SUBMULTISET OF multiset[1, 2]") == true)
    assert(one("SELECT multiset[1, 1] IS A SET") == false)
    assert(one("SELECT multiset[1] IS NOT EMPTY") == true)
    // FUSION = bag union of a group's collections; INTERSECTION folds
    assert(arr("SELECT fusion(x) FROM VALUES (array(1, 2)), (array(3)) t(x)").sorted(Ordering.by((a: Any) => a.toString)) == List(1, 2, 3))
    assert(arr("SELECT intersection(x) FROM VALUES (array(1, 2)), (array(2, 3)) t(x)") == List(2))
    // SOME as an aggregate (no comparison precedes) is bool_or
    assert(one("SELECT some(x > 2) FROM VALUES (1), (3) t(x)") == true)
  }

  test("JSON_OBJECT / JSON_ARRAYAGG constructors") {
    assert(one("SELECT json_object('a': 1, 'b': 'x')") == """{"a":1,"b":"x"}""")
    // NULL ON NULL is the default for JSON_OBJECT
    assert(one("SELECT json_object('a': cast(null as int))") == """{"a":null}""")
    assert(one("SELECT json_object('a': cast(null as int) absent on null)") == "{}")
    assert(one("SELECT json_arrayagg(x) FROM VALUES (3), (1) t(x)") == "[3,1]")
    assert(one("SELECT json_arrayagg(x order by x) FROM VALUES (3), (1) t(x)") == "[1,3]")
    assert(one("SELECT json_arrayagg(x order by x desc) FROM VALUES (3), (1) t(x)") == "[3,1]")
    // default ABSENT ON NULL drops nulls; NULL ON NULL keeps them
    assert(one("SELECT json_arrayagg(x) FROM VALUES (1), (cast(null as int)) t(x)") == "[1]")
    assert(one("SELECT json_arrayagg(x null on null) FROM VALUES (1), (cast(null as int)) t(x)") == "[1,null]")
    // single-arg LISTAGG takes the reference's ',' default separator
    assert(one("SELECT listagg(x) FROM VALUES ('a'), ('b') t(x)") == "a,b")
  }

  test("aggregate ANY_VALUE→MAX is conformance-dialect only; product stays native") {
    // the conformance adapter reproduces the reference's enumerable
    // engine, which computes ANY_VALUE as MAX (agg.iq:2899)
    assert(one(graft.sql.CalciteTyping.rewrite(
      "SELECT any_value(x) FROM VALUES (1), (9), (5) t(x)")) == 9)
    // the PRODUCT pipeline keeps Spark's any_value: works on
    // non-orderable types in AGGREGATE position too (max would reject)
    assert(one("SELECT any_value(m) FROM (SELECT map(1, 2) m)")
      .asInstanceOf[scala.collection.Map[_, _]].head == (1 -> 2))
    // windowed ANY_VALUE on non-comparable types (CALCITE-4813)
    assert(one("SELECT any_value(m) over() FROM (SELECT map(1, 2) m)")
      .asInstanceOf[scala.collection.Map[_, _]].head == (1 -> 2))
  }

  test("SQL_TSI_* units in TIMESTAMPADD/TIMESTAMPDIFF") {
    assert(one("SELECT timestampadd(SQL_TSI_DAY, 2, timestamp '2019-07-05 00:00:00')")
      .toString == "2019-07-07 00:00:00.0")
    assert(one("SELECT timestampdiff(SQL_TSI_HOUR, timestamp '2019-07-05 00:00:00', " +
      "timestamp '2019-07-05 12:00:00')") == 12L)
  }
}
