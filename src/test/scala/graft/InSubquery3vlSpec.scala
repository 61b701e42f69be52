package graft

import org.apache.spark.sql.Row
import graft.sql.GraftSql

/** Standard 3VL for a foldable-LHS IN-subquery in the projection
  * (plans/RowEquality.inSubquery3vl; ref row-equality.iq:499, validated
  * on PostgreSQL 14 per the corpus comment). Spark's own planner turns
  * this shape into ExistenceJoin, which answers FALSE where the
  * standard requires UNKNOWN — the lowering must produce TRUE / NULL /
  * FALSE / FALSE-on-empty exactly. */
class InSubquery3vlSpec extends SparkSpec {

  private def one(sqlText: String): Any =
    GraftSql.sql(spark, sqlText).collect() match {
      case Array(Row(v)) => v
      case other => fail(s"expected one row/col, got ${other.toSeq}")
    }

  test("row with NULL field vs matching row -> UNKNOWN (the lifted corpus case)") {
    assert(one("SELECT (1, CAST(NULL AS STRING)) IN (SELECT 1, CAST(NULL AS STRING)) AS r") == null)
  }

  test("exact match -> TRUE") {
    assert(one("SELECT (1, 'a') IN (SELECT 1, 'a') AS r") == true)
  }

  test("no match, no NULLs anywhere -> FALSE") {
    assert(one("SELECT (1, 'a') IN (SELECT 2, 'b') AS r") == false)
  }

  test("no certain match but a NULL row could match -> UNKNOWN") {
    assert(one("SELECT 1 IN (SELECT CAST(NULL AS INT)) AS r") == null)
  }

  test("NULL probe vs non-empty subquery -> UNKNOWN") {
    assert(one("SELECT CAST(NULL AS INT) IN (SELECT 5) AS r") == null)
  }

  test("empty subquery -> FALSE even for a NULL probe") {
    assert(one("SELECT CAST(NULL AS INT) IN (SELECT 5 WHERE 1 = 0) AS r") == false)
    assert(one("SELECT (1, CAST(NULL AS STRING)) IN (SELECT 1, 'a' WHERE 1 = 0) AS r") == false)
  }

  test("mismatch on a non-null field wins over a NULL field -> FALSE") {
    assert(one("SELECT (1, CAST(NULL AS STRING)) IN (SELECT 2, CAST(NULL AS STRING)) AS r") == false)
  }

  test("correlated and column-referencing forms keep Spark's own planning") {
    // a column-valued LHS is NOT foldable — the lowering must not touch
    // it (Spark's WHERE-position semantics are already correct there)
    val df = GraftSql.sql(spark,
      "SELECT x IN (SELECT 1) AS r FROM VALUES (1), (2) AS t(x) ORDER BY x")
    assert(df.collect().map(_.get(0)).toSeq == Seq(true, false))
  }
}
