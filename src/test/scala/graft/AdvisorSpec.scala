package graft

import graft.sql.Advisor

/** Completion-advisor behaviors, mirroring the reference's
  * SqlAdvisorTest.java contract (cursor = the ^ position there). */
class AdvisorSpec extends SparkSpec {

  private def hints(sql: String): Seq[String] = {
    val cur = sql.indexOf('^')
    Advisor.completionHints(spark, sql.replace("^", ""), cur).map(_.toString)
  }

  private def register(): Unit = {
    spark.sql("CREATE OR REPLACE TEMP VIEW emp AS SELECT 1 AS empno, 'x' AS ename, 10 AS deptno")
    spark.sql("CREATE OR REPLACE TEMP VIEW dept AS SELECT 10 AS deptno, 'Sales' AS dname")
  }

  test("FROM position: schemas + tables + from keywords (testFrom/testFromComplete)") {
    register()
    val h = hints("select a.empno from ^")
    assert(h.contains("TABLE(EMP)") && h.contains("TABLE(DEPT)"), h.mkString(", "))
    assert(h.contains("SCHEMA(DEFAULT)"), h.mkString(", "))
    assert(h.contains("KEYWORD(LATERAL)") && h.contains("KEYWORD(VALUES)"))
    // prefix filtering: from d^ keeps dept, drops emp
    val hd = hints("select a.empno from d^")
    assert(hd.contains("TABLE(DEPT)") && !hd.exists(_.startsWith("TABLE(EMP")), hd.mkString(", "))
  }

  test("schema-qualified FROM completes that schema's tables") {
    register()
    spark.sql("CREATE SCHEMA IF NOT EXISTS adv_s")
    try {
      spark.sql("CREATE TABLE IF NOT EXISTS adv_s.t1 (i INT) USING parquet")
      val h = hints("select * from adv_s.^")
      assert(h.contains("TABLE(T1)"), h.mkString(", "))
    } finally spark.sql("DROP SCHEMA IF EXISTS adv_s CASCADE")
  }

  test("GROUP ^ / ORDER ^ complete to KEYWORD(BY) (testGroup/testOrderByList)") {
    register()
    assert(hints("select deptno from emp group ^") == Seq("KEYWORD(BY)"))
    assert(hints("select deptno from emp order ^") == Seq("KEYWORD(BY)"))
    assert(hints("select deptno from emp order b^") == Seq("KEYWORD(BY)"))
  }

  test("select list completes to the FROM relations' columns (testSelectList)") {
    register()
    val h = hints("select ^ from emp")
    assert(h.contains("COLUMN(EMPNO)") && h.contains("COLUMN(ENAME)"), h.mkString(", "))
    assert(h.contains("KEYWORD(CASE)"))
    // multi-relation: both tables' columns
    val h2 = hints("select ^ from emp e, dept d")
    assert(h2.contains("COLUMN(DNAME)") && h2.contains("COLUMN(ENAME)"), h2.mkString(", "))
  }

  test("alias-qualified completion scopes to one relation (testSelectListAlias)") {
    register()
    val h = hints("select d.^ from emp e, dept d")
    assert(h.contains("COLUMN(DNAME)") && !h.contains("COLUMN(ENAME)"), h.mkString(", "))
    // prefix after the qualifier filters too
    val hp = hints("select d.dn^ from emp e, dept d")
    assert(hp == Seq("COLUMN(DNAME)"), hp.mkString(", "))
  }

  test("WHERE and JOIN ON are expression positions (testWhereList/testOnCondition)") {
    register()
    val h = hints("select * from emp where ^")
    assert(h.contains("COLUMN(DEPTNO)"), h.mkString(", "))
    val h2 = hints("select * from emp e join dept d on e.^")
    assert(h2.contains("COLUMN(EMPNO)") && !h2.contains("COLUMN(DNAME)"), h2.mkString(", "))
  }
}
