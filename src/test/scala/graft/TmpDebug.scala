package graft

class TmpDebug extends IqHarness {
  test("debug grouping dup exec") {
    spark.sql("""CREATE OR REPLACE TEMP VIEW emp AS SELECT * FROM VALUES
      ('Jane',10,'F'),('Bob',10,'M'),('Eric',20,'M'),('Susan',30,'F'),
      ('Alice',30,'F'),('Adam',50,'M'),('Eve',50,'F'),('Grace',60,'F'),
      ('Wilma',CAST(NULL AS INT),'F') AS t(ename, deptno, gender)""")
    val full = """select count(*) as c,
  grouping(deptno) as gd,
  grouping(deptno) as gid,
  (grouping(deptno) * 4 + grouping(gender) * 2 + grouping(deptno)) as gdgd,
  (grouping(deptno) * 4 + grouping(gender) * 2 + grouping(deptno)) as gidgd
from emp group by rollup(deptno, gender)
having grouping(deptno) <= (grouping(deptno) * 4 + grouping(gender) * 2 + grouping(deptno))"""
    try spark.sql(full).collect().foreach(r => info("ROW: " + r))
    catch { case e: Throwable => info("ERR: " + e.getMessage.take(300)) }
    val simple = full.replace("having grouping(deptno) <= (grouping(deptno) * 4 + grouping(gender) * 2 + grouping(deptno))",
      "having grouping(deptno) <= 1")
    try { spark.sql(simple).collect(); info("SIMPLE OK") }
    catch { case e: Throwable => info("ERR2: " + e.getMessage.take(200)) }
  }
}
