package graft

import scala.collection.mutable.ArrayBuffer

/** Measured coverage over the reference's dialect-function corpus
  * (core/src/test/resources/sql/functions.iq — MySQL/Oracle/MSSQL/
  * BigQuery/foodmart operator-table cases). Statements route through
  * [[graft.sql.FunctionsDialect]] per `!use` section and value-compare
  * the recorded outputs; failures land in target/functions-failures.txt
  * and the floor ratchets as functions land.
  */
class FunctionsCorpusSpec extends IqHarness {

  private val refSqlDir = new java.io.File("/root/reference/core/src/test/resources/sql")

  /** POST.EMPS_DATE_TIME (CalciteAssert.java:1030-1041) and the first
    * foodmart employee ids (employee_id 1, 2, 4, 5 — single partition so
    * LIMIT without ORDER BY stays deterministic). */
  private def registerFixtures(): Unit = {
    spark.sql("""
      CREATE OR REPLACE TEMP VIEW emps_date_time AS SELECT * FROM VALUES
        (100, 'Fred',  10, DATE '1996-08-03', '16:22:34', TIMESTAMP '1996-08-03 16:22:34'),
        (110, 'Eric',  20, DATE '2001-01-01', '12:20:00', TIMESTAMP '2001-01-01 12:20:00'),
        (110, 'John',  40, DATE '2002-05-03', '13:12:14', TIMESTAMP '2002-05-03 13:12:14'),
        (120, 'Wilma', 20, DATE '2005-09-07', '06:02:04', TIMESTAMP '2005-09-07 06:02:04'),
        (130, 'Alice', 40, DATE '2007-01-01', '23:09:59', TIMESTAMP '2007-01-01 23:09:59')
        AS t(empno, name, deptno, joinedat, joinetime, joinetimestamp)""")
    spark.sql("""
      CREATE OR REPLACE TEMP VIEW employee AS
      SELECT * FROM VALUES (1), (2), (4), (5) AS t(employee_id)""")
    spark.sql("""
      CREATE OR REPLACE TEMP VIEW hr_emps AS SELECT * FROM VALUES
        (100, 10, 'Bill', CAST(10000 AS DOUBLE), CAST(1000 AS INT)),
        (200, 20, 'Eric', CAST(8000 AS DOUBLE), 500),
        (150, 10, 'Sebastian', CAST(7000 AS DOUBLE), CAST(NULL AS INT)),
        (110, 10, 'Theodore', CAST(11500 AS DOUBLE), 250)
        AS t(empid, deptno, name, salary, commission)""")
  }

  /** Case-level skips: reference-internal machinery, each with the
    * reason. */
  private val skipCases: Map[Int, String] = Map(
    1144 -> ("AUX.TBLFUN_IDENTITY is reference-internal test machinery " +
      "(a Java table function registered by the quidem fixture); the " +
      "engine's own polymorphic TVF surface is covered by q119/q121"))

  private def clean(use: String, sql: String): String =
    graft.sql.FunctionsDialect.rewrite(use,
      quoteIdents(sql.replaceAll("(?i)\"hr\"\\.\"emps\"", "hr_emps")))

  test("reference functions.iq corpus: measured dialect-function coverage") {
    assume(refSqlDir.isDirectory, "reference checkout not present")
    graft.sql.FunctionsDialect.registerAll(spark)
    registerFixtures()
    val cases = parseIq(new java.io.File(refSqlDir, "functions.iq")).filterNot(_.ddl)
    var pass = 0
    var skipped = 0
    val failures = ArrayBuffer.empty[String]
    for (c <- cases) {
      skipCases.get(c.line) match {
        case Some(_) => skipped += 1
        case None =>
          compareCase(c, clean(c.use, c.sql)) match {
            case None => pass += 1
            case Some(err) =>
              failures += s"${c.file}:${c.line} [${c.use}]: ${err.linesIterator.take(1).mkString}\n  SQL: ${c.sql.linesIterator.mkString(" ").take(160)}"
          }
      }
    }
    info(s"functions corpus: $pass/${cases.size} passing ($skipped skipped)")
    val fw = new java.io.PrintWriter("target/functions-failures.txt", "UTF-8")
    try failures.foreach(fw.println) finally fw.close()
    assert(pass >= 90, s"functions corpus coverage dropped: $pass passing (floor 90)")
  }
}
