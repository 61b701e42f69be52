package graft

import scala.collection.mutable.ArrayBuffer

import graft.sql.GraftSql

/** TPC-DS frontend conformance: all 99 queries of the reference's tpcds
  * corpus (plus/src/test/resources/sql/tpcds/01..99.sql — the standard
  * TPC-DS workload the reference's planner tests parse) run through
  * GraftSql against the canonical TPC-DS catalog
  * (catalog/TpcdsCatalog.scala) and EXECUTE end to end (collect) — the
  * corpus ships no recorded outputs (the reference uses it for
  * parse/plan tests), so the contract checked here is that every query
  * analyzes, optimizes, and runs; value-level TPC-DS-shaped coverage is
  * the ds01-ds06 oracle pack.
  *
  * Empty inputs still exercise the whole frontend: CTEs, correlated
  * subqueries, ROLLUP/GROUPING, window functions, INTERVAL arithmetic,
  * EXISTS/IN chains — an unresolved column or unsupported construct
  * fails loudly at analysis, not silently at runtime.
  */
class TpcdsCorpusSpec extends IqHarness {

  private val dir = new java.io.File("/root/reference/plus/src/test/resources/sql/tpcds")

  /** Documented divergences (query number -> reason). */
  private val skips: Map[Int, String] = Map.empty

  test("all 99 TPC-DS queries analyze and execute through GraftSql") {
    assume(dir.isDirectory, "reference checkout not present")
    graft.catalog.TpcdsCatalog.registerEmpty(spark)
    var pass = 0
    val failures = ArrayBuffer.empty[String]
    // ANSI off for the corpus EXECUTION only: the reference harness
    // parses/plans these files without running them, and the empty
    // fixture hits data-dependent ANSI runtime errors that are not
    // frontend gaps (58/83 compare d_date against an unsubstituted
    // qgen token 'date(1998+"-01-01",...)' — an invalid DATE cast;
    // 90 computes 0/0 over the empty fact table)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try for (n <- 1 to 99) {
      val f = new java.io.File(dir, f"$n%02d.sql")
      if (f.isFile && !skips.contains(n)) {
        val sql = scala.io.Source.fromFile(f, "UTF-8").mkString
        try {
          // the corpus double-quotes identifiers ("order count") per the
          // reference's lexer; Spark quotes with backticks
          GraftSql.sql(spark, quoteIdents(sql)).collect()
          pass += 1
        } catch {
          case ex: Throwable =>
            failures += f"$n%02d: ${ex.getClass.getSimpleName}: " +
              Option(ex.getMessage).getOrElse("").linesIterator.take(2).mkString(" | ").take(300)
        }
      }
    } finally spark.conf.unset("spark.sql.ansi.enabled")
    info(s"tpcds: $pass/99 queries run end to end, ${skips.size} documented skips")
    val fw = new java.io.PrintWriter("target/tpcds-failures.txt", "UTF-8")
    try failures.foreach(fw.println) finally fw.close()
    assert(failures.isEmpty,
      s"tpcds failures (${failures.size}):\n${failures.take(10).mkString("\n")}")
    assert(pass + skips.size >= 99, s"tpcds coverage dropped: $pass")
  }
}
