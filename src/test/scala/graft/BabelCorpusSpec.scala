package graft

import scala.collection.mutable.ArrayBuffer

/** Babel (dialect) conformance measurement: runs the SELECT statements of
  * the reference's BigQuery dialect corpus
  * (babel/src/test/resources/sql/big-query.iq, ~4.9k lines) through
  * GraftSql and value-compares against the recorded outputs, RECORDING
  * the coverage ratio rather than demanding 100%: the corpus exists to
  * measure how much of a foreign dialect the rewriter + Spark's own
  * BigQuery-compatible surface absorb.
  *
  * The gate pins a floor on the measured pass count so dialect coverage
  * can only ratchet up; the full failure list lands in
  * target/babel-failures.txt for the next construct to fix.
  */
class BabelCorpusSpec extends IqHarness {

  private val babelDir = new java.io.File("/root/reference/babel/src/test/resources/sql")

  private def clean(sql: String): String = graft.sql.BigQueryDialect.rewrite(sql)

  /** Documented divergences, keyed by statement line (file is frozen). */
  // (1949/4269 mixed-literal union coercion and 2009/2031 interval cast
  // display: lifted in round 9 by BigQueryDialect.rewriteMixedUnionLits
  // and rewriteSafeCastIntervalLit; 3055 integer-literal division,
  // 3286/3322 LPAD/RPAD over BYTES: lifted in round 7)
  private val skipCases: Map[Int, String] = Map.empty

  private def cleanPg(sql: String): String = graft.sql.PostgresDialect.rewrite(sql)
  private def cleanRs(sql: String): String = graft.sql.RedshiftDialect.rewrite(sql)

  private def measureDialect(file: String, use: String, clean: String => String,
      floor: Int, envSkip: String => Boolean = _ => false): Unit = {
    assume(babelDir.isDirectory, "reference checkout not present")
    registerScott()
    val allCases = parseIq(new java.io.File(babelDir, file))
      .filter(c => c.ddl || c.use == use)
    val envSkipped = allCases.count(c => !c.ddl && envSkip(c.sql))
    val cases = allCases.filterNot(c => !c.ddl && envSkip(c.sql))
    var pass = 0
    val failures = ArrayBuffer.empty[String]
    val created = scala.collection.mutable.Set.empty[String]
    // all recorded outputs come from an escape-preserving parser
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    try for (c <- cases) {
      if (c.ddl) {
        try {
          val ddl = clean(c.sql)
            .replaceFirst("(?i)^\\s*CREATE\\s+OR\\s+REPLACE\\s+TABLE", "CREATE TABLE")
          "(?i)^\\s*CREATE\\s+TABLE\\s+(\\w+)".r.findFirstMatchIn(ddl).foreach { mm =>
            spark.sql(s"DROP TABLE IF EXISTS ${mm.group(1)}")
            created += mm.group(1)
          }
          spark.sql(ddl)
        } catch { case scala.util.control.NonFatal(_) => () } // downstream cases fail visibly
      } else compareCase(c, clean(c.sql)) match {
        case None => pass += 1
        case Some(err) =>
          failures += s"${c.file}:${c.line}: $err\n  SQL: ${c.sql.linesIterator.mkString(" ").take(160)}"
      }
    } finally {
      spark.conf.unset("spark.sql.parser.escapedStringLiterals")
      created.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    }
    val total = cases.count(!_.ddl)
    info(f"babel $file coverage: $pass/$total (${100.0 * pass / math.max(total, 1)}%.1f%%)" +
      (if (envSkipped > 0) s" + $envSkipped environment skips" else ""))
    val fw = new java.io.PrintWriter(s"target/babel-$use-failures.txt", "UTF-8")
    try failures.foreach(fw.println) finally fw.close()
    assert(pass >= floor, s"$file coverage dropped: $pass passing (floor $floor)")
  }

  test("babel postgresql corpus: measured dialect coverage") {
    // residue: Calcite-specific INTERVAL cast rendering (+3721.000000)
    measureDialect("postgresql.iq", "scott-postgresql", cleanPg, 264)
  }

  test("babel redshift corpus: measured dialect coverage") {
    // 3 ENVIRONMENT skips (not failures, not passes): bare SELECT
    // CURRENT_USER/SESSION_USER/USER record the reference harness's
    // hsqldb connection user 'sa' (redshift.iq:2147/2214/2227) — the
    // value is the environment's, so the cases are excluded from the
    // count rather than pinned to the fixture string
    val sessionUser =
      "(?is)^\\s*SELECT\\s+(CURRENT_USER|SESSION_USER|USER)\\s*;?\\s*$".r
    measureDialect("redshift.iq", "scott-redshift", cleanRs, 119,
      envSkip = sql => sessionUser.findFirstIn(sql).isDefined)
  }

  test("babel spark corpus: the home dialect passes near-verbatim") {
    // Spark IS the engine here; the adapter covers the reference's
    // COLLECTION surfaces (MULTISET ops/literals, IS EMPTY, type syntax)
    measureDialect("spark.iq", "scott-spark", graft.sql.SparkDialect.rewrite, 94)
  }

  test("babel within-group-over corpus: WITHIN GROUP aggregates as window functions") {
    // Oracle's `agg(...) WITHIN GROUP (ORDER BY ...) OVER (...)` — the
    // BABEL conformance's allowWithinGroupOverAggregate; Spark 4 parses
    // the form natively (listagg), so the corpus runs unrewritten
    assume(babelDir.isDirectory, "reference checkout not present")
    registerScott()
    val cases = parseIq(new java.io.File(babelDir, "within-group-over.iq"))
      .filter(c => !c.ddl && c.use == "scott-babel")
    assert(cases.size >= 3)
    val failures = cases.flatMap(c => compareCase(c, quoteIdents(c.sql)).map(e => s"${c.line}: $e"))
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("babel select corpus: non-standard SELECT clauses (EXCLUDE/EXCEPT/BY/SEMI/ANTI)") {
    assume(babelDir.isDirectory, "reference checkout not present")
    registerScott()
    val cases = parseIq(new java.io.File(babelDir, "select.iq"), extended = true)
      .filter(c => !c.ddl && c.use == "scott-babel")
    // LIMIT 1 with no ORDER BY over a join: which row survives is
    // engine-specific (the reference's recorded row is CLARK, Spark's
    // first-partition row is SMITH) — same divergence class as the core
    // corpus's struct.iq:170 skip
    val limitNoOrder = Set(131, 152, 269)
    var pass = 0
    var skipped = 0
    val failures = ArrayBuffer.empty[String]
    for (c <- cases if { val s = limitNoOrder.contains(c.line); if (s) skipped += 1; !s })
      c.kind match {
      case "validate" =>
        // the reference only validates these (no execution); analysis
        // must succeed
        try { graft.sql.GraftSql.sql(spark, quoteIdents(c.sql)).schema; pass += 1 }
        catch { case ex: Throwable =>
          failures += s"${c.line} [validate]: ${ex.getClass.getSimpleName}: ${Option(ex.getMessage).getOrElse("").linesIterator.take(1).mkString}"
        }
      case "error" =>
        try {
          graft.sql.GraftSql.sql(spark, quoteIdents(c.sql)).collect()
          failures += s"${c.line} [error]: expected failure, statement succeeded"
        } catch { case _: Throwable => pass += 1 }
      case _ =>
        compareCase(c, quoteIdents(c.sql)) match {
          case None => pass += 1
          case Some(err) => failures += s"${c.line}: $err\n  SQL: ${c.sql.linesIterator.mkString(" ").take(160)}"
        }
    }
    info(s"babel select.iq: $pass/${cases.size} pass, $skipped documented skips")
    val fw = new java.io.PrintWriter("target/babel-select-failures.txt", "UTF-8")
    try failures.foreach(fw.println) finally fw.close()
    assert(failures.isEmpty, s"select.iq failures (${failures.size}):\n${failures.take(12).mkString("\n")}")
  }

  test("babel big-query corpus: measured dialect coverage with a ratcheted floor") {
    assume(babelDir.isDirectory, "reference checkout not present")
    registerScott()
    val cases = parseIq(new java.io.File(babelDir, "big-query.iq"))
      .filter(c => !c.ddl && c.use == "scott-big-query")
    var pass = 0
    var skipped = 0
    val failures = ArrayBuffer.empty[String]
    // the reference corpus records outputs from a parser that keeps
    // backslashes literal in string literals (standard SQL); Spark's
    // default processes them as escapes
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    try for (c <- cases) {
      if (skipCases.contains(c.line)) skipped += 1
      else compareCase(c, clean(c.sql)) match {
        case None => pass += 1
        case Some(err) =>
          failures += s"${c.file}:${c.line}: $err\n  SQL: ${c.sql.linesIterator.mkString(" ").take(200)}"
      }
    } finally spark.conf.unset("spark.sql.parser.escapedStringLiterals")
    val total = cases.size
    info(f"babel big-query coverage: $pass/$total (${100.0 * pass / math.max(total, 1)}%.1f%%), $skipped documented-divergence skips")
    val fw = new java.io.PrintWriter("target/babel-failures.txt", "UTF-8")
    try failures.foreach(fw.println) finally fw.close()
    assert(total >= 200, s"parser found only $total cases — quidem parsing regressed")
    // ratchet: raise this floor when new dialect rewrites land
    assert(pass >= 219, s"babel coverage dropped: $pass passing (floor 219)")
    assert(failures.isEmpty,
      s"undocumented babel failures (${failures.size}):\n${failures.take(10).mkString("\n")}")
  }
}
