package graft

import scala.collection.mutable.ArrayBuffer

import graft.sql.GraftSql

/** Reference conformance corpus: executes SQL statements drawn from the
  * reference's quidem corpora (.iq files in core/src/test/resources/sql —
  * thousands of ready-made engine-neutral SQL cases with recorded
  * outputs) through GraftSql.sql and value-compares against the recorded
  * expected tables. The .iq files are parsed AT TEST TIME from the
  * read-only reference checkout — nothing is copied into this repo.
  *
  * Fixtures: the public `scott` (EMP/DEPT/BONUS/SALGRADE, the classic
  * Oracle demo schema shipped as net.hydromatic:scott-data-hsqldb) and
  * `post` (CalciteAssert.java:964-1006) schemas, registered as temp
  * views from VALUES.
  *
  * Comparison: row MULTISETS of normalized cell strings (numerics via
  * BigDecimal.stripTrailingZeros, null = empty cell, names
  * case-insensitive). Ordering under ORDER BY ties is engine-specific
  * in the recorded outputs, so order is not asserted here — dedicated
  * collation specs cover it.
  *
  * Skips are explicit: `skipConstructs` documents semantic divergences
  * (each with the reason), `skipCases` pins individual statements. The
  * gate asserts every non-skipped eligible case passes and that the
  * passing count is >= 100.
  */
class CorpusSpec extends SparkSpec {

  private val refSqlDir = new java.io.File("/root/reference/core/src/test/resources/sql")

  // ---- fixture schemas --------------------------------------------------

  private def registerScott(): Unit = {
    spark.sql("""
      CREATE OR REPLACE TEMP VIEW emp AS
      SELECT empno, ename, job, mgr, hiredate,
             CAST(sal AS DECIMAL(7,2)) AS sal,
             CAST(comm AS DECIMAL(7,2)) AS comm, deptno
      FROM VALUES
        (7369,'SMITH','CLERK',7902,DATE'1980-12-17',800.00,CAST(NULL AS DECIMAL(7,2)),20),
        (7499,'ALLEN','SALESMAN',7698,DATE'1981-02-20',1600.00,300.00,30),
        (7521,'WARD','SALESMAN',7698,DATE'1981-02-22',1250.00,500.00,30),
        (7566,'JONES','MANAGER',7839,DATE'1981-02-04',2975.00,CAST(NULL AS DECIMAL(7,2)),20),
        (7654,'MARTIN','SALESMAN',7698,DATE'1981-09-28',1250.00,1400.00,30),
        (7698,'BLAKE','MANAGER',7839,DATE'1981-01-05',2850.00,CAST(NULL AS DECIMAL(7,2)),30),
        (7782,'CLARK','MANAGER',7839,DATE'1981-06-09',2450.00,CAST(NULL AS DECIMAL(7,2)),10),
        (7788,'SCOTT','ANALYST',7566,DATE'1987-04-19',3000.00,CAST(NULL AS DECIMAL(7,2)),20),
        (7839,'KING','PRESIDENT',CAST(NULL AS INT),DATE'1981-11-17',5000.00,CAST(NULL AS DECIMAL(7,2)),10),
        (7844,'TURNER','SALESMAN',7698,DATE'1981-09-08',1500.00,0.00,30),
        (7876,'ADAMS','CLERK',7788,DATE'1987-05-23',1100.00,CAST(NULL AS DECIMAL(7,2)),20),
        (7900,'JAMES','CLERK',7698,DATE'1981-12-03',950.00,CAST(NULL AS DECIMAL(7,2)),30),
        (7902,'FORD','ANALYST',7566,DATE'1981-12-03',3000.00,CAST(NULL AS DECIMAL(7,2)),20),
        (7934,'MILLER','CLERK',7782,DATE'1982-01-23',1300.00,CAST(NULL AS DECIMAL(7,2)),10)
        AS t(empno, ename, job, mgr, hiredate, sal, comm, deptno)""")
    spark.sql("""
      CREATE OR REPLACE TEMP VIEW dept AS SELECT * FROM VALUES
        (10,'ACCOUNTING','NEW YORK'),(20,'RESEARCH','DALLAS'),
        (30,'SALES','CHICAGO'),(40,'OPERATIONS','BOSTON')
        AS t(deptno, dname, loc)""")
    spark.sql("""
      CREATE OR REPLACE TEMP VIEW bonus AS
      SELECT CAST(NULL AS STRING) AS ename, CAST(NULL AS STRING) AS job,
             CAST(NULL AS DECIMAL(7,2)) AS sal, CAST(NULL AS DECIMAL(7,2)) AS comm
      WHERE 1 = 0""")
    spark.sql("""
      CREATE OR REPLACE TEMP VIEW salgrade AS SELECT * FROM VALUES
        (1,700,1200),(2,1201,1400),(3,1401,2000),(4,2001,3000),(5,3001,9999)
        AS t(grade, losal, hisal)""")
  }

  private def registerPost(): Unit = {
    spark.sql("""
      CREATE OR REPLACE TEMP VIEW emp AS SELECT * FROM VALUES
        ('Jane',10,'F'),('Bob',10,'M'),('Eric',20,'M'),('Susan',30,'F'),
        ('Alice',30,'F'),('Adam',50,'M'),('Eve',50,'F'),('Grace',60,'F'),
        ('Wilma',CAST(NULL AS INT),'F')
        AS t(ename, deptno, gender)""")
    spark.sql("""
      CREATE OR REPLACE TEMP VIEW dept AS SELECT * FROM VALUES
        (10,'Sales'),(20,'Marketing'),(30,'Engineering'),(40,'Empty')
        AS t(deptno, dname)""")
    spark.sql("CREATE OR REPLACE TEMP VIEW dept30 AS SELECT * FROM dept WHERE deptno = 30")
    spark.sql("""
      CREATE OR REPLACE TEMP VIEW emps AS SELECT * FROM VALUES
        (100,'Fred',10,CAST(NULL AS STRING),CAST(NULL AS STRING),40,25,TRUE,FALSE,DATE'1996-08-03'),
        (110,'Eric',20,'M','San Francisco',3,80,CAST(NULL AS BOOLEAN),FALSE,DATE'2001-01-01'),
        (110,'John',40,'M','Vancouver',2,CAST(NULL AS INT),FALSE,TRUE,DATE'2002-05-03'),
        (120,'Wilma',20,'F',CAST(NULL AS STRING),1,5,CAST(NULL AS BOOLEAN),TRUE,DATE'2005-09-07'),
        (130,'Alice',40,'F','Vancouver',2,CAST(NULL AS INT),FALSE,TRUE,DATE'2007-01-01')
        AS t(empno, name, deptno, gender, city, empid, age, slacker, manager, joinedat)""")
  }

  // ---- quidem parsing ---------------------------------------------------

  private case class IqCase(file: String, line: Int, use: String, sql: String,
      header: Seq[String], rows: Seq[Seq[String]], ddl: Boolean = false)

  /** Parse one .iq file into !ok cases with their recorded outputs.
    * Tracks `!use` (only scott/post cases are eligible) and the
    * outputformat (`mysql` and `oracle` table formats are parsed).
    *
    * Quidem grammar notes this parser honors:
    *  - one statement can carry SEVERAL (expected-block, !directive)
    *    sections (e.g. `!type` output then `!ok` output) — scan ahead to
    *    the next `!` command line; a ';'-terminated line seen first means
    *    the remaining lines start a NEW statement instead;
    *  - `!if (cond) { ... !}` wraps disabled/conditional tests in the
    *    reference corpora — skipped wholesale (they are off upstream too).
    */
  private def parseIq(f: java.io.File): Seq[IqCase] = {
    val lines = scala.io.Source.fromFile(f, "UTF-8").getLines().toVector
    val out = ArrayBuffer.empty[IqCase]
    var use = ""
    var fmt = "mysql"
    var i = 0
    while (i < lines.length) {
      val l = lines(i).trim
      if (l.startsWith("!if")) {
        i += 1
        var depth = 1
        while (i < lines.length && depth > 0) {
          val t = lines(i).trim
          if (t.startsWith("!if")) depth += 1
          else if (t == "!}") depth -= 1
          i += 1
        }
      }
      else if (l.startsWith("!use ")) { use = l.stripPrefix("!use ").trim; i += 1 }
      else if (l.startsWith("!set outputformat ")) { fmt = l.stripPrefix("!set outputformat ").trim; i += 1 }
      else if (l.startsWith("#") || l.startsWith("!") || l.isEmpty) i += 1
      else {
        // statement: accumulate until a line ending in ';'
        val start = i
        val stmt = new StringBuilder
        var done = false
        while (i < lines.length && !done) {
          val s = lines(i)
          if (!s.trim.startsWith("#")) {
            stmt.append(s).append('\n')
            if (s.trim.endsWith(";")) done = true
          }
          i += 1
        }
        // one or more (expected-block, !directive) sections follow
        var more = true
        while (more) {
          var j = i
          var found = -1
          var newStmt = false
          while (j < lines.length && found < 0 && !newStmt) {
            val t = lines(j).trim
            if (t.startsWith("!")) found = j
            else if (t.endsWith(";")) newStmt = true
            else j += 1
          }
          if (found < 0) more = false
          else {
            val d = lines(found).trim
            if (d.startsWith("!if")) {
              // conditional (disabled) section attached to this statement —
              // e.g. a guarded !plan — skip it and keep scanning: the real
              // !ok section may follow the closing !}
              var k = found + 1
              var depth = 1
              while (k < lines.length && depth > 0) {
                val t = lines(k).trim
                if (t.startsWith("!if")) depth += 1
                else if (t == "!}") depth -= 1
                k += 1
              }
              i = k
            } else if (d.startsWith("!use") || d.startsWith("!set") || d == "!}") {
              more = false // context directive — belongs to the outer loop
            } else {
              if (d == "!ok") {
                parseExpected(lines.slice(i, found), fmt).foreach { case (hdr, rows) =>
                  out += IqCase(f.getName, start + 1, use,
                    stmt.toString.trim.stripSuffix(";"), hdr, rows)
                }
              } else if (d == "!update") {
                out += IqCase(f.getName, start + 1, use,
                  stmt.toString.trim.stripSuffix(";"), Nil, Nil, ddl = true)
              }
              i = found + 1
            }
          }
        }
      }
    }
    out.toSeq
  }

  /** mysql format: | a | b | rows between the 2nd and last +--- separator;
    * oracle format: fixed-width columns spanned by the dashes line. */
  private def parseExpected(block: Seq[String], fmt: String): Option[(Seq[String], Seq[Seq[String]])] = fmt match {
    case "mysql" =>
      val seps = block.zipWithIndex.filter(_._1.trim.startsWith("+-")).map(_._2)
      if (seps.size < 2) {
        // zero-column or malformed — only accept the explicit empty form
        if (block.exists(_.trim.matches("\\(0 rows\\)"))) Some((Nil, Nil)) else None
      } else {
        val hdr = splitPipes(block(seps(0) + 1))
        val dataLines = block.slice(seps(1) + 1, seps.last)
        val rows = dataLines.filter(_.trim.startsWith("|")).map(splitPipes)
        // a cell containing a literal '|' would mis-split: count check
        if (rows.exists(_.size != hdr.size)) None else Some((hdr, rows))
      }
    case "oracle" =>
      block.zipWithIndex.find(_._1.trim.matches("-+( -+)*")) match {
        case None =>
          if (block.exists(_.trim.matches("0 rows selected\\.?"))) Some((Nil, Nil)) else None
        case Some((dashes, di)) =>
          // column spans = runs of '-' in the dashes line
          val spans = ArrayBuffer.empty[(Int, Int)]
          var j = 0
          while (j < dashes.length) {
            if (dashes.charAt(j) == '-') {
              val s = j
              while (j < dashes.length && dashes.charAt(j) == '-') j += 1
              spans += ((s, j))
            } else j += 1
          }
          def cells(s: String): Seq[String] = spans.toSeq.zipWithIndex.map { case ((a, b), k) =>
            // last column runs to end of line (left-aligned strings can overflow the dashes)
            val hi = if (k == spans.size - 1) s.length else math.min(b, s.length)
            if (a >= s.length) "" else s.substring(a, hi).trim
          }
          val hdr = cells(block(di - 1))
          val rows = block.drop(di + 1).takeWhile(_.trim.nonEmpty).map(cells)
          Some((hdr, rows))
      }
    case _ => None
  }

  private def splitPipes(l: String): Seq[String] = {
    val t = l.trim.stripPrefix("|").stripSuffix("|")
    t.split("\\|", -1).map(_.trim).toSeq
  }

  // ---- normalization + compare -----------------------------------------

  private val numRe = "-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?".r

  /** Numerics are rounded to 9 significant digits before compare: the
    * reference computes DECIMAL where Spark computes DOUBLE for several
    * aggregates (REGR_*, scalar-subquery division), so exact strings
    * differ in the last ulps while both are correct. */
  private def normCell(s: String): String = s match {
    case "" => ""
    case v if numRe.matches(v) =>
      val bd = new java.math.BigDecimal(v)
        .round(new java.math.MathContext(9)).stripTrailingZeros()
      if (bd.compareTo(java.math.BigDecimal.ZERO) == 0) "0" else bd.toPlainString
    case v if v.startsWith("[") && v.endsWith("]") => // collection cells
      v.substring(1, v.length - 1).split(", ", -1).map(normCell).mkString("[", ", ", "]")
    case v => v
  }

  private def normValue(v: Any): String = v match {
    case null => ""
    case b: java.math.BigDecimal => normCell(b.toPlainString)
    case b: scala.math.BigDecimal => normCell(b.bigDecimal.toPlainString)
    case d: java.lang.Double => normCell(d.toString)
    case f: java.lang.Float => normCell(f.toString)
    case t: java.sql.Timestamp => t.toString.stripSuffix(".0")
    case d: java.sql.Date => d.toString
    case arr: scala.collection.Seq[_] => arr.map(normValue).mkString("[", ", ", "]")
    case r: org.apache.spark.sql.Row => // ROW constructor prints {a, b}
      (0 until r.length).map(i => normValue(r.get(i))).mkString("{", ", ", "}")
    case m: scala.collection.Map[_, _] => // MAP prints {k=v, ...} sorted
      m.toSeq.map { case (k, v) => s"${normValue(k)}=${normValue(v)}" }
        .sorted.mkString("{", ", ", "}")
    case other => normCell(other.toString)
  }

  // ---- skip lists -------------------------------------------------------

  /** Construct-level skips: (case-insensitive regex on the SQL, reason).
    * Each is a DOCUMENTED divergence or unsupported surface, not a bug. */
  private val skipConstructs: Seq[(String, String)] = Seq(
    ("(?i)\\bavg\\s*\\(",
      "AVG return type: reference derives the argument type (RelDataTypeSystem" +
        ".deriveAvgAggType -> DECIMAL(7,2) stays (7,2)); Spark widens to " +
        "DECIMAL(p+4,s+4)/DOUBLE. Divergence pinned in DecimalTypeSystemSpec."),
    ("(?i)\\b(?:var_pop|var_samp|variance|stddev|stddev_pop|stddev_samp)\\s*\\(",
      "Same AVG-family return-type derivation divergence (int-truncating variance in the reference)."),
    ("(?i)\\bcount\\s*\\(\\s*[\\w\"]+\\s*,",
      "Composite COUNT(a, b) is reference-specific syntax; Spark only allows multiple args under DISTINCT."),
    ("(?i)\\bgroup\\s+by\\s+.*\\b(rollup|cube)\\s*\\(.*\\)\\s*,",
      "Mixed ROLLUP/CUBE with additional grouping keys after the group: Spark parses but groups differently pre-3.4 compat; covered by q11-q13."),
    ("(?i)\\bgrouping\\s+sets\\s*\\(\\s*\\(",
      "Nested-paren GROUPING SETS variants diverge in GROUP_ID numbering; GROUP_ID covered by q122."),
    ("(?i)\\bgroup_id\\s*\\(",
      "GROUP_ID() numbering under duplicate grouping sets is reference-specific; lowered variant covered by q122."),
    ("(?i)\\btimestampadd\\s*\\(|\\btimestampdiff\\s*\\(",
      "TIMESTAMPADD/DIFF unit keywords (SQL_TSI_*) are reference JDBC syntax; Spark exposes timestampadd with different unit grammar."),
    ("(?i)\\bjson_",
      "JSON function family conformance is covered by q54/q56/q57/q78/q79/q106 with the DuckDB oracle."),
    ("(?i)\\bposition\\s*\\(.*\\bfrom\\b",
      "POSITION(x IN y FROM n) 3-arg form not in Spark's grammar."),
    ("(?i)\\bsubstring\\s*\\(.*\\bsimilar\\b",
      "SUBSTRING ... SIMILAR regex form is reference-specific."),
    ("(?i)convert\\s*\\(.*using",
      "CONVERT ... USING translation syntax not in Spark."),
    ("(?i)\\btranslate\\s*\\(.*using",
      "TRANSLATE ... USING translation syntax not in Spark."),
    ("(?i)\\bintersect\\s+all\\b",
      "INTERSECT ALL multiplicity semantics verified against DuckDB in q33 instead (reference output here predates its own INTERSECT ALL fix)."),
    ("(?i)\\bmultiset\\b|\\bsubmultiset\\b|\\bfusion\\b|\\bintersection\\s*\\(",
      "MULTISET type + ops live in functions/Multiset.scala with their own spec (no Spark literal syntax)."),
    ("(?i)\\bcursor\\s*\\(|\\btable\\s*\\(\\s*ramp",
      "CURSOR/TABLE(ramp()) table-function plumbing is reference-internal test machinery."),
    ("(?i)\\bunnest\\s*\\(|\\barray\\s*\\[",
      "ARRAY[...] literal syntax: Spark spells it array(...); UNNEST (incl. WITH ORDINALITY) covered by q29/q50 via the engine's own surface."),
    ("(?i)\\bmap\\s*\\[",
      "MAP[k, v] literal syntax is reference-specific; Spark spells it map(k, v)."),
    ("(?i)\\bany_value\\s*\\(",
      "ANY_VALUE picks an arbitrary row — engine-specific; deterministic ARG_MAX/MIN covered by q16."),
    ("(?i)\\blateral\\s*\\(",
      "LATERAL subquery covered by q46/q49 (Spark needs an explicit alias; reference allows bare LATERAL)."),
    ("(?i)\\bfloor\\s*\\(.*\\bto\\b|\\bceil\\s*\\(.*\\bto\\b",
      "FLOOR(ts TO unit) — Spark spells this date_trunc; format-model family covered by q60-q62."),
    ("(?i)\\bextract\\s*\\(\\s*(isodow|isoyear|decade|century|millennium|epoch)",
      "EXTRACT units beyond Spark's grammar (isodow/decade/...)."),
    ("(?i)\\b(week|dayofyear|dayofweek|dayofmonth)\\s*\\(|extract\\s*\\(\\s*(week|doy|dow)\\b",
      "WEEK/DOY/DOW extraction: ISO-week numbering differs between engines; date/time family covered by q60-q62/q89."),
    ("(?i)\\bgrouping\\s*\\([^)]*,",
      "Multi-arg GROUPING(a, b): Spark requires grouping_id for the packed form; single-arg GROUPING covered by q11."),
    ("(?i)^\\s*values\\b",
      "Bare top-level VALUES rows print as EXPR$n columns in the reference; covered by q95."),
    ("(?i)\\bwithin\\s+distinct\\b",
      "WITHIN DISTINCT is a reference extension (SqlInternalOperators); lowered variant covered by q38."),
    ("(?i)\\bmode\\s*\\(",
      "MODE() tie-breaking is engine-specific; covered deterministically by q86."),
    ("(?i)\\bevery\\s*\\(",
      "EVERY is reference spelling; Spark's bool_and covered by q84."),
    ("(?i)\\bsome\\s*\\(\\s*[\\w\"]+\\s*\\)",
      "SOME(col) aggregate is reference spelling; Spark's bool_or covered by q84."),
    ("(?i)\\blogical_or\\b|\\blogical_and\\b",
      "LOGICAL_OR/AND are BigQuery-dialect names for bool_or/and (babel surface), covered by q84."),
    ("(?i)\\bpercentile_cont\\s*\\(|\\bpercentile_disc\\s*\\(",
      "PERCENTILE WITHIN GROUP covered by q19 with the DuckDB oracle (reference rounds to the arg type here)."),
    ("(?i)\\blistagg\\s*\\(",
      "LISTAGG covered by q72 (reference's default separator/order rules differ)."),
    ("(?i)\\bbit_xor\\s*\\(|\\bbit_and\\s*\\(|\\bbit_or\\s*\\(",
      "BIT_* aggregates covered by q85 (reference returns the arg's exact type)."),
    ("(?i)\\bapprox_count_distinct\\b",
      "Sketch internals engine-specific; error-bounded spec + q18."),
    ("(?i)\\bsplit\\s*\\(|\\bstring_to_array\\b",
      "SPLIT semantics on empty separators differ; regex family covered by q70/q71."),
    ("(?i)interval\\s+'[^']+'\\s+(year|month)\\b.*interval|\\*\\s*interval",
      "INTERVAL arithmetic in projections: reference prints +N-N literal forms; interval family covered by q67/q68."))

  /** Individual-case skips keyed (file, statement line): true divergences
    * too narrow for a construct pattern, each with the reason. */
  private val skipCases: Map[(String, Int), String] = {
    val nestedCorr = "Spark's decorrelator resolves outer references one " +
      "level deep only; these CALCITE-7394/4945 cases correlate through two+ " +
      "subquery levels (Spark: UNRESOLVED_COLUMN on the outer alias)"
    val existenceJoin = "Spark plans an IN-subquery in the PROJECTION as " +
      "ExistenceJoin, which yields FALSE where 3VL requires UNKNOWN when the " +
      "subquery contains NULLs — known Spark divergence; WHERE-clause forms " +
      "are unaffected (q115-q118 cover NOT IN null semantics)"
    val tupleIn = "struct-typed (a,b) IN list: Spark requires exact struct " +
      "field types (no coercion of NULL/int literals into DECIMAL fields); " +
      "row-value IN covered by q115-q118"
    val ordinalLiteral = "reference default conformance reads GROUP BY <int> " +
      "as a LITERAL grouping constant; Spark reads an ordinal and rejects " +
      "aggregate select items (GROUP_BY_POS_AGGREGATE)"
    Map(
      ("agg.iq", 31) -> "duplicate of line-21 case (same SQL, kept once)",
      ("agg.iq", 850) -> ("grouping(deptno) in ORDER BY after plain rollup: " +
        "Spark resolves grouping() only inside the aggregate's select list"),
      ("agg.iq", 731) -> ("grouping() with a plain GROUP BY (constant 0 in " +
        "the reference); Spark requires grouping sets"),
      ("agg.iq", 4227) -> "same grouping()-outside-grouping-sets divergence",
      ("agg.iq", 870) -> ("grouping_id over a duplicated column: Spark " +
        "requires grouping_id args to match grouping columns exactly"),
      ("agg.iq", 1116) -> ("grouping_id over a subset of a composite rollup " +
        "group: same Spark exact-match restriction"),
      ("agg.iq", 3223) -> ("relies on non-ANSI silent int64 overflow " +
        "wraparound (+9223372036854775807 + 1); Spark (ANSI) raises"),
      ("agg.iq", 999) -> ordinalLiteral,
      ("agg.iq", 1012) -> ordinalLiteral,
      ("agg.iq", 2379) -> ordinalLiteral,
      ("agg.iq", 2422) -> ordinalLiteral,
      ("agg.iq", 2465) -> ordinalLiteral,
      ("sub-query.iq", 76) -> ("references the hr catalog's emps (salary " +
        "column) — a third fixture schema used once in this corpus"),
      ("sub-query.iq", 104) -> existenceJoin,
      ("sub-query.iq", 116) -> existenceJoin,
      ("sub-query.iq", 138) -> existenceJoin,
      ("sub-query.iq", 150) -> existenceJoin,
      ("sub-query.iq", 1447) -> existenceJoin,
      ("sub-query.iq", 1725) -> existenceJoin,
      ("sub-query.iq", 5852) -> existenceJoin,
      ("sub-query.iq", 1963) -> ("IS UNKNOWN applied to an unparenthesized " +
        "IN-subquery predicate; Spark's grammar needs (pred) IS NULL"),
      ("sub-query.iq", 2337) -> "same unparenthesized IN ... IS UNKNOWN shape",
      ("sub-query.iq", 2711) -> "same unparenthesized IN ... IS UNKNOWN shape",
      ("sub-query.iq", 4325) -> tupleIn,
      ("sub-query.iq", 4363) -> tupleIn,
      ("sub-query.iq", 4384) -> tupleIn,
      ("sub-query.iq", 5424) -> tupleIn,
      ("sub-query.iq", 5465) -> tupleIn,
      ("sub-query.iq", 4812) -> nestedCorr,
      ("sub-query.iq", 4841) -> nestedCorr,
      ("sub-query.iq", 4865) -> nestedCorr,
      ("sub-query.iq", 4888) -> nestedCorr,
      ("sub-query.iq", 4904) -> nestedCorr,
      ("sub-query.iq", 4930) -> nestedCorr,
      ("sub-query.iq", 6036) -> nestedCorr,
      ("sub-query.iq", 6087) -> nestedCorr,
      ("sub-query.iq", 6111) -> nestedCorr,
      ("sub-query.iq", 6146) -> nestedCorr,
      ("sub-query.iq", 6185) -> nestedCorr,
      ("sub-query.iq", 6211) -> nestedCorr,
      ("sub-query.iq", 6230) -> nestedCorr,
      ("sub-query.iq", 6250) -> nestedCorr,
      ("sub-query.iq", 6350) -> nestedCorr,
      ("sub-query.iq", 6406) -> nestedCorr,
      ("sub-query.iq", 6435) -> nestedCorr,
      ("sub-query.iq", 761) -> ("default null sort order: the reference " +
        "sorts NULL as largest (Oracle-style), Spark as smallest — under " +
        "ORDER BY ... LIMIT 1 inside a scalar subquery the picked row " +
        "differs; explicit NULLS FIRST/LAST collation covered by q10/q15"),
      ("sub-query.iq", 787) -> "same default null-sort divergence under LIMIT",
      ("sub-query.iq", 4597) -> ("IS TRUE applied to an unparenthesized " +
        "IN-subquery predicate; Spark's grammar has no IS TRUE postfix"),
      ("join.iq", 993) -> ("ROW(...) constructors inside VALUES expand to " +
        "multiple columns in the reference; Spark VALUES has no row-expansion"),
      ("agg.iq", 3780) -> ("ARG_MIN/ARG_MAX tie-break: the reference keeps " +
        "the first row of a tied key group, Spark's min_by/max_by an " +
        "arbitrary one; deterministic ARG_MAX/MIN covered by q16"),
      ("agg.iq", 3792) -> "same ARG_MIN/ARG_MAX tie-break divergence",
      ("agg.iq", 3804) -> "same ARG_MIN/ARG_MAX tie-break divergence")
  }

  private def constructSkip(sql: String): Option[String] =
    skipConstructs.collectFirst {
      case (re, why) if re.r.findFirstIn(sql).isDefined => why
    }

  // ---- the gate ---------------------------------------------------------

  private val corpusFiles = Seq("agg.iq", "join.iq", "sub-query.iq", "some.iq", "qualify.iq")

  /** Spark-analyzer limitations this engine inherits (correlation shapes
    * Spark's decorrelator rejects, plus two known Spark internal errors
    * on EXISTS-under-join-OR). Cases hitting these are counted and
    * BOUNDED — a growing count fails the gate — but are not failures of
    * this engine's own surface. */
  private val engineLimitRe =
    ("UNSUPPORTED_SUBQUERY_EXPRESSION_CATEGORY|\\[INTERNAL_ERROR" +
      "|UNSUPPORTED_CORRELATED").r

  private val createdTables = scala.collection.mutable.Set.empty[String]

  test("reference .iq conformance: >=100 corpus statements pass value-compare") {
    assume(refSqlDir.isDirectory, "reference checkout not present")
    var pass = 0
    var skippedConstruct = 0
    var skippedCase = 0
    val failures = ArrayBuffer.empty[String]
    val engineLimits = ArrayBuffer.empty[String]
    for (fn <- corpusFiles) {
      val cases = parseIq(new java.io.File(refSqlDir, fn))
        .filter(c => c.ddl || c.use == "scott" || c.use == "post" || c.use == "blank")
      var lastUse = ""
      for (c <- cases) {
        if (c.ddl) runDdl(c.sql)
        else skipCases.get((c.file, c.line)) match {
          case Some(_) => skippedCase += 1
          case None => constructSkip(c.sql) match {
            case Some(_) => skippedConstruct += 1
            case None =>
              if (c.use != lastUse) {
                if (c.use == "scott") registerScott()
                else if (c.use == "post") registerPost()
                lastUse = c.use
              }
              runCase(c) match {
                case None => pass += 1
                case Some(err) if engineLimitRe.findFirstIn(err).isDefined =>
                  engineLimits += s"${c.file}:${c.line}: $err"
                case Some(err) => failures += s"${c.file}:${c.line}: $err\n  SQL: ${c.sql.linesIterator.mkString(" ")}"
              }
          }
        }
      }
    }
    createdTables.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    info(s"corpus: $pass passed, $skippedConstruct construct-skips, " +
      s"$skippedCase case-skips, ${engineLimits.size} engine-limits, ${failures.size} failures")
    // full failure list on disk for diagnosis — the assert below truncates
    val fw = new java.io.PrintWriter("target/corpus-failures.txt", "UTF-8")
    try {
      failures.foreach(fw.println)
      fw.println("---- engine limits ----")
      engineLimits.foreach(fw.println)
    } finally fw.close()
    assert(failures.isEmpty, s"corpus failures (${failures.size}):\n${failures.take(15).mkString("\n")}")
    assert(pass >= 100, s"expected >=100 passing corpus statements, got $pass")
    assert(engineLimits.size <= 35,
      s"Spark-limitation count grew: ${engineLimits.size} (was 33) — a rewrite regressed")
  }

  /** Corpus DDL (`!update` statements): CREATE VIEW → temp view, CREATE
    * TABLE gets a drop-first for idempotency, INSERT runs as-is. */
  private def runDdl(sql0: String): Unit = {
    val sql = clean(sql0)
    val up = sql.trim.toUpperCase
    try {
      if (up.startsWith("CREATE VIEW"))
        spark.sql(sql.trim.replaceFirst("(?i)^CREATE\\s+VIEW", "CREATE OR REPLACE TEMP VIEW"))
      else if (up.startsWith("CREATE TABLE")) {
        val name = "(?i)^CREATE\\s+TABLE\\s+(\\w+)".r.findFirstMatchIn(sql.trim).map(_.group(1))
        name.foreach { n =>
          spark.sql(s"DROP TABLE IF EXISTS $n")
          // a crashed prior run can leave the managed location behind
          val loc = new java.io.File(s"spark-warehouse/$n")
          if (loc.isDirectory) {
            def rm(f: java.io.File): Unit = {
              Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
            }
            rm(loc)
          }
          createdTables += n
        }
        spark.sql(sql)
      } else spark.sql(sql)
    } catch {
      case ex: Throwable => info(s"corpus DDL failed (downstream cases will fail): " +
        Option(ex.getMessage).getOrElse("").linesIterator.filter(_.nonEmpty).take(2).mkString(" | ") +
        s" -- stmt: ${sql.linesIterator.mkString(" ").take(120)}")
    }
  }

  /** The corpora schema-qualify as "scott".emp / "post".emp; views are
    * session-scoped here. Remaining double-quoted identifiers become
    * backtick identifiers (the corpora's dialect quotes with ", Spark
    * with `), and Calcite's auto-generated EXPR$n names are quoted. */
  private def clean(sql: String): String = sql
    .replaceAll("(?i)\"(scott|post|blank)\"\\.", "")
    .replaceAll("\"([^\"]+)\"", "`$1`")
    .replaceAll("(?<![`\\w])EXPR\\$(\\d+)", "`EXPR\\$$1`")

  /** None = pass; Some(reason) = mismatch/error. */
  private def runCase(c: IqCase): Option[String] = {
    val cleaned = clean(c.sql)
    try {
      val got = GraftSql.sql(spark, cleaned)
      val rows = got.collect()
      if (got.columns.length != c.header.size)
        return Some(s"column count ${got.columns.length} != expected ${c.header.size} (${c.header.mkString(",")})")
      val gotNorm = rows.map(r => (0 until r.length).map(i => normValue(r.get(i))).toSeq)
      val expNorm = c.rows.map(_.map(normCell))
      if (gotNorm.length != expNorm.length)
        return Some(s"row count ${gotNorm.length} != expected ${expNorm.length}")
      val g = gotNorm.sortBy(_.mkString(""))
      val e = expNorm.sortBy(_.mkString(""))
      if (g.map(_.toList).toList != e.map(_.toList).toList) {
        val diff = g.zip(e).collectFirst { case (a, b) if a != b => s"got $a expected $b" }
        return Some(s"value mismatch: ${diff.getOrElse("?")}")
      }
      None
    } catch {
      case ex: Throwable =>
        Some(s"${ex.getClass.getSimpleName}: ${Option(ex.getMessage).getOrElse("").linesIterator.take(1).mkString}")
    }
  }
}
