package graft

import scala.collection.mutable.ArrayBuffer

import graft.sql.GraftSql

/** DDL conformance: runs the reference server module's quidem corpora
  * (server/src/test/resources/sql — table.iq, table_as.iq, view.iq,
  * schema.iq, materialized_view.iq) through GraftSql + Spark's DDL
  * executor, in statement order:
  *
  *   - `!update` DDL/DML executes (CREATE TABLE/SCHEMA/VIEW/
  *     MATERIALIZED VIEW, CTAS incl. column alias/type lists, INSERT
  *     incl. the DEFAULT keyword, TRUNCATE, DROP) — an adapter maps
  *     reference spellings Spark lacks (views land as temp views, DROP
  *     SCHEMA gets CASCADE, CREATE OR REPLACE SCHEMA = drop+create,
  *     CTAS column lists apply as positional aliases/casts);
  *   - `!ok` value-compares against the recorded table;
  *   - `!error` passes when the engine ALSO rejects the statement (the
  *     reference's message text is Calcite-worded; the contract checked
  *     here is that the statement fails);
  *   - `!type` compares the result schema against the recorded
  *     `NAME TYPE [NOT NULL]` lines (names + coarse type; a Spark
  *     NOT NULL the reference doesn't claim is a mismatch, a missing
  *     one is tolerated — v1 parquet tables don't carry the constraint).
  *
  * The corpora are STATEFUL scripts: when a CREATE is skipped for a
  * documented divergence (foreign schemas, the JDBC metadata schema),
  * every later statement touching that object is a
  * cascade of the same divergence — counted as a skip, not a failure,
  * until the name is created again. The gate demands zero undocumented
  * failures and ratchets the pass count.
  */
class ServerCorpusSpec extends IqHarness {

  private val serverDir = new java.io.File("/root/reference/server/src/test/resources/sql")

  /** Construct-level skips (regex on the SQL, documented reason) —
    * EMPTY as of round 12: foreign schemas run against live Derby JDBC
    * and "metadata".TABLES is served by MaterializedViewSql. */
  private val skipConstructs: Seq[(String, String)] = Seq.empty

  // ---- foreign-schema fixture -------------------------------------------
  // schema.iq's JDBC foreign schema points at the reference's BUNDLED
  // hsqldb resource database (jdbc:hsqldb:res:scott). That driver/resource
  // is not in this offline container; Derby is (the metastore). The
  // fixture adaptation below seeds the same canonical scott.DEPT rows into
  // an in-memory Derby and rewrites only the URL — CREATE FOREIGN SCHEMA
  // itself runs for real (sql/ForeignSchemaSql.scala: metadata discovery +
  // per-table JDBC registration).

  private val scottUrl = "jdbc:derby:memory:scottdb"

  private lazy val seedScott: Unit = {
    val conn = java.sql.DriverManager.getConnection(scottUrl + ";create=true")
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE SCOTT.DEPT") catch { case _: Exception => () }
      try st.execute("CREATE SCHEMA SCOTT") catch { case _: Exception => () }
      st.execute("CREATE TABLE SCOTT.DEPT (DEPTNO INT, DNAME VARCHAR(14), LOC VARCHAR(13))")
      st.execute("INSERT INTO SCOTT.DEPT VALUES (10,'ACCOUNTING','NEW YORK')," +
        "(20,'RESEARCH','DALLAS'),(30,'SALES','CHICAGO'),(40,'OPERATIONS','BOSTON')")
      st.close()
    } finally conn.close()
  }

  private def constructSkip(sql: String): Option[String] =
    skipConstructs.collectFirst {
      case (re, why) if re.r.findFirstIn(sql).isDefined => why
    }

  // ---- DDL adaptation ---------------------------------------------------

  private val createRe =
    "(?is)^create\\s+(?:or\\s+replace\\s+)?(?:materialized\\s+view|foreign\\s+schema|table|view|schema|type)\\s+(?:if\\s+not\\s+exists\\s+)?([\\w.\"`]+)".r
  private val dropRe =
    "(?is)^drop\\s+(?:materialized\\s+view|foreign\\s+schema|table|view|schema|type)\\s+(?:if\\s+exists\\s+)?([\\w.\"`]+)".r
  private def createdName(sql: String): Option[String] =
    createRe.findFirstMatchIn(sql.trim).map(_.group(1).replaceAll("[\"`]", "").toLowerCase)
  private def droppedName(sql: String): Option[String] =
    dropRe.findFirstMatchIn(sql.trim).map(_.group(1).replaceAll("[\"`]", "").toLowerCase)

  /** CTAS with a column list: `create table n (x, y) as q` /
    * `(x int, y)` — Spark's CTAS takes no column list, so the list
    * applies as positional aliases (and casts where a type is given). */
  private val ctasColsRe =
    "(?is)^create\\s+table\\s+(if\\s+not\\s+exists\\s+)?([\\w.]+)\\s*\\((.*)\\)\\s*as\\s+(.+)$".r

  /** Depth-0 comma split (types may carry parens: varchar(20)). */
  private def splitCols(s: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var depth = 0; var start = 0
    for (i <- s.indices) s.charAt(i) match {
      case '(' => depth += 1
      case ')' => depth -= 1
      case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
      case _ =>
    }
    out += s.substring(start)
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private def runCtasWithCols(ifNotExists: String, name: String, colList: String,
      query: String): Unit = {
    val df = GraftSql.sql(spark,
      if (query.trim.toUpperCase.startsWith("VALUES")) s"SELECT * FROM ($query) __v"
      else query)
    val entries = splitCols(colList)
    if (entries.length != df.columns.length)
      throw new IllegalArgumentException(
        "Number of columns must match number of query columns")
    import org.apache.spark.sql.functions.col
    val projected = df.select(entries.zip(df.columns).map { case (e, c) =>
      val parts = e.split("\\s+", 2)
      if (parts.length == 1) col(c).as(parts(0))
      else col(c).cast(GraftSql.rewrite(parts(1)).toLowerCase match {
        case t if t.startsWith("varchar") || t.startsWith("string") => "string"
        case t => t
      }).as(parts(0))
    }.toIndexedSeq: _*)
    if (ifNotExists != null && spark.catalog.tableExists(name)) return
    projected.write.saveAsTable(name)
  }

  /** Reference DDL spelling → Spark statements (possibly several). */
  private def adapt(sql0: String): Seq[String] = {
    val sql = quoteIdents(sql0.trim.stripSuffix(";"))
    val up = sql.toUpperCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")
    if (up.startsWith("CREATE OR REPLACE SCHEMA")) {
      val n = sql.split("\\s+").last
      Seq(s"DROP SCHEMA IF EXISTS $n CASCADE", s"CREATE SCHEMA $n")
    } else if (up.startsWith("DROP SCHEMA")) {
      Seq(s"$sql CASCADE")
    } else if (up.startsWith("CREATE OR REPLACE VIEW") &&
        !"(?is)^CREATE\\s+OR\\s+REPLACE\\s+VIEW\\s+\\w+\\s*\\.".r.findFirstIn(sql).isDefined) {
      Seq(sql.replaceFirst("(?is)^CREATE\\s+OR\\s+REPLACE\\s+VIEW",
        "CREATE OR REPLACE TEMP VIEW"))
    } else if (up.startsWith("CREATE VIEW") &&
        !"(?is)^CREATE\\s+VIEW\\s+\\w+\\s*\\.".r.findFirstIn(sql).isDefined) {
      Seq(sql.replaceFirst("(?is)^CREATE\\s+VIEW", "CREATE TEMP VIEW"))
    } else if ("(?is)^CREATE\\s+TABLE\\s+[\\w.]+\\s+AS\\s+VALUES\\b.*".r.matches(sql)) {
      Seq("(?is)\\bAS\\s+VALUES\\b".r.replaceFirstIn(sql, "AS SELECT * FROM VALUES"))
    } else Seq(sql)
  }

  private def exec(sql0a: String): Unit = {
    val sql0 =
      if (sql0a.contains("jdbc:hsqldb:res:scott")) {
        seedScott // fixture adaptation: see the comment at scottUrl
        sql0a.replace("jdbc:hsqldb:res:scott", scottUrl)
      } else sql0a
    sql0.trim.stripSuffix(";") match {
      case ctasColsRe(ine, name, cols, query) => runCtasWithCols(ine, name, cols, query)
      case _ =>
        for (stmt <- adapt(sql0)) {
          val s = GraftSql.rewrite(graft.sql.SparkDialect.rewrite(stmt))
          GraftSql.sql(spark, s): Unit
        }
    }
  }

  // ---- !type schema compare --------------------------------------------

  private def coarse(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case IntegerType => "INTEGER"
      case LongType => "BIGINT"
      case ShortType => "SMALLINT"
      case ByteType => "TINYINT"
      case DoubleType => "DOUBLE"
      case FloatType => "REAL"
      case BooleanType => "BOOLEAN"
      case StringType => "VARCHAR"
      case DateType => "DATE"
      case _: DecimalType => "DECIMAL"
      case _: TimestampType => "TIMESTAMP"
      case _: StructType => "STRUCT" // the reference's !type prints bare STRUCT
      case other => other.sql
    }
  }

  private def typeCheck(c: IqCase): Option[String] = {
    val df = GraftSql.sql(spark, quoteIdents(c.sql))
    val expected = c.rows.map(_.head).map { line =>
      val notNull = line.toUpperCase(java.util.Locale.ROOT).endsWith("NOT NULL")
      val base = if (notNull) line.substring(0, line.length - 8).trim else line
      val parts = base.split("\\s+", 2)
      (parts(0).toLowerCase(java.util.Locale.ROOT),
        parts(1).replaceAll("\\(.*", "").toUpperCase(java.util.Locale.ROOT), notNull)
    }
    val got = df.schema.fields.map(f =>
      (f.name.toLowerCase(java.util.Locale.ROOT), coarse(f.dataType), !f.nullable))
    if (expected.size != got.length)
      return Some(s"column count ${got.length} != expected ${expected.size}")
    expected.zip(got).collectFirst {
      case ((en, et, enn), (gn, gt, gnn)) if en != gn || et != gt || (gnn && !enn) =>
        s"schema mismatch: got ($gn $gt${if (gnn) " NOT NULL" else ""}) " +
          s"expected ($en $et${if (enn) " NOT NULL" else ""})"
    }
  }

  // ---- the gate ---------------------------------------------------------

  private val files = Seq("table.iq", "table_as.iq", "view.iq", "schema.iq",
    "materialized_view.iq", "type.iq")

  private val fixtureNames = Seq("t", "t2", "v", "dept", "d", "d2", "d3", "d4",
    "d5", "d6", "d7", "d8", "d9", "d10", "tdef", "tdef1", "asof_tbl", "tbl",
    "w", "w2")

  private def resetCatalog(): Unit = {
    fixtureNames.foreach { n =>
      spark.catalog.dropTempView(n)
      try spark.sql(s"DROP TABLE IF EXISTS $n") catch { case _: Exception => () }
      // a crashed prior run can orphan the managed location
      val loc = new java.io.File(s"spark-warehouse/$n")
      if (loc.isDirectory) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(loc)
      }
    }
    try spark.sql("DROP SCHEMA IF EXISTS s CASCADE") catch { case _: Exception => () }
    for (db <- Seq("scott", "fs"))
      try spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE") catch { case _: Exception => () }
    graft.sql.MaterializedViewSql.clearRegistry()
    graft.sql.TypesSql.clearRegistry()
    graft.sql.GeneratedColumnsSql.clearRegistry(spark)
  }

  test("server DDL corpus: statements execute, values and errors match") {
    assume(serverDir.isDirectory, "reference checkout not present")
    var pass = 0
    var skipped = 0
    var cascades = 0
    val failures = ArrayBuffer.empty[String]
    for (fn <- files) {
      resetCatalog()
      val dead = scala.collection.mutable.Set.empty[String]
      def refsDead(sql: String): Boolean =
        dead.exists(n => ("(?i)\\b" + java.util.regex.Pattern.quote(n) + "\\b").r
          .findFirstIn(sql).isDefined)
      val cases = parseIq(new java.io.File(serverDir, fn), extended = true)
      for (c <- cases) {
        constructSkip(c.sql) match {
          case Some(_) =>
            skipped += 1
            createdName(c.sql).foreach(n => dead += n.split('.').last)
          case None if refsDead(c.sql) =>
            cascades += 1
            // a skipped CREATE leaves ITS target missing too; a DROP of a
            // dead name clears it (the script moves on)
            createdName(c.sql).foreach(n => dead += n.split('.').last)
            droppedName(c.sql).foreach(n => dead -= n.split('.').last)
          case None => c.kind match {
            case "update" =>
              try {
                exec(c.sql); pass += 1
                createdName(c.sql).foreach(n => dead -= n.split('.').last)
              } catch { case ex: Throwable =>
                failures += s"${c.file}:${c.line}: DDL failed: ${first(ex)}\n  SQL: ${one(c.sql)}"
                createdName(c.sql).foreach(n => dead += n.split('.').last)
              }
            case "error" =>
              try {
                exec(c.sql)
                failures += s"${c.file}:${c.line}: expected an error, statement succeeded\n  SQL: ${one(c.sql)}"
              } catch { case _: Throwable => pass += 1 }
            case "type" =>
              try typeCheck(c) match {
                case None => pass += 1
                case Some(err) => failures += s"${c.file}:${c.line}: $err\n  SQL: ${one(c.sql)}"
              } catch { case ex: Throwable =>
                failures += s"${c.file}:${c.line}: ${first(ex)}\n  SQL: ${one(c.sql)}"
              }
            case _ => // "ok"
              compareCase(c, quoteIdents(c.sql)) match {
                case None => pass += 1
                case Some(err) => failures += s"${c.file}:${c.line}: $err\n  SQL: ${one(c.sql)}"
              }
          }
        }
      }
    }
    resetCatalog()
    info(s"server corpus: $pass passed, $skipped documented skips, " +
      s"$cascades cascade skips, ${failures.size} failures")
    val fw = new java.io.PrintWriter("target/server-failures.txt", "UTF-8")
    try failures.foreach(fw.println) finally fw.close()
    assert(failures.isEmpty,
      s"server corpus failures (${failures.size}):\n${failures.take(15).mkString("\n")}")
    assert(pass >= 200, s"server corpus coverage dropped: $pass passing (floor 200)")
    assert(skipped == 0 && cascades == 0,
      s"server corpus must stay skip-free: $skipped skips, $cascades cascades")
  }

  private def first(ex: Throwable): String =
    s"${ex.getClass.getSimpleName}: ${Option(ex.getMessage).getOrElse("").linesIterator.take(1).mkString}"
  private def one(sql: String): String = sql.linesIterator.mkString(" ").take(160)
}
