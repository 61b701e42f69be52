package graft.sql

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generated (VIRTUAL) columns and row-dependent column DEFAULTs
  * (ref: server/src/main/java/org/apache/calcite/sql/ddl/SqlCreateTable
  * .java column strategies VIRTUAL/DEFAULT, server/src/test/resources/
  * sql/table.iq:93-370), Spark-native:
  *
  *   - `c t AS (expr) VIRTUAL` — the expression is computed on READ.
  *     Spark datasource tables carry no generated-column constraint, so
  *     the stored columns land in a backing table `<name>__gen` and the
  *     declared surface (stored + computed, in declared order) is a
  *     temp view named `<name>`; reads hit the view, INSERTs are
  *     validated (naming a generated column is an error, matching the
  *     reference) and retargeted at the backing table.
  *   - `c t DEFAULT expr` where expr references OTHER COLUMNS of the
  *     row — Spark accepts only constant defaults, so the table is
  *     created plain and an INSERT whose column list omits the
  *     defaulted column is rewritten to compute it from the source
  *     relation (`INSERT INTO t (i) VALUES (3)` → j = i + 2 = 5).
  *     Constant defaults stay on Spark's native path.
  *   - `CREATE TABLE t2 LIKE t` — bare LIKE degrades generated columns
  *     to plain stored columns (the reference's behavior);
  *     `INCLUDING DEFAULTS` / `INCLUDING ALL` replicate the generated /
  *     defaulted definition onto the new table.
  *
  * At scale the view-over-backing design is free: the computed column
  * is a Project Catalyst fuses into the scan's codegen stage, and the
  * stored table never materializes derivable bytes.
  */
object GeneratedColumnsSql {

  sealed trait Col { def name: String; def typ: String }
  final case class Stored(name: String, typ: String) extends Col
  final case class Virtual(name: String, typ: String, expr: String) extends Col
  final case class Defaulted(name: String, typ: String, expr: String) extends Col

  private final case class TableDef(name: String, cols: Seq[Col]) {
    def virtuals: Seq[Virtual] = cols.collect { case v: Virtual => v }
    def defaulteds: Seq[Defaulted] = cols.collect { case d: Defaulted => d }
    def stored: Seq[Col] = cols.filterNot(_.isInstanceOf[Virtual])
    def backing: String = if (virtuals.nonEmpty) name + "__gen" else name
  }

  private val registry = new ConcurrentHashMap[String, TableDef]()

  private def key(name: String) = name.toLowerCase(java.util.Locale.ROOT)

  def clearRegistry(spark: SparkSession): Unit = {
    registry.values.asScala.toSeq.foreach { d =>
      try cleanup(spark, d) catch { case _: Exception => () }
    }
    registry.clear()
  }

  /** Drop the physical objects a registered definition owns. */
  private def cleanup(spark: SparkSession, d: TableDef): Unit = {
    if (d.virtuals.nonEmpty) spark.catalog.dropTempView(d.name)
    spark.sql(s"DROP TABLE IF EXISTS ${d.backing}"): Unit
  }

  private val createRe =
    "(?is)^create\\s+(or\\s+replace\\s+)?table\\s+(?:if\\s+not\\s+exists\\s+)?([\\w.]+)\\s*\\((.+)\\)\\s*$".r
  private val likeRe =
    "(?is)^create\\s+table\\s+([\\w.]+)\\s+like\\s+([\\w.]+)(?:\\s+including\\s+(defaults|all))?\\s*$".r
  private val insertRe =
    "(?is)^insert\\s+into\\s+([\\w.]+)\\s*(?:\\(([^)]*)\\))?\\s*(values\\b.+|select\\b.+|table\\b.+)$".r
  private val dropRe =
    "(?is)^drop\\s+table\\s+(if\\s+exists\\s+)?([\\w.]+)(?:\\s+(?:cascade|restrict|purge))?\\s*$".r
  private val truncateRe = "(?is)^truncate\\s+table\\s+([\\w.]+)\\s*$".r

  private val virtualColRe =
    "(?is)^([\\w`\"]+)\\s+(\\w+(?:\\s*\\(\\s*\\d+(?:\\s*,\\s*\\d+)?\\s*\\))?)\\s+as\\s*\\((.+)\\)\\s+virtual$".r
  private val defaultColRe =
    "(?is)^([\\w`\"]+)\\s+(\\w+(?:\\s*\\(\\s*\\d+(?:\\s*,\\s*\\d+)?\\s*\\))?)\\s+default\\s+(.+)$".r
  private val storedColRe = "(?is)^([\\w`\"]+)\\s+(.+)$".r

  /** Depth-0 comma split (types/exprs carry parens), quote-aware: a
    * comma or paren inside a string literal / quoted identifier (e.g.
    * `v varchar DEFAULT 'a,b'`) must not split the list; a doubled ''
    * inside a string literal is the SQL escape. Unbalanced quotes fail
    * loudly instead of mis-parsing. */
  private def splitCols(s: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var depth = 0; var start = 0; var i = 0
    var quote: Char = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (quote != 0) {
        if (ch == quote) {
          if (quote == '\'' && i + 1 < s.length && s.charAt(i + 1) == '\'') i += 1
          else quote = 0
        }
      } else ch match {
        case '\'' | '`' | '"' => quote = ch
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    require(quote == 0, s"unbalanced quote in column list: $s")
    out += s.substring(start)
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private def bare(n: String) = n.replaceAll("[`\"]", "")

  def maybeRun(spark: SparkSession, text0: String): Option[DataFrame] = {
    val text = text0.trim.stripSuffix(";")
    text match {
      case likeRe(tgt, src, including) =>
        Option(registry.get(key(src))).map(d =>
          runLike(spark, tgt, d, Option(including).map(_.toLowerCase)))
      case createRe(orReplace, name, colList) =>
        // OR REPLACE over a previously-registered definition: tear the
        // old view/backing down and unregister BEFORE the new create,
        // so a stale TableDef can never rewrite later INSERTs
        if (orReplace != null && registry.containsKey(key(name)))
          cleanup(spark, registry.remove(key(name)))
        runCreate(spark, name, colList)
      case insertRe(name, cols, rest) =>
        Option(registry.get(key(name))).map(d =>
          runInsert(spark, d,
            Option(cols).map(_.split(",").toSeq.map(c => bare(c.trim))), rest))
      case dropRe(_, name) if registry.containsKey(key(name)) =>
        cleanup(spark, registry.remove(key(name)))
        Some(spark.emptyDataFrame)
      case truncateRe(name) if registry.containsKey(key(name)) =>
        val d = registry.get(key(name))
        Some(spark.sql(s"TRUNCATE TABLE ${d.backing}"))
      case _ => None
    }
  }

  private def parseCols(colList: String): Seq[Col] = {
    val entries = splitCols(colList)
    entries.map {
      case virtualColRe(n, t, e) => Virtual(bare(n), t, e)
      case defaultColRe(n, t, e) => Defaulted(bare(n), t, e.trim)
      case storedColRe(n, rest) => Stored(bare(n), rest)
      case other => Stored(other, "")
    }
  }

  /** Claim the CREATE only when it declares a VIRTUAL column or a
    * DEFAULT that references another column of the table; constant
    * defaults are Spark-native. */
  private def runCreate(spark: SparkSession, name: String,
      colList: String): Option[DataFrame] = {
    val cols0 = parseCols(colList)
    val names = cols0.map(c => key(c.name)).toSet
    def refsColumn(e: String): Boolean =
      "(?i)[a-z_]\\w*".r.findAllIn(e).exists(tok => names.contains(key(tok)) )
    // defaults that reference no other column degrade to Stored with the
    // native DEFAULT clause preserved in its type suffix
    val cols = cols0.map {
      case d: Defaulted if !refsColumn(d.expr) =>
        Stored(d.name, s"${d.typ} DEFAULT ${d.expr}")
      case c => c
    }
    val hasVirtual = cols.exists(_.isInstanceOf[Virtual])
    val hasRowDefault = cols.exists(_.isInstanceOf[Defaulted])
    if (!hasVirtual && !hasRowDefault) return None

    val d = TableDef(name, cols)
    createPhysical(spark, d)
    registry.put(key(name), d)
    Some(spark.emptyDataFrame)
  }

  private def createPhysical(spark: SparkSession, d: TableDef): Unit = {
    val storedDefs = d.stored.map {
      case Defaulted(n, t, _) => s"$n $t" // row-dependent default: insert-time
      case c => s"${c.name} ${c.typ}"
    }.mkString(", ")
    spark.sql(s"CREATE TABLE ${d.backing} ($storedDefs)")
    if (d.virtuals.nonEmpty) {
      val proj = d.cols.map {
        case Virtual(n, t, e) => s"CAST(($e) AS $t) AS $n"
        case c => c.name
      }.mkString(", ")
      spark.sql(s"CREATE OR REPLACE TEMP VIEW ${d.name} AS SELECT $proj FROM ${d.backing}")
    }
  }

  private def runLike(spark: SparkSession, tgt: String, src: TableDef,
      including: Option[String]): DataFrame = {
    including match {
      case Some(_) =>
        // INCLUDING DEFAULTS / ALL: replicate the generated/defaulted
        // definition under the new name
        val d = src.copy(name = tgt)
        createPhysical(spark, d)
        registry.put(key(tgt), d)
      case None =>
        // bare LIKE: generated/defaulted columns degrade to plain stored
        // columns of the declared type (the reference's behavior)
        val defs = src.cols.map {
          case Virtual(n, t, _) => s"$n $t"
          case Defaulted(n, t, _) => s"$n $t"
          case Stored(n, t) => s"$n $t"
        }.mkString(", ")
        spark.sql(s"CREATE TABLE $tgt ($defs)")
    }
    spark.emptyDataFrame
  }

  private def runInsert(spark: SparkSession, d: TableDef,
      cols: Option[Seq[String]], rest: String): DataFrame = {
    if (d.virtuals.nonEmpty) {
      // naming a generated column (explicitly, or implicitly by
      // omitting the column list) is an error, as in the reference
      val hit = cols match {
        case None => d.virtuals.headOption // implicit list names every column
        case Some(cs) => d.virtuals.find(v => cs.exists(c => key(c) == key(v.name)))
      }
      hit.foreach(v => throw new IllegalArgumentException(
        s"Cannot INSERT into generated column '${v.name.toUpperCase(java.util.Locale.ROOT)}'"))
    }
    // cols is always defined past here for virtual tables (None threw)
    val given = cols.getOrElse(d.stored.map(_.name))
    val missing = d.defaulteds.filterNot(df => given.exists(c => key(c) == key(df.name)))
    if (missing.isEmpty) {
      // a listed row-dependent defaulted column must carry a real value:
      // the physical table has no DEFAULT clause for it, so the bare
      // DEFAULT keyword would silently become NULL — fail loudly instead
      // (string literals stripped before the token scan)
      val listedDefaulted = d.defaulteds.filter(df => given.exists(c => key(c) == key(df.name)))
      if (listedDefaulted.nonEmpty &&
          "(?i)\\bdefault\\b".r.findFirstIn(rest.replaceAll("'[^']*'", " ")).isDefined)
        throw new IllegalArgumentException(
          s"DEFAULT keyword for row-dependent default column '${listedDefaulted.head.name}'" +
            " is not supported: omit the column to have it computed")
      spark.sql(s"INSERT INTO ${d.backing} (${given.mkString(", ")}) $rest")
    } else {
      // compute the row-dependent defaults from the source relation
      // (covers plain-defaulted tables AND the mixed virtual+default
      // case, where the target is the backing table)
      val sel = (given ++ missing.map(m => s"(${m.expr}) AS ${m.name}")).mkString(", ")
      val tgtCols = (given ++ missing.map(_.name)).mkString(", ")
      spark.sql(
        s"INSERT INTO ${d.backing} ($tgtCols) SELECT $sel FROM ($rest) AS __gen_src(${given.mkString(", ")})")
    }
  }
}
