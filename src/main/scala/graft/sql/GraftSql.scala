package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.GraftFunctions

/** SQL entry point (ref: SURVEY.md §7.0 layer 4): the default path
  * delegates to spark.sql — Spark's parser covers the shared surface —
  * while a pre-rewriter lowers Calcite-dialect syntax Spark lacks,
  * mirroring how the reference's babel parser lowers foreign dialects
  * (babel/; sql/parser/SqlParser.java:170).
  *
  * Rewrites (token-aware: quotes and parens are respected):
  *  - `QUALIFY <pred>` (qualify.iq) → wrap the query in a subselect and
  *    filter: `SELECT * FROM (q) __q WHERE pred` (ORDER BY/LIMIT stay
  *    outside, per QUALIFY evaluation order).
  *  - `SAFE_CAST(x AS t)` (SqlLibraryOperators.java:2725) → TRY_CAST.
  *  - `<ident> SIMILAR TO <'pattern'>` (SqlStdOperatorTable.java:1734)
  *    → our similar_to expression; NOT SIMILAR TO likewise.
  */
object GraftSql {

  def sql(spark: SparkSession, rawText: String): DataFrame = {
    GraftFunctions.registerAll(spark)
    // conf-driven lattice home: adopt the session's durable tiles once,
    // BEFORE the first statement plans (no-op without the conf)
    graft.plans.MaterializedViews.autoAdopt(spark)
    // Comments go first (string-aware): every downstream rewrite is a
    // token scan, and a keyword inside `-- ...` or `/* ... */` must not
    // fire it (the reference's lexer discards comments before the
    // parser ever sees them — Parser.jj SKIP section).
    val text0 = stripComments(rawText)
    // measures first: `AS MEASURE` restructures the statement (and a
    // consumer of a measure view needs the session for type derivation)
    val text = rowStarFieldAccess(spark, MeasureSql.maybeRewrite(spark, text0))
    ddl(spark, text.trim)
      .orElse(MatchRecognizeSql.maybeRun(spark, text))
      .getOrElse {
      // NEXT VALUE FOR seq AS alias in the select list: strip the item,
      // run the remaining query, append the sequence column (the
      // sequence column lands last in the output). Ref:
      // SqlStdOperatorTable NEXT_VALUE :2555, sequence.iq.
      // the name may be backtick-quoted — the mask hides its characters,
      // so match any mask/word run and splice the original back out
      val nextVal =
        ("(?is)(NEXT|CURRENT)\\s+VALUE\\s+FOR\\s+([\\w" + "\\u0001" + "`.]+)\\s+AS\\s+(\\w+)\\s*(,)?").r
      nextVal.findFirstMatchIn(maskLiterals(text)) match {
        case Some(m) =>
          val kind = text.substring(m.start(1), m.end(1)).toUpperCase(java.util.Locale.ROOT)
          // quoted/qualified spellings (`s`.`my_seq`) resolve by the
          // bare sequence name; the qualifying schema must actually
          // exist — registered as a sequence schema or present as a
          // database in the session catalog — else the statement fails
          // with "Table not found" (sequence.iq:57). The fixture schema
          // is registered by the conformance harness, not hardcoded.
          val parts = text.substring(m.start(2), m.end(2)).replace("`", "").split('.')
          if (parts.length > 1) {
            val schema = parts.init.last
            val known = graft.functions.Sequences.schemaKnown(schema) ||
              scala.util.Try(spark.catalog.databaseExists(schema)).getOrElse(false)
            if (!known) throw new IllegalArgumentException(
              s"Table '${parts.mkString(".")}' not found")
          }
          val seqName = parts.last
          val alias = text.substring(m.start(3), m.end(3))
          val stripped0 =
            if (m.group(4) != null) text.substring(0, m.start) + text.substring(m.end)
            else { // last item: also eat the comma before it
              val before = text.substring(0, m.start).replaceAll(",\\s*$", " ")
              before + text.substring(m.end)
            }
          // the sequence may have been the ONLY select item
          val bare = "(?is)select\\s+from\\b".r.findFirstIn(stripped0).isDefined
          val stripped =
            if (bare) stripped0.replaceFirst("(?is)select\\s+from\\b", "SELECT 1 AS __seq_ph FROM")
            else stripped0
          val base = spark.sql(rewrite(stripped))
          val withCol =
            if (kind == "NEXT") graft.functions.Sequences.withSequence(base, seqName, alias)
            else base.withColumn(alias,
              org.apache.spark.sql.functions.lit(graft.functions.Sequences.lastValue(seqName)))
          if (bare) withCol.drop("__seq_ph") else withCol
        case None => starReplaceOrder(spark, text, rowEq(spark, sqlWithCorrelateFallback(spark, rewrite(text))))
      }
    }
  }

  /** spark.sql with the manual-Correlate fallback (sql/Decorrelate):
    * correlated-subquery shapes Catalyst's decorrelator rejects are
    * re-executed per-outer-key, the way the reference's
    * RelDecorrelator restates them (SURVEY §7.3 #2). Only analysis
    * failures of the correlation classes reach the fallback; shapes
    * Spark plans natively never do. */
  private def sqlWithCorrelateFallback(spark: SparkSession, s: String): DataFrame =
    try {
      val df = spark.sql(s)
      // some correlation rejections only fire in the OPTIMIZER
      // (RewritePredicateSubquery — an EXISTS join predicate
      // referencing both join inputs) or during PHYSICAL planning
      // (EXISTS under a join OR — Spark's INTERNAL attribute-not-found);
      // force planning so the fallback sees them too. The plans are
      // cached lazy vals, so execution does not redo the work.
      // Streaming relations must stay lazy (their planning happens in
      // writeStream.start()).
      if (!df.isStreaming) df.queryExecution.executedPlan
      df
    } catch {
      case e: Throwable if RecursiveSql.applicable(e) =>
        RecursiveSql(spark, s).getOrElse(throw e)
      case e: Throwable if Decorrelate.applicable(e) =>
        Decorrelate(spark, s).getOrElse(throw e)
    }

  /** `SELECT * REPLACE(e AS c)` keeps c at its ORIGINAL ordinal position
    * (SqlSelect REPLACE; babel select.iq:290); the text rewrite
    * necessarily appends the replaced columns after the EXCEPT-star.
    * Restore the star's natural order by ANALYZING (never executing) the
    * same statement with its REPLACE list dropped and reordering to that
    * schema — skipped when names are ambiguous or the shapes differ. */
  private def starReplaceOrder(spark: SparkSession, text: String, df: DataFrame): DataFrame = {
    val masked = maskLiterals(text)
    val m = "(?is)\\*\\s+REPLACE\\s*\\(".r.findFirstMatchIn(masked).getOrElse(return df)
    val open = m.end - 1
    val close = closeParen(masked, open)
    if (close < 0) return df
    val plain = text.substring(0, m.start + 1) + text.substring(close + 1)
    try {
      // name matching is case-insensitive (Spark's resolver default);
      // the replaced item's spelling may differ in case from the scan's
      val order = spark.sql(rewrite(plain)).schema.fieldNames
      val byLower = df.columns.groupBy(_.toLowerCase(java.util.Locale.ROOT))
      val mapped = order.map(n => byLower.getOrElse(n.toLowerCase(java.util.Locale.ROOT), Array.empty[String]))
      if (mapped.forall(_.length == 1) && mapped.flatten.distinct.length == df.columns.length)
        df.select(mapped.flatten.map(df.col).toIndexedSeq: _*)
      else df
    } catch { case scala.util.control.NonFatal(_) => df }
  }

  /** Standard row-equality 3VL over struct operands (plans/RowEquality):
    * patched on the analyzed plan, before the optimizer can constant-fold
    * Spark's ordering semantics into literal struct comparisons. */
  private def rowEq(spark: SparkSession, df: DataFrame): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    val patched = graft.plans.RowEquality.patch(analyzed)
    if (patched fastEquals analyzed) df
    else org.apache.spark.sql.GraftSqlBridge.ofRows(spark, patched)
  }

  // ---- validation-error surface -----------------------------------------

  /** One validator diagnostic, positioned like the reference's
    * `From line {0}, column {1}` convention. */
  final case class ValidationError(
      message: String,
      errorClass: String,
      line: Option[Int],
      column: Option[Int]) {
    /** Rendered in the reference's wrapper format
      * (CalciteContextException / resource `validatorContext`). */
    def render: String = (line, column) match {
      case (Some(l), Some(c)) => s"At line $l, column ${c + 1}: $message"
      case _ => message
    }
  }

  /** Validate without executing: analyze the (rewritten) statement and
    * map Spark's error conditions onto the reference validator's message
    * contract (runtime/CalciteResource.properties:57,83,88,92 — "No
    * match found for function signature {0}", "Object ''{0}'' not
    * found", "Column ''{0}'' not found in any table", "Column ''{0}''
    * is ambiguous"; produced by SqlValidatorImpl.newValidationError).
    * Empty result = the statement validates.
    *
    * Unlike Spark's analyzer (first error wins), this collects MULTIPLE
    * diagnostics the way the reference validator walks independent
    * nodes: when the outer statement is a plain SELECT, each select-list
    * item is re-analyzed independently (plus one pass for the
    * FROM/WHERE/GROUP side), and every distinct failure is reported,
    * positioned at its item's own offset in the original text. */
  def validate(spark: SparkSession, text: String): Seq[ValidationError] = {
    val clean = stripComments(text)
    val first = validateOne(spark, clean)
    if (first.isEmpty) return Nil
    if (first.head.errorClass == "PARSE_SYNTAX_ERROR") return first

    // per-select-item decomposition of the outer SELECT
    val masked = maskLiterals(clean)
    val up = clean.trim.toUpperCase
    val selAt = masked.toUpperCase.indexOf("SELECT")
    val fromAt = topLevelIndex(masked, "FROM")
    if (!up.startsWith("SELECT") || fromAt < 0) return first
    val listStart = selAt + "SELECT".length
    val items = splitTopLevel(clean.substring(listStart, fromAt))
    if (items.isEmpty) return first
    val tail = clean.substring(fromAt)
    // select items re-analyze over the FROM clause alone — a failing
    // WHERE/GROUP side must not mask an item's own diagnostic (the
    // FROM side gets its own pass below)
    val fromOnlyEnd = Seq("WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "QUALIFY")
      .map(kw => topLevelIndex(masked, kw, fromAt)).filter(_ >= 0)
      .reduceOption(_ min _).getOrElse(clean.length)
    val fromOnly = clean.substring(fromAt, fromOnlyEnd)

    def position(offset: Int): (Option[Int], Option[Int]) = {
      val upTo = clean.substring(0, offset)
      val line = upTo.count(_ == '\n') + 1
      val col = offset - (upTo.lastIndexOf('\n') + 1)
      (Some(line), Some(col))
    }
    var cursor = listStart
    val perItem = items.flatMap { it =>
      val at = cursor + it.takeWhile(_.isWhitespace).length
      cursor += it.length + 1 // the consumed comma
      validateOne(spark, s"SELECT ${it.trim} $fromOnly").map { e =>
        val (l, c) = position(at)
        e.copy(line = l, column = c)
      }
    }
    val fromSide = validateOne(spark, s"SELECT 1 $tail").map { e =>
      val (l, c) = position(fromAt)
      e.copy(line = l, column = c)
    }
    val all = (perItem ++ fromSide).foldLeft(Vector.empty[ValidationError]) {
      (acc, e) => if (acc.exists(a => a.message == e.message)) acc else acc :+ e
    }
    if (all.nonEmpty) all else first
  }

  private def validateOne(spark: SparkSession, clean: String): Seq[ValidationError] = {
    try {
      spark.sql(rewrite(clean)).queryExecution.assertAnalyzed()
      Nil
    } catch {
      // ParseException IS an AnalysisException in Spark 4 — match it first
      case e: org.apache.spark.sql.catalyst.parser.ParseException =>
        Seq(ValidationError(e.getSimpleMessage, "PARSE_SYNTAX_ERROR",
          e.line, e.startPosition))
      case e: org.apache.spark.sql.AnalysisException => Seq(toValidationError(e))
      case scala.util.control.NonFatal(e) =>
        Seq(ValidationError(Option(e.getMessage).getOrElse(e.getClass.getSimpleName),
          "VALIDATION_ERROR", None, None))
    }
  }

  private def toValidationError(
      e: org.apache.spark.sql.AnalysisException): ValidationError = {
    val cls = Option(e.getCondition).getOrElse("")
    def param(k: String): Option[String] =
      Option(e.getMessageParameters.get(k)).map(_.replace("`", ""))
    val msg = cls match {
      case c if c.startsWith("TABLE_OR_VIEW_NOT_FOUND") =>
        s"Object '${param("relationName").getOrElse("?")}' not found"
      case c if c.startsWith("UNRESOLVED_COLUMN") =>
        val base = s"Column '${param("objectName").getOrElse("?")}' not found in any table"
        param("proposal") match {
          case Some(p) => s"$base; did you mean '${p.split(",").head.trim}'?"
          case None => base
        }
      case c if c.startsWith("UNRESOLVED_ROUTINE") =>
        s"No match found for function signature ${param("routineName").getOrElse("?")}"
      case c if c.startsWith("AMBIGUOUS_REFERENCE") =>
        s"Column '${param("name").getOrElse("?")}' is ambiguous"
      case c if c.startsWith("TABLE_OR_VIEW_ALREADY_EXISTS") =>
        // CalciteResource tableExists: "Table ''{0}'' already exists"
        // (unqualified, as the reference names it)
        s"Table '${param("relationName").map(_.split('.').last).getOrElse("?")}' already exists"
      case c if c.startsWith("WRONG_NUM_ARGS") =>
        // CalciteResource invalidArgCount: "Invalid number of arguments
        // to function ''{0}''. Was expecting {1} arguments"
        s"Invalid number of arguments to function '${param("functionName").getOrElse("?")}'. " +
          s"Was expecting ${param("expectedNum").getOrElse("?")} arguments"
      case _ => e.getSimpleMessage
    }
    ValidationError(msg, cls, e.line, e.startPosition)
  }

  // ---- literal/comment safety -----------------------------------------

  /** Remove `-- ...` and `/* ... */` comments (string-aware — a dash-dash
    * inside a literal or a backtick-quoted identifier is content, not a
    * comment; bracketed comments NEST, as Spark's lexer allows). Each
    * comment collapses to one space so token boundaries survive. */
  private[graft] def stripComments(s: String): String = {
    val sb = new StringBuilder
    var inStr = false
    var inTick = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false; sb.append(c); i += 1 }
      else if (inTick) { if (c == '`') inTick = false; sb.append(c); i += 1 }
      else if (c == '\'') { inStr = true; sb.append(c); i += 1 }
      else if (c == '`') { inTick = true; sb.append(c); i += 1 }
      else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        while (i < s.length && s.charAt(i) != '\n') i += 1
        sb.append(' ')
      } else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        var depth = 1
        i += 2
        while (i < s.length && depth > 0) {
          if (s.startsWith("/*", i)) { depth += 1; i += 2 }
          else if (s.startsWith("*/", i)) { depth -= 1; i += 2 }
          else i += 1
        }
        sb.append(' ')
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Same-length copy with every char INSIDE a '...' literal replaced by
    * U+0001 (quotes preserved): regexes FIND on the mask — positions map
    * 1:1 — while replacement text is spliced from the original, so a
    * keyword inside a string literal or a backtick-quoted identifier can
    * never trigger a rewrite (backtick content is masked too). */
  private[graft] def maskLiterals(s: String): String = {
    val a = s.toCharArray
    var inStr = false
    var inTick = false
    var i = 0
    while (i < a.length) {
      if (inStr) { if (a(i) == '\'') inStr = false else a(i) = '\u0001' }
      else if (inTick) { if (a(i) == '`') inTick = false else a(i) = '\u0001' }
      else if (a(i) == '\'') inStr = true
      else if (a(i) == '`') inTick = true
      i += 1
    }
    new String(a)
  }

  /** replaceAllIn driven by matches on the MASKED text; `f` receives the
    * masked match (positions valid in the original) plus the original
    * text for group extraction. */
  private[sql] def replaceMasked(sql: String, re: scala.util.matching.Regex)(
      f: (scala.util.matching.Regex.Match, String) => String): String = {
    val sb = new StringBuilder
    var last = 0
    re.findAllMatchIn(maskLiterals(sql)).foreach { m =>
      sb.append(sql.substring(last, m.start)).append(f(m, sql))
      last = m.end
    }
    sb.append(sql.substring(last))
    sb.toString
  }

  /** Group `i` of a masked match, read from the ORIGINAL text (masked
    * group content would have its literal chars destroyed). */
  private[sql] def origGroup(m: scala.util.matching.Regex.Match, orig: String, i: Int): String =
    if (m.start(i) < 0) null else orig.substring(m.start(i), m.end(i))

  /** Statement-level DDL the engine owns (ref: server module,
    * sql/ddl/SqlCreateSequence via SqlDdlParserImpl): CREATE/DROP
    * SEQUENCE route to the sequence catalog; all other DDL (CREATE
    * TABLE/VIEW, INSERT, DROP, ...) flows through spark.sql unchanged —
    * Spark's executor IS the DDL engine. */
  private def ddl(spark: SparkSession, text: String): Option[DataFrame] = {
    val createSeq =
      "(?is)^CREATE\\s+SEQUENCE\\s+(\\w+)(?:\\s+START\\s+WITH\\s+(-?\\d+))?(?:\\s+INCREMENT\\s+BY\\s+(-?\\d+))?\\s*;?$".r
    val dropSeq = "(?is)^DROP\\s+SEQUENCE\\s+(\\w+)\\s*;?$".r
    text match {
      case createSeq(name, start, step) =>
        graft.functions.Sequences.create(name,
          Option(start).map(_.toLong).getOrElse(1L),
          Option(step).map(_.toLong).getOrElse(1L))
        Some(spark.emptyDataFrame)
      case dropSeq(name) =>
        graft.functions.Sequences.drop(name)
        Some(spark.emptyDataFrame)
      case _ => MaterializedViewSql.maybeRun(spark, text)
        .orElse(MaterializedViewSql.maybeMetadataTables(spark, text))
        .orElse(TypesSql.maybeRun(spark, text))
        .orElse(GeneratedColumnsSql.maybeRun(spark, text))
        .orElse(ForeignSchemaSql.maybeRun(spark, text))
    }
  }

  private[graft] def rewriteProbe(sql: String): String = rewrite(sql)

  /** Conformance-harness toggle (CorpusSpec only): make the reference's
    * Oracle-style default null ordering explicit AFTER every other
    * rewrite has parsed its ORDER BY clauses — running it earlier broke
    * the WITHIN GROUP / scalar-subquery-LIMIT / json_arrayagg parsers,
    * which match on unqualified sort items. */
  @volatile private[graft] var oracleNullDefault = false

  private[graft] def rewrite(sql0: String): String = {
    val sql = rewrite0(sql0)
    if (oracleNullDefault) OracleNullOrder.rewrite(sql) else sql
  }

  private[graft] def rewrite0(sql: String): String =
    Seq[String => String](
      TypesSql.expand, TypesSql.rewriteCastRow,
      MeasureSql.ddlRewrite, AsofSql.rewrite, WithinDistinctSql.rewrite,
      GroupingSetsSql.rewrite, ExcludeFrameSql.rewrite,
      SubqueryRewrites.apply, rewriteProjectionIn, rewriteUnorderedWindow,
      rewriteDistinctOrderByAlias,
      rewriteDistinctOn, rewriteSelectBy, UnpivotTupleSql.rewrite,
      rewriteExclude,
      rewriteRowCompare, rewriteRowNullCheck, rewriteTupleInList,
      rewriteRowCtor, rewriteTop,
      rewriteMysqlLimit,
      rewriteWindowTvf, rewriteExtend, rewriteDual, rewriteFetch,
      rewriteCastFormat, rewriteStarReplace, JsonAggSql.apply, rewriteJsonValue,
      rewriteJsonExists,
      rewriteSafeCast, rewriteSimilarTo, rewriteQualify, rewriteWindowFilter,
      rewriteUuid,
      rewriteBareTypes, rewriteDecimalLit, rewriteNullifFold,
      rewriteUnsignedArith, rewriteUnsignedCast, rewriteVariantOps, CollectionSql.apply,
      rewriteTablesample, rewriteIntervalExpr, rewriteLateralValues,
      rewriteValuesAlias,
      rewritePivotAlias, rewriteUnpivotLabel
    ).foldLeft(sql)((s, f) => f(s))

  /** `SELECT DISTINCT ... GROUP BY ... ORDER BY <aggregate>`: Spark's
    * analyzer rejects ordering a DISTINCT by an expression that is not
    * in the (distinct) select list — but when the SAME expression
    * appears there under an alias (CALCITE-634, sort.iq:354: `select
    * distinct deptno, count(*) as c ... order by count(*)`), ordering
    * by the alias is equivalent. Substitute it. */
  private[graft] def rewriteDistinctOrderByAlias(sql: String): String = {
    val masked = maskLiterals(sql)
    if ("(?is)^\\s*SELECT\\s+DISTINCT\\b".r.findFirstIn(masked).isEmpty) return sql
    def norm(s: String) = s.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", "")
    // select items: DISTINCT .. top-level FROM
    val selM = "(?is)^\\s*SELECT\\s+DISTINCT\\s".r.findFirstMatchIn(masked).getOrElse(return sql)
    var i = selM.end
    var depth = 0
    var fromAt = -1
    while (i < masked.length && fromAt < 0) {
      val c = masked.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && masked.regionMatches(true, i, "FROM", 0, 4) &&
        !masked.charAt(i - 1).isLetterOrDigit &&
        (i + 4 >= masked.length || !masked.charAt(i + 4).isLetterOrDigit)) fromAt = i
      i += 1
    }
    if (fromAt < 0) return sql
    val aliasOf = splitElemsOf(sql, masked, selM.end, fromAt).flatMap { item =>
      "(?is)^(.*\\S)\\s+AS\\s+([A-Za-z_]\\w*|`[^`]*`)\\s*$".r.findFirstMatchIn(item.trim)
        .map(mm => norm(mm.group(1)) -> mm.group(2))
    }.toMap
    if (aliasOf.isEmpty) return sql
    // top-level ORDER BY after FROM
    val obM = "(?is)\\bORDER\\s+BY\\s".r.findAllMatchIn(masked).filter { m =>
      m.start > fromAt && {
        val pre = masked.substring(fromAt, m.start)
        pre.count(_ == '(') == pre.count(_ == ')')
      }
    }.toSeq.lastOption.getOrElse(return sql)
    var j = obM.end - 1
    depth = 0
    var obEnd = -1
    while (j < masked.length && obEnd < 0) {
      val c = masked.charAt(j)
      if (c == '(') depth += 1
      else if (c == ')') { if (depth == 0) obEnd = j else depth -= 1 }
      else if (depth == 0 && !masked.charAt(j - 1).isLetterOrDigit &&
        "(?is)^(LIMIT|OFFSET|FETCH)\\b".r.findFirstIn(masked.substring(j)).isDefined) obEnd = j
      j += 1
    }
    if (obEnd < 0) obEnd = sql.replaceAll("[;\\s]+$", "").length
    var changed = false
    val newItems = splitElemsOf(sql, masked, obM.end - 1, obEnd).map { item =>
      val t = item.trim
      val sm = "(?is)^(.*?)(\\s+(?:ASC|DESC))?(\\s+NULLS\\s+(?:FIRST|LAST))?\\s*$".r
        .findFirstMatchIn(t).get
      // bare identifiers stay: they resolve against OUTPUT columns
      // (possibly an alias of a different expression), so substituting
      // them could silently change the sort key; the Spark-rejected
      // shape is the non-identifier one (ORDER BY count(*))
      val isBareIdent = "^[A-Za-z_]\\w*$".r.matches(sm.group(1).trim)
      aliasOf.get(norm(sm.group(1))).filter(_ => !isBareIdent) match {
        case Some(alias) =>
          changed = true
          alias + Option(sm.group(2)).getOrElse("") + Option(sm.group(3)).getOrElse("")
        case None => t
      }
    }
    if (!changed) sql
    else sql.substring(0, obM.end - 1) + " " + newItems.mkString(", ") + sql.substring(obEnd)
  }

  /** Rank-family window calls WITHOUT an ORDER BY (winagg.iq:553 —
    * `row_number() over (partition by deptno)`): the reference permits
    * them with arbitrary (input) order; Spark rejects. A constant sort
    * key reproduces the permissive semantics — rows number in input
    * order, and the default RANGE frame spans the whole peer group
    * (= the whole partition under a constant key), matching
    * `nth_value(...) over ()`. */
  private[graft] def rewriteUnorderedWindow(sql: String): String = {
    val masked = maskLiterals(sql)
    val re = ("(?is)\\b(row_number|rank|dense_rank|ntile|nth_value|" +
      "cume_dist|percent_rank)\\s*\\(").r
    for (m <- re.findAllMatchIn(masked)) {
      val argOpen = masked.indexOf('(', m.start)
      val argClose = closeParen(masked, argOpen)
      if (argClose > 0) {
        val om = "(?is)^\\s*OVER\\s*\\(".r.findFirstMatchIn(masked.substring(argClose + 1))
        om.foreach { o =>
          val oOpen = argClose + 1 + o.end - 1
          val oClose = closeParen(masked, oOpen)
          if (oClose > 0 &&
              "(?is)\\bORDER\\s+BY\\b".r.findFirstIn(masked.substring(oOpen, oClose)).isEmpty) {
            val sep = if (sql.substring(oOpen + 1, oClose).trim.isEmpty) "" else " "
            return rewriteUnorderedWindow(
              sql.substring(0, oClose) + sep + "ORDER BY 'x'" + sql.substring(oClose))
          }
        }
      }
    }
    sql
  }

  /** `expr [NOT] IN (SELECT ...)` in the SELECT LIST (sub-query.iq:104):
    * Spark plans the projected IN as an ExistenceJoin, which returns
    * FALSE where three-valued logic requires UNKNOWN (no match but the
    * subquery or the probe value holds NULL). The exact 3VL value is
    * restated from three correlated/plain COUNT subqueries:
    * TRUE on a match; NULL when the probe is NULL and the subquery is
    * non-empty, or when the subquery contains a NULL; else FALSE.
    * WHERE-clause forms keep Spark's native (correct) semi-join path. */
  private[graft] def rewriteProjectionIn(sql: String): String = {
    val masked = maskLiterals(sql)
    val selM = "(?is)^\\s*SELECT\\s".r.findFirstMatchIn(masked).getOrElse(return sql)
    var i = selM.end
    var depth = 0
    var fromAt = -1
    while (i < masked.length && fromAt < 0) {
      val c = masked.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && masked.regionMatches(true, i, "FROM", 0, 4) &&
          !masked.charAt(i - 1).isLetterOrDigit &&
          (i + 4 >= masked.length || !masked.charAt(i + 4).isLetterOrDigit)) fromAt = i
      i += 1
    }
    if (fromAt < 0) return sql
    for (m <- "(?is)\\b(NOT\\s+)?IN\\s*\\(".r.findAllMatchIn(masked.substring(0, fromAt))
           if m.start > selM.end) {
      val open = masked.indexOf('(', m.end - 1)
      val close = closeParen(masked, open)
      if (close > 0 && close < fromAt &&
          "(?is)^\\s*(SELECT|WITH)\\b".r.findFirstIn(masked.substring(open + 1, close)).isDefined) {
        // LHS: a single identifier/qualified identifier or literal
        val lhsM = "(?is)([A-Za-z_][\\w.]*|\\d+(?:\\.\\d+)?)\\s*$".r
          .findFirstMatchIn(masked.substring(0, m.start))
        lhsM.foreach { lm =>
          val lhs = sql.substring(lm.start(1), lm.end(1))
          // a COMPOUND LHS (`a + 1 IN (...)`) would splice the CASE
          // after the operator and break the statement — bail to the
          // native ExistenceJoin path when the captured primary is
          // preceded by an operator/non-boundary token
          val beforeLhs = masked.substring(0, lm.start(1))
            .reverse.dropWhile(_.isWhitespace).headOption
          val compound = beforeLhs.exists(c => "+-*/%^|&=<>!:".contains(c))
          if (!lhs.equalsIgnoreCase("not") && !compound) {
            val sub = sql.substring(open + 1, close)
            val inner =
              s"CASE WHEN (SELECT count(*) FROM ($sub) __in3(__v) WHERE __v = $lhs) > 0 THEN TRUE " +
                s"WHEN $lhs IS NULL AND (SELECT count(*) FROM ($sub) __in3t) > 0 THEN CAST(NULL AS BOOLEAN) " +
                s"WHEN (SELECT count(*) FROM ($sub) __in3n(__v) WHERE __v IS NULL) > 0 THEN CAST(NULL AS BOOLEAN) " +
                s"ELSE FALSE END"
            val rep = if (m.group(1) != null) s"(NOT $inner)" else s"($inner)"
            return rewriteProjectionIn(
              sql.substring(0, lm.start(1)) + rep + sql.substring(close + 1))
          }
        }
      }
    }
    sql
  }

  /** `(a, b) [NOT] IN ((x1, y1), ...)` over a LITERAL tuple list
    * (sub-query.iq:4325): Spark's struct-typed IN requires exact field
    * types (no per-field coercion of NULL/int literals into DECIMAL),
    * so the row IN expands to the ANSI-equivalent OR of pairwise
    * conjunctions — `(a = x1 AND b = y1) OR ...` — whose scalar
    * comparisons coerce individually and whose 3VL composition is
    * identical (FALSE AND UNKNOWN = FALSE; OR yields UNKNOWN only with
    * no TRUE). Subquery RHS passes through untouched. */
  private[graft] def rewriteTupleInList(sql: String): String = {
    val masked = maskLiterals(sql)
    for (m <- "(?is)\\)\\s*(NOT\\s+)?IN\\s*\\(".r.findAllMatchIn(masked)) {
      val rOpen = masked.indexOf('(', m.end - 1)
      val rClose = closeParen(masked, rOpen)
      val firstIn = masked.substring(rOpen + 1, if (rClose > 0) rClose else masked.length).trim
      if (rClose > 0 && firstIn.startsWith("(")) {
        // LHS tuple: the ')' at m.start closes it
        var depth = 1
        var i = m.start - 1
        while (i >= 0 && depth > 0) {
          val c = masked.charAt(i)
          if (c == ')') depth += 1 else if (c == '(') depth -= 1
          if (depth > 0) i -= 1
        }
        val lOpen = i
        // must be a bare tuple, not a function call or subquery: a
        // preceding identifier makes it a call UNLESS it's a keyword
        val isCall = lOpen > 0 && {
          val before = masked.substring(0, lOpen)
          val word = "(?is)([A-Za-z_]\\w*)\\s*$".r.findFirstMatchIn(before).map(_.group(1).toUpperCase)
          val kw = Set("WHERE", "AND", "OR", "NOT", "ON", "WHEN", "THEN",
            "ELSE", "CASE", "SELECT", "HAVING", "BY", "ALL", "ANY", "SOME",
            "IN", "IS", "LIKE", "BETWEEN", "JOIN", "FROM", "AS", "END")
          word.map(!kw.contains(_)).getOrElse(
            "(?is)[`\\)\\d]\\s*$".r.findFirstIn(before).isDefined)
        }
        if (lOpen >= 0 && !isCall) {
          val lhs = splitElemsOf(sql, masked, lOpen + 1, m.start)
          val rhsTuples = splitElemsOf(sql, masked, rOpen + 1, rClose)
          val allTuples = rhsTuples.forall(_.trim.startsWith("("))
          // a row SUBQUERY on either side is not a tuple — splitting it
          // on commas would corrupt it
          val subqRe = "(?is)^\\(?\\s*(SELECT|WITH|VALUES)\\b".r
          val anySubq =
            subqRe.findFirstIn(masked.substring(lOpen + 1, m.start).trim).isDefined ||
              rhsTuples.exists(t => subqRe.findFirstIn(t.trim).isDefined)
          if (lhs.length >= 2 && allTuples && !anySubq) {
            val tuples = rhsTuples.map { t =>
              val tm = maskLiterals(t)
              splitElemsOf(t, tm, tm.indexOf('(') + 1, closeParen(tm, tm.indexOf('(')))
            }
            if (tuples.forall(_.length == lhs.length)) {
              val ors = tuples.map(vals =>
                lhs.zip(vals).map { case (l, v) => s"($l) = ($v)" }
                  .mkString("(", " AND ", ")"))
                .mkString("(", " OR ", ")")
              val not = if (m.group(1) != null) "NOT " else ""
              return rewriteTupleInList(
                sql.substring(0, lOpen) + not + ors + sql.substring(rClose + 1))
            }
          }
        }
      }
    }
    sql
  }

  /** Top-level comma elements of sql[from, to), split on the MASKED
    * twin so literals never break the split (shared by the tuple-IN,
    * grouping-sets, and unpivot rewrites). */
  private[sql] def splitElemsOf(sql: String, masked: String, from: Int, to: Int): Seq[String] = {
    val lens = splitTopLevel(masked.substring(from, to)).map(_.length)
    val starts = lens.scanLeft(0)((a, b) => a + b + 1).init
    starts.zip(lens).map { case (st, n) => sql.substring(from + st, from + st + n).trim }
  }

  /** Single-field row comparison `ROW(a) <op> ROW(b)` (misc.iq:165) —
    * unwrap to the scalar comparison so Spark's implicit coercions apply
    * (struct comparison requires identical field types). Runs before the
    * general ROW→struct rewrite. */
  private def rewriteRowCompare(sql: String): String =
    replaceMasked(sql,
      "(?is)\\bROW\\s*\\(([^(),]*)\\)\\s*(=|<>|!=|<=|>=|<|>)\\s*ROW\\s*\\(([^(),]*)\\)".r)((m, o) =>
      s"(${origGroup(m, o, 1)}) ${m.group(2)} (${origGroup(m, o, 3)})")

  /** `FROM <rel> PIVOT (...) AS e [WHERE ...]` (pivot.iq:78) — Spark's
    * pivot clause takes no alias, so wrap the pivot in a subquery and
    * alias that. */
  private def rewritePivotAlias(sql: String): String = {
    val masked = maskLiterals(sql)
    val pAt = topLevelIndex(masked, "PIVOT")
    if (pAt < 0) return sql
    val open = masked.indexOf('(', pAt)
    if (open < 0) return sql
    val close = closeParen(masked, open)
    if (close < 0) return sql
    val aliasRe = "(?is)^\\s*AS\\s+(\\w+)".r
    val am = aliasRe.findFirstMatchIn(masked.substring(close + 1)).getOrElse(return sql)
    // the relation being pivoted starts after the last top-level FROM
    // before the PIVOT keyword
    var fromAt = -1
    var i = 0
    while (i >= 0 && i < pAt) {
      val next = topLevelIndex(masked, "FROM", i)
      if (next >= 0 && next < pAt) { fromAt = next; i = next + 4 } else i = -1
    }
    if (fromAt < 0) return sql
    val relStart = fromAt + 4
    sql.substring(0, relStart) + " (SELECT * FROM " +
      sql.substring(relStart, close + 1).trim + ") " + am.group(1) +
      sql.substring(close + 1 + am.end)
  }

  /** UNPIVOT IN-list labels are string literals in the reference
    * (`comm AS 'commission'`, SqlUnpivot); Spark spells them as alias
    * identifiers. Scoped to statements containing UNPIVOT. */
  private def rewriteUnpivotLabel(sql: String): String = {
    val masked0 = maskLiterals(sql)
    val up = topLevelIndexAnyDepth(masked0, "UNPIVOT")
    if (up < 0) return sql
    replaceMasked(sql, "(?is)\\bAS\\s+('[^']*')".r)((m, o) =>
      "AS `" + origGroup(m, o, 1).stripPrefix("'").stripSuffix("'") + "`")
  }

  /** A bare UNPIVOT IN-list column (`IN (sal, comm)`) labels with the
    * identifier AS WRITTEN in Spark, where the reference's lexer
    * uppercases unquoted identifiers (pivot.iq:554) — corpus-dialect
    * behavior, applied by the conformance harness only (the product
    * surface is Spark's case-preserving one; q135 depends on it). */
  private[graft] def upperUnpivotLabels(s1: String): String = {
    val masked = maskLiterals(s1)
    val upAt = topLevelIndexAnyDepth(masked, "UNPIVOT")
    if (upAt < 0) return s1
    val open = masked.indexOf('(', upAt)
    if (open < 0) return s1
    val close = closeParen(masked, open)
    if (close < 0) return s1
    val inAt = masked.substring(0, close).toUpperCase.indexOf(" IN ", open)
    if (inAt < 0) return s1
    val listOpen = masked.indexOf('(', inAt)
    val listClose = closeParen(masked, listOpen)
    if (listOpen < 0 || listClose < 0 || listClose > close) return s1
    val entries = splitTopLevel(s1.substring(listOpen + 1, listClose)).map { e =>
      val t = e.trim
      if (t.matches("\\w+")) s"$t AS `${t.toUpperCase}`" else t
    }
    s1.substring(0, listOpen + 1) + entries.mkString(", ") + s1.substring(listClose)
  }

  /** Unsigned ARITHMETIC boundaries (unsigned.iq:27/60/69/108): the
    * reference derives an UNSIGNED result type for +,-,* and unary
    * minus over an unsigned operand, then range-checks it — `-u`,
    * `u1 - u2` below zero and `u * k` past the width's max all ERROR
    * instead of wrapping into the carrier. Wraps the syntactic
    * `CAST(.. UNSIGNED) op operand` / `-CAST(.. UNSIGNED)` shapes in an
    * IF-range-check BEFORE the casts lower (single pass — the wrapped
    * text re-embeds the casts, which rewriteUnsignedCast then lowers). */
  private def rewriteUnsignedArith(sql: String): String = {
    val masked = maskLiterals(sql)
    val maxOf = Map("TINYINT" -> BigInt(255), "SMALLINT" -> BigInt(65535),
      "INT" -> BigInt("4294967295"), "INTEGER" -> BigInt("4294967295"),
      "" -> BigInt("4294967295"), "BIGINT" -> BigInt("18446744073709551615"))
    val castRe = "(?is)\\bCAST\\s*\\(".r
    val unsTypeRe = "(?is)\\bAS\\s+((?:TINYINT|SMALLINT|INTEGER|INT|BIGINT)?)\\s*UNSIGNED\\s*$".r
    val sb = new StringBuilder
    var last = 0
    for (m <- castRe.findAllMatchIn(masked) if m.start >= last) {
      val open = masked.indexOf('(', m.start)
      val close = closeParen(masked, open)
      if (close > 0) {
        val inner = masked.substring(open + 1, close)
        unsTypeRe.findFirstMatchIn(inner).foreach { tm =>
          val myMax = maxOf(tm.group(1).toUpperCase(java.util.Locale.ROOT))
          // unary minus directly before the cast, in a unary position
          // (preceded by start, a punctuation/operator, or a keyword)
          val preTrimmed = masked.substring(0, m.start)
            .reverse.dropWhile(_.isWhitespace).reverse
          val unary = preTrimmed.endsWith("-") && {
            val beforeMinus = preTrimmed.dropRight(1).trim
            beforeMinus.isEmpty || "([,=<>+*/-".contains(beforeMinus.last) ||
              "(?is).*\\b(select|where|and|or|when|then|else|on|having|by|values)$".r
                .matches(beforeMinus)
          }
          // binary +,-,* after the cast with a simple right operand
          var j = close + 1
          while (j < masked.length && masked.charAt(j).isWhitespace) j += 1
          val op = if (j < masked.length && "+-*".contains(masked.charAt(j))) Some(masked.charAt(j)) else None
          if (unary) {
            val exprStart = preTrimmed.length - 1 // the '-' itself
            val expr = sql.substring(exprStart, close + 1)
            if (exprStart >= last) {
              sb.append(sql.substring(last, exprStart))
                .append(s"IF(($expr) BETWEEN 0 AND $myMax, ($expr), " +
                  s"CAST(raise_error(CONCAT('Value is out of range : ', " +
                  s"CAST(($expr) AS STRING))) AS BIGINT))")
              last = close + 1
            }
          } else op.foreach { _ =>
            // right operand: signed int literal, identifier, or a
            // balanced call/paren group (e.g. another unsigned cast)
            var k = j + 1
            while (k < masked.length && masked.charAt(k).isWhitespace) k += 1
            var end = k
            if (end < masked.length && masked.charAt(end) == '-') end += 1
            while (end < masked.length &&
              (masked.charAt(end).isLetterOrDigit || masked.charAt(end) == '_' ||
                masked.charAt(end) == '.')) end += 1
            if (end < masked.length && masked.charAt(end) == '(') {
              val c2 = closeParen(masked, end)
              if (c2 > 0) end = c2 + 1
            }
            if (end > k && m.start >= last) {
              // the reference derives the arithmetic's type as the
              // LEAST RESTRICTIVE of the operands: a WIDER signed
              // literal absorbs a narrower unsigned operand
              // (UTINYINT * 255 is INTEGER — unsigned.iq:122 passes
              // with 65025), while same-width signed literals lose to
              // the unsigned type (UINT - 200 range-checks). Widths:
              // int literals are INTEGER (32) unless they need BIGINT.
              val widthOf = Map("TINYINT" -> 8, "SMALLINT" -> 16,
                "INT" -> 32, "INTEGER" -> 32, "" -> 32, "BIGINT" -> 64)
              val myWidth = widthOf(tm.group(1).toUpperCase(java.util.Locale.ROOT))
              val rightM = masked.substring(k, end)
              val rightOrig = sql.substring(k, end)
              val rUns = unsTypeRe.findFirstMatchIn(
                if (rightM.toUpperCase.endsWith(")")) rightM.dropRight(1) else rightM)
                .map(_.group(1).toUpperCase(java.util.Locale.ROOT))
              val rightWidth: Option[Int] =
                if (rUns.isDefined) rUns.map(widthOf)
                else if (rightOrig.trim.matches("-?\\d+"))
                  Some(if (BigInt(rightOrig.trim).abs > BigInt(Int.MaxValue)) 64 else 32)
                else None // identifier/complex: type unknown, no check
              val checked = rightWidth.exists(rw =>
                rUns.isDefined || rw <= myWidth)
              if (checked) {
                val rMax = rUns.map(maxOf)
                val max = Seq(Some(myMax), rMax).flatten.max
                val expr = sql.substring(m.start, end)
                sb.append(sql.substring(last, m.start))
                  .append(s"IF(($expr) BETWEEN 0 AND $max, ($expr), " +
                    s"CAST(raise_error(CONCAT('Value is out of range : ', " +
                    s"CAST(($expr) AS STRING))) AS BIGINT))")
                last = end
              }
            }
          }
        }
      }
    }
    sb.append(sql.substring(last)).toString
  }

  /** `CAST(e AS [TINYINT|SMALLINT|INT|INTEGER|BIGINT] UNSIGNED)` (ref:
    * sql/type/SqlTypeName.java:61-64, unsigned.iq): lower onto the
    * range-checked widened-carrier scheme of functions/Unsigned.scala —
    * each unsigned type rides the next wider signed type with an
    * explicit bounds check, erroring (like the reference) instead of
    * wrapping. Bare UNSIGNED is INTEGER UNSIGNED. Innermost-first so
    * nested unsigned casts lower cleanly. */
  private def rewriteUnsignedCast(sql: String): String = {
    val carriers = Map(
      "TINYINT" -> ("SMALLINT", "255"), "SMALLINT" -> ("INT", "65535"),
      "INT" -> ("BIGINT", "4294967295"), "INTEGER" -> ("BIGINT", "4294967295"),
      "" -> ("BIGINT", "4294967295"),
      "BIGINT" -> ("DECIMAL(20,0)", "18446744073709551615"))
    val typeRe = "(?is)^AS\\s+((?:TINYINT|SMALLINT|INTEGER|INT|BIGINT)?)\\s*UNSIGNED\\s*$".r
    var cur = sql
    var changed = true
    while (changed) {
      changed = false
      val masked = maskLiterals(cur)
      var i = if (masked.toUpperCase.contains("UNSIGNED"))
        masked.toUpperCase.indexOf("CAST") else -1
      while (i >= 0 && !changed) {
        val open = masked.indexOf('(', i + 4)
        val onlyWs = open > 0 && masked.substring(i + 4, open).forall(_.isWhitespace)
        val close = if (onlyWs) closeParen(masked, open) else -1
        if (close > 0) {
          val innerM = masked.substring(open + 1, close)
          val asAt = topLevelIndexLast(innerM, "AS")
          if (asAt >= 0) typeRe.findFirstMatchIn(innerM.substring(asAt)).foreach { m =>
            val e = cur.substring(open + 1, open + 1 + asAt).trim
            val (c, max) = carriers(m.group(1).toUpperCase)
            // literal fast path: foldable at rewrite time, so the cast
            // stays usable in inline-table VALUES (unsigned.iq:21)
            val rep =
              if (e.matches("\\d+") && BigInt(e) <= BigInt(max)) s"CAST($e AS $c)"
              else s"IF(CAST(($e) AS $c) IS NULL OR CAST(($e) AS $c) BETWEEN 0 AND $max, CAST(($e) AS $c), " +
                s"CAST(raise_error(CONCAT('Value is out of range : ', CAST(($e) AS STRING))) AS $c))"
            cur = cur.substring(0, i) + rep + cur.substring(close + 1)
            changed = true
          }
        }
        if (!changed) i = masked.toUpperCase.indexOf("CAST", i + 4)
      }
    }
    cur
  }

  /** Last top-level occurrence of a keyword (word-bounded, depth 0). */
  private def topLevelIndexLast(s: String, kw: String): Int = {
    var last = -1
    var at = topLevelIndex(s, kw)
    while (at >= 0) { last = at; at = topLevelIndex(s, kw, at + kw.length) }
    last
  }

  /** VARIANT operations Spark's analyzer rejects (variant.iq):
    *  - equality: the reference delegates to the contained values,
    *    requiring the same runtime type (variant.iq:108-117) — lowered
    *    to `schema_of_variant(a)=schema_of_variant(b) AND
    *    to_json(a)=to_json(b)` (3VL preserved: a SQL-NULL operand nulls
    *    both conjuncts). Applied only when an operand is syntactically
    *    variant-typed (CAST(.. AS VARIANT) / VARIANTNULL()).
    *  - subscript: `CAST(x AS VARIANT)[n]` is the reference's 1-based
    *    ITEM over a variant array, null for non-arrays (variant.iq:131)
    *    → `try_variant_get(.., '$[n-1]')`. */
  private def rewriteVariantOps(sql: String): String = {
    val masked = maskLiterals(sql)
    if (!masked.toUpperCase.contains("VARIANT")) return sql
    val vshape = "(?is)(CAST\\s*\\((?:[^()]|\\([^()]*\\))*AS\\s+VARIANT\\s*\\)|VARIANTNULL\\s*\\(\\s*\\))"
    val eqRe = (vshape + "\\s*=\\s*" + vshape).r
    val s1 = replaceMasked(sql, eqRe)((m, o) => {
      val (a, b) = (origGroup(m, o, 1), origGroup(m, o, 2))
      s"(schema_of_variant($a) = schema_of_variant($b) AND to_json($a) = to_json($b))"
    })
    val s2 = replaceMasked(s1,
      ("(?is)\\(\\s*" + vshape + "\\s*\\)\\s*\\[(\\d+)\\]").r)((m, o) => {
      val idx = m.group(2).toInt - 1
      s"try_variant_get(${origGroup(m, o, 1)}, '$$[$idx]')"
    })
    // Field access on a variant-shaped expression: `CAST(.. AS VARIANT)
    // .`name`` reads the object field (variant.iq:168-189). A bare
    // identifier uppercases, as the reference's lexer does — that is
    // WHY variant.iq:189's unquoted `.a` finds nothing. Runs BEFORE the
    // map-cast lowering below so the CAST shape is still visible.
    val s2b = replaceMasked(s2,
      ("(?is)" + vshape + "\\s*\\.\\s*(`[^`]*`|[A-Za-z_]\\w*)").r)((m, o) => {
      val v = origGroup(m, o, 1)
      val f0 = origGroup(m, o, 2)
      val f = if (f0.startsWith("`")) f0.stripPrefix("`").stripSuffix("`")
              else f0.toUpperCase(java.util.Locale.ROOT)
      s"item($v, '${f.replace("'", "''")}')"
    })
    // CAST(map AS VARIANT): Spark's Cast has no MAP→VARIANT path —
    // lower through JSON (variant.iq:164-194; the reference's
    // VariantSqlValue accepts any map). Keys become the rendered JSON
    // field names, which is exactly how the reference's variant ITEM
    // then finds them.
    variantMapCast(s2b)
  }

  private def variantMapCast(s2b: String): String = {
    {
      var cur = s2b
      var changed = true
      while (changed) {
        changed = false
        val masked = maskLiterals(cur)
        val re = "(?is)\\bCAST\\s*\\(".r
        for (m <- re.findAllMatchIn(masked) if !changed) {
          val open = masked.indexOf('(', m.start)
          val close = closeParen(masked, open)
          if (close > 0) {
            val innerM = masked.substring(open + 1, close)
            if ("(?is)^\\s*MAP\\s*[\\[(].*\\bAS\\s+VARIANT\\s*$".r.matches(innerM)) {
              val asAt = "(?is)\\bAS\\s+VARIANT\\s*$".r.findFirstMatchIn(innerM).get.start
              val operand = cur.substring(open + 1, open + 1 + asAt).trim
              cur = cur.substring(0, m.start) + s"parse_json(to_json($operand))" +
                cur.substring(close + 1)
              changed = true
            }
          }
        }
      }
      cur
    }
  }

  /** UUID literals and casts (SqlLibraryOperators UUID; misc.iq:70-140).
    * The engine's UUID is a 36-char canonical-form value: lower it onto
    * strings — `UUID 'x'` → lowercased string literal, `CAST(e AS UUID)`
    * → `CAST(e AS STRING)` — with the two binary conversions handled
    * first: UUID→VARBINARY emits `unhex` of the undashed hex, and
    * x'…'→UUID formats the 16 bytes at rewrite time. */
  private def rewriteUuid(sql: String): String = {
    def fmt(hex: String): String = {
      val h = hex.toLowerCase
      s"${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-${h.substring(16, 20)}-${h.substring(20)}"
    }
    val s1 = replaceMasked(sql,
      "(?is)\\bCAST\\s*\\(\\s*UUID\\s*('[^']*')\\s+AS\\s+VARBINARY\\s*\\)".r)((m, o) =>
      s"unhex('${origGroup(m, o, 1).stripPrefix("'").stripSuffix("'").replace("-", "")}')")
    val s2 = replaceMasked(s1,
      "(?is)\\bCAST\\s*\\(\\s*[xX]('[^']*')\\s+AS\\s+UUID\\s*\\)".r)((m, o) =>
      s"'${fmt(origGroup(m, o, 1).stripPrefix("'").stripSuffix("'"))}'")
    val s3 = replaceMasked(s2, "(?is)\\bUUID\\s*('[^']*')".r)((m, o) =>
      origGroup(m, o, 1).toLowerCase)
    // a string-literal cast VALIDATES the canonical 8-4-4-4-12 form —
    // the reference rejects bare 32-hex text (misc.iq:90)
    val s4 = replaceMasked(s3, "(?is)\\bCAST\\s*\\(\\s*('[^']*')\\s+AS\\s+UUID\\s*\\)".r)((m, o) => {
      val lit = origGroup(m, o, 1).stripPrefix("'").stripSuffix("'")
      if (!lit.matches("(?i)[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
        throw new IllegalArgumentException(s"Invalid UUID string: $lit")
      s"'${lit.toLowerCase(java.util.Locale.ROOT)}'"
    })
    replaceMasked(s4, "(?is)\\bAS\\s+UUID\\b".r)((_, _) => "AS STRING")
  }

  /** Length-free character/binary types in expressions (the reference's
    * default VARCHAR/VARBINARY have unbounded precision —
    * SqlTypeName.VARCHAR; recursive_queries.iq:223 `CAST(x AS VARCHAR)`):
    * Spark requires a length, so widen to the unbounded STRING/BINARY. */
  private def rewriteBareTypes(sql: String): String = {
    // CAST(e AS TIMESTAMP(p)): the reference TRUNCATES to the declared
    // precision (TIMESTAMP(0) drops fractions — big-query.iq:2927,
    // cast-with-format.iq:29); Spark timestamps are fixed micros, so the
    // precision lowers onto date_trunc around a plain cast
    val sPrec = {
      var cur = sql
      var go = true
      while (go) {
        go = false
        val masked = maskLiterals(cur)
        val re = "(?is)\\bCAST\\s*\\(".r
        for (m <- re.findAllMatchIn(masked) if !go) {
          val open = masked.indexOf('(', m.start)
          val close = closeParen(masked, open)
          if (close > 0) {
            val innerM = masked.substring(open + 1, close)
            val pm = "(?is)\\bAS\\s+TIMESTAMP\\s*\\(\\s*(\\d)\\s*\\)\\s*$".r.findFirstMatchIn(innerM)
            pm.foreach { p =>
              val unit = p.group(1).toInt match {
                case 0 => Some("SECOND")
                case 1 | 2 | 3 => Some("MILLISECOND")
                case 4 | 5 => Some("MICROSECOND")
                case _ => None
              }
              val e = cur.substring(open + 1, open + 1 + p.start)
              val castStr = s"CAST($e AS TIMESTAMP)"
              cur = cur.substring(0, m.start) +
                unit.map(u => s"date_trunc('$u', $castStr)").getOrElse(castStr) +
                cur.substring(close + 1)
              go = true
            }
          }
        }
      }
      cur
    }
    val s0 = replaceMasked(sPrec, "(?i)\\bTIMESTAMP\\s*\\(\\s*\\d+\\s*\\)".r)((_, _) => "TIMESTAMP")
    val s1 = replaceMasked(s0, "(?i)\\bVARCHAR\\b(?!\\s*\\()".r)((_, _) => "STRING")
    val s2 = replaceMasked(s1, "(?i)\\bVARBINARY\\b(?!\\s*\\()".r)((_, _) => "BINARY")
    // SQL-standard postfix collection types in CASTs (`x AS INTEGER
    // ARRAY`, lambda.iq:82) → Spark's generic spelling. Scoped to the
    // AS-type position so `ARRAY` constructors/literals stay untouched.
    val s3 = replaceMasked(s2, "(?i)\\bAS\\s+(\\w+)\\s+(ARRAY|MULTISET)\\s*\\)".r)((m, o) =>
      s"AS ARRAY<${origGroup(m, o, 1)}>)")
    // the same postfix form NESTED inside a MAP/ARRAY type argument
    // (`map<varchar multiset, ...>`, misc.iq:2554 CALCITE-5570) — scoped
    // to a `,`/`>` follower so only type positions rewrite
    replaceMasked(s3, "(?i)\\b(\\w+)\\s+(ARRAY|MULTISET)\\b(?=\\s*[,>])".r)((m, o) =>
      s"ARRAY<${origGroup(m, o, 1)}>")
  }

  /** `DECIMAL 'n.n'` typed literals (misc.iq:2532) → an explicit CAST
    * (Spark has no DECIMAL literal prefix). */
  private def rewriteDecimalLit(sql: String): String =
    replaceMasked(sql, "(?is)\\bDECIMAL\\s*('[^']*')".r)((m, o) =>
      s"CAST(${origGroup(m, o, 1)} AS DECIMAL(38, 9))")

  /** Fold `NULLIF(x, x)` with identical literal arguments to NULL
    * (misc.iq:2435 uses it inside VALUES, where Spark's inline-table
    * evaluator only accepts foldable expressions it understands). */
  private def rewriteNullifFold(sql: String): String =
    replaceMasked(sql, "(?is)\\bNULLIF\\s*\\(\\s*('[^']*'|-?[\\d.]+)\\s*,\\s*('[^']*'|-?[\\d.]+)\\s*\\)".r)((m, o) => {
      val (a, b) = (origGroup(m, o, 1), origGroup(m, o, 2))
      if (a == b) "NULL" else o.substring(m.start, m.end)
    })

  /** `TABLESAMPLE SYSTEM(p) [REPEATABLE(s)]` / BERNOULLI (tablesample.iq;
    * SqlSampleSpec) → Spark's `TABLESAMPLE (p PERCENT) [REPEATABLE (s)]`.
    * Both of the reference's methods are row-level Bernoulli at Spark's
    * scan granularity; p is a literal percentage. */
  private def rewriteTablesample(sql: String): String =
    replaceMasked(sql,
      "(?is)\\bTABLESAMPLE\\s+(?:SYSTEM|BERNOULLI)\\s*\\(\\s*([\\d.]+)\\s*\\)(\\s*REPEATABLE\\s*\\(\\s*(\\d+)\\s*\\))?".r)((m, o) => {
      val rep = if (m.group(2) != null) s" REPEATABLE (${m.group(3)})" else ""
      s"TABLESAMPLE (${m.group(1)} PERCENT)$rep"
    })

  /** Interval quantities Spark's INTERVAL literal can't express
    * (misc.iq:1750-1790): WEEK/QUARTER literals scale to DAY/MONTH, and
    * a non-literal count (`INTERVAL empno DAY`, `INTERVAL (mgr/100)
    * MINUTE` — SqlIntervalQualifier over a dynamic operand) becomes
    * `make_interval`, which takes expressions. */
  private def rewriteIntervalExpr(sql: String): String = {
    val s1 = replaceMasked(sql,
      "(?is)\\bINTERVAL\\s+('[^']*')\\s+(WEEK|QUARTER)S?\\b".r)((m, o) => {
      val n = origGroup(m, o, 1).stripPrefix("'").stripSuffix("'").trim.toLong
      if (m.group(2).equalsIgnoreCase("WEEK")) s"INTERVAL '${n * 7}' DAY"
      else s"INTERVAL '${n * 3}' MONTH"
    })
    replaceMasked(s1,
      "(?is)\\bINTERVAL\\s+(\\w+|\\((?:[^()]|\\([^()]*\\))*\\))\\s+(YEAR|MONTH|WEEK|DAY|HOUR|MINUTE|SECOND)S?\\b".r)((m, o) => {
      val e = origGroup(m, o, 1)
      if (e.matches("(?i)\\d+|'[^']*'")) o.substring(m.start, m.end) // literal: Spark-native
      else m.group(2).toUpperCase match {
        case "YEAR" => s"make_interval($e)"
        case "MONTH" => s"make_interval(0, $e)"
        case "WEEK" => s"make_interval(0, 0, $e)"
        case "DAY" => s"make_interval(0, 0, 0, $e)"
        case "HOUR" => s"make_interval(0, 0, 0, 0, $e)"
        case "MINUTE" => s"make_interval(0, 0, 0, 0, 0, $e)"
        case _ => s"make_interval(0, 0, 0, 0, 0, 0, $e)"
      }
    })
  }

  /** `[CROSS JOIN] LATERAL (VALUES rows...) AS t (cols)` — a lateral
    * inline table whose rows reference the OUTER query (the reference's
    * CROSS APPLY VALUES unpivot idiom, pivot.iq:454). Spark's inline
    * tables only accept foldable expressions, so the construct lowers
    * to `LATERAL VIEW inline(array(struct(row1), struct(row2), ...))`
    * — a pure generator expression over the outer row, no correlated
    * subquery machinery, one pass, scale-free. */
  private def rewriteLateralValues(sql: String): String = {
    val re = "(?is)(\\bCROSS\\s+JOIN\\s+|,\\s*)?\\bLATERAL\\s*\\(\\s*VALUES\\b".r
    val masked = maskLiterals(sql)
    val m = re.findAllMatchIn(masked).toSeq.headOption.getOrElse(return sql)
    // only FROM-item positions lower to LATERAL VIEW: `LEFT/INNER JOIN
    // LATERAL (VALUES ...) ON ...` would leave its ON clause dangling,
    // so anything not preceded by FROM, a comma, or CROSS JOIN passes
    // through untouched (and fails loudly downstream if unsupported)
    if (m.group(1) == null) {
      val pre = masked.substring(0, m.start).trim.toUpperCase(java.util.Locale.ROOT)
      val fromAt = pre.endsWith("FROM") &&
        (pre.length == 4 || !pre(pre.length - 5).isLetterOrDigit && pre(pre.length - 5) != '_')
      if (!fromAt) return sql
    }
    val open = masked.indexOf('(', m.start)
    val close = closeParen(masked, open)
    if (close < 0) return sql
    val valuesAt = masked.toUpperCase(java.util.Locale.ROOT).indexOf("VALUES", open)
    val rowsTxt = sql.substring(valuesAt + 6, close)
    val rows = splitTopLevel(rowsTxt).map(_.trim)
    // every row must be a parenthesized tuple
    if (rows.isEmpty || !rows.forall(r => r.startsWith("(") && r.endsWith(")")))
      return sql
    // AS t (c1, ..., cn)
    val tail = "(?is)^\\s*(?:AS\\s+)?([A-Za-z_]\\w*)\\s*\\(([^)]*)\\)".r
      .findFirstMatchIn(masked.substring(close + 1)).getOrElse(return sql)
    val alias = tail.group(1)
    val cols = sql.substring(close + 1 + tail.start(2), close + 1 + tail.end(2))
    // field names must agree across the array's structs — alias every
    // field to its output column name
    val colNames = cols.split(",").map(_.trim)
    val structs = rows.map { r =>
      val items = splitTopLevel(r.substring(1, r.length - 1))
      if (items.length != colNames.length) return sql
      items.zip(colNames).map { case (v, c) => s"($v) AS $c" }
        .mkString("struct(", ", ", ")")
    }.mkString(", ")
    val lowered = s" LATERAL VIEW inline(array($structs)) $alias AS $cols "
    rewriteLateralValues(sql.substring(0, m.start) + lowered +
      sql.substring(close + 1 + tail.end))
  }

  /** `(VALUES 'a', 'b') AS f` — single-column VALUES rows take the
    * table alias as the column name in the reference (SqlValidatorImpl
    * alias derivation; unnest.iq:222), where Spark names the column
    * col1. Append an explicit column list only when every row is a bare
    * scalar (no parenthesized row constructors). */
  private def rewriteValuesAlias(sql: String): String =
    replaceMasked(sql,
      "(?is)(\\(\\s*VALUES\\s+[^()]+?\\))\\s+AS\\s+(\\w+)(?!\\s*\\()".r)((m, o) =>
      s"${origGroup(m, o, 1)} AS ${m.group(2)}(${m.group(2)})")

  /** `ROW(f1, …) IS [NOT] NULL` — the reference follows the standard's
    * degenerate-row rule (SqlStdOperatorTable IS_NULL over row types;
    * struct.iq:131-145 CALCITE-3627): a row is NULL iff EVERY field is
    * null, with nested rows recursing, and IS NOT NULL is its plain
    * negation (not the all-fields-non-null form). Spark's struct IS NULL
    * only tests the struct reference, so lower to the field conjunction
    * before the constructor rewrite turns ROW into struct. */
  private def rewriteRowNullCheck(sql: String): String = {
    def fieldsNull(args: String): String =
      splitTopLevel(args).map(_.trim).map { f =>
        "(?is)^ROW\\s*\\((.*)\\)$".r.findFirstMatchIn(f) match {
          case Some(inner) => fieldsNull(inner.group(1))
          case None => s"$f IS NULL"
        }
      }.mkString("(", " AND ", ")")
    val re = "(?is)\\bROW\\s*\\(".r
    val masked = maskLiterals(sql)
    val hit = re.findAllMatchIn(masked).flatMap { m =>
      val close = closeParen(masked, masked.indexOf('(', m.start))
      if (close < 0) None
      else "(?is)^\\s*IS\\s+(NOT\\s+)?NULL".r.findFirstMatchIn(masked.substring(close + 1))
        .map(t => (m.start, close, t.group(1) != null, close + 1 + t.end))
    }.toSeq.headOption
    hit match {
      case None => sql
      case Some((start, close, isNot, end)) =>
        val conj = fieldsNull(sql.substring(masked.indexOf('(', start) + 1, close))
        val repl = if (isNot) s"(NOT $conj)" else conj
        rewriteRowNullCheck(sql.substring(0, start) + repl + sql.substring(end))
    }
  }

  /** `ROW(a, b, …)` value constructor (SqlStdOperatorTable.ROW;
    * struct.iq) → Spark's `struct(...)`; `ROW(*)` / `ROW(t.*)` expand
    * the same way (CALCITE-7311). The harness compares by position so
    * the col1/col2 field names Spark assigns don't matter. */
  private def rewriteRowCtor(sql: String): String =
    replaceMasked(sql, "(?is)\\bROW\\s*\\(".r)((_, _) => "struct(")

  /** `SELECT items BY byItems FROM ...` (Parser.jj:3192 SqlSelectBy —
    * syntactic sugar, SqlByRewriter.java): the BY items are prepended to
    * the select list, become the GROUP BY, and (with their ASC/DESC
    * modifiers) the ORDER BY; remaining non-aggregated bare columns wrap
    * in an implicit per-group aggregate (SqlValidatorImpl.java:517-523
    * wraps in ANY_VALUE; the reference's enumerable engine computes
    * ANY_VALUE as MAX, so MAX is used here for value parity). */
  private def rewriteSelectBy(sql: String): String = {
    val masked = maskLiterals(sql)
    val selRe = "(?is)^\\s*SELECT\\s".r
    if (selRe.findFirstIn(masked).isEmpty) return sql
    val fromAt = topLevelIndex(masked, "FROM")
    if (fromAt < 0) return sql
    val byAt = topLevelIndex(masked, "BY")
    if (byAt < 0 || byAt >= fromAt) return sql
    val selStart = masked.toUpperCase.indexOf("SELECT") + "SELECT".length
    val selItems = splitTopLevel(sql.substring(selStart, byAt))
    val byItems = splitTopLevel(sql.substring(byAt + 2, fromAt))
    if (byItems.isEmpty || selItems.isEmpty) return sql
    val byRe = "(?is)^(.*?)(?:\\s+AS\\s+(\\w+))?(\\s+(?:ASC|DESC))?(\\s+NULLS\\s+(?:FIRST|LAST))?\\s*$".r
    case class By(expr: String, alias: Option[String], mods: String)
    val parsed = byItems.map(_.trim).map {
      case byRe(e, a, d, n) => By(e.trim, Option(a),
        Option(d).getOrElse("") + Option(n).getOrElse(""))
      case other => By(other, None, "")
    }
    val bySelect = parsed.map(b => b.alias.fold(b.expr)(a => s"${b.expr} AS $a")).mkString(", ")
    val byGroup = parsed.map(_.expr).mkString(", ")
    val byOrder = parsed.map(b => b.expr + b.mods).mkString(", ")
    // bare column select items get the implicit aggregate
    val colRe = "(?is)^([\\w.`]+)(?:\\s+AS\\s+(\\w+))?$".r
    val wrapped = selItems.map(_.trim).map {
      case colRe(c, a) =>
        val alias = Option(a).getOrElse(c.split('.').last)
        s"max($c) AS $alias"
      case other => other
    }.mkString(", ")
    s"SELECT $bySelect, $wrapped FROM ${sql.substring(fromAt + 4)} GROUP BY $byGroup ORDER BY $byOrder"
  }

  /** Postgres `SELECT DISTINCT ON (keys) items FROM ... ORDER BY o1, ...`
    * (babel select.iq; SqlSelectKeyword.DISTINCT_ON): keep the FIRST row
    * of each key group under the statement's ORDER BY. Lowered to
    * row_number() OVER (PARTITION BY keys ORDER BY orderList) = 1, with
    * the select items computed in the INNER select — a window function
    * among the items (select.iq:390) ranks the full input, not the
    * one-per-group survivors, matching the reference. */
  private[graft] def rewriteDistinctOn(sql: String): String = {
    val masked = maskLiterals(sql)
    val re = "(?is)^(\\s*SELECT\\s+)DISTINCT\\s+ON\\s*\\(".r
    val m = re.findFirstMatchIn(masked).getOrElse(return sql)
    val open = m.end - 1
    val close = closeParen(masked, open)
    if (close < 0) return sql
    val keys = splitTopLevel(sql.substring(open + 1, close)).map(_.trim)
    val fromAt = topLevelIndex(masked, "FROM", close + 1)
    if (fromAt < 0) return sql
    val orderAt = topLevelIndex(masked, "ORDER", fromAt)
    if (orderAt < 0) return sql // Postgres requires the ORDER BY; let Spark report
    val byAt = topLevelIndex(masked, "BY", orderAt)
    val orderList = sql.substring(byAt + 2).trim.stripSuffix(";")
    val items = splitTopLevel(sql.substring(close + 1, fromAt)).map(_.trim)
    val rest = sql.substring(fromAt + 4, orderAt).trim
    // bare columns pass through *; computed items materialize inner-side
    val colRe = "(?is)^[\\w.`]+$".r
    val aliasRe = "(?is)^(.*?)\\s+AS\\s+(\\w+)\\s*$".r
    var n = 0
    val (innerExtra, outer) = items.map {
      case c if colRe.matches(c) => (None, c.split('.').last)
      case aliasRe(e, a) => (Some(s"$e AS $a"), a)
      case e => { n += 1; (Some(s"$e AS __don_$n"), s"__don_$n") }
    }.unzip
    val inner = (Seq("*") ++ innerExtra.flatten :+
      s"row_number() OVER (PARTITION BY ${keys.mkString(", ")} ORDER BY $orderList) AS __don_rn")
      .mkString(", ")
    s"SELECT ${outer.mkString(", ")} FROM (SELECT $inner FROM $rest) __don " +
      s"WHERE __don_rn = 1 ORDER BY $orderList"
  }

  /** `* EXCLUDE(cols)` (SqlSelect EXCLUDE, struct.iq:190-230) → Spark's
    * `* EXCEPT (cols)`, with column qualifiers inside the list dropped
    * (Spark's EXCEPT list takes bare names). */
  private def rewriteExclude(sql: String): String =
    replaceMasked(sql, "(?is)\\*\\s+EXCLUDE\\s*\\(([^)]*)\\)".r)((m, o) => {
      // the reference tolerates duplicates in the list (CALCITE-7310);
      // Spark's EXCEPT demands distinct names — dedup here
      val cols = origGroup(m, o, 1).split(",")
        .map(c => c.trim.replaceAll("^\\w+\\s*\\.\\s*", "")).distinct.mkString(", ")
      s"* EXCEPT ($cols)"
    })

  /** T-SQL `SELECT TOP n ...` (babel's mssql surface) → trailing
    * `LIMIT n`. Outermost select only — anchored at the statement head,
    * so a TOP inside a subquery (valid T-SQL, rare) deliberately passes
    * through to Spark's parser for a clear error rather than a silent
    * mis-scope. Likewise a statement with a TOP-LEVEL set operator
    * passes through: T-SQL binds TOP to its own SELECT branch, and a
    * trailing LIMIT would silently limit the whole union. A trailing
    * semicolon is stripped before the LIMIT is appended. */
  private def rewriteTop(sql: String): String = {
    val re = "(?is)^(\\s*SELECT)\\s+TOP\\s+(\\d+)\\s".r
    val masked = maskLiterals(sql)
    re.findFirstMatchIn(masked) match {
      case Some(m) if !hasTopLevelSetOp(masked, m.end) =>
        val body = sql.substring(m.end).replaceFirst("(?s)\\s*;\\s*$", "")
        sql.substring(0, m.end(1)) + " " + body + s" LIMIT ${m.group(2)}"
      case _ => sql
    }
  }

  /** True if a paren-depth-0 UNION / INTERSECT / EXCEPT keyword occurs at
    * or after `from` in the masked text (literals already neutralized). */
  private def hasTopLevelSetOp(masked: String, from: Int): Boolean = {
    val up = masked.toUpperCase
    var depth = 0
    var i = from
    while (i < up.length) {
      up.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0)
            for (kw <- Seq("UNION", "INTERSECT", "EXCEPT"))
              if (up.startsWith(kw, i) &&
                  (i == 0 || !up.charAt(i - 1).isLetterOrDigit) &&
                  (i + kw.length >= up.length || !up.charAt(i + kw.length).isLetterOrDigit))
                return true
      }
      i += 1
    }
    false
  }

  /** Windowing table-valued functions TUMBLE/HOP/SESSION: full grammar
    * (named args, subquery DATA, alignment offsets, SESSION gap windows)
    * lives in [[WindowTvfSql]]. */
  private[graft] def rewriteWindowTvf(sql: String): String = WindowTvfSql.rewrite(sql)

  /** ANSI `OFFSET n ROWS FETCH FIRST|NEXT m ROWS ONLY` (fetch.iq,
    * offset.iq; Sort.fetch/offset in the algebra) → Spark's
    * LIMIT/OFFSET clauses. */
  private def rewriteFetch(sql: String): String = {
    val both = "(?is)\\bOFFSET\\s+(.+?)\\s+(?:ROWS?\\s+)?FETCH\\s+(?:FIRST|NEXT)\\s+(.+?)\\s+ROWS?\\s+ONLY".r
    val fetchOnly = "(?is)\\bFETCH\\s+(?:FIRST|NEXT)\\s+(.+?)\\s+ROWS?\\s+ONLY".r
    val offsetRows = "(?is)\\bOFFSET\\s+(.+?)\\s+ROWS\\b".r
    // the count may be any expression (fetch.iq:23-173 — `(1 + abs(-2))`,
    // fractional `(1.5)` rounds half-up, beyond-BIGINT values mean "all
    // rows"); a plain integer passes through untouched, an expression is
    // clamped into Spark's INT limit domain and left to constant folding
    def num(e0: String, isFetch: Boolean = false): Option[String] = {
      val e = e0.trim
      if (e.matches("\\d+")) // beyond-INT literals clamp (sort.iq:421)
        Some(if (BigInt(e) > Int.MaxValue) Int.MaxValue.toString else e)
      else if (e.length > 200 ||
        "(?is)\\b(SELECT|FROM|WHERE|ORDER|GROUP)\\b".r.findFirstIn(e).isDefined) None
      else {
        // the reference's grammar: a non-literal FETCH count must be
        // PARENTHESIZED (`fetch next 1 + 2` is a parse error,
        // fetch.iq:103 — OFFSET takes bare expressions, offset.iq:23),
        // and a count that IS null rejects ("FETCH expression
        // evaluated to NULL", fetch.iq:75 / offset.iq:70)
        if (isFetch && !e.startsWith("("))
          throw new IllegalArgumentException(
            s"FETCH count must be an integer literal or a parenthesized expression: $e")
        if ("(?is)^\\(?\\s*CAST\\s*\\(\\s*NULL\\b.*".r.matches(e))
          throw new IllegalArgumentException(
            "FETCH/OFFSET expression evaluated to NULL")
        Some(s"(CAST(LEAST(ROUND($e), 2147483647) AS INT))")
      }
    }
    val s1 = replaceMasked(sql, both)((m, o) =>
      (num(origGroup(m, o, 1)), num(origGroup(m, o, 2), isFetch = true)) match {
        case (Some(off), Some(lim)) => s"LIMIT $lim OFFSET $off"
        case _ => o.substring(m.start, m.end)
      })
    val s2 = replaceMasked(s1, fetchOnly)((m, o) =>
      num(origGroup(m, o, 1), isFetch = true).map(l => s"LIMIT $l").getOrElse(o.substring(m.start, m.end)))
    val s3 = replaceMasked(s2, offsetRows)((m, o) =>
      num(origGroup(m, o, 1)).map(x => s"OFFSET $x").getOrElse(o.substring(m.start, m.end)))
    // plain LIMIT/OFFSET beyond Spark's INT domain (sort.iq:421
    // `limit 3000000000`) clamp to MaxInt/2 each — Spark additionally
    // requires limit + offset <= MaxInt, and a 2^30-row offset already
    // means "skip everything" at any realistic cardinality
    replaceMasked(s3, "(?is)\\b(LIMIT|OFFSET)\\s+(\\d{10,})\\b".r)((m, o) =>
      s"${m.group(1)} ${if (BigInt(m.group(2)) > 1073741823) "1073741823" else m.group(2)}")
  }

  /** MySQL `LIMIT offset, count` / `LIMIT offset, ALL` (sort.iq's
    * scott-mysql cases) — Spark spells these LIMIT/OFFSET. Standard SQL
    * never puts a comma after LIMIT n, so the pattern can't misfire. */
  private def rewriteMysqlLimit(sql: String): String =
    replaceMasked(sql, "(?is)\\bLIMIT\\s+(\\d+)\\s*,\\s*(\\d+|ALL)\\b".r) { (m, _) =>
      if (m.group(2).equalsIgnoreCase("ALL")) s"OFFSET ${m.group(1)}"
      else s"LIMIT ${m.group(2)} OFFSET ${m.group(1)}"
    }

  /** Oracle `FROM DUAL` (babel; dual-table-query.iq) — a FROM-less
    * scalar select in Spark. `SELECT * FROM DUAL` surfaces DUAL's one
    * 'X' row under the reference's generated column name. */
  private def rewriteDual(sql: String): String =
    if ("(?is)^\\s*SELECT\\s+\\*\\s+FROM\\s+DUAL\\s*$".r.findFirstIn(sql.trim).isDefined)
      "SELECT 'X' AS `EXPR$0`"
    else replaceMasked(sql, "(?is)\\bFROM\\s+DUAL\\b".r)((_, _) => "")

  /** Calcite `FROM t EXTEND (c TYPE, ...)` (SqlStdOperatorTable.java
    * :265 EXTEND — declare columns a schemaless/dynamic table doesn't
    * list; they read as typed NULLs when absent): lower to a subselect
    * appending `CAST(NULL AS TYPE) AS c` for each declared column.
    * Static parquet always "lacks" the declared column, matching the
    * dynamic-table case the clause exists for. */
  private[sql] def rewriteExtend(sql: String): String = {
    val re = "(?is)\\bFROM\\s+([A-Za-z_][A-Za-z0-9_]*)\\s+EXTEND\\s*\\(".r
    re.findFirstMatchIn(maskLiterals(sql)) match {
      case None => sql
      case Some(m) =>
        val open = m.end - 1
        val close = closeParen(sql, open)
        if (close < 0) return sql
        val decls = splitTopLevel(sql.substring(open + 1, close)).map(_.trim).map { d =>
          val parts = d.split("\\s+", 2)
          require(parts.length == 2, s"EXTEND: malformed column declaration '$d'")
          s"CAST(NULL AS ${parts(1)}) AS ${parts(0)}"
        }
        val table = m.group(1)
        val replaced = sql.substring(0, m.start) +
          s"FROM (SELECT *, ${decls.mkString(", ")} FROM $table) $table" +
          sql.substring(close + 1)
        rewriteExtend(replaced)
    }
  }

  /** SQL:2016 `CAST(expr AS type FORMAT 'model')` (cast-with-format.iq;
    * parsed by SqlCastFunction, evaluated via util/format/FormatModels
    * .java): lower to to_timestamp/to_date with the Oracle format model
    * translated to a Java pattern at rewrite time (string → temporal),
    * or date_format (temporal → character). The .iq's TZH/TZM/FF9
    * cases are feature-gated off in the reference itself
    * (fixed.calcite6375) and stay unsupported here. */
  private def rewriteCastFormat(sql: String): String = {
    val kw = "CAST"
    var at = topLevelIndexAnyDepth(sql, kw)
    while (at >= 0) {
      val open = sql.indexOf('(', at + kw.length)
      if (open < 0 || sql.substring(at + kw.length, open).trim.nonEmpty)
        return sql
      val close = closeParen(sql, open)
      if (close < 0) return sql
      val inner = sql.substring(open + 1, close)
      val re = "(?is)^(.*\\S)\\s+AS\\s+(\\w+)\\s+FORMAT\\s*'((?:[^']|'')*)'\\s*$".r
      inner match {
        case re(expr, ty, fmt) =>
          // SQL:2016 FORMAT-clause models (IsoFormat): case-variant word
          // tokens, literal partial years, RR round-year, Calendar-rule
          // W/WW — semantics Java patterns can't express
          val f = s"'${fmt.replace("''", "\\'")}'"
          val lowered = ty.toUpperCase match {
            case "TIMESTAMP" => s"fmt_to_timestamp(($expr), $f)"
            case "DATE" => s"fmt_to_date(($expr), $f)"
            case "VARCHAR" | "CHAR" | "STRING" => s"fmt_to_char(($expr), $f)"
            case _ => return sql // unsupported target: leave for the parser
          }
          return rewriteCastFormat(
            sql.substring(0, at) + lowered + sql.substring(close + 1))
        case _ =>
          // plain CAST — look for the next one
          val next = topLevelIndexAnyDepth(sql.substring(at + kw.length), kw)
          at = if (next < 0) -1 else at + kw.length + next
      }
    }
    sql
  }

  /** BigQuery `SELECT [t.]* REPLACE (expr AS col, ...)` (babel corpus
    * big-query.iq; Spark parses `* EXCEPT` natively but not REPLACE) →
    * `[t.]* EXCEPT (cols...), expr AS col, ...`. Column ORDER differs
    * from BigQuery (replaced columns move to the end) — positional
    * parity would need the resolved schema at rewrite time; name-based
    * consumers (including the driver compare, which sorts columns) see
    * identical results. */
  private def rewriteStarReplace(sql: String): String = {
    val re = "(?is)\\*\\s+REPLACE\\s*\\(".r
    re.findFirstMatchIn(maskLiterals(sql)) match {
      case None => sql
      case Some(m) =>
        val open = m.end - 1
        val close = closeParen(sql, open)
        if (close < 0) return sql
        val items0 = splitTopLevel(sql.substring(open + 1, close))
        // a QUALIFIED star's REPLACE targets must carry the same
        // qualifier (e.* REPLACE(x AS d.deptno) is "unknown column" —
        // select.iq:330); matching qualifiers strip to the simple name
        val starQual = "(?is)([A-Za-z_]\\w*)\\s*\\.\\s*$".r
          .findFirstMatchIn(sql.substring(0, m.start)).map(_.group(1))
        val qualAs = "(?is)\\s+AS\\s+([A-Za-z_]\\w*)\\s*\\.\\s*([A-Za-z_]\\w*)\\s*$".r
        for (it <- items0; qm <- qualAs.findFirstMatchIn(it))
          if (!starQual.exists(_.equalsIgnoreCase(qm.group(1))))
            throw new IllegalArgumentException(
              s"SELECT * REPLACE list contains unknown column(s): ${qm.group(2).toUpperCase(java.util.Locale.ROOT)}")
        val asAt = "(?is)\\s+AS\\s+(?:[A-Za-z_]\\w*\\s*\\.\\s*)?([A-Za-z_][A-Za-z0-9_]*)\\s*$".r
        val names = items0.map { it =>
          asAt.findFirstMatchIn(it).map(_.group(1)).getOrElse(
            return sql) // malformed — leave for Spark's parser to report
        }
        val items = items0.map(it =>
          asAt.replaceFirstIn(it, " AS " + asAt.findFirstMatchIn(it).get.group(1)))
        val star = sql.substring(m.start, m.start + 1) // the '*'
        val head = sql.substring(0, m.start)
        val rewritten = head + star +
          s" EXCEPT (${names.mkString(", ")}), ${items.map(_.trim).mkString(", ")}" +
          sql.substring(close + 1)
        rewriteStarReplace(rewritten)
    }
  }

  /** Split on top-level commas (paren- and string-aware). */
  private[sql] def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var inStr = false
    var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (c == '\'') inStr = true
      else if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (c == ',' && depth == 0) { out += s.substring(start, i); start = i + 1 }
      i += 1
    }
    out += s.substring(start)
    out.toSeq
  }

  /** Lower SQL/JSON `JSON_VALUE(doc, 'path' [behavior ON EMPTY]
    * [behavior ON ERROR])` (behavior = NULL | ERROR | DEFAULT <expr>;
    * ref: SqlStdOperatorTable.java:1655, runtime/JsonFunctions.java) to
    * a CASE over get_json_object that distinguishes a malformed
    * document (ON ERROR) from a valid document whose path selects
    * nothing (ON EMPTY) — same lowering as functions/JsonValue.scala. */
  private def rewriteJsonValue(sql: String): String = {
    val kw = "JSON_VALUE"
    val at = topLevelIndexAnyDepth(sql, kw)
    if (at < 0) return sql
    val open = sql.indexOf('(', at + kw.length)
    if (open < 0) return sql
    val close = closeParen(sql, open)
    if (close < 0) return sql
    val inner = sql.substring(open + 1, close)
    // first top-level comma separates doc from path+behaviors
    val comma = topLevelIndex(inner, ",", wordy = false)
    if (comma < 0) return sql
    val doc = inner.substring(0, comma).trim
    val rest = inner.substring(comma + 1).trim
    // path is a leading quoted string
    if (!rest.startsWith("'")) return sql
    var pe = 1
    while (pe < rest.length && rest.charAt(pe) != '\'') pe += 1
    val path = rest.substring(0, pe + 1)
    val behaviors = rest.substring(pe + 1).trim

    def parse(b: String): (String, String) = {
      // returns (onEmpty, onError) SQL fragments
      var onEmpty = "CAST(NULL AS STRING)"
      var onError = "CAST(NULL AS STRING)"
      val re = ("(?i)\\b(NULL|ERROR|DEFAULT\\s+.+?)\\s+ON\\s+(EMPTY|ERROR)\\b").r
      re.findAllMatchIn(b).foreach { m =>
        val beh = m.group(1).trim
        val frag =
          if (beh.equalsIgnoreCase("NULL")) "CAST(NULL AS STRING)"
          else if (beh.equalsIgnoreCase("ERROR"))
            s"raise_error('JSON_VALUE strict: ON ${m.group(2).toUpperCase} for path ${path.replace("'", "")}')"
          else s"CAST((${beh.substring("DEFAULT".length).trim}) AS STRING)"
        if (m.group(2).equalsIgnoreCase("EMPTY")) onEmpty = frag else onError = frag
      }
      (onEmpty, onError)
    }
    val (onEmpty, onError) = parse(behaviors)
    val v = s"get_json_object(($doc), $path)"
    val lowered =
      s"""CASE WHEN ($doc) IS NULL THEN CAST(NULL AS STRING)
         WHEN get_json_object(($doc), '$$') IS NULL THEN $onError
         WHEN $v IS NULL THEN $onEmpty
         ELSE $v END"""
    rewriteJsonValue(sql.substring(0, at) + lowered + sql.substring(close + 1))
  }

  /** `ROW(t1.*, t2.*).<name><N>` — the reference uniquifies duplicate
    * row-field names with a numeric suffix (SqlValidatorUtil.uniquify:
    * the first occurrence keeps the name, the k-th duplicate becomes
    * name(k-2); struct.iq:330 — ROW(emp.*, dept.*).deptno0 is dept's
    * deptno). Spark keeps duplicate struct fields and resolves access
    * to the FIRST, so the renamed access is resolved here against the
    * session catalog and lowered to the direct qualified column — no
    * struct is built at all. */
  private def rowStarFieldAccess(spark: SparkSession, sql: String): String = {
    val re = ("(?is)\\bROW\\s*\\(([^()]*\\.\\s*\\*[^()]*)\\)" +
      "\\s*\\.\\s*([A-Za-z_]\\w*?)(\\d+)\\b").r
    replaceMasked(sql, re) { (m, o) =>
      val whole = o.substring(m.start, m.end)
      try {
        val args = splitTopLevel(o.substring(m.start(1), m.end(1))).map(_.trim)
        val fields = args.flatMap { a =>
          "(?is)^([A-Za-z_]\\w*)\\s*\\.\\s*\\*$".r.findFirstMatchIn(a) match {
            case Some(t) =>
              spark.table(t.group(1)).schema.fields.toSeq
                .map(f => (t.group(1), f.name))
            case None =>
              Seq(("", "(?is)([A-Za-z_]\\w*)\\s*$".r.findFirstMatchIn(a)
                .map(_.group(1)).getOrElse(a)))
          }
        }
        val seen = scala.collection.mutable.Map.empty[String, Int]
        val renamed = fields.map { case (t, n) =>
          val k = seen.getOrElse(n.toLowerCase(java.util.Locale.ROOT), 0)
          seen(n.toLowerCase(java.util.Locale.ROOT)) = k + 1
          val out = if (k == 0) n else s"$n${k - 1}"
          (t, n, out)
        }
        val want = (m.group(2) + m.group(3)).toLowerCase(java.util.Locale.ROOT)
        renamed.find(_._3.toLowerCase(java.util.Locale.ROOT) == want) match {
          case Some((t, n, _)) if t.nonEmpty => s"$t.$n"
          case Some((_, n, _)) => n
          case None => whole
        }
      } catch { case scala.util.control.NonFatal(_) => whole }
    }
  }

  /** SQL/JSON `JSON_EXISTS(doc, 'path' [(TRUE|FALSE|UNKNOWN|ERROR) ON
    * ERROR])` (ref: SqlJsonExistsFunction, runtime JsonFunctions
    * jsonExists; misc.iq:2399) — a boolean CASE over get_json_object:
    * malformed document → the ON ERROR behavior (default FALSE per the
    * standard), else path-hit test. The strict/lax mode prefix is
    * dropped for Spark's path syntax (both modes agree on existence for
    * the simple member paths Spark's JSONPath accepts). */
  private def rewriteJsonExists(sql: String): String = {
    val kw = "JSON_EXISTS"
    val at = topLevelIndexAnyDepth(sql, kw)
    if (at < 0) return sql
    val open = sql.indexOf('(', at + kw.length)
    if (open < 0) return sql
    val close = closeParen(sql, open)
    if (close < 0) return sql
    val inner = sql.substring(open + 1, close)
    val comma = topLevelIndex(inner, ",", wordy = false)
    if (comma < 0) return sql
    val doc = inner.substring(0, comma).trim
    val rest = inner.substring(comma + 1).trim
    if (!rest.startsWith("'")) return sql
    var pe = 1
    while (pe < rest.length && rest.charAt(pe) != '\'') pe += 1
    val path = rest.substring(1, pe).trim
      .replaceAll("(?i)^(strict|lax)\\s+", "")
    val onError = "(?i)\\b(TRUE|FALSE|UNKNOWN|ERROR)\\s+ON\\s+ERROR\\b".r
      .findFirstMatchIn(rest.substring(pe + 1)) match {
      case Some(m) if m.group(1).equalsIgnoreCase("TRUE") => "true"
      case Some(m) if m.group(1).equalsIgnoreCase("UNKNOWN") => "CAST(NULL AS BOOLEAN)"
      case Some(m) if m.group(1).equalsIgnoreCase("ERROR") =>
        s"CAST(raise_error('JSON_EXISTS: malformed document') AS BOOLEAN)"
      case _ => "false"
    }
    val lowered =
      s"""CASE WHEN ($doc) IS NULL THEN CAST(NULL AS BOOLEAN)
         WHEN get_json_object(($doc), '$$') IS NULL THEN $onError
         ELSE get_json_object(($doc), '$path') IS NOT NULL END"""
    rewriteJsonExists(sql.substring(0, at) + lowered + sql.substring(close + 1))
  }

  /** topLevelIndex ignoring paren depth (JSON_VALUE sits inside select
    * lists, i.e. at arbitrary depth); still string-aware. When
    * wordy=false matches a bare character sequence at depth 0 only. */
  private[sql] def topLevelIndexAnyDepth(s: String, keyword: String): Int = {
    val words = keyword.toUpperCase.split("\\s+")
    var inStr = false
    var inTick = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (inTick) { if (c == '`') inTick = false }
      else if (c == '\'') inStr = true
      else if (c == '`') inTick = true
      else if (matchWords(s, i, words) >= 0) return i
      i += 1
    }
    -1
  }

  /** Depth-0, string-aware index of a single character token. */
  private def topLevelIndex(s: String, token: String, wordy: Boolean): Int = {
    var depth = 0
    var inStr = false
    var inTick = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (inTick) { if (c == '`') inTick = false }
      else c match {
        case '\'' => inStr = true
        case '`' => inTick = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ => if (depth == 0 && s.startsWith(token, i)) return i
      }
      i += 1
    }
    -1
  }

  // ---- lexer-lite helpers ---------------------------------------------

  /** Index of a top-level (depth-0, outside strings) case-insensitive
    * keyword sequence; -1 if absent. Multi-word keywords ("ORDER BY")
    * match with any run of whitespace between the words. */
  private[sql] def topLevelIndex(s: String, keyword: String, from: Int = 0): Int = {
    val words = keyword.toUpperCase.split("\\s+")
    var depth = 0
    var inStr = false
    var inTick = false
    var i = from
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (inTick) { if (c == '`') inTick = false }
      else c match {
        case '\'' => inStr = true
        case '`' => inTick = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && matchWords(s, i, words) >= 0) return i
      }
      i += 1
    }
    -1
  }

  /** If the whole-word keyword sequence `words` starts at `start`, return
    * the index just past it; -1 otherwise. */
  private[sql] def matchWords(s: String, start: Int, words: Array[String]): Int = {
    if (start > 0 && isWordChar(s.charAt(start - 1))) return -1
    var i = start
    var w = 0
    while (w < words.length) {
      val kw = words(w)
      if (!s.regionMatches(true, i, kw, 0, kw.length)) return -1
      i += kw.length
      if (i < s.length && isWordChar(s.charAt(i))) return -1
      w += 1
      if (w < words.length) {
        val j = i
        while (i < s.length && s.charAt(i).isWhitespace) i += 1
        if (i == j) return -1
      }
    }
    i
  }

  private[sql] def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** Index of the ')' matching the '(' at `open` (string-aware). */
  /** Index of the '(' matching the ')' at `close`, or -1. */
  private[sql] def openParenOf(s: String, close: Int): Int = {
    var depth = 0
    var i = close
    while (i >= 0) {
      if (s.charAt(i) == ')') depth += 1
      else if (s.charAt(i) == '(') { depth -= 1; if (depth == 0) return i }
      i -= 1
    }
    -1
  }

  private[sql] def closeParen(s: String, open: Int): Int = {
    var depth = 0
    var inStr = false
    var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (c == '\'') inStr = true
      else if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    -1
  }

  /** BigQuery SAFE_CAST (SqlLibraryOperators.java:2725) → TRY_CAST
    * (identical NULL-on-error semantics). The SAFE_ arithmetic family
    * (SAFE_ADD/SUBTRACT/MULTIPLY/DIVIDE/NEGATE :2594-2718) is registered
    * as functions instead — functions/BigQueryFns.scala — because TRY_
    * returns Infinity on DOUBLE overflow where SAFE_ must return NULL. */
  private def rewriteSafeCast(sql: String): String =
    replaceMasked(sql, "(?i)\\bSAFE_CAST\\s*\\(".r)((_, _) => "TRY_CAST(")

  /** `<ident or dotted ident> [NOT] SIMILAR TO '<pattern>'` →
    * `[NOT] similar_to(ident, '<pattern>')`. */
  private def rewriteSimilarTo(sql: String): String = {
    val re = ("(?i)([A-Za-z_][A-Za-z0-9_\\.]*)\\s+(NOT\\s+)?SIMILAR\\s+TO\\s+" +
      "('(?:[^']|'')*')").r
    // the pattern literal (group 3) is masked — splice it from the original
    replaceMasked(sql, re) { (m, orig) =>
      val not = if (m.group(2) != null) "NOT " else ""
      s"${not}similar_to(${m.group(1)}, ${origGroup(m, orig, 3)})"
    }
  }

  /** `agg(x) FILTER (WHERE p) OVER w` (SQL:2011 FILTER on a window
    * aggregate — winagg.iq:1182, CALCITE-6442): Spark rejects FILTER on
    * window functions, but for the null-ignoring aggregate family the
    * clause is exactly a null-injecting CASE on each argument:
    * `agg(CASE WHEN p THEN x END) OVER w`; `count(*)` counts a CASE'd
    * constant. FILTER on a plain (non-window) aggregate passes through —
    * Spark supports that natively. Only the true-aggregate family is
    * lowered: FILTER on a navigation function (first_value/lead/rank...)
    * is invalid SQL the reference rejects (winagg.iq:1320), so those
    * pass through for Spark's own rejection. */
  private val windowFilterAggs = Set(
    // any_value deliberately absent: Spark's default does NOT ignore
    // NULLs, so the CASE lowering could return the injected NULL
    "count", "sum", "avg", "min", "max", "every", "some",
    "stddev", "stddev_pop", "stddev_samp", "var_pop", "var_samp",
    "variance", "covar_pop", "covar_samp", "corr", "bool_and", "bool_or",
    "bit_and", "bit_or", "bit_xor", "collect_list", "collect_set",
    "array_agg", "listagg", "string_agg", "regr_sxx", "regr_syy",
    "regr_count", "regr_avgx", "regr_avgy")

  private[graft] def rewriteWindowFilter(sql: String): String = {
    val masked = maskLiterals(sql)
    for (m <- "(?is)\\bFILTER\\s*\\(\\s*WHERE\\b".r.findAllMatchIn(masked)) {
      val fOpen = masked.indexOf('(', m.start)
      val fClose = closeParen(masked, fOpen)
      if (fClose > 0 &&
          "(?is)^\\s*OVER\\b".r.findFirstIn(masked.substring(fClose + 1)).isDefined) {
        var p = m.start - 1
        while (p >= 0 && masked.charAt(p).isWhitespace) p -= 1
        if (p >= 0 && masked.charAt(p) == ')') {
          var depth = 1
          var i = p - 1
          while (i >= 0 && depth > 0) {
            val c = masked.charAt(i)
            if (c == ')') depth += 1 else if (c == '(') depth -= 1
            if (depth > 0) i -= 1
          }
          val aOpen = i
          val fnOk = aOpen > 0 &&
            "(?is)[A-Za-z_]\\w*\\s*$".r.findFirstIn(masked.substring(0, aOpen))
              .exists(f => windowFilterAggs.contains(f.trim.toLowerCase))
          if (fnOk) {
            val pred = sql.substring(fOpen + 1, fClose).trim
              .replaceFirst("(?is)^WHERE\\s+", "")
            val rawArgs = sql.substring(aOpen + 1, p)
            val lens = splitTopLevel(masked.substring(aOpen + 1, p)).map(_.length)
            val starts = lens.scanLeft(0)((a, b) => a + b + 1).init
            val args = starts.zip(lens).map { case (st, n) =>
              rawArgs.substring(st, st + n).trim }
            val newArgs =
              if (args.length == 1 && args.head == "*") s"CASE WHEN $pred THEN 1 END"
              else args.zipWithIndex.map { case (a, ix) =>
                val dm = "(?is)^(DISTINCT|ALL)\\s+(.*)$".r.findFirstMatchIn(a)
                  .filter(_ => ix == 0)
                dm.map(d => s"${d.group(1)} CASE WHEN $pred THEN ${d.group(2)} END")
                  .getOrElse(s"CASE WHEN $pred THEN $a END")
              }.mkString(", ")
            return rewriteWindowFilter(
              sql.substring(0, aOpen + 1) + newArgs + ")" + sql.substring(fClose + 1))
          }
        }
      }
    }
    sql
  }

  /** Lower QUALIFY (recursing into subqueries/CTEs first): everything up
    * to QUALIFY becomes a subquery, the predicate a WHERE on it; trailing
    * ORDER BY/LIMIT/OFFSET remain on the outer select. Raw window
    * functions in the predicate (qualify.iq's canonical
    * `QUALIFY ROW_NUMBER() OVER (...) <= 3`) are projected as
    * auto-generated aliases in the subselect — Spark rejects window
    * functions in WHERE — then dropped via `* EXCEPT`. */
  private def rewriteQualify(sql: String): String = {
    // recurse into parenthesized groups so QUALIFY inside a subquery/CTE
    // body is lowered too
    val sb = new StringBuilder
    var inStr = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (!inStr && c == '(') {
        val close = closeParen(sql, i)
        if (close < 0) { sb.append(sql.substring(i)); i = sql.length }
        else {
          sb.append('(').append(rewriteQualify(sql.substring(i + 1, close))).append(')')
          i = close + 1
        }
      } else {
        if (c == '\'') inStr = !inStr
        sb.append(c)
        i += 1
      }
    }
    rewriteQualifyTop(sb.toString)
  }

  private def rewriteQualifyTop(sql: String): String = {
    val qi = topLevelIndex(sql, "QUALIFY")
    if (qi < 0) return sql
    val head = sql.substring(0, qi).trim
    val tail = sql.substring(qi + "QUALIFY".length)
    // find where the trailing clauses start (top level within tail)
    val stops = Seq("ORDER BY", "LIMIT", "OFFSET", "WINDOW")
      .map(k => topLevelIndex(tail, k)).filter(_ >= 0)
    val predEnd = if (stops.isEmpty) tail.length else stops.min
    val rawPred = tail.substring(0, predEnd).trim
    val trailing = tail.substring(predEnd)
    val (pred, windows) = extractWindowExprs(rawPred)
    val fromIdx = topLevelIndex(head, "FROM")
    if (windows.isEmpty || fromIdx < 0)
      s"SELECT * FROM ($head) __qualify WHERE $pred $trailing"
    else {
      // Window exprs may reference any column of the FROM relation (true
      // QUALIFY scoping), so inject the aliases into the head's own select
      // list rather than a wrapper over its (possibly narrower) output.
      val proj = windows.zipWithIndex
        .map { case (w, k) => s"$w AS __qw$k" }.mkString(", ")
      val drop = windows.indices.map(k => s"__qw$k").mkString(", ")
      val headWithWins =
        head.substring(0, fromIdx).replaceAll("\\s+$", "") + s", $proj " +
          head.substring(fromIdx)
      s"SELECT * EXCEPT ($drop) FROM ($headWithWins) __qualify WHERE $pred $trailing"
    }
  }

  /** Replace each `fn(args) OVER (spec)` span in the predicate with a
    * `__qw<k>` placeholder; returns (rewritten predicate, spans). */
  private def extractWindowExprs(pred: String): (String, Seq[String]) = {
    val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // [start, end)
    var inStr = false
    var i = 0
    val over = Array("OVER")
    while (i < pred.length) {
      val c = pred.charAt(i)
      if (inStr) { if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { inStr = true; i += 1 }
      else {
        val afterOver = matchWords(pred, i, over)
        if (afterOver >= 0) {
          // forward: whitespace then the (spec)
          var j = afterOver
          while (j < pred.length && pred.charAt(j).isWhitespace) j += 1
          val specEnd = if (j < pred.length && pred.charAt(j) == '(') closeParen(pred, j) else -1
          // backward: whitespace, the fn's (args), the fn identifier
          var b = i - 1
          while (b >= 0 && pred.charAt(b).isWhitespace) b -= 1
          val argsClose = b
          val fnStart: Int =
            if (argsClose >= 0 && pred.charAt(argsClose) == ')') {
              // matching '(' of the argument list, scanning backward
              var depth = 0
              var k = argsClose
              var open = -1
              while (k >= 0 && open < 0) {
                val ch = pred.charAt(k)
                if (ch == ')') depth += 1
                else if (ch == '(') { depth -= 1; if (depth == 0) open = k }
                k -= 1
              }
              if (open < 0) -1
              else {
                var f = open - 1
                while (f >= 0 && (isWordChar(pred.charAt(f)) || pred.charAt(f) == '.')) f -= 1
                if (f + 1 == open) -1 else f + 1 // require a fn identifier
              }
            } else -1
          if (specEnd >= 0 && fnStart >= 0) {
            spans += ((fnStart, specEnd + 1))
            i = specEnd + 1
          } else i = afterOver
        } else i += 1
      }
    }
    if (spans.isEmpty) (pred, Seq.empty)
    else {
      val sb = new StringBuilder
      var last = 0
      val texts = spans.toSeq.zipWithIndex.map { case ((s, e), k) =>
        sb.append(pred.substring(last, s)).append(s"__qw$k")
        last = e
        pred.substring(s, e)
      }
      sb.append(pred.substring(last))
      (sb.toString, texts)
    }
  }
}
