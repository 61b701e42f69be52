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

  def sql(spark: SparkSession, text: String): DataFrame = {
    GraftFunctions.registerAll(spark)
    spark.sql(rewrite(text))
  }

  private[graft] def rewrite(sql: String): String =
    rewriteQualify(rewriteSimilarTo(rewriteSafeCast(sql)))

  // ---- lexer-lite helpers ---------------------------------------------

  /** Index of a top-level (depth-0, outside strings) case-insensitive
    * keyword sequence; -1 if absent. Keywords must be whole words. */
  private def topLevelIndex(s: String, keyword: String, from: Int = 0): Int = {
    val upper = s.toUpperCase
    val kw = keyword.toUpperCase
    var depth = 0
    var inStr = false
    var i = from
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && upper.startsWith(kw, i) &&
            (i == 0 || !isWordChar(s.charAt(i - 1))) &&
            (i + kw.length >= s.length || !isWordChar(s.charAt(i + kw.length))))
            return i
      }
      i += 1
    }
    -1
  }

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  private def rewriteSafeCast(sql: String): String =
    sql.replaceAll("(?i)\\bSAFE_CAST\\s*\\(", "TRY_CAST(")

  /** `<ident or dotted ident> [NOT] SIMILAR TO '<pattern>'` →
    * `[NOT] similar_to(ident, '<pattern>')`. */
  private def rewriteSimilarTo(sql: String): String = {
    val re = ("(?i)([A-Za-z_][A-Za-z0-9_\\.]*)\\s+(NOT\\s+)?SIMILAR\\s+TO\\s+" +
      "('(?:[^']|'')*')").r
    re.replaceAllIn(sql, m => {
      val not = if (m.group(2) != null) "NOT " else ""
      java.util.regex.Matcher.quoteReplacement(
        s"${not}similar_to(${m.group(1)}, ${m.group(3)})")
    })
  }

  /** Lower QUALIFY: everything up to QUALIFY becomes a subquery, the
    * predicate a WHERE on it; trailing ORDER BY/LIMIT/OFFSET remain on
    * the outer select. */
  private def rewriteQualify(sql: String): String = {
    val qi = topLevelIndex(sql, "QUALIFY")
    if (qi < 0) return sql
    val head = sql.substring(0, qi).trim
    val tail = sql.substring(qi + "QUALIFY".length)
    // find where the trailing clauses start (top level within tail)
    val stops = Seq("ORDER BY", "LIMIT", "OFFSET", "WINDOW")
      .map(k => topLevelIndex(tail, k)).filter(_ >= 0)
    val predEnd = if (stops.isEmpty) tail.length else stops.min
    val pred = tail.substring(0, predEnd).trim
    val trailing = tail.substring(predEnd)
    s"SELECT * FROM ($head) __qualify WHERE $pred $trailing"
  }
}
