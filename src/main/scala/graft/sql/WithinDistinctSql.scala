package graft.sql

import GraftSql.{closeParen, maskLiterals}

/** `agg(e) WITHIN DISTINCT (keys)` (SqlInternalOperators WITHIN
  * DISTINCT — CALCITE-4483; within-distinct.iq): the aggregate runs
  * over ONE row per distinct `keys` value, and errors when `e` is not
  * functionally dependent on the keys within the group ("more than one
  * distinct value in agg UNIQUE_VALUE" — the reference's UNIQUE_VALUE
  * internal aggregate).
  *
  * Lowered to higher-order functions over a distinct pair collection —
  * no query restructure, so the surface composes with GROUP BY and
  * other select items:
  *
  *   P  = array_distinct(collect_list(named_struct(keys..., e)))
  *   KO = array_distinct(collect_list(named_struct(keys...)))
  *   guard: size(P) = size(KO) else raise_error(reference message)
  *   COUNT(*) = size(KO); COUNT(e) = non-null pairs; SUM/AVG fold the
  *   pair values in DOUBLE (the result re-normalizes in the harness
  *   compare; MIN/MAX are distinct-insensitive and pass through).
  */
object WithinDistinctSql {

  private val err = "more than one distinct value in agg UNIQUE_VALUE"

  def rewrite(sql: String): String = {
    val masked = maskLiterals(sql)
    val m = "(?is)\\bWITHIN\\s+DISTINCT\\s*\\(".r.findFirstMatchIn(masked)
      .getOrElse(return sql)
    val kOpen = masked.indexOf('(', m.start)
    val kClose0 = closeParen(masked, kOpen)
    if (kClose0 < 0) return sql
    val keys = GraftSql.splitTopLevel(sql.substring(kOpen + 1, kClose0)).map(_.trim)
    // a trailing FILTER (WHERE ...) restricts the rows feeding the
    // distinct pair collection — it rides on every collect_list
    var kClose = kClose0
    var filterTxt = ""
    val fm = "(?is)^\\s*FILTER\\s*\\(".r.findFirstMatchIn(masked.substring(kClose0 + 1))
    fm.foreach { f =>
      val fc = closeParen(masked, kClose0 + 1 + f.end - 1)
      if (fc > 0) {
        filterTxt = " " + sql.substring(kClose0 + 1 + f.start, fc + 1).trim
        kClose = fc
      }
    }
    // the aggregate call directly before WITHIN
    var p = m.start - 1
    while (p >= 0 && masked.charAt(p).isWhitespace) p -= 1
    if (p < 0 || masked.charAt(p) != ')') return sql
    var depth = 1
    var i = p - 1
    while (i >= 0 && depth > 0) {
      val c = masked.charAt(i)
      if (c == ')') depth += 1 else if (c == '(') depth -= 1
      if (depth > 0) i -= 1
    }
    val aOpen = i
    val fnM = "(?i)(\\w+)\\s*$".r.findFirstMatchIn(masked.substring(0, aOpen))
      .getOrElse(return sql)
    val fn = fnM.group(1).toUpperCase(java.util.Locale.ROOT)
    val fnStart = fnM.start(1)
    val arg0 = sql.substring(aOpen + 1, p).trim
    // SUM(DISTINCT x) WITHIN DISTINCT (y): distinct VALUES among the
    // per-key representatives (within-distinct.iq:807)
    val argDistinct = "(?is)^DISTINCT\\s+".r.findFirstIn(arg0).isDefined
    val arg = arg0.replaceAll("(?is)^DISTINCT\\s+", "")

    val kvs = keys.zipWithIndex.map { case (k, n) => s"'__wk$n', ($k)" }.mkString(", ")
    val ko = s"array_distinct(collect_list(named_struct($kvs))$filterTxt)"
    def pairs = s"array_distinct(collect_list(named_struct($kvs, '__wv', ($arg)))$filterTxt)"
    def guard(value: String, ty: String) =
      s"(CASE WHEN size($pairs) <> size($ko) " +
        s"THEN CAST(raise_error('$err') AS $ty) ELSE $value END)"
    // fold in a wide DECIMAL, not DOUBLE — the sums must stay exact
    // (agg.iq:2959 expects 95000, not a 94999.9999 float artifact)
    val acc = "DECIMAL(38, 6)"
    def vals = {
      val v = s"transform(filter($pairs, __ws -> __ws.__wv IS NOT NULL), __ws -> CAST(__ws.__wv AS $acc))"
      if (argDistinct) s"array_distinct($v)" else v
    }
    def sumExpr =
      s"(CASE WHEN size($vals) = 0 THEN CAST(NULL AS $acc) " +
        s"ELSE aggregate($vals, CAST(0 AS $acc), (__wa, __wx) -> CAST(__wa + __wx AS $acc)) END)"
    // COUNT/AVG denominators honor a DISTINCT qualifier: distinct
    // VALUES among the per-key representatives (no DECIMAL cast — the
    // argument may be non-numeric for COUNT)
    def cntExpr = {
      val nn = s"transform(filter($pairs, __ws -> __ws.__wv IS NOT NULL), __ws -> __ws.__wv)"
      if (argDistinct) s"size(array_distinct($nn))" else s"size($nn)"
    }

    // agg_typed re-types to the reference's argument-derived result
    // type (AVG(DECIMAL(10,2)) truncates to scale 2 —
    // within-distinct.iq:306); SUM keeps the argument's SCALE but
    // widens precision (deriveSumType — 12500.00 must not overflow a
    // DECIMAL(6,2) argument type), which the widen flag requests
    def typed(e: String, widen: Boolean = false) =
      s"agg_typed($e, max($arg)${if (widen) ", true" else ""})"
    val replacement: Option[String] = fn match {
      case "COUNT" if arg == "*" => Some(s"size($ko)")
      case "COUNT" => Some(guard(cntExpr, "INT"))
      case "SUM" => Some(typed(guard(sumExpr, acc), widen = true))
      case "AVG" => Some(typed(guard(s"(($sumExpr) / ($cntExpr))", acc)))
      case "MIN" | "MAX" => // distinct-insensitive: drop the clause but
        // keep a trailing FILTER (Spark supports it natively)
        Some(sql.substring(fnStart, p + 1) + filterTxt)
      case _ => None
    }
    replacement match {
      case Some(rep) =>
        rewrite(sql.substring(0, fnStart) + rep + sql.substring(kClose + 1))
      case None => sql
    }
  }
}
