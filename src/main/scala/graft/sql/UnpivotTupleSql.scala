package graft.sql

import GraftSql.{closeParen, maskLiterals, splitElemsOf}

/** UNPIVOT with TUPLE labels (pivot.iq:394 —
  * `FOR (job, deptno) IN ((c10_ss, c10_c) AS ('CLERK', 10), ...)`):
  * each measure-column tuple maps to a tuple of label VALUES that
  * split into the FOR columns. Spark's UNPIVOT labels are single
  * identifiers, so this form lowers to the classic UNION ALL
  * expansion: one branch per IN entry selecting the kept columns
  * (`* EXCLUDE (all measure columns)` — original order preserved),
  * the entry's label values as the FOR columns, and the entry's
  * measure columns as the value columns; EXCLUDE NULLS (the default)
  * filters branch rows whose value columns are all NULL. Branches
  * re-read the source relation — acceptable for the conformance
  * surface; native single-label UNPIVOT stays on Spark's operator. */
object UnpivotTupleSql {

  def rewrite(sql: String): String = {
    val masked = maskLiterals(sql)
    // iterate: a native (single-label) UNPIVOT earlier in the statement
    // must not hide a later tuple-label one
    for (um <- "(?is)\\bUNPIVOT\\s*(INCLUDE\\s+NULLS|EXCLUDE\\s+NULLS)?\\s*\\(".r
           .findAllMatchIn(masked)) {
      val r = rewriteOne(sql, masked, um)
      if (r.isDefined) return rewrite(r.get)
    }
    sql
  }

  private def rewriteOne(sql: String, masked: String,
      um: scala.util.matching.Regex.Match): Option[String] = {
    val open = masked.indexOf('(', um.end - 1)
    val close = closeParen(masked, open)
    if (close < 0) return None
    val bodyM = masked.substring(open + 1, close)
    if ("(?is)\\bAS\\s*\\(".r.findFirstIn(bodyM).isEmpty) return None // native form
    val body = sql.substring(open + 1, close)
    val includeNulls = um.group(1) != null &&
      um.group(1).toUpperCase.startsWith("INCLUDE")

    // body: (<measures>) FOR (<fors>) IN (<entries>)
    val fm = "(?is)^\\s*\\(".r.findFirstMatchIn(bodyM).getOrElse(return None)
    val mClose = closeParen(bodyM, fm.end - 1)
    if (mClose < 0) return None
    val measures = splitElemsOf(body, bodyM, fm.end, mClose)
    val forM = "(?is)^\\s*FOR\\s*\\(".r.findFirstMatchIn(bodyM.substring(mClose + 1))
      .getOrElse(return None)
    val fOpen = mClose + 1 + forM.end - 1
    val fClose = closeParen(bodyM, fOpen)
    if (fClose < 0) return None
    val fors = splitElemsOf(body, bodyM, fOpen + 1, fClose)
    val inM = "(?is)^\\s*IN\\s*\\(".r.findFirstMatchIn(bodyM.substring(fClose + 1))
      .getOrElse(return None)
    val iOpen = fClose + 1 + inM.end - 1
    val iClose = closeParen(bodyM, iOpen)
    if (iClose < 0) return None
    val entries = splitElemsOf(body, bodyM, iOpen + 1, iClose).map { e =>
      val em = maskLiterals(e)
      val cm = "(?is)^\\s*\\(".r.findFirstMatchIn(em).getOrElse(return None)
      val cClose = closeParen(em, cm.end - 1)
      val cols = splitElemsOf(e, em, cm.end, cClose)
      val am = "(?is)^\\s*AS\\s*\\(".r.findFirstMatchIn(em.substring(cClose + 1))
      val vals = am match {
        case Some(a) =>
          val vOpen = cClose + 1 + a.end - 1
          val vClose = closeParen(em, vOpen)
          splitElemsOf(e, em, vOpen + 1, vClose)
        case None =>
          // missing AS: the default label is the measure-column names
          // upper-joined by '_', replicated into every FOR column
          // (pivot.iq:699)
          val lbl = "'" + cols.map(_.trim.toUpperCase).mkString("_") + "'"
          Seq.fill(fors.length)(lbl)
      }
      if (vals.length != fors.length || cols.length != measures.length) return None
      (cols, vals)
    }

    // preceding relation: a parenthesized subquery or a bare
    // (possibly qualified/backquoted) table name
    var p = um.start - 1
    while (p >= 0 && masked.charAt(p).isWhitespace) p -= 1
    if (p < 0) return None
    var i = p
    if (masked.charAt(p) == ')') {
      var depth = 1
      i = p - 1
      while (i >= 0 && depth > 0) {
        val c = masked.charAt(i)
        if (c == ')') depth += 1 else if (c == '(') depth -= 1
        if (depth > 0) i -= 1
      }
    } else {
      val nameM = "(?is)([A-Za-z_`][\\w.`]*)\\s*$".r
        .findFirstMatchIn(masked.substring(0, p + 1)).getOrElse(return None)
      i = nameM.start(1)
    }
    val rel = sql.substring(i, p + 1)

    val allMeasureCols = entries.flatMap(_._1).map(_.trim).distinct
    val branches = entries.map { case (cols, vals) =>
      val sel = s"SELECT * EXCLUDE (${allMeasureCols.mkString(", ")}), " +
        vals.zip(fors).map { case (v, f) => s"$v AS $f" }.mkString(", ") + ", " +
        cols.zip(measures).map { case (c, a) => s"$c AS $a" }.mkString(", ") +
        s" FROM $rel __unp"
      if (includeNulls) sel
      else sel + " WHERE NOT (" +
        cols.map(c => s"$c IS NULL").mkString(" AND ") + ")"
    }
    Some(sql.substring(0, i) + "(" + branches.mkString("\nUNION ALL\n") + ") " +
      sql.substring(close + 1))
  }

}
