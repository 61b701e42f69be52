package graft.sql

import GraftSql.{closeParen, maskLiterals}

/** SQL/JSON constructor surface (ref: SqlStdOperatorTable JSON_OBJECT
  * :1680, JSON_ARRAYAGG :1724; runtime/JsonFunctions.java; agg.iq:3250-
  * 3400, sub-query.iq:4542):
  *
  *  - `JSON_OBJECT('k': v, ... [NULL|ABSENT ON NULL])` (colon or
  *    KEY k VALUE v form) → `to_json(named_struct(...))` — written key
  *    order, booleans/numbers/strings rendered as JSON scalars; the
  *    NULL-ON-NULL default keeps null-valued keys
  *    (ignoreNullFields=false).
  *  - `JSON_ARRAYAGG(x [ORDER BY x [DESC]] [NULL ON NULL])` →
  *    `to_json(collect_list(x))` with sort_array for the same-expression
  *    ORDER BY and a struct-envelope collect when nulls must be kept
  *    (the default is ABSENT ON NULL, which collect_list's null-dropping
  *    matches exactly). A raw-JSON element (the inner expression is
  *    itself a to_json(...) or carries FORMAT JSON) concatenates
  *    unquoted: `concat('[', concat_ws(',', collect_list(x)), ']')`.
  *
  * `FORMAT JSON` on a JSON_OBJECT member and JSON_OBJECTAGG stay
  * unsupported (the reference renders objectagg in hash order — not
  * reproducible). */
object JsonAggSql {

  def apply(sql: String): String = rewriteArrayAgg(rewriteObject(sql))

  private def splitTop(s: String): Seq[String] = GraftSql.splitTopLevel(s)

  /** First top-level `:` in the masked item (quotes/parens respected). */
  private def topColon(masked: String): Int = {
    var depth = 0
    var i = 0
    while (i < masked.length) {
      val c = masked.charAt(i)
      if (c == '(' || c == '[') depth += 1
      else if (c == ')' || c == ']') depth -= 1
      else if (c == ':' && depth == 0) return i
      i += 1
    }
    -1
  }

  private[sql] def rewriteObject(sql: String): String = {
    val masked = maskLiterals(sql)
    val re = "(?i)\\bJSON_OBJECT\\s*\\(".r
    for (m <- re.findAllMatchIn(masked)) {
      val open = masked.indexOf('(', m.start)
      val close = closeParen(masked, open)
      if (close > 0) {
        var innerOrig = sql.substring(open + 1, close)
        var innerMask = masked.substring(open + 1, close)
        if (!"(?is).*\\bFORMAT\\s+JSON\\b.*".r.matches(innerMask)) {
          // trailing ON NULL option rides the LAST member's text
          val opt = "(?is)\\s+(NULL|ABSENT)\\s+ON\\s+NULL\\s*$".r
            .findFirstMatchIn(innerMask)
          val keepNulls = opt.forall(_.group(1).equalsIgnoreCase("NULL"))
          opt.foreach { o =>
            innerOrig = innerOrig.substring(0, o.start)
            innerMask = innerMask.substring(0, o.start)
          }
          val itemsM = splitTop(innerMask)
          var cursor = 0
          val pairs = itemsM.map { im =>
            val io = innerOrig.substring(cursor, cursor + im.length)
            cursor += im.length + 1
            val colon = topColon(im)
            if (colon >= 0) Some((io.substring(0, colon).trim, io.substring(colon + 1).trim))
            else "(?is)^\\s*KEY\\s+(.*?)\\s+VALUE\\s+(.*)$".r.findFirstMatchIn(io)
              .map(km => (km.group(1).trim, km.group(2).trim))
          }
          if (pairs.forall(_.isDefined) && pairs.nonEmpty) {
            val ns = pairs.flatten.map { case (k, v) => s"$k, ($v)" }.mkString(", ")
            val rep =
              s"to_json(named_struct($ns), map('ignoreNullFields', '${!keepNulls}'))"
            return rewriteObject(sql.substring(0, m.start) + rep + sql.substring(close + 1))
          }
        }
      }
    }
    sql
  }

  private[sql] def rewriteArrayAgg(sql: String): String = {
    val masked = maskLiterals(sql)
    val re = "(?i)\\bJSON_ARRAYAGG\\s*\\(".r
    for (m <- re.findAllMatchIn(masked)) {
      val open = masked.indexOf('(', m.start)
      val close = closeParen(masked, open)
      if (close > 0) {
        var io = sql.substring(open + 1, close)
        var im = masked.substring(open + 1, close)
        def strip(reStr: String): Option[String] = {
          val r = reStr.r.findFirstMatchIn(im)
          r.foreach { mm =>
            io = io.substring(0, mm.start) + io.substring(mm.end)
            im = im.substring(0, mm.start) + im.substring(mm.end)
          }
          r.map(_.matched)
        }
        val keepNulls = strip("(?is)\\s+NULL\\s+ON\\s+NULL\\s*$").isDefined
        strip("(?is)\\s+ABSENT\\s+ON\\s+NULL\\s*$")
        val fmtJson = strip("(?is)\\s+FORMAT\\s+JSON\\s*$").isDefined
        val order = "(?is)\\s+ORDER\\s+BY\\s+(.+?)\\s*(DESC|ASC)?\\s*$".r.findFirstMatchIn(im)
          .map(om => (io.substring(om.start(1), om.end(1)).trim,
            om.group(2) != null && om.group(2).equalsIgnoreCase("DESC"), om.start))
        order.foreach { case (_, _, at) => io = io.substring(0, at); im = im.substring(0, at) }
        val x = io.trim
        val rawJson = fmtJson || "(?is)^to_json\\s*\\(.*".r.matches(im.trim)
        val collected = order match {
          case Some((k, desc, _)) if k == x =>
            s"sort_array(collect_list($x)${if (desc) ", false" else ""})"
          case Some(_) => return sql // independent sort key: no aggregate equivalent
          case None if keepNulls =>
            s"transform(collect_list(named_struct('v', $x)), __jv -> __jv.v)"
          case None => s"collect_list($x)"
        }
        val rep =
          if (rawJson) s"concat('[', concat_ws(',', $collected), ']')"
          else s"to_json($collected)"
        return rewriteArrayAgg(sql.substring(0, m.start) + rep + sql.substring(close + 1))
      }
    }
    sql
  }
}
