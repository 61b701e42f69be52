package graft.sql

import GraftSql.{closeParen, maskLiterals, splitTopLevel}

/** Grouping-set surfaces beyond Spark's grammar (reference:
  * SqlGroupedWindowFunction / the validator's grouping-set expansion in
  * sql/validate/AggregatingSelectScope.java; agg.iq:660, :1264):
  *
  *  - NESTED `GROUPING SETS ( a, GROUPING SETS (b, c) )`: the SQL
  *    standard splices the inner list into the outer one.
  *  - `GROUP BY DISTINCT cube(..), rollup(..)`: SQL:2011 dedups the
  *    cross-product of the grouping sets by COLUMN SET; Spark parses
  *    the DISTINCT but keeps every duplicate combination.
  *
  * Both lower to an explicit `GROUPING SETS ((...), ...)` literal list,
  * which Spark executes natively — the expansion is syntactic, so plan
  * shape (one Expand over one aggregation exchange) is unchanged. */
object GroupingSetsSql {

  def rewrite(sql: String): String =
    rewriteMixedEmpty(rewriteDistinct(flattenNested(sql)))

  /** `GROUP BY job, GROUPING SETS (...), ()` — a bare `()` element (or a
    * second GROUPING SETS) next to other grouping elements is valid in
    * the reference but not in Spark's grammar. Normalize the whole list
    * to one explicit GROUPING SETS cross product (duplicates KEPT —
    * Spark preserves duplicate sets, matching the reference). */
  private def rewriteMixedEmpty(sql: String): String = {
    val masked = maskLiterals(sql)
    for (m <- "(?is)\\bGROUP\\s+BY\\s".r.findAllMatchIn(masked)) {
      if (!"(?is)^\\s*DISTINCT\\b".r.findFirstIn(masked.substring(m.end)).isDefined) {
        val end = clauseEnd(masked, m.end)
        val elems = splitElems(sql, masked, m.end, end)
        val hasGs = elems.exists(e =>
          "(?is)^GROUPING\\s+SETS\\s*\\(".r.findFirstIn(e._2).isDefined)
        val hasEmpty = elems.exists(_._1.replaceAll("\\s", "") == "()")
        val nGs = elems.count(e =>
          "(?is)^GROUPING\\s+SETS\\s*\\(".r.findFirstIn(e._2).isDefined)
        if (elems.length >= 2 && hasGs && (hasEmpty || nGs >= 2)) {
          val expanded = elems
            .filter(_._1.replaceAll("\\s", "") != "()")
            .map { case (t, mt) => expand(t, mt) }
          val crossed = expanded.foldLeft(Seq(Seq.empty[String])) { (acc, sets) =>
            for (a <- acc; b <- sets) yield a ++ b
          }
          val setsTxt = crossed
            .map(t => if (t.isEmpty) "()" else t.mkString("(", ", ", ")"))
            .mkString(", ")
          return rewriteMixedEmpty(sql.substring(0, m.start) +
            "GROUP BY GROUPING SETS (" + setsTxt + ") " + sql.substring(end))
        }
      }
    }
    sql
  }

  /** End offset of a grouping-element list starting at `from`: the next
    * top-level clause keyword or unbalanced close paren. */
  private def clauseEnd(masked: String, from: Int): Int = {
    var i = from
    var depth = 0
    val stop = "(?is)^(HAVING|ORDER|LIMIT|OFFSET|FETCH|WINDOW|UNION|INTERSECT|EXCEPT|QUALIFY)\\b".r
    while (i < masked.length) {
      val c = masked.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') { if (depth == 0) return i else depth -= 1 }
      else if (depth == 0 && c.isLetter &&
          stop.findFirstIn(masked.substring(i)).isDefined &&
          !masked.charAt(math.max(i - 1, 0)).isLetterOrDigit) return i
      i += 1
    }
    masked.length
  }

  /** Splice inner GROUPING SETS elements into the enclosing list. */
  private def flattenNested(sql: String): String = {
    val masked = maskLiterals(sql)
    val re = "(?is)\\bGROUPING\\s+SETS\\s*\\(".r
    val outers = re.findAllMatchIn(masked).toSeq
    for (o <- outers) {
      val open = masked.indexOf('(', o.start)
      val close = closeParen(masked, open)
      if (close > 0) {
        val innerMasked = masked.substring(open + 1, close)
        val inner = re.findFirstMatchIn(innerMasked)
        if (inner.isDefined) {
          // splice each top-level `grouping sets (...)` element
          val elems = splitElems(sql, masked, open + 1, close)
          val spliced = elems.flatMap { case (txt, mtxt) =>
            "(?is)^\\s*GROUPING\\s+SETS\\s*\\(".r.findFirstMatchIn(mtxt) match {
              case Some(im) =>
                val iOpen = mtxt.indexOf('(', im.start)
                val iClose = closeParen(mtxt, iOpen)
                if (iClose > 0) splitElems(txt, mtxt, iOpen + 1, iClose).map(_._1)
                else Seq(txt)
              case None => Seq(txt)
            }
          }
          return flattenNested(
            sql.substring(0, open + 1) + spliced.mkString(", ") + sql.substring(close))
        }
      }
    }
    sql
  }

  /** Top-level comma elements of text[from, to) with their masked twin. */
  private def splitElems(sql: String, masked: String, from: Int, to: Int): Seq[(String, String)] = {
    val m = masked.substring(from, to)
    val s = sql.substring(from, to)
    val lens = splitTopLevel(m).map(_.length)
    val starts = lens.scanLeft(0)((a, b) => a + b + 1).init
    starts.zip(lens).map { case (st, n) => (s.substring(st, st + n).trim, m.substring(st, st + n).trim) }
  }

  /** Element text → its column tuple (strips one paren level). */
  private def cols(txt: String): Seq[String] = {
    val mm = maskLiterals(txt)
    val inner =
      if (txt.startsWith("(")) (txt.substring(1, txt.length - 1), mm.substring(1, mm.length - 1))
      else (txt, mm)
    val lens = splitTopLevel(inner._2).map(_.length)
    val starts = lens.scanLeft(0)((a, b) => a + b + 1).init
    starts.zip(lens).map { case (st, n) => inner._1.substring(st, st + n).trim }
      .filter(_.nonEmpty)
  }

  /** Grouping element → its list of column tuples (CUBE = all subsets,
    * ROLLUP = prefixes, GROUPING SETS = its members, expr = itself). */
  private def expand(txt: String, mtxt: String): Seq[Seq[String]] = {
    val cu = "(?is)^(CUBE|ROLLUP)\\s*\\(".r.findFirstMatchIn(mtxt)
    val gs = "(?is)^GROUPING\\s+SETS\\s*\\(".r.findFirstMatchIn(mtxt)
    if (gs.isDefined) {
      val open = mtxt.indexOf('(', gs.get.start)
      val close = closeParen(mtxt, open)
      splitElems(txt, mtxt, open + 1, close).map { case (t, _) => cols(t) }
    } else if (cu.isDefined) {
      val open = mtxt.indexOf('(', cu.get.start)
      val close = closeParen(mtxt, open)
      val cs = splitElems(txt, mtxt, open + 1, close).map(_._1)
      if (cu.get.group(1).equalsIgnoreCase("CUBE"))
        (0 until (1 << cs.length)).map(mask =>
          cs.zipWithIndex.collect { case (c, ix) if (mask & (1 << ix)) != 0 => c })
      else (cs.length to 0 by -1).map(cs.take)
    } else Seq(cols(txt))
  }

  /** `GROUP BY DISTINCT <elements>` → dedup'd GROUPING SETS list. */
  private def rewriteDistinct(sql: String): String = {
    val masked = maskLiterals(sql)
    val m = "(?is)\\bGROUP\\s+BY\\s+DISTINCT\\s".r.findFirstMatchIn(masked)
      .getOrElse(return sql)
    val end = clauseEnd(masked, m.end)
    val elems = splitElems(sql, masked, m.end, end)
    // cross-product of the per-element set lists, concatenating tuples
    val expanded = elems.map { case (t, mt) => expand(t, mt) }
    val crossed = expanded.foldLeft(Seq(Seq.empty[String])) { (acc, sets) =>
      for (a <- acc; b <- sets) yield a ++ b
    }
    // DISTINCT: dedupe by column SET, first-seen order, dropping
    // duplicate columns within a tuple
    val seen = scala.collection.mutable.LinkedHashMap.empty[Set[String], Seq[String]]
    crossed.foreach { tup =>
      val uniq = tup.distinct
      val key = uniq.toSet
      if (!seen.contains(key)) seen(key) = uniq
    }
    val setsTxt = seen.values
      .map(t => if (t.isEmpty) "()" else t.mkString("(", ", ", ")"))
      .mkString(", ")
    sql.substring(0, m.start) +
      "GROUP BY GROUPING SETS (" + setsTxt + ") " + sql.substring(end)
  }
}
