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
    rewriteGroupingFns(rewriteGroupId(rewriteEmptySetUnion(
      rewriteMixedEmpty(rewriteDistinct(flattenNested(sql))))))

  /** GROUPING SETS containing the EMPTY set, with a select list of pure
    * aggregates → UNION ALL of per-set aggregate branches. The
    * reference evaluates each grouping set independently, so the ()
    * set contributes its global-aggregate row even over EMPTY input
    * (COUNT = 0; sub-query.iq:9713's correlated slice for the
    * employee-less dept), where Spark's expand-based lowering is one
    * grouped aggregate that returns no rows on empty input. Fires only
    * when no grouping column survives into the output (pure-aggregate
    * items — otherwise column shapes differ per set) and no HAVING /
    * ORDER tail follows; the branches share one scan and Catalyst
    * merges their partial aggregates map-side. */
  private def rewriteEmptySetUnion(sql: String): String = {
    val masked = maskLiterals(sql)
    val gsRe = "(?is)\\bGROUP\\s+BY\\s+GROUPING\\s+SETS\\s*\\(".r
    for (m <- gsRe.findAllMatchIn(masked)) {
      val open = masked.indexOf('(', m.end - 1)
      val close = closeParen(masked, open)
      if (close > 0) {
        val sets = splitElems(sql, masked, open + 1, close).map(_._1.trim)
        if (sets.length >= 2 && sets.exists(_.replaceAll("\\s", "") == "()")) {
          // enclosing paren block (a derived table / subquery), or the
          // whole statement
          var depth = 0
          var bOpen = -1
          var i = m.start - 1
          while (i >= 0 && bOpen < 0) {
            val c = masked.charAt(i)
            if (c == ')') depth += 1
            else if (c == '(') { if (depth == 0) bOpen = i else depth -= 1 }
            i -= 1
          }
          val blockStart = bOpen + 1
          val blockEnd = if (bOpen >= 0) closeParen(masked, bOpen) else masked.length
          if (blockEnd > close && masked.substring(close + 1, blockEnd).trim.isEmpty) {
            val head = masked.substring(blockStart, m.start)
            val selM = "(?is)^\\s*SELECT\\b".r.findFirstMatchIn(head)
            val fromAt = GraftSql.topLevelIndex(head, "FROM")
            if (selM.isDefined && fromAt > selM.get.end) {
              val items = GraftSql.splitTopLevel(
                sql.substring(blockStart + selM.get.end, blockStart + fromAt))
              val aggItem = ("(?is)^\\s*(COUNT|SUM|AVG|MIN|MAX)\\s*" +
                "\\((?:[^()]|\\([^()]*\\))*\\)\\s*(AS\\s+\\w+\\s*)?$").r
              if (items.nonEmpty && items.forall(it => aggItem.matches(it))) {
                val prefix = sql.substring(blockStart, m.start)
                val branches = sets.map { s =>
                  if (s.replaceAll("\\s", "") == "()") prefix
                  else prefix + "GROUP BY " +
                    s.trim.stripPrefix("(").stripSuffix(")")
                }
                return rewriteEmptySetUnion(sql.substring(0, blockStart) +
                  branches.mkString(" UNION ALL ") + sql.substring(blockEnd))
              }
            }
          }
        }
      }
    }
    sql
  }

  /** GROUPING_ID(args...) → weighted sum of single-column GROUPING()
    * calls (identical semantics in both engines: Σ grouping(ci)·2^(n-1-i))
    * — Spark otherwise requires the argument list to match the grouping
    * columns exactly, where the reference allows any subset and order
    * (agg.iq:784, :907). An argument that appears in NO grouping set of
    * the query is aggregated on every row, so its GROUPING() is the
    * constant 1 (agg.iq:4123, :4180). Single-SELECT statements only
    * (one top-level GROUP BY). */
  private[sql] def rewriteGroupingFns(sql: String): String = {
    val masked0 = maskLiterals(sql)
    if ("(?is)\\bgrouping(_id)?\\s*\\(".r.findFirstIn(masked0).isEmpty) return sql
    // process each top-level set-operation branch independently — a
    // UNION ALL of grouped selects has one GROUP BY per branch
    // (agg.iq's manual GROUP_ID-equivalence unions)
    val setOp = "(?is)\\b(UNION\\s+ALL|UNION|INTERSECT|EXCEPT)\\b".r
    val topOps = setOp.findAllMatchIn(masked0).filter { m =>
      val pre = masked0.substring(0, m.start)
      pre.count(_ == '(') == pre.count(_ == ')')
    }.toSeq
    if (topOps.nonEmpty) {
      val bounds = (0 +: topOps.map(_.end)).zip(topOps.map(_.start) :+ sql.length)
      val parts = bounds.map { case (a, b) => sql.substring(a, b) }
      val ops = topOps.map(m => sql.substring(m.start, m.end))
      return parts.map(rewriteGroupingFns).zipAll(ops, "", "")
        .map { case (p, o) => p + o }.mkString
    }
    val masked = masked0
    // a grouping call inside a SUBQUERY would be lowered against the
    // wrong universe — leave those statements alone
    for (m <- "(?is)\\(\\s*(SELECT|WITH)\\b".r.findAllMatchIn(masked)) {
      val close = closeParen(masked, m.start)
      if (close > 0 && "(?is)\\bgrouping(_id)?\\s*\\(".r
          .findFirstIn(masked.substring(m.start, close)).isDefined) return sql
    }
    val gbs = "(?is)\\bGROUP\\s+BY\\s".r.findAllMatchIn(masked).filter { m =>
      val pre = masked.substring(0, m.start)
      pre.count(_ == '(') == pre.count(_ == ')')
    }.toSeq
    if (gbs.length != 1) return sql
    val gbElems = {
      val end = clauseEnd(masked, gbs.head.end)
      splitElems(sql, masked, gbs.head.end, end)
    }
    // flatten composite tuple elements — rollup(a, (b, c)) grounds b
    // and c individually (agg.iq:1116)
    val universe = gbElems.flatMap { case (t, mt) => expand(t, mt) }
      .flatten.flatMap(e => if (e.trim.startsWith("(")) cols(e) else Seq(e))
      .map(norm).toSet
    // a PLAIN GROUP BY (no CUBE/ROLLUP/GROUPING SETS element) never
    // aggregates a grouping column away: grouping(x) is the constant 0
    // for grouped x (agg.iq:731 — Spark instead rejects grouping()
    // outside grouping-sets queries), 1 for never-grouped x
    val hasSets = gbElems.exists(e =>
      "(?is)^(CUBE|ROLLUP|GROUPING\\s+SETS)\\s*\\(".r.findFirstIn(e._2).isDefined)
    // forward scan: emit processed text to `sb`, never re-scan it
    val sb = new StringBuilder
    var rest = sql
    var more = true
    while (more) {
      val m0 = maskLiterals(rest)
      "(?is)\\bgrouping(_id)?\\s*\\(".r.findFirstMatchIn(m0) match {
        case None =>
          sb.append(rest); more = false
        case Some(call) =>
          val open = m0.indexOf('(', call.start)
          val close = closeParen(m0, open)
          if (close < 0) { sb.append(rest); more = false }
          else {
            val args = splitElems(rest, m0, open + 1, close).map(_._1)
            val isId = call.group(1) != null
            def single(a: String): String =
              if (!universe.contains(norm(a))) "1"
              else if (!hasSets) "0"
              else s"grouping($a)"
            val rep =
              if (!isId && args.length == 1) single(args.head)
              else {
                val terms = args.zipWithIndex.map { case (a, ix) =>
                  val w = 1 << (args.length - 1 - ix)
                  val g = single(a)
                  if (w == 1) g else s"$g * $w"
                }
                if (terms.length == 1) terms.head
                else if (terms.forall(t => t == "0" || t.startsWith("0 ") || t.startsWith("0*") || t.startsWith("0 *"))) "0"
                else terms.mkString("(", " + ", ")")
              }
            sb.append(rest.substring(0, call.start)).append(rep)
            rest = rest.substring(close + 1)
          }
      }
    }
    havingByAlias(sb.toString)
  }

  /** Spark resolves HAVING `grouping(x)` only when x survives into the
    * aggregate's OUTPUT — with a select list of pure aggregates it
    * reports x unresolved (agg.iq:818's rollup HAVING). But HAVING over
    * an output ALIAS resolves fine, so a lowered grouping expression in
    * HAVING that textually equals a select item is replaced by the
    * item's alias (longest first, so composite grouping_id arithmetic
    * wins over the single calls inside it). */
  private def havingByAlias(sql: String): String = {
    val masked = maskLiterals(sql)
    val hv = "(?is)\\bHAVING\\b".r.findAllMatchIn(masked).filter { m =>
      val pre = masked.substring(0, m.start)
      pre.count(_ == '(') == pre.count(_ == ')')
    }.toSeq.headOption.getOrElse(return sql)
    val hvEnd = clauseEnd(masked, hv.end)
    if (!"(?is)\\bgrouping\\s*\\(".r.findFirstIn(masked.substring(hv.end, hvEnd)).isDefined)
      return sql
    val sel = "(?is)\\bSELECT\\b".r.findFirstMatchIn(masked).getOrElse(return sql)
    val from = GraftSql.topLevelIndex(masked, "FROM", sel.end)
    if (from < 0) return sql
    val items = splitElems(sql, masked, sel.end, from)
    val aliasRe = "(?is)^(.*\\S)\\s+AS\\s+(\\w+)\\s*$".r
    val pairs = items.flatMap { case (t, _) =>
      aliasRe.findFirstMatchIn(t.trim).filter(m =>
        "(?is)\\bgrouping\\s*\\(".r.findFirstIn(m.group(1)).isDefined)
        .map(m => (m.group(1).trim, m.group(2)))
    }.sortBy(-_._1.length)
    if (pairs.isEmpty) return sql
    // replace against the MASKED text with identifier-boundary anchoring:
    // an occurrence inside a string literal (masked to ) can never
    // match, and `grouping(a)` never rewrites inside `xgrouping(a)` or
    // an alias-colliding longer expression
    var having = sql.substring(hv.end, hvEnd)
    var maskedHaving = masked.substring(hv.end, hvEnd)
    def identChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'
    pairs.foreach { case (e, a) =>
      val em = maskLiterals(e)
      var i = maskedHaving.indexOf(em)
      while (i >= 0) {
        val okBefore = i == 0 ||
          !(identChar(maskedHaving(i - 1)) && identChar(em.head))
        val after = i + em.length
        val okAfter = after >= maskedHaving.length ||
          !(identChar(maskedHaving(after)) && identChar(em.last))
        // masked match only POSITIONS the candidate; the ORIGINAL text
        // must equal the expression exactly — two expressions differing
        // only in same-length literal CONTENT mask identically and must
        // not substitute for each other
        if (okBefore && okAfter && having.substring(i, after) == e) {
          having = having.substring(0, i) + a + having.substring(after)
          maskedHaving = maskedHaving.substring(0, i) + a + maskedHaving.substring(after)
          i = maskedHaving.indexOf(em, i + a.length)
        } else i = maskedHaving.indexOf(em, i + 1)
      }
    }
    sql.substring(0, hv.end) + having + sql.substring(hvEnd)
  }

  private def norm(e: String): String =
    e.trim.toLowerCase.replaceAll("\\s+", " ")

  /** GROUP_ID() (reference SqlStdOperatorTable GROUP_ID, agg.iq:783):
    * numbers duplicate occurrences of the same grouping set 0..k-1.
    * With no duplicate sets the call is the constant 0. With duplicates
    * the query lowers to a UNION ALL over the multiplicity levels —
    * copy i keeps the sets occurring more than i times and replaces
    * GROUP_ID() with literal i (exactly the reference's expansion in
    * AggregateExpandDistinctAggregatesRule's GROUP_ID lowering). The
    * trailing ORDER BY moves outside the union. GROUP_ID() outside an
    * aggregate query stays unresolved so the analyzer rejects it, as
    * the reference's validator does (agg.iq:1060). */
  private def rewriteGroupId(sql: String): String = {
    val masked = maskLiterals(sql)
    val gidRe = "(?is)\\bgroup_id\\s*\\(\\s*\\)".r
    if (gidRe.findFirstIn(masked).isEmpty) return sql
    // only the statement's own (paren-depth-0) GROUP BY defines the
    // grouping sets GROUP_ID numbers; a subquery's clause must not bind
    val topGbs = "(?is)\\bGROUP\\s+BY\\s".r.findAllMatchIn(masked).filter { m =>
      val pre = masked.substring(0, m.start)
      pre.count(_ == '(') == pre.count(_ == ')')
    }.toSeq
    if (topGbs.length > 1) return sql
    val gb = topGbs.headOption match {
      case Some(m) => m
      case None =>
        // aggregate query without GROUP BY → one global group, id 0;
        // non-aggregate → leave unresolved (validator error contract).
        // The replacement keeps the query an AGGREGATE query
        // (agg.iq:1089: GROUP BY () over empty input must still emit
        // its one global group) — a bare literal 0 would demote it.
        val isAgg = "(?is)\\b(sum|count|avg|min|max|stddev|var_pop|var_samp|every|some)\\s*\\(".r
          .findFirstIn(masked).isDefined
        return if (isAgg) gidRe.replaceAllIn(sql, "coalesce(min(0), 0)") else sql
    }
    val end = clauseEnd(masked, gb.end)
    val elems = splitElems(sql, masked, gb.end, end)
    val tuples = elems.map { case (t, mt) => expand(t, mt) }
      .foldLeft(Seq(Seq.empty[String])) { (acc, sets) =>
        for (a <- acc; b <- sets) yield a ++ b
      }
    // multiplicity by column SET (the reference keys duplicates by the
    // group's bitmap, not the tuple order)
    val byKey = scala.collection.mutable.LinkedHashMap.empty[Set[String], (Seq[String], Int)]
    tuples.foreach { tup =>
      val k = tup.map(norm).distinct.toSet
      byKey(k) = byKey.get(k).map { case (t, n) => (t, n + 1) }.getOrElse((tup, 1))
    }
    val maxMult = byKey.values.map(_._2).max
    if (maxMult == 1) return gidRe.replaceAllIn(sql, "coalesce(min(0), 0)")
    // trailing top-level ORDER BY moves outside the UNION ALL
    val ob = "(?is)\\bORDER\\s+BY\\s".r.findAllMatchIn(masked)
      .filter(m => masked.substring(0, m.start).count(_ == '(') ==
        masked.substring(0, m.start).count(_ == ')'))
      .toSeq.lastOption
    val (body, orderTxt) = ob match {
      case Some(o) => (sql.substring(0, o.start), " " + sql.substring(o.start).trim)
      case None => (sql, "")
    }
    val allCols = tuples.flatten.map(c => norm(c) -> c).toMap
    val branches = (0 until maxMult).map { i =>
      val kept = byKey.values.filter(_._2 > i).map(_._1).toSeq
      val sets = kept.map(t => if (t.isEmpty) "()" else t.mkString("(", ", ", ")"))
      val gbTxt = "GROUP BY GROUPING SETS (" + sets.mkString(", ") + ") "
      val b0 = body.substring(0, gb.start) + gbTxt +
        body.substring(math.min(end, body.length))
      val b1 = gidRe.replaceAllIn(b0, i.toString)
      // the branch is a single-GROUP-BY statement again: lower its
      // grouping()/grouping_id() calls against the BRANCH's universe
      // (columns of the full query that this branch never groups are
      // aggregated on every row → constant 1)
      val b2 = rewriteGroupingFns(b1)
      // select-list references to columns this branch never groups are
      // NULL in every row of the branch (the reference's expansion)
      val branchCols = kept.flatten.map(norm).toSet
      val missing = (allCols.keySet -- branchCols).toSeq.map(allCols)
      nullOutMissing(b2, missing)
    }
    branches.mkString("\nUNION ALL\n") + orderTxt
  }

  /** Replace whole select items that are exactly one of `missing` with
    * NULL (keeping the alias, or aliasing a simple identifier by its
    * own name so the union keeps branch-0 column names). */
  private def nullOutMissing(branch: String, missing: Seq[String]): String = {
    if (missing.isEmpty) return branch
    val missingNorm = missing.map(norm).toSet
    val m0 = maskLiterals(branch)
    val sel = "(?is)^\\s*SELECT\\s".r.findFirstMatchIn(m0).getOrElse(return branch)
    var i = sel.end
    var depth = 0
    var from = -1
    while (i < m0.length && from < 0) {
      val c = m0.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && (c == 'F' || c == 'f') &&
          m0.regionMatches(true, i, "FROM", 0, 4) &&
          !m0.charAt(i - 1).isLetterOrDigit &&
          (i + 4 >= m0.length || !m0.charAt(i + 4).isLetterOrDigit)) from = i
      i += 1
    }
    if (from < 0) return branch
    val items = splitElems(branch, m0, sel.end, from)
    val rebuilt = items.map { case (txt, _) =>
      val asM = "(?is)\\s+as\\s+([A-Za-z_]\\w*)\\s*$".r.findFirstMatchIn(txt)
      val exprTxt = asM.map(a => txt.substring(0, a.start)).getOrElse(txt)
      if (missingNorm.contains(norm(exprTxt)))
        "NULL" + asM.map(a => txt.substring(a.start)).getOrElse {
          val t = exprTxt.trim
          if ("^[A-Za-z_][\\w.]*$".r.matches(t)) " AS " + t.split('.').last else ""
        }
      else txt
    }
    branch.substring(0, sel.end) + rebuilt.mkString(", ") + " " + branch.substring(from)
  }

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
          val next =
            sql.substring(0, open + 1) + spliced.mkString(", ") + sql.substring(close)
          // a GROUPING SETS nested inside a tuple ELEMENT is only
          // detected, never spliced (splicing is top-level) — recursing
          // on identical text would loop to StackOverflow; stop and let
          // the parser report it
          return if (next == sql) sql else flattenNested(next)
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
