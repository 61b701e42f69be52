package graft.sql

import scala.util.chaining._

import GraftSql.{closeParen, maskLiterals}

/** Conformance-dialect adapter for the reference's AVG-family return
  * types (RelDataTypeSystemImpl.deriveAvgAggType — the result keeps
  * the ARGUMENT type, truncating toward zero): each matching aggregate
  * call is wrapped in `agg_typed(<call>, max(<first arg>))`, whose
  * RuntimeReplaceable (functions/AggTyped.scala) re-types the result to
  * the sample's analyzed type and drops the sample.
  *
  * Applied by the conformance harness ONLY (CorpusSpec.clean — like its
  * UNPIVOT label casing): the PRODUCT surface keeps Spark's own wider
  * derivations, a deliberate divergence pinned in DecimalTypeSystemSpec.
  *
  * Window forms carry their OVER clause onto the sample
  * (`agg_typed(avg(x) OVER w, max(x) OVER w)`); DISTINCT qualifiers are
  * stripped from the sample (type-only). */
object CalciteTyping {

  private val fns =
    "avg|var_pop|var_samp|variance|stddev|stddev_pop|stddev_samp|" +
      "covar_pop|covar_samp|regr_sxx|regr_syy"

  def rewrite(sql0: String): String = {
    val sql = decomposeIntVariance(intLitDiv(anyValueAsMax(sql0)))
    val masked = maskLiterals(sql)
    // measure statements restructure through MeasureSql — the wrapper's
    // sample would reference columns outside the measure's context
    if ("(?i)\\bMEASURE\\b|\\bAGGREGATE\\s*\\(".r.findFirstIn(masked).isDefined) return sql
    val re = ("(?i)\\b(" + fns + ")\\s*\\(").r
    for (m <- re.findAllMatchIn(masked)) {
      // an already-wrapped call (agg_typed(avg(...)) is preceded by '(')
      val prevWordOk = {
        val before = masked.substring(0, m.start)
        !"(?is).*\\bagg_typed\\s*\\($".r.matches(before)
      }
      val open = masked.indexOf('(', m.start)
      val close = closeParen(masked, open)
      if (prevWordOk && close > 0) {
        val argsOrig = sql.substring(open + 1, close)
        // sample: the first argument (DISTINCT stripped); two-argument
        // COVAR/REGR derive the LEAST RESTRICTIVE of both argument
        // types (CALCITE-7696) — their sample SUMS the operands, whose
        // arithmetic derivation is exactly the wider type
        val lens = GraftSql.splitTopLevel(masked.substring(open + 1, close)).map(_.length)
        val starts = lens.scanLeft(0)((a, b) => a + b + 1).init
        val args = starts.zip(lens).map { case (st, n) => argsOrig.substring(st, st + n).trim }
        val first = args.head.replaceAll("(?is)^(DISTINCT|ALL)\\s+", "")
          .pipe(f => if (args.length > 1) s"($f) + (${args(1)})" else f)
        // optional FILTER (...) and OVER (...)|OVER w suffixes
        var end = close + 1
        val filt = "(?is)^\\s*FILTER\\s*\\(".r.findFirstMatchIn(masked.substring(end))
        filt.foreach { fm =>
          val fc = closeParen(masked, end + fm.end - 1)
          if (fc > 0) end = fc + 1
        }
        var overTxt = ""
        val over = "(?is)^\\s*OVER\\s*(\\(|[A-Za-z_]\\w*)".r.findFirstMatchIn(masked.substring(end))
        over.foreach { om =>
          if (om.group(1) == "(") {
            val oc = closeParen(masked, end + om.end - 1)
            if (oc > 0) { overTxt = " " + sql.substring(end + om.start, oc + 1).trim; end = oc + 1 }
          } else { overTxt = " " + sql.substring(end + om.start, end + om.end).trim; end = end + om.end }
        }
        // WITHIN DISTINCT forms lower through WithinDistinctSql (their
        // SUM/AVG compute in DOUBLE; re-typing would break the parse)
        if ("(?is)^\\s*WITHIN\\s+DISTINCT\\b".r.findFirstIn(masked.substring(end)).isEmpty) {
          val call = sql.substring(m.start, end)
          val sample = s"max($first)$overTxt"
          return rewrite(sql.substring(0, m.start) +
            s"agg_typed($call, $sample)" + sql.substring(end))
        }
      }
    }
    sql
  }

  /** Integer-literal division: the reference computes SQL-standard
    * integer semantics (1/2 = 0, truncating toward zero — misc.iq:2435,
    * unsigned.iq:142); Spark's `/` is always fractional. Literal/literal
    * only — typed-column division keeps Spark's product semantics. */
  private def intLitDiv(sql: String): String = {
    val s1 = GraftSql.replaceMasked(sql,
      "(?<![\\w.'])(-?\\d+)\\s*/\\s*(-?\\d+)(?![\\w.])".r) { (m, orig) =>
      s"DIV(${GraftSql.origGroup(m, orig, 1)}, ${GraftSql.origGroup(m, orig, 2)})"
    }
    // bare-identifier operands (misc.iq:2435 — X/Y over INT columns):
    // branch on the RUNTIME type, so float columns keep fractional `/`.
    // The DIV branch CASTs its operands so it still ANALYZES when the
    // runtime type turns out fractional (pi DIV 2 would not type-check);
    // `interval (expr) unit` stays untouched — its parser needs the
    // plain division text.
    GraftSql.replaceMasked(s1,
      "(?<![\\w.'])([A-Za-z_]\\w*|\\d+)\\s*/\\s*([A-Za-z_]\\w*|\\d+)(?![\\w.(])".r) { (m, orig) =>
      val a = GraftSql.origGroup(m, orig, 1)
      val b = GraftSql.origGroup(m, orig, 2)
      val before = orig.substring(0, m.start)
      if ("(?is).*\\binterval\\s*\\(\\s*$".r.matches(before)) m.matched
      else {
        val ints = "('tinyint', 'smallint', 'int', 'bigint')"
        s"(CASE WHEN typeof($a) IN $ints AND typeof($b) IN $ints " +
          s"THEN CAST((CAST($a AS BIGINT) DIV CAST($b AS BIGINT)) AS DOUBLE) " +
          s"ELSE ($a / $b) END)"
      }
    }
  }

  /** The reference decomposes variance/stddev over INTEGER arguments
    * with INTEGER division at every step (AggregateReduceFunctionsRule:
    * var_pop = (Σx² − (Σx)² DIV n) DIV n; agg.iq:225 records var_pop =
    * 289 where the exact value is 288.9). Reproduced with a runtime
    * type branch — `typeof(max(x))` picks the integer-decomposed or the
    * native float computation — so DECIMAL/DOUBLE arguments keep their
    * exact math. FILTER and OVER suffixes ride every inner aggregate.
    * Conformance dialect only (like the rest of this adapter). */
  private def decomposeIntVariance(sql: String): String = {
    val masked = maskLiterals(sql)
    val re = ("(?i)\\b(var_pop|var_samp|variance|stddev|stddev_pop|stddev_samp|" +
      "covar_pop|covar_samp|regr_sxx|regr_syy)\\s*\\(").r
    for (m <- re.findAllMatchIn(masked)) {
      val fn = m.group(1).toLowerCase(java.util.Locale.ROOT)
      val open = masked.indexOf('(', m.start)
      val close = closeParen(masked, open)
      // our own emission puts the native call right after "ELSE CAST(",
      // and the main agg_typed pass may later wrap it — skip both on
      // the recursion re-scans
      val already = "(?is).*(ELSE\\s+CAST|agg_typed)\\s*\\($".r
        .matches(masked.substring(0, m.start))
      if (close > 0 && !already) {
        val arg0 = sql.substring(open + 1, close).trim
        if (!"(?is)^(DISTINCT|ALL)\\s".r.findFirstIn(arg0).isDefined) {
          // optional FILTER (...) and OVER (...)|OVER w suffixes
          var end = close + 1
          var filterTxt = ""
          val filt = "(?is)^\\s*FILTER\\s*\\(".r.findFirstMatchIn(masked.substring(end))
          filt.foreach { fm2 =>
            val fc = closeParen(masked, end + fm2.end - 1)
            if (fc > 0) { filterTxt = " " + sql.substring(end + fm2.start, fc + 1).trim; end = fc + 1 }
          }
          var overTxt = ""
          val over = "(?is)^\\s*OVER\\s*(\\(|[A-Za-z_]\\w*)".r.findFirstMatchIn(masked.substring(end))
          over.foreach { om =>
            if (om.group(1) == "(") {
              val oc = closeParen(masked, end + om.end - 1)
              if (oc > 0) { overTxt = " " + sql.substring(end + om.start, oc + 1).trim; end = oc + 1 }
            } else { overTxt = " " + sql.substring(end + om.start, end + om.end).trim; end = end + om.end }
          }
          val twoArg = Set("covar_pop", "covar_samp", "regr_sxx", "regr_syy")(fn)
          val args = GraftSql.splitTopLevel(masked.substring(open + 1, close))
            .map(_.length)
            .scanLeft(0)((acc, l) => acc + l + 1).init
            .zip(GraftSql.splitTopLevel(masked.substring(open + 1, close)).map(_.length))
            .map { case (st, n2) => sql.substring(open + 1 + st, open + 1 + st + n2).trim }
          // EXCLUDE-framed windows lower through ExcludeFrameSql, whose
          // parser reads the NATIVE call — don't decompose under them
          if ("(?is)^\\s*WITHIN\\s+DISTINCT\\b".r.findFirstIn(masked.substring(end)).isEmpty &&
              "(?i)\\bEXCLUDE\\b".r.findFirstIn(overTxt).isEmpty &&
              (!twoArg || args.length == 2) && (twoArg || args.length == 1)) {
            def agg(e: String) = s"$e$filterTxt$overTxt"
            val (intExpr, typeCond, sample) =
              if (!twoArg) {
                val a = s"CAST(($arg0) AS BIGINT)"
                val sx = agg(s"sum($a * $a)")
                val s1 = agg(s"sum($a)")
                val n = agg(s"count(($arg0))")
                // NULLIF divisors: an empty (FILTERed-out) group answers
                // NULL, like the native aggregate — not DIVIDE_BY_ZERO
                val popDiv = s"(($sx - (($s1 * $s1) DIV NULLIF($n, 0))) DIV NULLIF($n, 0))"
                val sampDiv = s"(($sx - (($s1 * $s1) DIV NULLIF($n, 0))) DIV NULLIF($n - 1, 0))"
                val e = fn match {
                  case "var_pop" => popDiv
                  case "var_samp" | "variance" => sampDiv
                  case "stddev_pop" => s"sqrt(CAST($popDiv AS DOUBLE))"
                  case _ => s"sqrt(CAST($sampDiv AS DOUBLE))"
                }
                (e,
                  s"typeof(${agg(s"max(($arg0))")}) IN ('tinyint', 'smallint', 'int', 'bigint')",
                  agg(s"max(($arg0))"))
              } else {
                // pair-filtered sums: both operands non-null, like the
                // native two-arg aggregates
                val (x, y) = (args(0), args(1))
                val ok = s"(($x) IS NOT NULL AND ($y) IS NOT NULL)"
                def p(e: String) = s"CASE WHEN $ok THEN $e END"
                val xi = s"CAST(($x) AS BIGINT)"
                val yi = s"CAST(($y) AS BIGINT)"
                val n = agg(s"count(${p("1")})")
                val sxy = agg(s"sum(${p(s"$xi * $yi")})")
                val sxp = agg(s"sum(${p(xi)})")
                val syp = agg(s"sum(${p(yi)})")
                val sxx = agg(s"sum(${p(s"$xi * $xi")})")
                val syy = agg(s"sum(${p(s"$yi * $yi")})")
                val e = fn match {
                  case "covar_pop" =>
                    s"((($sxy - (($sxp * $syp) DIV NULLIF($n, 0))) DIV NULLIF($n, 0)))"
                  case "covar_samp" =>
                    s"((($sxy - (($sxp * $syp) DIV NULLIF($n, 0))) DIV NULLIF($n - 1, 0)))"
                  // REGR_SXX(e1, e2) = n·var_pop(e2) (the INDEPENDENT,
                  // second operand — winagg.iq:899 pins 66 from deptno);
                  // REGR_SYY(e1, e2) = n·var_pop(e1)
                  case "regr_sxx" =>
                    s"($n * (($syy - (($syp * $syp) DIV NULLIF($n, 0))) DIV NULLIF($n, 0)))"
                  case _ =>
                    s"($n * (($sxx - (($sxp * $sxp) DIV NULLIF($n, 0))) DIV NULLIF($n, 0)))"
                }
                (e,
                  s"typeof(${agg(s"max(($x))")}) IN ('tinyint', 'smallint', 'int', 'bigint') AND " +
                    s"typeof(${agg(s"max(($y))")}) IN ('tinyint', 'smallint', 'int', 'bigint')",
                  agg(s"max((($x)) + (($y)))"))
              }
            val native =
              if (twoArg) agg(s"$fn($arg0)") else agg(s"$fn(($arg0))")
            val branch = s"(CASE WHEN $typeCond " +
              s"THEN CAST($intExpr AS DOUBLE) ELSE CAST($native AS DOUBLE) END)"
            return decomposeIntVariance(
              sql.substring(0, m.start) + s"agg_typed($branch, $sample)" +
                sql.substring(end))
          }
        }
      }
    }
    sql
  }

  /** Aggregate ANY_VALUE computes as MAX in the reference's enumerable
    * engine (same device as SqlByRewriter's implicit aggregate;
    * agg.iq:2899) — a conformance-dialect substitution only: the
    * product keeps Spark's own any_value, which also works on
    * non-orderable types (MAP, VARIANT — CALCITE-4813, blank.iq:160)
    * and with IGNORE NULLS, both of which max() rejects. Windowed and
    * IGNORE/RESPECT NULLS forms are left alone here too. */
  private def anyValueAsMax(sql: String): String = {
    val masked = maskLiterals(sql)
    "(?i)\\bANY_VALUE\\s*\\(".r.findAllMatchIn(masked).collectFirst {
      case m if {
        val close = closeParen(masked, masked.indexOf('(', m.start))
        close > 0 &&
          "(?is)^\\s*(OVER|IGNORE\\s+NULLS|RESPECT\\s+NULLS)\\b".r
            .findFirstIn(masked.substring(close + 1)).isEmpty
      } => anyValueAsMax(sql.substring(0, m.start) + "max(" +
        sql.substring(masked.indexOf('(', m.start) + 1))
    }.getOrElse(sql)
  }
}
