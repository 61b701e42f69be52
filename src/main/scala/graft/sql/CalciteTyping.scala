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

  def rewrite(sql: String): String = {
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
}
