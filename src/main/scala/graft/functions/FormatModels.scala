package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Format models (ref: util/format/FormatModels.java; consumed by
  * TO_CHAR, TO_DATE, PARSE_x, FORMAT_x in sql/fun/SqlLibraryOperators
  * .java:2002-2129): translation of Oracle datetime tokens and
  * BigQuery/strftime %-tokens into Java `DateTimeFormatter` patterns —
  * done once at plan time on the literal format, so the runtime
  * expression is a plain codegen'd `date_format`/`to_timestamp` — plus
  * an Oracle numeric edit mask (9/0/,/./FM) renderer.
  *
  * Deviations (documented): name tokens (MON/DY) render Java-style
  * capitalization ('Jan'/'Sat') regardless of token case; the numeric
  * mask subset is 9 0 , . FM (no currency/EEEE/RN).
  */
object FormatModels {

  /** Oracle datetime format tokens, longest-match-first. */
  private val oraTokens: Seq[(String, String)] = Seq(
    "HH24" -> "HH", "HH12" -> "hh", "SSSSS" -> "", // SSSSS unsupported
    "YYYY" -> "yyyy", "RRRR" -> "yyyy", "MONTH" -> "MMMM",
    "MON" -> "MMM", "DAY" -> "EEEE", "FF9" -> "SSSSSSSSS",
    "FF6" -> "SSSSSS", "FF3" -> "SSS", "DDD" -> "DDD",
    "YY" -> "yy", "MM" -> "MM", "DD" -> "dd", "DY" -> "EEE",
    "HH" -> "hh", "MI" -> "mm", "SS" -> "ss", "AM" -> "a",
    "PM" -> "a", "TZH" -> "x", "Q" -> "Q", "IW" -> "ww",
    "J" -> "g")

  /** BigQuery / strftime %-tokens. */
  private val bqTokens: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd", 'e' -> "d",
    'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss", 'f' -> "SSSSSS",
    'j' -> "DDD", 'b' -> "MMM", 'B' -> "MMMM", 'a' -> "EEE",
    'A' -> "EEEE", 'p' -> "a", 'Q' -> "Q", 'V' -> "ww", 'u' -> "e",
    '%' -> "%")

  /** Oracle datetime format → Java pattern. Unknown letter runs are
    * single-quoted (Java treats bare letters as pattern chars). */
  def ora2java(fmt: String): String = {
    val out = new StringBuilder
    var i = 0
    val up = fmt.toUpperCase
    while (i < fmt.length) {
      oraTokens.find { case (tok, _) => up.startsWith(tok, i) } match {
        case Some((tok, java)) => out.append(java); i += tok.length
        case None =>
          val c = fmt.charAt(i)
          if (c.isLetter) out.append('\'').append(c).append('\'')
          else out.append(c)
          i += 1
      }
    }
    out.toString
  }

  /** BigQuery %-format → Java pattern. */
  def bq2java(fmt: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        out.append(bqTokens.getOrElse(fmt.charAt(i + 1),
          throw new IllegalArgumentException(s"unsupported token %${fmt.charAt(i + 1)}")))
        i += 2
      } else {
        if (c.isLetter) out.append('\'').append(c).append('\'') else out.append(c)
        i += 1
      }
    }
    out.toString
  }

  /** Oracle numeric edit mask: 9 = optional digit, 0 = forced digit,
    * ',' = grouping, '.' = decimal point, FM prefix = no padding and
    * trailing-9 zero trim. Non-FM output is right-justified to
    * mask-width + 1 (the sign slot), as Oracle does. Overflow → '#'s. */
  def fmtNum(v: java.math.BigDecimal, mask: String): String = {
    val fm = mask.startsWith("FM")
    val m = if (fm) mask.substring(2) else mask
    val dot = m.indexOf('.')
    val intMask = if (dot < 0) m else m.substring(0, dot)
    val fracMask = if (dot < 0) "" else m.substring(dot + 1)
    val neg = v.signum() < 0
    val abs = v.abs.setScale(fracMask.length, java.math.RoundingMode.HALF_UP)
    val intDigits = abs.toBigInteger.toString
    val intSlots = intMask.count(c => c == '9' || c == '0')
    if (intDigits.length > intSlots && !(intDigits == "0" && intSlots == 0))
      return "#" * (m.length + 1)
    val firstZero = intMask.indexOf('0')
    val minInt = if (firstZero < 0) 0 else intSlots - intMask.substring(0, firstZero).count(c => c == '9' || c == '0')
    // a bare zero integer part is suppressed only when a fraction
    // follows ('.5' style); to_char(0, '9999') renders '    0'
    val padded =
      if (intDigits == "0" && minInt == 0 && fracMask.nonEmpty) ""
      else ("0" * math.max(0, minInt - intDigits.length)) + intDigits
    // walk the int mask right-to-left laying digits and grouping commas
    val sb = new StringBuilder
    var di = padded.length - 1
    var mi = intMask.length - 1
    while (mi >= 0 && di >= 0) {
      intMask.charAt(mi) match {
        case '9' | '0' => sb.append(padded.charAt(di)); di -= 1
        case ',' => if (di >= 0) sb.append(',')
        case c => sb.append(c)
      }
      mi -= 1
    }
    val intStr = sb.reverse.toString
    var fracStr =
      if (fracMask.isEmpty) ""
      else abs.toPlainString.dropWhile(_ != '.') // ".dd"
    if (fm && fracStr.nonEmpty) {
      // trim zeros in trailing '9' positions (keep '0'-forced digits)
      val lastForced = fracMask.lastIndexOf('0')
      val keep = lastForced + 2 // '.' + digits through the last forced slot
      while (fracStr.length > math.max(keep, 1) && fracStr.endsWith("0"))
        fracStr = fracStr.dropRight(1)
      if (fracStr == ".") fracStr = ""
    }
    val body = (if (neg) "-" else "") + intStr + fracStr
    if (fm) body
    else {
      val width = m.length + 1 // sign slot
      (" " * math.max(0, width - body.length)) + body
    }
  }

  def fmtNum(v: Double, mask: String): String =
    fmtNum(java.math.BigDecimal.valueOf(v), mask)
  def fmtNum(v: Long, mask: String): String =
    fmtNum(java.math.BigDecimal.valueOf(v), mask)

  // ---- Column API (format is a literal, translated at plan time) ----

  /** TO_CHAR(datetime, oracleFmt). */
  def to_char(c: Column, oraFmt: String): Column = date_format(c, ora2java(oraFmt))
  /** TO_DATE(string, oracleFmt). */
  def to_date_ora(c: Column, oraFmt: String): Column = to_date(c, ora2java(oraFmt))
  /** TO_TIMESTAMP(string, oracleFmt). */
  def to_timestamp_ora(c: Column, oraFmt: String): Column = to_timestamp(c, ora2java(oraFmt))
  /** BigQuery FORMAT_DATE/FORMAT_TIMESTAMP('%Y-%m-%d', x). */
  def format_bq(fmt: String, c: Column): Column = date_format(c, bq2java(fmt))
  /** BigQuery PARSE_TIMESTAMP('%Y-%m-%d', s). */
  def parse_timestamp_bq(fmt: String, c: Column): Column = to_timestamp(c, bq2java(fmt))
  /** BigQuery PARSE_DATE('%Y-%m-%d', s). */
  def parse_date_bq(fmt: String, c: Column): Column = to_date(c, bq2java(fmt))

  /** TO_CHAR(number, mask) — runtime mask renderer (scalar UDF; not on
    * the codegen path, acceptable for an output-formatting function). */
  def to_char_num(c: Column, mask: String): Column =
    numUdf(c.cast(org.apache.spark.sql.types.DecimalType(30, 8)), lit(mask))

  private lazy val numUdf =
    udf((v: java.math.BigDecimal, mask: String) =>
      if (v == null) null else fmtNum(v, mask))

  /** SQL registration: TO_CHAR dispatches numeric vs datetime on the
    * shape of the literal mask (digit masks have no letters). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("to_char_num",
      (v: java.math.BigDecimal, mask: String) => if (v == null) null else fmtNum(v, mask))
  }
}
