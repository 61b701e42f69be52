package graft.functions

import java.time.{LocalDate, LocalDateTime, ZoneOffset}
import java.time.temporal.IsoFields
import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PostgreSQL datetime format models — TO_CHAR / TO_TIMESTAMP / TO_DATE
  * (ref: the babel module's PostgreSQL dialect; Calcite implements the
  * same engine in util/format/PostgresqlDateTimeFormatter and the
  * TO_CHAR_PG / TO_TIMESTAMP_PG / TO_DATE_PG operators; conformance
  * corpus babel/src/test/resources/sql/postgresql.iq exercises every
  * token). Pure JVM via StaticInvoke — no UDF wrapping.
  *
  * PG rules honored: case-variant word tokens render in the pattern's
  * case (MONTH/Month/month); two-digit-ish year forms resolve nearest
  * to 2020 on parse; CC combines with YY ((CC-1)*100 + YY) and alone
  * means century start; J is the Julian day; ISO fields (IYYY/IW/ID/
  * IDDD) reconstruct week-dates; parse defaults are 0001-01-01
  * 00:00:00. FM (fill mode) is consumed — the padding it suppresses is
  * insignificant to the value.
  */
object PgDateTime {

  private val monthsU = Array("JANUARY", "FEBRUARY", "MARCH", "APRIL", "MAY", "JUNE",
    "JULY", "AUGUST", "SEPTEMBER", "OCTOBER", "NOVEMBER", "DECEMBER")
  private val daysU = Array("MONDAY", "TUESDAY", "WEDNESDAY", "THURSDAY", "FRIDAY",
    "SATURDAY", "SUNDAY") // index 0 = ISO day 1
  private val roman = Array("I", "II", "III", "IV", "V", "VI", "VII", "VIII", "IX", "X", "XI", "XII")

  /** Longest-first token table; matching is CASE-SENSITIVE because the
    * pattern's case drives the output case. */
  private val tokens: Seq[String] = Seq(
    "A.M.", "P.M.", "a.m.", "p.m.", "B.C.", "A.D.", "b.c.", "a.d.",
    "HH24", "HH12", "SSSSS", "SSSS", "IDDD", "IYYY", "Y,YYY", "YYYY",
    "MONTH", "Month", "month", "FF1", "FF2", "FF3", "FF4", "FF5", "FF6",
    "DAY", "Day", "day", "DDD", "IYY", "YYY", "MON", "Mon", "mon",
    "DY", "Dy", "dy", "HH", "MI", "MS", "US", "SS", "AM", "PM", "am", "pm",
    "BC", "AD", "bc", "ad", "YY", "IY", "MM", "DD", "ID", "WW", "IW",
    "CC", "RM", "rm", "Y", "I", "D", "W", "J", "Q")

  private sealed trait Tok
  private final case class Lit(c: Char) extends Tok
  private final case class Field(name: String) extends Tok

  private def lex(fmt: String): Seq[Tok] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Tok]
    var i = 0
    while (i < fmt.length) {
      if (fmt.regionMatches(i, "FM", 0, 2) || fmt.regionMatches(i, "fm", 0, 2)) i += 2
      else tokens.find(t => fmt.regionMatches(i, t, 0, t.length)) match {
        case Some(t) => out += Field(t); i += t.length
        case None => out += Lit(fmt.charAt(i)); i += 1
      }
    }
    out.toSeq
  }

  private def cased(value: String, pattern: String): String =
    if (pattern.head.isUpper && pattern.length > 1 && pattern(1).isLower)
      value.substring(0, 1).toUpperCase(Locale.ROOT) + value.substring(1).toLowerCase(Locale.ROOT)
    else if (pattern.head.isUpper) value.toUpperCase(Locale.ROOT)
    else value.toLowerCase(Locale.ROOT)

  // ---- format -----------------------------------------------------------

  def format(micros: Long, fmt: UTF8String): UTF8String = {
    val ldt = LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), (Math.floorMod(micros, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
    val d = ldt.toLocalDate
    val us = ldt.getNano / 1000
    def p(v: Long, w: Int) = s"%0${w}d".format(v)
    val sb = new StringBuilder
    lex(fmt.toString).foreach {
      case Lit(c) => sb.append(c)
      case Field(f) => sb.append(f match {
        case "HH24" => p(ldt.getHour.toLong, 2)
        case "HH12" | "HH" => p((if (ldt.getHour % 12 == 0) 12 else ldt.getHour % 12).toLong, 2)
        case "MI" => p(ldt.getMinute.toLong, 2)
        case "SS" => p(ldt.getSecond.toLong, 2)
        case "MS" => p(us / 1000L, 3)
        case "US" => p(us.toLong, 6)
        case "FF1" | "FF2" | "FF3" | "FF4" | "FF5" | "FF6" =>
          p(us.toLong, 6).substring(0, f.charAt(2) - '0')
        case "SSSS" | "SSSSS" => ldt.toLocalTime.toSecondOfDay.toString
        case "AM" | "PM" => if (ldt.getHour < 12) "AM" else "PM"
        case "am" | "pm" => if (ldt.getHour < 12) "am" else "pm"
        case "A.M." | "P.M." => if (ldt.getHour < 12) "A.M." else "P.M."
        case "a.m." | "p.m." => if (ldt.getHour < 12) "a.m." else "p.m."
        case "BC" | "AD" => if (d.getYear > 0) "AD" else "BC"
        case "bc" | "ad" => if (d.getYear > 0) "ad" else "bc"
        case "B.C." | "A.D." => if (d.getYear > 0) "A.D." else "B.C."
        case "b.c." | "a.d." => if (d.getYear > 0) "a.d." else "b.c."
        case "Y,YYY" => val y = p(d.getYear.toLong, 4); y.dropRight(3) + "," + y.takeRight(3)
        case "YYYY" => p(d.getYear.toLong, 4)
        case "YYY" => p(d.getYear.toLong, 4).takeRight(3)
        case "YY" => p(d.getYear.toLong, 4).takeRight(2)
        case "Y" => p(d.getYear.toLong, 4).takeRight(1)
        case "IYYY" => p(d.get(IsoFields.WEEK_BASED_YEAR).toLong, 4)
        case "IYY" => p(d.get(IsoFields.WEEK_BASED_YEAR).toLong, 4).takeRight(3)
        case "IY" => p(d.get(IsoFields.WEEK_BASED_YEAR).toLong, 4).takeRight(2)
        case "I" => p(d.get(IsoFields.WEEK_BASED_YEAR).toLong, 4).takeRight(1)
        case "MONTH" | "Month" | "month" => cased(monthsU(d.getMonthValue - 1), f)
        case "MON" | "Mon" | "mon" => cased(monthsU(d.getMonthValue - 1).substring(0, 3), f)
        case "MM" => p(d.getMonthValue.toLong, 2)
        case "DAY" | "Day" | "day" => cased(daysU(d.getDayOfWeek.getValue - 1), f)
        case "DY" | "Dy" | "dy" => cased(daysU(d.getDayOfWeek.getValue - 1).substring(0, 3), f)
        case "IDDD" => p(((d.get(IsoFields.WEEK_OF_WEEK_BASED_YEAR) - 1) * 7 +
          d.getDayOfWeek.getValue).toLong, 3)
        case "DDD" => p(d.getDayOfYear.toLong, 3)
        case "DD" => p(d.getDayOfMonth.toLong, 2)
        case "ID" => d.getDayOfWeek.getValue.toString
        case "D" => (d.getDayOfWeek.getValue % 7 + 1).toString // Sunday = 1
        case "WW" => ((d.getDayOfYear - 1) / 7 + 1).toString
        case "IW" => p(d.get(IsoFields.WEEK_OF_WEEK_BASED_YEAR).toLong, 2)
        case "W" => ((d.getDayOfMonth - 1) / 7 + 1).toString
        case "CC" => ((d.getYear + 99) / 100).toString
        case "J" => (d.toEpochDay + 2440588L).toString
        case "Q" => ((d.getMonthValue - 1) / 3 + 1).toString
        case "RM" | "rm" => cased(roman(d.getMonthValue - 1), f)
        case other => other
      })
    }
    UTF8String.fromString(sb.toString)
  }

  // ---- parse ------------------------------------------------------------

  /** PG partial-year completion (CompiledDateTimeFormat.java:265-300):
    * YYY is years-in-millennia (<520 → +2000, else +1000: 987 → 1987),
    * YY/Y are years-in-century (<70 → +2000, <100 → +1900: 1 → 2001,
    * 87 → 1987), YYYY is always literal ('1' → year 1). */
  private def milleniaAdj(v: Int): Int = if (v >= 1000) v else if (v < 520) v + 2000 else v + 1000
  private def centuryAdj(v: Int): Int = if (v >= 100) v else if (v < 70) v + 2000 else v + 1900

  def parseMicros(s: UTF8String, fmt: UTF8String): Long = {
    val ldt = parseLdt(s.toString.trim, fmt.toString)
    ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
  }

  def parseDays(s: UTF8String, fmt: UTF8String): Int =
    parseLdt(s.toString.trim, fmt.toString).toLocalDate.toEpochDay.toInt

  private def parseLdt(input: String, fmt: String): LocalDateTime = {
    var pos = 0
    val f = scala.collection.mutable.Map.empty[String, Int]
    def digits(maxW: Int): Int = {
      val start = pos
      while (pos < input.length && pos - start < maxW && input.charAt(pos).isDigit) pos += 1
      require(pos > start, s"PG parse: digits expected at $start in '$input'")
      input.substring(start, pos).toInt
    }
    def word(): String = {
      val start = pos
      while (pos < input.length && input.charAt(pos).isLetter) pos += 1
      input.substring(start, pos)
    }
    lex(fmt).foreach {
      case Lit(_) => if (pos < input.length && !input.charAt(pos).isLetterOrDigit) pos += 1
      case Field(t) => t match {
        case "HH24" => f("hour") = digits(2)
        case "HH12" | "HH" => f("hour12") = digits(2)
        case "MI" => f("minute") = digits(2)
        case "SS" => f("second") = digits(2)
        case "MS" => f("micros") = digits(3) * 1000
        case "US" => f("micros") = digits(6)
        case "FF1" | "FF2" | "FF3" | "FF4" | "FF5" | "FF6" =>
          val w = t.charAt(2) - '0'
          val start = pos
          val v = digits(w)
          f("micros") = (v * math.pow(10, 6 - (pos - start))).toInt
        case "SSSS" | "SSSSS" => f("secday") = digits(5)
        case "AM" | "PM" | "am" | "pm" => f("pm") = if (word().equalsIgnoreCase("PM")) 1 else 0
        case "A.M." | "P.M." | "a.m." | "p.m." =>
          val start = pos; pos = math.min(pos + 4, input.length)
          f("pm") = if (input.substring(start, pos).equalsIgnoreCase("P.M.")) 1 else 0
        case "BC" | "AD" | "bc" | "ad" => word(): Unit // era: AD assumed
        case "B.C." | "A.D." | "b.c." | "a.d." => pos = math.min(pos + 4, input.length)
        case "Y,YYY" =>
          val hi = digits(2)
          require(pos < input.length && input.charAt(pos) == ',', "Y,YYY expects a comma")
          pos += 1
          f("year") = hi * 1000 + digits(3)
        case "YYYY" => f("year") = digits(4)
        case "YYY" => f("year") = milleniaAdj(digits(3))
        case "YY" => f("ycent") = digits(2)
        case "Y" => f("ycent") = digits(1)
        case "IYYY" => f("iyear") = digits(4)
        case "IYY" => f("iyear") = milleniaAdj(digits(3))
        case "IY" => f("iyear") = centuryAdj(digits(2))
        case "I" => f("iyear") = centuryAdj(digits(1))
        case "MONTH" | "Month" | "month" | "MON" | "Mon" | "mon" =>
          val w = word().toUpperCase(Locale.ROOT)
          val m = monthsU.indexWhere(_.startsWith(w))
          require(m >= 0, s"unknown month '$w'")
          f("month") = m + 1
        case "MM" => f("month") = digits(2)
        case "DAY" | "Day" | "day" | "DY" | "Dy" | "dy" =>
          val w = word().toUpperCase(Locale.ROOT)
          val i = daysU.indexWhere(_.startsWith(w))
          require(i >= 0, s"unknown day '$w'")
          f("isodow") = i + 1
        case "IDDD" => f("idoy") = digits(3)
        case "DDD" => f("doy") = digits(3)
        case "DD" => f("day") = digits(2)
        case "ID" => f("isodow") = digits(1)
        case "D" => f("dow") = digits(1)
        case "WW" => f("week") = digits(2)
        case "IW" => f("iweek") = digits(2)
        case "W" => f("wmonth") = digits(1)
        case "CC" => f("century") = digits(2)
        case "RM" | "rm" =>
          val w = word().toUpperCase(Locale.ROOT)
          val m = roman.indexOf(w)
          require(m >= 0, s"unknown roman month '$w'")
          f("month") = m + 1
        case "J" => f("julian") = digits(7)
        case "Q" => digits(1): Unit // quarter alone cannot place a date
        case _ => ()
      }
    }
    val date: LocalDate =
      if (f.contains("julian")) LocalDate.ofEpochDay(f("julian").toLong - 2440588L)
      else if (f.contains("iweek") || f.contains("idoy")) {
        val iy = f.getOrElse("iyear", 1)
        val (iw, id) =
          if (f.contains("idoy")) ((f("idoy") - 1) / 7 + 1, (f("idoy") - 1) % 7 + 1)
          else (f.getOrElse("iweek", 1), f.getOrElse("isodow", 1))
        LocalDate.of(iy, 1, 4) // Jan 4 is always ISO week 1
          .`with`(IsoFields.WEEK_OF_WEEK_BASED_YEAR, iw.toLong)
          .`with`(java.time.temporal.ChronoField.DAY_OF_WEEK, id.toLong)
      } else if (f.contains("iyear")) {
        // ISO year ALONE resolves to Jan 1 of that Gregorian year (PG
        // rule; postgresql.iq:774 — not ISO week 1 day 1)
        LocalDate.of(f("iyear"), 1, 1)
      } else {
        val year = // precedence per CompiledDateTimeFormat.getYear
          if (f.contains("century")) (f("century") - 1) * 100 + f.getOrElse("ycent", 1)
          else if (f.contains("year")) f("year")
          else if (f.contains("ycent")) centuryAdj(f("ycent"))
          else 1
        if (f.contains("doy")) LocalDate.ofYearDay(year, f("doy"))
        else if (f.contains("week"))
          LocalDate.ofYearDay(year, (f("week") - 1) * 7 + 1)
        else {
          // W (week of month) places the day at (W-1)*7+1 when no DD given
          val day = f.getOrElse("day",
            if (f.contains("wmonth")) (f("wmonth") - 1) * 7 + 1 else 1)
          LocalDate.of(year, f.getOrElse("month", 1), day)
        }
      }
    val hour =
      if (f.contains("hour")) f("hour")
      else if (f.contains("hour12")) f("hour12") % 12 + f.getOrElse("pm", 0) * 12
      else if (f.contains("secday")) f("secday") / 3600
      else 0
    val minute = f.getOrElse("minute", if (f.contains("secday")) f("secday") / 60 % 60 else 0)
    val second = f.getOrElse("second", if (f.contains("secday")) f("secday") % 60 else 0)
    LocalDateTime.of(date.getYear, date.getMonthValue, date.getDayOfMonth,
      hour, minute, second, f.getOrElse("micros", 0) * 1000)
  }

  // ---- PG string helpers ------------------------------------------------

  /** PG regexp_replace: first match only unless flags contain 'g';
    * 'i' = case-insensitive. */
  def regexpReplace(s: UTF8String, re: UTF8String, repl: UTF8String, flags: UTF8String): UTF8String = {
    val fl = flags.toString
    var p = re.toString
    if (fl.contains('i')) p = "(?i)" + p
    // PG spells backreferences \1..\9; Java wants $n (and treats bare $
    // as a group ref, so literal $ must be escaped)
    val javaRepl = repl.toString
      .replace("$", "\\$")
      .replaceAll("\\\\(\\d)", "\\$$1")
    val out =
      if (fl.contains('g')) s.toString.replaceAll(p, javaRepl)
      else s.toString.replaceFirst(p, javaRepl)
    UTF8String.fromString(out)
  }

  /** Redshift INITCAP: every non-alphanumeric character is a word break
    * ('nibh.enim@x.ca' → 'Nibh.Enim@X.Ca'); Spark breaks on whitespace
    * only (ref: babel redshift.iq:1760-1768). */
  def rsInitcap(s: UTF8String): UTF8String = {
    val in = s.toString
    val sb = new StringBuilder(in.length)
    var boundary = true
    for (c <- in) {
      if (Character.isLetterOrDigit(c)) {
        sb.append(if (boundary) Character.toUpperCase(c) else Character.toLowerCase(c))
        boundary = false
      } else { sb.append(c); boundary = true }
    }
    UTF8String.fromString(sb.toString)
  }

  /** PG string_to_array: NULL delimiter → per-character split; empty
    * delimiter → the whole string; nullStr elements become NULL. */
  def stringToArray(s: UTF8String, delim: UTF8String, nullStr: UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    if (s == null) return null
    val str = s.toString
    val parts: Array[String] =
      if (delim == null) str.map(_.toString).toArray
      else if (delim.toString.isEmpty) Array(str)
      else str.split(java.util.regex.Pattern.quote(delim.toString), -1)
    val ns = if (nullStr == null) null else nullStr.toString
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      parts.map(p => if (ns != null && p == ns) null else UTF8String.fromString(p)))
  }

  // ---- registration -----------------------------------------------------

  private def inv(dt: DataType, method: String, args: Seq[Expression], in: Seq[DataType]): Expression =
    StaticInvoke(PgDateTime.getClass, dt, method, args.zip(in).map { case (a, t) => Cast(a, t) },
      in, propagateNull = true, returnNullable = true)

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "pg_to_char" -> (a =>
      inv(StringType, "format", Seq(a(0), a(1)), Seq(TimestampNTZType, StringType))),
    "pg_to_timestamp" -> (a =>
      inv(TimestampNTZType, "parseMicros", Seq(a(0), a(1)), Seq(StringType, StringType))),
    "pg_to_date" -> (a =>
      inv(DateType, "parseDays", Seq(a(0), a(1)), Seq(StringType, StringType))),
    "pg_regexp_replace" -> (a => {
      val repl = if (a.size > 2) a(2) else org.apache.spark.sql.catalyst.expressions.Literal("")
      val flags = if (a.size > 3) a(3) else org.apache.spark.sql.catalyst.expressions.Literal("")
      inv(StringType, "regexpReplace", Seq(a(0), a(1), repl, flags),
        Seq(StringType, StringType, StringType, StringType))
    }),
    "rs_initcap" -> (a =>
      inv(StringType, "rsInitcap", Seq(a(0)), Seq(StringType))),
    "pg_string_to_array" -> (a => {
      val ns = if (a.size > 2) a(2) else org.apache.spark.sql.catalyst.expressions.Literal(null, StringType)
      StaticInvoke(PgDateTime.getClass, ArrayType(StringType), "stringToArray",
        Seq(Cast(a(0), StringType), Cast(a(1), StringType), Cast(ns, StringType)),
        Seq(StringType, StringType, StringType),
        propagateNull = false, returnNullable = true)
    }))

  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      registry.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }
}
