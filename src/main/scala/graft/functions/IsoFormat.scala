package graft.functions

import java.time.{DayOfWeek, LocalDate, LocalDateTime, ZoneOffset}
import java.time.temporal.WeekFields
import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL:2016 `CAST(... FORMAT '...')` datetime format models (ref:
  * core/src/main/java/org/apache/calcite/util/format/FormatElementEnum.java,
  * exercised by core/src/test/resources/sql/cast-with-format.iq).
  *
  * These differ from the PostgreSQL models ([[PgDateTime]]) in the year
  * rules, so they get their own engine:
  *  - partial-width years parse LITERALLY ('95' under YYYY → year 95,
  *    no century fill; cast-with-format.iq:251-270);
  *  - RR with exactly two digits applies the Oracle round-year rule
  *    (>=50 → 19xx, else 20xx; RRRR and shorter RR inputs are literal);
  *  - W / WW are Calendar-style Sunday-first week-of-month/year with
  *    minimal first week 1 (FormatElementEnum.java:384-399);
  *  - DDD day-of-year overflows into the following year ('2019 366' →
  *    2020-01-01);
  *  - FF1-FF9 format from the MILLIsecond image — 3 significant digits,
  *    truncated (FF1/FF2) or zero-padded right (FF4+), matching
  *    FormatElementEnum.java:119-196;
  *  - the parse target is TIMESTAMP(0) (Calcite's default precision),
  *    so parsed fractions truncate to whole seconds.
  * Word tokens render in the pattern's case (MONTH/Month/month), as in
  * the PG engine. Pure JVM via StaticInvoke — no UDF wrapping.
  */
object IsoFormat {

  private val monthsU = Array("JANUARY", "FEBRUARY", "MARCH", "APRIL", "MAY", "JUNE",
    "JULY", "AUGUST", "SEPTEMBER", "OCTOBER", "NOVEMBER", "DECEMBER")
  private val daysU = Array("MONDAY", "TUESDAY", "WEDNESDAY", "THURSDAY", "FRIDAY",
    "SATURDAY", "SUNDAY") // index 0 = ISO day 1

  private val sundayWeeks = WeekFields.of(DayOfWeek.SUNDAY, 1)

  /** Longest-first; word tokens are CASE-SENSITIVE (pattern case drives
    * output case), numeric tokens accept lowercase spellings. */
  private val tokens: Seq[String] = Seq(
    "A.M.", "P.M.", "a.m.", "p.m.",
    "HH24", "hh24", "HH12", "hh12", "SSSSS", "sssss", "RRRR", "rrrr",
    "YYYY", "yyyy", "MONTH", "Month", "month",
    "FF1", "FF2", "FF3", "FF4", "FF5", "FF6", "FF7", "FF8", "FF9",
    "DAY", "Day", "day", "DDD", "ddd", "YYY", "yyy",
    "MON", "Mon", "mon", "DY", "Dy", "dy", "FF",
    "RR", "rr", "HH", "hh", "MI", "mi", "SS", "ss",
    "AM", "PM", "am", "pm", "YY", "yy", "MM", "mm", "DD", "dd",
    "WW", "ww", "Y", "y", "W", "w", "D", "d", "Q", "q")

  private sealed trait Tok
  private final case class Lit(c: Char) extends Tok
  private final case class Field(name: String) extends Tok

  private def lex(fmt: String): Seq[Tok] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Tok]
    var i = 0
    while (i < fmt.length) {
      // FM (fill mode) and FX (exact match) are modifiers; the padding /
      // strictness they toggle is insignificant to the parsed value here
      if (fmt.regionMatches(true, i, "FM", 0, 2) && !fmt.regionMatches(i, "FF", 0, 2)) i += 2
      else if (fmt.regionMatches(true, i, "FX", 0, 2) && !fmt.regionMatches(i, "FF", 0, 2)) i += 2
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
    val millis = ldt.getNano / 1000000
    def p(v: Long, w: Int) = s"%0${w}d".format(v)
    val sb = new StringBuilder
    lex(fmt.toString).foreach {
      case Lit(c) => sb.append(c)
      case Field(f) => sb.append(f.toUpperCase(Locale.ROOT) match {
        case "HH24" => p(ldt.getHour.toLong, 2)
        case "HH12" | "HH" => p((if (ldt.getHour % 12 == 0) 12 else ldt.getHour % 12).toLong, 2)
        case "MI" => p(ldt.getMinute.toLong, 2)
        case "SS" => p(ldt.getSecond.toLong, 2)
        case "SSSSS" => p(ldt.toLocalTime.toSecondOfDay.toLong, 5)
        case "FF1" => p(millis.toLong, 3).substring(0, 1)
        case "FF2" => p(millis.toLong, 3).substring(0, 2)
        case ff if ff.startsWith("FF") =>
          val n = if (ff.length == 2) 6 else ff.charAt(2) - '0'
          p(millis.toLong, 3).padTo(n, '0')
        case "AM" | "PM" =>
          cased(if (ldt.getHour < 12) "AM" else "PM", f)
        case "A.M." | "P.M." =>
          if (f.head.isUpper) { if (ldt.getHour < 12) "A.M." else "P.M." }
          else { if (ldt.getHour < 12) "a.m." else "p.m." }
        case "YYYY" | "RRRR" => p(d.getYear.toLong, 4)
        case "YYY" => p(d.getYear.toLong, 4).takeRight(3)
        case "YY" | "RR" => p(d.getYear.toLong, 4).takeRight(2)
        case "Y" => p(d.getYear.toLong, 4).takeRight(1)
        case "MONTH" => cased(monthsU(d.getMonthValue - 1), f)
        case "MON" => cased(monthsU(d.getMonthValue - 1).substring(0, 3), f)
        case "MM" => p(d.getMonthValue.toLong, 2)
        case "DAY" => cased(daysU(d.getDayOfWeek.getValue - 1), f)
        case "DY" => cased(daysU(d.getDayOfWeek.getValue - 1).substring(0, 3), f)
        case "DDD" => p(d.getDayOfYear.toLong, 3)
        case "DD" => p(d.getDayOfMonth.toLong, 2)
        case "D" => (d.getDayOfWeek.getValue % 7 + 1).toString // Sunday = 1
        case "WW" => p(d.get(sundayWeeks.weekOfWeekBasedYear()).toLong, 2)
        case "W" => d.get(sundayWeeks.weekOfMonth()).toString
        case "Q" => ((d.getMonthValue - 1) / 3 + 1).toString
        case other => other
      })
    }
    UTF8String.fromString(sb.toString)
  }

  // ---- parse ------------------------------------------------------------

  def parseMicros(s: UTF8String, fmt: UTF8String): Long =
    parseLdt(s.toString.trim, fmt.toString).toEpochSecond(ZoneOffset.UTC) * 1000000L

  def parseDays(s: UTF8String, fmt: UTF8String): Int =
    parseLdt(s.toString.trim, fmt.toString).toLocalDate.toEpochDay.toInt

  private def parseLdt(input: String, fmt: String): LocalDateTime = {
    var pos = 0
    val f = scala.collection.mutable.Map.empty[String, Int]
    // Strict parse contract, as the reference's (cast-with-format.iq
    // !error cases, FormatElementEnum parse rules): week/day-of-week/
    // quarter tokens are not parseable, fields must not repeat, values
    // must be in range, word tokens must match fully, and the whole
    // input must be consumed.
    def set(k: String, v: Int): Unit = {
      require(!f.contains(k), s"FORMAT parse: duplicate $k token in '$fmt'")
      f(k) = v
    }
    def inRange(v: Int, lo: Int, hi: Int, what: String): Int = {
      require(v >= lo && v <= hi, s"FORMAT parse: $what $v out of range")
      v
    }
    def digits(maxW: Int): (Int, Int) = { // (value, width consumed)
      val start = pos
      while (pos < input.length && pos - start < maxW && input.charAt(pos).isDigit) pos += 1
      require(pos > start, s"FORMAT parse: digits expected at $start in '$input'")
      (input.substring(start, pos).toInt, pos - start)
    }
    def word(): String = {
      val start = pos
      while (pos < input.length && input.charAt(pos).isLetter) pos += 1
      input.substring(start, pos)
    }
    lex(fmt).foreach {
      case Lit(_) =>
        // separator sections match flexibly: any run of separator chars in
        // the input satisfies a literal ('--2017----05' vs '-YYYY--MM')
        while (pos < input.length && !input.charAt(pos).isLetterOrDigit) pos += 1
      case Field(t) => t.toUpperCase(Locale.ROOT) match {
        case "HH24" => set("hour", inRange(digits(2)._1, 0, 23, "hour"))
        case "HH12" | "HH" => set("hour12", inRange(digits(2)._1, 1, 12, "hour"))
        case "MI" => set("minute", inRange(digits(2)._1, 0, 59, "minute"))
        case "SS" => set("second", inRange(digits(2)._1, 0, 59, "second"))
        case "SSSSS" => set("secday", inRange(digits(5)._1, 0, 86399, "second of day"))
        case ff if ff.startsWith("FF") =>
          val n = if (ff.length == 2) 9 else ff.charAt(2) - '0'
          digits(n) // TIMESTAMP(0) target: fraction truncates
          ()
        case "AM" | "PM" =>
          val w = word()
          require(w.equalsIgnoreCase("AM") || w.equalsIgnoreCase("PM"),
            s"FORMAT parse: AM/PM expected, found '$w'")
          set("pm", if (w.equalsIgnoreCase("PM")) 1 else 0)
        case "A.M." | "P.M." =>
          val start = pos; pos = math.min(pos + 4, input.length)
          val w = input.substring(start, pos)
          require(w.equalsIgnoreCase("A.M.") || w.equalsIgnoreCase("P.M."),
            s"FORMAT parse: A.M./P.M. expected, found '$w'")
          set("pm", if (w.equalsIgnoreCase("P.M.")) 1 else 0)
        case "YYYY" | "RRRR" => set("year", digits(4)._1)
        case "YYY" => set("year", digits(3)._1)
        case "YY" => set("year", digits(2)._1)
        case "Y" => set("year", digits(1)._1)
        case "RR" =>
          val (v, w) = digits(2)
          set("year", if (w == 2) { if (v >= 50) 1900 + v else 2000 + v } else v)
        case "MONTH" =>
          val w = word().toUpperCase(Locale.ROOT)
          val m = monthsU.indexOf(w)
          require(m >= 0, s"FORMAT parse: unknown month '$w'")
          set("month", m + 1)
        case "MON" =>
          val w = word().toUpperCase(Locale.ROOT)
          val m = monthsU.indexWhere(_.take(3) == w)
          require(w.length == 3 && m >= 0, s"FORMAT parse: unknown month '$w'")
          set("month", m + 1)
        case "MM" => set("month", inRange(digits(2)._1, 1, 12, "month"))
        case "DAY" | "DY" =>
          throw new IllegalArgumentException(
            "FORMAT parse: day name token is not allowed in a string to datetime conversion")
        case "DDD" => set("doy", digits(3)._1)
        case "DD" => set("day", digits(2)._1)
        case "D" =>
          throw new IllegalArgumentException(
            "FORMAT parse: day of week token is not allowed in a string to datetime conversion")
        case "WW" | "W" =>
          throw new IllegalArgumentException(
            "FORMAT parse: week number token is not allowed in a string to datetime conversion")
        case "Q" =>
          throw new IllegalArgumentException(
            "FORMAT parse: quarter token is not allowed in a string to datetime conversion")
        case _ => ()
      }
    }
    require(!(f.contains("doy") && (f.contains("day") || f.contains("month"))),
      "FORMAT parse: day of year provided with day or month token")
    require(input.substring(pos).forall(c => !c.isLetterOrDigit),
      s"FORMAT parse: trailing input '${input.substring(pos)}' in '$input'")
    val year = f.getOrElse("year", 1)
    val date: LocalDate =
      if (f.contains("doy")) LocalDate.of(year, 1, 1).plusDays(f("doy") - 1L)
      else LocalDate.of(year, f.getOrElse("month", 1), f.getOrElse("day", 1))
    val hour =
      if (f.contains("hour")) f("hour")
      else if (f.contains("hour12")) f("hour12") % 12 + f.getOrElse("pm", 0) * 12
      else if (f.contains("secday")) f("secday") / 3600
      else 0
    val minute = f.getOrElse("minute", if (f.contains("secday")) f("secday") / 60 % 60 else 0)
    val second = f.getOrElse("second", if (f.contains("secday")) f("secday") % 60 else 0)
    LocalDateTime.of(date.getYear, date.getMonthValue, date.getDayOfMonth, hour, minute, second)
  }

  // ---- registration -----------------------------------------------------

  private def inv(dt: DataType, method: String, args: Seq[Expression], in: Seq[DataType]): Expression =
    StaticInvoke(IsoFormat.getClass, dt, method, args.zip(in).map { case (a, t) => Cast(a, t) },
      in, propagateNull = true, returnNullable = true)

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "fmt_to_char" -> (a =>
      inv(StringType, "format", Seq(a(0), a(1)), Seq(TimestampNTZType, StringType))),
    "fmt_to_timestamp" -> (a =>
      inv(TimestampNTZType, "parseMicros", Seq(a(0), a(1)), Seq(StringType, StringType))),
    "fmt_to_date" -> (a =>
      inv(DateType, "parseDays", Seq(a(0), a(1)), Seq(StringType, StringType))))

  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      registry.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }
}
