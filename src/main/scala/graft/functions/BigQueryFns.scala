package graft.functions

import java.time.{LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BigQuery-dialect functions (ref: babel's BigQuery support —
  * SqlLibraryOperators.java BIG_QUERY entries; conformance corpus
  * babel/src/test/resources/sql/big-query.iq). Pure-Scala runtime via
  * StaticInvoke (null-propagating, no Python/JVM UDF wrapping); the
  * dialect's textual surface (quoting, literals, bare unit keywords)
  * lives in [[graft.sql.BigQueryDialect]].
  */
object BigQueryFns {

  private def lv(name: String) = UnresolvedNamedLambdaVariableHack.v(name)
  private def d(e: Expression): Expression = Cast(e, DoubleType)
  private def str(e: Expression): Expression = Cast(e, StringType)

  /** NULL when |x| is infinite, else x — BigQuery's SAFE_ arithmetic
    * returns NULL on DOUBLE overflow where Spark's TRY_ returns Inf. */
  private def nullIfInf(r: Expression): Expression =
    CaseWhen(Seq((Or(
      EqualTo(d(r), Literal(Double.PositiveInfinity)),
      EqualTo(d(r), Literal(Double.NegativeInfinity))),
      Literal.create(null, NullType))), r)

  private def tryFn(name: String, args: Seq[Expression]): Expression =
    UnresolvedFunction(name, args, isDistinct = false)

  private def inv(dt: DataType, method: String, args: Seq[Expression], in: Seq[DataType]): Expression =
    StaticInvoke(BqRuntime.getClass, dt, method, args.zip(in).map { case (a, t) => Cast(a, t) },
      in, propagateNull = true, returnNullable = true)

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // SAFE_ arithmetic: TRY_ + NULL-on-double-overflow
    "safe_add" -> (a => nullIfInf(tryFn("try_add", a))),
    "safe_subtract" -> (a => nullIfInf(tryFn("try_subtract", a))),
    "safe_multiply" -> (a => nullIfInf(tryFn("try_multiply", a))),
    "safe_divide" -> (a => nullIfInf(tryFn("try_divide", a))),
    "safe_negate" -> (a => tryFn("try_multiply", Seq(a.head, Literal(-1)))),
    // predicates / string helpers
    "is_nan" -> (a => IsNaN(d(a.head))),
    "strpos" -> (a => StringInstr(str(a(0)), str(a(1)))),
    "starts_with" -> (a => StartsWith(str(a(0)), str(a(1)))),
    "ends_with" -> (a => EndsWith(str(a(0)), str(a(1)))),
    "contains_substr" -> (a =>
      ContainsSubstrDeep(a(0), a(1),
        if (a.size > 2) a(2) else Literal("JSON_VALUES"))),
    // BigQuery SPLIT: literal (non-regex) delimiter, default ','
    "bq_split" -> (a => {
      val delim = if (a.size > 1) a(1) else Literal(",")
      inv(ArrayType(StringType), "split", Seq(a(0), delim), Seq(StringType, StringType))
    }),
    // BigQuery regexp family: re2-style semantics — extract returns group 1
    // when the pattern has one (else the whole match), NULL on no match;
    // position/occurrence arguments are 1-based
    "bq_regexp_extract" -> (a => {
      val pos = if (a.size > 2) a(2) else Literal(1)
      val occ = if (a.size > 3) a(3) else Literal(1)
      inv(StringType, "regexpExtract", Seq(a(0), a(1), pos, occ),
        Seq(StringType, StringType, IntegerType, IntegerType))
    }),
    "bq_regexp_extract_all" -> (a =>
      inv(ArrayType(StringType), "regexpExtractAll", Seq(a(0), a(1)), Seq(StringType, StringType))),
    "bq_regexp_instr" -> (a => {
      val pos = if (a.size > 2) a(2) else Literal(1)
      val occ = if (a.size > 3) a(3) else Literal(1)
      val op = if (a.size > 4) a(4) else Literal(0)
      inv(IntegerType, "regexpInstr", Seq(a(0), a(1), pos, occ, op),
        Seq(StringType, StringType, IntegerType, IntegerType, IntegerType))
    }),
    "regexp_contains" -> (a => RLike(str(a(0)), str(a(1)))),
    // strftime-style (%Y-%m-%d) parse family
    "bq_parse_date" -> (a =>
      inv(DateType, "parseDate", Seq(a(0), a(1)), Seq(StringType, StringType))),
    "bq_parse_datetime" -> (a =>
      inv(TimestampNTZType, "parseDatetime", Seq(a(0), a(1)), Seq(StringType, StringType))),
    "bq_parse_timestamp" -> (a =>
      inv(TimestampType, "parseTimestamp", Seq(a(0), a(1)), Seq(StringType, StringType))),
    // strftime-style format family (inverse of the parse family)
    "bq_format_date" -> (a =>
      inv(StringType, "formatDate", Seq(a(0), Cast(a(1), DateType)), Seq(StringType, DateType))),
    "bq_format_datetime" -> (a =>
      inv(StringType, "formatDatetime", Seq(a(0), Cast(a(1), TimestampNTZType)),
        Seq(StringType, TimestampNTZType))),
    "bq_format_timestamp" -> (a => {
      val tz = if (a.size > 2) a(2) else Literal("UTC")
      inv(StringType, "formatTimestamp", Seq(a(0), Cast(a(1), TimestampType), tz),
        Seq(StringType, TimestampType, StringType))
    }),
    "code_points_to_bytes" -> (a =>
      inv(BinaryType, "codePointsToBytes", Seq(Cast(a.head, ArrayType(IntegerType))),
        Seq(ArrayType(IntegerType)))),
    // full-range overrides of the ASCII-only constructions
    "to_code_points" -> (a =>
      inv(ArrayType(IntegerType), "toCodePoints", Seq(a.head), Seq(StringType))),
    "code_points_to_string" -> (a =>
      inv(StringType, "codePointsToString", Seq(Cast(a.head, ArrayType(IntegerType))),
        Seq(ArrayType(IntegerType)))),
    // BigQuery regexp_replace: \1-style backreferences (Java wants $1)
    "bq_regexp_replace" -> (a =>
      inv(StringType, "regexpReplace", Seq(a(0), a(1), a(2)),
        Seq(StringType, StringType, StringType))),
    // TIME surface over 'HH:mm:ss[.SSSSSS]' strings (SURVEY §1.2 maps
    // the reference's TIME to time-of-day encodings; Spark has no TIME)
    "bq_time3" -> (a =>
      inv(StringType, "time3", a.take(3), Seq(IntegerType, IntegerType, IntegerType))),
    "bq_time_from" -> (a =>
      inv(StringType, "timeFrom", Seq(Cast(a.head, TimestampNTZType)), Seq(TimestampNTZType))),
    "bq_time_add_micros" -> (a =>
      inv(StringType, "timeAddMicros", Seq(a(0), a(1)), Seq(StringType, LongType))),
    "bq_time_diff" -> (a =>
      inv(LongType, "timeDiff", Seq(a(0), a(1), a(2)), Seq(StringType, StringType, StringType))),
    "bq_time_trunc" -> (a =>
      inv(StringType, "timeTrunc", Seq(a(0), a(1)), Seq(StringType, StringType))),
    "bq_parse_time" -> (a =>
      inv(StringType, "parseTime", Seq(a(0), a(1)), Seq(StringType, StringType))),
    "bq_format_time" -> (a =>
      inv(StringType, "formatTime", Seq(a(0), a(1)), Seq(StringType, StringType))),
    // boundary-counting date/datetime diff (DATE_DIFF counts unit
    // BOUNDARIES crossed, not whole periods — WEEK starts Sunday)
    "bq_date_diff" -> (a =>
      inv(LongType, "dateDiff", Seq(Cast(a(0), DateType), Cast(a(1), DateType), a(2)),
        Seq(DateType, DateType, StringType))),
    "bq_datetime_diff" -> (a =>
      inv(LongType, "datetimeDiff",
        Seq(Cast(a(0), TimestampNTZType), Cast(a(1), TimestampNTZType), a(2)),
        Seq(TimestampNTZType, TimestampNTZType, StringType))))

  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      registry.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }

  def names: Seq[String] = builders.map(_._1)
}

/** CONTAINS_SUBSTR with BigQuery's deep-search semantics over a ROW
  * operand (big-query.iq:2160-2196): each field is searched after CAST
  * to string, with three-valued logic — any match is TRUE, else any
  * NULL field makes the answer UNKNOWN (the OR-chain carries exactly
  * that). Scalar operands go to the JSON-scope-aware runtime search. */
case class ContainsSubstrDeep(child: Expression, needle: Expression, scope: Expression)
    extends Expression with RuntimeReplaceable {
  override def children: Seq[Expression] = Seq(child, needle, scope)

  private def scalar(e: Expression): Expression =
    StaticInvoke(BqRuntime.getClass, BooleanType, "containsSubstrScoped",
      Seq(Cast(e, StringType), Cast(needle, StringType), Cast(scope, StringType)),
      Seq(StringType, StringType, StringType),
      propagateNull = true, returnNullable = true)

  override lazy val replacement: Expression = {
    val raw = child.dataType match {
      case st: StructType =>
        st.fields.indices
          .map(i => scalar(GetStructField(child, i, Some(st.fields(i).name))))
          .reduceLeft[Expression]((a, b) => Or(a, b))
      case _ => scalar(child)
    }
    // timestamp/date operands cast to string inside the invoke — pin the
    // session zone so the replacement is resolved when swapped in
    raw.transform {
      case t: TimeZoneAwareExpression if t.timeZoneId.isEmpty =>
        t.withTimeZone(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), needle = newChildren(1), scope = newChildren(2))
}

/** Static runtime for the StaticInvoke-backed BigQuery functions. All
  * methods take/return Catalyst-internal types (UTF8String, epoch days,
  * micros) so the expressions stay off the UDF path. */
object BqRuntime {

  /** `\uXXXX` escapes are decoded BEFORE normalization: the engine runs
    * with escape-preserving literals (standard SQL; babel big-query.iq
    * records outputs from such a parser), but BigQuery's CONTAINS_SUBSTR
    * operates on the decoded code points (big-query.iq:2137 — the
    * PROJECTED literal keeps the escape text, the search does not). */
  private val uEsc = Pattern.compile("\\\\u([0-9a-fA-F]{4})")

  private def norm(s: UTF8String): String = {
    val m = uEsc.matcher(s.toString)
    val sb = new StringBuffer
    while (m.find())
      m.appendReplacement(sb,
        java.util.regex.Matcher.quoteReplacement(
          Integer.parseInt(m.group(1), 16).toChar.toString))
    m.appendTail(sb)
    java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFKC)
      .toLowerCase(Locale.ROOT)
  }

  def containsSubstr(a: UTF8String, b: UTF8String): Boolean =
    containsSubstrScoped(a, b, UTF8String.fromString("JSON_VALUES"))

  /** The JSON-aware scalar search (big-query.iq:2198-2226): a document
    * that parses as a JSON object/array is searched over its VALUES by
    * default (`'{"lunch":"soup"}'` does NOT contain 'lunch'), or over
    * its KEYS under json_scope=>JSON_KEYS; anything else searches the
    * raw string. */
  def containsSubstrScoped(a: UTF8String, b: UTF8String, scope: UTF8String): Boolean = {
    val doc = a.toString.trim
    val sc = scope.toString.toUpperCase(Locale.ROOT)
    val keys = sc == "JSON_KEYS" || sc == "JSON_KEYS_AND_VALUES"
    val values = sc != "JSON_KEYS"
    val parts: Seq[String] =
      if (doc.startsWith("{") || doc.startsWith("[")) {
        try {
          val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(doc)
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          def walk(n: com.fasterxml.jackson.databind.JsonNode): Unit =
            if (n.isObject) n.properties().forEach { e =>
              if (keys) out += e.getKey
              walk(e.getValue)
            }
            else if (n.isArray) n.forEach(walk)
            else if (values && !n.isNull) out += n.asText()
          walk(node)
          out.toSeq
        } catch { case scala.util.control.NonFatal(_) => Seq(a.toString) }
      } else Seq(a.toString)
    val needle = norm(b)
    parts.exists(p => norm(UTF8String.fromString(p)).contains(needle))
  }

  def split(s: UTF8String, delim: UTF8String): ArrayData = {
    val parts = splitLiteral(s.toString, delim.toString)
    new GenericArrayData(parts.map(UTF8String.fromString))
  }

  private def splitLiteral(s: String, delim: String): Array[String] =
    if (s.isEmpty) Array.empty // SPLIT('') is the empty array
    else if (delim.isEmpty) Array(s)
    else s.split(Pattern.quote(delim), -1)

  /** Group 1 when the pattern captures, else the whole match; NULL on no
    * match; `pos` 1-based start offset, `occ` 1-based occurrence. */
  def regexpExtract(s: UTF8String, re: UTF8String, pos: Int, occ: Int): UTF8String = {
    val str = s.toString
    if (pos < 1 || pos > str.length + 1 || occ < 1) return null
    val m = Pattern.compile(re.toString).matcher(str)
    m.region(pos - 1, str.length)
    var n = 0
    while (m.find()) {
      n += 1
      if (n == occ) {
        val g = if (m.groupCount() >= 1) m.group(1) else m.group(0)
        return if (g == null) null else UTF8String.fromString(g)
      }
    }
    null
  }

  def regexpExtractAll(s: UTF8String, re: UTF8String): ArrayData = {
    val m = Pattern.compile(re.toString).matcher(s.toString)
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    while (m.find()) {
      val g = if (m.groupCount() >= 1) m.group(1) else m.group(0)
      if (g != null) out += UTF8String.fromString(g)
    }
    new GenericArrayData(out.toArray)
  }

  /** 1-based position of the `occ`-th match at/after `pos` — of the
    * FIRST CAPTURING GROUP when the pattern has one (matching the
    * extract family), else of the whole match; 0 when absent; `occPos`
    * 1 returns the position AFTER the end instead. */
  def regexpInstr(s: UTF8String, re: UTF8String, pos: Int, occ: Int, occPos: Int): Int = {
    val str = s.toString
    if (pos < 1 || pos > str.length || occ < 1) return 0
    val m = Pattern.compile(re.toString).matcher(str)
    m.region(pos - 1, str.length)
    var n = 0
    while (m.find()) {
      n += 1
      if (n == occ) {
        val g = if (m.groupCount() >= 1) 1 else 0
        if (m.start(g) < 0) return 0
        return (if (occPos == 0) m.start(g) + 1 else m.end(g) + 1)
      }
    }
    0
  }

  // ---- strftime-format parse family -------------------------------------

  /** strftime directive → java.time pattern. `forParse` uses unpadded
    * field widths (BigQuery accepts 1-2 digit months/hours), formatting
    * uses the zero-padded widths strftime prints. */
  private def javaPattern(fmt: String, forParse: Boolean): String = {
    def w(padded: String, bare: String) = if (forParse) bare else padded
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        sb.append(fmt.charAt(i + 1) match {
          case 'Y' => "uuuu"
          case 'y' => "uu"
          case 'm' => w("MM", "M")
          case 'd' => w("dd", "d")
          case 'e' => "d"
          case 'H' => w("HH", "H")
          case 'k' => "H"
          case 'I' => w("hh", "h")
          case 'l' => "h"
          case 'M' => w("mm", "m")
          case 'S' => w("ss", "s")
          case 'j' => "DDD"
          case 'b' | 'h' => "MMM"
          case 'B' => "MMMM"
          case 'a' => "EEE"
          case 'A' => "EEEE"
          case 'p' => "a"
          case 'F' => if (forParse) "uuuu-M-d" else "uuuu-MM-dd"
          case 'T' => if (forParse) "H:m:s" else "HH:mm:ss"
          case 'R' => if (forParse) "H:m" else "HH:mm"
          case 'x' => if (forParse) "M/d/uu" else "MM/dd/uu"
          case 'c' => if (forParse) "EEE MMM d H:m:s uuuu" else "EEE MMM d HH:mm:ss uuuu"
          case 'z' => "xx"
          case 'Z' => "zzz"
          case '%' => "%"
          case other => other.toString
        })
        i += 2
      } else if (c.isLetter) { sb.append('\'').append(c).append('\''); i += 1 }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def parseFormatter(fmt: String): DateTimeFormatter =
    new java.time.format.DateTimeFormatterBuilder()
      .parseCaseInsensitive()
      .appendPattern(javaPattern(fmt, forParse = true))
      .toFormatter(Locale.US)

  import java.time.temporal.ChronoField._

  /** Field-by-field extraction instead of LocalDate.from: a pattern with
    * %I but no %p must not conflict with an HOUR_OF_DAY default, and
    * missing fields take their epoch defaults. Unpadded widths parse
    * first (BigQuery accepts '8/30/2018'); adjacent-field formats like
    * %Y%m%d need the padded widths, tried as the fallback. */
  private def parseLdt(fmt: String, s: String): LocalDateTime = {
    val ta = try parseFormatter(fmt).parse(s.trim) catch {
      case _: java.time.format.DateTimeParseException =>
        new java.time.format.DateTimeFormatterBuilder()
          .parseCaseInsensitive()
          .appendPattern(javaPattern(fmt, forParse = false))
          .toFormatter(Locale.US).parse(s.trim)
    }
    def get(f: java.time.temporal.ChronoField, dflt: Int): Int =
      if (ta.isSupported(f)) ta.get(f) else dflt
    val date =
      if (ta.isSupported(EPOCH_DAY)) LocalDate.ofEpochDay(ta.getLong(EPOCH_DAY))
      else if (ta.isSupported(DAY_OF_YEAR) && ta.isSupported(YEAR))
        LocalDate.ofYearDay(ta.get(YEAR), ta.get(DAY_OF_YEAR))
      else LocalDate.of(get(YEAR, 1970), get(MONTH_OF_YEAR, 1), get(DAY_OF_MONTH, 1))
    val hour =
      if (ta.isSupported(HOUR_OF_DAY)) ta.get(HOUR_OF_DAY)
      else if (ta.isSupported(CLOCK_HOUR_OF_AMPM) || ta.isSupported(HOUR_OF_AMPM)) {
        val h12 = if (ta.isSupported(HOUR_OF_AMPM)) ta.get(HOUR_OF_AMPM)
          else ta.get(CLOCK_HOUR_OF_AMPM) % 12
        h12 + (if (ta.isSupported(AMPM_OF_DAY)) 12 * ta.get(AMPM_OF_DAY) else 0)
      } else 0
    LocalDateTime.of(date.getYear, date.getMonthValue, date.getDayOfMonth,
      hour, get(MINUTE_OF_HOUR, 0), get(SECOND_OF_MINUTE, 0), get(NANO_OF_SECOND, 0))
  }

  def parseDate(fmt: UTF8String, s: UTF8String): Int =
    parseLdt(fmt.toString, s.toString).toLocalDate.toEpochDay.toInt

  def parseDatetime(fmt: UTF8String, s: UTF8String): Long = {
    val ldt = parseLdt(fmt.toString, s.toString)
    ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
  }

  def parseTimestamp(fmt: UTF8String, s: UTF8String): Long =
    parseDatetime(fmt, s) // dialect corpus runs with session TZ = UTC

  private def fmtFormatter(fmt: String): DateTimeFormatter =
    DateTimeFormatter.ofPattern(javaPattern(fmt, forParse = false), Locale.US)

  def formatDate(fmt: UTF8String, days: Int): UTF8String =
    UTF8String.fromString(fmtFormatter(fmt.toString).format(LocalDate.ofEpochDay(days.toLong)))

  def formatDatetime(fmt: UTF8String, micros: Long): UTF8String = {
    val ldt = LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), (Math.floorMod(micros, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
    UTF8String.fromString(fmtFormatter(fmt.toString).format(ldt))
  }

  def formatTimestamp(fmt: UTF8String, micros: Long, tz: UTF8String): UTF8String = {
    val zdt = java.time.Instant.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
      .atZone(java.time.ZoneId.of(tz.toString))
    UTF8String.fromString(fmtFormatter(fmt.toString).format(zdt))
  }

  def codePointsToBytes(points: ArrayData): Array[Byte] = {
    val n = points.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (points.isNullAt(i)) return null // NULL element nulls the result
      out(i) = points.getInt(i).toByte
      i += 1
    }
    out
  }

  /** BigQuery replacement strings use \1 backreferences and literal $;
    * Java's Matcher wants $1 and \$. `\\1` (a doubled backslash from an
    * escape-preserving parse) also reads as a backreference, and doubled
    * backslashes in the PATTERN collapse — matching the reference
    * babel runtime's lowering of BigQuery's escaping. */
  def regexpReplace(s: UTF8String, re: UTF8String, repl: UTF8String): UTF8String = {
    val r = repl.toString
    val sb = new StringBuilder
    var i = 0
    while (i < r.length) {
      val c = r.charAt(i)
      if (c == '\\' && i + 2 < r.length && r.charAt(i + 1) == '\\' && r.charAt(i + 2).isDigit) {
        sb.append('$').append(r.charAt(i + 2)); i += 3
      } else if (c == '\\' && i + 1 < r.length && r.charAt(i + 1).isDigit) {
        sb.append('$').append(r.charAt(i + 1)); i += 2
      } else if (c == '\\' && i + 1 < r.length && r.charAt(i + 1) == '\\') {
        sb.append("\\\\"); i += 2
      } else if (c == '$') { sb.append("\\$"); i += 1 }
      else { sb.append(c); i += 1 }
    }
    val pattern = re.toString.replace("\\\\", "\\")
    UTF8String.fromString(s.toString.replaceAll(pattern, sb.toString))
  }

  /** Unicode-correct code points (the simple ASCII construction lives in
    * GraftFunctions; these registrations override it for full range and
    * NULL-element semantics). */
  def toCodePoints(s: UTF8String): ArrayData = {
    if (s.numChars() == 0) return null // reference: empty input → NULL
    val cps = s.toString.codePoints().toArray
    new GenericArrayData(cps.map(_.asInstanceOf[Any]))
  }

  def codePointsToString(points: ArrayData): UTF8String = {
    val n = points.numElements()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      if (points.isNullAt(i)) return null
      sb.appendCodePoint(points.getInt(i))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  // ---- TIME-of-day over HH:mm:ss strings --------------------------------

  private def timeMicros(t: String): Long = {
    val lt = java.time.LocalTime.parse(t)
    lt.toNanoOfDay / 1000L
  }

  private def microsToTime(us0: Long): UTF8String = {
    val us = Math.floorMod(us0, 86400000000L)
    val lt = java.time.LocalTime.ofNanoOfDay(us * 1000L)
    val base = f"${lt.getHour}%02d:${lt.getMinute}%02d:${lt.getSecond}%02d"
    UTF8String.fromString(
      if (lt.getNano == 0) base else f"$base.${lt.getNano / 1000}%06d")
  }

  def time3(h: Int, m: Int, s: Int): UTF8String = UTF8String.fromString(f"$h%02d:$m%02d:$s%02d")

  def timeFrom(micros: Long): UTF8String = microsToTime(Math.floorMod(micros, 86400000000L))

  /** Wraparound (mod 24h) time arithmetic, the reference's TIME rule. */
  def timeAddMicros(t: UTF8String, delta: Long): UTF8String =
    microsToTime(timeMicros(t.toString) + delta)

  def timeDiff(end: UTF8String, start: UTF8String, unit: UTF8String): Long = {
    val perUnit = Map("MICROSECOND" -> 1L, "MILLISECOND" -> 1000L,
      "SECOND" -> 1000000L, "MINUTE" -> 60000000L, "HOUR" -> 3600000000L)
    val u = unit.toString.toUpperCase(Locale.ROOT)
    val micros = perUnit.getOrElse(u,
      throw new IllegalArgumentException(s"TIME_DIFF: unsupported unit $u"))
    (timeMicros(end.toString) - timeMicros(start.toString)) / micros
  }

  def timeTrunc(t: UTF8String, unit: UTF8String): UTF8String = {
    val us = timeMicros(t.toString)
    val size = unit.toString.toUpperCase(Locale.ROOT) match {
      case "MICROSECOND" => 1L
      case "MILLISECOND" => 1000L
      case "SECOND" => 1000000L
      case "MINUTE" => 60000000L
      case "HOUR" => 3600000000L
      case u => throw new IllegalArgumentException(s"TIME_TRUNC: unsupported unit $u")
    }
    microsToTime(us - us % size)
  }

  def parseTime(fmt: UTF8String, s: UTF8String): UTF8String = {
    val ldt = parseLdt(fmt.toString, s.toString)
    microsToTime(ldt.toLocalTime.toNanoOfDay / 1000L)
  }

  def formatTime(fmt: UTF8String, t: UTF8String): UTF8String =
    UTF8String.fromString(fmtFormatter(fmt.toString).format(java.time.LocalTime.parse(t.toString)))

  // ---- boundary-counting diffs ------------------------------------------

  /** Number of `unit` boundaries crossed between start (2nd arg) and end
    * (1st arg): DATE_DIFF('2017-12-18','2017-12-17', WEEK) = 1 because a
    * Sunday-start week boundary lies between them, though the span is a
    * single day. */
  def dateDiff(endDays: Int, startDays: Int, unit: UTF8String): Long = {
    val e = LocalDate.ofEpochDay(endDays.toLong)
    val s = LocalDate.ofEpochDay(startDays.toLong)
    unit.toString.toUpperCase(Locale.ROOT) match {
      case "DAY" => (endDays - startDays).toLong
      case "WEEK" => // weeks start Sunday (BigQuery default)
        def weekIndex(dt: LocalDate): Long = {
          val days = dt.toEpochDay
          // 1970-01-01 was a Thursday; the preceding Sunday is day -4
          Math.floorDiv(days + 4, 7)
        }
        weekIndex(e) - weekIndex(s)
      case wk if wk.startsWith("WEEK(") || wk == "ISOWEEK" =>
        // WEEK(<DAY>): boundaries at the given weekday; ISOWEEK = Monday
        val dows = Seq("MONDAY", "TUESDAY", "WEDNESDAY", "THURSDAY",
          "FRIDAY", "SATURDAY", "SUNDAY") // ISO numbering 1..7
        val day = if (wk == "ISOWEEK") "MONDAY"
          else wk.stripPrefix("WEEK(").stripSuffix(")")
        val w = dows.indexOf(day) + 1
        require(w > 0, s"DATE_DIFF: unknown weekday in $wk")
        // epochDay (w - 4) falls on ISO weekday w (epoch day 0 = Thursday)
        def weekIndex(dt: LocalDate): Long =
          Math.floorDiv(dt.toEpochDay - (w - 4), 7)
        weekIndex(e) - weekIndex(s)
      case "MONTH" => (e.getYear - s.getYear) * 12L + (e.getMonthValue - s.getMonthValue)
      case "QUARTER" =>
        (e.getYear - s.getYear) * 4L + ((e.getMonthValue - 1) / 3 - (s.getMonthValue - 1) / 3)
      case "YEAR" => (e.getYear - s.getYear).toLong
      case "ISOYEAR" =>
        val wf = java.time.temporal.IsoFields.WEEK_BASED_YEAR
        (e.get(wf) - s.get(wf)).toLong
      case u => throw new IllegalArgumentException(s"DATE_DIFF: unsupported unit $u")
    }
  }

  /** DATETIME/TIMESTAMP_DIFF: boundary counting for date-sized units,
    * truncating division of the micros delta for time-sized units. */
  def datetimeDiff(endMicros: Long, startMicros: Long, unit: UTF8String): Long = {
    val u = unit.toString.toUpperCase(Locale.ROOT)
    val perUnit: Map[String, Long] = Map(
      "MICROSECOND" -> 1L, "MILLISECOND" -> 1000L, "SECOND" -> 1000000L,
      "MINUTE" -> 60000000L, "HOUR" -> 3600000000L)
    perUnit.get(u) match {
      case Some(micros) => (endMicros - startMicros) / micros
      case None =>
        dateDiff(Math.floorDiv(endMicros, 86400000000L).toInt,
          Math.floorDiv(startMicros, 86400000000L).toInt, unit)
    }
  }
}
