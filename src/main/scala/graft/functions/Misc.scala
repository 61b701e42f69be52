package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Library-function stragglers (ref: sql/fun/SqlLibraryOperators.java):
  * AGE :2818, CONTAINS_SUBSTR :1076, DIFFERENCE :1141, URL_ENCODE :736 /
  * URL_DECODE :728 (runtime/UrlFunctions.java), COMPRESS :721
  * (runtime/CompressionFunctions.java — MySQL zlib format). AGE,
  * CONTAINS_SUBSTR and DIFFERENCE are pure expression rewrites (stay in
  * codegen); URL/COMPRESS are scalar UDFs (cold path — encoding
  * utilities, not per-row analytics).
  */
object Misc {

  /** AGE(a, b) calendar components for a >= b, Postgres/DuckDB
    * semantics: day deficit borrows the length of the EARLIER date's
    * month, then whole months split into years + months. Returns a
    * struct(age_y, age_m, age_d). */
  def age_parts(a: Column, b: Column): Column = {
    val dayDiff = dayofmonth(a) - dayofmonth(b)
    val borrow = when(dayDiff < 0, 1).otherwise(0)
    val d = when(dayDiff < 0, dayDiff + dayofmonth(last_day(b))).otherwise(dayDiff)
    val mTot = (year(a) - year(b)) * 12 + (month(a) - month(b)) - borrow
    struct(
      (mTot / 12).cast(IntegerType).as("age_y"),
      (mTot % 12).cast(IntegerType).as("age_m"),
      d.cast(IntegerType).as("age_d"))
  }

  /** CONTAINS_SUBSTR: case-insensitive containment after CAST to
    * string (the scalar form of BigQuery's deep search). */
  def contains_substr(x: Column, needle: String): Column =
    instr(lower(x.cast(StringType)), needle.toLowerCase) > 0

  /** DIFFERENCE(s1, s2): number of matching positions of the two
    * 4-char soundex codes, 0..4 (SQL Server / Calcite
    * SqlFunctions.difference). */
  def difference(a: Column, b: Column): Column = {
    val sa = soundex(a)
    val sb = soundex(b)
    (1 to 4).map(i =>
      when(substring(sa, i, 1) === substring(sb, i, 1), 1).otherwise(0))
      .reduce(_ + _)
  }

  /** URL_ENCODE (application/x-www-form-urlencoded, UTF-8; '+' for
    * space, as runtime/UrlFunctions.java). */
  val url_encode = udf((s: String) =>
    if (s == null) null else java.net.URLEncoder.encode(s, "UTF-8"))

  /** URL_DECODE — inverse of url_encode. */
  val url_decode = udf((s: String) =>
    if (s == null) null else java.net.URLDecoder.decode(s, "UTF-8"))

  /** COMPRESS — MySQL zlib format: 4-byte little-endian uncompressed
    * length prefix + zlib stream; empty string → empty bytes. */
  val compress = udf((s: String) =>
    if (s == null) null
    else if (s.isEmpty) Array.emptyByteArray
    else {
      val in = s.getBytes("UTF-8")
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(in); deflater.finish()
      val buf = new Array[Byte](in.length + 64)
      val n = deflater.deflate(buf)
      deflater.end()
      java.nio.ByteBuffer.allocate(4 + n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(in.length).put(buf, 0, n).array()
    })

  /** UNCOMPRESS — inverse of compress. */
  val uncompress = udf((b: Array[Byte]) =>
    if (b == null) null
    else if (b.isEmpty) ""
    else {
      val len = java.nio.ByteBuffer.wrap(b, 0, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      val inflater = new java.util.zip.Inflater()
      inflater.setInput(b, 4, b.length - 4)
      val out = new Array[Byte](len)
      inflater.inflate(out)
      inflater.end()
      new String(out, "UTF-8")
    })
}
