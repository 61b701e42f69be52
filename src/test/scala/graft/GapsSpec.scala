package graft

import graft.functions.{TimestampTz, Unsigned}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unsigned types (unsigned.iq error/edge paths) and TIMESTAMP_TZ
  * round-trips — the two SURVEY §7.2 semantic-gap closures.
  */
class GapsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).collect()(0).get(0)

  test("unsigned: in-range casts carry the value; widening is exact") {
    assert(one(Unsigned.castUnsigned(lit(255), "utinyint")) == 255.toShort)
    assert(one(Unsigned.castUnsigned(lit(65535), "usmallint")) == 65535)
    assert(one(Unsigned.castUnsigned(lit(4294967295L), "uinteger")) == 4294967295L)
    assert(one(Unsigned.toSigned(
      Unsigned.castUnsigned(lit(100), "uinteger"), IntegerType)) == 100)
    // UBIGINT max needs DECIMAL(20,0)
    assert(one(Unsigned.castUnsigned(lit("18446744073709551615"), "ubigint"))
      .toString == "18446744073709551615")
  }

  private def failsRangeCheck(c: org.apache.spark.sql.Column): Unit = {
    val e = intercept[Exception](one(c))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(_.getMessage.contains("out of range")), s"wrong error: $e")
  }

  test("unsigned: out-of-range cast and below-zero subtraction error (unsigned.iq)") {
    // CAST(-1 AS INT UNSIGNED) → error
    failsRangeCheck(Unsigned.castUnsigned(lit(-1), "uinteger"))
    // CAST(256 AS TINYINT UNSIGNED) → error
    failsRangeCheck(Unsigned.castUnsigned(lit(256), "utinyint"))
    // CAST(100 AS INT UNSIGNED) - 200 → error, not wraparound
    failsRangeCheck(Unsigned.usub(
      Unsigned.castUnsigned(lit(100), "uinteger"), lit(200), "uinteger"))
    // but 200 - 100 is fine
    assert(one(Unsigned.usub(
      Unsigned.castUnsigned(lit(200), "uinteger"), lit(100), "uinteger")) == 100L)
    // NULL propagates without tripping the range check
    assert(one(Unsigned.castUnsigned(lit(null).cast(IntegerType), "utinyint")) == null)
  }

  test("CHECKED_* arithmetic maps to ANSI mode; SAFE_* to try_* (SqlStdOperatorTable :312-1036)") {
    val max = Int.MaxValue
    // default (non-ANSI): wraparound, the reference's unchecked ops
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      assert(one(lit(max) + lit(1)) == Int.MinValue)
      // CHECKED_PLUS: ANSI mode raises on overflow
      spark.conf.set("spark.sql.ansi.enabled", "true")
      val e = intercept[Exception](one(lit(max) + lit(1)))
      assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .exists(t => Option(t.getMessage).exists(_.toLowerCase.contains("overflow"))))
      // SAFE_ADD / SAFE_DIVIDE stay NULL-on-error even under ANSI
      assert(one(try_add(lit(max), lit(1))) == null)
      assert(one(try_divide(lit(1), lit(0))) == null)
    } finally spark.conf.set("spark.sql.ansi.enabled", "false")
  }

  test("timestamp_tz: same instant at different offsets is equal and sorts together") {
    val df = Seq(
      ("a", "2024-01-01 10:00:00", 330), // +05:30 → 04:30Z
      ("b", "2024-01-01 04:30:00", 0), // same instant
      ("c", "2024-01-01 06:00:00", 60) // 05:00Z, later
    ).toDF("id", "local", "off")
      .select(col("id"), TimestampTz.makeTz(to_timestamp(col("local")), col("off")).as("tz"))
    val utc = df.select(col("id"), TimestampTz.instant(col("tz")).cast(StringType))
      .as[(String, String)].collect().toMap
    assert(utc("a") == utc("b"))
    val ordered = df.orderBy(col("tz")).select("id").as[String].collect()
    assert(ordered.toSet.take(2) != Set("c")) // c strictly last
    assert(ordered.last == "c")
  }

  test("timestamp_tz: render preserves the source offset; atOffset re-anchors") {
    val df = Seq(("2024-06-15 23:45:00", -570)).toDF("local", "off") // -09:30
      .select(TimestampTz.makeTz(to_timestamp(col("local")), col("off")).as("tz"))
    assert(df.select(TimestampTz.render(col("tz"))).as[String].head() ==
      "2024-06-15 23:45:00-09:30")
    // AT TIME ZONE +05:30: instant unchanged, wall clock shifts +15h
    val re = df.select(TimestampTz.render(
      TimestampTz.atOffset(col("tz"), lit(330)))).as[String].head()
    assert(re == "2024-06-16 14:45:00+05:30")
  }
}
