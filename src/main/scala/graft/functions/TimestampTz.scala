package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TIMESTAMP WITH TIME ZONE — offset-preserving timestamps (ref:
  * sql/type/SqlTypeName.java:81 TIMESTAMP_TZ; SURVEY.md §1.2 "TZ-
  * preserving TIMESTAMP_TZ needs struct(instant, tzOffset)").
  *
  * Spark's TimestampType is an instant rendered in the session zone —
  * the original offset is lost. TIMESTAMP_TZ keeps it: the value is a
  * struct of the UTC instant plus the source offset in minutes, so
  * `2024-01-01 10:00:00+05:30` and `2024-01-01 04:30:00+00:00` are the
  * same instant (equal, same ordering) but render differently —
  * exactly the reference's TIMESTAMP_TZ distinction from
  * TIMESTAMP_WITH_LOCAL_TIME_ZONE (:79).
  *
  * Everything is builtin arithmetic over the struct fields (codegen'd,
  * shuffle-safe: the struct sorts/compares by utc first). At scale the
  * encoding is 12 bytes/value, and comparisons/joins on the instant hit
  * the first struct field, so min/max pruning on a parquet column of
  * these still works on the utc component.
  */
object TimestampTz {

  /** Build a TIMESTAMP_TZ from a local wall-clock timestamp and its UTC
    * offset in minutes: utc = local - offset. */
  def makeTz(local: Column, offsetMin: Column): Column =
    struct(
      (local - make_dt_interval(lit(0), lit(0), offsetMin, lit(0))).as("utc"),
      offsetMin.cast(IntegerType).as("offset_min"))

  /** Same instant, re-anchored at a new offset (`AT TIME ZONE`). */
  def atOffset(tz: Column, newOffsetMin: Column): Column =
    struct(tz("utc").as("utc"), newOffsetMin.cast(IntegerType).as("offset_min"))

  /** Local wall-clock reading (what a clock at the stored offset shows). */
  def localTime(tz: Column): Column =
    tz("utc") + make_dt_interval(lit(0), lit(0), tz("offset_min"), lit(0))

  /** The instant (for comparisons/joins with plain timestamps). */
  def instant(tz: Column): Column = tz("utc")

  /** Render as `YYYY-MM-DD HH:MM:SS±HH:MM` — offset preserved, the part
    * plain TIMESTAMP cannot do. */
  def render(tz: Column): Column = {
    val off = tz("offset_min")
    val sign = when(off < 0, "-").otherwise("+")
    val abs = when(off < 0, -off).otherwise(off)
    concat(
      date_format(localTime(tz), "yyyy-MM-dd HH:mm:ss"),
      sign,
      lpad((abs / 60).cast(IntegerType).cast(StringType), 2, "0"),
      lit(":"),
      lpad((abs % 60).cast(StringType), 2, "0"))
  }
}
