package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unsigned integer types (ref: sql/type/SqlTypeName.java:61-64
  * UTINYINT/USMALLINT/UINTEGER/UBIGINT; semantics tested in
  * core/src/test/resources/sql/unsigned.iq).
  *
  * Spark has no unsigned types, so we use the reference's own JDBC
  * mapping (SqlTypeName.java:61-64): each unsigned type is carried in
  * the NEXT WIDER signed type — UTINYINT→SMALLINT, USMALLINT→INTEGER,
  * UINTEGER→BIGINT, UBIGINT→DECIMAL(20,0) — with explicit range checks
  * at cast and arithmetic boundaries, mirroring unsigned.iq:
  *
  *   - `CAST(-1 AS ... UNSIGNED)`    → NumberFormatException (range check)
  *   - `u1 - u2` below zero          → error, not wraparound
  *   - unary minus on unsigned       → rejected (no negate method)
  *   - in-range arithmetic           → plain integer results
  *
  * All checks are `when(...).otherwise(raise_error(...))` over builtin
  * comparisons, so everything stays inside WholeStageCodegen — no UDFs.
  * At 100 TB the widened representation costs at most 2× storage of the
  * logical width in shuffle buffers and nothing in parquet (values are
  * bit-packed by range anyway).
  */
object Unsigned {

  /** Value bounds per unsigned width. UBIGINT's 2^64-1 exceeds LongType,
    * hence DECIMAL(20,0) — same as the reference's JDBC surface. */
  private val bounds: Map[String, (DataType, java.math.BigDecimal)] = Map(
    "utinyint" -> (ShortType, new java.math.BigDecimal(255)),
    "usmallint" -> (IntegerType, new java.math.BigDecimal(65535)),
    "uinteger" -> (LongType, new java.math.BigDecimal("4294967295")),
    "ubigint" -> (DecimalType(20, 0), new java.math.BigDecimal("18446744073709551615")))

  private def checked(v: Column, ty: String): Column = {
    val (wide, max) = bounds(ty)
    val w = v.cast(wide)
    when(w.isNull, lit(null).cast(wide))
      .when(w >= 0 && w <= lit(max).cast(wide), w)
      .otherwise(raise_error(concat(
        lit(s"Value is out of range for $ty: "), v.cast(StringType))).cast(wide))
  }

  /** `CAST(x AS TINYINT UNSIGNED)` — range-checked cast into the widened
    * carrier type (unsigned.iq "CAST(-1 AS INT UNSIGNED)" → error). */
  def castUnsigned(v: Column, ty: String): Column = checked(v, ty.toLowerCase)

  /** Unsigned arithmetic: compute in the carrier type, then re-check the
    * unsigned range (unsigned.iq "CAST(100 AS INT UNSIGNED) - 200" →
    * error; "+ 200" → 300). */
  def uadd(a: Column, b: Column, ty: String): Column = checked(a + b, ty)
  def usub(a: Column, b: Column, ty: String): Column = checked(a - b, ty)
  def umul(a: Column, b: Column, ty: String): Column = checked(a * b, ty)

  /** Widening to signed (always safe — the carrier already is the wider
    * signed type; unsigned.iq "CAST(CAST(100 AS INT UNSIGNED) AS INT)"). */
  def toSigned(v: Column, target: DataType): Column = v.cast(target)
}
