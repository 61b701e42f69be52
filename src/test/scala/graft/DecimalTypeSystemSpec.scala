package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DECIMAL precision/scale derivation conformance — SURVEY known-hard #6.
  *
  * The reference derives arithmetic result types in
  * rel/type/RelDataTypeSystem.java (deriveDecimalPlusType :219,
  * deriveDecimalMultiplyType :282, deriveDecimalDivideType :348 — the
  * SQL:2003 / SQL-Server rules); Spark derives them in
  * DecimalPrecision + DecimalType.adjustPrecisionScale. This spec pins
  * BOTH: where the systems agree the test computes the reference
  * formula and asserts Spark matches; where they deliberately diverge
  * the divergence itself is asserted, so a Spark upgrade that shifts
  * the type system fails loudly here. Max precision: we adopt Spark's
  * 38 for the engine (the reference's DEFAULT system clamps DECIMAL at
  * p=s=19, RelDataTypeSystemImpl.java:53,192 — its SQL-Server-like
  * systems use 38, which is the comparable configuration).
  */
class DecimalTypeSystemSpec extends SparkSpec {

  private val MaxP = 38
  private val Six = 6

  /** deriveDecimalPlusType (RelDataTypeSystem.java:219-246). */
  private def calcitePlus(p1: Int, s1: Int, p2: Int, s2: Int): (Int, Int) = {
    val scale = math.max(s1, s2)
    val precision = math.min(math.max(p1 - s1, p2 - s2) + scale + 1, MaxP)
    (precision, scale)
  }

  /** deriveDecimalMultiplyType (:282-315): p1+p2 (no carry digit). */
  private def calciteTimes(p1: Int, s1: Int, p2: Int, s2: Int): (Int, Int) =
    (math.min(p1 + p2, MaxP), math.min(s1 + s2, MaxP))

  /** deriveDecimalDivideType (:348-414): the MS-documented rule. */
  private def calciteDiv(p1: Int, s1: Int, p2: Int, s2: Int): (Int, Int) = {
    val d = p1 - s1 + s2
    var scale = math.min(math.max(Six, s1 + p2 + 1), MaxP)
    val precision = d + scale
    val bound = MaxP - Six
    if (precision <= bound) scale = math.min(scale, MaxP - (precision - scale))
    else scale = math.min(Six, scale)
    (math.min(precision, MaxP), scale)
  }

  private def derived(op: String, p1: Int, s1: Int, p2: Int, s2: Int): (Int, Int) = {
    val df = spark.sql(
      s"SELECT CAST(1 AS DECIMAL($p1,$s1)) $op CAST(1 AS DECIMAL($p2,$s2)) AS r")
    df.schema.head.dataType match {
      case d: DecimalType => (d.precision, d.scale)
      case other => fail(s"non-decimal result: $other")
    }
  }

  test("plus: SQL:2003 rule matches exactly while in bounds") {
    for ((p1, s1, p2, s2) <- Seq(
        (10, 2, 10, 2), (5, 0, 7, 3), (18, 6, 12, 1), (38, 0, 1, 0))) {
      assert(derived("+", p1, s1, p2, s2) == calcitePlus(p1, s1, p2, s2),
        s"plus($p1,$s1 ; $p2,$s2)")
      assert(derived("-", p1, s1, p2, s2) == calcitePlus(p1, s1, p2, s2),
        s"minus($p1,$s1 ; $p2,$s2)")
    }
  }

  test("plus overflow: Spark trims scale to keep integral digits; reference keeps scale") {
    // (38,10)+(38,10): unclamped precision 39. Reference clamps precision
    // to 38 and KEEPS scale 10 (silent loss of an integral digit);
    // Spark's adjustPrecisionScale keeps the 29 integral digits and trims
    // the scale to 38-29=9 (never below 6). We pin Spark's choice — it
    // is the one that can't corrupt the integral part.
    assert(calcitePlus(38, 10, 38, 10) == (38, 10))
    assert(derived("+", 38, 10, 38, 10) == (38, 9))
  }

  test("multiply: Spark reserves a carry digit (p1+p2+1) over SQL:2003's p1+p2") {
    // in-bounds case: the systems differ by exactly the carry digit
    assert(calciteTimes(10, 2, 10, 2) == (20, 4))
    assert(derived("*", 10, 2, 10, 2) == (21, 4))
    assert(calciteTimes(5, 1, 7, 3) == (12, 4))
    assert(derived("*", 5, 1, 7, 3) == (13, 4))
    // overflow: both clamp precision at 38. Reference keeps scale 10
    // (losing integral digits); Spark keeps the 31 integral digits and
    // trims scale to 38-31=7 (floor 6).
    assert(calciteTimes(20, 5, 20, 5) == (38, 10))
    assert(derived("*", 20, 5, 20, 5) == (38, 7))
  }

  test("divide: identical to the reference's MS rule while in bounds") {
    for ((p1, s1, p2, s2) <- Seq(
        (10, 2, 10, 2), (7, 0, 7, 0), (12, 4, 6, 2))) {
      val expected = {
        // Spark: scale = max(6, s1+p2+1); precision = p1-s1+s2+scale
        val scale = math.max(Six, s1 + p2 + 1)
        (p1 - s1 + s2 + scale, scale)
      }
      assert(derived("/", p1, s1, p2, s2) == expected, s"div($p1,$s1 ; $p2,$s2)")
      assert(calciteDiv(p1, s1, p2, s2) == expected,
        s"reference rule diverges unexpectedly for div($p1,$s1 ; $p2,$s2)")
    }
  }

  test("divide overflow: reference floors scale at 6; Spark keeps what fits") {
    // (38,10)/(10,2): unclamped scale 21, precision 51. The reference's
    // MS rule jumps straight to scale 6 once precision exceeds 32;
    // Spark's adjustPrecisionScale keeps the 30 integral digits and
    // retains as much scale as fits (38-30 = 8). Spark's result type is
    // strictly more precise; both protect the integral part.
    assert(calciteDiv(38, 10, 10, 2) == (38, 6))
    assert(derived("/", 38, 10, 10, 2) == (38, 8))
  }

  test("values stay exact through the derived types (no double detour)") {
    val r = spark.sql("""
      SELECT CAST(12345678901234567890.12 AS DECIMAL(25,2))
           + CAST(0.005 AS DECIMAL(5,3)) AS v""").collect()(0).getDecimal(0)
    assert(r.toPlainString == "12345678901234567890.125")
  }
}
