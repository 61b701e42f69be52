package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** The reference's aggregate RETURN-TYPE derivation for the AVG family
  * (ref: sql/type/ReturnTypes deriveAvgAggType via
  * RelDataTypeSystemImpl.deriveAvgAggType — the result keeps the
  * ARGUMENT's type: AVG(DECIMAL(7,2)) is DECIMAL(7,2), AVG(INT) is INT
  * — with the excess digits TRUNCATED toward zero, the reference's
  * default decimal rounding mode DOWN; agg.iq/winagg.iq record outputs
  * under it).
  *
  * Spark deliberately diverges (wider DECIMAL / DOUBLE results —
  * pinned in DecimalTypeSystemSpec), so this wrapper is the
  * conformance-dialect adapter: `agg_typed(avg(x), max(x))` re-types
  * the first operand to the SECOND operand's type (the sample is never
  * evaluated — only its analyzed type is read; the optimizer drops it
  * with the replacement swap).
  */
case class AggTyped(agg: Expression, sample: Expression,
    widen: Boolean = false) extends BinaryExpression with RuntimeReplaceable {
  override def left: Expression = agg
  override def right: Expression = sample

  override lazy val replacement: Expression = sample.dataType match {
    case dt: DecimalType =>
      // widen = SUM-style derivation: keep the argument's SCALE but
      // raise precision (deriveSumType), so group sums don't overflow
      val (p, s) = (if (widen) 38 else dt.precision, dt.scale)
      val sc = Literal(s)
      // floor/ceil-at-scale require a DECIMAL input; a DOUBLE-computed
      // aggregate (the WITHIN DISTINCT folds) widens first
      val a = agg.dataType match {
        case _: DecimalType => agg
        case _ => Cast(agg, DecimalType(38, 18))
      }
      Cast(If(GreaterThanOrEqual(a, Cast(Literal(0), a.dataType)),
        RoundFloor(a, sc), RoundCeil(a, sc)), DecimalType(p, s))
    case ByteType | ShortType | IntegerType | LongType =>
      Cast(agg, LongType) // double→long casts truncate toward zero
    case DoubleType =>
      // no-op for the AVG-family (already double); re-types the EXCLUDE
      // exact-decimal difference back to the natural float sum class
      Cast(agg, DoubleType)
    case _ => agg
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(agg = l, sample = r)
}
