package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** `FLOOR(e TO unit)` / `CEIL(e TO unit)` over dates and timestamps
  * (ref: SqlStdOperatorTable FLOOR/CEIL with a SqlIntervalQualifier
  * operand; runtime in DateTimeUtils.julianDateFloor — operator.iq:247-
  * 292): floor truncates to the unit boundary, ceil returns the operand
  * when already aligned, else the NEXT boundary. The reference's WEEK
  * boundary is SUNDAY (2019-07-05 floors to 2019-06-30), one day before
  * Spark's Monday-start `date_trunc('week')`, so week floors shift the
  * operand by +1 day, truncate, and shift back.
  *
  * The input TYPE is preserved (DATE stays DATE, TIMESTAMP stays
  * TIMESTAMP) by deriving the replacement from `child.dataType` at
  * analysis time — everything lowers onto codegen'd builtins
  * (trunc/date_trunc/add_months/timestampadd). */
abstract class FloorCeilBase extends BinaryExpression with RuntimeReplaceable {
  def child: Expression
  def unitExpr: Expression
  override def left: Expression = child
  override def right: Expression = unitExpr

  protected lazy val unit: String =
    unitExpr.eval(null).toString.toUpperCase(java.util.Locale.ROOT)

  /** The replacement must be RESOLVED when the optimizer swaps it in —
    * time-zone-aware nodes (date_trunc/timestampadd) get the session
    * zone pinned here, as Spark's own ResolveTimeZone rule would. */
  protected def tz(e: Expression): Expression = e.transform {
    case t: TimeZoneAwareExpression if t.timeZoneId.isEmpty =>
      t.withTimeZone(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
  }

  /** Truncate `child` to the unit boundary, same type as `child`. */
  protected lazy val floorExpr: Expression = child.dataType match {
    case DateType => unit match {
      case "YEAR" | "QUARTER" | "MONTH" => TruncDate(child, Literal(unit))
      case "WEEK" => DateSub(TruncDate(DateAdd(child, Literal(1)), Literal("WEEK")), Literal(1))
      case _ => child // DAY and finer: a date is already day-aligned
    }
    case _ => unit match { // TIMESTAMP / TIMESTAMP_NTZ
      case "WEEK" =>
        new TimestampAdd("DAY", Literal(-1L),
          new TruncTimestamp(Literal("WEEK"), new TimestampAdd("DAY", Literal(1L), child)))
      case _ => new TruncTimestamp(Literal(unit), child)
    }
  }

  /** floorExpr advanced by exactly one unit (type-preserving). */
  protected lazy val nextBoundary: Expression = child.dataType match {
    case DateType => unit match {
      case "YEAR" => AddMonths(floorExpr, Literal(12))
      case "QUARTER" => AddMonths(floorExpr, Literal(3))
      case "MONTH" => AddMonths(floorExpr, Literal(1))
      case "WEEK" => DateAdd(floorExpr, Literal(7))
      case _ => floorExpr
    }
    case _ => new TimestampAdd(unit, Literal(1L), floorExpr)
  }
}

case class FloorTo(child: Expression, unitExpr: Expression) extends FloorCeilBase {
  override lazy val replacement: Expression = tz(floorExpr)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(child = l, unitExpr = r)
}

case class CeilTo(child: Expression, unitExpr: Expression) extends FloorCeilBase {
  override lazy val replacement: Expression =
    tz(If(EqualTo(child, floorExpr), child, nextBoundary))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(child = l, unitExpr = r)
}

/** The reference's 1-based ITEM operator (SqlStdOperatorTable.ITEM;
  * Parser.jj's `expr [ index ]` postfix — operator.iq:322, lambda.iq):
  * `a[i]` selects the i-th element of an array (1-based, NULL out of
  * range), the value under key `i` of a map (NULL when absent), or the
  * i-th FIELD of a row/struct (1-based ordinal). Spark's own subscript
  * is 0-based for arrays and errors out of range under ANSI, so the SQL
  * frontend lowers subscripts onto this expression instead. */
case class ItemCalcite(child: Expression, index: Expression)
    extends BinaryExpression with RuntimeReplaceable {
  override def left: Expression = child
  override def right: Expression = index

  override lazy val replacement: Expression = child.dataType match {
    case ArrayType(et, _) =>
      // index <= 0 answers NULL: 0 is a hard error even for Spark's
      // try_element_at, and a NEGATIVE index indexes from the END there
      // (a[-1] = last) where the reference's ITEM treats any
      // out-of-range index — negatives included — as NULL
      If(Or(IsNull(index), LessThanOrEqual(index, Literal(0))),
        Literal.create(null, et),
        ElementAt(child, Cast(index, IntegerType), None, false))
    case MapType(kt, _, _) =>
      ElementAt(child, Cast(index, kt), None, false)
    case st: StructType =>
      // FOLDABLE ordinal (a bare literal or a literal under casts, e.g.
      // X[CAST(2 AS BIGINT)] — operator.iq:325): the field index must
      // be known at analysis time to pick the struct field
      index match {
        case e if e.foldable && (e.dataType match {
            case ByteType | ShortType | IntegerType | LongType => true
            case _ => false
          }) =>
          val v = e.eval(null)
          val i = if (v == null) 0 else v.toString.toInt
          if (i >= 1 && i <= st.fields.length)
            GetStructField(child, i - 1, Some(st.fields(i - 1).name))
          else Literal.create(null, NullType)
        case _ => Literal.create(null, NullType)
      }
    case _: VariantType =>
      // ITEM over a VARIANT returns VARIANT (variant.iq:131-208): an
      // integer index reads array position i (1-based) or, failing
      // that, the object field named "i" (a map CAST to VARIANT keys by
      // the rendered number); a string index reads the field. NULL when
      // the contained value has no such element — try-mode variant_get.
      def get(path: String): Expression =
        new org.apache.spark.sql.catalyst.expressions.variant.VariantGet(
          child, Literal(path), VariantType, false,
          Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
      index match {
        case Literal(v, ByteType | ShortType | IntegerType | LongType) =>
          val i = v.toString.toInt
          if (i >= 1) Coalesce(Seq(get(s"$$[${i - 1}]"), get(s"""$$['$i']""")))
          else get(s"""$$['$i']""")
        case Literal(s, StringType) if s != null =>
          get(s"""$$['$s']""")
        case _ => Literal.create(null, VariantType)
      }
    case _ => Literal.create(null, NullType)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(child = l, index = r)
}

/** The reference's TIMESTAMP precision semantics (misc.iq:2148,
  * CALCITE-1659/1664): the default TIMESTAMP has precision 0 and
  * TIMESTAMP(p) keeps p fractional digits, truncating the rest —
  * Spark timestamps are fixed micros. `calcite_ts(ts, p)` drops the
  * fractional digits beyond p (floor in time order, so pre-epoch
  * values truncate their DISPLAY fraction too, via the always-
  * non-negative pmod remainder). */
case class CalciteTs(child: Expression, precision: Expression)
    extends BinaryExpression with RuntimeReplaceable {
  override def left: Expression = child
  override def right: Expression = precision

  override lazy val replacement: Expression = {
    val p = precision.eval(null).toString.toInt
    if (p >= 6) child
    else {
      val unit = math.pow(10, 6 - p).toLong
      val us = UnixMicros(child)
      MicrosToTimestamp(Subtract(us, Pmod(us, Literal(unit))))
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(child = l, precision = r)
}
