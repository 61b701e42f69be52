package graft.functions

import org.apache.spark.sql.catalyst.expressions.{CaseWhen, EqualTo, Expression, If, Literal, TypeOf, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable
import org.apache.spark.sql.catalyst.expressions.variant.SchemaOfVariant
import org.apache.spark.sql.types.VariantType

/** TYPEOF over the reference's runtime-type semantics (variant.iq:37-105,
  * SqlLibraryOperators TYPEOF): for a VARIANT argument it names the
  * CONTAINED value's type (the variant-null value reports VARIANT); for
  * anything else it is Spark's own typeof. Lowered at optimization time
  * onto schema_of_variant / TypeOf — stays codegen'd.
  *
  * Documented divergence: Spark's variant encoding normalizes integer
  * widths to int64 (VariantBuilder), so TINYINT/INTEGER containment the
  * reference distinguishes reports as BIGINT here (corpus skip). */
case class TypeOfCalcite(child: Expression)
    extends UnaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = child.dataType match {
    case _: VariantType =>
      // reference type names: a contained string is VARCHAR
      // (SqlTypeName), and the variant-null value reports VARIANT
      CaseWhen(Seq(
        (EqualTo(SchemaOfVariant(child), Literal("VOID")), Literal("VARIANT")),
        (EqualTo(SchemaOfVariant(child), Literal("STRING")), Literal("VARCHAR"))),
        SchemaOfVariant(child))
    case _ => TypeOf(child)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
