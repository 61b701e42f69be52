package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, GetStructField, In, Or}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StructType

/** SQL-standard row equality (ref: SqlStdOperatorTable EQUALS over row
  * types; corpus row-equality.iq). The standard compares rows
  * componentwise with three-valued logic: `ROW(1, NULL) = ROW(1, NULL)`
  * is UNKNOWN, not TRUE. Spark's native struct equality is its ORDERING
  * (null==null), so `=` and `IN` over struct operands are expanded here
  * — on the ANALYZED plan, before constant folding can bake the ordering
  * semantics into literal comparisons — into per-field conjunctions:
  *
  *   a = b            →  a.f1 = b.f1 AND a.f2 = b.f2 ...   (recursive)
  *   a IN (b, c)      →  (a=b) OR (a=c), each expanded
  *
  * `IS [NOT] DISTINCT FROM` (EqualNullSafe) stays native: Spark's
  * null-safe componentwise semantics already match the standard there.
  *
  * Scale note: the expansion is also the plan-friendlier shape — a join
  * condition on struct columns becomes a conjunction of field
  * equalities, which the planner turns into a multi-key hash join
  * instead of comparing serialized structs. */
object RowEquality {

  private def isStruct(e: Expression): Boolean =
    e.resolved && e.dataType.isInstanceOf[StructType]

  /** Componentwise 3VL equality of two same-typed expressions. */
  def expand(l: Expression, r: Expression): Expression = l.dataType match {
    case st: StructType if st.fields.nonEmpty =>
      st.fields.indices.map { i =>
        expand(GetStructField(l, i), GetStructField(r, i))
      }.reduceLeft[Expression](And(_, _))
    case _ => EqualTo(l, r)
  }

  def patch(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries {
      case node => node.transformExpressionsUp {
        case EqualTo(l, r) if isStruct(l) && isStruct(r) => expand(l, r)
        case In(v, list) if isStruct(v) && list.nonEmpty && list.forall(isStruct) =>
          list.map(expand(v, _)).reduceLeft[Expression](Or(_, _))
      }
    }
}
