package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, CaseWhen, EqualTo, Expression, GetStructField, In, InSubquery, IsNull, ListQuery, Literal, Or, OuterReference, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.Max
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.types.{BooleanType, StructType}

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
        case InSubquery(values, lq: ListQuery)
            if values.nonEmpty &&
              values.forall(v => v.resolved && v.foldable &&
                !v.exists(_.isInstanceOf[OuterReference])) &&
              lq.plan.resolved && lq.outerAttrs.isEmpty &&
              uncorrelated(lq.plan) &&
              lq.plan.output.length == values.length =>
          inSubquery3vl(values, lq)
      }
    }

  /** True when no expression anywhere in the plan — including plans of
    * nested subquery expressions — carries an outer reference. */
  private def uncorrelated(plan: LogicalPlan): Boolean = {
    def exprFree(p: LogicalPlan): Boolean =
      !p.exists(_.expressions.exists(_.exists(_.isInstanceOf[OuterReference])))
    exprFree(plan) && plan.subqueriesAll.forall(exprFree)
  }

  /** Literal-LHS IN-subquery with standard 3VL (row-equality.iq:499):
    * Spark's optimizer plans a projection-position IN-subquery as
    * ExistenceJoin, which answers FALSE where the standard requires
    * UNKNOWN (a NULL field on either side of an otherwise-matching
    * row). Lowered here — analyzed plan, before that rewrite — to ONE
    * scalar aggregate over the subquery:
    *
    *   max(CASE WHEN v = row THEN 2 WHEN (v = row) IS NULL THEN 1
    *            ELSE 0 END)  →  2→TRUE, 1→UNKNOWN, 0/empty→FALSE
    *
    * Scale: the subquery aggregates to one row before joining back —
    * a broadcast of a single value, never a row-duplicating join.
    * Correlated forms (outer refs in the values) are left to Spark's
    * own planner, which handles their WHERE-position semantics. */
  private def inSubquery3vl(values: Seq[Expression], lq: ListQuery): Expression = {
    val eq = values.zip(lq.plan.output).map { case (v, a) => expand(v, a) }
      .reduceLeft[Expression](And(_, _))
    val score = CaseWhen(Seq((eq, Literal(2)), (IsNull(eq), Literal(1))), Some(Literal(0)))
    val agg = Aggregate(Nil,
      Seq(Alias(Max(score).toAggregateExpression(), "__in3vl")()), lq.plan)
    val s = ScalarSubquery(agg)
    CaseWhen(Seq(
      (EqualTo(s, Literal(2)), Literal.TrueLiteral),
      (EqualTo(s, Literal(1)), Literal.create(null, BooleanType))),
      Some(Literal.FalseLiteral))
  }
}
