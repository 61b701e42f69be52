package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, AttributeSet, Cast, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Constraint-based join elimination (ref: rel/rules/
  * ProjectJoinRemoveRule.java — the reference removes a join when only
  * one side's columns are used and the other side joins on a unique
  * key; losslessness comes from the declared referential constraints,
  * schema/Statistic.java getReferentialConstraints).
  *
  * A node that reads only FACT-side columns above
  * `fact ⋈_{fc = dk} dim` drops the join entirely when a declared
  * foreign key `fact.fc → dim.dk` proves it lossless: dk unique and fc
  * non-null + contained mean EXACTLY one dim match per fact row, so
  * multiplicity and every fact column are preserved. The dim side must
  * be an UNFILTERED scan (a dim filter could drop matched rows) and the
  * condition a single covered equi pair (a second conjunct could
  * filter the unique match away).
  *
  * At 100 TB this deletes the broadcast/shuffle the query never needed:
  * generated BI SQL habitually joins the whole star and then reads two
  * fact columns — with declared constraints the dim scans and the join
  * vanish instead of merely broadcasting. Fixed-point safe: the rewrite
  * output contains no join to re-fire on. */
object FkJoinElimination extends Rule[LogicalPlan] {

  /** Install into THIS session's optimizer (idempotent); called by the
    * first constraint declaration — the rule only acts when declared
    * FKs exist, so earlier installation would be a no-op anyway. */
  private[graft] def ensure(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(exprs, j: Join) =>
      eliminate(exprs.flatMap(_.references), j)
        .map(keep => Project(exprs, keep)).getOrElse(p)
    case a @ Aggregate(groupings, aggExprs, j: Join, hint) =>
      eliminate((groupings ++ aggExprs).flatMap(_.references), j)
        .map(keep => Aggregate(groupings, aggExprs, keep, hint)).getOrElse(a)
  }

  private def eliminate(refs0: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
      j: Join): Option[LogicalPlan] = {
    if (j.joinType != Inner || j.condition.isEmpty) return None
    val refs = AttributeSet(refs0)
    def attempt(keep: LogicalPlan, drop: LogicalPlan): Option[LogicalPlan] =
      for {
        _ <- Some(()).filter(_ => refs.subsetOf(keep.outputSet))
        (a, b) <- singleEquiPair(j.condition.get)
        // resolve the condition's own attributes to their sides
        (keepAttr, dropAttr) <- (drop.outputSet.contains(a),
            drop.outputSet.contains(b)) match {
          case (true, false) if keep.outputSet.contains(b) => Some((b, a))
          case (false, true) if keep.outputSet.contains(a) => Some((a, b))
          case _ => None
        }
        // the dim side must contribute nothing but the unique-key
        // match: bare unfiltered file scans (pruning projects and
        // same-name normalization casts allowed). Catalyst infers
        // isnotnull on the JOIN KEY below every inner join — vacuous
        // here, since a null-keyed dim row can never match
        (dropLeaves, dropFilters) <- leavesOf(drop)
        // the dropped side must be ONE leaf: a joined dim SUBTREE
        // (customer ⋈ nation) can change multiplicity through its own
        // inner join even when the outer pair is FK-covered — each
        // fact row's unique customer may match 0 or several nation
        // rows. (A snowflake chain whose EVERY internal pair is
        // FK-covered would be sound; until that is proven here, the
        // single-leaf rule is the conservative truth.)
        if dropLeaves.size == 1
        if dropFilters.forall {
          case org.apache.spark.sql.catalyst.expressions.IsNotNull(
            at: AttributeReference) =>
            at.name == keepAttr.name || at.name == dropAttr.name
          case _ => false
        }
        // bind the FK to the ATTRIBUTES' OWN producing leaves, not to
        // names: a same-named column on another kept leaf must never
        // borrow the constraint
        factLeaf <- producingLeaf(keep, keepAttr)
        if graft.catalog.Constraints.proves(
          keepAttr.name, factLeaf, dropAttr.name, dropLeaves.head)
      } yield keep
    attempt(j.left, j.right).orElse(attempt(j.right, j.left))
  }

  /** The condition as ONE attr=attr equality; None for conjunctions —
    * a second conjunct could filter the unique match away, losing the
    * fact row. */
  private def singleEquiPair(cond: Expression)
      : Option[(AttributeReference, AttributeReference)] = cond match {
    case EqualTo(a: AttributeReference, b: AttributeReference) => Some((a, b))
    case _ => None
  }

  /** Root paths of the scan leaf that PRODUCES `attr` (peeling the
    * same-name normalization cast the loader interposes), or None when
    * the attribute is computed rather than scanned. */
  private def producingLeaf(p: LogicalPlan,
      attr: AttributeReference): Option[Set[String]] = p match {
    case Project(ps, ch) =>
      ps.collectFirst {
        case al @ Alias(Cast(src: AttributeReference, _, _, _), n)
            if al.exprId == attr.exprId && src.name == n => src
      } match {
        case Some(src) => producingLeaf(ch, src)
        case None if ch.outputSet.contains(attr) => producingLeaf(ch, attr)
        case None => None
      }
    case logical.Filter(_, ch) => producingLeaf(ch, attr)
    case a: logical.SubqueryAlias => producingLeaf(a.child, attr)
    case v: logical.View => producingLeaf(v.child, attr)
    case h: logical.ResolvedHint => producingLeaf(h.child, attr)
    case jn: Join =>
      if (jn.left.outputSet.contains(attr)) producingLeaf(jn.left, attr)
      else if (jn.right.outputSet.contains(attr)) producingLeaf(jn.right, attr)
      else None
    case lr: LogicalRelation if lr.outputSet.contains(attr) => lr.relation match {
      case fs: HadoopFsRelation =>
        Some(fs.location.rootPaths.map(_.toString).toSet)
      case _ => None
    }
    case _ => None
  }

  /** Leaf root-path sets + filter conjuncts of a projects/filters-over-
    * inner-equi-joins-of-file-scans subtree (the MV signature's shape
    * rules); None for anything else. */
  private def leavesOf(p: LogicalPlan): Option[(Seq[Set[String]], Seq[Expression])] = p match {
    case Project(ps, ch) if ps.forall {
      case _: AttributeReference => true
      case Alias(Cast(a: AttributeReference, _, _, _), n) => a.name == n
      case _ => false
    } => leavesOf(ch)
    case logical.Filter(cond, ch) =>
      leavesOf(ch).map { case (ls, fs) => (ls, cond +: fs) }
    case a: logical.SubqueryAlias => leavesOf(a.child)
    case v: logical.View => leavesOf(v.child)
    case h: logical.ResolvedHint => leavesOf(h.child)
    case jn: Join if jn.joinType == Inner && jn.condition.exists(isEquiOnly) =>
      for {
        (l, lf) <- leavesOf(jn.left)
        (r, rf) <- leavesOf(jn.right)
      } yield (l ++ r, lf ++ rf)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        Some((Seq(fs.location.rootPaths.map(_.toString).toSet), Seq.empty))
      case _ => None
    }
    case _ => None
  }

  private def isEquiOnly(cond: Expression): Boolean = cond match {
    case And(l, r) => isEquiOnly(l) && isEquiOnly(r)
    case EqualTo(_: AttributeReference, _: AttributeReference) => true
    case _ => false
  }
}
