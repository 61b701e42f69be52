package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Divide, Expression, Literal, NamedExpression}
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Materialized-view substitution — the reference's MV rewrite family
  * (ref: rel/rules/materialize/MaterializedViewRules.java:1 +
  * plan/SubstitutionVisitor.java:1, lattices materialize/Lattice
  * .java:1), scoped as SURVEY §7 prescribes: single-source aggregate
  * ROLLUP first.
  *
  * `register` materializes `source.groupBy(keys).agg(partials)` into
  * the Spark cache; a user-provided optimizer rule then rewrites any
  * later `Aggregate` over the same source whose grouping keys are a
  * subset of the MV's keys and whose aggregates are rollup-able
  * (SUM→SUM of partial sums, COUNT(*)→SUM of partial counts, MIN/MAX→
  * MIN/MAX of partials) to aggregate the CACHED MV instead of
  * rescanning the source.
  *
  * At 100 TB this is the lattice play: one wide pre-aggregation pass
  * (keys × partials, typically 10⁴-10⁶ rows) absorbs every subsequent
  * rollup query — the fact table is scanned once, not per query.
  *
  * Scope guard: the substitution target stored per MV is the
  * cache-resolved plan (an InMemoryRelation leaf), so rewritten plans
  * contain no file-source relation and the rule cannot re-fire on its
  * own output — fixed-point safe by construction. */
object MaterializedViews {

  private final case class MvDef(
      name: String,
      sourcePaths: Set[String],
      keys: Set[String],
      sums: Set[String],
      mins: Set[String],
      maxs: Set[String],
      hasCount: Boolean,
      target: LogicalPlan,
      targetOut: Map[String, Attribute])

  private val registry = new ConcurrentHashMap[String, MvDef]()

  /** Register + materialize an MV over `source` (a file-based scan).
    * Partials: sum per `sums` column, min/max per `mins`/`maxs`, and a
    * group count. Returns the materialized frame (already cached). */
  def register(spark: SparkSession, name: String, source: DataFrame,
      keys: Seq[String], sums: Seq[String],
      mins: Seq[String] = Nil, maxs: Seq[String] = Nil): DataFrame = {
    val paths = source.queryExecution.analyzed.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString).toSet
        case _ => Set.empty[String]
      }
    }.flatten.toSet
    require(paths.nonEmpty, "MV source must be a file-based scan")

    val aggCols =
      sums.map(c => sum(col(c)).as(s"__mv_sum_$c")) ++
        // per-column non-null count, so AVG(x) rolls up as
        // SUM(sum_x)/SUM(cntn_x) even when x has NULLs
        sums.map(c => count(col(c)).as(s"__mv_cntn_$c")) ++
        mins.map(c => min(col(c)).as(s"__mv_min_$c")) ++
        maxs.map(c => max(col(c)).as(s"__mv_max_$c")) :+
        count(lit(1)).as("__mv_cnt")
    val mv = source.groupBy(keys.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
    mv.persist()
    mv.count() // materialize now

    // cache-resolved plan: the whole aggregate collapses to an
    // InMemoryRelation leaf, which is what we splice into queries
    val target = mv.queryExecution.withCachedData
    registry.put(name, MvDef(name, paths, keys.toSet, sums.toSet,
      mins.toSet, maxs.toSet, hasCount = true, target,
      target.output.map(a => a.name -> a).toMap))

    if (!spark.experimental.extraOptimizations.contains(MvRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MvRewrite
    mv
  }

  def drop(spark: SparkSession, name: String): Unit = registry.remove(name)
  def clear(): Unit = registry.clear()

  /** The substitution rule (runs in the user-provided optimizer batch). */
  object MvRewrite extends Rule[LogicalPlan] {

    /** Peel pruning Projects and key-only Filters off the scan; returns
      * (source paths, filter predicates that commute with the rollup —
      * they reference grouping-key columns only, so they can re-apply
      * on the MV, the MaterializedViewFilterRule analog). */
    private def sourceOf(p: LogicalPlan): Option[(Set[String], Seq[Expression])] = p match {
      case Project(ps, ch) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        sourceOf(ch)
      case logical.Filter(cond, ch) =>
        sourceOf(ch).map { case (paths, fs) => (paths, cond +: fs) }
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          Some((fs.location.rootPaths.map(_.toString).toSet, Seq.empty))
        case _ => None
      }
      case _ => None
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case agg @ Aggregate(groupings, aggExprs, child, _) =>
        sourceOf(child).flatMap { case (paths, filters) =>
          registry.values.toArray.collectFirst {
            case mv: MvDef if mv.sourcePaths == paths &&
                filters.forall(_.references.forall(a => mv.keys.contains(a.name))) =>
              rewrite(agg, groupings, aggExprs, mv, filters)
          }.flatten
        }.getOrElse(agg)
    }

    private def rewrite(agg: Aggregate, groupings: Seq[Expression],
        aggExprs: Seq[NamedExpression], mv: MvDef,
        filters: Seq[Expression]): Option[Aggregate] = {
      // grouping keys must be bare attributes covered by the MV keys
      val newGroupings = groupings.map {
        case a: AttributeReference if mv.keys.contains(a.name) =>
          Some(mv.targetOut(a.name))
        case _ => None
      }
      if (newGroupings.exists(_.isEmpty)) return None

      def rollup(fn: AggregateFunction): Option[Expression] = fn match {
        case Sum(a: AttributeReference, _) if mv.sums.contains(a.name) =>
          val inner = Sum(mv.targetOut(s"__mv_sum_${a.name}")).toAggregateExpression()
          Some(if (inner.dataType == fn.dataType) inner else Cast(inner, fn.dataType))
        case Min(a: AttributeReference) if mv.mins.contains(a.name) =>
          Some(Min(mv.targetOut(s"__mv_min_${a.name}")).toAggregateExpression())
        case Max(a: AttributeReference) if mv.maxs.contains(a.name) =>
          Some(Max(mv.targetOut(s"__mv_max_${a.name}")).toAggregateExpression())
        case Count(Seq(Literal(_, _))) if mv.hasCount =>
          Some(Sum(mv.targetOut("__mv_cnt")).toAggregateExpression())
        case avg: Average => avg.child match {
          // AVG(x) = SUM(partial sums) / SUM(partial non-null counts)
          case a: AttributeReference if mv.sums.contains(a.name) =>
            val s = Sum(mv.targetOut(s"__mv_sum_${a.name}")).toAggregateExpression()
            val c = Sum(mv.targetOut(s"__mv_cntn_${a.name}")).toAggregateExpression()
            Some(Cast(Divide(Cast(s, DoubleType), Cast(c, DoubleType)), fn.dataType))
          case _ => None
        }
        case _ => None
      }

      val newAggExprs = aggExprs.map {
        case a: AttributeReference if mv.keys.contains(a.name) =>
          Some(Alias(mv.targetOut(a.name), a.name)(exprId = a.exprId))
        case al @ Alias(ae: AggregateExpression, nm)
            if !ae.isDistinct && ae.filter.isEmpty =>
          rollup(ae.aggregateFunction).map(e => Alias(e, nm)(exprId = al.exprId))
        case _ => None
      }
      if (newAggExprs.exists(_.isEmpty)) return None

      // key-only filters commute with the rollup: re-apply them on the
      // MV with references rebound to its attributes
      val target = filters.foldLeft(mv.target) { (t, cond) =>
        logical.Filter(cond.transform {
          case a: AttributeReference if mv.keys.contains(a.name) => mv.targetOut(a.name)
        }, t)
      }
      Some(Aggregate(newGroupings.map(_.get), newAggExprs.map(_.get), target, None))
    }
  }
}
