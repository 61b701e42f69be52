package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQL measure columns — `colname AS MEASURE <agg>` with context-
  * sensitive evaluation (ref: the reference's measure feature:
  * rel/rules/MeasureRules.java:1, sql/fun/SqlLibraryOperators.java:102
  * AGGREGATE, corpus core/src/test/resources/sql/measure.iq and
  * measure-paper.iq — "Measures in SQL").
  *
  * A measure is a DEFERRED aggregate: it is declared once against the
  * detail table and evaluates in whatever grouping context the query
  * that selects it establishes. Context transfer operators re-scope a
  * measure's evaluation:
  *   - `m` (grouped)  — over the current group's detail rows;
  *   - `m AT (ALL)`   — over ALL detail rows (grand total), computed
  *     from the detail, NOT by re-aggregating group results (the two
  *     differ for non-additive measures like AVG or COUNT DISTINCT);
  *   - `m AT (WHERE p)` — over the current group's rows with the
  *     filter context replaced by `p`.
  *
  * Expansion mirrors MeasureRules: each distinct context becomes one
  * aggregation over the detail, stitched back by equi-join on the
  * grouping keys (broadcast for the 1-row ALL context). All contexts
  * scan the same cached detail lineage; Spark schedules the
  * aggregations as siblings sharing the scan.
  */
object Measures {

  /** A reference to a measure in some evaluation context. */
  sealed trait Ref { def name: String; def alias: String }
  /** The measure in the query's own grouping context. */
  final case class Grouped(name: String, alias: String) extends Ref
  /** `name AT (ALL)` — the grand total over all detail rows. */
  final case class AtAll(name: String, alias: String) extends Ref
  /** `name AT (WHERE pred)` — same grouping, replaced filter context. */
  final case class AtWhere(name: String, pred: Column, alias: String) extends Ref

  /** A detail table with declared measure columns. */
  final case class MeasuredTable(df: DataFrame, defs: Map[String, Column]) {

    private def aggFor(refs: Seq[(String, String)]): Seq[Column] =
      refs.map { case (n, alias) =>
        defs.getOrElse(n, throw new IllegalArgumentException(s"unknown measure '$n'"))
          .as(alias)
      }

    /** Evaluate measure references in the grouping context of `dims`.
      * Output: dims ++ one column per ref (aliased). */
    def query(dims: Seq[(String, Column)], refs: Seq[Ref]): DataFrame = {
      require(refs.nonEmpty, "select at least one measure reference")
      val dimNames = dims.map(_._1)
      // attach dim expressions as named columns next to the detail
      // (withColumn overwrites cleanly when the dim IS a column)
      val keyed = dims.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }

      val grouped = refs.collect { case Grouped(n, a) => (n, a) }
      val base =
        if (grouped.nonEmpty) {
          val aggs = aggFor(grouped)
          keyed.groupBy(dimNames.map(col): _*).agg(aggs.head, aggs.tail: _*)
        } else keyed.select(dimNames.map(col): _*).distinct()

      val withAll = refs.collect { case AtAll(n, a) => (n, a) } match {
        case Nil => base
        case alls =>
          val aggs = aggFor(alls)
          base.crossJoin(broadcast(df.agg(aggs.head, aggs.tail: _*))) // 1 row: global agg
      }

      val withWhere = refs.collect { case w: AtWhere => w }
        .foldLeft(withAll) { case (acc, AtWhere(n, pred, a)) =>
          val sub = keyed.filter(pred)
            .groupBy(dimNames.map(c => col(c).as(s"__w_$c")): _*)
            .agg(aggFor(Seq((n, a))).head)
          acc.join(sub,
            dimNames.map(c => acc(c) === sub(s"__w_$c")).reduce(_ && _),
            "left")
            .drop(dimNames.map(c => s"__w_$c"): _*)
        }

      withWhere.select((dimNames ++ refs.map(_.alias)).map(col): _*)
    }
  }
}
