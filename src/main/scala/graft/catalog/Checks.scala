package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (ref: schema/Statistic.java keys +
  * referential constraints — the reference DECLARES these for the
  * planner; a data engine must also VERIFY them, the dbt-tests /
  * constraint-validation role).
  *
  * Each rule evaluates distributed and returns (rule, column,
  * violations); the row-local rules (not_null, accepted_values, range)
  * fold into ONE conditional-count aggregate pass over the table —
  * adding rules doesn't add scans — while unique and referential each
  * cost their natural shuffle (groupBy / anti join), which is the
  * floor for those semantics at any scale.
  */
object Checks {

  sealed trait Rule { def name: String; def column: String }
  final case class NotNull(column: String) extends Rule { val name = "not_null" }
  final case class AcceptedValues(column: String, values: Seq[String]) extends Rule {
    val name = "accepted_values"
  }
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    val name = "in_range"
  }
  final case class Unique(column: String) extends Rule { val name = "unique" }
  /** Every `column` value must exist as `refColumn` in `ref`. */
  final case class RefIntegrity(column: String, ref: DataFrame, refColumn: String)
      extends Rule { val name = "ref_integrity" }

  /** Evaluate all rules; returns (rule, column, violations) one row per
    * rule, ordered by (rule, column). */
  def run(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val rowLocal: Seq[(String, String, Column)] = rules.collect {
      case NotNull(c) => ("not_null", c, col(c).isNull)
      case AcceptedValues(c, vs) =>
        ("accepted_values", c, !col(c).isin(vs: _*) || col(c).isNull)
      case InRange(c, lo, hi) =>
        ("in_range", c, col(c) < lo || col(c) > hi || col(c).isNull)
    }
    val onePass: Seq[(String, String, Long)] =
      if (rowLocal.isEmpty) Nil
      else {
        val aggs = rowLocal.map { case (_, _, bad) =>
          sum(when(bad, 1L).otherwise(0L))
        }
        val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        rowLocal.zipWithIndex.map { case ((r, c, _), i) => (r, c, row.getLong(i)) }
      }

    val uniques = rules.collect { case Unique(c) =>
      val dups = df.groupBy(col(c)).count().filter(col("count") > 1)
        .agg(coalesce(sum(col("count")), lit(0L))).collect()(0).getLong(0)
      ("unique", c, dups)
    }
    val refs = rules.collect { case RefIntegrity(c, ref, rc) =>
      val orphans = df.select(col(c)).filter(col(c).isNotNull)
        .join(ref.select(col(rc)), col(c) === col(rc), "left_anti")
        .count()
      ("ref_integrity", c, orphans)
    }

    (onePass ++ uniques ++ refs)
      .toDF("rule", "column", "violations")
      .orderBy("rule", "column")
  }
}
