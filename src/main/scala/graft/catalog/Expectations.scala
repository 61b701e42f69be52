package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — declarative row/table rules with a
  * one-pass violation report and a quarantine split (the Delta Live
  * Tables / dbt-test shape; engine-side kin of the reference's
  * validator layer, sql/validate/SqlValidatorImpl.java, which proves
  * STATIC properties — these prove the DATA properties a 100 TB
  * ingest actually violates).
  *
  * Scale: every row-local rule compiles to one boolean column, so the
  * whole report is ONE aggregation pass over the table (sum of ints);
  * `unique` adds one grouped count and `refIn` one broadcast-able
  * anti-join probe — nothing quadratic, nothing per-rule-per-pass. The
  * quarantine split reuses the same predicates: one scan emits the
  * pass rows, one the annotated failures. */
object Expectations {

  sealed trait Rule {
    def name: String
    /** Row-local violation predicate, when the rule is row-local. */
    private[Expectations] def rowViolation: Option[Column] = None
  }

  /** `col` must not be NULL. */
  final case class NotNull(col: String) extends Rule {
    val name = s"not_null($col)"
    override private[Expectations] def rowViolation = Some(column(col).isNull)
  }

  /** `col` must fall in [lo, hi] (NULLs are not range violations —
    * declare NotNull separately; one failing row should carry each
    * reason it fails, not a blur). */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    val name = s"in_range($col,$lo,$hi)"
    override private[Expectations] def rowViolation =
      Some(column(col).isNotNull &&
        (column(col) < lit(lo) || column(col) > lit(hi)))
  }

  /** `col` must be one of `values`. */
  final case class InSet(col: String, values: Seq[String]) extends Rule {
    val name = s"in_set($col)"
    override private[Expectations] def rowViolation =
      Some(column(col).isNotNull && !column(col).isin(values: _*))
  }

  /** `cols` must be jointly unique; every row of a duplicated key
    * counts as a violation. */
  final case class Unique(cols: Seq[String]) extends Rule {
    val name = s"unique(${cols.mkString(",")})"
  }

  /** `col`'s non-null values must appear in `dim`'s `dimKey` — the
    * data-side check of the FK contract [[Constraints]] declares. */
  final case class RefIn(col: String, dim: DataFrame, dimKey: String)
      extends Rule {
    val name = s"ref_in($col)"
  }

  private def column(c: String): Column = col(c)

  /** One row per rule: (rule, violations, total, pass). Row-local rules
    * share a single aggregation pass. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "1+ rules")
    val total = df.count()
    val rowLocal = rules.flatMap(r => r.rowViolation.map(r.name -> _))
    val localCounts: Map[String, Long] =
      if (rowLocal.isEmpty) Map.empty
      else {
        val aggs = rowLocal.map { case (n, p) =>
          sum(when(p, 1L).otherwise(0L)).as(n) }
        val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        rowLocal.map(_._1).zipWithIndex
          .map { case (n, i) => n -> row.getLong(i) }.toMap
      }
    val rows = rules.map {
      case r if r.rowViolation.isDefined => (r.name, localCounts(r.name))
      case u @ Unique(cols) =>
        val dups = df.groupBy(cols.map(col): _*).count()
          .filter(col("count") > 1)
          .agg(coalesce(sum("count"), lit(0L))).collect()(0).getLong(0)
        (u.name, dups)
      case r @ RefIn(c, dim, dimKey) =>
        val orphans = df.filter(col(c).isNotNull)
          .join(dim.select(col(dimKey)).distinct(),
            col(c) === col(dimKey), "left_anti").count()
        (r.name, orphans)
    }
    val session = df.sparkSession
    import session.implicits._
    rows.map { case (n, v) => (n, v, total, v == 0L) }
      .toDF("rule", "violations", "total", "pass")
  }

  /** Quarantine split on the ROW-LOCAL rules: (pass, fail) where fail
    * rows carry a `_violations` array naming every rule they break —
    * the shape a 100 TB ingest needs (quarantine with reasons, don't
    * drop silently). Table-level rules (unique/refIn) don't partition
    * rows one-sidedly and stay report-only. */
  def enforce(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val rowLocal = rules.flatMap(r => r.rowViolation.map(r.name -> _))
    require(rowLocal.nonEmpty, "enforce needs 1+ row-local rules")
    val reasons = array(rowLocal.map { case (n, p) =>
      when(p, lit(n)).otherwise(lit(null)) }: _*)
    val annotated = df.withColumn("_violations",
      filter(reasons, x => x.isNotNull))
    (annotated.filter(size(col("_violations")) === 0).drop("_violations"),
      annotated.filter(size(col("_violations")) > 0))
  }
}
