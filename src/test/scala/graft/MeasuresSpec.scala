package graft

import graft.plans.Measures
import graft.plans.Measures.{AtAll, AtWhere, Grouped, MeasuredTable}
import org.apache.spark.sql.functions._

/** Measure-column semantics (measure.iq): context-sensitive evaluation,
  * non-additive AT (ALL), and AT (WHERE) context transfer. */
class MeasuresSpec extends SparkSpec {
  import spark.implicits._

  private def detail = Seq(
    ("a", "x", 10.0), ("a", "y", 20.0), ("a", "y", 30.0),
    ("b", "x", 40.0)).toDF("g", "sub", "v")

  test("grouped measure evaluates per group; AT (ALL) over the detail") {
    val m = MeasuredTable(detail, Map("avg_v" -> avg($"v")))
    val out = m.query(Seq("g" -> $"g"),
      Seq(Grouped("avg_v", "grp"), AtAll("avg_v", "all")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    // AVG is non-additive: global avg 25 is NOT the mean of group avgs (20, 40)
    assert(out.toSeq == Seq(("a", 20.0, 25.0), ("b", 40.0, 25.0)))
  }

  test("AT (WHERE) replaces the filter context, keeping the grouping") {
    val m = MeasuredTable(detail, Map("total" -> sum($"v")))
    val out = m.query(Seq("g" -> $"g"),
      Seq(Grouped("total", "t"), AtWhere("total", $"sub" === "y", "t_y")))
      .collect().map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).sortBy(_._1)
    // group b has no sub=y rows → NULL, not 0 (empty-group semantics)
    assert(out.toSeq == Seq(("a", 60.0, Some(50.0)), ("b", 40.0, None)))
  }

  test("dims can be expressions and measures combine in later selects") {
    val m = MeasuredTable(detail, Map("n" -> count(lit(1))))
    val out = m.query(Seq("upper_g" -> upper($"g")), Seq(Grouped("n", "n")))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(out.toSeq == Seq(("A", 3L), ("B", 1L)))
  }

  test("unknown measure name fails fast") {
    val m = MeasuredTable(detail, Map("n" -> count(lit(1))))
    intercept[IllegalArgumentException] {
      m.query(Seq("g" -> $"g"), Seq(Grouped("nope", "x")))
    }
  }
}
