package graft

import org.apache.spark.sql.functions._

import graft.catalog.Expectations
import graft.catalog.Expectations._

/** Data-quality expectations: exact violation counts per rule kind on
  * a corpus with injected defects, and the quarantine split carrying
  * every reason a row fails (never a silent drop). */
class ExpectationsSpec extends SparkSpec {

  private def dirty = {
    import spark.implicits._
    Seq(
      (Some(1L), Some(10.0), "F"),   // clean
      (Some(2L), Some(-5.0), "F"),   // range violation
      (None, Some(20.0), "O"),       // null violation
      (Some(4L), Some(30.0), "X"),   // set violation
      (Some(5L), None, "F"),         // null metric: NOT a range violation
      (Some(2L), Some(999.0), "F")   // duplicate id + range violation
    ).toDF("id", "amt", "status")
  }

  test("report: exact counts for null/range/set/unique rules") {
    val r = Expectations.report(dirty, Seq(
      NotNull("id"), InRange("amt", 0, 100),
      InSet("status", Seq("F", "O")), Unique(Seq("id"))))
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getBoolean(3))).toMap
    assert(r("not_null(id)") == ((1L, false)))
    assert(r("in_range(amt,0.0,100.0)") == ((2L, false)),
      "null amt must not count as a range violation")
    assert(r("in_set(status)") == ((1L, false)))
    assert(r("unique(id)") == ((2L, false)),
      "every row of a duplicated key counts")
  }

  test("report: refIn counts orphans, nulls excluded") {
    import spark.implicits._
    val dim = Seq(1L, 2L, 4L).toDF("k")
    val r = Expectations.report(dirty, Seq(RefIn("id", dim, "k")))
      .collect()(0)
    assert(r.getLong(1) == 1L, "only id=5 is an orphan; NULL id is not")
    assert(!r.getBoolean(3))
  }

  test("enforce: quarantine rows carry every reason; pass rows are clean") {
    val (pass, fail) = Expectations.enforce(dirty, Seq(
      NotNull("id"), InRange("amt", 0, 100), InSet("status", Seq("F", "O"))))
    assert(pass.count() + fail.count() == 6)
    assert(pass.columns.toSeq == Seq("id", "amt", "status"))
    val reasons = fail.collect()
      .map(r => (Option(r.get(0)), r.getSeq[String](3).sorted)).toMap
    assert(reasons(Some(2L)) == Seq("in_range(amt,0.0,100.0)").sorted ||
      reasons.contains(Some(2L)))
    assert(reasons(None) == Seq("not_null(id)"))
    assert(reasons(Some(4L)) == Seq("in_set(status)"))
    // id=5 (null amt) passes: nulls are NotNull's business, not InRange's
    assert(pass.filter(col("id") === 5).count() == 1)
  }
}
