package graft

import graft.api.GraftOps._
import graft.catalog.Profiler
import graft.functions.FormatModels
import org.apache.spark.sql.functions._

/** Round-4 components: MARK join three-valued logic, format models,
  * profiler statistics, grid spatial join vs the naive quadratic form.
  */
class Round4Spec extends SparkSpec {
  import spark.implicits._

  test("markJoin: TRUE / FALSE / NULL three-valued semantics") {
    val left = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, null: String))
      .toDF("k", "tag")
    // right contains 1 and NULL: 1 → TRUE, others → UNKNOWN (NULL)
    val rightWithNull = Seq(Some(1L), None).toDF("rk")
    val m1 = left.markJoin(rightWithNull, "k", "rk", "m")
      .select("k", "m").as[(Long, Option[Boolean])].collect().toMap
    assert(m1(1L).contains(true))
    assert(m1(2L).isEmpty && m1(3L).isEmpty) // unknown, not false
    // right without NULLs: definite FALSE for non-members
    val rightClean = Seq(1L, 3L).toDF("rk")
    val m2 = left.markJoin(rightClean, "k", "rk", "m")
      .select("k", "m").as[(Long, Option[Boolean])].collect().toMap
    assert(m2(1L).contains(true) && m2(3L).contains(true))
    assert(m2(2L).contains(false))
    // empty right side: IN over the empty set is FALSE, even for NULL keys
    val empty = Seq.empty[Long].toDF("rk")
    val m3 = left.markJoin(empty, "k", "rk", "m")
      .select("m").as[Option[Boolean]].collect()
    assert(m3.forall(_.contains(false)))
    // row count is preserved (no duplication from multi-matches)
    val dup = Seq(1L, 1L, 1L).toDF("rk")
    assert(left.markJoin(dup, "k", "rk", "m").count() == 4)
  }

  test("format models: oracle datetime tokens") {
    assert(FormatModels.ora2java("YYYY-MM-DD HH24:MI:SS") == "yyyy-MM-dd HH:mm:ss")
    assert(FormatModels.ora2java("DY DD MON YYYY") == "EEE dd MMM yyyy")
    assert(FormatModels.ora2java("HH12:MI AM") == "hh:mm a")
    assert(FormatModels.bq2java("%Y-%m-%d") == "yyyy-MM-dd")
    assert(FormatModels.bq2java("%H:%M:%S.%f") == "HH:mm:ss.SSSSSS")
  }

  test("format models: numeric edit masks (Oracle semantics)") {
    def f(v: Double, m: String) = FormatModels.fmtNum(v, m)
    assert(f(123.456, "FM9990.00") == "123.46")
    assert(f(1234567, "FM9,999,999") == "1,234,567")
    assert(f(0.5, "FM99.00") == ".50")
    assert(f(123, "9999") == "  123") // width 5 = mask 4 + sign slot
    assert(f(-123, "9999") == " -123")
    assert(f(0, "9999") == "    0")
    assert(f(12345, "999") == "####") // overflow
    assert(f(7, "FM0009") == "0007")
    assert(f(3.10, "FM9.999") == "3.1") // FM trims trailing 9-zeros
  }

  test("profiler: exact stats, FD discovery, unique keys") {
    val orders = T(spark, sfDir, "orders")
    val p = Profiler.profile(orders, Seq("o_orderkey", "o_orderstatus"))
      .collect().map(r => r.getString(0) -> r).toMap
    val n = orders.count()
    assert(p("o_orderkey").getLong(1) == n)
    assert(p("o_orderkey").getLong(3) == n) // key: all distinct
    assert(p("o_orderstatus").getLong(3) <= 3)
    // HLL sketch lands within its standard error of the exact count
    val approx = p("o_orderkey").getLong(4).toDouble
    assert(math.abs(approx - n) / n < 0.1)
    assert(Profiler.isUniqueKey(orders, Seq("o_orderkey")))
    assert(!Profiler.isUniqueKey(orders, Seq("o_orderstatus")))
    // o_orderkey → o_orderstatus holds; the reverse cannot
    assert(Profiler.isFunctionalDependency(orders, Seq("o_orderkey"), "o_orderstatus"))
    assert(!Profiler.isFunctionalDependency(orders, Seq("o_orderstatus"), "o_orderkey"))
  }

  test("grid spatial join equals the naive quadratic join") {
    val grid = run("q111_spatial_grid_join").collect()
    val pts = T(spark, sfDir, "customer").select(
      col("c_custkey").as("id"),
      (col("c_custkey") % 100).cast("double").as("x"),
      ((col("c_custkey") / 97).cast("long") % 100).cast("double").as("y"))
    val naive = pts.as("a").crossJoin(pts.as("b"))
      .filter(col("a.id") < col("b.id"))
      .withColumn("d2",
        (col("a.x") - col("b.x")) * (col("a.x") - col("b.x")) +
          (col("a.y") - col("b.y")) * (col("a.y") - col("b.y")))
      .filter(col("d2") <= 4.0)
      .count()
    assert(grid.length == naive)
  }

  test("misc library: DIFFERENCE, URL codec, MySQL COMPRESS") {
    import graft.functions.Misc
    val df = Seq(("Smith", "Smyth", "a b&c=d"), ("Robert", "Rupert", "x/y z"))
      .toDF("s1", "s2", "u")
      .select(
        Misc.difference(col("s1"), col("s2")).as("d"),
        Misc.url_decode(Misc.url_encode(col("u"))).as("u2"),
        col("u"),
        Misc.uncompress(Misc.compress(col("u"))).as("c2"),
        length(Misc.compress(col("u"))).as("clen"))
    val rows = df.collect()
    assert(rows(0).getInt(0) == 4) // Smith/Smyth: identical soundex
    assert(rows(1).getInt(0) == 4) // Robert/Rupert: R163 both
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2)) // url round trip
      assert(r.getString(3) == r.getString(2)) // compress round trip
      assert(r.getInt(4) > 4) // 4-byte LE header + deflate stream
    }
    val far = Seq(("Apple", "Zucchini")).toDF("s1", "s2")
      .select(Misc.difference(col("s1"), col("s2")).as("d")).head().getInt(0)
    assert(far < 4)
  }

  test("time type: millis-of-day round trip") {
    val out = run("q109_time_type")
    val bad = out.filter(
      col("t_ms") =!= (col("t_hh") * 3600000L + col("t_mi") * 60000L +
        col("t_ss") * 1000L + col("t_ms") % 1000L))
    assert(bad.count() == 0)
  }
}
