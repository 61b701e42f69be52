package graft

import graft.functions.{GraftFunctions, SimilarTo}
import org.apache.spark.sql.Row

/** SqlOperatorTest-style value checks for the registered function delta
  * (ref: testkit SqlOperatorTest.java pattern — expression → expected
  * value, run end-to-end through SQL). */
class FunctionsSpec extends SparkSpec {

  private def sql1(q: String): Any = {
    GraftFunctions.registerAll(spark)
    spark.sql(s"SELECT $q").collect()(0).get(0)
  }

  test("similar_to: SQL wildcard + regex subset, fully anchored") {
    GraftFunctions.registerAll(spark)
    val cases = Seq(
      ("'abc'", "'abc'", true),
      ("'abc'", "'ab'", false),          // anchored: partial match fails
      ("'abc'", "'%b%'", true),
      ("'abc'", "'a_c'", true),
      ("'abc'", "'a__'", true),
      ("'abc'", "'_b_'", true),
      ("'abc'", "'(a|z)%'", true),
      ("'abc'", "'[a-m]bc'", true),
      ("'xbc'", "'[a-m]bc'", false),
      ("'a.c'", "'a.c'", true),          // dot is literal in SQL similar
      ("'abc'", "'a.c'", false),
      ("'ab'", "'a{2}'", false),
      ("'aa'", "'a{2}'", true),
      ("'banana'", "'%(an)+a'", true))
    cases.foreach { case (s, p, expect) =>
      assert(sql1(s"similar_to($s, $p)") == expect, s"$s SIMILAR TO $p")
    }
  }

  test("similar_to translation table") {
    assert(SimilarTo.compiled("ab%").matcher("abxyz").matches())
    assert(!SimilarTo.compiled("ab%").matcher("xab").matches())
    assert(SimilarTo.compiled("a$b").matcher("a$b").matches())
  }

  test("base32 round trip") {
    assert(sql1("to_base32(CAST('hello' AS BINARY))") == "NBSWY3DP")
    assert(sql1("CAST(from_base32('NBSWY3DP') AS STRING)") == "hello")
    assert(sql1("CAST(from_base32(to_base32(CAST('spark graft!' AS BINARY))) AS STRING)") == "spark graft!")
  }

  test("degree trig") {
    assert(math.abs(sql1("cosd(60)").asInstanceOf[Double] - 0.5) < 1e-12)
    assert(math.abs(sql1("sind(30)").asInstanceOf[Double] - 0.5) < 1e-12)
    assert(math.abs(sql1("tand(45)").asInstanceOf[Double] - 1.0) < 1e-12)
    assert(math.abs(sql1("acosd(0.5)").asInstanceOf[Double] - 60.0) < 1e-12)
    assert(math.abs(sql1("asind(1)").asInstanceOf[Double] - 90.0) < 1e-12)
    assert(math.abs(sql1("atand(1)").asInstanceOf[Double] - 45.0) < 1e-12)
  }

  test("reciprocal trig") {
    assert(math.abs(sql1("csc(radians(30))").asInstanceOf[Double] - 2.0) < 1e-12)
    assert(math.abs(sql1("sec(radians(60))").asInstanceOf[Double] - 2.0) < 1e-12)
    assert(math.abs(sql1("coth(1)").asInstanceOf[Double] - 1.3130352854993312) < 1e-12)
    assert(math.abs(sql1("sech(0)").asInstanceOf[Double] - 1.0) < 1e-12)
  }

  test("is_inf / strcmp / decode_ora") {
    assert(sql1("is_inf(CAST('Infinity' AS DOUBLE))") == true)
    assert(sql1("is_inf(double('-Infinity'))") == true)
    assert(sql1("is_inf(1.5)") == false)
    assert(sql1("strcmp('a', 'b')") == -1)
    assert(sql1("strcmp('b', 'a')") == 1)
    assert(sql1("strcmp('a', 'a')") == 0)
    assert(sql1("decode_ora(2, 1, 'one', 2, 'two', 'other')") == "two")
    assert(sql1("decode_ora(9, 1, 'one', 2, 'two', 'other')") == "other")
    assert(sql1("decode_ora(9, 1, 'one', 2, 'two')") == null)
    assert(sql1("decode_ora(NULL, NULL, 'null-matched', 'other')") == "null-matched")
  }

  test("code points") {
    assert(sql1("to_code_points('AB')").asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(65, 66))
    assert(sql1("code_points_to_string(array(104, 105))") == "hi")
    assert(sql1("code_points_to_string(to_code_points('round-trip'))") == "round-trip")
  }

  test("polygon ops: ray-casting containment and shoelace area (spatial.iq family)") {
    graft.functions.Spatial.registerAll(spark)
    // unit square
    assert(sql1("""st_within_poly(st_point(0.5, 0.5),
      array(st_point(0,0), st_point(1,0), st_point(1,1), st_point(0,1)))""") == true)
    assert(sql1("""st_within_poly(st_point(1.5, 0.5),
      array(st_point(0,0), st_point(1,0), st_point(1,1), st_point(0,1)))""") == false)
    // concave L-shape: the notch is outside
    val l = "array(st_point(0,0), st_point(2,0), st_point(2,1), st_point(1,1), st_point(1,2), st_point(0,2))"
    assert(sql1(s"st_within_poly(st_point(0.5, 1.5), $l)") == true)
    assert(sql1(s"st_within_poly(st_point(1.5, 1.5), $l)") == false)
    assert(sql1(s"st_area($l)") == 3.0)
    assert(sql1("""st_area(array(st_point(0,0), st_point(4,0), st_point(4,3), st_point(0,3)))""") == 12.0)
  }

  test("functions are usable from the Column DSL too") {
    import spark.implicits._
    val df = Seq(("abcdef", "abc%")).toDF("s", "p")
    val got = df.select(GraftFunctions.similar_to($"s", $"p")).collect()(0).getBoolean(0)
    assert(got)
  }

  test("context functions: USER family resolves to session identity (SqlStdOperatorTable:2120-2162)") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql("""
      SELECT user() AS u, system_user() AS su, current_user() AS cu,
             current_schema() AS sch, current_database() AS db,
             current_path() AS p, current_role() AS role""").collect()(0)
    assert(r.getString(0).nonEmpty)
    assert(r.getString(0) == r.getString(2), "USER must alias CURRENT_USER")
    assert(r.getString(1) == r.getString(2), "SYSTEM_USER must alias CURRENT_USER")
    assert(r.getString(3) == r.getString(4), "CURRENT_SCHEMA must be the session database")
    assert(r.getString(5) == "" && r.getString(6) == "",
      "CURRENT_PATH/CURRENT_ROLE are '' in the default context")
  }
}
