package graft

import graft.functions.Aggregators
import org.apache.spark.sql.functions._

/** Value checks for custom aggregates + multiset ALL operators. */
class AggregatorsSpec extends SparkSpec {

  private def init(): Unit = Aggregators.registerAll(spark)

  test("single_value returns the lone value and errors on >1 row") {
    init()
    import spark.implicits._
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v").createOrReplaceTempView("sv_ok")
    val ok = spark.sql("SELECT k, single_value_long(v) AS v FROM sv_ok GROUP BY k ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ok == Seq((1L, 10L), (2L, 20L)))

    Seq((1L, 10L), (1L, 11L)).toDF("k", "v").createOrReplaceTempView("sv_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT k, single_value_long(v) FROM sv_bad GROUP BY k").collect()
    }
    assert(e.getMessage.contains("SINGLE_VALUE") ||
      Option(e.getCause).exists(_.getMessage.contains("SINGLE_VALUE")))
  }

  test("single_value over a group whose only row is NULL returns NULL, not 0") {
    init()
    import spark.implicits._
    Seq((1L, Option.empty[Long]), (2L, Option(5L))).toDF("k", "v")
      .createOrReplaceTempView("sv_null")
    val got = spark.sql(
      "SELECT k, single_value_long(v) AS v FROM sv_null GROUP BY k ORDER BY k")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq
    assert(got == Seq((1L, None), (2L, Some(5L))))
  }

  test("multiset intersection aggregate keeps min multiplicity across rows") {
    init()
    import spark.implicits._
    Seq(
      (1, Seq("a", "a", "b", "c")),
      (1, Seq("a", "b", "b")),
      (1, Seq("a", "a", "b", "d"))).toDF("k", "ms").createOrReplaceTempView("mi")
    val got = spark.sql("SELECT multiset_intersection(ms) FROM mi GROUP BY k")
      .collect()(0).getSeq[String](0)
    assert(got == Seq("a", "b"))
  }

  test("fusion is flatten(collect_list) — multiset union aggregate") {
    import spark.implicits._
    Seq((1, Seq("a", "b")), (1, Seq("b", "c"))).toDF("k", "ms").createOrReplaceTempView("fu")
    val got = spark.sql("SELECT sort_array(flatten(collect_list(ms))) FROM fu GROUP BY k")
      .collect()(0).getSeq[String](0)
    assert(got == Seq("a", "b", "b", "c"))
  }

  test("multiset ALL scalar ops preserve multiplicity") {
    init()
    def arr(q: String) = spark.sql(s"SELECT $q").collect()(0).getSeq[String](0)
    assert(arr("multiset_intersect_all(array('a','a','b'), array('a','b','b'))") == Seq("a", "b"))
    assert(arr("multiset_except_all(array('a','a','b'), array('a'))") == Seq("a", "b"))
    assert(arr("multiset_except_all(array('a','a','b','b'), array('a','b'))") == Seq("a", "b"))
    def bool(q: String) = spark.sql(s"SELECT $q").collect()(0).getBoolean(0)
    assert(bool("submultiset_of(array('a','b'), array('b','a','c'))"))
    assert(!bool("submultiset_of(array('a','a'), array('a','b'))"))
  }

  test("spark's distinct-semantics array ops stay available alongside") {
    def arr(q: String) = spark.sql(s"SELECT $q").collect()(0).getSeq[String](0)
    assert(arr("array_intersect(array('a','a','b'), array('a','b','b'))") == Seq("a", "b"))
  }

  test("Misra-Gries heavy hitters: frequent items survive any merge order") {
    import graft.functions.Aggregators.MisraGries
    import org.apache.spark.sql.functions.udaf
    // skewed event stream: event_type distribution has clear heavy hitters
    val ev = T(spark, sfDir, "events")
    val n = ev.count()
    val k = 8
    spark.udf.register("mg_topk", udaf(new MisraGries(k)))
    ev.createOrReplaceTempView("mg_events")
    val sketch = spark.sql("SELECT mg_topk(event_type) FROM mg_events")
      .collect()(0).getMap[String, Long](0)
    val truth = ev.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every item above the n/k guarantee threshold must be in the sketch
    truth.filter(_._2 > n / k).keys.foreach { hh =>
      assert(sketch.contains(hh), s"heavy hitter $hh missing from $sketch")
    }
    // sketch counts never exceed true counts (decrements only subtract)
    sketch.foreach { case (item, c) =>
      assert(c <= truth.getOrElse(item, 0L), s"overcount for $item")
    }
  }

  test("count-min: merge-equivalent under any split, estimate in [true, true + eN]") {
    import graft.functions.Sketches
    import org.apache.spark.sql.functions.udaf
    // skewed stream: 37 moderate keys + one hot key
    val items = (1 to 2000).map(i => s"k${i % 37}") ++ Seq.fill(500)("hot")
    val cm = new Sketches.CountMin
    def sketchOf(xs: Seq[String]) = xs.foldLeft(cm.zero)((b, a) => cm.reduce(b, a))
    val whole = sketchOf(items)
    // mergeability: 8-way partial aggregation == single pass, element-exact
    val merged = items.grouped(313).toSeq.map(sketchOf).reduce(cm.merge)
    assert(java.util.Arrays.equals(whole, merged))
    // the same sketch through Spark's partial-agg machinery (8 partitions)
    import spark.implicits._
    val cmUdaf = udaf(new Sketches.CountMin)
    val viaSpark = items.toDF("s").repartition(8)
      .agg(cmUdaf(col("s"))).collect()(0).getSeq[Long](0)
    assert(viaSpark == whole.toSeq)
    // point-estimate contract: never under, over by at most eN (e = e/W)
    val n = items.size.toLong
    val slack = math.ceil(math.E / Sketches.CmsWidth * n).toLong
    items.groupBy(identity).foreach { case (k, v) =>
      val est = Sketches.cmsEstimate(whole, k)
      assert(est >= v.size, s"undercount for $k")
      assert(est <= v.size + slack, s"estimate $est breaches eN bound for $k")
    }
  }
}
