package graft

import graft.api.GraftOps._
import org.apache.spark.sql.functions._

/** The DSL veneer chains with ordinary DataFrame operators. */
class GraftOpsSpec extends SparkSpec {

  test("asofJoin + qualify + snapshot chain fluently") {
    val ev = T(spark, sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))

    val out = purchases
      .asofJoin(clicks, "user_id", "ts", "click_ts", Seq("click_id"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
      .qualify(col("rn") === 1)
    assert(out.count() > 0)
    assert(out.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
  }

  test("repeatUnion from the DSL") {
    import spark.implicits._
    val seed = Seq(1L).toDF("n")
    val closure = seed.repeatUnion(
      prev => prev.filter(col("n") < 64).select((col("n") * 2).as("n")))
    assert(closure.orderBy("n").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L))
  }

  test("repeatUnion iteration limit: DSL truncates, failOnLimit errors (ADVICE r8)") {
    import spark.implicits._
    val seed = Seq(1L).toDF("n")
    // never-converging step: each iteration still produces rows.
    // Reference semantics (EnumerableDefaults repeatUnion): the DSL
    // limit BOUNDS the recursion — seed + 3 deltas, no error.
    val bounded = seed.repeatUnion(
      prev => prev.select((col("n") + 1).as("n")), iterationLimit = 3)
    assert(bounded.orderBy("n").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L, 3L, 4L))
    // failOnLimit opts into the SQL safety-cap behavior
    val ex = intercept[IllegalStateException] {
      seed.repeatUnion(prev => prev.select((col("n") + 1).as("n")),
        iterationLimit = 3, failOnLimit = true).count()
    }
    assert(ex.getMessage.contains("recursion limit exceeded"))
    val ex2 = intercept[IllegalStateException] {
      graft.plans.RecursiveUnion.repeatUnionDistinct(
        seed, prev => prev.select((col("n") + 1).as("n")),
        iterationLimit = 3, failOnLimit = true).count()
    }
    assert(ex2.getMessage.contains("recursion limit exceeded"))
    // and without it, distinct-mode also truncates like the reference
    assert(graft.plans.RecursiveUnion.repeatUnionDistinct(
      seed, prev => prev.select((col("n") + 1).as("n")),
      iterationLimit = 3).count() == 4)
  }

  test("matchRecognize from the DSL") {
    import spark.implicits._
    val df = Seq((1L, 0L, 5.0), (1L, 1L, 4.0), (1L, 2L, 6.0)).toDF("k", "pos", "v")
    val m = df.matchRecognize(Seq("k"), Seq("pos"), "STRT DOWN UP",
      Map(
        "DOWN" -> ((c, p) => p.exists(r => c.getDouble(2) < r.getDouble(2))),
        "UP" -> ((c, p) => p.exists(r => c.getDouble(2) > r.getDouble(2)))))
    assert(m.count() == 3)
  }

  test("tablesample + snapshotAsOf") {
    val orders = T(spark, sfDir, "orders")
      .withColumn("sys_start", to_date(col("o_orderdate")))
      .withColumn("sys_end", date_add(to_date(col("o_orderdate")), 30))
    val snap = orders.snapshotAsOf(lit("1997-06-15"))
    assert(snap.count() > 0)
    val sampled = orders.tablesample(0.5, seed = 7L)
    assert(sampled.count() > 0 && sampled.count() < orders.count())
  }

  test("SYSTEM tablesample is block-wise, repeatable, and keeps whole partitions") {
    val orders = T(spark, sfDir, "orders").repartition(16, col("o_orderkey"))
    val s1 = orders.tablesampleSystem(0.5, seed = 11L)
    val s2 = orders.tablesampleSystem(0.5, seed = 11L)
    // repeatable for a fixed (seed, partitioning)
    assert(s1.count() == s2.count())
    assert(s1.agg(sum(col("o_orderkey"))).collect()(0).get(0) ==
      s2.agg(sum(col("o_orderkey"))).collect()(0).get(0))
    // different seed → (almost surely) different block subset
    val s3 = orders.tablesampleSystem(0.5, seed = 12L)
    assert(s3.count() != s1.count() ||
      s3.agg(sum(col("o_orderkey"))).collect()(0).get(0) !=
        s1.agg(sum(col("o_orderkey"))).collect()(0).get(0))
    // fraction 1 keeps everything; fraction 0 keeps nothing
    assert(orders.tablesampleSystem(1.0, 5L).count() == orders.count())
    assert(orders.tablesampleSystem(0.0, 5L).count() == 0L)
  }

  test("temporalJoin: equal-vstart versions tie-break to the longest-lived one") {
    import graft.api.GraftOps._
    import spark.implicits._
    // key 1 has TWO versions starting at t=10: an empty [10,10) and a
    // live [10,20). The interval join matches only the live one; the
    // ASOF lowering must carry it deterministically, not an arbitrary
    // tie winner (the pre-fix failure mode: the empty version wins and
    // nulls the payload).
    val left = Seq((1L, 10L), (1L, 15L), (1L, 25L)).toDF("k", "t")
    val versions = Seq(
      (1L, 10L, 10L, "empty"),
      (1L, 10L, 20L, "live"),
      (1L, 20L, 30L, "next")).toDF("k", "vs", "ve", "payload")
    val got = left.temporalJoin(versions, key = "k", time = "t",
      vstart = "vs", vend = "ve", payload = Seq("payload"))
      .select("t", "payload")
      .orderBy("t").collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(got == Seq(
      (10L, Some("live")), (15L, Some("live")), (25L, Some("next"))), s"got $got")
  }
}
