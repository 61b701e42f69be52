package graft

import graft.operators.SaltedJoin
import org.apache.spark.sql.functions._

/** Salted joins must return exactly the plain join's multiset while
  * splitting hot keys across salt partitions. */
class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed probe: 10k rows for key 1, a handful elsewhere
  private def probe = ((1 to 10000).map(i => (1L, i.toLong)) ++
    (2L to 20L).map(k => (k, k * 100))).toDF("k", "pv").repartition(8)
  private def build = (1L to 20L).map(k => (k, s"dim_$k")).toDF("k", "bv")

  test("full salting reproduces the plain join multiset") {
    val plain = probe.join(build, "k")
    val salted = SaltedJoin.saltedJoin(probe, build, "k", salts = 4)
    assert(salted.count() == plain.count())
    val diff = salted.groupBy("k", "pv", "bv").count()
      .except(plain.groupBy("k", "pv", "bv").count())
    assert(diff.isEmpty, "salted join must be value-identical")
  }

  test("hot-key salting: only declared keys replicated, result identical") {
    val plain = probe.join(build, "k")
    val salted = SaltedJoin.saltedJoinHotKeys(probe, build, "k",
      hotKeys = Seq(1L), salts = 8)
    assert(salted.count() == plain.count())
    val diff = salted.groupBy("k", "pv", "bv").count()
      .except(plain.groupBy("k", "pv", "bv").count())
    assert(diff.isEmpty)
  }

  test("the salt actually spreads a hot key across partitions") {
    val salted = probe.filter(col("k") === 1L)
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(4L)))
    val n = salted.select("__salt").distinct().count()
    assert(n == 4, s"expected the hot key spread over 4 salts, got $n")
  }
}
