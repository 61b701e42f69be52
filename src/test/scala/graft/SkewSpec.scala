package graft

import org.apache.spark.sql.functions._
import graft.textops.Dedup

/** Skew/scale empiricism: the 100 TB arguments in SCALE.md, measured.
  * (a) AQE's skew-join split actually engages on a deliberately
  * hot-keyed shuffle join (the runtime re-plan that replaces manual
  * salting for moderate skew), and (b) d03's LSH hot-bucket cap
  * actually engages on a degenerate vocabulary — the all-identical
  * corpus that would otherwise explode into |bucket|²/2 candidate
  * pairs. Both datasets are generated here (NOT the read-only
  * /root/testdata fixtures).
  */
class SkewSpec extends SparkSpec {

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE skew-join split engages on a hot-keyed fact-fact join (skew=true in the final plan)") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2") {
      // 95% of the left rows share key 0 — one shuffle partition holds
      // megabytes while the median holds a few KB. The payload must be
      // incompressible (per-row md5): skew detection reads COMPRESSED
      // map-output sizes, and a constant pad deflates to nothing.
      val left = spark.range(0, 100000)
        .select(
          when(col("id") < 95000, 0L).otherwise(col("id") % 4999 + 1).as("k"),
          concat(md5(col("id").cast("string")),
            md5((col("id") + 1).cast("string")),
            md5((col("id") + 2).cast("string"))).as("pad"))
      val right = spark.range(0, 5000).select(col("id").as("k"), col("id").as("rv"))
      // drive THIS dataset's own QueryExecution (count() would build a
      // separate plan and leave this one un-executed / un-adapted)
      val joined = left.join(right, "k").select(col("k"), col("pad"))
      val n = joined.collect().length
      assert(n == 100000, s"every left row matches exactly one right key: $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark and split the skewed join at runtime:\n$plan")
    }
  }

  test("d03 LSH hot-bucket cap engages on a degenerate vocabulary; planted pairs survive") {
    import spark.implicits._
    val dir = "/tmp/graft_skew_docs"
    // 1500 byte-identical documents (one LSH bucket in EVERY band, far
    // over the 1000-id cap) + one planted near-dup pair in its own
    // buckets
    val hot = "the quick brown fox jumps over the lazy dog again and again forever"
    val nearA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val nearB = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    val rows =
      (0L until 1500L).map(i => (i, hot, "en", "hot", hot.length.toLong)) ++
        Seq((9000L, nearA, "en", "planted", nearA.length.toLong),
          (9001L, nearB, "en", "planted", nearB.length.toLong))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // the degenerate bucket really does exceed the cap: identical text
    // → identical signature → one (band, hash) bucket of 1500 ids
    val sig = Dedup.docShinglesSig(spark, dir, 64)
      .select(col("doc_id"), xxhash64(lit(1000),
        element_at(col("sig"), 1), element_at(col("sig"), 2)).as("bh"))
    val hottest = sig.groupBy("bh").count().agg(max("count")).collect()(0).getLong(0)
    assert(hottest >= 1500L, s"degenerate bucket must form: $hottest")

    // full d03 on the degenerate corpus: without the cap this emits
    // 1500·1499/2 ≈ 1.1M identical-doc pairs; with it, only the
    // planted pair (whose bucket is size 2) comes back
    val out = SparkEntry.queries("d03_minhash_lsh")(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet == Set((9000L, 9001L)),
      s"cap must drop the degenerate bucket, keep the planted pair: ${out.take(5).toSeq} (${out.length} pairs)")
  }
}
