package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark contract: run the headline query set on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line
  * {"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Methodology (BASELINE.md): per query one uncounted warmup, then
  * median of 5 timed runs; each run materializes every row through the
  * noop sink (count() would let Catalyst prune the project away).
  * Median of 5 (was 3 through round 4) because the recorded BENCH_r04
  * caught two one-off machine-contention spikes that a wider median
  * absorbs — the number reported must be the steady-state cost.
  */
object Bench {
  val headline: Seq[String] = Seq(
    "q01_pricing_summary", "q03_topk_join", "q05_local_supplier",
    "q06_forecast_revenue", "q07_cust_order_dist", "q21_win_running_sum",
    "q50_unnest_wordcount", "q93_sessionize", "q96_asof_join",
    "d01_dedup_exact", "d03_minhash_lsh", "d09_knn_bruteforce")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val results = headline.filter(SparkEntry.queries.contains).map { name =>
      try {
        once(name) // warmup: JIT + codegen + file-index caches
        val times = (1 to 5).map(_ => once(name)).sorted
        name -> times(2)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
