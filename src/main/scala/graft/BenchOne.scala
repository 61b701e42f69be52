package graft

import org.apache.spark.sql.SparkSession

/** Dev-only micro-bench: time specific `SparkEntry.queries` (all of the
  * Bench headline set if no args), same session/config/methodology as
  * graft.Bench (warmup + median of 3 through the noop sink). Usage:
  *   sbt "runMain graft.BenchOne d03_minhash_lsh q21_win_running_sum"
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-one")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Dev-only stage-level profiling (guide §1/§7): set
      // SPARK_GRAFT_EVENTLOG_DIR to capture the event log and read per
      // stage submit/complete times + task metrics out of the JSON.
      .config("spark.eventLog.enabled",
        sys.env.contains("SPARK_GRAFT_EVENTLOG_DIR").toString)
      .config("spark.eventLog.dir",
        sys.env.getOrElse("SPARK_GRAFT_EVENTLOG_DIR", "/tmp"))
      .config("spark.eventLog.compress", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // Mirror graft.Bench's methodology (r15) so numbers here are
    // comparable to the artifact of record: fixed cooldown, two untimed
    // session-warmup passes over the heaviest headline queries, then per
    // query a warmup + median of 5 with the 1.35-spread retry guard.
    Thread.sleep(sys.env.getOrElse("SPARK_GRAFT_BENCH_COOLDOWN_MS", "20000").toLong)
    for (n <- Bench.headline.take(2); _ <- 1 to 2)
      try once(n) catch { case _: Throwable => () }

    val names = if (args.nonEmpty) args.toSeq else Bench.headline
    names.foreach { name =>
      once(name)
      var best = (1 to 5).map(_ => once(name)).sorted
      var attempts = 1
      while (best.last / best.head > 1.35 && attempts < 4) {
        Thread.sleep(8000)
        val retry = (1 to 5).map(_ => once(name)).sorted
        if (retry(retry.size / 2) < best(best.size / 2)) best = retry
        attempts += 1
      }
      println(f"$name%-28s median=${best(best.size / 2)}%.3f  min=${best.head}%.3f  all=${best.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
