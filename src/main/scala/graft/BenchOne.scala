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
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val names = if (args.nonEmpty) args.toSeq else Bench.headline
    names.foreach { name =>
      once(name)
      val times = (1 to 3).map(_ => once(name)).sorted
      println(f"$name%-28s median=${times(1)}%.3f  all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
