package graft

import graft.sources.Compaction
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  test("compaction collapses many small files into few; data identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // simulate micro-batch accretion: 64 tiny files
    T(spark, sfDir, "orders").repartition(64)
      .write.mode("overwrite").parquet(s"$dir/small")
    val (before, after) = Compaction.compact(spark, s"$dir/small", s"$dir/big",
      targetBytes = 8L * 1024 * 1024)
    assert(before >= 64, s"expected >=64 input files, got $before")
    assert(after < before / 8, s"expected >=8x fewer files, got $after from $before")
    val a = spark.read.parquet(s"$dir/small").orderBy("o_orderkey").collect()
    val b = spark.read.parquet(s"$dir/big").orderBy("o_orderkey").collect()
    assert(a.map(_.toSeq).sameElements(b.map(_.toSeq)))
  }

  test("clustered compaction keeps per-file min/max ranges tight") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact2").toString
    T(spark, sfDir, "orders").repartition(32)
      .write.mode("overwrite").parquet(s"$dir/small")
    Compaction.compactClustered(spark, s"$dir/small", s"$dir/sorted",
      "o_orderkey", targetBytes = 2L * 1024 * 1024)
    // a narrow key-range query over the clustered rewrite reads fewer
    // rows out of the scan than over the unclustered small files
    def scanRows(path: String): Long = {
      val q = spark.read.parquet(path).filter(col("o_orderkey").between(100, 200))
      q.collect()
      q.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value
      }.sum
    }
    val clustered = scanRows(s"$dir/sorted")
    val scattered = scanRows(s"$dir/small")
    assert(clustered <= scattered,
      s"clustered rewrite must not read more: $clustered vs $scattered")
  }
}
