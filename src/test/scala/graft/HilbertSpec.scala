package graft

import graft.functions.Hilbert
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Hilbert curve correctness (bijection + unit-step locality, the
  * HilbertCurve2D contract) and the end-to-end data-skipping win:
  * a spatial window query over Hilbert-clustered parquet reads far
  * fewer rows out of the scan than over randomly-laid-out parquet.
  */
class HilbertSpec extends SparkSpec {

  test("xy2d/d2xy are inverse bijections with unit-step locality") {
    val order = 6 // 64x64
    val n = 1L << order
    // bijection via full roundtrip
    var d = 0L
    var prev: (Long, Long) = null
    val seen = new java.util.HashSet[Long]()
    while (d < n * n) {
      val (x, y) = Hilbert.d2xy(order, d)
      assert(Hilbert.xy2d(order, x, y) == d, s"roundtrip failed at d=$d")
      assert(seen.add(x * n + y), s"cell revisited at d=$d")
      // consecutive indexes are Manhattan-adjacent cells
      if (prev != null)
        assert(math.abs(x - prev._1) + math.abs(y - prev._2) == 1,
          s"non-unit step at d=$d")
      prev = (x, y)
      d += 1
    }
  }

  test("clustered parquet prunes a window query that random layout cannot") {
    val order = 10 // 1024x1024 grid
    val pts = spark.range(200000).select(
      (abs(hash(col("id"), lit(1))) % 1024).cast("long").as("x"),
      (abs(hash(col("id"), lit(2))) % 1024).cast("long").as("y"),
      col("id").as("payload"))

    val dir = java.nio.file.Files.createTempDirectory("graft-hilbert").toString
    // force many row groups so skipping has granularity to work with
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "5000")
    Hilbert.clusterByHilbert(pts, "x", "y", order, 10)
      .write.mode("overwrite").parquet(s"$dir/clustered")
    pts.write.mode("overwrite").parquet(s"$dir/random")
    spark.conf.unset("spark.sql.files.maxRecordsPerFile")

    def scanOutputRows(path: String): (Long, Long) = {
      val q = spark.read.parquet(path)
        .filter(col("x").between(100, 140) && col("y").between(600, 640))
      val correct = q.collect().length.toLong // executes THIS plan, filling its metrics
      val scans = q.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      assert(scans.nonEmpty)
      (correct, scans.map(_.metrics("numOutputRows").value).sum)
    }

    val (nClustered, readClustered) = scanOutputRows(s"$dir/clustered")
    val (nRandom, readRandom) = scanOutputRows(s"$dir/random")
    assert(nClustered == nRandom, "layout must not change results")
    // random layout: every row group spans the full range, nothing skips;
    // hilbert layout: only row groups whose box intersects the window read
    assert(readClustered * 5 < readRandom,
      s"expected >=5x scan reduction, got clustered=$readClustered random=$readRandom")
  }
}
