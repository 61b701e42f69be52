package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Z-order clustering: the interleave expression against a naive
  * bit-loop reference (interpreted AND codegen paths), and the layout
  * consequence — after `ZOrder.cluster`, every output file has a
  * narrow min/max range in BOTH keys, where a single-key range layout
  * leaves the second key's per-file range at full width. That per-file
  * narrowness IS the 100 TB win: footer-stats skipping works for
  * filters on either dimension. */
class ZOrderSpec extends SparkSpec {

  private def naive(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 31) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("interleave matches the naive bit loop, including edge masks") {
    val cases = Seq[(Long, Long)]((0, 0), (1, 0), (0, 1), (1, 1),
      (0x7FFFFFFFL, 0), (0, 0x7FFFFFFFL), (0x7FFFFFFFL, 0x7FFFFFFFL),
      (6000, 150), (12345, 54321), (1L << 30, 1L << 30),
      // bits above 31 must be ignored
      (0xFFFFFFFFFFL, 3))
    cases.foreach { case (a, b) =>
      assert(ZOrder.interleave(a, b) == naive(a & 0x7FFFFFFFL, b & 0x7FFFFFFFL),
        s"interleave($a, $b)")
      assert(ZOrder.interleave(a, b) >= 0, "62-bit z is never negative")
    }
  }

  test("SQL function and codegen path agree with the Scala helper on data") {
    graft.functions.GraftFunctions.registerAll(spark)
    val rows = T(spark, sfDir, "orders")
      .selectExpr("o_orderkey", "o_custkey",
        "interleave_bits(o_orderkey, o_custkey) AS z")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == ZOrder.interleave(r.getLong(0), r.getLong(1)))
    }
  }

  test("cluster: every file is narrow in BOTH keys; single-key layout is not") {
    val orders = T(spark, sfDir, "orders")
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString

    ZOrder.cluster(orders, "o_orderkey", "o_custkey", 8)
      .write.mode("overwrite").parquet(s"$base/z")
    orders.repartitionByRange(8, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.mode("overwrite").parquet(s"$base/linear")

    def spans(dir: String): Seq[(Double, Double)] = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
      assert(files.size >= 6, s"expected ~8 files, got ${files.size}")
      val whole = orders.agg(
        max("o_orderkey").cast("double"), min("o_orderkey").cast("double"),
        max("o_custkey").cast("double"), min("o_custkey").cast("double")).collect()(0)
      val (okSpan, ckSpan) =
        (whole.getDouble(0) - whole.getDouble(1), whole.getDouble(2) - whole.getDouble(3))
      files.map { f =>
        val r = spark.read.parquet(f).agg(
          max("o_orderkey").cast("double"), min("o_orderkey").cast("double"),
          max("o_custkey").cast("double"), min("o_custkey").cast("double")).collect()(0)
        ((r.getDouble(0) - r.getDouble(1)) / okSpan,
          (r.getDouble(2) - r.getDouble(3)) / ckSpan)
      }
    }

    val z = spans(s"$base/z")
    val linear = spans(s"$base/linear")
    def avg(xs: Seq[Double]) = xs.sum / xs.size
    val (zOk, zCk) = (avg(z.map(_._1)), avg(z.map(_._2)))
    val (linOk, linCk) = (avg(linear.map(_._1)), avg(linear.map(_._2)))
    // z-order: both dimensions narrow at once
    assert(zOk < 0.7, s"z-layout orderkey span $zOk")
    assert(zCk < 0.45, s"z-layout custkey span $zCk")
    // the single-key layout only ever prunes its own key
    assert(linOk < 0.3, s"linear orderkey span $linOk")
    assert(linCk > 0.8, s"linear custkey span $linCk — " +
      "if this is narrow the comparison proves nothing")
  }
}
