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

  test("coveringRanges: complete over the whole 8-bit grid, sorted, disjoint") {
    val (aLo, aHi, bLo, bHi) = (37L, 180L, 9L, 77L)
    val ranges = ZOrder.coveringRanges(aLo, aHi, bLo, bHi,
      widthBits = 8, maxLevel = 5)
    // sorted and disjoint after the merge
    ranges.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) => assert(hi1 + 1 < lo2, "merge left adjacents")
      case _ =>
    }
    def covered(z: Long) = ranges.exists(r => z >= r._1 && z <= r._2)
    for (a <- 0L until 256L; b <- 0L until 256L) {
      val in = a >= aLo && a <= aHi && b >= bLo && b <= bHi
      if (in) assert(covered(ZOrder.interleave(a, b)),
        s"($a,$b) is in the box but outside the covering")
    }
    // the covering is also TIGHT enough to prune: most of the grid
    // stays outside it
    val covd = (for (a <- 0L until 256L; b <- 0L until 256L
      if covered(ZOrder.interleave(a, b))) yield 1).size
    assert(covd < 256 * 256 / 2, s"covering spans $covd of 65536 cells")
  }

  test("z-range pruning end to end: skipped files provably hold no matches") {
    val orders = T(spark, sfDir, "orders")
    val r = orders.agg(
      min("o_orderkey").cast("double"), max("o_orderkey").cast("double"),
      min("o_custkey").cast("double"), max("o_custkey").cast("double")).collect()(0)
    val (loA, hiA, loB, hiB) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    def scale(v: Double, lo: Double, hi: Double): Long =
      math.floor((v - lo) / math.max(hi - lo, 1.0) * 65535.0).toLong
    def scaledCol(c: String, lo: Double, hi: Double) =
      floor((col(c).cast("double") - lit(lo)) /
        lit(math.max(hi - lo, 1.0)) * lit(65535.0)).cast("long")

    val base = java.nio.file.Files.createTempDirectory("graft_zrange").toString
    orders.withColumn("z", ZOrder.interleaveBits(
        scaledCol("o_orderkey", loA, hiA), scaledCol("o_custkey", loB, hiB)))
      .repartitionByRange(8, col("z")).sortWithinPartitions("z")
      .write.mode("overwrite").parquet(base)

    // query box in ORIGINAL key space; scaling is monotone, so the
    // scaled box over-covers and the exact predicate compensates
    val (okLo, okHi, ckLo, ckHi) = (1000L, 2000L, 30L, 60L)
    val ranges = ZOrder.coveringRanges(
      scale(okLo.toDouble, loA, hiA), scale(okHi.toDouble, loA, hiA),
      scale(ckLo.toDouble, loB, hiB), scale(ckHi.toDouble, loB, hiB))
    val files = new java.io.File(base).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    val kept = files.filter { f =>
      val mm = spark.read.parquet(f)
        .agg(min("z").cast("long"), max("z").cast("long")).collect()(0)
      ranges.exists(rg => rg._1 <= mm.getLong(1) && rg._2 >= mm.getLong(0))
    }
    assert(kept.size < files.size,
      s"no file skipped (${files.size} files) — the layout test proves nothing")
    def boxRows(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("o_orderkey").between(okLo, okHi) &&
          col("o_custkey").between(ckLo, ckHi))
        .select("o_orderkey", "o_custkey")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // reading ONLY the kept files returns exactly the full-scan answer
    assert(boxRows(spark.read.parquet(kept: _*)) ==
      boxRows(spark.read.parquet(base)))
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
