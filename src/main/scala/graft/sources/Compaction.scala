package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction (ref: no reference analog — Calcite never
  * owns storage; this is table-maintenance the way a Spark-native
  * engine must provide it, the OPTIMIZE/bin-packing companion to
  * `plans/TableDml`'s copy-on-write writes).
  *
  * A 100 TB table accreted from streaming micro-batches or per-batch
  * DML degenerates into millions of KB-scale files: scan task count
  * explodes, footer reads dominate I/O, and the NameNode/listing cost
  * grows without bound. Compaction rewrites the data as
  * ceil(bytes/target)-many ~target-size files. We size the shuffle by
  * the REAL on-disk byte count (filesystem listing, not rowCount
  * guesses) and round-robin repartition — parquet re-encodes each
  * output with its own dictionary/stats, so files land uniformly near
  * the target with row-group pruning intact.
  */
object Compaction {

  /** On-disk data bytes + file count of a table directory. */
  def stats(spark: SparkSession, dir: String): (Long, Int) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter { f =>
      f.isFile && !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith(".")
    }
    (files.map(_.getLen).sum, files.length)
  }

  /** Rewrite `dir` (parquet) into ~targetBytes files at `outDir`.
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, dir: String, outDir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val (bytes, before) = stats(spark, dir)
    val parts = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(dir)
      .repartition(parts) // round-robin: uniform output sizes
      .write.mode("overwrite").parquet(outDir)
    (before, stats(spark, outDir)._2)
  }

  /** Compact preserving a clustering column's order (e.g. a Hilbert
    * index or event time): range-repartition + in-partition sort keeps
    * min/max pruning tight across the rewritten files. */
  def compactClustered(spark: SparkSession, dir: String, outDir: String,
      clusterCol: String, targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val (bytes, before) = stats(spark, dir)
    val parts = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(dir)
      .repartitionByRange(parts, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("overwrite").parquet(outDir)
    (before, stats(spark, outDir)._2)
  }
}
