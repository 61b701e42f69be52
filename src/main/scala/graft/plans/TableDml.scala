package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TableModify DML surface (ref: rel/core/TableModify.java:1-313 —
  * INSERT/UPDATE/DELETE/MERGE; executed by EnumerableTableModify.java
  * against ModifiableTable): copy-on-write over a parquet table path.
  *
  * Shape: read → transform → write to a shadow directory → atomic-ish
  * directory swap. Each operation is one distributed pass — the
  * transform is a plain Catalyst plan, so UPDATE's SET expressions and
  * MERGE's join run codegen'd and partition-parallel. What this
  * deliberately does NOT provide is transactional concurrency (a table
  * format — Delta/Iceberg — adds the commit protocol; the operator
  * semantics here are the reference's, which is also single-writer).
  * At 100 TB the rewrite cost is bounded by touched data if the table
  * is partitioned and the predicate prunes partitions — Spark only
  * rewrites what the plan reads when `cond` aligns with partition
  * columns (scale note: pair with partitioned layouts).
  */
object TableDml {

  /** INSERT INTO path VALUES rows. */
  def insertInto(spark: SparkSession, path: String, rows: DataFrame): Unit =
    rows.write.mode("append").parquet(path)

  /** UPDATE path SET assignments WHERE cond; returns updated-row count. */
  def update(spark: SparkSession, path: String, cond: Column,
      set: Map[String, Column]): Long = {
    val cur = spark.read.parquet(path)
    val n = cur.filter(cond).count()
    val updated = cur.select(cur.columns.map { c =>
      set.get(c) match {
        case Some(v) => when(cond, v).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }: _*)
    swapIn(spark, path, updated)
    n
  }

  /** DELETE FROM path WHERE cond; returns deleted-row count. */
  def delete(spark: SparkSession, path: String, cond: Column): Long = {
    val cur = spark.read.parquet(path)
    val n = cur.filter(cond).count()
    swapIn(spark, path, cur.filter(!coalesce(cond, lit(false))))
    n
  }

  /** MERGE INTO path USING source ON key: upsert form — matched target
    * rows are replaced by the source row, unmatched source rows are
    * inserted, untouched target rows kept. Duplicate source keys are a
    * cardinality violation (the reference/SQL-standard MERGE error). */
  def merge(spark: SparkSession, path: String, source: DataFrame,
      key: String): Unit = {
    val dups = source.groupBy(col(key)).count().filter(col("count") > 1).count()
    require(dups == 0, s"MERGE: $dups duplicate source keys (cardinality violation)")
    val t = spark.read.parquet(path)
    require(t.columns.sameElements(source.columns),
      "MERGE upsert form requires identical schemas")
    val s = source.select(source.columns.map(c => col(c).as(s"__s_$c")): _*)
    val joined = t.join(s, t(key) === col(s"__s_$key"), "full")
    val out = joined.select(t.columns.map { c =>
      when(col(s"__s_$key").isNotNull, col(s"__s_$c")).otherwise(t(c)).as(c)
    }: _*)
    swapIn(spark, path, out)
  }

  /** Materialize `next` beside `path`, then swap directories. */
  private def swapIn(spark: SparkSession, path: String, next: DataFrame): Unit = {
    val tmp = path + ".__dml_tmp"
    next.write.mode("overwrite").parquet(tmp)
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(path), true)
    if (!fs.rename(new Path(tmp), new Path(path)))
      throw new java.io.IOException(s"DML commit failed: rename $tmp -> $path")
  }
}
