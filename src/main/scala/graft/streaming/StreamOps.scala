package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** STREAM surface lowered onto Structured Streaming (ref: SURVEY.md §2.11;
  * rel/stream/Delta.java:1, StreamRules.java:57-365 — Spark's
  * IncrementalExecution performs the same Δ-pushdown automatically; the
  * TUMBLE/HOP/SESSION window TVFs of SqlStdOperatorTable.java:2606-2612 /
  * SqlWindowTableFunction.java:53-68 map to window()/session_window(),
  * with the TVF's window_start/window_end columns surfaced from the
  * window struct).
  *
  * Watermarks make the reference's "quasi-monotonic grouping" requirement
  * (stream.md:221-252) concrete: state for closed windows is dropped, so
  * a 100 TB/day stream aggregation holds constant memory per key-window.
  */
object StreamOps {

  /** A streaming Δ-source over a parquet directory (the batch table's
    * stream() view, ref: schema/StreamableTable.java). */
  def parquetStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** TUMBLE(data, timecol, size) → groupBy fixed windows.
    * Output columns: window_start, window_end, keys..., aggs... */
  def tumble(df: DataFrame, timeCol: String, size: String, watermarkDelay: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    windowed(df, window(col(timeCol), size), timeCol, watermarkDelay, keys, aggs)

  /** HOP(data, timecol, slide, size) → sliding windows. */
  def hop(df: DataFrame, timeCol: String, size: String, slide: String,
      watermarkDelay: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    windowed(df, window(col(timeCol), size, slide), timeCol, watermarkDelay, keys, aggs)

  /** SESSION(data, timecol, gap) → session windows. */
  def session(df: DataFrame, timeCol: String, gap: String, watermarkDelay: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    windowed(df, session_window(col(timeCol), gap), timeCol, watermarkDelay, keys, aggs)

  private def windowed(df: DataFrame, win: Column, timeCol: String,
      watermarkDelay: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame = {
    val src = if (df.isStreaming) df.withWatermark(timeCol, watermarkDelay) else df
    src.groupBy(win.as("w") +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("w.start"))
      .withColumn("window_end", col("w.end"))
      .drop("w")
  }

  /** Streaming exact deduplication — the streaming counterpart of the
    * batch content-hash dedup (d01): keep the first arrival per dedup
    * key. With an event-time column + watermark delay, state for keys
    * older than the watermark is dropped (bounded state at any stream
    * length — `dropDuplicatesWithinWatermark`); without one, state
    * grows with distinct keys (exact, unbounded — the batch-parity
    * mode). At 100 TB/day the watermarked form is the only viable one;
    * the key should be a content hash (md5/xxhash64), not the payload. */
  def dedupStream(df: DataFrame, keyCols: Seq[String],
      eventTimeCol: Option[String] = None,
      watermarkDelay: String = "10 minutes"): DataFrame =
    eventTimeCol match {
      case Some(tc) if df.isStreaming =>
        df.withWatermark(tc, watermarkDelay)
          .dropDuplicatesWithinWatermark(keyCols)
      case _ => df.dropDuplicates(keyCols)
    }

  /** Continuous upsert into a DML-managed parquet table: each
    * micro-batch MERGEs on `key` via TableDml (matched rows replaced,
    * new rows inserted, history versioned for time travel) — the CDC
    * apply-loop over the copy-on-write table. Dedupes the batch on
    * `key` (last row wins per batch) since MERGE requires unique
    * source keys. */
  def upsertStream(spark: SparkSession, path: String, delta: DataFrame,
      key: String): org.apache.spark.sql.streaming.StreamingQuery = {
    require(delta.isStreaming, "upsertStream needs a streaming DataFrame")
    delta.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val unique = batch.dropDuplicates(key)
          graft.plans.TableDml.merge(spark, path, unique, key)
        }
        ()
      }
      .start()
  }

  /** Run a streaming DataFrame to completion against a memory sink and
    * return the materialized result (test/batch-replay harness). */
  def runToMemory(spark: SparkSession, stream: DataFrame, name: String,
      outputMode: String = "append"): DataFrame = {
    val q = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }
}
