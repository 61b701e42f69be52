package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._

/** Streaming semantics: the streamed window aggregation must equal the
  * batch aggregation over the same data once the stream drains (Δ-to-
  * relation equivalence, ref: rel/stream/Chi.java). */
class StreamingSpec extends SparkSpec {

  // the file stream source needs a directory, not a single file
  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  private def rawEvents = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }
  private def fixTs(df: org.apache.spark.sql.DataFrame) =
    T.normalizeTimestamps(df)

  test("streamed tumbling window == batch tumbling window") {
    val schema = rawEvents.schema
    val stream = fixTs(StreamOps.parquetStream(spark, streamDir, schema))
    val streamed = StreamOps.tumble(stream, "ts", "1 hour", "1 minute",
      Seq(col("event_type")), Seq(count(lit(1)).as("n")))
    // complete mode: append would hold back windows the watermark never
    // passes (the stream ends, so the last hour's windows stay open)
    val got = StreamOps.runToMemory(spark, streamed, "tumble_out", outputMode = "complete")
      .select("window_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val batch = fixTs(rawEvents)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    assert(got == batch, s"stream/batch mismatch: ${(got diff batch) ++ (batch diff got)}")
  }

  test("session windows produce per-user sessions in streaming mode") {
    val schema = rawEvents.schema
    val stream = fixTs(StreamOps.parquetStream(spark, streamDir, schema))
    val sessions = StreamOps.session(stream, "ts", "30 minutes", "1 minute",
      Seq(col("user_id")), Seq(count(lit(1)).as("n")))
    val got = StreamOps.runToMemory(spark, sessions, "session_out")
    assert(got.count() > 0)
    // session windows must not overlap per user
    val rows = got.select("user_id", "window_start", "window_end")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
      .groupBy(_._1)
    rows.foreach { case (_, ws) =>
      val sorted = ws.sortBy(_._2.getTime)
      sorted.sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) => assert(!e1.after(s2))
        case _ =>
      }
    }
  }
}
