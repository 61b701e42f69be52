package graft

import graft.streaming.{StreamOps, StreamSql}
import org.apache.spark.sql.functions._

/** SELECT STREAM surface (stream.iq semantics): keyword routing to the
  * stream catalog, delta ≡ relation once drained, the "not a stream"
  * error, and monotonic-aggregation enforcement via Spark's own
  * streaming checker.
  */
class StreamSqlSpec extends SparkSpec {

  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-streamsql")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  private def rawEvents = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    T.normalizeTimestamps(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  private def register(): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    StreamSql.registerStream("events_s",
      T.normalizeTimestamps(StreamOps.parquetStream(spark, streamDir, schema)))
  }

  test("SELECT STREAM projection+filter: drained delta equals the batch relation") {
    register()
    val out = StreamSql.sql(spark,
      "SELECT STREAM event_id, event_type FROM events_s WHERE value > 50")
    assert(out.isStreaming, "STREAM query must return a streaming DataFrame")
    val got = StreamOps.runToMemory(spark, out, "stream_sql_pf")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = rawEvents.filter(col("value") > 50)
      .select("event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want)
  }

  test("SELECT STREAM with a windowed aggregate runs incrementally") {
    register()
    val out = StreamSql.sql(spark, """
      SELECT STREAM window(ts, '1 hour').start AS ws, count(*) AS n
      FROM events_s GROUP BY window(ts, '1 hour')""")
    val got = StreamOps.runToMemory(spark, out, "stream_sql_win", outputMode = "complete")
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(got == rawEvents.count())
  }

  test("STREAM over a non-stream name errors; stream-only name without STREAM errors") {
    register()
    rawEvents.createOrReplaceTempView("events_static")
    val e1 = intercept[IllegalArgumentException](
      StreamSql.sql(spark, "SELECT STREAM * FROM events_static"))
    assert(e1.getMessage.contains("is a registered stream"))
    // stream-only name (no static temp view of that name) without STREAM
    spark.catalog.dropTempView("events_s")
    val e2 = intercept[IllegalArgumentException](
      StreamSql.sql(spark, "SELECT event_id FROM events_s"))
    assert(e2.getMessage.contains("stream-only"))
  }

  test("non-monotonic streaming aggregate is rejected at start (stream.iq error contract)") {
    register()
    val out = StreamSql.sql(spark,
      "SELECT STREAM event_type, count(*) AS n FROM events_s GROUP BY event_type")
    // ungrouped-by-time aggregate in append mode: Spark's
    // UnsupportedOperationChecker raises before any data moves — the
    // same lifecycle point as the reference's validator error
    intercept[Exception] {
      val q = out.writeStream.format("memory")
        .queryName("stream_sql_bad").outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
  }
}
