package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stream-stream joins and arbitrary stateful processing
  * (ref: SURVEY.md §2.11 — DeltaJoinTransposeRule for stream joins;
  * flatMapGroupsWithState is the engine for MATCH_RECOGNIZE-on-streams).
  */
class StreamingAdvancedSpec extends SparkSpec {

  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-stream2")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  private def rawSchema = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet").schema
  }
  private def fixTs(df: org.apache.spark.sql.DataFrame) =
    T.normalizeTimestamps(df)
  private def stream() = fixTs(StreamOps.parquetStream(spark, streamDir, rawSchema))
  private def batch() = fixTs {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  test("stream-static join == batch join") {
    val tiers = batch().select(col("user_id")).distinct()
      .withColumn("tier", pmod(col("user_id"), lit(3)))
    val joined = stream().join(tiers, "user_id")
      .groupBy(col("tier")).agg(count(lit(1)).as("n"))
    val got = StreamOps.runToMemory(spark, joined, "ss_static", outputMode = "complete")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = batch().join(tiers, "user_id")
      .groupBy(col("tier")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
  }

  test("streaming dedup keeps one row per key and matches batch distinct keys") {
    // duplicate every event_type on purpose: dedup key = (user_id % 5)
    val keyed = stream().withColumn("k", pmod(col("user_id"), lit(5)))
    val deduped = StreamOps.dedupStream(keyed, Seq("k"),
      eventTimeCol = Some("ts"), watermarkDelay = "1 hour")
    val got = StreamOps.runToMemory(spark, deduped, "ss_dedup")
      .select("k").collect().map(_.getLong(0)).toSeq
    // exactly one survivor per distinct key (all duplicates arrive well
    // inside the watermark in a single replay)
    assert(got.sorted == got.distinct.sorted)
    val expect = batch().withColumn("k", pmod(col("user_id"), lit(5)))
      .select("k").distinct().collect().map(_.getLong(0)).toSet
    assert(got.toSet == expect)

    // batch fallback: same operator, non-streaming input
    val b = StreamOps.dedupStream(
      batch().withColumn("k", pmod(col("user_id"), lit(5))), Seq("k"))
    assert(b.select("k").collect().map(_.getLong(0)).toSet == expect)
  }

  test("stream-stream time-interval join matches the batch range join") {
    val purchases = stream().filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 minute")
    val clicks = stream().filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 minute")
    val cond = purchases("user_id") === clicks("user_id") &&
      clicks("c_ts") >= purchases("p_ts") - expr("INTERVAL 10 MINUTES") &&
      clicks("c_ts") <= purchases("p_ts")
    val ssj = purchases.join(clicks, cond).select("p_id", "c_id")
    val got = StreamOps.runToMemory(spark, ssj, "ss_join").count()

    val bp = batch().filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val bc = batch().filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("c_id"), col("ts").as("c_ts"))
    val expect = bp.join(bc, col("pu") === col("cu") &&
      col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
      col("c_ts") <= col("p_ts")).count()
    assert(got == expect, s"stream-stream join $got vs batch $expect")
  }

  test("flatMapGroupsWithState running counter ends at the batch counts") {
    import spark.implicits._
    val typed = stream().select(col("user_id"), col("value")).as[(Long, Double)]
    def fn(key: Long, rows: Iterator[(Long, Double)],
        state: GroupState[Long]): Iterator[(Long, Long)] = {
      val n = state.getOption.getOrElse(0L) + rows.size
      state.update(n)
      Iterator.single(key -> n)
    }
    val counted = typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
      .toDF("user_id", "n")
    val got = StreamOps.runToMemory(spark, counted, "ss_state", outputMode = "update")
    // take the last emitted count per user (memory sink keeps all updates)
    val finalCounts = got.groupBy(col("user_id")).agg(max(col("n")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expect = batch().groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(finalCounts == expect)
  }
}
