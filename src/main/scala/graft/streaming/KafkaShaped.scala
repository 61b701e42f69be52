package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka-shaped stream source (ref: kafka/src/main/java/org/apache/
  * calcite/adapter/kafka/KafkaStreamTable.java:1, row converter
  * KafkaRowConverterImpl.java:1 — the adapter surfaces a Kafka topic as
  * an infinite table whose rows a converter maps to columns).
  *
  * Spark's real connector is `spark.readStream.format("kafka")`, which
  * yields the fixed wire schema below. This container has no broker (no
  * kafka jars, no network egress), so the topic side is served by
  * graft.sources.GraftKafkaLog — a full DataSourceV2 MicroBatchStream
  * (`format("graft-kafka")`) over per-partition append-only logs with
  * Kafka's exact offset semantics, checkpoint/resume included
  * (KafkaLogSpec drives it end to end). `kafkaStream` below additionally
  * wires the SAME wire schema onto the rate source for load-shaped
  * tests. Everything DOWNSTREAM (value deserialization, the converter,
  * watermarks, aggregation) is the production code path either way;
  * swapping in the real broker is a one-line source change.
  *
  * Scale: parse/convert are per-row narrow operations (codegen'd
  * from_json, no shuffle); partition count follows the source (with a
  * broker, one Spark partition per topic partition).
  */
object KafkaShaped {

  /** The connector's fixed wire schema (key/value are opaque bytes). */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** A Kafka-wire-shaped stream fed by the built-in rate source: each
    * tick becomes one record on `topic`, the JSON value carrying the
    * tick's id. Stand-in for `readStream.format("kafka")`. */
  def kafkaStream(spark: SparkSession, topic: String, rowsPerSecond: Int = 100,
      numPartitions: Int = 4): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toLong)
      .option("numPartitions", numPartitions.toLong)
      .load()
      .select(
        col("value").cast(StringType).cast(BinaryType).as("key"),
        to_json(struct(col("value").as("id"), col("timestamp").as("ts")))
          .cast(BinaryType).as("value"),
        lit(topic).as("topic"),
        (col("value") % numPartitions).cast(IntegerType).as("partition"),
        col("value").as("offset"),
        col("timestamp"),
        lit(0).as("timestampType"))

  /** Wrap an existing stream (e.g. a MemoryStream-backed Dataset in
    * tests) into the wire schema. `valueJson` becomes the record value;
    * offsets are per-partition positions supplied by the caller. */
  def wrap(df: DataFrame, topic: String, keyCol: Column, valueJson: Column,
      timeCol: Column, partition: Column, offset: Column): DataFrame =
    df.select(
      keyCol.cast(StringType).cast(BinaryType).as("key"),
      valueJson.cast(BinaryType).as("value"),
      lit(topic).as("topic"),
      partition.cast(IntegerType).as("partition"),
      offset.cast(LongType).as("offset"),
      timeCol.cast(TimestampType).as("timestamp"),
      lit(0).as("timestampType"))

  /** The row converter (KafkaRowConverterImpl analog): deserialize the
    * binary value as JSON against `valueSchema`, keep the Kafka
    * metadata columns. Codegen'd from_json — no UDF in the hot path. */
  def convert(wire: DataFrame, valueSchema: StructType): DataFrame =
    wire.select(
      col("topic"), col("partition"), col("offset"), col("timestamp"),
      from_json(col("value").cast(StringType), valueSchema).as("v"))
      .select(col("topic"), col("partition"), col("offset"), col("timestamp"), col("v.*"))
}
