package graft

import graft.streaming.KafkaShaped
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka-wire-shaped source: schema parity with the real connector and
  * a working value-deserialization pipeline over a memory stream. */
class KafkaShapedSpec extends SparkSpec {
  import spark.implicits._

  // name/type parity (nullability differs for literal-built columns)
  private def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq

  test("wire schema matches the kafka connector's fixed schema") {
    val s = KafkaShaped.kafkaStream(spark, "events")
    assert(shape(s.schema) == shape(KafkaShaped.wireSchema))
    assert(s.isStreaming)
  }

  test("wrap + convert: JSON values round-trip through the binary wire format") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val wire = KafkaShaped.wrap(
      mem.toDS().toDF("id", "kind", "ts"),
      topic = "ev",
      keyCol = col("id"),
      valueJson = to_json(struct(col("id"), col("kind"))),
      timeCol = col("ts"),
      partition = col("id") % 2,
      offset = col("id"))
    assert(shape(wire.schema) == shape(KafkaShaped.wireSchema))

    val valueSchema = StructType(Seq(
      StructField("id", LongType), StructField("kind", StringType)))
    val parsed = KafkaShaped.convert(wire, valueSchema)

    val q = parsed.writeStream.format("memory").queryName("kafka_parsed")
      .outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      mem.addData((1L, "click", t0), (2L, "view", t0))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("kafka_parsed")
      .select("topic", "partition", "offset", "id", "kind")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(_._3)
    assert(rows.toSeq == Seq(("ev", 1, 1L, 1L, "click"), ("ev", 0, 2L, 2L, "view")))
  }

  test("downstream aggregation works on the converted stream (count by kind)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val wire = KafkaShaped.wrap(mem.toDS().toDF("id", "kind", "ts"), "ev",
      col("id"), to_json(struct(col("id"), col("kind"))), col("ts"), col("id") % 2, col("id"))
    val parsed = KafkaShaped.convert(wire, StructType(Seq(
      StructField("id", LongType), StructField("kind", StringType))))
    val counts = parsed.groupBy("kind").count()
    val q = counts.writeStream.format("memory").queryName("kafka_counts")
      .outputMode("complete").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      mem.addData((1L, "click", t0), (2L, "view", t0), (3L, "click", t0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("kafka_counts").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("click" -> 2L, "view" -> 1L))
  }
}
