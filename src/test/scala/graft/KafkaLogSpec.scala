package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.sources.GraftKafkaLog
import graft.streaming.KafkaShaped

/** End-to-end streaming consumption through the graft-kafka DSv2 source:
  * a real MicroBatchStream with Kafka's wire schema and per-partition
  * offset semantics, driven topic → converter → result, including an
  * exactly-once checkpoint resume. */
class KafkaLogSpec extends SparkSpec {

  private def record(key: String, v: String, ts: Long) =
    s"""{"key": "$key", "value": $v, "ts": $ts}"""

  test("graft-kafka: consume a topic end-to-end through the row converter") {
    val dir = Files.createTempDirectory("kafka-log").toFile.getAbsolutePath
    GraftKafkaLog.append(dir, "orders", 0, Seq(
      record("a", """{"id": 1, "amt": 10}""", 1000),
      record("b", """{"id": 2, "amt": 20}""", 2000)))
    GraftKafkaLog.append(dir, "orders", 1, Seq(
      record("c", """{"id": 3, "amt": 30}""", 3000)))

    val wire = spark.readStream.format("graft-kafka")
      .option("path", dir).option("topic", "orders").load()
    assert(wire.schema == GraftKafkaLog.wireSchema)

    val valueSchema = StructType(Seq(
      StructField("id", LongType), StructField("amt", LongType)))
    // file sink: the one built-in sink that supports checkpoint RESUME
    def runOnce(): Unit = {
      val q = KafkaShaped.convert(wire, valueSchema)
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    runOnce()
    val got = spark.read.parquet(s"$dir/out")
      .select("topic", "partition", "offset", "id", "amt")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._2, t._3))
    assert(got.toSeq == Seq(
      ("orders", 0, 0L, 1L, 10L),
      ("orders", 0, 1L, 2L, 20L),
      ("orders", 1, 0L, 3L, 30L)), got.toSeq)

    // append AFTER the first run; the checkpoint resumes exactly-once
    GraftKafkaLog.append(dir, "orders", 0, Seq(
      record("d", """{"id": 4, "amt": 40}""", 4000)))
    runOnce()
    val resumed = spark.read.parquet(s"$dir/out")
      .select("id").collect().map(_.getLong(0)).toSeq.sorted
    assert(resumed == Seq(1L, 2L, 3L, 4L), s"exactly-once resume broken: $resumed")
  }

  test("graft-kafka: startingOffsets latest skips existing history") {
    val dir = Files.createTempDirectory("kafka-log2").toFile.getAbsolutePath
    GraftKafkaLog.append(dir, "t", 0, Seq(record("old", "1", 1)))
    val wire = spark.readStream.format("graft-kafka")
      .option("path", dir).option("topic", "t")
      .option("startingOffsets", "latest").load()
    val q = wire.select(col("offset"))
      .writeStream.format("memory").queryName("kafka_latest")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.table("kafka_latest").count() == 0)
  }

  test("graft-kafka: BATCH read of the full log (the connector's earliest→latest batch mode)") {
    val dir = Files.createTempDirectory("kafka-log").toFile.getAbsolutePath
    GraftKafkaLog.append(dir, "b", 0, Seq(record("k0", "1", 100), record("k1", "2", 200)))
    GraftKafkaLog.append(dir, "b", 1, Seq(record("k2", "3", 300)))
    val df = spark.read.format("graft-kafka")
      .option("path", dir).option("topic", "b").load()
    assert(df.schema.fieldNames.toSeq == Seq(
      "key", "value", "topic", "partition", "offset", "timestamp", "timestampType"))
    assert(df.count() == 3)
    assert(df.select(max(col("partition"))).head.getInt(0) == 1)
  }

  test("model file mounts a kafka table type onto the DSv2 log source") {
    val dir = Files.createTempDirectory("kafka-log").toFile.getAbsolutePath
    GraftKafkaLog.append(dir, "clicks", 0, Seq(record("u1", "7", 500)))
    graft.catalog.ModelLoader.load(spark, graft.catalog.Model("m",
      tables = Seq(graft.catalog.TableDef("clicks_t", "kafka", s"$dir:clicks"))))
    val rows = spark.sql(
      "SELECT CAST(key AS STRING) k, partition, offset FROM clicks_t").collect()
    assert(rows.map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq ==
      Seq(("u1", 0, 0L)))
  }
}
