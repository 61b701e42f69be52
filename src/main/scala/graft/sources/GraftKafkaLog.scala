package graft.sources

import java.io.{File, RandomAccessFile}
import java.nio.charset.StandardCharsets
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Kafka-semantics streaming source without a broker (ref:
  * kafka/src/main/java/org/apache/calcite/adapter/kafka/
  * KafkaStreamTable.java:1-125 — the reference adapter surfaces a topic
  * as an infinite table; its consumer is the unportable piece in this
  * offline container, the SEMANTICS are not).
  *
  * A topic is a directory of per-partition append-only JSONL logs
  * (`<topic>-p<k>.jsonl`, one record per line, offset = line number) —
  * exactly Kafka's per-partition contract: monotonically increasing
  * offsets, replayable [start, end) ranges, one Spark input partition
  * per topic partition. The source is a full DataSourceV2
  * MicroBatchStream: `spark.readStream.format("graft-kafka")
  * .option("path", dir).option("topic", t)` yields the SAME seven-column
  * wire schema as Spark's Kafka connector (key, value, topic,
  * partition, offset, timestamp, timestampType), so everything
  * downstream — graft.streaming.KafkaShaped.convert, watermarks,
  * aggregation — is production-identical, and offsets checkpoint/resume
  * exactly-once through Spark's streaming engine.
  *
  * Record line format: `{"key": "...", "value": {...}, "ts": epochMs}`.
  * Scale: discovery reads file lengths only; readers stream their line
  * range — no driver materialization, no shuffle at the source.
  */
class GraftKafkaLog extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-kafka"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftKafkaLog.wireSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-kafka: 'path' option is required"))
    val topic = Option(opts.get("topic")).getOrElse(
      throw new IllegalArgumentException("graft-kafka: 'topic' option is required"))
    val starting = Option(opts.get("startingOffsets")).getOrElse("earliest")
    new KafkaLogTable(path, topic, starting)
  }
}

object GraftKafkaLog {
  val wireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Partition files of `topic` under `dir`, keyed by partition id. */
  private[sources] def partitionFiles(dir: String, topic: String): Map[Int, File] = {
    val re = (java.util.regex.Pattern.quote(topic) + "-p(\\d+)\\.jsonl").r
    Option(new File(dir).listFiles()).getOrElse(Array.empty).flatMap { f =>
      f.getName match {
        case re(p) => Some(p.toInt -> f)
        case _ => None
      }
    }.toMap
  }

  private[sources] def lineCount(f: File): Long = {
    val in = new java.io.BufferedInputStream(new java.io.FileInputStream(f))
    try {
      var n = 0L
      var last = -1
      var c = in.read()
      while (c >= 0) { if (c == '\n') n += 1; last = c; c = in.read() }
      if (last >= 0 && last != '\n') n + 1 else n // unterminated final line
    } finally in.close()
  }

  /** Append records to a topic partition log (test/ingest helper — the
    * producer side of the contract). */
  def append(dir: String, topic: String, partition: Int, lines: Seq[String]): Unit = {
    val f = new File(dir, s"$topic-p$partition.jsonl")
    val out = new java.io.FileOutputStream(f, true)
    try lines.foreach(l => out.write((l + "\n").getBytes(StandardCharsets.UTF_8)))
    finally out.close()
  }
}

private[sources] class KafkaLogTable(path: String, topic: String, starting: String)
    extends Table with SupportsRead {
  override def name: String = s"graft-kafka:$topic"
  override def schema: StructType = GraftKafkaLog.wireSchema
  override def capabilities: java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = GraftKafkaLog.wireSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new KafkaLogMicroBatch(path, topic, starting)
        // batch = the full current log, like the Kafka connector's
        // earliest→latest batch mode (ModelLoader's `kafka` table type)
        override def toBatch(): org.apache.spark.sql.connector.read.Batch =
          new org.apache.spark.sql.connector.read.Batch {
            override def planInputPartitions(): Array[InputPartition] = {
              val files = GraftKafkaLog.partitionFiles(path, topic)
              files.toSeq.sortBy(_._1).map { case (p, f) =>
                KafkaLogPartition(f.getAbsolutePath, topic, p, 0L,
                  GraftKafkaLog.lineCount(f)): InputPartition
              }.toArray
            }
            override def createReaderFactory(): PartitionReaderFactory =
              new KafkaLogReaderFactory
          }
      }
    }
}

/** Per-partition line offsets, JSON round-tripped for the checkpoint. */
private[sources] case class KafkaLogOffset(parts: Map[Int, Long]) extends Offset {
  override def json(): String =
    parts.toSeq.sortBy(_._1).map { case (p, o) => s""""$p":$o""" }
      .mkString("{", ",", "}")
}

private[sources] object KafkaLogOffset {
  def fromJson(s: String): KafkaLogOffset = KafkaLogOffset(
    "\"(\\d+)\"\\s*:\\s*(\\d+)".r.findAllMatchIn(s)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
}

private[sources] class KafkaLogMicroBatch(dir: String, topic: String, starting: String)
    extends MicroBatchStream {

  private def current(): KafkaLogOffset = KafkaLogOffset(
    GraftKafkaLog.partitionFiles(dir, topic).map { case (p, f) =>
      p -> GraftKafkaLog.lineCount(f)
    })

  override def initialOffset(): Offset =
    if (starting.equalsIgnoreCase("latest")) current()
    else KafkaLogOffset(GraftKafkaLog.partitionFiles(dir, topic).map { case (p, _) => p -> 0L })

  override def latestOffset(): Offset = current()

  override def deserializeOffset(json: String): Offset = KafkaLogOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KafkaLogOffset].parts
    val e = end.asInstanceOf[KafkaLogOffset].parts
    val files = GraftKafkaLog.partitionFiles(dir, topic)
    e.toSeq.sortBy(_._1).flatMap { case (p, to) =>
      val from = s.getOrElse(p, 0L)
      if (to > from && files.contains(p))
        Some(KafkaLogPartition(files(p).getAbsolutePath, topic, p, from, to): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new KafkaLogReaderFactory

  override def commit(end: Offset): Unit = {} // log files are immutable history
  override def stop(): Unit = {}
}

private[sources] case class KafkaLogPartition(
    file: String, topic: String, partition: Int, from: Long, to: Long)
  extends InputPartition

private[sources] class KafkaLogReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new KafkaLogReader(p.asInstanceOf[KafkaLogPartition])
}

/** Streams lines [from, to) of one partition log; each becomes a wire
  * row. Line-level JSON field extraction is intentionally minimal (key/
  * value/ts at the top level) — value deserialization downstream is the
  * converter's job, as in the reference's KafkaRowConverterImpl. */
private[sources] class KafkaLogReader(p: KafkaLogPartition)
    extends PartitionReader[InternalRow] {
  private val reader = new java.io.BufferedReader(new java.io.InputStreamReader(
    new java.io.FileInputStream(p.file), StandardCharsets.UTF_8))
  private var lineNo = -1L
  private var row: InternalRow = _

  // skip to the first requested offset
  while (lineNo < p.from - 1 && reader.readLine() != null) lineNo += 1

  override def next(): Boolean = {
    if (lineNo + 1 >= p.to) return false
    val line = reader.readLine()
    if (line == null) return false
    lineNo += 1
    row = toRow(line)
    true
  }

  private def toRow(line: String): InternalRow = {
    def strField(name: String): Option[String] =
      (s""""$name"\\s*:\\s*"((?:[^"\\\\]|\\\\.)*)"""").r.findFirstMatchIn(line).map(_.group(1))
    def rawField(name: String): Option[String] =
      (s""""$name"\\s*:\\s*(\\{.*?\\}|[-0-9.eE]+)""").r.findFirstMatchIn(line).map(_.group(1))
    val key = strField("key").getOrElse("")
    val value = rawField("value").orElse(strField("value")).getOrElse(line)
    val tsMs = rawField("ts").map(_.toDouble.toLong).getOrElse(0L)
    InternalRow(
      key.getBytes(StandardCharsets.UTF_8),
      value.getBytes(StandardCharsets.UTF_8),
      UTF8String.fromString(p.topic),
      p.partition,
      lineNo,
      tsMs * 1000L, // micros
      0)
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}
