package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector demo (SURVEY §2.2): a headered-CSV
  * TableProvider with BOTH scan-time optimizations the V2 API offers —
  * `SupportsPushDownFilters` (comparison/null predicates evaluate inside
  * the reader; Spark re-applies only what we decline) and
  * `SupportsPushDownRequiredColumns` (only projected columns are parsed).
  * This is the pattern the reference's adapters implement on their own
  * algebra (arrow/.../ArrowRules.java pushes projects/filters into the
  * Arrow scan; file/.../CsvTranslatableTable.java the CSV analog).
  *
  * Scale shape: the file splits into byte-range partitions (default 4,
  * option `partitions`) exactly like Hadoop text splits — each reader
  * seeks to the first full line past its start offset and reads through
  * the first line ending past its end offset, so workers scan disjoint
  * ranges with no coordination and no driver-side row handling.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.GraftCsv")
  *     .option("schema", "id:long,name:string,price:double")
  *     .load("/path/file.csv")
  * }}}
  */
class GraftCsv extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftCsv.schemaOf(options.get("schema"))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new GraftCsvTable(GraftCsv.pathsOf(opts), schema,
      math.max(1, opts.getInt("partitions", 4)))
  }
}

object GraftCsv {
  private[sources] def schemaOf(spec: String): StructType = {
    require(spec != null, "graft-csv requires .option(\"schema\", \"name:type,...\")")
    StructType(spec.split(",").map { f =>
      val Array(n, t) = f.trim.split(":")
      val dt = t.trim.toLowerCase match {
        case "int" | "integer" => IntegerType
        case "long" | "bigint" => LongType
        case "double" => DoubleType
        case "string" | "varchar" => StringType
        case other => throw new IllegalArgumentException(s"graft-csv: unsupported type $other")
      }
      StructField(n.trim, dt)
    })
  }

  /** `load(p)` arrives under "path"; `load(p1, p2, ...)` as a JSON
    * string array under "paths" (elements may carry \-escapes) — every
    * file participates in the scan, each split by byte range. */
  private[sources] def pathsOf(opts: CaseInsensitiveStringMap): Seq[String] = {
    val ps = Option(opts.get("path")).map(Seq(_))
      .orElse(Option(opts.get("paths")).map(parseJsonStringArray))
      .getOrElse(throw new IllegalArgumentException("graft-csv: no path given"))
    require(ps.nonEmpty, "graft-csv: empty path list")
    ps
  }

  /** Minimal parser for the `["a","b"]` string-array encoding Spark uses
    * for the `paths` option (elements may contain escaped quotes). */
  private[sources] def parseJsonStringArray(s: String): Seq[String] = {
    val t = s.trim
    require(t.startsWith("[") && t.endsWith("]"), s"graft-csv: malformed paths option: $s")
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var i = 1
    var inStr = false
    while (i < t.length - 1) {
      val c = t.charAt(i)
      if (inStr) c match {
        case '\\' if i + 1 < t.length - 1 =>
          sb.append(t.charAt(i + 1)); i += 1
        case '"' => out += sb.toString; sb.clear(); inStr = false
        case other => sb.append(other)
      } else if (c == '"') inStr = true
      i += 1
    }
    out.toSeq
  }
}

private[sources] class GraftCsvTable(paths: Seq[String], schema: StructType, parts: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft-csv:${paths.mkString(",")}"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftCsvScanBuilder(paths, schema, parts)
}

private[sources] class GraftCsvScanBuilder(paths: Seq[String], schema: StructType, parts: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = schema
  private var pushed: Array[Filter] = Array.empty

  private def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual | _: IsNotNull => true
    case _ => false
  }

  /** Keep the comparisons we can evaluate in the reader; everything else
    * returns to Spark as a residual. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition(supported)
    pushed = ours
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new GraftCsvScan(paths, schema, required, pushed, parts)
}

private[sources] class GraftCsvScan(
    paths: Seq[String], full: StructType, required: StructType,
    pushed: Array[Filter], parts: Int) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftCsvScan PushedFilters: ${pushed.mkString("[", ", ", "]")}, " +
      s"ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] = {
    // `parts` is the TOTAL split budget; each file gets byte-range
    // splits of ~totalLen/parts (at least one per non-empty file) — the
    // Hadoop multi-file split convention
    val lens = paths.map(p => p -> new java.io.File(p).length())
    val total = lens.map(_._2).sum
    val chunk = math.max(1L, (total + parts - 1) / parts)
    lens.flatMap { case (path, len) =>
      val n = math.max(1L, (len + chunk - 1) / chunk)
      (0L until n).map(i =>
        GraftCsvPartition(path, i * chunk, math.min(len, (i + 1) * chunk)))
        .filter(p => p.start < p.end)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftCsvReaderFactory(full, required, pushed)
}

private[sources] case class GraftCsvPartition(path: String, start: Long, end: Long)
    extends InputPartition

private[sources] class GraftCsvReaderFactory(
    full: StructType, required: StructType, pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftCsvReader(partition.asInstanceOf[GraftCsvPartition], full, required, pushed)
}

/** Byte-range reader: seeks to the first full line after `start` (or
  * skips the header at offset 0), stops after the first newline at or
  * past `end`. Parses ONLY the required columns; applies the pushed
  * filters before emitting — the V2 contract that makes `PushedFilters`
  * in the plan an execution fact, not an annotation.
  *
  * Lines are read as raw bytes and decoded UTF-8 (RandomAccessFile
  * .readLine decodes Latin-1 and would corrupt multi-byte values);
  * fields follow RFC 4180 quoting ("" escapes a quote inside a quoted
  * field). Embedded newlines inside quoted fields are NOT supported —
  * byte-range splits cannot re-find record boundaries under them. */
private[sources] class GraftCsvReader(
    p: GraftCsvPartition, full: StructType, required: StructType, pushed: Array[Filter])
    extends PartitionReader[InternalRow] {

  private val fis = new java.io.FileInputStream(p.path)
  private val in = new java.io.BufferedInputStream(fis, 1 << 16)
  private var pos: Long = if (p.start == 0) 0L else p.start - 1
  locally {
    // At offset 0 the skipped line is the header; elsewhere the Hadoop
    // split convention — back up one byte and consume through the next
    // newline, so a line STARTING exactly at p.start stays ours (the
    // previous reader stops once its pointer reaches its end).
    fis.getChannel.position(pos)
    readLine()
  }
  private val fieldIdx = full.fields.map(_.name).zipWithIndex.toMap
  private val outIdx = required.fields.map(f => fieldIdx(f.name))
  private var current: Array[String] = _

  /** One line as UTF-8, consuming through '\n'; strips a trailing '\r';
    * null at EOF. Advances `pos` by the exact byte count consumed. */
  private def readLine(): String = {
    var b = in.read()
    if (b < 0) return null
    val buf = new java.io.ByteArrayOutputStream(128)
    var consumed = 0L
    while (b >= 0 && b != '\n') { buf.write(b); consumed += 1; b = in.read() }
    if (b == '\n') consumed += 1
    pos += consumed
    val bytes = buf.toByteArray
    val n = if (bytes.nonEmpty && bytes.last == '\r') bytes.length - 1 else bytes.length
    new String(bytes, 0, n, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** RFC 4180 field split: commas inside double-quoted fields don't
    * separate; `""` inside a quoted field is a literal quote. */
  private def parse(line: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var i = 0
    var inQ = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { sb.append('"'); i += 1 }
          else inQ = false
        } else sb.append(c)
      } else c match {
        case '"' => inQ = true
        case ',' => out += sb.toString; sb.clear()
        case other => sb.append(other)
      }
      i += 1
    }
    out += sb.toString
    out.toArray
  }

  private def typed(name: String, raw: Array[String]): Any = {
    val v = raw(fieldIdx(name))
    if (v.isEmpty) null
    else full(fieldIdx(name)).dataType match {
      case IntegerType => v.toInt
      case LongType => v.toLong
      case DoubleType => v.toDouble
      case _ => v
    }
  }

  private def cmp(name: String, value: Any, raw: Array[String]): Option[Int] = {
    val l = typed(name, raw)
    if (l == null) None
    else Some(l match {
      case i: Int => java.lang.Integer.compare(i, value.asInstanceOf[Number].intValue)
      case i: Long => java.lang.Long.compare(i, value.asInstanceOf[Number].longValue)
      case d: Double => java.lang.Double.compare(d, value.asInstanceOf[Number].doubleValue)
      case s: String => s.compareTo(value.toString)
    })
  }

  private def eval(f: Filter, raw: Array[String]): Boolean = f match {
    case EqualTo(a, v) => cmp(a, v, raw).contains(0)
    case GreaterThan(a, v) => cmp(a, v, raw).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(a, v, raw).exists(_ >= 0)
    case LessThan(a, v) => cmp(a, v, raw).exists(_ < 0)
    case LessThanOrEqual(a, v) => cmp(a, v, raw).exists(_ <= 0)
    case IsNotNull(a) => raw(fieldIdx(a)).nonEmpty
    case _ => true
  }

  override def next(): Boolean = {
    while (pos < p.end) {
      val line = readLine()
      if (line == null) return false
      if (line.nonEmpty) {
        val raw = parse(line)
        if (raw.length == full.length && pushed.forall(eval(_, raw))) {
          current = raw
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = {
    val vals = required.fields.map { f =>
      typed(f.name, current) match {
        case s: String => UTF8String.fromString(s)
        case other => other
      }
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def close(): Unit = in.close()
}
