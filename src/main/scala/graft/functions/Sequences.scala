package graft.functions

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** SQL sequences — NEXT_VALUE FOR / CURRENT_VALUE (ref: sql/
  * SqlSequenceValueOperator.java:1, SqlStdOperatorTable NEXT_VALUE,
  * DDL sql/ddl/SqlCreateSequence via server module; semantics in
  * core/src/test/resources/sql/sequence.iq).
  *
  * Scale design: a global ticket counter is the classic distributed
  * anti-pattern (every row would serialize on one counter). Instead
  * NEXT_VALUE over a DataFrame allocates one contiguous block per
  * partition in two passes:
  *   1. count rows per partition (a partition-id groupBy — partial
  *      aggregation, bytes of driver state);
  *   2. prefix-sum the counts into per-partition offsets, broadcast
  *      the tiny offset map, assign ids with a per-partition local
  *      counter (no shuffle of the data itself, no single-partition
  *      row_number bottleneck).
  * The session catalog advances the sequence's cursor by the total, so
  * successive calls continue where the previous statement stopped —
  * the reference's cross-statement NEXT_VALUE behavior. Values are
  * unique and dense; their assignment order across partitions is
  * partition order, which (like any parallel sequence) is arbitrary
  * but stable for a given partitioning. */
object Sequences {

  private final case class SeqDef(start: Long, step: Long, cursor: AtomicLong)
  private val catalog = new ConcurrentHashMap[String, SeqDef]()
  private val schemas = ConcurrentHashMap.newKeySet[String]()

  /** CREATE SEQUENCE name START WITH start INCREMENT BY step. */
  def create(name: String, start: Long = 1L, step: Long = 1L): Unit = {
    require(step != 0, "sequence step must be non-zero")
    val prev = catalog.putIfAbsent(name, SeqDef(start, step, new AtomicLong(0L)))
    require(prev == null, s"sequence '$name' already exists")
  }

  def drop(name: String): Unit = catalog.remove(name)

  /** Declare a schema name as a valid sequence qualifier (the fixture
    * schema of a test harness, or any app-level namespace). A qualified
    * `NEXT VALUE FOR schema.seq` resolves only when the schema is known
    * here or exists as a database in the Spark session catalog — the
    * reference's behavior of rejecting an unknown schema
    * (core/src/test/resources/sql/sequence.iq:57). */
  def registerSchema(schema: String): Unit =
    schemas.add(schema.toLowerCase(java.util.Locale.ROOT))

  def schemaKnown(schema: String): Boolean =
    schemas.contains(schema.toLowerCase(java.util.Locale.ROOT))

  /** The next value a NEXT_VALUE call would start at (start before any
    * allocation). */
  def currentValue(name: String): Long = {
    val d = definition(name)
    d.start + d.step * d.cursor.get()
  }

  /** SQL `CURRENT VALUE FOR name`: the LAST value dispensed (the
    * reference's CURRVAL semantics — sequence.iq expects 2 after a
    * two-row NEXT VALUE scan, not 3). */
  def lastValue(name: String): Long = {
    val d = definition(name)
    require(d.cursor.get() > 0, s"sequence '$name' has not been read")
    d.start + d.step * (d.cursor.get() - 1)
  }

  private def definition(name: String): SeqDef = {
    val d = catalog.get(name)
    require(d != null, s"unknown sequence '$name'")
    d
  }

  /** NEXT_VALUE FOR name, vectorized over a DataFrame: appends
    * `colName` holding one sequence value per row and advances the
    * catalog cursor by the row count. */
  def withSequence(df: DataFrame, name: String, colName: String): DataFrame = {
    val d = definition(name)
    val spark = df.sparkSession

    // Both passes run over the SAME RDD lineage so partition indices
    // line up (counting through a separate Dataset plan could see a
    // different physical partitioning).
    val rdd0 = df.rdd
    val nParts = rdd0.getNumPartitions

    // pass 1: rows per partition (tiny result, collected to the driver)
    val counts = rdd0
      .mapPartitionsWithIndex((pid, it) => Iterator(pid -> it.size.toLong))
      .collect().toMap
    val offsets = new Array[Long](nParts)
    var acc = 0L
    (0 until nParts).foreach { p => offsets(p) = acc; acc += counts.getOrElse(p, 0L) }
    val total = acc

    // reserve the block [cursor, cursor+total) atomically
    val base = d.cursor.getAndAdd(total)
    val (start, step) = (d.start, d.step)

    // pass 2: per-partition local counters, no shuffle
    val schema = df.schema.add(colName, LongType, nullable = false)
    val rdd = rdd0.mapPartitionsWithIndex { (pid, it) =>
      var i = base + offsets(pid)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ (start + step * i))
        i += 1
        out
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
