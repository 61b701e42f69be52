package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One declared operator/query from SURVEY.md §2.
  *
  * @param build  Spark-side implementation `(session, sfDir) => result`.
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same
  *               parquet tables; None → driver records a rows-only check.
  */
final case class Q(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** Table access + numeric-determinism helpers shared by every operator.
  *
  * Determinism contract with the DuckDB oracle: all SUM/AVG over the
  * double-typed money columns go through DECIMAL(12,2) so partial
  * aggregation is exact and order-independent (a plain double sum is
  * neither — its value depends on shuffle partitioning, which breaks the
  * driver's hash compare). The exact decimal is cast back to DOUBLE at
  * the end; decimal→double is a single deterministic IEEE rounding, so
  * Spark and DuckDB produce bit-identical values.
  */
object T {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def apply(s: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which Spark only reads as
    // a raw long (DuckDB truncates ns→µs, so we do the same to stay
    // oracle-identical).
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df0 = s.read.parquet(s"$dir/$name.parquet")
    // timestamp[us] without isAdjustedToUTC infers as TIMESTAMP_NTZ in
    // Spark 4; the session TZ is pinned to UTC everywhere (Bench/Verify/
    // specs), so casting back to TIMESTAMP is wall-clock identity and
    // keeps every operator (and DuckDB, which reads the same naive
    // values) on the instant-typed column they were written against.
    normalizeTimestamps(df0)
  }

  /** Normalize however the generator wrote time columns onto plain
    * TIMESTAMP: TIMESTAMP_NTZ casts over (identity under the pinned UTC
    * session TZ), and a raw-long `ts` (TIMESTAMP(NANOS) read with
    * nanosAsLong) truncates ns→µs. Streaming readers share this so the
    * batch and stream sides of every Δ≡batch spec see one schema. */
  def normalizeTimestamps(df0: DataFrame): DataFrame = {
    val df = df0.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }.foldLeft(df0)((d, c) => d.withColumn(c, col(c).cast(TimestampType)))
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      // integer DIV, not `/`: epoch-nanos exceed double's 53-bit mantissa
      case Some(_) => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case None => df
    }
  }

  /** Register all tables as temp views (for spark.sql-based operators). */
  def registerViews(s: SparkSession, dir: String): Unit =
    tableNames.foreach(n => apply(s, dir, n).createOrReplaceTempView(n))

  /** Exact money arithmetic: cast to DECIMAL(12,2). */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact decimal sum surfaced as a deterministic double. */
  def dsum(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Order-independent average: exact decimal sum / count, in double. */
  def davg(c: Column): Column = sum(dec2(c)).cast(DoubleType) / count(lit(1))

  /** Monday epoch for week/day-of-week arithmetic in oracle-checked
    * shapes (ds64/ds78/ds95 and their DuckDB twins, which must spell
    * `date_diff('day', TIMESTAMP '1970-01-05', x)`). 1970-01-05 is a
    * Monday BELOW any plausible data domain, so the day diff is always
    * non-negative and truncation == floor and pmod == % on BOTH
    * engines — the cross-engine determinism the shapes rely on would
    * silently break for pre-epoch dates (Spark casts toward zero and
    * pmod is non-negative; DuckDB floors and % keeps the sign). */
  val weekEpoch = "1970-01-05"

  /** Days since [[weekEpoch]] (non-negative over any sane data). */
  def epochDays(c: Column): Column =
    datediff(c, lit(weekEpoch).cast("timestamp"))

  /** Week number since [[weekEpoch]]. */
  def weekSeq(c: Column): Column = (epochDays(c) / 7).cast(LongType)

  /** Day-of-week, 0=Monday..6=Sunday, from pure day arithmetic —
    * never an engine week/dow function (ISO-week rules differ). */
  def dow(c: Column): Column = pmod(epochDays(c), lit(7))
}
