package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering — the multi-dimensional file-layout
  * operator (Delta/Iceberg `OPTIMIZE ZORDER` analog; a lakehouse
  * counterpart of the reference's physical-layout metadata,
  * schema/Statistic.java getCollations, which its planner uses to skip
  * work that the layout already did). Interleaving the bits of two
  * keys and range-partitioning on the result gives every output file a
  * NARROW min/max range in BOTH dimensions at once — so a 100 TB scan
  * filtered on either key (or both) skips most files on footer stats,
  * where a single-column sort only ever prunes its own column.
  *
  * The interleave is a native codegen expression (a tight shift/mask
  * sequence inside whole-stage codegen), registered in SQL as
  * `interleave_bits(a, b)`: each input masks to its low 31 bits and
  * spreads via the 5-step magic-mask doubling, `z = spread(a) |
  * spread(b) << 1` — 62 bits, always non-negative. */
object ZOrder {

  /** Spread the low 31 bits of x to even bit positions (standard
    * magic-mask doubling). */
  def spread(x0: Long): Long = {
    var x = x0 & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  /** Z-ranges covering the box [aLo..aHi] × [bLo..bHi] in a
    * `widthBits`-per-dimension grid (ref: rel/rules/SpatialRules.java
    * FilterHilbertRule — the reference rewrites ST_DWithin over a
    * curve-indexed column into range sargs; this is the Morton
    * counterpart). Quadtree descent: a cell fully inside the box emits
    * its contiguous z-interval (Morton order of an ALIGNED quad cell is
    * contiguous), a disjoint cell is skipped, a straddling cell splits
    * until `maxLevel`, where it emits over-covering — the exact
    * predicate re-applied above makes over-coverage harmless, so
    * `maxLevel` only trades predicate size against skip precision.
    * Adjacent intervals merge, keeping the pushed filter small. At
    * 100 TB these BETWEENs push into parquet footer stats over a
    * z-laid-out table and skip every file outside the box in BOTH
    * dimensions at once. */
  def coveringRanges(aLo: Long, aHi: Long, bLo: Long, bHi: Long,
      widthBits: Int = 16, maxLevel: Int = 6): Seq[(Long, Long)] = {
    require(widthBits >= 1 && widthBits <= 31, "1..31 bits per dimension")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def rec(level: Int, aMin: Long, bMin: Long): Unit = {
      val size = 1L << (widthBits - level)
      val (aMax, bMax) = (aMin + size - 1, bMin + size - 1)
      if (aMax < aLo || aMin > aHi || bMax < bLo || bMin > bHi) return
      if ((aMin >= aLo && aMax <= aHi && bMin >= bLo && bMax <= bHi) ||
          level >= maxLevel || size == 1) {
        out += ((interleave(aMin, bMin), interleave(aMax, bMax))): Unit
        return
      }
      val half = size >> 1
      rec(level + 1, aMin, bMin)
      rec(level + 1, aMin + half, bMin)
      rec(level + 1, aMin, bMin + half)
      rec(level + 1, aMin + half, bMin + half)
    }
    rec(0, 0, 0)
    val sorted = out.sortBy(_._1)
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    sorted.foreach { r =>
      if (merged.nonEmpty && merged.last._2 + 1 >= r._1)
        merged(merged.size - 1) = (merged.last._1, math.max(merged.last._2, r._2))
      else merged += r: Unit
    }
    merged.toSeq
  }

  /** The pushable z predicate for [[coveringRanges]] output: a
    * disjunction of BETWEENs on the z column. */
  def rangeFilter(z: Column, ranges: Seq[(Long, Long)]): Column = {
    import org.apache.spark.sql.functions.lit
    require(ranges.nonEmpty, "empty covering")
    ranges.map { case (lo, hi) => z >= lit(lo) && z <= lit(hi) }
      .reduce(_ || _)
  }

  /** The SQL builder: integral inputs cast to LONG. */
  private[functions] def expr(args: Seq[Expression]): Expression =
    InterleaveBits(Cast(args(0), LongType), Cast(args(1), LongType))

  def interleaveBits(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    column(InterleaveBits(Cast(expression(a), LongType),
      Cast(expression(b), LongType)))
  }

  /** Cluster `df` into `numFiles` z-ordered range partitions on two
    * key columns, each file sorted by z within — ready to write with
    * per-file min/max locality in BOTH keys. Each column first scales
    * to a common 16-bit range from one min/max pass (interleaving RAW
    * values degenerates to a single-key sort when the ranges differ in
    * width — the wider key owns every high bit; production z-order
    * implementations normalize to range ids for the same reason, and a
    * skewed 100 TB table would swap this linear scaling for the
    * profiler's quantiles). The helper column drops after the
    * repartition, which preserves the partitioning (a projection never
    * reshuffles). */
  def cluster(df: DataFrame, a: String, b: String, numFiles: Int): DataFrame = {
    import org.apache.spark.sql.functions.{floor, lit, max, min}
    val r = df.agg(min(col(a)).cast("double"), max(col(a)).cast("double"),
      min(col(b)).cast("double"), max(col(b)).cast("double")).collect()(0)
    // empty input (or an all-null key): nothing to lay out
    if ((0 to 3).exists(r.isNullAt)) return df
    def scaled(c: String, lo: Double, hi: Double): Column =
      floor((col(c).cast("double") - lit(lo)) /
        lit(math.max(hi - lo, 1.0)) * lit(65535.0)).cast("long")
    df.withColumn("__graft_z", interleaveBits(
        scaled(a, r.getDouble(0), r.getDouble(1)),
        scaled(b, r.getDouble(2), r.getDouble(3))))
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
  }
}

/** `interleave_bits(a, b)`: Morton interleave of two integral keys'
  * low 31 bits — even bits from `a`, odd bits from `b`. Codegen emits
  * the shift/mask sequence inline, so z-key computation rides
  * whole-stage codegen during the clustering write. */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "interleave_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"interleave_bits expects BIGINT inputs, got ${left.dataType}, ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  /** The same 5-step spread, emitted as straight-line Java. */
  private def spreadJava(in: String, v: String): String =
    s"""long $v = $in & 0x7FFFFFFFL;
       |$v = ($v | ($v << 16)) & 0x0000FFFF0000FFFFL;
       |$v = ($v | ($v << 8)) & 0x00FF00FF00FF00FFL;
       |$v = ($v | ($v << 4)) & 0x0F0F0F0F0F0F0F0FL;
       |$v = ($v | ($v << 2)) & 0x3333333333333333L;
       |$v = ($v | ($v << 1)) & 0x5555555555555555L;""".stripMargin

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (sa, sb) = (ctx.freshName("sa"), ctx.freshName("sb"))
      s"""${spreadJava(a, sa)}
         |${spreadJava(b, sb)}
         |${ev.value} = $sa | ($sb << 1);""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}
