package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ASOF JOIN — per-left-row most-recent right match on a time-like key
  * (ref: rel/core/AsofJoin.java:1-63, JoinRelType.java:76-94,
  * EnumerableAsofJoin.java:1 / EnumerableDefaults.java:881 asofJoin;
  * SQL surface sql/SqlAsofJoin.java, semantics validated in asof.iq).
  *
  * Spark-first design: instead of the reference's per-key hash of sorted
  * right rows (single-process), we lower to a union + windowed
  * last-value-carry-forward:
  *
  *   1. tag left (1) and right (0) rows, union them;
  *   2. one shuffle on the equi-key, sort within partition by
  *      (time, tag);
  *   3. `last(right payload, ignoreNulls)` over rows UNBOUNDED
  *      PRECEDING..CURRENT carries the latest right row forward;
  *   4. keep left rows.
  *
  * At 100 TB this is ONE shuffle of left+right (same as any equi-join) and
  * a linear in-partition pass — no range explosion, no per-key loops, and
  * AQE handles key skew. Ties (right.time == left.time) match, like the
  *  reference's `>=` MATCH_CONDITION.
  */
object AsofJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side; its `rightTime` and
    *                   `payload` columns must not collide with left's —
    *                   rename first if they do
    * @param key        equi-join key column name (same name both sides)
    * @param leftTime   left event-time column name
    * @param rightTime  right event-time column name
    * @param payload    right columns to carry onto each left row
    * @param rightTiebreak  extra right columns ordering right rows that
    *                   share (key, rightTime) — the LARGEST tiebreak
    *                   value wins (it sorts last, so the carry picks it).
    *                   Without one, equal-time right rows tie arbitrarily.
    * @param parts      explicit partition count for the window's
    *                   key-shuffle (0 = leave it to the planner). The
    *                   union+window input is CPU-bound on few bytes, so
    *                   AQE's byte-based coalescing serializes it onto 1-2
    *                   tasks at small inputs (guide §2.5); callers that
    *                   know the input size pass a row-aware count
    *                   (e.g. T.sizedParts) — the explicit hash
    *                   repartition on the window's own key satisfies its
    *                   ClusteredDistribution, so no second exchange.
    */
  def leftAsof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      rightTiebreak: Seq[String] = Nil,
      parts: Int = 0): DataFrame = {
    val leftCols = left.columns.toSeq
    val t = "__asof_t"
    val tag = "__asof_is_left"

    val lTagged = left
      .withColumn(t, col(leftTime))
      .withColumn(tag, lit(1))
      .select(Seq(col(key), col(t), col(tag)) ++
        leftCols.filterNot(_ == key).map(col) ++
        (payload :+ rightTime).map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)

    val rTagged = right
      .withColumn(t, col(rightTime))
      .withColumn(tag, lit(0))
      .select(Seq(col(key), col(t), col(tag)) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        (payload :+ rightTime).map(col): _*)

    // (time, tag) ordering puts right rows before left rows at equal time,
    // so an exact-tie right row is visible to the left row (>= semantics).
    // Trailing tiebreaks order equal-time right rows deterministically
    // (largest value last = carried); they ride the unioned frame, so they
    // must be carried columns.
    require(rightTiebreak.forall((payload :+ rightTime).contains),
      s"rightTiebreak ${rightTiebreak} must be a subset of payload :+ rightTime")
    val w = Window.partitionBy(col(key))
      .orderBy(col(t) +: col(tag) +: rightTiebreak.map(col(_).asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Carry the matched right row as ONE struct (null on left rows) so all
    // carried columns come from the same right row — a NULL field inside the
    // matched row stays NULL instead of inheriting a stale value from an
    // older right row (reference matches whole rows, asof.iq).
    val p = "__asof_p"
    val unioned0 = lTagged.unionByName(rTagged)
    val unioned = if (parts > 0) unioned0.repartition(parts, col(key)) else unioned0
    val carried = unioned
      .withColumn(p,
        when(col(tag) === 0, struct((payload :+ rightTime).map(col): _*)))
      .withColumn(p, last(col(p), ignoreNulls = true).over(w))

    (payload :+ rightTime)
      .foldLeft(carried) { case (df, c) => df.withColumn(c, col(p)(c)) }
      .filter(col(tag) === 1)
      .drop(t, tag, p)
  }
}
