package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LEFT MARK join (ref: rel/core/JoinRelType.java:97-119, rewritten by
  * rel/rules/MarkToSemiOrAntiJoinRule.java): every left row, plus a
  * BOOLEAN mark column telling whether a matching right row exists —
  * with the three-valued IN-subquery semantics the reference produces
  * this node for:
  *
  *   - TRUE  if a right row definitely matches,
  *   - NULL  if no definite match but the comparison is UNKNOWN
  *           (left key is NULL, or the right side contains NULL keys),
  *   - FALSE only when a match is definitely absent.
  *
  * Distributed as: distinct non-null right keys (one shuffle, tiny
  * output at any scale — it's a key-set), left-joined to the left
  * relation, plus a 1-row "right side has nulls" scalar that Spark
  * broadcasts. No row duplication (the right side is distinct on the
  * key), so this is the plan-time Mark→join+projection rewrite rather
  * than the join+groupBy+max(marker) fallback.
  */
object MarkJoin {

  def leftMark(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, markName: String): DataFrame = {
    val rk = col(rightKey)
    val rkeys = right.select(rk.as("__mark_key")).filter(rk.isNotNull).distinct()
      .withColumn("__mark_hit", lit(true))
    val hasNull = right.agg(
      max(when(rk.isNull, true).otherwise(false)).as("__mark_rnull"),
      (count(lit(1)) > 0).as("__mark_rnonempty"))
    val lk: Column = left(leftKey)
    left
      .join(rkeys, lk === col("__mark_key"), "left")
      .crossJoin(broadcast(hasNull)) // 1 row by construction: global agg
      .withColumn(markName,
        when(col("__mark_hit"), lit(true))                   // definite match
          .when(!col("__mark_rnonempty"), lit(false))        // empty right: IN is FALSE
          .when(lk.isNull || col("__mark_rnull"), lit(null)) // UNKNOWN
          .otherwise(lit(false)))
      .drop("__mark_key", "__mark_hit", "__mark_rnull", "__mark_rnonempty")
  }
}
