package graft.plans

import org.apache.spark.sql.DataFrame

/** WITH RECURSIVE / RepeatUnion — iterate `step` from a seed until
  * fixpoint or an iteration limit (ref: rel/core/RepeatUnion.java:1-130,
  * rel/core/TableSpool.java:1, EnumerableRepeatUnion.java:1;
  * RelBuilder.repeatUnion tools/RelBuilder.java:3208-3237;
  * recursive_queries.iq).
  *
  * Spark has no recursive plan node, so this is a driver-side loop — the
  * same shape as the reference's seed ∪ iterate-until-empty, but each
  * step is a distributed job. `localCheckpoint` truncates lineage every
  * iteration so plan size stays O(1) instead of O(depth); the
  * accumulated result unions lazily (UNION ALL semantics, like the
  * reference's all=true mode).
  */
object RecursiveUnion {

  /** @param seed           initial working table
    * @param step           recursive step applied to the previous delta
    * @param iterationLimit hard stop, mirroring RepeatUnion.iterationLimit
    * @param failOnLimit    error when the limit is hit without fixpoint.
    *                       The reference's RepeatUnion TRUNCATES at
    *                       iterationLimit (EnumerableDefaults
    *                       repeatUnion stops and returns the bounded
    *                       result) — so the DSL defaults to false; only
    *                       Spark's native recursive CTE errors, and the
    *                       SQL WITH RECURSIVE path opts in (its limit is
    *                       an implicit safety cap, not a user bound).
    */
  def repeatUnionAll(
      seed: DataFrame,
      step: DataFrame => DataFrame,
      iterationLimit: Int = 100,
      failOnLimit: Boolean = false): DataFrame = {
    var delta = seed.localCheckpoint(true)
    var acc = delta
    var i = 0
    while (i < iterationLimit && !delta.isEmpty) {
      delta = step(delta).localCheckpoint(true)
      if (!delta.isEmpty) acc = acc.union(delta)
      i += 1
    }
    if (failOnLimit && !delta.isEmpty)
      throw new IllegalStateException(
        s"recursion limit exceeded: no fixpoint after $iterationLimit iterations")
    acc
  }

  /** UNION-distinct recursion (all=false — the form whose TERMINATION
    * depends on dedup: a cycle's revisited rows must not re-enter the
    * working table). Semi-naive fixpoint: each iteration's delta is
    * `step(delta) EXCEPT accumulated` — one distinct-shuffle per
    * iteration, the standard distributed evaluation; Spark's native
    * recursive CTE only supports UNION ALL
    * (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so this is the engine's
    * own path for the reference's recursive_queries.iq:310 family. */
  def repeatUnionDistinct(
      seed: DataFrame,
      step: DataFrame => DataFrame,
      iterationLimit: Int = 100,
      failOnLimit: Boolean = false): DataFrame = {
    // re-root each checkpointed frame on a bare LogicalRDD: EXCEPT's
    // inferred constraints reference pre-checkpoint attributes, which
    // trips Union.rewriteConstraints (key not found) when the next
    // union analyzes — the rebuild drops the stale constraints
    def pin(df: DataFrame): DataFrame = {
      val cp = df.localCheckpoint(true)
      cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
    }
    var acc = pin(seed.distinct())
    var delta = acc
    var i = 0
    while (i < iterationLimit && !delta.isEmpty) {
      delta = pin(step(delta).distinct().except(acc))
      if (!delta.isEmpty) acc = pin(acc.union(delta))
      i += 1
    }
    if (failOnLimit && !delta.isEmpty)
      throw new IllegalStateException(
        s"recursion limit exceeded: no fixpoint after $iterationLimit iterations")
    acc
  }
}
