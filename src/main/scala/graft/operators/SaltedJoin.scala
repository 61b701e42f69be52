package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling equi-join via key salting — the manual counterpart to
  * AQE's OptimizeSkewedJoin (ref: the reference models distribution in
  * rel/RelDistribution.java but, single-process, never faces skew; at
  * 1000 executors a hot key turns one task into the whole job's
  * critical path).
  *
  * Mechanics: the probe side appends a uniform salt in [0, n); the
  * build side is replicated n times (one row per salt value); the join
  * key becomes (key, salt), splitting each hot key's rows across n
  * tasks. Exact same join result, n× build-side duplication — so salt
  * only the keys that need it (`saltedJoinHotKeys` replicates the
  * build side ONLY for the declared hot keys and unions a plain join
  * for the rest).
  */
object SaltedJoin {

  /** Full salted inner equi-join: every probe row salted, whole build
    * side replicated `salts` times. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 1, "need at least 2 salts")
    val salted = probe.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val replicated = build.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    salted.join(replicated,
      salted(key) === replicated(key) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
      .drop(replicated(key))
  }

  /** Skew-targeted variant: only the declared hot keys are salted and
    * replicated; everything else takes the ordinary join path. This is
    * the production form — replication cost is |hotKeys| × salts rows. */
  def saltedJoinHotKeys(probe: DataFrame, build: DataFrame, key: String,
      hotKeys: Seq[Any], salts: Int): DataFrame = {
    val isHot = col(key).isin(hotKeys: _*)
    val plain = probe.filter(!isHot).join(build.filter(!isHot), key)
    val salted = saltedJoin(probe.filter(isHot), build.filter(isHot), key, salts)
    // align column order (join key position differs between the paths)
    plain.unionByName(salted.select(plain.columns.map(col): _*))
  }
}
