package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, expr}

import graft.plans.{AsofJoin, MatchRecognize, RecursiveUnion}

/** RelBuilder-parity DSL (ref: tools/RelBuilder.java:1789-4226 — scan/
  * filter/project/aggregate/join map 1:1 onto DataFrame already; this
  * veneer adds the verbs Spark lacks: asofJoin :3258, repeatUnion :3208,
  * match via RelFactories, snapshot :1830, plus QUALIFY). Import
  * `graft.api.GraftOps._` and chain them like any other DataFrame op.
  */
object GraftOps {

  implicit class RichDataFrame(private val df: DataFrame) extends AnyVal {

    /** ASOF LEFT JOIN (RelBuilder.asofJoin): most recent `right` row per
      * key at-or-before the left row's time. */
    def asofJoin(right: DataFrame, key: String, leftTime: String,
        rightTime: String, payload: Seq[String]): DataFrame =
      AsofJoin.leftAsof(df, right, key, leftTime, rightTime, payload)

    /** WITH RECURSIVE (RelBuilder.repeatUnion): this frame is the seed. */
    def repeatUnion(step: DataFrame => DataFrame, iterationLimit: Int = 100): DataFrame =
      RecursiveUnion.repeatUnionAll(df, step, iterationLimit)

    /** MATCH_RECOGNIZE (RelBuilder match factory). */
    def matchRecognize(partitionKeys: Seq[String], orderKeys: Seq[String],
        pattern: String, define: Map[String, MatchRecognize.Define],
        afterMatch: MatchRecognize.Skip = MatchRecognize.SkipPastLastRow): DataFrame =
      MatchRecognize.matchRecognize(df, partitionKeys, orderKeys, pattern, define, afterMatch)

    /** FOR SYSTEM_TIME AS OF (RelBuilder.snapshot) over a
      * sys_start/sys_end validity convention. */
    def snapshotAsOf(asOf: Column, sysStart: String = "sys_start",
        sysEnd: String = "sys_end"): DataFrame =
      df.filter(col(sysStart) <= asOf && asOf < col(sysEnd))

    /** QUALIFY: filter on a window expression post-projection. */
    def qualify(pred: Column): DataFrame = df.filter(pred)

    /** Bernoulli TABLESAMPLE with REPEATABLE seed (RelBuilder.sample). */
    def tablesample(fraction: Double, seed: Long): DataFrame =
      df.sample(withReplacement = false, fraction, seed)
  }
}
