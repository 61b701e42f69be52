package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, expr}

import graft.functions.Sequences
import graft.plans.{AsofJoin, MatchRecognize, Measures, RecursiveUnion}

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

    /** WITH RECURSIVE (RelBuilder.repeatUnion): this frame is the seed.
      * Like the reference's RepeatUnion, the iteration limit BOUNDS the
      * recursion — hitting it returns the truncated result (set
      * failOnLimit for safety-cap semantics instead). */
    def repeatUnion(step: DataFrame => DataFrame, iterationLimit: Int = 100,
        failOnLimit: Boolean = false): DataFrame =
      RecursiveUnion.repeatUnionAll(df, step, iterationLimit, failOnLimit)

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

    /** SYSTEM TABLESAMPLE with REPEATABLE seed (rel/core/Sample.java
      * isBernoulli=false; tablesample.iq): block sampling — each
      * PARTITION is kept or dropped whole by a seeded coin flip. The
      * cheap form at scale (a dropped partition's files are never
      * read past the iterator), with block-level variance: per-run row
      * counts swing with partition sizes, exactly like the reference's
      * SYSTEM mode. Deterministic for a fixed (seed, partitioning). */
    def tablesampleSystem(fraction: Double, seed: Long): DataFrame = {
      val enc = org.apache.spark.sql.Encoders.row(df.schema)
      df.mapPartitions { it =>
        // partition index via TaskContext — stable for a fixed plan
        val pid = Option(org.apache.spark.TaskContext.get()).map(_.partitionId()).getOrElse(0)
        // byteswap-mix the (seed, pid) pair: java.util.Random's first
        // draw is correlated across near-sequential seeds
        val mixed = scala.util.hashing.byteswap64(seed ^ (pid.toLong * 0x9E3779B97F4A7C15L))
        val rng = new java.util.Random(mixed)
        if (rng.nextDouble() < fraction) it else Iterator.empty
      }(enc)
    }

    /** MATCH_RECOGNIZE ... ONE ROW PER MATCH with MEASURES — collapse an
      * ALL-ROWS match output (this frame) to one measured row per match. */
    def oneRowPerMatch(partitionKeys: Seq[String], measures: Seq[Column]): DataFrame =
      MatchRecognize.oneRowPerMatch(df, partitionKeys, measures)

    /** Declare measure columns over this detail frame (MEASURE / AGGREGATE,
      * MeasureRules.java) — query them via Measures.MeasuredTable.query. */
    def withMeasures(defs: Map[String, Column]): Measures.MeasuredTable =
      Measures.MeasuredTable(df, defs)

    /** NEXT_VALUE FOR seq as a column (block-allocated, no global counter). */
    def withSequence(seqName: String, colName: String): DataFrame =
      Sequences.withSequence(df, seqName, colName)

    /** LEFT MARK join (JoinRelType.java:97-119): keep every row of this
      * frame and add a boolean `markName` column with IN-subquery
      * three-valued semantics (TRUE / FALSE / NULL-for-UNKNOWN). */
    def markJoin(right: DataFrame, leftKey: String, rightKey: String,
        markName: String): DataFrame =
      graft.plans.MarkJoin.leftMark(df, right, leftKey, rightKey, markName)

    /** Banded range join: rows of this frame joined to every `intervals`
      * row whose `[lo, hi)` contains `pointCol` — a hash equi-join on a
      * bin key instead of a nested-loop theta join (plans/RangeJoin). */
    def rangeJoin(intervals: DataFrame, pointCol: String, lo: String,
        hi: String, binWidth: Double): DataFrame =
      graft.plans.RangeJoin.pointInInterval(df, pointCol, intervals, lo, hi, binWidth)

    /** Event-time temporal join (Flink-style `FOR SYSTEM_TIME AS OF
      * left.time` over a versioned dimension; the join form of
      * rel/core/Snapshot.java): each left row picks the version whose
      * `[vstart, vend)` validity contains its `time`; no version → NULL
      * payload (LEFT semantics). Versions must be non-overlapping per
      * key. Lowered onto the ASOF machinery (one equi-key shuffle +
      * in-partition carry), then the carried row is invalidated when the
      * left time falls past the carried version's end. Two versions
      * sharing a vstart (legal under non-overlap only when one is the
      * empty [ts,ts)) tie-break on vend: the longest-lived version is
      * carried, matching the interval join (which never matches the
      * empty interval). */
    def temporalJoin(versions: DataFrame, key: String, time: String,
        vstart: String, vend: String, payload: Seq[String]): DataFrame = {
      val carried = AsofJoin.leftAsof(
        df, versions, key, time, vstart, payload :+ vend,
        rightTiebreak = Seq(vend))
      val valid = col(vend).isNotNull && col(time) < col(vend)
      val nulled = (payload :+ vstart).foldLeft(carried) { case (d, c) =>
        d.withColumn(c, org.apache.spark.sql.functions.when(valid, col(c)))
      }
      nulled.drop(vend)
    }
  }
}
