package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregates (ref: SURVEY.md §4.4):
  *
  *  - SINGLE_VALUE — the scalar-subquery guard (SqlStdOperatorTable
  *    .java:1210): returns the group's only value, errors if the group
  *    has more than one row, exactly like Calcite's runtime check.
  *  - INTERSECTION — multiset-intersection aggregate
  *    (SqlStdOperatorTable.java:2549): intersects array values across
  *    rows preserving minimum multiplicity.
  *
  * (FUSION, :2541, needs no custom code — it is flatten(collect_list),
  * see GraftFunctions docs — and both of these follow the reference's
  * init/add/merge/result shape from schema/AggregateFunctionImpl.java.)
  */
object Aggregators {

  /** SINGLE_VALUE over longs. Buffer: (value, seen) — value stays boxed so
    * a group whose only row is NULL finishes as NULL, not 0 (the reference
    * returns the value itself, NULL included). */
  class SingleValueLong extends Aggregator[java.lang.Long, (java.lang.Long, Boolean), java.lang.Long] {
    override def zero: (java.lang.Long, Boolean) = (null, false)
    override def reduce(b: (java.lang.Long, Boolean), a: java.lang.Long): (java.lang.Long, Boolean) = {
      if (b._2) throw new IllegalStateException(
        "SINGLE_VALUE: more than one row in group (subquery returned >1 row)")
      (a, true)
    }
    override def merge(x: (java.lang.Long, Boolean), y: (java.lang.Long, Boolean)): (java.lang.Long, Boolean) = {
      if (x._2 && y._2) throw new IllegalStateException(
        "SINGLE_VALUE: more than one row in group (subquery returned >1 row)")
      if (x._2) x else y
    }
    override def finish(r: (java.lang.Long, Boolean)): java.lang.Long = if (r._2) r._1 else null
    override def bufferEncoder: Encoder[(java.lang.Long, Boolean)] =
      Encoders.tuple(Encoders.LONG, Encoders.scalaBoolean)
    override def outputEncoder: Encoder[java.lang.Long] = Encoders.LONG
  }

  /** Misra–Gries heavy-hitters sketch (Misra & Gries '82; the
    * frequent-items companion to the profiler's HLL — the reference
    * only sketches distinct counts, profile/ProfilerImpl.java:34).
    * K counters; decrement-on-overflow. MERGEABLE: the union sketch
    * adds counters pairwise then re-trims to K (Agarwal et al. '12),
    * so partial aggregation holds and a 1000-way tree merge is exact
    * to the same ±n/K error bound as single-pass. Guarantee: every
    * item with true frequency > n/K survives — spec-checked. */
  class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty

    private def offer(b: Map[String, Long], item: String, w: Long): Map[String, Long] =
      b.get(item) match {
        case Some(c) => b.updated(item, c + w)
        case None if b.size < k => b.updated(item, w)
        case None =>
          // decrement all by the min slack; drop zeros; residual inserts
          val dec = math.min(w, b.values.min)
          val shrunk = b.map { case (i, c) => i -> (c - dec) }.filter(_._2 > 0)
          if (w > dec && shrunk.size < k) shrunk.updated(item, w - dec) else shrunk
      }

    override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      if (a == null) b else offer(b, a, 1L)

    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
      y.foldLeft(x) { case (acc, (item, w)) => offer(acc, item, w) }

    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.Encoders.kryo[Map[String, Long]]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** INTERSECTION of string-array multisets across rows. Buffer None =
    * identity (no rows yet). Output is sorted for determinism. */
  class MultisetIntersectionAgg
      extends Aggregator[Seq[String], Option[Map[String, Int]], Seq[String]] {
    private def counts(xs: Seq[String]): Map[String, Int] =
      xs.groupBy(identity).map { case (k, v) => k -> v.size }
    private def intersect(a: Map[String, Int], b: Map[String, Int]): Map[String, Int] =
      a.flatMap { case (k, n) =>
        val m = math.min(n, b.getOrElse(k, 0))
        if (m > 0) Some(k -> m) else None
      }
    override def zero: Option[Map[String, Int]] = None
    override def reduce(b: Option[Map[String, Int]], a: Seq[String]): Option[Map[String, Int]] = {
      val c = counts(Option(a).getOrElse(Seq.empty))
      Some(b.fold(c)(intersect(_, c)))
    }
    override def merge(x: Option[Map[String, Int]], y: Option[Map[String, Int]]): Option[Map[String, Int]] =
      (x, y) match {
        case (Some(a), Some(b)) => Some(intersect(a, b))
        case (a, b) => a.orElse(b)
      }
    override def finish(r: Option[Map[String, Int]]): Seq[String] =
      r.getOrElse(Map.empty).toSeq.sortBy(_._1).flatMap { case (k, n) => Seq.fill(n)(k) }
    override def bufferEncoder: Encoder[Option[Map[String, Int]]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Register the UDAFs + multiset scalar expressions into a session. */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("single_value_long", udaf(new SingleValueLong))
    spark.udf.register("multiset_intersection", udaf(new MultisetIntersectionAgg))
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("multiset_intersect_all",
      args => MultisetIntersectAll(args(0), args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("multiset_except_all",
      args => MultisetExceptAll(args(0), args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("submultiset_of",
      args => SubmultisetOf(args(0), args(1)), "scala_udf")
  }
}
