package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ASOF join over streams (ref: rel/core/AsofJoin.java semantics —
  * per-left-row most-recent right match with rightTime <= leftTime —
  * lifted to Structured Streaming, which has no native asof join;
  * stream-stream interval joins require BOTH bounds, and carry the
  * whole right window as state).
  *
  * Design: the same union trick as the batch lowering
  * (plans/AsofJoin.scala), made stateful. Left and right rows merge
  * into one keyed stream; per key, flatMapGroupsWithState keeps
  *
  *  - the latest right row at or before the emission watermark, and
  *  - small sorted buffers of not-yet-emittable rows,
  *
  * so state is O(buffered late window), NOT O(right history): once a
  * newer right row is final, older right rows can never be the "most
  * recent ≤ t" for any future left row (future left t only grows past
  * the watermark). Each micro-batch: merge buffers + arrivals in
  * (ts, side) order, match left rows whose ts ≤ maxSeen - lateness
  * (they can no longer be preempted by a late right row), hold the
  * rest. Late rows beyond `allowedLateness` are counted and dropped —
  * Spark's watermark contract, which the reference (single-process,
  * totally ordered input) never needed.
  *
  * At scale this is one stateful shuffle on the join key — the same
  * exchange count as the batch lowering — with per-key state bounded
  * by the lateness window's row count.
  */
object StreamingAsofJoin {

  final case class AsofEvent(
      key: Long, ts: Long, isLeft: Boolean, leftVal: Double, rightVal: Double)
  final case class AsofMatch(
      key: Long, ts: Long, leftVal: Double,
      rightTs: Option[Long], rightVal: Option[Double])

  /** lastRight = (ts, value) of the newest emit-safe right row;
    * buffers sorted by ts. */
  final case class AsofState(
      lastRightTs: Long, lastRightVal: Double, hasRight: Boolean,
      bufLeft: Seq[(Long, Double)], bufRight: Seq[(Long, Double)],
      maxSeenTs: Long, dropped: Long)

  def apply(
      events: Dataset[AsofEvent],
      allowedLateness: Long): Dataset[AsofMatch] = {
    val spark = events.sparkSession
    import spark.implicits._
    implicit val stateEnc: Encoder[AsofState] = Encoders.product[AsofState]

    def fn(key: Long, it: Iterator[AsofEvent], state: GroupState[AsofState])
        : Iterator[AsofMatch] = {
      val prev = state.getOption.getOrElse(
        AsofState(Long.MinValue, 0.0, hasRight = false, Nil, Nil, Long.MinValue, 0L))
      val arrivals = it.toSeq
      val maxSeen = (prev.maxSeenTs +: arrivals.map(_.ts)).max
      val horizon = if (maxSeen == Long.MinValue) Long.MinValue
        else maxSeen - allowedLateness

      // drop rows older than the last state advance — they arrived too
      // late to reorder history (watermark contract)
      val floor = if (prev.hasRight) prev.lastRightTs else Long.MinValue
      val (fresh, droppedNow) = {
        val f = arrivals.filter(e => e.ts >= floor || e.isLeft)
        (f, (arrivals.length - f.length).toLong)
      }

      val lefts = (prev.bufLeft ++
        fresh.filter(_.isLeft).map(e => (e.ts, e.leftVal))).sortBy(_._1)
      val rights = (prev.bufRight ++
        fresh.filter(!_.isLeft).map(e => (e.ts, e.rightVal))).sortBy(_._1)

      // rows at or before `horizon` are final: no in-flight row can
      // precede them anymore. Walk lefts/rights in ts order, advancing
      // the carried right row, emitting final lefts.
      val out = scala.collection.mutable.ArrayBuffer.empty[AsofMatch]
      var lastTs = if (prev.hasRight) prev.lastRightTs else Long.MinValue
      var lastVal = prev.lastRightVal
      var has = prev.hasRight
      var ri = 0
      val emitLefts = lefts.takeWhile(_._1 <= horizon)
      val holdLefts = lefts.drop(emitLefts.length)
      emitLefts.foreach { case (t, v) =>
        while (ri < rights.length && rights(ri)._1 <= t) {
          lastTs = rights(ri)._1; lastVal = rights(ri)._2; has = true; ri += 1
        }
        out += AsofMatch(key, t, v,
          if (has) Some(lastTs) else None, if (has) Some(lastVal) else None)
      }
      // consume right rows that are final even without a left consumer —
      // they compact into the single carried row
      while (ri < rights.length && rights(ri)._1 <= horizon) {
        lastTs = rights(ri)._1; lastVal = rights(ri)._2; has = true; ri += 1
      }
      state.update(AsofState(lastTs, lastVal, has,
        holdLefts, rights.drop(ri), maxSeen, prev.dropped + droppedNow))
      out.iterator
    }

    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
  }
}
