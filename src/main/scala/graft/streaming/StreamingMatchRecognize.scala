package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.plans.MatchRecognize

/** Per-key streaming state: unconsumed rows + match counter. Top-level
  * (not nested in the object) because nested case classes trip the
  * encoder's codegen constructor resolution. */
private[streaming] final case class MrKeyState(
    buffer: Seq[StreamingMatchRecognize.MrEvent], matchNo: Long)

/** MATCH_RECOGNIZE over a stream (ref: SURVEY.md §7.2 — "streaming
  * variant via flatMapGroupsWithState"; the reference only defines the
  * batch operator, rel/core/Match.java).
  *
  * v1 surface: typed events (key, event time, tiebreak, value). Per key,
  * state buffers unconsumed rows; each micro-batch sorts the buffer,
  * runs the same backtracking machine as the batch operator, emits
  * completed matches (Update mode) and retains the unmatched tail. A
  * match is never re-emitted (AFTER MATCH SKIP PAST LAST ROW), and the
  * per-key buffer is bounded by `maxBuffer` (oldest rows beyond it are
  * dropped — the watermark-integration refinement is future work, so
  * late events older than an emitted match can be missed, the standard
  * caveat for unwatermarked custom state).
  */
object StreamingMatchRecognize {

  final case class MrEvent(key: Long, ts: Long, tiebreak: Long, value: Double)
  final case class MrMatchRow(
      key: Long, match_no: Long, ts: Long, tiebreak: Long,
      value: Double, classifier: String)

  /** Predicate over (current, previous-in-stream). */
  type Define = (MrEvent, Option[MrEvent]) => Boolean

  def apply(
      events: Dataset[MrEvent],
      pattern: String,
      define: Map[String, Define],
      maxBuffer: Int = 10000): Dataset[MrMatchRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    implicit val stateEnc: Encoder[MrKeyState] = Encoders.product[MrKeyState]

    // reuse the batch machine by lifting MrEvent into a generic runner:
    // the tiny per-key buffers make per-row closures fine here.
    def runMatcher(rows: IndexedSeq[MrEvent], startMatchNo: Long)
        : (Seq[MrMatchRow], Seq[MrEvent], Long) = {
      val out = scala.collection.mutable.ArrayBuffer.empty[MrMatchRow]
      val consumed = scala.collection.mutable.BitSet.empty
      var matchNo = startMatchNo
      var p = 0
      while (p < rows.length) {
        MatchRecognize.matchSeq(pattern, rows.length, p,
          (name, pos) => define.get(name).forall(f =>
            f(rows(pos), if (pos == 0) None else Some(rows(pos - 1))))) match {
          case Some(classifiers) =>
            matchNo += 1
            classifiers.zipWithIndex.foreach { case (cls, i) =>
              val e = rows(p + i)
              consumed += (p + i)
              out += MrMatchRow(e.key, matchNo, e.ts, e.tiebreak, e.value, cls)
            }
            p += classifiers.length
          case None => p += 1
        }
      }
      val remaining = rows.zipWithIndex.collect {
        case (e, i) if !consumed.contains(i) => e
      }.toSeq
      (out.toSeq, remaining, matchNo)
    }

    def fn(key: Long, it: Iterator[MrEvent], state: GroupState[MrKeyState])
        : Iterator[MrMatchRow] = {
      val prev = state.getOption.getOrElse(MrKeyState(Seq.empty, 0L))
      val all = (prev.buffer ++ it.toSeq)
        .sortBy(e => (e.ts, e.tiebreak))
        .takeRight(maxBuffer)
      val (matches, remaining, matchNo) = runMatcher(all.toIndexedSeq, prev.matchNo)
      state.update(MrKeyState(remaining, matchNo))
      matches.iterator
    }

    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
  }
}
