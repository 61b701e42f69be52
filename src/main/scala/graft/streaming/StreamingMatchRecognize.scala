package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.plans.MatchRecognize

/** Per-key streaming state: unconsumed rows, match counter, the
  * (ts, tiebreak) of the last row consumed by an emitted match (so
  * AFTER MATCH SKIP PAST LAST ROW holds across micro-batches), and a
  * count of rows evicted by the maxBuffer cap. Top-level (not nested in
  * the object) because nested case classes trip the encoder's codegen
  * constructor resolution. */
private[streaming] final case class MrKeyState(
    buffer: Seq[StreamingMatchRecognize.MrEvent], matchNo: Long,
    lastTs: Long, lastTiebreak: Long, evicted: Long,
    maxSeenTs: Long, expired: Long)

/** MATCH_RECOGNIZE over a stream (ref: SURVEY.md §7.2 — "streaming
  * variant via flatMapGroupsWithState"; the reference only defines the
  * batch operator, rel/core/Match.java).
  *
  * v1 surface: typed events (key, event time, tiebreak, value). Per key,
  * state buffers unconsumed rows; each micro-batch sorts the buffer,
  * runs the same backtracking machine as the batch operator, emits
  * completed matches (Update mode) and retains the unmatched tail. A
  * match is never re-emitted, and SKIP PAST LAST ROW holds across
  * batches: the state records the (ts, tiebreak) of the last consumed
  * row, and any row at or before it — whether left unmatched in the
  * buffer or arriving late in a later batch — is dropped before
  * matching, so no match can use rows older than (or interleaved with)
  * a previously emitted match and match_no stays in event-time order.
  * The per-key buffer is bounded by `maxBuffer`; evictions of oldest
  * unmatched rows are counted in state (`MrKeyState.evicted`) rather
  * than dropped silently.
  *
  * With a `within` duration (the WITHIN clause, ref: rel/core/Match
  * .java:75) eviction becomes watermark-driven and semantically
  * lossless: a per-key watermark advances as max(event time) - 
  * `allowedLateness`, and buffered rows older than watermark - `within`
  * are expired (counted in `MrKeyState.expired`) — any match containing
  * such a row would need completing rows at or before the watermark,
  * which the lateness bound says will never arrive. State is then
  * bounded by the rows inside one within-window, not by maxBuffer.
  */
object StreamingMatchRecognize {

  final case class MrEvent(key: Long, ts: Long, tiebreak: Long, value: Double)
  final case class MrMatchRow(
      key: Long, match_no: Long, ts: Long, tiebreak: Long,
      value: Double, classifier: String)
  /** ONE ROW PER MATCH output: the match extent plus named MEASURES. */
  final case class MrMatchSummary(
      key: Long, match_no: Long, start_ts: Long, end_ts: Long, n_rows: Long,
      measures: Map[String, Double])

  /** Predicate over (current, previous-in-stream). */
  type Define = (MrEvent, Option[MrEvent]) => Boolean

  /** A MEASURES aggregate over the match's (row, classifier) pairs —
    * classifier-scoped measures filter on the classifier, e.g.
    * `rows => rows.collect { case (e, "UP") => e.value }.max`. */
  type Measure = Seq[(MrEvent, String)] => Double

  /** ALL ROWS PER MATCH streaming output (see object doc). */
  def apply(
      events: Dataset[MrEvent],
      pattern: String,
      define: Map[String, Define],
      maxBuffer: Int = 10000,
      within: Option[Long] = None,
      allowedLateness: Long = 0L): Dataset[MrMatchRow] =
    core(events, pattern, define, maxBuffer, within, allowedLateness) {
      (matchNo, rows, classifiers) =>
        rows.zip(classifiers).iterator.collect {
          // {- -} exclusions: consumed, not emitted
          case (e, cls) if !cls.startsWith("-") =>
            MrMatchRow(e.key, matchNo, e.ts, e.tiebreak, e.value, cls)
        }
    }(Encoders.product[MrMatchRow])

  /** ONE ROW PER MATCH with MEASURES over a stream (ref: rel/core/Match
    * .java:70 measures; batch analog MatchRecognize.oneRowPerMatch).
    * Each completed match emits a single summary row the moment its
    * micro-batch completes it; measures are FINAL semantics (the whole
    * match is visible — it just completed). Excluded {- -} rows remain
    * part of the match for measures, matching the standard (exclusion
    * affects ALL-ROWS output, not aggregation). */
  def oneRowPerMatch(
      events: Dataset[MrEvent],
      pattern: String,
      define: Map[String, Define],
      measures: Map[String, Measure],
      maxBuffer: Int = 10000,
      within: Option[Long] = None,
      allowedLateness: Long = 0L): Dataset[MrMatchSummary] =
    core(events, pattern, define, maxBuffer, within, allowedLateness) {
      (matchNo, rows, classifiers) =>
        val pairs = rows.zip(classifiers).map { case (e, cls) =>
          (e, if (cls.startsWith("-")) cls.substring(1) else cls)
        }
        Iterator.single(MrMatchSummary(
          rows.head.key, matchNo, rows.head.ts, rows.last.ts, rows.length,
          measures.map { case (n, f) => n -> f(pairs) }))
    }(Encoders.product[MrMatchSummary])

  /** Shared stateful runner: buffers per key, runs the batch machine,
    * hands each completed match (rows + classifiers, exclusion markers
    * intact) to `emit`, and maintains cross-batch SKIP PAST LAST ROW +
    * eviction/expiry state. */
  private def core[O](
      events: Dataset[MrEvent],
      pattern: String,
      define: Map[String, Define],
      maxBuffer: Int,
      within: Option[Long],
      allowedLateness: Long)(
      emit: (Long, IndexedSeq[MrEvent], List[String]) => Iterator[O])(
      implicit outEnc: Encoder[O]): Dataset[O] = {
    val spark = events.sparkSession
    import spark.implicits._
    implicit val stateEnc: Encoder[MrKeyState] = Encoders.product[MrKeyState]

    // reuse the batch machine by lifting MrEvent into a generic runner:
    // the tiny per-key buffers make per-row closures fine here.
    // returns (matches, unmatched tail AFTER the last consumed row,
    // next matchNo, index of last consumed row or -1)
    def runMatcher(rows: IndexedSeq[MrEvent], startMatchNo: Long)
        : (Seq[O], Seq[MrEvent], Long, Int) = {
      val out = scala.collection.mutable.ArrayBuffer.empty[O]
      var lastConsumed = -1
      var matchNo = startMatchNo
      var p = 0
      while (p < rows.length) {
        val start = p
        MatchRecognize.matchSeq(pattern, rows.length, p,
          (name, pos) =>
            within.forall(w => rows(pos).ts - rows(start).ts <= w) &&
              define.get(name).forall(f =>
                f(rows(pos), if (pos == 0) None else Some(rows(pos - 1))))) match {
          case Some(classifiers) =>
            matchNo += 1
            out ++= emit(matchNo, rows.slice(p, p + classifiers.length), classifiers)
            lastConsumed = p + classifiers.length - 1
            p += classifiers.length
          case None => p += 1
        }
      }
      // SKIP PAST LAST ROW across batches: rows before the last emitted
      // match are dead — keep only the tail after it.
      val remaining = rows.drop(lastConsumed + 1)
      (out.toSeq, remaining, matchNo, lastConsumed)
    }

    def fn(key: Long, it: Iterator[MrEvent], state: GroupState[MrKeyState])
        : Iterator[O] = {
      val prev = state.getOption
        .getOrElse(MrKeyState(Seq.empty, 0L, Long.MinValue, Long.MinValue, 0L,
          Long.MinValue, 0L))
      val incoming = it.toSeq
      val maxSeen =
        (prev.maxSeenTs +: incoming.map(_.ts)).max
      // drop anything at or before the last consumed row (late arrivals
      // or buffered rows preceding an already-emitted match)
      val merged = (prev.buffer ++ incoming)
        .filter(e => e.ts > prev.lastTs ||
          (e.ts == prev.lastTs && e.tiebreak > prev.lastTiebreak))
        .sortBy(e => (e.ts, e.tiebreak))
      // watermark-driven expiry: with WITHIN, rows older than
      // (maxSeen - lateness - within) can never complete a match
      val (kept, expiredNow) = within match {
        case Some(w) if maxSeen != Long.MinValue =>
          val horizon = maxSeen - allowedLateness - w
          val k = merged.dropWhile(_.ts < horizon)
          (k, (merged.length - k.length).toLong)
        case _ => (merged, 0L)
      }
      val evictedNow = math.max(0, kept.length - maxBuffer)
      val all = kept.takeRight(maxBuffer)
      val (matches, remaining, matchNo, lastIdx) =
        runMatcher(all.toIndexedSeq, prev.matchNo)
      val (lastTs, lastTie) =
        if (lastIdx >= 0) (all(lastIdx).ts, all(lastIdx).tiebreak)
        else (prev.lastTs, prev.lastTiebreak)
      state.update(MrKeyState(
        remaining, matchNo, lastTs, lastTie, prev.evicted + evictedNow,
        maxSeen, prev.expired + expiredNow))
      matches.iterator
    }

    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
  }
}
