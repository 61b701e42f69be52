package graft

import graft.streaming.StreamingMatchRecognize
import graft.streaming.StreamingMatchRecognize.{Define, MrEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming MATCH_RECOGNIZE: the stateful variant must find the same
  * V patterns as the batch machine, including across micro-batch
  * boundaries (buffered state). */
class StreamingMatchSpec extends SparkSpec {
  import spark.implicits._

  private val define: Map[String, Define] = Map(
    "DOWN" -> ((c, p) => p.exists(c.value < _.value)),
    "UP" -> ((c, p) => p.exists(c.value > _.value)))

  private def runChunks(chunks: Seq[Seq[MrEvent]]): Seq[(Long, Long, String)] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[MrEvent]
    val out = StreamingMatchRecognize(mem.toDS(), "STRT DOWN+ UP+", define)
    val q = out.writeStream.format("memory").queryName("smr_out")
      .outputMode("update").start()
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
    } finally q.stop()
    spark.table("smr_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(5)))
      .toSeq.sortBy(t => (t._1, t._2))
  }

  private def ev(key: Long, i: Long, v: Double) = MrEvent(key, i * 1000L, i, v)

  test("single batch equals batch matcher") {
    val rows = Seq(ev(1, 0, 10), ev(1, 1, 9), ev(1, 2, 8), ev(1, 3, 9), ev(1, 4, 10))
    val got = runChunks(Seq(rows))
    assert(got.map(_._3) == Seq("STRT", "DOWN", "DOWN", "UP", "UP"))
    assert(got.map(_._2).distinct == Seq(1L))
  }

  test("pattern spanning a micro-batch boundary completes from state") {
    val first = Seq(ev(2, 0, 10), ev(2, 1, 9)) // STRT DOWN pending
    val second = Seq(ev(2, 2, 8), ev(2, 3, 12)) // DOWN UP completes
    val got = runChunks(Seq(first, second))
    assert(got.map(_._3) == Seq("STRT", "DOWN", "DOWN", "UP"))
  }

  test("SKIP PAST LAST ROW holds across batches: stale rows never join a later match") {
    // batch 1: ts0 stays unmatched (prefix), ts1000-3000 emit match 1
    val first = Seq(ev(4, 0, 5), ev(4, 1, 10), ev(4, 2, 9), ev(4, 3, 11))
    // batch 2: a fresh V entirely after match 1
    val second = Seq(ev(4, 4, 7), ev(4, 5, 4), ev(4, 6, 6))
    val got = runChunksFull(Seq(first, second))
    val m2 = got.filter(_._2 == 2L)
    assert(m2.map(_._4) == Seq("STRT", "DOWN", "UP"))
    // no match-2 row may predate the last row of match 1 (ts=3000):
    // the unmatched ts=0 row must have been evicted from state
    assert(m2.forall(_._3 >= 4000L), s"stale row joined match 2: $m2")
    assert(got.count(_._2 == 1L) == 3)
  }

  /** Like runChunks but also returns ts, for event-time assertions. */
  private def runChunksFull(chunks: Seq[Seq[MrEvent]]): Seq[(Long, Long, Long, String)] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[MrEvent]
    val out = StreamingMatchRecognize(mem.toDS(), "STRT DOWN+ UP+", define)
    val q = out.writeStream.format("memory").queryName("smr_out_full")
      .outputMode("update").start()
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
    } finally q.stop()
    spark.table("smr_out_full")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(5)))
      .toSeq.sortBy(t => (t._2, t._3))
  }

  test("WITHIN: expired rows never complete a match across batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[MrEvent]
    // within 3000: a partial STRT DOWN at ts 0/1000 expires once the
    // stream advances past ts 4000 (+0 lateness) — a later UP cannot
    // resurrect it even though the pattern would allow it
    val out = StreamingMatchRecognize(mem.toDS(), "STRT DOWN+ UP+", define,
      within = Some(3000L))
    val q = out.writeStream.format("memory").queryName("smr_within")
      .outputMode("update").start()
    try {
      mem.addData(Seq(ev(7, 0, 10), ev(7, 1, 9))); q.processAllAvailable()
      mem.addData(Seq(ev(7, 9, 5))); q.processAllAvailable()   // advances watermark, expires 0/1000
      mem.addData(Seq(ev(7, 10, 12))); q.processAllAvailable() // UP vs 5 — but old STRT/DOWN are gone
    } finally q.stop()
    val got = spark.table("smr_within").collect()
    assert(got.isEmpty, s"expired rows joined a match: ${got.mkString(",")}")
  }

  test("WITHIN: matches inside the window still complete across batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[MrEvent]
    val out = StreamingMatchRecognize(mem.toDS(), "STRT DOWN+ UP+", define,
      within = Some(5000L))
    val q = out.writeStream.format("memory").queryName("smr_within_ok")
      .outputMode("update").start()
    try {
      mem.addData(Seq(ev(8, 0, 10), ev(8, 1, 9))); q.processAllAvailable()
      mem.addData(Seq(ev(8, 2, 8), ev(8, 3, 12))); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("smr_within_ok").collect()
      .map(r => r.getString(5)).sorted
    assert(got.toSeq == Seq("DOWN", "DOWN", "STRT", "UP"))
  }

  test("ONE ROW PER MATCH measures match the batch aggregates, across batch boundaries") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[MrEvent]
    val measures: Map[String, StreamingMatchRecognize.Measure] = Map(
      "bottom" -> (rows => rows.collect { case (e, "DOWN") => e.value }.min),
      "peak_up" -> (rows => rows.collect { case (e, "UP") => e.value }.max),
      "avg_all" -> (rows => rows.map(_._1.value).sum / rows.length))
    val out = StreamingMatchRecognize.oneRowPerMatch(
      mem.toDS(), "STRT DOWN+ UP+", define, measures)
    val q = out.writeStream.format("memory").queryName("smr_measures")
      .outputMode("update").start()
    try {
      // V split across batches: 10 9 | 8 9 12, then a second V in one batch
      mem.addData(Seq(ev(9, 0, 10), ev(9, 1, 9))); q.processAllAvailable()
      mem.addData(Seq(ev(9, 2, 8), ev(9, 3, 9), ev(9, 4, 12))); q.processAllAvailable()
      mem.addData(Seq(ev(9, 5, 6), ev(9, 6, 3), ev(9, 7, 7))); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("smr_measures").as[StreamingMatchRecognize.MrMatchSummary]
      .collect().sortBy(_.match_no)
    assert(got.length == 2)
    val m1 = got(0)
    assert(m1.match_no == 1L && m1.start_ts == 0L && m1.end_ts == 4000L && m1.n_rows == 5L)
    assert(m1.measures("bottom") == 8.0)
    assert(m1.measures("peak_up") == 12.0)
    assert(math.abs(m1.measures("avg_all") - (10 + 9 + 8 + 9 + 12) / 5.0) < 1e-12)
    val m2 = got(1)
    assert(m2.match_no == 2L && m2.n_rows == 3L)
    assert(m2.measures("bottom") == 3.0 && m2.measures("peak_up") == 7.0)
  }

  test("keys are isolated and matches number independently") {
    val mixed = Seq(
      ev(1, 0, 5), ev(1, 1, 4), ev(1, 2, 6),
      ev(2, 0, 5), ev(2, 1, 6)) // key 2 has no V
    val got = runChunks(Seq(mixed))
    assert(got.forall(_._1 == 1L))
    assert(got.map(_._3) == Seq("STRT", "DOWN", "UP"))
  }
}
