package graft

import graft.streaming.StreamingAsofJoin
import graft.streaming.StreamingAsofJoin.{AsofEvent, AsofMatch}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming ASOF join: cross-batch carry of the most recent right
  * row, unmatched-left NULLs, lateness accounting — drained result
  * equals the batch asof semantics over the same data.
  */
class StreamingAsofSpec extends SparkSpec {
  import spark.implicits._

  private def l(ts: Long, v: Double) = AsofEvent(1L, ts, isLeft = true, v, 0.0)
  private def r(ts: Long, v: Double) = AsofEvent(1L, ts, isLeft = false, 0.0, v)

  private def runBatches(batches: Seq[Seq[AsofEvent]], lateness: Long): Seq[AsofMatch] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[AsofEvent]
    val out = StreamingAsofJoin(mem.toDS(), lateness)
    val q = out.writeStream.format("memory")
      .queryName("asof_stream_out").outputMode("update").start()
    try batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table("asof_stream_out").as[AsofMatch].collect().toSeq.sortBy(_.ts)
  }

  test("cross-batch most-recent-right carry with unmatched-left NULLs") {
    val got = runBatches(Seq(
      Seq(l(5, 50.0), r(10, 1.0), l(15, 150.0), r(20, 2.0), l(25, 250.0)),
      Seq(l(28, 280.0), r(30, 3.0), l(35, 350.0))), lateness = 0)
    val want = Seq(
      AsofMatch(1L, 5, 50.0, None, None), // before any right row
      AsofMatch(1L, 15, 150.0, Some(10), Some(1.0)),
      AsofMatch(1L, 25, 250.0, Some(20), Some(2.0)),
      AsofMatch(1L, 28, 280.0, Some(20), Some(2.0)), // right 30 is later
      AsofMatch(1L, 35, 350.0, Some(30), Some(3.0)))
    assert(got == want)
  }

  test("lateness window holds left rows until a late right row can no longer preempt") {
    // lateness 10: left 25 is held in batch 1 (horizon 15), so the
    // late-arriving right 22 in batch 2 still matches it
    val got = runBatches(Seq(
      Seq(r(10, 1.0), l(25, 250.0)),
      Seq(r(22, 9.0), l(40, 400.0)), // horizon 30: left 25 emits vs right 22
      Seq(l(50, 500.0))), // horizon 40: left 40 emits vs right 22
      lateness = 10)
    assert(got.filter(_.ts == 25) ==
      Seq(AsofMatch(1L, 25, 250.0, Some(22), Some(9.0))))
    assert(got.filter(_.ts == 40) ==
      Seq(AsofMatch(1L, 40, 400.0, Some(22), Some(9.0))))
    // ts=50 still buffered (horizon 40) — not emitted, and that's the contract
    assert(!got.exists(_.ts == 50))
  }

  test("equivalence with the batch asof lowering over the drained prefix") {
    import org.apache.spark.sql.functions._
    val events = Seq(
      l(5, 50.0), r(10, 1.0), l(15, 150.0), r(20, 2.0),
      l(25, 250.0), l(28, 280.0), r(30, 3.0), l(35, 350.0))
    val got = runBatches(Seq(events), lateness = 0)

    val left = events.filter(_.isLeft).map(e => (e.key, e.ts, e.leftVal))
      .toDF("k", "ts", "lv")
    val right = events.filterNot(_.isLeft).map(e => (e.key, e.ts, e.rightVal))
      .toDF("k", "rts", "rv")
    val batch = graft.plans.AsofJoin.leftAsof(left, right, "k", "ts", "rts", Seq("rv"))
      .select(col("ts"), col("rts"), col("rv"))
      .collect().map(r0 => (r0.getLong(0),
        Option(r0.get(1)).map(_.asInstanceOf[Long]),
        Option(r0.get(2)).map(_.asInstanceOf[Double]))).sortBy(_._1)
    assert(got.map(m => (m.ts, m.rightTs, m.rightVal)) == batch.toSeq)
  }
}
