package graft

import graft.plans.MatchRecognize
import graft.plans.MatchRecognize.{SkipPastLastRow, SkipToNextRow}
import org.apache.spark.sql.Row

/** Semantics tests for the row-pattern engine against hand-built
  * sequences (the approach of match.iq, minus the SQL surface). */
class MatchRecognizeSpec extends SparkSpec {
  import spark.implicits._

  private def seqDf(vals: Double*) =
    vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
      .toDF("k", "pos", "v")

  private def mr(df: org.apache.spark.sql.DataFrame, pattern: String,
      define: Map[String, MatchRecognize.Define],
      skip: MatchRecognize.Skip = SkipPastLastRow) =
    MatchRecognize.matchRecognize(df, Seq("k"), Seq("pos"), pattern, define, skip)
      .select("pos", "match_no", "classifier")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toList
      .sortBy(x => (x._2, x._1))

  private val down: MatchRecognize.Define =
    (cur, prev) => prev.exists(p => cur.getDouble(2) < p.getDouble(2))
  private val up: MatchRecognize.Define =
    (cur, prev) => prev.exists(p => cur.getDouble(2) > p.getDouble(2))

  test("V-shape STRT DOWN+ UP+ finds the greedy valley") {
    // 10 9 8 9 10 : STRT=10, DOWN=9,8, UP=9,10
    val got = mr(seqDf(10, 9, 8, 9, 10), "STRT DOWN+ UP+",
      Map("DOWN" -> down, "UP" -> up))
    assert(got == List(
      (0L, 1L, "STRT"), (1L, 1L, "DOWN"), (2L, 1L, "DOWN"),
      (3L, 1L, "UP"), (4L, 1L, "UP")))
  }

  test("two disjoint V's with SKIP PAST LAST ROW") {
    // V1 = 10,9,11 (UP+ stops: 8 < 11), V2 = 8,7,12
    val got = mr(seqDf(10, 9, 11, 8, 7, 12), "STRT DOWN+ UP+",
      Map("DOWN" -> down, "UP" -> up))
    assert(got.count(_._3 == "STRT") == 2)
    assert(got.map(_._2).distinct == List(1L, 2L))
  }

  test("alternation and exact quantifier") {
    // A = v>=10, B = v<10 ; pattern (A|B){3} matches any 3 rows
    val got = mr(seqDf(11, 2, 13), "(A | B){3}",
      Map("A" -> ((c, _) => c.getDouble(2) >= 10), "B" -> ((c, _) => c.getDouble(2) < 10)))
    assert(got.map(_._3) == List("A", "B", "A"))
  }

  test("greedy quantifier consumes maximal run") {
    // D+ on strictly decreasing run, then final row ends the match
    val got = mr(seqDf(9, 8, 7, 6, 9), "D+ U",
      Map("D" -> down, "U" -> up))
    // D cannot match pos0 (no prev); D matches 1,2,3; U matches 4
    assert(got == List((1L, 1L, "D"), (2L, 1L, "D"), (3L, 1L, "D"), (4L, 1L, "U")))
  }

  test("optional and bounded quantifiers") {
    val hi: MatchRecognize.Define = (c, _) => c.getDouble(2) > 5
    val got = mr(seqDf(6, 7, 1), "H{1,2} L?",
      Map("H" -> hi, "L" -> ((c, _) => c.getDouble(2) <= 5)))
    assert(got == List((0L, 1L, "H"), (1L, 1L, "H"), (2L, 1L, "L")))
  }

  test("reluctant +? consumes the minimal run where greedy + consumes all") {
    val hi: MatchRecognize.Define = (c, _) => c.getDouble(2) > 5
    // H+ : one greedy match of the whole run
    val greedy = mr(seqDf(6, 7, 8), "H+", Map("H" -> hi))
    assert(greedy.map(x => (x._2, x._3)) == List((1L, "H"), (1L, "H"), (1L, "H")))
    // H+? : each match stops at one row → three matches
    val lzy = mr(seqDf(6, 7, 8), "H+?", Map("H" -> hi))
    assert(lzy.map(x => (x._2, x._3)) == List((1L, "H"), (2L, "H"), (3L, "H")), s"got $lzy")
    // with a required tail the reluctant form still backtracks forward
    // (leftmost match wins): H+? L on 6,7,8,1 consumes all highs
    val tail = mr(seqDf(6, 7, 8, 1), "H+? L",
      Map("H" -> hi, "L" -> ((c, _) => c.getDouble(2) <= 5)))
    assert(tail.map(_._3) == List("H", "H", "H", "L"))
  }

  test("reluctant *? and ?? prefer zero-width") {
    val hi: MatchRecognize.Define = (c, _) => c.getDouble(2) > 5
    val lo: MatchRecognize.Define = (c, _) => c.getDouble(2) <= 5
    // H*? L on 6,1: zero H's preferred, L alone matches at pos 1... but
    // leftmost match at pos 0 needs L at pos 0 (6 is high) → backtrack
    // expands H once.
    val got = mr(seqDf(6, 1), "H*? L", Map("H" -> hi, "L" -> lo))
    assert(got.map(_._3) == List("H", "L"))
    // H?? L on 1: optional-lazy H skipped entirely
    val got2 = mr(seqDf(1), "H?? L", Map("H" -> hi, "L" -> lo))
    assert(got2.map(_._3) == List("L"))
  }

  test("bounded reluctant {n,m}? stops at n when the tail matches") {
    val any: MatchRecognize.Define = (_, _) => true
    val lo: MatchRecognize.Define = (c, _) => c.getDouble(2) <= 5
    // A{1,3}? L on 9,9,1 : lazy takes 1 A, L fails on 9, expand to 2, L on 1 ✓
    val got = mr(seqDf(9, 9, 1), "A{1,3}? L", Map("A" -> any, "L" -> lo))
    assert(got.map(_._3) == List("A", "A", "L"))
  }

  test("PREV(2) via full-context DEFINE: rise over two steps") {
    import org.apache.spark.sql.Row
    // UP2: current > value two rows back (PREV depth 2)
    val up2: MatchRecognize.DefineCtx = (rows, pos) =>
      MatchRecognize.nav(rows, pos, -2).exists(p =>
        rows(pos).getDouble(2) > p.getDouble(2))
    val df = seqDf(5, 9, 7, 12)
    val got = MatchRecognize.matchRecognizeCtx(df, Seq("k"), Seq("pos"),
      "STRT UP2", Map("UP2" -> up2))
      .select("pos", "match_no", "classifier")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toList
      .sortBy(x => (x._2, x._1))
    // the only match starts at pos 1: rows(2)=7 > rows(0)=5 (PREV(2));
    // pos 0-1 can't match (PREV(2) out of range), pos 3 has no successor
    assert(got.map(x => (x._1, x._2, x._3)) ==
      List((1L, 1L, "STRT"), (2L, 1L, "UP2")), s"got $got")
  }

  test("EXCLUDE {- -}: rows consumed but suppressed from output") {
    val hi: MatchRecognize.Define = (c, _) => c.getDouble(2) >= 10
    val lo: MatchRecognize.Define = (c, _) => c.getDouble(2) < 10
    // A {- L+ -} B over 12, 3, 4, 15: L rows consumed, not emitted
    val got = mr(seqDf(12, 3, 4, 15), "H {- L+ -} H2",
      Map("H" -> hi, "L" -> lo, "H2" -> hi))
    assert(got.map(x => (x._1, x._3)) == List((0L, "H"), (3L, "H2")), s"got $got")
    // SKIP PAST LAST ROW skips the excluded span too: no second match
    assert(got.map(_._2).distinct == List(1L))
  }

  test("PERMUTE matches its elements in any order") {
    val hi: MatchRecognize.Define = (c, _) => c.getDouble(2) >= 10
    val lo: MatchRecognize.Define = (c, _) => c.getDouble(2) < 10
    // H then L
    val hl = mr(seqDf(12, 3), "PERMUTE(H, L)", Map("H" -> hi, "L" -> lo))
    assert(hl.map(_._3) == List("H", "L"))
    // L then H — same pattern, opposite order
    val lh = mr(seqDf(3, 12), "PERMUTE(H, L)", Map("H" -> hi, "L" -> lo))
    assert(lh.map(_._3) == List("L", "H"))
    // three elements with a quantified member
    val three = mr(seqDf(3, 12, 12, 5), "PERMUTE(L, H+) E",
      Map("H" -> hi, "L" -> lo, "E" -> ((c, _) => c.getDouble(2) == 5)))
    assert(three.map(_._3) == List("L", "H", "H", "E"))
  }

  test("SUBSET + MEASURES collapse to one row per match") {
    import org.apache.spark.sql.functions._
    val df = seqDf(10, 9, 8, 9, 10)
    val all = MatchRecognize.matchRecognize(df, Seq("k"), Seq("pos"),
      "STRT DOWN+ UP+", Map("DOWN" -> down, "UP" -> up))
    val one = MatchRecognize.oneRowPerMatch(all, Seq("k"), Seq(
      min(MatchRecognize.sym("DOWN", col("v"))).as("bottom"),
      max(when(MatchRecognize.subset("DOWN", "UP"), col("v"))).as("peak_move"),
      count(lit(1)).as("len")))
    val r = one.collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Double]("bottom") == 8.0)   // lowest DOWN row
    assert(row.getAs[Double]("peak_move") == 10.0) // max over the subset
    assert(row.getAs[Long]("len") == 5L)
  }

  test("SKIP TO NEXT ROW yields overlapping matches") {
    val hi: MatchRecognize.Define = (c, _) => c.getDouble(2) > 5
    val got = mr(seqDf(6, 7, 8), "H H", Map("H" -> hi), SkipToNextRow)
    assert(got.map(_._2).distinct.size == 2) // matches at pos0 and pos1
  }

  test("partition isolation: patterns never cross partition keys") {
    val df = Seq((1L, 0L, 10.0), (1L, 1L, 9.0), (2L, 0L, 8.0), (2L, 1L, 9.0))
      .toDF("k", "pos", "v")
    val got = MatchRecognize.matchRecognize(df, Seq("k"), Seq("pos"),
      "STRT DOWN+ UP+", Map("DOWN" -> down, "UP" -> up))
      .collect()
    assert(got.isEmpty) // each partition alone has no full V
  }

  test("q98 output: every match is a valid V per user") {
    // replay each reported match against the ordered event stream
    val ev = T(spark, sfDir, "events")
      .select("user_id", "event_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(t => (t._3.getTime, t._2)).toIndexedSeq).toMap
    val rows = run("q98_match_recognize_v").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (u, start, end) = (r.getLong(0), r.getLong(2), r.getLong(3))
      val (nDown, nUp) = (r.getLong(4).toInt, r.getLong(5).toInt)
      assert(nDown >= 1 && nUp >= 1)
      val seq = ev(u)
      val i0 = seq.indexWhere(_._2 == start)
      val i1 = seq.indexWhere(_._2 == end)
      assert(i0 >= 1, "a DOWN row needs a predecessor")
      assert(i1 - i0 + 1 == nDown + nUp, "match rows = down-run + up-run")
      val vals = seq.slice(i0 - 1, i1 + 1).map(_._4) // peak .. trough .. end
      val descent = vals.slice(0, nDown + 1)
      val ascent = vals.slice(nDown, vals.length)
      assert(descent.sliding(2).forall { case Seq(a, b) => b < a; case _ => true })
      assert(ascent.sliding(2).forall { case Seq(a, b) => b > a; case _ => true })
      assert(r.getDouble(6) == vals(nDown), "trough is the run boundary value")
    }
  }

  test("WITHIN duration constrains match span") {
    import java.sql.Timestamp
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val df = Seq(
      (1L, ts(0), 10.0), (1L, ts(5), 9.0), (1L, ts(40), 11.0), // V spans 40 min
      (2L, ts(0), 10.0), (2L, ts(5), 9.0), (2L, ts(10), 11.0)) // V spans 10 min
      .toDF("k", "t", "v")
    def vMatch(within: Option[(String, Long)]) =
      MatchRecognize.matchRecognize(df, Seq("k"), Seq("t"), "STRT DOWN UP",
        Map(
          "DOWN" -> ((c, p) => p.exists(r => c.getDouble(2) < r.getDouble(2))),
          "UP" -> ((c, p) => p.exists(r => c.getDouble(2) > r.getDouble(2)))),
        MatchRecognize.SkipPastLastRow, within)
    assert(vMatch(None).select("k").distinct().count() == 2)
    val bounded = vMatch(Some(("t", 15L * 60 * 1000)))
    assert(bounded.select("k").distinct().collect().map(_.getLong(0)).toSeq == Seq(2L))
  }
}
