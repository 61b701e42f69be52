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
    val rows = run("q98_match_recognize_v").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getString(4), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.groupBy(t => (t._1, t._2)).foreach { case (_, m) =>
      val cls = m.map(_._3)
      assert(cls.head == "STRT")
      val vals = m.map(_._4)
      val downLen = cls.count(_ == "DOWN")
      val descent = vals.slice(0, downLen + 1)
      val ascent = vals.slice(downLen, vals.length)
      assert(descent.sliding(2).forall { case Array(a, b) => b < a; case _ => true })
      assert(ascent.sliding(2).forall { case Array(a, b) => b > a; case _ => true })
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
