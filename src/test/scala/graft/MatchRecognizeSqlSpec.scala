package graft

import org.apache.spark.sql.Row

import graft.sql.GraftSql

/** SQL-surface MATCH_RECOGNIZE (sql/MatchRecognizeSql.scala) — the paths
  * the q100/q102 oracles don't cover: ALL ROWS PER MATCH, SUBSET-scoped
  * measures, WITHIN pruning, NEXT navigation, CLASSIFIER()/
  * MATCH_NUMBER(). Ref: sql/SqlMatchRecognize.java, match.iq. */
class MatchRecognizeSqlSpec extends SparkSpec {

  private def ticker(): Unit = {
    import spark.implicits._
    // (symbol, tick, price): one V-shape per symbol, A's offset by noise
    Seq(
      ("A", 1L, 10.0), ("A", 2L, 8.0), ("A", 3L, 6.0), ("A", 4L, 9.0), ("A", 5L, 12.0),
      ("B", 1L, 5.0), ("B", 2L, 7.0), ("B", 3L, 4.0), ("B", 4L, 6.0), ("B", 5L, 3.0))
      .toDF("symbol", "tick", "price")
      .createOrReplaceTempView("ticker")
  }

  test("ALL ROWS PER MATCH emits each matched row with match_no and classifier") {
    ticker()
    val got = GraftSql.sql(spark, """
      SELECT symbol, tick, price, match_no, classifier
      FROM ticker MATCH_RECOGNIZE (
        PARTITION BY symbol
        ORDER BY tick
        ALL ROWS PER MATCH
        PATTERN (STRT DOWN+ UP+)
        DEFINE DOWN AS DOWN.price < PREV(DOWN.price),
               UP AS UP.price > PREV(UP.price)
      ) ORDER BY symbol, tick""").collect()
    // A: ticks 1-5 (10 > 8 > 6 < 9 < 12); B: ticks 2-4 (7 > 4 < 6)
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("A", 1L), ("A", 2L), ("A", 3L), ("A", 4L), ("A", 5L),
        ("B", 2L), ("B", 3L), ("B", 4L)))
    val aCls = got.filter(_.getString(0) == "A").map(_.getString(4)).toSeq
    assert(aCls == Seq("STRT", "DOWN", "DOWN", "UP", "UP"))
    assert(got.forall(_.getLong(3) == 1L))
  }

  test("ALL ROWS measures are FINAL aggregates; CLASSIFIER/MATCH_NUMBER work") {
    ticker()
    val got = GraftSql.sql(spark, """
      SELECT symbol, tick, cls, mno, bottom
      FROM ticker MATCH_RECOGNIZE (
        PARTITION BY symbol
        ORDER BY tick
        MEASURES CLASSIFIER() AS cls, MATCH_NUMBER() AS mno, MIN(price) AS bottom
        ALL ROWS PER MATCH
        PATTERN (STRT DOWN+ UP+)
        DEFINE DOWN AS DOWN.price < PREV(DOWN.price),
               UP AS UP.price > PREV(UP.price)
      ) ORDER BY symbol, tick""").collect()
    val a = got.filter(_.getString(0) == "A")
    assert(a.map(_.getString(2)).toSeq == Seq("STRT", "DOWN", "DOWN", "UP", "UP"))
    assert(a.forall(_.getLong(3) == 1L))
    assert(a.forall(_.getDouble(4) == 6.0)) // FINAL MIN over the whole match
  }

  test("SUBSET scopes a measure over multiple symbols") {
    ticker()
    val got = GraftSql.sql(spark, """
      SELECT symbol, n_updown
      FROM ticker MATCH_RECOGNIZE (
        PARTITION BY symbol
        ORDER BY tick
        MEASURES COUNT(UD.*) AS n_updown
        ONE ROW PER MATCH
        PATTERN (STRT DOWN+ UP+)
        SUBSET UD = (DOWN, UP)
        DEFINE DOWN AS DOWN.price < PREV(DOWN.price),
               UP AS UP.price > PREV(UP.price)
      ) ORDER BY symbol""").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("A", 4L), ("B", 2L)))
  }

  test("NEXT navigation lowers to lead()") {
    ticker()
    // PEAK: the next price is lower than the current one
    val got = GraftSql.sql(spark, """
      SELECT symbol, tick
      FROM ticker MATCH_RECOGNIZE (
        PARTITION BY symbol
        ORDER BY tick
        MEASURES FIRST(PEAK.tick) AS tick
        ONE ROW PER MATCH
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (PEAK)
        DEFINE PEAK AS NEXT(PEAK.price) < PEAK.price
      ) ORDER BY symbol, tick""").collect()
    // A: 10>8 at t1, 9? no (9<12), so t1 only... plus 8>6 at t2
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("A", 1L), ("A", 2L), ("B", 2L), ("B", 4L)))
  }

  test("WITHIN prunes matches that exceed the window") {
    import spark.implicits._
    Seq((1L, 1000L, 200.0), (1L, 2000L, 210.0), (1L, 500000L, 220.0))
      .toDF("k", "ts", "v").createOrReplaceTempView("evts")
    val within = GraftSql.sql(spark, """
      SELECT k, n
      FROM evts MATCH_RECOGNIZE (
        PARTITION BY k
        ORDER BY ts
        MEASURES COUNT(*) AS n
        ONE ROW PER MATCH
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (H H)
        WITHIN INTERVAL '1' MINUTE
        DEFINE H AS H.v > 100.0
      )""").collect()
    // (1000,2000) fits in a minute; (2000,500000) exceeds it
    assert(within.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("trailing WHERE and alias compose over the match relation") {
    ticker()
    val got = GraftSql.sql(spark, """
      SELECT m.symbol, m.bottom
      FROM ticker MATCH_RECOGNIZE (
        PARTITION BY symbol
        ORDER BY tick
        MEASURES MIN(DOWN.price) AS bottom
        ONE ROW PER MATCH
        PATTERN (STRT DOWN+ UP+)
        DEFINE DOWN AS DOWN.price < PREV(DOWN.price),
               UP AS UP.price > PREV(UP.price)
      ) AS m
      WHERE m.bottom < 5.0
      ORDER BY m.symbol""").collect()
    assert(got.map(r => (r.getString(0), r.getDouble(1))).toSeq == Seq(("B", 4.0)))
  }
}
