package graft

import graft.functions.Sequences
import org.apache.spark.sql.functions._

/** Sequence semantics (sequence.iq): unique dense values, START/INCREMENT
  * honored, cursor continues across statements, no global shuffle. */
class SequencesSpec extends SparkSpec {
  import spark.implicits._

  test("NEXT_VALUE assigns unique dense values across partitions") {
    Sequences.create("s1")
    try {
      val df = (1 to 1000).toDF("x").repartition(8)
      val got = Sequences.withSequence(df, "s1", "id")
      val ids = got.select("id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == (1L to 1000L))
    } finally Sequences.drop("s1")
  }

  test("START WITH / INCREMENT BY are honored") {
    Sequences.create("s2", start = 100L, step = 5L)
    try {
      val got = Sequences.withSequence((1 to 4).toDF("x"), "s2", "id")
      assert(got.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(100L, 105L, 110L, 115L))
    } finally Sequences.drop("s2")
  }

  test("cursor continues across statements (cross-statement NEXT_VALUE)") {
    Sequences.create("s3")
    try {
      Sequences.withSequence((1 to 10).toDF("x"), "s3", "id").count()
      assert(Sequences.currentValue("s3") == 11L)
      val second = Sequences.withSequence((1 to 5).toDF("x"), "s3", "id")
      val ids = second.select("id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == (11L to 15L))
    } finally Sequences.drop("s3")
  }

  test("empty input advances nothing") {
    Sequences.create("s4")
    try {
      val empty = spark.range(0).toDF("x")
      assert(Sequences.withSequence(empty, "s4", "id").count() == 0)
      assert(Sequences.currentValue("s4") == 1L)
    } finally Sequences.drop("s4")
  }
}
