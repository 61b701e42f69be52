package graft

import graft.functions.JsonValue
import graft.functions.JsonValue.{Default, Raise, ReturnNull}
import org.apache.spark.sql.functions._

/** SQL/JSON JSON_VALUE ON EMPTY / ON ERROR behaviors (strict vs lax),
  * per runtime/JsonFunctions.java semantics. */
class JsonValueSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, """{"a": {"b": 7}}"""), // valid, path present
    (2L, """{"a": {}}"""),       // valid, path EMPTY
    (3L, """not json at all"""), // ERROR
    (4L, null)                   // SQL NULL passes through
  ).toDF("id", "j")

  test("lax default: NULL for both empty and error, NULL in → NULL out") {
    val got = docs.select(col("id"), JsonValue.jsonValue(col("j"), "$.a.b").as("v"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(got == Map(1L -> Some("7"), 2L -> None, 3L -> None, 4L -> None))
  }

  test("DEFAULT ON EMPTY applies only to the empty case") {
    val got = docs.select(col("id"),
      JsonValue.jsonValue(col("j"), "$.a.b",
        onEmpty = Default(lit("dflt")), onError = ReturnNull).as("v"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(got == Map(1L -> Some("7"), 2L -> Some("dflt"), 3L -> None, 4L -> None))
  }

  test("strict ERROR ON ERROR raises on malformed JSON only") {
    val strict = docs.filter(col("id") =!= 3)
      .select(JsonValue.jsonValue(col("j"), "$.a.b", onError = Raise).as("v"))
    strict.collect() // ids 1,2,4 fine
    val e = intercept[Exception] {
      docs.select(JsonValue.jsonValue(col("j"), "$.a.b", onError = Raise).as("v")).collect()
    }
    assert(e.getMessage != null)
  }

  test("strict ERROR ON EMPTY raises on a missing path") {
    val e = intercept[Exception] {
      docs.filter(col("id") === 2)
        .select(JsonValue.jsonValue(col("j"), "$.a.b", onEmpty = Raise).as("v")).collect()
    }
    assert(e.getMessage != null)
  }
}
