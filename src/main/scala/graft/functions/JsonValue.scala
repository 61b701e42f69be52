package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SQL/JSON JSON_VALUE error semantics (ref: runtime/JsonFunctions
  * .java:1 jsonValueAny behaviors, SqlStdOperatorTable.java:1655
  * JSON_VALUE syntax `JSON_VALUE(doc, path {NULL|ERROR|DEFAULT v} ON
  * {EMPTY|ERROR}`).
  *
  * Spark's get_json_object is lax-only (NULL for both a missing path
  * and malformed input). This module distinguishes the two SQL/JSON
  * conditions and applies the declared behavior for each:
  * - ERROR  = the document is not valid JSON;
  * - EMPTY  = the document is valid but the path selects nothing.
  *
  * The result is a pure Column expression (when/otherwise +
  * raise_error), so it stays inside whole-stage codegen — no UDF. */
object JsonValue {

  sealed trait Behavior
  /** NULL ON EMPTY / NULL ON ERROR (the lax default). */
  case object ReturnNull extends Behavior
  /** ERROR ON EMPTY / ERROR ON ERROR (strict mode): raise at runtime. */
  case object Raise extends Behavior
  /** DEFAULT <expr> ON EMPTY / ON ERROR. */
  final case class Default(value: Column) extends Behavior

  private def apply(b: Behavior, cond: String, path: String): Column = b match {
    case ReturnNull => lit(null).cast("string")
    case Raise => raise_error(
      concat(lit(s"JSON_VALUE $cond (strict): path '$path' over "), lit("input")))
    case Default(v) => v.cast("string")
  }

  /** JSON_VALUE(doc, path ... ON EMPTY ... ON ERROR).
    *
    * Validity is probed with `get_json_object(doc, "$")`: non-null iff
    * the document parses. NULL input documents yield NULL (SQL norm)
    * rather than either behavior. */
  def jsonValue(
      doc: Column,
      path: String,
      onEmpty: Behavior = ReturnNull,
      onError: Behavior = ReturnNull): Column = {
    val parsed = get_json_object(doc, "$")
    val v = get_json_object(doc, path)
    when(doc.isNull, lit(null).cast("string"))
      .when(parsed.isNull, apply(onError, "ON ERROR", path))
      .when(v.isNull, apply(onEmpty, "ON EMPTY", path))
      .otherwise(v)
  }
}
