package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, StringType}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.unsafe.types.UTF8String

/** SQL:2016 `SIMILAR TO` predicate (ref: SqlStdOperatorTable.java:1734
  * SIMILAR_TO; runtime translation in runtime/SqlFunctions.java `similar`).
  * Spark has LIKE and RLIKE but not SIMILAR TO, whose pattern language is
  * SQL-wildcard (%/_) layered over a POSIX-regex subset, anchored at both
  * ends.
  *
  * The SQL pattern is translated to a Java regex once per distinct
  * pattern (tiny LRU-free cache — patterns are almost always literals)
  * and matched with `matches()` (full anchoring per the standard).
  */
case class SimilarTo(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    TypeCheckResult.TypeCheckSuccess
  override def nullSafeEval(str: Any, pat: Any): Any = {
    val p = SimilarTo.compiled(pat.asInstanceOf[UTF8String].toString)
    p.matcher(str.asInstanceOf[UTF8String].toString).matches()
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "similar_to"
}

object SimilarTo {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()

  private[graft] def compiled(sqlPattern: String): java.util.regex.Pattern =
    cache.computeIfAbsent(sqlPattern, p => java.util.regex.Pattern.compile(translate(p)))

  /** SQL SIMILAR pattern → Java regex. `%`→`.*`, `_`→`.`; SQL's own
    * regex operators (| * + ? {m,n} ( ) [ ]) pass through; everything
    * else regex-special is quoted. Bracket expressions pass through
    * verbatim (SQL and Java agree on [a-z] / [^a-z]). */
  private[functions] def translate(p: String): String = {
    val sb = new StringBuilder
    var inBracket = false
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      if (inBracket) {
        sb.append(c)
        if (c == ']') inBracket = false
      } else c match {
        case '%' => sb.append(".*")
        case '_' => sb.append('.')
        case '[' => sb.append('['); inBracket = true
        case '|' | '*' | '+' | '?' | '(' | ')' | '{' | '}' => sb.append(c)
        case '.' | '^' | '$' | '\\' => sb.append('\\').append(c)
        case other => sb.append(other)
      }
      i += 1
    }
    sb.toString
  }
}
