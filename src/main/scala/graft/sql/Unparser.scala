package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, NamedExpression, SortOrder}
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Plan → SQL unparser (ref: rel2sql/RelToSqlConverter.java + the JDBC
  * adapter's JdbcImplementor.java — the reference ships whole optimized
  * subtrees to a foreign database by unparsing algebra back to dialect
  * SQL; 46 dialects under sql/dialect/).
  *
  * Spark-first scope: the subtree shapes the JDBC adapter actually
  * pushes — scan / filter / project / aggregate / sort / limit / inner
  * equi-join — over file-backed relations, rendered as ANSI SQL with
  * `parquet.`path`` table refs (so the text is directly runnable by
  * spark.sql, and by DuckDB after a read_parquet rewrite of the FROM
  * clause). Catalyst's `Expression.sql` supplies scalar rendering —
  * the 5,218-LoC RexImpTable dispatch collapses into it. Plans outside
  * the scope return None rather than wrong SQL.
  */
object Unparser {

  /** Unparse a DataFrame's analyzed plan; None if any node falls
    * outside the supported subtree shapes. */
  def unparse(df: DataFrame): Option[String] = top(df.queryExecution.analyzed)

  private def quote(path: String): String = s"parquet.`$path`"

  private final case class Block(
      select: Option[Seq[NamedExpression]], // None = SELECT *
      where: Seq[Expression],
      groupBy: Option[Seq[Expression]],
      having: Seq[Expression],
      orderBy: Seq[SortOrder],
      limit: Option[Long],
      from: String)

  private def emptyBlock(from: String) =
    Block(None, Nil, None, Nil, Nil, None, from)

  private def render(b: Block): String = {
    val sel = b.select match {
      case None => "*"
      case Some(es) => es.map {
        case a: AttributeReference => qid(a.name)
        case Alias(child, name) => s"${child.sql} AS ${qid(name)}"
        case e => e.sql
      }.mkString(", ")
    }
    val sb = new StringBuilder(s"SELECT $sel FROM ${b.from}")
    if (b.where.nonEmpty)
      sb.append(" WHERE ").append(b.where.map(_.sql).mkString(" AND "))
    b.groupBy.foreach { gs =>
      if (gs.nonEmpty)
        sb.append(" GROUP BY ").append(gs.map(_.sql).mkString(", "))
    }
    if (b.having.nonEmpty)
      sb.append(" HAVING ").append(b.having.map(_.sql).mkString(" AND "))
    if (b.orderBy.nonEmpty)
      sb.append(" ORDER BY ").append(b.orderBy.map(_.sql).mkString(", "))
    b.limit.foreach(n => sb.append(s" LIMIT $n"))
    sb.toString
  }

  private def qid(name: String): String =
    if (name.matches("[A-Za-z_][A-Za-z0-9_]*")) name else s"`$name`"

  private def top(p: LogicalPlan): Option[String] = build(p).map(render)

  /** Fold the plan into one SELECT block, wrapping in a subquery when a
    * clause slot is already taken (e.g. filter above aggregate →
    * HAVING; project above project → nested select). */
  private def build(p: LogicalPlan): Option[Block] = p match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.toList match {
          case single :: Nil => Some(emptyBlock(quote(single.toString)))
          case _ => None
        }
      case _ => None
    }
    case SubqueryAlias(_, ch) => build(ch)

    case Filter(cond, ch) => build(ch).map { b =>
      if (b.groupBy.isDefined) b.copy(having = b.having :+ cond)
      else if (b.limit.isDefined || b.orderBy.nonEmpty) wrap(b).copy(where = Seq(cond))
      else b.copy(where = b.where :+ cond)
    }

    case Project(exprs, ch) => build(ch).map { b =>
      val renderable = exprs.forall {
        case _: AttributeReference => true
        case Alias(e, _) => scalarOk(e)
        case _ => false
      }
      if (!renderable) return None
      if (b.select.isDefined || b.groupBy.isDefined) wrap(b).copy(select = Some(exprs))
      else b.copy(select = Some(exprs))
    }

    case Aggregate(groupings, aggExprs, ch, _) => build(ch).map { b =>
      val base = if (b.select.isDefined || b.groupBy.isDefined ||
        b.limit.isDefined || b.orderBy.nonEmpty) wrap(b) else b
      base.copy(select = Some(aggExprs), groupBy = Some(groupings))
    }

    case Sort(order, global, ch, _) if global =>
      build(ch).map(b => b.copy(orderBy = order))

    case GlobalLimit(expr, ch) => build(ch).map { b =>
      val n = expr.eval().asInstanceOf[Number].longValue()
      b.copy(limit = Some(b.limit.fold(n)(math.min(_, n))))
    }
    case LocalLimit(_, ch) => build(ch)

    case Join(l, r, Inner, Some(cond), _) =>
      for {
        lb <- build(l)
        rb <- build(r)
        // only bare-scan sides join flat; anything else nests
        lf = if (isBare(lb)) lb.from else s"(${render(lb)})"
        rf = if (isBare(rb)) rb.from else s"(${render(rb)})"
      } yield emptyBlock(s"$lf JOIN $rf ON ${cond.sql}")

    case _ => None
  }

  private def isBare(b: Block): Boolean =
    b.select.isEmpty && b.where.isEmpty && b.groupBy.isEmpty &&
      b.orderBy.isEmpty && b.limit.isEmpty

  private def wrap(b: Block): Block = emptyBlock(s"(${render(b)})")

  /** Scalar expressions whose `.sql` is faithful ANSI (no codegen-only
    * internals, no plan subqueries). */
  private def scalarOk(e: Expression): Boolean =
    e.find {
      case _: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] => true
      case _ => false
    }.isEmpty
}
