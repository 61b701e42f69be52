package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.DataType

/** MULTISET ALL-semantics scalar operators (ref:
  * SqlStdOperatorTable.java:143-173 MULTISET_UNION/EXCEPT/INTERSECT and
  * their ALL variants; SURVEY.md §7.2 lists these as custom because
  * Spark's array_union/except/intersect are DISTINCT-semantics only).
  * Bag semantics preserve multiplicity: INTERSECT ALL keeps min(m₁,m₂)
  * occurrences, EXCEPT ALL keeps max(m₁−m₂,0). Element ORDER matches the
  * reference's consume-first walk over the left operand (operator.iq:151
  * — [a, c, a] EXCEPT [a] is [c, a]: each right occurrence cancels the
  * EARLIEST remaining left occurrence, so EXCEPT keeps the LAST
  * occurrences; INTERSECT emits as soon as a right occurrence is
  * available, keeping the FIRST). */
abstract class MultisetBinaryOp extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = left.dataType

  protected def keep(leftCount: Int, rightCount: Int): Int

  /** True = the kept occurrences are the first `quota` of the left walk;
    * false = the last `quota` (the consume-first EXCEPT order). */
  protected def keepFirst: Boolean

  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData].toObjectArray(
      left.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType)
    val ra = r.asInstanceOf[ArrayData].toObjectArray(
      left.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType)
    val rightCounts = mutable.HashMap.empty[Any, Int]
    ra.foreach(e => rightCounts.update(e, rightCounts.getOrElse(e, 0) + 1))
    val leftCounts = mutable.HashMap.empty[Any, Int]
    la.foreach(e => leftCounts.update(e, leftCounts.getOrElse(e, 0) + 1))
    val seen = mutable.HashMap.empty[Any, Int]
    val out = mutable.ArrayBuffer.empty[Any]
    la.foreach { e =>
      val quota = keep(leftCounts(e), rightCounts.getOrElse(e, 0))
      val s = seen.getOrElse(e, 0) + 1
      seen.update(e, s)
      val emit = if (keepFirst) s <= quota else s > leftCounts(e) - quota
      if (emit) out += e
    }
    new GenericArrayData(out.toArray)
  }
}

/** multiset_intersect_all: min multiplicity. */
case class MultisetIntersectAll(left: Expression, right: Expression) extends MultisetBinaryOp {
  override protected def keep(lc: Int, rc: Int): Int = math.min(lc, rc)
  override protected def keepFirst: Boolean = true
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName: String = "multiset_intersect_all"
}

/** multiset_except_all: left multiplicity minus right multiplicity. */
case class MultisetExceptAll(left: Expression, right: Expression) extends MultisetBinaryOp {
  override protected def keep(lc: Int, rc: Int): Int = math.max(lc - rc, 0)
  override protected def keepFirst: Boolean = false
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName: String = "multiset_except_all"
}

/** submultiset_of predicate (ref: SqlStdOperatorTable.java:725). */
case class SubmultisetOf(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val et = left.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    val la = l.asInstanceOf[ArrayData].toObjectArray(et)
    val ra = r.asInstanceOf[ArrayData].toObjectArray(et)
    val rc = mutable.HashMap.empty[Any, Int]
    ra.foreach(e => rc.update(e, rc.getOrElse(e, 0) + 1))
    val lc = mutable.HashMap.empty[Any, Int]
    la.foreach(e => lc.update(e, lc.getOrElse(e, 0) + 1))
    lc.forall { case (e, n) => rc.getOrElse(e, 0) >= n }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName: String = "submultiset_of"
}
