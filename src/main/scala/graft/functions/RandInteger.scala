package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType}

/** RAND_INTEGER(seed, bound) (ref: runtime/RandomFunction.java:57-71 —
  * one `java.util.Random(seed)` instantiated per query, `nextInt(bound)`
  * drawn per row, so the same seeded query replays the same sequence).
  *
  * Distribution note: the row→draw alignment is per PARTITION here (each
  * partition re-seeds), where the single-node reference has one global
  * stream. Per-partition re-seeding keeps the function deterministic
  * under Spark's retry/recompute model — a global sequence would change
  * values whenever a task re-ran or the partitioning changed, which is
  * worse than the (documented) difference in stream alignment. */
case class RandInteger(seed: Expression, bound: Expression)
    extends Expression with Nondeterministic with CodegenFallback {

  override def children: Seq[Expression] = Seq(seed, bound)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def stateful: Boolean = true

  @transient private var rng: java.util.Random = _

  override protected def initializeInternal(partitionIndex: Int): Unit = {
    val s = seed.eval(null) match {
      case n: java.lang.Number => n.longValue()
      case other => sys.error(s"rand_integer: non-numeric seed $other")
    }
    rng = new java.util.Random(s)
  }

  override protected def evalInternal(input: InternalRow): Any = {
    val b = bound.eval(input).asInstanceOf[java.lang.Number].intValue()
    rng.nextInt(b)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(seed = newChildren(0), bound = newChildren(1))
}
