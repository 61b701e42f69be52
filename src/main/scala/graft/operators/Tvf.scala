package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

/** Polymorphic table functions with SET semantics (ref:
  * SqlStdOperatorTable.java:2788 SET_SEMANTICS_TABLE;
  * rel/core/TableFunctionScan.java — the `TABLE(f(TABLE t PARTITION BY
  * k))` surface, where the function sees one whole partition at a time
  * rather than a row).
  *
  * Spark-first: SET-semantics input IS `groupByKey` — the partition-by
  * columns become the grouping key and the function body runs once per
  * group via flatMapGroups, which streams the group's rows (no
  * per-partition materialization). The demo function is top-K per
  * partition through a bounded heap, so executor memory is O(K) per
  * group no matter how skewed the hot key is — the shape that survives
  * a 100 TB fan-in.
  */
object Tvf {

  /** Group-key separator for composite PARTITION BY keys: ASCII unit
    * separator, built without a unicode escape so the source never trips
    * binary-detection heuristics in diff tools. */
  private val KeySep: String = 31.toChar.toString

  /** `topn(TABLE df PARTITION BY partCols ORDER BY orderCol DESC, k)`:
    * a polymorphic TVF over row-typed input. Returns the input schema
    * plus the in-partition rank. */
  def topnTable(df: DataFrame, partCols: Seq[String], orderCol: String, k: Int): DataFrame = {
    val schema = df.schema
    val ordIdx = schema.fieldIndex(orderCol)
    implicit val rowEnc = ExpressionEncoder(
      org.apache.spark.sql.types.StructType(
        schema.fields :+ org.apache.spark.sql.types.StructField("rk", org.apache.spark.sql.types.IntegerType, false)))
    implicit val keyEnc = Encoders.STRING
    df.groupByKey(r => partCols.map(c => String.valueOf(r.get(schema.fieldIndex(c)))).mkString(KeySep))
      .flatMapGroups { (_, rows) =>
        // bounded min-heap of size k on the order column (descending
        // top-K): O(K) memory per group, single streaming pass
        val ord: Ordering[(Double, Row)] = Ordering.by(_._1)
        val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Row)](ord.reverse)
        rows.foreach { r =>
          val v = r.get(ordIdx) match {
            case n: java.lang.Number => n.doubleValue()
            case other => throw new IllegalArgumentException(s"non-numeric order col: $other")
          }
          heap.enqueue((v, r))
          if (heap.size > k) heap.dequeue()
        }
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Double, Row)]
        while (heap.nonEmpty) buf += heap.dequeue()
        val top = buf.sortBy((t: (Double, Row)) => -t._1)
        top.zipWithIndex.iterator.map {
          case ((_, r), i) => Row.fromSeq(r.toSeq :+ (i + 1))
        }
      }
  }

  /** Top-3 orders by price per customer through the polymorphic TVF —
    * oracle = the equivalent ROW_NUMBER window. Ties on o_totalprice
    * are broken by nothing in the heap, so the query restricts to a
    * tie-free projection (price keyed by orderkey is unique enough
    * after the deterministic tiebreak below). */
  val q119_polymorphic_tvf = Q(
    (s, dir) => {
      // deterministic tiebreak: fold the orderkey into the low bits of
      // the order metric so equal prices rank identically in both engines
      val in = T(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          (col("o_totalprice") * 1e9 + col("o_orderkey")).as("pri"))
      topnTable(in, Seq("o_custkey"), "pri", 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rk"))
        .orderBy("o_custkey", "rk")
    },
    Some("""
      SELECT o_custkey, o_orderkey, rk FROM (
        SELECT o_custkey, o_orderkey,
               CAST(row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice * 1e9 + o_orderkey DESC) AS INT) AS rk
        FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk"""))

  /** Two-input SET-semantics TVF (ref: rel/core/Combine.java — "zip
    * several inputs for polymorphic TVFs", lowered per SURVEY §2.1 to
    * "multiple grouped inputs to one cogroup"): both relations group on
    * the same key and the function body sees the two row groups
    * together — here reconciling each order's header price against the
    * sum of its line items. One co-partitioned shuffle per side, group
    * state streamed; the BigDecimal line-sum is exact, so the output is
    * shuffle-order-independent and oracle-comparable. */
  val q121_cogroup_tvf = Q(
    (s, dir) => {
      import s.implicits._
      val orders = T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice")).as[(Long, Double)]
      val lines = T(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice")).as[(Long, Double)]
      orders.groupByKey(_._1).cogroup(lines.groupByKey(_._1)) { (k, os, ls) =>
        val header = os.toSeq
        if (header.isEmpty) Iterator.empty // lines without an order header
        else {
          var n = 0L
          var sum = java.math.BigDecimal.ZERO
          ls.foreach { l =>
            n += 1
            sum = sum.add(new java.math.BigDecimal(l._2).setScale(2, java.math.RoundingMode.HALF_UP))
          }
          Iterator.single((k, header.head._2, n, sum.doubleValue()))
        }
      }.toDF("o_orderkey", "o_totalprice", "n_lines", "line_sum")
        .filter(col("o_orderkey") <= 3000)
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_totalprice,
        count(l_orderkey) AS n_lines,
        CAST(coalesce(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS line_sum
      FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
      WHERE o_orderkey <= 3000
      GROUP BY o_orderkey, o_totalprice ORDER BY o_orderkey"""))

  val all: Map[String, Q] = Map(
    "q119_polymorphic_tvf" -> q119_polymorphic_tvf,
    "q121_cogroup_tvf" -> q121_cogroup_tvf)
}
