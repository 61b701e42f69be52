package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Subquery shapes — IN / NOT EXISTS / scalar / correlated (ref:
  * rel/rules/SubQueryRemoveRule.java:1, sql2rel/RelDecorrelator.java:1).
  * The correlated case runs through spark.sql so Catalyst's decorrelator
  * (DecorrelateInnerQuery) does the rewrite — same role as Calcite's
  * RelDecorrelator; the others are declared directly as joins, which is
  * what both optimizers lower to anyway.
  */
object Subqueries {

  /** IN (subquery) → left-semi join (ref: SqlStdOperatorTable.java:472 IN). */
  val q40_in_subquery = Q(
    (s, dir) => {
      val hot = T(s, dir, "lineitem").filter(col("l_quantity") >= 49).select(col("l_partkey"))
      T(s, dir, "part")
        .join(hot, col("p_partkey") === col("l_partkey"), "left_semi")
        .select(col("p_partkey"), col("p_name"))
        .orderBy("p_partkey")
    },
    Some("""
      SELECT p_partkey, p_name FROM part
      WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
      ORDER BY p_partkey"""))

  /** NOT EXISTS → left-anti join (ref: JoinRelType.java:73 ANTI). */
  val q41_not_exists_anti = Q(
    (s, dir) => {
      val early = T(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1995-02-01") && col("l_quantity") > 48)
        .select(col("l_suppkey"))
      T(s, dir, "supplier")
        .join(early, col("s_suppkey") === col("l_suppkey"), "left_anti")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy("s_suppkey")
    },
    Some("""
      SELECT s_suppkey, s_name FROM supplier
      WHERE NOT EXISTS (SELECT 1 FROM lineitem
                        WHERE l_suppkey = s_suppkey AND l_shipdate < TIMESTAMP '1995-02-01 00:00:00'
                          AND l_quantity > 48)
      ORDER BY s_suppkey"""))

  /** Uncorrelated scalar subquery: accounts above the global mean
    * (ref: rex/RexSubQuery.java scalar; SINGLE_VALUE
    * SqlStdOperatorTable.java:1210). Mean computed as exact decimal
    * sum / count, broadcast to the filter. */
  val q42_scalar_subquery = Q(
    (s, dir) => {
      val cust = T(s, dir, "customer")
      val mean = cust.agg(
        (sum(T.dec2(col("c_acctbal"))).cast(DoubleType) / count(lit(1))).as("mean_bal"))
      cust.crossJoin(broadcast(mean)) // 1 row by construction: global agg
        .filter(col("c_acctbal") > col("mean_bal"))
        .select(col("c_custkey"), col("c_acctbal"))
        .orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey, c_acctbal FROM customer
      WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM customer)
      ORDER BY c_custkey"""))

  /** Correlated scalar subqueries, decorrelated by Catalyst — lineitems
    * above their order's mean quantity, with the avg comparison rewritten
    * as qty*count > sum so all arithmetic stays exact
    * (ref: sql2rel/RelDecorrelator.java:1; within-group comparison as in
    * TpchTest.java Q17). */
  val q43_correlated_subquery = Q(
    (s, dir) => {
      T.registerViews(s, dir)
      s.sql("""
        SELECT l.l_orderkey AS okey, COUNT(*) AS n_above
        FROM lineitem l
        WHERE CAST(l.l_quantity AS DECIMAL(12,2)) *
              (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_orderkey = l.l_orderkey)
            > (SELECT SUM(CAST(l3.l_quantity AS DECIMAL(12,2))) FROM lineitem l3 WHERE l3.l_orderkey = l.l_orderkey)
        GROUP BY l.l_orderkey
        ORDER BY l.l_orderkey""")
    },
    Some("""
      SELECT l.l_orderkey AS okey, COUNT(*) AS n_above
      FROM lineitem l
      WHERE CAST(l.l_quantity AS DECIMAL(12,2)) *
            (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_orderkey = l.l_orderkey)
          > (SELECT SUM(CAST(l3.l_quantity AS DECIMAL(12,2))) FROM lineitem l3 WHERE l3.l_orderkey = l.l_orderkey)
      GROUP BY l.l_orderkey
      ORDER BY l.l_orderkey"""))

  /** Correlated EXISTS with an extra predicate — orders that contain a
    * discounted high-quantity line (ref: SubQueryRemoveRule.java EXISTS). */
  val q44_correlated_exists = Q(
    (s, dir) => {
      T.registerViews(s, dir)
      s.sql("""
        SELECT o_orderstatus, COUNT(*) AS n
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_discount >= 0.09 AND l_quantity >= 40)
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")
    },
    Some("""
      SELECT o_orderstatus, COUNT(*) AS n
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_discount >= 0.09 AND l_quantity >= 40)
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""))

  /** Windowed equivalent of a correlated aggregate — share of order total
    * per line, all in exact decimal (ref: rex/RexOver.java; shows the
    * decorrelated single-pass form the optimizer should reach). */
  val q45_window_vs_correlate = Q(
    (s, dir) => {
      val w = Window.partitionBy(col("l_orderkey"))
      T(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), T.dec2(col("l_extendedprice")).as("p"))
        .withColumn("order_total", sum(col("p")).over(w))
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("p").cast(DoubleType) / col("order_total").cast(DoubleType)).as("share"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
        CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) /
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) OVER (PARTITION BY l_orderkey) AS DOUBLE) AS share
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber"""))

  val all: Map[String, Q] = Map(
    "q40_in_subquery" -> q40_in_subquery,
    "q41_not_exists_anti" -> q41_not_exists_anti,
    "q42_scalar_subquery" -> q42_scalar_subquery,
    "q43_correlated_subquery" -> q43_correlated_subquery,
    "q44_correlated_exists" -> q44_correlated_exists,
    "q45_window_vs_correlate" -> q45_window_vs_correlate)
}
