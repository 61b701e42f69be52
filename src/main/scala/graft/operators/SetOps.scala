package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.functions._

/** Set operators — UNION/INTERSECT/EXCEPT with ALL and DISTINCT variants
  * (ref: rel/core/{Union,Intersect,Minus,SetOp}.java; Calcite rewrites
  * INTERSECT→semi-join and MINUS→anti-join in
  * rel/rules/{IntersectToSemiJoinRule,MinusToAntiJoinRule}.java — Spark's
  * ReplaceIntersectWithSemiJoin / ReplaceExceptWithAntiJoin do the same,
  * so these stay single-shuffle joins at scale).
  */
object SetOps {

  /** N-ary UNION ALL + reaggregation (ref: rel/core/Union.java:1). */
  val q30_union_all = Q(
    (s, dir) => {
      val c = T(s, dir, "customer").select(col("c_nationkey").as("nationkey"), lit("cust").as("kind"))
      val p = T(s, dir, "supplier").select(col("s_nationkey").as("nationkey"), lit("supp").as("kind"))
      c.union(p)
        .groupBy(col("nationkey"), col("kind"))
        .agg(count(lit(1)).as("n"))
        .orderBy("nationkey", "kind")
    },
    Some("""
      SELECT nationkey, kind, COUNT(*) AS n FROM (
        SELECT c_nationkey AS nationkey, 'cust' AS kind FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey, 'supp' AS kind FROM supplier) t
      GROUP BY nationkey, kind ORDER BY nationkey, kind"""))

  /** UNION DISTINCT (ref: rel/core/Union.java all=false). */
  val q31_union_distinct = Q(
    (s, dir) => {
      val c = T(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val p = T(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.union(p).distinct().orderBy("nationkey")
    },
    Some("""
      SELECT c_nationkey AS nationkey FROM customer
      UNION
      SELECT s_nationkey AS nationkey FROM supplier
      ORDER BY nationkey"""))

  /** INTERSECT (distinct) (ref: rel/core/Intersect.java:1). */
  val q32_intersect = Q(
    (s, dir) => {
      val a = T(s, dir, "orders").filter(year(col("o_orderdate")) === 1996)
        .select(col("o_custkey").as("k"))
      val b = T(s, dir, "orders").filter(year(col("o_orderdate")) === 1997)
        .select(col("o_custkey").as("k"))
      a.intersect(b).orderBy("k")
    },
    Some("""
      SELECT o_custkey AS k FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
      INTERSECT
      SELECT o_custkey AS k FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
      ORDER BY k"""))

  /** EXCEPT (distinct): 1996 buyers who lapsed in 1997
    * (ref: rel/core/Minus.java:1). */
  val q33_except = Q(
    (s, dir) => {
      val a = T(s, dir, "orders").filter(year(col("o_orderdate")) === 1996)
        .select(col("o_custkey").as("k"))
      val b = T(s, dir, "orders").filter(year(col("o_orderdate")) === 1997)
        .select(col("o_custkey").as("k"))
      a.except(b).orderBy("k")
    },
    Some("""
      SELECT o_custkey AS k FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
      EXCEPT
      SELECT o_custkey AS k FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
      ORDER BY k"""))

  /** INTERSECT ALL — bag semantics preserving multiplicity
    * (ref: rel/core/Intersect.java all=true; EnumerableIntersect.java:1). */
  val q34_intersect_all = Q(
    (s, dir) => {
      val a = T(s, dir, "orders").filter(year(col("o_orderdate")) === 1996)
        .select(col("o_custkey").as("k"))
      val b = T(s, dir, "orders").filter(year(col("o_orderdate")) === 1997)
        .select(col("o_custkey").as("k"))
      a.intersectAll(b).groupBy(col("k")).agg(count(lit(1)).as("mult")).orderBy("k")
    },
    Some("""
      SELECT k, COUNT(*) AS mult FROM (
        SELECT o_custkey AS k FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
        INTERSECT ALL
        SELECT o_custkey AS k FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997) t
      GROUP BY k ORDER BY k"""))

  /** EXCEPT ALL — bag difference (ref: rel/core/Minus.java all=true). */
  val q35_except_all = Q(
    (s, dir) => {
      val a = T(s, dir, "orders").filter(year(col("o_orderdate")) === 1996)
        .select(col("o_custkey").as("k"))
      val b = T(s, dir, "orders").filter(year(col("o_orderdate")) === 1997)
        .select(col("o_custkey").as("k"))
      a.exceptAll(b).groupBy(col("k")).agg(count(lit(1)).as("mult")).orderBy("k")
    },
    Some("""
      SELECT k, COUNT(*) AS mult FROM (
        SELECT o_custkey AS k FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
        EXCEPT ALL
        SELECT o_custkey AS k FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997) t
      GROUP BY k ORDER BY k"""))

  val all: Map[String, Q] = Map(
    "q30_union_all" -> q30_union_all,
    "q31_union_distinct" -> q31_union_distinct,
    "q32_intersect" -> q32_intersect,
    "q33_except" -> q33_except,
    "q34_intersect_all" -> q34_intersect_all,
    "q35_except_all" -> q35_except_all)
}
