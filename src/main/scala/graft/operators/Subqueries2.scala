package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.functions._

/** Correlated-subquery long tail (SURVEY §7.3 item 2 — the shapes
  * Calcite's 4,209-LoC RelDecorrelator exists for). All four run
  * through spark.sql so Catalyst's decorrelation
  * (RewritePredicateSubquery / DecorrelateInnerQuery) does the rewrite;
  * the oracle runs the identical SQL, so the decorrelated plan must be
  * value-identical to direct evaluation.
  */
object Subqueries2 {

  private def sql(q: String): Q =
    Q((s, dir) => {
      T.tableNames.foreach(t => T(s, dir, t).createOrReplaceTempView(t))
      s.sql(q)
    }, Some(q))

  /** The COUNT bug (ref: RelDecorrelator.java decorrelateRel(Aggregate)
    * — a naive rewrite of a correlated COUNT loses empty groups; the
    * decorrelator must left-join and coalesce the count to 0 so
    * zero-order customers survive the `= 0` predicate). */
  val q115_count_bug = sql("""
      SELECT o_orderkey, o_orderstatus FROM orders
      WHERE (SELECT COUNT(*) FROM lineitem
             WHERE l_orderkey = o_orderkey AND l_quantity > 10) = 0
      ORDER BY o_orderkey""")

  /** Null-aware NOT IN (ref: SubQueryRemoveRule.java NOT IN → anti-join
    * with null-aware semantics): the probe key is NULLed for custkey 13
    * (nullif), so that row compares UNKNOWN against the set and is
    * filtered — a plain anti join would keep it. Spark plans this as
    * NullAwareAntiJoin. */
  val q116_not_in_null = sql("""
      SELECT c_custkey FROM customer
      WHERE nullif(c_custkey, 13) NOT IN
            (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
      ORDER BY c_custkey""")

  /** EXISTS under a disjunction — cannot lower to a plain semi join
    * (the OR keeps non-matching rows); Catalyst rewrites through an
    * existence join (ExistenceJoin), the same device as the reference's
    * LEFT MARK join (JoinRelType.java:97). */
  val q117_exists_or = sql("""
      SELECT s_suppkey, s_name FROM supplier
      WHERE s_acctbal > 9900.0
         OR EXISTS (SELECT 1 FROM lineitem
                    WHERE l_suppkey = s_suppkey AND l_quantity >= 50)
      ORDER BY s_suppkey""")

  /** Correlated scalar aggregate compared against another correlated
    * scalar aggregate — two independent decorrelations joined back on
    * the same outer row (RelDecorrelator's value-generator pattern). */
  val q118_double_correlate = sql("""
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE (SELECT COUNT(*) FROM lineitem WHERE l_orderkey = o_orderkey) >
            (SELECT COALESCE(SUM(l_linenumber), 0) FROM lineitem
             WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        AND o_orderkey <= 3000
      ORDER BY o_orderkey""")

  val all: Map[String, Q] = Map(
    "q115_count_bug" -> q115_count_bug,
    "q116_not_in_null" -> q116_not_in_null,
    "q117_exists_or" -> q117_exists_or,
    "q118_double_correlate" -> q118_double_correlate)
}
