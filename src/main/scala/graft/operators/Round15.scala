package graft.operators

import org.apache.spark.sql.functions._

import graft.{Q, T}
import graft.plans.MaterializedViews

/** Round-15 pack: the composite-key constraint stack (ref:
  * rel/RelReferentialConstraint.java:45 — a referential constraint is a
  * `List<IntPair>` of column pairs, so multi-column keys are
  * first-class), outer-join elimination on uniqueness alone (ref:
  * rel/rules/ProjectJoinRemoveRule.java:43,80), right-deep snowflake
  * elimination, and the closed profile → constraint loop — each
  * end-to-end under the driver's DuckDB oracle.
  */
object Round15 {

  /** A composite-keyed dimension derived from lineitem — one row per
    * DISTINCT (l_orderkey, l_linenumber) — unique by construction (the
    * synthetic lineitem repeats line numbers, so a plain projection
    * would not be a key) — written once per sf dir to a stable
    * temp location (the _SUCCESS marker gates re-writes so the leaf
    * fingerprint, and with it any registered tile, stays stable across
    * calls in one process). The derivation IS the referential
    * integrity: every fact (l_orderkey, l_linenumber) appears exactly
    * once, which the composite verification can prove and the oracle
    * can reproduce as a subquery. */
  private def compositeDim(s: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_q166_dim_v2_${Integer.toHexString(dir.hashCode)}").getAbsolutePath
    if (!new java.io.File(tmp, "_SUCCESS").exists())
      T(s, dir, "lineitem")
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(min("l_linestatus").as("d_status"))
        .select(col("l_orderkey").as("d_orderkey"),
          col("l_linenumber").as("d_linenumber"), col("d_status"))
        .write.mode("overwrite").parquet(tmp)
    tmp
  }

  /** Composite-key FK star tile (ref: RelReferentialConstraint.java:45
    * List<IntPair> column pairs, consumed by the materialized-view
    * join compensation): the tile pre-aggregates
    * lineitem ⋈ dim ON (l_orderkey, l_linenumber) = (d_orderkey,
    * d_linenumber); the declared TWO-column FK proves that join adds
    * exactly one dim row per fact row, so the fact-only rollup below is
    * answered from the tile — both equi pairs consumed by ONE
    * constraint edge (two single-column FKs would refuse: their two
    * unique matches need not be the same row; MvConstraintSpec pins the
    * negative). At 100 TB this is the multi-tenant schema case —
    * dims keyed (tenant_id, key) — getting the same ONE-wide-star-tile
    * amortization single-column stars already had. */
  val q166_fk_composite_tile = Q(
    (s, dir) => {
      val tmp = compositeDim(s, dir)
      val li = T(s, dir, "lineitem")
        .withColumn("l_extendedprice", T.dec2(col("l_extendedprice")))
      val star = li.join(s.read.parquet(tmp),
        col("l_orderkey") === col("d_orderkey") &&
          col("l_linenumber") === col("d_linenumber"))
      MaterializedViews.registerOnce(s, "q166_mv", star,
        keys = Seq("l_returnflag", "d_status"), sums = Seq("l_extendedprice"))
      graft.catalog.Constraints.declareForeignKey(s,
        s"$dir/lineitem.parquet", Seq("l_orderkey", "l_linenumber"),
        tmp, Seq("d_orderkey", "d_linenumber"))
      T(s, dir, "lineitem")
        .withColumn("l_extendedprice", T.dec2(col("l_extendedprice")))
        .groupBy("l_returnflag")
        .agg(sum("l_extendedprice").cast("double").as("rev"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS rev,
             COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Composite-key join elimination: the query joins the composite-keyed
    * dim out of habit and reads only fact columns — the declared
    * two-column FK proves each fact row matched exactly one dim row, so
    * the optimizer deletes the join and the dim scan outright; the
    * conjunction of BOTH equi pairs is covered by the ONE composite
    * edge (plan-gated in MvConstraintSpec, with the
    * two-single-column-FKs and partial-pair negatives). The oracle runs
    * the join as written, deriving the dim as the same subquery. */
  val q167_fk_composite_elim = Q(
    (s, dir) => {
      val tmp = compositeDim(s, dir)
      graft.catalog.Constraints.declareForeignKey(s,
        s"$dir/lineitem.parquet", Seq("l_orderkey", "l_linenumber"),
        tmp, Seq("d_orderkey", "d_linenumber"))
      T(s, dir, "lineitem")
        .withColumn("l_extendedprice", T.dec2(col("l_extendedprice")))
        .join(s.read.parquet(tmp),
          col("l_orderkey") === col("d_orderkey") &&
            col("l_linenumber") === col("d_linenumber"))
        .groupBy("l_linestatus")
        .agg(sum("l_extendedprice").cast("double").as("rev"),
          count(lit(1)).as("n"))
        .orderBy("l_linestatus")
    },
    Some("""
      SELECT l_linestatus,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS rev,
             COUNT(*) AS n
      FROM lineitem l JOIN (
        SELECT l_orderkey AS d_orderkey, l_linenumber AS d_linenumber,
               MIN(l_linestatus) AS d_status FROM lineitem GROUP BY 1, 2) d
        ON l.l_orderkey = d.d_orderkey AND l.l_linenumber = d.d_linenumber
      GROUP BY l_linestatus ORDER BY l_linestatus"""))

  /** LEFT-join elimination on uniqueness alone (ref:
    * rel/rules/ProjectJoinRemoveRule.java:43,80 — an outer join whose
    * dropped side joins on a unique key and contributes no columns is
    * removable with NO integrity conditions: ≤1 match per preserved
    * row, unmatched rows retained). The shape BI tools actually
    * generate — LEFT JOIN every dim, read two fact columns — loses the
    * join and the customer scan on a declared unique key; no FK
    * containment or non-nullness needed (o_custkey may even dangle).
    * The oracle runs the LEFT JOIN as written. */
  val q168_left_join_elim = Q(
    (s, dir) => {
      graft.catalog.Constraints.declareUniqueKey(s,
        s"$dir/customer.parquet", Seq("c_custkey"))
      T(s, dir, "orders")
        .withColumn("o_totalprice", T.dec2(col("o_totalprice")))
        .join(T(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"), "left")
        .groupBy("o_orderpriority")
        .agg(sum("o_totalprice").cast("double").as("rev"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev,
             COUNT(*) AS n
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Right-deep snowflake elimination: `orders ⋈ (customer ⋈ nation)`
    * with both FK edges declared is provably lossless as a WHOLE —
    * the dropped subtree is a tree of constraint edges directed away
    * from the fact (o_custkey → c_custkey, then c_nationkey →
    * n_nationkey), so both dim scans and both joins vanish in one
    * step; a left-deep spelling of the same query eliminates
    * leaf-by-leaf to the identical plan (plan-gated in
    * MvConstraintSpec, with a missing-inner-FK negative). The oracle
    * runs the full snowflake join. */
  val q169_snowflake_elim = Q(
    (s, dir) => {
      graft.catalog.Constraints.declareForeignKey(s,
        s"$dir/orders.parquet", "o_custkey",
        s"$dir/customer.parquet", "c_custkey")
      graft.catalog.Constraints.declareForeignKey(s,
        s"$dir/customer.parquet", "c_nationkey",
        s"$dir/nation.parquet", "n_nationkey")
      val dims = T(s, dir, "customer")
        .join(T(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      T(s, dir, "orders")
        .withColumn("o_totalprice", T.dec2(col("o_totalprice")))
        .join(dims, col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderstatus")
        .agg(sum("o_totalprice").cast("double").as("rev"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    },
    Some("""
      SELECT o_orderstatus,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev,
             COUNT(*) AS n
      FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** The closed profile → constraint loop (ref: profile/ProfilerImpl.java
    * feeding schema/Statistic.java getKeys/getReferentialConstraints):
    * ONE sketch pass over the dim classifies candidate keys; survivors
    * get the exact three-condition verification and are DECLARED — an
    * undeclared schema gains FK tiles and join elimination from one
    * call (the downstream rewrites are plan-gated in MvConstraintSpec).
    * The oracle recomputes both verdicts exactly: c_custkey is a key
    * and a valid FK target; c_nationkey repeats ~60× and is rejected
    * by the sketch before any exact work. */
  val q170_profile_declare = Q(
    (s, dir) => {
      graft.catalog.Lattice.profileAndDeclare(s,
        s"$dir/orders.parquet", s"$dir/customer.parquet",
        Seq(("o_custkey", "c_custkey"), ("o_custkey", "c_nationkey")))
        .orderBy("dim_key")
    },
    Some("""
      WITH c AS (SELECT COUNT(*) AS n, COUNT(DISTINCT c_custkey) AS ck,
                        COUNT(DISTINCT c_nationkey) AS cn FROM customer),
      chk AS (SELECT
        (SELECT COUNT(*) FROM (SELECT c_custkey FROM customer
           GROUP BY 1 HAVING COUNT(*) > 1)) = 0 AS uniq_ck,
        (SELECT COUNT(*) FROM (SELECT c_nationkey FROM customer
           GROUP BY 1 HAVING COUNT(*) > 1)) = 0 AS uniq_cn,
        (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) = 0 AS nn,
        (SELECT COUNT(*) FROM orders o LEFT JOIN customer c2
           ON o.o_custkey = c2.c_custkey
           WHERE c2.c_custkey IS NULL) = 0 AS cont_ck,
        (SELECT COUNT(*) FROM orders o LEFT JOIN customer c2
           ON o.o_custkey = c2.c_nationkey
           WHERE c2.c_nationkey IS NULL) = 0 AS cont_cn)
      SELECT fact_col, dim_key, sketch_unique, declared FROM (
        SELECT 'o_custkey' AS fact_col, 'c_custkey' AS dim_key,
               1.1*ck >= n AS sketch_unique,
               (1.1*ck >= n) AND uniq_ck AND nn AND cont_ck AS declared
        FROM c, chk
        UNION ALL
        SELECT 'o_custkey', 'c_nationkey', 1.1*cn >= n,
               (1.1*cn >= n) AND uniq_cn AND nn AND cont_cn
        FROM c, chk)
      ORDER BY dim_key"""))

  /** Aggregate removal over a declared unique key (ref:
    * rel/rules/AggregateRemoveRule.java over schema/Statistic.java
    * getKeys): `SELECT DISTINCT pk, col` groups rows that are already
    * unique, so the Aggregate — and with it a full hash shuffle of the
    * table — collapses to a Project (plan-gated in MvConstraintSpec,
    * with non-key, post-join, renamed-column, and real-aggregate
    * negatives). The oracle runs the DISTINCT as written; identical
    * values prove the removal lossless. At 100 TB the generated-SQL
    * habit of SELECT DISTINCT pk, … costs a scan instead of a
    * repartition of every row. */
  val q171_distinct_elim = Q(
    (s, dir) => {
      graft.catalog.Constraints.declareUniqueKey(s,
        s"$dir/orders.parquet", Seq("o_orderkey"))
      T(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus").distinct()
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT DISTINCT o_orderkey, o_orderstatus FROM orders
      ORDER BY o_orderkey"""))

  /** The unique-key discovery loop (ref: profile/ProfilerImpl.java
    * unique-key output feeding schema/Statistic.java getKeys): one
    * sketch pass classifies singles and pairs of orders, survivors get
    * exact verification and are DECLARED — the fuel for outer-join
    * elimination and DISTINCT removal with zero manual declarations
    * (downstream rewrites plan-gated in MvConstraintSpec). The oracle
    * recomputes both verdict columns exactly: o_orderkey and every
    * pair containing it are keys; status/priority and their pair
    * repeat and are rejected by the sketch alone. */
  val q172_profile_declare_keys = Q(
    (s, dir) => {
      graft.catalog.Lattice.profileAndDeclareKeys(s,
        s"$dir/orders.parquet",
        Seq("o_orderkey", "o_orderstatus", "o_orderpriority"))
        .orderBy("columns")
    },
    Some("""
      WITH t AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                        o_orderpriority AS pri FROM orders),
      c AS (SELECT COUNT(*) AS n, COUNT(DISTINCT k) AS ck,
                   COUNT(DISTINCT st) AS cs, COUNT(DISTINCT pri) AS cp,
                   (SELECT COUNT(*) FROM (SELECT DISTINCT k, st FROM t)) AS cks,
                   (SELECT COUNT(*) FROM (SELECT DISTINCT k, pri FROM t)) AS ckp,
                   (SELECT COUNT(*) FROM (SELECT DISTINCT st, pri FROM t)) AS csp
            FROM t)
      SELECT columns, sketch_unique, sketch_unique AND exact_unique AS declared
      FROM (
        SELECT 'o_orderkey' AS columns, 1.1*ck >= n AS sketch_unique,
               ck = n AS exact_unique FROM c
        UNION ALL SELECT 'o_orderstatus', 1.1*cs >= n, cs = n FROM c
        UNION ALL SELECT 'o_orderpriority', 1.1*cp >= n, cp = n FROM c
        UNION ALL SELECT 'o_orderkey,o_orderstatus', 1.1*cks >= n, cks = n FROM c
        UNION ALL SELECT 'o_orderkey,o_orderpriority', 1.1*ckp >= n, ckp = n FROM c
        UNION ALL SELECT 'o_orderstatus,o_orderpriority', 1.1*csp >= n, csp = n FROM c)
      ORDER BY columns"""))

  val all: Map[String, Q] = Map(
    "q172_profile_declare_keys" -> q172_profile_declare_keys,
    "q171_distinct_elim" -> q171_distinct_elim,
    "q166_fk_composite_tile" -> q166_fk_composite_tile,
    "q167_fk_composite_elim" -> q167_fk_composite_elim,
    "q168_left_join_elim" -> q168_left_join_elim,
    "q169_snowflake_elim" -> q169_snowflake_elim,
    "q170_profile_declare" -> q170_profile_declare)
}
