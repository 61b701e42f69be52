package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Quantified comparisons, the UNIQUE predicate, and the SQL/JSON
  * aggregate constructors (ref: SqlStdOperatorTable.java:490-526
  * SOME_/ALL_ comparisons with the SubQueryRemoveRule rewrite, :989
  * UNIQUE, :1662 JSON_OBJECTAGG, :1701 JSON_ARRAYAGG; corpus some.iq).
  *
  * Spark has none of these natively; each lowers to the same plan the
  * reference's rewrite rules produce — a 1-row extreme aggregate
  * broadcast back (ALL/SOME), a duplicate-detecting anti join (UNIQUE),
  * and deterministic collect_list-based JSON construction (the agg
  * input is sorted so the output text is shuffle-order-independent).
  */
object Quantified {

  /** `x > ALL (subquery)` → compare against the subquery max, with the
    * empty-subquery-is-true guard (SubQueryRemoveRule's rewrite). */
  val q75_quantified_all = Q(
    (s, dir) => {
      val part = T(s, dir, "part")
      val sub = part.filter(col("p_brand") === "Brand#3")
        .agg(max(col("p_retailprice")).as("mx"), count(lit(1)).as("n"))
      part.crossJoin(broadcast(sub)) // 1 row by construction: global agg
        .filter(col("n") === 0 || col("p_retailprice") > col("mx"))
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
        .orderBy("p_partkey")
    },
    Some("""
      SELECT p_partkey, p_name, p_retailprice FROM part
      WHERE p_retailprice > ALL (
        SELECT p2.p_retailprice FROM part p2 WHERE p2.p_brand = 'Brand#3')
      ORDER BY p_partkey"""))

  /** `x < SOME (subquery)` → compare against the subquery max (true iff
    * less than at least one element; false over an empty subquery). */
  val q76_quantified_some = Q(
    (s, dir) => {
      val part = T(s, dir, "part")
      val sub = part.filter(col("p_brand") === "Brand#3")
        .agg(max(col("p_retailprice")).as("mx"))
      part.crossJoin(broadcast(sub)) // 1 row by construction: global agg
        .filter(col("p_retailprice") < col("mx"))
        .select(col("p_partkey"))
        .orderBy("p_partkey")
    },
    Some("""
      SELECT p_partkey FROM part
      WHERE p_retailprice < SOME (
        SELECT p2.p_retailprice FROM part p2 WHERE p2.p_brand = 'Brand#3')
      ORDER BY p_partkey"""))

  /** UNIQUE predicate: customers whose urgent orders all fall on
    * distinct dates. UNIQUE(subquery) rewrites (as in the reference's
    * SubQueryRemoveRule) to "no group of the subquery has count > 1" —
    * a grouped duplicate detector anti-joined back. */
  val q77_unique_pred = Q(
    (s, dir) => {
      val urgent = T(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      val dup = urgent.groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .select(col("o_custkey").as("dup_custkey")).distinct()
      T(s, dir, "customer")
        .join(urgent.select(col("o_custkey")).distinct(),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .join(dup, col("c_custkey") === col("dup_custkey"), "left_anti")
        .select(col("c_custkey"))
        .orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c_custkey AND o.o_orderpriority = '1-URGENT'
          GROUP BY o.o_orderdate HAVING COUNT(*) > 1)
      ORDER BY c_custkey"""))

  /** JSON_ARRAYAGG: per-group JSON array of order keys. The collected
    * array is sorted before serialization, so the JSON text is
    * independent of shuffle order. */
  val q78_json_arrayagg = Q(
    (s, dir) => {
      T(s, dir, "orders").filter(col("o_orderkey") <= 100)
        .groupBy(col("o_orderstatus"))
        .agg(to_json(sort_array(collect_list(col("o_orderkey")))).as("arr"))
        .orderBy("o_orderstatus")
    },
    Some("""
      SELECT o_orderstatus,
        CAST(to_json(list(o_orderkey ORDER BY o_orderkey)) AS VARCHAR) AS arr
      FROM orders WHERE o_orderkey <= 100
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** JSON_OBJECTAGG: per-status JSON object of priority → order count
    * (keys unique within the group; entries sorted by key). */
  val q79_json_objectagg = Q(
    (s, dir) => {
      T(s, dir, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("o_orderstatus"))
        .agg(to_json(map_from_entries(sort_array(collect_list(
          struct(col("o_orderpriority"), col("n")))))).as("obj"))
        .orderBy("o_orderstatus")
    },
    Some("""
      SELECT o_orderstatus,
        CAST(to_json(map_from_entries(list(
          struct_pack(key := o_orderpriority, value := n) ORDER BY o_orderpriority))) AS VARCHAR) AS obj
      FROM (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
            FROM orders GROUP BY 1, 2) t
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Measure columns (ref: MeasureRules.java, measure.iq): `revenue AS
    * MEASURE SUM(...)` declared once on the detail, then evaluated in
    * two contexts in one query — the brand group and AT (ALL) — to
    * produce a share-of-total without hand-writing the subquery. */
  val q87_measure_share = Q(
    (s, dir) => {
      import graft.plans.Measures
      import graft.plans.Measures.{AtAll, Grouped}
      val detail = T(s, dir, "lineitem")
        .join(T(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
      val m = Measures.MeasuredTable(detail,
        Map("revenue" -> T.dsum(col("l_extendedprice"))))
      m.query(
        Seq("p_brand" -> col("p_brand")),
        Seq(Grouped("revenue", "rev"), AtAll("revenue", "rev_all")))
        .select(col("p_brand"), col("rev"),
          (lit(100.0) * (col("rev") / col("rev_all"))).as("share"))
        .orderBy("p_brand")
    },
    Some("""
      SELECT p_brand,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS rev,
        100.0 * (CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) /
          (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
           FROM lineitem JOIN part ON l_partkey = p_partkey)) AS share
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand"""))

  /** VARIANT type (ref: runtime/variant/VariantValue.java:1, corpus
    * variant.iq; §2.6 TYPEOF/VARIANTNULL): Spark 4's native VariantType
    * — parse once, typed path extraction, SQL-NULL for missing paths.
    * The binary variant beats per-access JSON string parsing at scale:
    * one decode per row, then O(1) typed field reads. */
  val q88_variant = Q(
    (s, dir) => {
      T(s, dir, "events")
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(
          col("event_id"),
          expr("variant_get(v, '$.k', 'long')").as("k"),
          expr("variant_get(v, '$.missing', 'string') IS NULL").as("missing_is_null"))
        .orderBy("event_id")
    },
    Some("""
      SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        json_extract(props, '$.missing') IS NULL AS missing_is_null
      FROM events ORDER BY event_id"""))

  /** FORMAT_DATE / FORMAT_TIMESTAMP (ref: SqlLibraryOperators
    * .java:2100/:2110, cast-with-format.iq `CAST(.. FORMAT ..)`):
    * pattern-based datetime rendering via date_format. */
  val q89_format_datetime = Q(
    (s, dir) => {
      T(s, dir, "orders").filter(col("o_orderkey") <= 1000)
        .select(
          col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy/MM/dd").as("fd"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("fts"),
          date_format(col("o_orderdate"), "D").cast(IntegerType).as("doy"))
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
        strftime(o_orderdate, '%Y/%m/%d') AS fd,
        strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS fts,
        CAST(EXTRACT(DOY FROM o_orderdate) AS INT) AS doy
      FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey"""))

  val all: Map[String, Q] = Map(
    "q87_measure_share" -> q87_measure_share,
    "q88_variant" -> q88_variant,
    "q89_format_datetime" -> q89_format_datetime,
    "q75_quantified_all" -> q75_quantified_all,
    "q76_quantified_some" -> q76_quantified_some,
    "q77_unique_pred" -> q77_unique_pred,
    "q78_json_arrayagg" -> q78_json_arrayagg,
    "q79_json_objectagg" -> q79_json_objectagg)
}
