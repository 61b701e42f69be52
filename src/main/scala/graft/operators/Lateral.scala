package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LATERAL / Correlate, table-function scans, and temporal snapshot
  * (ref: rel/core/Correlate.java:1, rel/core/TableFunctionScan.java:1,
  * rel/core/Snapshot.java:51-80). */
object Lateral {

  /** LATERAL VIEW / CROSS APPLY of a table function over each row —
    * Correlate with a generator inner (ref: rel/core/Correlate.java:1;
    * EnumerableCorrelate.java:1). Catalyst plans this as Generate, no
    * nested-loop — linear at any scale. */
  val q46_lateral_explode = Q(
    (s, dir) => {
      T.registerViews(s, dir)
      s.sql("""
        SELECT doc_id, w.word, LENGTH(w.word) AS wlen
        FROM documents
        LATERAL VIEW explode(split(text, ' ')) w AS word
        WHERE doc_id < 20 AND w.word <> ''
        ORDER BY doc_id, word, wlen""")
    },
    Some("""
      SELECT doc_id, word, CAST(LENGTH(word) AS INT) AS wlen
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) t
      WHERE doc_id < 20 AND word <> ''
      ORDER BY doc_id, word, wlen"""))

  /** Table-function scan: range() TVF joined to a table
    * (ref: rel/core/TableFunctionScan.java:1; COLLECTION_TABLE
    * SqlStdOperatorTable.java:1621). Buckets each order total against a
    * generated tier table. */
  val q47_tvf_range = Q(
    (s, dir) => {
      val tiers = s.range(1, 6).select(col("id").as("tier"),
        (col("id") * 50000).cast(DoubleType).as("lo"))
      T(s, dir, "orders")
        .join(broadcast(tiers), col("o_totalprice") >= col("lo"))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n"))
        .orderBy("tier")
    },
    Some("""
      SELECT tier, COUNT(*) AS n
      FROM orders
      JOIN (SELECT range AS tier, CAST(range * 50000 AS DOUBLE) AS lo FROM range(1, 6)) t
        ON o_totalprice >= lo
      GROUP BY tier ORDER BY tier"""))

  /** Temporal snapshot — FOR SYSTEM_TIME AS OF over a sys_start/sys_end
    * validity convention (ref: rel/core/Snapshot.java:51-80,
    * schema/TemporalTable.java). Orders are given a 90-day validity
    * window from their order date; the snapshot keeps rows valid at t. */
  val q48_snapshot = Q(
    (s, dir) => {
      val asOf = lit("1997-06-15")
      T(s, dir, "orders")
        .withColumn("sys_start", to_date(col("o_orderdate")))
        .withColumn("sys_end", date_add(to_date(col("o_orderdate")), 90))
        .filter(col("sys_start") <= asOf && asOf < col("sys_end"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), T.dsum(col("o_totalprice")).as("total"))
        .orderBy("o_orderstatus")
    },
    Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM (SELECT *, CAST(o_orderdate AS DATE) AS sys_start,
              CAST(o_orderdate AS DATE) + 90 AS sys_end
            FROM orders) t
      WHERE sys_start <= DATE '1997-06-15' AND DATE '1997-06-15' < sys_end
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Correlated LATERAL subquery with aggregation — each nation's top
    * spender (ref: rel/core/Correlate.java LEFT; Catalyst decorrelates
    * the lateral aggregate into a join). */
  val q49_lateral_subquery = Q(
    (s, dir) => {
      T.registerViews(s, dir)
      s.sql("""
        SELECT n_name, t.top_bal
        FROM nation,
        LATERAL (SELECT MAX(c_acctbal) AS top_bal FROM customer WHERE c_nationkey = n_nationkey) t
        ORDER BY n_name""")
    },
    Some("""
      SELECT n_name, t.top_bal
      FROM nation,
      LATERAL (SELECT MAX(c_acctbal) AS top_bal FROM customer WHERE c_nationkey = n_nationkey) t
      ORDER BY n_name"""))

  val all: Map[String, Q] = Map(
    "q46_lateral_explode" -> q46_lateral_explode,
    "q47_tvf_range" -> q47_tvf_range,
    "q48_snapshot" -> q48_snapshot,
    "q49_lateral_subquery" -> q49_lateral_subquery)
}
