package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SQL/JSON surface (ref: SqlStdOperatorTable.java:1653-1698 JSON_*,
  * runtime/JsonFunctions.java) — lax-mode path access via Spark's
  * get_json_object (JSONPath `$.a.b[i]`), schema-projected from_json,
  * construction via to_json. */
object Json {

  /** JSON_VALUE with a JSONPath, typed extraction
    * (ref: SqlStdOperatorTable.java:1655 JSON_VALUE). */
  val q56_json_path = Q(
    (s, dir) => {
      T(s, dir, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"),
          get_json_object(col("props"), "$.missing").as("missing"))
        .orderBy("event_id")
    },
    Some("""
      SELECT event_id,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        json_extract_string(props, '$.missing') AS missing
      FROM events ORDER BY event_id"""))

  /** JSON construction + nested path read-back — the JSON_OBJECT /
    * JSON_QUERY pair (ref: SqlStdOperatorTable.java:1658-1660). Values
    * are extracted back out so engine-specific whitespace in the JSON
    * text never reaches the compare. */
  val q57_json_roundtrip = Q(
    (s, dir) => {
      T(s, dir, "orders").filter(col("o_orderkey") <= 500)
        .select(col("o_orderkey"),
          to_json(struct(
            col("o_orderstatus").as("status"),
            struct(col("o_totalprice").as("price")).as("detail"))).as("j"))
        .select(
          col("o_orderkey"),
          get_json_object(col("j"), "$.status").as("status"),
          get_json_object(col("j"), "$.detail.price").cast(DoubleType).as("price"))
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
        json_extract_string(j, '$.status') AS status,
        CAST(json_extract_string(j, '$.detail.price') AS DOUBLE) AS price
      FROM (SELECT o_orderkey,
              to_json(struct_pack(status := o_orderstatus,
                                  detail := struct_pack(price := o_totalprice))) AS j
            FROM orders WHERE o_orderkey <= 500) t
      ORDER BY o_orderkey"""))

  /** Mergeable distinct-count sketches — the profiler's HLL surface
    * (ref: profile/ProfilerImpl.java:577-659 uses the DataSketches HLL;
    * Spark's hll_sketch_agg is the same family). Per-month sketches are
    * UNIONED into a yearly estimate — the mergeability is the point:
    * partial sketches combine without re-scanning, exactly how a
    * 1000-executor profile pass aggregates. The raw estimate is
    * engine-specific (DuckDB's approx sketch family differs), so the
    * hashed surface restates it against an exact in-query twin: the
    * output carries the exact yearly COUNT(DISTINCT) plus a boolean
    * pinning the sketch estimate within the lgK=12 error envelope
    * (≈1.63% standard error; 5% is >3σ) — the oracle asserts TRUE. The
    * estimate VALUE itself stays spec-gated (JsonHllSpec). */
  val q66_hll_sketch_union = Q(
    (s, dir) => {
      val sk = T(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
        .groupBy(col("y"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_custs"),
          count(lit(1)).as("n_months"))
      val exact = T(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("y"))
        .agg(countDistinct(col("o_custkey")).as("exact_custs"))
      sk.join(exact, "y")
        .select(col("y"), col("n_months"), col("exact_custs"),
          (abs(col("approx_custs") - col("exact_custs")) <=
            col("exact_custs") * lit(0.05)).as("sketch_within_5pct"))
        .orderBy("y")
    },
    Some("""
      SELECT year(o_orderdate) AS y,
             COUNT(DISTINCT month(o_orderdate)) AS n_months,
             COUNT(DISTINCT o_custkey) AS exact_custs,
             TRUE AS sketch_within_5pct
      FROM orders GROUP BY 1 ORDER BY y"""))

  val all: Map[String, Q] = Map(
    "q56_json_path" -> q56_json_path,
    "q57_json_roundtrip" -> q57_json_roundtrip,
    "q66_hll_sketch_union" -> q66_hll_sketch_union)
}
