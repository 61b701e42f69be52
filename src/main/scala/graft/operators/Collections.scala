package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Collection operators — UNNEST/explode, COLLECT/array_agg, JSON access
  * (ref: rel/core/{Uncollect,Collect}.java, runtime/JsonFunctions.java;
  * unnest.iq). Explode runs inside WholeStageCodegen's Generate; the
  * word-count shuffle is on the exploded key, the classic scale shape.
  */
object Collections {

  /** UNNEST: explode split words → top-50 word count
    * (ref: rel/core/Uncollect.java:1; unnest.iq). */
  val q50_unnest_wordcount = Q(
    (s, dir) => {
      T(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(50)
    },
    Some("""
      SELECT word, COUNT(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      WHERE word <> ''
      GROUP BY word ORDER BY n DESC, word LIMIT 50"""))

  /** COLLECT → sorted array + slice (ref: rel/core/Collect.java:1,
    * SqlLibraryOperators.java:821 ARRAY_AGG, :1697 ARRAY_SLICE). The
    * array is joined to a string for the output so the driver's
    * row-hash compare (which cannot sort array cells) can check it —
    * the collect/sort/slice pipeline itself is unchanged. */
  val q51_collect_array = Q(
    (s, dir) => {
      T(s, dir, "nation")
        .join(T(s, dir, "customer"), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          slice(sort_array(collect_list(col("c_name"))), 1, 5).as("fn"),
          count(lit(1)).as("n"))
        .select(col("n_name"), array_join(col("fn"), ",").as("first_names"), col("n"))
        .orderBy("n_name")
    },
    Some("""
      SELECT n_name,
        array_to_string(list_slice(list(c_name ORDER BY c_name), 1, 5), ',') AS first_names,
        COUNT(*) AS n
      FROM nation JOIN customer ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name"""))

  /** Array functions over a built array: distinct/sort/contains/size
    * (ref: SqlLibraryOperators.java:1551-1758 array fn family). */
  val q52_array_functions = Q(
    (s, dir) => {
      T(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sort_array(collect_set(col("o_orderpriority"))).as("prios"))
        .select(
          col("o_custkey"),
          array_join(col("prios"), ",").as("prios_csv"),
          size(col("prios")).as("n_prios"),
          array_contains(col("prios"), "1-URGENT").cast(BooleanType).as("has_urgent"))
        .orderBy("o_custkey")
    },
    Some("""
      SELECT o_custkey, array_to_string(prios, ',') AS prios_csv,
        CAST(len(prios) AS INT) AS n_prios,
        list_contains(prios, '1-URGENT') AS has_urgent
      FROM (SELECT o_custkey, list_sort(list(DISTINCT o_orderpriority)) AS prios
            FROM orders GROUP BY o_custkey) t
      ORDER BY o_custkey"""))

  /** ROW constructor, row equality, DOT field access (ref:
    * SqlStdOperatorTable.java:1530 ROW, :384 DOT; corpus struct.iq +
    * row-equality.iq). Row comparison is a single struct equality in
    * both engines (null-safe per field). */
  val q53_row_struct = Q(
    (s, dir) => {
      T(s, dir, "lineitem")
        .filter(struct(col("l_returnflag"), col("l_linestatus")) ===
          struct(lit("R"), lit("F")))
        .select(col("l_orderkey"), col("l_linenumber"),
          struct(col("l_quantity").as("qty"), col("l_extendedprice").as("price")).as("rowv"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("rowv.qty").as("qty"), col("rowv.price").as("price"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity AS qty, l_extendedprice AS price
      FROM lineitem
      WHERE (l_returnflag, l_linestatus) = ('R', 'F')
      ORDER BY l_orderkey, l_linenumber"""))

  /** JSON field extraction + aggregation (ref: runtime/JsonFunctions.java,
    * SqlStdOperatorTable.java:1655 JSON_VALUE). Extraction via regexp so
    * the oracle needs no DuckDB JSON extension. */
  val q54_json_extract = Q(
    (s, dir) => {
      T(s, dir, "events")
        .select(col("event_type"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast(LongType).as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type,
        CAST(SUM(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        COUNT(*) AS n
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Higher-order lambda functions on arrays: transform/filter/aggregate
    * (ref: rex/RexLambda.java:1; lambda.iq). */
  val q55_higher_order = Q(
    (s, dir) => {
      T(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .select(
          col("doc_id"),
          expr("size(filter(words, w -> length(w) > 5))").cast(LongType).as("n_long"),
          expr("aggregate(transform(words, w -> length(w)), 0L, (a, x) -> a + x)").as("total_chars"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
        CAST(len(list_filter(string_split(text, ' '), w -> length(w) > 5)) AS BIGINT) AS n_long,
        CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS BIGINT) AS total_chars
      FROM documents ORDER BY doc_id"""))

  val all: Map[String, Q] = Map(
    "q50_unnest_wordcount" -> q50_unnest_wordcount,
    "q51_collect_array" -> q51_collect_array,
    "q52_array_functions" -> q52_array_functions,
    "q53_row_struct" -> q53_row_struct,
    "q54_json_extract" -> q54_json_extract,
    "q55_higher_order" -> q55_higher_order)
}
