package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.textops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is declared here as a
  * `queries` entry; those expressible in ANSI SQL also carry a DuckDB
  * oracle in `oracleSql` (same column names/aliases on both sides — the
  * driver's compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** All operator groups, merged. Each group lives in graft.operators.*. */
  private lazy val registry: Map[String, Q] =
    Relational.all ++ Windows.all ++ SetOps.all ++ Subqueries.all ++
      Collections.all ++ Scalars.all ++ Advanced.all ++ Custom.all ++
      Stats.all ++ Lateral.all ++ Patterns.all ++ Extras.all ++ Json.all ++
      Temporal.all ++ Tpch.all ++ Tpcds.all ++ Tpcds2.all ++ Tpcds3.all ++
      Tpcds4.all ++ Tpcds5.all ++ Tpcds6.all ++ Tpcds7.all ++ Tpcds8.all ++
      Tpcds9.all ++ Tpcds10.all ++ Tpcds11.all ++ Tpcds12.all ++
      Library2.all ++ Quantified.all ++
      Round4.all ++ Gaps.all ++ Subqueries2.all ++ Tvf.all ++ Funnel.all ++
      Joins2.all ++ Geo.all ++ Dialect2.all ++ Round11.all ++ Round12.all ++
      Round13.all ++ Round14.all ++ Round15.all ++ Round15b.all ++
      Dedup.all ++ TextAnalysis.all ++ Similarity.all ++ Multimodal.all ++
      IvfAnn.all ++ PqAnn.all ++ Bpe.all ++ Pipeline2.all ++ Curation.all ++
      Curation2.all ++ Curation3.all ++ Curation4.all ++ Curation5.all ++
      SemDedup.all ++ Packing.all ++ Retrieval.all ++ Drift.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q05_local_supplier.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, q) => name -> q.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, Q(_, Some(sql))) => name -> sql.trim }
}
