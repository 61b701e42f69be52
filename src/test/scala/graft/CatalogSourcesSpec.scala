package graft

import graft.catalog.{Model, ModelLoader, TableDef, ViewDef}
import org.apache.spark.sql.functions._

/** Catalog model loading + source/sink format roundtrips
  * (ref: SURVEY.md §2.2 adapters; file adapter CsvTable.java,
  * JsonTable.java; sinks via DataFrameWriter ≈ ModifiableTable). */
class CatalogSourcesSpec extends SparkSpec {

  private lazy val tmp = java.nio.file.Files.createTempDirectory("graft-io").toString

  test("model loader registers tables and views for spark.sql") {
    val model = Model(
      name = "tpch-slice",
      tables = Seq(
        TableDef("m_nation", "parquet", s"$sfDir/nation.parquet"),
        TableDef("m_region", "parquet", s"$sfDir/region.parquet")),
      views = Seq(ViewDef("m_nations_per_region",
        "SELECT r_name, COUNT(*) AS n FROM m_nation JOIN m_region ON n_regionkey = r_regionkey GROUP BY r_name")))
    val loaded = ModelLoader.load(spark, model)
    assert(loaded.keySet == Set("m_nation", "m_region"))
    val out = spark.sql("SELECT * FROM m_nations_per_region ORDER BY r_name").collect()
    assert(out.map(_.getLong(1)).sum == 25L)
  }

  test("properties model file parses and loads") {
    val p = java.nio.file.Paths.get(tmp, "model.properties")
    java.nio.file.Files.writeString(p, s"""
      |# graft model
      |p_nation = parquet:$sfDir/nation.parquet
      |p_top = view:SELECT n_name FROM p_nation WHERE n_nationkey < 3
      |""".stripMargin)
    ModelLoader.loadFile(spark, p.toString)
    assert(spark.sql("SELECT * FROM p_top").count() == 3)
  }

  test("csv sink + source roundtrip preserves data") {
    val src = T(spark, sfDir, "nation")
    src.write.mode("overwrite").option("header", "true").csv(s"$tmp/nation_csv")
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$tmp/nation_csv")
    assert(back.count() == src.count())
    assert(back.columns.toSet == src.columns.toSet)
    val a = src.orderBy("n_nationkey").collect().map(r => (r.getInt(0), r.getString(1)))
    val b = back.orderBy("n_nationkey").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(a.toSeq == b.toSeq)
  }

  test("json sink + source roundtrip preserves data") {
    val src = T(spark, sfDir, "region")
    src.write.mode("overwrite").json(s"$tmp/region_json")
    val back = spark.read.json(s"$tmp/region_json")
    assert(back.count() == 5)
    assert(back.select("r_name").orderBy("r_name").collect().map(_.getString(0)).toSeq ==
      src.select("r_name").orderBy("r_name").collect().map(_.getString(0)).toSeq)
  }

  test("partitioned parquet sink prunes partitions on read") {
    T(spark, sfDir, "orders")
      .withColumn("y", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("y").parquet(s"$tmp/orders_part")
    val pruned = spark.read.parquet(s"$tmp/orders_part").filter(col("y") === 1996)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() ==
      T(spark, sfDir, "orders").filter(year(col("o_orderdate")) === 1996).count())
    assert(plan.contains("PartitionFilters") || !plan.contains("y#"),
      "partition filter should prune at scan")
  }
}
