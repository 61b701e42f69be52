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

  test("model-declared tiles and foreign keys feed the planner at load time") {
    // the reference's JSON model declares lattices/materializations that
    // register at connect time (model/JsonLattice.java,
    // JsonMaterialization.java) and tables carry referential constraints
    // (Statistic.getReferentialConstraints) — here the properties model
    // does both: the first rollup after load already rides the tile, and
    // the declared FK lets the orders⋈customer star tile answer an
    // orders-only rollup
    val p = java.nio.file.Paths.get(tmp, "model_lattice.properties")
    java.nio.file.Files.writeString(p, s"""
      |l_orders   = parquet:$sfDir/orders.parquet
      |l_customer = parquet:$sfDir/customer.parquet
      |star_tile  = tile:l_orders|keys=o_orderstatus;o_orderpriority
      |fk1        = fk:l_orders.o_custkey->l_customer.c_custkey
      |""".stripMargin)
    try {
      ModelLoader.loadFile(spark, p.toString)
      assert(graft.plans.MaterializedViews.isRegistered("model:star_tile"))
      val q = spark.table("l_orders").groupBy("o_orderstatus")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      val lp = q.queryExecution.optimizedPlan
      assert(lp.toString.contains("InMemoryRelation"),
        s"model tile must answer the first rollup:\n$lp")
      // the FK declaration is live in the constraint registry
      def qualified(path: String) =
        new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sessionState.newHadoopConf())
          .makeQualified(new org.apache.hadoop.fs.Path(path)).toString
      assert(graft.catalog.Constraints.coversPair(
        ("c_custkey", "o_custkey"),
        Seq(Set(qualified(s"$sfDir/customer.parquet"))),
        Seq(Set(qualified(s"$sfDir/customer.parquet")),
          Set(qualified(s"$sfDir/orders.parquet")))))
    } finally {
      graft.plans.MaterializedViews.clear()
      graft.catalog.Constraints.clear()
    }
  }

  test("model-declared UNIQUE keys and composite FKs parse and feed the rules") {
    // ';'-separated columns declare composite constraints in the
    // properties model (RelReferentialConstraint.java's List<IntPair>);
    // `uk:` rows feed the outer-join / aggregate removal rules
    val p = java.nio.file.Paths.get(tmp, "model_uk.properties")
    java.nio.file.Files.writeString(p, s"""
      |u_orders   = parquet:$sfDir/orders.parquet
      |u_customer = parquet:$sfDir/customer.parquet
      |uk1        = uk:u_customer.c_custkey
      |fk2        = fk:u_orders.o_custkey;o_orderkey->u_customer.c_custkey;c_nationkey
      |""".stripMargin)
    try {
      ModelLoader.loadFile(spark, p.toString)
      import org.apache.spark.sql.functions._
      // the model-declared unique key eliminates a LEFT join
      val q = spark.table("u_orders")
        .join(spark.table("u_customer"),
          col("o_custkey") === col("c_custkey"), "left")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(q.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.isEmpty,
        s"model-declared unique key must eliminate the LEFT join:\n${q.queryExecution.optimizedPlan}")
      // the composite FK parsed as ONE two-pair edge (a single-pair
      // probe must not see it: composite edges never cover lone pairs)
      assert(!graft.catalog.Constraints.coversPair(
        ("c_custkey", "o_custkey"),
        Seq(Set.empty[String]), Seq(Set.empty[String])))
    } finally graft.catalog.Constraints.clear()
  }

  test("model-declared statistics arm the eager-aggregation gate") {
    // `stats:` rows are the model's cost metadata
    // (schema/Statistic.java getRowCount + NDV): a declared 10x
    // reduction on the join key pushes the partial below the join with
    // zero profiling at load time
    val p = java.nio.file.Paths.get(tmp, "model_stats.properties")
    java.nio.file.Files.writeString(p, s"""
      |s_orders   = parquet:$sfDir/orders.parquet
      |s_customer = parquet:$sfDir/customer.parquet
      |st1        = stats:s_orders|rows=1500|ndv=o_custkey:150
      |""".stripMargin)
    try {
      ModelLoader.loadFile(spark, p.toString)
      import org.apache.spark.sql.functions._
      val q = spark.table("s_orders")
        .join(spark.table("s_customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(sum(col("o_totalprice").cast("decimal(12,2)")).as("rev"))
      val aggs = q.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      assert(aggs.size == 2,
        s"model stats must arm the eager push:\n${q.queryExecution.optimizedPlan}")
    } finally graft.catalog.Statistics.clear()
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
