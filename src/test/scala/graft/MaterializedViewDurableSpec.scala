package graft

import graft.plans.MaterializedViews
import org.apache.spark.sql.functions._

/** Durable tiles (ref: materialize/MaterializationService.java +
  * MaterializationActor.java — materializations survive the connection
  * and are re-resolved by key): partials persist under a lattice
  * directory, a NEW SparkSession re-adopts them with zero fact scans,
  * DML invalidation deletes the durable home, and a fingerprint
  * mismatch (the table changed while no session watched) discards the
  * tile at adopt time instead of serving it stale. */
class MaterializedViewDurableSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def writeFact(dir: String): Unit = {
    import spark.implicits._
    Seq((1L, "a", "LO", 10.0), (2L, "b", "HI", 20.0), (3L, "a", "HI", 30.0),
      (4L, "c", "LO", 40.0), (5L, "b", "LO", 50.0))
      .toDF("id", "tag", "pri", "amt").write.mode("overwrite").parquet(dir)
  }

  private def noFactScan(q: org.apache.spark.sql.DataFrame): Boolean = {
    val plan = q.queryExecution.optimizedPlan
    plan.toString.contains("InMemoryRelation") &&
      plan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }.isEmpty
  }

  test("a NEW SparkSession adopts the persisted tile and answers with zero fact scans") {
    val fact = tmp("mvdur") + "/t"; writeFact(fact)
    val lat = tmp("mvdur_lat")
    try {
      MaterializedViews.register(spark, "dur_t1", spark.read.parquet(fact),
        keys = Seq("tag"), sums = Seq("amt"))
      MaterializedViews.persistTile(spark, "dur_t1", lat)
      val expected = spark.read.parquet(fact).groupBy("tag")
        .agg(sum("amt").as("t"), count(lit(1)).as("n"))
        .orderBy("tag").collect().toSeq

      // restart analog: in-session registration and caches released,
      // then a genuinely NEW session (fresh state, no optimizer rules)
      MaterializedViews.release(spark, "dur_t1")
      val s2 = spark.newSession()
      assert(MaterializedViews.adoptTiles(s2, lat) == Seq("dur_t1"))

      val q = s2.read.parquet(fact).groupBy("tag")
        .agg(sum("amt").as("t"), count(lit(1)).as("n")).orderBy("tag")
      assert(noFactScan(q),
        s"adopted tile must answer with zero fact scans:\n${q.queryExecution.optimizedPlan}")
      assert(q.collect().toSeq == expected)
    } finally MaterializedViews.clear()
  }

  test("filtered tile round-trips its defining conjuncts: compensation works post-adopt") {
    val fact = tmp("mvdur") + "/t"; writeFact(fact)
    val lat = tmp("mvdur_lat")
    try {
      MaterializedViews.register(spark, "dur_filt",
        spark.read.parquet(fact).filter(col("amt") >= 20.0),
        keys = Seq("tag", "amt"), sums = Nil)
      MaterializedViews.persistTile(spark, "dur_filt", lat)
      MaterializedViews.release(spark, "dur_filt")
      val s2 = spark.newSession()
      assert(MaterializedViews.adoptTiles(s2, lat) == Seq("dur_filt"))

      // a NARROWER query implies the reloaded defining filter and
      // re-applies the residual on the tile (key-only compensation)
      val q = s2.read.parquet(fact).filter(col("amt") >= 30.0)
        .groupBy("tag").agg(count(lit(1)).as("n")).orderBy("tag")
      assert(noFactScan(q),
        s"compensated rollup must ride the adopted tile:\n${q.queryExecution.optimizedPlan}")
      assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("a", 1L), ("b", 1L), ("c", 1L)))

      // a WIDER query must NOT be answered from the filtered tile alone
      val w = s2.read.parquet(fact).groupBy("tag").agg(count(lit(1)).as("n"))
      assert(w.collect().map(_.getLong(1)).sum == 5L)
    } finally MaterializedViews.clear()
  }

  test("star-join tile rebuilds its source recipe and rewrites post-adopt") {
    import spark.implicits._
    val fact = tmp("mvdur") + "/f"
    val dim = tmp("mvdur") + "/d"
    Seq((1L, 10, 5.0), (2L, 20, 7.0), (3L, 10, 9.0))
      .toDF("id", "k", "v").write.parquet(fact)
    Seq((10, "x"), (20, "y")).toDF("dk", "name").write.parquet(dim)
    val lat = tmp("mvdur_lat")
    try {
      val star = spark.read.parquet(fact)
        .join(spark.read.parquet(dim), col("k") === col("dk"))
      MaterializedViews.register(spark, "dur_star", star,
        keys = Seq("name"), sums = Seq("v"))
      MaterializedViews.persistTile(spark, "dur_star", lat)
      MaterializedViews.release(spark, "dur_star")

      val s2 = spark.newSession()
      assert(MaterializedViews.adoptTiles(s2, lat) == Seq("dur_star"))
      val q = s2.read.parquet(fact)
        .join(s2.read.parquet(dim), col("k") === col("dk"))
        .groupBy("name").agg(sum("v").as("t")).orderBy("name")
      assert(noFactScan(q),
        s"star rollup must ride the adopted tile:\n${q.queryExecution.optimizedPlan}")
      assert(q.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
        Seq(("x", 14.0), ("y", 7.0)))
    } finally MaterializedViews.clear()
  }

  test("DML invalidation deletes the durable home: the reload never resurrects a stale tile") {
    val fact = tmp("mvdur") + "/t"; writeFact(fact)
    val lat = tmp("mvdur_lat")
    try {
      MaterializedViews.register(spark, "dur_dml", spark.read.parquet(fact),
        keys = Seq("tag"), sums = Seq("amt"))
      val tileDir = MaterializedViews.persistTile(spark, "dur_dml", lat)
      // destructive write → registry drop AND durable home deletion
      graft.plans.TableDml.update(spark, fact, col("id") === 1L,
        Map("amt" -> lit(999.0)))
      assert(!MaterializedViews.isRegistered("dur_dml"))
      val fs = new org.apache.hadoop.fs.Path(tileDir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      assert(!fs.exists(new org.apache.hadoop.fs.Path(tileDir)),
        "durable home must be deleted by the DML barrier")
      // a new session finds nothing to adopt and recomputes fresh values
      val s2 = spark.newSession()
      assert(MaterializedViews.adoptTiles(s2, lat).isEmpty)
      val a = s2.read.parquet(fact).filter(col("id") === 1L)
        .select("amt").collect()(0).getDouble(0)
      assert(a == 999.0)
    } finally MaterializedViews.clear()
  }

  test("append fold re-persists the durable partials; the reload sees the appended rows") {
    import spark.implicits._
    val fact = tmp("mvdur") + "/t"; writeFact(fact)
    val lat = tmp("mvdur_lat")
    try {
      MaterializedViews.register(spark, "dur_app", spark.read.parquet(fact),
        keys = Seq("tag"), sums = Seq("amt"))
      MaterializedViews.persistTile(spark, "dur_app", lat)
      // append folds algebraically AND refreshes the durable copy +
      // fingerprint (compactInto write-through)
      graft.plans.TableDml.insertInto(spark, fact,
        Seq((6L, "a", "HI", 60.0)).toDF("id", "tag", "pri", "amt"))
      assert(MaterializedViews.isRegistered("dur_app"), "append must fold, not drop")

      MaterializedViews.release(spark, "dur_app")
      val s2 = spark.newSession()
      assert(MaterializedViews.adoptTiles(s2, lat) == Seq("dur_app"))
      val q = s2.read.parquet(fact).groupBy("tag")
        .agg(sum("amt").as("t")).orderBy("tag")
      assert(noFactScan(q))
      assert(q.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
        Seq(("a", 100.0), ("b", 70.0), ("c", 40.0)))
    } finally MaterializedViews.clear()
  }

  test("HLL sketch and derived-measure partials survive the durable round trip") {
    import spark.implicits._
    val fact = tmp("mvdur") + "/t"
    Seq((1L, "a", 10.0, 2.0), (2L, "a", 20.0, 3.0), (3L, "b", 30.0, 4.0),
      (4L, "a", 10.0, 5.0))
      .toDF("id", "tag", "amt", "w").write.parquet(fact)
    val lat = tmp("mvdur_lat")
    try {
      def src = spark.read.parquet(fact)
      MaterializedViews.register(spark, "dur_rich", src,
        keys = Seq("tag"), sums = Seq("amt"),
        approxDistincts = Seq("id"),
        sumExprs = Seq("wamt" -> (col("amt") * col("w"))))
      MaterializedViews.persistTile(spark, "dur_rich", lat)
      MaterializedViews.release(spark, "dur_rich")
      val s2 = spark.newSession()
      assert(MaterializedViews.adoptTiles(s2, lat) == Seq("dur_rich"))

      // derived measure: SUM(amt*w) from the reloaded expression partial
      val q = s2.read.parquet(fact).groupBy("tag")
        .agg(sum(col("amt") * col("w")).as("s"),
          count(col("amt") * col("w")).as("c"))
        .orderBy("tag")
      assert(noFactScan(q),
        s"derived measure must ride the reloaded tile:\n${q.queryExecution.optimizedPlan}")
      assert(q.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq ==
        Seq(("a", 130.0, 3L), ("b", 120.0, 1L)))

      // HLL partial: approx_count_distinct rolls up from the reloaded sketch
      val a = s2.read.parquet(fact)
        .agg(approx_count_distinct(col("id")).as("d"))
      assert(noFactScan(a),
        s"approx distinct must ride the reloaded sketch:\n${a.queryExecution.optimizedPlan}")
      assert(a.collect()(0).getLong(0) == 4L)
    } finally MaterializedViews.clear()
  }

  test("conf-driven lattice home: DDL tiles persist durably and auto-adopt via the SQL front door") {
    val fact = tmp("mvdur") + "/t"; writeFact(fact)
    val lat = tmp("mvdur_lat")
    try {
      // session 1: CREATE MATERIALIZED VIEW with the lattice conf set —
      // the rollup tile persists under the configured dir with NO
      // explicit persistTile call
      val s1 = spark.newSession()
      s1.conf.set(MaterializedViews.LatticeDirConf, lat)
      s1.read.parquet(fact).createOrReplaceTempView("tdur")
      graft.sql.GraftSql.sql(s1,
        "CREATE MATERIALIZED VIEW dur_ddl AS SELECT tag, SUM(amt) AS s FROM tdur GROUP BY tag")
      val fs = new org.apache.hadoop.fs.Path(lat)
        .getFileSystem(spark.sessionState.newHadoopConf())
      assert(fs.listStatus(new org.apache.hadoop.fs.Path(lat)).nonEmpty,
        "DDL tile must persist under the configured lattice dir")

      // restart analog, then session 2 with the same conf: the FIRST
      // SQL statement auto-adopts and is answered from the tile
      MaterializedViews.release(s1, "ddl:dur_ddl")
      graft.sql.MaterializedViewSql.clearRegistry()
      val s2 = spark.newSession()
      s2.conf.set(MaterializedViews.LatticeDirConf, lat)
      s2.read.parquet(fact).createOrReplaceTempView("tdur2")
      val q = graft.sql.GraftSql.sql(s2,
        "SELECT tag, SUM(amt) AS s FROM tdur2 GROUP BY tag ORDER BY tag")
      assert(noFactScan(q),
        s"auto-adopted tile must answer the rollup:\n${q.queryExecution.optimizedPlan}")
      assert(q.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
        Seq(("a", 40.0), ("b", 70.0), ("c", 40.0)))
    } finally {
      MaterializedViews.clear()
      graft.sql.MaterializedViewSql.clearRegistry()
    }
  }

  test("sanitized tile names get a hash suffix: ddl:x and ddl_x never share a durable home") {
    val fact = tmp("mvdur") + "/t"; writeFact(fact)
    val lat = tmp("mvdur_lat")
    try {
      MaterializedViews.register(spark, "ddl:x", spark.read.parquet(fact),
        keys = Seq("tag"), sums = Seq("amt"))
      MaterializedViews.register(spark, "ddl_x", spark.read.parquet(fact),
        keys = Seq("tag", "pri"), sums = Seq("amt"))
      val d1 = MaterializedViews.persistTile(spark, "ddl:x", lat)
      val d2 = MaterializedViews.persistTile(spark, "ddl_x", lat)
      assert(d1 != d2, s"slug collision: $d1 == $d2")
      MaterializedViews.release(spark, "ddl:x")
      MaterializedViews.release(spark, "ddl_x")
      val s2 = spark.newSession()
      assert(MaterializedViews.adoptTiles(s2, lat).toSet == Set("ddl:x", "ddl_x"))
    } finally MaterializedViews.clear()
  }

  test("fingerprint mismatch discards the tile: out-of-band writes are never served stale") {
    import spark.implicits._
    val fact = tmp("mvdur") + "/t"; writeFact(fact)
    val lat = tmp("mvdur_lat")
    try {
      MaterializedViews.register(spark, "dur_fp", spark.read.parquet(fact),
        keys = Seq("tag"), sums = Seq("amt"))
      val tileDir = MaterializedViews.persistTile(spark, "dur_fp", lat)
      MaterializedViews.release(spark, "dur_fp")
      // the table changes while NO session watches it (another driver,
      // a manual write): the keyed-validity check must refuse the tile
      Seq((7L, "z", "LO", 70.0)).toDF("id", "tag", "pri", "amt")
        .write.mode("append").parquet(fact)

      val s2 = spark.newSession()
      assert(MaterializedViews.adoptTiles(s2, lat).isEmpty,
        "changed source must discard the durable tile")
      val fs = new org.apache.hadoop.fs.Path(tileDir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      assert(!fs.exists(new org.apache.hadoop.fs.Path(tileDir)),
        "a discarded tile is deleted, not retried forever")
      // and the query recomputes from the live files
      val q = s2.read.parquet(fact).groupBy("tag").agg(sum("amt").as("t"))
      assert(q.collect().map(_.getDouble(1)).sum == 220.0)
    } finally MaterializedViews.clear()
  }
}
