package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

/** JDBC adapter (SURVEY §2.2): a REAL JDBC roundtrip against embedded
  * Derby (on the Spark classpath) — scan, predicate pushdown into the
  * remote store, and the reference's full-subtree pushdown
  * (JdbcToEnumerableConverter analog) via a pushed-down subquery in
  * `dbtable`. Partitioned parallel reads are the same surface with
  * partitionColumn/lowerBound/upperBound/numPartitions. */
class JdbcSourceSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def withDerby[A](f: => A): A = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE kv") catch { case _: Exception => () }
      st.execute("CREATE TABLE kv (k INT, grp VARCHAR(10), v DOUBLE)")
      (1 to 100).foreach { i =>
        st.execute(s"INSERT INTO kv VALUES ($i, 'g${i % 4}', ${i * 1.5})")
      }
      st.close()
      f
    } finally conn.close()
  }

  test("jdbc scan reads the remote table and pushes predicates down") {
    withDerby {
      val df = spark.read.format("jdbc")
        .option("url", url).option("dbtable", "kv").load()
      assert(df.count() == 100)

      val filtered = df.filter(col("k") > 90)
      assert(filtered.count() == 10)
      val plan = filtered.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
        s"predicate must reach the JDBC source:\n$plan")
    }
  }

  test("CREATE FOREIGN SCHEMA registers every remote table; queries push down; DROP removes them") {
    val fsUrl = "jdbc:derby:memory:fsdb;create=true"
    val conn = DriverManager.getConnection(fsUrl)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE APP.KV1") catch { case _: Exception => () }
      try st.execute("DROP TABLE APP.KV2") catch { case _: Exception => () }
      st.execute("CREATE TABLE APP.KV1 (K INT, V DOUBLE)")
      st.execute("CREATE TABLE APP.KV2 (K INT, S VARCHAR(10))")
      st.execute("INSERT INTO APP.KV1 VALUES (1, 1.5), (2, 2.5), (3, 3.5)")
      st.execute("INSERT INTO APP.KV2 VALUES (1, 'a'), (2, 'b')")
      st.close()
    } finally conn.close()
    try {
      graft.sql.GraftSql.sql(spark,
        s"""create foreign schema ext type 'jdbc' options (
           |  `jdbcUrl` 'jdbc:derby:memory:fsdb', `jdbcSchema` 'APP')""".stripMargin)
      assert(spark.catalog.databaseExists("ext"))
      val joined = spark.sql(
        "SELECT s, v FROM ext.kv1 JOIN ext.kv2 ON kv1.k = kv2.k WHERE v > 2 ORDER BY s")
      assert(joined.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
        Seq(("b", 2.5)))
      // the filter reaches the remote store
      val plan = spark.sql("SELECT v FROM ext.kv1 WHERE k > 2")
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
        s"predicate must push into the foreign store:\n$plan")
      // error contracts: bad type, both type+library, missing factory
      for (bad <- Seq(
        "create foreign schema fsx type 'bad'",
        "create foreign schema fsx type 'jdbc' library 'x.Y'",
        "create foreign schema fsx library 'com.example.NoSuchFactory'",
        "create foreign schema fsx"))
        intercept[Exception] { graft.sql.GraftSql.sql(spark, bad) }
      graft.sql.GraftSql.sql(spark, "drop foreign schema if exists ext")
      assert(!spark.catalog.databaseExists("ext"))
      // dropping a missing schema without IF EXISTS is the error path
      intercept[Exception] {
        graft.sql.GraftSql.sql(spark, "drop foreign schema ext")
      }
      // DROP FOREIGN SCHEMA must not cascade-drop a REGULAR database
      // that merely shares the name — only schemas this statement
      // family created are in scope
      spark.sql("CREATE DATABASE IF NOT EXISTS plaindb")
      try {
        intercept[Exception] {
          graft.sql.GraftSql.sql(spark, "drop foreign schema plaindb")
        }
        assert(spark.catalog.databaseExists("plaindb"),
          "a non-foreign database must survive DROP FOREIGN SCHEMA")
        // ...and CREATE FOREIGN SCHEMA must refuse to ADOPT it (adoption
        // would make the next DROP FOREIGN SCHEMA cascade-drop it)
        intercept[Exception] {
          graft.sql.GraftSql.sql(spark, "create foreign schema plaindb type 'map'")
        }
        intercept[Exception] {
          graft.sql.GraftSql.sql(spark, "drop foreign schema plaindb")
        }
        assert(spark.catalog.databaseExists("plaindb"),
          "a refused adoption must leave the database untouched")
      } finally spark.sql("DROP DATABASE IF EXISTS plaindb CASCADE")
    } finally {
      try spark.sql("DROP DATABASE IF EXISTS ext CASCADE") catch { case _: Exception => () }
    }
  }

  test("full-subtree pushdown: aggregation executes inside the store") {
    withDerby {
      val pushed = spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable",
          "(SELECT grp, SUM(v) AS total, COUNT(*) AS n FROM kv GROUP BY grp) t")
        .load()
      val got = pushed.collect()
        .map(r => (r.getString(0), r.getDouble(1), r.get(2).toString.toLong))
        .sortBy(_._1)
      assert(got.length == 4)
      assert(got.map(_._3).sum == 100L)
      // no Spark-side aggregate in the plan: the store did the work
      val plan = pushed.queryExecution.executedPlan.toString
      assert(!plan.contains("HashAggregate"), s"aggregate must stay remote:\n$plan")
    }
  }
}
