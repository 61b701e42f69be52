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
