package graft

import graft.sql.Unparser
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan → SQL round trips: the unparsed text, run through spark.sql,
  * must reproduce the DataFrame's own result (the JdbcImplementor
  * contract — shipped SQL computes the same relation).
  */
class UnparserSpec extends SparkSpec {

  private def roundTrip(df: DataFrame): Unit = {
    val sql = Unparser.unparse(df).getOrElse(fail("plan not unparseable"))
    val back = spark.sql(sql)
    val a = df.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = back.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(a.sameElements(b), s"mismatch for:\n$sql")
    assert(df.columns.sameElements(back.columns), s"columns differ for:\n$sql")
  }

  test("scan-filter-project round-trips") {
    roundTrip(T(spark, sfDir, "part")
      .filter(col("p_size") > 20)
      .select(col("p_partkey"), col("p_name"),
        (col("p_retailprice") * 2).as("double_price")))
  }

  test("aggregate with HAVING-style filter above it round-trips") {
    roundTrip(T(spark, sfDir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), max(col("o_totalprice")).as("mx"))
      .filter(col("n") > 100))
  }

  test("sort + limit round-trips") {
    roundTrip(T(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .limit(25))
  }

  test("inner equi-join of two scans round-trips") {
    val n = T(spark, sfDir, "nation")
    val r = T(spark, sfDir, "region")
    roundTrip(n.join(r, n("n_regionkey") === r("r_regionkey"))
      .select(col("n_name"), col("r_name")))
  }

  test("aggregate over a filtered scan keeps WHERE below GROUP BY") {
    val df = T(spark, sfDir, "lineitem")
      .filter(col("l_quantity") > 45)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
    val sql = Unparser.unparse(df).get
    assert(sql.contains("WHERE") && sql.contains("GROUP BY"))
    assert(sql.indexOf("WHERE") < sql.indexOf("GROUP BY"))
    roundTrip(df)
  }

  test("unsupported shapes refuse rather than emit wrong SQL") {
    val win = T(spark, sfDir, "orders").withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("o_orderkey")))
    assert(Unparser.unparse(win).isEmpty)
  }
}
