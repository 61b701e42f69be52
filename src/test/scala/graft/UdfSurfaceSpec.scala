package graft

import org.apache.spark.sql.functions._

/** The user-facing UDF/UDAF/UDTF surface (ref: SURVEY.md §2.9 —
  * ScalarFunctionImpl / AggregateFunctionImpl / TableFunctionImpl). */
class UdfSurfaceSpec extends SparkSpec {

  test("scalar UDF registers and runs from SQL and DSL") {
    val slug = spark.udf.register("slugify",
      (s: String) => s.toLowerCase.replaceAll("[^a-z0-9]+", "-"))
    T.registerViews(spark, sfDir)
    val viaSql = spark.sql("SELECT slugify('Hello, World!') AS s").collect()(0).getString(0)
    assert(viaSql == "hello-world-")
    val viaDsl = T(spark, sfDir, "region")
      .select(slug(col("r_name")).as("s")).orderBy("s")
      .collect().map(_.getString(0))
    assert(viaDsl.contains("middle-east"))
  }

  test("xml xpath query extracts typed values") {
    val r = run("q69_xml_xpath").collect()
    assert(r.nonEmpty)
    val first = r.head
    assert(first.getString(1).startsWith("Brand#"))
    assert(first.getInt(2) > 0)
    assert(!first.getBoolean(3))
  }

  test("table function via flatMap — rows out per input row (UDTF shape)") {
    import spark.implicits._
    // n-gram generator as a typed table function
    val grams = T(spark, sfDir, "documents").select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        text.split(' ').sliding(2).map(w => (id, w.mkString(" "))) }
      .toDF("doc_id", "bigram")
    val n = grams.count()
    val words = T(spark, sfDir, "documents")
      .select(size(split(col("text"), " ")).as("w"))
      .agg(sum(col("w") - 1)).collect()(0).getLong(0)
    assert(n == words, "bigram TVF must emit words-1 rows per doc")
  }

  test("interval arithmetic matches calendar semantics") {
    val r = run("q67_interval_arith").limit(1).collect()(0)
    // T normalizes the generator's TIMESTAMP_NTZ to TIMESTAMP (UTC
    // session), so rows surface java.sql.Timestamp
    val base = T(spark, sfDir, "orders").filter(col("o_orderkey") === r.getLong(0))
      .collect()(0).getAs[java.sql.Timestamp]("o_orderdate").toLocalDateTime
    assert(r.getAs[java.sql.Timestamp]("plus_3m").toLocalDateTime == base.plusMonths(3))
    assert(r.getAs[java.sql.Timestamp]("minus_45d").toLocalDateTime == base.minusDays(45))
  }
}
