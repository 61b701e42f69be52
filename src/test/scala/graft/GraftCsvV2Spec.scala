package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** DataSourceV2 connector (sources/GraftCsv): filter + column pushdown
  * must be visible in the physical plan AND the byte-range split must
  * read every line exactly once. */
class GraftCsvV2Spec extends SparkSpec {

  private lazy val csv: String = {
    val f = Files.createTempFile("graftcsv", ".csv")
    val rows = (1 to 1000).map(i => s"$i,item_$i,${i * 1.5}")
    Files.writeString(f, ("id,name,price" +: rows).mkString("\n"))
    f.toString
  }

  private def read() = spark.read
    .format("graft.sources.GraftCsv")
    .option("schema", "id:long,name:string,price:double")
    .load(csv)

  test("reads every row exactly once across byte-range partitions") {
    val df = read()
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 4, "file must split into byte ranges")
    assert(df.agg(sum("id")).collect()(0).getLong(0) == 1000L * 1001 / 2)
  }

  test("comparison filters push into the scan; plan shows PushedFilters") {
    val df = read().filter(col("id") > 990 && col("price") <= 1497.0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("GreaterThan(id,990)"),
      s"filter must reach the V2 scan:\n$plan")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == (991L to 998L))
  }

  test("unsupported predicates stay residual — results still correct") {
    // endsWith is not in the pushdown set; Spark must re-apply it
    val df = read().filter(col("name").endsWith("00"))
    assert(df.count() == 10) // 100, 200, ..., 1000
  }

  test("column pruning reaches the reader (ReadSchema in scan description)") {
    val df = read().select("price")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<price:double>"),
      s"projection must prune the read schema:\n$plan")
    assert(math.abs(df.agg(sum("price")).collect()(0).getDouble(0) -
      1.5 * 1000 * 1001 / 2) < 1e-6)
  }

  test("partitions option scales the split count") {
    val df = spark.read.format("graft.sources.GraftCsv")
      .option("schema", "id:long,name:string,price:double")
      .option("partitions", "9")
      .load(csv)
    assert(df.rdd.getNumPartitions == 9)
    assert(df.count() == 1000)
  }

  test("UTF-8 values survive the byte-range reader (no Latin-1 corruption)") {
    val f = Files.createTempFile("graftcsv-utf8", ".csv")
    Files.writeString(f,
      "id,name,price\n1,héllo wörld,1.0\n2,日本語テキスト,2.0\n3,emoji ✓ done,3.0")
    val names = spark.read.format("graft.sources.GraftCsv")
      .option("schema", "id:long,name:string,price:double")
      .load(f.toString).orderBy("id").collect().map(_.getString(1))
    assert(names.toSeq == Seq("héllo wörld", "日本語テキスト", "emoji ✓ done"))
  }

  test("RFC-4180 quoting: commas and doubled quotes inside quoted fields") {
    val f = Files.createTempFile("graftcsv-quote", ".csv")
    Files.writeString(f,
      "id,name,price\n1,\"a, b, c\",1.0\n2,\"say \"\"hi\"\"\",2.0\n3,plain,3.0")
    val rows = spark.read.format("graft.sources.GraftCsv")
      .option("schema", "id:long,name:string,price:double")
      .load(f.toString).orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("a, b, c", "say \"hi\"", "plain"))
    assert(rows.map(_.getDouble(2)).toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("multi-path load scans every file (byte-range splits per file)") {
    // the same file twice: every row appears exactly twice
    val df = spark.read.format("graft.sources.GraftCsv")
      .option("schema", "id:long,name:string,price:double")
      .load(csv, csv)
    val single = spark.read.format("graft.sources.GraftCsv")
      .option("schema", "id:long,name:string,price:double")
      .load(csv)
    assert(df.count() == 2 * single.count())
    val byId = df.groupBy("id").count().collect()
    assert(byId.nonEmpty && byId.forall(_.getLong(1) == 2L))
  }
}
