package graft.sql
object TmpDebug {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = "select cast('2016-02-26 19:06:00.123' as timestamp(1))"
    val r = CalciteTyping.rewrite(q)
    println("REWRITTEN: " + r)
    val df = GraftSql.sql(spark, r)
    println("PLAN: " + df.queryExecution.analyzed.toString.take(400))
    println("VAL: " + df.collect()(0).get(0))
    spark.stop()
  }
}
