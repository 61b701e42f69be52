package graft

import scala.collection.mutable.ArrayBuffer

/** Conformance for the reference's streaming corpus
  * (core/src/test/resources/sql/stream.iq): every case exercises the
  * TUMBLE / HOP / SESSION windowing TVFs (SqlWindowTableFunction.java)
  * over the public `orinoco` ORDERS fixture
  * (OrdersStreamTableFactory.java:40-60 — five rows, ROWTIME/ID/
  * PRODUCT/UNITS). The TVF calls are batch-evaluable relations here, so
  * the recorded outputs compare directly against the lowered Spark
  * plans (sql/WindowTvfSql.scala): window() projections for
  * TUMBLE/HOP, the merge-overlapping-windows sessionization for
  * SESSION — named arguments, subquery DATA, alignment offsets,
  * compound intervals and NULL-timestamp discard (CALCITE-7684) all
  * included.
  */
class StreamCorpusSpec extends IqHarness {

  private val refSqlDir = new java.io.File("/root/reference/core/src/test/resources/sql")

  /** Orinoco ORDERS (OrdersStreamTableFactory's fixed row set). */
  private def registerOrders(): Unit =
    spark.sql("""
      CREATE OR REPLACE TEMP VIEW ORDERS AS SELECT * FROM VALUES
        (TIMESTAMP'2015-02-15 10:15:00', 1, 'paint', 10),
        (TIMESTAMP'2015-02-15 10:24:15', 2, 'paper', 5),
        (TIMESTAMP'2015-02-15 10:24:45', 3, 'brush', 12),
        (TIMESTAMP'2015-02-15 10:58:00', 4, 'paint', 3),
        (TIMESTAMP'2015-02-15 11:10:00', 5, 'paint', 3)
        AS t(ROWTIME, ID, PRODUCT, UNITS)""")

  /** The recorded outputs render TIMESTAMP(3) with exactly three
    * fraction digits (10:30:41.650); java.sql.Timestamp.toString drops
    * trailing zeros (10:30:41.65). Normalize fractions symmetrically. */
  override protected def postNorm(cell: String): String =
    if (cell.matches("\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}\\.\\d+")) {
      val base = cell.substring(0, 19)
      val frac = cell.substring(20).reverse.dropWhile(_ == '0').reverse
      if (frac.isEmpty) base else s"$base.$frac"
    } else cell

  test("stream.iq: windowing TVF corpus passes value-compare") {
    assume(refSqlDir.isDirectory, "reference checkout not present")
    registerOrders()
    val cases = parseIq(new java.io.File(refSqlDir, "stream.iq"))
      .filter(c => !c.ddl && c.use == "orinoco")
    var pass = 0
    val failures = ArrayBuffer.empty[String]
    for (c <- cases) {
      compareCase(c, quoteIdents(c.sql)) match {
        case None => pass += 1
        case Some(err) =>
          failures += s"${c.file}:${c.line}: $err\n  SQL: ${c.sql.linesIterator.mkString(" ").take(200)}"
      }
    }
    info(s"stream.iq: $pass/${cases.size} windowing-TVF cases pass")
    assert(cases.size >= 15, s"parser found only ${cases.size} cases — quidem parsing regressed")
    assert(failures.isEmpty,
      s"stream.iq failures (${failures.size}):\n${failures.mkString("\n")}")
  }
}
