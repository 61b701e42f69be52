package graft

import scala.collection.mutable.ArrayBuffer

/** Measured coverage over the reference's spatial conformance corpus
  * (core/src/test/resources/sql/spatial.iq — 375 enabled statements,
  * JTS-backed there). Each case routes through the SpatialSql adapter
  * (ST_* names → the Spatial2 string-geometry registry, WKT literals
  * wrapped) and value-compares the recorded output. The gate pins a
  * FLOOR on the pass count, babel-style: the corpus includes
  * JTS-geometry outputs this engine does not reproduce (buffers,
  * bounding circles, 3D transforms) — failures are recorded to
  * target/spatial-failures.txt, and the floor ratchets as functions
  * land.
  *
  * The GEO fixture (countries/states/parks) is parsed AT TEST TIME from
  * the reference's testkit table functions
  * (testkit/src/main/java/org/apache/calcite/test/schemata/countries/ —
  * nothing copied into the repo).
  */
class SpatialCorpusSpec extends IqHarness {

  /** WKT cells carry raw double formatting; different-but-correct
    * operation orders differ in the last ulps (ST_MinimumRectangle's
    * line intersections: 1.3999999999999997 vs JTS's 1.4). Round every
    * numeric token inside the cell to 9 significant digits on BOTH
    * sides — the same tolerance the harness already applies to plain
    * numeric cells. Polygon rings are additionally rotated to a
    * canonical start vertex (and multipolygon parts sorted): JTS's
    * overlay/buffer pick an arbitrary ring start, so ring equality is
    * cyclic, not positional. Orientation is NOT normalized — a reversed
    * ring stays a mismatch. */
  override protected def postNorm(cell: String): String =
    canonRings("-?\\d+\\.\\d+(?:[eE][+-]?\\d+)?".r.replaceAllIn(cell, m =>
      java.util.regex.Matcher.quoteReplacement(normCell(m.matched))))

  private def canonRings(cell: String): String = {
    import graft.functions.Spatial2
    val t = cell.trim
    if (!t.startsWith("POLYGON") && !t.startsWith("MULTIPOLYGON") &&
      !t.contains(";POLYGON") && !t.contains(";MULTIPOLYGON")) cell
    else scala.util.Try {
      val (srid, g) = Spatial2.parseS(t)
      def rot(ring: Seq[Spatial2.P]): Seq[Spatial2.P] = {
        val open = if (ring.length > 1 && ring.head == ring.last) ring.dropRight(1) else ring
        val idx = open.indices.minBy(i => (open(i).x, open(i).y))
        val r = open.drop(idx) ++ open.take(idx)
        r :+ r.head
      }
      def canon(x: Spatial2.G): Spatial2.G = x.gtype match {
        case "POLYGON" => x.copy(rings = x.rings.map(rot))
        case "MULTIPOLYGON" =>
          // full-ring sort key: first-vertex ties (triangulations fanning
          // from one point) must order identically on both sides
          val parts = x.parts.map(canon).sortBy(Spatial2.emit)
          x.copy(parts = parts)
        case _ => x
      }
      Spatial2.emitS(srid, canon(g))
    }.getOrElse(cell)
  }

  private val refSqlDir = new java.io.File("/root/reference/core/src/test/resources/sql")
  private val testkitDir = new java.io.File(
    "/root/reference/testkit/src/main/java/org/apache/calcite/test/schemata/countries")

  private def registerGeo(): Unit = {
    def rows(f: String): Seq[Array[String]] = {
      val src = scala.io.Source.fromFile(new java.io.File(testkitDir, f), "UTF-8").mkString
      // rows look like {"AD", 42.546245, 1.601554, "Andorra"} — strings
      // may contain escaped quotes; Java string concatenation (" + ")
      // inside a row is joined
      val body = src.replaceAll("\"\\s*\\+\\s*\"", "")
      "\\{([^{}]*)\\}".r.findAllMatchIn(body)
        .map(_.group(1))
        .filter(r => r.contains("\""))
        .map(_.split(",(?=(?:[^\"]*\"[^\"]*\")*[^\"]*$)").map(_.trim.stripPrefix("\"").stripSuffix("\"")))
        .toSeq
    }
    val countries = rows("CountriesTableFunction.java").filter(_.length == 4)
    val states = rows("StatesTableFunction.java").filter(_.length == 2)
    val spark0 = spark
    import spark0.implicits._
    def optD(s: String): Option[Double] = if (s == "null") None else Some(s.toDouble)
    countries.map(r => (r(0), optD(r(1)), optD(r(2)), r(3)))
      .toDF("country", "latitude", "longitude", "name")
      .createOrReplaceTempView("countries")
    // STATE_ROWS come first in the file, PARK_ROWS after; states have
    // 2-letter codes, parks longer names
    val (st, pk) = states.partition(_(0).length == 2)
    st.map(r => (r(0), r(1))).toDF("name", "geom").createOrReplaceTempView("states")
    pk.map(r => (r(0), r(1))).toDF("name", "geom").createOrReplaceTempView("parks")
  }

  private def clean(sql: String): String =
    graft.sql.SpatialSql.rewrite(
      quoteIdents(graft.sql.GraftSql.stripComments(sql)
        .replaceAll("(?i)\\bGEO\\.\"(countries|states|parks)\"", "$1")))

  test("reference spatial.iq corpus: measured coverage with a ratcheted floor") {
    assume(refSqlDir.isDirectory, "reference checkout not present")
    graft.functions.Spatial2.registerAll(spark)
    registerGeo()
    val cases = parseIq(new java.io.File(refSqlDir, "spatial.iq")).filterNot(_.ddl)
    var pass = 0
    val failures = ArrayBuffer.empty[String]
    for (c <- cases) {
      compareCase(c, clean(c.sql)) match {
        case None => pass += 1
        case Some(err) =>
          failures += s"${c.file}:${c.line}: ${err.linesIterator.take(1).mkString}\n  SQL: ${c.sql.linesIterator.mkString(" ").take(160)}"
      }
    }
    info(s"spatial corpus: $pass/${cases.size} passing")
    val fw = new java.io.PrintWriter("target/spatial-failures.txt", "UTF-8")
    try failures.foreach(fw.println) finally fw.close()
    assert(pass >= 365, s"spatial corpus coverage dropped: $pass passing (floor 365)")
  }
}
