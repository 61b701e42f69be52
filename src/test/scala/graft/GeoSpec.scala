package graft

import graft.functions.Spatial
import graft.functions.Spatial.{GPoint, Geometry}

/** WKT/WKB geometry family — the cases DuckDB can't oracle (line and
  * polygon predicates, WKB encodings, error contracts), mirroring
  * reference behavior from core/src/test/resources/sql/spatial.iq. */
class GeoSpec extends SparkSpec {

  private def g(wkt: String) = Spatial.parseWkt(wkt)

  test("WKT parse/emit round-trips every supported type") {
    for (wkt <- Seq(
        "POINT (1 2)",
        "LINESTRING (0 0, 1 1, 2 0)",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
        "MULTIPOINT ((0 0), (1 2))")) {
      assert(Spatial.asText(g(wkt)) == wkt, s"round trip broke: $wkt")
    }
    // non-integral coords keep their decimals
    assert(Spatial.asText(g("POINT (1.5 -2.25)")) == "POINT (1.5 -2.25)")
    intercept[IllegalArgumentException](g("CIRCLE (0 0, 1)"))
  }

  test("st_intersects: point/line/polygon matrix (spatial.iq semantics)") {
    val poly = g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(Spatial.intersects(g("POINT (2 2)"), poly))
    assert(Spatial.intersects(g("POINT (0 2)"), poly), "boundary intersects (JTS)")
    assert(!Spatial.intersects(g("POINT (5 5)"), poly))
    assert(Spatial.intersects(g("LINESTRING (-1 2, 5 2)"), poly), "line crossing")
    assert(Spatial.intersects(g("LINESTRING (1 1, 2 2)"), poly), "line inside")
    assert(!Spatial.intersects(g("LINESTRING (5 5, 6 6)"), poly))
    assert(Spatial.intersects(
      g("LINESTRING (0 0, 2 2)"), g("LINESTRING (0 2, 2 0)")), "crossing segments")
    assert(!Spatial.intersects(
      g("LINESTRING (0 0, 1 0)"), g("LINESTRING (0 1, 1 1)")), "parallel segments")
    assert(Spatial.intersects(poly, g("POLYGON ((3 3, 6 3, 6 6, 3 6, 3 3))")), "overlap")
    assert(Spatial.intersects(poly, g("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")), "containment")
    assert(!Spatial.intersects(poly, g("POLYGON ((10 10, 11 10, 11 11, 10 10))")))
    assert(Spatial.intersects(g("MULTIPOINT ((9 9), (2 2))"), poly), "any member")
  }

  test("st_buffer: 32-gon ring, area ~ pi*r^2, centroid at the center") {
    val buf = Spatial.buffer(g("POINT (3 4)"), 2.0)
    assert(buf.gtype == "POLYGON" && buf.ring.length == 33, "closed 32-gon")
    val area = Spatial.ringArea(buf.ring.map(p => (p.x, p.y)))
    assert(math.abs(area - math.Pi * 4) < 0.11, s"32-gon area ~ pi*r^2, got $area")
    intercept[IllegalArgumentException](
      Spatial.buffer(g("LINESTRING (0 0, 1 1)"), 1.0))
  }

  test("st_union: dedup + canonical order; collapse to POINT; clear error otherwise") {
    val u = Spatial.union(g("MULTIPOINT ((1 1), (0 0))"), g("POINT (1 1)"))
    assert(u == Geometry("MULTIPOINT", Seq(GPoint(0, 0), GPoint(1, 1))))
    assert(Spatial.union(g("POINT (1 1)"), g("POINT (1 1)")) ==
      Geometry("POINT", Seq(GPoint(1, 1))))
    intercept[IllegalArgumentException](
      Spatial.union(g("POINT (0 0)"), g("POLYGON ((0 0, 1 0, 1 1, 0 0))")))
  }

  test("WKB: every type round-trips; big-endian input decodes") {
    for (wkt <- Seq(
        "POINT (1.5 -2.5)",
        "LINESTRING (0 0, 1 1)",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
        "MULTIPOINT ((0 0), (1 2))")) {
      assert(Spatial.fromWkb(Spatial.toWkb(g(wkt))) == g(wkt), s"WKB round trip: $wkt")
    }
    // hand-built big-endian POINT (1 2)
    val bb = java.nio.ByteBuffer.allocate(21).order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put(0.toByte).putInt(1).putDouble(1.0).putDouble(2.0)
    assert(Spatial.fromWkb(bb.array()) == g("POINT (1 2)"))
  }

  test("polygon centroid is area-weighted (shoelace), not the vertex mean") {
    // L-shaped polygon: vertex mean != centroid
    val c = Spatial.centroid(g("POLYGON ((0 0, 4 0, 4 1, 1 1, 1 4, 0 4, 0 0))"))
    val (cx, cy) = (c.ring.head.x, c.ring.head.y)
    // area 7: square 4x1 (centroid 2,0.5) + square 1x3 above y=1 (centroid 0.5,2.5)
    assert(math.abs(cx - (4 * 2 + 3 * 0.5) / 7) < 1e-9, s"cx=$cx")
    assert(math.abs(cy - (4 * 0.5 + 3 * 2.5) / 7) < 1e-9, s"cy=$cy")
  }

  test("st_envelope / st_length / st_perimeter") {
    val env = Spatial.envelope(g("LINESTRING (1 4, 3 0, 2 2)"))
    assert(Spatial.asText(env) == "POLYGON ((1 0, 3 0, 3 4, 1 4, 1 0))")
    assert(Spatial.envelope(g("POINT (5 5)")) == g("POINT (5 5)"))
    assert(Spatial.length(g("LINESTRING (0 0, 3 4, 3 10)")) == 11.0)
    assert(Spatial.length(g("POINT (1 1)")) == 0.0)
    assert(Spatial.perimeter(g("POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))")) == 14.0)
  }

  test("SQL surface: the geometry functions compose inside spark.sql") {
    graft.functions.Spatial.registerAll(spark)
    val r = spark.sql("""
      SELECT st_astext(st_geomfromwkb(st_aswkb(st_geomfromtext('POINT (7 8)')))) AS rt,
             st_intersects(st_geomfromtext('LINESTRING (0 0, 2 2)'),
                           st_geomfromtext('POLYGON ((1 0, 3 0, 3 3, 1 3, 1 0))')) AS hit,
             st_npoints(st_buffer(st_geomfromtext('POINT (0 0)'), CAST(3.0 AS DOUBLE))) AS np
    """).collect()(0)
    assert(r.getString(0) == "POINT (7 8)")
    assert(r.getBoolean(1))
    assert(r.getInt(2) == 33)
  }
}
