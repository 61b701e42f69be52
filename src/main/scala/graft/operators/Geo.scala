package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.functions._

/** WKT/WKB spatial surface (ref: runtime/SpatialTypeFunctions.java —
  * ST_GeomFromText/ST_AsText/ST_Intersects/ST_Buffer/ST_Union/
  * ST_Centroid/ST_NPoints/ST_AsWKB/ST_GeomFromWKB; corpus
  * core/src/test/resources/sql/spatial.iq). The functions are pure
  * planar math over a tagged struct geometry (functions/Spatial.scala),
  * so the oracle states the same arithmetic/string construction
  * directly — DuckDB 1.0's spatial extension is not installable
  * offline, and doesn't need to be: every value below is derivable in
  * plain SQL.
  */
object Geo {

  /** One row per nation: a WKT round trip, point-in-polygon intersect,
    * buffer area + vertex count, point-set union and its centroid, and
    * a WKB encode/decode round trip — 9 spatial functions exercised
    * end to end with value-checked results. */
  val q136_spatial_wkt = Q(
    (s, dir) => {
      graft.functions.Spatial.registerAll(s)
      T(s, dir, "nation")
        .select(col("n_nationkey"),
          expr("CAST(n_nationkey % 5 AS INT)").as("xi"),
          expr("CAST(n_nationkey DIV 5 AS INT)").as("yi"))
        .withColumn("g", expr("st_geomfromtext(concat('POINT (', xi, ' ', yi, ')'))"))
        .select(col("n_nationkey"),
          expr("st_astext(g)").as("wkt"),
          expr("""st_intersects(g, st_geomfromtext(
            'POLYGON ((0.5 0.5, 3.5 0.5, 3.5 2.5, 0.5 2.5, 0.5 0.5))'))""").as("in_box"),
          round(expr("st_area(st_buffer(g, CAST(2.0 AS DOUBLE)).ring)"), 3).as("buf_area"),
          expr("st_npoints(st_buffer(g, CAST(1.0 AS DOUBLE)))").as("buf_pts"),
          expr("st_astext(st_union(g, st_geomfromtext('POINT (2 1)')))").as("un"),
          expr("st_astext(st_centroid(st_union(g, st_geomfromtext('POINT (2 1)'))))").as("cen"),
          expr("st_astext(st_geomfromwkb(st_aswkb(g)))").as("wkb_rt"))
        .orderBy("n_nationkey")
    },
    Some("""
      WITH n AS (
        SELECT n_nationkey,
               CAST(n_nationkey % 5 AS INT) AS xi,
               CAST(n_nationkey // 5 AS INT) AS yi
        FROM nation)
      SELECT n_nationkey,
        'POINT (' || xi || ' ' || yi || ')' AS wkt,
        (xi > 0.5 AND xi < 3.5 AND yi > 0.5 AND yi < 2.5) AS in_box,
        round(0.5 * 32 * 4.0 * sin(2 * pi() / 32), 3) AS buf_area,
        CAST(33 AS INT) AS buf_pts,
        CASE WHEN xi = 2 AND yi = 1 THEN 'POINT (2 1)'
             WHEN xi < 2 OR (xi = 2 AND yi < 1)
               THEN 'MULTIPOINT ((' || xi || ' ' || yi || '), (2 1))'
             ELSE 'MULTIPOINT ((2 1), (' || xi || ' ' || yi || '))' END AS un,
        CASE WHEN xi = 2 AND yi = 1 THEN 'POINT (2 1)'
             ELSE 'POINT (' ||
               CASE WHEN (xi + 2) % 2 = 0 THEN CAST((xi + 2) // 2 AS VARCHAR)
                    ELSE CAST((xi + 2) / 2.0 AS VARCHAR) END || ' ' ||
               CASE WHEN (yi + 1) % 2 = 0 THEN CAST((yi + 1) // 2 AS VARCHAR)
                    ELSE CAST((yi + 1) / 2.0 AS VARCHAR) END || ')' END AS cen,
        'POINT (' || xi || ' ' || yi || ')' AS wkb_rt
      FROM n ORDER BY n_nationkey"""))

  /** Spatial long tail (ref: runtime/SpatialTypeFunctions.java ST_Area/
    * ST_Perimeter/ST_Centroid over polygons WITH HOLES, ST_ConvexHull,
    * ST_Simplify, ST_Length, ST_X/ST_Y): per nation, a square polygon of
    * side s with a unit hole, a 5-point convex hull, a Douglas–Peucker
    * simplification, and a 3-4-5 line length — every value a closed-form
    * the oracle states in plain SQL. */
  val q137_spatial_tail = Q(
    (s, dir) => {
      graft.functions.Spatial.registerAll(s)
      T(s, dir, "nation")
        .select(col("n_nationkey"),
          expr("CAST(4 + n_nationkey % 3 AS INT)").as("s"),
          expr("CAST(1 + n_nationkey % 3 AS INT)").as("k"))
        .withColumn("poly", expr(
          """st_geomfromtext(concat('POLYGON ((0 0, ', s, ' 0, ', s, ' ', s,
             ', 0 ', s, ', 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))'))"""))
        .select(col("n_nationkey"),
          expr("st_geom_area(poly)").as("area"),
          expr("st_perimeter(poly)").as("perim"),
          expr("st_npoints(poly)").as("npts"),
          round(expr("st_x(st_centroid(poly))"), 6).as("cen_x"),
          expr("st_intersects(poly, st_geomfromtext('POINT (1.5 1.5)'))").as("in_hole"),
          expr("st_intersects(poly, st_geomfromtext('POINT (1 1.5)'))").as("on_hole_edge"),
          expr("st_intersects(poly, st_geomfromtext('POINT (0.5 0.5)'))").as("in_body"),
          expr("""st_astext(st_convexhull(st_geomfromtext(concat(
            'MULTIPOINT ((0 0), (', s, ' 0), (', s, ' ', s, '), (0 ', s, '), (2 1))'))))""").as("hull"),
          expr("""st_astext(st_simplify(st_geomfromtext(
            'LINESTRING (0 0, 1 0.01, 2 0, 3 0.01, 4 0)'), CAST(0.1 AS DOUBLE)))""").as("simp"),
          expr("st_length(st_geomfromtext(concat('LINESTRING (0 0, ', 3 * k, ' ', 4 * k, ')')))").as("len"))
        .orderBy("n_nationkey")
    },
    Some("""
      WITH n AS (
        SELECT n_nationkey,
               CAST(4 + n_nationkey % 3 AS INT) AS s,
               CAST(1 + n_nationkey % 3 AS INT) AS k
        FROM nation)
      SELECT n_nationkey,
        CAST(s * s - 1 AS DOUBLE) AS area,
        CAST(4 * s + 4 AS DOUBLE) AS perim,
        CAST(10 AS INT) AS npts,
        round((s / 2.0 * s * s - 1.5) / (s * s - 1), 6) AS cen_x,
        FALSE AS in_hole,
        TRUE AS on_hole_edge,
        TRUE AS in_body,
        'POLYGON ((0 0, ' || s || ' 0, ' || s || ' ' || s || ', 0 ' || s || ', 0 0))' AS hull,
        'LINESTRING (0 0, 4 0)' AS simp,
        CAST(5 * k AS DOUBLE) AS len
      FROM n ORDER BY n_nationkey"""))

  val all: Map[String, Q] = Map(
    "q136_spatial_wkt" -> q136_spatial_wkt,
    "q137_spatial_tail" -> q137_spatial_tail)
}
