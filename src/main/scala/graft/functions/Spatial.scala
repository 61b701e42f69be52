package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.DoubleType

/** Minimal planar ST_* pack (ref: runtime/SpatialTypeFunctions.java:1 —
  * the reference ships ~150 JTS-backed functions; this is the
  * representative planar subset from SURVEY.md §7.2, built as pure
  * Catalyst expression rewrites so everything stays inside codegen: a
  * point is a `struct<x double, y double>`, an envelope a
  * `struct<xmin, ymin, xmax, ymax>`). */
object Spatial {

  private def d(e: Expression): Expression = Cast(e, DoubleType)
  private def field(e: Expression, n: String): Expression =
    UnresolvedExtractValue(e, Literal(n))
  private def sq(e: Expression): Expression = Multiply(e, e)

  private def distExpr(a: Expression, b: Expression): Expression =
    Sqrt(Add(
      sq(Subtract(field(a, "x"), field(b, "x"))),
      sq(Subtract(field(a, "y"), field(b, "y")))))

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // ST_Point / ST_X / ST_Y (SpatialTypeFunctions.java ST_Point, ST_X, ST_Y)
    "st_point" -> (a => CreateNamedStruct(Seq(
      Literal("x"), d(a(0)), Literal("y"), d(a(1))))),
    "st_x" -> (a => field(a(0), "x")),
    "st_y" -> (a => field(a(0), "y")),
    // ST_Distance (euclidean planar)
    "st_distance" -> (a => distExpr(a(0), a(1))),
    // ST_DWithin (the rule target of SpatialRules.java Hilbert pushdown)
    "st_dwithin" -> (a => LessThanOrEqual(distExpr(a(0), a(1)), d(a(2)))),
    // ST_MakeEnvelope / ST_Contains(envelope, point)
    "st_makeenvelope" -> (a => CreateNamedStruct(Seq(
      Literal("xmin"), d(a(0)), Literal("ymin"), d(a(1)),
      Literal("xmax"), d(a(2)), Literal("ymax"), d(a(3))))),
    "st_contains" -> (a => {
      val (env, p) = (a(0), a(1))
      Seq(
        GreaterThanOrEqual(field(p, "x"), field(env, "xmin")),
        LessThanOrEqual(field(p, "x"), field(env, "xmax")),
        GreaterThanOrEqual(field(p, "y"), field(env, "ymin")),
        LessThanOrEqual(field(p, "y"), field(env, "ymax"))).reduce(And)
    }))

  def registerAll(spark: SparkSession): Unit = {
    builders.foreach { case (n, b) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(n, b, "scala_udf")
    }
    registerPolygonUdfs(spark)
    registerGeomUdfs(spark)
  }

  // ---- polygon ops (ref: runtime/SpatialTypeFunctions.java ST_Within/
  // ST_Area over JTS; here pure-Scala ray casting + shoelace over an
  // array<struct<x,y>> ring — no geometry library in this container).
  // UDFs, not codegen Expressions: polygon predicates are join/filter
  // seldom-hot compared to the distance ops above, and the ring is an
  // arbitrary-length array.

  /** Ray casting: odd crossings of a rightward ray = inside. Boundary
    * behavior follows the half-open convention (stable for tiling). */
  private[graft] def pointInPolygon(px: Double, py: Double,
      ring: Seq[(Double, Double)]): Boolean = {
    var inside = false
    var i = 0
    val n = ring.length
    while (i < n) {
      val (x1, y1) = ring(i)
      val (x2, y2) = ring((i + 1) % n)
      if ((y1 > py) != (y2 > py)) {
        val xCross = x1 + (py - y1) / (y2 - y1) * (x2 - x1)
        if (px < xCross) inside = !inside
      }
      i += 1
    }
    inside
  }

  /** Shoelace area of a simple ring (absolute value; vertex order
    * agnostic). */
  private[graft] def ringArea(ring: Seq[(Double, Double)]): Double = {
    var s = 0.0
    var i = 0
    val n = ring.length
    while (i < n) {
      val (x1, y1) = ring(i)
      val (x2, y2) = ring((i + 1) % n)
      s += x1 * y2 - x2 * y1
      i += 1
    }
    math.abs(s) / 2.0
  }

  private def registerPolygonUdfs(spark: SparkSession): Unit = {
    import org.apache.spark.sql.Row
    val within = org.apache.spark.sql.functions.udf(
      (p: Row, ring: Seq[Row]) =>
        pointInPolygon(p.getDouble(0), p.getDouble(1),
          ring.map(r => (r.getDouble(0), r.getDouble(1)))))
    val area = org.apache.spark.sql.functions.udf(
      (ring: Seq[Row]) => ringArea(ring.map(r => (r.getDouble(0), r.getDouble(1)))))
    spark.udf.register("st_within_poly", within)
    spark.udf.register("st_area", area)
  }

  // ---- WKT/WKB geometry family ------------------------------------------
  // ref: runtime/SpatialTypeFunctions.java ST_GeomFromText/ST_AsText/
  // ST_Intersects/ST_Buffer/ST_Union/ST_AsWKB/ST_GeomFromWKB (JTS-backed
  // there; pure planar Scala here — no geometry library in the container).
  // Representation: struct<gtype string, ring array<struct<x,y>>> — POINT
  // is a 1-element ring, POLYGON stores its (closed) outer ring as in WKT
  // (holes unsupported, documented deviation). UDFs rather than codegen
  // expressions: these are parse/emit/predicate calls off the hot path
  // (the codegen distance/contains pack above serves the join-heavy ops).

  final case class GPoint(x: Double, y: Double)
  /** POLYGON: `ring` is the (closed) outer ring, `holes` the interior
    * rings (SpatialTypeFunctions' JTS polygons carry both). Other types
    * leave `holes` empty. */
  final case class Geometry(gtype: String, ring: Seq[GPoint], holes: Seq[Seq[GPoint]] = Nil)

  /** JTS WKTWriter-style number: integral doubles print without ".0". */
  private def fmt(v: Double): String =
    if (!v.isInfinite && v == math.floor(v) && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  private[graft] def parseWkt(wkt: String): Geometry = {
    val s = wkt.trim
    val open = s.indexOf('(')
    require(open > 0, s"malformed WKT: $wkt")
    val typ = s.substring(0, open).trim.toUpperCase
    val body = s.substring(open + 1, s.lastIndexOf(')'))
    def pts(inner: String): Seq[GPoint] = inner.split(",").toSeq.map { p =>
      val nums = p.trim.stripPrefix("(").stripSuffix(")").trim.split("\\s+")
      GPoint(nums(0).toDouble, nums(1).toDouble)
    }
    typ match {
      case "POINT" | "LINESTRING" | "MULTIPOINT" => Geometry(typ, pts(body))
      case "POLYGON" =>
        // every parenthesized ring: first is the outer, the rest holes
        val rings = scala.collection.mutable.ArrayBuffer.empty[Seq[GPoint]]
        var a = body.indexOf('(')
        while (a >= 0) {
          val b = body.indexOf(')', a)
          require(b > a, s"malformed POLYGON: $wkt")
          rings += pts(body.substring(a + 1, b))
          a = body.indexOf('(', b)
        }
        require(rings.nonEmpty, s"malformed POLYGON: $wkt")
        Geometry("POLYGON", rings.head, rings.tail.toSeq)
      case other => throw new IllegalArgumentException(s"unsupported WKT type: $other")
    }
  }

  private[graft] def asText(g: Geometry): String = {
    def pt(p: GPoint) = s"${fmt(p.x)} ${fmt(p.y)}"
    g.gtype match {
      case "POINT" => s"POINT (${pt(g.ring.head)})"
      case "LINESTRING" => g.ring.map(pt).mkString("LINESTRING (", ", ", ")")
      case "MULTIPOINT" => g.ring.map(p => s"(${pt(p)})").mkString("MULTIPOINT (", ", ", ")")
      case "POLYGON" =>
        (g.ring +: g.holes).map(_.map(pt).mkString("(", ", ", ")"))
          .mkString("POLYGON (", ", ", ")")
    }
  }

  // -- planar predicates ----------------------------------------------------

  private def orient(a: GPoint, b: GPoint, c: GPoint): Int = {
    val v = (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x)
    if (v > 0) 1 else if (v < 0) -1 else 0
  }
  private def onSeg(a: GPoint, b: GPoint, p: GPoint): Boolean =
    orient(a, b, p) == 0 &&
      p.x >= math.min(a.x, b.x) && p.x <= math.max(a.x, b.x) &&
      p.y >= math.min(a.y, b.y) && p.y <= math.max(a.y, b.y)
  private def segIntersect(a: GPoint, b: GPoint, c: GPoint, d: GPoint): Boolean = {
    val (o1, o2, o3, o4) = (orient(a, b, c), orient(a, b, d), orient(c, d, a), orient(c, d, b))
    (o1 != o2 && o3 != o4) ||
      onSeg(a, b, c) || onSeg(a, b, d) || onSeg(c, d, a) || onSeg(c, d, b)
  }
  private def ringSegments(ring: Seq[GPoint], close: Boolean): Seq[(GPoint, GPoint)] = {
    val r = if (close && ring.length > 1 && ring.head != ring.last) ring :+ ring.head else ring
    if (r.length < 2) Nil else r.zip(r.tail)
  }
  private def segments(g: Geometry): Seq[(GPoint, GPoint)] = {
    val outer = ringSegments(g.ring, g.gtype == "POLYGON")
    if (g.gtype == "POLYGON") outer ++ g.holes.flatMap(ringSegments(_, close = true))
    else outer
  }
  private def inPolygon(p: GPoint, poly: Geometry): Boolean = {
    val onBoundary = segments(poly).exists { case (a, b) => onSeg(a, b, p) }
    if (onBoundary) true // any ring's boundary is part of the polygon (JTS)
    else pointInPolygon(p.x, p.y, poly.ring.map(q => (q.x, q.y))) &&
      !poly.holes.exists(h => pointInPolygon(p.x, p.y, h.map(q => (q.x, q.y))))
  }

  /** ST_Intersects over any pair of the supported types (point ∩ point/
    * line/polygon, line ∩ line/polygon, polygon ∩ polygon, multipoint as
    * a disjunction of its members). */
  private[graft] def intersects(a: Geometry, b: Geometry): Boolean = (a.gtype, b.gtype) match {
    case ("MULTIPOINT", _) => a.ring.exists(p => intersects(Geometry("POINT", Seq(p)), b))
    case (_, "MULTIPOINT") => intersects(b, a)
    case ("POINT", "POINT") => a.ring.head == b.ring.head
    case ("POINT", "LINESTRING") =>
      segments(b).exists { case (c, d) => onSeg(c, d, a.ring.head) }
    case ("LINESTRING", "POINT") => intersects(b, a)
    case ("POINT", "POLYGON") => inPolygon(a.ring.head, b)
    case ("POLYGON", "POINT") => intersects(b, a)
    case ("LINESTRING", "LINESTRING") =>
      segments(a).exists { case (p, q) => segments(b).exists { case (c, d) => segIntersect(p, q, c, d) } }
    case ("LINESTRING", "POLYGON") =>
      a.ring.exists(inPolygon(_, b)) ||
        segments(a).exists { case (p, q) => segments(b).exists { case (c, d) => segIntersect(p, q, c, d) } }
    case ("POLYGON", "LINESTRING") => intersects(b, a)
    case ("POLYGON", "POLYGON") =>
      a.ring.exists(inPolygon(_, b)) || b.ring.exists(inPolygon(_, a)) ||
        segments(a).exists { case (p, q) => segments(b).exists { case (c, d) => segIntersect(p, q, c, d) } }
    case _ => false
  }

  /** ST_Buffer of a POINT: regular 32-gon (closed ring), the planar
    * analog of JTS's default 8-quadrant-segment circle approximation.
    * Other input types are unsupported (documented deviation). */
  private[graft] def buffer(g: Geometry, dist: Double): Geometry = {
    require(g.gtype == "POINT", s"ST_Buffer: only POINT supported, got ${g.gtype}")
    val GPoint(cx, cy) = g.ring.head
    val n = 32
    val pts = (0 until n).map { k =>
      val t = 2 * math.Pi * k / n
      GPoint(cx + dist * math.cos(t), cy + dist * math.sin(t))
    }
    Geometry("POLYGON", pts :+ pts.head)
  }

  /** ST_Union of point sets: distinct members ordered by (x, y); a
    * single survivor collapses to POINT (JTS does the same). Polygon/
    * line union needs a clipping kernel — unsupported, error clearly. */
  private[graft] def union(a: Geometry, b: Geometry): Geometry = {
    require(Set("POINT", "MULTIPOINT")(a.gtype) && Set("POINT", "MULTIPOINT")(b.gtype),
      s"ST_Union: point/multipoint only, got ${a.gtype}/${b.gtype}")
    val pts = (a.ring ++ b.ring).distinct.sortBy(p => (p.x, p.y))
    if (pts.length == 1) Geometry("POINT", pts) else Geometry("MULTIPOINT", pts)
  }

  /** ST_Centroid: POINT itself; vertex mean for line/multipoint;
    * area-weighted (shoelace) centroid for polygons. */
  private[graft] def centroid(g: Geometry): Geometry = g.gtype match {
    case "POINT" => g
    case "LINESTRING" | "MULTIPOINT" =>
      val n = g.ring.length
      Geometry("POINT", Seq(GPoint(g.ring.map(_.x).sum / n, g.ring.map(_.y).sum / n)))
    case "POLYGON" =>
      // outer ring minus hole contributions, each by the shoelace form
      val (oa, ox, oy) = ringCentroid(g.ring)
      val hs = g.holes.map(ringCentroid)
      val area = oa - hs.map(_._1).sum
      if (area == 0.0) {
        // Degenerate (collinear / zero-area) ring: the area-weighted form
        // divides by zero. Fall back to the vertex mean, as JTS does for
        // zero-area geometries, instead of emitting NaN coordinates.
        val r = if (g.ring.length > 1 && g.ring.head == g.ring.last) g.ring.dropRight(1) else g.ring
        Geometry("POINT", Seq(GPoint(r.map(_.x).sum / r.length, r.map(_.y).sum / r.length)))
      } else Geometry("POINT", Seq(
        GPoint((ox * oa - hs.map(h => h._2 * h._1).sum) / area,
          (oy * oa - hs.map(h => h._3 * h._1).sum) / area)))
  }

  /** (|area|, cx, cy) of one ring by the shoelace formula. */
  private def ringCentroid(ring0: Seq[GPoint]): (Double, Double, Double) = {
    val r = if (ring0.length > 1 && ring0.head == ring0.last) ring0.dropRight(1) else ring0
    var (sa, sx, sy) = (0.0, 0.0, 0.0)
    var i = 0
    while (i < r.length) {
      val (p, q) = (r(i), r((i + 1) % r.length))
      val c = p.x * q.y - q.x * p.y
      sa += c; sx += (p.x + q.x) * c; sy += (p.y + q.y) * c
      i += 1
    }
    if (sa == 0.0) (0.0, 0.0, 0.0) else (math.abs(sa / 2), sx / (3 * sa), sy / (3 * sa))
  }

  /** ST_Area over the geometry (outer minus holes); 0 for non-areal. */
  private[graft] def geomArea(g: Geometry): Double = g.gtype match {
    case "POLYGON" => ringCentroid(g.ring)._1 - g.holes.map(ringCentroid(_)._1).sum
    case _ => 0.0
  }

  /** ST_ConvexHull: Andrew's monotone chain over every vertex. Output is
    * a closed CCW POLYGON starting at the lexicographically smallest
    * point; 1-2 distinct points degrade to POINT/LINESTRING. */
  private[graft] def convexHull(g: Geometry): Geometry = {
    val pts = (g.ring ++ g.holes.flatten).distinct.sortBy(p => (p.x, p.y))
    if (pts.length == 1) Geometry("POINT", pts)
    else if (pts.length == 2) Geometry("LINESTRING", pts)
    else {
      def chain(ps: Seq[GPoint]): Seq[GPoint] = {
        val h = scala.collection.mutable.ArrayBuffer.empty[GPoint]
        for (p <- ps) {
          while (h.length >= 2 && orient(h(h.length - 2), h(h.length - 1), p) <= 0)
            h.remove(h.length - 1)
          h += p
        }
        h.toSeq
      }
      val lower = chain(pts)
      val upper = chain(pts.reverse)
      val hull = lower.dropRight(1) ++ upper.dropRight(1)
      if (hull.length < 3) Geometry("LINESTRING", Seq(pts.head, pts.last))
      else Geometry("POLYGON", hull :+ hull.head)
    }
  }

  /** ST_Simplify: Douglas–Peucker with tolerance `tol`, endpoint-
    * preserving (JTS DouglasPeuckerSimplifier semantics on lines; the
    * polygon case simplifies each ring, keeping closure). */
  private[graft] def simplify(g: Geometry, tol: Double): Geometry = {
    def perpDist(p: GPoint, a: GPoint, b: GPoint): Double = {
      val (dx, dy) = (b.x - a.x, b.y - a.y)
      val len = math.hypot(dx, dy)
      if (len == 0) math.hypot(p.x - a.x, p.y - a.y)
      else math.abs(dy * p.x - dx * p.y + b.x * a.y - b.y * a.x) / len
    }
    def dp(ps: Seq[GPoint]): Seq[GPoint] =
      if (ps.length < 3) ps
      else {
        val (a, b) = (ps.head, ps.last)
        val (maxD, maxI) = ps.zipWithIndex.drop(1).dropRight(1)
          .map { case (p, i) => (perpDist(p, a, b), i) }
          .maxBy(_._1)
        if (maxD <= tol) Seq(a, b)
        else dp(ps.take(maxI + 1)) ++ dp(ps.drop(maxI)).tail
      }
    g.gtype match {
      case "LINESTRING" => Geometry("LINESTRING", dp(g.ring))
      case "POLYGON" => Geometry("POLYGON", dp(g.ring), g.holes.map(dp))
      case _ => g
    }
  }

  /** ST_Envelope: the axis-aligned bounding box as a closed POLYGON
    * (degenerate for a single point — JTS returns the point itself). */
  private[graft] def envelope(g: Geometry): Geometry = {
    if (g.gtype == "POINT") g
    else {
      val (xs, ys) = (g.ring.map(_.x), g.ring.map(_.y))
      val (x0, x1, y0, y1) = (xs.min, xs.max, ys.min, ys.max)
      Geometry("POLYGON", Seq(
        GPoint(x0, y0), GPoint(x1, y0), GPoint(x1, y1), GPoint(x0, y1), GPoint(x0, y0)))
    }
  }

  /** ST_Length of a LINESTRING (0 for points, per JTS). */
  private[graft] def length(g: Geometry): Double = g.gtype match {
    case "LINESTRING" =>
      g.ring.zip(g.ring.tail).map { case (a, b) => math.hypot(b.x - a.x, b.y - a.y) }.sum
    case _ => 0.0
  }

  /** ST_Perimeter of a POLYGON — outer ring plus interior rings, as
    * JTS sums every ring's boundary (0 for other types). */
  private[graft] def perimeter(g: Geometry): Double = g.gtype match {
    case "POLYGON" =>
      segments(g).map { case (a, b) => math.hypot(b.x - a.x, b.y - a.y) }.sum
    case _ => 0.0
  }

  // -- WKB (OGC, little-endian) ----------------------------------------------

  private def wkbType(t: String): Int = t match {
    case "POINT" => 1
    case "LINESTRING" => 2
    case "POLYGON" => 3
    case "MULTIPOINT" => 4
  }

  private[graft] def toWkb(g: Geometry): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val rings = g.ring +: g.holes
    val size = g.gtype match {
      case "POINT" => 21
      case "LINESTRING" => 9 + 16 * g.ring.length
      case "POLYGON" => 9 + rings.map(r => 4 + 16 * r.length).sum
      case "MULTIPOINT" => 9 + 21 * g.ring.length
    }
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(wkbType(g.gtype))
    g.gtype match {
      case "POINT" => bb.putDouble(g.ring.head.x).putDouble(g.ring.head.y)
      case "LINESTRING" =>
        bb.putInt(g.ring.length)
        g.ring.foreach(p => bb.putDouble(p.x).putDouble(p.y))
      case "POLYGON" =>
        bb.putInt(rings.length)
        rings.foreach { r =>
          bb.putInt(r.length)
          r.foreach(p => bb.putDouble(p.x).putDouble(p.y))
        }
      case "MULTIPOINT" =>
        bb.putInt(g.ring.length)
        g.ring.foreach { p =>
          bb.put(1.toByte).putInt(1).putDouble(p.x).putDouble(p.y)
        }
    }
    bb.array()
  }

  private[graft] def fromWkb(bytes: Array[Byte]): Geometry = {
    import java.nio.{ByteBuffer, ByteOrder}
    def rdr(bb: ByteBuffer): ByteBuffer = {
      val order = if (bb.get() == 1.toByte) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
      bb.order(order)
    }
    val bb = rdr(ByteBuffer.wrap(bytes))
    bb.getInt() match {
      case 1 => Geometry("POINT", Seq(GPoint(bb.getDouble(), bb.getDouble())))
      case 2 =>
        val n = bb.getInt()
        Geometry("LINESTRING", (0 until n).map(_ => GPoint(bb.getDouble(), bb.getDouble())))
      case 3 =>
        val rings = bb.getInt()
        require(rings >= 1, "empty POLYGON WKB")
        def ring(): Seq[GPoint] = {
          val n = bb.getInt()
          (0 until n).map(_ => GPoint(bb.getDouble(), bb.getDouble()))
        }
        val outer = ring()
        Geometry("POLYGON", outer, (1 until rings).map(_ => ring()))
      case 4 =>
        val n = bb.getInt()
        Geometry("MULTIPOINT", (0 until n).map { _ =>
          val sub = rdr(bb)
          require(sub.getInt() == 1, "MULTIPOINT member must be POINT")
          GPoint(sub.getDouble(), sub.getDouble())
        })
      case t => throw new IllegalArgumentException(s"unsupported WKB type $t")
    }
  }

  private def geomOf(r: org.apache.spark.sql.Row): Geometry =
    Geometry(r.getString(0),
      r.getSeq[org.apache.spark.sql.Row](1).map(p => GPoint(p.getDouble(0), p.getDouble(1))),
      if (r.length > 2 && !r.isNullAt(2))
        r.getSeq[scala.collection.Seq[org.apache.spark.sql.Row]](2)
          .map(_.toSeq.map(p => GPoint(p.getDouble(0), p.getDouble(1))))
      else Nil)

  private def registerGeomUdfs(spark: SparkSession): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.udf
    spark.udf.register("st_geomfromtext", udf((wkt: String) => parseWkt(wkt)))
    spark.udf.register("st_astext", udf((g: Row) => asText(geomOf(g))))
    spark.udf.register("st_intersects", udf((a: Row, b: Row) => intersects(geomOf(a), geomOf(b))))
    spark.udf.register("st_buffer", udf((g: Row, d: Double) => buffer(geomOf(g), d)))
    spark.udf.register("st_union", udf((a: Row, b: Row) => union(geomOf(a), geomOf(b))))
    spark.udf.register("st_centroid", udf((g: Row) => centroid(geomOf(g))))
    spark.udf.register("st_npoints",
      udf((g: Row) => { val x = geomOf(g); x.ring.length + x.holes.map(_.length).sum }))
    spark.udf.register("st_aswkb", udf((g: Row) => toWkb(geomOf(g))))
    spark.udf.register("st_geomfromwkb", udf((b: Array[Byte]) => fromWkb(b)))
    spark.udf.register("st_envelope", udf((g: Row) => envelope(geomOf(g))))
    spark.udf.register("st_length", udf((g: Row) => length(geomOf(g))))
    spark.udf.register("st_perimeter", udf((g: Row) => perimeter(geomOf(g))))
    spark.udf.register("st_geom_area", udf((g: Row) => geomArea(geomOf(g))))
    spark.udf.register("st_convexhull", udf((g: Row) => convexHull(geomOf(g))))
    spark.udf.register("st_simplify", udf((g: Row, tol: Double) => simplify(geomOf(g), tol)))
    spark.udf.register("st_x", udf((g: Row) => geomOf(g).ring.head.x))
    spark.udf.register("st_y", udf((g: Row) => geomOf(g).ring.head.y))
  }
}
