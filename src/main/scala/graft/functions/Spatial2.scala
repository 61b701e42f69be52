package graft.functions

import java.util.Locale

import org.apache.spark.sql.SparkSession

/** Rich WKT geometry engine for the reference's spatial function corpus
  * (ref: core/src/main/java/org/apache/calcite/runtime/SpatialTypeFunctions.java,
  * exercised by core/src/test/resources/sql/spatial.iq — JTS-backed
  * there; pure Scala here, no geometry library in this container).
  *
  * Values travel BETWEEN functions as JTS-writer-style WKT strings, so
  * the in-memory model can be arbitrarily rich (Z ordinates,
  * MULTI* / GEOMETRYCOLLECTION nesting) without Spark encoder
  * constraints; each function parses, computes, and re-emits. These are
  * corpus/conformance surfaces — the join-hot spatial ops stay on the
  * codegen struct family in [[Spatial]].
  *
  * Supported types: POINT, LINESTRING, LINEARRING, POLYGON, MULTIPOINT,
  * MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION, each with
  * optional Z and EMPTY forms.
  */
object Spatial2 extends Serializable {

  final case class P(x: Double, y: Double, z: Double = Double.NaN) {
    def hasZ: Boolean = !z.isNaN
    // NaN-tolerant equality: the default case-class equals has
    // NaN != NaN, which breaks ring-closure checks on 2D points carrying
    // the NaN z sentinel
    override def equals(o: Any): Boolean = o match {
      case p: P => java.lang.Double.compare(x, p.x) == 0 &&
        java.lang.Double.compare(y, p.y) == 0 && java.lang.Double.compare(z, p.z) == 0
      case _ => false
    }
    override def hashCode: Int =
      (java.lang.Double.hashCode(x) * 31 + java.lang.Double.hashCode(y)) * 31 +
        java.lang.Double.hashCode(z)
  }

  /** One node type for the whole hierarchy: leaf types fill `rings`
    * (POINT/LINESTRING/LINEARRING use rings.head; POLYGON outer + holes);
    * container types fill `parts`. EMPTY has both Nil. */
  final case class G(gtype: String, rings: Seq[Seq[P]] = Nil, parts: Seq[G] = Nil) {
    def isEmpty: Boolean = rings.isEmpty && parts.isEmpty
    def pts: Seq[P] = rings.headOption.getOrElse(Nil)
    def hasZ: Boolean = rings.exists(_.exists(_.hasZ)) || parts.exists(_.hasZ)
    def allPoints: Seq[P] = rings.flatten ++ parts.flatMap(_.allPoints)
  }

  private val leafTypes = Set("POINT", "LINESTRING", "LINEARRING", "POLYGON",
    "MULTIPOINT", "MULTILINESTRING", "MULTIPOLYGON")

  // ---- WKT parsing ------------------------------------------------------

  /** EWKT prefixes: `SRID=n;` (PostGIS) and `srid:n;` (the reference's
    * ST_AsEWKT spelling) → (srid, bare WKT). */
  def sridOf(wkt: String): (Int, String) = {
    val s = wkt.trim
    val up = s.toUpperCase(Locale.ROOT)
    if ((up.startsWith("SRID=") || up.startsWith("SRID:")) && s.indexOf(';') > 0) {
      val i = s.indexOf(';')
      (s.substring(5, i).trim.toInt, s.substring(i + 1).trim)
    } else (0, s)
  }

  def parseS(wkt: String): (Int, G) = {
    val (srid, body) = sridOf(wkt)
    (srid, parse(body))
  }

  /** Tagged emission: geometry values travel between functions as WKT
    * with an optional `srid:n;` prefix, so constructors taking an
    * explicit SRID round-trip it through ST_SRID / ST_AsEWKT. */
  def emitS(srid: Int, g: G): String =
    if (srid == 0) emit(g) else s"srid:$srid;${emit(g)}"

  def parse(wkt: String): G = {
    val s = sridOf(wkt)._2
    val up = s.toUpperCase(Locale.ROOT)
    val typeEnd = s.indexWhere(c => !c.isLetter)
    val gtype0 = if (typeEnd < 0) up else up.substring(0, typeEnd)
    require(leafTypes.contains(gtype0) || gtype0 == "GEOMETRYCOLLECTION",
      s"unsupported WKT type: $gtype0")
    var rest = if (typeEnd < 0) "" else s.substring(typeEnd).trim
    // dimension token Z / M / ZM
    var dimZ = false
    var dimM = false
    val dimRe = "(?i)^(ZM|Z|M)\\b".r
    dimRe.findFirstIn(rest).foreach { d =>
      dimZ = d.toUpperCase.contains("Z"); dimM = d.toUpperCase.contains("M")
      rest = rest.substring(d.length).trim
    }
    if (rest.toUpperCase(Locale.ROOT).startsWith("EMPTY")) return G(gtype0)
    require(rest.startsWith("("), s"malformed WKT: $wkt")
    val body = rest.substring(1, closeParen(rest, 0))

    def pt(tok: String): P = {
      val ns = tok.trim.split("\\s+").map(_.toDouble)
      if (dimZ && ns.length >= 3) P(ns(0), ns(1), ns(2))
      else if (!dimZ && !dimM && ns.length == 3) P(ns(0), ns(1), ns(2)) // bare 3-coord = Z
      else P(ns(0), ns(1))
    }
    def ptList(inner: String): Seq[P] =
      splitTop(inner).map(t => pt(t.trim.stripPrefix("(").stripSuffix(")")))

    gtype0 match {
      case "POINT" => G("POINT", Seq(Seq(pt(body))))
      case "LINESTRING" | "LINEARRING" => G(gtype0, Seq(ptList(body)))
      case "MULTIPOINT" => G("MULTIPOINT", Seq(ptList(body)))
      case "POLYGON" =>
        G("POLYGON", splitTop(body).map(r => ptList(strip1(r))))
      case "MULTILINESTRING" =>
        G("MULTILINESTRING", parts = splitTop(body).map(r =>
          G("LINESTRING", Seq(ptList(strip1(r))))))
      case "MULTIPOLYGON" =>
        G("MULTIPOLYGON", parts = splitTop(body).map { poly =>
          val b = strip1(poly)
          G("POLYGON", splitTop(b).map(r => ptList(strip1(r))))
        })
      case "GEOMETRYCOLLECTION" =>
        G("GEOMETRYCOLLECTION", parts = splitTop(body).map(g => parse(g.trim)))
    }
  }

  private def strip1(s: String): String = {
    val t = s.trim
    require(t.startsWith("(") && t.endsWith(")"), s"expected parenthesized ring: $s")
    t.substring(1, t.length - 1)
  }

  private def closeParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      if (s.charAt(i) == '(') depth += 1
      else if (s.charAt(i) == ')') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    -1
  }

  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var last = 0
    for (i <- s.indices) s.charAt(i) match {
      case '(' => depth += 1
      case ')' => depth -= 1
      case ',' if depth == 0 => out += s.substring(last, i); last = i + 1
      case _ =>
    }
    out += s.substring(last)
    out.toSeq
  }

  // ---- WKT emission (JTS WKTWriter conventions) -------------------------

  /** JTS WKTWriter ordinate format: up to 16 fraction digits, half-even
    * rounding, no grouping/scientific notation. */
  private def fmt(v: Double): String =
    if (!v.isInfinite && v == math.floor(v) && math.abs(v) < 1e15) v.toLong.toString
    else {
      val sym = new java.text.DecimalFormatSymbols(java.util.Locale.ROOT)
      new java.text.DecimalFormat("0.################", sym).format(v)
    }

  def emit(g: G): String = {
    // Z-tag only a uniformly-3D geometry: a mixed-dimension input (some
    // points without z) collapses to 2D, mirroring the reference's
    // AddZTransformer null-coordinate path (spatial.iq:1944 — the z of a
    // mixed multipoint is NaN, never a fabricated 0)
    val z = { val ps = g.allPoints; ps.nonEmpty && ps.forall(_.hasZ) }
    // JTS: 2D renders "TYPE (..." with a space; Z renders "TYPE Z(..."
    def tag(t: String) = if (z) s"$t Z" else s"$t "
    def pt(p: P) = if (z) s"${fmt(p.x)} ${fmt(p.y)} ${fmt(if (p.hasZ) p.z else 0.0)}"
      else s"${fmt(p.x)} ${fmt(p.y)}"
    def ring(ps: Seq[P]) = ps.map(pt).mkString("(", ", ", ")")
    if (g.isEmpty) return s"${g.gtype} EMPTY"
    g.gtype match {
      case "POINT" => s"${tag("POINT")}(${pt(g.pts.head)})"
      case "LINESTRING" => s"${tag("LINESTRING")}${ring(g.pts)}"
      case "LINEARRING" => s"${tag("LINEARRING")}${ring(g.pts)}"
      case "MULTIPOINT" =>
        s"${tag("MULTIPOINT")}${g.pts.map(p => s"(${pt(p)})").mkString("(", ", ", ")")}"
      case "POLYGON" => s"${tag("POLYGON")}${g.rings.map(ring).mkString("(", ", ", ")")}"
      case "MULTILINESTRING" =>
        s"${tag("MULTILINESTRING")}${g.parts.map(p => ring(p.pts)).mkString("(", ", ", ")")}"
      case "MULTIPOLYGON" =>
        s"${tag("MULTIPOLYGON")}${g.parts.map(p => p.rings.map(ring).mkString("(", ", ", ")")).mkString("(", ", ", ")")}"
      case "GEOMETRYCOLLECTION" =>
        s"${tag("GEOMETRYCOLLECTION")}${g.parts.map(emit).mkString("(", ", ", ")")}"
    }
  }

  // ---- derived quantities ----------------------------------------------

  private def dist(a: P, b: P): Double = math.hypot(a.x - b.x, a.y - b.y)

  private def ringLength(ps: Seq[P]): Double =
    ps.sliding(2).collect { case Seq(a, b) => dist(a, b) }.sum

  private def ringAreaSigned(ring: Seq[P]): Double = {
    val r = if (ring.nonEmpty && ring.head == ring.last) ring else ring ++ ring.headOption
    r.sliding(2).collect { case Seq(a, b) => a.x * b.y - b.x * a.y }.sum / 2
  }

  def area(g: G): Double = g.gtype match {
    case "POLYGON" =>
      math.abs(ringAreaSigned(g.rings.head)) - g.rings.tail.map(r => math.abs(ringAreaSigned(r))).sum
    case "MULTIPOLYGON" | "GEOMETRYCOLLECTION" => g.parts.map(area).sum
    case _ => 0.0
  }

  def length(g: G): Double = g.gtype match {
    case "LINESTRING" | "LINEARRING" => ringLength(g.pts)
    case "POLYGON" => g.rings.map(ringLength).sum // JTS getLength = perimeter
    case "MULTILINESTRING" | "MULTIPOLYGON" | "GEOMETRYCOLLECTION" => g.parts.map(length).sum
    case _ => 0.0
  }

  def perimeter(g: G): Double = g.gtype match {
    case "POLYGON" => g.rings.map(ringLength).sum
    case "MULTIPOLYGON" | "GEOMETRYCOLLECTION" => g.parts.map(perimeter).sum
    case _ => 0.0
  }

  /** JTS Centroid, arithmetic-order-exact (the corpus compares WKT
    * strings verbatim): area accumulation uses triangles against a base
    * point (first shell vertex), signs follow ring orientation, and the
    * highest present dimension wins (a GEOMETRYCOLLECTION's lines and
    * points are ignored when any polygon has area). */
  def centroid(g: G): G = {
    var areasum2, cg3x, cg3y = 0.0
    var lineLen, linex, liney = 0.0
    var ptCount = 0
    var ptx, pty = 0.0
    var base: P = null
    def addRing(ring0: Seq[P], positiveIfCw: Boolean): Unit = {
      val ring = if (ring0.head == ring0.last) ring0 else ring0 :+ ring0.head
      val ccw = ringAreaSigned(ring) > 0
      val positive = if (positiveIfCw) !ccw else ccw
      val sign = if (positive) 1.0 else -1.0
      ring.sliding(2).foreach { case Seq(a, b) =>
        val area2 = (a.x - base.x) * (b.y - base.y) - (b.x - base.x) * (a.y - base.y)
        areasum2 += sign * area2
        cg3x += sign * area2 * (base.x + a.x + b.x)
        cg3y += sign * area2 * (base.y + a.y + b.y)
      case _ => () }
    }
    def addLine(ps: Seq[P]): Unit =
      ps.sliding(2).foreach { case Seq(a, b) =>
        val l = dist(a, b); lineLen += l
        linex += (a.x + b.x) / 2 * l; liney += (a.y + b.y) / 2 * l
      case _ => () }
    def visit(x: G): Unit = x.gtype match {
      case "POLYGON" =>
        if (base == null) base = x.rings.head.head
        addRing(x.rings.head, positiveIfCw = true)
        x.rings.tail.foreach(addRing(_, positiveIfCw = false))
      case "LINESTRING" | "LINEARRING" => addLine(x.pts)
      case "POINT" => ptCount += 1; ptx += x.pts.head.x; pty += x.pts.head.y
      case "MULTIPOINT" => x.pts.foreach { p => ptCount += 1; ptx += p.x; pty += p.y }
      case _ => x.parts.foreach(visit)
    }
    visit(g)
    val p =
      if (areasum2 != 0) P(cg3x / 3 / areasum2, cg3y / 3 / areasum2)
      else if (lineLen > 0) P(linex / lineLen, liney / lineLen)
      else if (ptCount > 0) P(ptx / ptCount, pty / ptCount)
      else return G("POINT")
    G("POINT", Seq(Seq(p)))
  }

  def envelope(g: G): G = {
    val ps = g.allPoints
    val (x0, x1) = (ps.map(_.x).min, ps.map(_.x).max)
    val (y0, y1) = (ps.map(_.y).min, ps.map(_.y).max)
    if (x0 == x1 && y0 == y1) G("POINT", Seq(Seq(P(x0, y0))))
    else if (x0 == x1 || y0 == y1) G("LINESTRING", Seq(Seq(P(x0, y0), P(x1, y1))))
    // JTS envelope ring: min corner, up, across, down (CW)
    else G("POLYGON", Seq(Seq(P(x0, y0), P(x0, y1), P(x1, y1), P(x1, y0), P(x0, y0))))
  }

  def boundary(g: G): G = g.gtype match {
    case "POINT" | "MULTIPOINT" => G("GEOMETRYCOLLECTION")
    case "LINESTRING" =>
      if (g.pts.head == g.pts.last) G("MULTIPOINT")
      else G("MULTIPOINT", Seq(Seq(g.pts.head, g.pts.last)))
    case "LINEARRING" => G("MULTIPOINT")
    case "POLYGON" =>
      if (g.rings.length == 1) G("LINEARRING", g.rings)
      else G("MULTILINESTRING", parts = g.rings.map(r => G("LINESTRING", Seq(r))))
    case "MULTILINESTRING" =>
      // endpoints appearing an odd number of times (mod-2 rule)
      val ends = g.parts.flatMap(p => Seq(p.pts.head, p.pts.last))
      val odd = ends.groupBy(identity).filter(_._2.size % 2 == 1).keys.toSeq
        .sortBy(p => (p.x, p.y))
      G("MULTIPOINT", Seq(odd))
    case "MULTIPOLYGON" =>
      G("MULTILINESTRING", parts = g.parts.flatMap(_.rings.map(r => G("LINESTRING", Seq(r)))))
    case other => throw new IllegalArgumentException(s"ST_Boundary: $other")
  }

  def distance(a: G, b: G): Double = {
    // min distance over segment/point decomposition (planar)
    def segs(g: G): Seq[(P, P)] =
      g.rings.flatMap(r => r.sliding(2).collect { case Seq(p, q) => (p, q) }.toSeq) ++
        g.parts.flatMap(segs)
    def ptSeg(p: P, s: (P, P)): Double = {
      val (a0, b0) = s
      val (dx, dy) = (b0.x - a0.x, b0.y - a0.y)
      val l2 = dx * dx + dy * dy
      if (l2 == 0) dist(p, a0)
      else {
        val t = math.max(0, math.min(1, ((p.x - a0.x) * dx + (p.y - a0.y) * dy) / l2))
        math.hypot(p.x - (a0.x + t * dx), p.y - (a0.y + t * dy))
      }
    }
    if (contains(a, b) || contains(b, a)) return 0.0
    val (sa, sb) = (segs(a), segs(b))
    val pa = a.allPoints
    val pb = b.allPoints
    val d1 = if (sb.nonEmpty) pa.flatMap(p => sb.map(s => ptSeg(p, s))) else Nil
    val d2 = if (sa.nonEmpty) pb.flatMap(p => sa.map(s => ptSeg(p, s))) else Nil
    val d3 = for (p <- pa; q <- pb) yield dist(p, q)
    (d1 ++ d2 ++ d3).min
  }

  /** Point-in-polygon with holes (ray casting; boundary counts as in). */
  private def inPoly(p: P, poly: G): Boolean = {
    def inRing(ring: Seq[P]): Boolean = {
      val r = if (ring.head == ring.last) ring.dropRight(1) else ring
      var in = false
      var j = r.length - 1
      for (i <- r.indices) {
        val (pi, pj) = (r(i), r(j))
        if ((pi.y > p.y) != (pj.y > p.y) &&
          p.x < (pj.x - pi.x) * (p.y - pi.y) / (pj.y - pi.y) + pi.x) in = !in
        j = i
      }
      in
    }
    def onRing(ring: Seq[P]): Boolean =
      ring.sliding(2).exists { case Seq(a, b) =>
        val cross = (b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x)
        math.abs(cross) < 1e-12 &&
          p.x >= math.min(a.x, b.x) - 1e-12 && p.x <= math.max(a.x, b.x) + 1e-12 &&
          p.y >= math.min(a.y, b.y) - 1e-12 && p.y <= math.max(a.y, b.y) + 1e-12
      }
    if (poly.rings.exists(onRing)) true
    else inRing(poly.rings.head) && !poly.rings.tail.exists(inRing)
  }

  def contains(a: G, b: G): Boolean =
    // every geometry contains itself (JTS); the general cases below
    // can't see that via vertex sampling (a polygon's own vertices all
    // sit on its boundary, which alone would fail the interior witness)
    if (a == b) !a.isEmpty
    else (a.gtype, b.gtype) match {
      case ("POLYGON", _) =>
        // Contains needs b inside the closure AND an interior witness:
        // a ring lying entirely on a's boundary is NOT contained
        // (spatial.iq:1306 acontainsba = false). Witness candidates are
        // b's vertices and segment midpoints.
        val ps = b.allPoints
        val mids = segsOfG(b).map(s => P((s._1.x + s._2.x) / 2, (s._1.y + s._2.y) / 2))
        ps.forall(p => inPoly(p, a)) &&
          (ps ++ mids).exists(p => inPoly(p, a) && !onBoundary(a, p))
      case ("MULTIPOLYGON", _) =>
        val ps = b.allPoints
        val mids = segsOfG(b).map(s => P((s._1.x + s._2.x) / 2, (s._1.y + s._2.y) / 2))
        ps.forall(p => a.parts.exists(poly => inPoly(p, poly))) &&
          (ps ++ mids).exists(p => a.parts.exists(poly => inPoly(p, poly) && !onBoundary(poly, p)))
      case ("POINT", "POINT") => a.pts.head.x == b.pts.head.x && a.pts.head.y == b.pts.head.y
      case _ => false
    }

  def intersects(a: G, b: G): Boolean = {
    def segList(g: G): Seq[(P, P)] =
      g.rings.flatMap(_.sliding(2).collect { case Seq(p, q) => (p, q) }.toSeq) ++
        g.parts.flatMap(segList)
    def orient(o: P, p: P, q: P): Int = {
      val v = (p.x - o.x) * (q.y - o.y) - (p.y - o.y) * (q.x - o.x)
      if (math.abs(v) < 1e-12) 0 else if (v > 0) 1 else -1
    }
    def onSeg(p: P, q: P, r: P): Boolean =
      math.min(p.x, q.x) - 1e-12 <= r.x && r.x <= math.max(p.x, q.x) + 1e-12 &&
        math.min(p.y, q.y) - 1e-12 <= r.y && r.y <= math.max(p.y, q.y) + 1e-12
    def segInt(s1: (P, P), s2: (P, P)): Boolean = {
      val (p1, q1) = s1; val (p2, q2) = s2
      val (o1, o2, o3, o4) =
        (orient(p1, q1, p2), orient(p1, q1, q2), orient(p2, q2, p1), orient(p2, q2, q1))
      (o1 != o2 && o3 != o4) ||
        (o1 == 0 && onSeg(p1, q1, p2)) || (o2 == 0 && onSeg(p1, q1, q2)) ||
        (o3 == 0 && onSeg(p2, q2, p1)) || (o4 == 0 && onSeg(p2, q2, q1))
    }
    if (a.allPoints.exists(p => containsPoint(b, p)) ||
      b.allPoints.exists(p => containsPoint(a, p))) true
    else segList(a).exists(s1 => segList(b).exists(s2 => segInt(s1, s2)))
  }

  private def containsPoint(g: G, p: P): Boolean = g.gtype match {
    case "POLYGON" => inPoly(p, g)
    case "MULTIPOLYGON" | "GEOMETRYCOLLECTION" => g.parts.exists(containsPoint(_, p))
    case "POINT" => g.pts.head.x == p.x && g.pts.head.y == p.y
    case _ => false
  }

  // ---- transforms -------------------------------------------------------

  def mapPoints(g: G)(f: P => P): G =
    G(g.gtype, g.rings.map(_.map(f)), g.parts.map(mapPoints(_)(f)))

  /** Snap ordinates to a grid. Multiplication back by the grid runs in
    * BigDecimal on the grid's DECIMAL literal so 14 * 0.1 prints 1.4,
    * not 1.4000000000000001 (JTS reduces on a decimal PrecisionModel). */
  def reducePrecision(g: G, grid: Double): G = {
    val gbd = BigDecimal(grid.toString)
    def red(v: Double): Double = (BigDecimal(math.rint(v / grid).toLong) * gbd).toDouble
    mapPoints(g)(p => P(red(p.x), red(p.y), if (p.hasZ) p.z else Double.NaN))
  }

  /** ST_PrecisionReducer(geom, d): round to d decimal digits (JTS
    * PrecisionModel.makePrecise: Math.round(v*scale)/scale). */
  def precisionReducer(g: G, digits: Int): G = {
    val scale = math.pow(10, digits)
    def red(v: Double): Double = math.floor(v * scale + 0.5d) / scale
    mapPoints(g)(p => P(red(p.x), red(p.y), if (p.hasZ) p.z else Double.NaN))
  }

  /** ref: RemoveRepeatedPointsTransformer.java:44 — keep a point when it
    * is beyond the tolerance of the LAST KEPT point; afterwards, if the
    * final input point fell within tolerance, it replaces the last kept
    * point (so the line still ends where it ended). */
  def removeRepeated(g: G, tol: Double): G = {
    def dedup(ps: Seq[P]): Seq[P] = {
      val out = scala.collection.mutable.ArrayBuffer(ps.head)
      var prev = ps.head
      for (p <- ps.tail if dist(p, prev) > tol) { out += p; prev = p }
      if (dist(ps.last, prev) <= tol) out(out.length - 1) = ps.last
      out.toSeq
    }
    g.gtype match {
      case "POINT" => g
      case _ => G(g.gtype, g.rings.map(dedup), g.parts.map(removeRepeated(_, tol)))
    }
  }

  def densify(g: G, tol: Double): G = {
    def densifyLine(ps: Seq[P]): Seq[P] =
      if (ps.length < 2) ps
      else ps.sliding(2).flatMap { case Seq(a, b) =>
        val n = math.max(1, math.ceil(dist(a, b) / tol).toInt)
        (0 until n).map(i => P(a.x + (b.x - a.x) * i / n, a.y + (b.y - a.y) * i / n))
      case _ => Nil }.toSeq ++ ps.lastOption
    G(g.gtype, g.rings.map(densifyLine), g.parts.map(densify(_, tol)))
  }

  // ---- encodings --------------------------------------------------------

  private def wkbTypeCode(t: String): Int = t match {
    case "POINT" => 1
    case "LINESTRING" | "LINEARRING" => 2
    case "POLYGON" => 3
    case "MULTIPOINT" => 4
    case "MULTILINESTRING" => 5
    case "MULTIPOLYGON" => 6
    case "GEOMETRYCOLLECTION" => 7
  }

  /** JTS WKBWriter default: big-endian (XDR), hex lowercase. */
  def toWkbHex(g: G): String = {
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    def writeGeom(g: G): Unit = {
      d.writeByte(0) // XDR
      d.writeInt(wkbTypeCode(g.gtype))
      g.gtype match {
        case "POINT" => d.writeDouble(g.pts.head.x); d.writeDouble(g.pts.head.y)
        case "LINESTRING" | "LINEARRING" =>
          d.writeInt(g.pts.length)
          g.pts.foreach(p => { d.writeDouble(p.x); d.writeDouble(p.y) })
        case "POLYGON" =>
          d.writeInt(g.rings.length)
          g.rings.foreach { r =>
            d.writeInt(r.length)
            r.foreach(p => { d.writeDouble(p.x); d.writeDouble(p.y) })
          }
        case "MULTIPOINT" =>
          d.writeInt(g.pts.length)
          g.pts.foreach(p => writeGeom(G("POINT", Seq(Seq(p)))))
        case "MULTILINESTRING" | "MULTIPOLYGON" | "GEOMETRYCOLLECTION" =>
          d.writeInt(g.parts.length)
          g.parts.foreach(writeGeom)
      }
    }
    writeGeom(g)
    out.toByteArray.map("%02x".format(_)).mkString
  }

  def fromWkbHex(hex: String): G = {
    val bytes = hex.trim.sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray
    val bb = java.nio.ByteBuffer.wrap(bytes)
    def readGeom(): G = {
      val order = if (bb.get() == 0) java.nio.ByteOrder.BIG_ENDIAN else java.nio.ByteOrder.LITTLE_ENDIAN
      bb.order(order)
      bb.getInt() match {
        case 1 => G("POINT", Seq(Seq(P(bb.getDouble(), bb.getDouble()))))
        case 2 =>
          val n = bb.getInt()
          G("LINESTRING", Seq((0 until n).map(_ => P(bb.getDouble(), bb.getDouble()))))
        case 3 =>
          val nr = bb.getInt()
          G("POLYGON", (0 until nr).map { _ =>
            val n = bb.getInt()
            (0 until n).map(_ => P(bb.getDouble(), bb.getDouble()))
          })
        case 4 =>
          val n = bb.getInt()
          G("MULTIPOINT", Seq((0 until n).map { _ => readGeom().pts.head }))
        case 5 =>
          val n = bb.getInt()
          G("MULTILINESTRING", parts = (0 until n).map(_ => readGeom()))
        case 6 =>
          val n = bb.getInt()
          G("MULTIPOLYGON", parts = (0 until n).map(_ => readGeom()))
        case 7 =>
          val n = bb.getInt()
          G("GEOMETRYCOLLECTION", parts = (0 until n).map(_ => readGeom()))
        case t => throw new IllegalArgumentException(s"WKB type $t")
      }
    }
    readGeom()
  }

  private def fmtJson(v: Double): String =
    if (v == math.floor(v) && math.abs(v) < 1e15) v.toLong.toString else v.toString

  def toGeoJson(g: G): String = {
    def coords(ps: Seq[P]) = ps.map(p => s"[${fmtJson(p.x)},${fmtJson(p.y)}]").mkString("[", ",", "]")
    val (ty, cs) = g.gtype match {
      case "POINT" => ("Point", s"[${fmtJson(g.pts.head.x)},${fmtJson(g.pts.head.y)}]")
      case "LINESTRING" | "LINEARRING" => ("LineString", coords(g.pts))
      case "MULTIPOINT" => ("MultiPoint", coords(g.pts))
      case "POLYGON" => ("Polygon", g.rings.map(coords).mkString("[", ",", "]"))
      case "MULTILINESTRING" => ("MultiLineString", g.parts.map(p => coords(p.pts)).mkString("[", ",", "]"))
      case "MULTIPOLYGON" =>
        ("MultiPolygon", g.parts.map(p => p.rings.map(coords).mkString("[", ",", "]")).mkString("[", ",", "]"))
      case other => throw new IllegalArgumentException(s"GeoJSON: $other")
    }
    s"""{"type":"$ty","coordinates":$cs,"crs":{"type":"name","properties":{"name":"EPSG:0"}}}"""
  }

  def toGml(g: G): String = {
    def cs(ps: Seq[P]) = ps.map(p => s"${p.x},${p.y} ").mkString
    g.gtype match {
      case "POINT" => s"<gml:Point><gml:coordinates>${cs(g.pts)}</gml:coordinates></gml:Point>"
      case "LINESTRING" =>
        s"<gml:LineString><gml:coordinates>${cs(g.pts)}</gml:coordinates></gml:LineString>"
      case "POLYGON" =>
        val outer = s"<gml:outerBoundaryIs><gml:LinearRing><gml:coordinates>${cs(g.rings.head)}</gml:coordinates></gml:LinearRing></gml:outerBoundaryIs>"
        val inner = g.rings.tail.map(r =>
          s"<gml:innerBoundaryIs><gml:LinearRing><gml:coordinates>${cs(r)}</gml:coordinates></gml:LinearRing></gml:innerBoundaryIs>").mkString
        s"<gml:Polygon>$outer$inner</gml:Polygon>"
      case other => throw new IllegalArgumentException(s"GML: $other")
    }
  }

  // ---- conformance-corpus algorithms -----------------------------------
  // (ref: runtime/SpatialTypeFunctions.java — JTS-backed there; pure
  // planar Scala here, arithmetic mirrored where the corpus compares
  // emitted WKT verbatim)

  /** All coordinates in geometry order (JTS Geometry.getCoordinates). */
  private def coords(g: G): Seq[P] =
    if (g.parts.nonEmpty) g.parts.flatMap(coords) else g.rings.flatten

  /** Calcite ST_PointN: 0-based modular index over ALL coordinates. */
  def pointN(g: G, n: Int): G = {
    val cs = coords(g)
    val i = ((cs.length + n % cs.length) % cs.length)
    G("POINT", Seq(Seq(P(cs(i).x, cs(i).y, cs(i).z))))
  }

  def zValues(g: G): Seq[Double] = coords(g).filter(_.hasZ).map(_.z)

  /** JTS Geometry.isRectangle. */
  def isRectangle(g: G): Boolean = {
    if (g.gtype != "POLYGON" || g.rings.length != 1) return false
    val r = g.rings.head
    if (r.length != 5) return false
    val env = (r.map(_.x).min, r.map(_.x).max, r.map(_.y).min, r.map(_.y).max)
    r.take(4).forall(p => (p.x == env._1 || p.x == env._2) && (p.y == env._3 || p.y == env._4)) &&
      r.sliding(2).forall { case Seq(a, b) => a.x == b.x || a.y == b.y case _ => true }
  }

  /** JTS InteriorPoint (simplified): polygons take the midpoint of the
    * widest horizontal chord at the bisector of the y-extent; lines and
    * point sets take the vertex nearest the centroid. */
  def pointOnSurface(g: G): G = g.gtype match {
    case "POINT" => g
    case "POLYGON" | "MULTIPOLYGON" =>
      val polys = if (g.gtype == "POLYGON") Seq(g) else g.parts
      val ys = g.allPoints.map(_.y)
      val midY = (ys.min + ys.max) / 2
      // x-crossings of every ring with the bisector line
      val xs = polys.flatMap(_.rings).flatMap { ring =>
        val r = if (ring.head == ring.last) ring else ring :+ ring.head
        r.sliding(2).flatMap { case Seq(a, b) =>
          if ((a.y > midY) != (b.y > midY))
            Some(a.x + (b.x - a.x) * (midY - a.y) / (b.y - a.y))
          else None
        case _ => None }
      }.sorted
      val best = xs.grouped(2).collect { case Seq(x0, x1) => (x1 - x0, (x0 + x1) / 2) }
        .foldLeft((-1.0, 0.0)) { (acc, c) => if (c._1 > acc._1) c else acc }
      G("POINT", Seq(Seq(P(best._2, midY))))
    case _ =>
      val c = centroid(g).pts.head
      val v = g.allPoints.minBy(p => dist(p, c))
      G("POINT", Seq(Seq(P(v.x, v.y))))
  }

  /** Proper self-intersection test over all segments (JTS isSimple);
    * collections test each member independently. */
  def isSimple(g: G): Boolean = if (g.gtype == "GEOMETRYCOLLECTION")
    g.parts.forall(isSimple)
  else {
    def segsOf(x: G): Seq[(P, P)] =
      x.rings.flatMap(_.sliding(2).collect { case Seq(p, q) => (p, q) }.toSeq) ++
        x.parts.flatMap(segsOf)
    val ss = segsOf(g).toIndexedSeq
    def interOpen(s1: (P, P), s2: (P, P)): Boolean = {
      def orient(o: P, p: P, q: P): Double =
        (p.x - o.x) * (q.y - o.y) - (p.y - o.y) * (q.x - o.x)
      val (p1, q1) = s1; val (p2, q2) = s2
      val (o1, o2) = (orient(p1, q1, p2), orient(p1, q1, q2))
      val (o3, o4) = (orient(p2, q2, p1), orient(p2, q2, q1))
      o1 * o2 < 0 && o3 * o4 < 0
    }
    def shared(s1: (P, P), s2: (P, P)): Boolean =
      s1._1 == s2._1 || s1._1 == s2._2 || s1._2 == s2._1 || s1._2 == s2._2
    !ss.indices.exists(i => (i + 1 until ss.length).exists { j =>
      val crossing = interOpen(ss(i), ss(j))
      crossing && !(j == i + 1 && shared(ss(i), ss(j)))
    })
  }

  /** Polygon validity: rings simple + closed (bowties invalid). */
  def isValid(g: G): Boolean = g.gtype match {
    case "POLYGON" | "MULTIPOLYGON" =>
      val polys = if (g.gtype == "POLYGON") Seq(g) else g.parts
      polys.forall(_.rings.forall { r =>
        r.head == r.last && isSimple(G("LINESTRING", Seq(r)))
      })
    case _ => isSimple(g)
  }

  def toMultiLine(g: G): G = {
    def lines(x: G): Seq[G] = x.gtype match {
      case "LINESTRING" | "LINEARRING" => Seq(G("LINESTRING", Seq(x.pts.map(p => P(p.x, p.y)))))
      case "POLYGON" => x.rings.map(r => G("LINESTRING", Seq(r.map(p => P(p.x, p.y)))))
      case _ => x.parts.flatMap(lines)
    }
    G("MULTILINESTRING", parts = lines(g))
  }

  def makePolygon(shell: G, holes: Seq[G]): G =
    G("POLYGON", shell.pts +: holes.map(_.pts))

  /** JTS GeometricShapeFactory.createEllipse (default 100 points CCW
    * from angle 0). */
  def makeEllipse(centre: P, width: Double, height: Double): G = {
    val (xr, yr) = (width / 2.0, height / 2.0)
    val n = 100
    val pts = (0 until n).map { i =>
      val ang = i * (2 * math.Pi / n)
      P(xr * math.cos(ang) + centre.x, yr * math.sin(ang) + centre.y)
    }
    G("POLYGON", Seq(pts :+ pts.head))
  }

  /** JTS OctagonalEnvelope: bounds on x, y, x+y, x-y; vertex order as
    * OctagonalEnvelope.toGeometry emits it. */
  def octagonalEnvelope(g: G): G = {
    val ps = g.allPoints
    val (minX, maxX) = (ps.map(_.x).min, ps.map(_.x).max)
    val (minY, maxY) = (ps.map(_.y).min, ps.map(_.y).max)
    val (minA, maxA) = (ps.map(p => p.x + p.y).min, ps.map(p => p.x + p.y).max)
    val (minB, maxB) = (ps.map(p => p.x - p.y).min, ps.map(p => p.x - p.y).max)
    val raw = Seq(
      P(minX, minA - minX), P(minX, minX - minB), P(maxY + minB, maxY),
      P(maxA - maxY, maxY), P(maxX, maxA - maxX), P(maxX, maxX - maxB),
      P(minY + maxB, minY), P(minA - minY, minY))
    val dedup = raw.foldLeft(Vector.empty[P]) { (acc, p) => if (acc.nonEmpty && acc.last == p) acc else acc :+ p }
    G("POLYGON", Seq(dedup :+ dedup.head))
  }

  /** Convex-hull ring (open, CCW, starting at the min vertex). */
  private def hullRing(g: G): Seq[P] = {
    val h = convexHull(g)
    h.gtype match {
      case "POINT" | "LINESTRING" => h.pts
      case _ => h.rings.head.dropRight(1) // already JTS-ordered (CW)
    }
  }

  private def perpDist(p: P, a: P, b: P): Double = {
    val l = dist(a, b)
    if (l == 0) dist(p, a)
    else math.abs((b.x - a.x) * (a.y - p.y) - (a.x - p.x) * (b.y - a.y)) / l
  }

  private def projectOnLine(p: P, a: P, b: P): P = {
    val (dx, dy) = (b.x - a.x, b.y - a.y)
    val l2 = dx * dx + dy * dy
    val t = ((p.x - a.x) * dx + (p.y - a.y) * dy) / l2
    P(a.x + t * dx, a.y + t * dy)
  }

  /** JTS MinimumDiameter.getDiameter: LINESTRING(projection of the
    * farthest vertex onto the min-width hull edge, that vertex). */
  def minimumDiameter(g: G): G = {
    val hull = hullRing(g)
    if (hull.length == 1) return G("LINESTRING", Seq(Seq(hull.head, hull.head)))
    if (hull.length == 2) return G("LINESTRING", Seq(hull))
    val ring = hull :+ hull.head
    var best: (Double, (P, P), P) = null
    ring.sliding(2).foreach { case Seq(a, b) =>
      val far = hull.maxBy(p => perpDist(p, a, b))
      val w = perpDist(far, a, b)
      if (best == null || w < best._1) best = (w, (a, b), far)
    case _ => () }
    val (_, (a, b), far) = best
    G("LINESTRING", Seq(Seq(projectOnLine(far, a, b), far)))
  }

  /** JTS MinimumDiameter.getMinimumRectangle (same line/corner
    * arithmetic so emitted float noise matches). */
  def minimumRectangle(g: G): G = {
    val hull = hullRing(g)
    if (hull.length == 1) return G("POINT", Seq(Seq(hull.head)))
    if (hull.length == 2) return G("LINESTRING", Seq(hull.sortBy(p => (p.x, p.y))))
    val ring = hull :+ hull.head
    var best: (Double, (P, P)) = null
    ring.sliding(2).foreach { case Seq(a, b) =>
      val w = hull.map(p => perpDist(p, a, b)).max
      if (best == null || w < best._1) best = (w, (a, b))
    case _ => () }
    val (a, b) = best._2
    val (dx, dy) = (b.x - a.x, b.y - a.y)
    def computeC(cA: Double, cB: Double, p: P): Double = cA * p.y - cB * p.x
    val paras = hull.map(p => computeC(dx, dy, p))
    val perps = hull.map(p => computeC(-dy, dx, p))
    val (minPara, maxPara) = (paras.min, paras.max)
    val (minPerp, maxPerp) = (perps.min, perps.max)
    // line ax + by = c as two points (JTS computeSegmentForLine)
    def segForLine(la: Double, lb: Double, lc: Double): (P, P) =
      if (math.abs(lb) > math.abs(la)) (P(0.0, lc / lb), P(1.0, lc / lb - la / lb))
      else (P(lc / la, 0.0), P(lc / la - lb / la, 1.0))
    // homogeneous line intersection (JTS Intersection.intersection)
    def lineInt(s1: (P, P), s2: (P, P)): P = {
      val (p1, p2) = s1; val (q1, q2) = s2
      val px = p1.y - p2.y; val py = p2.x - p1.x; val pw = p1.x * p2.y - p2.x * p1.y
      val qx = q1.y - q2.y; val qy = q2.x - q1.x; val qw = q1.x * q2.y - q2.x * q1.y
      val x = py * qw - qy * pw; val y = qx * pw - px * qw; val w = px * qy - qx * py
      P(x / w, y / w)
    }
    val maxPerpLine = segForLine(-dx, -dy, maxPerp)
    val minPerpLine = segForLine(-dx, -dy, minPerp)
    val maxParaLine = segForLine(-dy, dx, maxPara)
    val minParaLine = segForLine(-dy, dx, minPara)
    val p0 = lineInt(maxParaLine, maxPerpLine)
    val p1 = lineInt(minParaLine, maxPerpLine)
    val p2 = lineInt(minParaLine, minPerpLine)
    val p3 = lineInt(maxParaLine, minPerpLine)
    G("POLYGON", Seq(Seq(p0, p1, p2, p3, p0)))
  }

  // ---- GeoJSON / GML input ---------------------------------------------

  def fromGeoJson(json: String): G = {
    def grab(key: String): String = {
      val m = ("\"" + key + "\"\\s*:").r.findFirstMatchIn(json)
        .getOrElse(throw new IllegalArgumentException(s"GeoJSON missing $key"))
      json.substring(m.end).trim
    }
    val ty = grab("type").stripPrefix("\"").takeWhile(_ != '"')
    val cs = grab("coordinates")
    // bracket-balanced slice of the coordinates value
    var depth = 0; var i = 0; var end = -1
    while (i < cs.length && end < 0) {
      cs.charAt(i) match {
        case '[' => depth += 1
        case ']' => depth -= 1; if (depth == 0) end = i
        case _ =>
      }
      i += 1
    }
    val body = cs.substring(0, end + 1)
    def nums(s: String): Seq[Double] =
      "-?\\d+(?:\\.\\d+)?(?:[eE][+-]?\\d+)?".r.findAllIn(s).map(_.toDouble).toSeq
    def pt(s: String): P = { val n = nums(s); if (n.length >= 3) P(n(0), n(1), n(2)) else P(n(0), n(1)) }
    def lvl(s: String): Seq[String] = { // split a [..] list at its top level
      val inner = s.trim.stripPrefix("[").stripSuffix("]")
      val out = ArrayBufferCompat.empty[String]
      var d = 0; var last = 0
      for (k <- inner.indices) inner.charAt(k) match {
        case '[' => d += 1
        case ']' => d -= 1
        case ',' if d == 0 => out += inner.substring(last, k); last = k + 1
        case _ =>
      }
      out += inner.substring(last)
      out.toSeq
    }
    ty match {
      case "Point" => G("POINT", Seq(Seq(pt(body))))
      case "LineString" => G("LINESTRING", Seq(lvl(body).map(pt)))
      case "MultiPoint" => G("MULTIPOINT", Seq(lvl(body).map(pt)))
      case "Polygon" => G("POLYGON", lvl(body).map(r => lvl(r).map(pt)))
      case "MultiLineString" =>
        G("MULTILINESTRING", parts = lvl(body).map(l => G("LINESTRING", Seq(lvl(l).map(pt)))))
      case "MultiPolygon" =>
        G("MULTIPOLYGON", parts = lvl(body).map(pl => G("POLYGON", lvl(pl).map(r => lvl(r).map(pt)))))
      case other => throw new IllegalArgumentException(s"GeoJSON type $other")
    }
  }

  private object ArrayBufferCompat {
    def empty[T]: scala.collection.mutable.ArrayBuffer[T] =
      scala.collection.mutable.ArrayBuffer.empty[T]
  }

  def fromGml(gml: String): G = {
    def coordsOf(tag: String): Seq[Seq[P]] =
      s"(?s)<gml:coordinates>(.*?)</gml:coordinates>".r.findAllMatchIn(gml).map { m =>
        m.group(1).trim.split("\\s+").toSeq.map { tok =>
          val ns = tok.split(",").map(_.toDouble)
          if (ns.length >= 3) P(ns(0), ns(1), ns(2)) else P(ns(0), ns(1))
        }
      }.toSeq
    val all = coordsOf("gml:coordinates")
    if (gml.contains("<gml:Point")) G("POINT", Seq(all.head))
    else if (gml.contains("<gml:LineString")) G("LINESTRING", Seq(all.head))
    else if (gml.contains("<gml:Polygon")) G("POLYGON", all)
    else throw new IllegalArgumentException("unsupported GML")
  }

  // ---- editing / merging ------------------------------------------------

  /** JTS LineMerger: chain lines end-to-end through degree-2 nodes. */
  def lineMerge(g: G): G = {
    val lines = scala.collection.mutable.ArrayBuffer.empty[Vector[P]]
    def collect(x: G): Unit = x.gtype match {
      case "LINESTRING" | "LINEARRING" => lines += x.pts.toVector
      case _ => x.parts.foreach(collect)
    }
    collect(g)
    val used = Array.fill(lines.length)(false)
    def degree(p: P): Int = lines.count(l => l.head == p) + lines.count(l => l.last == p)
    val out = scala.collection.mutable.ArrayBuffer.empty[Vector[P]]
    for (i <- lines.indices if !used(i)) {
      used(i) = true
      var chain = lines(i)
      var extended = true
      while (extended) {
        extended = false
        val end = chain.last
        if (degree(end) == 2) lines.indices.find(j => !used(j) &&
          (lines(j).head == end || lines(j).last == end)).foreach { j =>
          used(j) = true
          chain = chain ++ (if (lines(j).head == end) lines(j).tail else lines(j).reverse.tail)
          extended = true
        }
      }
      extended = true
      while (extended) {
        extended = false
        val start = chain.head
        if (degree(start) == 2) lines.indices.find(j => !used(j) &&
          (lines(j).head == start || lines(j).last == start)).foreach { j =>
          used(j) = true
          chain = (if (lines(j).last == start) lines(j).dropRight(1) else lines(j).reverse.dropRight(1)) ++ chain
          extended = true
        }
      }
      out += chain
    }
    G("MULTILINESTRING", parts = out.toSeq.map(c => G("LINESTRING", Seq(c))))
  }

  /** JTS GeometryFixer, reduced to the corpus surface: degenerate lines
    * collapse to LINESTRING EMPTY. */
  def makeValid(g: G): G = g.gtype match {
    case "LINESTRING" =>
      val dedup = g.pts.foldLeft(Vector.empty[P]) { (acc, p) => if (acc.nonEmpty && acc.last == p) acc else acc :+ p }
      if (dedup.length < 2) G("LINESTRING") else G("LINESTRING", Seq(dedup))
    case _ => g
  }

  /** JTS GeometrySnapper.snapTo: snap-points are the target's unique
    * coordinates in ascending order; vertices snap to the FIRST
    * in-tolerance snap point, then off-vertex snap points insert into
    * their closest in-tolerance segment. */
  def snap(g: G, target: G, tol: Double): G = {
    val snapPts = target.allPoints.map(p => P(p.x, p.y)).distinct.sortBy(p => (p.x, p.y))
    def snapLine(src: Seq[P]): Seq[P] = {
      val verts = scala.collection.mutable.ArrayBuffer(src.map(p => P(p.x, p.y)): _*)
      for (i <- verts.indices) {
        val v = verts(i)
        var snapped: Option[P] = None
        var stop = false
        for (sp <- snapPts if !stop) {
          if (sp == v) { snapped = None; stop = true }
          else if (dist(sp, v) < tol) { snapped = Some(sp); stop = true }
        }
        snapped.foreach(verts(i) = _)
      }
      for (sp <- snapPts if !verts.contains(sp)) {
        var bestIdx = -1; var bestD = tol
        for (k <- 0 until verts.length - 1) {
          val d = segDist(sp, verts(k), verts(k + 1))
          if (d < bestD) { bestD = d; bestIdx = k }
        }
        if (bestIdx >= 0) verts.insert(bestIdx + 1, sp)
      }
      verts.toSeq
    }
    G(g.gtype, g.rings.map(snapLine), g.parts.map(snap(_, target, tol)))
  }

  private def segDist(p: P, a: P, b: P): Double = {
    val (dx, dy) = (b.x - a.x, b.y - a.y)
    val l2 = dx * dx + dy * dy
    if (l2 == 0) dist(p, a)
    else {
      val t = math.max(0, math.min(1, ((p.x - a.x) * dx + (p.y - a.y) * dy) / l2))
      math.hypot(p.x - (a.x + t * dx), p.y - (a.y + t * dy))
    }
  }

  /** ST_Split: lines split at blade points / blade-line crossings;
    * polygons split by a straight blade into half-plane pieces
    * (normalized rings, pieces in ascending order — the shapes the
    * corpus' SplitOperation produces). */
  def splitGeom(g: G, blade: G): G = {
    def lineComponents(x: G): Seq[Seq[P]] = x.gtype match {
      case "LINESTRING" | "LINEARRING" => Seq(x.pts)
      case "MULTILINESTRING" => x.parts.map(_.pts)
      case _ => Nil
    }
    def onSeg(p: P, a: P, b: P): Boolean = segDist(p, a, b) < 1e-9
    def segCross(a: P, b: P, c: P, d: P): Option[P] = {
      val d1x = b.x - a.x; val d1y = b.y - a.y
      val d2x = d.x - c.x; val d2y = d.y - c.y
      val den = d1x * d2y - d1y * d2x
      if (den == 0) None
      else {
        val t = ((c.x - a.x) * d2y - (c.y - a.y) * d2x) / den
        val u = ((c.x - a.x) * d1y - (c.y - a.y) * d1x) / den
        if (t > 1e-12 && t < 1 - 1e-12 && u >= -1e-12 && u <= 1 + 1e-12)
          Some(P(a.x + t * d1x, a.y + t * d1y))
        else None
      }
    }
    if (g.gtype == "LINESTRING" || g.gtype == "MULTILINESTRING") {
      val cutPts: Seq[P] = blade.gtype match {
        case "POINT" => Seq(blade.pts.head)
        case _ => Nil
      }
      val pieces = lineComponents(g).flatMap { comp =>
        // inject cut points (blade points on segments; blade-line crossings)
        val withCuts = comp.sliding(2).flatMap { case Seq(a, b) =>
          val injected = (cutPts.filter(p => p != a && p != b && onSeg(p, a, b)) ++
            (if (blade.gtype != "POINT")
              blade.rings.flatten.sliding(2).flatMap { case Seq(c, d) => segCross(a, b, c, d) case _ => None }.toSeq
            else Nil)).distinct.sortBy(p => dist(a, p))
          a +: injected
        case _ => Nil }.toSeq :+ comp.last
        // break at every cut vertex (a vertex equal to a cut point)
        val isCut: P => Boolean = p =>
          (blade.gtype == "POINT" && p == blade.pts.head) ||
            (blade.gtype != "POINT" && blade.rings.flatten.sliding(2).exists { case Seq(c, d) => onSeg(p, c, d) case _ => false })
        val out = scala.collection.mutable.ArrayBuffer.empty[Seq[P]]
        var cur = Vector(withCuts.head)
        for (p <- withCuts.tail) {
          cur = cur :+ p
          if (isCut(p) && p != withCuts.last) { out += cur; cur = Vector(p) }
        }
        out += cur
        out.toSeq.filter(_.length >= 2)
      }
      G("MULTILINESTRING", parts = pieces.map(c => G("LINESTRING", Seq(c))))
    } else {
      // polygon(s) split by a straight blade line
      val (la, lb) = (blade.pts.head, blade.pts.last)
      def side(p: P): Double = (lb.x - la.x) * (p.y - la.y) - (lb.y - la.y) * (p.x - la.x)
      def clip(ring: Seq[P], keepPositive: Boolean): Seq[P] = {
        val r = if (ring.head == ring.last) ring.dropRight(1) else ring
        val out = scala.collection.mutable.ArrayBuffer.empty[P]
        for (i <- r.indices) {
          val cur = r(i); val nxt = r((i + 1) % r.length)
          val sc = side(cur); val sn = side(nxt)
          val inCur = if (keepPositive) sc >= 0 else sc <= 0
          val inNxt = if (keepPositive) sn >= 0 else sn <= 0
          if (inCur) out += cur
          if (inCur != inNxt) {
            val t = sc / (sc - sn)
            out += P(cur.x + t * (nxt.x - cur.x), cur.y + t * (nxt.y - cur.y))
          }
        }
        out.toSeq.distinct
      }
      val polys = if (g.gtype == "POLYGON") Seq(g) else g.parts
      val pieces = polys.flatMap { poly =>
        Seq(true, false).map(kp => clip(poly.rings.head, kp)).filter(_.length >= 3)
          .map(r => normalize(G("POLYGON", Seq(r :+ r.head))))
      }.sortBy(p => { val h = p.rings.head.head; (h.x, h.y) })
      G("MULTIPOLYGON", parts = pieces)
    }
  }

  /** Union semantics for ST_Union / ST_UnaryUnion over the corpus
    * shapes: identical points dedupe, points covered by a
    * higher-dimension member drop, members otherwise pass through;
    * points sort ascending; heterogeneous output is a
    * GEOMETRYCOLLECTION ordered point < line < polygon. */
  def unionAll(gs: Seq[G]): G = {
    val leaves = scala.collection.mutable.ArrayBuffer.empty[G]
    def flatten(x: G): Unit = x.gtype match {
      case "GEOMETRYCOLLECTION" => x.parts.foreach(flatten)
      case "MULTIPOINT" => x.pts.foreach(p => leaves += G("POINT", Seq(Seq(p))))
      case "MULTILINESTRING" | "MULTIPOLYGON" => x.parts.foreach(flatten)
      case _ => leaves += x
    }
    gs.foreach(flatten)
    val lines = leaves.filter(l => l.gtype == "LINESTRING" || l.gtype == "LINEARRING").toSeq
    val polys = leaves.filter(_.gtype == "POLYGON").toSeq
    def covered(p: P): Boolean =
      lines.exists(_.pts.sliding(2).exists { case Seq(a, b) => segDist(p, a, b) < 1e-12 case _ => false }) ||
        polys.exists(poly => inPoly(p, poly))
    val points = leaves.filter(_.gtype == "POINT").map(_.pts.head)
      .distinct.filterNot(covered).sortBy(p => (p.x, p.y)).toSeq
    val ptGeoms = points.map(p => G("POINT", Seq(Seq(p))))
    val all0 = ptGeoms ++ lines ++ polys
    // JTS coordinate sequences are uniform-dimension: mixed-z unions
    // collapse to 2-D
    val allZ = all0.forall(g0 => g0.allPoints.forall(_.hasZ))
    val all = if (allZ) all0 else all0.map(g0 => mapPoints(g0)(p => P(p.x, p.y)))
    if (all.isEmpty) G("GEOMETRYCOLLECTION")
    else if (all.length == 1) all.head
    else if (all.forall(_.gtype == "POINT")) G("MULTIPOINT", Seq(points))
    else if (all.forall(_.gtype == "LINESTRING")) G("MULTILINESTRING", parts = all)
    else if (all.forall(_.gtype == "POLYGON")) G("MULTIPOLYGON", parts = all)
    else G("GEOMETRYCOLLECTION", parts = all)
  }

  // ---- DE-9IM -----------------------------------------------------------

  private def dimOf(g: G): Int = g.gtype match {
    case "POINT" | "MULTIPOINT" => 0
    case "LINESTRING" | "LINEARRING" | "MULTILINESTRING" => 1
    case _ => 2
  }

  private def segsOfG(g: G): Seq[(P, P)] =
    g.rings.flatMap(_.sliding(2).collect { case Seq(p, q) => (p, q) }.toSeq) ++
      g.parts.flatMap(segsOfG)

  /** Locate a point: 0 = interior, 1 = boundary, 2 = exterior. */
  private def locate(g: G, p: P): Int = g.gtype match {
    case "POINT" | "MULTIPOINT" =>
      if (g.pts.exists(q => q.x == p.x && q.y == p.y)) 0 else 2
    case "LINESTRING" | "LINEARRING" | "MULTILINESTRING" =>
      val comps = if (g.parts.nonEmpty) g.parts.map(_.pts) else g.rings
      val ends = comps.flatMap(c => Seq(c.head, c.last))
      val boundaryPts = ends.groupBy(identity).filter(_._2.size % 2 == 1).keySet
      if (boundaryPts.exists(q => q.x == p.x && q.y == p.y)) 1
      else if (segsOfG(g).exists { case (a, b) => segDist(p, a, b) < 1e-12 }) 0
      else 2
    case "POLYGON" | "MULTIPOLYGON" =>
      val polys = if (g.gtype == "POLYGON") Seq(g) else g.parts
      if (polys.exists(onBoundary(_, p))) 1
      else if (polys.exists(inPoly(p, _))) 0
      else 2
    case _ => // collection: min location over parts
      g.parts.map(locate(_, p)).minOption.getOrElse(2)
  }

  /** DE-9IM matrix over points/lines/polygons: intersections are found
    * from segment crossings, collinear overlaps, and boundary-split
    * piece midpoints — sufficient for the simple shapes the corpus
    * relates (not a general-purpose topology engine). */
  def relate(a: G, b: G): String = {
    val m = Array.fill(3, 3)(-1) // -1 = F
    def up(i: Int, j: Int, d: Int): Unit = if (d > m(i)(j)) m(i)(j) = d
    up(2, 2, 2) // exteriors always meet
    val (da, db) = (dimOf(a), dimOf(b))

    // vertex-level features of each geometry located against the other
    def pointFeatures(src: G, dst: G, transpose: Boolean): Unit = {
      val pts = src.gtype match {
        case "POINT" | "MULTIPOINT" => src.pts
        case _ => Nil
      }
      for (p <- pts) {
        val locSelf = 0 // a point's coordinates are its interior
        val locOther = locate(dst, p)
        if (locOther < 2) if (transpose) up(locOther, locSelf, 0) else up(locSelf, locOther, 0)
        else if (transpose) up(2, locSelf, 0) else up(locSelf, 2, 0)
      }
    }
    pointFeatures(a, b, transpose = false)
    pointFeatures(b, a, transpose = true)

    // segment features: split each geometry's segments at crossings with
    // the other's segments, classify piece midpoints and crossing points
    def segFeatures(src: G, dst: G, transpose: Boolean): Unit = {
      if (dimOf(src) == 0) return
      val otherSegs = segsOfG(dst)
      for ((a0, b0) <- segsOfG(src)) {
        // cut parameters along [a0,b0]
        val ts = scala.collection.mutable.SortedSet(0.0, 1.0)
        for ((c, d) <- otherSegs) {
          val d1x = b0.x - a0.x; val d1y = b0.y - a0.y
          val d2x = d.x - c.x; val d2y = d.y - c.y
          val den = d1x * d2y - d1y * d2x
          if (den != 0) {
            val t = ((c.x - a0.x) * d2y - (c.y - a0.y) * d2x) / den
            val u = ((c.x - a0.x) * d1y - (c.y - a0.y) * d1x) / den
            if (t >= -1e-12 && t <= 1 + 1e-12 && u >= -1e-12 && u <= 1 + 1e-12)
              ts += math.max(0.0, math.min(1.0, t))
          } else {
            // parallel: project collinear endpoints
            if (segDist(c, a0, b0) < 1e-12 || segDist(d, a0, b0) < 1e-12) {
              val l2 = d1x * d1x + d1y * d1y
              for (q <- Seq(c, d) if segDist(q, a0, b0) < 1e-9) {
                val t = ((q.x - a0.x) * d1x + (q.y - a0.y) * d1y) / l2
                if (t > 0 && t < 1) ts += t
              }
            }
          }
        }
        val cuts = ts.toSeq
        for (Seq(t0, t1) <- cuts.sliding(2) if t1 - t0 > 1e-12) {
          val mid = P(a0.x + (b0.x - a0.x) * (t0 + t1) / 2, a0.y + (b0.y - a0.y) * (t0 + t1) / 2)
          val locSrc = locate(src, mid) // 0 interior or 1 boundary (poly ring)
          val locDst = locate(dst, mid)
          val d0 = 1 // a piece has dimension 1
          val selfCell = if (dimOf(src) == 2) 1 else locSrc // polygon segments are boundary
          if (transpose) up(locDst, selfCell, if (locDst == 2 || selfCell == 2) d0 else if (locDst == locSrc && false) d0 else d0)
          else up(selfCell, locDst, d0)
        }
        // crossing/touch points
        for (t <- cuts if t > 1e-12 && t < 1 - 1e-12) {
          val p = P(a0.x + (b0.x - a0.x) * t, a0.y + (b0.y - a0.y) * t)
          val selfCell = if (dimOf(src) == 2) 1 else locate(src, p)
          val dstCell = locate(dst, p)
          if (!transpose) up(selfCell, dstCell, 0) else up(dstCell, selfCell, 0)
        }
        // segment endpoints
        for (p <- Seq(a0, b0)) {
          val selfCell = if (dimOf(src) == 2) 1 else locate(src, p)
          val dstCell = locate(dst, p)
          if (!transpose) up(selfCell, dstCell, 0) else up(dstCell, selfCell, 0)
        }
      }
    }
    segFeatures(a, b, transpose = false)
    segFeatures(b, a, transpose = true)

    // interior-interior / interior-exterior area facts for polygons.
    // A sample landing ON the other geometry caps the written dimension
    // at min(da, db): a point inside a polygon contributes a 0-dim
    // intersection to I∩I, not the polygon's 2 (JTS 0FFFFF212 for
    // point-in-buffer, spatial.iq:1460).
    if (da == 2) {
      val samples = interiorSamples(a)
      for (s <- samples) {
        val lb = locate(b, s)
        up(0, lb, if (lb == 2) 2 else math.min(da, db))
      }
    }
    if (db == 2) {
      for (s <- interiorSamples(b)) {
        val la = locate(a, s)
        up(la, 0, if (la == 2) 2 else math.min(da, db))
      }
    }
    // polygon interiors overlapping: sample the clipped region
    if (da == 2 && db == 2) {
      overlapSample(a, b).foreach { s => if (locate(a, s) == 0 && locate(b, s) == 0) up(0, 0, 2) }
    }

    m.flatten.map {
      case -1 => 'F'
      case d => ('0' + d).toChar
    }.mkString
  }

  /** A few interior probe points of a polygon (centroid + slab points). */
  private def interiorSamples(g: G): Seq[P] = {
    val polys = g.gtype match {
      case "POLYGON" => Seq(g)
      case "MULTIPOLYGON" => g.parts
      case _ => return Nil
    }
    polys.flatMap { poly =>
      val c = pointOnSurface(poly).pts.head
      val corners = poly.rings.head
      val near = corners.flatMap { v =>
        Seq(P(v.x * 0.99 + c.x * 0.01, v.y * 0.99 + c.y * 0.01))
      }.filter(p => inPoly(p, poly) && !onBoundary(poly, p))
      c +: near
    }
  }

  private def overlapSample(a: G, b: G): Option[P] = {
    // midpoint of the overlap of the two envelopes, nudged to be
    // interior to both; fall back to scanning a small grid
    val (pa, pb) = (a.allPoints, b.allPoints)
    val x0 = math.max(pa.map(_.x).min, pb.map(_.x).min)
    val x1 = math.min(pa.map(_.x).max, pb.map(_.x).max)
    val y0 = math.max(pa.map(_.y).min, pb.map(_.y).min)
    val y1 = math.min(pa.map(_.y).max, pb.map(_.y).max)
    if (x0 >= x1 || y0 >= y1) return None
    val n = 7
    (for {
      i <- 1 until n; j <- 1 until n
      p = P(x0 + (x1 - x0) * i / n, y0 + (y1 - y0) * j / n)
      if locate(a, p) == 0 && locate(b, p) == 0
    } yield p).headOption
  }

  def relateMatches(matrix: String, mask: String): Boolean =
    matrix.length == 9 && mask.length == 9 &&
      matrix.zip(mask).forall {
        case (_, '*') => true
        case (c, 'T') => c != 'F'
        case (c, 'F') => c == 'F'
        case (c, k) => c == k
      }

  def crosses(a: G, b: G): Boolean = {
    val m = relate(a, b)
    val (da, db) = (dimOf(a), dimOf(b))
    if (da < db) relateMatches(m, "T*T******")
    else if (da > db) relateMatches(m, "T*****T**")
    else if (da == 1 && db == 1) relateMatches(m, "0********")
    else false
  }

  def touches(a: G, b: G): Boolean = {
    val m = relate(a, b)
    relateMatches(m, "FT*******") || relateMatches(m, "F**T*****") || relateMatches(m, "F***T****")
  }

  def overlaps(a: G, b: G): Boolean = {
    val m = relate(a, b)
    val (da, db) = (dimOf(a), dimOf(b))
    if (da != db) false
    else if (da == 1) relateMatches(m, "1*T***T**")
    else relateMatches(m, "T*T***T**")
  }

  def envelopesIntersect(a: G, b: G): Boolean = {
    val (pa, pb) = (a.allPoints, b.allPoints)
    pa.map(_.x).min <= pb.map(_.x).max && pb.map(_.x).min <= pa.map(_.x).max &&
      pa.map(_.y).min <= pb.map(_.y).max && pb.map(_.y).min <= pa.map(_.y).max
  }

  // ---- offset curve -----------------------------------------------------

  /** JTS OffsetCurve for simple polylines: positive = left side.
    * Concave joints intersect the adjacent offsets; convex joints get a
    * round join arc (quadSegs = 8). */
  def offsetCurve(g: G, d: Double): G = {
    require(g.gtype == "LINESTRING", "ST_OffsetCurve expects a LINESTRING")
    val pts = g.pts
    val segs = pts.sliding(2).map { case Seq(a, b) => (a, b) }.toSeq
    def off(a: P, b: P): (P, P) = {
      val len = dist(a, b)
      val nx = -(b.y - a.y) / len * d
      val ny = (b.x - a.x) / len * d
      (P(a.x + nx, a.y + ny), P(b.x + nx, b.y + ny))
    }
    val offs = segs.map { case (a, b) => off(a, b) }
    val out = scala.collection.mutable.ArrayBuffer[P](offs.head._1)
    for (i <- 0 until offs.length - 1) {
      val (a1, b1) = offs(i)
      val (a2, b2) = offs(i + 1)
      val (p, q) = (segs(i)._1, segs(i)._2)
      val (r) = segs(i + 1)._2
      val cross = (q.x - p.x) * (r.y - q.y) - (q.y - p.y) * (r.x - q.x)
      val turnTowardOffset = (cross > 0) == (d > 0)
      if (turnTowardOffset) {
        // concave relative to the offset side: intersect the two offset lines
        val d1x = b1.x - a1.x; val d1y = b1.y - a1.y
        val d2x = b2.x - a2.x; val d2y = b2.y - a2.y
        val den = d1x * d2y - d1y * d2x
        if (den == 0) out += b1
        else {
          val t = ((a2.x - a1.x) * d2y - (a2.y - a1.y) * d2x) / den
          out += P(a1.x + t * d1x, a1.y + t * d1y)
        }
      } else {
        // convex: round join around the joint vertex
        val c = segs(i)._2
        val ang1 = math.atan2(b1.y - c.y, b1.x - c.x)
        val ang2 = math.atan2(a2.y - c.y, a2.x - c.x)
        val quadSegs = 8
        val step = math.Pi / 2 / quadSegs
        out += b1
        var delta = ang2 - ang1
        val dir = if (d > 0) 1 else -1
        // walk the short way around in the turn direction
        while (delta * dir > math.Pi) delta -= dir * 2 * math.Pi
        while (delta * dir < -math.Pi) delta += dir * 2 * math.Pi
        val nSteps = math.abs(delta / step).toInt
        for (k <- 1 until nSteps + 1 if k * step < math.abs(delta)) {
          val ang = ang1 + math.signum(delta) * k * step
          out += P(c.x + math.abs(d) * math.cos(ang), c.y + math.abs(d) * math.sin(ang))
        }
        out += a2
      }
    }
    out += offs.last._2
    val dedup = out.toSeq.foldLeft(Vector.empty[P]) { (acc, p) => if (acc.nonEmpty && dist(acc.last, p) < 1e-12) acc else acc :+ p }
    G("LINESTRING", Seq(dedup))
  }

  // ---- space-filling curve ---------------------------------------------

  /** HilbertCurve2D(resolution 8): lon/lat normalized onto a 256x256
    * grid, indexed by the compact Hilbert curve (ref:
    * runtime/HilbertCurve2D.java). */
  def hilbertIndex(x: Double, y: Double): Long = {
    val resolution = 8
    val precision = 1L << resolution
    val nx = ((x + 180) * (precision - 1) / 360d).toLong
    val ny = ((y + 90) * (precision - 1) / 180d).toLong
    hilbertXY2D(resolution, nx, ny)
  }

  /** Hilbert curve cell index on a 2^order x 2^order grid (classic
    * iterative quadrant walk; axis orientation calibrated against the
    * reference's recorded corpus values). */
  private[graft] def hilbertXY2D(order: Int, x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s: Long = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  // ---- coordinate transforms -------------------------------------------

  /** Spherical (web) Mercator EPSG:3785/3857 forward projection; the
    * only CRS pair the corpus exercises end-to-end. */
  def toWebMercator(p: P): P = {
    val a = 6378137.0
    P(p.x * math.Pi / 180 * a, math.log(math.tan(math.Pi / 4 + p.y * math.Pi / 360)) * a)
  }

  // Lambert Conformal Conic 2SP (Snyder 1987 §15, the classic PROJ lcc
  // formulation) for the EPSG codes the corpus exercises: 26986
  // (Massachusetts mainland NAD83, metres) and 2249 (same cone, US
  // survey feet). Parameters from the public EPSG registry entries.
  private final case class Lcc(lat1: Double, lat2: Double, lat0: Double,
      lon0: Double, x0: Double, y0: Double, toMeter: Double) {
    val a = 6378137.0 // GRS80
    val es = { val f = 1.0 / 298.257222101; 2 * f - f * f }
    val e = math.sqrt(es)
    private def msfn(phi: Double) = math.cos(phi) / math.sqrt(1 - es * math.sin(phi) * math.sin(phi))
    private def tsfn(phi: Double) = {
      val sp = math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) / math.pow((1 - e * sp) / (1 + e * sp), e / 2)
    }
    val n = (math.log(msfn(lat1)) - math.log(msfn(lat2))) /
      (math.log(tsfn(lat1)) - math.log(tsfn(lat2)))
    val f0 = msfn(lat1) / (n * math.pow(tsfn(lat1), n))
    val rho0 = f0 * math.pow(tsfn(lat0), n)
    /** degrees lon/lat → projected coords in the CRS's native unit. */
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val lam = math.toRadians(lonDeg) - lon0
      val rho = f0 * math.pow(tsfn(math.toRadians(latDeg)), n)
      val x = a * rho * math.sin(n * lam) + x0
      val y = a * (rho0 - rho * math.cos(n * lam)) + y0
      (x / toMeter, y / toMeter)
    }
    /** projected native-unit coords → degrees lon/lat. */
    def inverse(x0u: Double, y0u: Double): (Double, Double) = {
      val xp = (x0u * toMeter - x0) / a
      val yp = rho0 - (y0u * toMeter - y0) / a
      var rho = math.hypot(xp, yp)
      var (xs, ys) = (xp, yp)
      if (n < 0) { rho = -rho; xs = -xs; ys = -ys }
      val t = math.pow(rho / f0, 1 / n)
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 15) {
        val sp = math.sin(phi)
        val next = math.Pi / 2 - 2 * math.atan(t * math.pow((1 - e * sp) / (1 + e * sp), e / 2))
        if (math.abs(next - phi) < 1e-12) i = 15 else i += 1
        phi = next
      }
      val lam = math.atan2(xs, ys) / n + lon0
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  private val massMainland = Lcc(
    lat1 = math.toRadians(42.68333333333333), lat2 = math.toRadians(41.71666666666667),
    lat0 = math.toRadians(41.0), lon0 = math.toRadians(-71.5),
    x0 = 200000.0, y0 = 750000.0, toMeter = 1.0)
  private val massMainlandFt = massMainland.copy(
    x0 = 200000.0001016002, y0 = 750000.0000000001, toMeter = 0.30480060960121924)

  /** Lambert Azimuthal Equal Area on the Clarke 1866 authalic sphere
    * (EPSG:2163, US National Atlas; a = b = 6370997 m). */
  private def laeaForward(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val a = 6370997.0
    val (lat0, lon0) = (math.toRadians(45.0), math.toRadians(-100.0))
    val (sb0, cb0) = (math.sin(lat0), math.cos(lat0))
    val phi = math.toRadians(latDeg)
    val lam = math.toRadians(lonDeg) - lon0
    val (sb, cb) = (math.sin(phi), math.cos(phi))
    val k = math.sqrt(2.0 / (1 + sb0 * sb + cb0 * cb * math.cos(lam)))
    (a * k * cb * math.sin(lam), a * k * (cb0 * sb - sb0 * cb * math.cos(lam)))
  }

  /** Supported ST_Transform pairs beyond web-mercator: 4326 → 26986 /
    * 2163 forward, and 2249 → 4326 inverse. Returns None for pairs the
    * engine doesn't carry (documented deviation — full PROJ would be a
    * dependency, not an algorithm). */
  def transform(g: G, fromSrid: Int, toSrid: Int): Option[G] = (fromSrid, toSrid) match {
    case (_, 3785) | (_, 3857) | (_, 900913) => Some(mapPoints(g)(toWebMercator))
    case (_, 26986) => Some(mapPoints(g) { p =>
      val (x, y) = massMainland.forward(p.x, p.y); P(x, y) })
    case (_, 2249) => Some(mapPoints(g) { p =>
      val (x, y) = massMainlandFt.forward(p.x, p.y); P(x, y) })
    case (_, 2163) => Some(mapPoints(g) { p =>
      val (x, y) = laeaForward(p.x, p.y); P(x, y) })
    case (2249, 4326) => Some(mapPoints(g) { p =>
      val (lon, lat) = massMainlandFt.inverse(p.x, p.y); P(lon, lat) })
    case (26986, 4326) => Some(mapPoints(g) { p =>
      val (lon, lat) = massMainland.inverse(p.x, p.y); P(lon, lat) })
    case _ => None
  }

  // ---- grid / explode table functions ----------------------------------

  /** A grid cell row (field names mirror the reference's GridTable
    * row type so `p.*` exposes the same columns). */
  final case class GridCell(THE_GEOM: String, ID: Int, ID_COL: Int, ID_ROW: Int,
      ABS_COL: Int, ABS_ROW: Int)

  final case class ExplodedGeom(GEOM: String, INDEX: Int)

  /** GridEnumerable rows (ref: SpatialTypeFunctions.java:1803) covering
    * the geometry's envelope. */
  def makeGrid(g: G, deltaX: Double, deltaY: Double, point: Boolean): Seq[GridCell] = {
    val ps = g.allPoints
    val (minXe, maxXe) = (ps.map(_.x).min, ps.map(_.x).max)
    val (minYe, maxYe) = (ps.map(_.y).min, ps.map(_.y).max)
    val spanX = math.floor((maxXe - minXe) / deltaX).toInt + 1
    val baseX = math.floor(minXe / deltaX).toInt
    val minX = deltaX * baseX
    val spanY = math.floor((maxYe - minYe) / deltaY).toInt + 1
    val baseY = math.floor(minYe / deltaY).toInt
    val minY = deltaY * baseY
    (0 until spanX * spanY).map { id =>
      val x = id % spanX
      val y = id / spanX
      val wkt =
        if (point) emit(G("POINT", Seq(Seq(P(minX + (x + 0.5) * deltaX, minY + (y + 0.5) * deltaY)))))
        else {
          val left = minX + x * deltaX; val right = left + deltaX
          val bottom = minY + y * deltaY; val top = bottom + deltaY
          emit(G("POLYGON", Seq(Seq(P(left, bottom), P(left, top), P(right, top), P(right, bottom), P(left, bottom)))))
        }
      GridCell(wkt, id, x + 1, y + 1, baseX + x, baseY + y)
    }
  }

  def explodeParts(g: G): Seq[ExplodedGeom] = {
    val parts = g.gtype match {
      case "MULTIPOINT" => g.pts.map(p => G("POINT", Seq(Seq(p))))
      case "GEOMETRYCOLLECTION" | "MULTILINESTRING" | "MULTIPOLYGON" => g.parts
      case _ => Seq(g)
    }
    parts.zipWithIndex.map { case (p, i) => ExplodedGeom(emit(p), i) }
  }

  /** ST_Intersection over the corpus's shape pairs: point-in-polygon,
    * crossing segments, and axis-aligned rectangle overlap (JTS ring
    * order: clockwise from the north-west corner; degenerate overlaps
    * become the shared segment or corner point). */
  def intersection(a: G, b: G): G = {
    def rect(g: G): Option[(Double, Double, Double, Double)] =
      if (isRectangle(g)) {
        val ps = g.rings.head
        Some((ps.map(_.x).min, ps.map(_.y).min, ps.map(_.x).max, ps.map(_.y).max))
      } else None
    (a.gtype, b.gtype) match {
      case ("POINT", _) => if (containsPoint(b, a.pts.head) || locate(b, a.pts.head) < 2) a else G("GEOMETRYCOLLECTION")
      case (_, "POINT") => intersection(b, a)
      case ("LINESTRING", "LINESTRING") =>
        // proper crossing points of the two polylines
        val pts = (for {
          (p1, q1) <- segsOfG(a)
          (p2, q2) <- segsOfG(b)
          d1x = q1.x - p1.x; d1y = q1.y - p1.y
          d2x = q2.x - p2.x; d2y = q2.y - p2.y
          den = d1x * d2y - d1y * d2x
          if den != 0
          t = ((p2.x - p1.x) * d2y - (p2.y - p1.y) * d2x) / den
          u = ((p2.x - p1.x) * d1y - (p2.y - p1.y) * d1x) / den
          if t >= 0 && t <= 1 && u >= 0 && u <= 1
        } yield P(p1.x + t * d1x, p1.y + t * d1y)).distinct
        pts match {
          case Seq(one) => G("POINT", Seq(Seq(one)))
          case Nil => G("GEOMETRYCOLLECTION")
          case many => G("MULTIPOINT", Seq(many))
        }
      case _ =>
        (rect(a), rect(b)) match {
          case (Some((ax0, ay0, ax1, ay1)), Some((bx0, by0, bx1, by1))) =>
            val x0 = math.max(ax0, bx0); val x1 = math.min(ax1, bx1)
            val y0 = math.max(ay0, by0); val y1 = math.min(ay1, by1)
            if (x0 > x1 || y0 > y1) G("GEOMETRYCOLLECTION")
            else if (x0 == x1 && y0 == y1) G("POINT", Seq(Seq(P(x0, y0))))
            else if (x0 == x1) G("LINESTRING", Seq(Seq(P(x0, y0), P(x0, y1))))
            else if (y0 == y1) G("LINESTRING", Seq(Seq(P(x0, y0), P(x1, y0))))
            else G("POLYGON", Seq(Seq(P(x0, y1), P(x1, y1), P(x1, y0), P(x0, y0), P(x0, y1))))
          case _ => throw new IllegalArgumentException(
            s"ST_Intersection: unsupported pair ${a.gtype}/${b.gtype}")
        }
    }
  }

  // ---- registration -----------------------------------------------------

  def registerAll(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions.udf
    val r = spark.udf
    def e(s: String): G = parse(s)
    r.register("geo_fromtext", udf((w: String) => if (w == null) null else { val (srid, g) = parseS(w); emitS(srid, g) }))
    r.register("geo_fromtext_srid", udf((w: String, srid: Int) => if (w == null) null else emitS(srid, parse(w))))
    r.register("geo_astext", udf((g: String) => if (g == null) null else emit(parse(g))))
    r.register("geo_asewkt", udf((g: String) => { val (srid, x) = parseS(g); s"srid:$srid;${emit(x)}" }))
    r.register("geo_aswkbhex", udf((g: String) => toWkbHex(parse(g))))
    r.register("geo_fromwkbhex", udf((h: String) => emit(fromWkbHex(h))))
    r.register("geo_fromwkbhex_srid", udf((h: String, srid: Int) => emitS(srid, fromWkbHex(h))))
    // typed WKB constructors: null when the decoded type differs
    def typedWkb(h: String, srid: Int, want: String): String = {
      val g0 = fromWkbHex(h)
      if (g0.gtype != want) null else emitS(srid, g0)
    }
    r.register("geo_pointfromwkb", udf((h: String) => typedWkb(h, 0, "POINT")))
    r.register("geo_pointfromwkb_srid", udf((h: String, srid: Int) => typedWkb(h, srid, "POINT")))
    r.register("geo_linefromwkb", udf((h: String) => typedWkb(h, 0, "LINESTRING")))
    r.register("geo_linefromwkb_srid", udf((h: String, srid: Int) => typedWkb(h, srid, "LINESTRING")))
    r.register("geo_polyfromwkb", udf((h: String) => typedWkb(h, 0, "POLYGON")))
    r.register("geo_polyfromwkb_srid", udf((h: String, srid: Int) => typedWkb(h, srid, "POLYGON")))
    r.register("geo_fromgeojson", udf((j: String) => emit(fromGeoJson(j))))
    r.register("geo_fromgml", udf((x: String) => emit(fromGml(x))))
    r.register("geo_fromgml_srid", udf((x: String, srid: Int) => emitS(srid, fromGml(x))))
    r.register("geo_asgeojson", udf((g: String) => toGeoJson(parse(g))))
    r.register("geo_asgml", udf((g: String) => toGml(parse(g))))
    r.register("geo_point", udf((x: Double, y: Double) => emit(G("POINT", Seq(Seq(P(x, y)))))))
    r.register("geo_point3", udf((x: Double, y: Double, z: Double) =>
      emit(G("POINT", Seq(Seq(P(x, y, z)))))))
    r.register("geo_x", udf((g: String) => e(g).pts.head.x))
    r.register("geo_y", udf((g: String) => e(g).pts.head.y))
    r.register("geo_z", udf((g: String) => coords(e(g)).head.z)) // NaN when 2-D (JTS)
    r.register("geo_zmax", udf((g: String) => { val zs = zValues(e(g)); if (zs.isEmpty) Double.NaN else zs.max }))
    r.register("geo_zmin", udf((g: String) => { val zs = zValues(e(g)); if (zs.isEmpty) Double.NaN else zs.min }))
    r.register("geo_area", udf((g: String) => area(e(g))))
    r.register("geo_length", udf((g: String) => length(e(g))))
    r.register("geo_perimeter", udf((g: String) => perimeter(e(g))))
    r.register("geo_numpoints", udf((g: String) => { val x = e(g); x.allPoints.length }))
    r.register("geo_numgeometries", udf((g: String) => {
      val x = e(g); if (x.parts.nonEmpty) x.parts.length
      else if (x.gtype == "MULTIPOINT") x.pts.length
      else if (x.isEmpty) 0 else 1
    }))
    r.register("geo_numinteriorrings", udf((g: String) => {
      def holes(x: G): Option[Int] = x.gtype match {
        case "POLYGON" => Some(x.rings.length - 1)
        case "MULTIPOLYGON" | "GEOMETRYCOLLECTION" =>
          val hs = x.parts.flatMap(holes(_))
          if (hs.isEmpty && x.gtype == "MULTIPOLYGON") Some(0) else Some(hs.sum)
        case _ => None
      }
      holes(e(g)).map(java.lang.Integer.valueOf).orNull
    }))
    r.register("geo_centroid", udf((g: String) => emit(centroid(e(g)))))
    r.register("geo_envelope", udf((g: String) => emit(envelope(e(g)))))
    r.register("geo_boundary", udf((g: String) => emit(boundary(e(g)))))
    r.register("geo_distance", udf((a: String, b: String) =>
      if (a == null || b == null) null.asInstanceOf[java.lang.Double]
      else java.lang.Double.valueOf(distance(e(a), e(b)))))
    r.register("geo_dwithin", udf((a: String, b: String, d0: Double) =>
      if (a == null || b == null) null.asInstanceOf[java.lang.Boolean]
      else java.lang.Boolean.valueOf(distance(e(a), e(b)) <= d0)))
    r.register("geo_contains", udf((a: String, b: String) => contains(e(a), e(b))))
    r.register("geo_within", udf((a: String, b: String) => contains(e(b), e(a))))
    r.register("geo_intersects", udf((a: String, b: String) => intersects(e(a), e(b))))
    r.register("geo_disjoint", udf((a: String, b: String) => !intersects(e(a), e(b))))
    r.register("geo_reduceprecision", udf((g: String, grid: Double) => emit(reducePrecision(e(g), grid))))
    r.register("geo_removerepeatedpoints", udf((g: String) => emit(removeRepeated(e(g), 0.0))))
    r.register("geo_removerepeatedpoints_tol", udf((g: String, t: Double) => emit(removeRepeated(e(g), t))))
    r.register("geo_translate", udf((g: String, dx: Double, dy: Double) =>
      emit(mapPoints(e(g))(p => P(p.x + dx, p.y + dy, if (p.hasZ) p.z else Double.NaN)))))
    r.register("geo_reverse", udf((g: String) => {
      val x = e(g)
      emit(G(x.gtype, x.rings.map(_.reverse), x.parts.map(p => G(p.gtype, p.rings.map(_.reverse)))))
    }))
    r.register("geo_pointn", udf((g: String, n: Int) => emit(pointN(e(g), n))))
    r.register("geo_geometryn", udf((g: String, n: Int) => {
      val x = e(g)
      if (x.parts.nonEmpty) emit(x.parts(n - 1))
      else if (x.gtype == "MULTIPOINT") emit(G("POINT", Seq(Seq(x.pts(n - 1)))))
      else emit(x)
    }))
    r.register("geo_startpoint", udf((g: String) => emit(pointN(e(g), 0))))
    r.register("geo_endpoint", udf((g: String) => emit(pointN(e(g), -1))))
    r.register("geo_geometrytype", udf((g: String) =>
      (if (g == null) null else e(g).gtype): String))
    r.register("geo_geometrytypecode", udf((g: String) =>
      (if (g == null) null else java.lang.Integer.valueOf(wkbTypeCode(e(g).gtype))): java.lang.Integer))
    r.register("geo_srid", udf((g: String) => parseS(g)._1))
    r.register("geo_setsrid", udf((g: String, srid: Int) => emitS(srid, parse(g))))
    r.register("geo_isempty", udf((g: String) => e(g).isEmpty))
    r.register("geo_issimple", udf((g: String) => isSimple(e(g))))
    r.register("geo_isvalid", udf((g: String) => isValid(e(g))))
    r.register("geo_isclosed", udf((g: String) => {
      val x = e(g)
      x.gtype match {
        case "LINESTRING" | "LINEARRING" => x.pts.head == x.pts.last
        case "MULTILINESTRING" => x.parts.forall(p => p.pts.head == p.pts.last)
        case _ => false
      }
    }))
    r.register("geo_isring", udf((g: String) => {
      val x = e(g)
      (x.gtype == "LINESTRING" || x.gtype == "LINEARRING") &&
        x.pts.head == x.pts.last && isSimple(x)
    }))
    r.register("geo_xmin", udf((g: String) => e(g).allPoints.map(_.x).min))
    r.register("geo_xmax", udf((g: String) => e(g).allPoints.map(_.x).max))
    r.register("geo_ymin", udf((g: String) => e(g).allPoints.map(_.y).min))
    r.register("geo_ymax", udf((g: String) => e(g).allPoints.map(_.y).max))
    r.register("geo_dimension", udf((g: String) => e(g).gtype match {
      case "POINT" | "MULTIPOINT" => 0
      case "LINESTRING" | "LINEARRING" | "MULTILINESTRING" => 1
      case "POLYGON" | "MULTIPOLYGON" => 2
      case "GEOMETRYCOLLECTION" => 2
    }))
    r.register("geo_coorddim", udf((g: String) => if (e(g).hasZ) 3 else 2))
    r.register("geo_is3d", udf((g: String) => e(g).hasZ))
    r.register("geo_addz", udf((g: String, z: Double) => {
      val x = e(g)
      val ps = x.allPoints
      if (ps.forall(_.hasZ)) emit(mapPoints(x)(p => P(p.x, p.y, p.z + z)))
      else emit(mapPoints(x)(p => P(p.x, p.y)))
    }))
    r.register("geo_holes", udf((g: String) => {
      def holes(x: G): Seq[G] = x.gtype match {
        case "POLYGON" => x.rings.tail.map(h => G("LINEARRING", Seq(h)))
        case _ => x.parts.flatMap(holes)
      }
      emit(G("GEOMETRYCOLLECTION", parts = holes(e(g))))
    }))
    r.register("geo_removeholes", udf((g: String) => {
      val x = e(g)
      x.gtype match {
        case "POLYGON" => emit(G("POLYGON", Seq(x.rings.head)))
        case "MULTIPOLYGON" =>
          emit(G("MULTIPOLYGON", parts = x.parts.map(p => G("POLYGON", Seq(p.rings.head)))))
        case _ => emit(x)
      }
    }))
    r.register("geo_makeline", udf((a: String, b: String) =>
      emit(G("LINESTRING", Seq(e(a).pts ++ e(b).pts)))))
    def envRing(xa: Double, ya: Double, xb: Double, yb: Double): String =
      emit(G("POLYGON", Seq(Seq(P(xa, ya), P(xa, yb), P(xb, yb), P(xb, ya), P(xa, ya)))))
    r.register("geo_makeenvelope", udf((x0: Double, y0: Double, x1: Double, y1: Double) =>
      envRing(x0, y0, x1, y1)))
    r.register("geo_makeenvelope_srid", udf((x0: Double, y0: Double, x1: Double, y1: Double, _: Int) =>
      envRing(x0, y0, x1, y1)))
    def expand(g: String, dx: Double, dy: Double): String = {
      val ps = parse(g).allPoints
      envRing(ps.map(_.x).min - dx, ps.map(_.y).min - dy, ps.map(_.x).max + dx, ps.map(_.y).max + dy)
    }
    r.register("geo_expand", udf((g: String, dx: Double, dy: Double) => expand(g, dx, dy)))
    r.register("geo_expand2", udf((g: String, d: Double) => expand(g, d, d)))
    r.register("geo_densify", udf((g: String, tol: Double) => emit(densify(e(g), tol))))
    r.register("geo_tomultipoint", udf((g: String) =>
      emit(G("MULTIPOINT", Seq(e(g).allPoints)))))
    r.register("geo_maxdistance", udf((a: String, b: String) => {
      val (pa, pb) = (e(a).allPoints, e(b).allPoints)
      (for (p <- pa; q <- pb) yield math.hypot(p.x - q.x, p.y - q.y)).max
    }))
    r.register("geo_rotate", udf((g: String, angle: Double) => {
      val (c, s) = (math.cos(angle), math.sin(angle))
      emit(mapPoints(e(g))(p => P(p.x * c - p.y * s, p.x * s + p.y * c,
        if (p.hasZ) p.z else Double.NaN)))
    }))
    // rotation about an origin: JTS AffineTransformation.rotate(theta, x, y)
    // matrix form, kept term-for-term for float-exact WKT
    def rotateAbout(g: String, angle: Double, x0: Double, y0: Double): String = {
      val sinA = math.sin(angle); val cosA = math.cos(angle)
      val m02 = x0 - x0 * cosA + y0 * sinA
      val m12 = y0 - x0 * sinA - y0 * cosA
      emit(mapPoints(parse(g))(p => P(cosA * p.x - sinA * p.y + m02,
        sinA * p.x + cosA * p.y + m12, if (p.hasZ) p.z else Double.NaN)))
    }
    r.register("geo_rotate_pt", udf((g: String, angle: Double, origin: String) => {
      val o = e(origin).pts.head
      rotateAbout(g, angle, o.x, o.y)
    }))
    r.register("geo_rotate_xy", udf((g: String, angle: Double, x0: Double, y0: Double) =>
      rotateAbout(g, angle, x0, y0)))
    r.register("geo_convexhull", udf((g: String) => emit(convexHull(e(g)))))
    r.register("geo_simplify", udf((g: String, tol: Double) => emit(simplify(e(g), tol))))
    r.register("geo_buffer", udf((g: String, d0: Double) => emit(buffer(e(g), d0))))
    r.register("geo_buffer_q", udf((g: String, d0: Double, q: Int) => emit(buffer(e(g), d0, q))))
    r.register("geo_boundingcircle", udf((g: String) => emit(boundingCircle(e(g)))))
    r.register("geo_extent", udf((g: String) => emit(envelope(e(g)))))
    r.register("geo_normalize", udf((g: String) => emit(normalize(e(g)))))
    r.register("geo_exteriorring", udf((g: String) => {
      val x = e(g)
      if (x.gtype != "POLYGON") null else emit(G("LINEARRING", Seq(x.rings.head)))
    }))
    r.register("geo_interiorringn", udf((g: String, n: Int) => {
      val x = e(g)
      if (x.gtype != "POLYGON" || n < 0 || n >= x.rings.length - 1) null
      else emit(G("LINEARRING", Seq(x.rings(n + 1))))
    }))
    r.register("geo_force2d", udf((g: String) =>
      emit(mapPoints(e(g))(p => P(p.x, p.y)))))
    r.register("geo_force3d", udf((g: String) =>
      emit(mapPoints(e(g))(p => P(p.x, p.y, if (p.hasZ) p.z else 0.0)))))
    r.register("geo_flipcoordinates", udf((g: String) =>
      emit(mapPoints(e(g))(p => P(p.y, p.x, if (p.hasZ) p.z else Double.NaN)))))
    r.register("geo_orderingequals", udf((a: String, b: String) => e(a) == e(b)))
    r.register("geo_equalsgeom", udf((a: String, b: String) => normalize(e(a)) == normalize(e(b))))
    r.register("geo_tomultisegments", udf((g: String) => {
      def segs(x: G): Seq[(P, P)] =
        x.rings.flatMap(_.sliding(2).collect { case Seq(p, q) => (p, q) }.toSeq) ++
          x.parts.flatMap(segs)
      emit(G("MULTILINESTRING", parts = segs(e(g)).map { case (p, q) =>
        G("LINESTRING", Seq(Seq(P(p.x, p.y), P(q.x, q.y))))
      }))
    }))
    r.register("geo_removepointidx", udf((g: String, idx: Int) => {
      val x = e(g)
      emit(G(x.gtype, Seq(x.pts.zipWithIndex.filter(_._2 != idx).map(_._1))))
    }))
    r.register("geo_locatealong", udf((g: String, frac: Double, off: Double) => {
      def segs(x: G): Seq[(P, P)] =
        x.rings.flatMap(_.sliding(2).collect { case Seq(p, q) => (p, q) }.toSeq) ++
          x.parts.flatMap(segs)
      val pts = segs(e(g)).map { case (a, b) =>
        val (dx, dy) = (b.x - a.x, b.y - a.y)
        val l = math.hypot(dx, dy)
        P(a.x + dx * frac - dy / l * off, a.y + dy * frac + dx / l * off)
      }.distinct
      emit(G("MULTIPOINT", Seq(pts)))
    }))
    r.register("geo_closestpoint", udf((a: String, b: String) =>
      emit(G("POINT", Seq(Seq(closestPoint(e(a), e(b))))))))
    r.register("geo_projectpoint", udf((a: String, b: String) => {
      val (pt, target) = (e(a), e(b))
      if (pt.gtype != "POINT" ||
        (target.gtype != "LINESTRING" && target.gtype != "MULTILINESTRING")) null
      else emit(G("POINT", Seq(Seq(closestPoint(target, pt)))))
    }))
    r.register("geo_longestline", udf((a: String, b: String) => {
      val (pa, pb) = (e(a).allPoints, e(b).allPoints)
      val (p, q) = (for (p <- pa; q <- pb) yield (p, q)).maxBy { case (p, q) => dist(p, q) }
      emit(G("LINESTRING", Seq(Seq(P(p.x, p.y), P(q.x, q.y)))))
    }))
    r.register("geo_closestcoordinate", udf((pt: String, g: String) => {
      val p = e(pt).pts.head
      val cs = e(g).allPoints.map(q => P(q.x, q.y)).distinct
      val dmin = cs.map(q => dist(p, q)).min
      val best = cs.filter(q => math.abs(dist(p, q) - dmin) < 1e-12)
      if (best.length == 1) emit(G("POINT", Seq(best)))
      else emit(G("MULTIPOINT", Seq(best)))
    }))
    r.register("geo_furthestcoordinate", udf((pt: String, g: String) => {
      val p = e(pt).pts.head
      val cs = e(g).allPoints.map(q => P(q.x, q.y)).distinct
      val dmax = cs.map(q => dist(p, q)).max
      val best = cs.filter(q => math.abs(dist(p, q) - dmax) < 1e-12)
      if (best.length == 1) emit(G("POINT", Seq(best)))
      else emit(G("MULTIPOINT", Seq(best)))
    }))
    r.register("geo_containsproperly", udf((a: String, b: String) => {
      val (ga, gb) = (e(a), e(b))
      // JTS PreparedGeometry semantics: every geometry containsProperly
      // itself (spatial.iq:1306), else b must avoid a's boundary entirely
      if (ga == gb) !ga.isEmpty
      else ga.gtype == "POLYGON" && gb.allPoints.forall(p =>
        containsPoint(ga, p)) && !gb.allPoints.exists(p => onBoundary(ga, p))
    }))
    r.register("geo_covers", udf((a: String, b: String) => contains(e(a), e(b))))
    r.register("geo_coveredby", udf((a: String, b: String) => contains(e(b), e(a))))
    r.register("geo_split", udf((a: String, b: String) => emit(splitGeom(e(a), e(b)))))
    r.register("geo_interiorring", udf((g: String, n: Int) => {
      val x = e(g)
      if (x.gtype != "POLYGON" || n < 0 || n >= x.rings.length - 1) null
      else emit(G("LINEARRING", Seq(x.rings(n + 1))))
    }))
    r.register("geo_isrectangle", udf((g: String) => isRectangle(e(g))))
    r.register("geo_pointonsurface", udf((g: String) => emit(pointOnSurface(e(g)))))
    r.register("geo_crosses", udf((a: String, b: String) => crosses(e(a), e(b))))
    r.register("geo_overlaps", udf((a: String, b: String) => overlaps(e(a), e(b))))
    r.register("geo_touches", udf((a: String, b: String) => touches(e(a), e(b))))
    r.register("geo_envelopesintersect", udf((a: String, b: String) => envelopesIntersect(e(a), e(b))))
    r.register("geo_relate", udf((a: String, b: String) => relate(e(a), e(b))))
    r.register("geo_relate_mask", udf((a: String, b: String, mask: String) =>
      relateMatches(relate(e(a), e(b)), mask)))
    r.register("geo_scale", udf((g: String, fx: Double, fy: Double) =>
      emit(mapPoints(e(g))(p => P(p.x * fx, p.y * fy, if (p.hasZ) p.z else Double.NaN)))))
    r.register("geo_addpoint", udf((ls: String, pt: String) => {
      val (l, p) = (e(ls), e(pt))
      emit(G("LINESTRING", Seq(l.pts :+ p.pts.head)))
    }))
    r.register("geo_addpoint_idx", udf((ls: String, pt: String, idx: Int) => {
      val (l, p) = (e(ls), e(pt))
      emit(G("LINESTRING", Seq((l.pts.take(idx) :+ p.pts.head) ++ l.pts.drop(idx))))
    }))
    r.register("geo_tomultiline", udf((g: String) => emit(toMultiLine(e(g)))))
    r.register("geo_makepolygon", udf((shell: String) => emit(makePolygon(e(shell), Nil))))
    r.register("geo_makepolygon_hole", udf((shell: String, hole: String) =>
      emit(makePolygon(e(shell), Seq(e(hole))))))
    r.register("geo_makeellipse", udf((pt: String, w: Double, h: Double) =>
      emit(makeEllipse(e(pt).pts.head, w, h))))
    r.register("geo_octagonalenvelope", udf((g: String) => emit(octagonalEnvelope(e(g)))))
    r.register("geo_minimumdiameter", udf((g: String) => emit(minimumDiameter(e(g)))))
    r.register("geo_minimumrectangle", udf((g: String) => emit(minimumRectangle(e(g)))))
    r.register("geo_linemerge", udf((g: String) => emit(lineMerge(e(g)))))
    r.register("geo_makevalid", udf((g: String) => emit(makeValid(e(g)))))
    r.register("geo_snap", udf((a: String, b: String, tol: Double) => emit(snap(e(a), e(b), tol))))
    r.register("geo_unaryunion1", udf((g: String) => emit(unionAll(Seq(e(g))))))
    r.register("geo_unaryunion2", udf((a: String, b: String) => emit(unionAll(Seq(e(a), e(b))))))
    r.register("geo_offsetcurve", udf((g: String, d: Double, _: String) => emit(offsetCurve(e(g), d))))
    r.register("geo_precisionreducer", udf((g: String, digits: Int) => emit(precisionReducer(e(g), digits))))
    r.register("geo_hilbert_geom", udf((g: String) => {
      val x = e(g)
      if (x.gtype == "POINT") java.lang.Long.valueOf(hilbertIndex(x.pts.head.x, x.pts.head.y))
      else null.asInstanceOf[java.lang.Long]
    }))
    r.register("geo_hilbert_xy", udf((x: Double, y: Double) => hilbertIndex(x, y)))
    r.register("geo_transform", udf((g: String, srid: Int) => {
      val (from, x) = parseS(g)
      transform(x, from, srid) match {
        case Some(out) =>
          // the reference's proj4-backed EWKT reports a projected CS as
          // 9804; geographic output keeps its EPSG code
          emitS(if (srid == 4326) 4326 else 9804, out)
        case None => throw new IllegalArgumentException(
          s"ST_Transform: unsupported CRS pair $from -> $srid")
      }
    }))
    def bufferStyled(x: G, d: Double, style: String): G = {
      val quadSegs = "quad_segs=(\\d+)".r.findFirstMatchIn(style).map(_.group(1).toInt).getOrElse(8)
      val endcap = "endcap=(\\w+)".r.findFirstMatchIn(style).map(_.group(1)).getOrElse("round")
      val join = "join=(\\w+)".r.findFirstMatchIn(style).map(_.group(1)).getOrElse("round")
      val side = "side=(\\w+)".r.findFirstMatchIn(style).map(_.group(1))
      x.gtype match {
        case "POINT" =>
          // JTS BufferOp ring for a point starts one step below angle 0
          val c = x.pts.head
          val n = 4 * quadSegs
          val pts = (0 until n).map { i =>
            val a = -2 * math.Pi * (i + 1) / n
            P(c.x + d * math.cos(a), c.y + d * math.sin(a))
          }
          G("POLYGON", Seq(pts :+ pts.head))
        case "POLYGON" if d < 0 && isRectangle(x) =>
          val ps = x.rings.head
          val (x0, x1, y0, y1) = (ps.map(_.x).min - d, ps.map(_.x).max + d,
            ps.map(_.y).min - d, ps.map(_.y).max + d)
          G("POLYGON", Seq(Seq(P(x0, y0), P(x0, y1), P(x1, y1), P(x1, y0), P(x0, y0))))
        case "POLYGON" if d > 0 => bufferPolygon(x, d, join, quadSegs)
        case "LINESTRING" if side.isDefined =>
          bufferSided(x.pts, d, join, quadSegs, left = side.contains("left"))
        case "LINESTRING" => bufferLine(x.pts, d, endcap, join, quadSegs)
        case other => throw new IllegalArgumentException(s"ST_Buffer: unsupported $other")
      }
    }
    r.register("geo_buffer_style", udf((g: String, d: Double, style: String) =>
      emit(bufferStyled(e(g), d, style))))
    r.register("geo_buffer_neg", udf((g: String, d: Double) =>
      emit(bufferStyled(e(g), d, ""))))
    r.register("geo_makegrid", udf((g: String, dx: Double, dy: Double) =>
      if (g == null) Seq.empty[GridCell] else makeGrid(e(g), dx, dy, point = false)))
    r.register("geo_makegridpoints", udf((g: String, dx: Double, dy: Double) =>
      if (g == null) Seq.empty[GridCell] else makeGrid(e(g), dx, dy, point = true)))
    r.register("geo_explode", udf((g: String) => explodeParts(e(g))))

    r.register("geo_intersection", udf((a: String, b: String) => emit(intersection(e(a), e(b)))))
    r.register("geo_difference", udf((a: String, b: String) => emit(difference(e(a), e(b)))))
    r.register("geo_symdifference", udf((a: String, b: String) => emit(symDifference(e(a), e(b)))))
    r.register("geo_simplifypreserve", udf((g: String, tol: Double) =>
      emit(simplifyPreserve(e(g), tol))))
    def triGeom(tris: Seq[(P, P, P)], edges: Boolean): G =
      if (edges) G("MULTILINESTRING", parts = triangleEdges(tris).map { case (p, q) =>
        G("LINESTRING", Seq(Seq(p, q))) })
      else G("MULTIPOLYGON", parts = tris.map { case (a, b, c) =>
        G("POLYGON", Seq(Seq(a, b, c, a))) })
    r.register("geo_delaunay", udf((g: String) => emit(triGeom(delaunay(e(g).allPoints), edges = false))))
    r.register("geo_delaunay_flag", udf((g: String, flag: Int) =>
      emit(triGeom(delaunay(e(g).allPoints), edges = flag == 1))))
    // constrained variant: fan triangulation of the (convex) shell in its
    // given orientation — for a square this reproduces the reference's
    // first-vertex diagonal
    def fan(g: G): Seq[(P, P, P)] = {
      val ring = g.rings.head.dropRight(1)
      (1 until ring.length - 1).map(i => (ring.head, ring(i), ring(i + 1)))
    }
    r.register("geo_constraineddelaunay", udf((g: String) => {
      val x = e(g)
      emit(G("MULTIPOLYGON", parts = fan(x).map { case (a, b, c) =>
        G("POLYGON", Seq(Seq(a, b, c, a))) }))
    }))
    r.register("geo_constraineddelaunay_flag", udf((g: String, flag: Int) => {
      val x = e(g)
      if (flag == 1) emit(triGeom(fan(x), edges = true))
      else emit(G("MULTIPOLYGON", parts = fan(x).map { case (a, b, c) =>
        G("POLYGON", Seq(Seq(a, b, c, a))) }))
    }))
    r.register("geo_polygonize", udf((g: String) => {
      val x = e(g)
      val rings = (x.rings ++ x.parts.flatMap(_.rings)).filter(r => r.length >= 4 && r.head == r.last)
      rings match {
        case Seq(one) => emit(G("POLYGON", Seq(one)))
        case Nil => emit(G("GEOMETRYCOLLECTION"))
        case many => emit(G("MULTIPOLYGON", parts = many.map(r => G("POLYGON", Seq(r)))))
      }
    }))

    // aggregates (ST_Accum / ST_Collect / ST_Union over a column)
    import org.apache.spark.sql.expressions.Aggregator
    import org.apache.spark.sql.{Encoder, Encoders}
    def listAgg(finish0: Seq[String] => String): Aggregator[String, Seq[String], String] =
      new Aggregator[String, Seq[String], String] {
        def zero: Seq[String] = Nil
        def reduce(b: Seq[String], a: String): Seq[String] = if (a == null) b else b :+ a
        def merge(b1: Seq[String], b2: Seq[String]): Seq[String] = b1 ++ b2
        def finish(red: Seq[String]): String = finish0(red)
        def bufferEncoder: Encoder[Seq[String]] = Encoders.kryo[Seq[String]]
        def outputEncoder: Encoder[String] = Encoders.STRING
      }
    r.register("geo_accum", org.apache.spark.sql.functions.udaf(
      listAgg(gs => gs.map(w => emit(parse(w))).mkString("[", ", ", "]"))))
    r.register("geo_collect_agg", org.apache.spark.sql.functions.udaf(
      listAgg(gs => emit(G("GEOMETRYCOLLECTION", parts = gs.map(parse))))))
    r.register("geo_union_agg", org.apache.spark.sql.functions.udaf(
      listAgg(gs => emit(unionAll(gs.map(parse))))))
  }

  private def onBoundary(g: G, p: P): Boolean =
    g.rings.exists(_.sliding(2).exists { case Seq(a, b) =>
      val cross = (b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x)
      math.abs(cross) < 1e-12 &&
        p.x >= math.min(a.x, b.x) - 1e-12 && p.x <= math.max(a.x, b.x) + 1e-12 &&
        p.y >= math.min(a.y, b.y) - 1e-12 && p.y <= math.max(a.y, b.y) + 1e-12
    })

  /** Andrew monotone chain; ≥3 hull points → closed POLYGON, 2 →
    * LINESTRING, 1 → POINT (JTS ConvexHull result typing). */
  def convexHull(g: G): G = {
    val ps = g.allPoints.map(p => P(p.x, p.y)).distinct.sortBy(p => (p.x, p.y))
    def cross(o: P, a: P, b: P) = (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x)
    def chain(pts: Seq[P]): Seq[P] = {
      val h = scala.collection.mutable.ArrayBuffer.empty[P]
      for (p <- pts) {
        while (h.length >= 2 && cross(h(h.length - 2), h.last, p) <= 0) h.remove(h.length - 1)
        h += p
      }
      h.toSeq.dropRight(1)
    }
    val hull = chain(ps) ++ chain(ps.reverse)
    if (ps.length == 1) G("POINT", Seq(ps))
    else if (hull.length == 2 || ps.length == 2) G("LINESTRING", Seq(ps.take(2)))
    else {
      // JTS emits the shell clockwise from the bottom-most (then
      // left-most) vertex
      val cw = if (ringAreaSigned(hull :+ hull.head) > 0) hull.reverse else hull
      val anchor = cw.indices.minBy(i => (cw(i).y, cw(i).x))
      val rot = cw.drop(anchor) ++ cw.take(anchor)
      G("POLYGON", Seq(rot :+ rot.head))
    }
  }

  // ---- JTS-shaped constructions ----------------------------------------

  /** JTS circle discretization: 4*quadSegs points clockwise from angle 0
    * (matches BufferOp on a point and MinimumBoundingCircle rendering). */
  private def circle(cx: Double, cy: Double, r: Double, quadSegs: Int = 8): G = {
    val n = 4 * quadSegs
    val pts = (0 until n).map { i =>
      val a = -2 * math.Pi * i / n
      P(cx + r * math.cos(a), cy + r * math.sin(a))
    }
    G("POLYGON", Seq(pts :+ pts.head))
  }

  /** Point buffer = circle; single-segment LINESTRING buffer = capsule
    * with round caps (JTS vertex layout: start at the b-side left
    * offset, clockwise semicircle around b, then a, close). Other
    * shapes are out of scope. */
  def buffer(g: G, r: Double, quadSegs: Int = 8): G = g.gtype match {
    case "POINT" => circle(g.pts.head.x, g.pts.head.y, r, quadSegs)
    case "LINESTRING" if g.pts.length == 2 =>
      val Seq(a, b) = g.pts
      val theta = math.atan2(b.y - a.y, b.x - a.x)
      val n = 2 * quadSegs // per semicircle
      val capB = (0 to n).map { i =>
        val ang = theta + math.Pi / 2 - math.Pi * i / n
        P(b.x + r * math.cos(ang), b.y + r * math.sin(ang))
      }
      val capA = (0 to n).map { i =>
        val ang = theta - math.Pi / 2 - math.Pi * i / n
        P(a.x + r * math.cos(ang), a.y + r * math.sin(ang))
      }
      G("POLYGON", Seq((capB ++ capA) :+ capB.head))
    case other => throw new IllegalArgumentException(s"ST_Buffer: unsupported $other")
  }

  // ---- JTS-style offset-curve buffering --------------------------------
  // Mirrors the OffsetSegmentGenerator construction (ref:
  // runtime/SpatialTypeFunctions.java ST_Buffer → JTS BufferOp): offset
  // each segment by d on a side, join at convex vertices with a fillet
  // arc (quantum π/(2·quadSegs)), bevel, or mitre apex; trim concave
  // vertices at the offset-line intersection; endcaps round / square /
  // flat. The corpus inputs are simple paths/convex rings, so the ring
  // is assembled directly without noding.

  private def unit(a: P, b: P): (Double, Double) = {
    val h = math.hypot(b.x - a.x, b.y - a.y)
    ((b.x - a.x) / h, (b.y - a.y) / h)
  }

  /** Fillet points swept CLOCKWISE from startAngle toward endAngle;
    * emits the start point and interior points but NOT the exact end
    * (the caller's next vertex supplies it) — JTS's addDirectedFillet. */
  private def filletCw(c: P, startAngle: Double, endAngle: Double, r: Double,
      quadSegs: Int): Seq[P] = {
    val quantum = math.Pi / (2 * quadSegs)
    var total = startAngle - endAngle
    while (total <= 0) total += 2 * math.Pi
    while (total > 2 * math.Pi) total -= 2 * math.Pi
    val nSegs = math.max(1, math.round(total / quantum).toInt)
    val inc = total / nSegs
    (0 until nSegs).map { k =>
      val a = startAngle - k * inc
      P(c.x + r * math.cos(a), c.y + r * math.sin(a))
    }
  }

  private def lineIntersect(p1: P, d1: (Double, Double), p2: P, d2: (Double, Double)): P = {
    val den = d1._1 * d2._2 - d1._2 * d2._1
    val t = ((p2.x - p1.x) * d2._2 - (p2.y - p1.y) * d2._1) / den
    P(p1.x + t * d1._1, p1.y + t * d1._2)
  }

  /** Left-side offset curve of an open path (no caps). `join` applies at
    * convex vertices; concave vertices trim at the offset intersection. */
  private def leftOffset(pts: Seq[P], d: Double, join: String, quadSegs: Int): Seq[P] = {
    val dirs = pts.sliding(2).map { case Seq(a, b) => unit(a, b) }.toIndexedSeq
    def normal(dir: (Double, Double)) = (-dir._2, dir._1)
    val out = scala.collection.mutable.ArrayBuffer.empty[P]
    val n0 = normal(dirs.head)
    out += P(pts.head.x + n0._1 * d, pts.head.y + n0._2 * d)
    for (i <- 1 until dirs.length) {
      val v = pts(i)
      val (dp, dc) = (dirs(i - 1), dirs(i))
      val (np, nc) = (normal(dp), normal(dc))
      val bPrev = P(v.x + np._1 * d, v.y + np._2 * d)
      val aCur = P(v.x + nc._1 * d, v.y + nc._2 * d)
      val cross = dp._1 * dc._2 - dp._2 * dc._1
      if (cross < -1e-12) { // right turn → convex on the left side
        join match {
          case "mitre" => out += lineIntersect(bPrev, dp, aCur, dc)
          case "bevel" => out += bPrev; out += aCur
          case _ =>
            out += bPrev
            out ++= filletCw(v, math.atan2(np._2, np._1), math.atan2(nc._2, nc._1), d, quadSegs).drop(1)
            out += aCur
        }
      } else if (cross > 1e-12) { // concave: trim
        out += lineIntersect(bPrev, dp, aCur, dc)
      } else out += bPrev // straight through
    }
    val nl = normal(dirs.last)
    out += P(pts.last.x + nl._1 * d, pts.last.y + nl._2 * d)
    out.toSeq
  }

  /** Endcap from the left-offset end around `tip` to the reverse side.
    * Round emits the full half-circle start-inclusive (the next curve
    * supplies the antipode); square emits the two extended corners;
    * flat emits nothing. */
  private def cap(tip: P, dir: (Double, Double), d: Double, style: String,
      quadSegs: Int): Seq[P] = {
    val nAng = math.atan2(dir._1, -dir._2) // angle of left normal
    style match {
      case "square" => Seq(
        P(tip.x - dir._2 * d + dir._1 * d, tip.y + dir._1 * d + dir._2 * d),
        P(tip.x + dir._2 * d + dir._1 * d, tip.y - dir._1 * d + dir._2 * d))
      case "flat" => Nil
      case _ => filletCw(tip, nAng, nAng - math.Pi, d, quadSegs)
    }
  }

  /** Drop NEAR-duplicate consecutive vertices (1e-9 — the seams between
    * curve pieces compute the same point two ways); genuine close-but-
    * distinct points (tiny input edges) stay, as JTS keeps them. */
  private def cleanRing(ps0: Seq[P]): Seq[P] = {
    var ps = ps0
    def near(a: P, b: P) = math.abs(a.x - b.x) < 1e-9 && math.abs(a.y - b.y) < 1e-9
    val dedup = ps.foldLeft(Vector.empty[P])((acc, p) =>
      if (acc.nonEmpty && near(acc.last, p)) acc else acc :+ p)
    val open = if (dedup.length > 1 && near(dedup.head, dedup.last)) dedup.dropRight(1) else dedup
    open :+ open.head
  }

  /** Full both-sides buffer of an open path. A square cap emits only its
    * two corners, and the following side's first offset point is NOT
    * emitted (JTS's OffsetSegmentGenerator never adds it — the segment
    * runs corner → next curve point, passing through it collinearly). */
  def bufferLine(pts: Seq[P], d: Double, endcap: String, join: String,
      quadSegs: Int): G = {
    val fwd0 = leftOffset(pts, d, join, quadSegs)
    val bwd0 = leftOffset(pts.reverse, d, join, quadSegs)
    val (fwd, bwd) =
      if (endcap == "square") (fwd0.drop(1), bwd0.drop(1)) else (fwd0, bwd0)
    val dirLast = unit(pts(pts.length - 2), pts.last)
    val dirFirstRev = unit(pts(1), pts.head)
    val ring = fwd ++ cap(pts.last, dirLast, d, endcap, quadSegs) ++
      bwd ++ cap(pts.head, dirFirstRev, d, endcap, quadSegs)
    G("POLYGON", Seq(cleanRing(ring)))
  }

  /** Single-sided buffer: the path plus its offset curve on one side. */
  def bufferSided(pts: Seq[P], d: Double, join: String, quadSegs: Int,
      left: Boolean): G = {
    val ring =
      if (left) pts.reverse ++ leftOffset(pts, d, join, quadSegs)
      else pts ++ leftOffset(pts.reverse, d, join, quadSegs)
    G("POLYGON", Seq(cleanRing(ring)))
  }

  // ---- polygon boolean difference (Weiler–Atherton walk) ---------------

  private def ringAreaOf(ring: Seq[P]): Double = ringAreaSigned(ring :+ ring.head)

  /** Insert boundary-crossing points into a ring (open vertex list),
    * returning the augmented ring plus the set of crossing points. */
  private def nodeRing(ring: Seq[P], other: Seq[P]): (Vector[P], Set[P]) = {
    val out = Vector.newBuilder[P]
    val xs = Set.newBuilder[P]
    val n = ring.length
    val m = other.length
    for (i <- 0 until n) {
      val (a, b) = (ring(i), ring((i + 1) % n))
      out += a
      val hits = scala.collection.mutable.ArrayBuffer.empty[(Double, P)]
      for (j <- 0 until m) {
        val (c, d) = (other(j), other((j + 1) % m))
        val d1x = b.x - a.x; val d1y = b.y - a.y
        val d2x = d.x - c.x; val d2y = d.y - c.y
        val den = d1x * d2y - d1y * d2x
        if (den != 0) {
          val t = ((c.x - a.x) * d2y - (c.y - a.y) * d2x) / den
          val u = ((c.x - a.x) * d1y - (c.y - a.y) * d1x) / den
          if (t > 1e-12 && t < 1 - 1e-12 && u > -1e-12 && u < 1 + 1e-12) {
            val p = P(a.x + t * d1x, a.y + t * d1y)
            hits += ((t, p)); xs += p
          }
        }
      }
      hits.sortBy(_._1).foreach(out += _._2)
    }
    (out.result(), xs.result())
  }

  /** A \ B for simple polygons with clean boundary crossings: walk A's
    * shell clockwise outside B, switching to B's shell (counter-
    * clockwise) at each entry crossing — output shells come out CW, the
    * reference's JTS overlay convention. */
  def difference(a: G, b: G): G = {
    val ra0 = a.rings.head.dropRight(1)
    val rb0 = b.rings.head.dropRight(1)
    val aCw = if (ringAreaOf(ra0) > 0) ra0.reverse else ra0
    val bCcw = if (ringAreaOf(rb0) > 0) rb0 else rb0.reverse
    val (aug, cross) = nodeRing(aCw, bCcw)
    if (cross.isEmpty)
      return if (aCw.forall(p => inPoly(p, b))) G("POLYGON") else a
    val (bAug, _) = nodeRing(bCcw, aCw)
    def midInside(ring: Vector[P], i: Int, poly: G): Boolean = {
      val (p, q) = (ring(i), ring((i + 1) % ring.length))
      val mid = P((p.x + q.x) / 2, (p.y + q.y) / 2)
      inPoly(mid, poly) && !onBoundary(poly, mid)
    }
    val rings = scala.collection.mutable.ArrayBuffer.empty[Seq[P]]
    val visited = scala.collection.mutable.Set.empty[P]
    for (start <- aug.indices
         if cross.contains(aug(start)) && !visited.contains(aug(start)) &&
           !midInside(aug, start, b)) {
      // exit crossing: the following A segment lies outside B
      val ring = scala.collection.mutable.ArrayBuffer.empty[P]
      var onA = true
      var i = start
      var cur = aug(i)
      var guard = 0
      do {
        ring += cur
        if (cross.contains(cur)) visited += cur
        if (onA) {
          i = (i + 1) % aug.length
          cur = aug(i)
          if (cross.contains(cur) && midInside(aug, i, b)) {
            // entering B: switch to B's ring at the matching node
            onA = false
            i = bAug.indexWhere(p => math.abs(p.x - cur.x) < 1e-9 && math.abs(p.y - cur.y) < 1e-9)
          }
        } else {
          i = (i + 1) % bAug.length
          cur = bAug(i)
          if (cross.contains(cur)) {
            onA = true
            i = aug.indexWhere(p => math.abs(p.x - cur.x) < 1e-9 && math.abs(p.y - cur.y) < 1e-9)
          }
        }
        guard += 1
      } while (cur != aug(start) && guard < 10000)
      rings += (ring.toSeq :+ ring.head)
    }
    rings.toSeq match {
      case Seq() => G("POLYGON")
      case Seq(one) => G("POLYGON", Seq(one))
      case many => G("MULTIPOLYGON", parts = many.map(r => G("POLYGON", Seq(r))))
    }
  }

  def symDifference(a: G, b: G): G = {
    def shells(x: G): Seq[G] = x.gtype match {
      case "POLYGON" if x.rings.nonEmpty => Seq(x)
      case "MULTIPOLYGON" => x.parts
      case _ => Nil
    }
    val parts = shells(difference(a, b)) ++ shells(difference(b, a))
    parts match {
      case Seq() => G("POLYGON")
      case Seq(one) => one
      case many => G("MULTIPOLYGON", parts = many)
    }
  }

  // ---- topology-preserving simplification ------------------------------

  /** JTS TopologyPreservingSimplifier's section recursion (ref:
    * simplify/TaggedLineStringSimplifier.java): a section [i, j] may
    * flatten to one segment only when every dropped point is within the
    * tolerance, the flattened segment doesn't properly cross the rest of
    * the ring, and the ring keeps >= 4 coordinates; otherwise split at
    * the furthest point. */
  def simplifyPreserve(g: G, tol: Double): G = {
    if (g.gtype != "POLYGON") return simplify(g, tol)
    val pts = g.rings.head.toIndexedSeq // closed (last == first)
    val n = pts.length
    val minSize = 4 // ring coordinate minimum (JTS TaggedLineString)
    // sections are processed left to right; `kept` records each emitted
    // segment's start index, resultSegs the JTS getResultSize() input
    val kept = scala.collection.mutable.ArrayBuffer.empty[Int]
    var resultSegs = 0
    def resultSize = if (resultSegs == 0) 0 else resultSegs + 1
    def segDistTo(p: P, a: P, b: P): Double = {
      val (dx, dy) = (b.x - a.x, b.y - a.y)
      val l2 = dx * dx + dy * dy
      if (l2 == 0) return math.hypot(p.x - a.x, p.y - a.y)
      val t = math.max(0.0, math.min(1.0, ((p.x - a.x) * dx + (p.y - a.y) * dy) / l2))
      math.hypot(p.x - (a.x + t * dx), p.y - (a.y + t * dy))
    }
    def properCross(a: P, b: P, c: P, d: P): Boolean = {
      val d1x = b.x - a.x; val d1y = b.y - a.y
      val d2x = d.x - c.x; val d2y = d.y - c.y
      val den = d1x * d2y - d1y * d2x
      if (den == 0) return false
      val t = ((c.x - a.x) * d2y - (c.y - a.y) * d2x) / den
      val u = ((c.x - a.x) * d1y - (c.y - a.y) * d1x) / den
      t > 1e-12 && t < 1 - 1e-12 && u > 1e-12 && u < 1 - 1e-12
    }
    // JTS keeps a live segment index: flattening REMOVES the section's
    // input segments and ADDS the new segment, so later crossing checks
    // see the current (partially simplified) ring, not the original
    val removed = scala.collection.mutable.Set.empty[Int]
    val outSegs = scala.collection.mutable.ArrayBuffer.empty[(P, P)]
    /** JTS TaggedLineStringSimplifier.simplifySection: the depth+1
      * worst-case guard keeps enough coordinates in the ring; flattening
      * requires in-tolerance distance and no crossing with the rest. */
    def simplifySection(i: Int, j: Int, depth0: Int): Unit = {
      val depth = depth0 + 1
      if (i + 1 == j) {
        kept += i; resultSegs += 1; outSegs += ((pts(i), pts(j)))
        return
      }
      var valid = true
      if (resultSize < minSize && depth + 1 < minSize) valid = false
      var furthest = i + 1
      var maxDist = 0.0
      for (k <- i + 1 until j) {
        val d = segDistTo(pts(k), pts(i), pts(j))
        if (d > maxDist) { maxDist = d; furthest = k }
      }
      if (maxDist > tol) valid = false
      if (valid) {
        var k = 0
        while (valid && k < n - 1) {
          if ((k + 1 <= i || k >= j) && !removed.contains(k)) {
            if (properCross(pts(i), pts(j), pts(k), pts(k + 1))) valid = false
          }
          k += 1
        }
        var o = 0
        while (valid && o < outSegs.length) {
          val (a, b) = outSegs(o)
          if (properCross(pts(i), pts(j), a, b)) valid = false
          o += 1
        }
      }
      if (valid) {
        kept += i; resultSegs += 1
        (i until j).foreach(removed += _)
        outSegs += ((pts(i), pts(j)))
      } else {
        simplifySection(i, furthest, depth)
        simplifySection(furthest, j, depth)
      }
    }
    simplifySection(0, n - 1, 0)
    G("POLYGON", Seq((kept.toSeq :+ (n - 1)).map(pts)))
  }

  // ---- Delaunay triangulation (Bowyer–Watson) --------------------------

  /** CCW triangles of the Delaunay triangulation of a point set. The
    * corpus sets are in general position, so the triangulation is
    * unique and matches JTS's set-wise. */
  def delaunay(ps0: Seq[P]): Seq[(P, P, P)] = {
    val ps = ps0.map(p => P(p.x, p.y)).distinct
    val minX = ps.map(_.x).min; val maxX = ps.map(_.x).max
    val minY = ps.map(_.y).min; val maxY = ps.map(_.y).max
    val d = math.max(maxX - minX, maxY - minY) * 20 + 10
    val s1 = P(minX - d, minY - d)
    val s2 = P(minX + 2 * d, minY - d)
    val s3 = P(minX - d, minY + 2 * d)
    var tris = List((s1, s2, s3))
    def circum(t: (P, P, P), p: P): Boolean = {
      val (a, b, c) = t
      val ax = a.x - p.x; val ay = a.y - p.y
      val bx = b.x - p.x; val by = b.y - p.y
      val cx = c.x - p.x; val cy = c.y - p.y
      val det = (ax * ax + ay * ay) * (bx * cy - cx * by) -
        (bx * bx + by * by) * (ax * cy - cx * ay) +
        (cx * cx + cy * cy) * (ax * by - bx * ay)
      det > 0 // assumes CCW triangles
    }
    def ccw(t: (P, P, P)): (P, P, P) = {
      val (a, b, c) = t
      if ((b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x) >= 0) t else (a, c, b)
    }
    for (p <- ps) {
      val (bad, good) = tris.partition(t => circum(ccw(t), p))
      val edges = bad.flatMap { case (a, b, c) => Seq((a, b), (b, c), (c, a)) }
      val boundary = edges.filterNot { case (a, b) =>
        edges.exists { case (c, d) => c == b && d == a } }
      tris = good ++ boundary.map { case (a, b) => ccw((a, b, p)) }
    }
    val supers = Set(s1, s2, s3)
    tris.filterNot { case (a, b, c) => supers(a) || supers(b) || supers(c) }
      .map(ccw)
  }

  /** Unique undirected edges of a triangle set, endpoints and list both
    * lexicographically sorted — the reference's `flag = 1` edges form. */
  def triangleEdges(tris: Seq[(P, P, P)]): Seq[(P, P)] = {
    def lt(p: P, q: P): Boolean = p.x < q.x || (p.x == q.x && p.y < q.y)
    tris.flatMap { case (a, b, c) => Seq((a, b), (b, c), (c, a)) }
      .map { case (p, q) => if (lt(q, p)) (q, p) else (p, q) }
      .distinct.sortBy { pq => (pq._1.x, pq._1.y, pq._2.x, pq._2.y) }
  }

  /** Exterior buffer of a simple polygon: offset the shell outward with
    * joins at every vertex (shell oriented CW so its left side faces
    * out, matching JTS's CW output shells). */
  def bufferPolygon(g: G, d: Double, join: String, quadSegs: Int): G = {
    val ring0 = g.rings.head.dropRight(1)
    val cw = if (ringAreaSigned(ring0 :+ ring0.head) > 0) ring0.reverse else ring0
    // process as an open path whose ends wrap: duplicate the first two
    // vertices at the end so every original vertex sees both its edges
    val path = cw ++ cw.take(2)
    val curve = leftOffset(path, d, join, quadSegs)
    // the first and last offset segments are the same edge — drop the
    // partial lead-in/out (first point of curve = offset of cw(0) on the
    // wrapped edge; the join at cw(0) and cw(1) appears near the end)
    val trimmed = curve.drop(1).dropRight(1)
    G("POLYGON", Seq(cleanRing(trimmed)))
  }

  /** Minimum bounding circle over vertices (pairwise/triple search —
    * corpus geometries are tiny), rendered like JTS: a 32-gon. */
  def boundingCircle(g: G): G = {
    val ps = g.allPoints.map(p => P(p.x, p.y)).distinct
    def covers(c: (Double, Double, Double)) =
      ps.forall(p => math.hypot(p.x - c._1, p.y - c._2) <= c._3 + 1e-9)
    def circum(a: P, b: P, c: P): Option[(Double, Double, Double)] = {
      val d = 2 * (a.x * (b.y - c.y) + b.x * (c.y - a.y) + c.x * (a.y - b.y))
      if (math.abs(d) < 1e-12) None
      else {
        val ux = ((a.x * a.x + a.y * a.y) * (b.y - c.y) + (b.x * b.x + b.y * b.y) * (c.y - a.y) +
          (c.x * c.x + c.y * c.y) * (a.y - b.y)) / d
        val uy = ((a.x * a.x + a.y * a.y) * (c.x - b.x) + (b.x * b.x + b.y * b.y) * (a.x - c.x) +
          (c.x * c.x + c.y * c.y) * (b.x - a.x)) / d
        Some((ux, uy, math.hypot(a.x - ux, a.y - uy)))
      }
    }
    if (ps.length == 1) return G("POINT", Seq(ps))
    val pairs = for (i <- ps.indices; j <- i + 1 until ps.length) yield {
      val (a, b) = (ps(i), ps(j))
      ((a.x + b.x) / 2, (a.y + b.y) / 2, dist(a, b) / 2)
    }
    val triples = for {
      i <- ps.indices; j <- i + 1 until ps.length; k <- j + 1 until ps.length
      c <- circum(ps(i), ps(j), ps(k))
    } yield c
    val best = (pairs ++ triples).filter(covers).minBy(_._3)
    circle(best._1, best._2, best._3)
  }

  /** JTS normalize: MULTIPOINT sorted ascending; LINESTRING direction
    * chosen so the coordinate sequence is lexicographically smallest;
    * POLYGON shell rotated to its minimum coordinate and oriented CW
    * (holes CCW). */
  def normalize(g: G): G = {
    implicit val ord: Ordering[P] = Ordering.by(p => (p.x, p.y))
    def seqCmp(a: Seq[P], b: Seq[P]): Int =
      a.zip(b).iterator.map { case (p, q) => ord.compare(p, q) }.find(_ != 0)
        .getOrElse(a.length - b.length)
    def normRing(ring: Seq[P], cw: Boolean): Seq[P] = {
      val open = if (ring.head == ring.last) ring.dropRight(1) else ring
      val minI = open.indices.minBy(open(_))
      val rot = open.drop(minI) ++ open.take(minI)
      val isCw = ringAreaSigned(rot :+ rot.head) < 0
      val oriented = if (isCw == cw) rot else rot.head +: rot.tail.reverse
      oriented :+ oriented.head
    }
    g.gtype match {
      case "MULTIPOINT" => G("MULTIPOINT", Seq(g.pts.sorted))
      case "LINESTRING" =>
        if (seqCmp(g.pts.reverse, g.pts) < 0) G("LINESTRING", Seq(g.pts.reverse)) else g
      case "POLYGON" =>
        G("POLYGON", normRing(g.rings.head, cw = true) +: g.rings.tail.map(normRing(_, cw = false)))
      case _ => g
    }
  }

  /** Nearest point ON `a` (vertex-or-segment projection) to any vertex
    * of `b`. */
  def closestPoint(a: G, b: G): P = {
    def segs(g: G): Seq[(P, P)] =
      g.rings.flatMap(_.sliding(2).collect { case Seq(p, q) => (p, q) }.toSeq) ++
        g.parts.flatMap(segs)
    def proj(p: P, s: (P, P)): P = {
      val (u, v) = s
      val (dx, dy) = (v.x - u.x, v.y - u.y)
      val l2 = dx * dx + dy * dy
      if (l2 == 0) u
      else {
        val t = math.max(0, math.min(1, ((p.x - u.x) * dx + (p.y - u.y) * dy) / l2))
        P(u.x + t * dx, u.y + t * dy)
      }
    }
    val inA = b.allPoints.filter(q => containsPoint(a, q))
    if (inA.nonEmpty) return inA.head
    val sa = segs(a)
    val candidates =
      if (sa.isEmpty) a.allPoints.map(p => (p, b.allPoints.map(q => dist(p, q)).min))
      else for (q <- b.allPoints; s <- sa; c = proj(q, s)) yield (c, dist(c, q))
    candidates.minBy(_._2)._1
  }

  /** Douglas–Peucker per ring. */
  def simplify(g: G, tol: Double): G = {
    def perp(p: P, a: P, b: P): Double = {
      val l = dist(a, b)
      if (l == 0) dist(p, a)
      else math.abs((b.x - a.x) * (a.y - p.y) - (a.x - p.x) * (b.y - a.y)) / l
    }
    def dp(ps: Seq[P]): Seq[P] =
      if (ps.length <= 2) ps
      else {
        val (a, b) = (ps.head, ps.last)
        val (maxD, maxI) = ps.zipWithIndex.drop(1).dropRight(1)
          .map { case (p, i) => (perp(p, a, b), i) }
          .foldLeft((-1.0, -1)) { case (acc, c) => if (c._1 > acc._1) c else acc }
        if (maxD <= tol) Seq(a, b)
        else dp(ps.take(maxI + 1)) ++ dp(ps.drop(maxI)).tail
      }
    val rings = g.rings.map(dp)
    if (g.gtype == "POLYGON" && rings.exists(_.length < 4)) G("POLYGON")
    else G(g.gtype, rings, g.parts.map(simplify(_, tol)))
  }
}
