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
}
