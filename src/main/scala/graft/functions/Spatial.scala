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

  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (n, b) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(n, b, "scala_udf")
    }
}
