package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StringType}

/** Function registry — the engine's operator-table plug-in layer (ref:
  * sql/SqlOperatorTable.java chaining in prepare/CalcitePrepareImpl.java:
  * 749-760; gap analysis in SURVEY.md §2.6-2.7). Functions Spark already
  * has are not re-registered; what's here is the delta:
  *
  *  - custom expressions: similar_to, to_base32/from_base32;
  *  - expression rewrites (stay codegen'd — they expand to builtins):
  *    degree trig (cosd/sind/tand/acosd/asind/atand), reciprocal trig
  *    (csc/sec/coth/sech/csch), is_inf, strcmp, decode_ora,
  *    to_code_points / code_points_to_string.
  */
object GraftFunctions {

  /** Column-level API (usable without SQL registration). */
  def similar_to(str: Column, pattern: Column): Column =
    column(SimilarTo(expression(str), expression(pattern)))
  def to_base32(c: Column): Column = column(ToBase32(expression(c)))
  def dot_product(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
  def squared_distance(a: Column, b: Column): Column =
    column(SquaredDistance(expression(a), expression(b)))
  def from_base32(c: Column): Column = column(FromBase32(expression(c)))

  private def d(e: Expression): Expression = Cast(e, DoubleType)
  private val DegToRad = Literal(math.Pi / 180.0)
  private val RadToDeg = Literal(180.0 / math.Pi)

  /** name → expression builder, registered into the session's
    * FunctionRegistry so both SQL text and the DSL resolve them. */
  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "similar_to" -> (args => SimilarTo(args(0), args(1))),
    // native codegen dot product over array<float|double> (embeddings)
    "dot_product" -> (args => DotProduct(args(0), args(1))),
    // Morton interleave for z-order clustering (codegen shift/mask)
    "interleave_bits" -> (args => ZOrder.expr(args)),
    "squared_distance" -> (args => SquaredDistance(args(0), args(1))),
    "to_base32" -> (args => ToBase32(args.head)),
    "from_base32" -> (args => FromBase32(args.head)),
    // degree trigonometry (ref: SqlLibraryOperators.java:2479-2524)
    "cosd" -> (args => Cos(Multiply(d(args.head), DegToRad))),
    "sind" -> (args => Sin(Multiply(d(args.head), DegToRad))),
    "tand" -> (args => Tan(Multiply(d(args.head), DegToRad))),
    "acosd" -> (args => Multiply(Acos(d(args.head)), RadToDeg)),
    "asind" -> (args => Multiply(Asin(d(args.head)), RadToDeg)),
    "atand" -> (args => Multiply(Atan(d(args.head)), RadToDeg)),
    // reciprocal/hyperbolic-reciprocal trig (ref: SqlLibraryOperators.java:2533-2563)
    "csc" -> (args => Divide(Literal(1.0), Sin(d(args.head)))),
    "sec" -> (args => Divide(Literal(1.0), Cos(d(args.head)))),
    "coth" -> (args => Divide(Cosh(d(args.head)), Sinh(d(args.head)))),
    "sech" -> (args => Divide(Literal(1.0), Cosh(d(args.head)))),
    "csch" -> (args => Divide(Literal(1.0), Sinh(d(args.head)))),
    // FLOOR/CEIL(e TO unit) datetime rounding + the 1-based ITEM
    // subscript (ref: SqlStdOperatorTable FLOOR/CEIL/ITEM; lowered from
    // SQL text by sql/CollectionSql.scala)
    "floor_to" -> (args => FloorTo(args(0), args(1))),
    // reference AVG-family return-type derivation (conformance adapter)
    "agg_typed" -> (args => AggTyped(args(0), args(1),
      args.length > 2 && args(2).eval(null) == true)),
    "ceil_to" -> (args => CeilTo(args(0), args(1))),
    "item" -> (args => ItemCalcite(args(0), args(1))),
    "calcite_ts" -> (args => CalciteTs(args(0), args(1))),
    // is_inf (ref: SqlLibraryOperators.java:2632)
    "is_inf" -> (args =>
      EqualTo(Abs(d(args.head)), Literal(Double.PositiveInfinity))),
    // strcmp: -1/0/1 string comparison, MySQL semantics
    // (ref: SqlLibraryOperators.java:1121)
    "strcmp" -> (args => CaseWhen(Seq(
      (LessThan(args(0), args(1)), Literal(-1)),
      (GreaterThan(args(0), args(1)), Literal(1))), Literal(0))),
    // Oracle DECODE(expr, s1, r1[, s2, r2]*[, default]) (ref: SqlLibraryOperators.java:266)
    "decode_ora" -> (args => {
      val expr = args.head
      val rest = args.tail
      val (pairs, default) =
        if (rest.length % 2 == 0) (rest.grouped(2).toSeq, None)
        else (rest.init.grouped(2).toSeq, Some(rest.last))
      CaseWhen(pairs.map(p => (EqualNullSafe(expr, p(0)), p(1))), default)
    }),
    // code points (ref: SqlLibraryOperators.java:2398-2421)
    "to_code_points" -> (args =>
      ArrayTransform(
        Sequence(Literal(1), Length(Cast(args.head, StringType)), None),
        LambdaFunction(
          Ascii(Substring(Cast(args.head, StringType), UnresolvedNamedLambdaVariableHack.v("i"), Literal(1))),
          Seq(UnresolvedNamedLambdaVariableHack.v("i"))))),
    "code_points_to_string" -> (args =>
      ArrayJoin(
        // cast pins the element type so a bare NULL argument resolves
        ArrayTransform(Cast(args.head, ArrayType(LongType)),
          LambdaFunction(Chr(UnresolvedNamedLambdaVariableHack.v("c")),
            Seq(UnresolvedNamedLambdaVariableHack.v("c")))),
        Literal(org.apache.spark.unsafe.types.UTF8String.fromString("")), None)),
    // context functions (ref: SqlStdOperatorTable.java:2120-2162 — USER,
    // CURRENT_USER, SESSION_USER, SYSTEM_USER, CURRENT_PATH, CURRENT_ROLE,
    // CURRENT_SCHEMA). Spark natively covers current_user/current_catalog/
    // current_database; the delta maps onto the same session state:
    // USER/SYSTEM_USER ≡ CURRENT_USER (Calcite's DataContext exposes one
    // user identity), CURRENT_SCHEMA ≡ the session database, and
    // CURRENT_PATH/CURRENT_ROLE are '' in Calcite's default context.
    // MULTISET bag operators (functions/Multiset.scala) for the SQL path
    "multiset_intersect_all" -> (args => MultisetIntersectAll(args(0), args(1))),
    "multiset_except_all" -> (args => MultisetExceptAll(args(0), args(1))),
    "submultiset_of" -> (args => SubmultisetOf(args(0), args(1))),
    // seeded integer stream (runtime/RandomFunction.java:66) — 1-arg form
    // draws from an unseeded Random, 2-arg replays the seeded sequence
    "rand_integer" -> (args =>
      if (args.length == 1) RandInteger(Literal(System.nanoTime()), args(0))
      else RandInteger(args(0), args(1))),
    // the VARIANT null value — a contained JSON null, NOT SQL NULL
    // (variant.iq:84-105; SqlLibraryOperators VARIANTNULL)
    "variantnull" -> (_ =>
      org.apache.spark.sql.catalyst.expressions.variant.ParseJson(Literal("null"))),
    // reference TYPEOF: names the contained runtime type of a VARIANT
    "typeof" -> (args => TypeOfCalcite(args(0))),
    "user" -> (_ => CurrentUser()),
    "system_user" -> (_ => CurrentUser()),
    "current_schema" -> (_ => CurrentDatabase()),
    "current_path" -> (_ => Literal("")),
    "current_role" -> (_ => Literal("")))

  /** Register everything into a session (idempotent). */
  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      registry.createOrReplaceTempFunction(name, b, "scala_udf")
    }
    BigQueryFns.registerAll(spark)
    PgDateTime.registerAll(spark)
    IsoFormat.registerAll(spark)
  }

  /** Registered function names (for docs/tests). */
  def names: Seq[String] = builders.map(_._1)
}

/** Named lambda variables for manually-built higher-order expressions. */
private[functions] object UnresolvedNamedLambdaVariableHack {
  def v(name: String): UnresolvedNamedLambdaVariable =
    UnresolvedNamedLambdaVariable(Seq(name))
}
