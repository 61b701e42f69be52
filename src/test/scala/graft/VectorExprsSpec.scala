package graft

import graft.functions.GraftFunctions.dot_product
import org.apache.spark.sql.functions._

/** Native DotProduct expression: parity with the higher-order-lambda
  * form (bit-for-bit), null semantics, codegen participation. */
class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  private val lambda = expr(
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")

  test("bit-for-bit parity with aggregate(zip_with(...)) on float arrays") {
    val df = T(spark, sfDir, "embeddings").limit(200)
      .select(col("embedding").as("a"),
        reverse(col("embedding")).as("b"))
    val diff = df.select(
      (dot_product(col("a"), col("b")) === lambda).as("same"))
      .filter(!col("same")).count()
    assert(diff == 0, "native and lambda dot products must be identical doubles")
  }

  test("null array → null; null element → null; length mismatch → shorter prefix") {
    val df = Seq(
      (1, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),   // 11.0
      (2, Seq(1.0f, 2.0f, 9.0f), Seq(5.0f, 6.0f)) // shorter length: 17.0
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), dot_product(col("a"), col("b")).as("d"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    assert(got == Map(1 -> 11.0, 2 -> 17.0))

    val withNulls = df.select(col("id"),
      dot_product(lit(null).cast("array<float>"), col("b")).as("d1"),
      dot_product(array(lit(1.0f), lit(null).cast("float")), col("b")).as("d2"))
      .collect()
    assert(withNulls.forall(r => r.isNullAt(1) && r.isNullAt(2)))
  }

  test("the dot product runs inside whole-stage codegen") {
    val df = T(spark, sfDir, "embeddings")
      .select(dot_product(col("embedding"), col("embedding")).as("d"))
    val codegen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(codegen.contains("WholeStageCodegen"), "expression fell out of codegen")
    assert(df.filter(col("d") > 0).count() > 0)
  }
}
