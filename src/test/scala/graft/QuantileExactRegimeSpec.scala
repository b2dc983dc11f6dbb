package graft

import org.apache.spark.sql.functions._

/** The exactness theorem behind agg_approx_quantile's r12 oracle
  * pairing (r11 verdict #5): a GK summary answers rank queries within
  * ε·n ranks (ε = 1/accuracy), merged partial summaries' ABSOLUTE
  * rank errors add over disjoint inputs (ε·n₁ + ε·n₂ = ε·n), and a
  * rank error strictly below 0.5 is an integer error of exactly 0 —
  * so at accuracy = 10⁷ and n < 5·10⁶ the sketch MUST return the
  * element percentile_disc picks, under ANY partitioning and merge
  * order. This spec pins the theorem against Spark's implementation
  * over adversarial inputs: heavy ties, group sizes that make
  * ceil/floor rank formulas diverge (n·q near integers), and 1/3/32
  * partitions (different merge trees). If this ever fails, the
  * CORRECTNESS pairing of agg_approx_quantile is the next thing to
  * fail — this is the canary with the readable message.
  */
class QuantileExactRegimeSpec extends SparkSpecBase {

  test("percentile_approx at accuracy 1e7 equals percentile_disc " +
    "under any partitioning (30 seeds x 3 layouts)") {
    import spark.implicits._
    val ps = Seq(0.5, 0.9, 0.99)
    for (seed <- 1 to 30) {
      val rnd = new scala.util.Random(seed)
      // sizes that exercise the rank-rounding edges (q·n integral and
      // near-integral) plus heavy ties from the /2.0 quantization
      val n = Seq(1, 2, 3, 4, 5, 10, 20, 100, 101,
        1 + rnd.nextInt(400))(rnd.nextInt(10))
      val vals = Seq.fill(n)(rnd.nextInt(20) / 2.0)
      for (parts <- Seq(1, 3, 32)) {
        val df = vals.toDF("x").repartition(parts)
        val row = df.agg(
          expr("percentile_approx(x, array(0.5D, 0.9D, 0.99D), 10000000)"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY x)"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY x)"),
          expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY x)")).head()
        val approx = row.getSeq[Double](0)
        val disc = Seq(row.getDouble(1), row.getDouble(2), row.getDouble(3))
        assert(approx == disc,
          s"seed=$seed n=$n parts=$parts: approx=$approx disc=$disc " +
            s"(ps=$ps, vals=${vals.sorted.mkString(",")})")
      }
    }
  }

  test("the estimate regime (accuracy << n) stays within its GK rank " +
    "bound — the production parameters remain property-covered") {
    import spark.implicits._
    val n = 20000
    val rnd = new scala.util.Random(11)
    val vals = Seq.fill(n)(rnd.nextDouble() * 1000)
    val sorted = vals.sorted.toIndexedSeq
    val acc = 100 // eps*n = 200 ranks
    val row = vals.toDF("x").repartition(8)
      .agg(expr(s"percentile_approx(x, 0.5D, $acc)")).head()
    val est = row.getDouble(0)
    val rank = sorted.count(_ <= est)
    assert(math.abs(rank - 0.5 * n) <= 2.0 * n / acc,
      s"rank $rank of estimate outside 2eps*n of target ${0.5 * n}")
  }
}
