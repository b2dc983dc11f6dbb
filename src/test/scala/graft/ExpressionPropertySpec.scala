package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generator-driven properties for the custom codegen expressions:
  * the fixture-based equivalence tests (SimilaritySpec) only see the
  * value distributions the fixtures happen to contain, so these
  * suites drive the same kernels with adversarial GENERATED inputs —
  * empty/identical/disjoint sets, denormal-adjacent doubles, skewed
  * lengths — and compare against independent Scala references. All
  * generated cases for a property ride in ONE DataFrame (one Spark
  * job per property, not per case).
  */
class ExpressionPropertySpec extends SparkSpecBase {

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val sortedDistinctLongs: Gen[Seq[Long]] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue))
        .map(_.distinct.sorted.toSeq))

  test("SortedIntersectCountExpr equals set intersection on random arrays") {
    val s = spark
    import s.implicits._
    val base = sample(sortedDistinctLongs, 120)
    // adversarial pairings: random-random, identical, disjoint-by-
    // construction, and one-empty
    val pairs = base.grouped(2).collect { case Seq(a, b) => (a, b) }.toSeq ++
      base.take(20).map(a => (a, a)) ++
      base.take(20).map(a => (a, a.map(x => x ^ Long.MinValue).distinct.sorted.diff(a))) ++
      base.take(10).map(a => (a, Seq.empty[Long]))
    val expected = pairs.map { case (a, b) => a.toSet.intersect(b.toSet).size.toLong }
    val got = pairs.toDF("a", "b")
      .select(functions.SortedIntersectCountExpr.count(col("a"), col("b")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == expected)
  }

  private val vec64: Gen[Seq[Double]] =
    Gen.listOfN(64, Gen.oneOf(
      Gen.chooseNum(-10.0, 10.0),
      Gen.oneOf(0.0, -0.0, 1e-300, -1e-300, 1e300, 0.1, -0.1)))
      .map(_.toSeq)

  test("DotProductExpr equals the left-to-right fold bit-for-bit") {
    val s = spark
    import s.implicits._
    val pairs = sample(Gen.zip(vec64, vec64), 100)
    val expected = pairs.map { case (a, b) =>
      var acc = 0.0
      var i = 0
      while (i < 64) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val got = pairs.toDF("a", "b")
      .select(functions.DotProductExpr.dot(col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq
    // bit-exact, not epsilon: the whole oracle-pairing strategy rests
    // on the summation order being reproducible
    assert(got.map(java.lang.Double.doubleToLongBits) ==
      expected.map(java.lang.Double.doubleToLongBits))
  }

  test("MinHashSigExpr equals the interpreted HOF form on random hash sets") {
    val s = spark
    import s.implicits._
    val sets = sample(sortedDistinctLongs.suchThat(_.nonEmpty), 100)
    val df = sets.toDF("hset")
    val mismatches = df.select(
        functions.MinHashSigExpr.sig(col("hset"), 16).as("cg"),
        expr("transform(sequence(0, 15), i -> array_min(transform(hset, h -> xxhash64(h, i))))")
          .as("ip"))
      .filter(col("cg") =!= col("ip"))
      .count()
    assert(mismatches == 0)
  }

  test("SignProjectionExpr bands stay within 8-bit range on random vectors") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val planes = Seq.fill(64)(Seq.fill(64)(rnd.nextGaussian()))
    val vecs = sample(vec64, 80).map(_.map(_.toFloat))
    val rows = vecs.toDF("embedding")
      .select(functions.SignProjectionExpr.bands(col("embedding"), planes, 8))
      .collect().map(_.getSeq[Long](0))
    rows.foreach { bands =>
      assert(bands.length == 8)
      bands.foreach(b => assert(b >= 0L && b < 256L, s"band $b out of range"))
    }
  }
}
