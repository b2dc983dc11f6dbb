package graft

import graft.operators.IvfIndexBuilder

/** The offline k-means refinement must (non-strictly) improve the mean
  * assigned-cosine objective each round and keep every centroid
  * well-formed.
  */
class IvfIndexBuilderSpec extends SparkSpecBase {

  test("two Lloyd rounds never decrease the objective") {
    val (vecs, c0) = IvfIndexBuilder.prepare(spark, sfDir, 8)
    val o0 = IvfIndexBuilder.objective(vecs, c0)
    val c1 = IvfIndexBuilder.lloydRound(vecs, c0).localCheckpoint()
    val o1 = IvfIndexBuilder.objective(vecs, c1)
    val c2 = IvfIndexBuilder.lloydRound(vecs, c1).localCheckpoint()
    val o2 = IvfIndexBuilder.objective(vecs, c2)
    assert(o1 >= o0 - 1e-9, s"round 1 worsened: $o0 -> $o1")
    assert(o2 >= o1 - 1e-9, s"round 2 worsened: $o1 -> $o2")
  }

  test("refined centroids are unit-norm 64-d vectors") {
    val (vecs, c0) = IvfIndexBuilder.prepare(spark, sfDir, 8)
    val c1 = IvfIndexBuilder.lloydRound(vecs, c0)
    val rows = c1.collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val v = r.getSeq[Double](1)
      assert(v.length == 64)
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"norm $n")
    }
  }
}
