package graft

import org.apache.spark.sql.functions._

/** `emb_mrl_topk` funnel semantics, recomputed independently in plain
  * Scala from the collected vectors: coarse top-16 by 8-dim-prefix
  * cosine (ties: c_id asc), exact full-dim re-rank of that candidate
  * set to top-3. Left-to-right double summation matches the engine's
  * ordered-fold DotProductExpr bit-for-bit.
  */
class MrlFunnelSpec extends SparkSpecBase {

  private def cos(a: Array[Float], b: Array[Float], dims: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(dims, math.min(a.length, b.length))
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("engine funnel equals the independent coarse->refine recomputation") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .toMap
    val expected = vecs.keys.filter(_ < 10).toSeq.sorted.flatMap { q =>
      val coarse = vecs.keys.filter(_ != q).toSeq
        .map(c => (c, cos(vecs(q), vecs(c), 8)))
        .sortBy { case (c, s) => (-s, c) }
        .take(16)
      coarse
        .map { case (c, _) => (c, cos(vecs(q), vecs(c), Int.MaxValue)) }
        .sortBy { case (c, s) => (-s, c) }
        .take(3).zipWithIndex
        .map { case ((c, _), i) => (q, (i + 1).toLong, c) }
    }
    val got = SparkEntry.queries("emb_mrl_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
      .toSeq
    assert(got == expected)
  }
}
