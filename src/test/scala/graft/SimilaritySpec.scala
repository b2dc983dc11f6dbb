package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** SURVEY.md §5.2.2 — unit verification for the N-operators (no DuckDB
  * oracle): recall/precision properties of the dedup family and exact
  * agreement of the similarity-search family with an independent
  * in-test implementation.
  */
class SimilaritySpec extends SparkSpecBase {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  /** The only fixture scale with exact-duplicate documents is sf0.1 —
    * the dup-recall properties run there.
    */
  private val dupDir = "/root/testdata/sf0.1"
  private def runAtDupScale(name: String) =
    SparkEntry.queries(name)(spark, dupDir)

  /** All unordered exact-duplicate pairs (same full text). */
  private lazy val exactDupPairs: Set[(Long, Long)] = {
    val groups = Tables.documents(spark, dupDir)
      .groupBy(col("text"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(col("ids")).collect()
    groups.flatMap { r =>
      val ids = r.getSeq[Long](0).sorted
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
  }

  private def pairSet(name: String): Set[(Long, Long)] =
    run(name).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("dedup_minhash recalls every exact-duplicate pair") {
    assert(exactDupPairs.nonEmpty, "fixture has no exact dups at sf0.1")
    val found = runAtDupScale("dedup_minhash").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactDupPairs.subsetOf(found),
      s"missing: ${exactDupPairs -- found}")
  }

  test("dedup_simhash recalls every exact-duplicate pair (hamming 0)") {
    val found = runAtDupScale("dedup_simhash").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactDupPairs.subsetOf(found),
      s"missing: ${exactDupPairs -- found}")
  }

  test("dedup_ngram_jaccard recalls every exact-duplicate pair") {
    val found = runAtDupScale("dedup_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactDupPairs.subsetOf(found),
      s"missing: ${exactDupPairs -- found}")
  }

  test("dedup_ngram_jaccard pairs all satisfy jaccard >= 0.4 exactly") {
    run("dedup_ngram_jaccard").collect().foreach { r =>
      val (inter, union) = (r.getLong(2), r.getLong(3))
      assert(inter * 5 >= union * 2, s"pair $r below threshold")
    }
  }

  // --- independent cosine implementation for cross-checks ---

  private lazy val vecs: Map[Long, Array[Double]] =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray
      }.toMap

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("dedup_embedding_cosine: every reported pair truly has cos >= 0.45") {
    val found = pairSet("dedup_embedding_cosine")
    assert(found.nonEmpty)
    found.foreach { case (a, b) =>
      assert(cos(vecs(a), vecs(b)) >= 0.4499999,
        s"pair ($a,$b) cos=${cos(vecs(a), vecs(b))}")
    }
  }

  test("sim_search_topk matches an independent brute-force ranking") {
    val expected = vecs.keys.filter(_ < 10).toSeq.sorted.flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .map(c => (c, cos(vecs(q), vecs(c))))
        .sortBy { case (c, s) => (-s, c) }
        .take(3).zipWithIndex
        .map { case ((c, _), i) => Row(q, i + 1, c) }
    }
    val got = run("sim_search_topk").collect()
      .map(r => Row(r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("ann_ivf_topk agrees exactly with an independent IVF recomputation") {
    val centIds = vecs.keys.filter(id => id >= 100 && id <= 115).toSeq.sorted
    def nearestCents(v: Array[Double], n: Int): Seq[Long] =
      centIds.map(c => (c, cos(v, vecs(c))))
        .sortBy { case (c, s) => (-s, c) }.take(n).map(_._1)
    val assignment: Map[Long, Long] =
      vecs.map { case (id, v) => id -> nearestCents(v, 1).head }
    val expected = vecs.keys.filter(_ < 10).toSeq.sorted.map { q =>
      val probed = nearestCents(vecs(q), 2).toSet
      val cands = assignment.collect {
        case (id, c) if probed(c) && id != q => id
      }
      val best = cands.map(c => (c, cos(vecs(q), vecs(c))))
        .toSeq.sortBy { case (c, s) => (-s, c) }.head._1
      (q, best)
    }
    val got = run("ann_ivf_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("ann_lsh_topk returns each query's true best within its candidates") {
    val got = run("ann_lsh_topk").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == vecs.keys.filter(_ < 10).toSet)
    // neighbor must be strictly better-or-equal than any other vector
    // sharing a band is hard to recheck without reimplementing LSH;
    // minimally: the reported neighbor's cosine must be within the
    // brute-force top-50 for that query (sanity against garbage)
    got.foreach { case (q, n) =>
      val rank = vecs.keys.filter(_ != q).toSeq
        .map(c => (c, cos(vecs(q), vecs(c))))
        .sortBy { case (c, s) => (-s, c) }
        .indexWhere(_._1 == n)
      assert(rank >= 0 && rank < 50, s"query $q neighbor $n rank=$rank")
    }
  }

  // --- codegen'd signature expressions vs their interpreted forms ---

  test("SignProjectionExpr is bit-identical to the interpreted HOF form") {
    import org.apache.spark.sql.types.DoubleType
    val rnd = new scala.util.Random(42)
    val planes = Seq.fill(64)(Seq.fill(64)(rnd.nextGaussian()))
    val hp = typedLit(planes)
    val interpreted = transform(sequence(lit(0), lit(7)), b =>
      aggregate(sequence(lit(0), lit(7)), lit(0L), (acc, i) =>
        acc * 2 + when(
          aggregate(
            zip_with(col("embedding"),
              element_at(hp, (b * 8 + i + 1).cast("int")),
              (x, y) => x.cast(DoubleType) * y),
            lit(0.0), (a2, v) => a2 + v) >= 0, 1L).otherwise(0L)))
    val mismatches = Tables.embeddings(spark, sfDir)
      .select(
        functions.SignProjectionExpr.bands(col("embedding"), planes, 8)
          .as("cg"),
        interpreted.as("ip"))
      .filter(col("cg") =!= col("ip"))
      .count()
    assert(mismatches == 0)
  }

  test("SimHashAgg bands are bit-identical to the 64-column aggregate") {
    // the r3 formulation this aggregate replaced: one sum(when(...))
    // per signature bit, then a fold packing 16 sign bits per band
    // (lowest bit index = most significant packed bit)
    def packBits(off: Int, n: Int) =
      (off until off + n).map(b =>
          when(col(s"s$b") >= 0, 1L).otherwise(0L))
        .reduce((acc, bit) => acc * 2 + bit)
    val toks = Tables.documents(spark, dupDir)
      .select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val legacy = toks.groupBy(col("doc_id"))
      .agg(
        sum(when(col("h").bitwiseAND(lit(1L)) === 1, 1L).otherwise(-1L))
          .as("s0"),
        (1 until 64).map(b =>
          sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1,
            1L).otherwise(-1L)).as(s"s$b")): _*)
      .select(col("doc_id"),
        array(packBits(0, 16), packBits(16, 16),
          packBits(32, 16), packBits(48, 16)).as("ip"))
    val mismatches = toks.groupBy(col("doc_id"))
      .agg(functions.SimHashAgg.bands(col("h")).as("cg"))
      .join(legacy, "doc_id")
      .filter(col("cg") =!= col("ip"))
      .count()
    assert(mismatches == 0)
  }

  test("MinHashSigExpr is bit-identical to the interpreted HOF form") {
    val interpreted = expr(
      "transform(sequence(0, 15), i -> array_min(transform(hset, h -> xxhash64(h, i))))")
    val mismatches = Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("hset",
        expr("array_distinct(transform(toks, t -> xxhash64(t)))"))
      .select(functions.MinHashSigExpr.sig(col("hset"), 16).as("cg"),
        interpreted.as("ip"))
      .filter(col("cg") =!= col("ip"))
      .count()
    assert(mismatches == 0)
  }

  test("contamination_embedding equals an independent recomputation") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray.map(_.toDouble))).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val nv = vecs.map { case (id, v) =>
      val n = math.sqrt(dot(v, v)); id -> v.map(_ / n)
    }
    val bench = nv.filter(_._1 < 20)
    val got = SparkEntry.queries("contamination_embedding")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got.keySet == vecs.keySet)
    nv.foreach { case (id, v) =>
      val exp = bench.exists { case (b, bv) =>
        b != id && dot(v, bv) >= 0.45
      }
      assert(got(id) == exp, s"vector $id contamination flag")
    }
    // no non-emptiness assertion: whether any corpus vector sits
    // within 0.45 of the bounded benchmark is a property of the
    // fixture (none do at sf0.001); the per-flag agreement above is
    // the contract
  }

  test("dedup_semantic agrees with an independent driver recomputation") {
    // From-scratch Scala recomputation of the SemDeDup definition
    // (normalize -> nearest of the ~sqrt(N) corpus-sized centroid
    // slice (r10: IvfIndexBuilder.nlistFor) -> same-cluster
    // cos >= 0.45 vs any smaller id) with the same left-to-right
    // IEEE folds.
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray.map(_.toDouble))).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val nv = vecs.map { case (id, v) =>
      val n = math.sqrt(dot(v, v)); id -> v.map(_ / n)
    }
    val k = graft.operators.IvfIndexBuilder.nlistFor(nv.size.toLong)
    val cents = nv.filter { case (id, _) => id >= 100 && id < 100 + k }
      .toSeq.sortBy(_._1)
    val assign = nv.map { case (id, v) =>
      id -> cents.minBy { case (cid, cv) => (-dot(v, cv), cid) }._1
    }
    val expDups = (for {
      (b, cb) <- assign.toSeq
      (a, ca) <- assign.toSeq
      if ca == cb && a < b && dot(nv(a), nv(b)) >= 0.45
    } yield b).toSet
    val got = SparkEntry.queries("dedup_semantic")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.map(_._1).toSet == vecs.keySet, "every vector labeled once")
    got.foreach { case (id, cid, isDup) =>
      assert(cid == assign(id), s"vector $id assigned to wrong centroid")
      assert(isDup == expDups.contains(id), s"vector $id dup flag wrong")
    }
  }
}
