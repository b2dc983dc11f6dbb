package graft

import org.apache.spark.sql.functions._

import graft.operators.LlmQueries

/** Exact substring-level dedup (dedup_substring): planted duplicated
  * spans must be recalled with the EXACT span length, unique text must
  * report zero, and the stats must be invariant to input partitioning
  * (the global gram count is one shuffle, not a per-partition guess).
  */
class SubstringDedupSpec extends SparkSpecBase {

  // unique filler tokens: u<docid>x<idx> never collides across docs
  private def filler(doc: Int, n: Int, from: Int = 0): Seq[String] =
    (from until from + n).map(i => s"u${doc}x$i")

  private def df(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("a planted cross-doc 12-token span is recalled with exact length") {
    // docs 1 and 2 share exactly one 12-token span at different
    // offsets; all other tokens are globally unique. With k=10 the
    // span yields 3 consecutive duplicated gram starts in each doc:
    // max_dup_span = 3 + 10 - 1 = 12, n_dup_grams = 3.
    val span = (0 until 12).map(i => s"shared$i")
    val d1 = (filler(1, 7) ++ span ++ filler(1, 9, from = 7)).mkString(" ")
    val d2 = (filler(2, 3) ++ span ++ filler(2, 13, from = 3)).mkString(" ")
    val d3 = filler(3, 30).mkString(" ")
    val out = LlmQueries.substringDupStats(
      df(Seq((1L, d1), (2L, d2), (3L, d3))), 10)
      .orderBy(col("doc_id")).collect()
    assert(out.length == 3)
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(byId(1L) == (19L, 3L, 12L, 3L * 10000L / 19L),
      s"doc 1: ${byId(1L)}")
    assert(byId(2L) == (19L, 3L, 12L, 3L * 10000L / 19L),
      s"doc 2: ${byId(2L)}")
    assert(byId(3L) == (21L, 0L, 0L, 0L), s"doc 3: ${byId(3L)}")
  }

  test("in-doc repetition dedups too (the Lee et al. self-repeat rule)") {
    // one doc repeats its own 10-token block back to back: both
    // occurrences' gram digests collide, so n_dup_grams >= 2 and the
    // span covers at least the block
    val block = (0 until 10).map(i => s"rep$i")
    val d1 = (block ++ block ++ filler(1, 10)).mkString(" ")
    val out = LlmQueries.substringDupStats(df(Seq((1L, d1))), 10)
      .collect().head
    assert(out.getLong(2) >= 2L, s"n_dup_grams: ${out.getLong(2)}")
    assert(out.getLong(3) >= 10L, s"max_dup_span: ${out.getLong(3)}")
  }

  test("docs shorter than k report zero grams, zero everything") {
    val out = LlmQueries.substringDupStats(
      df(Seq((1L, filler(1, 5).mkString(" ")), (2L, ""))), 10)
      .orderBy(col("doc_id")).collect()
    out.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L &&
        r.getLong(3) == 0L && r.getLong(4) == 0L, r.toString)
    }
  }

  test("removal keeps the canonical occurrence and drops the later one") {
    // doc 1 holds the canonical (min doc_id) copy of the planted
    // 12-token span; doc 2's copy is non-canonical — doc 2 loses
    // exactly the 12 covered tokens, doc 1 and the unique doc 3 keep
    // everything, and the rebuilt digests prove it byte-exactly
    val span = (0 until 12).map(i => s"shared$i")
    val d1toks = filler(1, 7) ++ span ++ filler(1, 9, from = 7)
    val d2toks = filler(2, 3) ++ span ++ filler(2, 13, from = 3)
    val d3toks = filler(3, 30)
    val out = LlmQueries.substringRemove(
      df(Seq((1L, d1toks.mkString(" ")), (2L, d2toks.mkString(" ")),
        (3L, d3toks.mkString(" ")))), 10)
      .orderBy(col("doc_id")).collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(byId(1L) == (28L, 28L, md5hex(d1toks.mkString(" "))))
    val d2kept = d2toks.take(3) ++ d2toks.drop(15)
    assert(byId(2L) == (28L, 16L, md5hex(d2kept.mkString(" "))),
      s"doc 2: ${byId(2L)}")
    assert(byId(3L) == (30L, 30L, md5hex(d3toks.mkString(" "))))
  }

  test("in-doc repeated block: the second occurrence is removed") {
    val block = (0 until 10).map(i => s"rep$i")
    val tail = filler(1, 10)
    val toks = block ++ block ++ tail
    val out = LlmQueries.substringRemove(
      df(Seq((1L, toks.mkString(" ")))), 10).collect().head
    assert(out.getLong(1) == 30L && out.getLong(2) == 20L,
      s"(n_toks, n_kept) = (${out.getLong(1)}, ${out.getLong(2)})")
  }

  test("contamination_substring agrees with a driver recomputation") {
    // from-scratch Scala recomputation of the 13-gram decontamination
    // over the fixture: eval slice = doc_id % 97 == 0, a train doc is
    // contaminated iff it shares any exact 13-token gram with it
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    def grams(toks: Seq[String]): Seq[String] =
      if (toks.length < 13) Seq.empty
      else (0 to toks.length - 13).map(i => toks.slice(i, i + 13).mkString(" "))
    val evalGrams = docs.collect {
      case (id, t) if id % 97 == 0 => grams(t)
    }.flatten.toSet
    val got = SparkEntry.queries("contamination_substring")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(4))).toSeq
    assert(got.nonEmpty &&
      got.map(_._1).toSet == docs.keySet.filter(_ % 97 != 0))
    got.foreach { case (id, nHit, flagged) =>
      val expHits = grams(docs(id)).count(evalGrams)
      assert(nHit == expHits, s"doc $id: n_hit $nHit != $expHits")
      assert(flagged == (expHits > 0), s"doc $id flag")
    }
  }

  test("stats are invariant to adversarial input partitioning") {
    val span = (0 until 15).map(i => s"pp$i")
    val rows = (1L to 20L).map { id =>
      val mid = if (id % 3 == 0) span else filler(id.toInt, 15)
      (id, (filler(id.toInt + 100, 5) ++ mid ++
        filler(id.toInt + 200, 5)).mkString(" "))
    }
    val a = LlmQueries.substringDupStats(df(rows), 10)
      .collect().map(_.toString).sorted.toSeq
    val b = LlmQueries.substringDupStats(
      df(rows).repartition(13, col("text")), 10)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
    // the six span-carrying docs all recall the full 15-token span
    val spanDocs = LlmQueries.substringDupStats(df(rows), 10)
      .filter(col("max_dup_span") === 15L).count()
    assert(spanDocs == 6L, s"span docs: $spanDocs")
  }
}
