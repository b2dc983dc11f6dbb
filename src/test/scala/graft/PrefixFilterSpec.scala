package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `dedup_ngram_prefix` (exact AllPairs/PPJoin df-ordered prefix
  * filter) vs `dedup_ngram_jaccard` (length-bucket blocking): both
  * must produce the IDENTICAL pair set — the prefix filter is
  * lossless — and on a natural Zipfian vocabulary the prefix stage
  * must generate FEWER candidates than the bucket stage (the 100 TB
  * scale claim the SimilarityQueries scaladoc makes; the driver
  * fixture cannot show it because its synthetic vocabulary is ~900
  * bigrams, so this suite builds its own corpus).
  */
class PrefixFilterSpec extends SparkSpecBase {

  /** Zipfian corpus: 2000-word vocabulary, 300 base docs of ~30 words,
    * 12 planted near-dup pairs (one same-length word substituted, so
    * the pair stays in one length bucket). Deterministic seed.
    */
  private lazy val zipfDir: String = {
    val dir = TempDirs.scoped("zipf_fixture", "fixture")
    val rnd = new scala.util.Random(1234)
    val vocabSize = 2000
    def zipfWord(): String = {
      val u = math.max(rnd.nextDouble(), 1e-9)
      val idx = math.min(vocabSize - 1, (math.pow(u, -0.8) - 1.0).toInt)
      s"word${idx}x" // fixed "word"/"x" affixes keep lengths comparable
    }
    val base = (0 until 300).map { i =>
      val words = Seq.fill(25 + rnd.nextInt(10))(zipfWord())
      (i.toLong, words.mkString(" "))
    }
    val dups = (0 until 12).map { k =>
      val (srcId, text) = base(k * 20)
      val words = text.split(" ")
      // substitute ONE word with a same-length replacement so n_chars
      // (and therefore the length bucket) is unchanged
      val pos = words.length / 2
      val repl = "9" * words(pos).length
      (1000L + srcId, words.updated(pos, repl).mkString(" "))
    }
    val s = spark
    import s.implicits._
    (base ++ dups)
      .map { case (id, text) =>
        (id, text, "en", s"src${id % 3}", text.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  private def pairs(name: String, d: String): Set[(Long, Long, Long, Long)] =
    SparkEntry.queries(name)(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("prefix and bucket paths produce identical pairs on the fixture") {
    assert(pairs("dedup_ngram_prefix", sfDir) ==
      pairs("dedup_ngram_jaccard", sfDir))
  }

  test("capped-bucket skew split produces identical pairs on the fixture") {
    // the r8 hot-bucket playbook demo: block-wise chunk-pair join,
    // every task bounded at cap² candidates, SAME verified pair set
    assert(pairs("dedup_ngram_capped", sfDir) ==
      pairs("dedup_ngram_jaccard", sfDir))
  }

  test("a tiny cap (forcing multi-chunk splits in every bucket) is still lossless") {
    // cap = 5 splits every fixture bucket into many chunks, so the
    // (i, j) block enumeration — including the i = j diagonal and the
    // doc_id < doc_id tie-break across blocks — is exercised hard;
    // equality with the uncapped stage proves no pair is lost or
    // double-counted
    val grams = graft.operators.SimilarityQueries.hashedGramTable(spark, sfDir)
    val capped = graft.operators.SimilarityQueries
      .cappedBucketPairs(grams, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(capped == pairs("dedup_ngram_jaccard", sfDir))
  }

  test("capped-bucket skew split matches on the Zipfian corpus too") {
    assert(pairs("dedup_ngram_capped", zipfDir) ==
      pairs("dedup_ngram_jaccard", zipfDir))
  }

  test("prefix and bucket paths produce identical pairs on a Zipfian corpus") {
    val prefix = pairs("dedup_ngram_prefix", zipfDir)
    val bucket = pairs("dedup_ngram_jaccard", zipfDir)
    assert(prefix == bucket)
    // every planted near-dup pair is found
    val found = prefix.map { case (a, b, _, _) => (a, b) }
    (0 until 12).foreach { k =>
      val src = (k * 20).toLong
      assert(found.contains((src, 1000L + src)), s"missing planted $src")
    }
  }

  test("prefix candidates undercut bucket candidates on Zipfian vocabulary") {
    // independent (string-gram) recomputation of both CANDIDATE stage
    // volumes — the pre-verification pair counts that dominate cost
    val g = spark.read.parquet(s"$zipfDir/documents.parquet")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), expr("n_chars div 8").as("bkt"),
        explode(array_distinct(expr(
          "transform(sequence(1, greatest(size(toks) - 1, 1)), " +
            "i -> concat_ws(' ', toks[i - 1], toks[i]))"))).as("gram"))
    val sizes = g.groupBy(col("doc_id"), col("bkt"))
      .agg(count(lit(1)).as("n"))
    def ratioOk(a: String, b: String) =
      least(col(s"$a.n"), col(s"$b.n")) * 5 >=
        greatest(col(s"$a.n"), col(s"$b.n")) * 2
    val bucketCands = sizes.as("a").join(sizes.as("b"),
        col("a.bkt") === col("b.bkt") &&
          col("a.doc_id") < col("b.doc_id") && ratioOk("a", "b"))
      .count()
    val dfT = g.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    val wc = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").asc, col("gram").asc)
    val pref = g.join(dfT, "gram")
      .join(sizes, Seq("doc_id", "bkt"))
      .withColumn("pos", row_number().over(wc))
      .filter(col("pos") <= col("n") - expr("(2 * n + 4) div 5") + 1)
      .select(col("gram"), col("doc_id"), col("bkt"), col("n"))
    val prefixCands = pref.as("a").join(pref.as("b"),
        col("a.gram") === col("b.gram") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.bkt") === col("b.bkt") && ratioOk("a", "b"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct()
      .count()
    assert(prefixCands < bucketCands,
      s"prefix=$prefixCands bucket=$bucketCands — Zipfian corpus should favor the prefix filter")
  }
}
