package graft

import org.apache.spark.sql.functions._

/** Property pins for the r11 curation additions: change-point
  * detection, n-gram novelty, and containment near-dup. The DuckDB
  * differential is the exactness gate; these assert the SEMANTIC
  * invariants a hash compare can't express.
  */
class NoveltyContainmentSpec extends SparkSpecBase {

  test("ts_changepoint: the reported deviation is the per-user maximum " +
    "and recomputes exactly from the raw series") {
    val got = SparkEntry.queries("ts_changepoint")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.nonEmpty)
    // independent recomputation in plain Scala for a sample of users
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    got.keys.take(25).foreach { u =>
      val series = ev(u).sortBy(e => (e._2, e._3))
      val n = series.length.toLong
      val sn = series.map(_._4).sum
      var sk = 0L
      var best = (-1L, Long.MaxValue, Long.MaxValue, 0L) // dev max, ts min, eid min, k
      series.zipWithIndex.foreach { case ((_, ts, eid, c), i) =>
        sk += c
        val dev = math.abs(n * sk - (i + 1) * sn)
        if (dev > best._1 ||
          (dev == best._1 && (ts < best._2 || (ts == best._2 && eid < best._3))))
          best = (dev, ts, eid, i + 1L)
      }
      val (gn, gts, gk, gdev) = got(u)
      assert((gn, gts, gk, gdev) == (n, best._2, best._4, best._1),
        s"user $u: got ${got(u)}, want ($n, ${best._2}, ${best._4}, ${best._1})")
    }
  }

  test("ts_mk_trend: S recomputes exactly from the sliced series and " +
    "|S| is bounded by the untied pair count") {
    val got = SparkEntry.queries("ts_mk_trend")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.nonEmpty)
    got.values.foreach { case (pairs, s, ties) =>
      assert(math.abs(s) <= pairs - ties)
    }
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    got.keys.take(20).foreach { u =>
      val xs = ev(u).sortBy(e => (e._2, e._3)).take(128).map(_._4)
      var s = 0L; var ties = 0L; var pairs = 0L
      for (i <- xs.indices; j <- (i + 1) until xs.length) {
        pairs += 1
        val d = java.lang.Long.compare(xs(j), xs(i))
        s += d.sign
        if (d == 0) ties += 1
      }
      assert(got(u) == ((pairs, s, ties)),
        s"user $u: got ${got(u)}, want ($pairs, $s, $ties)")
    }
  }

  test("text_ngram_novelty: novel counts are bounded by gram counts and " +
    "every gram's first doc claims it exactly once") {
    val rows = SparkEntry.queries("text_ngram_novelty")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, ng, nn, bp) =>
      assert(nn <= ng, s"doc $id: novel $nn > grams $ng")
      assert(ng == 0 || bp == nn * 10000 / ng, s"doc $id bp")
    }
    // corpus-level conservation: Σ novel == distinct grams corpus-wide
    // (each gram is novel for exactly its min-doc_id introducer)
    val totalNovel = rows.map(_._3).sum
    val distinctGrams = Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 3), " +
          "i -> md5(concat_ws(' ', slice(toks, i + 1, 3))))")).as("dig"))
      .distinct().count()
    assert(totalNovel == distinctGrams,
      s"sum(novel)=$totalNovel != |distinct grams|=$distinctGrams")
  }

  test("dedup_containment: reported pairs clear the 80% gate, and a " +
    "planted full-inclusion pair scores 10000") {
    import spark.implicits._
    val rows = SparkEntry.queries("dedup_containment")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 >= 8000))
    assert(rows.forall(p => p._1 < p._2))
    // planted: doc 2's text is a strict substring (token-aligned) of
    // doc 1's — containment of the smaller is exactly 100%
    val sentence = (1 to 30).map(i => s"tok$i").mkString(" ")
    val df = Seq(
      (1L, sentence + " trailing words here"),
      (2L, sentence),
      (3L, "entirely unrelated content with its own words repeated none"))
      .toDF("doc_id", "text")
    val view = s"containment_plant_${System.nanoTime()}"
    df.createOrReplaceTempView(view)
    // drive the same pipeline shape inline (the operator is fixture-
    // bound; the plant checks the math), INCLUDING the operator's
    // 60-bit conv-digest step so a drift in the cross-engine hex
    // conversion fails here, not only in the slow oracle sweep
    val got = spark.sql(
      s"""WITH t AS (SELECT doc_id, split(text, ' ') AS toks FROM $view),
         |ge AS (SELECT doc_id, explode(transform(
         |  sequence(0, size(toks) - 3),
         |  i -> md5(concat_ws(' ', slice(toks, i + 1, 3))))) AS m
         |  FROM t WHERE size(toks) >= 3),
         |g AS (SELECT DISTINCT doc_id,
         |  cast(conv(substring(m, 1, 15), 16, 10) as bigint) AS dig FROM ge),
         |sets AS (SELECT doc_id, sort_array(collect_list(dig)) AS gset,
         |  count(1) AS ng FROM g GROUP BY doc_id)
         |SELECT size(array_intersect(a.gset, b.gset)) * 10000L
         |  div least(a.ng, b.ng)
         |FROM sets a JOIN sets b ON a.doc_id = 1 AND b.doc_id = 2
         |""".stripMargin).head().getLong(0)
    assert(got == 10000L, s"planted inclusion scored $got")
    // and the hex conversion itself matches an independent BigInt
    // parse over the fixture's first grams (the exact cross-engine
    // contract: value of the md5's first 15 hex chars)
    val pairs = spark.sql(
      s"""SELECT dig, cast(conv(substring(dig, 1, 15), 16, 10) as bigint)
         |FROM (SELECT md5(text) AS dig FROM $view)""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    pairs.foreach { case (hex, v) =>
      assert(v == java.lang.Long.parseLong(hex.substring(0, 15), 16),
        s"conv drift on $hex")
    }
    spark.catalog.dropTempView(view)
  }
}
