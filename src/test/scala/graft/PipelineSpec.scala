package graft

import org.apache.spark.sql.functions._

/** SURVEY.md §2.L — invariants of the training-data pipeline assembly
  * operators beyond the DuckDB oracle pairing (which already pins exact
  * values): determinism across runs and the semantic properties a
  * pipeline depends on.
  */
class PipelineSpec extends SparkSpecBase {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("sample_hash is deterministic and keeps a ~25% fraction") {
    val total = Tables.documents(spark, sfDir).count()
    val a = run("sample_hash").collect().map(_.getLong(0)).toSeq
    val b = run("sample_hash").collect().map(_.getLong(0)).toSeq
    assert(a == b)
    val frac = a.length.toDouble / total
    assert(frac > 0.15 && frac < 0.35, s"fraction $frac")
  }

  test("sample_hash complements are disjoint and exhaustive") {
    val kept = run("sample_hash").select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val rest = Tables.documents(spark, sfDir)
      .filter(substring(md5(col("text")), 1, 1) >= "4")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert((kept & rest).isEmpty)
    assert(kept.size + rest.size ==
      Tables.documents(spark, sfDir).count())
  }

  test("shuffle_global is a permutation and not the identity order") {
    val out = run("shuffle_global").select(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    val all = Tables.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(out.sorted == all)
    assert(out != out.sorted, "hash order degenerated to id order")
  }

  test("pack_token_budget bins start at 0 and are nondecreasing per shard") {
    val rows = run("pack_token_budget")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getInt(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (lang, docs) =>
      val ordered = docs.sortBy(_._2)
      assert(ordered.head._4 == 0L, s"$lang first bin")
      ordered.sliding(2).foreach {
        case Array((_, _, _, b1), (_, _, _, b2)) =>
          assert(b2 >= b1, s"$lang bins decreased")
        case _ =>
      }
      // bin id == tokens-before / 4096 recomputed on the driver
      var cum = 0L
      ordered.foreach { case (_, id, toks, bin) =>
        assert(bin == cum / 4096, s"$lang doc $id bin mismatch")
        cum += toks
      }
    }
  }

  test("mix_weighted keeps more from higher-weighted sources") {
    // sf0.01: at sf0.001 the corpus is ~50 docs and per-source hash
    // sampling noise can flip the aggregate rate comparison
    val mixDir = "/root/testdata/sf0.01"
    val totals = Tables.documents(spark, mixDir)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = SparkEntry.queries("mix_weighted")(spark, mixDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    kept.foreach { case (src, n) => assert(n <= totals(src), src) }
    def rate(srcs: Iterable[String]): Double = {
      // toSeq: srcs is a key SET — mapping it straight to counts would
      // deduplicate equal counts before summing
      val ss = srcs.toSeq
      val t = ss.map(totals.getOrElse(_, 0L)).sum
      if (t == 0) 0.0 else ss.map(kept.getOrElse(_, 0L)).sum.toDouble / t
    }
    val high = rate((0 to 4).map("src" + _))
    val low = rate(totals.keys.filterNot(s =>
      (0 to 9).map("src" + _).contains(s)))
    assert(high > low,
      s"high-weight rate $high should exceed tail rate $low")
  }

  test("mix_repeat_by_quality emits exactly repeats epochs per doc") {
    val rows = SparkEntry.queries("mix_repeat_by_quality")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = Tables.documents(spark, sfDir).count()
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.size == nDocs, "every document scheduled")
    byDoc.foreach { case (doc, rs) =>
      val repeats = rs.head._3
      assert(Set(1L, 2L, 3L).contains(repeats), s"doc $doc tier")
      assert(rs.forall(_._3 == repeats))
      assert(rs.map(_._4).sorted.toSeq == (1L to repeats), s"doc $doc epochs")
      // tier is the declared function of the quality score
      val q = rs.head._2
      val exp = if (q >= 556) 3L else if (q >= 540) 2L else 1L
      assert(repeats == exp, s"doc $doc q=$q")
    }
  }

  test("pack_balanced_bins actually balances: bin token loads within 25%") {
    // the serpentine's whole point — within each language shard, the
    // heaviest bin carries at most 1.25x the lightest (random or
    // sequential assignment blows far past this on skewed lengths)
    import org.apache.spark.sql.functions.col
    val rows = run("pack_balanced_bins").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (lang, bins) =>
      // only bins with full snake passes are comparable; the fixture
      // gives each lang ~500+ docs over 16 bins, so all qualify
      val loads = bins.map(_._3)
      assert(loads.length == 16, s"$lang: ${loads.length} bins")
      assert(loads.max <= loads.min * 5 / 4,
        s"$lang bin loads spread too far: min=${loads.min} max=${loads.max}")
    }
  }

  test("sample_split membership is stable under corpus subsetting") {
    // the content-hash property the operator exists for: a doc's split
    // never depends on what ELSE is in the corpus — recompute splits
    // on a half-corpus and require identical membership per doc
    import org.apache.spark.sql.functions._
    def splits(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("h2", substring(md5(col("text")), 1, 2))
      .withColumn("split", when(col("h2") < "cd", "train")
        .when(col("h2") < "e7", "val").otherwise("test"))
      .select(col("doc_id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = splits(Tables.documents(spark, sfDir))
    val half = splits(Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 2 === 0))
    assert(half.nonEmpty)
    half.foreach { case (id, s) =>
      assert(full(id) == s, s"doc $id migrated: ${full(id)} -> $s")
    }
    // and all three splits are populated at the declared proportions
    val counts = full.values.groupBy(identity).view.mapValues(_.size).toMap
    val n = full.size.toDouble
    assert(counts("train") / n > 0.7 && counts("train") / n < 0.9)
    assert(counts("val") / n > 0.05 && counts("test") / n > 0.05)
  }
}
