package graft

import org.apache.spark.sql.functions._

/** Independent second opinions on the r3 curation/analytics wave —
  * semantic invariants and from-scratch Scala recomputation, checking
  * the operators against their DEFINITIONS rather than against the
  * DuckDB oracle (which shares the SQL formulation and could share a
  * formulation bug).
  */
class CurationInvariantSpec extends SparkSpecBase {

  private val GapUs = 30L * 60L * 1000000L

  test("ts_sessionize: sessions tile the feed, split only at >30min gaps") {
    // columns: user_id, session_id, start_us, end_us, n_events
    val sessions = SparkEntry.queries("ts_sessionize")(spark, sfDir).collect()
    val nEvents = Tables.events(spark, sfDir).count()
    assert(sessions.map(_.getLong(4)).sum == nEvents,
      "session event counts must partition the feed")
    assert(sessions.forall(r => r.getLong(3) >= r.getLong(2)))
    sessions.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      rs.sortBy(_.getLong(1)).sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) - a.getLong(3) > GapUs,
            s"adjacent sessions of user ${a.getLong(0)} closer than the gap")
        case _ => ()
      }
    }
  }

  test("ts_streaks equals an independent per-user run-length recompute") {
    val got = SparkEntry.queries("ts_streaks")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val exp = evs.groupBy(_._1).flatMap { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._2)).map(_._3)
      val best = scala.collection.mutable.Map.empty[String, Long]
      var cur = ""
      var len = 0L
      (ordered :+ "").foreach { t =>
        if (t == cur) len += 1
        else {
          if (cur.nonEmpty)
            best(cur) = math.max(best.getOrElse(cur, 0L), len)
          cur = t
          len = 1L
        }
      }
      best.map { case (t, l) => (u, t) -> l }
    }.toMap
    assert(got == exp)
  }

  test("snapshot_diff classification matches the carve-out algebra") {
    val rows = SparkEntry.queries("snapshot_diff")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getLong(0)
      val t = r.getString(1)
      val inA = k % 7 != 0
      val inB = k % 5 != 0
      assert(inA || inB)
      val expected =
        if (inA && !inB) "removed" else if (!inA && inB) "added"
        else "changed"
      assert(t == expected, s"key $k: got $t expected $expected")
      if (t == "changed") assert(k % 3 == 0, s"key $k changed but price kept")
    }
    // rows present in both snapshots with unchanged price must be absent
    val emitted = rows.map(_.getLong(0)).toSet
    Tables.orders(spark, sfDir).select(col("o_orderkey")).collect()
      .map(_.getLong(0))
      .filter(k => k % 7 != 0 && k % 5 != 0 && k % 3 != 0)
      .foreach(k => assert(!emitted.contains(k), s"unchanged key $k emitted"))
  }

  test("dedup_incremental admits exactly the unseen digests, min-id each") {
    val admitted = SparkEntry.queries("dedup_incremental")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val existing = docs.filter(_._2 != "src0").map(_._3).toSet
    val exp = docs.filter(_._2 == "src0")
      .filterNot(d => existing.contains(d._3))
      .groupBy(_._3).map(_._2.map(_._1).min).toSet
    assert(admitted == exp)
  }

  test("text_df_quality mean document frequency stays within [1, |docs|]") {
    val n = Tables.documents(spark, sfDir).count()
    val rows = SparkEntry.queries("text_df_quality")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val meanDf = r.getLong(2)
      assert(meanDf >= 1L && meanDf <= n, s"doc ${r.getLong(0)}: $meanDf")
    }
  }

  test("agg_skew_kurt matches a direct central-moment computation") {
    val rows = SparkEntry.queries("agg_skew_kurt")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val data = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity")).collect()
      // same half-up integer rounding as the DECIMAL(18,0) cast
      .map(r => (r.getString(0), math.round(r.getDouble(1)).toDouble))
    rows.foreach { r =>
      val xs = data.filter(_._1 == r.getString(0)).map(_._2)
      val n = xs.length.toDouble
      val m = xs.sum / n
      val v = xs.map(x => (x - m) * (x - m)).sum / n
      val skew = xs.map(x => math.pow(x - m, 3)).sum / n / math.pow(v, 1.5)
      val kurt = xs.map(x => math.pow(x - m, 4)).sum / n / (v * v) - 3
      assert(math.abs(r.getDouble(1) - skew) < 1e-6, r.getString(0))
      assert(math.abs(r.getDouble(2) - kurt) < 1e-6, r.getString(0))
    }
  }

  test("dedup_near_canonical keeps one survivor per cluster, all others") {
    val kept = SparkEntry.queries("dedup_near_canonical")(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val labels = SparkEntry.queries("dedup_cc_clusters")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val all = Tables.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val losers = labels.filter { case (doc, cl) => cl < doc }.map(_._1).toSet
    assert(kept == all -- losers)
  }

  test("text_classifier_score: exact feature count, bounded milli-score") {
    val nToks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("text_classifier_score")(spark, sfDir)
      .collect()
    assert(rows.map(_.getLong(0)).toSet == nToks.keySet)
    rows.foreach { r =>
      val (id, nf, score, keep) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))
      val n = nToks(id)
      // unigrams + (n-1) bigrams
      assert(nf == (if (n >= 2) 2 * n - 1 else n), s"doc $id feature count")
      // mean of per-feature weights in [0, 2000]
      assert(score >= 0 && score <= 2000, s"doc $id score $score")
      assert(keep == (score >= 1000), s"doc $id verdict")
    }
  }

  test("text_url_blocklist blocks exactly the listed domain suffixes") {
    val meta = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    val got = SparkEntry.queries("text_url_blocklist")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(got.map(_._1).toSet == meta.keySet)
    got.foreach { case (id, host, blocked) =>
      val (lang, src) = meta(id)
      assert(host == s"$lang.$src.example.org")
      // list: src3.example.org / src7.example.org block every subdomain
      // of those sources; de.src11.example.org only the exact host
      val exp = src == "src3" || src == "src7" ||
        (lang == "de" && src == "src11")
      assert(blocked == exp, s"doc $id host $host expected $exp")
    }
    assert(got.exists(_._3) && got.exists(!_._3), "both classes present")
  }
}
