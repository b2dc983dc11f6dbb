package graft

import org.apache.spark.sql.functions._

/** r12 operators: plain-Scala recomputes + the structural guarantees
  * each algorithm advertises (SURVEY §5.2: every operator gets an
  * independent check beyond the DuckDB oracle).
  */
class R12NewOpsSpec extends SparkSpecBase {

  /** Spark's round(): HALF_UP, i.e. ties away from zero — NOT
    * math.round's floor(x + 0.5), which differs on negative halves.
    */
  private def halfUp(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Reference winnowing (Schleimer et al. 2003): k=5 char grams,
    * window w=4, min-hash per window with rightmost tie-break —
    * exactly the combined (hash, -pos) integer key the operator uses.
    * Returns (n_grams, n_fingerprints, fp_digest).
    */
  private def winnowRef(text: String): (Long, Long, Long) = {
    val n = math.max(text.length - 4, 0)
    val hs = (1 to n).map { p =>
      text.substring(p - 1, p + 4)
        .foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    }
    if (n < 4) (n.toLong, 0L, 0L)
    else {
      val selPos = (0 to n - 4).map { s0 =>
        (s0 until s0 + 4).minBy(i => hs(i) * 1048576L + (1048576L - (i + 1)))
      }.distinct
      val selHash = selPos.map(hs).distinct
      (n.toLong, selHash.size.toLong, selHash.sum)
    }
  }

  test("text_winnowing matches a plain-Scala winnowing recompute") {
    val got = SparkEntry.queries("text_winnowing")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(docs.nonEmpty)
    docs.foreach { case (id, text) =>
      assert(got(id) === winnowRef(text), s"doc $id")
    }
  }

  test("winnowing selects at least one gram from every window (gap <= w)") {
    // the density guarantee: consecutive SELECTED POSITIONS are at
    // most w=4 apart, so any >= 8-char match shares a fingerprint
    val docs = Tables.documents(spark, sfDir)
      .select(col("text")).collect().map(_.getString(0))
    docs.filter(_.length >= 8).take(50).foreach { text =>
      val n = text.length - 4
      val hs = (1 to n).map { p =>
        text.substring(p - 1, p + 4)
          .foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
      }
      val selPos = (0 to n - 4).map { s0 =>
        (s0 until s0 + 4).minBy(i => hs(i) * 1048576L + (1048576L - (i + 1)))
      }.distinct.sorted
      selPos.sliding(2).foreach {
        case Seq(a, b) => assert(b - a <= 4, s"gap $a -> $b")
        case _         =>
      }
    }
  }

  test("graph_kcore equals the fixpoint 3-core (8 rounds converge)") {
    val out = SparkEntry.queries("graph_kcore")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // at fixpoint every survivor has in-core degree >= k
    out.values.foreach(dg => assert(dg >= 3L))
    // reference: peel the collected edge set to TRUE fixpoint
    val e = SparkEntry.queries("graph_edges_topk")(spark, sfDir)
      .select(col("supplier"), col("neighbor")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var und = e.flatMap { case (u, v) => Seq((u, v), (v, u)) }.distinct
    var changed = true
    while (changed) {
      val deg = und.groupBy(_._1).map { case (k, v) => k -> v.size }
      val keep = deg.filter(_._2 >= 3).keySet
      val next = und.filter { case (x, y) => keep(x) && keep(y) }
      changed = next.length != und.length
      und = next
    }
    val ref = und.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    assert(out === ref,
      "8 fixed peel rounds did not reach the 3-core fixpoint at sf0.001")
  }

  test("ts_burstiness matches a plain-Scala recompute") {
    val got = SparkEntry.queries("ts_burstiness")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ref = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val ts = rows.sortBy(r => (r._2, r._3)).map(_._2)
      val gaps = ts.sliding(2).collect {
        case Array(a, b) => Math.floorDiv(b - a, 1000000L)
      }.toSeq
      val n = gaps.size.toLong
      val s = gaps.sum
      val q = gaps.map(g => g * g).sum
      if (n >= 2 && s > 0) {
        val rad = (BigDecimal(n) * BigDecimal(q) -
          BigDecimal(s) * BigDecimal(s)).toDouble
        val b = (math.sqrt(rad) - s.toDouble) / (math.sqrt(rad) + s.toDouble)
        Some(u -> ((n, halfUp(b * 1e6))))
      } else None
    }
    assert(got === ref)
    // burstiness is a bounded score: B in (-1, 1)
    got.values.foreach { case (_, b) =>
      assert(b > -1000000L && b < 1000000L)
    }
  }

  test("agg_welch_ttest matches a plain-Scala recompute") {
    val row = SparkEntry.queries("agg_welch_ttest")(spark, sfDir).collect()
    assert(row.length === 1)
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_totalprice"))
      .collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
      .filter(r => r._1 == "1-URGENT" || r._1 == "5-LOW")
    def moments(grp: String) = {
      val xs = o.filter(_._1 == grp).map(_._2)
      (xs.length.toLong, xs.sum,
        xs.map(x => BigDecimal(x) * BigDecimal(x)).sum)
    }
    val (n1, s1, q1) = moments("1-URGENT")
    val (n2, s2, q2) = moments("5-LOW")
    def vn(n: Long, s: Long, q: BigDecimal): Double =
      (n.toDouble * q.toDouble - s.toDouble * s.toDouble) /
        (n.toDouble * (n.toDouble - 1.0) * n.toDouble)
    val (v1, v2) = (vn(n1, s1, q1), vn(n2, s2, q2))
    val t = (s1.toDouble / n1 - s2.toDouble / n2) / math.sqrt(v1 + v2)
    val df = (v1 + v2) * (v1 + v2) /
      (v1 * v1 / (n1 - 1.0) + v2 * v2 / (n2 - 1.0))
    val r = row(0)
    assert(r.getLong(0) === n1)
    assert(r.getLong(1) === n2)
    assert(r.getLong(2) === halfUp(t * 1e6))
    assert(r.getLong(3) === halfUp(df * 1e3))
    // Welch df is bounded by min(n1,n2)-1 below and n1+n2-2 above
    assert(r.getLong(3) >= (math.min(n1, n2) - 1) * 1000L)
    assert(r.getLong(3) <= (n1 + n2 - 2) * 1000L)
  }

  test("emb_label_centroids matches a plain-Scala recompute") {
    val got = SparkEntry.queries("emb_label_centroids")(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    val ref = vecs.flatMap { case (lab, e) =>
      e.zipWithIndex.map { case (x, i) =>
        (lab, i.toLong) -> halfUp(x.toDouble * 1000.0)
      }
    }.groupBy(_._1).map { case (k, vs) =>
      val qs = vs.map(_._2)
      k -> ((qs.length.toLong,
        halfUp(qs.sum.toDouble * 1000.0 / qs.length)))
    }
    assert(got === ref)
  }

  test("agg_mann_whitney matches a plain-Scala recompute") {
    val row = SparkEntry.queries("agg_mann_whitney")(spark, sfDir).collect()
    assert(row.length === 1)
    val xs = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1))))
      .filter(r => r._1 == "A" || r._1 == "R")
    val as = xs.filter(_._1 == "A").map(_._2)
    val rs = xs.filter(_._1 == "R").map(_._2)
    // 2U by direct pair enumeration (sf0.001 is small enough)
    val u2 = as.iterator.map { a =>
      rs.count(r => a > r) * 2L + rs.count(r => a == r)
    }.sum
    val r0 = row(0)
    assert(r0.getLong(0) === as.length.toLong)
    assert(r0.getLong(1) === rs.length.toLong)
    assert(r0.getLong(2) === u2)
    val (na, nr) = (as.length.toDouble, rs.length.toDouble)
    val n = na + nr
    val ties = (as ++ rs).groupBy(identity).values
      .map(g => g.length.toLong)
      .map(t => BigInt(t) * BigInt(t) * BigInt(t) - BigInt(t)).sum
    val tfree = (BigInt(n.toLong).pow(3) - BigInt(n.toLong) - ties).toDouble
    val z = (u2.toDouble - na * nr) /
      (2.0 * math.sqrt(na * nr * tfree / (12.0 * n * (n - 1.0))))
    assert(r0.getLong(3) === halfUp(z * 1e6))
  }

  test("agg_levene matches a plain-Scala recompute") {
    val row = SparkEntry.queries("agg_levene")(spark, sfDir).collect()
    assert(row.length === 1)
    val xs = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1))))
    val byF = xs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // disc median: smallest value with 2*cum >= n
    def med(vs: Array[Long]): Long = {
      val sorted = vs.sorted
      sorted((vs.length - 1) / 2) // 2*(idx+1) >= n <=> idx >= (n-1)/2... smallest such
    }
    val groups = byF.toSeq.sortBy(_._1).map { case (f, vs) =>
      val m = med(vs)
      val z = vs.map(v => math.abs(v - m))
      (f, z.length.toLong, z.sum, z.map(x => x * x).sum)
    }
    val k = groups.length.toDouble
    val n = groups.map(_._2).sum.toDouble
    val s = groups.map(_._3).sum.toDouble
    val qq = groups.map(_._4).sum.toDouble
    val ssg = groups.foldLeft(0.0) { case (acc, (_, ng, sg, _)) =>
      acc + sg.toDouble * sg.toDouble / ng.toDouble
    }
    val fStat = (n - k) / (k - 1.0) * (ssg - s * s / n) / (qq - ssg)
    val r0 = row(0)
    assert(r0.getLong(0) === groups.length.toLong)
    assert(r0.getLong(1) === n.toLong)
    assert(r0.getLong(2) === halfUp(fStat * 1e6))
  }

  test("emb_outlier_distance matches a plain-Scala recompute") {
    val got = SparkEntry.queries("emb_outlier_distance")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.length === 20)
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(x => halfUp(x.toDouble * 1000.0)).toArray))
    val cents = vecs.groupBy(_._2).view.mapValues { vs =>
      val d = vs.head._3.length
      Array.tabulate(d) { i =>
        val qs = vs.map(_._3(i))
        halfUp(qs.sum.toDouble * 1000.0 / qs.length)
      }
    }.toMap
    val ref = vecs.map { case (id, lab, q) =>
      val c = cents(lab)
      val d2 = q.zip(c).map { case (qm, cm) =>
        val dv = qm * 1000L - cm; dv * dv
      }.sum
      (id, lab, d2)
    }.sortBy(t => (-t._3, t._1)).take(20)
    assert(got.toSeq === ref.toSeq)
  }

  test("text_langid_kappa matches a recompute from text_langid + labels") {
    val row = SparkEntry.queries("text_langid_kappa")(spark, sfDir).collect()
    assert(row.length === 1)
    val pred = SparkEntry.queries("text_langid")(spark, sfDir)
      .select(col("doc_id"), col("pred_lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val truth = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = truth.size.toLong
    val diag = truth.count { case (id, t) => pred(id) == t }.toLong
    val rm = truth.values.groupBy(identity).view.mapValues(_.size.toLong)
    val pm = pred.values.groupBy(identity).view.mapValues(_.size.toLong)
    val rp = rm.map { case (l, r) => r * pm.getOrElse(l, 0L) }.sum
    val kappa = (n.toDouble * diag - rp.toDouble) /
      (n.toDouble * n - rp.toDouble)
    val r0 = row(0)
    assert(r0.getLong(0) === n)
    assert(r0.getLong(1) === diag)
    assert(r0.getLong(2) === halfUp(kappa * 1e6))
    // kappa never exceeds raw accuracy's ceiling
    assert(r0.getLong(2) <= 1000000L)
  }

  test("ts_poisson_dispersion matches a plain-Scala recompute") {
    val got = SparkEntry.queries("ts_poisson_dispersion")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts_us")).collect()
      .map(r => (r.getString(0), Math.floorDiv(r.getLong(1), 3600000000L)))
    val ref = ev.groupBy(_._1).map { case (t, rows) =>
      val byHr = rows.groupBy(_._2).view.mapValues(_.size.toLong)
      val (h0, h1) = (byHr.keys.min, byHr.keys.max)
      val n = h1 - h0 + 1
      val s = byHr.values.sum
      val q = byHr.values.map(c => c * c).sum
      val disp = (BigDecimal(n) * BigDecimal(q) -
        BigDecimal(s) * BigDecimal(s)).toDouble / (n.toDouble * s.toDouble)
      t -> ((n, s, halfUp(disp * 1e6)))
    }
    assert(got === ref)
  }

  test("text_boilerplate_frac matches a string-gram recompute") {
    // the STRING-gram recompute mirrors the oracle; the engine's
    // digest counts must agree (collision stance: ~1e-14/doc)
    val got = SparkEntry.queries("text_boilerplate_frac")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val grams = docs.map { case (id, t) =>
      id -> (0 until math.max(t.length - 2, 0))
        .map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}")
    }
    val nDocs = docs.length.toLong
    val dfm = grams.flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.length.toLong)
    val boiler = dfm.filter { case (_, df) => df * 50L >= nDocs }.keySet
    grams.foreach { case (id, gs) =>
      val n = gs.length.toLong
      val occ = gs.count(boiler).toLong
      val bp = if (n > 0) occ * 10000L / n else 0L
      assert(got(id) === ((n, occ, bp)), s"doc $id")
    }
  }

  test("agg_bhattacharyya matches a plain-Scala recompute, BC in [0,1]") {
    val row = SparkEntry.queries("agg_bhattacharyya")(spark, sfDir).collect()
    assert(row.length === 1)
    val xs = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1))))
      .filter(r => r._1 == "A" || r._1 == "R")
    val byQ = xs.groupBy(_._2).view.mapValues { vs =>
      (vs.count(_._1 == "A").toLong, vs.count(_._1 == "R").toLong)
    }.toMap
    val na = xs.count(_._1 == "A").toDouble
    val nr = xs.count(_._1 == "R").toDouble
    val bc = byQ.toSeq.sortBy(_._1).foldLeft(0.0) {
      case (acc, (_, (ca, cr))) =>
        acc + math.sqrt(ca.toDouble * cr.toDouble) / math.sqrt(na * nr)
    }
    val r0 = row(0)
    assert(r0.getLong(0) === na.toLong)
    assert(r0.getLong(1) === nr.toLong)
    assert(r0.getLong(2) === halfUp(bc * 1e6))
    assert(r0.getLong(2) >= 0L && r0.getLong(2) <= 1000000L)
  }

  test("mix_source_balance matches a plain-Scala ESS recompute") {
    val row = SparkEntry.queries("mix_source_balance")(spark, sfDir)
      .collect()
    assert(row.length === 1)
    val ws = Tables.documents(spark, sfDir)
      .select(col("source")).collect().map(_.getString(0))
      .groupBy(identity).values.map(_.length.toLong).toSeq
    val (n, tot) = (ws.length.toLong, ws.sum)
    val sq = ws.map(w => BigDecimal(w) * BigDecimal(w)).sum
    val ess = tot.toDouble * tot.toDouble / sq.toDouble
    val r0 = row(0)
    assert(r0.getLong(0) === n)
    assert(r0.getLong(1) === tot)
    assert(r0.getLong(2) === halfUp(ess * 1e3))
    assert(r0.getLong(3) === halfUp(ess / n * 1e6))
    // ESS is bounded by (0, n_sources]
    assert(r0.getLong(3) > 0L && r0.getLong(3) <= 1000000L)
  }

  test("ts_dau_mau matches a plain-Scala recompute") {
    val row = SparkEntry.queries("ts_dau_mau")(spark, sfDir).collect()
    assert(row.length === 1)
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us")).collect()
      .map(r => (r.getLong(0), Math.floorDiv(r.getLong(1), 86400000000L)))
      .distinct
    val days = ev.map(_._2)
    val span = days.max - days.min + 1
    val mau = ev.map(_._1).distinct.length.toLong
    val sumDau = ev.groupBy(_._2).values.map(_.length.toLong).sum
    val r0 = row(0)
    assert(r0.getLong(0) === span)
    assert(r0.getLong(1) === mau)
    assert(r0.getLong(2) === sumDau * 10000L / (span * mau))
  }

  test("sample_weighted_hash keeps max-weight docs and matches XXH64") {
    val got = SparkEntry.queries("sample_weighted_hash")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), math.min(r.getLong(1), 200L)))
    assert(docs.nonEmpty)
    docs.foreach { case (id, w) =>
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashLong(id, 42L)
      val u = ((h % 1048576L) + 1048576L) % 1048576L
      val kept = u * 200L < w * 1048576L
      assert(got.contains(id) === kept, s"doc $id")
      if (w == 200L) assert(got.contains(id), s"max-weight doc $id dropped")
      if (kept) assert(got(id) === w)
    }
  }
}
