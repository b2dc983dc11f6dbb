package graft

/** Independent recomputations for the r9 session-3 third wave:
  * Benford digit screen, HHI concentration, interval-union coverage,
  * local-extrema counts, and per-node clustering coefficient. Plain
  * Scala over collected fixture rows, so a Spark plan bug and an
  * oracle SQL bug cannot cancel.
  */
class DistributionShapeSpec extends SparkSpecBase {

  private def cents(v: Double): Long = math.round(v * 100)

  test("agg_benford matches a digit-count recomputation") {
    val got = SparkEntry.queries("agg_benford")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val digits = Tables.orders(spark, sfDir)
      .select("o_totalprice").collect()
      .map(r => cents(r.getDouble(0)).toString.head.asDigit.toLong)
    val total = digits.length.toLong
    val expected = digits.groupBy(identity).toSeq.map { case (d, g) =>
      (d, g.length.toLong, g.length * 10000L / total,
        math.round(math.log10(1.0 + 1.0 / d) * 1e6))
    }.sortBy(_._1)
    assert(got == expected)
  }

  test("agg_hhi matches a share-squares recomputation") {
    val got = SparkEntry.queries("agg_hhi")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val seg = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val rev = Tables.orders(spark, sfDir)
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1))))
      .groupBy(_._1).map { case (ck, rs) => (ck, rs.map(_._2).sum) }
    val expected = rev.toSeq.groupBy(t => seg(t._1)).map { case (s, cs) =>
      val tot = cs.map(_._2).sum
      val num = cs.map(c => BigInt(c._2) * BigInt(c._2)).sum
      (s, cs.length.toLong, tot,
        math.round(num.toDouble / (tot.toDouble * tot.toDouble) * 1e6))
    }.toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("ts_interval_coverage matches an interval-merge recomputation") {
    val got = SparkEntry.queries("ts_interval_coverage")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val win = 300000000L
    val expected = Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (uid, rs) =>
        val iv = rs.sortBy(r => (r._2, r._3)).map(r => (r._2, r._2 + win))
        // classic merge: extend or open a new covered segment
        var covered = 0L
        var curS = iv.head._1
        var curE = iv.head._2
        iv.tail.foreach { case (s0, e0) =>
          if (s0 <= curE) curE = math.max(curE, e0)
          else { covered += curE - curS; curS = s0; curE = e0 }
        }
        covered += curE - curS
        (uid, iv.length.toLong, covered,
          iv.map(_._2).max - iv.map(_._1).min)
      }.toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("ts_peak_count matches a neighbor-scan recomputation") {
    val got = SparkEntry.queries("ts_peak_count")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val expected = Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        cents(r.getDouble(3))))
      .groupBy(_._1).map { case (uid, rs) =>
        val xs = rs.sortBy(r => (r._2, r._3)).map(_._4)
        val peaks = (1 until xs.length - 1).count(i =>
          xs(i) > xs(i - 1) && xs(i) > xs(i + 1)).toLong
        val valleys = (1 until xs.length - 1).count(i =>
          xs(i) < xs(i - 1) && xs(i) < xs(i + 1)).toLong
        (uid, xs.length.toLong, peaks, valleys)
      }.toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("fn_round_modes pins the five mode contracts on exact halves") {
    val got = SparkEntry.queries("fn_round_modes")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9), r.getLong(10))).toSeq
    assert(got.map(_._1) == (0L to 6L))
    got.foreach { case (k, v, fl, ce, rd, brd, rdN, brdN, tr, trN) =>
      assert(v == k + 0.5)
      assert(fl == k && ce == k + 1)
      assert(rd == k + 1, "HALF_UP rounds the tie away from zero")
      assert(brd == (if (k % 2 == 0) k else k + 1), "HALF_EVEN to even")
      assert(rdN == -(k + 1) && brdN == -brd)
      assert(tr == k && trN == -k, "cast truncates toward zero")
    }
  }

  test("fn_string_surgery pins translate/overlay/mask on a known value") {
    val got = SparkEntry.queries("fn_string_surgery")(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getString(1),
        r.getString(2), r.getString(3)))).toMap
    assert(got("1-URGENT") == (("1_uRGeNT", "1##URGENT", "n-XXXXXX")),
      s"got ${got.get("1-URGENT")}")
    assert(got("4-NOT SPECIFIED") ==
      (("4_NoT SPeCiFieD", "4##NOT SPECIFIED", "n-XXX XXXXXXXXX")))
  }

  test("text_zipf_fit matches a plain-Scala least-squares fit") {
    val got = SparkEntry.queries("text_zipf_fit")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    val counts = Tables.documents(spark, sfDir)
      .select("text").collect().flatMap(_.getString(0).split(" "))
      .filter(_.nonEmpty)
      .groupBy(identity).map { case (t, g) => (t, g.length.toLong) }.toSeq
    val top = counts.sortBy { case (t, c) => (-c, t) }.take(30)
      .zipWithIndex.map { case ((_, c), i) => (i + 1L, c) }
    val xs = top.map(t => math.log(t._1.toDouble))
    val ys = top.map(t => math.log(t._2.toDouble))
    val n = top.length
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map(p => p._1 * p._2).sum
    val sxx = xs.map(x => x * x).sum
    val slope = (sxy * n - sx * sy) / (sxx * n - sx * sx)
    assert(got._1 == n.toLong)
    // the Scala mirror may differ in summation order — compare in
    // real units with a tolerance instead of micro-exactly
    assert(math.abs(got._2 - math.round(-slope * 1e6)) <= 2,
      s"slope ${got._2} vs ${math.round(-slope * 1e6)}")
    // a frequency-sorted corpus always fits a POSITIVE exponent
    assert(got._2 > 0)
  }

  test("emb_pca_power matches a plain-Scala power iteration") {
    val got = SparkEntry.queries("emb_pca_power")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val vecs = Tables.embeddings(spark, sfDir)
      .selectExpr("transform(embedding, x -> cast(round(cast(x as double) * 1000.0) as bigint))")
      .collect().map(_.getSeq[Long](0).toArray)
    val dim = vecs.head.length
    val n = vecs.length.toLong
    // exact integer covariance numerator, then the identical 5-round
    // max-norm power iteration with j-ordered summation
    val m = Array.tabulate(dim, dim) { (i0, j0) =>
      val sij = vecs.map(v => v(i0) * v(j0)).sum
      val si = vecs.map(_(i0)).sum
      val sj = vecs.map(_(j0)).sum
      (n * sij - si * sj).toDouble
    }
    var v = Array.fill(dim)(1.0)
    for (_ <- 1 to 5) {
      val u = Array.tabulate(dim) { i0 =>
        var acc = 0.0
        var j0 = 0
        while (j0 < dim) { acc += m(i0)(j0) * v(j0); j0 += 1 }
        acc
      }
      val nrm = u.map(math.abs).max
      v = u.map(_ / nrm)
    }
    val sgn = if (v(0) < 0) -1.0 else 1.0
    val expected = v.zipWithIndex
      .map { case (x, i0) => (i0 + 1L, math.round(x * sgn * 1e6)) }.toSeq
    assert(got == expected)
    // max-norm contract: the dominant component is exactly ±1e6
    assert(got.map(t => math.abs(t._2)).max == 1000000L)
    // and it is an (approximate) eigenvector: Mv stays parallel to v
    val mv = Array.tabulate(dim) { i0 =>
      (0 until dim).map(j0 => m(i0)(j0) * v(j0)).sum
    }
    val cos = mv.zip(v).map(p => p._1 * p._2).sum /
      (math.sqrt(mv.map(x => x * x).sum) * math.sqrt(v.map(x => x * x).sum))
    assert(cos > 0.99, s"Mv not parallel to v (cos=$cos)")
  }

  test("dedup_sorted_neighbors matches a sort-and-scan recomputation") {
    val got = SparkEntry.queries("dedup_sorted_neighbors")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    def lev(a: String, b: String): Long = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length).toLong
    }
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase))
    val expected = docs
      .map { case (id, t) => (t.take(6), t.take(32), id, t.take(48)) }
      .groupBy(_._1).toSeq.flatMap { case (_, blk) =>
        val sorted = blk.sortBy(r => (r._2, r._3))
        for {
          i <- sorted.indices
          o <- 1 to 2
          if i + o < sorted.length
          d = lev(sorted(i)._4, sorted(i + o)._4)
          if d <= 12
        } yield (sorted(i)._3, sorted(i + o)._3, d)
      }.sortBy(t => (t._1, t._2))
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("agg_ks_test matches a CDF-gap recomputation") {
    val got = SparkEntry.queries("agg_ks_test")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    val rows = Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1))))
      .filter(t => t._1 == "A" || t._1 == "R")
    val a = rows.filter(_._1 == "A").map(_._2)
    val b = rows.filter(_._1 == "R").map(_._2)
    val qs = (a ++ b).distinct.sorted
    val maxGap = qs.map { q =>
      math.abs(a.count(_ <= q).toLong * b.length -
        b.count(_ <= q).toLong * a.length)
    }.max
    val ks = math.round(maxGap.toDouble / (a.length.toDouble *
      b.length.toDouble) * 1e6)
    assert(got == ((a.length.toLong, b.length.toLong, ks)))
    assert(got._3 >= 0 && got._3 <= 1000000L)
  }

  test("agg_mutual_info matches a contingency recomputation and is >= 0") {
    val got = SparkEntry.queries("agg_mutual_info")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    val rows = Tables.orders(spark, sfDir)
      .select("o_orderstatus", "o_orderpriority").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val o = rows.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val rM = o.groupBy(_._1._1).map { case (s, g) => s -> g.values.sum }
    val cM = o.groupBy(_._1._2).map { case (p, g) => p -> g.values.sum }
    val n = rows.length.toDouble
    val mi = o.toSeq.sortBy(_._1).map { case ((s, p), obs) =>
      obs / n * (math.log(obs * n / (rM(s).toDouble * cM(p))) /
        math.log(2.0))
    }.sum
    assert(got._1 == rows.length.toLong && got._2 == o.size.toLong)
    assert(math.abs(got._3 - math.round(mi * 1e6)) <= 2)
    // mutual information is non-negative (up to micro rounding)
    assert(got._3 >= -1)
  }

  test("ts_seasonality_strength matches an ANOVA eta2 recomputation") {
    val got = SparkEntry.queries("ts_seasonality_strength")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    val xs = Tables.events(spark, sfDir)
      .select("ts_us", "value").collect()
      .map(r => ((r.getLong(0) / 3600000000L) % 24, cents(r.getDouble(1))))
    val n = xs.length.toDouble
    val s = xs.map(_._2).sum.toDouble
    val q = xs.map(p => BigInt(p._2) * BigInt(p._2)).sum.toDouble
    val between = xs.groupBy(_._1).values.map { g =>
      val sh = g.map(_._2).sum.toDouble
      sh * sh / g.length
    }.sum
    val eta2 = (between - s * s / n) / (q - s * s / n)
    assert(got._1 == xs.length.toLong)
    assert(got._2 == xs.map(_._1).distinct.length.toLong)
    // Scala's group order differs from the pinned fold — tolerance
    assert(math.abs(got._3 - math.round(eta2 * 1e6)) <= 2)
    // eta2 is a variance fraction
    assert(got._3 >= 0 && got._3 <= 1000000L)
  }

  test("ts_heatmap_dow_hour matches an epoch-arithmetic recomputation") {
    val got = SparkEntry.queries("ts_heatmap_dow_hour")(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    val expected = Tables.events(spark, sfDir)
      .select("ts_us", "value").collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1))))
      .groupBy { case (ts, _) =>
        ((ts / 86400000000L + 4) % 7, (ts / 3600000000L) % 24)
      }
      .map { case (k, g) => k -> ((g.length.toLong, g.map(_._2).sum)) }
    assert(got == expected)
    assert(got.keys.forall { case (d0, h) => d0 >= 0 && d0 < 7 && h >= 0 && h < 24 })
  }

  test("ts_sma_cross matches a scan-based crossover recomputation") {
    val got = SparkEntry.queries("ts_sma_cross")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        cents(r.getDouble(3))))
      .groupBy(_._1).map { case (uid, rs) =>
        val xs = rs.sortBy(r => (r._2, r._3)).map(_._4)
        val sgns = (6 until xs.length).map { i =>
          val f3 = xs.slice(i - 2, i + 1).sum
          val s7 = xs.slice(i - 6, i + 1).sum
          (f3 * 7 - s7 * 3).sign.toLong
        }
        val crossings = sgns.sliding(2).count {
          case Seq(a, b) => a * b < 0
          case _ => false
        }
        (uid, sgns.length.toLong, crossings.toLong)
      }.toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("agg_chi2_contingency matches a contingency-table recomputation") {
    val got = SparkEntry.queries("agg_chi2_contingency")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).head
    val rows = Tables.orders(spark, sfDir)
      .select("o_orderstatus", "o_orderpriority").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val o = rows.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val rM = o.groupBy(_._1._1).map { case (s, g) => s -> g.values.sum }
    val cM = o.groupBy(_._1._2).map { case (p, g) => p -> g.values.sum }
    val n = rows.length.toLong
    val chi2 = o.toSeq.sortBy(_._1).map { case ((s, p), obs) =>
      val (r0, c0) = (rM(s), cM(p))
      val d = obs.toDouble * n - r0.toDouble * c0.toDouble
      d * d / (n.toDouble * r0 * c0)
    }.sum
    val v = math.sqrt(chi2 / (n * (math.min(rM.size, cM.size) - 1).toDouble))
    assert(got._1 == n && got._2 == rM.size.toLong && got._3 == cM.size.toLong)
    // Scala's sum order differs from the pinned fold — compare with slack
    assert(math.abs(got._4 - math.round(chi2 * 1e6)) <= 2)
    assert(math.abs(got._5 - math.round(v * 1e6)) <= 2)
  }

  test("mm_audio_resample keeps exactly the even frames") {
    val got = SparkEntry.queries("mm_audio_resample")(spark, sfDir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    docs.foreach { case (id, payload) =>
      val ch = (1 + id % 2).toInt
      val samples = payload.map(b => (((b & 0xff) - 128) << 8).toLong)
      val kept = samples.zipWithIndex.filter { case (_, i) => (i / ch) % 2 == 0 }
      val expected = (samples.length.toLong, kept.length.toLong,
        kept.map(p => math.abs(p._1)).sum, 8000L * (1 + id % 3) / 2)
      assert(got(id) == expected, s"doc $id")
    }
  }

  test("graph_modularity matches a set-based Newman Q recomputation") {
    val got = SparkEntry.queries("graph_modularity")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).head
    // labels from the op's own WCC output (itself closure-checked in
    // its spec); edges from the top-K artifact
    val lab = SparkEntry.queries("graph_wcc")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val edges = SparkEntry.queries("graph_edges_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val e2 = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1))).toSet
    val m2 = e2.size.toLong
    val deg = e2.groupBy(_._1).map { case (x, es) => x -> es.size.toLong }
    val dc = deg.groupBy(p => lab(p._1)).map { case (l, ds) =>
      l -> ds.values.sum }
    val within = e2.groupBy(p => lab(p._1))
      .map { case (l, es) => l -> es.count(p => lab(p._2) == l).toLong }
    val se2 = within.values.sum
    val sd2 = dc.values.map(d => BigInt(d) * BigInt(d)).sum
    val q = (m2.toDouble * se2.toDouble - sd2.toDouble) /
      (m2.toDouble * m2.toDouble)
    assert(got == ((dc.size.toLong, m2 / 2, se2 / 2, math.round(q * 1e6))))
    // Q is bounded in [-0.5, 1]
    assert(got._4 >= -500000L && got._4 <= 1000000L)
  }

  test("graph_clustering_coef matches a neighbor-set recomputation") {
    val got = SparkEntry.queries("graph_clustering_coef")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val edges = SparkEntry.queries("graph_edges_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1))).toSet
    val nb: Map[Long, Set[Long]] =
      sym.groupBy(_._1).map { case (x, es) => x -> es.map(_._2) }
    val expected = nb.toSeq.map { case (x, ns) =>
      val t = ns.toSeq.combinations(2)
        .count { case Seq(u, v) => nb(u).contains(v) }.toLong
      val d = ns.size.toLong
      val coef = if (d >= 2) 2000L * t / (d * (d - 1)) else 0L
      (x, d, t, coef)
    }.sortBy(_._1)
    assert(got == expected)
  }
}
