package graft

/** Independent recomputations for the r9 session-3 wave: categorical
  * entropy, cohort retention, rolling z-score anomalies, RFM scoring,
  * symmetric difference, split_part, date-series explode, and 2-hop
  * reach. Each test rebuilds the answer from collected fixture rows
  * with plain Scala (no Spark operators), so a Spark-side plan bug and
  * an oracle-side SQL bug cannot cancel.
  */
class CohortScoreSpec extends SparkSpecBase {

  private def cents(v: Double): Long = math.round(v * 100)

  /** The repo-wide percentile_disc contract: smallest element whose
    * cumulative distribution reaches p.
    */
  private def disc(sorted: Seq[Long], p: Double): Long =
    sorted(math.ceil(p * sorted.length).toInt - 1)

  test("agg_entropy matches an ordered-fold recomputation") {
    val got = SparkEntry.queries("agg_entropy")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val rows = Tables.orders(spark, sfDir)
      .select("o_orderstatus", "o_orderpriority").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = rows.groupBy(_._1).map { case (st, rs) =>
      val counts = rs.groupBy(_._2).map { case (p, g) => (p, g.length.toLong) }
        .toSeq.sortBy(_._1)
      val n = counts.map(_._2).sum
      val s1 = counts.foldLeft(0.0) { case (acc, (_, c)) =>
        acc + c.toDouble * (math.log(c.toDouble) / math.log(2.0))
      }
      val h = math.log(n.toDouble) / math.log(2.0) - s1 / n
      (st, n, counts.length.toLong, math.round(h * 1e6))
    }.toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("agg_entropy is 0 for a 1-value group and log2(k) for uniform") {
    // closed-form sanity on the formula itself (pure Scala mirror)
    def h(counts: Seq[Long]): Double = {
      val n = counts.sum
      val s1 = counts.foldLeft(0.0)((a, c) =>
        a + c.toDouble * math.log(c.toDouble) / math.log(2.0))
      math.log(n.toDouble) / math.log(2.0) - s1 / n
    }
    assert(math.abs(h(Seq(42L))) < 1e-12)
    assert(math.abs(h(Seq(7L, 7L, 7L, 7L)) - 2.0) < 1e-12)
  }

  test("ts_retention_cohort matches a set-based recomputation") {
    val got = SparkEntry.queries("ts_retention_cohort")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val weekUs = 7L * 24 * 3600 * 1000000L
    val act = Tables.events(spark, sfDir).select("user_id", "ts_us")
      .collect().map(r => (r.getLong(0), Math.floorDiv(r.getLong(1), weekUs)))
      .toSet
    val cohort = act.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val cells = act.toSeq
      .map { case (u, w) => ((cohort(u), w - cohort(u)), u) }
      .groupBy(_._1).map { case (k, g) => (k, g.length.toLong) }
    val expected = cells.toSeq.map { case ((cw, off), n) =>
      val size = cells((cw, 0L))
      (cw, off, n, size, n * 10000 / size)
    }.sortBy(t => (t._1, t._2))
    assert(got == expected)
  }

  test("ts_anomaly_zscore matches a sliding-frame recomputation") {
    val got = SparkEntry.queries("ts_anomaly_zscore")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq.sortBy(_._1)
    val byUser = Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        cents(r.getDouble(3))))
      .groupBy(_._1)
    val expected = byUser.map { case (uid, rs) =>
      val xs = rs.sortBy(r => (r._2, r._3)).map(_._4)
      var scored = 0L
      var anom = 0L
      for (i <- xs.indices) {
        val frame = xs.slice(math.max(0, i - 6), i)
        if (frame.length == 6) {
          scored += 1
          val s = frame.sum
          val s2 = frame.map(c => c * c).sum
          val x = xs(i)
          if ((x * 6 - s) * (x * 6 - s) > (s2 * 6 - s * s) * 4) anom += 1
        }
      }
      (uid, xs.length.toLong, scored, anom)
    }.toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("ts_rfm_scores matches a cut-and-compare recomputation") {
    val got = SparkEntry.queries("ts_rfm_scores")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toSeq
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    val anchor = java.time.LocalDate.parse("1998-12-31", fmt)
    val prof = Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderdate", "o_totalprice").collect()
      .map(r => (r.getLong(0), (r.get(1) match {
        case t: java.sql.Timestamp => t.toLocalDateTime
        case t: java.time.LocalDateTime => t
      }).toLocalDate, cents(r.getDouble(2))))
      .groupBy(_._1).map { case (ck, rs) =>
        val rDays = java.time.temporal.ChronoUnit.DAYS.between(
          rs.map(_._2).max(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _)),
          anchor)
        (ck, rDays, rs.length.toLong, rs.map(_._3).sum)
      }.toSeq
    val rC = prof.map(_._2).sorted
    val fC = prof.map(_._3).sorted
    val mC = prof.map(_._4).sorted
    def scoreHigh(v: Long, c: Seq[Long]): Long =
      1L + Seq(0.25, 0.5, 0.75).count(p => v > disc(c, p))
    def scoreLow(v: Long, c: Seq[Long]): Long =
      1L + Seq(0.25, 0.5, 0.75).count(p => v <= disc(c, p))
    val expected = prof.map { case (ck, r, f, m) =>
      val (rs, fs, ms) = (scoreLow(r, rC), scoreHigh(f, fC), scoreHigh(m, mC))
      (ck, r, f, m, rs, fs, ms, rs * 100 + fs * 10 + ms)
    }.sortBy(_._1)
    assert(got == expected)
  }

  test("set_symmetric_diff matches a Scala-set recomputation") {
    val got = SparkEntry.queries("set_symmetric_diff")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val a = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_mktsegment").collect()
      .filter(_.getString(1) == "AUTOMOBILE").map(_.getLong(0)).toSet
    val b = Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderpriority").collect()
      .filter(_.getString(1) == "1-URGENT").map(_.getLong(0)).toSet
    val expected = ((a -- b).toSeq.map(_ -> "auto_only") ++
      (b -- a).toSeq.map(_ -> "urgent_only")).sorted
    assert(got == expected)
  }

  test("fn_split_part matches a string-split recomputation") {
    val got = SparkEntry.queries("fn_split_part")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq
    val expected = Tables.orders(spark, sfDir)
      .select("o_orderpriority").collect().map(_.getString(0))
      .groupBy(identity).map { case (p, g) =>
        val parts = p.split("-", -1)
        (parts(0), parts(1), g.length.toLong)
      }.toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("fn_sequence_explode emits exactly 4 consecutive days per order") {
    val rows = SparkEntry.queries("fn_sequence_explode")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (k, g) =>
      val ds = g.map(_._2).sortBy(_.toEpochDay)
      assert(ds.length == 4, s"order $k: ${ds.length} days")
      assert(ds.last.toEpochDay - ds.head.toEpochDay == 3,
        s"order $k: non-consecutive span")
    }
  }

  test("graph_2hop_reach matches a BFS-set recomputation of the edge artifact") {
    val got = SparkEntry.queries("graph_2hop_reach")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val edges = SparkEntry.queries("graph_edges_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym: Set[(Long, Long)] =
      (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1))).toSet
    val und: Map[Long, Set[Long]] =
      sym.groupBy(_._1).map { case (x, es) => x -> es.map(_._2) }
    val expected = und.toSeq.map { case (x, n1) =>
      val n2 = n1.flatMap(und.getOrElse(_, Set.empty)) - x
      (x, n1.size.toLong, (n1 ++ n2).size.toLong)
    }.sortBy(_._1)
    assert(got == expected)
  }
}
