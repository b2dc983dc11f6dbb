package graft

/** ts_downsample_lttb (declared-N: the per-bucket argmax depends on
  * the PREVIOUS pick — sequential, not SQL-expressible). Verified by
  * an independent plain-Scala LTTB implementation over the collected
  * fixture plus structural invariants.
  */
class LttbSpec extends SparkSpecBase {

  private val K = 12

  /** Reference LTTB, written directly from the algorithm statement
    * (Steinarsson 2013): buckets over the interior points, pick
    * maximizing the triangle against the previous pick and the next
    * bucket's centroid. BigInt throughout; ties keep the earliest.
    */
  private def refLttb(pts: IndexedSeq[(Long, Long)]): Seq[Int] = {
    val n = pts.length
    if (n <= K) return pts.indices
    val t0 = pts(0)._1
    val mid = n - 2
    val nb = K - 2
    def start(b: Int) = 1 + (b.toLong * mid / nb).toInt
    var prev = 0
    val out = scala.collection.mutable.ArrayBuffer(0)
    for (b <- 0 until nb) {
      val (nlo, nhi) =
        if (b + 1 < nb) (start(b + 1), start(b + 2)) else (n - 1, n)
      val c = nhi - nlo
      val sx = (nlo until nhi).map(i => BigInt(pts(i)._1 - t0)).sum
      val sy = (nlo until nhi).map(i => BigInt(pts(i)._2)).sum
      val (px, py) = (BigInt(pts(prev)._1 - t0), BigInt(pts(prev)._2))
      // maxBy replaces only on STRICTLY greater, so ties keep the
      // earliest index — the operator's contract
      val best = (start(b) until start(b + 1)).maxBy { i =>
        val (ax, ay) = (BigInt(pts(i)._1 - t0), BigInt(pts(i)._2))
        ((px * c - sx) * (ay - py) - (px - ax) * (sy - py * c)).abs
      }
      out += best
      prev = best
    }
    out += (n - 1)
    out.toSeq
  }

  test("ts_downsample_lttb matches the reference implementation per user") {
    val got = SparkEntry.queries("ts_downsample_lttb")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
      .map { case (u, rs) => u -> rs.sortBy(_._2).map(x => (x._3, x._4)).toSeq }
    val byUser = Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "event_id", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.round(r.getDouble(3) * 100)))
      .groupBy(_._1)
    val expected = byUser.map { case (u, rs) =>
      val pts = rs.sortBy(r => (r._2, r._3)).map(r => (r._2, r._4)).toIndexedSeq
      u -> refLttb(pts).map(pts)
    }
    assert(got == expected)
  }

  test("structural invariants: first/last kept, <= K points, input points in order") {
    val rows = SparkEntry.queries("ts_downsample_lttb")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val s = rs.sortBy(_._2)
      assert(s.length <= K, s"user $u emitted ${s.length} > $K points")
      assert(s.map(_._3).toSeq == s.map(_._3).sorted.toSeq,
        s"user $u picks not time-ordered")
    }
  }

  test("maxBy-first-max note holds: reference ties keep the earliest index") {
    // two identical points: areas tie; Scala maxBy and the operator's
    // strict > both keep the first — pin that they agree on a
    // crafted all-ties series
    val pts = IndexedSeq.tabulate(40)(i => (1000L + i, 7L))
    val picks = refLttb(pts)
    assert(picks.head == 0 && picks.last == 39 && picks.length == K)
    assert(picks == picks.sorted)
  }
}
