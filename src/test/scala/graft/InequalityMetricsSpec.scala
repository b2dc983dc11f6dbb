package graft

/** Independent recomputations for the r9 session-3 second wave:
  * Gini, Pareto concentration, max drawdown, degree assortativity,
  * the named-window SQL surface, and the AES round-trip. Each test
  * rebuilds the answer from collected fixture rows with plain Scala
  * (or, for AES, the independent JDK javax.crypto implementation), so
  * a Spark-side plan bug and an oracle-side SQL bug cannot cancel.
  */
class InequalityMetricsSpec extends SparkSpecBase {

  private def cents(v: Double): Long = math.round(v * 100)

  test("agg_gini matches a pairwise mean-absolute-difference recomputation") {
    val got = SparkEntry.queries("agg_gini")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val rows = Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1))))
    val expected = rows.groupBy(_._1).map { case (flag, rs) =>
      val qs = rs.map(_._2)
      val n = qs.length.toLong
      val s = qs.sum
      // O(n²) per group is fine at sf0.001 (a few hundred rows/flag)
      val num = (for (a <- qs; b <- qs) yield math.abs(a - b)).sum
      (flag, n, s, math.round(num.toDouble / (2.0 * n * s) * 1e6))
    }.toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("agg_gini is 0 for identical values and near (k-1)/k for one-hot") {
    def gini(qs: Seq[Long]): Double = {
      val num = (for (a <- qs; b <- qs) yield math.abs(a - b)).sum
      num.toDouble / (2.0 * qs.length * qs.sum)
    }
    assert(gini(Seq(7, 7, 7, 7)) == 0.0)
    // all mass on one holder of 4: G = (k-1)/k = 0.75
    assert(math.abs(gini(Seq(100, 0, 0, 0)) - 0.75) < 1e-12)
  }

  test("agg_pareto_share matches a sort-based recomputation") {
    val got = SparkEntry.queries("agg_pareto_share")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).head
    val rev = Tables.orders(spark, sfDir)
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1))))
      .groupBy(_._1).map { case (_, rs) => rs.map(_._2).sum }.toSeq
    val sorted = rev.sorted
    val cut = sorted(math.ceil(0.8 * sorted.length).toInt - 1)
    val top = rev.filter(_ > cut)
    val expected = (rev.length.toLong, rev.sum, top.length.toLong,
      top.sum, top.sum * 10000 / rev.sum)
    assert(got == expected)
  }

  test("ts_max_drawdown matches a running-peak recomputation") {
    val got = SparkEntry.queries("ts_max_drawdown")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val expected = Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        cents(r.getDouble(3))))
      .groupBy(_._1).map { case (uid, rs) =>
        val xs = rs.sortBy(r => (r._2, r._3)).map(_._4)
        var peak = Long.MinValue
        var dd = Long.MinValue
        xs.foreach { c =>
          peak = math.max(peak, c)
          dd = math.max(dd, peak - c)
        }
        (uid, xs.length.toLong, peak, dd)
      }.toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("graph_assortativity matches a Pearson recomputation of the edge artifact") {
    val got = SparkEntry.queries("graph_assortativity")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    val edges = SparkEntry.queries("graph_edges_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dir: Set[(Long, Long)] =
      (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1))).toSet
    val deg = dir.groupBy(_._1).map { case (x, es) => x -> es.size.toLong }
    val xy = dir.toSeq.map { case (u, v) => (deg(u), deg(v)) }
    val n = xy.length.toLong
    val sx = xy.map(_._1).sum
    val sy = xy.map(_._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val syy = xy.map(p => p._2 * p._2).sum
    val r = (n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) *
        math.sqrt((n * syy - sy * sy).toDouble))
    assert(got == ((n, math.round(r * 1e6))))
    // sanity: a correlation, so within [-1, 1] scaled
    assert(math.abs(got._2) <= 1000000L)
  }

  test("sql_named_window matches a groupBy-sorted recomputation") {
    val got = SparkEntry.queries("sql_named_window")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong,
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4))).toSeq
    val expected = Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.get(2).toString, cents(r.getDouble(3))))
      .groupBy(_._1).toSeq.flatMap { case (ck, rs) =>
        val ordered = rs.sortBy(r => (r._3, r._2))
        var run = 0L
        var prev = -1L
        ordered.zipWithIndex.map { case ((_, ok, _, c), i) =>
          run += c
          val row = (ck, ok, (i + 1).toLong, run, prev)
          prev = ok
          row
        }
      }.sortBy(t => (t._1, t._3))
    assert(got == expected)
  }

  test("agg_histogram_equi_depth matches a sort-based quartile recomputation") {
    // pins the bucketed two-pass cut selection against the repo-wide
    // percentile_disc contract (smallest value reaching ceil(p*n))
    val got = SparkEntry.queries("agg_histogram_equi_depth")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    val rows = Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), cents(r.getDouble(1))))
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (flag, rs) =>
      val vs = rs.map(_._2).sorted
      val cuts = Seq(0.25, 0.5, 0.75).map(p =>
        vs(math.ceil(p * vs.length).toInt - 1))
      vs.map { v =>
        if (v <= cuts(0)) 0L else if (v <= cuts(1)) 1L
        else if (v <= cuts(2)) 2L else 3L
      }.groupBy(identity).map { case (b, g) => (flag, b, g.length.toLong) }
    }.sortBy(t => (t._1, t._2))
    assert(got == expected)
  }

  test("Spark aes_encrypt ECB/PKCS matches the independent JDK cipher") {
    import javax.crypto.Cipher
    import javax.crypto.spec.SecretKeySpec
    val key = "0123456789abcdef"
    val pt = "O#1-URGENT#12345"
    val sparkCt = spark.sql(
      s"SELECT aes_encrypt(cast('$pt' as binary), '$key', 'ECB', 'PKCS') AS c")
      .collect().head.getAs[Array[Byte]](0)
    val c = Cipher.getInstance("AES/ECB/PKCS5Padding")
    c.init(Cipher.ENCRYPT_MODE,
      new SecretKeySpec(key.getBytes("UTF-8"), "AES"))
    val jdkCt = c.doFinal(pt.getBytes("UTF-8"))
    assert(sparkCt.toSeq == jdkCt.toSeq)
  }
}
