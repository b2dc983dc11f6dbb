package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Independent recomputations for the r9 selection/serial-stats wave:
  * weighted median, lag-1 autocorrelation, CUSUM, DISTINCT ON, inline
  * VALUES, and the base64 round-trip. Each test rebuilds the answer
  * from collected fixture rows with plain Scala (no Spark operators),
  * so a Spark-side plan bug and an oracle-side SQL bug cannot cancel.
  */
class SelectionStatsSpec extends SparkSpecBase {

  private def cents(v: Double): Long = math.round(v * 100)

  test("agg_weighted_median matches a sort-and-scan recomputation") {
    val got = SparkEntry.queries("agg_weighted_median")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val rows = Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_extendedprice", "l_quantity")
      .collect()
      .map(r => (r.getString(0), cents(r.getDouble(1)),
        r.getDouble(2).toLong))
    val expected = rows.groupBy(_._1).map { case (flag, rs) =>
      val totalW = rs.map(_._3).sum
      val sorted = rs.sortBy(_._2)
      var cum = 0L
      val wmed = sorted.find { case (_, _, w) =>
        cum += w; cum * 2 >= totalW
      }.get._2
      (flag, rs.length.toLong, totalW, wmed)
    }.toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("ts_autocorr matches an ordered-fold recomputation (exact IEEE)") {
    val got = SparkEntry.queries("ts_autocorr")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    val byUser = Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "event_id", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        cents(r.getDouble(3))))
      .groupBy(_._1)
    val expected = byUser.flatMap { case (uid, rs) =>
      val xs = rs.sortBy(r => (r._2, r._3)).map(_._4)
      val pairs = xs.zip(xs.drop(1))
      if (pairs.isEmpty) None
      else {
        val n = pairs.length.toDouble
        val sx = pairs.map(_._1).sum.toDouble
        val sy = pairs.map(_._2).sum.toDouble
        val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
        val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
        val syy = pairs.map(p => p._2 * p._2).sum.toDouble
        val dx = n * sxx - sx * sx
        val dy = n * syy - sy * sy
        val corr = if (dx == 0.0 || dy == 0.0) None
          else Some((n * sxy - sx * sy) / (math.sqrt(dx) * math.sqrt(dy)))
        Some(uid -> (pairs.length.toLong, corr))
      }
    }
    assert(got == expected)
  }

  test("ts_cusum matches an all-integer recomputation") {
    val got = SparkEntry.queries("ts_cusum")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq.sortBy(_._1)
    val byUser = Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "event_id", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        cents(r.getDouble(3))))
      .groupBy(_._1)
    val expected = byUser.map { case (uid, rs) =>
      val xs = rs.sortBy(r => (r._2, r._3)).map(_._4)
      val n = xs.length.toLong
      val mean = Math.floorDiv(xs.sum, n) // both engines: positive sums
      var cum = 0L
      var maxAbs = 0L
      xs.foreach { x => cum += x - mean; maxAbs = math.max(maxAbs, math.abs(cum)) }
      (uid, n, mean, maxAbs)
    }.toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("ts_rolling_median matches a sliding-window recomputation") {
    val got = SparkEntry.queries("ts_rolling_median")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "event_id", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        cents(r.getDouble(3))))
      .groupBy(_._1)
      .flatMap { case (uid, rs) =>
        val ordered = rs.sortBy(r => (r._2, r._3))
        ordered.indices.map { i =>
          val frame = ordered.slice(math.max(0, i - 4), i + 1)
            .map(_._4).sorted
          (uid, ordered(i)._3, frame((frame.length + 1) / 2 - 1))
        }
      }.toSeq.sortBy(r => (r._1, r._2))
    assert(got == expected)
  }

  test("sql_distinct_on picks the argmax row per customer") {
    val got = SparkEntry.queries("sql_distinct_on")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val expected = Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (_, rs) => rs.minBy(r => (-r._3, r._2)) }
      .toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("sql_filter_clause matches per-predicate recomputed counts") {
    val got = SparkEntry.queries("sql_filter_clause")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    val rows = Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_quantity", "l_discount", "l_tax",
        "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val expected = rows.groupBy(_._1).map { case (flag, rs) =>
      val taxed = rs.filter(_._4 > 0.04)
        .map(r => BigDecimal(r._5).setScale(2)).sum
      (flag, rs.length.toLong,
        rs.count(_._2 >= 25).toLong,
        rs.count(_._3 > 0.05).toLong,
        taxed.toDouble)
    }.toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("ts_week_over_week matches a weekly-series recomputation") {
    val got = SparkEntry.queries("ts_week_over_week")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        if (r.isNullAt(6)) None else Some(r.getLong(6)))).toSeq
    val weekly = Tables.events(spark, sfDir)
      .select("event_type", "ts_us", "value").collect()
      .map(r => ((r.getString(0), r.getLong(1) / 604800000000L),
        cents(r.getDouble(2))))
      .groupBy(_._1)
      .map { case ((t, wk), rs) =>
        (t, wk, rs.length.toLong, rs.map(_._2).sum)
      }.toSeq
    val expected = weekly.groupBy(_._1).toSeq.flatMap { case (_, series) =>
      val s = series.sortBy(_._2)
      s.zipWithIndex.map { case ((t, wk, n, rev), i) =>
        val prev = if (i == 0) None else Some(s(i - 1))
        (t, wk, n, rev, prev.map(_._3),
          prev.map(p => n - p._3), prev.map(p => rev - p._4))
      }
    }.sortBy(r => (r._1, r._2))
    assert(got == expected)
  }

  test("sql_values_inline decodes region keys through the literal dim") {
    val got = SparkEntry.queries("sql_values_inline")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val zones = Map(0 -> "alpha", 1 -> "beta", 2 -> "gamma",
      3 -> "delta", 4 -> "epsilon")
    val expected = Tables.nation(spark, sfDir)
      .select("n_regionkey").collect()
      .map(_.getAs[Number]("n_regionkey").intValue())
      .groupBy(identity).map { case (rk, xs) =>
        (rk, zones(rk), xs.length.toLong)
      }.toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("weightedMedian boundary: an exact half-total crossing picks the LOWER value") {
    val ss = spark
    import ss.implicits._
    // weights 1/1: cum at the lower value is exactly half → 2*cum == total
    val df = Seq(("g", 10L, 1L), ("g", 20L, 1L)).toDF("grp", "v", "w")
    val r = graft.api.GraftOps.weightedMedian(df, "grp", "v", "w").collect()
    assert(r.length == 1 && r(0).getAs[Long]("wmed") == 10L)
    // weight-dominant upper value pulls the median up
    val df2 = Seq(("g", 10L, 1L), ("g", 20L, 3L)).toDF("grp", "v", "w")
    val r2 = graft.api.GraftOps.weightedMedian(df2, "grp", "v", "w").collect()
    assert(r2(0).getAs[Long]("wmed") == 20L)
  }

  test("weightedMedian handles negative values and bucket-boundary straddles") {
    val ss = spark
    import ss.implicits._
    // values straddle negative/positive buckets with width 10
    val df = Seq(("g", -25L, 1L), ("g", -5L, 1L), ("g", 5L, 1L),
      ("g", 15L, 1L), ("g", 95L, 1L)).toDF("grp", "v", "w")
    val r = graft.api.GraftOps.weightedMedian(df, "grp", "v", "w", 10L)
      .collect()
    // total 5, crossing at cumulative 3 (2*3 >= 5) → 3rd smallest = 5
    assert(r.length == 1 && r(0).getAs[Long]("wmed") == 5L)
    // a sort-and-scan cross-check on a pseudo-random micro set
    val vals = (1 to 97).map(i => ((i * 7919) % 101 - 50).toLong)
    val ws = (1 to 97).map(i => ((i * 104729) % 7 + 1).toLong)
    val df2 = vals.zip(ws).map { case (v, w) => ("g", v, w) }
      .toDF("grp", "v", "w")
    val got = graft.api.GraftOps.weightedMedian(df2, "grp", "v", "w", 13L)
      .collect()(0).getAs[Long]("wmed")
    val totalW = ws.sum
    var cum = 0L
    val want = vals.zip(ws).sortBy(_._1).find { case (_, w) =>
      cum += w; cum * 2 >= totalW
    }.get._1
    assert(got == want)
  }

  test("weightedMedian is invariant to bucketWidth (the partition is internal)") {
    val ss = spark
    import ss.implicits._
    val rows = (1 to 211).map { i =>
      (s"g${i % 3}", ((i * 7919) % 1009 - 500).toLong, ((i * 104729) % 9 + 1).toLong)
    }
    val df = rows.toDF("grp", "v", "w")
    val results = Seq(1L, 7L, 97L, 65536L).map { bw =>
      graft.api.GraftOps.weightedMedian(df, "grp", "v", "w", bw)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq.sortBy(_._1)
    }
    assert(results.distinct.size == 1,
      s"bucketWidth changed the answer: $results")
  }

  test("cusum boundary: single-row and constant series have zero drift") {
    val ss = spark
    import ss.implicits._
    val df = Seq((1L, 1L, 5L), (2L, 1L, 7L), (2L, 2L, 7L), (2L, 3L, 7L))
      .toDF("k", "t", "v")
    val r = graft.api.GraftOps.cusum(df, "k", "v", Seq("t")).collect()
      .map(x => x.getAs[Long]("k") -> x.getAs[Long]("max_abs_cusum")).toMap
    assert(r == Map(1L -> 0L, 2L -> 0L))
  }

  test("lag1Autocorr boundary: <2 rows yields no row; constant series yields NULL") {
    val ss = spark
    import ss.implicits._
    val df = Seq((1L, 1L, 5L), (2L, 1L, 7L), (2L, 2L, 7L), (2L, 3L, 7L),
      (3L, 1L, 1L), (3L, 2L, 2L), (3L, 3L, 3L), (3L, 4L, 4L))
      .toDF("k", "t", "v")
    val rows = graft.api.GraftOps.lag1Autocorr(df, "k", "v", Seq("t"))
      .collect().map(r => r.getAs[Long]("k") ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(!rows.contains(1L)) // no pairs
    assert(rows(2L).isEmpty)   // zero variance → NULL, not NaN/inf
    // a perfectly linear series has lag-1 autocorrelation exactly 1
    assert(math.abs(rows(3L).get - 1.0) < 1e-12)
  }

  test("text_gopher_rules matches a plain-Scala rule recomputation") {
    val got = SparkEntry.queries("text_gopher_rules")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
        r.getBoolean(6))).toSeq
    val stop = Set("the", "a")
    val expected = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map { r =>
        val words = r.getString(1).split(" ", -1)
        val nw = words.length.toLong
        val sumW = words.map(_.length.toLong).sum
        val nStop = stop.count(words.contains).toLong
        val rWc = nw >= 20 && nw <= 1000
        val rWl = sumW >= nw * 3 && sumW <= nw * 10
        val rSw = nStop >= 2
        (r.getLong(0), nw, nStop, rWc, rWl, rSw, rWc && rWl && rSw)
      }.toSeq.sortBy(_._1)
    assert(got == expected)
    // both verdicts must be exercised by the fixture or the gate is vacuous
    assert(got.exists(_._7) && got.exists(!_._7))
  }

  test("fn_base64_roundtrip emits canonical RFC 4648 and decodes losslessly") {
    val got = SparkEntry.queries("fn_base64_roundtrip")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSeq
    val md = MessageDigest.getInstance("MD5")
    val expected = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map { r =>
        val bytes = r.getString(1).getBytes(StandardCharsets.UTF_8)
        val b64 = java.util.Base64.getEncoder.encodeToString(bytes)
        val dig = md.digest(bytes).map("%02x".format(_)).mkString
        (r.getLong(0), b64, b64.length.toLong, dig)
      }.toSeq.sortBy(_._1)
    assert(got == expected)
  }
}
