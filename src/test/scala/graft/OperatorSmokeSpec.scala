package graft

import org.apache.spark.sql.functions._

/** Every declared operator must at least execute and (except genuinely
  * empty-by-construction results) return rows at sf0.001 — the same
  * contract the driver's rows-only check enforces, moved into `sbt test`
  * so a broken operator fails fast.
  */
class OperatorSmokeSpec extends SparkSpecBase {

  // session-window/stateful streaming runs are exercised by
  // StreamingParitySpec; running them twice doubles suite time
  private val coveredElsewhere = Set(
    "stream_dedup", "stream_stateful_count", "stream_watermark_late",
    "stream_tws_running_sum", "stream_static_join")

  // legitimately empty at sf0.001 (oracle agrees: both engines emit 0
  // rows); the smoke check only requires successful execution
  private val emptyOkAtSmallSf = Set(
    "agg_having", "join_left_anti", "set_except",
    "dedup_cc_clusters") // no dup groups exist at sf0.001

  SparkEntry.queries.keys.toSeq.sorted
    .filterNot(coveredElsewhere).foreach { name =>
      test(s"$name executes and returns rows") {
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        if (emptyOkAtSmallSf(name)) assert(n >= 0)
        else assert(n > 0, s"$name returned 0 rows")
      }
    }

  test("oracleSql keys all have matching query entries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("csv round-trip preserves the aggregated table exactly") {
    val out = SparkEntry.queries("scan_csv_roundtrip")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val direct = Tables.nation(spark, sfDir)
      .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(out == direct)
  }

  test("json round-trip preserves the aggregated table exactly") {
    val out = SparkEntry.queries("scan_json_roundtrip")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val direct = Tables.nation(spark, sfDir)
      .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(out == direct)
  }

  test("HLL sketch estimates and their union are within 5% of exact") {
    val rows = SparkEntry.queries("agg_hll_union")(spark, sfDir).collect()
    val (allRow, perRows) = rows.partition(_.getString(0) == "ALL")
    perRows.foreach { r =>
      val (est, exact) = (r.getLong(1) / 1000.0, r.getLong(2))
      assert(math.abs(est - exact) / exact < 0.05,
        s"${r.getString(0)}: est=$est exact=$exact")
    }
    val globalExact = Tables.lineitem(spark, sfDir)
      .select(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    val unionEst = allRow.head.getLong(1) / 1000.0
    assert(math.abs(unionEst - globalExact) / globalExact < 0.05,
      s"union est=$unionEst exact=$globalExact")
  }

  test("HLL registers merge = registers of the union of the value sets") {
    // the mergeability contract the ALL row relies on: elementwise max
    // of per-group register arrays equals the registers computed over
    // the concatenated input — merge order and grouping must not matter
    import graft.functions.HllRegistersAgg
    val li = Tables.lineitem(spark, sfDir)
    val perGroup = li.groupBy(col("l_returnflag"))
      .agg(HllRegistersAgg.registers(col("l_partkey")).as("regs"))
      .select(posexplode(col("regs")).as(Seq("pos", "reg")))
      .groupBy(col("pos")).agg(max(col("reg")).as("reg"))
      .orderBy(col("pos")).collect().map(_.getInt(1))
    val global = li
      .agg(HllRegistersAgg.registers(col("l_partkey")).as("regs"))
      .select(posexplode(col("regs")).as(Seq("pos", "reg")))
      .orderBy(col("pos")).collect().map(_.getInt(1))
    assert(perGroup.length == 4096 && global.length == 4096)
    assert(perGroup.sameElements(global),
      "per-group register max != global registers")
  }

  test("HLL intersection estimates land near the exact overlaps") {
    val rows = SparkEntry.queries("agg_hll_intersection")(spark, sfDir)
      .collect()
    assert(rows.length == 3, s"expected 3 flag pairs, got ${rows.length}")
    rows.foreach { r =>
      val (est, exact) = (r.getLong(2) / 1000.0, r.getLong(3))
      // inclusion-exclusion compounds three sketch errors; the gate is
      // a sanity envelope — exactness is the oracle hash's job
      assert(math.abs(est - exact) <= math.max(25.0, 0.15 * exact),
        s"${r.getString(0)}/${r.getString(1)}: est=$est exact=$exact")
    }
  }

  test("CMS point estimates are one-sided and collision-bounded") {
    val n = Tables.lineitem(spark, sfDir).count()
    val rows = SparkEntry.queries("agg_cms_point")(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (est, exact) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS undercounted key ${r.getLong(0)}")
      assert(est - exact <= n / 64,
        s"key ${r.getLong(0)}: overcount ${est - exact} beyond bound")
    }
  }

  test("CMS sketches merge: sum of per-group sketches = global sketch") {
    import graft.functions.CountMinAgg
    val li = Tables.lineitem(spark, sfDir)
    val perGroup = li.groupBy(col("l_returnflag"))
      .agg(CountMinAgg.sketch(col("l_suppkey")).as("cms"))
      .select(posexplode(col("cms")).as(Seq("pos", "c")))
      .groupBy(col("pos")).agg(sum(col("c")).as("c"))
      .orderBy(col("pos")).collect().map(_.getLong(1))
    val global = li.agg(CountMinAgg.sketch(col("l_suppkey")).as("cms"))
      .select(posexplode(col("cms")).as(Seq("pos", "c")))
      .orderBy(col("pos")).collect().map(_.getLong(1))
    assert(perGroup.length == 4096 && global.length == 4096)
    assert(perGroup.sameElements(global),
      "per-group sketch sum != global sketch")
  }

  test("transpose is the exact flip of the aggregated summary") {
    val t = SparkEntry.queries("reshape_transpose")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val agg = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(Tables.moneySumD(col("l_quantity")).as("q"),
        Tables.moneySumD(col("l_extendedprice")).as("p"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(t("sum_qty") == ((agg("A")._1, agg("N")._1, agg("R")._1)))
    assert(t("sum_price") == ((agg("A")._2, agg("N")._2, agg("R")._2)))
  }

  test("approx_count_distinct is within declared rsd of exact") {
    // the QUERY now emits (exact, envelope flag) — the raw estimate is
    // engine-specific and stays out of the hashed output, so the tight
    // 5% check recomputes it here
    val approx = Tables.lineitem(spark, sfDir)
      .select(approx_count_distinct(col("l_partkey"), 0.01))
      .collect()(0).getLong(0)
    val exact = Tables.lineitem(spark, sfDir)
      .select(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
    val row = SparkEntry.queries("agg_approx_distinct")(spark, sfDir)
      .collect()(0)
    assert(row.getLong(0) == exact && row.getBoolean(1),
      s"query row $row vs exact=$exact")
  }

  test("agg_approx_quantile lands between the exact p∓0.02 quantiles") {
    val approx = SparkEntry.queries("agg_approx_quantile")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val ps = Seq(0.5, 0.9, 0.99)
    approx.foreach { case (prio, qs) =>
      val vals = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === prio)
        .select(col("o_totalprice")).collect().map(_.getDouble(0)).sorted
      ps.zip(qs).foreach { case (p, q) =>
        val lo = vals(((p - 0.02).max(0.0) * (vals.length - 1)).toInt)
        val hi = vals(((p + 0.02).min(1.0) * (vals.length - 1)).ceil.toInt)
        assert(q >= lo && q <= hi,
          s"$prio p$p: approx=$q outside [$lo, $hi]")
      }
    }
  }
}
