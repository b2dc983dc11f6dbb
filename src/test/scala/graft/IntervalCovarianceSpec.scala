package graft

import org.apache.spark.sql.functions._

/** Independent recomputation of the r9 operators: the tiled
  * interval-overlap join against a brute-force cross product, the
  * exact covariance table against a plain Scala double loop over the
  * collected vectors, and the XML round-trip against the parquet
  * rows it staged from (the CurationInvariantSpec pattern — a
  * DIFFERENT algorithm must produce the same answer, in addition to
  * the DuckDB oracle pairing).
  */
class IntervalCovarianceSpec extends SparkSpecBase {

  test("tiled interval-overlap join equals the brute-force cross product") {
    val got = SparkEntry.queries("join_interval_overlap")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def side(mod: Int, lenMod: Int) = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % mod === 0)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("s"),
        date_add(to_date(col("o_orderdate")),
          (col("o_orderkey") % lenMod + 1).cast("int")).as("e"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDate(2).toLocalDate))
    val brute = (for {
      (aId, aS, aE) <- side(97, 5)
      (bId, bS, bE) <- side(89, 7)
      if !aS.isAfter(bE) && !bS.isAfter(aE)
    } yield {
      val s = if (aS.isAfter(bS)) aS else bS
      val e = if (aE.isBefore(bE)) aE else bE
      (aId, bId, java.time.temporal.ChronoUnit.DAYS.between(s, e) + 1)
    }).toSet
    assert(got.nonEmpty && got == brute)
  }

  test("overlap join result is distinct despite multi-tile pairs") {
    val df = SparkEntry.queries("join_interval_overlap")(spark, sfDir)
    assert(df.count() == df.select(col("a_id"), col("b_id")).distinct().count())
  }

  test("exact covariance numerators equal a plain Scala loop") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(x => math.round(x.toDouble * 1000.0)).toArray)
    val n = vecs.length
    val d = vecs.head.length
    val got = SparkEntry.queries("emb_covariance")(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got.size == d * (d + 1) / 2)
    // spot-check every 7th upper-triangle cell plus the full diagonal
    var checked = 0
    for (i <- 0 until d; j <- i until d
         if i == j || (i * d + j) % 7 == 0) {
      val sIj = vecs.map(v => v(i) * v(j)).sum
      val sI = vecs.map(_(i)).sum
      val sJ = vecs.map(_(j)).sum
      assert(got((i + 1L, j + 1L)) == n * sIj - sI * sJ,
        s"cell ($i,$j) mismatch")
      checked += 1
    }
    assert(checked > d) // diagonal + off-diagonal samples actually ran
  }

  test("covariance diagonal is nonnegative (n*S_ii - S_i^2 >= 0)") {
    val bad = SparkEntry.queries("emb_covariance")(spark, sfDir)
      .filter(col("i") === col("j") && col("cov_num") < 0).count()
    assert(bad == 0)
  }

  test("xml round-trip returns exactly the parquet nation rows") {
    val got = SparkEntry.queries("scan_xml_roundtrip")(spark, sfDir)
      .collect().map(_.toString).toSeq
    val want = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .orderBy(col("n_nationkey"))
      .collect().map(_.toString).toSeq
    assert(got.nonEmpty && got == want)
  }
}
