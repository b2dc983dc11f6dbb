package graft

import org.apache.spark.sql.functions._
import graft.operators.PipelineQueries

/** `dedup_bloom_prefilter` correctness envelope: the Bloom routing is
  * an execution strategy, so its output must equal the exact anti-join
  * admission for ANY filter sizing — false positives are re-checked by
  * the exact join, false negatives are impossible by construction.
  */
class BloomPrefilterSpec extends SparkSpecBase {

  private def exactAdmitted(): Seq[Long] = {
    val docs = Tables.documents(spark, sfDir).withColumn("h", md5(col("text")))
    val ex = docs.filter(col("source") =!= "src0").select(col("h")).distinct()
    docs.filter(col("source") === "src0")
      .join(ex, Seq("h"), "left_anti")
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
  }

  test("bloom admission equals exact anti-join at the production sizing") {
    val got = PipelineQueries.bloomAdmit(Tables.documents(spark, sfDir),
      100000L, 800000L).collect().map(_.getLong(0)).toSeq
    assert(got == exactAdmitted())
  }

  test("bloom admission survives a deliberately saturated 64-bit filter") {
    // 64 bits for ~450 standing digests: near-every probe is a false
    // positive, so nearly the whole batch is routed through the exact
    // verify join — output must be unchanged, only the routing shifts
    val got = PipelineQueries.bloomAdmit(Tables.documents(spark, sfDir),
      450L, 64L).collect().map(_.getLong(0)).toSeq
    assert(got == exactAdmitted())
  }

  test("empty standing corpus admits the whole batch (null-filter guard)") {
    import spark.implicits._
    val batchOnly = Seq(
      (1L, "alpha", "en", "src0", 5L),
      (2L, "beta", "en", "src0", 4L),
      (3L, "alpha", "en", "src0", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = PipelineQueries.bloomAdmit(batchOnly, 100L, 6400L)
      .collect().map(_.getLong(0)).toSeq
    // no in-batch dedup by contract: all three rows admitted
    assert(got == Seq(1L, 2L, 3L))
  }

  test("building the plan runs NO job (filter arrives as scalar subquery)") {
    // r8: the filter build must stay inside the lazy plan — a driver
    // .first() here would launch a Spark job during query CONSTRUCTION
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // the parquet read itself may run a cold file-listing job — the
      // claim under test is that bloomAdmit ADDS none, so baseline
      // after the read
      val docs = Tables.documents(spark, sfDir)
      Thread.sleep(400); val baseline = counter.get()
      val df = PipelineQueries.bloomAdmit(docs, 100000L, 800000L)
      // force analysis and physical planning (still no action)
      df.queryExecution.analyzed
      val plan = df.queryExecution.executedPlan.toString
      Thread.sleep(400)
      assert(counter.get() == baseline,
        s"bloomAdmit launched ${counter.get() - baseline} job(s) before any action")
      assert(plan.contains("Subquery"),
        "expected the Bloom aggregate to arrive via scalar subquery")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("the probe side plans a might_contain filter (prefilter is real)") {
    val plan = PipelineQueries.bloomAdmit(Tables.documents(spark, sfDir),
      100000L, 800000L).queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "expected the Bloom might_contain predicate in the physical plan:\n" + plan)
  }
}
