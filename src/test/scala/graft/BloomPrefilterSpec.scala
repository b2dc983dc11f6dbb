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

  test("the probe side plans a might_contain filter (prefilter is real)") {
    val plan = PipelineQueries.bloomAdmit(Tables.documents(spark, sfDir),
      100000L, 800000L).queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "expected the Bloom might_contain predicate in the physical plan:\n" + plan)
  }
}
