package graft

import org.apache.spark.sql.functions._

/** dedup_cc_clusters unrolls 4 label-propagation rounds; this proves a
  * 5th round changes nothing at the dup-bearing scale (fixpoint
  * reached), and that clusters partition their members correctly.
  */
class ClusterConvergenceSpec extends SparkSpecBase {

  private val dupDir = "/root/testdata/sf0.1"

  test("a 5th propagation round is a no-op (fixpoint at 4)") {
    val docs = Tables.documents(spark, dupDir)
      .select(col("doc_id"), md5(col("text")).as("h"))
    val groups = docs.groupBy(col("h")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
    val members = docs.join(groups.select(col("h")), "h")
      .select(col("doc_id"), col("h"))
    val edges = members.as("a")
      .join(members.as("b"), col("a.h") === col("b.h"))
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
    def round(labels: org.apache.spark.sql.DataFrame) =
      edges.join(labels, col("dst") === col("v"))
        .groupBy(col("src")).agg(min(col("label")).as("label"))
        .select(col("src").as("v"), col("label"))
    var l = members.select(col("doc_id").as("v"), col("doc_id").as("label"))
    for (_ <- 1 to 4) l = round(l)
    val after4 = l.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val after5 = round(l).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after4 == after5)
  }

  test("every cluster member shares the cluster head's exact text") {
    val clusters = SparkEntry.queries("dedup_cc_clusters")(spark, dupDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(clusters.nonEmpty)
    val text = Tables.documents(spark, dupDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    clusters.foreach { case (doc, head) =>
      assert(text(doc) == text(head), s"doc $doc != head $head")
    }
  }

  test("dedup_keep_canonical output contains no duplicate texts") {
    val kept = SparkEntry.queries("dedup_keep_canonical")(spark, dupDir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val texts = Tables.documents(spark, dupDir)
      .filter(col("doc_id").isInCollection(kept))
      .select(col("text")).collect().map(_.getString(0))
    assert(texts.length == texts.distinct.length)
    // and nothing was lost: every distinct text is represented
    val allDistinct = Tables.documents(spark, dupDir)
      .select(countDistinct(col("text"))).collect()(0).getLong(0)
    assert(texts.length.toLong == allDistinct)
  }
}
