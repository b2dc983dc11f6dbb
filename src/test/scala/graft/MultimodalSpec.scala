package graft

import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, batch shape, and determinism of the
  * partition-wise (stub-)decode stage.
  */
class MultimodalSpec extends SparkSpecBase {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("mm_feature_extract emits one row per document, batches <= 32") {
    val rows = run("mm_feature_extract").collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.length.toLong == nDocs)
    rows.foreach { r =>
      val batchLen = r.getLong(2)
      assert(batchLen >= 1 && batchLen <= 32, s"batch_len=$batchLen")
    }
  }

  test("mm_feature_extract features match a direct byte computation") {
    val feats = run("mm_feature_extract").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect().take(50).foreach { r =>
        val bytes = r.getString(1).getBytes("UTF-8")
        val expSum = bytes.foldLeft(0L)((acc, b) => acc + (b & 0xff))
        val (nBytes, fSum) = feats(r.getLong(0))
        assert(nBytes == bytes.length.toLong && fSum == expSum)
      }
  }

  test("mm_binary_meta byte length equals UTF-8 encoding length") {
    val metas = run("mm_binary_meta").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect().take(50).foreach { r =>
        assert(metas(r.getLong(0)) ==
          r.getString(1).getBytes("UTF-8").length.toLong)
      }
  }

  test("mm_frame_sample emits stride-64 frame windows per document") {
    val byDoc = run("mm_frame_sample").collect()
      .groupBy(_.getLong(0))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect().take(30).foreach { r =>
        val nBytes = r.getString(1).getBytes("UTF-8").length
        val expFrames = math.max(0, (nBytes - 16) / 64 + 1)
        val got = byDoc.getOrElse(r.getLong(0), Array.empty)
        assert(got.length == expFrames,
          s"doc ${r.getLong(0)}: ${got.length} frames, expected $expFrames")
        assert(got.map(_.getInt(1)).sorted.toSeq == (0 until expFrames))
      }
  }

  test("modality routing is a total deterministic function of doc_id") {
    run("mm_binary_meta").collect().foreach { r =>
      val expected = Seq("image", "audio", "video")((r.getLong(0) % 3).toInt)
      assert(r.getString(1) == expected)
    }
  }
}
