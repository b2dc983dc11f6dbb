package graft

import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, decoded-geometry, and determinism of
  * the partition-wise decode stage (real BMP/WAV codecs as of r6).
  */
class MultimodalSpec extends SparkSpecBase {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("mm_feature_extract emits one decoded geometry row per document") {
    val rows = run("mm_feature_extract").collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.length.toLong == nDocs)
    rows.foreach { r =>
      val (id, w, h, bpp, stride, img) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(w == 16 + id % 17)
      assert(bpp == 24L)
      assert(stride == (3 * w + 3) / 4 * 4)
      assert(img == stride * h)
    }
  }

  test("mm_feature_extract sums match a direct byte computation") {
    val feats = run("mm_feature_extract").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(6), r.getLong(7))).toMap
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect().take(50).foreach { r =>
        val id = r.getLong(0)
        val bytes = r.getString(1).getBytes("UTF-8")
        val w = (16 + id % 17).toInt
        val expSum = 3L * bytes.foldLeft(0L)((acc, b) => acc + (b & 0xff))
        val expRow0 = 3L * bytes.take(w).foldLeft(0L)(
          (acc, b) => acc + (b & 0xff))
        val expH = (bytes.length + w - 1) / w
        val (h, px, row0) = feats(id)
        assert(h == expH.toLong && px == expSum && row0 == expRow0)
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

  test("mm_frame_sample frames come from the parsed container layout") {
    val byDoc = run("mm_frame_sample").collect()
      .groupBy(_.getLong(0))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect().take(30).foreach { r =>
        val id = r.getLong(0)
        val nBytes = r.getString(1).getBytes("UTF-8").length
        val w = (16 + id % 17).toInt
        val expFrames = (nBytes + w - 1) / w // decoded height
        val got = byDoc.getOrElse(id, Array.empty)
        assert(got.length == expFrames,
          s"doc $id: ${got.length} frames, expected $expFrames")
        assert(got.map(_.getLong(1)).sorted.toSeq ==
          (0 until expFrames).map(_.toLong))
        // every frame is exactly one decoded row stride wide
        got.foreach(f => assert(f.getLong(2) == (3 * w + 3) / 4 * 4))
      }
  }

  test("modality routing is a total deterministic function of doc_id") {
    run("mm_binary_meta").collect().foreach { r =>
      val expected = Seq("image", "audio", "video")((r.getLong(0) % 3).toInt)
      assert(r.getString(1) == expected)
    }
  }

  test("mm_phash_dedup equals a synthesis-arithmetic recomputation") {
    // Independent second opinion: the operator hashes pixels read
    // through the REAL decoder; this recomputes the bands straight
    // from the synthesis definition (sample (ri,ci) = payload byte
    // (ri*h/8)*w + ci*w/8, zero past the payload) and re-derives the
    // full candidate + hamming<=3 pair set driver-side.
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def bandsOf(id: Long, text: String): Array[Long] = {
      val payload = text.getBytes("UTF-8")
      val w = (16 + id % 17).toInt
      val n = payload.length
      val h = (n + w - 1) / w
      val smp = Array.tabulate(64) { i =>
        val idx = ((i / 8) * h / 8) * w + (i % 8) * w / 8
        if (idx < n) payload(idx) & 0xff else 0
      }
      val sum = smp.map(_.toLong).sum
      Array.tabulate(4) { b =>
        (0 until 16).foldLeft(0L)((acc, j) =>
          acc * 2 + (if (64L * smp(16 * b + j) > sum) 1L else 0L))
      }
    }
    val bs = docs.map { case (id, t) => id -> bandsOf(id, t) }
    val exp = (for {
      (a, ba) <- bs
      (b, bb) <- bs
      if a < b && (0 until 4).exists(k => ba(k) == bb(k))
      ham = (0 until 4).map(k => java.lang.Long.bitCount(ba(k) ^ bb(k))).sum
      if ham <= 3
    } yield (a, b, ham.toLong)).toSet
    val got = run("mm_phash_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exp,
      s"spurious=${got -- exp} missing=${exp -- got}")
  }
}
