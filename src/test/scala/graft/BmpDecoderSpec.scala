package graft

import graft.operators.BmpDecoder
import graft.operators.BmpDecoder.BmpMeta

/** Byte-exact contract of the real BMP codec (r5 VERDICT item 2: close
  * the image third of the multimodal decode gap the way WavDecoder
  * closed the audio third).
  */
class BmpDecoderSpec extends SparkSpecBase {

  test("synthesize emits the canonical 54-byte DIB header byte-for-byte") {
    // 5 payload bytes at width 4: height = 2, stride = (12+3)/4*4 = 12,
    // image = 24 bytes — every header byte hand-derived from the spec
    val bmp = BmpDecoder.synthesize(4, Array[Byte](10, 20, 30, 40, 50))
    val expectedHeader = Array[Int](
      'B', 'M',
      78, 0, 0, 0,            // file size 54 + 24
      0, 0, 0, 0,             // reserved
      54, 0, 0, 0,            // pixel-array offset
      40, 0, 0, 0,            // BITMAPINFOHEADER size
      4, 0, 0, 0,             // width
      2, 0, 0, 0,             // height (positive -> bottom-up)
      1, 0,                   // planes
      24, 0,                  // bpp
      0, 0, 0, 0,             // BI_RGB
      24, 0, 0, 0,            // image bytes
      0x13, 0x0b, 0, 0,       // 2835 px/m horizontal (0x0b13)
      0x13, 0x0b, 0, 0,       // 2835 px/m vertical
      0, 0, 0, 0, 0, 0, 0, 0  // palette sizes
    ).map(_.toByte)
    assert(bmp.take(54).toSeq == expectedHeader.toSeq)
    // bottom-up storage: stored FIRST row is LOGICAL row 1 = bytes
    // [50, 0, 0, 0] as gray pixels
    assert(bmp.slice(54, 66).toSeq ==
      Seq[Byte](50, 50, 50, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    // stored second row is logical row 0 = bytes [10, 20, 30, 40]
    assert(bmp.slice(66, 78).toSeq ==
      Seq[Byte](10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40))
  }

  test("parse recovers every DIB field from synthesized bytes") {
    val bmp = BmpDecoder.synthesize(7, Array.fill(20)(9.toByte))
    // height = ceil(20/7) = 3, stride = (21+3)/4*4 = 24
    assert(BmpDecoder.parse(bmp)
      .contains(BmpMeta(7, 3, 24, 24, 54, 72, topDown = false)))
  }

  test("row addresses logical rows through bottom-up storage") {
    val payload = (1 to 8).map(_.toByte).toArray
    val bmp = BmpDecoder.synthesize(4, payload)
    val m = BmpDecoder.parse(bmp).get
    // logical row 0 must be the FIRST payload bytes even though it is
    // stored last in the file
    assert(BmpDecoder.row(bmp, m, 0).toSeq ==
      Seq[Byte](1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4))
    assert(BmpDecoder.row(bmp, m, 1).toSeq ==
      Seq[Byte](5, 5, 5, 6, 6, 6, 7, 7, 7, 8, 8, 8))
  }

  test("top-down containers (negative height) read rows in storage order") {
    val bmp = BmpDecoder.synthesize(4, (1 to 8).map(_.toByte).toArray)
    // flip stored height to -2: per the spec the pixel array is now
    // top-down, so logical row 0 is the FIRST stored row
    val h = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-2).array()
    System.arraycopy(h, 0, bmp, 22, 4)
    val m = BmpDecoder.parse(bmp).get
    assert(m.topDown && m.height == 2)
    // synthesize stored logical row 1 first; under top-down reading
    // that stored-first row IS logical row 0
    assert(BmpDecoder.row(bmp, m, 0).toSeq ==
      Seq[Byte](5, 5, 5, 6, 6, 6, 7, 7, 7, 8, 8, 8))
  }

  test("non-BMP and truncated payloads classify as None, never throw") {
    assert(BmpDecoder.parse("plain text payload".getBytes).isEmpty)
    assert(BmpDecoder.parse(Array.empty[Byte]).isEmpty)
    val bmp = BmpDecoder.synthesize(4, (1 to 8).map(_.toByte).toArray)
    // cut inside the header: too short to parse
    assert(BmpDecoder.parse(bmp.take(40)).isEmpty)
    // cut inside the pixel array: declared image size overruns the
    // payload — must classify, not return meta over the shortened data
    assert(BmpDecoder.parse(bmp.dropRight(3)).isEmpty)
  }

  test("hostile geometry classifies as malformed, never overflows") {
    val bmp = BmpDecoder.synthesize(4, (1 to 8).map(_.toByte).toArray)
    def patched(off: Int, v: Int): Array[Byte] = {
      val c = bmp.clone()
      val b = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
      System.arraycopy(b, 0, c, off, 4)
      c
    }
    assert(BmpDecoder.parse(patched(18, -4)).isEmpty)           // width < 0
    assert(BmpDecoder.parse(patched(18, Int.MaxValue)).isEmpty) // stride ovf
    assert(BmpDecoder.parse(patched(30, 1)).isEmpty)            // compressed
    // non-byte-aligned bpp (12): same guard family as WavDecoder
    val oddBpp = bmp.clone(); oddBpp(28) = 12.toByte
    assert(BmpDecoder.parse(oddBpp).isEmpty)
  }

  test("parse(synthesize) roundtrips geometry and pixels for generated inputs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      w <- Gen.chooseNum(1, 64)
      n <- Gen.chooseNum(0, 600)
      bytes <- Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    } yield (w, bytes.toArray)
    (0 until 200).foreach { i =>
      val (w, payload) =
        gen.pureApply(Gen.Parameters.default, Seed(1000L + i))
      val bmp = BmpDecoder.synthesize(w, payload)
      val m = BmpDecoder.parse(bmp).getOrElse(
        fail(s"case $i (w=$w, n=${payload.length}) failed to parse"))
      assert(m.width == w && m.bitsPerPixel == 24 && !m.topDown)
      assert(m.height == (payload.length + w - 1) / w)
      assert(m.rowStride == (3 * w + 3) / 4 * 4)
      assert(m.imageBytes == m.rowStride * m.height)
      // walking logical rows through the decoder recovers the payload
      // bytes in order (each pixel is 3 identical bytes; pad is zero)
      val recovered = (0 until m.height).iterator.flatMap { r =>
        BmpDecoder.row(bmp, m, r).grouped(3).take(w).map(_.head)
      }.take(payload.length).toArray
      assert(recovered.toSeq == payload.toSeq, s"case $i pixel walk")
      // truncating anywhere inside the pixel array must classify None
      if (m.imageBytes > 0)
        assert(BmpDecoder.parse(bmp.dropRight(1 + i % 3)).isEmpty)
    }
  }

  test("mm_feature_extract decodes real container bytes end to end") {
    val rows = SparkEntry.queries("mm_feature_extract")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, w, h, stride, img) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(4), r.getLong(5))
      assert(w == 16 + id % 17 && stride == (3 * w + 3) / 4 * 4 &&
        img == stride * h)
    }
  }
}
