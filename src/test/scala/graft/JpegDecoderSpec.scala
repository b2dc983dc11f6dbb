package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.JpegDecoder

/** JpegDecoder: the marker walk must recover the frame fields from the
  * JDK encoder's real segment stream, and classify hostile bytes as
  * None (never throw) — the corpus-scale contract shared by the
  * Bmp/Png/Wav decoders.
  */
class JpegDecoderSpec extends AnyFunSuite {

  test("sofInfo recovers dims/precision/components across sizes") {
    for ((w, h) <- Seq((1, 1), (16, 3), (31, 7), (64, 64), (200, 1))) {
      val payload = Array.tabulate(w * h)(i => (i * 37 % 251).toByte)
      val jpeg = JpegDecoder.synthesize(w, h, payload)
      val m = JpegDecoder.sofInfo(jpeg)
      assert(m.isDefined, s"no SOF found for ${w}x$h")
      assert(m.get.width == w && m.get.height == h)
      assert(m.get.precision == 8)
      assert(m.get.nComponents == 1)
    }
  }

  test("payload shorter than the raster zero-pads (no exception)") {
    val jpeg = JpegDecoder.synthesize(10, 10, Array[Byte](1, 2, 3))
    assert(JpegDecoder.sofInfo(jpeg).exists(m => m.width == 10 && m.height == 10))
  }

  test("hostile bytes classify as None, never throw") {
    val good = JpegDecoder.synthesize(8, 8, Array.fill(64)(7.toByte))
    val cases = Seq[Array[Byte]](
      Array.empty,
      Array[Byte](0, 1, 2, 3),
      "not a jpeg at all".getBytes,
      Array[Byte](0xff.toByte, 0xd8.toByte), // bare SOI
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte,
        0xff.toByte, 0xff.toByte), // segment length overruns buffer
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte,
        0x00, 0x01), // declared length < 2
      good.take(good.length / 2) // truncated mid-stream
    )
    cases.foreach { c =>
      val r = JpegDecoder.sofInfo(c) // must not throw
      // a truncated real JPEG may still contain a complete SOF segment
      // (the JDK writer emits SOF early); hand-built hostile cases must
      // all classify as None
      if (c.length < 8) assert(r.isEmpty)
    }
  }

  test("a PNG payload is foreign bytes to the JPEG walk") {
    val png = graft.operators.PngDecoder.synthesize(8, Array.fill(64)(9.toByte))
    assert(JpegDecoder.sofInfo(png).isEmpty)
  }
}
