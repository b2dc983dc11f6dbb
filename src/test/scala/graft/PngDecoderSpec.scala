package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PngDecoder

/** PngDecoder contract: real chunk walk + inflate + all-five-filter
  * scanline reconstruction, round-tripped against the JDK's own
  * independent encoder AND against hand-filtered streams that force
  * each filter type individually.
  */
class PngDecoderSpec extends AnyFunSuite {

  test("parse reads the JDK encoder's IHDR fields") {
    val png = PngDecoder.synthesize(16, Array.tabulate(40)(_.toByte))
    val m = PngDecoder.parse(png).get
    assert(m.width == 16)
    assert(m.height == 3) // ceil(40/16)
    assert(m.bitDepth == 8)
    assert(m.colorType == 0) // grayscale
    assert(m.interlace == 0)
  }

  test("pixels round-trip the JDK encoder's filtered+deflated stream") {
    // widths that exercise exact-fit, partial-last-row, and width-1
    // degenerate scanlines; payloads with gradients (Sub/Up friendly)
    // and noise (filter-choice stress)
    val rnd = new scala.util.Random(42)
    for (w <- Seq(1, 7, 16, 33); n <- Seq(1, w, 3 * w - 1, 200)) {
      val payload = Array.tabulate(n)(i =>
        if (n % 2 == 0) (i % 251).toByte else rnd.nextInt(256).toByte)
      val png = PngDecoder.synthesize(w, payload)
      val m = PngDecoder.parse(png).get
      val px = PngDecoder.pixels(png, m)
      assert(px.length == m.width * m.height)
      assert(px.take(n).toSeq == payload.toSeq, s"w=$w n=$n pixel mismatch")
      assert(px.drop(n).forall(_ == 0), s"w=$w n=$n padding not zero")
    }
  }

  test("decoded pixels agree with ImageIO's own reader") {
    val payload = Array.tabulate(100)(i => (i * 37 % 256).toByte)
    val png = PngDecoder.synthesize(20, payload)
    val m = PngDecoder.parse(png).get
    val mine = PngDecoder.pixels(png, m)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val theirs = new Array[Byte](m.width * m.height)
    img.getRaster.getDataElements(0, 0, m.width, m.height, theirs)
    assert(mine.toSeq == theirs.toSeq)
  }

  test("each of the five filter types reconstructs exactly") {
    // hand-roll a PNG whose every scanline uses ONE forced filter
    // type: apply the spec's forward filter, deflate, wrap in chunks
    // (CRCs unchecked by the decoder — this stream exists only to pin
    // the unfilter branches, including Average's truncating divide and
    // Paeth's tie-breaks)
    val w = 13; val h = 5
    val pixels = Array.tabulate(w * h)(i => ((i * 89 + 7) % 256).toByte)
    def px(r: Int, c: Int): Int =
      if (r < 0 || c < 0) 0 else pixels(r * w + c) & 0xff
    val raw = new java.io.ByteArrayOutputStream()
    for (r <- 0 until h) {
      val ft = r % 5
      raw.write(ft)
      for (c <- 0 until w) {
        val x = px(r, c); val a = px(r, c - 1)
        val up = px(r - 1, c); val ul = px(r - 1, c - 1)
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => up
          case 3 => (a + up) / 2
          case 4 =>
            val p = a + up - ul
            val pa = math.abs(p - a); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) up else ul
        }
        raw.write((x - pred) & 0xff)
      }
    }
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw.toByteArray); d.finish()
      val buf = new Array[Byte](4096)
      val out = new java.io.ByteArrayOutputStream()
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val bb = new java.io.ByteArrayOutputStream()
    bb.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    def chunk(typ: String, body: Array[Byte]): Unit = {
      def be(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
        (v >>> 8).toByte, v.toByte)
      bb.write(be(body.length)); bb.write(typ.getBytes("US-ASCII"))
      bb.write(body); bb.write(be(0)) // decoder ignores CRC
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    chunk("IHDR", ihdr)
    // split IDAT mid-stream: the zlib stream must survive arbitrary
    // chunk boundaries
    val half = deflated.length / 2
    chunk("IDAT", deflated.take(half))
    chunk("IDAT", deflated.drop(half))
    chunk("IEND", Array.empty)
    val png = bb.toByteArray
    val m = PngDecoder.parse(png).get
    assert((m.width, m.height) == (w, h))
    assert(PngDecoder.pixels(png, m).toSeq == pixels.toSeq)
  }

  test("a hostile negative chunk length stops the walk instead of looping") {
    val good = PngDecoder.synthesize(8, Array.tabulate(20)(_.toByte))
    val evil = good.clone()
    // first chunk after the signature is IHDR; poison the NEXT
    // chunk's length word (offset 8 + 8 + 13 + 4) to 0xFFFFFFFF
    val o = 8 + 8 + 13 + 4
    evil(o) = 0xff.toByte; evil(o + 1) = 0xff.toByte
    evil(o + 2) = 0xff.toByte; evil(o + 3) = 0xff.toByte
    val m = PngDecoder.parse(evil).get // IHDR itself is intact
    // the walk must terminate; the truncated IDAT stream then
    // classifies as an error, never an infinite loop
    intercept[Exception](PngDecoder.pixels(evil, m))
  }

  test("foreign and truncated payloads classify as None") {
    assert(PngDecoder.parse(Array.empty[Byte]).isEmpty)
    assert(PngDecoder.parse("not a png at all, just text".getBytes).isEmpty)
    val good = PngDecoder.synthesize(8, Array.tabulate(20)(_.toByte))
    assert(PngDecoder.parse(good.take(20)).isEmpty) // truncated pre-IHDR
    val badSig = good.clone(); badSig(0) = 0x42
    assert(PngDecoder.parse(badSig).isEmpty)
  }
}
