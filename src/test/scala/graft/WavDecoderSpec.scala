package graft

import graft.operators.WavDecoder
import graft.operators.WavDecoder.WavMeta

/** Byte-exact contract of the real RIFF/WAVE codec (r4 VERDICT item:
  * one genuinely non-stub decoder behind the multimodal surface).
  */
class WavDecoderSpec extends SparkSpecBase {

  test("synthesize emits the canonical 44-byte PCM header byte-for-byte") {
    // 3 samples, 8 kHz mono: every header byte hand-derived from the
    // WAVE spec (little-endian sizes; dataLen = 6, riffLen = 42)
    val wav = WavDecoder.synthesize(8000, 1, Array[Short](1, -2, 300))
    val expected = Array[Int](
      'R', 'I', 'F', 'F', 42, 0, 0, 0, 'W', 'A', 'V', 'E',
      'f', 'm', 't', ' ', 16, 0, 0, 0,
      1, 0,                         // PCM
      1, 0,                         // mono
      0x40, 0x1f, 0, 0,             // 8000 Hz
      0x80, 0x3e, 0, 0,             // byte rate 16000
      2, 0,                         // block align
      16, 0,                        // bits/sample
      'd', 'a', 't', 'a', 6, 0, 0, 0,
      1, 0,                         // sample 1
      0xfe, 0xff,                   // sample -2 (two's complement LE)
      0x2c, 0x01                    // sample 300
    ).map(_.toByte)
    assert(wav.toSeq == expected.toSeq)
  }

  test("parse recovers every fmt field from synthesized bytes") {
    val wav = WavDecoder.synthesize(24000, 2, Array.fill(10)(7.toShort))
    // 10 16-bit samples over 2 channels = 5 frames
    assert(WavDecoder.parse(wav).contains(WavMeta(1, 2, 24000L, 16, 5L)))
  }

  test("parse walks past unknown chunks and odd-size padding") {
    // RIFF container with a 3-byte (odd → padded) junk chunk BEFORE
    // fmt/data — a real-world container has LIST/INFO chunks here
    val tail = WavDecoder.synthesize(8000, 1, Array[Short](5)).drop(12)
    val junk = Array[Byte]('j', 'u', 'n', 'k', 3, 0, 0, 0, 1, 2, 3, 0)
    val riffLen = 4 + junk.length + tail.length
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + junk.length + tail.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
      .put("WAVE".getBytes("US-ASCII")).put(junk).put(tail)
    assert(WavDecoder.parse(bb.array())
      .contains(WavMeta(1, 1, 8000L, 16, 1L)))
  }

  test("samples16 decodes stored int16s exactly, across junk chunks") {
    // round-trip incl. negative values and the LE byte order
    val pcm = Array[Short](0, 1, -1, 32767, -32768, 256, -257)
    val wav = WavDecoder.synthesize(8000, 1, pcm)
    assert(WavDecoder.samples16(wav).toSeq == pcm.toSeq)
    // and with a junk chunk planted before fmt/data (real containers
    // carry LIST/INFO chunks there) the data-chunk walk still lands
    val tail = wav.drop(12)
    val junk = Array[Byte]('j', 'u', 'n', 'k', 3, 0, 0, 0, 1, 2, 3, 0)
    val bb = java.nio.ByteBuffer.allocate(12 + junk.length + tail.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + junk.length + tail.length)
      .put("WAVE".getBytes("US-ASCII")).put(junk).put(tail)
    assert(WavDecoder.samples16(bb.array()).toSeq == pcm.toSeq)
    // truncated mid-data: only the complete int16s decode
    assert(WavDecoder.samples16(wav.dropRight(3)).toSeq ==
      pcm.dropRight(2).toSeq)
  }

  test("non-WAVE and truncated payloads classify as None, never throw") {
    assert(WavDecoder.parse("plain text payload".getBytes).isEmpty)
    assert(WavDecoder.parse(Array.empty[Byte]).isEmpty)
    val wav = WavDecoder.synthesize(8000, 1, Array[Short](1, 2, 3))
    // cut inside the fmt chunk: no complete fmt → None
    assert(WavDecoder.parse(wav.take(20)).isEmpty)
    // cut inside the DATA chunk: header parses but the data chunk's
    // declared size overruns the payload — must classify None, not
    // return metadata computed from the silently shortened chunk
    assert(WavDecoder.parse(wav.dropRight(2)).isEmpty)
  }

  test("non-byte-aligned bits-per-sample classifies as malformed (ADVICE r5)") {
    // a container declaring 12 bits/sample would integer-truncate
    // bps/8 to 1 and miscount frames — must be None, not wrong meta
    val wav = WavDecoder.synthesize(8000, 1, Array[Short](1, 2, 3, 4))
    wav(34) = 12.toByte // bits/sample LE16 lives at header offset 34
    assert(WavDecoder.parse(wav).isEmpty)
    // and an absurd width (> 64) is equally malformed
    wav(34) = 72.toByte
    assert(WavDecoder.parse(wav).isEmpty)
  }

  test("mm_wav_meta decodes real container bytes end to end") {
    val rows = SparkEntry.queries("mm_wav_meta")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, sr, ch) = (r.getLong(0), r.getLong(3), r.getLong(2))
      assert(sr == 8000L * (1 + id % 3) && ch == 1 + id % 2)
      // duration consistency: n_samples * 1e6 / rate, integer division
      assert(r.getLong(6) == r.getLong(5) * 1000000L / sr)
    }
  }
}
