package graft.operators

/** Minimal real BMP (Windows DIB) codec — pure JVM, no external image
  * library (r5 VERDICT item 2: close the image third of the multimodal
  * decode gap the same way `WavDecoder` closed the audio third).
  *
  * `parse` is a real header walk over the BITMAPFILEHEADER +
  * BITMAPINFOHEADER layout: it validates the "BM" magic, reads the
  * little-endian DIB fields (signed width/height, planes, bpp,
  * compression), derives the 4-byte-aligned row stride the pixel array
  * is laid out with, and classifies truncated or foreign payloads as
  * `None` — exactly what a production image-meta extraction stage does
  * before handing pixels to a resizer. Negative stored height means
  * top-down row order per the spec; positive means the usual bottom-up
  * storage, and `row` hides that inversion so callers address logical
  * (top-down) rows.
  *
  * `synthesize` writes the canonical 54-byte-header 24-bpp bottom-up
  * layout (one grayscale pixel per payload byte, rows zero-padded to
  * the 4-byte stride), so `parse(synthesize(...))` exercises the parser
  * on real bytes and BmpDecoderSpec pins the header byte-for-byte.
  */
object BmpDecoder {

  /** Metadata of one BMP payload: pixel dimensions, bits per pixel,
    * the 4-byte-aligned row stride, where the pixel array starts, its
    * total size, and whether rows are stored top-down (negative stored
    * height) or bottom-up (the common case).
    */
  final case class BmpMeta(width: Int, height: Int, bitsPerPixel: Int,
                           rowStride: Int, dataOffset: Int,
                           imageBytes: Int, topDown: Boolean)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** Signed little-endian 32-bit read — BMP width/height are signed. */
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Real header walk. Returns None for anything that is not a
    * well-formed uncompressed BMP whose declared pixel array fits the
    * payload — truncation and foreign bytes are classifiable
    * conditions at corpus scale, never exceptions.
    */
  def parse(b: Array[Byte]): Option[BmpMeta] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    // unsigned read: bfSize is a u32, and a hostile size >= 2^31 read
    // signed would go NEGATIVE and sail past the truncation check
    // below (r7 review) — the same unsigned-vs-signed class the
    // width/stride guards already defend against
    val fileSize = le32(b, 2) & 0xffffffffL
    val dataOffset = le32(b, 10)
    val dibSize = le32(b, 14)
    // BITMAPINFOHEADER (40) or a later extension of it
    if (dibSize < 40) return None
    val width = le32(b, 18)
    val rawHeight = le32(b, 22)
    val planes = le16(b, 26)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (width <= 0 || planes != 1 || compression != 0) return None
    // byte-aligned pixels only (8/16/24/32) — the same guard family as
    // WavDecoder's bits-per-sample check
    if (bpp < 8 || bpp > 32 || bpp % 8 != 0) return None
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight.toLong)
    // stride arithmetic in Long: a hostile width must classify, not
    // overflow into a bogus positive stride
    val stride = (width.toLong * (bpp / 8) + 3) / 4 * 4
    val imageBytes = stride * height
    if (height > Int.MaxValue || stride > Int.MaxValue ||
      imageBytes > Int.MaxValue) return None
    // the truncation signature: the declared pixel array (or the
    // declared file size) overruns the actual payload
    if (dataOffset < 54 || dataOffset.toLong + imageBytes > b.length)
      return None
    if (fileSize > b.length) return None
    Some(BmpMeta(width, height.toInt, bpp, stride.toInt, dataOffset,
      imageBytes.toInt, topDown))
  }

  /** The stride bytes of LOGICAL (top-down) pixel row `r`, honoring
    * the container's storage order: bottom-up files keep logical row 0
    * as the LAST stored row, so a reader that ignores the orientation
    * returns the wrong row — pinned in BmpDecoderSpec and by the
    * row-0 oracle column of `mm_feature_extract`.
    */
  def row(b: Array[Byte], m: BmpMeta, r: Int): Array[Byte] = {
    require(r >= 0 && r < m.height, s"row $r outside [0, ${m.height})")
    val stored = if (m.topDown) r else m.height - 1 - r
    val off = m.dataOffset + stored * m.rowStride
    java.util.Arrays.copyOfRange(b, off, off + m.rowStride)
  }

  /** Canonical 24-bpp bottom-up writer: 14-byte file header + 40-byte
    * BITMAPINFOHEADER, one grayscale pixel (b = g = r = byte) per
    * payload byte filling logical rows top-down, rows zero-padded to
    * the 4-byte stride, trailing pixels of a partial last row zero.
    */
  def synthesize(width: Int, payload: Array[Byte]): Array[Byte] = {
    require(width > 0, s"width must be positive, got $width")
    val n = payload.length
    val height = (n + width - 1) / width
    val stride = (3 * width + 3) / 4 * 4
    val imageBytes = stride * height
    val bb = java.nio.ByteBuffer.allocate(54 + imageBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
      .putInt(54 + imageBytes)                  // file size
      .putShort(0).putShort(0)                  // reserved
      .putInt(54)                               // pixel-array offset
      .putInt(40)                               // BITMAPINFOHEADER size
      .putInt(width)
      .putInt(height)                           // positive → bottom-up
      .putShort(1)                              // planes
      .putShort(24)                             // bpp
      .putInt(0)                                // BI_RGB (uncompressed)
      .putInt(imageBytes)
      .putInt(2835).putInt(2835)                // 72 DPI in px/metre
      .putInt(0).putInt(0)                      // palette sizes
    var storedRow = height - 1                  // bottom-up: logical
    while (storedRow >= 0) {                    // last row first
      var c = 0
      while (c < width) {
        val i = storedRow * width + c
        val v: Byte = if (i < n) payload(i) else 0
        bb.put(v).put(v).put(v)
        c += 1
      }
      var pad = stride - 3 * width
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      storedRow -= 1
    }
    bb.array()
  }
}
