package graft.operators

/** Minimal real JPEG header codec — the LOSSY image format leg of the
  * multimodal metadata family (PNG covers lossless-compressed, BMP
  * uncompressed, WAV audio). A JPEG's dimensions live inside an
  * entropy-framed segment stream, so unlike BMP/PNG there is no fixed
  * header offset: `sofInfo` is a real marker walk over the JFIF/JPEG
  * segment layout (public spec, ITU T.81 §B): validates SOI, then
  * advances segment-by-segment via each marker's big-endian length
  * field, skipping stuffed 0xFF fill bytes, until it reaches a
  * start-of-frame marker (SOF0–SOF15 excluding the non-frame DHT/JPG/
  * DAC codes C4/C8/CC) and reads sample precision, height, width and
  * component count from the frame header. Foreign, truncated, or
  * negative-length payloads classify as `None` — never exceptions —
  * matching the Bmp/Png/Wav decoder contracts for corpus-scale use.
  *
  * `synthesize` deliberately delegates to `javax.imageio` (in the JDK,
  * no external library): the JDK JPEG encoder is an independent,
  * spec-conformant implementation, so parsing its real output (APP0 +
  * DQT + SOF + DHT + scan segments in whatever order it emits them)
  * exercises the walk against a second implementation — while the
  * FRAME fields it must recover (width/height/precision/components)
  * are pure arithmetic over (doc_id, payload length) that the DuckDB
  * oracle reproduces without any JPEG code. Pixel VALUES are lossy and
  * deliberately never surfaced.
  *
  * Scale note (100 TB): decode runs partition-wise (`mm_jpeg_meta`),
  * binary payloads never shuffle — the same contract as the other
  * decoder paths.
  */
object JpegDecoder {

  /** SOF frame fields of one JPEG payload. */
  final case class JpegMeta(precision: Int, height: Int, width: Int,
                            nComponents: Int, sofMarker: Int)

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  /** True for SOF0..SOF15 minus DHT (C4), JPG (C8), DAC (CC). */
  private def isSof(marker: Int): Boolean =
    marker >= 0xc0 && marker <= 0xcf &&
      marker != 0xc4 && marker != 0xc8 && marker != 0xcc

  /** Real segment walk to the first SOF marker. */
  def sofInfo(b: Array[Byte]): Option[JpegMeta] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None // no SOI
    var off = 2
    while (off + 3 < b.length) {
      // stuffed fill bytes: any number of 0xFF may precede a marker
      if ((b(off) & 0xff) != 0xff) return None // lost sync
      var m = off + 1
      while (m < b.length && (b(m) & 0xff) == 0xff) m += 1
      if (m >= b.length) return None
      val marker = b(m) & 0xff
      if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS before SOF
      if (marker >= 0xd0 && marker <= 0xd7) { // RSTn: no length field
        off = m + 1
      } else {
        if (m + 2 >= b.length) return None
        val segLen = be16(b, m + 1)
        if (segLen < 2 || m + 1 + segLen > b.length) return None // truncated
        if (isSof(marker)) {
          // frame header: precision(1) height(2) width(2) ncomp(1)
          if (segLen < 8) return None
          val p = b(m + 3) & 0xff
          val h = be16(b, m + 4)
          val w = be16(b, m + 6)
          val nc = b(m + 8) & 0xff
          if (h <= 0 || w <= 0 || nc <= 0) return None
          return Some(JpegMeta(p, h, w, nc, marker))
        }
        off = m + 1 + segLen
      }
    }
    None
  }

  /** Encode a grayscale image whose raster is `payload` (row-major,
    * zero-padded to width*height) via the JDK's own JPEG writer.
    */
  /** Thread-cached JDK JPEG ImageWriter (r14 optimization): same
    * rationale as PngDecoder.pngWriter — the `ImageIO.write`
    * convenience path re-runs the registry lookup per image on a
    * single-threaded-per-partition stage. Default compression params
    * are kept (the emitted bytes are unchanged); only the lookup and
    * the per-pixel raster fill were overhead.
    */
  private val jpegWriter =
    new ThreadLocal[javax.imageio.ImageWriter] {
      override def initialValue(): javax.imageio.ImageWriter = {
        val it = javax.imageio.ImageIO.getImageWritersByFormatName("jpg")
        if (!it.hasNext)
          throw new IllegalStateException("JDK JPEG writer unavailable")
        it.next()
      }
    }

  def synthesize(width: Int, height: Int,
                 payload: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    // bulk raster fill (r14): the old per-pixel setSample loop paid a
    // SampleModel indirection + bounds check per byte; setDataElements
    // copies the padded row-major gray buffer in one call — identical
    // pixels (zero past the payload), same encoder input
    val n = width * height
    val data = new Array[Byte](n)
    System.arraycopy(payload, 0, data, 0, math.min(payload.length, n))
    img.getRaster.setDataElements(0, 0, width, height, data)
    val w = jpegWriter.get()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      w.setOutput(ios)
      w.write(null, new javax.imageio.IIOImage(img, null, null), null)
      ios.flush()
    } finally {
      w.setOutput(null)
      ios.close()
    }
    bos.toByteArray
  }
}
