package graft

/** mm_image_resize cross-checked against the INDEPENDENT JDK ImageIO
  * BMP reader: the synthesized container is decoded by javax.imageio
  * (not BmpDecoder), the same 8x8 nearest-neighbor grid is sampled
  * from the resulting BufferedImage, and every emitted feature must
  * match — a BmpDecoder bug and an oracle-arithmetic bug cannot
  * cancel through a third implementation.
  */
class ImageResizeSpec extends SparkSpecBase {

  test("mm_image_resize matches an ImageIO-decoded NN thumbnail") {
    val got = SparkEntry.queries("mm_image_resize")(spark, sfDir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    assert(docs.nonEmpty)
    docs.foreach { case (id, payload) =>
      val bmp = graft.operators.BmpDecoder
        .synthesize((16 + id % 17).toInt, payload)
      val (w, h, sum, tl, tr, bl, br) =
        if (payload.isEmpty) {
          // header-only container: ImageIO rejects zero-height BMPs,
          // and the op defines the thumbnail as all-zero
          ((16 + id % 17), 0L, 0L, 0L, 0L, 0L, 0L)
        } else {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bmp))
          assert(img != null, s"ImageIO failed to decode doc $id")
          val (iw, ih) = (img.getWidth, img.getHeight)
          val g = Array.tabulate(8, 8) { (rt, ct) =>
            val sr = rt * ih / 8
            val sc = ct * iw / 8
            (img.getRGB(sc, sr) & 0xff).toLong // blue channel = gray
          }
          (iw.toLong, ih.toLong, g.map(_.sum).sum,
            g(0)(0), g(0)(7), g(7)(0), g(7)(7))
        }
      assert(got(id) == ((w, h, sum, tl, tr, bl, br)),
        s"doc $id: got ${got(id)}, imageio says ${(w, h, sum, tl, tr, bl, br)}")
    }
  }
}
