package graft

import graft.expressions.{MediaHeaderKernel, MediaStripKernel, PixelKernel}
import graft.queries.PixelFixtures

/** The metadata-strip kernel's invariants: pixels bit-identical, the
  * planted metadata GONE (not blanked), idempotence, and survival of a
  * REAL encoder's output (the JDK's own JPEG writer — independent
  * framing with its own APP0/quant/huffman segments).
  */
class MediaStripSpec extends SparkSpec {

  test("PNG: tEXt gone, stripped bytes equal the metadata-free original exactly") {
    for (s <- Seq(0L, 9L, 123L)) {
      val stripped = MediaStripKernel.strip(PixelFixtures.pngWithText(s))
      assert(stripped.toSeq === PixelFixtures.pngGray(s).toSeq, s"s=$s")
      // and the planted payload is unfindable in the output
      assert(!new String(stripped, "ISO-8859-1").contains("gps"))
    }
    // all PNG metadata chunk types go; IDAT/IEND survive
    val base = PixelFixtures.pngGray(4L)
    assert(MediaStripKernel.strip(base).toSeq === base.toSeq) // idempotent base
  }

  test("JPEG: Exif + COM gone, dims survive, orientation resets; APP0 kept") {
    val j = PixelFixtures.jpegWithExif(77L)
    val before = MediaHeaderKernel.parse(j)
    assert(before.getLong(4) === 77L % 8 + 1) // planted orientation
    val s = MediaStripKernel.strip(j)
    assert(s.length === 41)
    val after = MediaHeaderKernel.parse(s)
    assert(after.getLong(1) === before.getLong(1)) // width
    assert(after.getLong(2) === before.getLong(2)) // height
    assert(after.getLong(4) === 1L) // Exif GONE → identity
    assert(new String(s, "ISO-8859-1").contains("JFIF")) // APP0 kept
    assert(!new String(s, "ISO-8859-1").contains("Exif"))
    assert(!new String(s, "ISO-8859-1").contains("note"))
    // idempotent: a second strip is a byte-identical no-op
    assert(MediaStripKernel.strip(s).toSeq === s.toSeq)
  }

  test("a REAL JDK-encoded JPEG survives stripping and decodes to the same pixels") {
    val w = 40; val h = 24
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 7) << 16) | ((y * 11) << 8) | ((x + y) * 3))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    val orig = bos.toByteArray
    val stripped = MediaStripKernel.strip(orig)
    assert(stripped != null && stripped.length <= orig.length)
    val round = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(stripped))
    assert(round != null && round.getWidth === w && round.getHeight === h)
    val a = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(orig))
    for (y <- 0 until h; x <- 0 until w)
      assert(round.getRGB(x, y) === a.getRGB(x, y), s"pixel ($x,$y)")
  }

  test("non-image / corrupt payloads NULL — a privacy pass never passes bytes through silently") {
    assert(MediaStripKernel.strip("plain text".getBytes) == null)
    assert(MediaStripKernel.strip(PixelFixtures.stripPayload(2L)) == null)
    assert(MediaStripKernel.strip(
      PixelFixtures.jpegWithExif(1L).dropRight(3)) == null) // no EOI/SOS
    val badLen = PixelFixtures.pngWithText(1L).clone()
    badLen(33) = 0x7F.toByte // tEXt length into the gigabytes
    assert(MediaStripKernel.strip(badLen) == null)
  }
}
