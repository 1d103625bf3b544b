package graft

import graft.expressions.PixelKernel
import graft.queries.PixelFixtures

/** The pixel-decode kernel validated three independent ways:
  *
  *  1. against the JDK's OWN PNG encoder (`javax.imageio` — real
  *     Deflater compression, encoder-chosen filters, a code path
  *     sharing nothing with either the kernel or the fixtures): stats
  *     decoded by the kernel must equal stats computed directly from
  *     the BufferedImage;
  *  2. against the arithmetic fixtures ([[PixelFixtures]] — forward
  *     filters + stored-mode zlib): the round trip plus closed-form
  *     expected sums;
  *  3. fuzz: every truncation prefix and a corrupted-byte sweep must
  *     yield NULL or the exact full-payload answer — never a wrong
  *     statistic (the MediaHeaderSpec discipline).
  */
class PixelKernelSpec extends SparkSpec {

  private def statsOf(lum: (Int, Int) => Long, w: Int, h: Int)
  : (Long, Long, Seq[Long], Option[Long]) = {
    var s = 0L; var sq = 0L
    val hist = new Array[Long](8)
    val cellSum = new Array[Long](72); val cellCnt = new Array[Long](72)
    for (y <- 0 until h; x <- 0 until w) {
      val l = lum(x, y)
      s += l; sq += l * l
      hist(((l / 1000) >> 5).toInt) += 1
      if (w >= 9 && h >= 8) {
        val c = (8 * y / h) * 9 + 9 * x / w
        cellSum(c) += l; cellCnt(c) += 1
      }
    }
    val dh = if (w < 9 || h < 8) None else Some {
      (0 until 8).flatMap(cy => (0 until 8).map { cx =>
        val a = cellSum(cy * 9 + cx) / cellCnt(cy * 9 + cx)
        val b = cellSum(cy * 9 + cx + 1) / cellCnt(cy * 9 + cx + 1)
        if (b > a) 1L << (cy * 8 + cx) else 0L
      }).foldLeft(0L)(_ | _)
    }
    (s, sq, hist.toSeq, dh)
  }

  test("JDK ImageIO-encoded PNGs (independent encoder) decode to exact stats") {
    import java.awt.image.BufferedImage
    // RGB: the encoder picks its own filters and really deflates
    val w = 23; val h = 17
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (x * 7 + y * 13) % 256
      img.setRGB(x, y, (p << 16) | ((p * 3 % 256) << 8) | (p * 5 % 256))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val st = PixelKernel.decode(bos.toByteArray)
    assert(st != null && st.format == "png" && st.width == w && st.height == h)
    assert(st.channels == 3)
    def lum(x: Int, y: Int): Long = {
      val p = (x * 7 + y * 13) % 256
      299L * p + 587L * (p * 3 % 256) + 114L * (p * 5 % 256)
    }
    val (s, sq, hist, dh) = statsOf(lum, w, h)
    assert((st.lumSum, st.lumSqSum, st.hist.toSeq, st.dhash) ===
      ((s, sq, hist, dh)))
    // grayscale via TYPE_BYTE_GRAY (PNG color type 0)
    val g = new BufferedImage(11, 9, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 9; x <- 0 until 11)
      g.getRaster.setSample(x, y, 0, (x * 31 + y * 5) % 256)
    val gb = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(g, "png", gb))
    val gs = PixelKernel.decode(gb.toByteArray)
    assert(gs != null && gs.channels == 1)
    val (s2, sq2, hist2, dh2) =
      statsOf((x, y) => 1000L * ((x * 31 + y * 5) % 256), 11, 9)
    assert((gs.lumSum, gs.lumSqSum, gs.hist.toSeq, gs.dhash) ===
      ((s2, sq2, hist2, dh2)))
  }

  test("fixture PNGs (all five filter types) and BMP round-trip exactly") {
    for (s <- Seq(0L, 1L, 2L, 3L, 4L, 5L, 23L, 101L, 202L)) {
      val m = s % 3
      val st = PixelKernel.decode(PixelFixtures.payload(s))
      if (s % 10 == 7) assert(st == null, s"truncated payload $s")
      else {
        val w = PixelFixtures.width(s); val h = PixelFixtures.height(s)
        assert(st != null, s"payload $s")
        assert((st.format, st.width, st.height, st.channels) ===
          ((if (m == 2) "bmp" else "png", w, h, if (m == 0) 1 else 3)))
        def lum(x: Int, y: Int): Long = {
          val p = ((x + s % 31) * (y + s % 37) * 3 + s) % 256
          if (m == 0) 1000L * p
          else 299L * p + 587L * (p * 3 % 256) + 114L * (p * 5 % 256)
        }
        val (sm, sq, hist, dh) = statsOf(lum, w, h)
        assert((st.lumSum, st.lumSqSum, st.hist.toSeq, st.dhash) ===
          ((sm, sq, hist, dh)), s"payload $s")
      }
    }
  }

  test("fixture GIFs (LZW literal streams) round-trip exactly") {
    for (s <- Seq(0L, 1L, 5L, 15L, 33L, 101L, 202L)) {
      val st = PixelKernel.decode(PixelFixtures.gif(s))
      val w = PixelFixtures.width(s); val h = PixelFixtures.height(s)
      assert(st != null && st.format == "gif" && st.width == w &&
        st.height == h && st.channels == 3, s"gif $s")
      def lum(x: Int, y: Int): Long = {
        val p = ((x + s % 31) * (y + s % 37) * 3 + s) % 256
        299L * p + 587L * (p * 3 % 256) + 114L * (p * 5 % 256)
      }
      val (sm, sq, hist, dh) = statsOf(lum, w, h)
      assert((st.lumSum, st.lumSqSum, st.hist.toSeq, st.dhash) ===
        ((sm, sq, hist, dh)), s"gif $s")
    }
    // truncation fuzz: NULL or the exact answer (the trailer byte is
    // the only optional suffix — the image decodes without it)
    val full = PixelFixtures.gif(12L)
    val want = PixelKernel.decode(full)
    for (n <- 0 until full.length) {
      val st = PixelKernel.decode(full.take(n))
      assert(st == null ||
        (st.lumSum == want.lumSum && st.dhash == want.dhash),
        s"gif prefix $n")
    }
  }

  test("GIF LZW: real-compressor streams (ImageIO) and the KwKwK case") {
    import java.awt.image.BufferedImage
    // the JDK's own GIF ENCODER emits genuinely compressed LZW (code
    // width growth, back-references, KwKwK) — the kernel must decode
    // it to the exact stats of the source image
    val g = new BufferedImage(40, 30, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 30; x <- 0 until 40)
      g.getRaster.setSample(x, y, 0, (x / 4 * 16 + y / 3 * 8) % 256)
    val gb = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(g, "gif", gb))
    val st = PixelKernel.decode(gb.toByteArray)
    assert(st != null && st.format == "gif" && st.width == 40 &&
      st.height == 30)
    val (sm, sq, hist, dh) =
      statsOf((x, y) => 1000L * ((x / 4 * 16 + y / 3 * 8) % 256), 40, 30)
    assert((st.lumSum, st.lumSqSum, st.hist.toSeq, st.dhash) ===
      ((sm, sq, hist, dh)))
    // hand-built KwKwK stream: 3×1 canvas, palette[0] = (10,20,30),
    // codes [clear=4, 0, 6] where 6 == next — the entry defined by its
    // own first use ("0" + "0")
    def hx(sx: String): Array[Byte] = {
      val c = sx.replaceAll("\\s", "")
      Array.tabulate(c.length / 2)(i =>
        Integer.parseInt(c.substring(2 * i, 2 * i + 2), 16).toByte)
    }
    val kwk = hx(
      "474946383961 0300 0100 81 00 00" + // LSD: GCT of 4 entries
        "0A141E 28323C 46505A 646E78" + // palette
        "2C 0000 0000 0300 0100 00" + // full-canvas descriptor
        "02" + // LZW min code size 2 (clear 4, eoi 5)
        "02 8401" + // one sub-block: codes 4,0,6 packed 3-bit LSB-first
        "00 3B")
    val ks = PixelKernel.decode(kwk)
    assert(ks != null && ks.width == 3 && ks.height == 1)
    val lum0 = 299L * 10 + 587L * 20 + 114L * 30
    assert(ks.lumSum === 3 * lum0)
    assert(ks.dhash.isEmpty) // 3×1: the 9×8 grid is undefined
    // corrupt LZW: a code beyond the table
    val bad = kwk.clone()
    bad(kwk.length - 4) = 0xFC.toByte // codes 4, 7(!) ...
    assert(PixelKernel.decode(bad) == null)
    // the interlace flag on a 1-row frame is a no-op permutation —
    // same stats (offset 34 = the image descriptor's packed byte);
    // multi-row de-interlacing is exercised by the ImageIO stream
    // above, which the JDK writes interlaced by default
    val il = kwk.clone(); il(34) = 0x40.toByte
    val ils = PixelKernel.decode(il)
    assert(ils != null && ils.lumSum == ks.lumSum)
  }

  test("near-dup fixture: one-pixel edit flips at most dHash bit 0") {
    for (base <- Seq(0L, 2L, 8L, 30L, 102L)) {
      val a = PixelKernel.decode(PixelFixtures.nearDupPayload(base))
      val b = PixelKernel.decode(PixelFixtures.nearDupPayload(base + 1))
      assert(a != null && b != null)
      val ham = java.lang.Long.bitCount(a.dhash.get ^ b.dhash.get)
      assert(ham <= 1, s"base $base hamming $ham")
      // and the payload BYTES differ (it is a re-encode, not a copy)
      assert(!java.util.Arrays.equals(PixelFixtures.nearDupPayload(base),
        PixelFixtures.nearDupPayload(base + 1)))
    }
  }

  test("truncation fuzz: every prefix decodes to NULL or the exact answer") {
    val full = PixelFixtures.payload(12L) // png gray
    val want = PixelKernel.decode(full)
    assert(want != null)
    for (n <- 0 until full.length) {
      val st = PixelKernel.decode(full.take(n))
      assert(st == null, s"prefix $n must be NULL (missing IEND/IDAT)")
    }
    val bmpFull = PixelFixtures.payload(2L)
    for (n <- 0 until bmpFull.length)
      assert(PixelKernel.decode(bmpFull.take(n)) == null, s"bmp prefix $n")
  }

  test("PNG palette and alpha color types decode exactly; alpha is luminance-ignored") {
    for (s <- Seq(0L, 5L, 123L)) {
      val w = PixelFixtures.width(s); val h = PixelFixtures.height(s)
      def pix(x: Int, y: Int): Int =
        (((x + s % 31) * (y + s % 37) * 3 + s) % 256).toInt
      def rgbLum(x: Int, y: Int): Long = {
        val p = pix(x, y)
        299L * p + 587L * (p * 3 % 256) + 114L * (p * 5 % 256)
      }
      // type 3: indices through the GIF-shared palette arithmetic
      val st3 = PixelKernel.decode(PixelFixtures.pngPalette(s))
      assert(st3 != null && st3.channels == 3, s"s=$s")
      val (s3, q3, h3, d3) = statsOf(rgbLum, w, h)
      assert((st3.lumSum, st3.lumSqSum, st3.hist.toSeq, st3.dhash) ===
        ((s3, q3, h3, d3)))
      // type 6 carries the SAME RGB as the palette entries — one
      // cross-type lock: RGBA stats must equal palette-decoded stats
      val st6 = PixelKernel.decode(PixelFixtures.pngRgba(s))
      assert(st6 != null && st6.channels == 4)
      assert((st6.lumSum, st6.lumSqSum, st6.hist.toSeq, st6.dhash) ===
        ((s3, q3, h3, d3)))
      // type 4: alpha-blind — stats equal the plain-gray fixture's
      val st4 = PixelKernel.decode(PixelFixtures.pngGrayAlpha(s))
      val g = PixelKernel.decode(PixelFixtures.pngGray(s))
      assert(st4 != null && st4.channels == 2)
      assert((st4.lumSum, st4.lumSqSum, st4.dhash) ===
        ((g.lumSum, g.lumSqSum, g.dhash)))
    }
    // an index stream overrunning a short PLTE is corrupt — NULL from
    // the up-front validation, never a read past the palette
    assert(PixelKernel.decode(PixelFixtures.pngPalette(5L, entries = 64)) == null)
    // JDK ImageIO cross-check (independent encoder, real deflate):
    // TYPE_INT_ARGB writes PNG color type 6; varying alpha must not
    // perturb the luminance statistics
    import java.awt.image.BufferedImage
    val w2 = 19; val h2 = 13
    val img = new BufferedImage(w2, h2, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until h2; x <- 0 until w2) {
      val p = (x * 7 + y * 13) % 256
      val a = (x * 29 + y * 3) % 256
      img.setRGB(x, y,
        (a << 24) | (p << 16) | ((p * 3 % 256) << 8) | (p * 5 % 256))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val st = PixelKernel.decode(bos.toByteArray)
    assert(st != null && st.channels == 4 && st.width == w2)
    def lum2(x: Int, y: Int): Long = {
      val p = (x * 7 + y * 13) % 256
      299L * p + 587L * (p * 3 % 256) + 114L * (p * 5 % 256)
    }
    val (se, qe, he, de) = statsOf(lum2, w2, h2)
    assert((st.lumSum, st.lumSqSum, st.hist.toSeq, st.dhash) ===
      ((se, qe, he, de)))
    // ...and TYPE_BYTE_INDEXED with an explicit 200-entry palette
    // writes PNG color type 3 (depth 8) — palette-lookup luminance
    val pr = Array.tabulate(200)(i => (i * 5 % 256).toByte)
    val pg = Array.tabulate(200)(i => (i * 11 % 256).toByte)
    val pb = Array.tabulate(200)(i => (i * 3 % 256).toByte)
    val icm = new java.awt.image.IndexColorModel(8, 200, pr, pg, pb)
    val pimg = new BufferedImage(15, 11, BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until 11; x <- 0 until 15)
      pimg.getRaster.setSample(x, y, 0, (x * 13 + y * 7) % 200)
    val pbs = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(pimg, "png", pbs))
    val pst = PixelKernel.decode(pbs.toByteArray)
    assert(pst != null && pst.channels == 3 && pst.width == 15)
    def plum(x: Int, y: Int): Long = {
      val i = (x * 13 + y * 7) % 200
      299L * (i * 5 % 256) + 587L * (i * 11 % 256) + 114L * (i * 3 % 256)
    }
    val (ps, pq, ph, pd) = statsOf(plum, 15, 11)
    assert((pst.lumSum, pst.lumSqSum, pst.hist.toSeq, pst.dhash) ===
      ((ps, pq, ph, pd)))
  }

  test("unsupported layouts and corrupt streams are NULL, never wrong") {
    val full = PixelFixtures.payload(0L)
    // palette color type WITHOUT a PLTE (§11.2.3 makes it mandatory)
    val pal = full.clone(); pal(25) = 3; assert(PixelKernel.decode(pal) == null)
    // 16-bit depth
    val d16 = full.clone(); d16(24) = 16; assert(PixelKernel.decode(d16) == null)
    // interlaced
    val il = full.clone(); il(28) = 1; assert(PixelKernel.decode(il) == null)
    // invalid filter type byte inside the (stored-mode) IDAT stream:
    // first scanline's filter byte lives right after the 7 zlib/stored
    // header bytes of the IDAT chunk data (offset 33 + 8 + 7)
    val badf = full.clone(); badf(48) = 9
    assert(PixelKernel.decode(badf) == null)
    // corrupt zlib header
    val badz = full.clone(); badz(41) = 0x1F
    assert(PixelKernel.decode(badz) == null)
    // adler mismatch: flip a byte of the zlib checksum — Inflater
    // reaches the trailer inside the final inflate() call here and
    // throws, so the kernel quarantines (NULL). (IDAT layout from the
    // end: IEND(12) + IDAT CRC(4) + adler(4) → length − 17.)
    val bada = full.clone(); bada(full.length - 17) =
      (bada(full.length - 17) ^ 0xFF).toByte
    assert(PixelKernel.decode(bada) == null)
    // ...while a flipped chunk CRC (never verified — a stats pass does
    // not certify archives) still decodes to the exact answer
    val fullSt = PixelKernel.decode(full)
    val badc = full.clone(); badc(full.length - 13) =
      (badc(full.length - 13) ^ 0xFF).toByte
    val badcSt = PixelKernel.decode(badc)
    assert(badcSt != null && badcSt.lumSum == fullSt.lumSum &&
      badcSt.dhash == fullSt.dhash)
    // decode-bomb guard: an IHDR advertising 2^16 × 2^16 returns NULL
    val bomb = full.clone()
    bomb(16) = 0; bomb(17) = 1; bomb(18) = 0; bomb(19) = 0
    bomb(20) = 0; bomb(21) = 1; bomb(22) = 0; bomb(23) = 0
    assert(PixelKernel.decode(bomb) == null)
    // BMP: 32bpp and RLE compression unsupported
    val bmp = PixelFixtures.payload(2L)
    val b32 = bmp.clone(); b32(28) = 32; assert(PixelKernel.decode(b32) == null)
    val rle = bmp.clone(); rle(30) = 1; assert(PixelKernel.decode(rle) == null)
  }

  test("native baseline JPEG: fixture exactness, ImageIO agreement, unsupported NULLs") {
    import graft.expressions.JpegKernel
    // fixture round trips EXACTLY under the pinned IDCT's DC-only
    // closed form — the q372 oracle contract
    for (s <- Seq(0L, 5L, 123L); (color, sub) <- Seq(
      (false, false), (true, false), (true, true)); rst <- Seq(0, 2)) {
      val bytes = PixelFixtures.jpeg(s, color, rst, subsample = sub)
      val st = PixelKernel.decode(bytes)
      assert(st != null && st.format == "jpeg", s"s=$s c=$color sub=$sub r=$rst")
      val w = PixelFixtures.width(s); val h = PixelFixtures.height(s)
      assert(st.width == w && st.height == h)
      assert(st.channels == (if (color) 3 else 1))
      def blockVal(bx: Int, by: Int): Long = {
        val dc = (((bx + s % 31) * (by + s % 37) * 3 + s) % 256) - 128
        val f = (dc * 8L * 2096704L + 8388608L) >> 24
        (if (f < -128L) 0L else if (f > 127L) 255L else f + 128L)
      }
      val (es, eq, eh, ed) =
        statsOf((x, y) => 1000L * blockVal(x / 8, y / 8), w, h)
      assert((st.lumSum, st.lumSqSum, st.hist.toSeq, st.dhash) ===
        ((es, eq, eh, ed)), s"s=$s c=$color sub=$sub r=$rst")
    }
    // a REAL encoder's output (ImageIO: its own quant tables, real AC
    // coefficients, optimized entropy) must agree with ImageIO's own
    // decode to within T.81's IDCT tolerance — ±2 per gray sample
    import java.awt.image.BufferedImage
    val w2 = 37; val h2 = 29
    val g = new BufferedImage(w2, h2, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h2; x <- 0 until w2)
      g.getRaster.setSample(x, y, 0, ((x + 3) * (y + 7) * 5 + 11) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(g, "jpg", bos))
    val v = JpegKernel.decode(bos.toByteArray)
    assert(v != null && v.width == w2 && v.height == h2 && v.channels == 1)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    for (y <- 0 until h2; x <- 0 until w2) {
      val d = math.abs(v.lum(x, y) / 1000 - ref.getRaster.getSample(x, y, 0))
      assert(d <= 2, s"($x,$y) diff $d")
    }
    // 4:2:0 color (ImageIO's default subsampling): dims/channels exact;
    // luminance agrees in the mean (upsampling conventions differ —
    // nearest here vs the decoder's interpolating upsampler)
    val c = new BufferedImage(33, 25, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 25; x <- 0 until 33) {
      val p = (x * 7 + y * 13) % 256
      c.setRGB(x, y, (p << 16) | ((p * 3 % 256) << 8) | (p * 5 % 256))
    }
    val bos2 = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(c, "jpg", bos2))
    val v2 = JpegKernel.decode(bos2.toByteArray)
    assert(v2 != null && v2.width == 33 && v2.channels == 3)
    val ref2 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos2.toByteArray))
    var sumd = 0L
    for (y <- 0 until 25; x <- 0 until 33) {
      val rgb = ref2.getRGB(x, y)
      val rl = 299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
        114L * (rgb & 0xFF)
      sumd += math.abs(v2.lum(x, y) - rl)
    }
    assert(sumd / (33 * 25) < 2000L, s"mean milli-lum diff ${sumd / 825}")
    // unsupported shapes are NULL, never wrong: progressive (SOF2),
    // truncations, a stray RST, missing EOI
    val fix = PixelFixtures.jpeg(5L, color = false, 0)
    val prog = fix.clone()
    // SOI(2) + DQT(2+67=69) → SOF marker at offset 71; C0 → C2
    assert((prog(72) & 0xFF) == 0xC0)
    prog(72) = 0xC2.toByte
    assert(JpegKernel.decode(prog) == null)
    (0 until fix.length).foreach { n =>
      assert(JpegKernel.decode(fix.take(n)) == null,
        s"truncation to $n must NULL")
    }
    assert(JpegKernel.decode(fix.dropRight(2)) == null) // no EOI
    assert(PixelKernel.decode(PixelFixtures.jpegPayload(7L)) == null)
  }

  test("PNG 16-bit + Adam7: wire layout changes nothing, low bytes ignored") {
    // layout identity: Adam7 and 16-bit re-encodings of the SAME
    // logical pixels must produce stats identical to the plain 8-bit
    // stream — the q377 contract (16-bit low bytes carry a different
    // arithmetic the high-byte reduction must ignore)
    for (s <- Seq(3L, 8L, 21L, 40L)) {
      val base = PixelKernel.decode(PixelFixtures.pngGray(s))
      val a7 = PixelKernel.decode(PixelFixtures.pngAdam7Gray(s))
      val d16 = PixelKernel.decode(PixelFixtures.png16Gray(s))
      assert(base != null && a7 != null && d16 != null, s"s=$s")
      Seq(a7, d16).foreach { v =>
        assert(v.lumSum == base.lumSum && v.lumSqSum == base.lumSqSum &&
          v.dhash == base.dhash && v.hist.toSeq == base.hist.toSeq, s"s=$s")
      }
      val rgbBase = PixelKernel.decode(PixelFixtures.pngRgb(s))
      val rgb16 = PixelKernel.decode(PixelFixtures.png16Rgb(s))
      val combo = PixelKernel.decode(PixelFixtures.png16Adam7Rgb(s))
      Seq(rgb16, combo).foreach { v =>
        assert(v != null && v.lumSum == rgbBase.lumSum &&
          v.dhash == rgbBase.dhash && v.channels == 3, s"s=$s")
      }
    }
    // the JDK's OWN 16-bit PNG encoder (TYPE_USHORT_GRAY — independent
    // code path): the kernel's high-byte reduction vs the raster
    val w = 19; val h = 13
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, ((x * 31 + y * 7) * 257 + 123) % 65536)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val jdk = bos.toByteArray
    assert((jdk(24) & 0xFF) == 16, "JDK did not emit depth 16")
    val v = PixelKernel.decode(jdk)
    assert(v != null && v.width == w && v.height == h && v.channels == 1)
    var es = 0L
    for (y <- 0 until h; x <- 0 until w)
      es += 1000L * (img.getRaster.getSample(x, y, 0) >> 8)
    assert(v.lumSum == es)
    // sub-byte depths stay NULL; 16-bit palette is spec-invalid
    val fix = PixelFixtures.pngGray(3L)
    val d4 = fix.clone(); d4(24) = 4
    assert(PixelKernel.decode(d4) == null)
    // truncations of the 16-bit+Adam7 combo NULL, never throw
    val combo = PixelFixtures.png16Adam7Rgb(5L)
    (0 until combo.length).foreach { n =>
      assert(PixelKernel.decode(combo.take(n)) == null, s"trunc $n")
    }
  }

  test("PNG sub-byte depths: value mapping, packing+Adam7 compose, palette indices") {
    // the spec's v·255/(2^d−1) gray mapping, replayed per pixel
    for (s <- Seq(3L, 8L, 21L); d <- Seq(1, 2, 4)) {
      val v = PixelKernel.decode(PixelFixtures.pngSubGray(s, d))
      assert(v != null && v.channels == 1, s"s=$s d=$d")
      val w = PixelFixtures.width(s); val h = PixelFixtures.height(s)
      val scale = 255 / ((1 << d) - 1)
      var es = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = (((x + s % 31) * (y + s % 37) * 3 + s) % 256).toInt
        es += 1000L * ((p % (1 << d)) * scale)
      }
      assert(v.lumSum == es, s"s=$s d=$d")
      // interlacing the same logical pixels changes nothing
      val a7 = PixelKernel.decode(PixelFixtures.pngSubGray(s, d, interlace = 1))
      assert(a7 != null && a7.lumSum == es && a7.dhash == v.dhash)
    }
    // 4-bit palette: indices look up the shared palette arithmetic
    val s = 11L
    val pv = PixelKernel.decode(PixelFixtures.pngSub4Palette(s))
    assert(pv != null && pv.channels == 3)
    var es = 0L
    for (y <- 0 until PixelFixtures.height(s);
         x <- 0 until PixelFixtures.width(s)) {
      val i = ((((x + s % 31) * (y + s % 37) * 3 + s) % 256) % 16).toInt
      es += 299L * i + 587L * (i * 3 % 256) + 114L * (i * 5 % 256)
    }
    assert(pv.lumSum == es)
    // an out-of-palette 4-bit index is impossible (16 entries cover the
    // value space), but a SHORT palette is not: 8 entries + index 15
    val bad = graft.queries.PixelFixtures.pngSub4Palette(s)
    // shrink the declared PLTE to 8 entries (24 bytes): patch the chunk
    // length and drop the tail — the kernel's up-front index check NULLs
    val lenOff = bad.indexOfSlice("PLTE".getBytes) - 4
    val cut = bad.take(lenOff) ++ Array[Byte](0, 0, 0, 24) ++
      bad.slice(lenOff + 4, lenOff + 8 + 24) ++ // type + 8 entries
      bad.drop(lenOff + 8 + 48) // CRC + the rest, 40 entry bytes gone
    assert(PixelKernel.decode(cut) == null)
    // truncation fuzz on the interlaced 2-bit variant
    val fix = PixelFixtures.pngSubGray(5L, 2, interlace = 1)
    (0 until fix.length).foreach { n =>
      assert(PixelKernel.decode(fix.take(n)) == null, s"trunc $n")
    }
  }

  test("progressive JPEG: fixture exactness, ImageIO agreement, truncation NULLs") {
    import graft.expressions.JpegKernel
    // the pinned IDCT's three-term closed form (DC + two AC base
    // functions) — the q376 oracle contract, across all four variants:
    // gray, 4:4:4 color, restart lanes, 4:2:0
    val K1 = Array(2009, 1703, 1138, 400, -400, -1138, -1703, -2009)
    val K5 = Array(1138, -2009, 400, 1703, -1703, -400, 2009, -1138)
    for (s <- Seq(0L, 5L, 123L); (color, sub, rst) <- Seq(
      (false, false, 0), (true, false, 0), (false, false, 3),
      (true, true, 0))) {
      val bytes = PixelFixtures.progressiveJpeg(s, color, rst, subsample = sub)
      val v = JpegKernel.decode(bytes)
      assert(v != null && v.format == "jpeg", s"s=$s c=$color sub=$sub r=$rst")
      val w = PixelFixtures.width(s); val h = PixelFixtures.height(s)
      assert(v.width == w && v.height == h &&
        v.channels == (if (color) 3 else 1))
      for (y <- 0 until h; x <- 0 until w) {
        val bx = x / 8; val by = y / 8
        val dc = (((bx + s % 31) * (by + s % 37) * 3 + s) % 256 - 128).toInt
        val a1 = ((bx + 2 * by + s) % 9 - 4).toInt
        val a2 = ((3 * bx + by + 2 * s) % 7 - 3).toInt
        val acc = 2096704L * 8L * dc +
          23168L * (K1(x % 8).toLong * a1 + K5(y % 8).toLong * a2)
        val f = (acc + 8388608L) >> 24
        val e = (if (f < -128) 0L else if (f > 127) 255L else f + 128L) * 1000L
        assert(v.lum(x, y) == e, s"s=$s ($x,$y)")
      }
    }
    // a REAL progressive encoder (ImageIO with MODE_DEFAULT writes
    // SOF2) must agree with ImageIO's own decode within T.81's IDCT
    // tolerance — the wild-stream gate
    import java.awt.image.BufferedImage
    def progressiveBytes(img: BufferedImage): Array[Byte] = {
      val wtr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val p = wtr.getDefaultWriteParam
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      wtr.setOutput(ios)
      wtr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close(); wtr.dispose()
      bos.toByteArray
    }
    val g = new BufferedImage(37, 29, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 29; x <- 0 until 37)
      g.getRaster.setSample(x, y, 0, ((x + 3) * (y + 7) * 5 + 11) % 256)
    val gb = progressiveBytes(g)
    assert(gb.sliding(2).exists(p => (p(0) & 0xFF) == 0xFF &&
      (p(1) & 0xFF) == 0xC2), "ImageIO did not emit SOF2")
    val gv = JpegKernel.decode(gb)
    assert(gv != null && gv.width == 37 && gv.height == 29)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gb))
    for (y <- 0 until 29; x <- 0 until 37)
      assert(math.abs(gv.lum(x, y) / 1000 -
        ref.getRaster.getSample(x, y, 0)) <= 2, s"($x,$y)")
    val c = new BufferedImage(33, 25, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 25; x <- 0 until 33) {
      val p = (x * 7 + y * 13) % 256
      c.setRGB(x, y, (p << 16) | ((p * 3 % 256) << 8) | (p * 5 % 256))
    }
    val cb = progressiveBytes(c)
    val cv = JpegKernel.decode(cb)
    assert(cv != null && cv.width == 33 && cv.channels == 3)
    val ref2 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(cb))
    var sumd = 0L
    for (y <- 0 until 25; x <- 0 until 33) {
      val rgb = ref2.getRGB(x, y)
      sumd += math.abs(cv.lum(x, y) - (299L * ((rgb >> 16) & 0xFF) +
        587L * ((rgb >> 8) & 0xFF) + 114L * (rgb & 0xFF)))
    }
    assert(sumd / 825 < 2000L, s"mean milli-lum diff ${sumd / 825}")
    // every truncation NULLs (multi-scan streams cut mid-scan, between
    // scans, mid-marker — none may throw or return partial stats)
    val fix = PixelFixtures.progressiveJpeg(5L, color = true, 0)
    (0 until fix.length).foreach { n =>
      assert(JpegKernel.decode(fix.take(n)) == null, s"truncation to $n")
    }
    assert(JpegKernel.decode(fix.dropRight(2)) == null) // missing EOI
  }

  test("JPEG DC guards: size category > 11 and wrapped predictor NULL") {
    import graft.expressions.JpegKernel
    // hand-built minimal 16×8 grayscale baseline JPEG whose DC Huffman
    // table can express categories 0–12, so the entropy payload can
    // drive the two guards T.81 Table F.1 implies for 8-bit precision:
    // a size category above 11, and an accumulated predictor outside
    // the 11-bit coefficient range
    def seg(m: Int, p: Array[Byte]): Array[Byte] =
      Array(0xFF.toByte, m.toByte,
        (((p.length + 2) >> 8) & 0xFF).toByte,
        ((p.length + 2) & 0xFF).toByte) ++ p
    def jpeg(entropy: Array[Byte]): Array[Byte] =
      Array(0xFF.toByte, 0xD8.toByte) ++
        seg(0xDB, Array(0x00.toByte) ++ Array.fill(64)(1.toByte)) ++
        seg(0xC4, Array(0x00.toByte) ++
          (1 to 16).map(l => if (l == 4) 13.toByte else 0.toByte) ++
          (0 to 12).map(_.toByte)) ++ // DC cats 0..12, all 4-bit codes
        seg(0xC4, Array(0x10.toByte) ++
          (1 to 16).map(l => if (l == 1) 1.toByte else 0.toByte) ++
          Array(0x00.toByte)) ++ // AC: single 1-bit EOB code
        seg(0xC0, Array[Byte](8, 0, 8, 0, 16, 1, 1, 0x11, 0)) ++
        seg(0xDA, Array[Byte](1, 1, 0x00, 0, 0x3F, 0)) ++
        entropy ++ Array(0xFF.toByte, 0xD9.toByte)
    // block: [4-bit cat][cat magnitude bits][1-bit EOB]
    // cat 12 (code 1100) in block 1 → reject at the category check
    assert(JpegKernel.decode(jpeg(Array(0xCA.toByte, 0xAA.toByte,
      0x7F.toByte))) == null)
    // two max-magnitude cat-11 blocks (1011 11111111111 0 ×2): each
    // diff = +2047, predictor 2047 → 4094 leaves the spec range — NULL,
    // not deterministic garbage from a wrapped predictor
    assert(JpegKernel.decode(jpeg(Array(0xBF.toByte, 0xFE.toByte,
      0xBF.toByte, 0xFE.toByte))) == null)
    // control: the same envelope with two cat-1 blocks (0001 1 0 ×2,
    // then pad 1s) decodes — the guards fire on the payload, not the
    // hand-built structure
    val ok = JpegKernel.decode(jpeg(Array(0x18.toByte, 0x6F.toByte)))
    assert(ok != null && ok.width == 16 && ok.height == 8)
  }

  test("decodeImage ImageIO fallback: real JPEG/GIF pixel decode") {
    import graft.operators.Multimodal
    import java.awt.image.BufferedImage
    // GIF is LZW — lossless: stats must match the source image exactly
    val g = new BufferedImage(20, 15, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 15; x <- 0 until 20)
      g.getRaster.setSample(x, y, 0, (x * 9 + y * 4) % 256)
    val gb = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(g, "gif", gb))
    val gs = Multimodal.decodeImage(gb.toByteArray)
    assert(gs.isDefined && gs.get.format == "gif" &&
      gs.get.width == 20 && gs.get.height == 15)
    // ImageIO getRGB expands gray to equal r=g=b → lum = 1000·v
    val (s, sq, hist, dh) =
      statsOf((x, y) => 1000L * ((x * 9 + y * 4) % 256), 20, 15)
    assert((gs.get.lumSum, gs.get.lumSqSum, gs.get.hist.toSeq,
      gs.get.dhash) === ((s, sq, hist, dh)))
    // JPEG is LOSSY: dimensions/counts exact, pixel values approximate
    val j = new BufferedImage(24, 18, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 18; x <- 0 until 24)
      j.setRGB(x, y, ((x * 10) % 256 << 16) | ((y * 14) % 256 << 8) | 128)
    val jb = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(j, "jpg", jb))
    val js = Multimodal.decodeImage(jb.toByteArray)
    assert(js.isDefined && js.get.format == "jpeg" &&
      js.get.width == 24 && js.get.height == 18 && js.get.channels == 3)
    assert(js.get.hist.sum === 24L * 18)
    assert(js.get.dhash.isDefined)
    // non-image payloads never reach a codec
    assert(Multimodal.decodeImage("GIF89a but not really".getBytes).isEmpty)
    assert(Multimodal.decodeImage("plain text".getBytes).isEmpty)
    // ...and extractFeatures routes images through the REAL path:
    // a gray GIF's luminance histogram, normalized
    import spark.implicits._
    val media = Seq(Multimodal.MediaRecord(1L, "bin", gb.toByteArray)).toDS()
    val feats = Multimodal.extractFeatures(media).collect()(0)
    assert(feats.features.toSeq ===
      hist.map(_.toDouble / (20 * 15)).toSeq)
  }

  test("pixel_stats expression over a DataFrame: nulls for corrupt rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(0L, 1L, 2L, 7L, 17L).toDF("id")
      .as[Long].mapPartitions(_.map(id => (id, PixelFixtures.payload(id))))
      .toDF("id", "p")
      .select(col("id"), graft.functions.pixelStats(col("p")).as("s"))
      .select(col("id"), col("s.format"), col("s.n_pixels"),
        col("s.dhash"), element_at(col("s.lum_hist"), 1).as("h0"))
      .orderBy("id").collect()
    assert(df.length === 5)
    assert(df.filter(r => r.getLong(0) % 10 == 7).forall(_.isNullAt(1)))
    val ok = df.filter(r => r.getLong(0) % 10 != 7)
    assert(ok.forall(r => !r.isNullAt(1) && r.getLong(2) > 0))
  }
}
