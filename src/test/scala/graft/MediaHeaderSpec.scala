package graft

import graft.expressions.MediaHeaderKernel
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** The media-header kernel against REAL byte layouts (hand-derived from
  * the PNG/GIF/JPEG specifications, independent of the q333 gate's
  * hex-string construction): exact dimensions out of spec-true headers,
  * NULL out of every corruption the fuzz cases plant — never a wrong
  * dimension.
  */
class MediaHeaderSpec extends SparkSpec {
  import spark.implicits._

  private def hx(s: String): Array[Byte] = {
    val c = s.replaceAll("\\s", "")
    Array.tabulate(c.length / 2)(i =>
      Integer.parseInt(c.substring(2 * i, 2 * i + 2), 16).toByte)
  }

  private def parsed(b: Array[Byte]): Option[(String, Long, Long, Long)] =
    Option(MediaHeaderKernel.parse(b)).map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  // the canonical 1x1 RGBA PNG's first 33 bytes (signature + IHDR with
  // its real CRC 1F15C489): width 1, height 1, bit depth 8
  private val png1x1 = hx(
    "89504E470D0A1A0A 0000000D 49484452 00000001 00000001 08 06 000000 1F15C489")

  // GIF89a, 10x20 logical screen, packed F7 -> (7&7)+1 = 8 bits/index
  private val gif10x20 = hx("474946383961 0A00 1400 F7 00 00")

  // JPEG: SOI, real APP0/JFIF, a DQT segment the walk must SKIP by its
  // length (67 = 2 + qt-id + 64 entries), then SOF0 (8-bit, h=2, w=3,
  // 3 components), EOI
  private val jpeg3x2 = hx(
    "FFD8" +
      "FFE0 0010 4A46494600 0101 00 0048 0048 00 00" +
      "FFDB 0043 00" + "11" * 64 +
      "FFC0 0011 08 0002 0003 03 011100 021101 031101" +
      "FFD9")

  test("real PNG / GIF / JPEG headers parse to exact dimensions") {
    assert(parsed(png1x1) === Some(("png", 1L, 1L, 8L)))
    assert(parsed(gif10x20) === Some(("gif", 10L, 20L, 8L)))
    assert(parsed(jpeg3x2) === Some(("jpeg", 3L, 2L, 8L)))
    // GIF87a variant and a 16-bit-depth PNG
    assert(parsed(hx("474946383761 0100 0200 00 00 00"))
      === Some(("gif", 1L, 2L, 1L)))
    val png16 = png1x1.clone(); png16(24) = 16
    assert(parsed(png16) === Some(("png", 1L, 1L, 16L)))
    // progressive JPEG announces dimensions via SOF2 — same fields
    val sof2 = jpeg3x2.clone()
    sof2(jpeg3x2.indexOfSlice(hx("FFC00011")) + 1) = 0xC2.toByte
    assert(parsed(sof2) === Some(("jpeg", 3L, 2L, 8L)))
  }

  // WebP lossless 1x1: the REAL smallest-file encoding — bitfield 0
  // means width-1 = 0, height-1 = 0
  private val webpL1x1 = hx(
    "52494646 1A000000 57454250 5650384C 0D000000 2F00000000")
  // WebP lossy 3x2 via VP8 start code; low-14-bit dims with scale bits
  // set high (must be masked off)
  private val webpV3x2 = hx(
    "52494646 16000000 57454250 56503820 0A000000 000000 9D012A 0380 0240")
  // WebP extended: canvas 256x65536 via LE uint24 minus-one fields
  private val webpX = hx(
    "52494646 12000000 57454250 56503858 0A000000 00 000000 FF0000 FFFF00")
  // BMP BITMAPINFOHEADER 7x5 24bpp, and a top-down (-5) variant
  private val bmp7x5 = hx(
    "424D 36000000 00000000 36000000 28000000 07000000 05000000 0100 1800" +
      "00" * 24)

  test("WebP (VP8/VP8L/VP8X) and BMP headers parse to exact dimensions") {
    assert(parsed(webpL1x1) === Some(("webp", 1L, 1L, 8L)))
    // 0x8003 & 0x3FFF = 3, 0x4002 & 0x3FFF = 2 (scale bits masked)
    assert(parsed(webpV3x2) === Some(("webp", 3L, 2L, 8L)))
    assert(parsed(webpX) === Some(("webp", 256L, 65536L, 8L)))
    assert(parsed(bmp7x5) === Some(("bmp", 7L, 5L, 24L)))
    // top-down BMP: negative height reports |height|
    val td = bmp7x5.clone()
    td(22) = 0xFB.toByte; td(23) = 0xFF.toByte
    td(24) = 0xFF.toByte; td(25) = 0xFF.toByte // height = -5 (int32 LE)
    assert(parsed(td) === Some(("bmp", 7L, 5L, 24L)))
    // BITMAPCOREHEADER (dib size 12): uint16 dims, bpp at 24
    val core = hx(
      "424D 1A000000 00000000 1A000000 0C000000 0900 0400 0100 0800")
    assert(parsed(core) === Some(("bmp", 9L, 4L, 8L)))
  }

  test("WebP/BMP corruptions yield NULL") {
    // RIFF but not WEBP form; unknown first chunk; bad VP8 start code;
    // bad VP8L signature
    val notWebp = webpL1x1.clone(); notWebp(8) = 'A'.toByte
    assert(parsed(notWebp).isEmpty)
    val badChunk = webpL1x1.clone(); badChunk(15) = 'Q'.toByte
    assert(parsed(badChunk).isEmpty)
    val badStart = webpV3x2.clone(); badStart(23) = 0x00.toByte
    assert(parsed(badStart).isEmpty)
    val badSig = webpL1x1.clone(); badSig(20) = 0x30.toByte
    assert(parsed(badSig).isEmpty)
    // VP8 zero width after masking
    val zeroW = webpV3x2.clone(); zeroW(26) = 0x00.toByte
    zeroW(27) = 0x40.toByte // 0x4000 & 0x3FFF = 0
    assert(parsed(zeroW).isEmpty)
    // BMP: zero height; negative width; unknown DIB size (e.g. 16)
    val h0 = bmp7x5.clone(); h0(22) = 0; assert(parsed(h0).isEmpty)
    val negW = bmp7x5.clone()
    negW(18) = 0xF9.toByte; negW(19) = 0xFF.toByte
    negW(20) = 0xFF.toByte; negW(21) = 0xFF.toByte
    assert(parsed(negW).isEmpty)
    val badDib = bmp7x5.clone(); badDib(14) = 16
    assert(parsed(badDib).isEmpty)
    // truncation fuzz for the new formats too: NULL or exact, never wrong
    Seq(("webpL", webpL1x1, ("webp", 1L, 1L, 8L)),
      ("webpV", webpV3x2, ("webp", 3L, 2L, 8L)),
      ("webpX", webpX, ("webp", 256L, 65536L, 8L)),
      ("bmp", bmp7x5, ("bmp", 7L, 5L, 24L))).foreach {
      case (name, full, exp) =>
        (0 until full.length).foreach { n =>
          val got = parsed(full.take(n))
          assert(got.isEmpty || got.contains(exp),
            s"$name truncated to $n bytes returned a WRONG header: $got")
        }
    }
  }

  test("every truncation parses to NULL or the exact answer, never a wrong one") {
    Seq(("png", png1x1, ("png", 1L, 1L, 8L)),
      ("gif", gif10x20, ("gif", 10L, 20L, 8L)),
      ("jpeg", jpeg3x2, ("jpeg", 3L, 2L, 8L))).foreach {
      case (name, full, exp) =>
        (0 until full.length).foreach { n =>
          val got = parsed(full.take(n))
          assert(got.isEmpty || got.contains(exp),
            s"$name truncated to $n bytes returned a WRONG header: $got")
        }
        // trailing junk after a complete header changes nothing
        assert(parsed(full ++ hx("00FFAB")) === Some(exp), name)
    }
  }

  test("corruptions yield NULL: bad magic, zero dims, bad lengths, no SOF") {
    // flipped magic bytes
    Seq(png1x1, gif10x20, jpeg3x2).foreach { full =>
      val bad = full.clone(); bad(0) = 0x00
      assert(parsed(bad).isEmpty)
    }
    // PNG: IHDR length != 13; width 0; width with the high bit set
    val badLen = png1x1.clone(); badLen(11) = 14
    assert(parsed(badLen).isEmpty)
    val w0 = png1x1.clone(); w0(19) = 0
    assert(parsed(w0).isEmpty)
    val wHi = png1x1.clone(); wHi(16) = 0x80.toByte
    assert(parsed(wHi).isEmpty)
    // PNG: chunk type not IHDR
    val notIhdr = png1x1.clone(); notIhdr(12) = 'J'.toByte
    assert(parsed(notIhdr).isEmpty)
    // GIF: zero height; version byte neither 7 nor 9
    assert(parsed(hx("474946383961 0A00 0000 F7 00 00")).isEmpty)
    assert(parsed(hx("474946383861 0A00 1400 F7 00 00")).isEmpty)
    // JPEG: EOI before any SOF; segment length < 2; marker without FF;
    // DHT (C4) alone is not a frame header; height 0 (DNL) rejected
    assert(parsed(hx("FFD8 FFD9")).isEmpty)
    assert(parsed(hx("FFD8 FFE0 0001 FFC0001108000200030300000000000000")).isEmpty)
    assert(parsed(hx("FFD8 00C0 0011 08 0002 0003 03 011100 021101 031101")).isEmpty)
    assert(parsed(hx("FFD8 FFC4 0011 08 0002 0003 03 011100 021101 031101 FFD9")).isEmpty)
    val h0 = jpeg3x2.clone()
    val sofAt = jpeg3x2.indexOfSlice(hx("FFC00011"))
    h0(sofAt + 5) = 0; h0(sofAt + 6) = 0
    assert(parsed(h0).isEmpty)
    // JPEG fill bytes (FF padding) before a marker are legal and skipped
    assert(parsed(hx(
      "FFD8 FFFFFF C0 0011 08 0002 0003 03 011100 021101 031101"))
      === Some(("jpeg", 3L, 2L, 8L)))
    // empty / tiny payloads
    assert(parsed(Array.emptyByteArray).isEmpty)
    assert(parsed(hx("89")).isEmpty)
    assert(parsed(null).isEmpty)
  }

  private def parsed5(b: Array[Byte])
  : Option[(String, Long, Long, Long, Long)] =
    Option(MediaHeaderKernel.parse(b)).map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

  // II-endian TIFF, 9x4, BitsPerSample 8 inline, orientation 6
  private val tiffII = hx(
    "49492A00 08000000 0400" +
      "0001 0400 01000000 09000000" + // 256 ImageWidth LONG 9
      "0101 0400 01000000 04000000" + // 257 ImageLength LONG 4
      "0201 0300 01000000 0800 0000" + // 258 BitsPerSample SHORT 8
      "1201 0300 01000000 0600 0000" + // 274 Orientation SHORT 6
      "00000000")
  // MM-endian TIFF, 300x200 SHORT dims, bits count=3 via OFFSET (62),
  // orientation 3; offset values 8,8,8
  private val tiffMM = hx(
    "4D4D002A 00000008 0004" +
      "0100 0003 00000001 012C 0000" +
      "0101 0003 00000001 00C8 0000" +
      "0102 0003 00000003 0000003E" +
      "0112 0003 00000001 0003 0000" +
      "00000000" + "0008 0008 0008")
  // JPEG carrying orientation 5 in an APP1 Exif (MM) block before SOF0
  private val jpegExif = hx(
    "FFD8" +
      "FFE1 0022 457869660000" +
      "4D4D002A 00000008 0001 0112 0003 00000001 0005 0000 00000000" +
      "FFC0 0011 08 0002 0003 03 011100 021101 031101 FFD9")

  test("TIFF IFD0 (both endians) and JPEG APP1 Exif orientation parse") {
    assert(parsed5(tiffII) === Some(("tiff", 9L, 4L, 8L, 6L)))
    // MM: SHORT dims, bits through the value-offset path
    assert(parsed5(tiffMM) === Some(("tiff", 300L, 200L, 8L, 3L)))
    assert(parsed5(jpegExif) === Some(("jpeg", 3L, 2L, 8L, 5L)))
    // orientation-free containers report the identity 1
    assert(parsed5(png1x1).map(_._5) === Some(1L))
    assert(parsed5(gif10x20).map(_._5) === Some(1L))
    assert(parsed5(jpeg3x2).map(_._5) === Some(1L))
    // BitsPerSample absent → TIFF spec default 1; orientation absent → 1
    val noBits = hx(
      "49492A00 08000000 0200" +
        "0001 0400 01000000 09000000" +
        "0101 0400 01000000 04000000" +
        "00000000")
    assert(parsed5(noBits) === Some(("tiff", 9L, 4L, 1L, 1L)))
  }

  test("TIFF/Exif corruptions yield NULL or identity, never wrong") {
    // standalone TIFF with out-of-domain orientation (9) → corrupt
    val o9 = tiffII.clone(); o9(tiffII.length - 8) = 9
    assert(parsed5(o9).isEmpty)
    // zero width; IFD offset past the end; entry count overrunning
    val w0 = tiffII.clone(); w0(18) = 0
    assert(parsed5(w0).isEmpty)
    val farIfd = tiffII.clone(); farIfd(4) = 0x7F
    assert(parsed5(farIfd).isEmpty)
    val bigCnt = tiffII.clone(); bigCnt(8) = 0x40
    assert(parsed5(bigCnt).isEmpty)
    // MM offset pointing past the end → bits unreadable → -1 → default
    // never fires because tag 258 WAS present but unreadable: parse
    // treats it as absent (reads -1 → default 1) — document by pin
    val badOff = tiffMM.clone(); badOff(42) = 0x7F.toByte
    assert(parsed5(badOff) === Some(("tiff", 300L, 200L, 1L, 3L)))
    // JPEG: malformed Exif (bad TIFF magic) is AUXILIARY — dims still
    // parse, orientation falls back to 1
    val badExif = jpegExif.clone(); badExif(10) = 'X'.toByte
    assert(parsed5(badExif) === Some(("jpeg", 3L, 2L, 8L, 1L)))
    // truncation fuzz: NULL or the exact answer
    Seq(("tiffII", tiffII, ("tiff", 9L, 4L, 8L, 6L)),
      ("tiffMM", tiffMM, ("tiff", 300L, 200L, 8L, 3L)),
      ("jpegExif", jpegExif, ("jpeg", 3L, 2L, 8L, 5L))).foreach {
      case (name, full, exp) =>
        (0 until full.length).foreach { n =>
          val got = parsed5(full.take(n))
          assert(got.isEmpty || got.contains(exp) ||
            // a truncated MM losing only its trailing OFFSET values
            // degrades bits to the spec default — still never wrong dims
            (name == "tiffMM" && got.contains(("tiff", 300L, 200L, 1L, 3L))),
            s"$name truncated to $n: WRONG $got")
        }
    }
  }

  private def parsedAudio(b: Array[Byte]): Option[(String, Long, Long, Long)] =
    Option(graft.expressions.AudioHeaderKernel.parse(b)).map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  // canonical 44.1kHz stereo 16-bit PCM WAV header
  private val wav44 = hx(
    "52494646 24000000 57415645 666D7420 10000000 0100 0200 44AC0000" +
      " 10B10200 0400 1000")
  // FLAC fLaC + STREAMINFO(34): rate 44100 (20 bits), 2ch, 16 bps
  private val flac44 = hx(
    "664C6143 00 000022 1000 1000 000000 000000 0A C4 42 F0" +
      "00000000" + "00" * 16)

  test("WAV and FLAC audio headers parse to exact rate/channels/bits") {
    assert(parsedAudio(wav44) === Some(("wav", 44100L, 2L, 16L)))
    assert(parsedAudio(flac44) === Some(("flac", 44100L, 2L, 16L)))
    // WAV: a JUNK chunk before fmt must be walked over by its size
    val withJunk = hx(
      "52494646 30000000 57415645 4A554E4B 04000000 DEADBEEF" +
        " 666D7420 10000000 0100 0100 803E0000 007D0000 0200 0800")
    assert(parsedAudio(withJunk) === Some(("wav", 16000L, 1L, 8L)))
    // corruptions: zero rate/channels; not-WAVE form; FLAC first block
    // not STREAMINFO; truncations never return a wrong answer
    val zr = wav44.clone(); zr(24) = 0; zr(25) = 0; zr(26) = 0; zr(27) = 0
    assert(parsedAudio(zr).isEmpty)
    val zc = wav44.clone(); zc(22) = 0; zc(23) = 0
    assert(parsedAudio(zc).isEmpty)
    val notWave = wav44.clone(); notWave(8) = 'X'.toByte
    assert(parsedAudio(notWave).isEmpty)
    val badBlock = flac44.clone(); badBlock(4) = 0x04
    assert(parsedAudio(badBlock).isEmpty)
    Seq(("wav", wav44, ("wav", 44100L, 2L, 16L)),
      ("flac", flac44, ("flac", 44100L, 2L, 16L))).foreach {
      case (name, full, exp) =>
        (0 until full.length).foreach { n =>
          val got = parsedAudio(full.take(n))
          assert(got.isEmpty || got.contains(exp),
            s"$name truncated to $n: WRONG $got")
        }
    }
    assert(parsedAudio("random text".getBytes("UTF-8")).isEmpty)
  }

  test("headerFeatures flattens through the Column API; unknown kind NULLs") {
    val media = Seq(
      (1L, "image/png", png1x1),
      (2L, "image/gif", gif10x20),
      (3L, "image/jpeg", jpeg3x2),
      (4L, "text/plain", "not an image at all".getBytes("UTF-8")))
      .toDF("doc_id", "kind", "content")
    val got = Multimodal.headerFeatures(media, "doc_id", "kind", "content")
      .orderBy("doc_id").collect()
    assert(got(0).getAs[String]("format") === "png")
    assert((got(1).getAs[Long]("width"), got(1).getAs[Long]("height"))
      === ((10L, 20L)))
    assert(got(2).getAs[Long]("bit_depth") === 8L)
    assert(got(3).isNullAt(got(3).fieldIndex("format")))
    assert(got(3).isNullAt(got(3).fieldIndex("width")))
    assert(got.forall(r => r.getAs[Long]("n_bytes") > 0L))
    // SQL surface
    graft.plans.GraftExtensions.register(spark)
    media.createOrReplaceTempView("media_hdr_spec")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_media_header(content).width AS w
        |FROM media_hdr_spec ORDER BY doc_id""".stripMargin).collect()
    assert(viaSql(0).getLong(1) === 1L)
    assert(viaSql(3).isNullAt(1))
  }
}
