package graft

import graft.expressions.{AudioHeaderKernel, MediaHeaderKernel, Mp3HeaderKernel, PcmKernel, PixelKernel, VideoFrameKernel, VideoHeaderKernel}
import graft.queries.{PixelFixtures, VideoFixtures}

/** Adversarial fuzz over every byte-parsing kernel: the contract at
  * 100 TB is that UNTRUSTED BYTES NEVER THROW — a single adversarial
  * payload raising ArrayIndexOutOfBounds inside a codegen'd expression
  * kills the whole job, where NULL merely quarantines one row. Seeded
  * (deterministic) sweeps: random byte blobs, random truncations,
  * random single/multi-byte mutations of VALID payloads, and the
  * specific integer-overflow shapes (a ~2 GB declared RIFF chunk size
  * — the round-14 chunk-walk overflow fix's regression pin).
  */
class MediaFuzzSpec extends SparkSpec {

  private val rng = new scala.util.Random(14L)

  private def kernels: Seq[(String, Array[Byte] => Any)] = Seq(
    ("MediaHeader", MediaHeaderKernel.parse _),
    ("AudioHeader", AudioHeaderKernel.parse _),
    ("Pcm", PcmKernel.parse _),
    ("AudioEnvelopeHash", (b: Array[Byte]) => PcmKernel.envelopeHash(b)),
    ("Pixel", (b: Array[Byte]) => PixelKernel.decode(b)),
    ("PixelResize", (b: Array[Byte]) => PixelKernel.resizeBox(b, 4, 4)),
    ("VideoHeader", VideoHeaderKernel.parse _),
    ("VideoFrame", (b: Array[Byte]) => VideoFrameKernel.decode(b, 2)),
    ("Mp3Header", Mp3HeaderKernel.parse _),
    ("Tar", (b: Array[Byte]) => graft.expressions.TarKernel.parse(b)),
    ("Gzip", (b: Array[Byte]) => graft.expressions.GzipKernel.decode(b)),
    ("Zstd", (b: Array[Byte]) => graft.expressions.ZstdKernel.decode(b)),
    ("MediaStrip", (b: Array[Byte]) => graft.expressions.MediaStripKernel.strip(b)),
    ("Zip", (b: Array[Byte]) => graft.expressions.ZipKernel.parse(b)),
    ("InflateRaw", (b: Array[Byte]) => graft.expressions.InflateRawKernel.decode(b, 64L)))

  private def mustNotThrow(label: String, b: Array[Byte]): Unit =
    kernels.foreach { case (k, f) =>
      try { f(b); () }
      catch { case e: Throwable =>
        fail(s"$k threw ${e.getClass.getSimpleName} on $label " +
          s"(len=${b.length}): ${e.getMessage}")
      }
    }

  // valid seeds across every format the kernels parse
  private def seeds: Seq[Array[Byte]] = {
    def hx(s: String): Array[Byte] = {
      val c = s.replaceAll("\\s", "")
      Array.tabulate(c.length / 2)(i =>
        Integer.parseInt(c.substring(2 * i, 2 * i + 2), 16).toByte)
    }
    val wav = hx(
      "52494646 24000000 57415645 666D7420 10000000 0100 0200 44AC0000" +
        " 10B10200 0400 1000 64617461 08000000 E803 18FC E803 18FC")
    val flac = hx(
      "664C6143 00 000022 1000 1000 000000 000000 0A C4 42 F0" +
        "00000000" + "00" * 16)
    val tiff = hx(
      "49492A00 08000000 0400" +
        "0001 0400 01000000 09000000" + "0101 0400 01000000 04000000" +
        "0201 0300 01000000 0800 0000" + "1201 0300 01000000 0600 0000" +
        "00000000")
    val webp = hx(
      "52494646 1A000000 57454250 5650384C 0D000000 2F00000000")
    val jpeg = hx(
      "FFD8 FFE1 0022 457869660000" +
        "4D4D002A 00000008 0001 0112 0003 00000001 0005 0000 00000000" +
        "FFC0 0011 08 0002 0003 03 011100 021101 031101 FFD9")
    // a small CBR MP3: 3 MPEG-1 Layer III frames at 32 kbps / 32 kHz
    // (frame size 144·32000/32000 = 144, no padding), mono
    val mp3Frame = "FFFB18C0" + "00" * 140
    val mp3 = hx(mp3Frame * 3)
    Seq(PixelFixtures.payload(0L), PixelFixtures.payload(1L),
      PixelFixtures.payload(2L), PixelFixtures.gif(3L),
      VideoFixtures.avi(1L), VideoFixtures.mp4(2L, 0, audioTrak = false),
      VideoFixtures.mp4(3L, 1, audioTrak = true), mp3,
      VideoFixtures.mkv(5L), VideoFixtures.mkv(6L),
      graft.queries.TarFixtures.tar(4L),
      graft.queries.TarFixtures.gzPayload(1L),
      graft.queries.TarFixtures.gzTarPayload(2L),
      PixelFixtures.pngWithText(3L), PixelFixtures.jpegWithExif(4L),
      graft.queries.TarFixtures.zip(5L),
      graft.queries.TarFixtures.zstPayload(1L),
      graft.queries.TarFixtures.zstTarPayload(2L),
      PixelFixtures.jpegPayload(0L), PixelFixtures.jpegPayload(1L),
      PixelFixtures.jpegPayload(2L), PixelFixtures.pngPalette(3L),
      PixelFixtures.pngGrayAlpha(4L), PixelFixtures.pngRgba(5L),
      // round-17 formats: MS-ADPCM, stereo IMA, FLAC mono/stereo,
      // MJPEG AVI — mutations drive the block walks, Rice decode,
      // predictor recursions, and the per-frame JPEG hop
      graft.queries.AudioFixtures.msPayload(0L),
      graft.queries.AudioFixtures.msPayload(6L),
      graft.queries.AudioFixtures.imaStereoPayload(1L),
      graft.queries.AudioFixtures.flacPayload(2L),
      graft.queries.AudioFixtures.flacPayload(5L),
      graft.queries.AudioFixtures.flacStereoPayload(1L),
      graft.queries.AudioFixtures.flacStereoPayload(2L),
      VideoFixtures.mjpegAvi(4L), VideoFixtures.mjpegAvi(7L),
      wav, flac, tiff, webp, jpeg)
  }

  test("random byte blobs never throw (all kernels)") {
    for (n <- Seq(0, 1, 2, 3, 4, 7, 8, 13, 33, 54, 64, 200, 2048);
         _ <- 0 until 40) {
      val b = new Array[Byte](n)
      rng.nextBytes(b)
      mustNotThrow("random blob", b)
    }
    // blobs that START like each format's magic but continue random
    val magics = Seq("89504E47", "47494638", "FFD8", "424D", "52494646",
      "664C6143", "49492A00", "4D4D002A")
    for (m <- magics; _ <- 0 until 40) {
      val tail = new Array[Byte](rng.nextInt(200))
      rng.nextBytes(tail)
      val b = m.grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray ++ tail
      mustNotThrow(s"magic $m + random", b)
    }
  }

  test("mutations and truncations of valid payloads never throw") {
    seeds.foreach { base =>
      // every truncation
      (0 to base.length).foreach(n => mustNotThrow("trunc", base.take(n)))
      // random byte mutations (1..4 positions), many rounds
      for (_ <- 0 until 300) {
        val b = base.clone()
        (0 until 1 + rng.nextInt(4)).foreach { _ =>
          b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
        }
        mustNotThrow("mutation", b)
      }
      // random splice: insert/delete a chunk of bytes
      for (_ <- 0 until 50) {
        val at = rng.nextInt(base.length)
        val ins = new Array[Byte](rng.nextInt(16))
        rng.nextBytes(ins)
        mustNotThrow("splice",
          base.take(at) ++ ins ++ base.drop(at + rng.nextInt(8)))
      }
    }
  }

  test("integer-overflow shapes: ~2GB declared sizes quarantine, never throw") {
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    // RIFF chunk declaring 0x7FFFFFF0 bytes: the Int advance would
    // wrap negative — must be NULL (the round-14 fix's pin)
    val riffBomb = "RIFF".getBytes ++ le32(0x30) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ le32(0x7FFFFFF0L) ++ Array.fill(16)(0.toByte)
    assert(AudioHeaderKernel.parse(riffBomb) == null)
    assert(PcmKernel.parse(riffBomb) == null)
    // PNG chunk declaring a huge length
    val pngBomb = PixelFixtures.payload(0L).clone()
    pngBomb(33) = 0x7F.toByte; pngBomb(34) = 0xFF.toByte
    pngBomb(35) = 0xFF.toByte; pngBomb(36) = 0xF0.toByte
    mustNotThrow("png bomb", pngBomb)
    // TIFF value offset at u32 max
    val tb = Array[Byte]('I', 'I', 0x2A, 0) ++ le32(8) ++
      Array[Byte](1, 0) ++ // one entry
      Array[Byte](0, 1, 3, 0) ++ le32(3) ++ le32(0xFFFFFFF0L) ++
      le32(0)
    mustNotThrow("tiff huge offset", tb)
    // GIF sub-block chain that never terminates within the payload
    val gifBomb = PixelFixtures.gif(1L).dropRight(2) // cut terminator+trailer
    mustNotThrow("gif unterminated", gifBomb)
    assert(PixelKernel.decode(gifBomb) == null)
    // WAV data chunk declaring MaxDataBytes+ (decode-bomb guard)
    val wavBig = "RIFF".getBytes ++ le32(0x30) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++
      Array[Byte](1, 0, 1, 0) ++ le32(8000) ++ le32(16000) ++
      Array[Byte](2, 0, 16, 0) ++
      "data".getBytes ++ le32(1L << 27) ++ Array.fill(8)(0.toByte)
    assert(PcmKernel.parse(wavBig) == null)
    // PNG IHDR advertising 0x7FFFFFFF × 0x7FFFFFFF RGBA: both rawLen
    // and w*h*samples would wrap negative in Long and slip past the
    // decode-bomb guard without the early dimension cap — must be
    // NULL, never NegativeArraySizeException (round-17 ADVICE fix)
    val pngWrap = PixelFixtures.payload(0L).clone()
    for (k <- 16 until 24) pngWrap(k) = 0xFF.toByte
    pngWrap(16) = 0x7F.toByte; pngWrap(20) = 0x7F.toByte
    pngWrap(25) = 6 // RGBA
    assert(PixelKernel.decode(pngWrap) == null)
  }

  test("progressive JPEG successive-approximation bounds: Al=13 quarantines") {
    // Mutate the first SOS's Ah/Al byte to Al=13: a DC-first scan then
    // reconstructs pred << 13, past the ±2047 coefficient range the
    // pinned IDCT's overflow proof assumes — the kernel must reject
    // (NULL), not emit deterministic-but-wrong pixels.
    val base = PixelFixtures.progressiveJpeg(5L, color = true, rstInterval = 0)
    var sos = -1
    var k = 2
    while (sos < 0 && k + 1 < base.length) {
      if ((base(k) & 0xFF) == 0xFF && (base(k + 1) & 0xFF) == 0xDA) sos = k
      else k += 1
    }
    assert(sos > 0)
    val ns = base(sos + 4) & 0xFF
    val mutated = base.clone()
    mutated(sos + 5 + 2 * ns + 2) = 0x0D // Ah=0, Al=13
    assert(PixelKernel.decode(mutated) == null)
    assert(PixelKernel.decode(base) != null) // the unmutated stream still decodes
  }
}
