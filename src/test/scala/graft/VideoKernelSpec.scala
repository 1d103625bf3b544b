package graft

import graft.expressions.{Mp3HeaderKernel, PixelKernel, VideoFrameKernel, VideoHeaderKernel}
import graft.queries.VideoFixtures

/** The video container kernels against hand-laid bytes (the
  * MediaHeaderSpec/PcmKernelSpec discipline): exact values out of
  * spec-true layouts, NULL out of every corruption — never a wrong
  * number. Includes the cross-kernel LOCK: an AVI frame's statistics
  * must equal [[PixelKernel]]'s on a BMP of the identical pixels
  * (shared statsOf definition — image↔video near-dup joins depend on
  * it).
  */
class VideoKernelSpec extends SparkSpec {

  private def hx(s: String): Array[Byte] = {
    val c = s.replaceAll("\\s", "")
    Array.tabulate(c.length / 2)(i =>
      Integer.parseInt(c.substring(2 * i, 2 * i + 2), 16).toByte)
  }

  private def header(b: Array[Byte]): Option[(String, Long, Long, Long, Long, String)] =
    Option(VideoHeaderKernel.parse(b)).map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))

  test("MP4: v0/v1 mvhd+tkhd, fixed-point dims, audio-trak skip, stsd codec, stsz frames") {
    for (s <- Seq(0L, 7L, 123L, 4567L); v <- Seq(0, 1); at <- Seq(false, true)) {
      val got = header(VideoFixtures.mp4(s, v, audioTrak = at)).get
      val ts = (s % 29 + 1) * 1000L
      val dur = s % 9000 + 1000L
      assert(got === (("mp4", s % 1800 + 2, (s * 7) % 1000 + 2,
        dur * 1000L / ts, s % 200 + 10L,
        Seq("avc1", "hev1", "mp4v")((s % 3).toInt))),
        s"s=$s v=$v audioTrak=$at")
    }
    // timescale 0 → NULL (division guard is a correctness contract)
    val z = VideoFixtures.headerPayload(14L) // %5==4, even → zeroed ts
    assert(VideoHeaderKernel.parse(z) == null)
    // no moov → NULL
    assert(header(hx("00000010 66747970 69736F6D 00000000")).isEmpty)
  }

  test("AVI: avih fields, handler-0 codec, duration math; truncations NULL") {
    for (s <- Seq(0L, 5L, 31L, 999L)) {
      val got = header(VideoFixtures.avi(s)).get
      assert(got === (("avi", VideoFixtures.aviWidth(s).toLong,
        VideoFixtures.aviHeight(s).toLong,
        VideoFixtures.aviFrames(s).toLong * (s % 30 + 10),
        VideoFixtures.aviFrames(s).toLong, "dib")), s"s=$s")
    }
    val full = VideoFixtures.avi(3L)
    (0 until full.length by 7).foreach { n =>
      val r = VideoHeaderKernel.parse(full.take(n))
      // any prefix that still parses must carry the SAME values
      if (r != null) assert(r.getLong(1) == VideoFixtures.aviWidth(3L))
    }
    assert(VideoHeaderKernel.parse(full.take(30)) == null)
  }

  test("AVI frame sampling: stride selection + the BMP cross-kernel stats lock") {
    val s = 11L
    val w = VideoFixtures.aviWidth(s); val h = VideoFixtures.aviHeight(s)
    val nf = VideoFixtures.aviFrames(s)
    val frames = VideoFrameKernel.decode(VideoFixtures.avi(s), 2).get
    assert(frames.map(_.frameIdx) === (0 until nf by 2).map(_.toLong))
    // lock: frame f's stats == PixelKernel's on a BMP of the SAME
    // pixels (spec-local independent BMP construction)
    def bmpOfFrame(f: Int): Array[Byte] = {
      val stride = (w * 3 + 3) / 4 * 4
      val out = new java.io.ByteArrayOutputStream()
      def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
      out.write('B'); out.write('M'); le32(54 + h * stride)
      le32(0); le32(54); le32(40); le32(w); le32(h)
      le16(1); le16(24); le32(0); le32(h * stride)
      le32(0); le32(0); le32(0); le32(0)
      for (row <- (h - 1) to 0 by -1) {
        for (x <- 0 until w) {
          val p = (((x + s % 29) * (row + s % 23) + 17L * f + s) % 256L).toInt
          out.write(p * 5 % 256); out.write(p * 3 % 256); out.write(p)
        }
        (0 until stride - w * 3).foreach(_ => out.write(0))
      }
      out.toByteArray
    }
    frames.foreach { fr =>
      val still = PixelKernel.decode(bmpOfFrame(fr.frameIdx.toInt))
      assert(fr.lumSum === still.lumSum, s"frame ${fr.frameIdx}")
      assert(fr.lumSqSum === still.lumSqSum)
      assert(fr.dhash === still.dhash)
    }
    // stride 1 decodes every frame; compressed chunk id → None
    assert(VideoFrameKernel.decode(VideoFixtures.avi(s), 1).get.size == nf)
    val compressed = {
      val b = VideoFixtures.avi(s)
      // rewrite the first frame chunk id 00db → 00dc
      val i = indexOfChunk(b, "00db"); b(i + 3) = 'c'.toByte; b
    }
    assert(VideoFrameKernel.decode(compressed, 2).isEmpty)
    // mid-frame truncation → None (loud), never partial stats
    assert(VideoFrameKernel.decode(VideoFixtures.framePayload(7L), 2).isEmpty)
  }

  test("MJPEG AVI: frame decode rides JpegKernel, still↔frame hash identity, re-mux invariance") {
    import graft.queries.PixelFixtures
    // frame 0 of doc s decodes to the SAME stats as the standalone
    // baseline JPEG of the same seed — the still↔video identity that
    // makes image↔video dedup joins well-defined
    for (s <- Seq(4L, 7L, 12L, 21L)) {
      val sp0 = VideoFixtures.mjpegSeed0(s)
      val frames = VideoFrameKernel.decode(VideoFixtures.mjpegAvi(s), 1000).get
      assert(frames.size === 1 && frames.head.frameIdx === 0L)
      val still = PixelKernel.decode(
        PixelFixtures.jpeg(sp0, color = s % 3 == 0, rstInterval = 0,
          big = true))
      assert(frames.head.lumSum === still.lumSum, s"s=$s")
      assert(frames.head.lumSqSum === still.lumSqSum)
      assert(frames.head.dhash === still.dhash)
    }
    // the re-muxed pair (2m, 2m+1): byte-UNEQUAL payloads (JUNK chunk,
    // 00db vs 00dc ids), identical first-frame dHash
    val even = VideoFixtures.mjpegAvi(6L)
    val odd = VideoFixtures.mjpegAvi(7L)
    assert(!even.sameElements(odd))
    val he = VideoFrameKernel.decode(even, 1000).get.head.dhash
    val ho = VideoFrameKernel.decode(odd, 1000).get.head.dhash
    assert(he.isDefined && he === ho)
    // stride 1 decodes every frame; n_frames = s % 3 + 2
    assert(VideoFrameKernel.decode(VideoFixtures.mjpegAvi(7L), 1).get.size === 3)
    // truncated payload (s % 10 = 9) and a corrupted frame SOI both
    // quarantine as None — loud, never wrong pixels
    assert(VideoFrameKernel.decode(VideoFixtures.mjpegAvi(9L), 1000).isEmpty)
    val mangled = VideoFixtures.mjpegAvi(6L)
    val fi = indexOfChunk(mangled, "00dc")
    mangled(fi + 8) = 0x00 // first frame's SOI first byte
    assert(VideoFrameKernel.decode(mangled, 1000).isEmpty)
    // a 00dc chunk in a NON-MJPEG (DIB) AVI still refuses
    val dib = VideoFixtures.avi(11L)
    val di = indexOfChunk(dib, "00db"); dib(di + 3) = 'c'.toByte
    assert(VideoFrameKernel.decode(dib, 2).isEmpty)
  }

  private def indexOfChunk(b: Array[Byte], t: String): Int = {
    var i = 0
    while (i + 4 <= b.length) {
      if (b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) &&
        b(i + 3) == t(3)) return i
      i += 1
    }
    -1
  }

  private def mp3(b: Array[Byte]): Option[Seq[Long]] =
    Option(Mp3HeaderKernel.parse(b)).map(r => (0 until 5).map(r.getLong))

  test("MP3: frame walk, tables, padding, ID3v2 skip, VBR mean; corruption NULL") {
    // 3 CBR frames: MPEG-1 L3, 128 kbps (idx 9), 44100 Hz (idx 0),
    // stereo; frame size 144·128000/44100 = 417 (+pad)
    def frame(brIdx: Int, srIdx: Int, pad: Int, mono: Boolean,
              ver1: Boolean = true): Array[Byte] = {
      val b1 = if (ver1) 0xFB else 0xF3 // MPEG-1 / MPEG-2, L3, no CRC
      val b2 = (brIdx << 4) | (srIdx << 2) | (pad << 1)
      val b3 = if (mono) 0xC0 else 0x00
      val kbps = if (ver1) Seq(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
        160, 192, 224, 256, 320)(brIdx)
      else Seq(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
        160)(brIdx)
      val rate = if (ver1) Seq(44100, 48000, 32000)(srIdx)
      else Seq(22050, 24000, 16000)(srIdx)
      val spf = if (ver1) 1152 else 576
      val size = spf / 8 * kbps * 1000 / rate + pad
      Array(0xFF.toByte, b1.toByte, b2.toByte, b3.toByte) ++
        new Array[Byte](size - 4)
    }
    val cbr = frame(9, 0, 0, mono = false) ++ frame(9, 0, 1, mono = false) ++
      frame(9, 0, 0, mono = false)
    assert(mp3(cbr).get === Seq(44100L, 2L, 3L,
      3L * 1152 * 1000 / 44100, 128L))
    // ID3v2 preamble skipped (synchsafe size 130 = 0x01 0x02)
    val id3 = hx("494433 0400 00 00000102") ++ new Array[Byte](130) ++ cbr
    assert(mp3(id3).get(2) === 3L)
    // VBR: mean bitrate floor((128+192)/2) = 160
    val vbr = frame(9, 0, 0, mono = false) ++ frame(11, 0, 0, mono = false)
    assert(mp3(vbr).get(4) === 160L)
    // MPEG-2: 576 samples/frame
    val v2 = frame(5, 2, 0, mono = true, ver1 = false)
    assert(mp3(v2).get === Seq(16000L, 1L, 1L, 576L * 1000 / 16000, 40L))
    // corruptions: truncated last frame / trailing garbage / free
    // bitrate / mid-stream rate flip → NULL
    assert(mp3(cbr.dropRight(3)).isEmpty)
    assert(mp3(cbr ++ Array[Byte](0x12)).isEmpty)
    assert(mp3(frame(9, 0, 0, mono = false).updated(2, 0x00.toByte)).isEmpty)
    assert(mp3(frame(9, 0, 0, mono = false) ++
      frame(9, 1, 0, mono = false)).isEmpty)
  }

  test("Matroska/EBML: doctype, float widths, ts default, unknown-size segment, audio skip; corruption NULL") {
    // fixture round trip across doctype / float-width / audio slices
    for (s <- Seq(0L, 1L, 2L, 3L, 5L, 6L, 123L)) {
      val got = header(VideoFixtures.mkv(s)).get
      assert(got === ((if (s % 4 < 2) "webm" else "matroska",
        s % 1800 + 2, (s * 7) % 1000 + 2,
        (s % 5000 + 100) * (s % 4 + 1), 0L,
        Seq("V_VP9", "V_AV1", "V_MPEG4/ISO/AVC")((s % 3).toInt))), s"s=$s")
    }
    // unknown-size Segment (all-ones size varint) runs to EOF — same
    // values must come out
    val b = VideoFixtures.mkv(7L)
    val hlen = 11 // s=7: %4=3 → "matroska"
    b(9 + hlen) = 0x7F.toByte; b(10 + hlen) = 0xFF.toByte
    assert(header(b).get._2 === 7L % 1800 + 2)

    // spec-local hand-laid minimal files (independent construction)
    def mini(tsEl: Boolean, durBits: Option[Long], durLen: Int,
             trackType: Int): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      def u8(v: Int): Unit = o.write(v & 0xFF)
      def sz(v: Int): Unit = u8(0x80 | v)
      def be(v: Long, n: Int): Unit =
        (n - 1 to 0 by -1).foreach(k => u8((v >> (8 * k)).toInt))
      u8(0x1A); u8(0x45); u8(0xDF); u8(0xA3); sz(7)
      u8(0x42); u8(0x82); sz(4); "webm".foreach(c => u8(c.toInt))
      val infoLen = (if (tsEl) 8 else 0) +
        durBits.map(_ => 2 + 1 + durLen).getOrElse(0)
      val trkLen = 2 + 3 + 4 + 10 // entry: type + codec("V_X") + video
      val segSize = 5 + infoLen + 5 + trkLen
      u8(0x18); u8(0x53); u8(0x80); u8(0x67); u8(0x40 | (segSize >> 8))
      u8(segSize & 0xFF)
      u8(0x15); u8(0x49); u8(0xA9); u8(0x66); sz(infoLen)
      if (tsEl) { u8(0x2A); u8(0xD7); u8(0xB1); sz(4); be(2000000L, 4) }
      durBits.foreach { bits =>
        u8(0x44); u8(0x89); sz(durLen); be(bits, durLen)
      }
      u8(0x16); u8(0x54); u8(0xAE); u8(0x6B); sz(trkLen)
      u8(0xAE); sz(3 + 4 + 10)
      u8(0x83); sz(1); u8(trackType)
      u8(0x86); sz(2); u8('V'); u8('1')
      u8(0xE0); sz(8)
      u8(0xB0); sz(2); be(640L, 2); u8(0xBA); sz(2); be(480L, 2)
      o.toByteArray
    }
    val f500 = java.lang.Float.floatToIntBits(500f).toLong & 0xFFFFFFFFL
    // ts present (2e6): duration_ms = 500·2e6/1e6 = 1000
    assert(header(mini(tsEl = true, Some(f500), 4, 1)).get._4 === 1000L)
    // ts ABSENT → spec default 1e6 → 500 ms
    assert(header(mini(tsEl = false, Some(f500), 4, 1)).get._4 === 500L)
    // missing Duration → NULL (a curation gate needs duration)
    assert(header(mini(tsEl = true, None, 4, 1)).isEmpty)
    // NaN duration → NULL
    val nan = java.lang.Float.floatToIntBits(Float.NaN).toLong & 0xFFFFFFFFL
    assert(header(mini(tsEl = true, Some(nan), 4, 1)).isEmpty)
    // no VIDEO track (type 2 only) → NULL
    assert(header(mini(tsEl = true, Some(f500), 4, 2)).isEmpty)
    // truncations never return wrong values
    val full = VideoFixtures.mkv(9L)
    (0 until full.length).foreach { n =>
      val r = VideoHeaderKernel.parse(full.take(n))
      if (r != null) assert(r.getLong(1) === 9L % 1800 + 2)
    }
  }

  test("cross-modal match: a BMP still is found at its exact (video, frame); banding loses nothing") {
    import spark.implicits._
    import org.apache.spark.sql.functions.explode
    // 6 videos (ids 0,2,..,10), one probe still per video at frame f*
    val vids = (0L to 10L by 2).map(s => (s, VideoFixtures.avi(s)))
      .toDF("vid", "__p")
      .select($"vid", explode(
        graft.functions.videoFrameStats($"__p", 1)).as("__f"))
      .select(($"vid" * 16L + $"__f.frame_idx").as("fid"),
        $"__f.dhash".as("dhash"))
    val probes = (0L to 10L by 2).map { s =>
      val fs = ((s / 2) % VideoFixtures.aviFrames(s)).toInt
      (s + 1, VideoFixtures.stillOfFrame(s, fs), fs)
    }
    val img = probes.map(p => (p._1, p._2)).toDF("img", "__p")
      .select($"img", graft.functions.pixelStats($"__p")
        .getField("dhash").as("dhash"))
    val got = graft.operators.Dedup.signatureMatches64(
        img, "img", vids, "fid", "dhash", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted (probe, video·16+f*) pair is found at Hamming 0
    probes.foreach { case (imgId, _, fs) =>
      assert(got.contains((imgId, (imgId - 1) * 16 + fs)),
        s"planted match for probe $imgId missing")
    }
    // and the banded answer equals the brute-force answer (no recall
    // loss — pigeonhole at radius 0 is trivially exact, but the band
    // plumbing could still drop or duplicate rows)
    val brute = img.as("a").crossJoin(vids.as("b"))
      .filter($"a.dhash" === $"b.dhash")
      .select($"a.img", $"b.fid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute)
  }

  test("pixel resize: corner cells, full-size identity, upscale NULL") {
    val s = 4L
    val w = graft.queries.PixelFixtures.width(s)
    val h = graft.queries.PixelFixtures.height(s)
    val png = graft.queries.PixelFixtures.pngGray(s)
    // full-size "resize" is the identity on every pixel
    val id = PixelKernel.resizeBox(png, w, h)
    assert(id.length === w * h)
    def lum(x: Int, y: Int): Long =
      1000L * (((x + s % 31) * (y + s % 37) * 3 + s) % 256)
    for (y <- 0 until h; x <- 0 until w)
      assert(id(y * w + x) === lum(x, y))
    // 1×1 is the floor-average of everything
    val one = PixelKernel.resizeBox(png, 1, 1)
    val all = for (y <- 0 until h; x <- 0 until w) yield lum(x, y)
    assert(one(0) === all.sum / all.length)
    assert(PixelKernel.resizeBox(png, w + 1, h) == null) // upscale
    assert(PixelKernel.resizeBox(png.take(40), 2, 2) == null) // corrupt
  }

  test("adversarial header arithmetic: duration products and resize cell indices never overflow") {
    // MP4 mvhd v1 carries a 64-bit duration: Long.MaxValue would
    // overflow duration*1000 into a negative duration_ms — the
    // contract is NULL, never a wrong number
    val mp4 = VideoFixtures.mp4(5L, 1, audioTrak = false)
    assert(VideoHeaderKernel.parse(mp4) != null)
    var t = 0
    while (!(mp4(t) == 'm' && mp4(t + 1) == 'v' && mp4(t + 2) == 'h' &&
      mp4(t + 3) == 'd')) t += 1
    val evil = mp4.clone()
    // v1 payload: ver/flags(4) ctime(8) mtime(8) ts(4) then dur be64
    evil(t + 28) = 0x7F.toByte
    (t + 29 until t + 36).foreach(i => evil(i) = 0xFF.toByte)
    assert(VideoHeaderKernel.parse(evil) == null)
    // AVI: dwMicroSecPerFrame and dwTotalFrames are both LE32 — at
    // 2^32−1 each their product overflows Long
    val avi = VideoFixtures.avi(3L)
    assert(VideoHeaderKernel.parse(avi) != null)
    var a = 0
    while (!(avi(a) == 'a' && avi(a + 1) == 'v' && avi(a + 2) == 'i' &&
      avi(a + 3) == 'h')) a += 1
    val evilAvi = avi.clone()
    (a + 8 until a + 12).foreach(i => evilAvi(i) = 0xFF.toByte) // us
    (a + 24 until a + 28).foreach(i => evilAvi(i) = 0xFF.toByte) // frames
    assert(VideoHeaderKernel.parse(evilAvi) == null)
    // resizeGrid cell partition: a degenerate-aspect 1×2^24 source with
    // a 256-cell target overflows th*y in Int arithmetic (2^32) — the
    // kernel must partition in Long and return real values, not throw
    val cells = PixelKernel.resizeGrid(1, 1 << 24, 1, 256,
      (_, y) => (y & 0xFF).toLong)
    assert(cells.length === 256)
    // each cell averages 65536 consecutive y values; y & 0xFF cycles
    // every 256, so every cell's average is the same full-cycle mean
    assert(cells.forall(_ === (0 until 256).sum / 256))
  }
}
