package graft.queries

/** Constructed VIDEO container payloads for the q352/q353/q356 gates —
  * the [[PixelFixtures]] discipline extended to moving pictures: every
  * container is built from doc_id arithmetic the DuckDB oracle replays
  * without touching a byte, and the construction direction shares no
  * code with the decode kernels ([[graft.expressions.VideoHeaderKernel]]
  * / [[graft.expressions.VideoFrameKernel]]): AVI chunks are written
  * forward here and chunk-walked there; MP4 boxes are laid out with
  * hand-summed sizes here and size-walked there. An offset, size, or
  * endianness bug on either side breaks the round trip loudly.
  *
  * Shared arithmetic (the oracle's contract — change BOTH sides):
  *
  * AVI (uncompressed 24bpp DIB frames, the codec-free layout):
  *   W(s)  = s % 16 + 12          (12..27 — ≥ 9 so the dHash grid exists)
  *   H(s)  = (s·3) % 12 + 8       (8..19)
  *   F(s)  = s % 6 + 4            (4..9 frames)
  *   us(s) = (s % 30 + 10) · 1000 (µs per frame → duration_ms = F·(s%30+10))
  *   p(x, y, f, s) = ((x + s % 29) · (y + s % 23) + 17·f + s) % 256
  *   frame pixel (r, g, b) = (p, 3p % 256, 5p % 256) — the SAME RGB
  *   arithmetic as [[PixelFixtures]], so milli-luminance formulas are
  *   shared: lum = 299p + 587(3p%256) + 114(5p%256)
  *   sizes: stride = ⌈3W/4⌉·4, frameBytes = stride·H,
  *          total = 224 + F·(8 + frameBytes)
  *
  * MP4 (header-only — ISO-BMFF carries no codec-free pixel layout):
  *   W(s) = s % 1800 + 2,  H(s) = (s·7) % 1000 + 2
  *   timescale ts(s) = (s % 29 + 1) · 1000
  *   duration d(s)  = s % 9000 + 1000  → duration_ms = ⌊d·1000 / ts⌋
  *   n_frames = s % 200 + 10
  *   codec = ["avc1", "hev1", "mp4v"][s % 3]
  *   sizes: v0 = 308, v1 = 332, v0-with-audio-trak = 408 bytes
  */
private[graft] object VideoFixtures {

  def aviWidth(s: Long): Int = (s % 16 + 12).toInt
  def aviHeight(s: Long): Int = ((s * 3) % 12 + 8).toInt
  def aviFrames(s: Long): Int = (s % 6 + 4).toInt

  private def pix(x: Int, y: Int, f: Int, s: Long): Int =
    (((x + s % 29) * (y + s % 23) + 17L * f + s) % 256L).toInt

  private class W {
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def le16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def le32(v: Long): Unit = {
      u8(v.toInt); u8((v >> 8).toInt); u8((v >> 16).toInt)
      u8((v >> 24).toInt)
    }
    def be32(v: Long): Unit = {
      u8((v >> 24).toInt); u8((v >> 16).toInt); u8((v >> 8).toInt)
      u8(v.toInt)
    }
    def be64(v: Long): Unit = { be32(v >>> 32); be32(v & 0xFFFFFFFFL) }
    def tag(t: String): Unit = t.foreach(c => u8(c.toInt))
    def zeros(n: Int): Unit = (0 until n).foreach(_ => u8(0))
    def bytes: Array[Byte] = out.toByteArray
  }

  /** Uncompressed-DIB AVI: RIFF('AVI ') → LIST hdrl (avih + LIST strl
    * (strh vids/handler-0 + strf BITMAPINFOHEADER 24bpp BI_RGB)) →
    * LIST movi (F '00db' chunks of bottom-up BGR rows, stride padded
    * to 4 — the BMP pixel layout).
    */
  def avi(s: Long): Array[Byte] = {
    val wd = aviWidth(s); val ht = aviHeight(s); val nf = aviFrames(s)
    val us = (s % 30 + 10) * 1000L
    val stride = (wd * 3 + 3) / 4 * 4
    val fb = stride * ht
    val moviSize = 4L + nf.toLong * (8L + fb)
    val total = 224L + nf.toLong * (8L + fb)
    val w = new W
    w.tag("RIFF"); w.le32(total - 8L); w.tag("AVI ")
    // ---- LIST hdrl (total 200 = 8 + 192)
    w.tag("LIST"); w.le32(192L); w.tag("hdrl")
    w.tag("avih"); w.le32(56L)
    w.le32(us) // dwMicroSecPerFrame
    w.le32(0L); w.le32(0L); w.le32(0L) // maxbps, padding, flags
    w.le32(nf.toLong) // dwTotalFrames
    w.le32(0L); w.le32(1L); w.le32(0L) // initial, streams, bufsize
    w.le32(wd.toLong); w.le32(ht.toLong) // dwWidth, dwHeight
    w.zeros(16) // dwReserved[4]
    // LIST strl (total 124 = 8 + 116)
    w.tag("LIST"); w.le32(116L); w.tag("strl")
    w.tag("strh"); w.le32(56L)
    w.tag("vids"); w.le32(0L) // fccType, fccHandler 0 → "dib"
    w.zeros(48) // flags/priority/frames/rate/... (not gated on)
    w.tag("strf"); w.le32(40L)
    w.le32(40L); w.le32(wd.toLong); w.le32(ht.toLong) // biSize, w, h(+)
    w.le16(1); w.le16(24) // planes, bpp
    w.le32(0L); w.le32(fb.toLong) // BI_RGB, biSizeImage
    w.zeros(16) // ppm/clr fields
    // ---- LIST movi
    w.tag("LIST"); w.le32(moviSize); w.tag("movi")
    var f = 0
    while (f < nf) {
      w.tag("00db"); w.le32(fb.toLong)
      var row = ht - 1 // bottom-up: last visual row first on disk
      while (row >= 0) {
        var x = 0
        while (x < wd) {
          val p = pix(x, row, f, s)
          w.u8(p * 5 % 256); w.u8(p * 3 % 256); w.u8(p) // B G R
          x += 1
        }
        w.zeros(stride - wd * 3)
        row -= 1
      }
      f += 1
    }
    w.bytes
  }

  /** MJPEG AVI for the q385 video-dedup gate (round 17): same RIFF
    * skeleton as [[avi]] but strf biCompression = 'MJPG' and every
    * frame chunk holds a BASELINE JPEG from [[PixelFixtures.jpeg]]
    * (big mode — the dHash-entropy dims; the encoder is the forward
    * direction, independent of [[graft.expressions.JpegKernel]]).
    * Shared arithmetic (the oracle's contract):
    *
    *   frame-0 seed sp(s) by s % 12 — the three duplicate classes an
    *     ingest increment meets:
    *       {4,5,8,10} → 5000011 + s            (unique: NEW content)
    *       {9,11}     → 7000019 + s/12         (the odd pair (12m+9,
    *                     12m+11): BATCH-internal duplicates)
    *       else       → s − s % 2              (the pair (2m, 2m+1):
    *                     CROSS even↔odd duplicates)
    *     the three seed ranges are disjoint from each other and from
    *     the f ≥ 1 seeds 1000003 + 7s + f (unique per (s, f), f < 7);
    *   frame dims/pixels: [[PixelFixtures.jpeg]] big mode —
    *     w = sp % 24 + 72, h = (sp·5) % 24 + 64, DC-only blocks with
    *     dc(bx,by) = pix(bx,by,sp) − 128 and the pinned-IDCT closed
    *     form value = clamp(⌊(dc·8·1448² + 2^23)/2^24⌋,−128,127)+128;
    *   n_frames = s % 3 + 2; color (neutral chroma) when s % 3 = 0;
    *   RE-MUX variance: even docs write plain `00dc` chunks; odd docs
    *     write `00db` chunks behind a JUNK chunk of s % 7 + 4 bytes —
    *     byte-UNEQUAL containers around byte-identical first frames,
    *     the duplicate class only frame-pixel hashing catches;
    *   s % 10 = 9 → the payload is truncated 7 bytes short (the RIFF
    *     walk overruns → NULL, the quarantine row).
    */
  /** Frame-0 seed of [[mjpegAvi]] — the shared oracle arithmetic. */
  def mjpegSeed0(s: Long): Long = (s % 12) match {
    case 4 | 5 | 8 | 10 => 5000011L + s
    case 9 | 11 => 7000019L + s / 12
    case _ => s - s % 2
  }

  def mjpegAvi(s: Long): Array[Byte] = {
    val nf = (s % 3 + 2).toInt
    val frames = (0 until nf).map { f =>
      val sp = if (f == 0) mjpegSeed0(s) else 1000003L + 7L * s + f
      PixelFixtures.jpeg(sp, color = s % 3 == 0, rstInterval = 0,
        big = true)
    }
    val junkLen = if (s % 2 == 1) (s % 7 + 4).toInt else 0
    val chunkId = if (s % 2 == 1) "00db" else "00dc"
    val moviPayload = frames.map(fr => 8L + fr.length + (fr.length & 1)).sum +
      (if (junkLen > 0) 8L + junkLen + (junkLen & 1) else 0L)
    val moviSize = 4L + moviPayload
    val w = new W
    val wd = (mjpegSeed0(s) % 24 + 72).toInt
    val ht = ((mjpegSeed0(s) * 5) % 24 + 64).toInt
    w.tag("RIFF")
    w.le32(4L + (8L + 192L) + (8L + moviSize)) // 'AVI ' + hdrl + movi
    w.tag("AVI ")
    // ---- LIST hdrl (192 = avih(64) + strl LIST(124) + 4)
    w.tag("LIST"); w.le32(192L); w.tag("hdrl")
    w.tag("avih"); w.le32(56L)
    w.le32((s % 30 + 10) * 1000L)
    w.le32(0L); w.le32(0L); w.le32(0L)
    w.le32(nf.toLong)
    w.le32(0L); w.le32(1L); w.le32(0L)
    w.le32(wd.toLong); w.le32(ht.toLong)
    w.zeros(16)
    w.tag("LIST"); w.le32(116L); w.tag("strl")
    w.tag("strh"); w.le32(56L)
    w.tag("vids"); w.tag("MJPG")
    w.zeros(48)
    w.tag("strf"); w.le32(40L)
    w.le32(40L); w.le32(wd.toLong); w.le32(ht.toLong)
    w.le16(1); w.le16(24)
    w.tag("MJPG") // biCompression fourcc
    w.le32(0L) // biSizeImage (variable for MJPEG)
    w.zeros(16)
    // ---- LIST movi
    w.tag("LIST"); w.le32(moviSize); w.tag("movi")
    if (junkLen > 0) {
      w.tag("JUNK"); w.le32(junkLen.toLong)
      w.zeros(junkLen + (junkLen & 1))
    }
    frames.foreach { fr =>
      w.tag(chunkId); w.le32(fr.length.toLong)
      fr.foreach(byte => w.u8(byte & 0xFF))
      if ((fr.length & 1) == 1) w.u8(0) // RIFF word padding
    }
    val full = w.bytes
    if (s % 10 == 9) java.util.Arrays.copyOfRange(full, 0, full.length - 7)
    else full
  }

  /** Minimal spec-true MP4: ftyp(16) + moov(mvhd + [audio trak] +
    * video trak(tkhd + mdia/minf/stbl(stsd + stsz))). `version` 0 or 1
    * selects the mvhd/tkhd time-field width; `audioTrak` prepends a
    * 0×0-dimension trak the parser must skip.
    */
  def mp4(s: Long, version: Int, audioTrak: Boolean): Array[Byte] = {
    val wd = s % 1800 + 2
    val ht = (s * 7) % 1000 + 2
    val ts = (s % 29 + 1) * 1000L
    val dur = s % 9000 + 1000L
    val nf = s % 200 + 10L
    val codec = Seq("avc1", "hev1", "mp4v")((s % 3).toInt)
    val w = new W
    w.be32(16L); w.tag("ftyp"); w.tag("isom"); w.be32(0L)
    val mvhdSize = if (version == 0) 108L else 120L
    val tkhdSize = if (version == 0) 92L else 104L
    val audioSize = if (audioTrak) 100L else 0L // 8 + tkhd v0 (92)
    // stbl = 8 + stsd 32 + stsz 20 = 60; minf 68; mdia 76
    val trakSize = 8L + tkhdSize + 76L
    val moovSize = 8L + mvhdSize + audioSize + trakSize
    w.be32(moovSize); w.tag("moov")
    // mvhd
    w.be32(mvhdSize); w.tag("mvhd")
    if (version == 0) {
      w.u8(0); w.zeros(3) // version+flags
      w.be32(0L); w.be32(0L) // ctime, mtime
      w.be32(ts); w.be32(dur)
      w.zeros(100 - 20) // rate/volume/reserved/matrix/predefined/next
    } else {
      w.u8(1); w.zeros(3)
      w.be64(0L); w.be64(0L)
      w.be32(ts); w.be64(dur)
      w.zeros(112 - 32)
    }
    def tkhd(version: Int, tw: Long, th: Long): Unit = {
      w.be32(if (version == 0) 92L else 104L); w.tag("tkhd")
      if (version == 0) {
        w.u8(0); w.zeros(3)
        w.zeros(8) // ctime, mtime
        w.be32(1L); w.be32(0L); w.be32(0L) // track_ID, reserved, duration
        w.zeros(8 + 2 + 2 + 2 + 2) // reserved, layer, altgroup, vol, rsv
        w.zeros(36) // matrix
        w.be32(tw << 16); w.be32(th << 16) // 16.16 fixed
      } else {
        w.u8(1); w.zeros(3)
        w.zeros(16) // 64-bit ctime, mtime
        w.be32(1L); w.be32(0L); w.be64(0L)
        w.zeros(16)
        w.zeros(36)
        w.be32(tw << 16); w.be32(th << 16)
      }
    }
    if (audioTrak) { // 0×0 dims: the parser must walk PAST this trak
      w.be32(100L); w.tag("trak")
      tkhd(0, 0L, 0L)
    }
    w.be32(trakSize); w.tag("trak")
    tkhd(version, wd, ht)
    w.be32(76L); w.tag("mdia")
    w.be32(68L); w.tag("minf")
    w.be32(60L); w.tag("stbl")
    w.be32(32L); w.tag("stsd")
    w.be32(0L); w.be32(1L) // version+flags, entry_count
    w.be32(16L); w.tag(codec); w.zeros(8) // first sample entry
    w.be32(20L); w.tag("stsz")
    w.be32(0L); w.be32(0L); w.be32(nf) // vf, sample_size, sample_count
    w.bytes
  }

  /** q352's payload: doc_id%5 → AVI / MP4 v0 / MP4 v1 / MP4 with a
    * leading audio trak / corrupt (odd: 30-byte AVI truncation; even:
    * an MP4 whose mvhd declares timescale 0).
    */
  def headerPayload(docId: Long): Array[Byte] = (docId % 5) match {
    case 0 => avi(docId)
    case 1 => mp4(docId, 0, audioTrak = false)
    case 2 => mp4(docId, 1, audioTrak = false)
    case 3 => mp4(docId, 0, audioTrak = true)
    case _ =>
      if (docId % 2 == 1) avi(docId).take(30)
      else {
        val b = mp4(docId, 0, audioTrak = false)
        // zero the BE32 timescale at mvhd payload offset 12:
        // 16 (ftyp) + 8 (moov hdr) + 8 (mvhd hdr) + 12 = 44
        java.util.Arrays.fill(b, 44, 48, 0.toByte)
        b
      }
  }

  /** q353/q356's payload: the DIB AVI for every doc, with the %10==7
    * slice truncated mid-movi (240 bytes — 8 bytes into the FIRST
    * frame's pixel data, past all headers) → NULL, loud not wrong.
    */
  def framePayload(docId: Long): Array[Byte] = {
    val full = avi(docId)
    if (docId % 10 == 7) full.take(240) else full
  }

  /** A BMP STILL of the AVI's frame `f` — IDENTICAL pixels in a
    * byte-unequal container (different header layout entirely), so the
    * shared statsOf definition gives it the frame's exact dHash. The
    * cross-modal "this image appears in that video" construction.
    */
  def stillOfFrame(s: Long, f: Int): Array[Byte] = {
    val wd = aviWidth(s); val ht = aviHeight(s)
    val stride = (wd * 3 + 3) / 4 * 4
    val w = new W
    w.tag("BM"); w.le32(54L + ht.toLong * stride)
    w.le32(0L); w.le32(54L); w.le32(40L)
    w.le32(wd.toLong); w.le32(ht.toLong) // positive = bottom-up
    w.le16(1); w.le16(24)
    w.le32(0L); w.le32((ht * stride).toLong)
    w.zeros(16)
    var row = ht - 1
    while (row >= 0) {
      var x = 0
      while (x < wd) {
        val p = pix(x, row, f, s)
        w.u8(p * 5 % 256); w.u8(p * 3 % 256); w.u8(p)
        x += 1
      }
      w.zeros(stride - wd * 3)
      row -= 1
    }
    w.bytes
  }

  /** Matroska / WebM (the q358 fixture — spec-true EBML): header with
    * DocType, Segment with Info (TimestampScale as a 4-byte uint,
    * Duration as an IEEE float — 32-bit on even s, 64-bit on odd; the
    * value is an INTEGER d < 2^24, exact in both widths, so the oracle
    * replays duration_ms = d · (s%4+1) with plain arithmetic) and
    * Tracks (an A_OPUS audio entry FIRST on the s%3==0 slice — the
    * walk must skip it — then the video entry: type 1, CodecID by
    * s%3, PixelWidth/Height as 2-byte uints). All element sizes are
    * 1-byte varints except the Segment's (2-byte), so n_bytes is
    * doc_id arithmetic. Shared arithmetic:
    *   w = s % 1800 + 2, h = (s·7) % 1000 + 2
    *   ts = (s % 4 + 1) · 10⁶ → duration_ms = d · (s % 4 + 1)
    *   d = s % 5000 + 100
    *   doctype = s % 4 < 2 ? "webm" : "matroska"
    *   codec = ["V_VP9", "V_AV1", "V_MPEG4/ISO/AVC"][s % 3]
    */
  def mkv(s: Long): Array[Byte] = {
    val wd = s % 1800 + 2
    val ht = (s * 7) % 1000 + 2
    val tsMul = (s % 4 + 1)
    val d = s % 5000 + 100
    val doctype = if (s % 4 < 2) "webm" else "matroska"
    val codec = Seq("V_VP9", "V_AV1", "V_MPEG4/ISO/AVC")((s % 3).toInt)
    val audio = s % 3 == 0
    val dlen = if (s % 2 == 0) 4 else 8
    val w = new W
    def sz1(v: Int): Unit = w.u8(0x80 | v) // 1-byte EBML size
    // EBML header: DocType only
    w.u8(0x1A); w.u8(0x45); w.u8(0xDF); w.u8(0xA3)
    sz1(2 + 1 + doctype.length)
    w.u8(0x42); w.u8(0x82); sz1(doctype.length); w.tag(doctype)
    // Segment (2-byte size)
    val infoLen = 8 + 3 + dlen
    val clen = codec.length
    val trkLen = (if (audio) 13 else 0) + 17 + clen
    val segSize = 5 + infoLen + 5 + trkLen
    w.u8(0x18); w.u8(0x53); w.u8(0x80); w.u8(0x67)
    w.u8(0x40 | (segSize >> 8)); w.u8(segSize & 0xFF)
    // Info
    w.u8(0x15); w.u8(0x49); w.u8(0xA9); w.u8(0x66); sz1(infoLen)
    w.u8(0x2A); w.u8(0xD7); w.u8(0xB1); sz1(4); w.be32(tsMul * 1000000L)
    w.u8(0x44); w.u8(0x89); sz1(dlen)
    if (dlen == 4) w.be32(java.lang.Float.floatToIntBits(d.toFloat) & 0xFFFFFFFFL)
    else w.be64(java.lang.Double.doubleToLongBits(d.toDouble))
    // Tracks
    w.u8(0x16); w.u8(0x54); w.u8(0xAE); w.u8(0x6B); sz1(trkLen)
    if (audio) { // TrackEntry the walk must skip: type 2, A_OPUS
      w.u8(0xAE); sz1(11)
      w.u8(0x83); sz1(1); w.u8(2)
      w.u8(0x86); sz1(6); w.tag("A_OPUS")
    }
    w.u8(0xAE); sz1(15 + clen)
    w.u8(0x83); sz1(1); w.u8(1) // TrackType video
    w.u8(0x86); sz1(clen); w.tag(codec)
    w.u8(0xE0); sz1(8) // Video
    w.u8(0xB0); sz1(2); w.u8((wd >> 8).toInt); w.u8(wd.toInt)
    w.u8(0xBA); sz1(2); w.u8((ht >> 8).toInt); w.u8(ht.toInt)
    w.bytes
  }

  /** q358's payload: the Matroska fixture, truncated to 20 bytes
    * (mid-Segment-header) on the %7==5 slice → NULL.
    */
  def mkvPayload(docId: Long): Array[Byte] = {
    val full = mkv(docId)
    if (docId % 7 == 5) full.take(20) else full
  }

  /** q357's cross-modal corpus: even ids are DIB AVIs (the video
    * corpus; %10==4 truncated to 240 bytes → no frames), odd ids are
    * BMP stills rendering frame f* = (id−1)/2 mod F of their
    * PREDECESSOR video's pixels — each still MUST match exactly that
    * (video, frame) at Hamming 0 when the video decodes.
    */
  def crossModalPayload(docId: Long): Array[Byte] =
    if (docId % 2 == 0) {
      val full = avi(docId)
      if (docId % 10 == 4) full.take(240) else full
    } else {
      val e = docId - 1
      stillOfFrame(e, ((e / 2) % aviFrames(e)).toInt)
    }
}
