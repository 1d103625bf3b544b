package graft

import graft.expressions.PcmKernel

/** The PCM sample-stats kernel against hand-laid WAV bytes (the
  * MediaHeaderSpec discipline): exact integer statistics out of
  * spec-true layouts, NULL out of every corruption — never a wrong
  * number.
  */
class PcmKernelSpec extends SparkSpec {

  private def wav(rate: Int, ch: Int, samples: Seq[Int],
                  declaredLen: Option[Int] = None): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
    val dataLen = declaredLen.getOrElse(samples.length * 2)
    out.write("RIFF".getBytes, 0, 4); le32(36 + dataLen)
    out.write("WAVE".getBytes, 0, 4)
    out.write("fmt ".getBytes, 0, 4); le32(16)
    le16(1); le16(ch); le32(rate); le32(rate * ch * 2); le16(ch * 2); le16(16)
    out.write("data".getBytes, 0, 4); le32(dataLen)
    samples.foreach(s => le16(s & 0xFFFF))
    out.toByteArray
  }

  private def parsed(b: Array[Byte]): Option[Seq[Long]] =
    Option(PcmKernel.parse(b)).map(r => (1 to 10).map(r.getLong))

  private def codecOf(b: Array[Byte]): Option[String] =
    Option(PcmKernel.parse(b)).map(_.getString(0))

  test("exact stats: energy, clipping rails, edge silence runs") {
    // 8 samples: 2 leading silent, ramp, a +rail and a -rail, 2
    // trailing silent (7 and -200 are both under the ±256 threshold)
    val s = Seq(0, 100, 5000, -6000, 32767, -32768, 7, -200)
    val got = parsed(wav(16000, 1, s)).get
    val sum = s.map(_.toLong).sum
    val sq = s.map(v => v.toLong * v).sum
    assert(got === Seq(16000L, 1L, 16L, 8L, 8L * 1000 / 16000,
      sum, sq, 2L, 2L, 2L))
    // stereo: n_samples across channels, duration from FRAMES
    val st = parsed(wav(8000, 2, Seq(1000, 1000, -1000, -1000))).get
    assert((st(3), st(4)) === ((4L, 2L * 1000 / 8000)))
    // all-silent: lead == trail == n
    val sil = parsed(wav(44100, 1, Seq(0, 5, -256, 256))).get
    assert((sil(8), sil(9)) === ((4L, 4L)))
    // threshold edge: 257 is NOT silent
    val edge = parsed(wav(44100, 1, Seq(257, 0))).get
    assert((edge(8), edge(9)) === ((0L, 1L)))
  }

  test("corruptions are NULL: non-PCM, wrong bits, truncation, misalignment") {
    val good = wav(16000, 1, Seq(1, 2, 3, 4))
    assert(parsed(good).isDefined)
    // fmt tag != 1 (e.g. IEEE float 3)
    val f3 = good.clone(); f3(20) = 3; assert(parsed(f3).isEmpty)
    // bits != 16
    val b8 = good.clone(); b8(34) = 8; assert(parsed(b8).isEmpty)
    // declared data longer than present (mid-data truncation)
    assert(parsed(wav(16000, 1, Seq(1, 2), declaredLen = Some(12))).isEmpty)
    // stereo data not frame-aligned (3 samples)
    assert(parsed(wav(16000, 2, Seq(1, 2, 3))).isEmpty)
    // zero rate / channels
    val zr = good.clone(); (24 to 27).foreach(zr(_) = 0)
    assert(parsed(zr).isEmpty)
    // every truncation prefix: NULL or the exact full answer
    val want = parsed(good)
    (0 until good.length).foreach { n =>
      val got = parsed(good.take(n))
      assert(got.isEmpty || got == want, s"prefix $n: WRONG $got")
    }
    assert(parsed("not audio at all".getBytes).isEmpty)
    assert(parsed(null).isEmpty)
  }

  private def g711wav(tag: Int, rate: Int, codes: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
    out.write("RIFF".getBytes, 0, 4); le32(36 + codes.length)
    out.write("WAVE".getBytes, 0, 4)
    out.write("fmt ".getBytes, 0, 4); le32(16)
    le16(tag); le16(1); le32(rate); le32(rate); le16(1); le16(8)
    out.write("data".getBytes, 0, 4); le32(codes.length)
    codes.foreach(out.write)
    out.toByteArray
  }

  test("G.711 mu-law / A-law expand by the public reference arithmetic") {
    // spot values pinned to the CCITT/Sun reference tables
    assert(PcmKernel.ulaw2linear(0xFF) === 0) // +0
    assert(PcmKernel.ulaw2linear(0x7F) === 0) // -0
    assert(PcmKernel.ulaw2linear(0x80) === 32124) // full-scale +
    assert(PcmKernel.ulaw2linear(0x00) === -32124) // full-scale -
    assert(PcmKernel.ulaw2linear(0xFE) === 8) // smallest nonzero +
    assert(PcmKernel.alaw2linear(0xD5) === 8) // A-law has no zero
    assert(PcmKernel.alaw2linear(0x55) === -8)
    assert(PcmKernel.alaw2linear(0xAA) === 32256) // full-scale +
    assert(PcmKernel.alaw2linear(0x2A) === -32256)
    // a mu-law WAV: stats over the DECODED linear values, clip rails
    // at the mu-law full scale
    val mu = parsed(g711wav(7, 8000, Seq(0xFF, 0x80, 0x00, 0xFE))).get
    val vals = Seq(0L, 32124L, -32124L, 8L)
    // lead run: the +0 sample; trail run: the decoded 8 (|8| <= 256)
    assert(mu === Seq(8000L, 1L, 8L, 4L, 4L * 1000 / 8000,
      vals.sum, vals.map(v => v * v).sum, 2L, 1L, 1L))
    assert(codecOf(g711wav(7, 8000, Seq(0xFF))).get === "ulaw")
    // an A-law WAV: +8/-8 are SILENT (<=256), full scale clips
    val al = parsed(g711wav(6, 8000, Seq(0xD5, 0xAA, 0x55))).get
    assert(al === Seq(8000L, 1L, 8L, 3L, 0L,
      8L + 32256L - 8L, 8L * 8 + 32256L * 32256L + 8L * 8, 1L, 1L, 1L))
    assert(codecOf(g711wav(6, 8000, Seq(0xD5))).get === "alaw")
    // G.711 with a wrong bits field is corrupt, as is an unknown tag
    val badBits = g711wav(7, 8000, Seq(0xFF)); badBits(34) = 16
    assert(parsed(badBits).isEmpty)
    assert(parsed(g711wav(2, 8000, Seq(0xFF))).isEmpty) // ADPCM: no
    // odd-length mu-law mono data IS frame-aligned (1 byte/frame)
    assert(parsed(g711wav(7, 8000, Seq(1, 2, 3))).isDefined)
  }

  test("pcm_stats expression and a JUNK chunk before fmt/data") {
    // JUNK chunk first: the walk must skip it by size (incl. odd-size
    // padding) and still find fmt and data
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
    out.write("RIFF".getBytes, 0, 4); le32(0)
    out.write("WAVE".getBytes, 0, 4)
    out.write("JUNK".getBytes, 0, 4); le32(3); out.write(Array[Byte](1, 2, 3), 0, 3)
    out.write(0) // odd-size chunks pad to even
    out.write("fmt ".getBytes, 0, 4); le32(16)
    le16(1); le16(1); le32(8000); le32(16000); le16(2); le16(16)
    out.write("data".getBytes, 0, 4); le32(4); le16(300 & 0xFFFF); le16(-300 & 0xFFFF)
    val got = parsed(out.toByteArray).get
    assert(got === Seq(8000L, 1L, 16L, 2L, 0L, 0L, 180000L, 0L, 0L, 0L))
    // expression surface
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, wav(16000, 1, Seq(1000, -1000))),
        (2L, Array[Byte](1, 2, 3)))
      .toDF("id", "p")
      .select(col("id"), graft.functions.pcmStats(col("p")).as("s"))
      .select(col("id"), col("s.n_samples"), col("s.sq_sum"))
      .orderBy("id").collect()
    assert(df(0).getLong(1) === 2L && df(0).getLong(2) === 2000000L)
    assert(df(1).isNullAt(1))
  }

  test("IMA ADPCM: hand-pinned steps, PCM transcode identity, corrupt NULLs") {
    def ima(blocks: Seq[(Int, Int, Seq[Int])], rate: Int = 8000,
            blockAlign: Int = 16,
            truncate: Int = 0): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
      val dataLen = blocks.map(b => 4 + b._3.length).sum
      out.write("RIFF".getBytes, 0, 4); le32(4 + 28 + 8 + dataLen)
      out.write("WAVE".getBytes, 0, 4)
      out.write("fmt ".getBytes, 0, 4); le32(20)
      le16(0x11); le16(1); le32(rate); le32(rate)
      le16(blockAlign); le16(4); le16(2)
      le16(1 + (blockAlign - 4) * 2)
      out.write("data".getBytes, 0, 4); le32(dataLen)
      blocks.foreach { case (pred0, idx0, bytes) =>
        le16(pred0 & 0xFFFF); out.write(idx0); out.write(0)
        bytes.foreach(out.write)
      }
      val full = out.toByteArray
      if (truncate > 0) full.take(full.length - truncate) else full
    }
    // hand-pinned nibble walk from (pred 0, index 0, step 7):
    //   nib 4 (bit2): diff = 0+7 = 7 → pred 7, index 0+2 = 2 (step 9)
    //   nib 0: diff = 9>>3 = 1 → pred 8, index 2-1 = 1
    // byte 0x04 packs them low-first; the header emits sample 0 = 0
    val b1 = ima(Seq((0, 0, Seq(0x04) ++ Seq.fill(11)(0x00))))
    val r1 = Option(PcmKernel.parse(b1)).get
    assert(r1.getString(0) === "ima_adpcm")
    assert(r1.getLong(4) === 25L) // 1 header + 12 bytes × 2 nibbles
    // replay the full block with the documented recursion and compare
    // the aggregate statistics exactly
    def replay(pred0: Int, idx0: Int, bytes: Seq[Int]): Seq[Int] = {
      var pred = pred0; var idx = idx0
      pred0 +: bytes.flatMap { byte =>
        Seq(byte & 0x0F, byte >> 4).map { nib =>
          val step = PcmKernel.ImaStep(idx)
          var diff = step >> 3
          if ((nib & 1) != 0) diff += step >> 2
          if ((nib & 2) != 0) diff += step >> 1
          if ((nib & 4) != 0) diff += step
          pred = math.max(-32768,
            math.min(32767, if ((nib & 8) != 0) pred - diff else pred + diff))
          idx = math.max(0, math.min(88, idx + PcmKernel.ImaIndex(nib & 7)))
          pred
        }
      }
    }
    val bytes2 = (0 until 12).map(k => (k * 37 + 11) % 256)
    val blocks2 = Seq((1234, 40, bytes2), (-2000, 88, bytes2.reverse),
      (-31000, 0, bytes2.map(b => 255 - b)), // clamp exercise at the rails
      (500, 3, (0 until 6).map(k => (k * 91 + 5) % 256))) // partial tail
    val b2 = ima(blocks2)
    val samples2 = blocks2.flatMap { case (p, i, bs) => replay(p, i, bs) }
    val r2 = Option(PcmKernel.parse(b2)).get
    assert(r2.getLong(4) === samples2.length.toLong)
    assert(r2.getLong(6) === samples2.map(_.toLong).sum)
    assert(r2.getLong(7) === samples2.map(v => v.toLong * v).sum)
    // ...and the SAME samples shipped as a PCM-16 WAV give identical
    // stats and envelope hash (the shared-View transcode identity the
    // dedup tier rests on)
    val pcmTwin = wav(8000, 1, samples2)
    val rt = Option(PcmKernel.parse(pcmTwin)).get
    assert((6 to 10).forall(i => rt.getLong(i) === r2.getLong(i)))
    assert(PcmKernel.envelopeHash(b2) != null &&
      PcmKernel.envelopeHash(b2) === PcmKernel.envelopeHash(pcmTwin))
    // corrupt: step index past the table, truncation, header-only block
    assert(PcmKernel.parse(ima(Seq((0, 89, Seq(0x04))))) == null)
    assert(PcmKernel.parse(ima(blocks2, truncate = 3)) == null)
    assert(PcmKernel.parse(ima(Seq((0, 0, Seq.empty)))) == null)
    // a MONO-laid-out payload relabeled stereo is malformed (its
    // 5-byte block cannot hold the two 4-byte channel headers) — NULL,
    // never wrong interleaving
    val st = ima(Seq((0, 0, Seq(0x04))))
    st(22) = 2 // channels field
    assert(PcmKernel.parse(st) == null)
  }

  test("stereo IMA ADPCM: channel-chunk interleave, transcode identity, corrupt NULLs") {
    // block: 4-byte L header, 4-byte R header, then alternating 4-byte
    // channel chunks
    def imaSt(blocks: Seq[(Int, Int, Int, Int, Seq[Int])],
              blockAlign: Int = 24, truncate: Int = 0): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
      val dataLen = blocks.map(b => 8 + b._5.length).sum
      out.write("RIFF".getBytes, 0, 4); le32(4 + 28 + 8 + dataLen)
      out.write("WAVE".getBytes, 0, 4)
      out.write("fmt ".getBytes, 0, 4); le32(20)
      le16(0x11); le16(2); le32(8000); le32(8000)
      le16(blockAlign); le16(4); le16(2)
      le16(1 + (blockAlign - 8)) // samples per block per channel
      out.write("data".getBytes, 0, 4); le32(dataLen)
      blocks.foreach { case (pl, il, pr, ir, bytes) =>
        le16(pl & 0xFFFF); out.write(il); out.write(0)
        le16(pr & 0xFFFF); out.write(ir); out.write(0)
        bytes.foreach(out.write)
      }
      val full = out.toByteArray
      if (truncate > 0) full.take(full.length - truncate) else full
    }
    // independent per-channel replay (the mono recursion, de-chunked)
    def lane(pred0: Int, idx0: Int, bytes: Seq[Int]): Seq[Int] = {
      var pred = pred0; var idx = idx0
      pred0 +: bytes.flatMap { byte =>
        Seq(byte & 0x0F, byte >> 4).map { nib =>
          val step = PcmKernel.ImaStep(idx)
          var diff = step >> 3
          if ((nib & 1) != 0) diff += step >> 2
          if ((nib & 2) != 0) diff += step >> 1
          if ((nib & 4) != 0) diff += step
          pred = math.max(-32768,
            math.min(32767, if ((nib & 8) != 0) pred - diff else pred + diff))
          idx = math.max(0, math.min(88, idx + PcmKernel.ImaIndex(nib & 7)))
          pred
        }
      }
    }
    val dataBytes = (0 until 16).map(k => (k * 53 + 9) % 256) // 2 chunk pairs
    val blocks = Seq((900, 10, -1200, 30, dataBytes),
      (-5000, 0, 7000, 88, dataBytes.reverse))
    val b = imaSt(blocks)
    val r = Option(PcmKernel.parse(b)).get
    assert(r.getString(0) === "ima_adpcm")
    assert(r.getLong(2) === 2L) // channels
    // interleave the two replayed lanes frame-by-frame per block
    val samples = blocks.flatMap { case (pl, il, pr, ir, bytes) =>
      val lBytes = bytes.grouped(8).flatMap(_.take(4)).toSeq
      val rBytes = bytes.grouped(8).flatMap(_.drop(4)).toSeq
      lane(pl, il, lBytes).zip(lane(pr, ir, rBytes))
        .flatMap { case (l, rr) => Seq(l, rr) }
    }
    assert(r.getLong(4) === samples.length.toLong)
    assert(r.getLong(6) === samples.map(_.toLong).sum)
    assert(r.getLong(7) === samples.map(v => v.toLong * v).sum)
    // duration uses frames (n / ch)
    assert(r.getLong(5) === samples.length / 2 * 1000L / 8000L)
    // shared-View transcode identity: the same interleaved samples as
    // a stereo PCM-16 WAV give identical stats and envelope hash
    val pcmTwin = wav(8000, 2, samples)
    val rt = Option(PcmKernel.parse(pcmTwin)).get
    assert((6 to 10).forall(i => rt.getLong(i) === r.getLong(i)))
    assert(PcmKernel.envelopeHash(b) != null &&
      PcmKernel.envelopeHash(b) === PcmKernel.envelopeHash(pcmTwin))
    // corrupt: right-channel step index past the table; a dangling
    // left chunk with no right partner; mid-data truncation
    assert(PcmKernel.parse(imaSt(Seq((0, 0, 0, 89, dataBytes)))) == null)
    assert(PcmKernel.parse(imaSt(Seq((0, 0, 0, 0, dataBytes.take(4))),
      blockAlign = 24)) == null)
    assert(PcmKernel.parse(imaSt(blocks, truncate = 3)) == null)
  }

  test("MS-ADPCM: public adaptation arithmetic, mono + stereo, transcode identity, corrupt NULLs") {
    def ms(ch: Int, blocks: Seq[(Seq[Int], Seq[Int], Seq[Int], Seq[Int], Seq[Int])],
           blockAlign: Int, truncate: Int = 0): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
      val dataLen = blocks.map(b => 7 * ch + b._5.length).sum
      out.write("RIFF".getBytes, 0, 4); le32(4 + 28 + 8 + dataLen)
      out.write("WAVE".getBytes, 0, 4)
      out.write("fmt ".getBytes, 0, 4); le32(20)
      le16(0x02); le16(ch); le32(11025); le32(11025)
      le16(blockAlign); le16(4); le16(2); le16(0)
      out.write("data".getBytes, 0, 4); le32(dataLen)
      blocks.foreach { case (preds, deltas, s1s, s2s, bytes) =>
        preds.foreach(out.write)
        deltas.foreach(d => le16(d & 0xFFFF))
        s1s.foreach(s => le16(s & 0xFFFF))
        s2s.foreach(s => le16(s & 0xFFFF))
        bytes.foreach(out.write)
      }
      val full = out.toByteArray
      if (truncate > 0) full.take(full.length - truncate) else full
    }
    // independent replay of the documented arithmetic
    def replay(ch: Int,
               blocks: Seq[(Seq[Int], Seq[Int], Seq[Int], Seq[Int], Seq[Int])]): Seq[Int] =
      blocks.flatMap { case (preds, deltas0, s1s, s2s, bytes) =>
        val c1 = preds.map(PcmKernel.MsCoef1)
        val c2 = preds.map(PcmKernel.MsCoef2)
        val delta = deltas0.map(d => math.max(16, d.toShort.toInt)).toArray
        val s1 = s1s.map(_.toShort.toInt).toArray
        val s2 = s2s.map(_.toShort.toInt).toArray
        val head = s2.toSeq ++ s1.toSeq
        val nibs = bytes.flatMap(byte => Seq(byte >> 4, byte & 0x0F))
        head ++ nibs.zipWithIndex.map { case (nib, i) =>
          val c = i % ch
          val sNib = if (nib >= 8) nib - 16 else nib
          var pred = (s1(c) * c1(c) + s2(c) * c2(c)) / 256
          pred = math.max(-32768, math.min(32767, pred + sNib * delta(c)))
          s2(c) = s1(c); s1(c) = pred
          delta(c) = math.max(16,
            math.min(32767, PcmKernel.MsAdapt(nib) * delta(c) / 256))
          pred
        }
      }
    // mono: two blocks exercising all 7 predictors-worth of state and
    // a partial final block
    val monoBytes = (0 until 12).map(k => (k * 71 + 13) % 256)
    val monoBlocks = Seq(
      (Seq(0), Seq(32), Seq(1000), Seq(-800), monoBytes),
      (Seq(5), Seq(700), Seq(-30000), Seq(31000), monoBytes.reverse),
      (Seq(3), Seq(16), Seq(40), Seq(-40), monoBytes.take(6))) // partial
    val mb = ms(1, monoBlocks, blockAlign = 7 + 12)
    val mr = Option(PcmKernel.parse(mb)).get
    assert(mr.getString(0) === "ms_adpcm")
    val monoSamples = replay(1, monoBlocks)
    assert(mr.getLong(4) === monoSamples.length.toLong)
    assert(mr.getLong(6) === monoSamples.map(_.toLong).sum)
    assert(mr.getLong(7) === monoSamples.map(v => v.toLong * v).sum)
    val monoTwin = wav(11025, 1, monoSamples)
    val mt = Option(PcmKernel.parse(monoTwin)).get
    assert((6 to 10).forall(i => mt.getLong(i) === mr.getLong(i)))
    assert(PcmKernel.envelopeHash(mb) != null &&
      PcmKernel.envelopeHash(mb) === PcmKernel.envelopeHash(monoTwin))
    // stereo: high nibble = left, low = right, per-channel state
    val stBytes = (0 until 16).map(k => (k * 37 + 200) % 256)
    val stBlocks = Seq(
      (Seq(1, 4), Seq(50, 90), Seq(500, -500), Seq(250, -250), stBytes),
      (Seq(6, 2), Seq(17, 1), Seq(-12345, 23456), Seq(100, -100),
        stBytes.reverse))
    val sb = ms(2, stBlocks, blockAlign = 14 + 16)
    val sr = Option(PcmKernel.parse(sb)).get
    assert(sr.getLong(2) === 2L)
    val stSamples = replay(2, stBlocks)
    assert(sr.getLong(4) === stSamples.length.toLong)
    assert(sr.getLong(6) === stSamples.map(_.toLong).sum)
    assert(sr.getLong(7) === stSamples.map(v => v.toLong * v).sum)
    val stTwin = wav(11025, 2, stSamples)
    assert(PcmKernel.envelopeHash(sb) != null &&
      PcmKernel.envelopeHash(sb) === PcmKernel.envelopeHash(stTwin))
    // corrupt: bPredictor past the 7-entry tables; header-short final
    // block; mid-data truncation
    assert(PcmKernel.parse(ms(1,
      Seq((Seq(7), Seq(32), Seq(0), Seq(0), monoBytes)), 19)) == null)
    assert(PcmKernel.parse(ms(2, stBlocks, blockAlign = 24,
      truncate = 11)) == null) // leaves a 13-byte block < 14-byte header
    assert(PcmKernel.parse(ms(1, monoBlocks, blockAlign = 19,
      truncate = 3)) == null)
  }

  test("FLAC fixed-predictor subset: all four subframe kinds, transcode identity, corrupt NULLs") {
    // replay the fixture's documented sample formulas independently
    def frameSamples(doc: Long, f: Int, n: Int): Seq[Int] = ((doc + f) % 4).toInt match {
      case 0 => Seq.fill(n)(((doc * 11 + f * 17) % 4000 - 2000).toInt)
      case 1 => (0 until n).map(i => ((doc * 3 + i * 257 + f * 29) % 4096 - 2048).toInt)
      case 2 =>
        var s = ((doc + f * 31) % 1000 - 500).toInt
        s +: (1 until n).map { i =>
          s += ((doc + i * 7 + f * 13) % 16 - 8).toInt; s
        }
      case _ =>
        val s0 = ((doc + f * 37) % 600 - 300).toInt
        val s1 = s0 + ((doc + f) % 20 - 10).toInt
        var a = s0; var b = s1
        Seq(s0, s1) ++ (2 until n).map { i =>
          val s = 2 * b - a + ((doc + i * 7 + f * 13) % 5 - 2).toInt
          a = b; b = s; s
        }
    }
    for (doc <- Seq(0L, 1L, 2L, 4L, 5L, 6L, 10L, 15L, 21L, 26L)) {
      val p = graft.queries.AudioFixtures.flacPayload(doc)
      val r = Option(PcmKernel.parse(p)).getOrElse(fail(s"doc $doc NULL"))
      val n1 = 2 * (doc % 20).toInt + 40
      val n2 = (doc % 30).toInt + 30
      val samples = frameSamples(doc, 0, n1) ++ frameSamples(doc, 1, n2)
      assert(r.getString(0) === "flac", s"doc $doc")
      assert(r.getLong(1) === 8000L + (doc % 5) * 4000)
      assert(r.getLong(2) === 1L)
      assert(r.getLong(4) === samples.length.toLong, s"doc $doc")
      assert(r.getLong(6) === samples.map(_.toLong).sum, s"doc $doc")
      assert(r.getLong(7) === samples.map(v => v.toLong * v).sum, s"doc $doc")
      // transcode identity: the SAME samples as PCM-16 WAV — identical
      // stats and envelope hash (the compression-transparency contract
      // the audio dedup tier needs for archival corpora)
      val twin = wav(r.getLong(1).toInt, 1, samples)
      val rt = Option(PcmKernel.parse(twin)).get
      assert((6 to 10).forall(i => rt.getLong(i) === r.getLong(i)), s"doc $doc")
      assert(PcmKernel.envelopeHash(p) != null &&
        PcmKernel.envelopeHash(p) === PcmKernel.envelopeHash(twin))
    }
    // corruption plants: LPC subframe (out of subset), truncation
    assert(PcmKernel.parse(graft.queries.AudioFixtures.flacPayload(3L)) == null)
    assert(PcmKernel.parse(graft.queries.AudioFixtures.flacPayload(7L)) == null)
    // every truncation prefix of a healthy payload: NULL, never wrong
    val healthy = graft.queries.AudioFixtures.flacPayload(4L)
    val want = Option(PcmKernel.parse(healthy)).get.getLong(7)
    (0 until healthy.length).foreach { n =>
      val got = Option(PcmKernel.parse(healthy.take(n)))
      assert(got.isEmpty || got.get.getLong(7) == want, s"prefix $n")
    }
  }

  test("FLAC decoder corners: escape partitions, wasted bits, out-of-subset NULLs") {
    // test-local bit writer (independent of both fixture and kernel)
    class BW {
      val out = new java.io.ByteArrayOutputStream()
      var acc = 0; var nb = 0
      def put(v: Long, n: Int): Unit = {
        var i = n - 1
        while (i >= 0) {
          acc = (acc << 1) | ((v >> i) & 1L).toInt; nb += 1
          if (nb == 8) { out.write(acc); acc = 0; nb = 0 }
          i -= 1
        }
      }
      def align(): Unit = if (nb > 0) put(0L, 8 - nb)
      def bytes: Array[Byte] = { align(); out.toByteArray }
    }
    def stream(total: Int, rate: Int = 8000)(body: BW => Unit): Array[Byte] = {
      val w = new BW
      "fLaC".foreach(c => w.put(c.toLong, 8))
      w.put(1L, 1); w.put(0L, 7); w.put(34L, 24)
      w.put(total.toLong, 16); w.put(total.toLong, 16)
      w.put(0L, 24); w.put(0L, 24)
      w.put(rate.toLong, 20); w.put(0L, 3); w.put(15L, 5)
      w.put(total.toLong, 36)
      (0 until 16).foreach(_ => w.put(0L, 8))
      body(w)
      w.bytes
    }
    def frameHeader(w: BW, n: Int): Unit = {
      w.put(0x3FFEL, 14); w.put(0L, 2)
      w.put(6L, 4); w.put(0L, 4); w.put(0L, 4); w.put(4L, 3); w.put(0L, 1)
      w.put(0L, 8); w.put((n - 1).toLong, 8); w.put(0L, 8)
    }
    // ESCAPE partition: order-0 fixed subframe, po 0, param 15 →
    // 5-bit raw residuals; raw width 6 encodes values −32..31
    val esc = stream(4) { w =>
      frameHeader(w, 4)
      w.put(0L, 1); w.put(8L, 6); w.put(0L, 1) // fixed order 0
      w.put(0L, 2); w.put(0L, 4) // rice4, po 0
      w.put(15L, 4) // escape
      w.put(6L, 5) // raw width 6
      Seq(-32L, 31L, -1L, 0L).foreach(v => w.put(v & 0x3FL, 6))
      w.align(); w.put(0L, 16)
    }
    val er = Option(PcmKernel.parse(esc)).get
    assert(er.getLong(4) === 4L)
    assert(er.getLong(6) === (-32L + 31 - 1 + 0))
    assert(er.getLong(7) === (32L * 32 + 31 * 31 + 1))
    // WASTED BITS: constant subframe, 2 wasted bits (unary "01" = 2),
    // 14-bit value 100 → samples 100 << 2 = 400
    val wasted = stream(3) { w =>
      frameHeader(w, 3)
      w.put(0L, 1); w.put(0L, 6); w.put(1L, 1) // wasted flag
      w.put(1L, 2) // unary: one 0 then 1 → count 2
      w.put(100L, 14) // bps − wasted = 14 bits
      w.align(); w.put(0L, 16)
    }
    val wr = Option(PcmKernel.parse(wasted)).get
    assert(wr.getLong(4) === 3L && wr.getLong(6) === 1200L)
    // a MONO stream claiming mid/side (decorrelation needs 2 declared
    // channels) is corrupt; 8-bit bps is out of subset
    val midSide = stream(4) { w =>
      w.put(0x3FFEL, 14); w.put(0L, 2)
      w.put(6L, 4); w.put(0L, 4); w.put(10L, 4); w.put(4L, 3); w.put(0L, 1)
      w.put(0L, 8); w.put(3L, 8); w.put(0L, 8)
    }
    assert(PcmKernel.parse(midSide) == null)
    val bps8 = {
      val w = new BW
      "fLaC".foreach(c => w.put(c.toLong, 8))
      w.put(1L, 1); w.put(0L, 7); w.put(34L, 24)
      w.put(4L, 16); w.put(4L, 16); w.put(0L, 24); w.put(0L, 24)
      w.put(8000L, 20); w.put(0L, 3); w.put(7L, 5) // bps 8
      w.put(4L, 36)
      (0 until 16).foreach(_ => w.put(0L, 8))
      w.bytes
    }
    assert(PcmKernel.parse(bps8) == null)
  }

  test("FLAC stereo decorrelation: all four assignments reconstruct exact L/R") {
    // the fixture's decoded output must be the ORIGINAL L/R signals
    // for every assignment — decorrelation is lossless by construction
    def lr(doc: Long, f: Int, n: Int): Seq[Int] =
      (0 until n).flatMap { i =>
        Seq(((doc * 3 + i * 257 + f * 71) % 3000 - 1500).toInt,
          ((doc * 5 + i * 193 + f * 101) % 3000 - 1500).toInt)
      }
    for (doc <- Seq(0L, 1L, 2L, 4L, 5L, 6L, 10L, 11L, 15L)) { // %4 covers all
      val p = graft.queries.AudioFixtures.flacStereoPayload(doc)
      val r = Option(PcmKernel.parse(p))
        .getOrElse(fail(s"doc $doc (assignment ${doc % 4}) NULL"))
      val n1 = (doc % 40).toInt + 40
      val n2 = (doc % 20).toInt + 33
      val samples = lr(doc, 0, n1) ++ lr(doc, 1, n2)
      assert(r.getString(0) === "flac")
      assert(r.getLong(2) === 2L)
      assert(r.getLong(4) === samples.length.toLong, s"doc $doc")
      assert(r.getLong(6) === samples.map(_.toLong).sum, s"doc $doc")
      assert(r.getLong(7) === samples.map(v => v.toLong * v).sum, s"doc $doc")
      // transcode identity against the interleaved stereo PCM-16 WAV
      val twin = wav(r.getLong(1).toInt, 2, samples)
      assert(PcmKernel.envelopeHash(p) != null &&
        PcmKernel.envelopeHash(p) === PcmKernel.envelopeHash(twin),
        s"doc $doc")
    }
    // reserved channel code 11 and truncation quarantine
    assert(PcmKernel.parse(graft.queries.AudioFixtures.flacStereoPayload(3L)) == null)
    assert(PcmKernel.parse(graft.queries.AudioFixtures.flacStereoPayload(7L)) == null)
  }

  test("envelope hash: exact bits, transcode/scaling invariance, short/corrupt NULL") {
    // deterministic pseudo-random samples, long enough for 65 windows
    val n = 130
    val samples = (0 until n).map(i => (i * 523 + 77) % 65536 - 32768)
    val h = PcmKernel.envelopeHash(wav(8000, 1, samples))
    assert(h != null)
    // brute-force replay of the documented definition
    val e = new Array[Long](65)
    samples.zipWithIndex.foreach { case (s, k) =>
      e((65L * k / n).toInt) += math.abs(s.toLong)
    }
    var expect = 0L
    (0 until 64).foreach(t => if (e(t + 1) > e(t)) expect |= 1L << t)
    assert(h.longValue === expect)
    // a G.711 stream and the PCM-16 transcode of its expansion decode
    // to the same linear samples → identical hash, byte-unequal files
    val codes = (0 until n).map(i => (i * 37 + 11) % 256)
    val ulaw = g711wav(7, 8000, codes)
    val pcm = wav(8000, 1, codes.map(PcmKernel.ulaw2linear))
    assert(!ulaw.sameElements(pcm))
    val hu = PcmKernel.envelopeHash(ulaw)
    assert(hu != null && hu === PcmKernel.envelopeHash(pcm))
    // uniform volume scaling preserves every envelope comparison
    val scaled = samples.map(s => math.max(-32768, math.min(32767, s / 2)))
    // halving CAN flip a comparison on near-ties via flooring; this
    // fixture's window energies are far apart, so the hash holds
    assert(PcmKernel.envelopeHash(wav(8000, 1, scaled)).longValue === expect)
    // fewer than 65 samples: an empty window has no energy to compare
    assert(PcmKernel.envelopeHash(wav(8000, 1, samples.take(64))) == null)
    assert(PcmKernel.envelopeHash(wav(8000, 1, samples.take(65))) != null)
    // corrupt framing NULLs exactly like parse
    assert(PcmKernel.envelopeHash(Array[Byte](1, 2, 3)) == null)
    assert(PcmKernel.envelopeHash(
      wav(8000, 1, samples, declaredLen = Some(2 * n + 2))) == null)
    // expression surface incl. the SQL registration
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = Seq((1L, wav(8000, 1, samples)), (2L, Array[Byte](9)))
      .toDF("id", "p")
      .select(col("id"), graft.functions.audioHash(col("p")).as("h"))
      .orderBy("id").collect()
    assert(got(0).getLong(1) === expect)
    assert(got(1).isNullAt(1))
  }
}
