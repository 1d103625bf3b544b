package graft.expressions

/** FLAC sample decode, SUBSET (round 17): constant / verbatim / FIXED
  * predictor subframes with Rice-coded residuals — the integer-exact
  * core of RFC 9639, which covers the archival-corpus files a
  * perceptual-audio-dedup pass most needs to see through (lossless
  * compression hides the payload from the envelope hash unless the
  * samples are reconstructed). Deliberately OUT of the subset — NULL,
  * loud not wrong: LPC subframes (type 32+), sample sizes other than
  * 16 bits, and unknown-total-sample streams. Decorrelated stereo
  * (left/side, right/side, mid/side) IS decoded: the side channel
  * carries one extra bit per sample and all three reconstructions
  * are integer-exact.
  *
  * What IS decoded (all pure integer arithmetic, oracle-replayable):
  *  - "fLaC" magic + metadata walk (STREAMINFO mandatory first; all
  *    other blocks skipped by declared length);
  *  - frame headers: 14-bit sync, blocking strategy, tabulated block
  *    size / sample rate codes incl. the 8/16-bit end-of-header
  *    forms, channel assignment 0..7 (independent channels only),
  *    the UTF-8-style coded frame/sample number (parsed and
  *    skipped), CRC-8 skipped — this kernel reads samples, it does
  *    not certify archives (the PixelKernel contract);
  *  - subframes: constant (one bps-bit value), verbatim (n raw
  *    samples), fixed orders 0..4 (warm-ups + residual), wasted-bits
  *    unary counts honored (samples shift left after reconstruction);
  *  - residuals: both Rice methods (4- and 5-bit parameters),
  *    partition orders 0..15 with the first partition short by the
  *    predictor order, ESCAPE partitions (5-bit raw width, width 0 =
  *    all-zero run), unary quotient + parameter-bit remainder,
  *    zigzag;
  *  - reconstruction: the RFC 9639 fixed predictors
  *    s[i] = {0, s1, 2s1−s2, 3s1−3s2+s3, 4s1−6s2+4s3−s4} + r[i]
  *    evaluated in Long (an adversarial residual stream cannot wrap),
  *    with any result outside int16 treated as corrupt;
  *  - frames decode sequentially (a FLAC frame's length is only known
  *    by decoding it) until STREAMINFO's total-sample count is
  *    reached; byte re-alignment + CRC-16 skip between frames.
  *
  * Decode-bomb guard: total samples capped at 2^25 (the 2^26-byte
  * PCM-16 equivalent of [[PcmKernel]]'s data guard).
  */
object FlacKernel {

  private val MaxSamples = 1 << 25

  /** Decoded stream: sample rate, channels, interleaved 16-bit
    * samples.
    */
  private[graft] final case class Decoded(rate: Long, ch: Int,
                                          samples: Array[Short])

  /** MSB-first bit reader with a sticky failure flag. */
  private final class Reader(b: Array[Byte]) {
    var pos = 0 // bit position
    var bad = false
    def bits(n: Int): Long = {
      var v = 0L
      var k = 0
      while (k < n) {
        val byteIdx = pos >>> 3
        if (byteIdx >= b.length) { bad = true; return 0L }
        v = (v << 1) | ((b(byteIdx) >> (7 - (pos & 7))) & 1)
        pos += 1
        k += 1
      }
      v
    }
    def signedBits(n: Int): Long = {
      val v = bits(n)
      if (n > 0 && (v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    def unary(): Int = {
      var q = 0
      while (!bad && bits(1) == 0L) {
        q += 1
        if (q > (1 << 20)) { bad = true; return 0 } // runaway guard
      }
      q
    }
    def alignByte(): Unit = if ((pos & 7) != 0) pos = (pos + 8) & ~7
    def skipBytes(n: Int): Unit = {
      val np = pos.toLong + 8L * n
      if (np > b.length.toLong * 8) bad = true else pos = np.toInt
    }
  }

  def decode(b: Array[Byte]): Decoded =
    try decodeImpl(b)
    catch { case scala.util.control.NonFatal(_) => null }

  private def decodeImpl(b: Array[Byte]): Decoded = {
    if (b == null || b.length < 42) return null
    if (!(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'))
      return null
    val r = new Reader(b)
    r.skipBytes(4)
    // metadata walk; STREAMINFO must come first
    var last = r.bits(1) == 1L
    if (r.bits(7) != 0L) return null // first block must be STREAMINFO
    if (r.bits(24) != 34L) return null
    r.skipBytes(2 + 2 + 3 + 3) // min/max blocksize (16b), framesize (24b)
    val rate = r.bits(20)
    val ch = (r.bits(3) + 1).toInt
    val bps = (r.bits(5) + 1).toInt
    val total = r.bits(36)
    r.skipBytes(16) // MD5
    if (r.bad || rate == 0L || bps != 16) return null
    if (total <= 0L || total > MaxSamples) return null
    while (!last && !r.bad) { // skip remaining metadata blocks
      last = r.bits(1) == 1L
      r.bits(7)
      val len = r.bits(24)
      r.skipBytes(len.toInt)
    }
    if (r.bad) return null
    val out = new Array[Short]((total * ch).toInt)
    var done = 0L
    while (done < total) {
      val n = decodeFrame(r, ch, bps, out, (done * ch).toInt,
        (total - done).toInt)
      if (n <= 0) return null
      done += n
    }
    new Decoded(rate, ch, out)
  }

  /** Decode one frame into `out` at `at`; returns the per-channel
    * sample count, or −1 on corruption / out-of-subset layouts.
    */
  private def decodeFrame(r: Reader, ch: Int, bps: Int,
                          out: Array[Short], at: Int,
                          remaining: Int): Int = {
    if (r.bits(14) != 0x3FFEL) return -1 // sync
    r.bits(1) // reserved
    r.bits(1) // blocking strategy
    val bsCode = r.bits(4).toInt
    val rateCode = r.bits(4).toInt
    val chanCode = r.bits(4).toInt
    val sizeCode = r.bits(3).toInt
    r.bits(1) // reserved
    // channel layouts: independent (code = ch − 1), or — for stereo —
    // the three decorrelated assignments (round 17): 8 left/side,
    // 9 right/side, 10 mid/side; the SIDE channel carries one extra
    // bit per sample and decorrelation is integer-exact
    val decor = chanCode >= 8 && chanCode <= 10
    if (decor && ch != 2) return -1
    if (!decor && chanCode != ch - 1) return -1
    if (!(sizeCode == 0 || sizeCode == 4)) return -1 // 16-bit subset
    // UTF-8-style coded number: leading-ones count gives the width
    val first = r.bits(8).toInt
    var extra = 0
    var mask = 0x80
    while ((first & mask) != 0 && extra < 7) { extra += 1; mask >>= 1 }
    if (extra == 1) return -1 // 0b10xxxxxx is a continuation, not a lead
    var k = if (extra == 0) 0 else extra - 1
    while (k > 0) { // continuation bytes 0b10xxxxxx
      if ((r.bits(8) & 0xC0L) != 0x80L) return -1
      k -= 1
    }
    val blockSize = bsCode match {
      case 0 => return -1 // reserved
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 => r.bits(8).toInt + 1
      case 7 => r.bits(16).toInt + 1
      case c => 256 << (c - 8)
    }
    rateCode match { // end-of-header rate forms are read and ignored
      case 12 => r.bits(8)
      case 13 | 14 => r.bits(16)
      case 15 => return -1 // invalid
      case _ =>
    }
    r.bits(8) // CRC-8 (not certified)
    if (r.bad || blockSize <= 0 || blockSize > remaining) return -1
    val chans = new Array[Array[Long]](ch)
    var c = 0
    while (c < ch) {
      // left/side: ch1 is the side; right/side: ch0; mid/side: ch1
      val side = (chanCode == 8 && c == 1) || (chanCode == 9 && c == 0) ||
        (chanCode == 10 && c == 1)
      val buf = decodeSubframe(r, bps + (if (side) 1 else 0), blockSize)
      if (buf == null) return -1
      chans(c) = buf
      c += 1
    }
    if (chanCode == 8) { // left/side: R = L − S
      var i = 0
      while (i < blockSize) {
        chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1
      }
    } else if (chanCode == 9) { // right/side: L = R + S
      var i = 0
      while (i < blockSize) {
        val s = chans(0)(i)
        chans(0)(i) = chans(1)(i) + s; i += 1
      }
    } else if (chanCode == 10) { // mid/side, lossless reconstruction
      var i = 0
      while (i < blockSize) {
        val s = chans(1)(i)
        val m2 = (chans(0)(i) << 1) | (s & 1L)
        chans(0)(i) = (m2 + s) >> 1
        chans(1)(i) = (m2 - s) >> 1
        i += 1
      }
    }
    var i = 0
    while (i < blockSize) {
      c = 0
      while (c < ch) {
        val v = chans(c)(i)
        if (v < -32768L || v > 32767L) return -1 // corrupt stream
        out(at + i * ch + c) = v.toShort
        c += 1
      }
      i += 1
    }
    r.alignByte()
    r.bits(16) // CRC-16 (not certified)
    if (r.bad) -1 else blockSize
  }

  /** Decode one subframe to its raw (post-wasted-shift, pre-
    * decorrelation) channel signal, or null on corruption /
    * out-of-subset layouts.
    */
  private def decodeSubframe(r: Reader, bps: Int, n: Int): Array[Long] = {
    if (r.bits(1) != 0L) return null // zero-pad bit
    val tpe = r.bits(6).toInt
    val wasted =
      if (r.bits(1) == 1L) r.unary() + 1
      else 0
    val eb = bps - wasted // effective bits
    if (eb <= 0 || r.bad) return null
    val s = new Array[Long](n)
    if (tpe == 0) { // constant
      val v = r.signedBits(eb)
      java.util.Arrays.fill(s, v)
    } else if (tpe == 1) { // verbatim
      var i = 0
      while (i < n) { s(i) = r.signedBits(eb); i += 1 }
    } else if (tpe >= 8 && tpe <= 12) { // fixed, order 0..4
      val order = tpe - 8
      if (order > n) return null
      var i = 0
      while (i < order) { s(i) = r.signedBits(eb); i += 1 }
      if (!readResidual(r, n, order, s)) return null
      i = order
      while (i < n) {
        val p = order match {
          case 0 => 0L
          case 1 => s(i - 1)
          case 2 => 2 * s(i - 1) - s(i - 2)
          case 3 => 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
          case _ => 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
        }
        s(i) += p
        i += 1
      }
    } else return null // LPC and reserved types: out of subset
    if (r.bad) return null
    if (wasted > 0) {
      var i = 0
      while (i < n) { s(i) = s(i) << wasted; i += 1 }
    }
    s
  }

  /** Rice-coded residual section into s[order..n). */
  private def readResidual(r: Reader, n: Int, order: Int,
                           s: Array[Long]): Boolean = {
    val method = r.bits(2).toInt
    if (method > 1) return false
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val po = r.bits(4).toInt
    val parts = 1 << po
    if (n % parts != 0) return false
    var i = order
    var p = 0
    while (p < parts) {
      val count = (n / parts) - (if (p == 0) order else 0)
      if (count < 0) return false
      val param = r.bits(pBits).toInt
      if (param == escape) {
        val raw = r.bits(5).toInt
        var k = 0
        while (k < count) {
          s(i) = if (raw == 0) 0L else r.signedBits(raw)
          i += 1; k += 1
        }
      } else {
        var k = 0
        while (k < count) {
          val q = r.unary().toLong
          val v = (q << param) | r.bits(param)
          s(i) = (v >>> 1) ^ -(v & 1L) // zigzag
          i += 1; k += 1
        }
      }
      if (r.bad) return false
      p += 1
    }
    true
  }
}
