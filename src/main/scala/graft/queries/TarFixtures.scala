package graft.queries

/** Constructed WebDataset-style tar archives for the q359/q360 gates —
  * the [[PixelFixtures]]/[[VideoFixtures]] discipline for the ARCHIVE
  * layer: every archive is laid out from doc_id arithmetic the DuckDB
  * oracle replays (offsets are cumulative 512-padded block sums), and
  * the construction shares no code with [[graft.expressions.TarKernel]]
  * (headers written forward here, block-walked there).
  *
  * Shared arithmetic (the oracle's contract):
  *   S(doc)  = doc % 4 + 2 samples per archive
  *   sample k carries TWO members, in order:
  *     "{doc}_{k}.bmp" — [[PixelFixtures.bmp]] of s' = 4·doc + k
  *       (size = 54 + H(s')·stride(s'), the q342 size arithmetic)
  *     "{doc}_{k}.txt" — n = (doc + k) % 7 + 1 copies of the token
  *       "a" joined by single spaces (size = 2n − 1 bytes)
  *   member data is 512-padded; headers are one block each; the
  *   archive ends with the two zero blocks, so
  *   n_bytes = Σ (512 + ⌈size/512⌉·512) + 1024.
  */
private[graft] object TarFixtures {

  def samples(doc: Long): Int = (doc % 4 + 2).toInt

  def txtTokens(doc: Long, k: Int): Int = ((doc + k) % 7 + 1).toInt

  private def header(name: String, size: Long): Array[Byte] = {
    val h = new Array[Byte](512)
    val nb = name.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    System.arraycopy(nb, 0, h, 0, nb.length)
    // mode/uid/gid: zero-filled octal (kernel ignores); size: 11-digit
    // octal + NUL at offset 124
    val oct = ("%011o".format(size) + "\u0000").getBytes("US-ASCII")
    System.arraycopy(oct, 0, h, 124, 12)
    // checksum field: spaces (an enumeration gate reads the layout, it
    // does not certify archives — same contract as PNG CRCs in q342)
    (148 until 156).foreach(i => h(i) = ' ')
    h(156) = '0' // regular file
    val magic = ("ustar\u0000" + "00").getBytes("US-ASCII")
    System.arraycopy(magic, 0, h, 257, 8)
    h
  }

  /** One WebDataset shard: S samples × (bmp + txt) members. */
  def tar(doc: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def member(name: String, data: Array[Byte]): Unit = {
      out.write(header(name, data.length.toLong), 0, 512)
      out.write(data, 0, data.length)
      val pad = (512 - data.length % 512) % 512
      (0 until pad).foreach(_ => out.write(0))
    }
    (0 until samples(doc)).foreach { k =>
      member(s"${doc}_$k.bmp", PixelFixtures.bmp(4 * doc + k))
      member(s"${doc}_$k.txt",
        Seq.fill(txtTokens(doc, k))("a").mkString(" ")
          .getBytes("US-ASCII"))
    }
    (0 until 1024).foreach(_ => out.write(0)) // end-of-archive blocks
    out.toByteArray
  }

  /** q359/q360's payload: %9==8 truncates the archive 100 bytes past
    * its FIRST member header (mid-bmp-data) → NULL, loud not wrong.
    */
  def payload(doc: Long): Array[Byte] = {
    val full = tar(doc)
    if (doc % 9 == 8) full.take(612) else full
  }

  /** q365's shard corpus with PLANTED cross-shard duplicate images:
    * like [[tar]], but sample 0's image content is
    * [[PixelFixtures.bmp]] of s' = 4·(doc − doc%2) — shard pairs
    * (2m, 2m+1) carry the IDENTICAL picture under different member
    * names (the re-shipped asset a shard-dedup pass exists to find);
    * samples k ≥ 1 keep their own s' = 4·doc + k. %10==9 truncates
    * mid-first-member → the shard contributes nothing (and orphans
    * its partner's planted duplicate — found only if its own shard
    * parses).
    */
  def dedupPayload(doc: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def member(name: String, data: Array[Byte]): Unit = {
      out.write(header(name, data.length.toLong), 0, 512)
      out.write(data, 0, data.length)
      val pad = (512 - data.length % 512) % 512
      (0 until pad).foreach(_ => out.write(0))
    }
    (0 until samples(doc)).foreach { k =>
      val sp = if (k == 0) 4 * (doc - doc % 2) else 4 * doc + k
      member(s"${doc}_$k.bmp", PixelFixtures.bmp(sp))
      member(s"${doc}_$k.txt",
        Seq.fill(txtTokens(doc, k))("a").mkString(" ")
          .getBytes("US-ASCII"))
    }
    (0 until 1024).foreach(_ => out.write(0))
    val full = out.toByteArray
    if (doc % 10 == 9) full.take(612) else full
  }

  /** q366's corpus+batch shard: [[dedupPayload]]'s structure (sample
    * 0's image shared across the (2m, 2m+1) pair — the CROSS
    * corpus↔batch planted duplicate when even docs are yesterday's
    * corpus and odd docs today's batch) plus a BATCH-INTERNAL plant:
    * an odd doc ≡ 3 (mod 4) carries, as sample 1, the IDENTICAL image
    * of doc − 2's sample 1 — a duplicate entirely inside the arriving
    * batch, which the incremental pass must also catch. Sample count
    * is doc%3+2 ∈ [2,4] (NOT [[samples]]' doc%4+2: capping k ≤ 3
    * keeps every non-planted sp = 4·doc+k in a residue class mod 4
    * that can collide with no other shard's, so the planted pairs are
    * the ONLY duplicates — the recall denominator is exact). %10==9
    * truncates mid-first-member as in [[dedupPayload]].
    */
  def incrementalPayload(doc: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def member(name: String, data: Array[Byte]): Unit = {
      out.write(header(name, data.length.toLong), 0, 512)
      out.write(data, 0, data.length)
      val pad = (512 - data.length % 512) % 512
      (0 until pad).foreach(_ => out.write(0))
    }
    (0 until (doc % 3 + 2).toInt).foreach { k =>
      val sp =
        if (k == 0) 4 * (doc - doc % 2)
        else if (k == 1 && doc % 4 == 3) 4 * (doc - 2) + 1
        else 4 * doc + k
      member(s"${doc}_$k.bmp", PixelFixtures.bmp(sp))
      member(s"${doc}_$k.txt",
        Seq.fill(txtTokens(doc, k))("a").mkString(" ")
          .getBytes("US-ASCII"))
    }
    (0 until 1024).foreach(_ => out.write(0))
    val full = out.toByteArray
    if (doc % 10 == 9) full.take(612) else full
  }

  /** q374's COMPRESSED shard: [[incrementalPayload]]'s planted-dup
    * plan (sample 0 shared across (2m, 2m+1) pairs — the cross
    * corpus↔batch duplicate; odd (4m+1, 4m+3) pairs share sample 1 —
    * the batch-internal one; sample count doc%3+2 keeps every
    * non-planted sp collision-free) with JPEG samples
    * ([[PixelFixtures.jpeg]] grayscale DC-only — the q372 closed-form
    * pixels) behind the ZSTD hop. Corruption at BOTH layers: %10==9
    * truncates the TAR mid-first-member INSIDE a checksum-valid frame
    * (the tar walk must catch it); %11==7 truncates the frame itself
    * (the zstd walk must).
    */
  def jpegShardPayload(doc: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def member(name: String, data: Array[Byte]): Unit = {
      out.write(header(name, data.length.toLong), 0, 512)
      out.write(data, 0, data.length)
      val pad = (512 - data.length % 512) % 512
      (0 until pad).foreach(_ => out.write(0))
    }
    (0 until (doc % 3 + 2).toInt).foreach { k =>
      val sp =
        if (k == 0) 4 * (doc - doc % 2)
        else if (k == 1 && doc % 4 == 3) 4 * (doc - 2) + 1
        else 4 * doc + k
      member(s"${doc}_$k.jpg",
        PixelFixtures.jpeg(sp, color = false, rstInterval = 0,
          big = true))
      member(s"${doc}_$k.txt",
        Seq.fill(txtTokens(doc, k))("a").mkString(" ")
          .getBytes("US-ASCII"))
    }
    (0 until 1024).foreach(_ => out.write(0))
    val full = out.toByteArray
    val tarBytes = if (doc % 10 == 9) full.take(612) else full
    val zs = zstd(tarBytes)
    if (doc % 11 == 7) zs.take(zs.length - 4) else zs
  }

  /** RFC 1952 gzip of `data`, HAND-ROLLED (the zlibStored discipline —
    * construction shares no code with the Inflater-side
    * [[graft.expressions.GzipKernel]]): minimal 10-byte header
    * (mtime 0, XFL 0, OS 255; optional FNAME), STORED deflate blocks
    * (RFC 1951 §3.2.4 — size-deterministic: 5 bytes of overhead per
    * ≤ 65535-byte block), and a bit-looped CRC-32 (poly 0xEDB88320)
    * the kernel's own JDK CRC32 must agree with.
    */
  def gzip(data: Array[Byte], fname: Option[String] = None): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit = (0 until 4).foreach(k =>
      out.write(((v >> (8 * k)) & 0xFF).toInt))
    out.write(0x1F); out.write(0x8B); out.write(8)
    out.write(if (fname.isDefined) 8 else 0) // FLG: FNAME only
    le32(0L); out.write(0); out.write(255) // mtime, XFL, OS
    fname.foreach { n =>
      n.getBytes("US-ASCII").foreach(c => out.write(c.toInt)); out.write(0)
    }
    var off = 0
    do { // at least one block, so empty data is a valid member
      val len = math.min(65535, data.length - off)
      val last = off + len == data.length
      out.write(if (last) 1 else 0) // BFINAL + BTYPE 00 (stored)
      out.write(len & 0xFF); out.write((len >> 8) & 0xFF)
      out.write(~len & 0xFF); out.write((~len >> 8) & 0xFF)
      out.write(data, off, len)
      off += len
    } while (off < data.length)
    var crc = 0xFFFFFFFFL
    data.foreach { byt =>
      crc ^= (byt & 0xFFL)
      (0 until 8).foreach { _ =>
        crc = if ((crc & 1L) != 0L) (crc >>> 1) ^ 0xEDB88320L
        else crc >>> 1
      }
    }
    le32(crc ^ 0xFFFFFFFFL)
    le32(data.length.toLong)
    out.toByteArray
  }

  /** q361's payload: the text "a a … a" of n = doc%40+1 tokens,
    * gzipped — as ONE member (FNAME planted on the %4==2 slice), or as
    * TWO concatenated members splitting the text (the %6==5 slice —
    * RFC 1952's required concatenation semantics; disjoint from the
    * FNAME slice since 5 mod 6 is odd and 2 mod 4 even). %10==3 flips
    * a CRC byte → the kernel's integrity check must NULL it.
    */
  def gzPayload(doc: Long): Array[Byte] = {
    val n = (doc % 40 + 1).toInt
    val data = Seq.fill(n)("a").mkString(" ").getBytes("US-ASCII")
    val gz =
      if (doc % 6 == 5) {
        val h = data.length / 2
        gzip(data.take(h)) ++ gzip(data.drop(h))
      } else if (doc % 4 == 2) gzip(data, Some("m.txt"))
      else gzip(data)
    if (doc % 10 == 3) { gz(gz.length - 8) = (gz(gz.length - 8) ^ 0xFF).toByte }
    gz
  }

  /** The ZIP twin of [[tar]] (the q364 fixture — PKWARE APPNOTE layout
    * hand-written forward; [[graft.expressions.ZipKernel]] walks it
    * backward from the EOCD): S = doc%3+2 samples, each a STORED
    * "{doc}_{k}.bmp" ([[PixelFixtures.bmp]] of s' = 4·doc + k — the
    * q360 content arithmetic) and a DEFLATED "{doc}_{k}.txt" whose
    * deflate stream is ONE STORED BLOCK (method 8 with btype 00 —
    * spec-valid, and size-deterministic: csize = usize + 5). CRC
    * fields are zeros (the kernel enumerates, it does not certify).
    * Shared arithmetic: nameLen = digits(doc) + 6; local header
    * 30+nameLen; central entry 46+nameLen; EOCD 22.
    */
  def zip(doc: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le32(v: Long): Unit = (0 until 4).foreach(k =>
      out.write(((v >> (8 * k)) & 0xFF).toInt))
    case class M(name: String, method: Int, data: Array[Byte], usize: Int,
                 localOff: Int)
    val S = (doc % 3 + 2).toInt
    var pos = 0
    val members = (0 until S).flatMap { k =>
      val bmp = PixelFixtures.bmp(4 * doc + k)
      val txt = Seq.fill(((doc + k) % 7 + 1).toInt)("a").mkString(" ")
        .getBytes("US-ASCII")
      // deflate as one stored block: 01 len ~len data
      val defl = Array[Byte](1, (txt.length & 0xFF).toByte,
        ((txt.length >> 8) & 0xFF).toByte, (~txt.length & 0xFF).toByte,
        ((~txt.length >> 8) & 0xFF).toByte) ++ txt
      val m1 = M(s"${doc}_$k.bmp", 0, bmp, bmp.length, pos)
      pos += 30 + m1.name.length + bmp.length
      val m2 = M(s"${doc}_$k.txt", 8, defl, txt.length, pos)
      pos += 30 + m2.name.length + defl.length
      Seq(m1, m2)
    }
    members.foreach { m => // local headers + data
      le32(0x04034B50L); le16(20); le16(0); le16(m.method)
      le16(0); le16(0) // time, date
      le32(0L) // crc (zeros: enumeration, not certification)
      le32(m.data.length.toLong); le32(m.usize.toLong)
      le16(m.name.length); le16(0)
      m.name.foreach(c => out.write(c.toInt))
      out.write(m.data, 0, m.data.length)
    }
    val cdOff = pos
    members.foreach { m => // central directory
      le32(0x02014B50L); le16(20); le16(20); le16(0); le16(m.method)
      le16(0); le16(0); le32(0L)
      le32(m.data.length.toLong); le32(m.usize.toLong)
      le16(m.name.length); le16(0); le16(0)
      le16(0); le16(0); le32(0L)
      le32(m.localOff.toLong)
      m.name.foreach(c => out.write(c.toInt))
    }
    val cdSize = out.size - cdOff
    le32(0x06054B50L); le16(0); le16(0)
    le16(members.size); le16(members.size)
    le32(cdSize.toLong); le32(cdOff.toLong); le16(0)
    out.toByteArray
  }

  /** q364's payload: %8==6 truncates the EOCD (last 10 bytes gone) →
    * the backward scan finds no directory → NULL.
    */
  def zipPayload(doc: Long): Array[Byte] = {
    val full = zip(doc)
    if (doc % 8 == 6) full.take(full.length - 10) else full
  }

  /** q362's payload: the WebDataset shard GZIPPED (.tar.gz) — the
    * [[payload]] tar (its %9==8 truncation now hides INSIDE a valid
    * gzip member, testing NULL propagation through the chain), plus a
    * gzip-level truncation on %11==7 → NULL at the decompression hop.
    */
  def gzTarPayload(doc: Long): Array[Byte] = {
    val gz = gzip(payload(doc))
    if (doc % 11 == 7) gz.take(gz.length - 4) else gz
  }

  /** RFC 8878 zstd frame of `data`, WITH the XXH64 content checksum
    * enabled (so planted bitflips quarantine at the decode hop).
    * Construction rides zstd-jni's ENCODER — for an entropy-coded
    * format (FSE + Huffman) that is the only practical independent
    * direction (the [[gzip]] fixtures hand-roll stored blocks because
    * deflate ALLOWS a no-compression mode; zstd has no equivalent
    * byte-level escape hatch worth hand-writing). Encoder and decoder
    * are distinct code paths within the library, corruption is planted
    * at the BYTE level after encoding, and every decoded-content
    * column is re-derived by the oracle from doc arithmetic — the
    * round trip still breaks loudly on an offset or framing bug.
    */
  def zstd(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new com.github.luben.zstd.ZstdOutputStreamNoFinalizer(bos, 3)
    z.setChecksum(true)
    z.write(data, 0, data.length)
    z.close()
    bos.toByteArray
  }

  /** q369's payload: the [[gzPayload]] content arithmetic behind the
    * zstd hop. %6==5 → TWO concatenated frames (multi-frame
    * semantics); %10==3 → a PAYLOAD bitflip inside the frame (the
    * XXH64 checksum must quarantine); %11==7 → truncation.
    */
  def zstPayload(doc: Long): Array[Byte] = {
    val n = (doc % 40 + 1).toInt
    val data = Seq.fill(n)("a").mkString(" ").getBytes("US-ASCII")
    val zs =
      if (doc % 6 == 5) {
        val h = data.length / 2
        zstd(data.take(h)) ++ zstd(data.drop(h))
      } else zstd(data)
    if (doc % 10 == 3) zs(12 % zs.length) = (zs(12 % zs.length) ^ 0x5A).toByte
    if (doc % 11 == 7) zs.take(zs.length - 4) else zs
  }

  /** The .tar.zst chain (q370): [[payload]]'s tar (with its own %9==8
    * mid-member truncation hiding INSIDE a checksum-valid frame)
    * behind one zstd frame; %11==7 truncates the frame itself.
    */
  def zstTarPayload(doc: Long): Array[Byte] = {
    val zs = zstd(payload(doc))
    if (doc % 11 == 7) zs.take(zs.length - 4) else zs
  }
}
