package graft.queries

/** Audio container fixtures built from doc_id arithmetic (the
  * PixelFixtures discipline): the payload writer lays out container
  * bytes FORWARD and never decodes — the kernel decodes, and the
  * oracle re-derives every decoded sample by replaying the public
  * codec arithmetic over the same doc_id-derived inputs.
  */
private[graft] object AudioFixtures {

  /** q381's IMA/DVI ADPCM payload: mono tag-0x11 WAV, blockAlign 16
    * (4-byte header + 12 nibble bytes → 25 samples per full block),
    * nblocks = doc%3 + 2; docs ≡ 1 (mod 4) end with a PARTIAL final
    * block (10 bytes → 13 samples). Per block b: initial predictor
    * ((doc·7 + b·131) % 65536) − 32768, step index (doc + 3b) % 89,
    * nibble byte k = (doc + b·5 + k·7 + 3) % 256 (low nibble first).
    * Corruption plants: doc%10==3 writes step index 120 into block
    * 0's header (past the 89-entry table — the kernel must NULL);
    * doc%11==7 truncates 3 bytes into the declared data (mid-data
    * truncation NULL).
    */
  def imaPayload(docId: Long): Array[Byte] = {
    val nBlocks = (docId % 3 + 2).toInt
    val partial = docId % 4 == 1
    val rate = 8000 + (docId % 3).toInt * 4000
    val blockLens = (0 until nBlocks).map(b =>
      if (partial && b == nBlocks - 1) 10 else 16)
    val dataLen = blockLens.sum
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
    out.write("RIFF".getBytes, 0, 4); le32(4 + 28 + 8 + dataLen)
    out.write("WAVE".getBytes, 0, 4)
    out.write("fmt ".getBytes, 0, 4); le32(20)
    le16(0x11); le16(1); le32(rate)
    le32(rate * 16 / 25 / 2) // nominal avg bytes/sec (informative)
    le16(16); le16(4) // blockAlign, bits
    le16(2); le16(25) // cbSize, samples per full block
    out.write("data".getBytes, 0, 4); le32(dataLen)
    (0 until nBlocks).foreach { b =>
      val pred0 = ((docId * 7 + b * 131) % 65536 - 32768).toInt
      val idx0 =
        if (docId % 10 == 3 && b == 0) 120 else ((docId + 3 * b) % 89).toInt
      le16(pred0 & 0xFFFF)
      out.write(idx0); out.write(0)
      (0 until blockLens(b) - 4).foreach { k =>
        out.write(((docId + b * 5 + k * 7 + 3) % 256).toInt)
      }
    }
    val full = out.toByteArray
    if (docId % 11 == 7) full.take(full.length - 3) else full
  }

  /** q386's MS-ADPCM payload (tag 0x02): ch = 2 when doc%3==0 else 1,
    * rate = 11025·(doc%2 + 1), blockAlign = 7·ch + 12,
    * nblocks = doc%3 + 2; docs ≡ 1 (mod 4) end with a PARTIAL final
    * block (6 data bytes). Per block b, channel c: bPredictor
    * (doc + b + c) % 7, iDelta (doc·3 + b·17 + c·29) % 1000 + 16,
    * iSamp1 ((doc·7 + b·131 + c·37) % 65536) − 32768, iSamp2
    * ((doc·11 + b·57 + c·73) % 65536) − 32768; data byte k =
    * (doc + b·5 + k·7 + 3) % 256 (HIGH nibble first, channels
    * alternating per nibble in stereo). Corruption plants:
    * doc%10==3 writes bPredictor 9 (past the 7-entry tables);
    * doc%11==7 truncates 3 bytes into the declared data.
    */
  def msPayload(docId: Long): Array[Byte] = {
    val ch = if (docId % 3 == 0) 2 else 1
    val rate = (11025 * (docId % 2 + 1)).toInt
    val nBlocks = (docId % 3 + 2).toInt
    val partial = docId % 4 == 1
    val hdr = 7 * ch
    val dataLens = (0 until nBlocks).map(b =>
      if (partial && b == nBlocks - 1) 6 else 12)
    val dataLen = dataLens.map(hdr + _).sum
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
    out.write("RIFF".getBytes, 0, 4); le32(4 + 28 + 8 + dataLen)
    out.write("WAVE".getBytes, 0, 4)
    out.write("fmt ".getBytes, 0, 4); le32(20)
    le16(0x02); le16(ch); le32(rate); le32(rate)
    le16(hdr + 12); le16(4) // blockAlign, bits
    le16(2); le16(0) // cbSize, wSamplesPerBlock (informative)
    out.write("data".getBytes, 0, 4); le32(dataLen)
    (0 until nBlocks).foreach { b =>
      (0 until ch).foreach { c =>
        val pred =
          if (docId % 10 == 3 && b == 0 && c == 0) 9
          else ((docId + b + c) % 7).toInt
        out.write(pred)
      }
      (0 until ch).foreach { c =>
        le16(((docId * 3 + b * 17 + c * 29) % 1000 + 16).toInt)
      }
      (0 until ch).foreach { c =>
        le16(((docId * 7 + b * 131 + c * 37) % 65536 - 32768).toInt & 0xFFFF)
      }
      (0 until ch).foreach { c =>
        le16(((docId * 11 + b * 57 + c * 73) % 65536 - 32768).toInt & 0xFFFF)
      }
      (0 until dataLens(b)).foreach { k =>
        out.write(((docId + b * 5 + k * 7 + 3) % 256).toInt)
      }
    }
    val full = out.toByteArray
    if (docId % 11 == 7) full.take(full.length - 3) else full
  }

  /** q387's STEREO IMA ADPCM payload: blockAlign 24 (8 header bytes +
    * 2 alternating 4-byte channel chunk pairs → 34 interleaved samples
    * per full block), rate = 8000 + (doc%3)·4000, nblocks = doc%3 + 2;
    * docs ≡ 1 (mod 4) end with a PARTIAL final block (8 data bytes =
    * one chunk pair → 18 samples). Per block b: left header pred
    * ((doc·7 + b·131) % 65536) − 32768 / index (doc + 3b) % 89, right
    * header pred ((doc·13 + b·59) % 65536) − 32768 / index
    * (doc·5 + 7b) % 89; data byte k = (doc + b·5 + k·7 + 3) % 256,
    * bytes with ⌊k/4⌋ even feeding the LEFT lane and odd the RIGHT
    * (low nibble first within each lane byte). Corruption plants:
    * doc%10==3 writes right step index 95; doc%11==7 truncates 3
    * bytes (breaking the chunk-pair rule).
    */
  def imaStereoPayload(docId: Long): Array[Byte] = {
    val rate = 8000 + (docId % 3).toInt * 4000
    val nBlocks = (docId % 3 + 2).toInt
    val partial = docId % 4 == 1
    val dataLens = (0 until nBlocks).map(b =>
      if (partial && b == nBlocks - 1) 8 else 16)
    val dataLen = dataLens.map(8 + _).sum
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
    out.write("RIFF".getBytes, 0, 4); le32(4 + 28 + 8 + dataLen)
    out.write("WAVE".getBytes, 0, 4)
    out.write("fmt ".getBytes, 0, 4); le32(20)
    le16(0x11); le16(2); le32(rate); le32(rate)
    le16(24); le16(4) // blockAlign, bits
    le16(2); le16(17) // cbSize, samples per full block per channel
    out.write("data".getBytes, 0, 4); le32(dataLen)
    (0 until nBlocks).foreach { b =>
      le16(((docId * 7 + b * 131) % 65536 - 32768).toInt & 0xFFFF)
      out.write(((docId + 3 * b) % 89).toInt); out.write(0)
      le16(((docId * 13 + b * 59) % 65536 - 32768).toInt & 0xFFFF)
      val idxR =
        if (docId % 10 == 3 && b == 0) 95 else ((docId * 5 + 7 * b) % 89).toInt
      out.write(idxR); out.write(0)
      (0 until dataLens(b)).foreach { k =>
        out.write(((docId + b * 5 + k * 7 + 3) % 256).toInt)
      }
    }
    val full = out.toByteArray
    if (docId % 11 == 7) full.take(full.length - 3) else full
  }
}
