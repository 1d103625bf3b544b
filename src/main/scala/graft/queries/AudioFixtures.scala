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
}
