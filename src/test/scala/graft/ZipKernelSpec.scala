package graft

import graft.expressions.{InflateRawKernel, ZipKernel}
import graft.queries.TarFixtures

/** The zip kernels against BOTH construction directions: the fixture's
  * hand-written layout AND the JDK's own ZipOutputStream (real deflate,
  * encoder-chosen extra fields — independent framing).
  */
class ZipKernelSpec extends SparkSpec {

  private def members(b: Array[Byte]): Option[Seq[(String, Long, Long, Long, Long)]] =
    Option(ZipKernel.parse(b)).map { a =>
      (0 until a.numElements()).map { i =>
        val r = a.getStruct(i, 5)
        (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))
      }
    }

  test("fixture round trip: names, methods, tight-packed offsets, both size columns") {
    for (doc <- Seq(0L, 5L, 42L)) {
      val zip = TarFixtures.zip(doc)
      val got = members(zip).get
      val S = (doc % 3 + 2).toInt
      assert(got.size === 2 * S)
      var local = 0L
      (0 until S).foreach { k =>
        val bmp = graft.queries.PixelFixtures.bmp(4 * doc + k)
        val nl = s"${doc}_$k.bmp".length
        val (n1, m1, o1, c1, u1) = got(2 * k)
        assert((n1, m1, o1, c1, u1) ===
          ((s"${doc}_$k.bmp", 0L, local + 30 + nl, bmp.length.toLong,
            bmp.length.toLong)))
        // stored: the slice IS the payload and decodes
        val st = graft.expressions.PixelKernel.decode(
          java.util.Arrays.copyOfRange(zip, o1.toInt, (o1 + c1).toInt))
        assert(st != null && st.width === graft.queries.PixelFixtures
          .width(4 * doc + k))
        local += 30 + nl + c1
        val tlen = 2L * ((doc + k) % 7 + 1) - 1
        val (n2, m2, o2, c2, u2) = got(2 * k + 1)
        assert((n2, m2, c2, u2) ===
          ((s"${doc}_$k.txt", 8L, tlen + 5, tlen)))
        // deflated: inflate_raw recovers the text exactly
        val txt = InflateRawKernel.decode(
          java.util.Arrays.copyOfRange(zip, o2.toInt, (o2 + c2).toInt), u2)
        assert(new String(txt, "US-ASCII") ===
          Seq.fill(((doc + k) % 7 + 1).toInt)("a").mkString(" "))
        local += 30 + nl + c2
      }
    }
  }

  test("the JDK's own ZipOutputStream output enumerates and inflates") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("a/b.txt"))
    z.write(("hello " * 50).getBytes); z.closeEntry()
    z.putNextEntry(new java.util.zip.ZipEntry("dir/")) // directory
    z.closeEntry()
    val stored = new java.util.zip.ZipEntry("raw.bin")
    val payload = (0 until 64).map(_.toByte).toArray
    stored.setMethod(java.util.zip.ZipOutputStream.STORED)
    stored.setSize(64); stored.setCompressedSize(64)
    val crc = new java.util.zip.CRC32(); crc.update(payload)
    stored.setCrc(crc.getValue)
    z.putNextEntry(stored); z.write(payload); z.closeEntry()
    z.close()
    val b = bos.toByteArray
    val got = members(b).get
    assert(got.map(_._1) === Seq("a/b.txt", "raw.bin")) // dir skipped
    val (_, m0, o0, c0, u0) = got(0)
    assert(m0 === 8L && u0 === 300L)
    val text = InflateRawKernel.decode(
      java.util.Arrays.copyOfRange(b, o0.toInt, (o0 + c0).toInt), u0)
    assert(new String(text) === "hello " * 50)
    val (_, m1, o1, c1, _) = got(1)
    assert(m1 === 0L)
    assert(java.util.Arrays.copyOfRange(b, o1.toInt, (o1 + c1).toInt)
      .toSeq === payload.toSeq)
  }

  test("corruption NULLs: no EOCD, bad central signature, size lies") {
    val zip = TarFixtures.zip(1L)
    assert(members(TarFixtures.zipPayload(6L)).isEmpty) // %8==6 trunc
    val badSig = zip.clone()
    // find the first central-directory signature and break it
    var i = 0
    while (!(badSig(i) == 0x50 && badSig(i + 1) == 0x4B &&
      badSig(i + 2) == 0x01 && badSig(i + 3) == 0x02)) i += 1
    badSig(i + 3) = 0x7F
    assert(members(badSig).isEmpty)
    // inflate size lies: short and long expectations both NULL
    val data = Array[Byte](1, 3, 0, (~3 & 0xFF).toByte,
      ((~3 >> 8) & 0xFF).toByte, 'x', 'y', 'z')
    assert(InflateRawKernel.decode(data, 3L) != null)
    assert(InflateRawKernel.decode(data, 2L) == null)
    assert(InflateRawKernel.decode(data, 4L) == null)
    assert(InflateRawKernel.decode(data.take(6), 3L) == null) // truncated
    // csize overstated: the deflate stream TERMINATES before consuming
    // the sliced bytes (trailing garbage inside the claimed csize) —
    // also a size lie, also NULL
    assert(InflateRawKernel.decode(data ++ Array[Byte](9, 9), 3L) == null)
  }
}
