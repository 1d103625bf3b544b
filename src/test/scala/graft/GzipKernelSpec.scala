package graft

import graft.expressions.GzipKernel
import graft.queries.TarFixtures

/** The gzip kernel against BOTH construction directions: the fixture's
  * hand-rolled stored-block framing AND the JDK's own GZIPOutputStream
  * (real deflate, encoder-chosen framing — a genuinely independent
  * code path, the PixelKernelSpec discipline). Integrity corruptions
  * must quarantine: a decompressor's output feeds parsers downstream.
  */
class GzipKernelSpec extends SparkSpec {

  private def d(b: Array[Byte]): Option[Array[Byte]] =
    Option(GzipKernel.decode(b))

  test("round trips: hand-rolled stored blocks AND the JDK's real deflate") {
    val data = (0 until 10000).map(i => (i * 31 % 251).toByte).toArray
    assert(d(TarFixtures.gzip(data)).get.toSeq === data.toSeq)
    assert(d(TarFixtures.gzip(Array.empty[Byte])).get.isEmpty)
    // JDK encoder: real deflate, its own header choices
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(data); g.close()
    assert(d(bos.toByteArray).get.toSeq === data.toSeq)
    // multi-member: JDK member + hand-rolled member concatenate
    val both = bos.toByteArray ++ TarFixtures.gzip("tail".getBytes)
    assert(new String(d(both).get.drop(data.length)) === "tail")
    // FNAME framing
    assert(d(TarFixtures.gzip("x".getBytes, Some("name.txt")))
      .get.toSeq === "x".getBytes.toSeq)
  }

  test("integrity: CRC flip, ISIZE flip, truncations, trailing garbage all NULL") {
    val gz = TarFixtures.gzip("payload bytes".getBytes)
    assert(d(gz).isDefined)
    val crcFlip = gz.clone()
    crcFlip(gz.length - 8) = (crcFlip(gz.length - 8) ^ 0xFF).toByte
    assert(d(crcFlip).isEmpty)
    val isizeFlip = gz.clone()
    isizeFlip(gz.length - 1) = (isizeFlip(gz.length - 1) ^ 0xFF).toByte
    assert(d(isizeFlip).isEmpty)
    (0 until gz.length).foreach { n =>
      val r = GzipKernel.decode(gz.take(n))
      assert(r == null, s"truncation to $n bytes must NULL")
    }
    assert(d(gz ++ Array[Byte](1, 2, 3)).isEmpty) // garbage ≠ a member
    // a PAYLOAD bitflip inside the stored block fails the CRC
    val bodyFlip = gz.clone()
    bodyFlip(15) = (bodyFlip(15) ^ 0x01).toByte
    assert(d(bodyFlip).isEmpty)
  }

  test("member CRC is incremental: a large member followed by many tiny ones decodes linearly") {
    // the old per-member out.toByteArray CRC pass cost
    // O(members × total_output) copying — a crafted one-big+many-empty
    // stream is the amplification shape; correctness must hold and the
    // work must stay linear in output
    val big = Array.tabulate(1 << 20)(i => (i * 31).toByte)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(TarFixtures.gzip(big))
    (0 until 1000).foreach(_ => bos.write(TarFixtures.gzip(Array.empty[Byte])))
    bos.write(TarFixtures.gzip("tail".getBytes))
    val got = d(bos.toByteArray).get
    assert(got.length === big.length + 4)
    assert(got.take(big.length).toSeq === big.toSeq)
    assert(new String(got.drop(big.length)) === "tail")
  }

  test("decode-bomb cap: a tiny gzip expanding past 64 MiB is NULL, not an OOM") {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    val chunk = new Array[Byte](1 << 20)
    (0 until 70).foreach(_ => g.write(chunk)) // 70 MiB of zeros
    g.close()
    assert(bos.size() < 200000, "zeros should compress tiny")
    assert(d(bos.toByteArray).isEmpty)
  }
}
