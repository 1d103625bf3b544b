package graft

import graft.expressions.ZstdKernel
import graft.queries.TarFixtures

/** The zstd decode hop (the GzipKernelSpec discipline): exact content
  * out of library-encoded frames, NULL out of every corruption — the
  * kernel's added value over the raw library call is the CONTRACT
  * (magic check, declared + streaming caps, whole-frame validation,
  * NULL-never-throw), so that is what these rows pin.
  */
class ZstdKernelSpec extends SparkSpec {

  private def d(b: Array[Byte]): Option[Array[Byte]] =
    Option(ZstdKernel.decode(b))

  test("round trip, multi-frame concatenation, checksum flip, truncations") {
    val data = (0 until 3000).map(i => ((i * 31 + 7) % 256).toByte).toArray
    val zs = TarFixtures.zstd(data)
    assert(d(zs).get.toSeq === data.toSeq)
    // multi-frame: two frames decode to the concatenation
    val both = TarFixtures.zstd(data.take(1000)) ++
      TarFixtures.zstd(data.drop(1000))
    assert(d(both).get.toSeq === data.toSeq)
    // a payload bitflip fails the XXH64 content checksum
    val flip = zs.clone()
    flip(zs.length / 2) = (flip(zs.length / 2) ^ 0x40).toByte
    assert(d(flip).isEmpty)
    // EVERY truncation is NULL — including the one the streaming
    // reader alone missed: input ending exactly at the final frame's
    // 4-byte checksum boundary
    (0 until zs.length).foreach { n =>
      assert(ZstdKernel.decode(zs.take(n)) == null,
        s"truncation to $n bytes must NULL")
    }
    assert(d(both.take(both.length - 4)).isEmpty) // checksum-boundary cut
    // trailing garbage after the last frame is not a frame
    assert(d(zs ++ Array[Byte](1, 2, 3)).isEmpty)
    // non-zstd magic never reaches the native decoder
    assert(d("not zstd at all".getBytes).isEmpty)
    assert(d(Array[Byte]()).isEmpty && ZstdKernel.decode(null) == null)
  }

  test("a legal stream opening with a skippable frame decodes") {
    // RFC 8878 §3.1.2: magic 0x184D2A5x LE + 4-byte LE length + payload;
    // such frames carry metadata and may legally precede the content
    // frame — the leading-magic check must not reject them
    val data = (0 until 500).map(i => ((i * 7 + 3) % 256).toByte).toArray
    val meta = Array[Byte](1, 2, 3, 4, 5)
    val skip = Array[Byte](0x50, 0x2A, 0x4D, 0x18,
      meta.length.toByte, 0, 0, 0) ++ meta
    assert(d(skip ++ TarFixtures.zstd(data)).get.toSeq === data.toSeq)
    // a truncated skippable frame is still structurally invalid
    assert(d(skip.take(6)).isEmpty)
    // skippable-only stream: zero content frames → empty output
    assert(d(skip).exists(_.isEmpty))
  }

  test("decode-bomb caps: declared size and streaming output both bound") {
    // a ~70 MiB zero buffer compresses tiny; the frame DECLARES its
    // content size (single-shot compress), so the declared guard
    // rejects before any allocation
    val big = new Array[Byte](70 << 20)
    val declared = com.github.luben.zstd.Zstd.compress(big, 3)
    assert(declared.length < (1 << 20))
    assert(d(declared).isEmpty)
    // the streaming writer never knows the total, so no declared size:
    // the STREAMING cap must catch the same bomb mid-decode
    val bos = new java.io.ByteArrayOutputStream()
    val z = new com.github.luben.zstd.ZstdOutputStreamNoFinalizer(bos, 3)
    val chunk = new Array[Byte](1 << 20)
    (0 until 70).foreach(_ => z.write(chunk, 0, chunk.length))
    z.close()
    assert(bos.size() < (1 << 20))
    assert(d(bos.toByteArray).isEmpty)
    // ...while content under the cap decodes fine through either path
    assert(d(com.github.luben.zstd.Zstd.compress(new Array[Byte](1000), 3))
      .get.length === 1000)
  }

  test("expression surface: zstd_decode chains with tar_members") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = Seq((1L, TarFixtures.zstTarPayload(1L)),
        (2L, Array[Byte](9, 9, 9)))
      .toDF("id", "p")
      .select(col("id"), explode_outer(graft.functions.tarMembers(
        graft.functions.zstdDecode(col("p")))).as("m"))
      .groupBy("id").agg(count(col("m")).as("n"))
      .orderBy("id").collect()
    assert(got(0).getLong(1) > 0L)
    assert(got(1).getLong(1) === 0L)
  }
}
