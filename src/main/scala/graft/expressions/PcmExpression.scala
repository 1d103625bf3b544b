package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** WAV PCM SAMPLE statistics — the audio twin of
  * [[PixelKernel]]: PCM is RAW (no codec at all), so the full
  * sample-level quality gate an audio training pipeline runs — energy,
  * clipping, leading/trailing silence — is pure byte arithmetic:
  *
  *  - container: RIFF/WAVE chunk walk (the [[AudioHeaderKernel]]
  *    discipline — every read bounds-checked) to BOTH the "fmt " chunk
  *    (must be PCM: format tag 1, 16 bits/sample — other layouts →
  *    NULL, loud not wrong) and the "data" chunk;
  *  - samples: signed 16-bit little-endian, channels interleaved. The
  *    declared data size must be fully present (mid-data truncation →
  *    NULL) and frame-aligned (divisible by 2·channels);
  *  - statistics (all integer, oracle-replayable): n_samples (across
  *    channels), duration_ms = ⌊frames·1000 / rate⌋, sum_q = Σs,
  *    sq_sum = Σs² (RMS numerator), n_clipped = #{s = 32767 ∨
  *    s = −32768} (the two's-complement full-scale rails),
  *    lead/trail_silence = longest run of |s| ≤ 256 from either end
  *    (an ALL-silent stream reports n_samples for both — documented,
  *    the gate's silence-ratio check saturates identically).
  *
  * Decode-bomb guard: data chunks advertising > 2^26 bytes return NULL
  * rather than scanning unbounded memory.
  */
object PcmKernel {

  private val MaxDataBytes = 1L << 26
  private val SilenceThreshold = 256

  private def le16(b: Array[Byte], i: Int): Long =
    ((b(i + 1) & 0xFFL) << 8) | (b(i) & 0xFFL)

  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i + 3) & 0xFFL) << 24) | ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 1) & 0xFFL) << 8) | (b(i) & 0xFFL)

  /** @return InternalRow(sample_rate, channels, bits, n_samples,
    * duration_ms, sum_q, sq_sum, n_clipped, lead_silence,
    * trail_silence) or null.
    */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return null
    var rate = -1L; var ch = -1L; var bits = -1L
    var dataOff = -1; var dataLen = -1L
    var i = 12
    while (i + 8 <= b.length && (rate < 0L || dataOff < 0)) {
      val size = le32(b, i + 4)
      if (size < 0L || size > Int.MaxValue - 9L) return null
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' &&
        b(i + 3) == ' ') {
        if (size < 16L || i + 8 + 16 > b.length) return null
        if (le16(b, i + 8) != 1L) return null // PCM only
        ch = le16(b, i + 10)
        rate = le32(b, i + 12)
        bits = le16(b, i + 22)
        if (ch == 0L || rate == 0L || bits != 16L) return null
      } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' &&
        b(i + 3) == 'a') {
        dataOff = i + 8
        dataLen = size
      }
      i += 8 + size.toInt + (size.toInt & 1) // chunks pad to even
    }
    if (rate < 0L || dataOff < 0) return null
    if (dataLen > MaxDataBytes) return null // decode-bomb guard
    if (dataOff + dataLen > b.length) return null // mid-data truncation
    if (dataLen % (2L * ch) != 0L) return null // frame alignment
    val n = (dataLen / 2L).toInt
    var s = 0L; var sq = 0L; var clipped = 0L
    var k = 0
    while (k < n) {
      val v = le16(b, dataOff + 2 * k).toShort.toLong // sign-extend
      s += v; sq += v * v
      if (v == 32767L || v == -32768L) clipped += 1L
      k += 1
    }
    def silent(k: Int): Boolean = {
      val v = le16(b, dataOff + 2 * k).toShort.toInt
      v >= -SilenceThreshold && v <= SilenceThreshold
    }
    var lead = 0
    while (lead < n && silent(lead)) lead += 1
    var trail = 0
    while (trail < n && silent(n - 1 - trail)) trail += 1
    if (lead == n) trail = n // all-silent: both report the full length
    InternalRow(rate, ch, bits, n.toLong,
      (n / ch) * 1000L / rate, s, sq, clipped, lead.toLong, trail.toLong)
  }
}

/** `pcm_stats(content BINARY)` →
  * STRUCT<sample_rate, channels, bits, n_samples, duration_ms, sum_q,
  * sq_sum, n_clipped, lead_silence, trail_silence — all BIGINT>,
  * NULL on corrupt / truncated / non-PCM-16 payloads. One codegen'd
  * kernel call per row; sample bytes never leave the executor.
  */
case class PcmStats(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"PcmStats expects BINARY, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    "sample_rate", "channels", "bits", "n_samples", "duration_ms",
    "sum_q", "sq_sum", "n_clipped", "lead_silence", "trail_silence")
    .map(StructField(_, LongType, nullable = false)))

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else PcmKernel.parse(v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val cEv = child.genCode(ctx)
    ev.copy(code = cEv.code +
      code"""
        |boolean ${ev.isNull} = true;
        |InternalRow ${ev.value} = null;
        |if (!${cEv.isNull}) {
        |  ${ev.value} = graft.expressions.PcmKernel.parse(${cEv.value});
        |  ${ev.isNull} = (${ev.value} == null);
        |}
        """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
