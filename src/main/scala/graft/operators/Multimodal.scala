package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus partition-batched
  * decode/feature-extract.
  *
  * The Spark-side shape is the real thing — binary column + metadata
  * struct, per-partition batched processing via `mapPartitions` over a
  * typed Dataset (the Scala analogue of mapInPandas: one iterator per
  * partition, records streamed, no per-row task overhead). HEADER-level
  * decode is REAL as of round 13 ([[headerMeta]]: PNG/GIF/JPEG/WebP/BMP
  * dimensions+depth; [[audioMeta]]: WAV/FLAC rate/channels/bits — pure
  * byte arithmetic, no codec jars), which covers the
  * resolution/format/aspect/sample-rate gates a training pipeline runs
  * BEFORE any pixel/PCM work. Only the PIXEL decode step remains a
  * clearly-marked deterministic STUB (`decodeStub`): the container has
  * no image/audio codecs, so the stub stands where libjpeg/ffmpeg would
  * be wired on a real cluster.
  *
  * Scale notes: payload bytes stay in the `content` column and are never
  * collected; feature extraction is a narrow per-partition pass, so the
  * operator scales with input splits like any scan→project pipeline. Keep
  * `spark.sql.files.maxPartitionBytes` sized so a partition of payloads
  * fits executor memory.
  */
object Multimodal {

  /** One media record as carried through the pipeline. */
  case class MediaRecord(doc_id: Long, kind: String, content: Array[Byte])

  /** Extracted features: fixed-width vector + provenance metadata. */
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
                           checksum: String, features: Array[Double])

  /** Attach a binary payload column + metadata. In production the payload
    * is the raw media file bytes; here the document text stands in as the
    * payload so the plumbing is exercised end-to-end with real data.
    */
  def attachBinary(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      lit("text/plain").as("kind"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        length(encode(col(textCol), "UTF-8")).cast(LongType).as("n_bytes"),
        md5(encode(col(textCol), "UTF-8")).as("checksum")).as("meta"))

  /** REAL header decode — the filter-gate read a multimodal pipeline
    * runs before any pixel work: format / width / height / bit depth
    * parsed straight from PNG IHDR, GIF LSD, and JPEG SOFn header bytes
    * by the codegen'd [[graft.expressions.MediaHeader]] kernel (pure
    * byte arithmetic, no codec jars). Corrupt, truncated, or
    * unknown-magic payloads yield a NULL struct — loud, never a wrong
    * dimension. Scale shape: one map-only projection; payload bytes
    * never leave the executor.
    */
  def headerMeta(content: Column): Column =
    graft.functions.mediaHeader(content)

  /** Per-payload header fields flattened to scalar columns (the
    * resolution/format gate's input table): doc_id, kind, n_bytes,
    * format, width, height, bit_depth — NULLs where the header does
    * not parse.
    */
  def headerFeatures(media: DataFrame, idCol: String, kindCol: String,
                     contentCol: String): DataFrame =
    media.select(col(idCol), col(kindCol),
        length(col(contentCol)).cast(LongType).as("n_bytes"),
        headerMeta(col(contentCol)).as("__h"))
      .select(col(idCol), col(kindCol), col("n_bytes"),
        col("__h.format").as("format"), col("__h.width").as("width"),
        col("__h.height").as("height"),
        col("__h.bit_depth").as("bit_depth"))

  /** REAL audio header decode — WAV (RIFF chunk walk to "fmt ") and
    * FLAC (STREAMINFO bit unpacking) via the codegen'd
    * [[graft.expressions.AudioHeader]] kernel: (format, sample_rate,
    * channels, bits), NULL on corrupt. The sample-rate/channel gates an
    * audio training pipeline runs before any PCM decode.
    */
  def audioMeta(content: Column): Column =
    graft.functions.audioHeader(content)

  /** STUB — media PIXEL decode. A real deployment decodes image/audio
    * frames here (libjpeg/ffmpeg are not in this container); the
    * header-level decode above IS real ([[headerMeta]]). The stub is
    * deterministic in the payload bytes so the downstream plumbing is
    * fully testable: an 8-bucket byte histogram, normalized.
    */
  private[graft] def decodeStub(content: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](8)
    var i = 0
    while (i < content.length) {
      hist((content(i) & 0xff) >> 5) += 1.0
      i += 1
    }
    val n = math.max(content.length, 1).toDouble
    hist.map(_ / n)
  }

  /** STUB — "resize": rebin the 8-bucket histogram to `buckets` (stands
    * where an image resize kernel would run; deterministic in the input).
    */
  private[graft] def resizeStub(features: Array[Double], buckets: Int): Array[Double] = {
    val out = new Array[Double](buckets)
    var i = 0
    while (i < features.length) {
      out(i * buckets / features.length) += features(i)
      i += 1
    }
    out
  }

  /** STUB — "frame sampling": every `stride`-th fixed-size chunk of the
    * payload (stands where video frame extraction would run). Returns the
    * sampled chunks re-concatenated; deterministic in the input.
    */
  private[graft] def frameSampleStub(content: Array[Byte], frameSize: Int,
                                         stride: Int): Array[Byte] = {
    require(frameSize > 0 && stride > 0)
    content.grouped(frameSize).zipWithIndex
      .collect { case (frame, idx) if idx % stride == 0 => frame }
      .flatten.toArray
  }

  /** Partition-batched frame sampling over the binary payload column —
    * same mapPartitions shape as [[extractFeatures]]; output payloads are
    * the sampled frames only (the shuffle-volume reduction a video
    * pipeline does before heavier per-frame work).
    */
  def sampleFrames(media: Dataset[MediaRecord], frameSize: Int,
                   stride: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(rec =>
      rec.copy(content = frameSampleStub(rec.content, frameSize, stride))))
  }

  /** Partition-batched feature extraction: the mapInPandas-shaped pass.
    * One iterator per partition; each record is decoded (stub) and
    * reduced to a fixed-width feature vector.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      batch.map { rec =>
        val sum = digest.digest(rec.content).map("%02x".format(_)).mkString
        digest.reset()
        MediaFeatures(rec.doc_id, rec.kind, rec.content.length.toLong,
          sum, decodeStub(rec.content))
      }
    }
  }

  /** DataFrame-level convenience: docs → binary payloads → features. */
  def docFeatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    val media = attachBinary(docs, idCol, textCol)
      .select("doc_id", "kind", "content").as[MediaRecord]
    extractFeatures(media).toDF()
  }
}
