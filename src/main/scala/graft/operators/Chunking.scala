package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixed-size document chunking with overlap — the context-window split a
  * training pipeline applies before tokenization: chunk k covers
  * characters [1 + k·stride, 1 + k·stride + size) with
  * stride = size − overlap, so consecutive chunks share `overlap`
  * characters.
  *
  * Scale shape: generate-and-explode per row (narrow, codegen'd — no
  * shuffle at all); output rows carry the chunk's offset, length, and
  * md5 checksum rather than duplicating the text payload when only
  * chunk identity is needed downstream.
  */
object Chunking {

  /** One row per chunk: (id, chunk_idx, start, chunk_len, checksum).
    * Offsets are 1-based code-point positions (SQL substring semantics);
    * empty documents produce zero chunks. `size > overlap >= 0`.
    */
  def fixedChunks(docs: DataFrame, idCol: String, textCol: String,
                  size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      "need size > overlap >= 0")
    val stride = size - overlap
    val text = col(textCol)
    // greatest(len, 1): sequence(1, 0) would step BACKWARD (Spark infers
    // step -1 from the bounds), so clamp the stop and filter the start
    // back out for empty texts instead.
    docs.select(col(idCol), text.as("__text"),
        posexplode(sequence(lit(1), greatest(length(text), lit(1)),
          lit(stride))).as(Seq("__pos", "__start")))
      .filter(col("__start") <= length(col("__text")))
      .select(col(idCol),
        col("__pos").cast(LongType).as("chunk_idx"),
        col("__start").cast(LongType).as("start"),
        col("__text").substr(col("__start"), lit(size)).as("__chunk"))
      .select(col(idCol), col("chunk_idx"), col("start"),
        length(col("__chunk")).cast(LongType).as("chunk_len"),
        md5(col("__chunk").cast("binary")).as("checksum"))
  }
}
