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

  /** CONTENT-DEFINED chunking over the token stream — the rsync/LBFS/
    * storage-dedup boundary rule lifted to words: cut after token p
    * exactly when the rolling n-gram hash ending at p satisfies
    * `h ≡ 0 (mod 2^maskBits)`, so boundaries depend only on LOCAL
    * content. Insert one word into a document and only the chunk
    * containing it (and no chunk after the next boundary) changes its
    * digest — the property fixed-size chunking lacks (every later chunk
    * shifts), and the reason delta-sync and chunk-level dedup use CDC.
    * Expected chunk length ≈ 2^maskBits grams; no min/max clamp (the
    * plain Manber rule — clamping would break the locality argument the
    * operator exists for; degenerate runs are bounded by doc length).
    *
    * Scale shape: map-only — the gram hashes come from the compiled
    * [[graft.expressions.PolyGramHashSeq]] kernel (the winnowing hash,
    * so digests are portable), cut positions and chunk spans are
    * row-local array ops totalling O(tokens) work per doc, and the
    * output is one row per chunk with a digest, never a text payload.
    * Documents shorter than n tokens form one whole-doc chunk; empty
    * token streams produce zero chunks.
    *
    * @param n        rolling-window width in tokens (the gram size)
    * @param maskBits boundary mask bits (expected chunk ≈ 2^maskBits)
    * @return (idCol, chunk_idx, start, n_tokens, digest) — `start` is a
    *         0-based token offset; digest = polyHash of the chunk's
    *         space-joined tokens
    */
  def contentDefinedChunks(docs: DataFrame, idCol: String, textCol: String,
                           n: Int, maskBits: Int): DataFrame = {
    require(n >= 1 && maskBits >= 1 && maskBits < 31)
    val m = 1L << maskBits
    val base = docs.select(col(idCol),
      graft.functions.tokens(col(textCol)).as("__tk"),
      graft.functions.polyGramHashSeq(col(textCol), n, 1000000007L)
        .as("__hs"))
      .filter(size(col("__tk")) > 0)
    // cut after token p = i + n − 1 when gram hash i divides the mask;
    // the final token always ends the last chunk (dedup'd if also a cut)
    val withEnds = base.withColumn("__ends",
      array_distinct(concat(
        when(size(col("__hs")) >= 1,
          filter(
            transform(sequence(lit(0), size(col("__hs")) - 1),
              i => i + lit(n - 1)),
            p => element_at(col("__hs"), p - lit(n - 1) + 1) % m === 0))
          .otherwise(array().cast("array<int>")),
        array(size(col("__tk")) - 1))))
    withEnds
      .select(col(idCol), col("__tk"),
        posexplode(
          transform(col("__ends"), (e, j) =>
            struct(
              when(j === 0, lit(0))
                .otherwise(element_at(col("__ends"), j) + 1).as("s"),
              e.as("e")))).as(Seq("chunk_idx", "__c")))
      .select(col(idCol), col("chunk_idx").cast(LongType),
        col("__c.s").cast(LongType).as("start"),
        (col("__c.e") - col("__c.s") + 1).cast(LongType).as("n_tokens"),
        TextAnalysis.polyHash(
          array_join(slice(col("__tk"), col("__c.s") + 1,
            col("__c.e") - col("__c.s") + 1), " ")).as("digest"))
  }
}
