package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concatenate-and-chunk step of an LLM
  * pre-training pipeline: documents are laid out end-to-end in a token
  * stream and the stream is cut into fixed-size context windows
  * ("shards"). Each document needs its absolute token offset, which is a
  * running sum — inherently sequential, so the scale lever is to run MANY
  * independent streams: each document hashes to one of `streams` streams,
  * and the cumulative sum is a window per stream.
  *
  * Scale shape: the per-stream window sorts corpus/streams rows; pick
  * `streams` at a few × cluster parallelism and no task ever sees more
  * than ~1/streams of the corpus — unlike a single global running sum,
  * which is the one-task funnel this operator exists to avoid. Every
  * quantity is integer arithmetic on the deterministic hashBucket stream
  * assignment, so shard layout is reproducible across runs and engines.
  */
object Packing {

  /** @param docs       input table
    * @param idCol      unique long document id (stream assignment + the
    *                   deterministic order within a stream)
    * @param sizeCol    long token count of the document
    * @param contextLen tokens per training shard (> 0)
    * @param streams    number of independent token streams (> 0)
    * @return one row per document: (idCol, sizeCol, stream, offset,
    *         shard) — `offset` is the document's first-token position in
    *         its stream's concatenated tape, `shard = offset DIV
    *         contextLen` the context window in which the document STARTS
    *         (documents spanning a boundary stay whole; shards are
    *         addressed by (stream, shard)).
    */
  def tokenShards(docs: DataFrame, idCol: String, sizeCol: String,
                  contextLen: Long, streams: Int): DataFrame = {
    require(contextLen > 0 && streams > 0)
    val w = Window.partitionBy(col("stream")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol), col(sizeCol))
      .withColumn("stream", Sampling.hashBucket(col(idCol), streams))
      .withColumn("offset", sum(col(sizeCol)).over(w) - col(sizeCol))
      .withColumn("shard", expr(s"offset DIV ${contextLen}L"))
  }
}
