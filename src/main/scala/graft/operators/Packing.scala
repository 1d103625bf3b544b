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
      // Column-DSL integral divide (all quantities non-negative, so
      // floor == DIV) — no string splicing of caller column names
      .withColumn("shard",
        graft.functions.posIntDiv(col("offset"), lit(contextLen)))
  }

  /** Stream-packing FRAGMENTATION audit — the measurement behind the
    * contextLen choice: when documents are laid end-to-end and the tape
    * is cut every `contextLen` tokens, how many documents get split
    * across a window boundary (their loss sees a truncated context),
    * and how much of the final, partially-filled window per stream is
    * padding? Both numbers move against each other as contextLen grows
    * (fewer pad tokens per shard, more boundary-crossing docs), so a
    * pipeline tunes them off exactly this table.
    *
    * Per document the fragment count is closed-form off [[tokenShards]]'
    * offsets — `(offset+size-1) DIV C − offset DIV C + 1` for size > 0,
    * zero-token docs occupy no window — so the audit costs the same
    * per-stream prefix-sum window as the layout itself plus ONE
    * stream-keyed aggregate (`streams` output rows, chosen by the
    * caller at a few × cluster parallelism; no task sees more than
    * ~1/streams of the corpus, no global funnel). All quantities exact
    * BIGINTs; the two ratios are single 2^20 closing integral divisions.
    *
    * @return one row per stream: (stream, n_docs, n_tokens, n_shards,
    *         pad_tokens, n_split_docs, split_frac_q20, fill_q20) —
    *         `n_shards = ceil(n_tokens / contextLen)`, `pad_tokens` the
    *         empty tail of the last shard, `split_frac_q20` the 2^20
    *         fraction of docs crossing a boundary, `fill_q20` the 2^20
    *         utilization `n_tokens / (n_shards·contextLen)`.
    */
  def fragmentationAudit(docs: DataFrame, idCol: String, sizeCol: String,
                         contextLen: Long, streams: Int): DataFrame = {
    val Q = 1048576L // 2^20
    val laid = tokenShards(docs, idCol, sizeCol, contextLen, streams)
      .withColumn("__frags", when(col(sizeCol) > 0L,
        graft.functions.posIntDiv(
          col("offset") + col(sizeCol) - 1L, lit(contextLen))
          - col("shard") + 1L).otherwise(0L))
    laid.groupBy("stream")
      .agg(count(lit(1)).as("n_docs"),
        sum(col(sizeCol)).cast("long").as("n_tokens"),
        sum(when(col("__frags") >= 2L, 1L).otherwise(0L))
          .cast("long").as("n_split_docs"))
      .withColumn("n_shards", graft.functions.posIntDiv(
        col("n_tokens") + lit(contextLen - 1), lit(contextLen)))
      .withColumn("pad_tokens",
        col("n_shards") * contextLen - col("n_tokens"))
      .withColumn("split_frac_q20",
        graft.functions.posIntDiv(col("n_split_docs") * Q, col("n_docs")))
      .withColumn("fill_q20", when(col("n_shards") > 0L,
        graft.functions.posIntDiv(col("n_tokens") * Q,
          col("n_shards") * contextLen)))
      .select("stream", "n_docs", "n_tokens", "n_shards", "pad_tokens",
        "n_split_docs", "split_frac_q20", "fill_q20")
  }

  /** TRUNCATION-LOSS curve — the other side of the context-length
    * decision: if instead of packing, each document is clipped to L
    * tokens (the SFT / long-doc regime), how many documents lose tokens
    * and how much token mass is cut, for each candidate L?
    *
    * Scale shape: ONE corpus pass computing every candidate's
    * conditional sums inside a single aggregate (2 exprs per L — the
    * q302 prefix-depth discipline), then a |lengths|-way stack of the
    * one-row result: no row multiplication, no join, no second scan.
    * The curve is exact BIGINTs; `kept_frac_q20` (surviving token mass)
    * is one 2^20 closing integral division.
    *
    * @param lengths candidate context lengths, distinct and positive
    *                (bounded caller literal — one output row each)
    * @return one row per L: (context_len, n_docs, n_truncated,
    *         tokens_total, tokens_lost, kept_frac_q20); an EMPTY corpus
    *         yields zero rows (the global aggregate's n_docs = 0 row is
    *         filtered — a curve over nothing has no points, matching
    *         the cross-engine GROUP BY shape)
    */
  def truncationCurve(docs: DataFrame, sizeCol: String,
                      lengths: Seq[Long]): DataFrame = {
    require(lengths.nonEmpty && lengths.forall(_ > 0L)
      && lengths.distinct.size == lengths.size,
      "need distinct positive candidate lengths")
    val Q = 1048576L // 2^20
    val aggs = Seq(
      count(lit(1)).as("n_docs"),
      sum(col(sizeCol)).cast("long").as("tokens_total")) ++
      lengths.flatMap { l =>
        Seq(
          sum(when(col(sizeCol) > l, 1L).otherwise(0L)).cast("long")
            .as(s"__nt_$l"),
          sum(when(col(sizeCol) > l, col(sizeCol) - l).otherwise(0L))
            .cast("long").as(s"__lost_$l"))
      }
    val one = docs.agg(aggs.head, aggs.tail: _*)
    // |lengths|-way stack via ONE explode over the single aggregate row
    // (not a per-L re-select of the aggregate, which would re-run the
    // corpus scan once per candidate).
    val entries = lengths.map { l =>
      struct(lit(l).as("context_len"), col(s"__nt_$l").as("n_truncated"),
        col(s"__lost_$l").as("tokens_lost"))
    }
    one.select(col("n_docs"), col("tokens_total"),
        explode(array(entries: _*)).as("__r"))
      .select(col("__r.context_len").as("context_len"), col("n_docs"),
        col("__r.n_truncated").as("n_truncated"), col("tokens_total"),
        col("__r.tokens_lost").as("tokens_lost"))
      .withColumn("kept_frac_q20", when(col("tokens_total") > 0L,
        graft.functions.posIntDiv(
          (col("tokens_total") - col("tokens_lost")) * Q,
          col("tokens_total"))))
      .filter(col("n_docs") > 0L)
  }
}
