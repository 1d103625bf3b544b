package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term weighting over a tokenized corpus — the relevance /
  * keyword-extraction primitive of a text pipeline.
  *
  * The idf here is the RATIONAL variant idf = (N+1)/(df+1) rather than
  * its logarithm: IEEE division is exactly rounded, so scores are
  * bit-identical across engines (a requirement of the DuckDB oracle
  * gate), while `ln` carries no such guarantee — libm and the JVM may
  * round the last ulp differently, and with small-integer tf/df pairs
  * (2·ln 4 vs 4·ln 2) even the RANKING can flip on an ulp. The rational
  * idf is strictly monotone in df, so per-document term ordering for a
  * fixed tf matches the classic formula; swap in `log(...)` when exact
  * cross-engine parity is not needed.
  *
  * Plan shape: token explode → (term, doc) hash aggregate → per-term df
  * aggregate (both map-side combinable) → join of the per-term stats
  * back onto the per-doc-term rows. No window over the corpus; the only
  * per-doc work is the final rank over that doc's own terms (bounded by
  * document vocabulary).
  *
  * The join-back is the operator's one scale decision. Keyed by term,
  * it shuffles every (doc, term) row, and a Zipfian vocabulary funnels
  * the hot terms ("the", boilerplate) into few reducers — a shuffle
  * join survives that only because AQE splits skewed partitions at
  * runtime (it does; see SCALE.md). When the DISTINCT vocabulary is
  * broadcast-sized — true for any single-language corpus, whose
  * vocabulary grows ~O(√N) (Heaps' law) while (doc, term) rows grow
  * linearly — `broadcastVocab` sidesteps the question entirely: the
  * per-term stats broadcast to every task and the dominant (doc, term)
  * side never shuffles for the join at all, skew included.
  */
object TfIdf {

  /** Per-(document, term) weights with an in-document rank.
    *
    * @param broadcastVocab broadcast the per-term df stats to the
    *        join-back (see object doc) — set when the corpus vocabulary
    *        fits the broadcast threshold; identical values either way.
    * @return (idCol, term, tf, df, tfidf, rank): tf = occurrences of term
    *         in doc, df = docs containing term, tfidf = tf·(N+1)/(df+1)
    *         (N = total docs), rank = position of the term within its doc
    *         by (tfidf desc, term asc).
    */
  def termWeights(docs: DataFrame, idCol: String, textCol: String,
                  broadcastVocab: Boolean = false): DataFrame = {
    val n = docs.count()
    val tf = docs
      .select(col(idCol), explode(graft.functions.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol)).orderBy(desc("tfidf"), col("term"))
    tf.join(if (broadcastVocab) broadcast(df) else df, "term")
      .withColumn("tfidf",
        col("tf").cast("double") * (n + 1).toDouble / (col("df") + 1))
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"), col("rank"))
  }

  /** BM25 term weights (Robertson/Spärck Jones), rational-idf variant:
    * score = idf · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)) with
    * idf = (N+1)/(df+1) — the same log-free idf as [[termWeights]], and
    * for the same reason: every operation here is a single IEEE-exact
    * multiply/divide on exactly-representable inputs, so scores (and
    * rankings) hash-match across engines, while the classic
    * ln((N−df+0.5)/(df+0.5)+1) idf is libm-dependent in its last ulp.
    * Swap the idf column for the log form when classic BM25 is wanted
    * and cross-engine parity is not.
    *
    * Plan shape = [[termWeights]] plus one per-doc running sum: document
    * length dl is Σtf over the doc's own term rows (a window bounded by
    * document vocabulary — no second scan of the text, no join back by
    * id), and avgdl = total tokens / N is one scalar aggregate. The
    * saturation denominator is what makes BM25 the production scorer:
    * tf's contribution is bounded by k1+1, so a keyword-stuffed document
    * cannot dominate a posting list — at corpus scale that bound is also
    * a skew guard for downstream top-k consumers.
    *
    * @param broadcastVocab as in [[termWeights]].
    * @return (idCol, term, tf, df, dl, bm25, rank); rank orders terms
    *         within a doc by (bm25 desc, term asc).
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           k1: Double = 1.2, b: Double = 0.75,
           broadcastVocab: Boolean = false): DataFrame = {
    val n = docs.count()
    val tf = docs
      .select(col(idCol), explode(graft.functions.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
      .transform(CacheScope.track) // scalar-agg'd for avgdl, then re-read
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // avgdl over ALL docs incl. token-less ones: total tokens / N. Both
    // operands are exact longs below 2^53 — the division is the single
    // rounding, identical in any IEEE engine.
    val totalTokens = tf.agg(coalesce(sum(col("tf")), lit(0L))).head.getLong(0)
    val avgdl = totalTokens.toDouble / n
    val dlW = Window.partitionBy(col(idCol))
    val rankW = Window.partitionBy(col(idCol)).orderBy(desc("bm25"), col("term"))
    val tfD = col("tf").cast("double")
    tf.join(if (broadcastVocab) broadcast(df) else df, "term")
      .withColumn("dl", sum(col("tf")).over(dlW))
      // parenthesization mirrored EXACTLY by the oracle SQL: each
      // intermediate is one IEEE-rounded op, so bit-equality holds
      .withColumn("bm25",
        (lit((n + 1).toDouble) / (col("df") + 1)) *
          (tfD * lit(k1 + 1)) /
          (tfD + lit(k1) * (lit(1 - b) + (lit(b) * col("dl")) / lit(avgdl))))
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .select(col(idCol), col("term"), col("tf"), col("df"), col("dl"),
        col("bm25"), col("rank"))
  }
}
