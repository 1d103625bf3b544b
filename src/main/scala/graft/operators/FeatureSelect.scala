package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Label-association feature selection over token presence — the
  * vocabulary-pruning step before training a bag-of-words quality /
  * domain classifier ([[LinearModel]]): keep the tokens whose presence
  * is most associated with the label, drop the noise dimensions.
  *
  * The statistic is the classic 2×2 chi-squared over per-document token
  * PRESENCE (not counts) against a binary label:
  *
  *   χ²(t) = N·(n11·n00 − n10·n01)² / ((n11+n01)(n10+n00)(n11+n10)(n01+n00))
  *
  * Why chi-squared and not mutual information: MI needs log(), whose
  * last-bit behavior differs across libm implementations — χ² is RATIONAL
  * in the four cell counts, so with exact BIGINT cells the whole score is
  * two exactly-representable integer-valued doubles and one division:
  * bit-identical in any IEEE engine, hence oracle-checkable.
  *
  * Exactness bound (documented contract, mirrors [[Regression]]):
  * |n11·n00 − n10·n01| ≤ N²/4, and its double square must stay exact-
  * rounded-equal across engines, which holds while N²/4 ≤ 2⁵³ — i.e.
  * corpora up to ~1.9·10⁸ documents per chi-squared run; shard or sample
  * beyond that.
  *
  * Scale shape: one explode of per-doc DISTINCT tokens (output bounded by
  * Σ|vocab per doc|, the same volume every inverted-index/TF-IDF pass
  * here already shuffles), one hash aggregate by token with map-side
  * combine to (n11, n01) pairs, a broadcast of the two scalar label
  * totals, and a TakeOrderedAndProject top-k — no all-pairs, no window
  * over the corpus.
  */
object FeatureSelect {

  /** Top-k tokens by chi-squared association with a boolean label.
    *
    * @param docs     corpus
    * @param idCol    document id column name
    * @param textCol  text column name (tokenized via the house
    *                 whitespace rule, presence = distinct per doc)
    * @param label    boolean Column evaluated per document
    * @param minDf    minimum document frequency (n11+n01) for a token to
    *                 be scored — the df cut every real vocab pass applies
    * @param topK     tokens kept
    * @return (token, n11, n10, n01, n00, chi2) ordered by
    *         (chi2 desc, token) — ties broken textually for determinism
    */
  def chiSquaredTokens(docs: DataFrame, idCol: String, textCol: String,
                       label: Column, minDf: Long, topK: Int): DataFrame = {
    require(topK > 0, "topK must be positive")
    val labeled = docs.select(col(idCol).as("__id"),
      when(label, 1L).otherwise(0L).as("__y"),
      array_distinct(TextAnalysis.tokens(col(textCol))).as("__tk"))
    val totals = labeled.agg(
      sum(col("__y")).as("n1"),
      sum(lit(1L) - col("__y")).as("n0"))
    val cells = labeled
      .select(col("__y"), explode(col("__tk")).as("token"))
      .groupBy("token")
      .agg(sum(col("__y")).as("n11"),
        sum(lit(1L) - col("__y")).as("n01"))
      .filter(col("n11") + col("n01") >= minDf)
      .crossJoin(broadcast(totals))
      .select(col("token"), col("n11"),
        (col("n1") - col("n11")).as("n10"),
        col("n01"),
        (col("n0") - col("n01")).as("n00"),
        (col("n1") + col("n0")).as("__n"))
    // Fixed-order double tail: num and each marginal are integer-valued
    // doubles (exact ≤ 2^53 per the object doc), one division at the end.
    val num = (col("n11") * col("n00") - col("n10") * col("n01"))
      .cast("double")
    val denom = (col("n11") + col("n01")).cast("double") *
      (col("n10") + col("n00")).cast("double") *
      (col("n11") + col("n10")).cast("double") *
      (col("n01") + col("n00")).cast("double")
    cells
      // degenerate marginals (a label class absent, or a token in every
      // document) carry no signal — dropped rather than emitted as NULL,
      // which would also sort differently across engines' ORDER BY.
      .filter(denom =!= 0.0)
      .withColumn("chi2", col("__n").cast("double") * num * num / denom)
      .select(col("token"), col("n11"), col("n10"), col("n01"), col("n00"),
        col("chi2"))
      .orderBy(desc("chi2"), col("token"))
      .limit(topK)
  }
}
