package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-generation overlap metrics — the eval tier for SUMMARIZATION /
  * generation quality (Lin 2004, "ROUGE: A Package for Automatic
  * Evaluation of Summaries"). A model-output table pairs each candidate
  * text with its reference; ROUGE-N is n-gram overlap with CLIPPED
  * counts (each reference gram credits at most as many candidate
  * occurrences as the reference itself has — the anti-gaming rule that
  * separates ROUGE from naive gram-set Jaccard: a candidate repeating
  * one reference word 50× scores 1/50 precision, not 1).
  *
  * Exactness: gram identity is the literal space-joined token string
  * (the q87 n-gram-familiarity discipline — no hash, no collision
  * caveat); counts and clipped overlaps are exact BIGINTs; each
  * emitted metric is ONE closing integral division in 2^20 fixed point
  * (`posIntDiv` — exact floor, the oracle replays `// ` bit-for-bit)
  * plus its exact 2^-20 double rescale.
  *
  * Scale shape: one scan of the pair table computes both sides' gram
  * arrays map-side (the shingle machinery is HOF-trap-safe), one
  * explode to (pair, gram, side) rows, then two hash-aggregates — the
  * first keyed (pair, gram) (map-side combinable; clipping is a
  * per-key `least`), the second keyed pair. No joins beyond the final
  * broadcast-shaped left join back to the pair spine (pairs whose both
  * sides are shorter than n tokens vanish under explode and must
  * surface as zero-gram rows, not disappear). Nothing is ever
  * all-pairs: the caller supplies WHICH candidate pairs with WHICH
  * reference — this operator never generates candidates.
  */
object GenerationEval {

  /** Per-pair ROUGE-N precision / recall / F1 with clipped counts.
    *
    * `overlap = Σ_g min(cand_count(g), ref_count(g))`;
    * `P = overlap / |cand grams|`, `R = overlap / |ref grams|`,
    * `F1 = 2·overlap / (|cand| + |ref|)` — the harmonic mean collapses
    * to one division because P and R share the `overlap` numerator.
    *
    * Degenerate sides: a side with < n tokens has zero grams — its
    * ratio is NULL (0/0 has no value), while the opposite ratio stays
    * defined (overlap is then 0, so e.g. precision against an empty
    * reference is exactly 0). F1 is NULL only when BOTH sides are
    * empty. NULL texts count as empty.
    *
    * @param pairs   one row per (candidate, reference) pair
    * @param idCol   pair key (unique in `pairs`; the join-back spine)
    * @param candCol candidate (model output) text column name
    * @param refCol  reference (gold) text column name
    * @param n       gram order (1 = unigram ROUGE-1, 2 = ROUGE-2, …)
    * @return one row per pair: (idCol, n_cand_grams, n_ref_grams,
    *         overlap, rouge_p_q20, rouge_r_q20, rouge_f1_q20, rouge_p,
    *         rouge_r, rouge_f1)
    */
  def rougeN(pairs: DataFrame, idCol: String, candCol: String,
             refCol: String, n: Int): DataFrame = {
    require(n >= 1 && n <= 8, "need 1 <= n <= 8")
    val Q = 1048576L // 2^20
    def grams(c: Column): Column =
      graft.functions.shingles(TextAnalysis.tokens(coalesce(c, lit(""))), n)
    // one scan, one explode: both sides ride one array of (side, gram)
    // structs so the pair table is read once, not once per side
    val sides = pairs.select(col(idCol).as("__id"),
        explode(concat(
          transform(grams(col(candCol)), g =>
            struct(lit(0).as("side"), g.as("g"))),
          transform(grams(col(refCol)), g =>
            struct(lit(1).as("side"), g.as("g"))))).as("__sg"))
      .select(col("__id"), col("__sg.side").as("__side"),
        col("__sg.g").as("__g"))
    val perGram = sides.groupBy("__id", "__g")
      .agg(count(when(col("__side") === 0, 1)).as("__cc"),
        count(when(col("__side") === 1, 1)).as("__rc"))
    val per = perGram.groupBy("__id")
      .agg(sum(col("__cc")).as("n_cand_grams"),
        sum(col("__rc")).as("n_ref_grams"),
        sum(least(col("__cc"), col("__rc"))).as("overlap"))
    def ratioQ(num: Column, den: Column): Column =
      when(den > 0L, graft.functions.posIntDiv(num * Q, den))
    pairs.select(col(idCol))
      .join(per.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_cand_grams"), lit(0L)).as("n_cand_grams"),
        coalesce(col("n_ref_grams"), lit(0L)).as("n_ref_grams"),
        coalesce(col("overlap"), lit(0L)).as("overlap"))
      .withColumn("rouge_p_q20", ratioQ(col("overlap"), col("n_cand_grams")))
      .withColumn("rouge_r_q20", ratioQ(col("overlap"), col("n_ref_grams")))
      .withColumn("rouge_f1_q20", ratioQ(lit(2L) * col("overlap"),
        col("n_cand_grams") + col("n_ref_grams")))
      .withColumn("rouge_p", col("rouge_p_q20").cast("double") / Q)
      .withColumn("rouge_r", col("rouge_r_q20").cast("double") / Q)
      .withColumn("rouge_f1", col("rouge_f1_q20").cast("double") / Q)
  }
}
