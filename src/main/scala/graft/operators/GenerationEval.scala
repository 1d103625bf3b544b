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

  /** Per-pair ROUGE-L: precision / recall / F1 from the LONGEST COMMON
    * SUBSEQUENCE of the two token sequences (Lin 2004 §3) — the
    * order-sensitive companion to [[rougeN]]: scattered word overlap
    * scores low, preserved sentence structure scores high, without
    * fixing a gram order n.
    *
    * The LCS runs through [[graft.functions.lcsTokenLength]] — a native
    * codegen'd O(n·m) two-row DP — so the whole operator is a PURE
    * PROJECTION: no explode, no aggregate, no shuffle; at 100 TB it is
    * one codegen'd scan of the pair table. Both sides are truncated to
    * `maxTokens` first (the quadratic kernel needs a stated bound — the
    * [[Profiling]] maxSupport discipline; standard ROUGE tooling
    * truncates likewise), and the reported token counts are the
    * TRUNCATED lengths, so every emitted ratio is exactly consistent
    * with its numerator.
    *
    * Metrics are one 2^20 closing integral division each (same NULL
    * rules as [[rougeN]]: a side with zero tokens has NULL ratio, F1
    * NULL only when both are empty).
    *
    * @return one row per pair: (idCol, n_cand_tokens, n_ref_tokens,
    *         lcs_len, rouge_l_p_q20, rouge_l_r_q20, rouge_l_f1_q20,
    *         rouge_l_p, rouge_l_r, rouge_l_f1)
    */
  def rougeL(pairs: DataFrame, idCol: String, candCol: String,
             refCol: String, maxTokens: Int = 256): DataFrame = {
    require(maxTokens >= 1 && maxTokens <= 4096,
      "need 1 <= maxTokens <= 4096 (quadratic-kernel bound)")
    val Q = 1048576L
    def toks(c: Column): Column =
      slice(TextAnalysis.tokens(coalesce(c, lit(""))), 1, maxTokens)
    def ratioQ(num: Column, den: Column): Column =
      when(den > 0L, graft.functions.posIntDiv(num * Q, den))
    pairs.select(col(idCol),
        toks(col(candCol)).as("__ct"), toks(col(refCol)).as("__rt"))
      .select(col(idCol),
        size(col("__ct")).cast("long").as("n_cand_tokens"),
        size(col("__rt")).cast("long").as("n_ref_tokens"),
        graft.functions.lcsTokenLength(col("__ct"), col("__rt"))
          .as("lcs_len"))
      .withColumn("rouge_l_p_q20", ratioQ(col("lcs_len"),
        col("n_cand_tokens")))
      .withColumn("rouge_l_r_q20", ratioQ(col("lcs_len"),
        col("n_ref_tokens")))
      .withColumn("rouge_l_f1_q20", ratioQ(lit(2L) * col("lcs_len"),
        col("n_cand_tokens") + col("n_ref_tokens")))
      .withColumn("rouge_l_p", col("rouge_l_p_q20").cast("double") / Q)
      .withColumn("rouge_l_r", col("rouge_l_r_q20").cast("double") / Q)
      .withColumn("rouge_l_f1", col("rouge_l_f1_q20").cast("double") / Q)
  }

  /** ROW-LOCAL ROUGE-N counts — the streaming-safe variant: a pure
    * projection returning struct(n_cand_grams, n_ref_grams, overlap)
    * for one (candidate, reference) pair, no shuffle, composable into a
    * stateless stream (the [[Bpe.maxMatchCounts]] discipline). Clipped
    * overlap is computed per DISTINCT candidate gram via bounded-array
    * HOFs — O(d·(|c|+|r|)) per row, the per-occurrence price of
    * statelessness; prefer [[rougeN]] for batch corpora (its gram
    * aggregate is map-side combinable and never quadratic). Both paths
    * return identical counts (spec-pinned).
    */
  def rougeCounts(cand: Column, ref: Column, n: Int): Column = {
    require(n >= 1 && n <= 8, "need 1 <= n <= 8")
    def grams(c: Column): Column =
      graft.functions.shingles(TextAnalysis.tokens(coalesce(c, lit(""))), n)
    // bind both gram arrays ONCE (the shingles HOF-trap discipline):
    // every inner filter/size reads a lambda-variable field, so the
    // upstream tokenize+shingle runs once per row, not once per gram
    element_at(
      transform(array(struct(grams(cand).as("c"), grams(ref).as("r"))),
        p => {
          val cg = p.getField("c")
          val rg = p.getField("r")
          struct(
            size(cg).cast("long").as("n_cand_grams"),
            size(rg).cast("long").as("n_ref_grams"),
            aggregate(array_distinct(cg), lit(0L), (acc, g) =>
              acc + least(
                size(filter(cg, x => x === g)),
                size(filter(rg, x => x === g))).cast("long"))
              .as("overlap"))
        }),
      1)
  }
}
