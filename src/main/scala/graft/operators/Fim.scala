package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fill-in-the-middle (FIM) transformation — the pre-training data
  * rewrite behind infilling-capable code models (Bavarian et al. 2022,
  * "Efficient Training of Language Models to Fill in the Middle"): a
  * document is split into (prefix, middle, suffix) and re-serialized in
  * PSM order `⟨PRE⟩prefix⟨SUF⟩suffix⟨MID⟩middle`, so the model learns
  * to generate a span conditioned on BOTH sides. This operator is the
  * corpus-side transform + its conservation audit, not a trainer.
  *
  * Boundaries are TOKEN positions (first/second third of the token
  * sequence: p1 = n DIV 3, p2 = 2n DIV 3) rather than raw character
  * offsets: token arrays are the one text segmentation this engine
  * already guarantees cross-engine byte-identical
  * ([[graft.functions.tokens]]' explicit whitespace class), whereas
  * character slicing would ride on each engine's unicode substring
  * semantics. The paper applies FIM at the character level before
  * tokenization; at token granularity the transform is the same split
  * with boundaries snapped to whitespace — and the deterministic
  * thirds split (vs the paper's uniform random cut) keeps the output a
  * pure function of the input row, the engine-wide no-rand() rule.
  *
  * Conservation invariant: `n_pre + n_mid + n_suf == n_tokens` on every
  * row (the spec enforces it) — FIM reorders, never drops. Documents
  * under `minTokens` pass through unsplit (`fim_applied = false`,
  * rendered = the space-joined token sequence with no sentinels), the
  * paper's "FIM rate < 1" regime where part of the corpus stays
  * autoregressive.
  *
  * Scale shape: ONE codegen'd projection — tokenize, three
  * `slice`/`array_join`s, one concat; no explode, no aggregate, no
  * shuffle. At 100 TB this is a map-only rewrite that pipelines into
  * the writer.
  */
object Fim {

  val PrefixTag = "<|fim_pre|>"
  val SuffixTag = "<|fim_suf|>"
  val MiddleTag = "<|fim_mid|>"

  /** @param minTokens documents with fewer tokens stay autoregressive
    *                  (a 2-token doc has no non-trivial 3-way split)
    * @return one row per doc: (idCol, n_tokens, n_pre, n_mid, n_suf,
    *         fim_applied, fim_text, n_chars)
    */
  def fimRender(docs: DataFrame, idCol: String, textCol: String,
                minTokens: Int = 3): DataFrame = {
    require(minTokens >= 3, "a 3-way split needs at least 3 tokens")
    val toks = graft.functions.tokens(coalesce(col(textCol), lit("")))
    def joined(c: Column): Column = array_join(c, " ")
    val n = col("n_tokens")
    val p1 = col("__p1")
    val p2 = col("__p2")
    docs.select(col(idCol), toks.as("__tk"))
      .withColumn("n_tokens", size(col("__tk")).cast("long"))
      .withColumn("__p1", expr("n_tokens DIV 3"))
      .withColumn("__p2", expr("(2 * n_tokens) DIV 3"))
      .withColumn("fim_applied", n >= minTokens.toLong)
      .withColumn("n_pre", when(col("fim_applied"), p1).otherwise(n))
      .withColumn("n_mid", when(col("fim_applied"), p2 - p1)
        .otherwise(0L))
      .withColumn("n_suf", when(col("fim_applied"), n - p2)
        .otherwise(0L))
      .withColumn("fim_text", when(col("fim_applied"),
          concat(lit(PrefixTag),
            joined(slice(col("__tk"), lit(1), p1.cast("int"))),
            lit(SuffixTag),
            joined(slice(col("__tk"), (p2 + 1L).cast("int"),
              (n - p2).cast("int"))),
            lit(MiddleTag),
            joined(slice(col("__tk"), (p1 + 1L).cast("int"),
              (p2 - p1).cast("int")))))
        .otherwise(joined(col("__tk"))))
      .withColumn("n_chars", length(col("fim_text")).cast("long"))
      .select(idCol, "n_tokens", "n_pre", "n_mid", "n_suf",
        "fim_applied", "fim_text", "n_chars")
  }
}
