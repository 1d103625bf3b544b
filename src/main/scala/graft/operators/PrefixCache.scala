package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prompt prefix-sharing statistics — the sizing measurement behind
  * inference-time prefix caching (serving stacks reuse the KV cache of
  * a shared prompt prefix across requests; how much is shareable is a
  * corpus property, and measuring it is the first step of capacity
  * planning for a serving fleet). For each probe depth d: how many
  * documents share their first-d-token prefix with another document,
  * and how many tokens of recompute a one-resident-copy prefix cache
  * would save.
  *
  * Exactness: a prefix is keyed by the SAME compiled positional gram
  * hash the n-gram family uses ([[graft.functions.polyGramHashSeq]]
  * element 1 — the hash of tokens 1..d), so the DuckDB oracle replays
  * it bit-for-bit; counts are exact integers and `saved_frac` is the
  * single closing division. Hash-collision caveat (mod 1e9+7) is the
  * standard fingerprint tradeoff, shared with the dedup family.
  *
  * Scale shape: ONE corpus scan computes every depth's prefix hash
  * (an array of |depths| structs per doc, exploded), then one
  * hash-aggregate keyed (depth, hash) — map-side combinable — and a
  * second bounded aggregate to |depths| rows. No joins, no windows;
  * the shuffle carries one row per (doc, depth).
  */
object PrefixCache {

  /** Per-depth prefix-sharing statistics.
    *
    * @param depths distinct probe depths in tokens (e.g. 4, 16, 64) —
    *               bounded, each adds one struct per doc to the scan
    * @return one row per depth: (depth, n_docs — docs with ≥ depth
    *         tokens, n_prefixes — distinct prefixes among them,
    *         n_shared_prefixes — prefixes held by ≥ 2 docs,
    *         n_docs_sharing — docs in those groups, tokens_saved —
    *         Σ(group−1)·depth, the recompute a one-copy-resident cache
    *         avoids, saved_frac = tokens_saved/(n_docs·depth))
    */
  def prefixSharingStats(docs: DataFrame, idCol: String, textCol: String,
                         depths: Seq[Int]): DataFrame = {
    require(depths.nonEmpty && depths.forall(_ >= 1), "bad depths")
    require(depths.distinct.size == depths.size, "duplicate depths")
    // try_element_at, not element_at: a doc shorter than d tokens has an
    // EMPTY positional-hash array, which must yield NULL (no prefix),
    // not an ANSI array-index error
    val perDepth = array(depths.map(d =>
      struct(lit(d).as("depth"),
        try_element_at(graft.functions.polyGramHashSeq(col(textCol), d),
          lit(1)).as("h"))): _*)
    val rows = docs.select(explode(perDepth).as("dh"))
      .select(col("dh.depth").as("depth"), col("dh.h").as("__h"))
      .filter(col("__h").isNotNull) // doc shorter than depth: no prefix
    val groups = rows.groupBy("depth", "__h").agg(count(lit(1)).as("__c"))
    groups.groupBy("depth")
      .agg(sum(col("__c")).as("n_docs"),
        count(lit(1)).as("n_prefixes"),
        count(when(col("__c") >= 2, 1)).as("n_shared_prefixes"),
        coalesce(sum(when(col("__c") >= 2, col("__c"))), lit(0L))
          .as("n_docs_sharing"))
      .withColumn("tokens_saved",
        (col("n_docs_sharing") - col("n_shared_prefixes")) *
          col("depth").cast("long"))
      .withColumn("saved_frac",
        when(col("n_docs") > 0, col("tokens_saved").cast("double") /
          (col("n_docs").cast("double") * col("depth").cast("double"))))
  }
}
