package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Corpus-level repeated-span detection — the distributed proxy for
  * exact-substring dedup (Lee et al. 2022, "Deduplicating Training Data
  * Makes Language Models Better"): instead of a suffix array over the
  * concatenated corpus (inherently sequential), measure how much of each
  * document is covered by word n-grams that also occur in OTHER documents.
  * Pipelines use the coverage ratio as a filter ("drop docs that are >50%
  * boilerplate") or as the candidate stage before span-level excision.
  *
  * Scale shape:
  *   - shingling is ONE compiled pass per row (expressions/NgramHashSeq —
  *     positional gram hashes; position = array index), not five
  *     interpreted HOFs, and grams travel as 8-byte longs, not strings;
  *   - the repeated-gram filter is a plain min/max hash aggregate keyed by
  *     the gram — fully map-side combinable, so a boilerplate trigram
  *     present in a billion documents reduces to one (gram, min, max) row
  *     per map task instead of funneling a billion (gram, doc) rows
  *     through the gram's single reducer (the fate of the former
  *     countDistinct plan, whose phase-2 distinct aggregate delivers one
  *     row per distinct doc to one task — the classic hot-key skew this
  *     operator exists to survive);
  *   - marking repeated grams is an equi-join gram→{}: the aggregate side
  *     has ONE row per distinct repeated gram, so the join fans out
  *     nothing;
  *   - coverage is a per-doc distinct-position count — partitioned by
  *     doc id, bounded by document length.
  * No pairwise comparisons anywhere: unlike the O(pairs) Jaccard path,
  * repeated-span coverage is linear in total corpus tokens, which is what
  * makes it the first-pass filter at 100 TB.
  */
object Spans {

  /** Per-document coverage by corpus-repeated n-gram spans.
    *
    * A token position is "covered" when some n-gram window containing it
    * occurs in at least `minDocs` DISTINCT documents. Output: one row per
    * input document — (id, n_tokens, covered_tokens, coverage), where
    * coverage = covered/n_tokens (0.0 for empty docs).
    *
    * Overlapping repeated windows are unioned exactly (distinct positions,
    * not window-count × n), so coverage is a true fraction in [0, 1].
    * Gram identity is a 64-bit hash (same caveat as every hashed-shingle
    * operator: distinct grams collide with probability ~2^-64).
    */
  def repeatedSpanCoverage(docs: DataFrame, idCol: String, textCol: String,
                           n: Int, minDocs: Int = 2): DataFrame = {
    require(n >= 1, "n-gram order must be >= 1")
    require(minDocs >= 2, "a span repeated in < 2 docs is not a duplicate")
    // One row per doc with its positional gram-hash array: read twice
    // (gram explode + the per-doc spine that keeps zero-coverage docs in
    // the output), so tracked in the session cache — scoped callers
    // unpersist it. Both columns are single compiled passes over text.
    val base = CacheScope.track(
      docs.select(col(idCol).as("__id"),
        graft.functions.tokenCountNative(col(textCol)).as("n_tokens"),
        graft.functions.ngramHashSeq(col(textCol), n).as("__g")))
    // posexplode index == start-token index: NgramHashSeq emits one entry
    // per window in order, so __pos is the 0-based token offset.
    val grams = base.select(col("__id"),
      posexplode(col("__g")).as(Seq("__pos", "__gram")))
    // "gram occurs in >= minDocs DISTINCT docs" without a distinct
    // aggregate. minDocs=2 (the overwhelming default) needs only
    // min(id) != max(id) — min/max combine map-side, so the hot gram's
    // reducer receives one partial per map task, never one row per doc.
    // General minDocs: dedupe (gram, id) FIRST — that shuffle is keyed by
    // the PAIR, so a hot gram's rows spread across all reducers by doc id
    // — then count per gram (counts combine map-side again). Two shuffles,
    // both skew-free; still no per-gram distinct funnel.
    val repeated = (if (minDocs == 2) {
      grams.groupBy("__gram")
        .agg(min(col("__id")).as("__lo"), max(col("__id")).as("__hi"))
        .filter(col("__lo") =!= col("__hi"))
    } else {
      grams.select("__gram", "__id").distinct()
        .groupBy("__gram").agg(count(lit(1)).as("__df"))
        .filter(col("__df") >= minDocs)
    }).select("__gram")
    val covered = grams.join(repeated, "__gram")
      .select(col("__id"),
        explode(sequence(col("__pos"), col("__pos") + (n - 1))).as("__cp"))
      .groupBy("__id").agg(countDistinct(col("__cp")).as("__cov"))
    base.select(col("__id"), col("n_tokens"))
      .join(covered, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_tokens"),
        coalesce(col("__cov"), lit(0L)).as("covered_tokens"),
        when(col("n_tokens") > 0,
          coalesce(col("__cov"), lit(0L)).cast(DoubleType) /
            col("n_tokens").cast(DoubleType))
          .otherwise(lit(0.0)).as("coverage"))
  }

  /** Span EXCISION — the second half of exact-substring dedup: remove
    * from every document the token positions covered by corpus-repeated
    * n-gram windows (the positions [[repeatedSpanCoverage]] counts), and
    * reconstruct the cleaned text from the kept tokens.
    *
    * Scale shape on top of the coverage plan: the covered-position SET
    * per doc is one collect_set aggregate keyed by doc id (state bounded
    * by document length), joined back to the cached (id, tokens) spine —
    * the corpus text crosses that one id-keyed shuffle as compact token
    * arrays, once; excision itself is an ARRAY-side lambda
    * (filter-by-index + array_join), not a token-row explode, so no
    * per-token rows ever aggregate back into documents.
    *
    * @return (idCol, n_tokens, n_removed, cleaned) — cleaned is the
    *         kept tokens joined by single spaces (the tokenizer's
    *         whitespace normalization applies; "" when everything was
    *         repeated or the doc was empty).
    */
  def removeRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                          n: Int, minDocs: Int = 2): DataFrame = {
    require(n >= 1, "n-gram order must be >= 1")
    require(minDocs >= 2, "a span repeated in < 2 docs is not a duplicate")
    val base = CacheScope.track(
      docs.select(col(idCol).as("__id"),
        graft.functions.tokens(col(textCol)).as("__tk"),
        graft.functions.ngramHashSeq(col(textCol), n).as("__g")))
    val grams = base.select(col("__id"),
      posexplode(col("__g")).as(Seq("__pos", "__gram")))
    // same skew-free repeated-gram test as repeatedSpanCoverage (min≠max
    // for the default, pair-distinct then count for general minDocs)
    val repeated =
      if (minDocs == 2)
        grams.groupBy("__gram")
          .agg(min(col("__id")).as("__lo"), max(col("__id")).as("__hi"))
          .filter(col("__lo") =!= col("__hi")).select("__gram")
      else
        grams.select("__gram", "__id").distinct()
          .groupBy("__gram").agg(count(lit(1)).as("__df"))
          .filter(col("__df") >= minDocs).select("__gram")
    val covSets = grams.join(repeated, "__gram")
      .select(col("__id"),
        explode(sequence(col("__pos"), col("__pos") + (n - 1))).as("__cp"))
      .groupBy("__id").agg(collect_set(col("__cp")).as("__cps"))
    base.join(covSets, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        size(col("__tk")).cast("long").as("n_tokens"),
        coalesce(size(col("__cps")), lit(0)).cast("long").as("n_removed"),
        array_join(
          filter(col("__tk"), (_, i) =>
            not(array_contains(
              coalesce(col("__cps"), typedlit(Seq.empty[Int])), i))),
          " ").as("cleaned"))
  }
}
