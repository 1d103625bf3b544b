package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Corpus-level repeated-span detection — the distributed proxy for
  * exact-substring dedup (Lee et al. 2022, "Deduplicating Training Data
  * Makes Language Models Better"): instead of a suffix array over the
  * concatenated corpus (inherently sequential), measure how much of each
  * document is covered by word n-grams that also occur in OTHER documents.
  * Pipelines use the coverage ratio as a filter ("drop docs that are >50%
  * boilerplate") or as the candidate stage before span-level excision.
  *
  * Scale shape:
  *   - shingling is a per-row projection (narrow);
  *   - the n-gram document-frequency table is one hash aggregate keyed by
  *     the gram (map-side combine collapses within-doc repeats early);
  *   - marking repeated grams is an equi-join gram→{df}: the aggregate
  *     side has ONE row per distinct gram, so the join fans out nothing;
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
    */
  def repeatedSpanCoverage(docs: DataFrame, idCol: String, textCol: String,
                           n: Int, minDocs: Int = 2): DataFrame = {
    require(n >= 1, "n-gram order must be >= 1")
    require(minDocs >= 2, "a span repeated in < 2 docs is not a duplicate")
    val toks = graft.functions.tokens(col(textCol))
    // One row per doc with its shingle array: read twice (gram explode +
    // the per-doc spine that keeps zero-coverage docs in the output), so
    // tracked in the session cache — scoped callers unpersist it.
    val base = CacheScope.track(
      docs.select(col(idCol).as("__id"), size(toks).cast(LongType).as("n_tokens"),
        graft.functions.shingles(toks, n).as("__g")))
    // posexplode index == start-token index: shingles() preserves one
    // entry per window in order, so __pos is the 0-based token offset.
    val grams = base.select(col("__id"),
      posexplode(col("__g")).as(Seq("__pos", "__gram")))
    val repeated = grams.groupBy("__gram")
      .agg(countDistinct(col("__id")).as("__df"))
      .filter(col("__df") >= minDocs)
      .select("__gram")
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
}
