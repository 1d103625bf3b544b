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

  /** VARIABLE-LENGTH repeated-substring runs — the ExactSubstr measure
    * (Lee et al. 2022 §4, "Deduplicating Training Data Makes Language
    * Models Better"): a token position is DUPLICATED when some
    * `minLen`-token window containing it occurs ≥ `minCount` times in
    * the corpus — occurrence count, not distinct documents, so a
    * substring repeated twice INSIDE one document counts, exactly as a
    * suffix array over the concatenated corpus would see it. The
    * duplicated positions then merge into maximal contiguous RUNS: a
    * repeated substring of length L ≥ minLen yields L−minLen+1
    * duplicated window starts whose spans union to the full L-token
    * run, so the per-doc `max_run` reads the length of the longest
    * repeated region (length ≫ minLen visible as ≫, where fixed-k
    * coverage saturates at "covered") and `n_dup_tokens` is the exact
    * excisable mass without over-counting overlapping shingles. Runs
    * are unions of overlapping repeats — the excision unit the paper
    * actually cuts.
    *
    * Exactly the suffix-array detection set, Spark-shaped: sorted
    * suffix ranks compare adjacent suffixes' shared prefix ≥ minLen,
    * which holds iff the two minLen-windows at those starts are equal
    * — i.e. iff the window's corpus occurrence count is ≥ 2. The
    * gram-keyed aggregate computes that membership with map-side
    * combines (no sequential suffix sort, no corpus-wide window); the
    * run merge is a row-local fold over each doc's SORTED duplicated
    * starts (state bounded by document length — the covSets
    * discipline).
    *
    * Gram identity is the usual 64-bit hash (collision ~2⁻⁶⁴).
    *
    * @param minLen   window length (the paper uses 50 BPE tokens;
    *                 gates use smaller for fixture visibility)
    * @param minCount corpus occurrence threshold (≥ 2)
    * @return (idCol, n_tokens, n_dup_tokens, n_runs, max_run,
    *         dup_frac_q20) — zeros for docs with no duplicated window;
    *         dup_frac_q20 = ⌊n_dup_tokens·2²⁰/n_tokens⌋ (NULL on empty
    *         docs)
    */
  /** EXCISION of [[duplicatedRuns]]' covered positions — the second
    * half of ExactSubstr dedup at VARIABLE length (Lee et al. 2022 cut
    * exactly these maximal duplicated spans from the training text):
    * every token inside any duplicated run is removed and the cleaned
    * text rebuilt from the kept tokens. `n_removed` equals
    * [[duplicatedRuns]]' `n_dup_tokens` by construction (one shared
    * covered-position set).
    *
    * Scale shape: the [[removeRepeatedSpans]] discipline — duplicated
    * STARTS collect per doc (bounded by document length), positions
    * expand row-locally (flatten + distinct inside the row), excision
    * is an array-lambda filter-by-index; the corpus text crosses one
    * id-keyed shuffle as token arrays.
    *
    * @return (idCol, n_tokens, n_removed, cleaned)
    */
  def removeDuplicatedRuns(docs: DataFrame, idCol: String, textCol: String,
                           minLen: Int, minCount: Int = 2): DataFrame = {
    require(minLen >= 2, "need minLen >= 2")
    require(minCount >= 2, "a window seen < 2 times is not a duplicate")
    val base = CacheScope.track(
      docs.select(col(idCol).as("__id"),
        graft.functions.tokens(col(textCol)).as("__tk"),
        graft.functions.ngramHashSeq(col(textCol), minLen).as("__g")))
    val grams = base.select(col("__id"),
      posexplode(col("__g")).as(Seq("__pos", "__gram")))
    val repeated = grams.groupBy("__gram")
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minCount).select("__gram")
    val covStarts = grams.join(repeated, "__gram")
      .groupBy("__id").agg(collect_set(col("__pos")).as("__ss"))
    base.join(covStarts, Seq("__id"), "left")
      .withColumn("__cps", array_distinct(flatten(transform(
        coalesce(col("__ss"), typedlit(Seq.empty[Int])),
        s => sequence(s, s + (minLen - 1))))))
      .select(col("__id").as(idCol),
        size(col("__tk")).cast("long").as("n_tokens"),
        size(col("__cps")).cast("long").as("n_removed"),
        array_join(
          filter(col("__tk"), (_, i) =>
            not(array_contains(col("__cps"), i))), " ").as("cleaned"))
  }

  def duplicatedRuns(docs: DataFrame, idCol: String, textCol: String,
                     minLen: Int, minCount: Int = 2): DataFrame = {
    require(minLen >= 2, "need minLen >= 2")
    require(minCount >= 2, "a window seen < 2 times is not a duplicate")
    val base = CacheScope.track(
      docs.select(col(idCol).as("__id"),
        graft.functions.tokenCountNative(col(textCol)).as("n_tokens"),
        graft.functions.ngramHashSeq(col(textCol), minLen).as("__g")))
    val grams = base.select(col("__id"),
      posexplode(col("__g")).as(Seq("__pos", "__gram")))
    // occurrence-count threshold: one gram-keyed count aggregate,
    // map-side combinable — a boilerplate window in a billion docs
    // reduces to one partial per map task
    val repeated = grams.groupBy("__gram")
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minCount).select("__gram")
    // per-doc sorted duplicated starts, then ONE row-local interval
    // merge: intervals [s, s+minLen) over ascending s — extend while
    // s <= curEnd, else close the run. State: (curStart, curEnd,
    // n_runs, covered, maxRun); finish closes the open run.
    val runStats = grams.join(repeated, "__gram")
      .groupBy("__id")
      .agg(sort_array(collect_set(col("__pos"))).as("__ss"))
      .select(col("__id"), aggregate(col("__ss"),
        struct(lit(-1).as("cs"), lit(-1).as("ce"),
          lit(0L).as("nr"), lit(0L).as("cov"), lit(0L).as("mx")),
        (st, s) => {
          val runLen = (st.getField("ce") - st.getField("cs")).cast("long")
          when(st.getField("cs") === -1,
            struct(s.as("cs"), (s + minLen).as("ce"),
              st.getField("nr").as("nr"), st.getField("cov").as("cov"),
              st.getField("mx").as("mx")))
            .when(s <= st.getField("ce"),
              struct(st.getField("cs").as("cs"), (s + minLen).as("ce"),
                st.getField("nr").as("nr"), st.getField("cov").as("cov"),
                st.getField("mx").as("mx")))
            .otherwise(
              struct(s.as("cs"), (s + minLen).as("ce"),
                (st.getField("nr") + 1L).as("nr"),
                (st.getField("cov") + runLen).as("cov"),
                greatest(st.getField("mx"), runLen).as("mx")))
        },
        st => {
          val runLen = (st.getField("ce") - st.getField("cs")).cast("long")
          when(st.getField("cs") === -1,
            struct(lit(0L).as("nr"), lit(0L).as("cov"), lit(0L).as("mx")))
            .otherwise(struct(
              (st.getField("nr") + 1L).as("nr"),
              (st.getField("cov") + runLen).as("cov"),
              greatest(st.getField("mx"), runLen).as("mx")))
        }).as("__rs"))
    base.select(col("__id"), col("n_tokens"))
      .join(runStats, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        col("n_tokens").cast("long").as("n_tokens"),
        coalesce(col("__rs.cov"), lit(0L)).as("n_dup_tokens"),
        coalesce(col("__rs.nr"), lit(0L)).as("n_runs"),
        coalesce(col("__rs.mx"), lit(0L)).as("max_run"),
        when(col("n_tokens") > 0, graft.functions.posIntDiv(
          coalesce(col("__rs.cov"), lit(0L)) * 1048576L,
          col("n_tokens").cast("long"))).as("dup_frac_q20"))
  }
}
