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

  /** [[familiarity]] under a FROZEN reference model — the CCNet shape
    * (Wenzek 2020, "CCNet: Extracting High Quality Monolingual Datasets
    * from Web Crawl Data": a LM trained on a trusted reference corpus
    * perplexity-ranks the crawl; documents scoring far from the
    * reference are dropped or binned). The gram frequency table is
    * trained on `reference`, FROZEN, and the disjoint `batch` is scored
    * against it — the deployment shape: ship the model table, never
    * re-score the reference per batch.
    *
    * Semantics vs the self-scoring form: `sum_freq` sums REFERENCE
    * frequencies (grams absent from the reference contribute 0), and
    * `n_known` counts occurrences whose gram exists in the reference at
    * all (in-vocabulary rate — self-scoring's ≥2 rule exists to exclude
    * the occurrence's own count, which a disjoint reference never
    * includes). Low familiarity = phrasing the reference never saw —
    * the filter signal.
    *
    * Scale shape: the model table is bounded by the reference's
    * distinct grams (Heaps-sublinear); scoring is ONE gram-keyed LEFT
    * equi-join (both sides shuffle on the gram key — or the model
    * broadcasts when it fits) plus one map-side-combinable per-doc
    * aggregate. Nothing is all-pairs; the reference corpus is scanned
    * once per model build, not per batch.
    *
    * @return one row per batch doc: (idCol, n_grams, sum_freq, n_known,
    *         familiarity, known_ratio) — same contract as
    *         [[familiarity]]; sub-n-token docs keep zeros/NULLs.
    */
  def familiarityWith(batch: DataFrame, idCol: String, textCol: String,
                      reference: DataFrame, refTextCol: String,
                      n: Int = 2): DataFrame = {
    require(n >= 1, "need n >= 1")
    val stats = familiarityAgainst(batch, idCol, textCol,
      gramModel(reference, refTextCol, n), "model_freq", n)
    batch.select(col(idCol))
      .join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("sum_freq"), lit(0L)).as("sum_freq"),
        coalesce(col("n_known"), lit(0L)).as("n_known"),
        col("familiarity"), col("known_ratio"))
  }

  /** The FROZEN gram-frequency model itself — the artifact
    * [[familiarityWith]] trains and the artifact a deployment ships:
    * one row per distinct reference gram with its occurrence count.
    * Bounded by the reference's distinct grams (Heaps-sublinear).
    */
  def gramModel(reference: DataFrame, refTextCol: String,
                n: Int = 2): DataFrame = {
    require(n >= 1, "need n >= 1")
    reference.select(explode(graft.functions.shingles(
        TextAnalysis.tokens(col(refTextCol)), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("model_freq"))
  }

  /** Score a batch against an ALREADY-BUILT frozen model table — the
    * STREAM-SHAPED core of [[familiarityWith]]: gram explode →
    * stream-static-joinable LEFT equi-join on the gram key → one
    * per-doc aggregate. Runs unchanged when `batch` is a STREAMING
    * DataFrame and `model` is static (update/complete output mode —
    * the incremental-ingest deployment: ship the model once, score
    * each crawl batch as it lands; StreamingSpec locks batch parity).
    *
    * Contract difference vs [[familiarityWith]], inherent to the
    * stream shape: documents with no grams (< n tokens) emit NO row —
    * a stream cannot left-join its own spine. The batch wrapper adds
    * the spine zeros back; a streaming caller treats absence as
    * "no signal" (CCNet drops those docs anyway).
    */
  def familiarityAgainst(batch: DataFrame, idCol: String, textCol: String,
                         model: DataFrame, freqCol: String = "model_freq",
                         n: Int = 2): DataFrame = {
    require(n >= 1, "need n >= 1")
    val grams = batch.select(col(idCol),
      explode(graft.functions.shingles(
        TextAnalysis.tokens(col(textCol)), n)).as("gram"))
    grams.join(model.select(col("gram"), col(freqCol).as("__cnt")),
        Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__cnt"), lit(0L))).as("sum_freq"),
        count(col("__cnt")).as("n_known"))
      .select(col(idCol), col("n_grams"), col("sum_freq"), col("n_known"),
        when(col("n_grams") > 0,
          col("sum_freq").cast("double") / col("n_grams")).as("familiarity"),
        when(col("n_grams") > 0,
          col("n_known").cast("double") / col("n_grams")).as("known_ratio"))
  }

  /** Greedy bigram DRAFT TABLE: for each context token, the corpus-mode
    * next token — the model behind n-gram speculative decoding (a draft
    * proposes the mode continuation; the big model verifies). Ties break
    * to the LEXICOGRAPHICALLY SMALLEST next token, so the table is a
    * deterministic function of the corpus multiset (merge-order-free).
    *
    * Scale shape: one map-side bigram explode (pairs built inside one
    * bound-array transform — the shingles HOF discipline), one
    * (prev, next) hash-aggregate bounded by distinct bigrams, then a
    * row_number window PARTITIONED BY prev — fan-in per partition is
    * that context's distinct continuations (vocabulary-bounded, never
    * corpus-sized).
    *
    * @return one row per distinct context token: (prev, pred_next,
    *         n_obs — occurrences of the winning bigram)
    */
  def draftTable(docs: DataFrame, textCol: String): DataFrame = {
    val counts = docs.select(explode(bigramPairs(col(textCol))).as("__pn"))
      .select(col("__pn.p").as("prev"), col("__pn.nx").as("__nx"))
      .groupBy("prev", "__nx").agg(count(lit(1)).as("n_obs"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("prev")
      .orderBy(col("n_obs").desc, col("__nx").asc)
    counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("prev"), col("__nx").as("pred_next"), col("n_obs"))
  }

  /** Draft-model ACCEPTANCE RATE per document under a FROZEN draft
    * table — the sizing measurement for speculative decoding with an
    * n-gram draft (expected accepted drafts ≈ acceptance × positions;
    * whether the draft pays for itself is exactly this number). Each
    * position i ≥ 2 of a document is one draft event: the table's
    * `pred_next` for token i−1 is the draft, accepted iff it equals
    * token i; contexts ABSENT from the table draft nothing (the
    * position counts, the draft misses) — the conservative read for
    * capacity planning.
    *
    * Exactness: counts are exact BIGINTs; `acceptance_q20` is one
    * non-negative integral division, `acceptance` its exact 2⁻²⁰
    * rescale. Scale shape: the corpus-sized side is ONE equi-join of
    * bigram rows against the table keyed by context (the table is
    * vocabulary-bounded — broadcastable when it fits, an ordinary
    * shuffle join when a 100 TB vocabulary doesn't), then one per-doc
    * hash-aggregate; the doc spine rides a final left join so sub-2-
    * token docs surface with zero positions, not vanish.
    *
    * @param table frozen draft artifact: (prev, pred_next, …) — e.g.
    *              [[draftTable]]'s output, or one shipped from a prior
    *              corpus snapshot (the q299 frozen-weights discipline)
    * @return one row per doc: (idCol, n_positions, n_accepted,
    *         acceptance_q20, acceptance) — zero-position docs keep
    *         NULL rates (no draft event to average)
    */
  def draftAcceptanceWith(docs: DataFrame, idCol: String, textCol: String,
                          table: DataFrame): DataFrame =
    docs.select(col(idCol))
      .join(draftAcceptanceAgainst(docs, idCol, textCol, table),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_positions"), lit(0L)).as("n_positions"),
        coalesce(col("n_accepted"), lit(0L)).as("n_accepted"),
        col("acceptance_q20"), col("acceptance"))

  /** The STREAM-SHAPED core of [[draftAcceptanceWith]] (the
    * [[familiarityAgainst]] discipline): bigram explode → stream-
    * static-joinable LEFT equi-join on the frozen draft table's
    * context key → one per-doc aggregate — runs unchanged when `docs`
    * is a STREAMING DataFrame and `table` is static (update mode; the
    * live capacity read for speculative decoding as traffic lands).
    * Documents with < 2 tokens have no draft positions and emit NO row
    * — the batch wrapper adds the spine zeros back.
    */
  def draftAcceptanceAgainst(docs: DataFrame, idCol: String,
                             textCol: String, table: DataFrame): DataFrame = {
    val bi = docs.select(col(idCol), explode(bigramPairs(col(textCol)))
        .as("__pn"))
      .select(col(idCol), col("__pn.p").as("prev"), col("__pn.nx").as("__nx"))
    bi.join(table.select(col("prev"), col("pred_next")), Seq("prev"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_positions"),
        count(when(col("__nx") === col("pred_next"), 1)).as("n_accepted"))
      .withColumn("acceptance_q20",
        when(col("n_positions") > 0, graft.functions.posIntDiv(
          col("n_accepted") * lit(1048576L), col("n_positions"))))
      .withColumn("acceptance",
        col("acceptance_q20").cast("double") / lit(1048576.0))
  }

  /** In-sample acceptance: [[draftTable]] trained on `docs` and applied
    * to `docs` — the corpus-level UPPER BOUND estimate (a held-out or
    * frozen table via [[draftAcceptanceWith]] reads lower).
    */
  def draftAcceptance(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    draftAcceptanceWith(docs, idCol, textCol, draftTable(docs, textCol))

  /** Adjacent token pairs as (p, nx) structs, built inside ONE
    * bound-array transform so the token expression is evaluated once
    * per document, not once per position (the shingles HOF trap).
    */
  private def bigramPairs(text: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    element_at(
      transform(array(TextAnalysis.tokens(text)), t =>
        // guard, don't clamp: sequence(1, 0) is a DESCENDING [1, 0] in
        // Spark, so a 1-token doc would fabricate two phantom pairs
        when(size(t) >= 2,
          transform(sequence(lit(1), size(t) - 1), i =>
            struct(element_at(t, i).as("p"),
              element_at(t, i + 1).as("nx"))))
          .otherwise(array().cast("array<struct<p:string,nx:string>>"))),
      1)
}
