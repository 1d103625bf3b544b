package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection via hashed n-gram importance weights — the DSIR
  * recipe (Xie et al., "Data Selection for Language Models via
  * Importance Resampling", NeurIPS 2023): score every raw document by
  * how much its hashed n-gram profile looks like a TARGET distribution
  * (e.g. a trusted high-quality slice) relative to the raw corpus, then
  * keep the top mass. The reference pipeline's quality gates are
  * per-document heuristics; this is the complementary DISTRIBUTIONAL
  * filter a pre-training curation stack runs next to them.
  *
  * Model: word n-grams are hashed into `buckets` coarse features; the
  * target and raw corpora each induce a Laplace-smoothed multinomial
  * over buckets, and a document's importance is the mean per-gram
  * likelihood ratio p_target(bucket)/p_raw(bucket). The canonical DSIR
  * weight is the SUM OF LOGS of these ratios; this implementation is
  * deliberately RATIONAL — the mean of the ratios themselves, each
  * quantized to ⌊ratio·2²⁰⌋ — for the same reason [[NgramLm]] is: a
  * transcendental (`ln`) in a gated output has no cross-engine last-bit
  * guarantee, while the ratio is two exact-integer→double casts, two
  * IEEE divisions, one exact power-of-two scale and a floor — bit-exact
  * in any engine (the DuckDB oracle locks it). Log-sum and
  * ratio-mean agree on what matters operationally: both are monotone in
  * "target-like mass", both separate in-distribution from
  * out-of-distribution documents; the rational form trades the
  * product-form independence story for exactness.
  *
  * Scale shape (the 100 TB story):
  *  - ONE corpus pass builds the bucket table: explode the compiled
  *    positional gram hashes ([[graft.functions.polyGramHashSeq]] — no
  *    gram strings materialize), bucket by modulus, hash-aggregate
  *    raw+target counts together (map-side combinable; the target flag
  *    rides the gram row, so the target slice costs no second scan);
  *  - the bucket table is BOUNDED (`buckets` rows — thousands), so the
  *    weight lookup joining grams→weights is a broadcast join: scoring
  *    is embarrassingly parallel, no shuffle of the gram stream;
  *  - per-document reduction is an exact-integer hash aggregate
  *    (map-side combinable, merge-order-free), one division per doc at
  *    the end. Total: one wide shuffle (the per-doc agg), one bounded
  *    aggregate — the same shape at any corpus size.
  *
  * Exactness bounds: counts and totals stay exact in IEEE double up to
  * 2⁵³ grams (≈9·10¹⁵ — beyond a 100 TB corpus's ~10¹³ bigrams), and
  * Σ⌊ratio·2²⁰⌋ per doc stays far under 2⁶³ (each term ≤ 2²⁰·(N_r+B)
  * only for a bucket holding the whole target corpus).
  */
object Selection {

  /** Fixed-point scale for per-gram likelihood ratios: 2²⁰. */
  val RatioScale: Double = 1048576.0

  /** Per-document DSIR importance statistics over word `n`-grams.
    *
    * @param targetPred row predicate over `docs` columns selecting the
    *                   TARGET slice (e.g. `col("lang") === "en"`); the
    *                   raw distribution is the whole input, target
    *                   included (the DSIR setting: target ⊆ raw pool)
    * @param buckets    hashed-feature count; the weight table is
    *                   exactly this many rows (broadcast-sized)
    * @return one row per input document:
    *         (idCol, n_grams, dsir_fp = Σ_grams ⌊2²⁰·p̂_t(b)/p̂_r(b)⌋,
    *         dsir_weight = dsir_fp/n_grams — NULL for docs with no
    *         n-gram, e.g. shorter than n tokens). A gram's bucket
    *         ratio uses Laplace smoothing: p̂(b) = (c(b)+1)/(N+buckets).
    *         dsir_weight ≈ 2²⁰ means "bucket profile indistinguishable
    *         from raw"; higher = more target-like.
    */
  /** The DENSE trained artifact behind [[dsirWeights]]: one row per
    * bucket 0..buckets−1 — `(bucket, n_raw, n_target, w_fp)` — with
    * empty buckets carried at their smoothed prior ratio
    * ⌊2²⁰·(N_r+B)/(N_t+B)⌋, so a FROZEN weight vector scores unseen
    * grams the way training-time smoothing says it should. This is the
    * train/apply split: train once here (one corpus pass), export the
    * `buckets` longs, score forever with [[dsirScoreWith]] — including
    * on a stream, where re-deriving corpus statistics is impossible.
    */
  def dsirBucketWeights(docs: DataFrame, textCol: String,
                        targetPred: Column, n: Int = 2,
                        buckets: Int = 1024): DataFrame = {
    require(n >= 1, "need n >= 1")
    require(buckets >= 2, "need buckets >= 2")
    val b = buckets.toLong
    val spark = docs.sparkSession
    val grams = docs.select(targetPred.as("__t"),
        explode(graft.functions.polyGramHashSeq(col(textCol), n)).as("__h"))
      .select(col("__t"), (col("__h") % b).as("__b"))
    val bucketCnt = grams.groupBy("__b")
      .agg(count(lit(1)).as("__cr"),
        count(when(col("__t"), 1)).as("__ct"))
    val tot = bucketCnt.agg(
      coalesce(sum(col("__cr")), lit(0L)).as("__nr"),
      coalesce(sum(col("__ct")), lit(0L)).as("__nt"))
    // (ct+1)/(nt+B) over (cr+1)/(nr+B), quantized: every operand is an
    // exact integer cast to double; the two divisions are the only
    // rounding (mirrored operand-for-operand in the oracle), ·2²⁰ is an
    // exact exponent shift, floor closes the fixed point.
    spark.range(b).select(col("id").as("bucket"))
      .join(bucketCnt.withColumnRenamed("__b", "bucket"), Seq("bucket"),
        "left")
      .select(col("bucket"),
        coalesce(col("__cr"), lit(0L)).as("n_raw"),
        coalesce(col("__ct"), lit(0L)).as("n_target"))
      .crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_raw"), col("n_target"),
        floor(((col("n_target") + lit(1L)).cast("double") /
            (col("__nt") + lit(b)).cast("double")) /
          ((col("n_raw") + lit(1L)).cast("double") /
            (col("__nr") + lit(b)).cast("double")) *
          lit(RatioScale)).as("w_fp"))
  }

  /** Score documents against a FROZEN weight vector (the `w_fp` column
    * of [[dsirBucketWeights]], collected bucket-ascending): a pure
    * row-local projection — gram hashes → bucket → literal-array
    * lookup → exact integer sum — so it runs unchanged over a
    * STRUCTURED STREAM (append mode, no state), the deployment shape
    * for "score each crawl batch as it lands". Output columns match
    * [[dsirWeights]].
    */
  def dsirScoreWith(docs: DataFrame, idCol: String, textCol: String,
                    weights: Array[Long], n: Int = 2): DataFrame = {
    require(n >= 1, "need n >= 1")
    require(weights.length >= 2, "need a weight per bucket (>= 2)")
    val b = weights.length.toLong
    val wlit = typedLit(weights.toSeq)
    val hs = graft.functions.polyGramHashSeq(col(textCol), n)
    // bind the hash array once (the repo's HOF discipline: a lambda
    // body re-evaluates non-lambda subexpressions per element)
    val stats = element_at(
      transform(array(hs), h =>
        struct(size(h).as("ng"),
          aggregate(h, lit(0L),
            (acc, x) => acc + element_at(wlit, (x % b).cast("int") + 1))
            .as("fp"))), 1)
    docs.select(col(idCol), stats.as("__s"))
      .select(col(idCol),
        coalesce(col("__s.ng").cast("long"), lit(0L)).as("n_grams"),
        coalesce(col("__s.fp"), lit(0L)).as("dsir_fp"))
      .withColumn("dsir_weight",
        when(col("n_grams") > 0L,
          col("dsir_fp").cast("double") / col("n_grams")))
  }

  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  targetPred: Column, n: Int = 2,
                  buckets: Int = 1024): DataFrame = {
    require(n >= 1, "need n >= 1")
    require(buckets >= 2, "need buckets >= 2")
    val b = buckets.toLong
    val grams = docs.select(col(idCol).as("__id"),
        explode(graft.functions.polyGramHashSeq(col(textCol), n)).as("__h"))
      .select(col("__id"), (col("__h") % b).as("__b"))
    val weights = dsirBucketWeights(docs, textCol, targetPred, n, buckets)
      .select(col("bucket").as("__b"), col("w_fp").as("__w"))
    val per = grams.join(broadcast(weights), "__b")
      .groupBy("__id")
      .agg(count(lit(1)).as("n_grams"), sum(col("__w")).as("dsir_fp"))
    docs.select(col(idCol))
      .join(per, col(idCol) === col("__id"), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("dsir_fp"), lit(0L)).as("dsir_fp"),
        when(col("n_grams") > 0L,
          col("dsir_fp").cast("double") / col("n_grams"))
          .as("dsir_weight"))
  }
}
