package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted interleave — the data-MIXING primitive of a
  * training pipeline: given per-source integer weights (say web:7
  * books:2 code:1), produce one global ordering in which every prefix
  * holds the sources in (almost exactly) the target proportions. Batch
  * composition then follows for free: consecutive fixed-size slices of
  * the ordering ARE the mixed batches, so the mixture needs no runtime
  * sampler, is identical across re-runs, and is auditable row by row —
  * the same motivation as the epoch shuffle (q104), applied to the
  * source axis instead of the order axis.
  *
  * The schedule is the classic rate-monotonic / virtual-time interleave
  * (weighted fair queuing with integer virtual time): source s's r-th
  * document (r = 1, 2, …) gets virtual deadline
  *
  *   key(s, r) = r · (L / w_s)        L = lcm of all weights
  *
  * and rows are ordered by (key, source). Each source advances at rate
  * w_s per L virtual-time units, so in any prefix of n rows source s
  * holds n·w_s/W ± O(1) slots (W = Σ w) — the spec asserts the measured
  * deviation bound. All arithmetic is exact integers (L/w_s divides
  * evenly by construction of lcm), so the ordering is a pure function of
  * the input SET — bit-identical under any partitioning and
  * hash-checkable against a sequential engine.
  *
  * Scale shape: NO per-source global window and NO global-ordered
  * window over data rows. Per-source ranks come from
  * [[GlobalIds.contiguousIdsByGroup]] (histogram offsets; the only
  * per-source window runs over histogram rows) and the final positions
  * from [[GlobalIds.contiguousIds]] over key buckets (uniform by
  * construction: key density is W/L rows per virtual-time unit, so
  * fixed-width key buckets hold a fixed expected row count — the
  * histogram contract's ideal case). Sources absent from `weights` are
  * EXCLUDED from the mix (weight 0 = drop), mirroring how a mixture
  * config whitelists its sources.
  */
object Mixing {

  private def lcm(a: Long, b: Long): Long = {
    @annotation.tailrec def gcd(x: Long, y: Long): Long =
      if (y == 0) x else gcd(y, x % y)
    a / gcd(a, b) * b
  }

  /** @param docs      input rows
    * @param sourceCol source/domain column (non-NULL for mixed rows;
    *                  NULL or unmapped sources are excluded)
    * @param orderBucket coarse histogram bucket aligned with `order`
    *                  within each source (see [[GlobalIds]] contract),
    *                  e.g. `floor(col("doc_id") / 1000)`
    * @param order     total order within each source (the per-source
    *                  document sequence; pre-shuffle upstream — e.g.
    *                  with the q104 epoch shuffle — for a randomized mix)
    * @param weights   positive integer weight per source value
    * @param keyBucketRows approximate rows per position-histogram bucket
    * @return input columns + `mix_key` (LONG virtual deadline) +
    *         `position` (LONG, contiguous 0..N−1 in mixture order)
    */
  def weightedInterleave(docs: DataFrame, sourceCol: String,
                         orderBucket: Column, order: Seq[Column],
                         weights: Map[String, Long],
                         keyBucketRows: Long = 4096L): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    require(keyBucketRows > 0, "keyBucketRows must be positive")
    val bigL = weights.values.reduce(lcm)
    val totalW = weights.values.sum
    // stride per source as a small broadcast dimension (plan-stable for
    // any source cardinality, unlike an unbounded CASE WHEN chain)
    val spark = docs.sparkSession
    import spark.implicits._
    val strides = weights.toSeq.sortBy(_._1)
      .map { case (s, w) => (s, bigL / w) }
      .toDF(sourceCol, "__stride")
    val ranked = GlobalIds.contiguousIdsByGroup(
      docs.join(broadcast(strides), sourceCol), col(sourceCol), orderBucket,
      order, idName = "__r")
    // key = (r+1) * stride; r+1 <= |source| and stride <= L, both well
    // inside Long for any real mixture config (L is an lcm of SMALL
    // config weights; a pathological weight set overflows loudly in
    // lcm/multiplication, not silently).
    val keyed = ranked
      .withColumn("mix_key", (col("__r") + 1L) * col("__stride"))
      .drop("__r", "__stride")
    // Uniform key density W/L rows per unit: bucket width in virtual
    // time that targets ~keyBucketRows rows per bucket.
    val width = math.max(1L, keyBucketRows * bigL / totalW)
    // integer DIV, not `/`: mix_key is exact-integer territory past 2^53
    GlobalIds.contiguousIds(keyed, expr(s"mix_key DIV $width"),
      Seq(col("mix_key"), col(sourceCol)), idName = "position")
  }

  /** Greedy token-budget allocation across sources — the mixture-design
    * step that answers "which sources fill a B-token training budget,
    * and how much of each": sources are taken in (quality desc, key
    * asc) order, each granted min(available, remaining budget) — the
    * exact optimum of the fractional knapsack with unit token value per
    * quality tier, and the deterministic counterpart of hand-tuned
    * mixture weights. Rejected mass is visible (alloc < avail), never
    * silent.
    *
    * Runs on the per-SOURCE stats table (one row per source — the
    * corpus aggregation that produces it is the caller's one pass), so
    * the running-sum window is bounded by source cardinality, the
    * [[graft.operators.Packing]] compaction-planner discipline. All
    * integer arithmetic; the quality column is only an ORDER key (make
    * it deterministic — e.g. one division of exact sums, never a float
    * accumulation).
    *
    * @return stats + (cum_before, alloc_tokens)
    */
  def budgetAllocate(stats: DataFrame, keyCol: String, qualityCol: String,
                     availCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val w = Window.orderBy(desc(qualityCol), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    stats
      .withColumn("cum_before", coalesce(sum(col(availCol)).over(w), lit(0L)))
      .withColumn("alloc_tokens",
        greatest(lit(0L), least(col(availCol).cast("long"),
          lit(budget) - col("cum_before"))))
  }

  /** EPOCH WATERFILLING under repeat caps — the data-constrained
    * mixture plan (the question Muennighoff et al. 2023 "Scaling
    * Data-Constrained Language Models" forces: when the budget exceeds
    * the corpus, how many EPOCHS of each source?): every source
    * receives the same water level t of epochs, each capped at its own
    * `capCol` (beyond which repetition is known to stop helping), with
    * t chosen so Σ min(t, cap_s)·avail_s = budget.
    *
    * Exactness: t is an exact RATIONAL p/q (p = budget − saturated
    * prefix, q = unsaturated token mass) found by bracket scan over
    * the cap-sorted source table — each bracket validity test is a
    * BIGINT cross-multiplication (p ≥ prevCap·q, p ≤ cap·q), never a
    * float compare; per-source allocations close with one exact
    * integral division (`⌊avail·p/q⌋`; saturated sources are the
    * exact integer cap·avail). Budgets beyond total capacity saturate
    * every source (reported via `saturated`, leftover visible as
    * budget − Σ alloc). ANSI overflow is the loud contract:
    * avail·p must fit a Long.
    *
    * Scale shape: runs on the per-SOURCE stats table (the caller's one
    * corpus pass produces it), so the global windows are bounded by
    * source cardinality — the [[budgetAllocate]] discipline. Sources
    * with avail ≤ 0 are excluded (they carry no mass).
    *
    * @param stats one row per source: keyCol, availCol (tokens,
    *              > 0), capCol (max epochs, ≥ 1, integer)
    * @return one row per source: (keyCol, avail, cap, alloc_tokens,
    *         epochs_q20, epochs, saturated)
    */
  def epochWaterfill(stats: DataFrame, keyCol: String, availCol: String,
                     capCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val Q = 1048576L
    val s = stats.select(col(keyCol), col(availCol).cast("long").as("avail"),
        col(capCol).cast("long").as("cap"))
      .filter(col("avail") > 0L)
    val wPrev = Window.orderBy(col("cap"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wLag = Window.orderBy(col("cap"), col(keyCol))
    val br = s
      .withColumn("__prefSat",
        coalesce(sum(col("cap") * col("avail")).over(wPrev), lit(0L)))
      .withColumn("__prefA", coalesce(sum(col("avail")).over(wPrev), lit(0L)))
      .withColumn("__prevCap", coalesce(lag(col("cap"), 1).over(wLag), lit(0L)))
    val totalA = s.agg(sum("avail").as("__tA"))
    val level = br.withColumn("__k", lit(1))
      .join(totalA.withColumn("__k", lit(1)), Seq("__k"))
      .withColumn("__p", lit(budget) - col("__prefSat"))
      .withColumn("__q", col("__tA") - col("__prefA"))
      .filter(col("__p") >= col("__prevCap") * col("__q") &&
        col("__p") <= col("cap") * col("__q"))
      .orderBy(col("cap"), col(keyCol)).limit(1)
      .select(lit(1).as("__k"), col("__p"), col("__q"))
    val sat = col("__p").isNull || col("__p") >= col("cap") * col("__q")
    s.withColumn("__k", lit(1))
      .join(level, Seq("__k"), "left")
      .withColumn("saturated", sat)
      .withColumn("alloc_tokens", when(sat, col("cap") * col("avail"))
        .otherwise(graft.functions.posIntDiv(
          col("avail") * col("__p"), col("__q"))))
      .withColumn("epochs_q20", when(sat, col("cap") * Q)
        .otherwise(graft.functions.posIntDiv(col("__p") * Q, col("__q"))))
      .withColumn("epochs", col("epochs_q20").cast("double") / Q)
      .select(col(keyCol), col("avail"), col("cap"), col("alloc_tokens"),
        col("epochs_q20"), col("epochs"), col("saturated"))
  }

  /** Per-GROUP token-budget cap at ROW granularity: within every group
    * (registrable domain, source), keep rows along `order` while the
    * inclusive running `weight` sum stays ≤ `budget` — the domain-cap
    * enforcement pass that stops one mega-domain from dominating the mix
    * ([[budgetAllocate]] decides budgets ACROSS groups from per-group
    * stats; this enforces one WITHIN each group on the corpus itself).
    *
    * Scale shape: a per-group prefix SUM via the [[GlobalIds]]
    * histogram-offset plan generalized from counts to weights — per
    * (group, bucket) weight sums cumulate into offsets over the small
    * histogram, broadcast back, and the only window over raw rows is
    * partitioned by (group, bucket), so no group funnels through one
    * task. Same CONTRACT as [[GlobalIds.contiguousIdsByGroup]]: `bucket`
    * monotone non-decreasing along `order` within every group, non-NULL;
    * (group, bucket) cell count bounds the broadcast (quantize the order
    * key coarser if its distinct count explodes). NULL groups drop at
    * the offset equi-join.
    *
    * The cap is exact, not fractional: the first row whose inclusive sum
    * crosses `budget` is REJECTED (kept prefix ≤ budget always; a single
    * row heavier than the whole budget is rejected outright).
    *
    * @return `df` + (`cum_w` inclusive running weight, `kept` boolean)
    */
  def budgetCapPerGroup(df: DataFrame, group: Column, bucket: Column,
                        order: Seq[Column], weight: Column,
                        budget: Long): DataFrame = {
    require(order.nonEmpty, "need at least one order column")
    require(budget >= 0, "budget must be non-negative")
    val withB = df.withColumn("__g", group)
      .withColumn("__b", bucket.cast("long"))
      .withColumn("__w", weight.cast("long"))
    val hist = withB.groupBy(col("__g"), col("__b"))
      .agg(sum(col("__w")).as("__bs"))
    val wOff = Window.partitionBy(col("__g")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist
      .withColumn("__off", coalesce(sum(col("__bs")).over(wOff), lit(0L)))
      .select(col("__g"), col("__b"), col("__off"))
    val wIn = Window.partitionBy(col("__g"), col("__b")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.join(broadcast(offsets), Seq("__g", "__b"))
      .withColumn("cum_w", col("__off") + sum(col("__w")).over(wIn))
      .withColumn("kept", col("cum_w") <= budget)
      .drop("__g", "__b", "__w", "__off")
  }

  /** TEMPERATURE-reweighted source mixture at α = 1/2 — the
    * multilingual-sampling standard (mBERT / XLM-R style: sample source
    * i with probability mᵢ^α / Σ mⱼ^α, α < 1 upweighting low-resource
    * sources; α = 1/2 is the square-root schedule most multilingual
    * recipes ship with). Complements [[epochWaterfill]]: waterfilling
    * answers "how many epochs under repeat caps", this answers "what
    * target proportions before caps".
    *
    * Exactness: mᵢ^(1/2) is irrational, so float aggregation of
    * √-values would be summation-order-dependent — instead each source
    * gets the EXACT integer sᵢ = isqrt(mᵢ·2^40) = floor(2^20·√mᵢ)
    * ([[graft.functions.isqrt]]: double-seeded, integer-corrected),
    * the normalizer Σ sⱼ is an exact DECIMAL(38,0) sum of integers,
    * and each weight is one closing integral division
    * (sᵢ·2^20) // Σ sⱼ — bit-identical cross-engine. The quantization
    * error of s vs 2^20·√m is < 2^-20 relative, far inside any
    * mixture's tolerance, and DETERMINISTIC, which float √ sums are
    * not.
    *
    * Scale shape: runs on the per-source stats table (bounded by the
    * source domain, the [[budgetAllocate]] contract); one aggregate +
    * one broadcast-joined one-row normalizer.
    *
    * @param stats   one row per source: keyCol, massCol (> 0 token/char
    *                mass; non-positive sources are excluded — they
    *                carry no weight)
    * @return one row per source: (keyCol, mass, sqrt_mass_q20,
    *         weight_q20, weight) — weights sum to 2^20 ± |sources|
    *         (each floor loses < 1 unit)
    */
  def sqrtTemperatureWeights(stats: DataFrame, keyCol: String,
                             massCol: String): DataFrame = {
    val d = org.apache.spark.sql.types.DecimalType(38, 0)
    val Q = 1048576L // 2^20
    val s = stats.select(col(keyCol), col(massCol).cast("long").as("mass"))
      .filter(col("mass") > 0L)
      .withColumn("__s", graft.functions.isqrt(
        col("mass").cast(d) * lit(1099511627776L).cast(d))) // 2^40
    val norm = s.agg(sum(col("__s")).cast(d).as("__sum"))
    s.withColumn("__k", lit(1))
      .join(broadcast(norm.withColumn("__k", lit(1))), Seq("__k"))
      .withColumn("sqrt_mass_q20", col("__s").cast("long"))
      .withColumn("weight_q20",
        toLongDiv(col("__s") * lit(Q).cast(d), col("__sum")))
      .withColumn("weight", col("weight_q20").cast("double") / Q)
      .select(col(keyCol), col("mass"), col("sqrt_mass_q20"),
        col("weight_q20"), col("weight"))
  }

  /** DECIMAL-safe integral division (num // den) for non-negative
    * decimals whose QUOTIENT fits a long — posIntDiv's long cast would
    * overflow on the 2^72-scale numerators the fixed-point weights
    * build. Spark's IntegralDivide on decimals returns BIGINT. */
  private def toLongDiv(num: Column, den: Column): Column =
    org.apache.spark.sql.graftbridge.toColumn(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftbridge.toExpression(num),
        org.apache.spark.sql.graftbridge.toExpression(den)))
}
