package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * rand()-based sampling is non-reproducible across retries/re-runs (task
  * retry re-rolls the dice) — a real hazard when a 100 TB sample feeds a
  * training run that must be auditable. These operators derive the
  * "randomness" from the data itself via a portable integer mixer, so the
  * same input always yields the same sample, on any engine.
  */
object Sampling {

  /** Portable pseudo-random mixer of an integer key: Knuth multiplicative
    * hashing in 32-bit space — (key mod 2^31)·2654435761 mod 2^32, then
    * mod the bucket count. The key is reduced to 31 bits BEFORE the
    * multiply: ids beyond 2^31 are routine at 100 TB scale, and an
    * unreduced key ≥ ~3.5e9 overflows signed 64-bit — an ANSI runtime
    * error (or, ANSI off, a silent wrap diverging from the documented
    * scheme). After reduction the product is < 2^31·2^32 < 2^63, so the
    * arithmetic is exact plain-long everywhere — reproducible in any SQL
    * engine (`((key % 2147483648) * 2654435761) % 4294967296`).
    */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(pmod(pmod(key.cast("long"), lit(2147483648L)) * 2654435761L,
      lit(4294967296L)), lit(buckets.toLong))

  /** Deterministic p% sample: keep rows whose hash bucket < pct. */
  def deterministicSample(df: DataFrame, keyCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100)
    df.filter(hashBucket(col(keyCol), 100) < pct)
  }

  /** Deterministic train/val/test split — the holdout assignment every
    * training run needs, as a pure projection over the same Knuth
    * bucket [[hashBucket]] uses everywhere else. Percentage bands over
    * 100 buckets: bucket < trainPct → "train", < trainPct+valPct →
    * "val", rest → "test". Properties that matter at corpus scale:
    * membership is a function of the KEY alone (stable under
    * re-partitioning, re-runs, incremental appends — a doc never
    * migrates between splits as the corpus grows), no shuffle, no RNG,
    * and the same expression evaluates identically in any SQL engine
    * (the q99 oracle runs it verbatim). Contamination note: key on the
    * DEDUP-cluster representative (or URL), not the row id, if near-dups
    * must not straddle train/test.
    */
  def hashSplit(df: DataFrame, keyCol: String, trainPct: Int, valPct: Int,
                splitCol: String = "split"): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: $trainPct/$valPct")
    val b = hashBucket(col(keyCol), 100)
    df.withColumn(splitCol,
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic stratified sample: exactly ceil(fraction·|stratum|)
    * rows per stratum, chosen by the (hash bucket asc, key asc) total
    * order — unique and reproducible.
    *
    * Scale shape: a rank window partitioned by stratum would funnel each
    * stratum through ONE task (a ~5-language 100 TB corpus ⇒ ~20 TB sorted
    * by a single task — the scale-killer this replaces). Instead:
    *   1. histogram pass — count rows per (stratum, bucket): a hash
    *      aggregate with map-side partials, output ≤ strata × 1e6 rows
    *      REGARDLESS of corpus size;
    *   2. cumulate the histogram per stratum (window over the driver-small
    *      histogram, not the data) to find each stratum's boundary bucket
    *      B — the bucket where the running count reaches the target
    *      t = ceil(fraction·n) — and the residual r = rows of B still
    *      needed after all buckets < B are taken whole;
    *   3. broadcast-join the per-stratum (B, r) thresholds back: rows with
    *      bucket < B pass with NO sort at all; only rows of the single
    *      boundary bucket (~n/1e6 of the stratum) are ranked by key, in a
    *      window partitioned by (stratum, bucket) — each partition is one
    *      bucket of one stratum, so no task ever sees a whole stratum.
    * Output is row-for-row identical to the rank-window formulation.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1)
    sampleByFraction(df, stratumCol, keyCol, lit(fraction))
  }

  /** Deterministic MIXTURE sample: like [[stratifiedSample]] but with a
    * per-stratum fraction — the training-mixture primitive ("50% web,
    * 25% books, 10% code, default 5%") that turns corpus proportions into
    * dataset proportions reproducibly. Strata absent from `fractions`
    * (including a NULL stratum) use `defaultFraction`; a fraction of 0
    * drops the stratum. Same scale-safe histogram plan as
    * [[stratifiedSample]] — per-stratum work never funnels into one task.
    */
  def mixtureSample(df: DataFrame, stratumCol: String, keyCol: String,
                    fractions: Map[String, Double],
                    defaultFraction: Double = 0.0): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    // when-chain, not a map literal: element_at on a missing map key
    // THROWS under ANSI mode, and the handful of strata stay plan-side
    // constants either way.
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (s, f)) =>
      when(col(stratumCol) === lit(s), lit(f)).otherwise(acc)
    }
    sampleByFraction(df, stratumCol, keyCol, frac)
  }

  /** Shared core: keep ceil(fraction·|stratum|) rows per stratum by the
    * (hash bucket asc, key asc) total order, where `fraction` is any
    * expression of the stratum column (constant for stratifiedSample,
    * lookup for mixtureSample).
    */
  private def sampleByFraction(df: DataFrame, stratumCol: String, keyCol: String,
                               fraction: org.apache.spark.sql.Column): DataFrame =
    sampleByTarget(df, stratumCol, keyCol, total => ceil(total * fraction))

  /** Temperature-weighted EXACT-quota sampling across strata — the
    * data-mixture primitive that turns raw corpus proportions into a
    * sampled dataset of (up to) `totalTarget` rows where stratum s gets
    * ⌊totalTarget · √n_s / Σ√n⌋ rows (α = 1/2 temperature flattening:
    * big sources are down-weighted relative to their size, small sources
    * up-weighted — the standard multilingual/multi-source rebalancing
    * move). Unlike [[mixtureSample]] (per-stratum RATES), quotas here are
    * exact COUNTS derived from the corpus's own per-stratum sizes.
    *
    * Determinism & the oracle gate: per-stratum counts are driver-side
    * (one bounded aggregate — strata are metadata-scale), √ is a
    * correctly-rounded IEEE op in any engine, and the weight
    * normalization folds the √-weights in STRATUM-SORTED order
    * (NULLS FIRST, then ascending) from a 0.0 seed — the one
    * float-sum in the operator, pinned to a defined order so DuckDB's
    * `list_reduce(list_prepend(0.0, list(w ORDER BY stratum)))`
    * reproduces it bit-for-bit. Row selection per stratum is the same
    * (hash-bucket asc, key asc) total order as [[stratifiedSample]],
    * through the same histogram plan — no per-stratum sort funnel.
    *
    * A quota larger than the stratum takes the whole stratum.
    */
  def temperatureQuota(df: DataFrame, stratumCol: String, keyCol: String,
                       totalTarget: Long): DataFrame = {
    require(totalTarget > 0, "need a positive total target")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => Option(r.get(0)).map(_.toString) -> r.getLong(1))
      .sortBy { case (s, _) => (s.isDefined, s.getOrElse("")) } // NULLS FIRST
    val denom = counts.foldLeft(0.0)((acc, c) => acc + math.sqrt(c._2.toDouble))
    val quotas = counts.map { case (s, n) =>
      s -> math.floor(totalTarget.toDouble * math.sqrt(n.toDouble) / denom).toLong
    }
    val quota = quotas.foldLeft(lit(0L)) { case (acc, (s, q)) =>
      val matches = s.fold(col(stratumCol).isNull)(v => col(stratumCol) === lit(v))
      when(matches, lit(q)).otherwise(acc)
    }
    sampleByTarget(df, stratumCol, keyCol, total => least(quota, total))
  }

  /** Distribution-MATCHING resample: keep the LARGEST deterministic
    * subsample whose stratum proportions follow `targetWeights` (relative
    * weights — only ratios matter), the data-mixing move for reshaping a
    * skewed corpus onto a prescribed language/source mix without
    * oversampling anything.
    *
    * Exact-count formulation: scale C = min over weighted strata of
    * n_s / t_s (the tightest stratum binds), quota_s = ⌊C · t_s⌋ — so
    * every stratum's kept count is proportional to its target weight,
    * at least one stratum is kept (nearly) whole, and no stratum is
    * asked for more rows than it has. Corner cases are part of the
    * contract: a stratum absent from `targetWeights` (or with weight 0,
    * or NULL) is DROPPED — matching a distribution means discarding mass
    * outside it — and a TARGET stratum absent from the corpus drives
    * C to 0 and empties the result: the requested distribution is
    * unreachable without it, and silently renormalizing would hide that.
    *
    * Per-stratum counts are driver-side (one bounded aggregate — strata
    * are metadata-scale); both engines derive C and the quotas with the
    * same IEEE double divisions/multiplications, so the DuckDB oracle
    * (q131) reproduces the floors bit-for-bit even when a quota lands on
    * an ulp boundary. Row selection is the shared (hash-bucket asc, key
    * asc) histogram-threshold plan — no per-stratum sort funnel.
    */
  def matchDistribution(df: DataFrame, stratumCol: String, keyCol: String,
                        targetWeights: Map[String, Double]): DataFrame = {
    require(targetWeights.nonEmpty, "need at least one target stratum")
    require(targetWeights.values.forall(v => v >= 0.0 && !v.isNaN && !v.isInfinity),
      "target weights must be finite and non-negative")
    require(targetWeights.values.exists(_ > 0.0), "need a positive weight")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => Option(r.get(0)).map(_.toString) -> r.getLong(1)).toMap
    val c = targetWeights.collect { case (s, t) if t > 0 =>
      counts.getOrElse(Some(s), 0L).toDouble / t
    }.min
    val quotas = targetWeights.toSeq.collect { case (s, t) if t > 0 =>
      s -> math.floor(c * t).toLong
    }
    val quota = quotas.foldLeft(lit(0L)) { case (acc, (s, q)) =>
      when(col(stratumCol) === lit(s), lit(q)).otherwise(acc)
    }
    sampleByTarget(df, stratumCol, keyCol, total => least(quota, total))
  }

  /** Shared scale-safe core: keep the first `targetOf(|stratum|)` rows
    * per stratum under the (hash bucket asc, key asc) total order, via
    * the histogram-threshold plan documented on [[stratifiedSample]].
    */
  private def sampleByTarget(df: DataFrame, stratumCol: String, keyCol: String,
                             targetOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    val buckets = 1000000
    val withB = df.withColumn("__bkt", hashBucket(col(keyCol), buckets))
    val hist = withB.groupBy(col(stratumCol), col("__bkt"))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(col(stratumCol)).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__t",
        targetOf(sum(col("__c")).over(Window.partitionBy(col(stratumCol)))))
      .filter(col("__t") > 0)
    val bound = cum.filter(col("__cum") >= col("__t"))
      .groupBy(col(stratumCol).as("__st"))
      .agg(min(col("__bkt")).as("__B"),
        min_by(col("__t") - (col("__cum") - col("__c")), col("__bkt")).as("__r"))
    // null-safe stratum match: a NULL stratum is a regular group here,
    // exactly as it was a regular window partition before.
    val joined = withB.join(broadcast(bound), col(stratumCol) <=> col("__st"))
    val below = joined.filter(col("__bkt") < col("__B"))
    val wBoundary = Window.partitionBy(col(stratumCol), col("__bkt"))
      .orderBy(col(keyCol))
    val atBoundary = joined.filter(col("__bkt") === col("__B"))
      .withColumn("__rn", row_number().over(wBoundary))
      .filter(col("__rn") <= col("__r"))
      .drop("__rn")
    below.unionByName(atBoundary).drop("__st", "__bkt", "__B", "__r")
  }

  /** The un-bucketed 32-bit Knuth mix ([[hashBucket]] without the final
    * bucket reduction): a deterministic stand-in for U{0..2^32-1}.
    */
  private def hash32(key: Column): Column =
    pmod(pmod(key.cast("long"), lit(2147483648L)) * 2654435761L,
      lit(4294967296L))

  /** Priority sampling (Duffield, Lund & Thorup, JACM 2007):
    * weighted-WITHOUT-replacement top-k with an unbiased per-item total
    * estimator — the subset-sum sketch for weighted corpora (sample docs
    * ∝ token count, estimate any subpopulation's token mass from the
    * sample alone). Each row gets priority w·M/(h+1) where h is the
    * deterministic 32-bit mix of its key (so u=(h+1)/M ∈ (0,1] plays the
    * uniform draw); the k largest priorities are the sample, τ = the
    * (k+1)-th priority, and est_weight = max(w, τ) is unbiased for w
    * (Σ est over the sample estimates Σ w over the corpus; exact when
    * the corpus has ≤ k rows, where τ = 0).
    *
    * Determinism: priority = (w·M)/(h+1) is computed as two
    * exactly-rounded double ops on exactly-represented operands (the
    * product w·M is exact while w < 2^21; past that the multiply is
    * still correctly rounded), so priorities — and hence the sample —
    * are bit-identical across engines and re-runs; rank ties break by
    * key.
    *
    * Scale shape: scoring is a map-only projection; the global top-(k+1)
    * plans as TakeOrderedAndProject (per-partition partial top-k, no
    * full sort, no single-reducer funnel); everything after the limit
    * operates on k+1 rows. Zero-weight rows are excluded up front (they
    * can never be sampled — priority 0).
    *
    * @param weightCol non-negative integer weights (token counts, bytes)
    * @return (keyCol, weightCol, rank, priority, est_weight), rank ≤ k
    *         by (priority DESC, key ASC)
    */
  def prioritySample(df: DataFrame, keyCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k > 0)
    val M = 4294967296L
    val scored = df
      .filter(col(weightCol) > 0)
      .select(col(keyCol), col(weightCol),
        (col(weightCol).cast("double") * M.toDouble /
          (hash32(col(keyCol)) + lit(1L)).cast("double")).as("priority"))
    val top = scored.orderBy(desc("priority"), col(keyCol)).limit(k + 1)
    // k+1 rows from here on: the unpartitioned window is bounded by
    // construction, not a corpus-wide funnel.
    val w = Window.orderBy(desc("priority"), col(keyCol))
    val ranked = top.withColumn("__rk", row_number().over(w))
    val tau = ranked.filter(col("__rk") === k + 1)
      .agg(coalesce(min("priority"), lit(0.0)).as("__tau"))
    ranked.filter(col("__rk") <= k)
      .crossJoin(broadcast(tau))
      .select(col(keyCol), col(weightCol),
        col("__rk").cast("long").as("rank"), col("priority"),
        greatest(col(weightCol).cast("double"), col("__tau")).as("est_weight"))
  }

  /** Poisson(1) CDF thresholds P(X ≤ k), k = 0..5 — computed once on
    * the driver (the only exp() in the bootstrap; it never runs inside
    * an engine) and embedded as plan/oracle literals, the ndcgDiscounts
    * discipline. Weight 6 is the tail cap (P ≈ 5.9e-5).
    */
  private[graft] val PoissonCdf: Seq[Double] = {
    var p = math.exp(-1.0)
    var c = 0.0
    (0 to 5).map { k =>
      if (k > 0) p = p / k
      c += p
      c
    }
  }

  /** The deterministic Poisson(1) bootstrap weight for (key, replicate):
    * hash(key·replicates + b) → uniform → inverse-CDF against the
    * driver-literal [[PoissonCdf]]. Shared by [[bootstrapReplicates]]
    * and [[Evaluation.aucBootstrap]] so every bootstrap in the library
    * draws the same weights for the same (key, b).
    */
  private[graft] def poissonWeight(key: Column, b: Column,
                                   replicates: Int): Column = {
    val h = pmod(pmod((key * replicates + b).cast("long"),
      lit(2147483648L)) * lit(2654435761L), lit(4294967296L))
    val u = h.cast("double") / lit(4294967296.0)
    PoissonCdf.map(c => when(u >= lit(c), 1L).otherwise(0L)).reduce(_ + _)
  }

  /** Deterministic Poisson BOOTSTRAP — error bars for corpus metrics
    * without resampling the corpus: replicate b reweights every row by
    * a Poisson(1) draw derived from hash(key·B + b), and the metric is
    * re-computed under each weighting. The spread of the B replicate
    * values IS the sampling distribution of the metric (the standard
    * Poisson approximation to the multinomial bootstrap — exact enough
    * at corpus n, and embarrassingly parallel where true resampling is
    * a B-fold shuffle).
    *
    * Determinism discipline: draws come from the Knuth bucket hash (a
    * pure function of key and b — stable across runs, partitionings,
    * engines), the CDF thresholds are driver literals, and per-replicate
    * sums are exact BIGINTs (metric must be integer-valued — a 0/1 flag
    * or a count; quantize first otherwise), so every replicate rate is
    * one division over exact integers and the whole table hash-gates.
    *
    * Scale shape: ONE pass with a B× map-side explode (vs B passes over
    * the corpus), then a B-row aggregate — shuffle is B rows of three
    * longs. B ≲ 100 keeps the blowup sane; the metric's variance, not
    * B, is usually the accuracy limit.
    *
    * @param metric integer-valued column (cast upstream)
    * @return (b, w_sum, metric_wsum, rate) — rate =
    *         metric_wsum / w_sum, NULL on an all-zero-weight replicate
    */
  def bootstrapReplicates(df: DataFrame, keyCol: String, metric: Column,
                          replicates: Int): DataFrame = {
    require(replicates > 0, "need at least one replicate")
    val base = df
      .select(col(keyCol).cast("long").as("__key"),
        metric.cast("long").as("__m"))
      .select(col("__key"), col("__m"),
        explode(sequence(lit(0), lit(replicates - 1))).as("__b"))
    base.withColumn("__w",
        poissonWeight(col("__key"), col("__b"), replicates))
      .groupBy(col("__b").cast("long").as("b"))
      .agg(sum(col("__w")).as("w_sum"),
        sum(col("__w") * col("__m")).as("metric_wsum"))
      .select(col("b"), col("w_sum"), col("metric_wsum"),
        when(col("w_sum") > 0,
          col("metric_wsum").cast("double") / col("w_sum").cast("double"))
          .as("rate"))
  }

  /** Deterministic STRATIFIED k-fold assignment: within every stratum,
    * rows take folds 0..k−1 round-robin along the Knuth-hash order of
    * their key, so per-stratum fold sizes differ by at most 1 — the
    * balance guarantee q99's `hash % k` split cannot give (its
    * per-stratum counts are binomial, and a rare stratum can land 80/20).
    * Assignment is a pure function of (key hash rank within stratum), so
    * it is stable under re-partitioning and re-runs on the same corpus —
    * though unlike [[hashSplit]], APPENDING rows re-ranks later keys
    * (k-fold balance is a property of a frozen snapshot; use hashSplit
    * when incremental stability matters more than balance).
    *
    * Scale shape: the within-stratum rank reuses
    * [[GlobalIds.contiguousIdsByGroup]]'s histogram-offset plan — the
    * only window over raw rows is partitioned by (stratum, hash-bucket),
    * 256 buckets per stratum, so no stratum funnels through one task.
    *
    * @return `df` plus `fold` (LONG 0..k−1)
    */
  def stratifiedKFold(df: DataFrame, stratumCol: String, keyCol: String,
                      k: Int): DataFrame = {
    require(k >= 2, "need at least 2 folds")
    GlobalIds.contiguousIdsByGroup(
      df.withColumn("__h", hash32(col(keyCol))),
      group = col(stratumCol),
      bucket = expr("__h DIV 16777216"), // 256 buckets over the 2^32 space
      order = Seq(col("__h"), col(keyCol)),
      idName = "__ord")
      .withColumn("fold", pmod(col("__ord"), lit(k.toLong)))
      .drop("__h", "__ord")
  }

  /** Poisson-bootstrap error bars for a MEDIAN ([[bootstrapReplicates]]'
    * order-statistic sibling): each replicate reweights every row by its
    * deterministic Poisson(1) draw and takes the WEIGHTED median off the
    * per-replicate value histogram (min v with 2·cum ≥ n — the q55
    * formula on weighted counts). The replicate spread is the median's
    * sampling distribution — the error bars a robust location estimate
    * deserves, where [[bootstrapReplicates]] covers means/rates.
    *
    * Exact throughout: integer weights, BIGINT cumulations, no division
    * at all (the median IS a data value). Scale shape: one B× explode
    * into the (replicate, value) histogram — map-side combine absorbs
    * the corpus; windows run over B × |distinct values| histogram rows.
    *
    * @return one row per replicate: (b, n_eff, median) — n_eff is the
    *         replicate's total weight; empty replicates are absent
    */
  def bootstrapMedian(df: DataFrame, keyCol: String, value: Column,
                      replicates: Int): DataFrame = {
    require(replicates > 0, "need at least one replicate")
    val base = df
      .select(col(keyCol).cast("long").as("__k"), value.cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .select(col("__k"), col("__v"),
        explode(sequence(lit(0), lit(replicates - 1))).as("__b"))
      .withColumn("__w", poissonWeight(col("__k"), col("__b"), replicates))
    val hist = base.groupBy("__b", "__v").agg(sum(col("__w")).as("__c"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("__b").orderBy("__v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy("__b")
    hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wTot))
      .filter(col("__n") > 0L && col("__cum") * 2 >= col("__n"))
      .groupBy(col("__b").cast("long").as("b"))
      .agg(max(col("__n")).as("n_eff"), min(col("__v")).as("median"))
  }

  /** NEYMAN sample-allocation design: split a fixed sample `budget`
    * across strata proportional to n_h·σ_h — the textbook-optimal
    * allocation for estimating a mean under a fixed budget (variable
    * strata earn more samples than their row share; constant strata earn
    * almost none). This emits the DESIGN table a stratified sampler
    * (e.g. [[stratifiedSample]] rates, or a per-stratum top-k) then
    * executes.
    *
    * Exactness: with population variance σ² = (nΣv² − (Σv)²)/n², the
    * weight n_h·σ_h collapses to sqrt(n_h·Σv² − (Σv)²) — ONE sqrt of an
    * exact BIGINT per stratum, quantized to ⌊·2²⁰⌋ before the
    * cross-stratum total, so shares are ratios of exact integers and the
    * floor-allocated counts are integer-deterministic (the unallocated
    * remainder — at most |strata| rows — is reported, not silently
    * spread). Overflow: n_h·Σv² < 2⁶³, the [[Regression]] contract.
    *
    * @return one row per stratum: (stratum, n, var_num, weight_fp,
    *         alloc, share) + the same `remainder` on every row
    */
  def neymanAllocation(df: DataFrame, stratumCol: String, value: Column,
                       budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val g = df.select(col(stratumCol).as("__g"), value.cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy("__g")
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("__s"),
        sum(col("__v") * col("__v")).as("__q"))
      .withColumn("var_num", col("n") * col("__q") - col("__s") * col("__s"))
      .withColumn("weight_fp",
        floor(sqrt(greatest(col("var_num"), lit(0L)).cast("double")) *
          lit(1048576.0)).cast("long"))
      .withColumn("__tw", sum(col("weight_fp")).over(wAll)) // |strata| rows
    g.withColumn("alloc",
        when(col("__tw") > 0L,
          expr(s"($budget * weight_fp) DIV __tw")).otherwise(lit(0L)))
      .withColumn("share",
        when(col("__tw") > 0L,
          col("weight_fp").cast("double") / col("__tw").cast("double")))
      .withColumn("remainder",
        lit(budget) - sum(col("alloc")).over(wAll))
      .select(col("__g").as(stratumCol), col("n"), col("var_num"),
        col("weight_fp"), col("alloc"), col("share"), col("remainder"))
  }
}
