package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Classifier-evaluation metrics computed EXACTLY from a score
  * histogram — the model-QA tier of a curation pipeline (a quality
  * classifier like q98/q102 is only trustworthy if its ranking quality
  * is measured, and at corpus scale the measurement itself must be a
  * bounded aggregate, not a sklearn call over a collected array).
  *
  * Shared scale shape for both metrics: ONE `groupBy(score)` histogram
  * pass over the corpus (map-side combinable; output bounded by DISTINCT
  * scores, not rows), then windows over the histogram rows only. The
  * classic formulation — sort all N rows by score, cumulate — funnels
  * the corpus through a global sort; this one never sorts data rows.
  * Callers quantize float scores first (`floor(z * 2^20)` — an exact
  * integer image of a double, the [[EmbeddingStats]] discipline), which
  * bounds the histogram AND keeps group keys integer (float group keys
  * would hinge the contract on -0.0/NaN equality semantics).
  *
  * Exactness: ranks, TP/FP counts, and the AUC numerator/denominator are
  * BIGINT arithmetic — order-free and engine-portable; doubles appear
  * only in one final division per output value (fixed op order), the
  * [[Regression]] discipline.
  */
object Evaluation {

  /** Exact ROC-AUC (Mann–Whitney U with midrank tie handling) as one
    * row: `(n_pos, n_neg, auc_num, auc_den, auc)` where
    * `auc = auc_num / auc_den` exactly.
    *
    * Midranks without halves: with the histogram in ascending score
    * order, rows at distinct score s (c total, p positive) have average
    * rank cum − (c−1)/2, so DOUBLED rank-sum terms stay integer:
    * 2·Σ_pos ranks = Σ_s p·(2·cum − c + 1). Then
    *
    *   auc_num = Σ_s p·(2·cum − c + 1) − P·(P+1)
    *   auc_den = 2·P·N
    *
    * (U/PN with ties counted half — exactly what a plotted ROC curve's
    * trapezoid area gives). Overflow: auc_num ≤ 2·P·rows; P·N < 2^63
    * needs rows < ~6e9 — partition the eval set (or sample) beyond that,
    * as any single-number AUC at that scale would anyway.
    *
    * Degenerate inputs (P = 0 or N = 0) yield NULL `auc` with the counts
    * still reported. NULL scores are excluded (a row the model could not
    * score has no rank); NULL labels are rejected by filtering — count
    * them upstream if they matter.
    *
    * @param scoreCol integer (LONG-castable) score column — quantize
    *                 floats first, see object doc
    * @param labelCol boolean-castable ground-truth column
    */
  def aucExact(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val hist = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("long").as("__s"),
        col(labelCol).cast("boolean").as("__y"))
      .groupBy("__s")
      .agg(count(lit(1)).as("__c"), count(when(col("__y"), 1L)).as("__p"))
    val wCum = Window.orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .agg(
        sum(col("__p")).as("n_pos"),
        sum(col("__c") - col("__p")).as("n_neg"),
        sum(col("__p") * (lit(2) * col("__cum") - col("__c") + 1)).as("__r2"))
      .select(col("n_pos"), col("n_neg"),
        (col("__r2") - col("n_pos") * (col("n_pos") + 1)).as("auc_num"),
        (lit(2) * col("n_pos") * col("n_neg")).as("auc_den"))
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("auc_num").cast("double") / col("auc_den").cast("double")))
  }

  /** [[aucExact]] PER GROUP — the fairness/slice audit ("is the
    * classifier's ranking quality uniform across languages/sources, or
    * does one slice carry a blind spot?"). Same histogram discipline
    * with the cumulation window PARTITIONED by the group, so each
    * group's rows are its distinct scores only; one row per group.
    */
  def aucExactByGroup(df: DataFrame, groupCol: String, scoreCol: String,
                      labelCol: String): DataFrame = {
    val hist = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(groupCol).as("__g"),
        col(scoreCol).cast("long").as("__s"),
        col(labelCol).cast("boolean").as("__y"))
      .groupBy("__g", "__s")
      .agg(count(lit(1)).as("__c"), count(when(col("__y"), 1L)).as("__p"))
    val wCum = Window.partitionBy("__g").orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .groupBy(col("__g").as(groupCol))
      .agg(
        sum(col("__p")).as("n_pos"),
        sum(col("__c") - col("__p")).as("n_neg"),
        sum(col("__p") * (lit(2) * col("__cum") - col("__c") + 1)).as("__r2"))
      .select(col(groupCol), col("n_pos"), col("n_neg"),
        (col("__r2") - col("n_pos") * (col("n_pos") + 1)).as("auc_num"),
        (lit(2) * col("n_pos") * col("n_neg")).as("auc_den"))
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("auc_num").cast("double") / col("auc_den").cast("double")))
  }

  /** Exact-arithmetic AVERAGE PRECISION (area under the PR curve by the
    * step rule): over thresholds descending,
    * AP = Σ_t Δtp_t · precision_t / P. The per-threshold precision is
    * one double division, but the SUM is kept deterministic by the
    * nDCG fixed-point discipline: each term is Δtp · floor(precision ·
    * 2³⁰) — an exact BIGINT — so
    *
    *   ap = ap_num / (P · 2³⁰)   with   ap_num = Σ Δtp·⌊prec·2³⁰⌋
    *
    * and no float accumulation order anywhere (a plain sum of double
    * products would hash-differ across partitionings). Quantization
    * bias is ≤ 2⁻³⁰ per term — far below any decision threshold.
    * One row: (n_pos, ap_num, ap); NULL ap when P = 0.
    */
  def averagePrecision(df: DataFrame, scoreCol: String,
                       labelCol: String): DataFrame = {
    val Scale = 1L << 30
    val hist = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("long").as("__s"),
        col(labelCol).cast("boolean").as("__y"))
      .groupBy("__s")
      .agg(count(lit(1)).as("__c"), count(when(col("__y"), 1L)).as("__p"))
    val wDesc = Window.orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("__tp", sum(col("__p")).over(wDesc))
      .withColumn("__fp", sum(col("__c") - col("__p")).over(wDesc))
      .withColumn("__term",
        col("__p") * floor((col("__tp").cast("double") /
          (col("__tp") + col("__fp")).cast("double")) * lit(Scale))
          .cast("long"))
      .agg(sum(col("__p")).as("n_pos"), sum(col("__term")).as("ap_num"))
      .withColumn("ap",
        when(col("n_pos") > 0,
          col("ap_num").cast("double") /
            (col("n_pos") * lit(Scale)).cast("double")))
  }

  /** Precision/recall sweep: one row per DISTINCT score threshold t
    * (descending), for the classifier "positive ⟺ score ≥ t" —
    * `(threshold, tp, fp, fn, precision, recall)` with exact BIGINT
    * confusion counts and one division each for the ratios.
    *
    * The operating-point picker: a release pipeline reads this table to
    * choose the threshold meeting its precision floor, instead of
    * re-scoring the corpus per candidate threshold. Window note: the
    * cumulative sums run over HISTOGRAM rows (distinct scores), so the
    * single-partition `Window.orderBy` warning is bounded by score
    * cardinality — quantization keeps that small by construction.
    */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val hist = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("long").as("threshold"),
        col(labelCol).cast("boolean").as("__y"))
      .groupBy("threshold")
      .agg(count(lit(1)).as("__c"), count(when(col("__y"), 1L)).as("__p"))
    val wDesc = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    hist
      .withColumn("tp", sum(col("__p")).over(wDesc))
      .withColumn("fp", sum(col("__c") - col("__p")).over(wDesc))
      .withColumn("fn", sum(col("__p")).over(wAll) - col("tp"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        (col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
          .as("precision"),
        when(col("tp") + col("fn") > 0,
          col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
          .as("recall"))
  }

  /** The argmax-F1 operating point — one row off [[prCurve]]: the
    * threshold maximizing F1 = 2·tp / (2·tp + fp + fn), ties broken
    * toward the SMALLER threshold (more recall at equal F1). The
    * balanced complement to q184's precision-floor selection.
    *
    * Determinism note: F1 is one division of exact BIGINTs, computed
    * identically on any engine, so ordering by the double is
    * cross-engine stable; the explicit threshold tie-break covers exact
    * F1 ties. Top-1 via sort+limit = TakeOrderedAndProject over
    * histogram rows — no full sort materializes.
    */
  def f1OperatingPoint(df: DataFrame, scoreCol: String,
                       labelCol: String): DataFrame =
    prCurve(df, scoreCol, labelCol)
      .withColumn("f1",
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
          (lit(2L) * col("tp")).cast("double") /
            (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double")))
      .orderBy(col("f1").desc, col("threshold").asc)
      .limit(1)

  /** Cumulative GAIN/LIFT table — the "how much of the good data do the
    * top k% of scores capture" read every triage pipeline wants before
    * it trusts a classifier to rank a corpus (AUC says the ranking is
    * good on average; THIS says what acting on the top decile buys).
    *
    * Ranks are exact and deterministic: ordinal along (score DESC,
    * key ASC) via [[GlobalIds.contiguousIds]] — histogram-offset, no
    * global sort funnel (the bucket is the negated score, monotone
    * along the order; within-bucket windows see one score's ties only).
    * Bucket d of `buckets` covers ordinals with `(ord·buckets) DIV N =
    * d` — sizes differ by ≤ 1, boundary ties resolved by the key
    * tiebreak, never by engine sort stability.
    *
    * Per bucket: `(decile, n, n_pos, cum_n, cum_pos, pos_rate,
    * cum_gain, lift)` where cum_gain = cum_pos/P (recall at depth) and
    * lift = cum_pos·N / (cum_n·P) (capture rate vs random). BIGINT
    * counts; one division per ratio; windows run over `buckets` rows.
    * NULL scores/labels are excluded (unrankable).
    */
  def decileLift(df: DataFrame, keyCol: String, scoreCol: String,
                 labelCol: String, buckets: Int = 10): DataFrame = {
    require(buckets > 0, "need at least one bucket")
    val base = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(keyCol).cast("long").as("__k"),
        col(scoreCol).cast("long").as("__s"),
        col(labelCol).cast("boolean").as("__y"))
    val ranked = GlobalIds.contiguousIds(base, -col("__s"),
      Seq(col("__s").desc, col("__k").asc), "__ord")
    val tot = base.agg(count(lit(1)).as("__n"))
    val wCum = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy() // over `buckets` histogram rows only
    ranked.crossJoin(broadcast(tot))
      .withColumn("decile", expr(s"(__ord * $buckets) DIV __n"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"), count(when(col("__y"), 1L)).as("n_pos"))
      .withColumn("cum_n", sum(col("n")).over(wCum))
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .withColumn("__P", sum(col("n_pos")).over(wAll))
      .withColumn("__N", sum(col("n")).over(wAll))
      .select(col("decile"), col("n"), col("n_pos"), col("cum_n"),
        col("cum_pos"),
        (col("n_pos").cast("double") / col("n").cast("double"))
          .as("pos_rate"),
        when(col("__P") > 0,
          col("cum_pos").cast("double") / col("__P").cast("double"))
          .as("cum_gain"),
        when(col("__P") > 0,
          (col("cum_pos") * col("__N")).cast("double") /
            (col("cum_n") * col("__P")).cast("double")).as("lift"))
  }

  /** Split-CONFORMAL acceptance gate: calibrate a score threshold with
    * a finite-sample coverage guarantee, then measure it on the held
    * split — the distribution-free answer to "what cutoff keeps ≥
    * (1−α) of genuinely good documents", with the miss rate guaranteed
    * by exchangeability, not by trusting the classifier's calibration.
    *
    * Split: [[Sampling.hashBucket]](key) < calPct is calibration —
    * deterministic, reproducible, same convention as q99. On the
    * calibration POSITIVES' scores, the threshold is the k-th smallest
    * with k = ⌊α·(n_cal+1)⌋ (α = alphaNum/alphaDen exactly — integer
    * arithmetic, no float α): accepting scores ≥ that order statistic
    * misses at most k−1 of n_cal exchangeable positives, so expected
    * test coverage ≥ 1 − α. k = 0 (or no calibration positives) means
    * α is too tight for the sample — threshold NULL = accept-all.
    *
    * Order statistic via the score histogram (min score whose ascending
    * cumulative count reaches k) — no sort, no collect; windows over
    * distinct-score rows only. One output row: `(n_cal, k, threshold,
    * n_test_pos, n_test_cov, coverage, n_test_neg, n_neg_pass,
    * neg_pass_rate)` — coverage is the guaranteed side; neg_pass_rate
    * is the price (bad docs the gate lets through at that threshold).
    */
  def conformalGate(df: DataFrame, keyCol: String, scoreCol: String,
                    labelCol: String, calPct: Int = 50,
                    alphaNum: Int = 1, alphaDen: Int = 10): DataFrame = {
    require(calPct > 0 && calPct < 100, "calPct must split both ways")
    require(alphaNum >= 0 && alphaDen > 0, "alpha must be a ratio >= 0")
    val base = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(keyCol).cast("long").as("__k"),
        col(scoreCol).cast("long").as("__s"),
        col(labelCol).cast("boolean").as("__y"))
      .withColumn("__cal", Sampling.hashBucket(col("__k"), 100) < calPct)
    val wCum = Window.orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy() // distinct-score histogram rows
    val thr = base.filter(col("__cal") && col("__y"))
      .groupBy("__s").agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__ncal", sum(col("__c")).over(wAll))
      .withColumn("__kk",
        expr(s"($alphaNum * (__ncal + 1)) DIV $alphaDen"))
      .filter(col("__cum") >= col("__kk") && col("__kk") >= 1)
      .agg(min(col("__s")).as("__thr"))
    val cal = base.filter(col("__cal") && col("__y"))
      .agg(count(lit(1)).as("n_cal"))
    base.filter(!col("__cal"))
      .crossJoin(broadcast(thr))
      .withColumn("__pass", col("__thr").isNull || col("__s") >= col("__thr"))
      .agg(
        count(when(col("__y"), 1L)).as("n_test_pos"),
        count(when(col("__y") && col("__pass"), 1L)).as("n_test_cov"),
        count(when(!col("__y"), 1L)).as("n_test_neg"),
        count(when(!col("__y") && col("__pass"), 1L)).as("n_neg_pass"),
        min(col("__thr")).as("threshold"))
      .crossJoin(broadcast(cal))
      .select(col("n_cal"),
        expr(s"($alphaNum * (n_cal + 1)) DIV $alphaDen").as("k"),
        col("threshold"), col("n_test_pos"), col("n_test_cov"),
        when(col("n_test_pos") > 0,
          col("n_test_cov").cast("double") / col("n_test_pos").cast("double"))
          .as("coverage"),
        col("n_test_neg"), col("n_neg_pass"),
        when(col("n_test_neg") > 0,
          col("n_neg_pass").cast("double") / col("n_test_neg").cast("double"))
          .as("neg_pass_rate"))
  }

  /** ISOTONIC calibration by pool-adjacent-violators over score bins —
    * the calibration LEARNER next to the reliability table (q180 shows
    * whether scores are calibrated; this produces the monotone
    * score→probability map that fixes them, the standard
    * post-processing for a ranking-good/calibration-poor classifier).
    *
    * Exactness: bins are the [[decileLift]] exact ordinals; PAVA runs on
    * the DRIVER over the collected `bins` rows (bounded by construction
    * — the codebook/centroid license, never corpus rows) with pooled
    * rates compared by BIGINT cross-multiplication (pos₁·n₂ ≥ pos₂·n₁),
    * so pooling decisions are integer-deterministic; each pool's
    * calibrated rate is the exact rational pos/n, emitted as numerator,
    * denominator, AND one division. The result is the textbook isotonic
    * fit: the left-to-right sweep merges while the last pool's rate
    * exceeds its successor's, which yields the unique non-decreasing
    * least-squares step function.
    *
    * @return one row per ORIGINAL bin: (bin, score_lo, score_hi, n,
    *         n_pos, pool, cal_num, cal_den, calibrated) — `pool` is the
    *         leftmost bin index of the merged pool; `calibrated` is
    *         non-decreasing in `bin`
    */
  def isotonicCalibration(df: DataFrame, keyCol: String, scoreCol: String,
                          labelCol: String, bins: Int = 10): DataFrame = {
    require(bins > 0, "need at least one bin")
    val base = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(keyCol).cast("long").as("__k"),
        col(scoreCol).cast("long").as("__s"),
        col(labelCol).cast("boolean").as("__y"))
    val ranked = GlobalIds.contiguousIds(base, col("__s"),
      Seq(col("__s").asc, col("__k").asc), "__ord")
    val tot = base.agg(count(lit(1)).as("__n"))
    val binRows = ranked.crossJoin(broadcast(tot))
      .withColumn("bin", expr(s"(__ord * $bins) DIV __n"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), count(when(col("__y"), 1L)).as("n_pos"),
        min(col("__s")).as("score_lo"), max(col("__s")).as("score_hi"))
      .orderBy("bin")
      .collect() // `bins` rows — bounded by construction
    // PAVA sweep with exact rational rate compares
    case class Pool(firstBin: Long, n: Long, pos: Long)
    val pools = scala.collection.mutable.ArrayBuffer.empty[Pool]
    binRows.foreach { r =>
      pools += Pool(r.getAs[Long]("bin"), r.getAs[Long]("n"),
        r.getAs[Long]("n_pos"))
      // merge while the previous pool's rate EXCEEDS the last one's
      while (pools.length >= 2 && {
        val a = pools(pools.length - 2); val b = pools.last
        // pos_a/n_a > pos_b/n_b  ⟺  pos_a·n_b > pos_b·n_a (n > 0)
        BigInt(a.pos) * b.n > BigInt(b.pos) * a.n
      }) {
        val b = pools.remove(pools.length - 1)
        val a = pools.remove(pools.length - 1)
        pools += Pool(a.firstBin, a.n + b.n, a.pos + b.pos)
      }
    }
    val sortedPools = pools.toVector // in bin order by construction
    def poolOf(bin: Long): Pool = sortedPools.takeWhile(_.firstBin <= bin).last
    val spark = df.sparkSession
    import spark.implicits._
    binRows.map { r =>
      val bin = r.getAs[Long]("bin")
      val p = poolOf(bin)
      (bin, r.getAs[Long]("score_lo"), r.getAs[Long]("score_hi"),
        r.getAs[Long]("n"), r.getAs[Long]("n_pos"), p.firstBin, p.pos, p.n,
        p.pos.toDouble / p.n.toDouble)
    }.toSeq.toDF("bin", "score_lo", "score_hi", "n", "n_pos", "pool",
      "cal_num", "cal_den", "calibrated")
  }

  /** Deterministic Poisson-BOOTSTRAP error bars for [[aucExact]]: each
    * replicate b reweights every example by its [[Sampling
    * .poissonWeight]] draw, and the midrank formula runs on WEIGHTED
    * histogram counts (an integer weight w is w tied copies, so the
    * tie-corrected rank-sum generalizes verbatim). The spread across
    * the B AUCs is the metric's sampling distribution — q182's
    * discipline applied to AUC instead of a mean, and like q182 the
    * replicate table itself is exact integers + one division, so even
    * the error bars hash-gate.
    *
    * Scale shape: the one extra cost over [[aucExact]] is the B×
    * replicate explode BEFORE the (replicate, score) histogram — the
    * map-side combine still absorbs the corpus, and everything after is
    * B × |distinct scores| rows. Replicates with zero positives or
    * negatives yield NULL auc.
    *
    * @return (b, n_pos, n_neg, auc_num, auc_den, auc) per replicate
    */
  /** Unbiased pass@k per task (Chen et al. 2021, "Evaluating Large
    * Language Models Trained on Code", eq. 1): with n samples and c
    * passes, pass@k = 1 − C(n−c,k)/C(n,k) = 1 − Π_{i=0}^{k−1}
    * (n−c−i)/(n−i) — the probability a random k-subset contains at
    * least one pass. THE headline metric of a code-eval harness; the
    * naive 1−(1−c/n)^k estimator is biased, this one is not.
    *
    * Exactness: numerator and denominator are k-term falling-factorial
    * PRODUCTS in DECIMAL(38,0) — exact integers (n^k < 10^38 bounds
    * apply: at k ≤ 6, any n up to ~10^6 samples/task fits; past it,
    * ANSI decimal overflow fails LOUD, never silently rounds). The
    * emitted `pass_at_k_q30` is one integral division of
    * (den−num)·2³⁰ by den (positive operands — exact floor), and
    * `pass_at_k` its exact 2^-30 rescale; num/den ship as decimal
    * strings for any downstream exact aggregation.
    *
    * Scale shape: one hash-aggregate to (task, n, c) — map-side
    * combinable, output bounded by the task domain — then k-term
    * row-local arithmetic. Nothing is corpus-sized after the first
    * aggregate.
    *
    * @param passed boolean expression: this sample solved the task
    * @return one row per task: (taskCol, n, c, passk_num_str,
    *         passk_den_str, pass_at_k_q30, pass_at_k) — tasks with
    *         n < k yield NULL estimates (k draws don't exist); n−c < k
    *         yields exactly 1 (every k-subset hits a pass: num = 0)
    */
  def passAtK(df: DataFrame, taskCol: String, passed: Column,
              k: Int): DataFrame = {
    require(k >= 1 && k <= 8, "need 1 <= k <= 8 (decimal exactness bound)")
    val d38 = DecimalType(38, 0)
    val per = df.groupBy(col(taskCol))
      .agg(count(lit(1)).as("n"), count(when(passed, 1)).as("c"))
    val fall = (base: Column) => aggregate(
      sequence(lit(0), lit(k - 1)), lit(1).cast(d38),
      (acc, i) => (acc * greatest(base - i.cast("long"), lit(0L)).cast(d38))
        .cast(d38))
    per.withColumn("__num", fall(col("n") - col("c")))
      .withColumn("__den", fall(col("n")))
      .select(col(taskCol), col("n"), col("c"),
        col("__num").cast("string").as("passk_num_str"),
        col("__den").cast("string").as("passk_den_str"),
        when(col("n") >= k,
          org.apache.spark.sql.graftbridge.toColumn(
            new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
              org.apache.spark.sql.graftbridge.toExpression(
                ((col("__den") - col("__num")) * lit(1073741824L).cast(d38))
                  .cast(d38)),
              org.apache.spark.sql.graftbridge.toExpression(col("__den")))))
          .as("pass_at_k_q30"))
      .withColumn("pass_at_k",
        col("pass_at_k_q30").cast("double") / lit(1073741824.0))
  }

  /** SELF-CONSISTENCY majority-vote accuracy (Wang et al. 2022,
    * "Self-Consistency Improves Chain of Thought Reasoning"): per task,
    * the MODAL answer among its n samples — the consensus a
    * sample-and-vote harness ships — compared against the gold answer.
    * Ties break to the SMALLEST answer value, so the consensus is a
    * deterministic function of the sample multiset (merge-order-free,
    * the [[NgramLm.draftTable]] discipline).
    *
    * Scale shape: one (task, answer) hash-aggregate (map-side
    * combinable, bounded by distinct answers per task), a row_number
    * window whose per-task fan-in is that bounded answer set, one
    * per-task aggregate, and a task-keyed join to the gold table.
    * Nothing is ever corpus-sized after the first aggregate.
    *
    * @param samples one row per (task, sampled answer)
    * @param gold    one row per task with its gold answer (tasks absent
    *                here keep NULL `gold`/`is_correct` — unlabeled)
    * @return one row per task WITH ≥1 sample: (taskCol, n_samples,
    *         n_distinct_answers, modal_answer, modal_count, gold,
    *         is_correct)
    */
  def majorityVoteAccuracy(samples: DataFrame, taskCol: String,
                           answerCol: String, gold: DataFrame,
                           goldCol: String): DataFrame = {
    val counts = samples.groupBy(col(taskCol), col(answerCol).as("__a"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(taskCol)
      .orderBy(col("__c").desc, col("__a").asc)
    val modal = counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(taskCol), col("__a").as("modal_answer"),
        col("__c").as("modal_count"))
    val per = samples.groupBy(col(taskCol))
      .agg(count(lit(1)).as("n_samples"),
        countDistinct(col(answerCol)).as("n_distinct_answers"))
    per.join(modal, Seq(taskCol))
      .join(gold.select(col(taskCol), col(goldCol).as("gold")),
        Seq(taskCol), "left")
      .withColumn("is_correct", col("modal_answer") === col("gold"))
  }

  def aucBootstrap(df: DataFrame, keyCol: String, scoreCol: String,
                   labelCol: String, replicates: Int): DataFrame = {
    require(replicates > 0, "need at least one replicate")
    val base = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(keyCol).cast("long").as("__key"),
        col(scoreCol).cast("long").as("__s"),
        col(labelCol).cast("boolean").as("__y"))
      .select(col("__key"), col("__s"), col("__y"),
        explode(sequence(lit(0), lit(replicates - 1))).as("__b"))
      .withColumn("__w",
        Sampling.poissonWeight(col("__key"), col("__b"), replicates))
    val hist = base.groupBy("__b", "__s")
      .agg(sum(col("__w")).as("__c"),
        sum(when(col("__y"), col("__w")).otherwise(0L)).as("__p"))
    val wCum = Window.partitionBy("__b").orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .groupBy(col("__b").cast("long").as("b"))
      .agg(
        sum(col("__p")).as("n_pos"),
        sum(col("__c") - col("__p")).as("n_neg"),
        sum(col("__p") * (lit(2) * col("__cum") - col("__c") + 1)).as("__r2"))
      .select(col("b"), col("n_pos"), col("n_neg"),
        (col("__r2") - col("n_pos") * (col("n_pos") + 1)).as("auc_num"),
        (lit(2) * col("n_pos") * col("n_neg")).as("auc_den"))
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("auc_num").cast("double") / col("auc_den").cast("double")))
  }
}
