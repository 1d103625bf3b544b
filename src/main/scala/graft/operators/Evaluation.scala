package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
