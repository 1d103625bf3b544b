package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the fastText-style linear classifier
  * every production corpus pipeline runs after the heuristic gates
  * (C4/Gopher rules first, a trained quality model second). A linear
  * model over cheap per-document features is the standard choice at
  * corpus scale because scoring is a pure projection: no shuffle, no
  * broadcast, codegen-friendly, and — unlike a deep scorer — exactly
  * reproducible in any SQL engine, which keeps the serving path
  * oracle-checkable like every other operator here.
  *
  * Two halves:
  *   - [[train]]: batch gradient-descent logistic regression. Each
  *     iteration is ONE aggregate over the corpus (map-side partials →
  *     a single d+2-double row on the driver); model state is d+1
  *     doubles regardless of corpus size, the exact shape of
  *     [[Pq.refineCodebooks]]'s bounded-state Lloyd loop. 100 TB story:
  *     per-iteration cost is a cached-projection scan + an aggregate of
  *     ONE row — no shuffle of corpus rows, ever.
  *   - [[applyModel]]: serving. Emits the LINEAR score z (not the
  *     sigmoid): exp()'s last ulp is libm-dependent so a gated output
  *     must not cross it, and sigmoid is monotone so thresholding at
  *     z > 0 is exactly p > 1/2. The dot product folds left-to-right
  *     from 0.0 in declared feature order — an oracle mirrors it
  *     parenthesis-for-parenthesis (SCALE.md "IEEE parity").
  *
  * Training standardizes features internally (GD on raw corpus features
  * — token counts in the thousands next to ratios in [0,1] — needs it
  * to converge), then folds the standardization back into RAW-space
  * weights: w'_j = w_j/σ_j, b' = b − Σ_j w_j·μ_j/σ_j. The returned
  * model scores raw features directly, so serving needs no (μ, σ)
  * side-channel. The fold-in is algebraically exact; floating-point
  * association differs from scoring in standardized space by ulps —
  * [[applyModel]] over the folded weights IS the canonical path (the
  * spec pins the two within 1e-9 relative).
  */
object LinearModel {

  /** Trained model: raw-feature-space weights (featureCols order) + bias. */
  final case class Model(weights: Array[Double], bias: Double)

  /** Linear score ((((0.0 + f0·w0) + f1·w1) + …) + bias — fold order is
    * the contract (left-to-right in `features` order, seeded at 0.0,
    * bias added last); IEEE addition is not associative, so an oracle
    * must parenthesize identically to hash-match.
    */
  def score(features: Seq[Column], weights: Seq[Double], bias: Double): Column = {
    require(features.length == weights.length,
      s"${features.length} features vs ${weights.length} weights")
    features.zip(weights).foldLeft(lit(0.0): Column) {
      case (acc, (f, w)) => acc + (f.cast("double") * lit(w))
    } + lit(bias)
  }

  /** Score + thresholded label as new columns. `predicted` is 1 when
    * z > 0 (⇔ sigmoid(z) > 1/2), else 0; NULL features make z NULL and
    * predicted 0 — coalesce features first if NULL must mean something
    * else. Pure projection: scales like a scan.
    */
  def applyModel(df: DataFrame, featureCols: Seq[String], model: Model,
                 scoreName: String = "z",
                 labelName: String = "predicted"): DataFrame =
    df.withColumn(scoreName,
        score(featureCols.map(col), model.weights.toSeq, model.bias))
      .withColumn(labelName,
        when(col(scoreName) > 0.0, 1).otherwise(0))

  /** Batch-GD logistic regression on a 0/1 label column.
    *
    * Plan per iteration: one job over a cached (label, standardized
    * features) projection computing Σ(p−y)·f_j for each j plus Σ(p−y)
    * and n — a single hash-free global aggregate (map-side partials,
    * one row out). The sigmoid lives only here, inside training, where
    * nothing is hash-compared. L2 regularization (`l2` · w_j, bias
    * exempt) keeps separable data from driving |w| → ∞.
    *
    * Constant features (σ = 0) are standardized to 0 ⇒ gradient 0 ⇒
    * weight stays 0 ⇒ raw-space weight 0: they drop out cleanly rather
    * than dividing by zero.
    */
  def train(df: DataFrame, featureCols: Seq[String], labelCol: String,
            iterations: Int = 50, learningRate: Double = 0.5,
            l2: Double = 1e-4): Model = {
    require(iterations >= 0 && learningRate > 0 && l2 >= 0)
    val d = featureCols.length
    require(d >= 1, "need at least one feature")

    // One pass: per-feature mean and population stddev for standardization.
    val statsRow = df.select(
      featureCols.flatMap(c =>
        Seq(avg(col(c).cast("double")).as(s"mu_$c"),
          stddev_pop(col(c).cast("double")).as(s"sd_$c"))): _*).head()
    val mu = Array.tabulate(d)(j => statsRow.getDouble(2 * j))
    val sd = Array.tabulate(d)(j => statsRow.getDouble(2 * j + 1))

    // Cached standardized projection — read `iterations` times; at scale
    // this narrow all-double table is the thing you persist (or
    // checkpoint), not the source corpus.
    val std = CacheScope.track(df.select(
      (col(labelCol).cast("double").as("__y")) +:
        featureCols.zipWithIndex.map { case (c, j) =>
          val f = col(c).cast("double")
          (if (sd(j) == 0.0) lit(0.0) else (f - mu(j)) / sd(j)).as(s"__f$j")
        }: _*))

    var w = Array.fill(d)(0.0)
    var b = 0.0
    for (_ <- 0 until iterations) {
      // z with current weights as plan literals (same shape as ADC's
      // literal distance tables: model state rides in the plan, small
      // by construction).
      val z = (0 until d).foldLeft(lit(0.0): Column) {
        case (acc, j) => acc + col(s"__f$j") * lit(w(j))
      } + lit(b)
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val g = std.select(
        ((0 until d).map(j => sum((p - col("__y")) * col(s"__f$j")).as(s"g$j")) :+
          sum(p - col("__y")).as("gb") :+
          count(lit(1)).as("n")): _*).head()
      val n = g.getLong(d + 1).toDouble
      w = Array.tabulate(d)(j =>
        w(j) - learningRate * (g.getDouble(j) / n + l2 * w(j)))
      b = b - learningRate * (g.getDouble(d) / n)
    }
    std.unpersist()

    // Fold standardization into raw space (constant features → weight 0).
    val rawW = Array.tabulate(d)(j => if (sd(j) == 0.0) 0.0 else w(j) / sd(j))
    val rawB = b - (0 until d).map(j =>
      if (sd(j) == 0.0) 0.0 else w(j) * mu(j) / sd(j)).sum
    Model(rawW, rawB)
  }

  /** Mean log-loss of a model on labeled data (training diagnostic;
    * uses log/exp so it is unit-tested, never oracle-gated). Clamped
    * away from 0/1 so separable data doesn't produce -Inf.
    */
  def logLoss(df: DataFrame, featureCols: Seq[String], labelCol: String,
              model: Model): Double = {
    val z = score(featureCols.map(col), model.weights.toSeq, model.bias)
    val p0 = lit(1.0) / (lit(1.0) + exp(-z))
    val p = least(greatest(p0, lit(1e-12)), lit(1.0 - 1e-12))
    val y = col(labelCol).cast("double")
    df.select(avg(-(y * log(p) + (lit(1.0) - y) * log(lit(1.0) - p))))
      .head().getDouble(0)
  }
}
