package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Per-group ordinary-least-squares trend lines (slope, intercept, R²)
  * from EXACT integer sufficient statistics.
  *
  * Why not `regr_slope`/`corr`: those accumulate FLOATING-POINT moments,
  * whose value depends on partition count and merge order — fine for
  * analytics, fatal for a cross-engine, hash-compared contract. Here the
  * one aggregate pass computes the six sufficient statistics
  * (n, Σx, Σy, Σxy, Σx², Σy²) as BIGINTs — map-side combinable, exact,
  * order-independent — and the doubles appear only in a fixed, mirrored
  * tail of arithmetic:
  *
  *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²m)     (one division)
  *   intercept = (Σy − slope·Σx) / n                (fixed op order)
  *   r2 = num² / (dx·dy)                            (num via double once)
  *
  * so every engine that evaluates the same expression tree gets the same
  * bits. Degenerate groups: constant x (dx = 0) yields NULL slope/
  * intercept/r2; constant y (dy = 0) yields slope 0 and NULL r2.
  *
  * Overflow discipline (the caller's contract, documented not hidden):
  * inputs are LONG columns the caller is expected to CENTER — e.g. days
  * since an epoch near the data, quantities, not raw nanos — so that
  * n·Σx² and n·Σy² stay below 2^63 and n·Σxy below 2^53 (the double
  * mantissa, since num crosses into double for r2). With |x|,|y| ≤ 10^4
  * that holds to ~10^11 rows per group.
  */
object Regression {

  /** One-pass per-group OLS of y on x.
    *
    * @param xCol integer-valued LONG column (center it; see object doc)
    * @param yCol integer-valued LONG column
    * @return (groupCols…, n, slope, intercept, r2) — doubles NULL on the
    *         degenerate cases above
    */
  def trendByGroup(df: DataFrame, groupCols: Seq[String],
                   xCol: Column, yCol: Column): DataFrame = {
    val stats = df
      .select(groupCols.map(col) ++ Seq(xCol.as("__x"), yCol.as("__y")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
        sum(col("__x") * col("__y")).as("sxy"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("__y") * col("__y")).as("syy"))
    val num = stats("n") * col("sxy") - col("sx") * col("sy")
    val dx = stats("n") * col("sxx") - col("sx") * col("sx")
    val dy = stats("n") * col("syy") - col("sy") * col("sy")
    val slope = when(dx =!= 0L, num.cast(DoubleType) / dx.cast(DoubleType))
    val intercept = when(dx =!= 0L,
      (col("sy").cast(DoubleType) - slope * col("sx").cast(DoubleType)) /
        stats("n").cast(DoubleType))
    val numD = num.cast(DoubleType)
    val r2 = when(dx =!= 0L && dy =!= 0L,
      numD * numD / (dx.cast(DoubleType) * dy.cast(DoubleType)))
    stats.select(groupCols.map(col) ++ Seq(col("n"),
      slope.as("slope"), intercept.as("intercept"), r2.as("r2")): _*)
  }

  /** Per-group Pearson correlation from the same exact BIGINT sufficient
    * statistics as [[trendByGroup]] (and with its centering/overflow
    * contract):
    *
    *   r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²))
    *
    * — integer numerator and radicand terms, one sqrt (IEEE
    * exactly-rounded, engine-independent), one division. NULL when
    * either variable is constant (zero variance carries no direction).
    * Scale shape: ONE combinable hash aggregate; shuffle = |groups|
    * rows of six longs.
    */
  def corrByGroup(df: DataFrame, groupCols: Seq[String],
                  xCol: Column, yCol: Column): DataFrame = {
    val stats = sufficientStats(df, groupCols, xCol, yCol)
    stats.select(groupCols.map(col) ++ Seq(col("n"),
      corrFromStats(stats).as("corr")): _*)
  }

  /** Per-group Spearman rank correlation — Pearson over AVERAGE ranks,
    * the tie-correct textbook definition — computed without sorting any
    * group's rows: per (group, value) histograms give each distinct
    * value's DOUBLED average rank as an exact BIGINT,
    *
    *   rank2(v) = 2·cum(v) − cnt(v) + 1   (cum = rows ≤ v in the group)
    *
    * (doubling clears the ±0.5 tie fractions; Pearson is scale-
    * invariant, and the oracle mirrors the identical ×2 arithmetic, so
    * nothing floats until the final closed form). Rows join their ranks
    * back by (group, value) — the [[ExactQuantiles]] histogram-offset
    * discipline: the only window runs over histogram rows (bounded by
    * distinct values), never corpus rows, and the join keys are
    * AQE-broadcastable when value cardinality is small.
    *
    * NULL x or y rows are dropped first (a NULL has no rank; both
    * variables must be present for a paired rank). Overflow: rank2 ≤ 2n,
    * so n·Σ(rank2²) ≤ 8n⁴ — exact to ~10⁴ rows per group beyond 2⁶³…
    * more precisely n ≤ ~3·10⁴ per group for full BIGINT exactness;
    * sample larger groups (rank correlation stabilizes fast).
    *
    * @return (groupCols…, n, spearman)
    */
  def spearmanByGroup(df: DataFrame, groupCols: Seq[String],
                      xCol: Column, yCol: Column): DataFrame = {
    val base = df
      .select(groupCols.map(col) ++ Seq(xCol.as("__x"), yCol.as("__y")): _*)
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    def rank2(valueCol: String, as: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(groupCols.map(col): _*).orderBy(col(valueCol))
      base.groupBy(groupCols.map(col) :+ col(valueCol): _*)
        .agg(count(lit(1)).as("__c"))
        .withColumn("__cum", sum(col("__c")).over(w))
        .select(groupCols.map(col) ++ Seq(col(valueCol),
          (lit(2L) * col("__cum") - col("__c") + 1L).as(as)): _*)
    }
    val withRanks = base
      .join(rank2("__x", "__rx"), groupCols :+ "__x")
      .join(rank2("__y", "__ry"), groupCols :+ "__y")
    val stats = sufficientStats(withRanks, groupCols, col("__rx"), col("__ry"))
    stats.select(groupCols.map(col) ++ Seq(col("n"),
      corrFromStats(stats).as("spearman")): _*)
  }

  private def sufficientStats(df: DataFrame, groupCols: Seq[String],
                              xCol: Column, yCol: Column): DataFrame =
    df.select(groupCols.map(col) ++ Seq(xCol.as("__sx"), yCol.as("__sy")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__sx")).as("sx"), sum(col("__sy")).as("sy"),
        sum(col("__sx") * col("__sy")).as("sxy"),
        sum(col("__sx") * col("__sx")).as("sxx"),
        sum(col("__sy") * col("__sy")).as("syy"))

  private def corrFromStats(stats: DataFrame): Column = {
    val num = stats("n") * col("sxy") - col("sx") * col("sy")
    val dx = stats("n") * col("sxx") - col("sx") * col("sx")
    val dy = stats("n") * col("syy") - col("sy") * col("sy")
    when(dx =!= 0L && dy =!= 0L,
      num.cast(DoubleType) /
        sqrt(dx.cast(DoubleType) * dy.cast(DoubleType)))
  }

  /** KENDALL's τ-b — the third rank-association measure next to
    * [[corrByGroup]] (linear) and [[spearmanByGroup]] (monotone-by-rank):
    * the probability a random pair is concordant minus discordant,
    * tie-corrected. More robust to outlier ranks than Spearman and the
    * statistic behind many agreement tests.
    *
    * Exact, sort-free, and pair-explicit WITHOUT touching row pairs: the
    * (x, y) histogram collapses the corpus to V distinct cells, and
    * concordant/discordant mass comes from the cell×cell self-join
    * (each unordered cell pair once, via lexicographic (x, y) order) —
    * C = Σ c_a·c_b over pairs with (x_a−x_b)(y_a−y_b) > 0, D likewise
    * < 0. Tie terms need only the marginals: n1 = Σ_x t_x(t_x−1)/2,
    * n2 = Σ_y t_y(t_y−1)/2, n0 = n(n−1)/2; then
    *
    *   τ_b = (C − D) / sqrt((n0 − n1)·(n0 − n2))
    *
    * — BIGINTs, one sqrt, one division. CONTRACT: the cell join is
    * O(V²), so bin continuous inputs first (pass `x DIV w` exprs) to
    * keep V in the thousands — binning coarsens, it does not bias the
    * tie correction (binned τ is the estimand then). n(n−1) needs
    * n < ~3·10⁹ for BIGINT exactness. NULL x or y rows drop.
    *
    * @return one row: (n, n0, n1, n2, concordant, discordant, tau_b)
    */
  def kendallTau(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val base = df.select(xCol.cast("long").as("__x"), yCol.cast("long").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val cells = base.groupBy("__x", "__y").agg(count(lit(1)).as("__c"))
    val a = cells.select(col("__x").as("ax"), col("__y").as("ay"),
      col("__c").as("ac"))
    val b = cells.select(col("__x").as("bx"), col("__y").as("by"),
      col("__c").as("bc"))
    val pairs = a.crossJoin(b)
      .filter(col("ax") < col("bx") ||
        (col("ax") === col("bx") && col("ay") < col("by")))
      .agg(
        coalesce(sum(when((col("ax") - col("bx")) * (col("ay") - col("by")) > 0L,
          col("ac") * col("bc"))), lit(0L)).as("concordant"),
        coalesce(sum(when((col("ax") - col("bx")) * (col("ay") - col("by")) < 0L,
          col("ac") * col("bc"))), lit(0L)).as("discordant"))
    // integer DIV, not Column./ (double division) — t(t−1) is even
    def tiePairs(key: String, as: String) = cells.groupBy(col(key))
      .agg(sum(col("__c")).as("__t"))
      .agg(coalesce(sum(expr("__t * (__t - 1) DIV 2")), lit(0L)).as(as))
    val tots = base.agg(count(lit(1)).as("n"))
      .withColumn("n0", expr("n * (n - 1) DIV 2"))
    tots.crossJoin(tiePairs("__x", "n1")).crossJoin(tiePairs("__y", "n2"))
      .crossJoin(pairs)
      .withColumn("tau_b",
        when(col("n0") > col("n1") && col("n0") > col("n2"),
          (col("concordant") - col("discordant")).cast(DoubleType) /
            sqrt((col("n0") - col("n1")).cast(DoubleType) *
              (col("n0") - col("n2")).cast(DoubleType))))
      .select("n", "n0", "n1", "n2", "concordant", "discordant", "tau_b")
  }

  /** SIMPSON's-paradox audit: does the x–y association within each
    * stratum point the same way as the POOLED association? A pooled
    * trend that reverses inside every stratum is a confounded read — the
    * aggregation-bias trap every per-corpus metric rollup (quality vs
    * length, dup-rate vs source) can fall into; this flags it per group
    * instead of leaving it to a human eyeballing two charts.
    *
    * Association direction = the SIGN of the covariance numerator
    * n·Σxy − Σx·Σy — exact BIGINT, no variance normalization needed for
    * a sign, so the verdict is integer-deterministic (the [[corrByGroup]]
    * sufficient-statistic discipline and its overflow contract). One
    * combinable aggregate per grouping; the pooled row broadcasts back.
    *
    * @return one row per group: (group, n, cov_num, group_sign,
    *         pooled_num, pooled_sign, reversed) — signs in {-1, 0, 1};
    *         `reversed` = the group's direction strictly opposes the
    *         pooled one
    */
  def simpsonAudit(df: DataFrame, groupCol: String,
                   xCol: Column, yCol: Column): DataFrame = {
    val base = df.select(col(groupCol).as("__g"),
      xCol.cast("long").as("__x"), yCol.cast("long").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    def covNum(d: DataFrame, gcols: Seq[Column]): DataFrame = d
      .groupBy(gcols: _*)
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"), sum(col("__x") * col("__y")).as("__sxy"))
      .withColumn("cov_num",
        col("n") * col("__sxy") - col("__sx") * col("__sy"))
    def sign(c: Column): Column =
      when(c > 0L, 1L).when(c < 0L, -1L).otherwise(0L)
    val grouped = covNum(base, Seq(col("__g")))
      .select(col("__g").as(groupCol), col("n"), col("cov_num"),
        sign(col("cov_num")).as("group_sign"))
    val pooled = covNum(base, Seq.empty)
      .select(col("cov_num").as("pooled_num"),
        sign(col("cov_num")).as("pooled_sign"))
    grouped.crossJoin(broadcast(pooled))
      .withColumn("reversed",
        col("group_sign") * col("pooled_sign") === -1L)
  }
}
