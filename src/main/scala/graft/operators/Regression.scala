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
}
