package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** EXACT per-group order statistics without a per-group sort.
  *
  * `approxQuantile` (A12 / q13) answers the sketch case; this operator
  * answers the exact case the scale-safe way: aggregate a (group, value)
  * HISTOGRAM — map-side combinable, output bounded by the value domain,
  * not the row count — then cumulate the histogram per group (a window
  * over histogram rows, thousands at most) and read the value at the
  * target position. The naive `percentile`/sort-per-group funnels each
  * group's every ROW through one task; here no task ever sees more than
  * one group's DISTINCT VALUES. For continuous doubles, bucketize the
  * value first (the histogram bound is the point of the plan).
  */
object ExactQuantiles {

  /** Lower median per group: the smallest value v whose cumulative count
    * reaches half the group (2·cum ≥ n — integer-exact, no division).
    *
    * @return (groupCol, n, median)
    */
  def medianByGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val hist = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col(groupCol))
    hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wTot))
      .filter(col("__cum") * 2 >= col("__n"))
      .groupBy(col(groupCol))
      .agg(min(col("__n")).as("n"), min(col(valueCol)).as("median"))
  }

  /** Exact per-group quantiles at a LIST of rational targets in one pass:
    * the histogram-cumulate plan of [[medianByGroup]], with one
    * conditional-min per requested quantile read off the same cumulated
    * histogram (lower-quantile semantics: smallest v with cum·den ≥
    * n·num — integer-exact, no interpolation, no cross-engine float
    * noise). Adding a quantile adds one aggregate expression, not a pass.
    *
    * @param qs (label, num, den) triples, 0 ≤ num ≤ den; each yields an
    *           output column `label`.
    * @return (groupCol, n, labels…)
    */
  def quantilesByGroup(df: DataFrame, groupCol: String, valueCol: String,
                       qs: Seq[(String, Int, Int)]): DataFrame =
    quantilesCore(
      df.groupBy(col(groupCol), col(valueCol)).agg(count(lit(1)).as("__c")),
      groupCol, valueCol, qs)

  /** [[quantilesByGroup]] with each row counted `weightCol` times — the
    * budget statistic: with weight = token count and value = length,
    * p50 is the length L such that half the group's TOKENS sit in rows
    * with value ≤ L (where the unweighted p50 says half the DOCS do) —
    * what a packing/budget plan actually allocates by. Weights must be
    * non-negative integers so the cumulative arithmetic stays
    * integer-exact like the unweighted operator; NULL-weight rows are
    * excluded (no defined mass), matching the SQL a consumer writes.
    * Same plan, same scale shape: the histogram is one hash aggregate
    * bounded by distinct (group, value), windows run over histogram
    * rows, never data rows.
    *
    * @return (groupCol, n, labels…) — n is the group's total WEIGHT.
    */
  def weightedQuantilesByGroup(df: DataFrame, groupCol: String,
                               valueCol: String, weightCol: String,
                               qs: Seq[(String, Int, Int)]): DataFrame =
    quantilesCore(
      df.filter(col(weightCol).isNotNull)
        .groupBy(col(groupCol), col(valueCol))
        .agg(sum(col(weightCol)).cast(org.apache.spark.sql.types.LongType)
          .as("__c")),
      groupCol, valueCol, qs)

  /** Shared cumulate-and-read tail over a (group, value, __c) histogram. */
  private def quantilesCore(hist: DataFrame, groupCol: String,
                            valueCol: String,
                            qs: Seq[(String, Int, Int)]): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    qs.foreach { case (_, num, den) =>
      require(den > 0 && num >= 0 && num <= den, s"need 0 <= $num <= $den") }
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col(groupCol))
    val reads = qs.map { case (label, num, den) =>
      min(when(col("__cum") * den >= col("__n") * num, col(valueCol))).as(label)
    }
    hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wTot))
      .groupBy(col(groupCol))
      .agg(min(col("__n")).as("n"), reads: _*)
  }

  /** Assign every row its per-group quantile BUCKET in 1..k (the
    * length-decile / curriculum-bucketing primitive) without sorting any
    * group's rows: bucket(v) = ⌈cum(v)·k / n⌉ where cum(v) = rows ≤ v in
    * the group — computed on the histogram and joined back by
    * (group, value). Integer-exact: ⌈a/b⌉ = (a−1) div b + 1 (cum ≥ 1
    * always, and cum·k at 100 TB — 1e12 rows × k≤1000 — stays far below
    * 2^63, with no float rounding anywhere).
    *
    * Unlike `ntile()`, which splits TIES across buckets by nondeterministic
    * row order, equal values here always share a bucket (the highest one
    * their cumulative count reaches) — reproducible across runs, engines,
    * and partitionings, at the cost of unequal bucket sizes under heavy
    * ties. The join back is keyed by (group, value): bounded by distinct
    * values, AQE broadcasts it when small. Rows with a NULL value OR a
    * NULL group key are DROPPED — the equi-join back cannot match either
    * (a NULL value has no defined quantile bucket; a NULL group is
    * likewise excluded, matching the ANSI-equality join a SQL consumer
    * would write) — filter or impute first if they must survive. If NULL
    * groups should bucket among themselves, join null-safely on the group
    * key (`<=>`) — deliberately NOT the default, to keep the operator's
    * semantics aligned with its cross-engine SQL oracle (q75).
    *
    * @return `df` plus `<valueCol>_bucket`
    */
  def valueNtile(df: DataFrame, groupCol: String, valueCol: String, k: Int): DataFrame = {
    require(k > 0, "need k > 0")
    val hist = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col(groupCol))
    val buckets = hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wTot))
      .select(col(groupCol), col(valueCol),
        expr(s"CAST((__cum * $k - 1) DIV __n AS BIGINT) + 1")
          .as(s"${valueCol}_bucket"))
    df.join(buckets, Seq(groupCol, valueCol))
  }

  /** Winsorize (clip) `valueCol` per group at the exact rational
    * [loNum/den, hiNum/den] quantiles — the outlier-capping pass a
    * pipeline runs before scoring, kept integer-exact (lower-quantile
    * semantics: smallest v with cum·den ≥ n·num), so no interpolation and
    * no cross-engine float noise.
    *
    * Same histogram-cumulate plan as [[medianByGroup]] — the window runs
    * over per-group DISTINCT VALUES, never rows — followed by one join
    * back (AQE-broadcast when groups are few) and a per-row clamp.
    *
    * @return `df` plus `<valueCol>_clipped`
    */
  def winsorizeByGroup(df: DataFrame, groupCol: String, valueCol: String,
                       loNum: Int, hiNum: Int, den: Int): DataFrame = {
    require(den > 0 && loNum >= 0 && hiNum <= den && loNum <= hiNum,
      "need 0 <= loNum <= hiNum <= den")
    val hist = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col(groupCol))
    val qs = hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wTot))
      .groupBy(col(groupCol))
      .agg(
        min(when(col("__cum") * den >= col("__n") * loNum, col(valueCol)))
          .as("__qlo"),
        min(when(col("__cum") * den >= col("__n") * hiNum, col(valueCol)))
          .as("__qhi"))
    df.join(qs, groupCol)
      .withColumn(s"${valueCol}_clipped",
        least(greatest(col(valueCol), col("__qlo")), col("__qhi")))
      .drop("__qlo", "__qhi")
  }

  /** Exact per-group TRIMMED mean: drop exactly k = ⌊n·num/den⌋ rows
    * from each tail (rows, not values — a boundary value's count splits
    * exactly) and average the rest. The robust location estimate between
    * the mean (trim 0) and [[medianByGroup]] (trim → 50%), immune to
    * the heavy tails every corpus length/score column has — and unlike
    * winsorize it needs no join back, so it's strictly
    * histogram-bounded.
    *
    * Row-exact trimming from the cumulated histogram: a value bucket
    * with count c and cumulative cum keeps
    * max(0, min(cum, n−k) − max(cum−c, k)) of its rows; the kept-row
    * sum Σ v·kept and count n−2k are exact BIGINTs, the mean one final
    * division. Groups left empty by trimming (n ≤ 2k) report NULL.
    *
    * Overflow: |v|·n per group < 2⁶³ — same contract as every exact
    * moment here.
    *
    * @return (groupCol, n, k_trimmed, trimmed_sum, trimmed_mean)
    */
  def trimmedMeanByGroup(df: DataFrame, groupCol: String, valueCol: String,
                         num: Int, den: Int): DataFrame = {
    require(den > 0 && num >= 0 && num * 2 < den,
      "need 0 <= num/den < 1/2")
    val hist = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col(groupCol))
    hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wTot))
      .withColumn("__k", expr(s"CAST(__n * $num DIV $den AS BIGINT)"))
      .withColumn("__kept",
        greatest(lit(0L),
          least(col("__cum"), col("__n") - col("__k")) -
            greatest(col("__cum") - col("__c"), col("__k"))))
      .groupBy(col(groupCol))
      .agg(min("__n").as("n"), min("__k").as("k_trimmed"),
        sum(col(valueCol).cast(LongType) * col("__kept"))
          .as("trimmed_sum"))
      .withColumn("trimmed_mean",
        when(col("n") - lit(2L) * col("k_trimmed") > 0,
          col("trimmed_sum").cast("double") /
            (col("n") - lit(2L) * col("k_trimmed")).cast("double")))
  }
}
