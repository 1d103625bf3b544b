package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
}
