package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group feature normalization — z-scoring a metric within its group
  * (per-language quality scores, per-source lengths) so thresholds mean
  * the same thing across heterogeneous slices of a corpus.
  *
  * Scale shape: TWO-PASS aggregate-then-join, not a window. A window
  * over (group) must shuffle AND sort every row of the group into one
  * task — a 5-language 100 TB corpus would sort ~20 TB per task. The
  * aggregate pass reduces each group to three numbers (sum, sum of
  * squares, count) via map-side combine; the join back is a per-row
  * lookup that AQE turns into a broadcast whenever the group count is
  * small (the common case).
  *
  * Moments are computed as exact sums and composed per-row with the same
  * expression shape a SQL engine would use, so for integer-valued inputs
  * (counts, quantities) the z-scores are bit-reproducible across engines.
  */
object Normalize {

  /** `df` plus columns (median, mad, `out`) where `out` =
    * (value − groupMedian) / groupMAD — the ROBUST z-score: mean/stddev
    * normalization ([[zscoreByGroup]]) is itself dragged by the outliers
    * a quality pipeline is trying to flag (one 10 MB boilerplate doc
    * shifts its language's mean AND inflates the stddev that was
    * supposed to expose it), while median and median-absolute-deviation
    * have a 50% breakdown point. NULL when the group's MAD is 0 (more
    * than half the group shares one value — no spread to normalize by).
    * Rows with a NULL group key are DROPPED by the equi-joins back —
    * matching the ANSI-equality join a SQL consumer (and the q96
    * oracle) writes; filter or impute first if they must survive
    * (valueNtile's convention).
    *
    * Plan: [[ExactQuantiles.medianByGroup]] twice — once over values,
    * once over |value − median| after a group-bounded broadcast join —
    * then one join back. Both medians are the exact histogram-cumulate
    * shape (state bounded by distinct values, no per-group row sort);
    * for integer inputs median and MAD are exact LONGs and the z is one
    * rational division — cross-engine bit-exact (q96).
    */
  def robustZscoreByGroup(df: DataFrame, groupCol: String, valueCol: String,
                          out: String = "rz"): DataFrame = {
    val med = ExactQuantiles.medianByGroup(df, groupCol, valueCol)
      .select(col(groupCol), col("median"))
    val dev = df.join(med, Seq(groupCol))
      .select(col(groupCol), abs(col(valueCol) - col("median")).as("__dev"))
    val mad = ExactQuantiles.medianByGroup(dev, groupCol, "__dev")
      .select(col(groupCol), col("median").as("mad"))
    df.join(med, Seq(groupCol))
      .join(mad, Seq(groupCol))
      .withColumn(out,
        when(col("mad") > 0,
          (col(valueCol) - col("median")).cast("double") / col("mad")))
  }

  /** `df` plus column `out` = (value − groupMean) / groupSampleStddev,
    * NULL when the group has fewer than two rows (stddev undefined).
    */
  def zscoreByGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
                    out: String = "z"): DataFrame = {
    val v = col(valueCol)
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(sum(v).as("__s"), sum(v * v).as("__ss"), count(v).as("__n"))
    df.join(stats, groupCols)
      .withColumn(out,
        when(col("__n") > 1,
          (v - col("__s") / col("__n")) /
            sqrt((col("__ss") - col("__s") * col("__s") / col("__n")) /
              (col("__n") - 1))))
      .drop("__s", "__ss", "__n")
  }
}
