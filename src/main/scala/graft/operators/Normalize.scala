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
