package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data-profiling aggregates over full tables — the fixed-width histogram
  * a pipeline runs to understand a column's distribution (document
  * lengths, token counts, scores) before choosing filter thresholds.
  *
  * Scale shape: bucket assignment is a per-row projection (codegen'd
  * arithmetic, no lookup table), and the histogram is one hash aggregate
  * on the bucket id — map-side combine reduces every partition to at most
  * `maxBucket + 1` rows before the (tiny) shuffle.
  */
object Profiling {

  /** Fixed-width histogram of a non-negative numeric column: bucket
    * `floor(value / width)` clamped to `maxBucket` (the overflow bucket),
    * with per-bucket count and observed min/max. Empty buckets are
    * absent, matching a plain GROUP BY.
    */
  def histogram(df: DataFrame, value: Column, width: Long,
                maxBucket: Int): DataFrame = {
    require(width > 0, "width must be positive")
    require(maxBucket >= 0, "maxBucket must be non-negative")
    val bucket = least(lit(maxBucket.toLong), floor(value / width).cast(LongType))
    df.select(bucket.as("bucket"), value.as("__v"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min(col("__v")).as("min_v"),
        max(col("__v")).as("max_v"))
      .select(col("bucket"), (col("bucket") * width).as("lo"),
        col("n"), col("min_v"), col("max_v"))
  }
}
