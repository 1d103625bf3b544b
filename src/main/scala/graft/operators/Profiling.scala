package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

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

  /** Order-insensitive table fingerprint: `(n_rows, checksum)` where
    * checksum = Σ polyHash(md5(field₁ ␁ field₂ ␁ …)) as an exact
    * Decimal(38,0). Because the row digests are summed (commutative), the
    * checksum is independent of partitioning, task order, and row order —
    * two tables are (whp) equal as multisets iff their checksums match.
    * This is the verification step of every 100 TB migration: recompute on
    * both sides, compare two scalars instead of shipping either table.
    *
    * Map-side combine reduces each partition to one partial sum, so the
    * shuffle is one row per task. Columns are rendered with CAST-to-string
    * semantics; rows differing only in NULL placement of adjacent string
    * fields collide (concat_ws skips NULLs) — pass an explicit sentinel
    * via coalesce where that matters.
    */
  def tableChecksum(df: DataFrame, cols: Column*): DataFrame = {
    val digest = md5(concat_ws("\u0001", cols: _*).cast("binary"))
    df.select(TextAnalysis.polyHash(digest).as("__h"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__h").cast(DecimalType(38, 0))).as("checksum"))
  }
}
