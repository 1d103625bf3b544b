package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data-layout clustering — the write-time operator that decides how much
  * the READ side gets to prune at 100 TB.
  *
  * Sorting a table by one column gives parquet min/max pruning on that
  * column only; multi-dimensional workloads (filter by user AND time, by
  * part AND supplier) need a space-filling curve: interleave the bits of
  * the k filter columns into one Z-value, then range-partition + sort by
  * it. Rows close in Z are close in EVERY interleaved dimension, so each
  * output file holds a tight k-dimensional bounding box and a selective
  * filter on ANY of the dimensions skips most files. This is the same
  * technique lakehouse table formats expose as `OPTIMIZE ZORDER BY`.
  *
  * The Z-value is pure bit arithmetic (shifts/masks, whole-stage codegen,
  * portable to any engine), and clustering is one range repartition — the
  * same shuffle a plain global sort would pay.
  */
object Layout {

  /** Bit-interleaved Z-value of k non-negative integer columns: bit `b` of
    * column `i` lands at output bit `b*k + i`. Uses the low `bits` bits of
    * each column; `bits * k` must stay in a signed long. Negative inputs
    * are rejected (NULL via the mask would silently scramble the curve) —
    * callers shift/clamp first.
    */
  def zValue(bits: Int, cols: Column*): Column = {
    val k = cols.size
    require(k >= 2, "interleaving needs at least 2 columns")
    require(bits >= 1 && bits * k <= 63, s"bits*k must be in [$k, 63]")
    val parts = for {
      (c, i) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast(LongType), b).bitwiseAND(lit(1L)), b * k + i)
    parts.reduce((a, b) => a.bitwiseOR(b))
  }

  /** `df` clustered for multi-dimensional pruning: range-partitioned and
    * sorted by the Z-value of `cols` into `numPartitions` output slices
    * (one file each when written). The helper column never leaves.
    */
  def clusterByZ(df: DataFrame, numPartitions: Int, bits: Int,
                 cols: Column*): DataFrame =
    df.withColumn("__z", zValue(bits, cols: _*))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
}
