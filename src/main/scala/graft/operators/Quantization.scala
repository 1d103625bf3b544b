package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Symmetric int8 quantization for embedding columns — the standard
  * 4× storage/bandwidth reduction before shipping vectors to an ANN
  * index or training shards.
  *
  * Per-vector scheme: scale = 127 / max|x|; q_i = clamp(round(x_i·scale)).
  * Everything is rational arithmetic over exact inputs (floats widened to
  * double), expressed with explicit floor(x+0.5) rounding so any SQL
  * engine reproduces the integers bit-for-bit — which keeps quantization
  * oracle-checkable like every other operator here. All narrow per-row
  * projections: no shuffle, scales like a scan.
  */
object Quantization {

  /** max |x_i| of a float-array column, as double (sequential fold). */
  def maxAbs(v: Column): Column =
    aggregate(v, lit(0.0),
      (acc, x) => greatest(acc, abs(x.cast(DoubleType))))

  /** round-half-up via floor(x+0.5): identical in any engine (Spark's
    * round() uses BigDecimal HALF_UP which can disagree with C-family
    * rounding in representation corner cases; floor is floor everywhere).
    */
  private def rhu(x: Column): Column = floor(x + 0.5).cast(LongType)

  /** int8 codes (as long array for portability) for one vector, given a
    * PRECOMPUTED maxAbs column — pass `maxAbs(v)` materialized once (e.g.
    * via `withColumn`) so the per-row array fold runs once, not once per
    * consumer; [[quantize]] is the self-contained convenience.
    *
    * Zero-max guard: an all-zero vector (padding rows are routine
    * production input) has maxAbs=0 → scale=Inf → 0·Inf=NaN, and
    * floor(NaN) THROWS under Spark 4's default ANSI cast. Such a vector
    * quantizes to all-zero codes by definition, so that case is made
    * explicit (and mirrored in the q34 oracle).
    */
  def quantizeScaled(v: Column, mx: Column): Column = {
    val scale = lit(127.0) / mx
    when(mx === 0.0, transform(v, _ => lit(0L)))
      .otherwise(transform(v, x =>
        greatest(lit(-127L), least(lit(127L), rhu(x.cast(DoubleType) * scale)))))
  }

  def quantize(v: Column): Column = quantizeScaled(v, maxAbs(v))

  /** Reconstruction error: mean squared difference between original and
    * dequantized values (sequential fold, deterministic), given a
    * precomputed maxAbs and the quantized codes (share the materialized
    * codes column with other consumers — don't re-quantize per metric).
    * NULL for a zero-max vector — reconstruction error is undefined when
    * no scale exists (and 0/0 would be engine-dependent NaN handling).
    */
  def quantizationMseScaled(v: Column, mx: Column, codes: Column): Column = {
    val scale = lit(127.0) / mx
    val sq = zip_with(v, codes,
      (x, q) => {
        val diff = x.cast(DoubleType) - q.cast(DoubleType) / scale
        diff * diff
      })
    when(mx =!= 0.0,
      aggregate(sq, lit(0.0), (acc, e) => acc + e) / size(sq))
  }

  def quantizationMse(v: Column): Column = {
    val mx = maxAbs(v)
    quantizationMseScaled(v, mx, quantizeScaled(v, mx))
  }
}
