package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * rand()-based sampling is non-reproducible across retries/re-runs (task
  * retry re-rolls the dice) — a real hazard when a 100 TB sample feeds a
  * training run that must be auditable. These operators derive the
  * "randomness" from the data itself via a portable integer mixer, so the
  * same input always yields the same sample, on any engine.
  */
object Sampling {

  /** Portable pseudo-random mixer of an integer key: Knuth multiplicative
    * hashing in 32-bit space — (key mod 2^31)·2654435761 mod 2^32, then
    * mod the bucket count. The key is reduced to 31 bits BEFORE the
    * multiply: ids beyond 2^31 are routine at 100 TB scale, and an
    * unreduced key ≥ ~3.5e9 overflows signed 64-bit — an ANSI runtime
    * error (or, ANSI off, a silent wrap diverging from the documented
    * scheme). After reduction the product is < 2^31·2^32 < 2^63, so the
    * arithmetic is exact plain-long everywhere — reproducible in any SQL
    * engine (`((key % 2147483648) * 2654435761) % 4294967296`).
    */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(pmod(pmod(key.cast("long"), lit(2147483648L)) * 2654435761L,
      lit(4294967296L)), lit(buckets.toLong))

  /** Deterministic p% sample: keep rows whose hash bucket < pct. */
  def deterministicSample(df: DataFrame, keyCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100)
    df.filter(hashBucket(col(keyCol), 100) < pct)
  }

  /** Deterministic stratified sample: exactly ceil(fraction·|stratum|)
    * rows per stratum, chosen by the hash order (hash asc, key asc) — a
    * total order, so the selection is unique and reproducible. One
    * shuffle by stratum (the rank window).
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1)
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashBucket(col(keyCol), 1000000), col(keyCol))
    val cw = Window.partitionBy(col(stratumCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
      .filter(col("__rn") <= ceil(col("__n") * fraction))
      .drop("__rn", "__n")
  }
}
