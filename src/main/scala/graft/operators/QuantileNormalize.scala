package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-source quantile normalization — map every source's score
  * distribution onto a REFERENCE source's, so thresholds mean the same
  * thing corpus-wide. The batch-effect corrector for heterogeneous
  * quality scores: a "0.8 from src3" and a "0.8 from src9" rarely denote
  * the same quality; after normalization a score's meaning is its
  * reference-distribution quantile value.
  *
  * Rule (integer-exact, interpolation-free): a value v in source s with
  * doubled mid-rank r₂(v) = 2·cum(v) − cnt(v) + 1 over Nₛ rows maps to
  * the SMALLEST reference value whose cumulative count reaches the same
  * share:  min { w : 2·cumᵣ(w)·Nₛ ≥ r₂(v)·Nᵣ } — the comparison is
  * cross-multiplied BIGINTs, so no division, no float, hash-exact in any
  * engine. The reference source maps to itself (cumᵣ(v) ≥ cum(v) −
  * (cnt−1)/2 always picks v), a property the spec locks.
  *
  * Scale shape: histograms are one hash aggregate per side, bounded by
  * distinct (source, value) pairs; their rank windows run over HISTOGRAM
  * rows partitioned by source (never corpus rows — the
  * [[ExactQuantiles]] discipline). The mapping is a non-equi join of the
  * per-source histogram against the REFERENCE histogram only — the
  * reference side is bounded by its distinct values and broadcasts; a
  * min-aggregate keeps the smallest qualifying reference value. Output
  * is the MAPPING TABLE (distinct (source, value) rows), which joins
  * back to raw rows as a cheap equi-join when row-level scores are
  * needed — returning the mapping keeps this operator's output bounded
  * by vocabulary, not corpus.
  *
  * Overflow: 2·cumᵣ·Nₛ ≤ 2·Nᵣ·Nₛ must stay below 2⁶³ — i.e.
  * Nᵣ·Nₛ ≤ 4.6·10¹⁸, comfortably beyond any per-source row count that
  * would feed an exact histogram.
  *
  * @return one row per distinct (source, value): (source, v, n_rows,
  *         rank2, mapped) — `mapped` NULL only if the reference is empty
  */
object QuantileNormalize {

  def toReference(df: DataFrame, sourceCol: String, value: Column,
                  refSource: String): DataFrame = {
    val base = df.select(col(sourceCol).as("source"), value.as("v"))
      .filter(col("v").isNotNull)
    val hist = base.groupBy("source", "v").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("source").orderBy("v")
    val ranked = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("rank2", lit(2L) * col("cum") - col("cnt") + 1L)
    val totals = ranked.groupBy("source").agg(max(col("cum")).as("n_src"))
    val refHist = ranked.filter(col("source") === refSource)
      .select(col("v").as("__rv"), (lit(2L) * col("cum")).as("__rcum2"))
    // one-row aggregate (not a filtered row): stays a single row even
    // when the reference source is absent, so the crossJoin never
    // empties the output — absent reference yields NULL mapped instead.
    val refTotal = base.filter(col("source") === refSource)
      .agg(count(lit(1)).as("__n_ref"))
    ranked.join(totals, "source")
      .crossJoin(broadcast(refTotal))
      .join(broadcast(refHist),
        col("__rcum2") * col("n_src") >= col("rank2") * col("__n_ref"),
        "left")
      .groupBy(col("source"), col("v"), col("cnt").as("n_rows"),
        col("rank2"))
      .agg(min(col("__rv")).as("mapped"))
      .select(col("source"), col("v"), col("n_rows"), col("rank2"),
        col("mapped"))
  }
}
