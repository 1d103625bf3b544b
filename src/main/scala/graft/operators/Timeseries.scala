package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Irregular-series regularization: per-key calendar densification plus
  * last-observation-carried-forward fill — the gap-fill step every
  * daily-metrics consumer (charting, drift monitors, per-user feature
  * snapshots) runs before joining series on the date axis. The reference's
  * climate domain is the canonical customer: station series with missing
  * days become contiguous daily rows with the last reading carried and a
  * staleness age alongside.
  *
  * Scale shape: the calendar explode emits span-length rows per key
  * (bounded by days, not observations), the observation join is a per-key
  * equi-join, and the fill is ONE window pass per key ordered by day —
  * `last(ignoreNulls)` over UNBOUNDED PRECEDING is running state of one
  * value, no per-row rescan. Everything shuffles once on the key; a key's
  * cost is its day span, so skew equals span skew (years, not rows) and
  * stays thousands of rows per key even for decade-long series.
  *
  * Determinism: carried values are copied, never recomputed — no float
  * arithmetic — so output bits equal input bits and the operator is
  * hash-checkable against a `generate_series` + `last_value IGNORE NULLS`
  * SQL oracle.
  */
object Timeseries {

  /** Densify each key's [min(day), max(day)] span to one row per day and
    * LOCF-fill `valueCol`.
    *
    * @param obs      observations: one row per (key, day) — pre-aggregate
    *                 duplicates upstream (enforced semantics: the join
    *                 would duplicate calendar rows otherwise)
    * @param keyCol   series key column name
    * @param dayCol   DateType day column name
    * @param valueCol metric column name (any type; copied, not computed)
    * @return (key, day, <value>, <value>_filled, days_since_obs) — rows
    *         before a key's first observation of the metric have NULL
    *         fill and NULL age; observed rows have age 0
    */
  def densifyLocf(obs: DataFrame, keyCol: String, dayCol: String,
                  valueCol: String): DataFrame = {
    val spans = obs.groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("__lo"), max(col(dayCol)).as("__hi"))
    val calendar = spans.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"))).as(dayCol))
    val joined = calendar.join(
      obs.select(col(keyCol), col(dayCol), col(valueCol)),
      Seq(keyCol, dayCol), "left")
    val w = Window.partitionBy(keyCol).orderBy(dayCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn(s"${valueCol}_filled",
        last(col(valueCol), ignoreNulls = true).over(w))
      .withColumn("days_since_obs",
        datediff(col(dayCol),
          last(when(col(valueCol).isNotNull, col(dayCol)), ignoreNulls = true)
            .over(w)).cast("long"))
  }

  /** SAX MOTIF mining over an event-count series: symbolize the series
    * (PAA window sums → exact value-quartile symbols) and count repeated
    * length-`wordLen` symbol words — the classic Symbolic Aggregate
    * approXimation pipeline (Lin et al. 2003) re-expressed exactly: a
    * recurring word is a recurring shape ("ramp-up-then-spike happens
    * every Monday") that a threshold monitor like CUSUM (q201) can't
    * name.
    *
    * Exactness substitutions vs the float original, so the result
    * hash-gates: PAA keeps window SUMS (same ordering as means for equal
    * windows — no division), and breakpoints are exact value-ntile
    * quartiles of the PAA distribution ([[ExactQuantiles.valueNtile]])
    * instead of Gaussian breakpoints over a z-normalized series (no
    * mean/σ floats). Missing buckets are absent, not zero — densify
    * upstream (e.g. [[densifyLocf]]) if silence should count.
    *
    * Scale shape: the corpus collapses to the per-bucket histogram in one
    * combinable pass; everything after (PAA, ntile, word windows) runs on
    * series rows — bounded by time span / `paaW`, not events. The
    * un-partitioned word window is the series itself (the q201/q208
    * monitor discipline: bounded by design, documented here).
    *
    * @param bucket  integral time-bucket expression (e.g. day index)
    * @param paaW    PAA window: consecutive buckets summed per frame
    * @param k       alphabet size (symbols 1..k by value quartile)
    * @param wordLen symbols per word (consecutive frames)
    * @return one row per distinct word: (word, n_frames, first_frame,
    *         support) — support = n_frames/total windows; words shorter
    *         than `wordLen` (series tail) are excluded
    */
  def saxMotifs(df: DataFrame, bucket: Column, paaW: Int = 2, k: Int = 4,
                wordLen: Int = 3): DataFrame = {
    require(paaW >= 1 && k >= 2 && wordLen >= 1, "degenerate SAX config")
    val counts = df.select(bucket.cast("long").as("__b"))
      .filter(col("__b").isNotNull)
      .groupBy("__b").agg(count(lit(1)).as("__x"))
    val paa = counts
      // FLOOR division, not bare DIV: DIV truncates toward zero, which
      // would merge buckets -1 and +1 into frame 0 on pre-epoch
      // (negative) buckets and break contiguous-frame word semantics.
      // pmod-adjusting first makes the dividend exactly divisible, so
      // DIV equals the true floor for the whole long range (no float
      // round-trip).
      .withColumn("__f", expr(s"(__b - pmod(__b, $paaW)) DIV $paaW"))
      .groupBy("__f").agg(sum(col("__x")).as("__s"))
      .withColumn("__g", lit(1))
    val sym = ExactQuantiles.valueNtile(paa, "__g", "__s", k)
      .select(col("__f"), col("__s_bucket").as("__sym"))
    val wSeq = Window.orderBy("__f") // series rows only — bounded
    val word = concat_ws("", (0 until wordLen).map(i =>
      lead(col("__sym"), i).over(wSeq).cast("string")): _*)
    val lastF = lead(col("__f"), wordLen - 1).over(wSeq)
    val words = sym
      .withColumn("word", word)
      .withColumn("__lf", lastF)
      // a word is valid only over CONTIGUOUS frames that all exist
      .filter(col("__lf") === col("__f") + (wordLen - 1))
    val wAll = Window.partitionBy() // distinct-word rows only
    words.groupBy("word")
      .agg(count(lit(1)).as("n_frames"), min(col("__f")).as("first_frame"))
      .withColumn("support",
        col("n_frames").cast("double") /
          sum(col("n_frames")).over(wAll).cast("double"))
  }
}
