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
}
