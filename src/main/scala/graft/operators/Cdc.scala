package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff (change-data-capture shape): classify every key of two
  * table versions as added / removed / changed, dropping the unchanged
  * majority — the primitive behind incremental corpus refreshes
  * ("what did the latest crawl actually change?") and dataset-version
  * audits.
  *
  * Scale shape: one full-outer shuffle join on the key columns — both
  * snapshots partition by key and compare locally; nothing is collected
  * and no side is assumed small. The unchanged rows (typically almost
  * everything) are filtered BEFORE the result leaves the join stage, so
  * downstream consumers see only the delta.
  */
object Cdc {

  /** Keys in `oldSnap` / `newSnap` classified by `valueCols` equality.
    * Output: key columns, `change` ∈ ('added', 'removed', 'changed'),
    * and `old_<c>` / `new_<c>` for each compare column (NULL on the
    * absent side). Unchanged keys are omitted. Comparison is null-safe
    * (NULL vs NULL = unchanged; NULL vs value = changed).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
                   valueCols: Seq[String]): DataFrame = {
    val o = oldSnap.select(
      keys.map(col) ++ valueCols.map(c => col(c).as(s"old_$c")) :+
        lit(1).as("__in_old"): _*)
    val n = newSnap.select(
      keys.map(col) ++ valueCols.map(c => col(c).as(s"new_$c")) :+
        lit(1).as("__in_new"): _*)
    val changed = valueCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    o.join(n, keys, "full_outer")
      .withColumn("change",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(changed, "changed")
          .otherwise("unchanged"))
      .filter(col("change") =!= "unchanged")
      .select(keys.map(col) ++ (col("change") +:
        valueCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c")))): _*)
  }

  /** SCD type-2 dimension builder: collapse a change-event history into
    * versioned validity intervals — one row per (key, consecutive run of
    * an attribute value) with [valid_from, valid_to) bounds, version
    * numbers, and a current flag. The standard warehouse shape for
    * "what was this entity's attribute AT time t" joins (pair it with
    * [[AsofJoin]] on the serving side).
    *
    * Consecutive duplicates are dropped FIRST (an event restating the
    * current value opens no new version), then valid_to = next change's
    * timestamp, NULL on the open (current) version.
    *
    * Scale shape: two per-KEY windows (lag to find change points, lead
    * over the surviving change points for interval ends) — state bounded
    * by one entity's history, partition-parallel across keys; no global
    * window anywhere. Deterministic: ordering is (ts, ord) with `ordCol`
    * a unique tiebreaker, so same-timestamp events have one defined
    * order in any engine.
    *
    * @param tsCol  integer timestamp column (e.g. epoch nanos)
    * @param ordCol unique per-row tiebreaker (e.g. event id)
    * @return (keyCol, version, attrCol, valid_from, valid_to, is_current)
    */
  def scd2(changes: DataFrame, keyCol: String, attrCol: String,
           tsCol: String, ordCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(ordCol))
    val changePoints = changes
      .select(col(keyCol), col(attrCol), col(tsCol), col(ordCol))
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
    changePoints
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col("version"), col(attrCol),
        col("valid_from"), col("valid_to"),
        col("valid_to").isNull.cast("long").as("is_current"))
  }
}
