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
}
