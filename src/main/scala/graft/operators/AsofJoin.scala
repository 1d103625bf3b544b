package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the value columns of
  * the LATEST right row with `right.time <= left.time` in the same key
  * group — the canonical "state at event time" lookup (dimension
  * snapshots, last-heartbeat, config-at-timestamp) that plain equi-joins
  * cannot express.
  *
  * Spark-first shape: tag the two sides, union them, and carry the right
  * side's values forward with one `last(..., ignoreNulls)` running window
  * per key — ONE shuffle by key, no join operator at all. The naive
  * formulation (`l JOIN r ON l.k = r.k AND r.t <= l.t` + max-per-row) is
  * an inequality join: Spark plans it as a broadcast-nested-loop and the
  * per-key work goes quadratic; the union+window is linear in
  * rows-per-key after one sort.
  *
  * Scale note: the window partitions by the join key, so per-task state
  * is bounded by rows per key (like every per-entity window here). For a
  * key whose history exceeds a task, pre-bucket the time axis and as-of
  * join bucket-by-bucket carrying boundary state.
  */
object AsofJoin {

  /** @param left      probe side; ALL its columns are preserved
    * @param right     build side; must be UNIQUE per (keyCols, timeCol) —
    *                  pre-aggregate upstream, otherwise "the" as-of match
    *                  is ambiguous (an ambiguity any engine must resolve
    *                  arbitrarily)
    * @param keyCols   equi-join keys
    * @param timeCol   ordering column (any orderable type), same name on
    *                  both sides; matches use right.time <= left.time
    * @param valueCols right columns carried onto left rows (NULL when no
    *                  right row precedes the left row)
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   timeCol: String, valueCols: Seq[String]): DataFrame = {
    val payload = left.columns.filterNot(c => keyCols.contains(c) || c == timeCol)
    require(valueCols.intersect(left.columns).isEmpty,
      s"value columns ${valueCols.intersect(left.columns).mkString(",")} collide with left columns")
    val rTypes = valueCols.map(c => c -> right.schema(c).dataType).toMap
    val pTypes = payload.map(c => c -> left.schema(c).dataType).toMap
    // common shape: keys ++ time ++ side ++ left payload ++ right values.
    // Right rows sort BEFORE left rows at equal time, so `<=` matches.
    val lNorm = left.select(
      keyCols.map(col) ++ Seq(col(timeCol), lit(1).as("__side")) ++
        payload.map(col) ++
        valueCols.map(c => lit(null).cast(rTypes(c)).as(c)): _*)
    val rNorm = right.select(
      keyCols.map(col) ++ Seq(col(timeCol), lit(0).as("__side")) ++
        payload.map(c => lit(null).cast(pTypes(c)).as(c)) ++
        valueCols.map(col): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lNorm.unionByName(rNorm)
      .select(
        keyCols.map(col) ++ Seq(col(timeCol), col("__side")) ++
          payload.map(col) ++
          valueCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
