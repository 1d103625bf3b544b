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
  *
  * NULL handling: rows with a NULL `timeCol` are dropped from BOTH sides
  * before the union — a NULL time has no position on the as-of axis, and
  * because NULLs sort first in the window order they would otherwise
  * bleed a right row's values into every left row of its key. NULLs in
  * `valueCols` are fine: the right side's values ride as ONE struct (a
  * right row's struct is non-null even when all its fields are), so the
  * carried values always come from a single right row and a genuine NULL
  * field is carried as NULL rather than skipped for an older row's value.
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
    val rvType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType)))
    val pTypes = payload.map(c => c -> left.schema(c).dataType).toMap
    // common shape: keys ++ time ++ side ++ left payload ++ ONE struct of
    // right values (non-null for every right row, so `last(ignoreNulls)`
    // carries whole rows — never stitches fields from different rows).
    // Right rows sort BEFORE left rows at equal time, so `<=` matches.
    val lNorm = left.filter(col(timeCol).isNotNull).select(
      keyCols.map(col) ++ Seq(col(timeCol), lit(1).as("__side")) ++
        payload.map(col) :+ lit(null).cast(rvType).as("__rv"): _*)
    val rNorm = right.filter(col(timeCol).isNotNull).select(
      keyCols.map(col) ++ Seq(col(timeCol), lit(0).as("__side")) ++
        payload.map(c => lit(null).cast(pTypes(c)).as(c)) :+
        struct(valueCols.map(col): _*).as("__rv"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lNorm.unionByName(rNorm)
      .select(
        keyCols.map(col) ++ Seq(col(timeCol), col("__side")) ++
          payload.map(col) :+
          last(col("__rv"), ignoreNulls = true).over(w).as("__rv"): _*)
      .filter(col("__side") === 1)
      .select(
        keyCols.map(col) ++ Seq(col(timeCol)) ++
          payload.map(col) ++
          valueCols.map(c => col("__rv").getField(c).as(c)): _*)
  }
}
