package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe per-group top-k selection ("best k documents per language /
  * per domain / per cluster" — the curation step after quality scoring).
  *
  * The naive `row_number() over (partition by group order by score)`
  * funnels each group through ONE task — with a handful of groups
  * (languages) over a 100 TB corpus that is a ~20 TB single-task sort,
  * the same funnel stratifiedSample's histogram plan avoids. Here the
  * rank runs in two phases:
  *   1. a LOCAL top-k per (group, salt) — `salts` deterministic
  *      sub-partitions per group, each ranking ~|group|/salts rows in
  *      parallel; any row outside its salt's top k cannot be in the
  *      group's top k, so the filter is lossless;
  *   2. the FINAL rank over the ≤ k·salts survivors per group — bounded
  *      by k·salts regardless of corpus size.
  * Order is total — (score desc, id asc) — so the result is deterministic
  * and identical to the single-window formulation.
  */
object TopK {

  /** @param df       input table
    * @param groupCol grouping column
    * @param scoreCol ranking column, larger = better (non-null; NULL
    *                 ordering differs across engines — filter or coalesce
    *                 upstream)
    * @param idCol    unique tie-break column (makes the order total)
    * @param k        rows to keep per group
    * @param salts    phase-1 parallelism per group
    * @return input rows of each group's top k by (scoreCol desc, idCol
    *         asc), with a `rank` column (1-based, long)
    */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
                   idCol: String, k: Int, salts: Int = 32): DataFrame = {
    require(k > 0 && salts > 0)
    val w1 = Window.partitionBy(col(groupCol), col("__salt"))
      .orderBy(desc(scoreCol), col(idCol))
    val w2 = Window.partitionBy(col(groupCol))
      .orderBy(desc(scoreCol), col(idCol))
    df.withColumn("__salt", Sampling.hashBucket(col(idCol), salts))
      .withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= k)
      .withColumn("rank", row_number().over(w2).cast("long"))
      .filter(col("rank") <= k)
      .drop("__salt", "__r1")
  }

  /** 2-D SKYLINE (Pareto frontier, maximize both): rows for which no
    * other row is ≥ on both dimensions and > on at least one — the
    * preference query behind "longest AND highest-quality documents"
    * shortlists, which no top-k on a single weighted score can express
    * (the frontier IS the set of optima for every possible weighting).
    *
    * Scale shape — the classic sort-scan without the sort: collapse the
    * corpus to the per-x max-y histogram (one combinable aggregate,
    * bounded by distinct x); a cell is on the frontier iff its max-y
    * strictly exceeds the running max-y over all LARGER x — one
    * exclusive window over histogram rows (the monitor discipline:
    * bounded by value cardinality, documented). Rows then semi-join the
    * frontier cells on (x, y): a row below its cell's max-y is dominated
    * within the cell (same x, larger y exists).
    *
    * Duplicates of a frontier point all survive (no strict dominator
    * exists among equals). NULL x or y rows are excluded (no dominance
    * order). Integral dimensions only — quantize doubles first, the
    * histogram discipline.
    *
    * @return the input rows on the frontier, original columns intact
    */
  def skyline2D(df: DataFrame, xCol: org.apache.spark.sql.Column,
                yCol: org.apache.spark.sql.Column): DataFrame = {
    val withXY = df.withColumn("__x", xCol.cast("long"))
      .withColumn("__y", yCol.cast("long"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val cells = withXY.groupBy("__x").agg(max(col("__y")).as("__my"))
    val wDesc = Window.orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1) // exclusive: larger x only
    val frontier = cells
      .withColumn("__pm", max(col("__my")).over(wDesc))
      .filter(col("__pm").isNull || col("__my") > col("__pm"))
      .select(col("__x"), col("__my").as("__y"))
    withXY.join(broadcast(frontier), Seq("__x", "__y"), "left_semi")
      .drop("__x", "__y")
  }

  /** [[skyline2D]] PER GROUP — one Pareto frontier per stratum ("the
    * longest-and-highest-quality docs per language"), same histogram
    * discipline with the exclusive running-max window PARTITIONED by
    * the group: each partition is one group's distinct-x rows, so no
    * single-partition funnel appears at any group count.
    */
  def skyline2DByGroup(df: DataFrame, groupCol: String,
                       xCol: org.apache.spark.sql.Column,
                       yCol: org.apache.spark.sql.Column): DataFrame = {
    val withXY = df.withColumn("__x", xCol.cast("long"))
      .withColumn("__y", yCol.cast("long"))
      .filter(col("__x").isNotNull && col("__y").isNotNull &&
        col(groupCol).isNotNull)
    val cells = withXY.groupBy(col(groupCol), col("__x"))
      .agg(max(col("__y")).as("__my"))
    val wDesc = Window.partitionBy(col(groupCol)).orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = cells
      .withColumn("__pm", max(col("__my")).over(wDesc))
      .filter(col("__pm").isNull || col("__my") > col("__pm"))
      .select(col(groupCol), col("__x"), col("__my").as("__y"))
    withXY.join(broadcast(frontier), Seq(groupCol, "__x", "__y"),
      "left_semi")
      .drop("__x", "__y")
  }
}
