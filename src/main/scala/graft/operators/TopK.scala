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
}
