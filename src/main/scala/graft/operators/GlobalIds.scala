package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous global ordinals 0..N−1 in a total order — the stable-id
  * primitive a training pipeline needs for reproducible sharding ("docs
  * 0–9,999,999 are shard 0") and auditable sample manifests.
  *
  * The two built-in routes both fail at scale: `row_number()` over a
  * global (partition-less) window funnels the ENTIRE corpus through one
  * task, and `monotonically_increasing_id`/`zipWithIndex` ids are not
  * ordered by any data column (and the former is not even contiguous).
  *
  * Plan here — the histogram-offset shape shared with
  * [[Sampling.stratifiedSample]]:
  *   1. bucket every row by a coarse ORDER-ALIGNED expression (e.g.
  *      `floor(key/width)`) — deterministic, unlike
  *      `repartitionByRange`'s sampled boundaries, which is what keeps
  *      the result oracle-reproducible;
  *   2. count rows per bucket: map-side-combinable aggregate, output
  *      bounded by bucket cardinality, not corpus size;
  *   3. cumulate bucket offsets with a window over the (small) histogram
  *      — the only global-ordered window runs on bucket rows;
  *   4. broadcast offsets back; rank WITHIN buckets only (each window
  *      partition is one bucket — size the bucket expression so a bucket
  *      fits an executor, exactly the histogram-width rule every other
  *      histogram operator here documents) and add the offset.
  *
  * CONTRACT: `bucket` must be monotone non-decreasing along `order`
  * (every row of bucket b sorts before every row of bucket b+1), must
  * be non-NULL (a NULL bucket drops its rows at the offset equi-join —
  * coalesce the bucket expression if the order key is nullable), and
  * `order` must be a total order. All hold trivially for the canonical
  * use — bucket = fixed-width ranges of the leading non-null numeric
  * order column, ties broken by id. Bucket cardinality bounds the
  * broadcast offset table — size the width so buckets number in the
  * thousands-to-millions, not billions.
  */
object GlobalIds {

  /** @return `df` plus `idName` — LONG ordinals 0..N−1 along `order`. */
  def contiguousIds(df: DataFrame, bucket: Column, order: Seq[Column],
                    idName: String = "gid"): DataFrame = {
    require(order.nonEmpty, "need at least one order column")
    val withB = df.withColumn("__b", bucket.cast("long"))
    val hist = withB.groupBy(col("__b")).agg(count(lit(1)).as("__c"))
    val wOff = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .select(col("__b"), col("__off"))
    val wIn = Window.partitionBy(col("__b")).orderBy(order: _*)
    withB.join(broadcast(offsets), "__b")
      .withColumn(idName, col("__off") + row_number().over(wIn) - 1)
      .drop("__b", "__off")
  }

  /** Per-GROUP contiguous ordinals 0..n_g−1 along `order` within each
    * group — the grouped sibling of [[contiguousIds]], and the scale
    * replacement for `row_number() over (partition by group order by …)`
    * when groups are FEW and LARGE (a per-source rank over a 20-source
    * corpus funnels 1/20th of 100 TB through each window task; here the
    * only per-group window runs over histogram rows). Same histogram
    * shape: count (group, bucket) cells, cumulate offsets per group over
    * the small histogram, broadcast back, rank within cells only. Same
    * CONTRACT as [[contiguousIds]], per group: `bucket` monotone
    * non-decreasing along `order` within every group, non-NULL, and
    * (group, bucket) cell cardinality bounds the broadcast. A NULL
    * `group` drops its rows at the offset equi-join (the equi-join is
    * not null-safe) — coalesce the group expression if NULL groups
    * should rank.
    */
  def contiguousIdsByGroup(df: DataFrame, group: Column, bucket: Column,
                           order: Seq[Column], idName: String = "gid"): DataFrame = {
    require(order.nonEmpty, "need at least one order column")
    val withB = df.withColumn("__g", group).withColumn("__b", bucket.cast("long"))
    val hist = withB.groupBy(col("__g"), col("__b")).agg(count(lit(1)).as("__c"))
    val wOff = Window.partitionBy(col("__g")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .select(col("__g"), col("__b"), col("__off"))
    val wIn = Window.partitionBy(col("__g"), col("__b")).orderBy(order: _*)
    withB.join(broadcast(offsets), Seq("__g", "__b"))
      .withColumn(idName, col("__off") + row_number().over(wIn) - 1)
      .drop("__g", "__b", "__off")
  }

  /** Contiguous equal-size shard labels on top of [[contiguousIds]]:
    * shard = gid div shardSize — every shard except the last has exactly
    * `shardSize` consecutive-ordinal rows, the property manifest-driven
    * training readers assume.
    */
  def shardByOrder(df: DataFrame, bucket: Column, order: Seq[Column],
                   shardSize: Long, idName: String = "gid",
                   shardName: String = "shard"): DataFrame = {
    require(shardSize > 0)
    contiguousIds(df, bucket, order, idName)
      .withColumn(shardName,
        // integer DIV, not `/` (double division loses exactness past 2^53
        // — reachable ordinal territory at 100 TB row counts)
        expr(s"CAST(`$idName` DIV $shardSize AS BIGINT)"))
  }
}
