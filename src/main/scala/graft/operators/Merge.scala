package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog compaction / upsert-merge: keep the latest version of each
  * key — the operator behind re-crawl dedup ("newest fetch of each URL
  * wins"), CDC table maintenance, and incremental corpus refreshes.
  *
  * Scale shape: ONE hash aggregate, shuffled by key, with map-side
  * combine — each partition first reduces its own rows to one candidate
  * per key, so a key with millions of stale versions sends ONE row per
  * map task to the reducer. The textbook alternative — a row_number()
  * window over (key ORDER BY version DESC) — shuffles every version AND
  * sort-buffers each key's rows on the reduce side; at 100 TB of
  * append-log input that is strictly worse on both wire volume and
  * reducer memory.
  */
object Merge {

  /** One row per `keys`: the row with the greatest `versionCols` tuple.
    * Ties beyond `versionCols` resolve by the remaining columns' order
    * (the struct comparison is total), so make `versionCols` unique per
    * key — e.g. (timestamp, eventId) — for a meaningful "latest".
    * Null-version rows sort lowest (Spark struct ordering), i.e. they
    * lose to any versioned row.
    */
  def latestByKey(changes: DataFrame, keys: Seq[String],
                  versionCols: Seq[String]): DataFrame = {
    require(versionCols.nonEmpty, "versionCols must be non-empty")
    val payload = changes.columns.toSeq.filterNot((keys ++ versionCols).contains)
    val ordered = versionCols ++ payload
    changes.groupBy(keys.map(col): _*)
      .agg(max(struct(ordered.map(col): _*)).as("__last"))
      .select(keys.map(col) ++ ordered.map(c => col(s"__last.`$c`").as(c)): _*)
  }

  /** Upsert `updates` into `base`: latest version per key across both.
    * Schemas must match by name ([[DataFrame.unionByName]]).
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
             versionCols: Seq[String]): DataFrame =
    latestByKey(base.unionByName(updates), keys, versionCols)

  /** Golden-record survivorship — the consolidation step after entity
    * resolution: every cluster of records resolved to one entity (dedup
    * CC cluster, merge/purge block, household key) collapses to ONE row
    * whose fields follow per-field survivorship policies:
    *
    *   - `modeCols`: the most frequent non-NULL value, ties broken by
    *     the smallest value (deterministic MODE — never `first()`, whose
    *     result is partitioning-dependent);
    *   - `maxCols`: the largest value (freshness/size winners);
    *   - rep_id: the smallest `idCol` (the stable canonical member, the
    *     same convention as the dedup survivors).
    *
    * Scale shape: one count-aggregate per mode column keyed by
    * (cluster, value) — cardinality bounded by distinct values per
    * cluster, with map-side partial counts absorbing the duplicate mass
    * (exactly the skew profile of dup clusters); the per-cluster argmax
    * runs on those aggregated rows via max_by over a (count, value)
    * ordering struct, never a raw-data window. The min/max policies ride
    * a single plain aggregate. Joins between the per-policy results are
    * cluster-keyed, |clusters|-sized.
    *
    * @return (clusterCol, n_members, rep_id, modeCols..., maxCols...)
    */
  def goldenRecord(df: DataFrame, clusterCol: String, idCol: String,
                   modeCols: Seq[String], maxCols: Seq[String]): DataFrame = {
    val base = df.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("n_members"),
        (min(col(idCol)).as("rep_id") +: maxCols.map(c => max(col(c)).as(c))): _*)
    modeCols.foldLeft(base) { (acc, c) =>
      // (count DESC, value ASC) argmax via max_by on a struct whose
      // second field inverts the value order: max over (cnt, rank) —
      // ranking values ascending within a (cluster, cnt) is cheap here
      // because ties are resolved by a second tiny aggregate, not a
      // raw-data window.
      val counts = df.filter(col(c).isNotNull)
        .groupBy(col(clusterCol), col(c))
        .agg(count(lit(1)).as("__cnt"))
      val best = counts.groupBy(col(clusterCol))
        .agg(max(col("__cnt")).as("__best"))
      val winner = counts.join(best, Seq(clusterCol))
        .filter(col("__cnt") === col("__best"))
        .groupBy(col(clusterCol))
        .agg(min(col(c)).as(c))
      acc.join(winner, Seq(clusterCol), "left")
    }
  }
}
