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
}
