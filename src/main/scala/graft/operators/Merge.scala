package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Incremental aggregate maintenance — apply a signed changelog to a
    * materialized (count, sums…) aggregate WITHOUT recomputing the base:
    * new_agg = old_agg ⊎ agg(delta), where deletes contribute with sign
    * −1. This is the 100 TB answer to "a 10 GB batch arrived, refresh the
    * per-source stats": work proportional to |delta| + |groups|, never to
    * the corpus. Correct for any commutative-group aggregate (counts,
    * sums — NOT min/max, which are not subtractable; maintain those with
    * a recompute or a monoid sketch instead).
    *
    * Groups whose maintained count reaches 0 are DROPPED, matching what
    * a full recompute over the post-delta state would produce (a
    * recompute never emits an empty group). A count driven negative —
    * a delete for a row the base never had — is a changelog-integrity
    * bug; it also drops (count <= 0), keeping the operator idempotent
    * under at-least-once delete delivery of rows already gone.
    *
    * Scale shape: one hash aggregate over the delta (map-side combine to
    * |groups| rows), one |groups|-row union + re-aggregate with the old
    * snapshot. The old aggregate is read, never shuffled wider than its
    * own group count.
    *
    * @param oldAgg  prior snapshot: (keys…, n, sumCols…)
    * @param delta   changelog rows: (keys…, sign ∈ {+1,−1}, valueCols…)
    * @param keys    group-key column names
    * @param sign    ±1 Column on `delta`
    * @param sums    (aggColName → delta value Column) in `oldAgg`'s
    *                sum-column order
    * @return same shape as `oldAgg`, equal to a full recompute over
    *         base ∖ deletes ∪ inserts
    */
  def applyAggDelta(oldAgg: DataFrame, delta: DataFrame, keys: Seq[String],
                    sign: Column,
                    sums: Seq[(String, Column)]): DataFrame = {
    val deltaAgg = delta
      .select(keys.map(col) ++ (sign.cast("long").as("n") +: sums.map {
        case (n, v) => (sign * v).as(n)
      }): _*)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sums.map { case (n, _) => sum(col(n)).as(n) }: _*)
    oldAgg.unionByName(deltaAgg)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sums.map { case (n, _) => sum(col(n)).as(n) }: _*)
      .filter(col("n") > 0L)
  }

  /** Incremental EQUI-JOIN maintenance ([[applyAggDelta]]'s sibling for
    * a materialized join): given signed changelogs dA, dB against base
    * tables A, B, emit the signed delta of A⋈B from the algebraic
    * identity
    *
    *   (A+dA)⋈(B+dB) − A⋈B  =  dA⋈(B+dB)  ∪  A⋈dB
    *
    * (expand the product; the dA⋈dB cross term belongs to the first
    * branch because its right side is B PLUS dB). Output rows carry
    * `sign` = the product of the joining rows' signs — a delete joining
    * an insert correctly yields a −·+ = − join delta — so downstream a
    * signed union with the old join (or [[applyAggDelta]] over it)
    * equals the full recompute.
    *
    * Scale shape: this is the reason materialized joins are maintainable
    * at 100 TB — BOTH branches are delta-driven: dA⋈(B ⊎ dB) shuffles
    * dA against B's matching keys only (broadcast dA when small; AQE
    * does), and A⋈dB likewise. The corpus-sized A⋈B is never recomputed;
    * cost ∝ |delta| · join fan-out, not |base|.
    *
    * Column contract: `aCols`/`bCols` are the payload columns carried
    * from each side (key columns come out once); both changelogs carry
    * `signCol` ∈ {+1, −1}; base rows count as +1.
    *
    * @return (keys…, aCols…, bCols…, sign)
    */
  def joinDelta(aOld: DataFrame, dA: DataFrame, bOld: DataFrame,
                dB: DataFrame, keys: Seq[String], signCol: String,
                aCols: Seq[String], bCols: Seq[String]): DataFrame = {
    def side(base: DataFrame, cols: Seq[String]) = base
      .select(keys.map(col) ++ cols.map(col) :+ lit(1L).as("__s"): _*)
    def deltaSide(d: DataFrame, cols: Seq[String]) = d
      .select(keys.map(col) ++ cols.map(col) :+
        col(signCol).cast("long").as("__s"): _*)
    val bNew = side(bOld, bCols).unionByName(deltaSide(dB, bCols))
    val left = deltaSide(dA, aCols)
      .withColumnRenamed("__s", "__sa")
      .join(bNew.withColumnRenamed("__s", "__sb"), keys)
    val right = side(aOld, aCols)
      .withColumnRenamed("__s", "__sa")
      .join(deltaSide(dB, bCols).withColumnRenamed("__s", "__sb"), keys)
    left.unionByName(right)
      .select(keys.map(col) ++ aCols.map(col) ++ bCols.map(col) :+
        (col("__sa") * col("__sb")).as("sign"): _*)
  }
}
