package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join via a coarse-bucket overlay.
  *
  * Spark plans a bare `p BETWEEN lo AND hi` join as a
  * BroadcastNestedLoopJoin — every point against every interval — which
  * dies as soon as the interval side outgrows a broadcast. The overlay
  * turns it into an equi-join: every interval explodes to the width-W
  * time buckets it covers, every point maps to its single bucket, the
  * bucket is the shuffle key, and the exact BETWEEN refines after the
  * join. Work is O(|intervals| · avgSpan/W + |points|) with hash
  * parallelism — pick W near the typical interval span so most intervals
  * land in 1-2 buckets.
  *
  * A point joins each interval in exactly ONE bucket (its own), so the
  * overlay introduces no duplicates and needs no dedup pass.
  */
object RangeJoin {

  /** @param points    side with a single numeric coordinate `pointCol`
    * @param intervals side with inclusive [loCol, hiCol] numeric bounds
    * @param bucketWidth overlay bucket width (same unit as the columns)
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // exact long floor-division (negatives included): subtract the
    // non-negative pmod remainder, then integral DIV — all-integer
    // arithmetic. `floor(col/w)` would route through a double, and
    // coordinates beyond 2^53 (nanosecond epochs are ~1e18) would
    // silently mis-bucket.
    def fdiv(x: org.apache.spark.sql.Column) =
      (x.cast("long") - pmod(x.cast("long"), lit(bucketWidth))).as("__m")
    // Malformed intervals cost nothing: hi < lo would still explode
    // (sequence auto-steps -1) into descending buckets whose rows only
    // die at the BETWEEN refine — reject them (and NULL bounds) up front.
    val iv = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .withColumn("__mlo", fdiv(col(loCol)))
      .withColumn("__mhi", fdiv(col(hiCol)))
      .withColumn("__b", explode(sequence(
        expr(s"__mlo DIV ${bucketWidth}L"), expr(s"__mhi DIV ${bucketWidth}L"))))
      .drop("__mlo", "__mhi")
    val pt = points.withColumn("__m", fdiv(col(pointCol)))
      .withColumn("__b", expr(s"__m DIV ${bucketWidth}L"))
      .drop("__m")
    pt.join(iv, Seq("__b"))
      .filter(col(pointCol).between(col(loCol), col(hiCol)))
      .drop("__b")
  }
}
