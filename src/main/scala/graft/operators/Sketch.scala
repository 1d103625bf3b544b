package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** KMV (k-minimum-values) distinct-count sketching.
  *
  * The sketch state is [[graft.expressions.BottomKLongs]] — a bounded
  * bottom-k of portable hashes, k longs per group regardless of input
  * size, mergeable map-side. The estimator (k-1)·M / h_k is the standard
  * KMV distinct-count estimate for hashes uniform on [0, M).
  *
  * Built on the PORTABLE polynomial hash (TextAnalysis.polyHash), so the
  * whole sketch — state and estimate — is reproducible in any engine with
  * list functions, keeping even the approximate distinct path inside the
  * cross-engine oracle gate.
  */
object Sketch {

  /** Aggregate: the ≤k smallest distinct values of a LONG hash column,
    * ascending. Bounded state; safe at any group cardinality.
    */
  def bottomKHashes(hash: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    toColumn(graft.expressions.BottomKLongs(toExpression(hash), k)
      .toAggregateExpression())
  }

  /** KMV estimate from a [[bottomKHashes]] sketch: exact size when the
    * group held fewer than k distinct hashes, (k-1)·M / h_k otherwise.
    * All-rational double arithmetic — cross-engine exact.
    */
  def kmvDistinctEstimate(sketch: Column, k: Int, hashMod: Long): Column =
    when(size(sketch) < k, size(sketch).cast(DoubleType))
      .otherwise(lit((k - 1).toDouble * hashMod) /
        element_at(sketch, k).cast(DoubleType))
}
