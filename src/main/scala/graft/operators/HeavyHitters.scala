package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import graft.expressions.MisraGriesStrings

/** Exact heavy hitters over an unbounded key domain — "which tokens /
  * URLs / n-grams make up more than s of the corpus?" — without ever
  * materializing the full frequency table.
  *
  * The one-pass `groupBy(item).count()` answer is exact but its
  * intermediate state is the DOMAIN's cardinality: at web scale the
  * shuffle and the aggregate hash table grow with distinct keys
  * (billions), of which the report wants a handful. This operator runs
  * the textbook two-pass scheme instead:
  *
  *   1. CANDIDATES — a Misra–Gries summary
  *      ([[graft.expressions.MisraGriesStrings]]) with k counters, plus
  *      the total item count n, in ONE aggregate pass: bounded state
  *      (≤ k counters per partial, ≤ k entries shuffled per partition),
  *      guaranteed to contain every item with count > n/(k+1).
  *   2. RECOUNT — exact counts for the ≤ k candidate items only: the
  *      candidate list is a plan literal (`isin`), so the filter pushes
  *      to the scan and the second pass aggregates at most k groups.
  *
  * With the share threshold s = num/denom required to satisfy
  * s > 1/(k+1) (checked, not assumed), pass 1's superset guarantee makes
  * the composition EXACT and deterministic even though the sketch's
  * weights are not — which is what lets a plain `GROUP BY … HAVING`
  * oracle check it (q115).
  *
  * Two scans of the input is the honest price of exactness with bounded
  * memory; callers who tolerate ±n/(k+1) error can stop after pass 1.
  */
object HeavyHitters {

  /** Misra–Gries candidate summary as an aggregate column:
    * array<struct<item, w>> by (w desc, item asc), ≤ k entries.
    */
  def mgSummary(item: Column, k: Int): Column =
    toColumn(MisraGriesStrings(toExpression(item), k).toAggregateExpression())

  /** Exact items whose count satisfies cnt·denom ≥ n·num (i.e. share ≥
    * num/denom of the n non-NULL items), via sketch-candidates + exact
    * recount.
    *
    * @param df      input table
    * @param itemCol string item column (NULLs ignored, as in COUNT)
    * @param k       sketch counters; must satisfy num·(k+1) > denom so the
    *                guarantee covers the threshold
    * @return (item, cnt, n) ordered by (cnt desc, item) — n the total
    *         non-NULL item count, so shares are reconstructible
    */
  def exactTopShare(df: DataFrame, itemCol: String, k: Int,
                    num: Long, denom: Long): DataFrame = {
    require(num > 0 && denom > 0, "share must be positive")
    require(num * (k + 1) > denom,
      s"share $num/$denom is below the sketch guarantee 1/(k+1)=1/${k + 1}: " +
        "items at the threshold could be missed — raise k or the threshold")
    val firstPass = df.agg(
      mgSummary(col(itemCol), k).as("mg"),
      count(col(itemCol)).as("n")).head()
    val n = firstPass.getLong(1)
    val candidates = firstPass.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    if (n == 0L || candidates.isEmpty)
      return df.sparkSession.emptyDataFrame
        .withColumn("item", lit(null).cast("string"))
        .withColumn("cnt", lit(null).cast("long"))
        .withColumn("n", lit(null).cast("long"))
        .limit(0)
    df.filter(col(itemCol).isin(candidates: _*))
      .groupBy(col(itemCol).as("item"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * denom >= lit(n) * num)
      .withColumn("n", lit(n))
      .orderBy(desc("cnt"), col("item"))
  }
}
