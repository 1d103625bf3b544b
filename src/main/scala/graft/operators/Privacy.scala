package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification risk audits for corpus metadata — the release gate
  * that runs BEFORE a training corpus (or its per-document metadata
  * sidecar) is published: k-anonymity (Sweeney 2002) over a
  * quasi-identifier tuple, and l-diversity (Machanavalli et al. 2007)
  * over a sensitive attribute within each quasi-identifier group.
  *
  * Scale shape: one hash-aggregate shuffle keyed by the QI tuple —
  * state is bounded by the number of DISTINCT QI combinations, never
  * corpus rows; the l-diversity `countDistinct` plans as Spark's exact
  * two-phase distinct aggregate (partial de-dup map-side). Enforcement
  * ([[suppressSmallGroups]]) is a broadcast-able semi-join of the
  * (small, risky-groups-only) audit back onto the corpus.
  */
object Privacy {

  /** Per-QI-group audit: group size, distinct sensitive values, and the
    * two pass/fail flags. A group passes k-anonymity when ≥ k rows share
    * its QI tuple (an attacker knowing the QI cannot narrow below k
    * candidates) and l-diversity when its sensitive attribute takes ≥ l
    * distinct values (narrowing to the group still leaves l plausible
    * sensitive values). NULL QI values group together (groupBy NULL
    * semantics) — a NULL is itself a quasi-identifier state.
    *
    * @return (qiCols..., group_size, n_sensitive, k_anonymous, l_diverse)
    */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                      k: Int, l: Int): DataFrame = {
    require(qiCols.nonEmpty && k >= 1 && l >= 1)
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("k_anonymous", col("group_size") >= k)
      .withColumn("l_diverse", col("n_sensitive") >= l)
  }

  /** Enforcement: drop every row whose QI group fails k-anonymity — the
    * standard suppression step. The risky-group list is an aggregate
    * bounded by |distinct QI|, hinted broadcast for the anti-join.
    */
  def suppressSmallGroups(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty && k >= 1)
    val risky = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") < k)
      .select(qiCols.map(col): _*)
    df.join(broadcast(risky), qiCols, "left_anti")
  }

  /** Luhn (mod-10) checksum validity of a digit string — the
    * false-positive filter behind card-number PII detection: a 16-digit
    * run is only a plausible card if its Luhn check passes (~10% of
    * random digit runs do), so redaction pipelines gate on it before
    * treating a number as sensitive. Also the generic validity check for
    * any Luhn-checksummed identifier column (cards, IMEIs, some account
    * schemes).
    *
    * Pure row-local projection — no shuffle, no state: the fold walks
    * the REVERSED string once (reversed OUTSIDE the per-digit lambda and
    * bound via the [[graft.functions.shingles]] array-binding discipline,
    * so the string is not re-reversed per digit), doubling every second
    * digit from the right and subtracting 9 when doubling carries.
    * Integer arithmetic only — engine-portable, oracle-checkable.
    *
    * Contract: `digits` must contain only ASCII digits (pre-extract with
    * a `[0-9]{13,19}` scan for card shapes); non-digit characters
    * produce garbage sums, not errors. NULL in → NULL out; the empty
    * string validates false (sum 0 passes mod 10 but no digits — gated
    * by the length check).
    */
  def luhnValid(digits: Column): Column =
    element_at(
      transform(array(reverse(digits)), r => {
        val total = aggregate(sequence(lit(1), length(r)), lit(0L),
          (acc, i) => {
            val d = (ascii(r.substr(i, lit(1))) - 48).cast("long")
            acc + when(i % 2 === 1, d)
              .otherwise(when(d * 2 > 9, d * 2 - 9).otherwise(d * 2))
          })
        // empty-string guard BEFORE the fold: Spark's sequence(1, 0)
        // defaults its step to -1 (yielding [1, 0], not []), so the
        // fold must not run on zero-length input; CaseWhen branches
        // evaluate lazily, making this a real guard.
        // two `when`s, no otherwise: NULL input matches neither branch
        // and stays NULL (an `otherwise(false)` would swallow it)
        when(length(r) > 0, total % 10 === 0)
          .when(length(r) === 0, lit(false))
      }),
      1)
}
