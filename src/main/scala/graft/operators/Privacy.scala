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
}
