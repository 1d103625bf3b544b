package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Per-QI-group t-CLOSENESS for an ORDERED sensitive attribute (Li,
    * Li & Venkatasubramanian, ICDE'07) — the third leg after
    * [[kAnonymityAudit]]'s k and l: a group can be large (k-anonymous)
    * and varied (l-diverse) yet still LEAK because its sensitive
    * DISTRIBUTION differs from the table's (every row in the group
    * skews long, say). For ordered attributes the earth-mover's
    * distance collapses to cumulative-share differences over the global
    * value ladder v₁..v_V:
    *
    *   t(g) = (1/(V−1)) · Σ_j |cumP_j/n_g − cumQ_j/N|
    *
    * computed here with ZERO floats until the last step: the inner term
    * cross-multiplies to |cumP_j·N − cumQ_j·n_g| (exact BIGINT), the
    * group's t_num is their exact sum, and t = t_num / (n_g·N·(V−1)) is
    * one division. Overflow contract: cum·N ≤ N² ⇒ N below ~3e9 rows
    * (bucket the sensitive value upstream — you should anyway: V also
    * bounds the grid).
    *
    * Scale shape: two histograms (group×value, value) + one group-sized
    * aggregate; the only per-group window cumulates over the
    * |groups|·V GRID (global ladder rows exist for every group even
    * where the group has no mass — absent cells still contribute), with
    * the V-row global ladder broadcast onto the group list. Bounded by
    * |QI groups| · V throughout; raw rows appear only in the two
    * histogram passes.
    *
    * @param sensitive ordered (integer-valued) sensitive expression
    * @return (qiCols…, group_size, t_num, t, t_close = t ≤ tMax);
    *         t is NULL when the table has a single distinct value
    */
  def tClosenessAudit(df: DataFrame, qiCols: Seq[String], sensitive: Column,
                      tMax: Double): DataFrame = {
    require(qiCols.nonEmpty)
    val qi = qiCols.map(col)
    val s = df.select(qi :+ sensitive.cast("long").as("__v"): _*)
    val gv = s.groupBy(qi :+ col("__v"): _*).agg(count(lit(1)).as("__c"))
    val wQ = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ladder = s.groupBy("__v").agg(count(lit(1)).as("__cq"))
      .withColumn("__cumq", sum(col("__cq")).over(wQ))
      .withColumn("__n", sum(col("__cq")).over(Window.partitionBy()))
      .withColumn("__nv", count(lit(1)).over(Window.partitionBy()))
      .select("__v", "__cumq", "__n", "__nv")
    val groups = s.groupBy(qi: _*).agg(count(lit(1)).as("group_size"))
    val wP = Window.partitionBy(qi: _*).orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    groups.crossJoin(broadcast(ladder))
      .join(gv, qiCols :+ "__v", "left")
      .withColumn("__cump", sum(coalesce(col("__c"), lit(0L))).over(wP))
      .withColumn("__term",
        abs(col("__cump") * col("__n") - col("__cumq") * col("group_size")))
      .groupBy(qi :+ col("group_size") :+ col("__n") :+ col("__nv"): _*)
      .agg(sum(col("__term")).as("t_num"))
      .withColumn("t",
        when(col("__nv") > 1,
          col("t_num").cast("double") /
            (col("group_size") * col("__n") * (col("__nv") - 1))
              .cast("double")))
      .withColumn("t_close", col("t") <= tMax)
      .drop("__n", "__nv")
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
