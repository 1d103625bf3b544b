package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weak supervision (Snorkel-style, Ratner et al. VLDB 2018): combine
  * many cheap, noisy labeling functions (LFs) — rules, heuristics,
  * gazetteers — into one training label per document, and audit each LF
  * against the consensus. This is how labeled sets are bootstrapped at
  * corpus scale, where human annotation of every row is impossible; the
  * majority-vote combiner here is the deterministic, oracle-checkable
  * baseline of that family (the EM-weighted label model refines it but
  * is not exactly reproducible cross-engine).
  *
  * Encoding: each LF column votes 1 (positive), 0 (negative), or NULL
  * (abstain) — the standard three-state LF contract.
  *
  * Scale shape: [[majorityVote]] is a pure projection (fixed-order
  * row-local integer adds — no aggregation, no shuffle, codegen-friendly);
  * [[lfStats]] unpivots |LF| values per row map-side and runs ONE
  * count-aggregate keyed by LF name — state bounded by the number of
  * LFs, never by corpus rows.
  */
object Supervision {

  /** Per-row consensus over `lfCols`: vote tallies, the majority label
    * (NULL on ties and all-abstain — downstream samplers treat those as
    * unlabeled), and a unanimity flag (at least one vote and no dissent).
    *
    * @return df + (votes_pos, votes_neg, label, unanimous)
    */
  def majorityVote(df: DataFrame, lfCols: Seq[String]): DataFrame = {
    require(lfCols.nonEmpty)
    def tally(v: Int): Column =
      lfCols.map(c => when(col(c) === v, 1L).otherwise(0L)).reduce(_ + _)
    df.withColumn("votes_pos", tally(1))
      .withColumn("votes_neg", tally(0))
      .withColumn("label",
        when(col("votes_pos") > col("votes_neg"), 1)
          .when(col("votes_neg") > col("votes_pos"), 0))
      .withColumn("unanimous",
        (col("votes_pos") === 0 || col("votes_neg") === 0) &&
          col("votes_pos") + col("votes_neg") > 0)
  }

  /** Per-LF audit against the [[majorityVote]] consensus: how often each
    * LF fires (coverage), agrees with the consensus, conflicts with it,
    * or votes where no consensus exists — the table that tells you which
    * heuristic to fix first.
    *
    * @param voted output of [[majorityVote]] over the same `lfCols`
    * @return (lf, n_rows, coverage, agree, conflict, no_consensus) — one
    *         row per LF; coverage = non-abstain votes, agree/conflict
    *         measured only where a consensus label exists
    */
  def lfStats(voted: DataFrame, lfCols: Seq[String]): DataFrame = {
    require(lfCols.nonEmpty)
    val unpivoted = voted.select(col("label"),
      explode(map(lfCols.flatMap(c => Seq(lit(c), col(c).cast("int"))): _*))
        .as(Seq("lf", "vote")))
    unpivoted.groupBy("lf").agg(
      count(lit(1)).as("n_rows"),
      count(col("vote")).as("coverage"),
      count(when(col("vote") === col("label"), 1L)).as("agree"),
      count(when(col("vote").isNotNull && col("label").isNotNull &&
        col("vote") =!= col("label"), 1L)).as("conflict"),
      count(when(col("vote").isNotNull && col("label").isNull, 1L))
        .as("no_consensus"))
  }
}
