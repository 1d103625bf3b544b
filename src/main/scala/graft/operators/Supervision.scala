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

  /** Cohen's kappa — chance-corrected agreement between two categorical
    * raters (two annotators, a heuristic vs a gold label, two model
    * versions): the annotation-QA headline that raw accuracy overstates
    * whenever the label distribution is skewed.
    *
    * Rational form (the [[FeatureSelect]] discipline — no libm): with
    * observed-agreement count A = Σ_c n_cc and expected-agreement
    * numerator E = Σ_c row_c·col_c,
    *
    *   κ = (p_o − p_e) / (1 − p_e) = (N·A − E) / (N² − E)
    *
    * — every term an exact BIGINT, one final double division, so the
    * statistic is bit-identical cross-engine. Exact while N² ≤ 2⁶³
    * (~3·10⁹ rows per audit; sample beyond — annotation audits are
    * sampled anyway). Perfect chance agreement (N² = E, constant
    * raters) yields NULL.
    *
    * Scale shape: one hash aggregate keyed by the (a, b) pair —
    * |classes|² rows — then driver-free arithmetic over that tiny
    * contingency table; rows with a NULL rating on either side are
    * excluded (unrated items carry no agreement information).
    *
    * @return one row: (n, agree, expected_num, po, kappa)
    */
  def cohenKappa(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = df.select(a.as("__a"), b.as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
      .groupBy("__a", "__b").agg(count(lit(1)).as("__c"))
    val rows = cells.groupBy(col("__a").as("__k"))
      .agg(sum(col("__c")).as("__ra"))
    val cols = cells.groupBy(col("__b").as("__k"))
      .agg(sum(col("__c")).as("__rb"))
    val e = rows.join(cols, Seq("__k"), "inner")
      .agg(coalesce(sum(col("__ra") * col("__rb")), lit(0L)).as("expected_num"))
    val agg = cells.agg(
      sum(col("__c")).as("n"),
      coalesce(sum(when(col("__a") === col("__b"), col("__c"))), lit(0L))
        .as("agree"))
    agg.crossJoin(e).select(
      col("n"), col("agree"), col("expected_num"),
      (col("agree").cast("double") / col("n").cast("double")).as("po"),
      when(col("n") * col("n") =!= col("expected_num"),
        (col("n") * col("agree") - col("expected_num")).cast("double") /
          (col("n") * col("n") - col("expected_num")).cast("double"))
        .as("kappa"))
  }

  /** CONFIDENT-LEARNING joint estimation (Northcutt, Jiang & Chuang
    * 2021, "Confident Learning: Estimating Uncertainty in Dataset
    * Labels", JAIR): given each row's NOISY label and the model's
    * per-class confidence vector, estimate the joint distribution of
    * (noisy label, latent true label) — its off-diagonal is the label-
    * error estimate that decides which annotations to re-audit before
    * training on them.
    *
    * Per class j the threshold t_j is the MEAN self-confidence of rows
    * labeled j; a row's latent label y* is the argmax of its confidence
    * over classes it clears the threshold for (ties to the smallest
    * class index — deterministic), and rows clearing none are excluded
    * (the paper's rule: they carry no confident signal). Cell (i, j) of
    * the joint counts rows labeled i with y* = j.
    *
    * Exactness: confidences arrive as FIXED-POINT integers (q20 — the
    * [[Evaluation]] quantize-first discipline), so the threshold test
    * avoids division entirely: p_j ≥ sum_j / cnt_j is evaluated as
    * p_j · cnt_j ≥ sum_j in exact BIGINT cross-multiplication (the
    * [[Privacy]] t-closeness precedent). Overflow bound: p_j < 2^20
    * and cnt_j ≤ corpus rows, so products stay under 2^63 up to ~8·10¹²
    * rows per class.
    *
    * Scale shape: one k-row aggregate (sum/count of self-confidence per
    * labeled class) collapses to a ONE-ROW broadcast of two k-length
    * arrays; the per-row argmax is a bounded k-term row-local fold; one
    * final (noisy, est) hash-aggregate bounded by k². No windows, no
    * corpus-sized join sides.
    *
    * @param labelCol  integer noisy label in [0, numClasses)
    * @param probsCol  array<long> of q20 self-confidences, length
    *                  ≥ numClasses (element j+1 = class j)
    * @return one row per OBSERVED (noisy_label, est_label) cell:
    *         (noisy_label, est_label, n_rows, is_error = labels differ)
    */
  def confidentJoint(df: DataFrame, labelCol: String, probsCol: String,
                     numClasses: Int): DataFrame = {
    require(numClasses >= 2 && numClasses <= 64, "need 2 <= k <= 64")
    val self = df.select(col(labelCol).cast("int").as("__l"),
        col(probsCol).as("__p"))
      .filter(col("__l").isNotNull && col("__p").isNotNull)
      .withColumn("__sp", element_at(col("__p"), col("__l") + 1))
    val thr = self.groupBy("__l")
      .agg(sum(col("__sp")).as("__s"), count(lit(1)).as("__c"))
    // dense k-length threshold arrays (classes with no rows keep an
    // impossible sum so nothing clears them), one broadcastable row
    val thrRow = thr
      .agg(sort_array(collect_list(struct(col("__l"), col("__s"),
        col("__c")))).as("__t"))
      .select(
        transform(sequence(lit(0), lit(numClasses - 1)), j =>
          coalesce(try_element_at(
            map_from_entries(transform(col("__t"), e =>
              struct(e.getField("__l"), e.getField("__s")))), j),
            lit(Long.MaxValue))).as("__sums"),
        transform(sequence(lit(0), lit(numClasses - 1)), j =>
          coalesce(try_element_at(
            map_from_entries(transform(col("__t"), e =>
              struct(e.getField("__l"), e.getField("__c")))), j),
            lit(0L))).as("__cnts"))
    val cand = self.crossJoin(broadcast(thrRow))
      .withColumn("__best", array_max(filter(
        transform(sequence(lit(0), lit(numClasses - 1)), j =>
          when(element_at(col("__cnts"), j + 1) > 0L &&
            element_at(col("__p"), j + 1) *
              element_at(col("__cnts"), j + 1) >=
              element_at(col("__sums"), j + 1),
            struct(element_at(col("__p"), j + 1).as("p"),
              (-j).as("nj")))),
        x => x.isNotNull)))
      .filter(col("__best").isNotNull)
      .withColumn("__y", -col("__best.nj"))
    cand.groupBy(col("__l").as("noisy_label"), col("__y").as("est_label"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("is_error", col("noisy_label") =!= col("est_label"))
  }
}
