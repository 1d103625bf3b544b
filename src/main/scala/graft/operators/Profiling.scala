package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Data-profiling aggregates over full tables — the fixed-width histogram
  * a pipeline runs to understand a column's distribution (document
  * lengths, token counts, scores) before choosing filter thresholds.
  *
  * Scale shape: bucket assignment is a per-row projection (codegen'd
  * arithmetic, no lookup table), and the histogram is one hash aggregate
  * on the bucket id — map-side combine reduces every partition to at most
  * `maxBucket + 1` rows before the (tiny) shuffle.
  */
object Profiling {

  /** Fixed-width histogram of a non-negative numeric column: bucket
    * `floor(value / width)` clamped to `maxBucket` (the overflow bucket),
    * with per-bucket count and observed min/max. Empty buckets are
    * absent, matching a plain GROUP BY.
    */
  def histogram(df: DataFrame, value: Column, width: Long,
                maxBucket: Int): DataFrame = {
    require(width > 0, "width must be positive")
    require(maxBucket >= 0, "maxBucket must be non-negative")
    val bucket = least(lit(maxBucket.toLong), floor(value / width).cast(LongType))
    df.select(bucket.as("bucket"), value.as("__v"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min(col("__v")).as("min_v"),
        max(col("__v")).as("max_v"))
      .select(col("bucket"), (col("bucket") * width).as("lo"),
        col("n"), col("min_v"), col("max_v"))
  }

  /** Order-insensitive table fingerprint: `(n_rows, checksum)` where
    * checksum = Σ polyHash(md5(field₁ ␁ field₂ ␁ …)) as an exact
    * Decimal(38,0). Because the row digests are summed (commutative), the
    * checksum is independent of partitioning, task order, and row order —
    * two tables are (whp) equal as multisets iff their checksums match.
    * This is the verification step of every 100 TB migration: recompute on
    * both sides, compare two scalars instead of shipping either table.
    *
    * Map-side combine reduces each partition to one partial sum, so the
    * shuffle is one row per task. Columns are rendered with CAST-to-string
    * semantics; rows differing only in NULL placement of adjacent string
    * fields collide (concat_ws skips NULLs) — pass an explicit sentinel
    * via coalesce where that matters.
    */
  def tableChecksum(df: DataFrame, cols: Column*): DataFrame = {
    val digest = md5(concat_ws("\u0001", cols: _*).cast("binary"))
    df.select(TextAnalysis.polyHash(digest).as("__h"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__h").cast(DecimalType(38, 0))).as("checksum"))
  }

  /** Per-group distribution shape — mean, population variance, skewness
    * (g1) and EXCESS kurtosis (g2) — from exact BIGINT power sums, the
    * [[graft.operators.Regression]] discipline extended to third and
    * fourth moments: built-in `skewness`/`kurtosis` accumulate float
    * moments whose value depends on partition merge order; here the one
    * aggregate pass sums the y..y^4 power sums as exact integers
    * (map-side combinable, order-free) and every double appears in a
    * fixed mirrored tail. The only roots are `sqrt` (IEEE
    * correctly-rounded everywhere) — never `pow`, whose libm
    * implementations differ across engines.
    *
    * Degenerate groups (zero variance) yield NULL skewness/kurtosis.
    *
    * Overflow contract: |y|^4 * rows-per-group must stay under 2^63 —
    * |y| <= 10^3 holds to ~9e6 rows per group, |y| <= 50 to ~1.5e12.
    * Center/rescale y first when the domain is wider.
    *
    * @param yCol integer-valued LONG column
    * @return (groupCols..., n, mean, variance, skewness, kurtosis)
    */
  def momentsByGroup(df: DataFrame, groupCols: Seq[String], yCol: Column): DataFrame = {
    val stats = df.select(groupCols.map(col) :+ yCol.as("__y"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(momentSumAggs.head, momentSumAggs.tail: _*)
    stats.select(groupCols.map(col) ++ momentFinishCols: _*)
  }

  /** The five power-sum aggregate expressions (n, s1..s4) over an input
    * column `__y` — exposed so the STREAMING twin can attach them to a
    * windowed groupBy (the sums are plain LONG sums: map-side
    * combinable in batch, state-store mergeable in streaming — the same
    * property, which is why the twin is exact).
    */
  private[graft] def momentSumAggs: Seq[Column] = Seq(
    count(lit(1)).as("n"),
    sum(col("__y")).as("s1"),
    sum(col("__y") * col("__y")).as("s2"),
    sum(col("__y") * col("__y") * col("__y")).as("s3"),
    sum(col("__y") * col("__y") * col("__y") * col("__y")).as("s4"))

  /** The mirrored double tail finishing (n, s1..s4) into
    * (n, mean, variance, skewness, kurtosis) — fixed association, sqrt
    * never pow.
    */
  private[graft] def momentFinishCols: Seq[Column] = {
    val nD = col("n").cast("double")
    val (s1, s2, s3, s4) = (col("s1").cast("double"), col("s2").cast("double"),
      col("s3").cast("double"), col("s4").cast("double"))
    val mean = s1 / nD
    val m2 = s2 / nD - mean * mean
    val m3 = s3 / nD - lit(3.0) * mean * (s2 / nD) + lit(2.0) * mean * mean * mean
    val m4 = s4 / nD - lit(4.0) * mean * (s3 / nD) +
      lit(6.0) * mean * mean * (s2 / nD) - lit(3.0) * mean * mean * mean * mean
    Seq(col("n"),
      mean.as("mean"),
      m2.as("variance"),
      when(m2 =!= 0.0, m3 / (m2 * sqrt(m2))).as("skewness"),
      when(m2 =!= 0.0, m4 / (m2 * m2) - 3.0).as("kurtosis"))
  }

  /** One-row corpus datasheet — the "dataset card" headline numbers a
    * release ships with (Gebru et al., Datasheets for Datasets):
    * volume (docs/tokens/chars), diversity (distinct langs/sources),
    * hygiene (exact-dup docs, short docs, PII-bearing docs), and mean
    * length — ALL computed in one aggregate pass over one projection
    * (each per-doc signal is a scan-side expression; no joins, no
    * second scan; the only exact-distinct state is langs/sources/text
    * hashes, which Spark plans as two-phase distinct aggregates).
    *
    * The dup counter dedups on the text FINGERPRINT (polyHash), not the
    * text: the distinct-aggregate state then holds 8-byte hashes, never
    * document bodies — the difference between a metadata-sized report
    * and shuffling the corpus. mean_chars is one exactly-rounded
    * division of exact BIGINTs.
    *
    * @param lenChars per-doc character count expression — pass the
    *                 corpus's materialized length column (`n_chars`)
    *                 rather than `length(text)`: engines disagree on
    *                 astral-plane lengths (UTF-16 units vs codepoints),
    *                 and a datasheet must not depend on which engine
    *                 measured it.
    * @return one row: (n_docs, n_tokens, n_chars, n_langs, n_sources,
    *         exact_dup_docs, short_docs, pii_docs, mean_chars)
    */
  def datasheet(docs: DataFrame, textCol: String, langCol: String,
                sourceCol: String, lenChars: Column,
                shortBelowChars: Long = 120L): DataFrame = {
    val text = col(textCol)
    val perDoc = docs.select(
      text,
      col(langCol).as("__lang"), col(sourceCol).as("__source"),
      graft.operators.TextAnalysis.tokenCount(text).as("__ntok"),
      lenChars.cast(LongType).as("__nchr"),
      graft.operators.TextAnalysis.polyHash(text).as("__fp"),
      (graft.operators.TextAnalysis.emailCount(text) +
        graft.operators.TextAnalysis.ipv4Count(text) > 0).as("__pii"))
    perDoc.agg(
      count(lit(1)).as("n_docs"),
      sum("__ntok").cast(LongType).as("n_tokens"),
      sum("__nchr").cast(LongType).as("n_chars"),
      countDistinct(col("__lang")).as("n_langs"),
      countDistinct(col("__source")).as("n_sources"),
      (count(lit(1)) - countDistinct(col("__fp"))).as("exact_dup_docs"),
      count(when(col("__nchr") < shortBelowChars, 1L)).as("short_docs"),
      count(when(col("__pii"), 1L)).as("pii_docs"))
      .withColumn("mean_chars",
        when(col("n_docs") > 0,
          col("n_chars").cast("double") / col("n_docs").cast("double")))
  }

  /** Leave-one-out ablation report — the data-valuation baseline: for
    * each group (source, domain, crawl snapshot), how would the corpus
    * mean of an integer metric move if the group were REMOVED? Additive
    * metrics make the answer closed-form from per-group sums — no
    * retraining, no N re-scans: mean_without_g = (S − s_g)/(N − n_g)
    * from ONE aggregate pass over the corpus — so the report costs one
    * groupBy regardless of group count. This ranks sources by marginal
    * contribution (the first question of any mixture re-weighting),
    * which is why it belongs next to [[datasheet]] in the release kit.
    *
    * Exactness: sums and counts are exact BIGINTs; every emitted mean
    * is one exactly-rounded division — nothing float is ever aggregated.
    *
    * @param metric integer-valued per-row metric (a 0/1 gate bit, a
    *               token count) — additive, else LOO is not closed-form
    * @return per group: (groupCol, n_rows, metric_sum, mean_in,
    *         mean_overall, mean_without, delta) — delta = mean_overall −
    *         mean_without (> 0 ⇒ the group lifts the corpus metric);
    *         mean_without NULL for a group that IS the whole corpus
    */
  def leaveOneOutMeans(df: DataFrame, groupCol: String, metric: Column): DataFrame = {
    val per = df.select(col(groupCol), metric.cast(LongType).as("__m"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"), sum("__m").cast(LongType).as("metric_sum"))
    val tot = per.agg(sum("n_rows").cast(LongType).as("__N"),
      sum("metric_sum").cast(LongType).as("__S"))
    per.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_rows"), col("metric_sum"),
        (col("metric_sum").cast("double") / col("n_rows").cast("double"))
          .as("mean_in"),
        (col("__S").cast("double") / col("__N").cast("double"))
          .as("mean_overall"),
        when(col("__N") > col("n_rows"),
          (col("__S") - col("metric_sum")).cast("double") /
            (col("__N") - col("n_rows")).cast("double")).as("mean_without"))
      .withColumn("delta", col("mean_overall") - col("mean_without"))
  }

  /** Distribution drift between two slices of one table (yesterday's
    * snapshot vs today's batch, reference corpus vs candidate mix): the
    * categorical total-variation distance TVD = ½·Σ|p_b − q_b| over the
    * `binCol` histogram, plus per-bin shares and the exact integer
    * numerator |n_ref·M − n_batch·N| each bin contributes. The corpus-
    * monitoring gate: TVD is the fraction of probability mass that must
    * move to turn one mix into the other — alert when a new crawl batch
    * drifts from the blessed language/source/length profile.
    *
    * Exactness: the per-bin numerator is DECIMAL(38,0) integer
    * arithmetic (n·M products overflow BIGINT once both slices pass
    * ~3e9 rows — routine at corpus scale); doubles appear only as
    * single exactly-rounded casts/divisions in a fixed expression
    * order, so every emitted double is bit-reproducible cross-engine.
    * No float is ever aggregated: the TVD numerator is summed as
    * DECIMAL, divided once.
    *
    * Scale shape: ONE count-aggregate pass over the corpus keyed by
    * bin (conditional counts — the slice column never forces a second
    * scan), then arithmetic on |bins| rows; the totals row is a
    * broadcast cross join. NULL bins form a regular group.
    *
    * @param inRef boolean column: true → reference slice, false → batch
    * @return per bin: (binCol, n_ref, n_batch, share_ref, share_batch,
    *         tvd_num DECIMAL(38,0), tvd DOUBLE) — tvd constant across
    *         rows (the audit's headline), NULL if either slice is empty
    */
  def distributionDrift(df: DataFrame, binCol: String, inRef: Column): DataFrame = {
    val hist = df.groupBy(col(binCol))
      .agg(count(when(inRef, 1L)).as("n_ref"),
        count(when(!inRef, 1L)).as("n_batch"))
    val d38 = DecimalType(38, 0)
    val totals = hist.agg(
      sum("n_ref").cast(LongType).as("__N"),
      sum("n_batch").cast(LongType).as("__M"))
    val perBin = hist.crossJoin(broadcast(totals))
      .withColumn("tvd_num",
        abs(col("n_ref").cast(d38) * col("__M").cast(d38) -
          col("n_batch").cast(d38) * col("__N").cast(d38)).cast(d38))
    val tvdTotal = perBin.agg(sum("tvd_num").cast(d38).as("__num"),
      min("__N").as("__N"), min("__M").as("__M"))
      .withColumn("tvd",
        when(col("__N") > 0 && col("__M") > 0,
          col("__num").cast("double") /
            (lit(2.0) * col("__N").cast("double") * col("__M").cast("double"))))
      .select("tvd")
    perBin.crossJoin(broadcast(tvdTotal))
      .select(col(binCol),
        col("n_ref"), col("n_batch"),
        when(col("__N") > 0, col("n_ref").cast("double") / col("__N").cast("double"))
          .as("share_ref"),
        when(col("__M") > 0, col("n_batch").cast("double") / col("__M").cast("double"))
          .as("share_batch"),
        col("tvd_num"), col("tvd"))
  }

  /** Exact 1-D WASSERSTEIN-1 (earth-mover) drift of an integer-valued
    * column, each group vs the REST of the corpus — the
    * metric-aware complement to [[distributionDrift]]'s TVD and the
    * KS/AD tail gates: W₁ weighs HOW FAR mass moved, not just how much
    * (a +1-char length shift and a +1000-char shift have equal TVD but
    * 1000× different W₁), so it is the right alarm for "this source's
    * length/score profile slid" monitoring.
    *
    * Identity used: W₁ = ∫|F_g − F_rest| dx = Σ_k |F_g(x_k) −
    * F_rest(x_k)|·(x_{k+1} − x_k) over the merged support — and with
    * cross-multiplied integer CDFs, each term's numerator
    * |C_g·n_rest − C_rest·n_g|·Δ is EXACT integer arithmetic
    * (DECIMAL(38,0) — products overflow BIGINT at corpus scale, the
    * [[distributionDrift]] discipline). No float is ever aggregated;
    * the emitted `w1_q30` is one integral DECIMAL division quantized to
    * 2³⁰, and `w1` is that integer rescaled by an exact power of two.
    *
    * Scale shape: one hash-aggregate pass builds the (group, value)
    * histogram; the per-comparison work then runs on the BOUNDED
    * |groups|·|support| grid (distinct integer values — quantize a
    * continuous column first, e.g. `floor(score·100)`; `maxSupport`
    * ENFORCES this with a loud failure instead of a silent mega-grid),
    * whose CDF window partitions by group. The corpus is never re-scanned per
    * group: the complement's counts come from the global histogram by
    * subtraction.
    *
    * NULL groups and NULL values are excluded (a NULL length has no
    * position on the line).
    *
    * @return one row per group: (groupCol, n, w1_num_str, w1_den_str —
    *         exact decimal strings of Σ|·|·Δ and n_g·n_rest·1 —
    *         w1_q30 = ⌊2³⁰·num/den⌋ BIGINT, w1 = w1_q30/2³⁰ DOUBLE;
    *         quantized columns NULL when the complement is empty)
    */
  def wasserstein1PerGroup(df: DataFrame, groupCol: String,
                           value: Column, maxSupport: Int = 65536): DataFrame = {
    require(maxSupport >= 2, "need maxSupport >= 2")
    val d38 = DecimalType(38, 0)
    val base = df.filter(col(groupCol).isNotNull && value.isNotNull)
      .select(col(groupCol).as("__g"), value.cast(LongType).as("__x"))
    val hist = base.groupBy("__g", "__x").agg(count(lit(1)).as("__c"))
    val support = CacheScope.track(
      base.groupBy("__x").agg(count(lit(1)).as("__cx")))
    // ENFORCE the quantize-first contract (ADVICE r10: it lived only in
    // scaladoc): the |groups|·|support| grid and its per-group CDF
    // windows are bounded only if the merged support is. A raw
    // microsecond-timestamp column would silently build a corpus-sized
    // single-task window per group — fail loud instead (the
    // mostSpecificLookup / kendall bounded-domain discipline) and tell
    // the caller to quantize. One bounded count() job; the support
    // table is reused by the grid below.
    val nSupport = support.count()
    require(nSupport <= maxSupport,
      s"wasserstein1PerGroup: merged support has $nSupport distinct " +
        s"values (> maxSupport=$maxSupport); quantize the value first " +
        "(e.g. floor(x/width)) or raise maxSupport deliberately")
    val groups = base.groupBy("__g").agg(count(lit(1)).as("__ng"))
    val tot = groups.agg(sum("__ng").cast(LongType).as("__N"))
    val grid = groups.crossJoin(support)
      .join(hist, Seq("__g", "__x"), "left")
      .withColumn("__c", coalesce(col("__c"), lit(0L)))
    val w = Window.partitionBy("__g").orderBy("__x")
    val terms = grid
      .withColumn("__Cg", sum(col("__c")).over(w))
      .withColumn("__Cx", sum(col("__cx")).over(w))
      .withColumn("__gap", lead(col("__x"), 1).over(w) - col("__x"))
      .crossJoin(broadcast(tot))
      .filter(col("__gap").isNotNull)
      .withColumn("__term",
        (abs(col("__Cg").cast(d38) * (col("__N") - col("__ng")).cast(d38) -
          (col("__Cx") - col("__Cg")).cast(d38) * col("__ng").cast(d38)) *
          col("__gap").cast(d38)).cast(d38))
    val sums = terms.groupBy("__g")
      .agg(sum("__term").cast(d38).as("__num"))
    groups.crossJoin(broadcast(tot))
      .join(sums, Seq("__g"), "left")
      .select(col("__g").as(groupCol), col("__ng").as("n"),
        coalesce(col("__num"), lit(0L).cast(d38)).cast("string")
          .as("w1_num_str"),
        (col("__ng").cast(d38) * (col("__N") - col("__ng")).cast(d38))
          .cast(d38).cast("string").as("w1_den_str"),
        when(col("__N") > col("__ng"),
          org.apache.spark.sql.graftbridge.toColumn(
            new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
              org.apache.spark.sql.graftbridge.toExpression(
                (coalesce(col("__num"), lit(0L).cast(d38)) *
                  lit(1073741824L).cast(d38)).cast(d38)),
              org.apache.spark.sql.graftbridge.toExpression(
                (col("__ng").cast(d38) * (col("__N") - col("__ng")).cast(d38))
                  .cast(d38))))).as("w1_q30"))
      .withColumn("w1", col("w1_q30").cast("double") / lit(1073741824.0))
  }

  /** Per-shard column statistics — the file-skipping manifest a lakehouse
    * table format (Delta/Iceberg stats, parquet row-group metadata) keeps
    * per data file: min/max/null-count/NDV of a pruning column per shard.
    * At 100 TB the fastest scan is the one that never opens the file —
    * this manifest is what makes that decision; it is built in ONE hash
    * aggregate whose shuffle is |shards| rows of five scalars.
    *
    * @param shard pruning-unit id expression (file id, partition id,
    *              bucket — anything the storage layout groups rows by)
    * @param value the column predicates will be pruned on
    * @return (shard, n_rows, n_null, min_v, max_v, ndv) — min/max over
    *         non-NULL values, NULL for all-NULL shards; ndv exact
    */
  def shardStats(df: DataFrame, shard: Column, value: Column): DataFrame =
    df.select(shard.as("shard"), value.as("__v"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("__v").isNull, 1L)).as("n_null"),
        min(col("__v")).as("min_v"),
        max(col("__v")).as("max_v"),
        count_distinct(col("__v")).as("ndv"))

  /** Pruning simulation for `value BETWEEN lo AND hi` against a
    * [[shardStats]] manifest: which shards CANNOT contain a match
    * (max_v < lo, min_v > hi, or all-NULL) and what fraction of rows the
    * scan therefore skips. One row out; the per-shard verdict column is
    * the plan a scan scheduler would execute.
    *
    * The verdict is conservative exactly like real zone maps: a
    * "scanned" shard may still contain zero matches — the simulation
    * reports the I/O bound, not the selectivity.
    */
  def pruneSimulation(stats: DataFrame, lo: Column, hi: Column): DataFrame = {
    val prunable = col("max_v") < lo || col("min_v") > hi ||
      col("min_v").isNull
    stats
      .withColumn("__pruned", when(prunable, 1L).otherwise(0L))
      .agg(count(lit(1)).as("n_shards"),
        sum(col("__pruned")).as("n_pruned"),
        sum(when(col("__pruned") === 1L, col("n_rows")).otherwise(0L))
          .as("rows_skipped"),
        sum(col("n_rows")).as("rows_total"))
      .select(col("n_shards"), col("n_pruned"),
        (col("n_shards") - col("n_pruned")).as("n_scanned"),
        col("rows_skipped"), col("rows_total"),
        (col("rows_skipped").cast("double") /
          col("rows_total").cast("double")).as("skip_ratio"))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic — the
    * distribution-shift test that complements [[distributionDrift]]'s
    * categorical TVD for NUMERIC columns (did the gate bias document
    * lengths? did this month's scores drift?):
    *
    *   KS = max over values v of |F_ref(v) − F_cur(v)|
    *      = ks_num / ks_den   with
    *   ks_num = max |cum_ref(v)·n_cur − cum_cur(v)·n_ref|,
    *   ks_den = n_ref·n_cur
    *
    * — cross-multiplied exact BIGINTs (the QuantileNormalize
    * discipline), so the statistic is a ratio of integers with ONE
    * final division. One value histogram with both sides' counts, two
    * cumulation windows over histogram rows (distinct values, never
    * data rows), one max aggregate. Overflow: cum·n ≤ n_ref·n_cur <
    * 2⁶³ ⇒ fine to ~3e9 rows per side.
    *
    * @param inRef boolean Column splitting rows into reference (true)
    *              and current (false)
    * @return one row: (n_ref, n_cur, ks_num, ks_den, ks) — NULL ks when
    *         either side is empty
    */
  def ksStatistic(df: DataFrame, value: Column, inRef: Column): DataFrame = {
    val hist = df
      .filter(value.isNotNull && inRef.isNotNull)
      .select(value.as("__v"), inRef.as("__r"))
      .groupBy("__v")
      .agg(count(when(col("__r"), 1L)).as("__cr"),
        count(when(!col("__r"), 1L)).as("__cc"))
    val wCum = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    hist
      .withColumn("__cumr", sum(col("__cr")).over(wCum))
      .withColumn("__cumc", sum(col("__cc")).over(wCum))
      .withColumn("__nr", sum(col("__cr")).over(wAll))
      .withColumn("__nc", sum(col("__cc")).over(wAll))
      .agg(min(col("__nr")).as("n_ref"), min(col("__nc")).as("n_cur"),
        max(abs(col("__cumr") * col("__nc") - col("__cumc") * col("__nr")))
          .as("ks_num"))
      .withColumn("ks_den", col("n_ref") * col("n_cur"))
      .select(col("n_ref"), col("n_cur"), col("ks_num"), col("ks_den"),
        when(col("ks_den") > 0,
          col("ks_num").cast("double") / col("ks_den").cast("double"))
          .as("ks"))
  }

  /** Tail-weighted two-sample EDF statistic (the grouped/discrete
    * ANDERSON–DARLING form): where [[ksStatistic]] takes the MAX CDF
    * gap — blind to tails, where both CDFs approach 0/1 — this sums the
    * squared gaps with weight 1/(H(1−H)) over the pooled CDF H, which
    * blows up exactly in the tails. The drift test to run when the
    * tails are the point (length cutoffs, score extremes): two
    * distributions can pass KS and fail here on tail mass alone.
    *
    *   A² = Σ_j (N·M_j − n·B_j)² · ℓ_j / (n·m·B_j·(N−B_j))
    *
    * over distinct pooled values j (ℓ = pooled count, B = pooled
    * cumulative, M = reference cumulative; the last block, B = N, has
    * zero gap and is skipped as the textbook form does). Per-block
    * terms are fixed-shape double arithmetic on exact BIGINTs,
    * quantized to ⌊term·2²⁰⌋ before the cross-block sum (the χ²
    * discipline) — order-free and engine-portable. Uncorrected form
    * (no (N−1)/N factor); compare thresholds accordingly.
    *
    * @return one row: (n_ref, n_cur, a2_fp, a2)
    */
  def adStatistic(df: DataFrame, value: Column, inRef: Column): DataFrame = {
    val hist = df
      .filter(value.isNotNull && inRef.isNotNull)
      .select(value.as("__v"), inRef.as("__r"))
      .groupBy("__v")
      .agg(count(when(col("__r"), 1L)).as("__cr"),
        count(when(!col("__r"), 1L)).as("__cc"))
    val wCum = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy() // distinct-value histogram rows
    val gapD = (col("__nn") * col("__m") - col("__nr") * col("__b"))
      .cast("double")
    val termD = gapD * gapD * col("__l").cast("double") /
      (col("__nr").cast("double") * col("__ncur").cast("double") *
        col("__b").cast("double") * (col("__nn") - col("__b")).cast("double"))
    hist
      .withColumn("__m", sum(col("__cr")).over(wCum))
      .withColumn("__bc", sum(col("__cc")).over(wCum))
      .withColumn("__nr", sum(col("__cr")).over(wAll))
      .withColumn("__ncur", sum(col("__cc")).over(wAll))
      .withColumn("__l", col("__cr") + col("__cc"))
      .withColumn("__b", col("__m") + col("__bc"))
      .withColumn("__nn", col("__nr") + col("__ncur"))
      .withColumn("__term_fp",
        when(col("__b") < col("__nn") && col("__nr") > 0L &&
          col("__ncur") > 0L,
          floor(termD * lit(1048576.0)).cast("long")).otherwise(lit(0L)))
      .agg(min(col("__nr")).as("n_ref"), min(col("__ncur")).as("n_cur"),
        sum(col("__term_fp")).as("a2_fp"))
      .withColumn("a2",
        when(col("n_ref") > 0L && col("n_cur") > 0L,
          col("a2_fp").cast("double") / lit(1048576.0)))
  }

  /** Merkle manifest over a sharded table: per-shard [[tableChecksum]]
    * leaves, hashed pairwise up to a single root — the provenance
    * artifact a release publishes so a consumer can verify ANY shard (or
    * the whole snapshot) against the root without re-reading the rest.
    * Extends the flat q67 checksum with locatability: a mismatch walks
    * down the tree to the one bad shard in log(shards) digest
    * comparisons instead of re-checksumming the table.
    *
    * Scale shape: one corpus pass for the leaves (the same map-side-
    * combined digest sum as [[tableChecksum]], shuffled by shard id —
    * `nShards` rows out); every tree level above is an aggregate over
    * the previous level's rows, so the whole tree costs log₂(nShards)
    * tiny jobs over ≤ nShards rows. Empty shards get the digest of the
    * "0" checksum, so the root is a function of the FULL shard range —
    * manifest shapes stay comparable across snapshots.
    *
    * Digest chain (portable arithmetic only): leaf digest =
    * polyHash(md5(checksum mod 10¹⁵ as string)); parent digest =
    * polyHash(md5(leftDigest ‖ '|' ‖ rightDigest)). n_rows sums up the
    * tree, so each node also carries its subtree's row count.
    *
    * @param shard long shard id in [0, nShards); nShards a power of two
    * @return (level, idx, n_rows, digest) — level 0 = leaves,
    *         level log₂(nShards) row = the root
    */
  def merkleManifest(df: DataFrame, shard: Column, nShards: Int,
                     cols: Column*): DataFrame = {
    require(nShards > 0 && (nShards & (nShards - 1)) == 0,
      "nShards must be a power of two")
    val spark = df.sparkSession
    val rowDigest = md5(concat_ws("\u0001", cols: _*).cast("binary"))
    val leavesRaw = df
      .select(shard.cast(LongType).as("idx"),
        TextAnalysis.polyHash(rowDigest).as("__h"))
      .groupBy("idx")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__h").cast(DecimalType(38, 0))).as("__sum"))
    // CACHED: the union below materializes every tree level, and each
    // level's lineage starts here — without the cache the CORPUS pass
    // behind leavesRaw re-runs once per level (log₂(nShards)+1 scans;
    // measured as q195's 2×+ wall inflation in rounds 14–15). The
    // cached frame is nShards tiny rows; levels above re-derive from
    // it for pennies.
    var cur = spark.range(nShards).select(col("id").as("idx"))
      .join(leavesRaw, Seq("idx"), "left")
      .select(col("idx"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        TextAnalysis.polyHash(md5(
          coalesce((col("__sum") % lit(1000000000000000L)).cast(LongType),
            lit(0L)).cast("string").cast("binary"))).as("digest"))
      .transform(CacheScope.track)
    val levels = scala.collection.mutable.Buffer(
      cur.withColumn("level", lit(0)))
    var size = nShards
    while (size > 1) {
      cur = cur
        .groupBy(expr("CAST(idx DIV 2 AS BIGINT)").as("pidx"))
        .agg(sum("n_rows").as("n_rows"),
          max(when(col("idx") % 2 === 0, col("digest"))).as("__l"),
          max(when(col("idx") % 2 === 1, col("digest"))).as("__r"))
        .select(col("pidx").as("idx"), col("n_rows"),
          TextAnalysis.polyHash(md5(
            concat_ws("|", col("__l").cast("string"),
              col("__r").cast("string")).cast("binary"))).as("digest"))
      size /= 2
      levels += cur.withColumn("level", lit(levels.size))
    }
    levels.reduce(_ unionByName _)
      .select(col("level"), col("idx"), col("n_rows"), col("digest"))
  }

  /** Pearson χ² homogeneity cells for two categorical columns — "is the
    * `colB` mix the same across `colA` groups?" (lang mix per source,
    * label mix per shard…). Emits one row per (a, b) cell of the FULL
    * margin cross product — including observed-zero cells, which carry
    * χ² mass and vanish from a plain GROUP BY — with the exact BIGINT
    * ingredients and the per-cell contribution
    *
    *   contrib = d² / (N·rt·ct)   where d = o·N − rt·ct  (exact BIGINT)
    *
    * so the statistic is Σ contrib over the returned rows. No global
    * float sum is taken here: per-cell doubles are deterministic (one
    * squared difference, one division), and the caller sums the
    * driver-small cell table in whatever exactness it needs — this is
    * the [[distributionDrift]] discipline applied to the χ² test.
    *
    * Scale shape: one count aggregate over the corpus (cells), two
    * margin aggregates OVER THE CELL TABLE (not the corpus), and a
    * broadcast-sized cross join of the margins — everything after the
    * first aggregate is bounded by category cardinality. Overflow
    * contract: |d| ≤ N·max(rt,ct) and d² must stay under 2^63 ⇒ N below
    * ~3e9 rows; beyond that, pre-aggregate per category upstream (the
    * cells, not the rows, are the statistic's sufficient input).
    *
    * NULL categories are excluded (ANSI GROUP BY would keep them as a
    * real level; a missing-ness test should impute an explicit sentinel
    * first).
    */
  def chiSquaredCells(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA), col(colB))
      .agg(count(lit(1)).as("o"))
    val rowTot = cells.groupBy(col(colA)).agg(sum("o").as("rt"))
    val colTot = cells.groupBy(col(colB)).agg(sum("o").as("ct"))
    val n = cells.agg(sum("o").as("n"))
    rowTot.crossJoin(n).crossJoin(colTot)
      .join(cells, Seq(colA, colB), "left")
      .select(col(colA), col(colB),
        coalesce(col("o"), lit(0L)).as("o"),
        col("rt"), col("ct"), col("n"))
      .withColumn("d", col("o") * col("n") - col("rt") * col("ct"))
      .withColumn("contrib",
        (col("d").cast("double") * col("d").cast("double")) /
          (col("n").cast("double") * col("rt").cast("double") *
            col("ct").cast("double")))
  }

  /** One-row CRAMÉR'S V on top of [[chiSquaredCells]] — the normalized
    * association strength (0..1) between two categoricals:
    * V = √(χ²/N / min(r−1, c−1)). The χ² sum crosses cells with
    * DIFFERENT denominators, so a plain double sum would be
    * partition-order-dependent; each cell's contrib is quantized to 2³⁰
    * fixed point first (the q189 averagePrecision discipline) and summed
    * as exact BIGINT — bias ≤ cells·2⁻³⁰, far below any reading of an
    * association score. `sqrt` is IEEE correctly-rounded everywhere.
    * NULL when either variable has a single level.
    *
    * @return (n, r, c, chi2_fp, chi2, v)
    */
  def cramersV(df: DataFrame, colA: String, colB: String): DataFrame = {
    val Scale = 1L << 30
    chiSquaredCells(df, colA, colB)
      .agg(min(col("n")).as("n"),
        countDistinct(col(colA)).as("r"),
        countDistinct(col(colB)).as("c"),
        sum(floor(col("contrib") * Scale).cast("long")).as("chi2_fp"))
      .withColumn("chi2", col("chi2_fp").cast("double") / Scale)
      .withColumn("v",
        when(least(col("r") - 1, col("c") - 1) > 0,
          sqrt((col("chi2") / col("n").cast("double")) /
            least(col("r") - 1, col("c") - 1).cast("double"))))
  }

  /** Per-COLUMN long-format profile — the Deequ/TFDV "dataset statistics"
    * table: for each named column, row count, NULL count, exact distinct
    * count (NULLs excluded), the mode's frequency, completeness and a
    * uniqueness flag (every non-NULL value occurs once). One row per
    * profiled column, so schema drift between two snapshots is a tiny
    * join of two profile tables.
    *
    * Scale shape: ONE pass over the facts `stack`s the profiled columns
    * to (column, value) rows — a |cols|× row expansion that stays inside
    * whole-stage codegen — then a (column, value) hash aggregate whose
    * map-side combine caps each task's output at the distinct-cell count,
    * and a final |cols|-bounded aggregate over the histogram. This beats
    * |cols| separate `count(DISTINCT …)` aggregates (one Expand pass each
    * or an Expand ×|cols| multiplication WITHOUT the combine-friendly
    * histogram in between) and never funnels raw rows to one task.
    *
    * Values are compared through their CAST-to-STRING image (one stack
    * column must hold every type); Spark's shortest-roundtrip rendering
    * is injective per type with one caveat — `-0.0` and `0.0` render
    * distinctly while SQL DISTINCT merges them. Profile columns with
    * signed-zero mass through an explicit normalization first.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val stackArgs = cols.map(c => s"'$c', CAST(`$c` AS STRING)").mkString(", ")
    val hist = df
      .selectExpr(s"stack(${cols.length}, $stackArgs) AS (`column`, __v)")
      .groupBy(col("column"), col("__v"))
      .agg(count(lit(1)).as("__c"))
    hist.groupBy(col("column"))
      .agg(
        sum(col("__c")).as("n_rows"),
        coalesce(sum(when(col("__v").isNull, col("__c"))), lit(0L))
          .as("n_nulls"),
        count(when(col("__v").isNotNull, lit(1))).as("n_distinct"),
        coalesce(max(when(col("__v").isNotNull, col("__c"))), lit(0L))
          .as("max_freq"))
      .withColumn("completeness",
        (col("n_rows") - col("n_nulls")).cast("double") /
          col("n_rows").cast("double"))
      .withColumn("is_unique",
        col("n_distinct") > 0 && col("max_freq") <= 1)
  }

  /** Per-group label diversity from the exact (group, label) histogram:
    * class count, Simpson concentration numerator Σc², Gini impurity
    * 1 − Σc²/n² and the inverse-Simpson "effective number of classes"
    * n²/Σc² — the datasheet's answer to "how mixed is each source's
    * language column", in exact integers plus two final divisions (no
    * entropy, no libm log). NULL labels are a real level (a source that
    * is 90% unlabeled is not diverse). Two bounded aggregates: the
    * histogram's map-side combine absorbs the corpus, everything after is
    * |group × label| rows.
    *
    * Overflow contract: Σc² ≤ n² must stay under 2^63 ⇒ n per group below
    * ~3e9 rows; pre-shard larger groups or lift to Decimal upstream.
    */
  def diversityByGroup(df: DataFrame, groupCol: String,
                       labelCol: String): DataFrame =
    df.groupBy(col(groupCol), col(labelCol))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(groupCol))
      .agg(sum("__c").as("n"),
        count(lit(1)).as("n_classes"),
        sum(col("__c") * col("__c")).as("simpson_num"))
      .withColumn("gini",
        lit(1.0) - col("simpson_num").cast("double") /
          (col("n") * col("n")).cast("double"))
      .withColumn("inv_simpson",
        (col("n") * col("n")).cast("double") /
          col("simpson_num").cast("double"))

  /** Per-group GINI COEFFICIENT (Lorenz-curve inequality, 0 = all rows
    * equal mass, →1 = one row holds everything) of a non-negative
    * integral measure — "is this source's token mass spread across its
    * documents or concentrated in a few giants?", the concentration
    * audit a mixing/budgeting stage reads next to [[diversityByGroup]]
    * (whose `gini` is the unrelated Gini-SIMPSON class impurity).
    *
    * Exact via the sorted-rank identity G = (2·Σᵢ i·xᵢ − (n+1)·Σxᵢ) /
    * (n·Σxᵢ) with ascending 1-based ranks — computed WITHOUT ranking
    * any row: per (group, value) histogram cells contribute
    * Σ_{run} i·x = x·(c·cum₋ + c(c+1)/2) for a run of c copies of x
    * starting after cum₋ predecessors (tie-invariant: equal values
    * commute), so the only window runs over histogram rows, the
    * [[graft.operators.ExactQuantiles]] discipline. BIGINT throughout
    * + one final division. Overflow: needs n²·max(x) < 2⁶³ per group —
    * ~10⁶ rows at million-scale values; bin or sample beyond.
    *
    * NULL and negative values are dropped (the Lorenz curve is defined
    * on non-negative mass); all-zero groups yield NULL gini.
    *
    * @return (group, n, total, rank_sum, gini)
    */
  def lorenzGiniByGroup(df: DataFrame, groupCol: String,
                        value: Column): DataFrame = {
    val base = df.select(col(groupCol).as("__g"), value.cast("long").as("__v"))
      .filter(col("__v").isNotNull && col("__v") >= 0L)
    val w = Window.partitionBy("__g").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, -1)
    base.groupBy("__g", "__v").agg(count(lit(1)).as("__c"))
      .withColumn("__cum0", coalesce(sum(col("__c")).over(w), lit(0L)))
      .groupBy(col("__g").as(groupCol))
      .agg(sum(col("__c")).as("n"),
        sum(col("__v") * col("__c")).as("total"),
        // integer DIV, not Column./ (double) — c(c+1) is even, so exact
        sum(col("__v") * (col("__c") * col("__cum0") +
          expr("__c * (__c + 1) DIV 2"))).as("rank_sum"))
      .withColumn("gini",
        when(col("total") > 0L,
          (lit(2L) * col("rank_sum") - (col("n") + 1L) * col("total"))
            .cast("double") / (col("n") * col("total")).cast("double")))
  }

  /** BENFORD first-digit audit of a positive integral measure —
    * fabricated or synthetically-generated numeric columns rarely match
    * the log-scale digit law that organically-grown magnitudes follow,
    * so the per-digit deviation (and the χ² against Benford expectation)
    * is a cheap data-forensics read on any money/size/count column.
    *
    * The leading digit comes from the BIGINT's decimal string (integer
    * formatting is engine-identical; no float log10 anywhere). Expected
    * shares are the 9 literal doubles log₁₀(1+1/d) — constants, same
    * bits in any engine. Each digit's χ² term (o−e·n)²/(e·n) is
    * quantized to ⌊term·2³⁰⌋ before the 9-row total so the sum is
    * order-free BIGINT arithmetic. Zero/negative/NULL values are
    * excluded (no leading digit); absent digits report observed = 0.
    *
    * @return 9 rows: (digit, observed, n, obs_p, expected_p, term_fp,
    *         chi2_fp, chi2) — chi2 columns are the table-level total,
    *         repeated per row for single-result convenience
    */
  def benfordAudit(df: DataFrame, value: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val expected = Seq(
      1 -> 0.3010299956639812, 2 -> 0.17609125905568124,
      3 -> 0.12493873660829992, 4 -> 0.09691001300805642,
      5 -> 0.07918124604762482, 6 -> 0.06694678963061322,
      7 -> 0.05799194697768673, 8 -> 0.05115252244738129,
      9 -> 0.04575749056067514).toDF("digit", "expected_p")
    val counts = df.select(value.cast("long").as("__v"))
      .filter(col("__v").isNotNull && col("__v") > 0L)
      .withColumn("digit",
        substring(col("__v").cast("string"), 1, 1).cast("int"))
      .groupBy("digit").agg(count(lit(1)).as("observed"))
    val wAll = Window.partitionBy() // 9 digit rows
    broadcast(expected).join(counts, Seq("digit"), "left")
      .withColumn("observed", coalesce(col("observed"), lit(0L)))
      .withColumn("n", sum(col("observed")).over(wAll))
      .withColumn("term_fp",
        floor(((col("observed").cast("double") -
          col("expected_p") * col("n").cast("double")) *
          (col("observed").cast("double") -
            col("expected_p") * col("n").cast("double")) /
          (col("expected_p") * col("n").cast("double"))) *
          lit(1073741824.0)).cast("long"))
      .withColumn("chi2_fp", sum(col("term_fp")).over(wAll))
      .select(col("digit"), col("observed"), col("n"),
        (col("observed").cast("double") / col("n").cast("double"))
          .as("obs_p"),
        col("expected_p"), col("term_fp"), col("chi2_fp"),
        (col("chi2_fp").cast("double") / lit(1073741824.0)).as("chi2"))
  }

  /** WILSON score interval for a per-group proportion — the binomial
    * confidence interval that behaves at small n and extreme p̂ where
    * the naive normal interval collapses (p̂ ± z√(p̂q̂/n) goes negative
    * or past 1; Wilson never does). The honest error bars for any
    * keep-rate / defect-rate table: a 3-of-4 group and a 750-of-1000
    * group both show 75%, and only the interval says which one you can
    * trust.
    *
    *   center = (p̂ + z²/2n) / (1 + z²/n),
    *   half   = z·√(p̂q̂/n + z²/4n²) / (1 + z²/n)
    *
    * Exactness: n and k are BIGINT; the interval arithmetic is
    * fixed-shape doubles on those exact integers with z as a plan
    * literal — engine-portable like every χ² tail here. Zero-count
    * groups report NULL bounds.
    *
    * @param z normal quantile literal (1.96 ≈ 95%)
    * @return per group: (group, n, k, p_hat, wilson_lo, wilson_hi)
    */
  def wilsonIntervalByGroup(df: DataFrame, groupCol: String,
                            success: Column,
                            z: Double = 1.96): DataFrame = {
    val nD = col("n").cast("double")
    val p = col("k").cast("double") / nD
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / nD
    val center = (p + z2 / (lit(2.0) * nD)) / denom
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / nD +
      z2 / (lit(4.0) * nD * nD))) / denom
    df.select(col(groupCol).as("group"), success.cast("boolean").as("__s"))
      .filter(col("__s").isNotNull)
      .groupBy("group")
      .agg(count(lit(1)).as("n"), count(when(col("__s"), 1L)).as("k"))
      .select(col("group"), col("n"), col("k"),
        when(col("n") > 0L, p).as("p_hat"),
        // clamped: the bounds hold mathematically but floating rounding
        // can stray one ulp outside [0,1] at extreme p̂
        when(col("n") > 0L, greatest(lit(0.0), center - half))
          .as("wilson_lo"),
        when(col("n") > 0L, least(lit(1.0), center + half))
          .as("wilson_hi"))
  }

  /** JAIN's fairness index of per-group mass: J = (Σx)²/(n·Σx²) ∈
    * (1/n, 1] — 1 when every group holds equal mass, 1/n when one group
    * holds everything; the single-number "is this mix balanced" read
    * (shard sizes, source shares) that, unlike [[lorenzGiniByGroup]],
    * needs no ordering at all. Exact BIGINT sums, one division.
    *
    * @return one row: (n_groups, total, sum_sq, jain)
    */
  def jainFairness(df: DataFrame, groupCol: String): DataFrame =
    df.select(col(groupCol).as("__g")).filter(col("__g").isNotNull)
      .groupBy("__g").agg(count(lit(1)).as("__x"))
      .agg(count(lit(1)).as("n_groups"), sum(col("__x")).as("total"),
        sum(col("__x") * col("__x")).as("sum_sq"))
      .withColumn("jain",
        when(col("sum_sq") > 0L,
          (col("total") * col("total")).cast("double") /
            (col("n_groups") * col("sum_sq")).cast("double")))

  /** SAMPLE-RATIO-MISMATCH audit ([[benfordAudit]]'s machinery with
    * caller-declared expected shares): observed label counts vs the
    * shares an assignment procedure PROMISED (an 80/10/10 split, a 50/50
    * experiment) — the first check every A/B analysis runs, because a
    * mismatched ratio means the assignment itself is broken and every
    * downstream metric is garbage. χ² terms quantized to 2³⁰ before the
    * |labels|-row total (order-free BIGINT); labels absent from the data
    * report observed = 0, labels absent from `expected` are excluded
    * (they were never promised a share — audit them separately as
    * unexpected-label mass).
    *
    * @param expected (label, share) literals, shares summing to ~1
    * @return one row per expected label: (label, observed, n, obs_p,
    *         expected_p, term_fp, chi2_fp, chi2)
    */
  def ratioMismatchAudit(df: DataFrame, labelCol: String,
                         expected: Seq[(String, Double)]): DataFrame = {
    require(expected.nonEmpty, "need at least one expected share")
    val spark = df.sparkSession
    import spark.implicits._
    val exp = expected.toDF("label", "expected_p")
    val counts = df.select(col(labelCol).as("label"))
      .filter(col("label").isNotNull)
      .groupBy("label").agg(count(lit(1)).as("observed"))
    val wAll = Window.partitionBy() // |expected| rows
    broadcast(exp).join(counts, Seq("label"), "left")
      .withColumn("observed", coalesce(col("observed"), lit(0L)))
      .withColumn("n", sum(col("observed")).over(wAll))
      .withColumn("term_fp",
        floor(((col("observed").cast("double") -
          col("expected_p") * col("n").cast("double")) *
          (col("observed").cast("double") -
            col("expected_p") * col("n").cast("double")) /
          (col("expected_p") * col("n").cast("double"))) *
          lit(1073741824.0)).cast("long"))
      .withColumn("chi2_fp", sum(col("term_fp")).over(wAll))
      .select(col("label"), col("observed"), col("n"),
        (col("observed").cast("double") / col("n").cast("double"))
          .as("obs_p"),
        col("expected_p"), col("term_fp"), col("chi2_fp"),
        (col("chi2_fp").cast("double") / lit(1073741824.0)).as("chi2"))
  }

  /** One-way ANOVA of an integral measure across groups: how much of
    * the column's variance the grouping explains (η² = SSB/SST) and the
    * F statistic — "does source actually matter for document length, or
    * is the between-source difference noise?". The variance-decomposition
    * sibling of [[Regression.corrByGroup]] for a CATEGORICAL regressor.
    *
    * One combinable aggregate collects per-group (n_g, Σv, Σv²) exactly
    * in BIGINT; each group's Σ²/n term (the one unavoidable division)
    * is quantized to ⌊term·2¹⁰⌋ so the cross-group total stays
    * order-free BIGINT (quantization bias ≤ groups/2¹⁰ — far below any
    * F threshold). Final SSB/SSW/η²/F are fixed-shape double arithmetic
    * on exact integers. NULL values drop; NULL F when a variance side
    * is degenerate (k < 2 or n ≤ k). Overflow: Σv² needs n·max(v)² <
    * 2⁶³ — bin or rescale beyond ~10⁶-scale values.
    *
    * @return one row: (k, n, ssb, ssw, eta2, f)
    */
  def anovaByGroup(df: DataFrame, groupCol: String,
                   value: Column): DataFrame = {
    val Scale = 1024.0
    val g = df.select(col(groupCol).as("__g"), value.cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy("__g")
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"),
        sum(col("__v") * col("__v")).as("__q"))
      .withColumn("__sbfp",
        floor(col("__s").cast("double") * col("__s").cast("double") /
          col("__n").cast("double") * lit(Scale)).cast("long"))
      .agg(count(lit(1)).as("k"), sum(col("__n")).as("n"),
        sum(col("__s")).as("__S"), sum(col("__q")).as("__Q"),
        sum(col("__sbfp")).as("__SBF"))
    val grand = col("__S").cast("double") * col("__S").cast("double") /
      col("n").cast("double")
    val ssb = col("__SBF").cast("double") / lit(Scale) - grand
    val ssw = col("__Q").cast("double") - col("__SBF").cast("double") / lit(Scale)
    val sst = col("__Q").cast("double") - grand
    g.select(col("k"), col("n"), ssb.as("ssb"), ssw.as("ssw"),
      when(sst > 0.0, ssb / sst).as("eta2"),
      when(col("k") > 1L && col("n") > col("k") && ssw > 0.0,
        (ssb / (col("k") - 1L).cast("double")) /
          (ssw / (col("n") - col("k")).cast("double"))).as("f"))
  }

  /** Per-group PEARSON correlation of two integer-valued columns —
    * exact to the last fixed-point digit: with caller-quantized
    * integers the correlation is
    * `r = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²)·√(n·Σy² − (Σy)²))` —
    * numerator and both radicands exact BIGINTs (ANSI overflow is the
    * loud precondition), two correctly rounded IEEE sqrts, one
    * multiply, one division, one exact 2²⁰ exponent shift, floor —
    * every step deterministic cross-engine (the GRPO-advantage sqrt
    * discipline; √(Dx·Dy) is deliberately computed as √Dx·√Dy so
    * neither engine needs the >2⁶³ product). The LINEAR drift/bias
    * audit: reward-vs-length verbosity bias in an RM, score-vs-time
    * drift — χ²/KS/TVD siblings see distribution change, correlation
    * sees the monotone trend direction.
    *
    * Zero variance on either side (includes singleton groups) → NULL.
    * One map-side-combinable moment aggregate per group; no windows.
    *
    * @return one row per group: (groupCol, n, r_q20, r)
    */
  def pearsonByGroup(df: DataFrame, groupCol: String,
                     x: Column, y: Column): DataFrame = {
    val Q = 1048576L
    val base = df.select(col(groupCol).as("__g"),
        x.cast(LongType).as("__x"), y.cast(LongType).as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val m = base.groupBy("__g").agg(count(lit(1)).as("n"),
      sum("__x").as("__sx"), sum("__y").as("__sy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__y") * col("__y")).as("__syy"),
      sum(col("__x") * col("__y")).as("__sxy"))
    m.withColumn("__num",
        col("n") * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__dx",
        col("n") * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("__dy",
        col("n") * col("__syy") - col("__sy") * col("__sy"))
      .withColumn("r_q20", when(col("__dx") > 0L && col("__dy") > 0L,
        floor(col("__num").cast("double") /
          (sqrt(col("__dx").cast("double")) *
            sqrt(col("__dy").cast("double"))) * Q.toDouble)))
      .withColumn("r", col("r_q20").cast("double") / Q)
      .select(col("__g").as(groupCol), col("n"), col("r_q20"), col("r"))
  }

  /** Per-group SPEARMAN rank correlation — [[pearsonByGroup]] over
    * DOUBLED MIDRANKS: with ties, the midrank is (rank_min +
    * rank_max)/2, so 2·midrank = 2·rank() + count(=v) − 1 is an exact
    * integer, and Pearson is invariant under the positive affine map —
    * the doubled ranks give EXACTLY the tie-corrected Spearman ρ with
    * no rational rank arithmetic anywhere. The monotone (not merely
    * linear) association audit.
    *
    * Shape: four windows sharing the group partition key (rank + tie
    * count per side), then [[pearsonByGroup]]'s one moment aggregate.
    * Rank magnitudes are ≤ 2n, so the moment bound is the n⁵ < 2⁶³
    * loud-overflow contract — cap or pre-aggregate groups beyond ~50M
    * rows.
    *
    * @return one row per group: (groupCol, n, rho_q20, rho)
    */
  def spearmanByGroup(df: DataFrame, groupCol: String,
                      x: Column, y: Column): DataFrame = {
    val base = df.select(col(groupCol).as("__g"),
        x.cast(LongType).as("__x"), y.cast(LongType).as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    def mr2(c: String): Column =
      lit(2L) * rank().over(Window.partitionBy("__g").orderBy(col(c))) +
        count(lit(1)).over(Window.partitionBy("__g", c)) - lit(1L)
    val ranked = base
      .withColumn("__rx", mr2("__x"))
      .withColumn("__ry", mr2("__y"))
    pearsonByGroup(ranked, "__g", col("__rx"), col("__ry"))
      .select(col("__g").as(groupCol), col("n"),
        col("r_q20").as("rho_q20"), col("r").as("rho"))
  }
}
