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

  /** Theta-sketch-style SET ALGEBRA on KMV sketches (Dasgupta et al.,
    * "Theta Sketch Framework"): estimate union / intersection / Jaccard
    * between every pair of groups from their bottom-k sketches alone —
    * the cross-slice overlap estimator ("how much of source A is also in
    * source B?") that answers dedup/contamination sizing questions at
    * 100 TB WITHOUT ever joining the corpora: the pair computation runs
    * on |G|² k-long arrays, metadata scale.
    *
    * Per pair: θ = min over both sketches of (h_k when the sketch is
    * full, M otherwise — the sketch's retention threshold); each side's
    * entries < θ are a uniform distinct-hash sample of that set below θ,
    * so |sample| · M/θ estimates the set-op cardinality, with the
    * intersection counted by the sorted-merge kernel on the filtered
    * (still sorted) arrays. When neither sketch is full, θ = M and every
    * "estimate" is EXACT — the same graceful-exactness contract as
    * [[kmvDistinctEstimate]]. Counts stay ≤ 2k so n·M sits far below
    * 2^53: the doubles are all-rational and cross-engine exact (oracle
    * q133).
    *
    * @param sketches one row per group: (`groupCol`, `sketchCol`) where
    *                 the sketch is a [[bottomKHashes]](k) array
    * @return (i, j) for every unordered group pair i < j, with theta,
    *         exact sample counts and the three estimates
    */
  def thetaSetOps(sketches: org.apache.spark.sql.DataFrame, groupCol: String,
                  sketchCol: String, k: Int, hashMod: Long): org.apache.spark.sql.DataFrame = {
    require(k >= 2)
    def thetaOf(s: Column): Column =
      when(size(s) >= k, element_at(s, k)).otherwise(lit(hashMod))
    val a = sketches.select(col(groupCol).as("i"), col(sketchCol).as("__sa"))
    val b = sketches.select(col(groupCol).as("j"), col(sketchCol).as("__sb"))
    a.join(b, col("i") < col("j"))
      .withColumn("theta", least(thetaOf(col("__sa")), thetaOf(col("__sb"))))
      .withColumn("__af", filter(col("__sa"), x => x < col("theta")))
      .withColumn("__bf", filter(col("__sb"), x => x < col("theta")))
      .withColumn("n_inter",
        graft.functions.intersectCountSorted(col("__af"), col("__bf")).cast("long"))
      .withColumn("n_union",
        (size(col("__af")) + size(col("__bf"))).cast("long") - col("n_inter"))
      .select(col("i"), col("j"), col("theta"), col("n_union"), col("n_inter"),
        (col("n_union").cast(DoubleType) * hashMod.toDouble /
          col("theta").cast(DoubleType)).as("union_est"),
        (col("n_inter").cast(DoubleType) * hashMod.toDouble /
          col("theta").cast(DoubleType)).as("inter_est"),
        when(col("n_union") > 0, col("n_inter").cast(DoubleType) /
          col("n_union").cast(DoubleType)).otherwise(lit(0.0)).as("jaccard_est"))
  }

  // --- Count-min sketch -------------------------------------------------

  /** Carter–Wegman row hashes over the portable base hash: row j maps an
    * item to bucket ((a_j·polyHash(item) + b_j) mod p) mod w. Affine-
    * mod-prime on a shared base hash gives the pairwise-independence-ish
    * spread CMS rows need while staying a one-line portable formula
    * (base-hash collisions add estimator error but never break the
    * overestimate guarantee — colliding items just pool their counts,
    * and the whole construction stays deterministic for the oracle).
    */
  private val CmsP = 1000000007L
  private[operators] val CmsA = Seq(48271L, 69621L, 40692L)
  private[operators] val CmsB = Seq(11L, 13L, 17L)

  private[graft] def cmsBucket(h0: Column, row: Column, d: Int, w: Int): Column = {
    val a = element_at(typedlit(CmsA.take(d)), (row + 1).cast("int"))
    val b = element_at(typedlit(CmsB.take(d)), (row + 1).cast("int"))
    (a * h0 + b) % CmsP % w
  }

  /** Count-min sketch TABLE over an item column: d×w bucket counts —
    * frequency estimation whose state is d·w longs REGARDLESS of item
    * cardinality (the exact frequency table — q33's shape — is
    * |vocab|-sized; at web-corpus vocabularies that is itself a big-data
    * problem, and un-mergeable across shards without another shuffle).
    * The CMS table is a plain aggregate: per row j, bucket h_j(item),
    * count(*) — map-side combinable, and two shards' tables MERGE BY
    * ADDITION, which is what makes it the streaming/incremental
    * frequency companion. Overestimates only: est(x) ≥ true(x), with
    * ε ≈ e/w relative mass error at the usual d = ln(1/δ) rows.
    *
    * @return (row INT 0..d−1, bucket LONG 0..w−1, cnt LONG)
    */
  def countMinTable(df: org.apache.spark.sql.DataFrame, itemCol: String,
                    d: Int, w: Int): org.apache.spark.sql.DataFrame = {
    require(d >= 1 && d <= CmsA.length, s"1 <= d <= ${CmsA.length}")
    require(w >= 2, "need w >= 2 buckets")
    val h0 = TextAnalysis.polyHash(col(itemCol))
    df.select(h0.as("__h0"),
      explode(sequence(lit(0), lit(d - 1))).as("row"))
      .select(col("row"), cmsBucket(col("__h0"), col("row"), d, w).as("bucket"))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates from a [[countMinTable]]: per probe item, the MIN
    * over the d rows of its bucket's count (missing bucket = 0). The
    * sketch is broadcast (d·w rows by construction), so lookups are a
    * map-side join against the probe set — no shuffle proportional to
    * either corpus or vocabulary.
    *
    * @return probes' columns plus `est`
    */
  def cmsEstimate(sketch: org.apache.spark.sql.DataFrame,
                  probes: org.apache.spark.sql.DataFrame, itemCol: String,
                  d: Int, w: Int): org.apache.spark.sql.DataFrame = {
    require(d >= 1 && d <= CmsA.length, s"1 <= d <= ${CmsA.length}")
    val reserved = Set("row", "bucket", "cnt", "est", "__h0", "__cnt")
    val clash = probes.columns.filter(reserved)
    require(clash.isEmpty,
      s"probe columns ${clash.mkString(", ")} collide with the lookup's " +
        "internal/output names - rename them first")
    val h0 = TextAnalysis.polyHash(col(itemCol))
    probes
      .withColumn("__h0", h0)
      .withColumn("row", explode(sequence(lit(0), lit(d - 1))))
      .withColumn("bucket", cmsBucket(col("__h0"), col("row"), d, w))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .withColumn("__cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy(probes.columns.map(col).toIndexedSeq: _*)
      .agg(min(col("__cnt")).as("est"))
  }

  /** Approximate per-group quantiles from a bounded, DETERMINISTIC
    * uniform sample — the quantile path for UNBOUNDED-cardinality value
    * columns, where [[ExactQuantiles]]'s histogram pass has nothing
    * bounded to aggregate on (its per-group state is the distinct-value
    * count; fine for lengths and scores, unbounded for raw measures).
    *
    * Plan: ONE map-side-combinable aggregate over the raw data — per
    * group, the exact row count plus a [[graft.expressions.BottomKLongPairs]]
    * sketch keyed by the portable hash of `keyCol` (k pairs of state, any
    * group size); quantiles are then order statistics of the ≤k sampled
    * values, computed on the sketch array with integer-exact lower-
    * quantile ranks (rank = ⌈sz·num/den⌉, q74's convention). With a
    * uniform key hash this is a uniform sample, so the usual
    * O(1/√k) quantile-estimate error applies — and the sample is
    * REPRODUCIBLE: no RNG, no sampleBy seed, the same rows are chosen by
    * every engine (the oracle re-derives them as the k smallest distinct
    * (hash, value) pairs).
    *
    * `quantiles` entries are (outputName, num, den) with 1 ≤ num ≤ den.
    * Rows with a NULL value or key are excluded from the sample (the
    * exact count `n` still includes them).
    *
    * @return (groupCol, n, sample_size, quantile columns…)
    */
  def sampledQuantiles(df: org.apache.spark.sql.DataFrame, groupCol: String,
                       valueCol: String, keyCol: String, k: Int,
                       quantiles: Seq[(String, Int, Int)]): org.apache.spark.sql.DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    require(quantiles.forall { case (_, num, den) => num >= 1 && num <= den },
      "quantile ranks must satisfy 1 <= num <= den")
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    // polyHash alone is NOT sample-grade: it is length-ordered (short
    // keys hash small) and near-monotone on shared prefixes, so bottom-k
    // would select short/consecutive keys, not a uniform subset. The
    // Knuth multiplicative mix on top (the [[Sampling.hashBucket]]
    // constant) scatters consecutive hashes across the space while
    // staying a one-line portable formula the oracle reproduces.
    // (polyHash < 2^31, so the pre-multiply reduction is an identity and
    // the product stays below 2^63.)
    val h = pmod(pmod(TextAnalysis.polyHash(col(keyCol).cast("string")),
      lit(2147483648L)) * 2654435761L, lit(4294967296L))
    val sk = toColumn(graft.expressions.BottomKLongPairs(
      toExpression(h), toExpression(col(valueCol).cast("long")), k)
      .toAggregateExpression())
    val qCols = quantiles.map { case (name, num, den) =>
      when(col("sample_size") > 0,
        expr(s"element_at(__vals, CAST((sample_size * $num - 1) DIV $den + 1 AS INT))"))
        .as(name)
    }
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sk.as("__sk"))
      .withColumn("sample_size", size(col("__sk")).cast("long"))
      .withColumn("__vals",
        array_sort(transform(col("__sk"), p => p.getField("v"))))
      .select((col(groupCol) +: col("n") +: col("sample_size") +: qCols): _*)
  }

  // --- HyperLogLog ------------------------------------------------------

  /** HLL constants for m = 2^b registers (Flajolet et al. 2007). */
  private val HllAlpha = Map(4 -> 0.673, 5 -> 0.697, 6 -> 0.709)

  /** Rank-window width: bits left above the bucket index in the MIXED
    * hash, which lives on [0, 2^31) — so 31 − b.
    */
  private[operators] def hllRankBits(b: Int): Int = 31 - b

  /** Murmur2-style finalizer over the portable polyHash, kept in 31-bit
    * space so every multiply stays below 2^62 (no Long overflow under
    * ANSI, no HUGEINT in the oracle). polyHash alone is NOT rank-grade:
    * consecutive keys form arithmetic progressions, and a single
    * multiplicative mix maps APs to APs — the small values HLL's
    * leading-zero rank feeds on simply never occur (measured 3.6–4.7×
    * underestimates). Two xorshift+multiply rounds give avalanche; every
    * step is a portable one-liner (xor / >> / * / %) the oracle mirrors.
    */
  private[operators] def hllMix(c: Column): Column = {
    val mod = lit(2147483648L)
    val a = c.bitwiseXOR(shiftright(c, 15))
    val b = pmod(a * 1540483477L, mod)
    val d = b.bitwiseXOR(shiftright(b, 13))
    val e = pmod(d * 1103515245L, mod)
    e.bitwiseXOR(shiftright(e, 16))
  }

  /** HyperLogLog register table — the third distinct-count sketch next
    * to exact (q19) and KMV (q46), and the industry-standard one: state
    * is m = 2^b SMALL integers per group (vs KMV's k full hashes),
    * registers MERGE by elementwise max ([[hllMerge]]), and the
    * register→estimate step is libm-free here so the whole sketch stays
    * inside the cross-engine oracle gate:
    *   - bucket = hash mod m, rank = leading-zero count of the remaining
    *     `hllRankBits` window + 1 — computed as W + 1 − len(bin(v)),
    *     string length of the binary rendering, identical in any engine
    *     (no log2);
    *   - the harmonic denominator Σ 2^(−reg) sums exact powers of two
    *     spanning < 53 bits, so it is EXACT in any fold order — the
    *     estimate is one deterministic double division away.
    * polyHash goes through [[hllMix]] first (see there: APs survive a
    * multiplicative mix and starve the rank of small values). Quality is
    * measured against the exact count in the q111 gate, not asserted.
    * Raw estimate only: the small-range linear-counting correction needs
    * ln(); callers get the zero-register count and can apply it outside
    * the oracle-exact path.
    *
    * @return (group, regs ARRAY<LONG> of length 2^b, dense, bucket order)
    */
  def hllRegisterTable(df: org.apache.spark.sql.DataFrame, groupCol: String,
                       itemCol: String, b: Int = 6): org.apache.spark.sql.DataFrame = {
    require(HllAlpha.contains(b), s"b must be one of ${HllAlpha.keys.toSeq.sorted}")
    val m = 1 << b
    val w = hllRankBits(b)
    val h = hllMix(TextAnalysis.polyHash(col(itemCol)))
    df.filter(col(itemCol).isNotNull) // NULL is no item, not a register hit
      .select(col(groupCol), h.as("__h"))
      .select(col(groupCol), (col("__h") % m).as("__bucket"),
        expr(s"CASE WHEN __h DIV $m = 0 THEN ${w + 1} " +
          s"ELSE ${w + 1} - length(bin(__h DIV $m)) END").as("__rnk"))
      .groupBy(col(groupCol), col("__bucket"))
      .agg(max(col("__rnk")).as("__reg"))
      .groupBy(col(groupCol))
      .agg(map_from_entries(collect_list(struct(col("__bucket"), col("__reg"))))
        .as("__m"))
      .select(col(groupCol),
        expr(s"transform(sequence(0, ${m - 1}), " +
          "bk -> coalesce(element_at(__m, bk), CAST(0 AS BIGINT)))").as("regs"))
  }

  /** Elementwise-max merge of two register arrays — the property that
    * makes HLL the distributed/incremental sketch: shard registers union
    * losslessly (max commutes with max).
    */
  def hllMerge(a: Column, b: Column): Column = zip_with(a, b, greatest(_, _))

  /** Join-size estimate by COORDINATED key sampling — the planner
    * question "how big would this equi-join blow up?" answered from a
    * 1/rate sample without running the join. Both sides sample the SAME
    * keys (the deterministic Knuth bucket [[Sampling.hashBucket]] == 0),
    * so sampled per-key count products are an unbiased 1/rate sample of
    * Σₖ aₖ·bₖ = |A ⋈ B|, and
    *
    *   est_join_rows = rate · Σ_{sampled k} aₖ·bₖ    (exact integers —
    *   no floats anywhere; deterministic, so even the ESTIMATE is
    *   oracle-checkable)
    *
    * Independent per-side Bernoulli sampling would estimate Σ aₖ·bₖ/rate²
    * with rate²-worse variance on the hot keys that dominate join size;
    * coordination (same hash, same side of the cut) is the whole trick.
    *
    * Scale shape: each side is ONE map-side filter (h(key) < cut — rows
    * of unsampled keys never reach the aggregate) + a per-key count
    * bounded by sampled-key cardinality, then a sampled-keys-sized join
    * and a one-row sum. Self-join estimates (pass the same frame twice)
    * cost the same two passes.
    *
    * Caveats the caller owns: a hot key missed by the sample (prob
    * 1−1/rate) removes its a·b mass entirely — for join-size certainty
    * on known heavy hitters, union the [[HeavyHitters]] candidates in
    * exactly; keys must be non-negative integers (the bucket hash's
    * domain).
    */
  def joinSizeEstimate(a: org.apache.spark.sql.DataFrame,
                       b: org.apache.spark.sql.DataFrame,
                       keyCol: String, rate: Int): org.apache.spark.sql.DataFrame = {
    require(rate > 0, "rate must be positive")
    def sampledCounts(df: org.apache.spark.sql.DataFrame, out: String) = df
      .filter(Sampling.hashBucket(col(keyCol), rate) === 0)
      .groupBy(col(keyCol).as("__k"))
      .agg(count(lit(1)).as(out))
    sampledCounts(a, "__ca").join(sampledCounts(b, "__cb"), "__k")
      .agg(count(lit(1)).as("n_sampled_keys"),
        sum(col("__ca") * col("__cb")).as("__sp"))
      .select(col("n_sampled_keys"),
        coalesce(col("__sp"), lit(0L)).as("sampled_pairs"),
        coalesce(col("__sp") * rate, lit(0L)).as("est_join_rows"))
  }

  /** Raw HLL estimate α_m·m² / Σ 2^(−reg) over the named register-array
    * column: libm-free (the power of two is a shift; α_m·m² is an exact
    * exponent scaling of the α constant), bit-identical across engines
    * for identical registers.
    */
  def hllEstimate(regsCol: String, b: Int): Column = {
    require(HllAlpha.contains(b), s"b must be one of ${HllAlpha.keys.toSeq.sorted}")
    val m = 1 << b
    val alphaM2 = HllAlpha(b) * (m.toLong * m)
    lit(alphaM2) / expr(
      s"aggregate($regsCol, CAST(0.0 AS DOUBLE), (acc, r) -> " +
        "acc + CAST(1.0 AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), " +
        "CAST(r AS INT)) AS DOUBLE))")
  }
}
