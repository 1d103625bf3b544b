package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data-layout clustering — the write-time operator that decides how much
  * the READ side gets to prune at 100 TB.
  *
  * Sorting a table by one column gives parquet min/max pruning on that
  * column only; multi-dimensional workloads (filter by user AND time, by
  * part AND supplier) need a space-filling curve: interleave the bits of
  * the k filter columns into one Z-value, then range-partition + sort by
  * it. Rows close in Z are close in EVERY interleaved dimension, so each
  * output file holds a tight k-dimensional bounding box and a selective
  * filter on ANY of the dimensions skips most files. This is the same
  * technique lakehouse table formats expose as `OPTIMIZE ZORDER BY`.
  *
  * The Z-value is pure bit arithmetic (shifts/masks, whole-stage codegen,
  * portable to any engine), and clustering is one range repartition — the
  * same shuffle a plain global sort would pay.
  */
object Layout {

  /** Bit-interleaved Z-value of k non-negative integer columns: bit `b` of
    * column `i` lands at output bit `b*k + i`. Uses the low `bits` bits of
    * each column; `bits * k` must stay in a signed long. Negative inputs
    * are rejected (NULL via the mask would silently scramble the curve) —
    * callers shift/clamp first.
    */
  def zValue(bits: Int, cols: Column*): Column = {
    val k = cols.size
    require(k >= 2, "interleaving needs at least 2 columns")
    require(bits >= 1 && bits * k <= 63, s"bits*k must be in [$k, 63]")
    val parts = for {
      (c, i) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast(LongType), b).bitwiseAND(lit(1L)), b * k + i)
    parts.reduce((a, b) => a.bitwiseOR(b))
  }

  /** `df` clustered for multi-dimensional pruning: range-partitioned and
    * sorted by the Z-value of `cols` into `numPartitions` output slices
    * (one file each when written). The helper column never leaves.
    */
  def clusterByZ(df: DataFrame, numPartitions: Int, bits: Int,
                 cols: Column*): DataFrame =
    df.withColumn("__z", zValue(bits, cols: _*))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  // ----------------------------------------------------- rendezvous (HRW)

  private val HrwP = 1000000007L

  /** Per-shard affine coefficients over the shared prime — one
    * deterministic LCG stream, so the same literals reach both the plan
    * and the generated DuckDB oracle (the [[Dedup]] permutation pattern).
    */
  private[graft] def hrwCoeffs(n: Int): Seq[(Long, Long)] = {
    var s = 88172645463325252L
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; 1L + math.abs(s % (HrwP - 1)) }
    Seq.fill(n)((next(), next()))
  }

  /** Rendezvous (highest-random-weight) shard of a STRING key over `n`
    * shards: shard s scores (a_s·h + b_s) mod p on the key's portable
    * hash; the key goes to the highest score (smallest shard id on
    * ties). The property mod-N sharding lacks and manifest-driven
    * corpora need: growing n → n+1 moves ONLY the keys won by the new
    * shard — an expected 1/(n+1) of the data — while every other key
    * keeps its shard, so a resize re-writes one new shard instead of
    * reshuffling the corpus. Pure per-row arithmetic over an n-entry
    * literal score array (no shuffle, no lookup table); n is
    * plan-literal scale (≤ 1024), the usual shard-count regime.
    */
  def rendezvousShard(key: Column, n: Int): Column = {
    require(n >= 1 && n <= 1024, "shard count must be in [1, 1024]")
    val hk = TextAnalysis.polyHash(key)
    val scores = array(hrwCoeffs(n).map { case (a, b) =>
      (hk * lit(a) + lit(b)) % lit(HrwP)
    }: _*)
    // first position of the max ⇒ smallest shard id wins ties
    (array_position(scores, array_max(scores)) - 1L).cast("int")
  }

  /** Compaction planning — the small-files maintenance pass: assign each
    * item (file, document, row-group) to an output bin so every bin
    * holds ~`target` units of `sizeCol`, preserving the within-group
    * order (locality: sort keys, time ranges, and z-cluster prefixes
    * stay contiguous through the rewrite). The greedy sequential rule —
    * an item opens a new bin when the space BEFORE it reaches the next
    * target boundary, i.e. bin = ⌊(cumsum − size) / target⌋ — is
    * deterministic, order-respecting, and closed-form over a running
    * sum, so the whole plan is ONE cumulative-sum window per group plus
    * a projection: no driver loop, no iterative packing, no item ever
    * compared to more than its prefix sum. Bins can exceed `target`
    * only by their LAST item (the classic ≤ 2× bound when items are
    * ≤ target; an oversized single item gets its own overflowing bin).
    *
    * Scale shape: one window partitioned by `groupCol` ordered by
    * `orderCol` — the same per-group running-sum shape as sessionize;
    * state is a single long per partition stream. At 100 TB the items
    * are FILES (billions at most), not rows, so even a skewed group's
    * window stream is metadata-sized. Integer-exact below 2^63 total
    * size per group.
    *
    * @return input + (bin, bin_pos): bin is 0-based per group, bin_pos
    *         the 1-based position within the bin.
    */
  def compactionPlan(df: DataFrame, groupCol: String, orderCol: String,
                     sizeCol: String, target: Long): DataFrame = {
    require(target > 0)
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binned = df
      .withColumn("__cum", sum(col(sizeCol).cast("long")).over(w))
      // integer DIV, not floor(double /): exact past 2^53 of cumulative
      // size (the GlobalIds shard-label precedent)
      .withColumn("bin",
        expr(s"(__cum - CAST($sizeCol AS BIGINT)) DIV $target"))
    val wBin = Window.partitionBy(col(groupCol), col("bin"))
      .orderBy(col(orderCol))
    binned
      .withColumn("bin_pos", row_number().over(wBin).cast("long"))
      .drop("__cum")
  }

  /** Column ENCODING advisor: for each named column, the three numbers
    * a columnar writer chooses an encoding from — row count, NDV, and
    * RUNS of equal adjacent values along the table's physical order —
    * plus the verdict (RLE when runs are few, dictionary when NDV is
    * small, plain otherwise). The same stats Parquet writers use
    * implicitly, surfaced as data so a layout decision ([[clusterByZ]],
    * sort keys) can be justified by its measured effect on runs.
    *
    * Run counting never uses a corpus-wide window: the [[runsTest]]
    * block discipline — ordinals via [[GlobalIds.contiguousIds]],
    * per-block adjacency under per-block windows, block-edge
    * adjacencies from the |blocks|-row first/last table. NULL values
    * participate (a NULL run is RLE-able too; null-safe equality).
    *
    * Thresholds (plan literals, documented): RLE when runs·8 ≤ n,
    * dictionary when ndv·16 ≤ n, else plain.
    *
    * @return one row per column: (column, n_rows, ndv, runs,
    *         runs_ratio, ndv_ratio, recommended)
    */
  def encodingAdvisor(df: DataFrame, bucket: Column, order: Seq[Column],
                      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val Block = 4096L
    // every column's string image rides the ONE ordinal/window pass —
    // runs for k columns cost one shuffle, not k (the lags share a
    // window spec, so Spark evaluates them in a single Window operator)
    val ranked = CacheScope.track(
      GlobalIds.contiguousIds(df, bucket, order, "__ord")
        .withColumn("__blk", expr(s"__ord DIV $Block"))
        .select(Seq(col("__ord"), col("__blk")) ++
          cols.map(c => col(c).cast("string").as(s"__v_$c")): _*))
    val wIn = Window.partitionBy("__blk").orderBy("__ord")
    val lagged = ranked.select(
      Seq(col("__ord"), col("__blk"), row_number().over(wIn).as("__rn")) ++
        cols.map(c => col(s"__v_$c")) ++
        cols.map(c => lag(col(s"__v_$c"), 1).over(wIn).as(s"__p_$c")): _*)
    val inner = lagged.agg(count(lit(1)).as("n_rows"),
      cols.map(c => count(when(col("__rn") > 1 &&
        !(col(s"__v_$c") <=> col(s"__p_$c")), 1L)).as(s"__inb_$c")): _*)
    // NDV per column off ONE stacked histogram (the columnProfile plan)
    val stackExpr = cols.map(c => s"'$c', `__v_$c`").mkString(", ")
    val ndv = ranked
      .select(expr(s"stack(${cols.length}, $stackExpr) AS (__col, __val)"))
      .filter(col("__val").isNotNull)
      .groupBy("__col").agg(count_distinct(col("__val")).as("ndv"))
    // |blocks|-row edge table carrying every column's first/last value
    val edgeAggs = cols.map(c =>
      min(struct(col("__ord"), col(s"__v_$c").as("__a")))
        .getField("__a").as(s"__f_$c")) ++
      cols.map(c =>
        max(struct(col("__ord"), col(s"__v_$c").as("__a")))
          .getField("__a").as(s"__l_$c"))
    val edges = ranked.groupBy("__blk").agg(edgeAggs.head, edgeAggs.tail: _*)
    val cross = edges.alias("l")
      .join(edges.alias("r"), col("l.__blk") + 1 === col("r.__blk"))
      .agg(count(lit(1)).as("__dummy"),
        cols.map(c => count(when(
          !(col(s"l.__l_$c") <=> col(s"r.__f_$c")), 1L)).as(s"__xb_$c")): _*)
    // ONE row — cached because the per-column union below selects from
    // it k times, and uncached each branch would re-run the window +
    // both block aggregates over the full table (k× the plan's cost;
    // measured 5× lineitem-scan inflation on q265 before this).
    val one = CacheScope.track(inner.crossJoin(cross))
    val perCol = cols.map { c =>
      one.select(lit(c).as("column"), col("n_rows"),
        when(col("n_rows") > 0L,
          col(s"__inb_$c") + col(s"__xb_$c") + 1L)
          .otherwise(lit(0L)).as("runs"))
    }
    perCol.reduce(_.unionByName(_))
      .join(ndv.select(col("__col").as("column"), col("ndv")),
        Seq("column"), "left")
      .withColumn("ndv", coalesce(col("ndv"), lit(0L)))
      .withColumn("runs_ratio",
        when(col("n_rows") > 0L,
          col("runs").cast("double") / col("n_rows").cast("double")))
      .withColumn("ndv_ratio",
        when(col("n_rows") > 0L,
          col("ndv").cast("double") / col("n_rows").cast("double")))
      .withColumn("recommended",
        when(col("runs") * 8L <= col("n_rows"), "rle")
          .when(col("ndv") * 16L <= col("n_rows"), "dict")
          .otherwise("plain"))
  }

  /** WALD–WOLFOWITZ runs test along a manifest order: is a binary
    * attribute (source, lang, label) actually MIXED along the order a
    * training run will consume, or does it clump? An epoch shuffle
    * (q104) promises mixing; this measures it — too few runs = clumped
    * (bad for SGD), too many = anti-correlated alternation (a striping
    * artifact). The layout-QA sibling of [[compactionPlan]]: one judges
    * file sizes, this judges ORDER quality.
    *
    * Scale shape — adjacency without a global window: ordinals come from
    * [[GlobalIds.contiguousIds]] (histogram-offset), blocks of 4096
    * ordinals count their INTERNAL boundaries under per-block windows,
    * and the |blocks|-row (first, last) table joins itself shifted by
    * one for the cross-block boundaries. No corpus row ever passes
    * through a single-partition window.
    *
    * Statistics: R = 1 + Σ boundaries; E[R] = 1 + 2n₁n₂/n and
    * Var[R] = 2n₁n₂(2n₁n₂−n)/(n²(n−1)) computed in fixed-shape double
    * arithmetic on the exact counts (the BIGINT product would overflow
    * at n ~ 2³², and a z-score needs no exactness — determinism
    * suffices). NULL z when either class is empty or n < 2. NULL attr
    * rows are excluded (no side of a run).
    *
    * @param bucket monotone-along-order bucket for the ordinal plan
    *               (the [[GlobalIds.contiguousIds]] contract)
    * @return one row: (n, n1, n2, runs, expected_runs, variance, z)
    */
  def runsTest(df: DataFrame, bucket: Column, order: Seq[Column],
               attr: Column): DataFrame = {
    val Block = 4096L
    val base = df.select(attr.cast("boolean").as("__a") +: order: _*)
      .filter(col("__a").isNotNull)
    val ranked = GlobalIds.contiguousIds(base, bucket, order, "__ord")
      .withColumn("__blk", expr(s"__ord DIV $Block"))
    val wIn = Window.partitionBy("__blk").orderBy("__ord")
    val inner = ranked
      .withColumn("__prev", lag(col("__a"), 1).over(wIn))
      .agg(
        count(lit(1)).as("n"),
        count(when(col("__a"), 1L)).as("n1"),
        count(when(!col("__a"), 1L)).as("n2"),
        count(when(col("__prev").isNotNull &&
          col("__a") =!= col("__prev"), 1L)).as("__inb"))
    val edges = ranked.groupBy("__blk")
      .agg(min(struct(col("__ord"), col("__a"))).as("__first"),
        max(struct(col("__ord"), col("__a"))).as("__last"))
      .select(col("__blk"),
        col("__first").getField("__a").as("__fa"),
        col("__last").getField("__a").as("__la"))
    val cross = edges.alias("l")
      .join(edges.alias("r"), col("l.__blk") + 1 === col("r.__blk"))
      .agg(coalesce(count(when(col("l.__la") =!= col("r.__fa"), 1L)),
        lit(0L)).as("__xb"))
    val nD = col("n").cast("double")
    val a = lit(2.0) * col("n1").cast("double") * col("n2").cast("double")
    inner.crossJoin(cross)
      .withColumn("runs",
        when(col("n") > 0L, col("__inb") + col("__xb") + 1L))
      .select(col("n"), col("n1"), col("n2"), col("runs"),
        when(col("n") > 0L, lit(1.0) + a / nD).as("expected_runs"),
        when(col("n") > 1L && col("n1") > 0L && col("n2") > 0L,
          a * (a - nD) / (nD * nD * (nD - lit(1.0)))).as("variance"))
      .withColumn("z",
        when(col("variance") > 0.0,
          (col("runs").cast("double") - col("expected_runs")) /
            sqrt(col("variance"))))
  }
}
