package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seeded random projection (Johnson–Lindenstrauss) for embedding
  * columns — the cheap dimensionality-reduction step in front of ANN /
  * clustering / dedup when the full-dimension scoring pass is the
  * bottleneck: a ±1 ("database-friendly", Achlioptas) projection to
  * dOut dims preserves pairwise distances within (1±ε) w.h.p. while
  * cutting per-pair scoring cost by dIn/dOut.
  *
  * Scale/determinism shape:
  *   - The sign matrix is DRIVER-GENERATED from an LCG seed (dOut×dIn
  *     entries — 16×64 is 1 KB) and rides the plan as float-array
  *     literals, the PQ-codebook precedent: no join, no shuffle, no
  *     broadcast round-trip. Projection is a pure map over the corpus —
  *     at 100 TB it scales like a scan and pipelines into whatever
  *     consumes it.
  *   - Each output coordinate is the compiled float-dot kernel
  *     ([[graft.functions.dotProductF]]) against one literal sign row:
  *     double accumulation in array order, so the result is
  *     bit-identical to any engine folding the same order — ±1 float
  *     multiplies are exact sign flips, float→double widening is exact,
  *     and the final /sqrt(dOut) is one IEEE-exact operation. The
  *     oracle embeds the SAME driver-generated signs as SQL literals.
  */
object Projection {

  /** Deterministic ±1 sign matrix (dOut rows × dIn cols) from a seeded
    * LCG (the [[Dedup]] perms discipline): sign = high bit of the next
    * 64-bit state. Float entries so rows feed [[graft.functions.litFloatArray]]
    * directly; every value is exactly ±1.0f.
    */
  def signMatrix(seed: Long, dOut: Int, dIn: Int): Array[Array[Float]] = {
    require(dOut > 0 && dIn > 0, "projection dims must be positive")
    var s = seed
    Array.fill(dOut, dIn) {
      s = s * 6364136223846793005L + 1442695040888963407L
      if (s < 0) -1.0f else 1.0f
    }
  }

  /** Append `proj` (DOUBLE array, length dOut) — y_j = dot(v, signs_j)
    * / sqrt(dOut) — to every row. Map-only; the input vector column is
    * NOT dropped (callers project it out when the narrow table is what
    * ships onward).
    */
  def randomProject(df: DataFrame, vecCol: String, dOut: Int,
                    seed: Long, dIn: Int): DataFrame = {
    val signs = signMatrix(seed, dOut, dIn)
    val scale = lit(math.sqrt(dOut.toDouble))
    df.withColumn("proj", array(signs.map { row =>
      (graft.functions.dotProductF(col(vecCol),
        graft.functions.litFloatArray(row)) / scale): Column
    }: _*))
  }

  /** Brute-force cosine top-k IN PROJECTED SPACE: both sides project
    * map-side (same seed), then the [[Similarity.bruteForceTopK]]
    * broadcast shape scores dOut-dim doubles — the dIn/dOut scoring
    * speedup this operator exists for. Recall loss is measured, not
    * asserted (compose with [[Similarity.recallAtK]], the q60/q85
    * harness pattern).
    *
    * @return (qid, rank, nid, pcos) — rank per qid by (pcos desc, nid).
    */
  def projectedTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, dOut: Int, seed: Long, dIn: Int,
                    k: Int): DataFrame = {
    def side(df: DataFrame, id: String, v: String, n: String): DataFrame =
      randomProject(df, vecCol, dOut, seed, dIn)
        .select(col(idCol).as(id), col("proj").as(v),
          sqrt(graft.functions.dotProduct(col("proj"), col("proj"))).as(n))
    val q = side(queries, "qid", "__qv", "__qn")
    val c = side(corpus, "nid", "__cv", "__cn")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .withColumn("pcos",
        when(col("__qn") * col("__cn") =!= 0.0,
          graft.functions.dotProduct(col("__qv"), col("__cv")) /
            (col("__qn") * col("__cn"))))
    val w = Window.partitionBy("qid").orderBy(desc("pcos"), col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("nid"), col("pcos"))
  }

  /** Saturating fixed-point quantizer: floor(x·2^scaleBits) clamped to
    * ±2^(scaleBits+6), i.e. component magnitudes saturate at 64 units —
    * far above any normalized embedding, so normal inputs are untouched
    * while degenerate huge-magnitude vectors (the fuzz corpus carries
    * them deliberately) quantize to a DETERMINISTIC saturated value
    * instead of overflowing the per-product INT64 range: |q·q| ≤
    * 2^(2·scaleBits+12) < 2^63 for scaleBits ≤ 25, in every engine.
    * (Engines disagree on overflow — DuckDB errors, non-ANSI Spark
    * wraps — so saturation is what keeps the contract cross-engine.)
    */
  private def quantSat(x: Column, scale: Double, scaleBits: Int): Column = {
    val cap = 1L << (scaleBits + 6)
    greatest(lit(-cap), least(lit(cap), floor(x * lit(scale)).cast("long")))
  }

  /** Fixed-point Gram matrix of an embedding column: row `a` holds
    * M[a][b] = Σ_rows q(x_a)·q(x_b) with q(x) = floor(x·2^scaleBits) as
    * BIGINT — an exact, order-free integer image of the (quantized)
    * uncentered second-moment matrix, the sufficient statistic for
    * spectral analysis. Float Gram accumulation would be partition-
    * order-dependent; quantizing FIRST makes every sum exact integers
    * (the [[EmbeddingStats]] discipline, lifted from per-dimension
    * moments to cross-moments).
    *
    * Scale shape: one posexplode (dim× row blowup — inherent to Σxxᵀ)
    * into a 64-group aggregate of dim products each; map-side combine
    * collapses every partition to ≤ dim rows before the shuffle, so the
    * shuffle is dim² longs per task regardless of corpus size.
    *
    * Overflow contract: 2^(2·scaleBits)·n·max|x|² < 2^63 — at the
    * default 20 bits and unit-normalized embeddings that holds to ~8M
    * rows; lower scaleBits (or pre-aggregate shards into DECIMAL) for
    * more. Spectral probes at corpus scale run on a deterministic
    * sample anyway ([[Sampling.deterministicSample]]).
    */
  def gramFixedPoint(df: DataFrame, vecCol: String, dim: Int,
                     scaleBits: Int = 20): DataFrame = {
    require(dim > 0 && scaleBits > 0 && scaleBits < 31)
    val scale = (1L << scaleBits).toDouble
    val q = transform(col(vecCol),
      x => quantSat(x.cast("double"), scale, scaleBits))
    df.select(q.as("__q"))
      .select(posexplode(col("__q")).as(Seq("a", "qa")), col("__q"))
      .groupBy("a")
      .agg(array((0 until dim).map(b =>
        sum(col("qa") * element_at(col("__q"), b + 1)).as(s"m$b")): _*)
        .as("mrow"))
  }

  /** Top principal direction of the [[gramFixedPoint]] matrix by POWER
    * ITERATION — "is there a dominant direction / rogue dimension in
    * these embeddings" (anisotropy is the common failure of pooled
    * transformer embeddings; its fix — removing the top component(s),
    * Mu & Viswanath's all-but-the-top — needs exactly this vector).
    *
    * Determinism: the Gram collect is exact integers; the iteration
    * runs ON THE DRIVER (64×64 doubles — matvec cost is nothing; the
    * corpus pass was the Gram) in a FIXED order — w[a] = left-fold over
    * b of M[a][b]·v[b], norm = sqrt(left-fold of w[a]²), v = w/norm,
    * `iterations` times from the all-ones start — so any engine
    * replaying the same folds gets the same bits (the LinearModel.score
    * contract, applied to an eigensolver). BIGINT→double conversion is
    * exact below 2^53; the Gram entries' overflow contract above
    * already keeps them there for unit-norm inputs.
    *
    * @return one row per dimension: (dim, loading, lambda) with
    *         `lambda` = vᵀMv of the final vector (constant column)
    */
  /** Collected [[gramFixedPoint]] matrix as driver doubles (exact:
    * entries stay below 2^53 under the documented contract).
    */
  private def collectGram(df: DataFrame, vecCol: String, dim: Int,
                          scaleBits: Int): Array[Array[Double]] = {
    val m = Array.ofDim[Double](dim, dim)
    gramFixedPoint(df, vecCol, dim, scaleBits).collect().foreach { r =>
      val a = r.getAs[Int]("a")
      val row = r.getSeq[Long](r.fieldIndex("mrow"))
      var b = 0
      while (b < dim) { m(a)(b) = row(b).toDouble; b += 1 }
    }
    m
  }

  /** The fixed-fold-order power iteration both spectral probes share:
    * w[a] = left-fold over b of M[a][b]·x[b], norm = sqrt(left-fold of
    * w[a]²), x = w/norm, `iterations` times from all-ones; returns the
    * final vector and its Rayleigh quotient vᵀMv (same left folds).
    */
  private def powerIterate(m: Array[Array[Double]], dim: Int,
                           iterations: Int): (Array[Double], Double) = {
    require(iterations >= 1)
    def matvec(x: Array[Double]): Array[Double] =
      Array.tabulate(dim) { a =>
        var s = 0.0
        var b = 0
        while (b < dim) { s += m(a)(b) * x(b); b += 1 }
        s
      }
    var v = Array.fill(dim)(1.0)
    for (_ <- 0 until iterations) {
      val w = matvec(v)
      var n2 = 0.0
      var a = 0
      while (a < dim) { n2 += w(a) * w(a); a += 1 }
      val nrm = math.sqrt(n2)
      v = w.map(_ / nrm)
    }
    val mv = matvec(v)
    var lambda = 0.0
    var a = 0
    while (a < dim) { lambda += v(a) * mv(a); a += 1 }
    (v, lambda)
  }

  def topComponentFixedPoint(df: DataFrame, vecCol: String, dim: Int,
                             iterations: Int = 20,
                             scaleBits: Int = 20): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (v, lambda) = powerIterate(
      collectGram(df, vecCol, dim, scaleBits), dim, iterations)
    (0 until dim).map(d => (d.toLong, v(d), lambda))
      .toDF("dim", "loading", "lambda")
  }

  /** Spectral GAP of the fixed-point Gram: λ₂ via one Hotelling
    * deflation (M₂ = M − λ₁·v₁v₁ᵀ, all driver doubles in fixed op
    * order) and a second power iteration — the one-row answer to "does
    * removing ONE component fix the anisotropy, or is the spectrum
    * top-heavy beyond that?" gap_ratio = λ₂/λ₁ near 1 means q181's
    * single removal is not enough. Same corpus cost as
    * [[topComponentFixedPoint]] (the Gram pass); everything else is
    * driver-side 64×64 arithmetic the oracle replays.
    *
    * @return one row: (lambda1, lambda2, gap_ratio) — gap_ratio NULL
    *         when λ₁ = 0 (all-zero corpus)
    */
  def spectralGapFixedPoint(df: DataFrame, vecCol: String, dim: Int,
                            iterations: Int = 20,
                            scaleBits: Int = 20): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val md = collectGram(df, vecCol, dim, scaleBits)
    val (v1, l1) = powerIterate(md, dim, iterations)
    val m2 = Array.tabulate(dim, dim)((a, b) => md(a)(b) - l1 * v1(a) * v1(b))
    val (_, l2) = powerIterate(m2, dim, iterations)
    val ratio: Option[Double] = if (l1 == 0.0) None else Some(l2 / l1)
    Seq((l1, l2, ratio)).toDF("lambda1", "lambda2", "gap_ratio")
  }

  /** All-but-the-top, measured (Mu & Viswanath): remove the
    * [[topComponentFixedPoint]] direction from every vector —
    * r = x − (x·v)v, a map-only projection with v riding as a 64-double
    * plan literal — and report per-dimension ENERGY before vs after in
    * the same fixed-point integers the probe uses, so the anisotropy
    * fix is verified by exact arithmetic, not eyeballed. A dominant
    * direction shows up as `removed_frac` near 1 on the dimensions it
    * loads on; an isotropic corpus shows small fractions everywhere.
    *
    * Two corpus passes total (Gram, then residual energies), both
    * map-side combinable; the only driver state is v itself. Same
    * overflow contract as [[gramFixedPoint]].
    *
    * @return (dim, energy_before, energy_after, removed_frac) —
    *         removed_frac = 1 − after/before, NULL on a dead dimension
    */
  def removeTopComponentEnergy(df: DataFrame, vecCol: String, dim: Int,
                               iterations: Int = 20,
                               scaleBits: Int = 20): DataFrame = {
    val v = topComponentFixedPoint(df, vecCol, dim, iterations, scaleBits)
      .orderBy("dim").collect().map(_.getAs[Double]("loading"))
    val vLit = array(v.map(lit): _*)
    val scale = (1L << scaleBits).toDouble
    val base = df
      .select(transform(col(vecCol), e => e.cast("double")).as("__x"))
      .withColumn("__dot", graft.functions.dotProduct(col("__x"), vLit))
    val resid = zip_with(col("__x"), vLit,
      (xb, vb) => xb - col("__dot") * vb)
    base
      .select(posexplode(zip_with(
        transform(col("__x"), xb => quantSat(xb, scale, scaleBits)),
        transform(resid, rb => quantSat(rb, scale, scaleBits)),
        (a, b) => struct(a.as("qx"), b.as("qr")))).as(Seq("dim", "s")))
      .groupBy(col("dim").cast("long").as("dim"))
      .agg(sum(col("s.qx") * col("s.qx")).as("energy_before"),
        sum(col("s.qr") * col("s.qr")).as("energy_after"))
      .withColumn("removed_frac",
        when(col("energy_before") > 0,
          lit(1.0) - col("energy_after").cast("double") /
            col("energy_before").cast("double")))
  }
}
