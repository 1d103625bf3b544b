package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]):
  * exact brute-force cosine top-k as the correctness baseline, and an
  * IVF-bucketed variant as the scale path.
  *
  * Scale design: brute force is O(|Q|·|C|) — acceptable only when the query
  * set is small enough to broadcast. The IVF path shuffles the corpus ONCE
  * by coarse-centroid cell, probes nProbe cells per query, and reranks
  * exactly inside the probed cells, so corpus-side work per query drops by
  * ~|cells|/nProbe. Both are deterministic (ties broken by id), which keeps
  * every result oracle-checkable.
  *
  * Performance: norms are computed ONCE PER ROW and carried as a scalar
  * column, so each scored pair costs a single dot-product fold (the naive
  * cosine recomputes both norms per pair — 3× the array traversals).
  * The arithmetic per pair — dot(a,b) / (||a||·||b||), left-fold order —
  * is unchanged, so scores stay bit-identical to the DuckDB oracle.
  * Cell assignment is a map-side-combinable max_by aggregate, not a
  * row_number window (no per-id sort shuffle).
  */
object Similarity {

  /** cosine from a precomputed-norm pair; NULL when either norm is 0. */
  private def cosFromNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    when(na * nb =!= 0.0, graft.functions.dotProductF(a, b) / (na * nb))

  /** (renamedId, vec, norm) projection — norm computed once per row. */
  private def withNorm(df: DataFrame, idCol: String, vecCol: String,
                       idAs: String, vecAs: String, nrmAs: String): DataFrame =
    df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
      graft.functions.l2NormF(col(vecCol)).as(nrmAs))

  /** Exact cosine top-k: broadcast the (small) query set against the
    * corpus, score every pair, keep k per query by (cos desc, id asc).
    * Self-matches are excluded.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = withNorm(queries, idCol, vecCol, "qid", "__qv", "__qn")
    val c = withNorm(corpus, idCol, vecCol, "nid", "__cv", "__cn")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosFromNorms(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"), col("cos"))
  }

  /** Hard-negative mining — the contrastive-training data primitive: for
    * each query vector, the top-k most-similar corpus vectors whose LABEL
    * DIFFERS (same-label neighbors are positives; the near-boundary
    * negatives are the ones worth training on). Same broadcast-query-set
    * shape as [[bruteForceTopK]] — the label inequality filters before
    * the rank window, so per-query window state stays k-bounded at any
    * corpus size; swap the corpus side for IVF-probed candidates (q30's
    * plan) when the query set outgrows the broadcast threshold.
    *
    * @return (qid, q_label, rank, nid, n_label, cos)
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int): DataFrame = {
    // withNorm plus the label carried in the same projection — no
    // join-back (a nid-keyed self-join would shuffle the corpus twice)
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("__qv"),
      graft.functions.l2NormF(col(vecCol)).as("__qn"),
      col(labelCol).as("q_label"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("__cv"),
      graft.functions.l2NormF(col(vecCol)).as("__cn"),
      col(labelCol).as("n_label"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid") && col("q_label") =!= col("n_label"))
      .withColumn("cos", cosFromNorms(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("q_label"), col("rank").cast("long").as("rank"),
        col("nid"), col("n_label"), col("cos"))
  }

  /** One collected centroid: id, vector, and its l2NormF norm (evaluated
    * ONCE through the same Spark expression the per-row path used, so the
    * embedded literal is bit-identical to what an in-plan norm would be).
    */
  private case class Centroid(cid: Long, vec: Array[Float], norm: Double)

  /** Centroids are k × dim — driver-small BY DESIGN (kMeansCentroids
    * already collects them every iteration), so pull them once and embed
    * them as plan literals. That turns cell assignment into a map-only
    * projection: the former shape (crossJoin ×k → max_by hash aggregate →
    * join the cells back by id in every caller) paid a k× row blowup plus
    * two shuffles for what is per-row arithmetic against constants.
    */
  private def collectCentroids(centroids: DataFrame): Seq[Centroid] =
    centroids.select(col("cid").cast("long"), col("cvec"),
      graft.functions.l2NormF(col("cvec")))
      .collect()
      .map(r => Centroid(r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
      .toSeq

  /** (id, __v, __n, cell) — the shared map-only assignment projection.
    * The argmax is ONE fused kernel expression
    * ([[graft.expressions.NearestCentroidCell]]): the centroid matrix
    * rides as a codegen reference object, so k-means iterations (new
    * centroid values every round) reuse the compiled code instead of
    * recompiling, and each row costs one pass with zero allocation.
    * Semantics are bit-for-bit `max_by(cid, struct(cos, -cid))` — see the
    * kernel's doc.
    */
  private[operators] def assigned(vectors: DataFrame, idCol: String, vecCol: String,
                                  centroids: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    val cs = collectCentroids(centroids).sortBy(_.cid)
    require(cs.nonEmpty, "centroids must be non-empty")
    withNorm(vectors, idCol, vecCol, "id", "__v", "__n")
      .withColumn("cell", toColumn(graft.expressions.NearestCentroidCell(
        toExpression(col("__v")), toExpression(col("__n")),
        cs.map(_.cid).toArray, cs.map(_.vec).toArray, cs.map(_.norm).toArray)))
  }

  /** Assign every vector to its nearest centroid (max cos, centroid id
    * tie-break — NULL cell only if every cosine is NULL-normed). Map-only:
    * no shuffle, no join; see [[assigned]].
    */
  def ivfAssign(vectors: DataFrame, idCol: String, vecCol: String,
                centroids: DataFrame): DataFrame =
    assigned(vectors, idCol, vecCol, centroids).select("id", "cell")

  /** Centroid table from the corpus itself: every `stride`-th vector.
    * Deterministic k-means INIT (and a zero-cost stand-in where training
    * isn't needed — the oracle-checked queries use it directly so the
    * cell structure stays reproducible in SQL).
    */
  def strideCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      stride: Int): DataFrame =
    corpus.filter(pmod(col(idCol), lit(stride)) === 0)
      .select((col(idCol) / stride).cast("long").as("cid"), col(vecCol).as("cvec"))

  /** Lloyd's k-means over cosine assignment: iterate
    * (assign to nearest centroid) → (new centroid = elementwise mean of
    * the cell). Each iteration is ONE broadcast join + ONE hash aggregate
    * over the corpus — the canonical Spark k-means shape: centroids
    * (k × dim doubles) stay driver-small and broadcast, the corpus is
    * never collected, and the per-cell mean is a map-side-combinable
    * aggregate of element-wise vector sums. Deterministic given the
    * deterministic init ([[strideCentroids]]); empty cells keep their
    * previous centroid.
    */
  def kMeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      init: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 0)
    val spark = corpus.sparkSession
    import spark.implicits._
    var centroids = init.select(col("cid"), col("cvec")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val dim = centroids.head._2.length
    for (_ <- 0 until iterations) {
      val cDf = centroids.toSeq.toDF("cid", "cvec")
      // element-wise sum + count per cell: aggregate the vector column by
      // folding each row's array into a running sum array (hash aggregate
      // over `cell`, partial aggregation map-side). Assignment is a
      // projection on the same rows, so no corpus self-join by id.
      val sums = assigned(corpus, idCol, vecCol, cDf)
        .groupBy("cell")
        .agg(count(lit(1)).as("n"),
          array((0 until dim).map(i =>
            sum(element_at(col("__v"), i + 1).cast("double")).as(s"s$i")): _*).as("vsum"))
        .collect()
      val updated = sums.map { r =>
        val cell = r.getAs[Long]("cell")
        val n = r.getAs[Long]("n").toDouble
        val mean = r.getSeq[Double](r.fieldIndex("vsum")).map(s => (s / n).toFloat).toArray
        cell -> mean
      }.toMap
      centroids = centroids.map { case (cid, old) => cid -> updated.getOrElse(cid, old) }
    }
    centroids.toSeq.toDF("cid", "cvec")
  }

  /** Deterministic ±1 random hyperplanes for sign-LSH, derived from a
    * seeded LCG — reproducible across runs/retries like everything else
    * here. Returned as one literal column of `planes` arrays (dim-sized),
    * embedded in the plan (planes × dim ints — driver-small).
    * `private[graft]` so the q39 oracle generator can embed the SAME
    * planes as SQL literals (±1 values are exact in any numeric type,
    * which is what makes sign-LSH oracle-checkable).
    */
  private[graft] def hyperplanes(numPlanes: Int, dim: Int, seed: Long): Seq[Array[Float]] = {
    var s = seed
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    Seq.fill(numPlanes)(Array.fill(dim)(if (next() >= 0) 1.0f else -1.0f))
  }

  /** (id, band, bandKey) sign-LSH bucket table: bit j = sign(v·h_j),
    * bits grouped into bands of `bandBits`. Vectors with small angles
    * agree on many bits, so they collide in ≥1 band w.h.p. — the bucket
    * join is the candidate generator, shuffled by (band, bandKey), never
    * all-pairs.
    */
  def hyperplaneBands(vectors: DataFrame, idCol: String, vecCol: String,
                      dim: Int, numPlanes: Int, bandBits: Int,
                      seed: Long = 42L): DataFrame = {
    require(numPlanes % bandBits == 0)
    val planes = hyperplanes(numPlanes, dim, seed)
    // One compiled dot product per plane against a literal float array —
    // NOT a dim-term element_at Add-chain, which would materialize
    // planes×dim expression nodes per row and blow up codegen.
    val bitCols = planes.zipWithIndex.map { case (h, j) =>
      val dot = graft.functions.dotProductF(col(vecCol), graft.functions.litFloatArray(h))
      when(dot >= 0, lit(1L << (j % bandBits))).otherwise(0L).as(s"__b$j")
    }
    val withBits = vectors.select(col(idCol).as("id") +: bitCols: _*)
    val numBands = numPlanes / bandBits
    val bands = (0 until numBands).map { b =>
      val key = (0 until bandBits).map(r => col(s"__b${b * bandBits + r}")).reduce(_ + _)
      struct(lit(b).as("band"), key.as("bandKey"))
    }
    withBits.select(col("id"), explode(array(bands: _*)).as("__s"))
      .select(col("id"), col("__s.band").as("band"), col("__s.bandKey").as("bandKey"))
  }

  /** Sign-LSH top-k: bucket-join candidates (vectors sharing ≥1 LSH band
    * with the query), exact cosine rerank within candidates. The
    * LSH-bucketed alternative to [[ivfTopK]]: probabilistic recall
    * (tunable via planes/bandBits — more, shorter bands ⇒ higher recall,
    * more candidates) instead of IVF's deterministic cell restriction.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, dim: Int, k: Int,
              numPlanes: Int = 64, bandBits: Int = 8): DataFrame = {
    val cBands = hyperplaneBands(corpus, idCol, vecCol, dim, numPlanes, bandBits)
      .withColumnRenamed("id", "nid")
    val qBands = hyperplaneBands(queries, idCol, vecCol, dim, numPlanes, bandBits)
      .withColumnRenamed("id", "qid")
    val cands = qBands.join(cBands, Seq("band", "bandKey"))
      .filter(col("qid") =!= col("nid"))
      .select("qid", "nid").distinct()
    val q = withNorm(queries, idCol, vecCol, "qid", "__qv", "__qn")
    val c = withNorm(corpus, idCol, vecCol, "nid", "__cv", "__cn")
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("nid"))
    cands.join(broadcast(q), "qid").join(c, "nid")
      .withColumn("cos", cosFromNorms(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"), col("cos"))
  }

  /** IVF top-k: queries probe their nProbe nearest cells, exact rerank
    * within probed cells only. Approximate by construction (cross-cell
    * neighbors are unreachable) but fully deterministic, so results are
    * reproducible and oracle-checkable.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
              idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val corpusCells = assigned(corpus, idCol, vecCol, centroids)
      .select(col("id").as("nid"), col("__v").as("__cv"),
        col("__n").as("__cn"), col("cell"))
    val q = withNorm(queries, idCol, vecCol, "qid", "__qv", "__qn")
    val cn = centroids.select(col("cid"), col("cvec"),
      graft.functions.l2NormF(col("cvec")).as("__ccn"))
    val probeW = Window.partitionBy("qid").orderBy(desc("__pcos"), col("cid"))
    val probed = q.crossJoin(broadcast(cn))
      .withColumn("__pcos", cosFromNorms(col("__qv"), col("cvec"), col("__qn"), col("__ccn")))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nProbe)
      .select(col("qid"), col("__qv"), col("__qn"), col("cid").as("cell"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("nid"))
    probed.join(corpusCells, "cell")
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosFromNorms(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"), col("cos"))
  }

  /** Recall@k of an approximate neighbor table against the exact one: per
    * query, the fraction of `exact`'s ids that `approx` also returned.
    * The evaluation harness for choosing IVF/LSH parameters — run it on a
    * sampled query set, not the full corpus.
    *
    * Both inputs are (qidCol, idCol, ...) top-k tables. One equi-join on
    * (query, neighbor) + one tiny aggregate; every exact query id appears
    * in the output even at zero hits (left join).
    */
  def recallAtK(exact: DataFrame, approx: DataFrame, qidCol: String,
                idCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val e = exact.select(col(qidCol).as("qid"), col(idCol).as("__nid"))
    val a = approx.select(col(qidCol).as("qid"), col(idCol).as("__nid"),
      lit(1L).as("__hit"))
    e.join(a, Seq("qid", "__nid"), "left")
      .groupBy("qid")
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("hits"))
      .select(col("qid"), col("hits"),
        (col("hits").cast("double") / k).as(s"recall_at_$k"))
  }

  /** Simplified silhouette per cluster cell — the clustering-quality
    * number read before trusting an IVF/k-means partitioning: with
    * cosine distance d = 1 − cos, a point's score is
    *
    *   s = (b − a) / max(a, b) = (c1 − c2) / (1 − c2)
    *
    * where c1 ≥ c2 are its top-2 centroid cosines (a = distance to its
    * OWN — nearest — centroid, b = to the nearest OTHER centroid; since
    * a ≤ b the max is b, giving the closed form). s ∈ [0, 1] under this
    * assignment; higher = tighter cells. This is the "simplified"
    * (centroid-based) silhouette — the classic all-pairs silhouette is
    * O(n²) and dead at corpus scale, while this one costs exactly one
    * assignment pass.
    *
    * Scale shape: corpus × broadcast centroid table (k-fanout is
    * map-side), top-2 via a per-id aggregate whose map-side partial
    * collapses each id's k rows inside its task — the shuffle carries
    * one small row per point. Per-point scores are quantized to
    * fixed-point floor(s·2²⁰) BIGINTs so the per-cell mean is an exact
    * integer sum with one final division ([[EmbeddingStats]]
    * discipline — no float-accumulation order anywhere).
    *
    * Points whose score is undefined are dropped: zero-norm vectors
    * (every cosine NULL) and points whose second-best cosine is exactly
    * 1.0 (duplicate centroids — b = 0). Requires ≥ 2 centroids (with 1,
    * every point drops and the result is empty).
    *
    * @return (cell, n, sil_sum_fp, mean_sil) — mean_sil =
    *         sil_sum_fp / (n·2²⁰), one division
    */
  def silhouetteByCell(corpus: DataFrame, idCol: String, vecCol: String,
                       centroids: DataFrame): DataFrame = {
    val cs = centroids.select(col("cid").cast("long").as("__cid"),
      col("cvec"), graft.functions.l2NormF(col("cvec")).as("__cn"))
    val pts = withNorm(corpus, idCol, vecCol, "id", "__v", "__n")
    val pairs = pts.crossJoin(broadcast(cs))
      .select(col("id"),
        cosFromNorms(col("__v"), col("cvec"), col("__n"), col("__cn"))
          .as("__cos"),
        col("__cid"))
      .filter(col("__cos").isNotNull)
    val top = pairs.groupBy("id")
      .agg(slice(sort_array(collect_list(struct(col("__cos").as("c"),
        (-col("__cid")).as("nc"))), asc = false), 1, 2).as("t2"))
      .select(col("id"), (-col("t2")(0)("nc")).as("cell"),
        col("t2")(0)("c").as("c1"),
        when(size(col("t2")) >= 2, col("t2")(1)("c")).as("c2"))
    top
      .filter(col("c2") < lit(1.0)) // also drops NULL c2 (k = 1)
      .select(col("cell"),
        floor(((col("c1") - col("c2")) / (lit(1.0) - col("c2"))) *
          lit(1048576L)).cast("long").as("__sq"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n"), sum("__sq").as("sil_sum_fp"))
      .withColumn("mean_sil", col("sil_sum_fp").cast("double") /
        (col("n").cast("double") * lit(1048576.0)))
  }

  /** Mean reciprocal rank of the first RELEVANT hit per query — the
    * retrieval-eval headline beside [[recallAtK]]'s coverage number.
    *
    * Determinism discipline: reciprocal ranks are FIXED-POINT BIGINTs
    * (10⁹ div rank — same convention as [[Valuation.knnShapley]]), so
    * the mean is an exact integer sum with one final division; no
    * float-accumulation order anywhere, hash-checkable cross-engine.
    * Queries with NO relevant hit in their list contribute 0 (the
    * standard MRR convention), counted in `n_queries`.
    *
    * Scale shape: one min-aggregate by query (map-side combinable; the
    * ranked input is already top-k-bounded per query), then one global
    * one-row aggregate.
    *
    * @param ranked   per-query ranked results: (qidCol, rankCol 1-based,
    *                 relevance rows pre-joined)
    * @param relevant boolean Column on `ranked`
    * @return one row: (n_queries, mrr_num, mrr) with
    *         mrr = mrr_num / (10⁹ · n_queries)
    */
  def mrrFixedPoint(ranked: DataFrame, qidCol: String, rankCol: String,
                    relevant: Column): DataFrame = {
    val Scale = 1000000000L
    ranked.groupBy(col(qidCol))
      .agg(min(when(relevant, col(rankCol))).as("__first"))
      .agg(count(lit(1)).as("n_queries"),
        sum(coalesce(expr(s"${Scale}L div __first"), lit(0L))).as("mrr_num"))
      .select(col("n_queries"), col("mrr_num"),
        (col("mrr_num").cast("double") /
          (col("n_queries") * Scale).cast("double")).as("mrr"))
  }

  /** Fixed-point log2 discounts for nDCG ranks 1..k — computed ONCE at
    * plan-build time on the driver (`round(10⁹/log₂(r+1))`), so the
    * irrational log never executes inside either engine: both the plan
    * and the SQL oracle carry the same k literal BIGINTs.
    */
  def ndcgDiscounts(k: Int): Seq[Long] =
    (1 to k).map(r => math.round(1e9 / (math.log(r + 1.0) / math.log(2.0))))

  /** Per-query nDCG@k with binary relevance — the position-weighted
    * retrieval-eval headline beside [[recallAtK]] and [[mrrFixedPoint]].
    *
    * DCG numerators are exact BIGINT dot products of the 0/1 gains with
    * the [[ndcgDiscounts]] literals; the ideal ranking packs every
    * relevant hit first (binary gains ⇒ ideal discount of the i-th
    * relevant doc is D(i)), so IDCG is the same integer sum over the
    * per-query relevant-rank row numbers. One double division per query
    * at the end; queries with NO relevant hit emit NULL ndcg (undefined,
    * not silently 0 — the caller decides). No cross-query float
    * aggregation: the standard per-query table IS the output.
    *
    * Scale shape: input is top-k-bounded per query; the ideal-rank
    * window holds ≤ k rows per query; one hash aggregate by query id.
    */
  def ndcgFixedPoint(ranked: DataFrame, qidCol: String, rankCol: String,
                     relevant: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val dArr = array(ndcgDiscounts(k).map(lit): _*)
    val wIdeal = Window.partitionBy(qidCol).orderBy(desc("__g"), col(rankCol))
    ranked.filter(col(rankCol) <= k)
      .withColumn("__g", when(relevant, 1L).otherwise(0L))
      .withColumn("__ir", row_number().over(wIdeal))
      .groupBy(col(qidCol))
      .agg(sum(col("__g")).as("n_rel"),
        sum(col("__g") * element_at(dArr, col(rankCol).cast("int")))
          .as("dcg_num"),
        sum(col("__g") * element_at(dArr, col("__ir"))).as("idcg_num"))
      .select(col(qidCol), col("n_rel"), col("dcg_num"), col("idcg_num"),
        when(col("idcg_num") > 0L,
          col("dcg_num").cast("double") / col("idcg_num").cast("double"))
          .as(s"ndcg_at_$k"))
  }

  /** Margin-based bitext mining (the CCMatrix/LASER parallel-corpus
    * miner): candidate pair (s, t) is scored not by raw cosine — which
    * rewards "hubness" vectors similar to everything — but by the RATIO
    * of the pair's cosine to the mean of each side's top-k neighborhood:
    *
    *   margin(s, t) = cos(s, t) / ((avgTopK(s→T) + avgTopK(t→S)) / 2)
    *
    * Each source keeps its best-margin target, thresholded; margin > 1
    * means "closer than either side's typical neighbor".
    *
    * Scale/determinism shape:
    *   - ONE scored pass (broadcast source set × target corpus) is
    *     cached and feeds all three uses — pairs, s-side neighborhoods,
    *     t-side neighborhoods — so vectors are dotted exactly once;
    *   - the top-k means fold a rank-SORTED collected array (≤ k values
    *     per side, bounded window state), not a float sum() whose
    *     partial-merge order varies — bit-stable cross-engine;
    *   - margins are a mirrored scalar tail on the cos values the q29
    *     oracle already reproduces exactly.
    * For query sets beyond the broadcast threshold, swap the scored pass
    * for the IVF-probed candidate plan (q30) — the margin tail is
    * unchanged.
    *
    * @return (sid, tid, cos, margin) — best target per source with
    *         margin ≥ threshold, ordered by sid
    */
  def marginMining(src: DataFrame, tgt: DataFrame, idCol: String,
                   vecCol: String, k: Int, threshold: Double): DataFrame = {
    require(k > 0, "k must be positive")
    val s = withNorm(src, idCol, vecCol, "sid", "__sv", "__sn")
    val t = withNorm(tgt, idCol, vecCol, "tid", "__tv", "__tn")
    val scored = CacheScope.track(
      t.crossJoin(broadcast(s))
        .withColumn("cos",
          cosFromNorms(col("__sv"), col("__tv"), col("__sn"), col("__tn")))
        .select("sid", "tid", "cos"))
    // mean of the top-k cos per side, folded in rank order so the double
    // sum has ONE defined association order on both engines
    def topKMean(part: String, other: String, outCol: String) = {
      val w = Window.partitionBy(part).orderBy(desc("cos"), col(other))
      scored.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k)
        .groupBy(part)
        .agg({
          val sorted = array_sort(collect_list(struct(col("__rn"), col("cos"))))
          (aggregate(transform(sorted, x => x.getField("cos")),
            lit(0.0), (acc, x) => acc + x) /
            size(sorted).cast("double")).as(outCol)
        })
    }
    val sAvg = topKMean("sid", "tid", "s_avg")
    val tAvg = topKMean("tid", "sid", "t_avg")
    val withMargin = scored
      .join(broadcast(sAvg), "sid")
      .join(broadcast(tAvg), "tid")
      .withColumn("margin", col("cos") / ((col("s_avg") + col("t_avg")) / 2.0))
    val w = Window.partitionBy("sid").orderBy(desc("margin"), col("tid"))
    withMargin.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1 && col("margin") >= threshold)
      .select(col("sid"), col("tid"), col("cos"), col("margin"))
  }

  /** Contrastive training triplets (anchor, positive, negative):
    * positives come in as a mined pair list (near-dup pairs, bitext
    * pairs, click pairs); negatives are drawn by BUCKETED deterministic
    * sampling — the corpus is hashed once into `buckets` buckets, each
    * bucket keeps its two smallest-hash members as representatives, and
    * an anchor takes its hash bucket's first representative that is
    * neither itself nor its positive (the second covers the collision;
    * the rare bucket holding exactly {anchor, positive} yields no
    * triplet and is dropped). This is the RANDOM-negative generator —
    * [[hardNegatives]] is the similarity-aware sibling; real recipes mix
    * both.
    *
    * Scale shape: one corpus pass shuffled by bucket key (top-2 rank
    * window, per-group state of two rows), then the 2·buckets-row rep
    * table broadcasts into a map-side join against the pair list — the
    * pair stream never shuffles, and "random" choice is a pure function
    * of the anchor id (reproducible across runs/engines, stable under
    * repartitioning — the sampling contract everything else here obeys).
    *
    * @param pairs (i, j) positive pairs — i is the anchor
    * @return (anchor, positive, negative)
    */
  def contrastiveTriplets(pairs: DataFrame, corpus: DataFrame, idCol: String,
                          buckets: Int = 64): DataFrame = {
    require(buckets > 0)
    val reps = corpus.select(col(idCol).as("__rid"))
      .withColumn("__b", Sampling.hashBucket(col("__rid"), buckets))
      .withColumn("__h", Sampling.hashBucket(col("__rid"), 1000000))
    val top2 = reps
      .withColumn("__rk", row_number().over(
        Window.partitionBy("__b").orderBy(col("__h"), col("__rid"))))
      .filter(col("__rk") <= 2)
    val r1 = top2.filter(col("__rk") === 1).select(col("__b"), col("__rid").as("__r1"))
    val r2 = top2.filter(col("__rk") === 2).select(col("__b"), col("__rid").as("__r2"))
    pairs.select(col("i").as("anchor"), col("j").as("positive"))
      .withColumn("__b", Sampling.hashBucket(col("anchor"), buckets))
      .join(broadcast(r1), Seq("__b"), "left")
      .join(broadcast(r2), Seq("__b"), "left")
      .withColumn("negative",
        when(col("__r1") =!= col("anchor") && col("__r1") =!= col("positive"),
          col("__r1"))
          .when(col("__r2") =!= col("anchor") && col("__r2") =!= col("positive"),
            col("__r2")))
      .filter(col("negative").isNotNull)
      .select("anchor", "positive", "negative")
  }
}
