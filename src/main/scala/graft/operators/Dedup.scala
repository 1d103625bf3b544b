package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Deduplication operators for training-data pipelines: exact,
  * n-gram-Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design (the part that matters at 100 TB):
  *   - NOTHING here ever forms an all-pairs cartesian product. Candidate
  *     generation always goes through an equi-join key — the text itself
  *     (exact), a shared shingle (inverted index), a MinHash band hash, a
  *     SimHash band, or an IVF cell — so Spark shuffles by that key and
  *     each bucket joins locally.
  *   - Verification (exact Jaccard / cosine) runs per candidate pair, a
  *     narrow projection after the join.
  *   - Signatures are per-document projections (narrow, codegen'd); the
  *     only shuffles are the candidate-join ones.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact-duplicate statistics per group column (hash-groupBy shape:
    * one shuffle on the group key).
    */
  def exactStats(docs: DataFrame, text: Column, groupCols: Column*): DataFrame =
    docs.groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(text).as("n_distinct"),
        (count(lit(1)) - countDistinct(text)).as("n_dup_docs"))

  /** Keep the lowest-id row per exact text value. Shuffles once by text
    * (hash of the full string — at scale, substitute md5(text) as the
    * shuffle key to bound key width).
    */
  def exactDedup(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(textCol)).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  // ----------------------------------------------------- shingle helpers

  /** Distinct word n-gram shingles of a text column. */
  def shingleSet(text: Column, n: Int): Column =
    array_distinct(graft.functions.shingles(graft.functions.tokens(text), n))

  /** docs ⇒ (id, shingle) exploded long table — the inverted-index side. */
  private def explodedShingles(docs: DataFrame, idCol: String, textCol: String,
                               n: Int): DataFrame =
    docs.select(col(idCol).as("__id"),
      explode(shingleSet(col(textCol), n)).as("__sh"))

  /** Exact Jaccard for candidate pairs carried as (i, j) against per-doc
    * distinct shingle arrays: |A∩B| / (|A|+|B|-|A∩B|), int-exact then one
    * double division (bit-identical in any engine).
    */
  private def verifyJaccard(cands: DataFrame, docs: DataFrame, idCol: String,
                            textCol: String, n: Int, threshold: Double): DataFrame = {
    val sets = docs.select(col(idCol).as("__vid"),
      shingleSet(col(textCol), n).as("__set"))
    cands
      .join(sets.select(col("__vid").as("i"), col("__set").as("__si")), "i")
      .join(sets.select(col("__vid").as("j"), col("__set").as("__sj")), "j")
      .withColumn("common", size(array_intersect(col("__si"), col("__sj"))).cast(LongType))
      .withColumn("jaccard", col("common").cast(DoubleType) /
        (size(col("__si")) + size(col("__sj")) - col("common")).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select(col("i"), col("j"), col("common"), col("jaccard"))
  }

  // ------------------------------------------------- n-gram Jaccard (exact)

  /** Exact n-gram-Jaccard near-duplicate pairs via inverted-index join:
    * docs sharing ≥1 shingle are candidates (equi-join on the shingle —
    * shuffle by shingle, never all-pairs), then exact verification.
    * At 100 TB add prefix filtering (only the rarest few shingles per doc
    * as index keys) to cap the candidate fan-out; semantics identical.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double): DataFrame = {
    val ex = explodedShingles(docs, idCol, textCol, n)
    val cands = ex.select(col("__id").as("i"), col("__sh"))
      .join(ex.select(col("__id").as("j"), col("__sh")), "__sh")
      .filter(col("i") < col("j"))
      .select("i", "j").distinct()
    verifyJaccard(cands, docs, idCol, textCol, n, threshold)
  }

  // ------------------------------------------------------- MinHash + LSH

  /** MinHash signature columns: k universal-hash permutations
    * min((a_k·h + b_k) mod p) over the doc's shingle hashes. Deterministic
    * seeds; xxhash64 base hash (engine-internal only — correctness is
    * established by the exact-Jaccard verification pass, so the base hash
    * never needs cross-engine portability).
    */
  private val MinhashP = 2038074743L

  private def perms(k: Int): Seq[(Long, Long)] = {
    // Deterministic LCG-derived (a,b) pairs, a ≠ 0.
    var s = 42L
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); math.abs(s % (MinhashP - 1)) }
    (0 until k).map(_ => (next() + 1, next()))
  }

  /** (id, band, bandKey) LSH bucket table: k minhashes split into bands of
    * r rows, each band hashed to one key. Near-dup docs (J≈1) collide in
    * ≥1 band w.p. 1-(1-J^r)^(k/r) ≈ 1; the bucket join shuffles by
    * (band, bandKey) — no cartesian product anywhere.
    */
  def minhashBands(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, numHashes: Int, bandRows: Int): DataFrame = {
    val ex = explodedShingles(docs, idCol, textCol, n)
      .withColumn("__h", pmod(xxhash64(col("__sh")), lit(MinhashP)))
    val ps = perms(numHashes)
    val aggExprs = ps.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("__h") * a + b, lit(MinhashP))).as(s"__m$i")
    }
    val sig = ex.groupBy("__id").agg(aggExprs.head, aggExprs.tail: _*)
    val numBands = numHashes / bandRows
    val bands = (0 until numBands).map { bIdx =>
      val slice = (0 until bandRows).map(r => col(s"__m${bIdx * bandRows + r}"))
      struct(lit(bIdx).as("band"),
        xxhash64(concat_ws(",", slice: _*)).as("bandKey"))
    }
    sig.select(col("__id"), explode(array(bands: _*)).as("__b"))
      .select(col("__id"), col("__b.band").as("band"), col("__b.bandKey").as("bandKey"))
  }

  /** MinHash-LSH near-duplicate pairs: band-bucket candidate join, then
    * exact-Jaccard verification at `threshold`. The verify pass makes the
    * output equal to the exact all-pairs answer whenever LSH recall holds
    * (k=64, r=4 ⇒ recall >0.9999 at J≥0.8), with LSH only pruning the
    * quadratic candidate space.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, threshold: Double = 0.5,
                      numHashes: Int = 64, bandRows: Int = 4): DataFrame = {
    val bands = minhashBands(docs, idCol, textCol, n, numHashes, bandRows)
    val cands = bands.select(col("__id").as("i"), col("band"), col("bandKey"))
      .join(bands.select(col("__id").as("j"), col("band"), col("bandKey")),
        Seq("band", "bandKey"))
      .filter(col("i") < col("j"))
      .select("i", "j").distinct()
    verifyJaccard(cands, docs, idCol, textCol, n, threshold)
  }

  // ------------------------------------------------------------- SimHash

  /** SimHash near-duplicate pairs: 16-bit portable simhash, banded into 4
    * nibbles. Any pair within Hamming distance ≤ 3 shares ≥1 identical
    * nibble (pigeonhole), so the nibble equi-join has TOTAL recall for
    * maxHamming ≤ 3 — this is exact, not probabilistic, dedup.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 2): DataFrame = {
    require(maxHamming <= 3, "4 nibble bands only guarantee recall for hamming <= 3")
    val withSig = docs.select(col(idCol).as("__id"),
      TextAnalysis.simHash(col(textCol)).as("__sig"))
    val nibbles = withSig.select(col("__id"), col("__sig"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          pmod(floor(col("__sig").cast(DoubleType) / math.pow(16.0, b)).cast(LongType),
            lit(16L)).as("nib"))): _*)).as("__b"))
      .select(col("__id"), col("__sig"), col("__b.band").as("band"), col("__b.nib").as("nib"))
    nibbles.select(col("__id").as("i"), col("__sig").as("__si"), col("band"), col("nib"))
      .join(nibbles.select(col("__id").as("j"), col("__sig").as("__sj"), col("band"), col("nib")),
        Seq("band", "nib"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"),
        bit_count(col("__si").bitwiseXOR(col("__sj"))).cast(LongType).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------- embedding-cosine near-dup

  /** Embedding near-duplicate pairs restricted to IVF cells: vectors are
    * assigned to their nearest coarse centroid (broadcast join — centroids
    * are small), pairs are generated within cells only (equi-join on the
    * cell id), then cosine-verified. Deterministic and reproducible; the
    * cell restriction is the documented approximation (same-cell recall),
    * which is what makes it linear-ish instead of quadratic at scale.
    */
  def embeddingDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
                        centroids: DataFrame, threshold: Double): DataFrame = {
    val cells = Similarity.ivfAssign(vectors, idCol, vecCol, centroids)
    val sides = cells.join(vectors.select(col(idCol).as("__cid"), col(vecCol).as("__v")),
      col("id") === col("__cid"))
      .select(col("id"), col("cell"), col("__v"))
    sides.select(col("id").as("i"), col("cell"), col("__v").as("__vi"))
      .join(sides.select(col("id").as("j"), col("cell"), col("__v").as("__vj")), "cell")
      .filter(col("i") < col("j"))
      .withColumn("cos", graft.functions.cosineSimilarity(col("__vi"), col("__vj")))
      .filter(col("cos") >= threshold)
      .select("i", "j", "cos")
  }
}
