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
}
