package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents whose n-gram shingle
  * overlap with any document of an evaluation benchmark exceeds a
  * threshold — the scrub a training-data pipeline runs so the model is not
  * trained on its own test set.
  *
  * Scale shape (the asymmetry is the whole design): the corpus is the
  * 100 TB side, the benchmark is MBs by definition — so the benchmark's
  * inverted shingle index is explicitly `broadcast()`, and the corpus side
  * is ONE narrow map pass (shingle kernel → explode → broadcast hash join)
  * with NO shuffle of corpus data at all. The only shuffle is the
  * per-(doc, benchmark) overlap count over rows that actually matched, a
  * vanishingly small fraction of the corpus, reduced further by map-side
  * combine. A shuffle join here (or worse, shingling the corpus into a
  * shared index) would move the whole corpus to find a handful of hits.
  *
  * Overlap metric: |S_doc ∩ S_bench| / |S_bench| — the fraction of the
  * BENCHMARK's distinct shingles found in the document (a tiny doc cannot
  * dodge detection by diluting the denominator, and a doc containing a
  * full benchmark question scores 1.0 regardless of its own length).
  */
object Decontaminate {

  private def hashedShingleSet(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    toColumn(graft.expressions.NgramHashSet(toExpression(text), n))
  }

  /** Per corpus document: the best-matching benchmark doc (max overlap
    * fraction, ties to the smallest benchmark id), its common-shingle
    * count and fraction, and the contamination flag. Documents with zero
    * overlap keep a NULL bench_id and 0 scores. Output columns:
    * (idCol, bench_id, common, frac, contaminated).
    */
  def benchmarkOverlap(corpus: DataFrame, corpusId: String, corpusText: String,
                       benchmark: DataFrame, benchId: String, benchText: String,
                       n: Int, threshold: Double): DataFrame = {
    val bIndex = broadcast(
      benchmark.select(col(benchId).as("__bid"),
        hashedShingleSet(col(benchText), n).as("__bset"))
        .select(col("__bid"), size(col("__bset")).as("__bn"),
          explode(col("__bset")).as("__sh")))
    val hits = corpus
      .select(col(corpusId).as("__id"),
        explode(hashedShingleSet(col(corpusText), n)).as("__sh"))
      .join(bIndex, "__sh")
      .groupBy("__id", "__bid", "__bn")
      .agg(count(lit(1)).as("__common"))
      .withColumn("__frac", col("__common").cast("double") / col("__bn"))
    // argmax per doc as a combinable struct-max (frac desc, then smallest
    // bench id via the negated field) — no per-doc window, no extra sort.
    val best = hits.groupBy("__id")
      .agg(max(struct(col("__frac").as("f"), (-col("__bid")).as("nb"),
        col("__bid").as("bid"), col("__common").as("common"))).as("__m"))
    corpus.select(col(corpusId))
      .join(best, col(corpusId) === col("__id"), "left")
      .select(col(corpusId),
        col("__m.bid").as("bench_id"),
        coalesce(col("__m.common"), lit(0L)).as("common"),
        coalesce(col("__m.f"), lit(0.0)).as("frac"),
        (coalesce(col("__m.f"), lit(0.0)) >= threshold).cast("long")
          .as("contaminated"))
  }

  /** SEMANTIC decontamination — the embedding-space sibling of
    * [[benchmarkOverlap]] for the leakage n-gram scrubbing misses:
    * paraphrased or translated benchmark items share no shingles but sit
    * next to the benchmark in embedding space. Flag = max cosine against
    * ANY benchmark vector ≥ threshold.
    *
    * Same asymmetry, same shape: the benchmark embedding set is MBs by
    * definition, so it broadcasts, and the corpus side is one map pass —
    * score k·|benchmark| dot products per corpus vector, keep the
    * argmax as a combinable struct-max. No corpus shuffle, no window;
    * the only aggregate is per-corpus-id over its own |benchmark| scored
    * rows. Dot/norm arithmetic is the q29 kernel, so cosines (and the
    * threshold comparison on them) are oracle-exact.
    *
    * @return (idCol, bench_id, cos, contaminated) — bench_id NULL and
    *         cos 0.0 when the benchmark side is empty
    */
  def semanticOverlap(corpus: DataFrame, corpusId: String, corpusVec: String,
                      benchmark: DataFrame, benchId: String, benchVec: String,
                      threshold: Double): DataFrame = {
    val b = broadcast(benchmark.select(col(benchId).as("__bid"),
      col(benchVec).as("__bv"),
      graft.functions.l2NormF(col(benchVec)).as("__bn")))
    val scored = corpus
      .select(col(corpusId).as("__id"), col(corpusVec).as("__cv"),
        graft.functions.l2NormF(col(corpusVec)).as("__cn"))
      .crossJoin(b)
      .withColumn("__cos",
        when(col("__cn") * col("__bn") =!= 0.0,
          graft.functions.dotProductF(col("__cv"), col("__bv")) /
            (col("__cn") * col("__bn"))))
      .filter(col("__cos").isNotNull)
    val best = scored.groupBy("__id")
      .agg(max(struct(col("__cos").as("c"), (-col("__bid")).as("nb"),
        col("__bid").as("bid"))).as("__m"))
    corpus.select(col(corpusId))
      .join(best, col(corpusId) === col("__id"), "left")
      .select(col(corpusId),
        col("__m.bid").as("bench_id"),
        coalesce(col("__m.c"), lit(0.0)).as("cos"),
        (coalesce(col("__m.c"), lit(0.0)) >= threshold).cast("long")
          .as("contaminated"))
  }
}
