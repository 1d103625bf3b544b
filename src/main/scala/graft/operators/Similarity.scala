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
  * Cosine arithmetic is a sequential left-fold over the array (see
  * graft.functions.dotProduct) — float×float products are exact in double
  * and the fold order matches DuckDB's list_reduce, so scores reproduce
  * bit-for-bit cross-engine.
  */
object Similarity {

  /** Exact cosine top-k: broadcast the (small) query set against the
    * corpus, score every pair, keep k per query by (cos desc, id asc).
    * Self-matches are excluded.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("__cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", graft.functions.cosineSimilarity(col("__qv"), col("__cv")))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"), col("cos"))
  }

  /** Assign every vector to its nearest centroid (cos desc, centroid id
    * tie-break). Centroids are broadcast; output is (id, cell).
    */
  def ivfAssign(vectors: DataFrame, idCol: String, vecCol: String,
                centroids: DataFrame): DataFrame = {
    val c = centroids.select(col("cid"), col("cvec"))
    val scored = vectors.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .crossJoin(broadcast(c))
      .withColumn("__cos", graft.functions.cosineSimilarity(col("__v"), col("cvec")))
    val w = Window.partitionBy("id").orderBy(desc("__cos"), col("cid"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("id"), col("cid").as("cell"))
  }

  /** Centroid table from the corpus itself: every `stride`-th vector.
    * Deterministic stand-in for k-means (which would be iterated
    * aggregations of exactly this assign step).
    */
  def strideCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      stride: Int): DataFrame =
    corpus.filter(pmod(col(idCol), lit(stride)) === 0)
      .select((col(idCol) / stride).cast("long").as("cid"), col(vecCol).as("cvec"))

  /** IVF top-k: queries probe their nProbe nearest cells, exact rerank
    * within probed cells only. Approximate by construction (cross-cell
    * neighbors are unreachable) but fully deterministic, so results are
    * reproducible and oracle-checkable.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
              idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val cells = ivfAssign(corpus, idCol, vecCol, centroids)
    val corpusCells = corpus.select(col(idCol).as("nid"), col(vecCol).as("__cv"))
      .join(cells.withColumnRenamed("id", "nid"), "nid")
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("__qv"))
    val probeW = Window.partitionBy("qid").orderBy(desc("__pcos"), col("cid"))
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("__pcos", graft.functions.cosineSimilarity(col("__qv"), col("cvec")))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nProbe)
      .select(col("qid"), col("__qv"), col("cid").as("cell"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("nid"))
    probed.join(corpusCells, "cell")
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", graft.functions.cosineSimilarity(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"), col("cos"))
  }
}
