package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion: combine the per-query rankings of
  * independent retrieval arms (dense ANN, lexical overlap, BM25, …) into
  * one fused ranking with Reciprocal Rank Fusion (Cormack, Clarke &
  * Buettcher, SIGIR 2009): `score(d) = Σ_arms 1/(c + rank_arm(d))`,
  * items absent from an arm contributing nothing.
  *
  * RRF is the standard fusion for hybrid search because it needs no
  * score calibration across arms — only ranks — which also makes it
  * oracle-friendly: ranks are integers, and the fused score is a FIXED
  * left-to-right sum of exactly-rounded divisions (one `1.0/(c+rank)`
  * term per arm, in declaration order), so every double is reproducible
  * bit-for-bit across engines. No float aggregation happens: arms are
  * aligned by full-outer equi-join on (qid, id), not by groupBy-sum, so
  * Spark's partial-merge order can never leak into the result.
  *
  * Scale shape: each arm is already k-bounded per query (its own top-k
  * contract), so the join input is ≤ Σ k_arm rows per query — the fusion
  * itself shuffles only rank lists, never corpora. The per-query rank
  * window after the join sees ≤ Σ k_arm rows, bounded state at any
  * corpus size.
  */
object Fusion {

  /** Fuse named arms `(name, ranking)` — each ranking a DataFrame with
    * columns (qid, nid, rank); rank is 1-based within qid. Returns the
    * fused top-`topK` per query: (qid, rank, nid, score, r_<name>...),
    * fused rank by (score DESC, nid ASC), per-arm ranks NULL where the
    * arm did not retrieve the item.
    *
    * @param c RRF damping constant (60 in the original paper — small
    *          enough to reward top ranks, large enough that one arm's
    *          tail cannot dominate another's head).
    */
  def rrf(arms: Seq[(String, DataFrame)], c: Int = 60, topK: Int = 10): DataFrame = {
    require(arms.nonEmpty && c > 0 && topK > 0)
    require(arms.map(_._1).distinct.length == arms.length, "duplicate arm names")
    val renamed = arms.map { case (name, df) =>
      df.select(col("qid"), col("nid"), col("rank").cast("long").as(s"r_$name"))
    }
    // full-outer chain on (qid, nid): an item retrieved by ANY arm is a
    // fusion candidate; USING-style join keeps single qid/nid columns.
    val joined = renamed.reduceLeft { (a, b) =>
      a.join(b, Seq("qid", "nid"), "full_outer")
    }
    // fixed declaration-order fold: one exactly-rounded division per
    // arm, missing rank -> +0.0; bit-deterministic (no agg, no reorder).
    val score = arms.map(_._1).foldLeft(lit(0.0)) { (acc, name) =>
      acc + when(col(s"r_$name").isNotNull,
        lit(1.0) / (lit(c.toDouble) + col(s"r_$name"))).otherwise(lit(0.0))
    }
    val w = Window.partitionBy("qid").orderBy(desc("score"), col("nid"))
    val armCols = arms.map { case (name, _) => col(s"r_$name") }
    joined.withColumn("score", score)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(Seq(col("qid"), col("rank"), col("nid"), col("score")) ++ armCols: _*)
  }

  /** The lexical retrieval arm: per-query top-k corpus documents by
    * DISTINCT-token overlap |T_q ∩ T_d| (set semantics — repetition
    * inside either document does not inflate the match), ranked by
    * (overlap DESC, nid ASC), self-matches excluded.
    *
    * Scale shape: an inverted-index equi-join on the token — candidates
    * are generated per shared token and aggregated by (qid, nid), never
    * an all-pairs product. With a broadcast-small query set the join is
    * map-side; the per-query rank window sees only documents sharing at
    * least one token with the query. At web scale, stopword fan-out is
    * bounded the same way the posting-list builder bounds it: drop
    * head-of-df tokens first (a WHERE on a token-df join) — deliberately
    * not defaulted here so the overlap stays the exact set intersection
    * the oracle recomputes.
    *
    * @return (qid, nid, overlap, rank), rank ≤ k.
    */
  def tokenOverlapTopK(queries: DataFrame, corpus: DataFrame,
                       idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0)
    def toks(df: DataFrame, as: String): DataFrame =
      df.select(col(idCol).as(as),
          explode(graft.functions.tokens(col(textCol))).as("__t"))
        .distinct()
    val q = toks(queries, "qid")
    val d = toks(corpus, "nid")
    val overlap = d.join(broadcast(q), Seq("__t"))
      .filter(col("qid") =!= col("nid"))
      .groupBy("qid", "nid")
      .agg(count(lit(1)).as("overlap"))
    val w = Window.partitionBy("qid").orderBy(desc("overlap"), col("nid"))
    overlap.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("overlap"), col("rank"))
  }

  /** The rerank stage of retrieve-then-rerank: score an already-bounded
    * candidate list (qid, nid) with the EXACT cosine and keep the top-k
    * per query — fused/approximate arms propose, the precise scorer
    * disposes. Candidates are ≤ Σ k_arm per query by construction, so
    * they ride as the BROADCAST side of both id joins against the vector
    * table (the corpus streams, nothing shuffles by candidate), and the
    * per-query rank window sees only the candidate handful. Cosine is
    * the library-standard left fold (same bits as every other cosine
    * here), NULL on zero norms — those candidates drop before ranking.
    *
    * @return (qid, rank, nid, cos), rank by (cos DESC, nid ASC), ≤ k
    */
  def exactRerank(candidates: DataFrame, vectors: DataFrame,
                  idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k > 0)
    val v = vectors.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      graft.functions.l2NormF(col(vecCol)).as("__n"))
    val cand = candidates.select("qid", "nid")
    val scored = v.select(col("__id").as("qid"), col("__v").as("__qv"), col("__n").as("__qn"))
      .join(broadcast(cand), Seq("qid"))
      .join(v.select(col("__id").as("nid"), col("__v").as("__cv"), col("__n").as("__cn")),
        Seq("nid"))
      .withColumn("cos",
        when(col("__qn") * col("__cn") =!= 0.0,
          graft.functions.dotProductF(col("__qv"), col("__cv")) /
            (col("__qn") * col("__cn"))))
      .filter(col("cos").isNotNull)
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("nid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cos"))
  }
}
