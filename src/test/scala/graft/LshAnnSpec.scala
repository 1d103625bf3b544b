package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Sign-LSH ANN over the real sf0.001 embeddings: deterministic recall
  * against the exact brute-force baseline (fixed data + fixed seeded
  * hyperplanes ⇒ the measured recall is a constant, not a flaky bound).
  */
class LshAnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val queries = emb.filter($"vec_id" < 10)

  test("lshTopK: no cartesian product, candidates via band equi-join") {
    val top = Similarity.lshTopK(queries, emb, "vec_id", "embedding",
      dim = 64, k = 5)
    val plan = top.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"must bucket-join:\n$plan")
    assert(top.count() > 0)
  }

  test("lshTopK recall vs brute force is substantial and deterministic") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "nid").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 5))
    val lsh1 = pairs(Similarity.lshTopK(queries, emb, "vec_id", "embedding", 64, 5))
    val lsh2 = pairs(Similarity.lshTopK(queries, emb, "vec_id", "embedding", 64, 5))
    assert(lsh1 === lsh2, "seeded hyperplanes must make results reproducible")
    val recall = (lsh1 intersect exact).size.toDouble / exact.size
    // Embeddings here are near-orthogonal (max cos ≈ 0.5), the hardest ANN
    // regime: with 8-bit bands the per-band match probability for a
    // cos≈0.4 neighbor is ~0.65^8 ≈ 0.03, so recall ≈ 1-(1-0.03)^8 ≈ 0.16
    // (measured exactly that). Shorter bands push recall up at the cost of
    // more candidates:
    assert(recall >= 0.1, s"recall=$recall")
    val lshWide = pairs(Similarity.lshTopK(queries, emb, "vec_id", "embedding",
      64, 5, numPlanes = 64, bandBits = 4))
    val recallWide = (lshWide intersect exact).size.toDouble / exact.size
    assert(recallWide >= recall, s"shorter bands must not lower recall " +
      s"($recallWide < $recall)")
    assert(recallWide >= 0.6, s"recallWide=$recallWide")
  }

  test("marginMining: hubness-corrected winners, one row per surviving source") {
    // s0 aligns with t0, s1 with t1; t2 is a "hub" moderately close to
    // both sources — raw cosine never prefers it here, and the margin
    // ratio demotes it further (its own strong neighborhood inflates the
    // denominator). k=1 makes the expected margins hand-computable.
    val src = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val tgt = Seq((10L, Array(1f, 0.1f)), (11L, Array(0.1f, 1f)),
      (12L, Array(0.7f, 0.7f))).toDF("vec_id", "embedding")
    val out = Similarity.marginMining(src, tgt, "vec_id", "embedding",
      k = 1, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(out.map(t => (t._1, t._2)).toSeq === Seq((0L, 10L), (1L, 11L)))
    // best-pair margin is exactly cos/((cos+cos)/2) = 1.0 at k=1 when the
    // pair is both sides' top neighbor
    out.foreach { case (_, _, m) => assert(math.abs(m - 1.0) < 1e-12) }
    // a 1.0+epsilon threshold filters everything: no pair beats its own
    // neighborhood at k=1
    assert(Similarity.marginMining(src, tgt, "vec_id", "embedding",
      k = 1, threshold = 1.0000001).count() === 0)
  }

  test("contrastiveTriplets: valid, deterministic, collision-safe negatives") {
    import spark.implicits._
    val corpus = (0L until 20L).map(Tuple1(_)).toDF("id")
    val pairs = Seq((0L, 1L), (2L, 3L), (4L, 5L)).toDF("i", "j")
    def run() = Similarity.contrastiveTriplets(pairs, corpus, "id", buckets = 4)
      .orderBy("anchor").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val t1 = run()
    // every pair got a negative distinct from both members
    assert(t1.map(x => (x._1, x._2)) == Seq((0L, 1L), (2L, 3L), (4L, 5L)))
    assert(t1.forall { case (a, p, n) => n != a && n != p })
    // pure function of the inputs: identical on re-run
    assert(run() == t1)
    // 2-doc corpus whose only bucket reps are exactly {anchor, positive}
    // → no triplet rather than a degenerate one
    val tiny = Seq(Tuple1(0L), Tuple1(1L)).toDF("id")
    val deg = Similarity.contrastiveTriplets(
      Seq((0L, 1L)).toDF("i", "j"), tiny, "id", buckets = 1)
    assert(deg.count() == 0L)
  }
}
