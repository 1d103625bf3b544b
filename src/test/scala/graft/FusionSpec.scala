package graft

import graft.operators.Fusion
import org.apache.spark.sql.functions._

class FusionSpec extends SparkSpec {
  import spark.implicits._

  private def arm(rows: (Long, Long, Long)*) =
    rows.toDF("qid", "nid", "rank")

  test("rrf fuses two arms by reciprocal-rank score with nid tie-break") {
    // arm A ranks (1,2,3); arm B ranks (3,2,9): dual-arm docs 3
    // (1/63+1/61) and 2 (1/62+1/62) out-score every single-arm doc, and
    // 3's asymmetric ranks edge out 2's symmetric ones (convexity of
    // 1/(c+r)).
    val a = arm((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L))
    val b = arm((1L, 3L, 1L), (1L, 2L, 2L), (1L, 9L, 3L))
    val fused = Fusion.rrf(Seq("a" -> a, "b" -> b), c = 60, topK = 10)
      .orderBy("rank").collect()
    assert(fused.map(_.getLong(2)).take(2).toSeq == Seq(3L, 2L))
    val top = fused.head
    assert(math.abs(top.getDouble(3) - (1.0 / 63 + 1.0 / 61)) < 1e-15)
    // doc 1 (A-only, rank 1) and doc 3 (A rank 3 + B rank 1) both carry
    // their per-arm ranks; absent arms are NULL.
    val d1 = fused.find(_.getLong(2) == 1L).get
    assert(d1.getLong(4) == 1L && d1.isNullAt(5))
  }

  test("rrf equal-score ties break by ascending nid") {
    // two docs seen only by arm A at ranks 1 and 1 for different queries
    // can't tie; construct a same-query tie: docs 5 and 7 both rank 4 in
    // exactly one arm each -> equal score, nid order decides.
    val a = arm((1L, 5L, 4L))
    val b = arm((1L, 7L, 4L))
    val fused = Fusion.rrf(Seq("a" -> a, "b" -> b), c = 60, topK = 2)
      .orderBy("rank").collect()
    assert(fused.map(_.getLong(2)).toSeq == Seq(5L, 7L))
  }

  test("tokenOverlapTopK counts distinct shared tokens, excludes self") {
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha beta beta delta"),
      (2L, "alpha zeta"),
      (3L, "omega psi")).toDF("doc_id", "text")
    val top = Fusion.tokenOverlapTopK(
      docs.filter(col("doc_id") === 0), docs, "doc_id", "text", k = 5)
      .orderBy("rank").collect()
    // doc 1 shares {alpha, beta} (beta repetition not double-counted),
    // doc 2 shares {alpha}; doc 3 shares nothing and must be absent.
    assert(top.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L), (2L, 1L)))
  }

  test("rrf rejects duplicate arm names") {
    val a = arm((1L, 1L, 1L))
    intercept[IllegalArgumentException] {
      Fusion.rrf(Seq("a" -> a, "a" -> a), topK = 1)
    }
  }

  test("exactRerank: candidate set re-scored by exact cosine, zero-norm drops") {
    val vecs = Seq(
      (0L, Array(1f, 0f)),   // query
      (1L, Array(1f, 0f)),   // cos 1
      (2L, Array(0f, 1f)),   // cos 0
      (3L, Array(1f, 1f)),   // cos ~0.707
      (4L, Array(0f, 0f))    // zero norm → dropped
    ).toDF("id", "vec")
    // candidate order deliberately disagrees with cosine order
    val cand = Seq((0L, 2L), (0L, 3L), (0L, 1L), (0L, 4L)).toDF("qid", "nid")
    val got = Fusion.exactRerank(cand, vecs, "id", "vec", k = 10)
      .orderBy("rank").collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(1L, 3L, 2L))
    assert(got.head.getDouble(3) == 1.0)
  }

  test("rankBiasedOverlap: identical rankings match the closed form; disjoint give 0") {
    val a = (1L to 5L).map(i => (i, i)).toDF("id", "rank")
    val same = Fusion.rankBiasedOverlap(a, a, "id", "rank", k = 5, p = 0.9)
      .collect()(0)
    // truncated RBO at k=5 with X_d = d: sum (1-p)p^(d-1)
    val expected = (1 to 5).map(d => 0.1 * math.pow(0.9, d - 1)).sum
    assert(math.abs(same.getAs[Double]("rbo") - expected) < 1e-6)
    assert(same.getAs[Long]("overlap_at_k") === 5L)
    val b = (1L to 5L).map(i => (i + 100L, i)).toDF("id", "rank")
    val dis = Fusion.rankBiasedOverlap(a, b, "id", "rank", k = 5, p = 0.9)
      .collect()(0)
    assert(dis.getAs[Long]("rbo_fp") === 0L)
    assert(dis.getAs[Double]("rbo") === 0.0)
  }

  test("rankBiasedOverlap is top-weighted: top agreement beats bottom agreement") {
    val a = (1L to 4L).map(i => (i, i)).toDF("id", "rank")
    val b1 = Seq((1L, 1L), (11L, 2L), (12L, 3L), (13L, 4L)).toDF("id", "rank")
    val b2 = Seq((14L, 1L), (15L, 2L), (16L, 3L), (4L, 4L)).toDF("id", "rank")
    val top = Fusion.rankBiasedOverlap(a, b1, "id", "rank", 4, 0.9)
      .collect()(0).getAs[Double]("rbo")
    val bot = Fusion.rankBiasedOverlap(a, b2, "id", "rank", 4, 0.9)
      .collect()(0).getAs[Double]("rbo")
    assert(top > bot)
  }
}
