package graft

import graft.operators.Selection
import org.apache.spark.sql.functions._

class SelectionSpec extends SparkSpec {
  import spark.implicits._

  test("dsirWeights matches hand-computed Laplace-smoothed ratios") {
    // Two docs; target = id 1. Use buckets large enough that each
    // distinct bigram lands alone (collisions would still be exact,
    // just harder to hand-check — mod 1e9+7 hashes spread well).
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = Selection.dsirWeights(docs, "doc_id", "text",
        col("doc_id") === 1L, n = 2, buckets = 997)
      .orderBy("doc_id").collect()

    // grams: doc1 = [a b, b a, a b]; doc2 = [a b, b c]
    // bucket counts: "a b": cr=3, ct=2; "b a": cr=1, ct=1; "b c": cr=1, ct=0
    // Nr=5, Nt=3, B=997
    def w(ct: Long, cr: Long): Long =
      math.floor(((ct + 1).toDouble / (3 + 997).toDouble) /
        ((cr + 1).toDouble / (5 + 997).toDouble) * Selection.RatioScale).toLong
    val wab = w(2, 3); val wba = w(1, 1); val wbc = w(0, 1)

    val r1 = out(0)
    assert(r1.getLong(1) === 3L)             // n_grams doc1
    assert(r1.getLong(2) === 2 * wab + wba)  // dsir_fp doc1
    assert(r1.getDouble(3) === (2 * wab + wba).toDouble / 3)
    val r2 = out(1)
    assert(r2.getLong(1) === 2L)
    assert(r2.getLong(2) === wab + wbc)
    // target doc scores strictly above the doc carrying the
    // out-of-target gram
    assert(r1.getDouble(3) > r2.getDouble(3))
  }

  test("dsirWeights keeps gramless and NULL-text docs with zero counts") {
    val docs = Seq((1L, "a b"), (2L, "solo"), (3L, null))
      .toDF("doc_id", "text")
    val out = Selection.dsirWeights(docs, "doc_id", "text",
        col("doc_id") === 1L, n = 2, buckets = 64)
      .orderBy("doc_id").collect()
    assert(out.length === 3)
    assert(out(1).getLong(1) === 0L && out(1).isNullAt(3))
    assert(out(2).getLong(1) === 0L && out(2).isNullAt(3))
  }

  test("dsirScoreWith(frozen weights) reproduces dsirWeights exactly") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "zz"), (4L, null))
      .toDF("doc_id", "text")
    val joined = Selection.dsirWeights(docs, "doc_id", "text",
      col("doc_id") === 1L, n = 2, buckets = 64)
    val w = Selection.dsirBucketWeights(docs, "text",
        col("doc_id") === 1L, n = 2, buckets = 64)
      .orderBy("bucket").collect().map(_.getLong(3))
    assert(w.length === 64)
    val rowLocal = Selection.dsirScoreWith(docs, "doc_id", "text", w, n = 2)
    assert(rowLocal.orderBy("doc_id").collect().map(_.toSeq).toSeq ===
      joined.orderBy("doc_id").collect().map(_.toSeq).toSeq)
  }

  test("dsirBucketWeights carries empty buckets at the smoothed prior") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val w = Selection.dsirBucketWeights(docs, "text", lit(true),
      n = 2, buckets = 16).orderBy("bucket").collect()
    // Nr = Nt = 1: empty buckets score floor(2^20·(1/17)/(1/17)) = 2^20
    val empties = w.filter(_.getLong(1) === 0L)
    assert(empties.length === 15)
    assert(empties.forall(_.getLong(3) === 1048576L))
  }

  test("dsirWeights is neutral (== 2^20 scale) when target == raw") {
    // Every doc in the target: ct == cr and Nt == Nr for every bucket,
    // so each gram's ratio is exactly 1.0 → weight 2^20 exactly.
    val docs = Seq((1L, "x y z"), (2L, "y z x")).toDF("doc_id", "text")
    val out = Selection.dsirWeights(docs, "doc_id", "text",
        lit(true), n = 2, buckets = 64)
      .orderBy("doc_id").collect()
    out.foreach { r =>
      assert(r.getLong(2) === r.getLong(1) * 1048576L)
      assert(r.getDouble(3) === 1048576.0)
    }
  }
}
