package graft

import graft.operators.Decontaminate
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"),
    (200L, "pack my box with five dozen liquor jugs")
  ).toDF("bid", "btext")

  test("doc containing a benchmark verbatim scores frac 1.0 and is flagged") {
    val corpus = Seq(
      (1L, "prefix words then the quick brown fox jumps over the lazy dog and more"),
      (2L, "completely unrelated content with no overlap whatsoever here")
    ).toDF("doc_id", "text")
    val got = Decontaminate.benchmarkOverlap(corpus, "doc_id", "text",
      bench, "bid", "btext", n = 3, threshold = 0.5)
      .orderBy("doc_id")
      .as[(Long, Option[Long], Long, Double, Long)].collect().toSeq
    assert(got(0) === ((1L, Some(100L), 7L, 1.0, 1L))) // 9 tokens -> 7 trigrams
    assert(got(1) === ((2L, None, 0L, 0.0, 0L)))
  }

  test("partial overlap computes |S_d ∩ S_b| / |S_b| exactly") {
    // doc shares exactly the first 2 of the benchmark's 7 trigrams
    val corpus = Seq((1L, "the quick brown fox unrelated tail of text")).toDF("doc_id", "text")
    val got = Decontaminate.benchmarkOverlap(corpus, "doc_id", "text",
      bench, "bid", "btext", n = 3, threshold = 0.5)
      .as[(Long, Option[Long], Long, Double, Long)].collect()(0)
    assert(got === ((1L, Some(100L), 2L, 2.0 / 7.0, 0L)))
  }

  test("ties on frac resolve to the smallest benchmark id") {
    val b2 = Seq((9L, "alpha beta gamma"), (3L, "alpha beta gamma")).toDF("bid", "btext")
    val corpus = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val got = Decontaminate.benchmarkOverlap(corpus, "doc_id", "text",
      b2, "bid", "btext", n = 3, threshold = 0.9)
      .as[(Long, Option[Long], Long, Double, Long)].collect()(0)
    assert(got === ((1L, Some(3L), 1L, 1.0, 1L)))
  }

  test("benchmark side is broadcast — the corpus never shuffles to the join") {
    val corpus = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val plan = Decontaminate.benchmarkOverlap(corpus, "doc_id", "text",
      bench, "bid", "btext", n = 3, threshold = 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected a broadcast join for the benchmark index, got:\n$plan")
  }

  test("semanticOverlap: argmax benchmark cosine, threshold flag, empty benchmark") {
    import org.apache.spark.sql.functions._
    // c0 points at b100 exactly (cos 1), c1 is orthogonal to both benches
    val corpus = Seq((0L, Array(1f, 0f, 0f)), (1L, Array(0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    val bench = Seq((100L, Array(1f, 0f, 0f)), (101L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = graft.operators.Decontaminate.semanticOverlap(
      corpus, "vec_id", "embedding", bench, "vec_id", "embedding", 0.9)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out(0) === ((0L, 100L, 1.0, 1L)))
    assert(out(1)._2 === 100L || out(1)._2 === 101L) // cos 0 ties -> smallest bid
    assert(out(1)._3 === 0.0 && out(1)._4 === 0L)
    // tie at cos 0 resolves to the smallest benchmark id
    assert(out(1)._2 === 100L)
    // empty benchmark: every doc unflagged with NULL bench_id
    val none = graft.operators.Decontaminate.semanticOverlap(
      corpus, "vec_id", "embedding", bench.filter(col("vec_id") < 0),
      "vec_id", "embedding", 0.9)
      .orderBy("vec_id").collect()
    assert(none.length === 2)
    assert(none.forall(r => r.isNullAt(1) && r.getDouble(2) === 0.0 && r.getLong(3) === 0L))
  }
}
