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
}
