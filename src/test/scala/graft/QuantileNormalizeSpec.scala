package graft

import graft.operators.QuantileNormalize
import org.apache.spark.sql.functions._

/** Cross-source quantile normalization. */
class QuantileNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("maps a shifted distribution onto the reference scale") {
    // ref: 10,20,30,40 ; shifted: 110,120,130,140 — same shape, +100
    val df = (Seq(10L, 20L, 30L, 40L).map(("ref", _)) ++
      Seq(110L, 120L, 130L, 140L).map(("shift", _))).toDF("source", "v")
    val out = QuantileNormalize.toReference(df, "source", col("v"), "ref")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(out(("shift", 110L)) === 10L)
    assert(out(("shift", 120L)) === 20L)
    assert(out(("shift", 130L)) === 30L)
    assert(out(("shift", 140L)) === 40L)
  }

  test("reference source maps to itself, including under ties") {
    val df = Seq(("ref", 5L), ("ref", 5L), ("ref", 7L), ("ref", 9L), ("ref", 9L))
      .toDF("source", "v")
    val out = QuantileNormalize.toReference(df, "source", col("v"), "ref")
      .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(out === Map(5L -> 5L, 7L -> 7L, 9L -> 9L))
  }

  test("different source sizes: mid-rank share picks the matching reference quantile") {
    // ref has 4 rows; src rows have doubled mid-ranks r2 = 2 and 4
    // (mid-rank shares 1/2 and 1): 2·cumR·2 ≥ r2·4 → cumR ≥ r2 →
    // the 2nd (20) and 4th (40) reference values
    val df = (Seq(10L, 20L, 30L, 40L).map(("ref", _)) ++
      Seq(1000L, 2000L).map(("s", _))).toDF("source", "v")
    val out = QuantileNormalize.toReference(df, "source", col("v"), "ref")
      .filter($"source" === "s").collect()
      .map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(out === Map(1000L -> 20L, 2000L -> 40L))
  }

  test("absent reference yields NULL mapped, not an empty result") {
    val df = Seq(("a", 1L), ("a", 2L)).toDF("source", "v")
    val out = QuantileNormalize.toReference(df, "source", col("v"), "nope")
      .collect()
    assert(out.length === 2)
    assert(out.forall(_.isNullAt(4)))
  }

  test("plan shape: reference lookup broadcasts (no sort-merge on the non-equi join)") {
    val df = (Seq(1L, 2L, 3L).map(("ref", _)) ++ Seq(5L).map(("s", _)))
      .toDF("source", "v")
    val plan = QuantileNormalize.toReference(df, "source", col("v"), "ref")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"reference lookup must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
  }

  test("normalization is monotone within each source") {
    val df = (Seq(1L, 4L, 9L, 16L, 25L).map(("ref", _)) ++
      Seq(3L, 1L, 7L, 2L, 12L, 5L, 30L).map(("s", _))).toDF("source", "v")
    val rows = QuantileNormalize.toReference(df, "source", col("v"), "ref")
      .filter($"source" === "s").orderBy("v").collect()
      .map(r => (r.getLong(1), r.getLong(4)))
    assert(rows.map(_._1).toSeq === rows.map(_._1).sorted.toSeq)
    assert(rows.map(_._2).toSeq === rows.map(_._2).sorted.toSeq)
  }
}
