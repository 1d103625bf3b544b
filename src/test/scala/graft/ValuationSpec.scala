package graft

import graft.operators.Valuation
import org.apache.spark.sql.functions._

/** KNN-Shapley: the closed-form result must equal the DEFINITION —
  * Shapley values enumerated over all subsets with the KNN utility —
  * and satisfy the efficiency identity Σᵢ s_i = v(full corpus).
  */
class ValuationSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force Shapley by subset enumeration for the KNN utility
    * v(S) = (Σ_{j in K nearest of S} ind_j) / K (all of S when |S| < K),
    * with train points pre-sorted by distance rank for one test point.
    */
  private def shapleyByEnumeration(ind: Seq[Int], k: Int): Seq[Double] = {
    val n = ind.length
    def v(s: Seq[Int]): Double = // s: sorted ranks (0-based) present
      s.take(k).map(ind).sum.toDouble / k
    def fact(x: Int): Double = (1 to x).product.toDouble
    (0 until n).map { i =>
      val others = (0 until n).filterNot(_ == i)
      (0 to others.length).flatMap(sz => others.combinations(sz)).map { s =>
        val weight = fact(s.length) * fact(n - s.length - 1) / fact(n)
        weight * (v((s :+ i).sorted) - v(s.sorted))
      }.sum
    }
  }

  /** 1-D-like embeddings: cosine to the test vector strictly decreasing
    * with id, so rank order == id order and the enumeration's rank
    * indexing lines up.
    */
  private def emb(id: Long, angle: Double, label: Int) =
    (id, Array(math.cos(angle).toFloat, math.sin(angle).toFloat), label)

  test("knnShapley matches subset-enumeration Shapley (N=4, K=2)") {
    val labels = Seq(1, 0, 1, 1) // by rank
    val test = Seq(emb(100L, 0.0, 1))
      .toDF("vec_id", "embedding", "label")
    val train = labels.zipWithIndex.map { case (l, r) =>
      emb(r.toLong, 0.1 * (r + 1), l)
    }.toDF("vec_id", "embedding", "label")
    val out = Valuation.knnShapley(test, train, "vec_id", "embedding",
      "label", k = 2)
      .orderBy("vec_id").collect()
    val expected = shapleyByEnumeration(labels, k = 2)
    assert(out.length === 4)
    out.zip(expected).foreach { case (row, exp) =>
      assert(math.abs(row.getAs[Double]("shapley") - exp) < 1e-6,
        s"id=${row.getLong(0)}: got ${row.getAs[Double]("shapley")}, want $exp")
    }
  }

  test("efficiency: shapley values sum to v(D) = same-label@K / K") {
    val labels = Seq(0, 1, 1, 0, 1, 0)
    val test = Seq(emb(100L, 0.0, 1)).toDF("vec_id", "embedding", "label")
    val train = labels.zipWithIndex.map { case (l, r) =>
      emb(r.toLong, 0.05 * (r + 1), l)
    }.toDF("vec_id", "embedding", "label")
    val k = 3
    val total = Valuation.knnShapley(test, train, "vec_id", "embedding",
      "label", k)
      .agg(sum("shapley")).head.getDouble(0)
    val vFull = labels.take(k).sum.toDouble / k
    assert(math.abs(total - vFull) < 1e-6)
  }

  test("plan shape: the test probe set broadcasts — the corpus table is never shuffled into the join") {
    val test = Seq(emb(100L, 0.0, 1)).toDF("vec_id", "embedding", "label")
    val train = Seq(emb(0L, 0.1, 1), emb(1L, 0.2, 0))
      .toDF("vec_id", "embedding", "label")
    val plan = Valuation.knnShapley(test, train, "vec_id", "embedding",
      "label", k = 1).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), s"probe set must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus-side shuffle join leaked:\n$plan")
  }

  test("multi-test valuation averages per-test contributions") {
    // two identical test points must yield the same value as one
    val labels = Seq(1, 0, 1)
    val train = labels.zipWithIndex.map { case (l, r) =>
      emb(r.toLong, 0.1 * (r + 1), l)
    }.toDF("vec_id", "embedding", "label")
    val one = Seq(emb(100L, 0.0, 1)).toDF("vec_id", "embedding", "label")
    val two = Seq(emb(100L, 0.0, 1), emb(101L, 0.0, 1))
      .toDF("vec_id", "embedding", "label")
    val a = Valuation.knnShapley(one, train, "vec_id", "embedding", "label", 2)
      .orderBy("vec_id").collect().map(_.getAs[Double]("shapley"))
    val b = Valuation.knnShapley(two, train, "vec_id", "embedding", "label", 2)
      .orderBy("vec_id").collect().map(_.getAs[Double]("shapley"))
    assert(b.map(_ * 1.0).toSeq === a.toSeq)
    assert(Valuation.knnShapley(two, train, "vec_id", "embedding", "label", 2)
      .head.getAs[Long]("n_tests") === 2L)
  }
}
