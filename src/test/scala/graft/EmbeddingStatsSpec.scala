package graft

import graft.operators.EmbeddingStats
import org.apache.spark.sql.functions._

/** Per-dimension embedding stats from power-of-2 fixed-point sums. */
class EmbeddingStatsSpec extends SparkSpec {
  import spark.implicits._

  test("dimensionStats: exact fixed-point sums, mean/variance to 2^-20 resolution") {
    val vecs = Seq(
      (1L, Array(1.0f, -2.0f, 0.5f)),
      (2L, Array(3.0f, -2.0f, 0.5f)),
      (3L, Array(5.0f, -2.0f, 0.5f))
    ).toDF("vec_id", "embedding")
    val out = EmbeddingStats.dimensionStats(vecs, "embedding").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
    val d0 = out(0)
    assert(d0.getAs[Long]("n") === 3L)
    // 1,3,5 are exact in fixed point: sum 9·2^20, mean 3, var 8/3
    assert(d0.getAs[Long]("sum_fixed") === 9L * 1048576L)
    assert(math.abs(d0.getAs[Double]("mean") - 3.0) < 1e-12)
    assert(math.abs(d0.getAs[Double]("variance") - 8.0 / 3.0) < 1e-5)
    // constant dimension → zero variance (dead-dimension detector)
    assert(out(1).getAs[Double]("variance") === 0.0)
    assert(out(2).getAs[Double]("std") === 0.0)
    assert(out(1).getAs[Double]("mean") === -2.0)
  }

  test("dimensionStats: negative fixed-point floors are exact and order-free") {
    val vecs = Seq((1L, Array(-0.75f)), (2L, Array(0.25f))).toDF("id", "v")
    val out = EmbeddingStats.dimensionStats(vecs, "v").head
    // floor(-0.75·2^20) + floor(0.25·2^20) = (-786432) + 262144
    assert(out.getAs[Long]("sum_fixed") === -524288L)
    assert(math.abs(out.getAs[Double]("mean") - -0.25) < 1e-6)
  }

  test("dimensionStats: repartitioned input yields identical bits (order-free sums)") {
    val vecs = (1 to 200).map(i => (i.toLong, Array(i * 0.013f, -i * 0.007f)))
      .toDF("id", "v")
    val a = EmbeddingStats.dimensionStats(vecs, "v").collect().map(_.toSeq).toSeq
    val b = EmbeddingStats.dimensionStats(vecs.repartition(7), "v")
      .collect().map(_.toSeq).toSeq
    assert(a === b)
  }
}
